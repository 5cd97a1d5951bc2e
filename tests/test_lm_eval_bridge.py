"""Exercise the lm-eval bridge protocol end-to-end against a STUB
``lm_eval`` module (VERDICT r3 #8: the bridge was import-gated and never
executed).  The stub reproduces the harness's LM/Instance API surface
(lm_eval.api.model.LM, lm_eval.api.instance.Instance) so
``make_lm_eval_adapter`` runs its real loglikelihood / rolling /
generate_until code paths without network access."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def stub_lm_eval():
    created = []
    if "lm_eval" not in sys.modules:
        pkg = types.ModuleType("lm_eval")
        api = types.ModuleType("lm_eval.api")
        model_mod = types.ModuleType("lm_eval.api.model")
        inst_mod = types.ModuleType("lm_eval.api.instance")

        class LM:
            def __init__(self):
                pass

        class Instance:
            def __init__(self, request_type, doc, args, idx):
                self.request_type = request_type
                self.doc = doc
                self.args = args
                self.idx = idx

        model_mod.LM = LM
        inst_mod.Instance = Instance
        pkg.api = api
        api.model = model_mod
        api.instance = inst_mod
        for name, m in [("lm_eval", pkg), ("lm_eval.api", api),
                        ("lm_eval.api.model", model_mod),
                        ("lm_eval.api.instance", inst_mod)]:
            sys.modules[name] = m
            created.append(name)
    yield sys.modules["lm_eval.api.instance"].Instance
    for name in created:
        sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    sys.path.insert(0, "/root/repo/tests")
    from helpers import make_tiny_hf_llama

    from lightcompress_tpu.models import load_model

    d, _ = make_tiny_hf_llama(str(tmp_path_factory.mktemp("lmeval")),
                              seed=21)
    model = load_model(d, dtype=jnp.float32)

    # the tiny checkpoint ships no tokenizer files; attach a minimal
    # word-hash tokenizer exposing the protocol surface the bridge uses
    # (tok(text, return_tensors="np").input_ids, decode, eos_token_id)
    class _Enc:
        def __init__(self, ids):
            self.input_ids = np.asarray([ids], np.int32)

    class _Tok:
        eos_token_id = 2

        def __call__(self, text, return_tensors="np",
                     add_special_tokens=True):
            ids = [hash(w) % 250 + 3 for w in text.split()]
            if add_special_tokens:
                ids = [1] + ids
            return _Enc(ids)

        def decode(self, ids):
            return " ".join(f"tok{int(i)}" for i in ids)

    model.tokenizer = _Tok()
    return model


def test_loglikelihood_protocol(stub_lm_eval, tiny_model):
    Instance = stub_lm_eval
    from lightcompress_tpu.eval.harness import make_lm_eval_adapter

    lm = make_lm_eval_adapter(tiny_model)
    reqs = [
        Instance("loglikelihood", {}, ("hello world", " again"), 0),
        Instance("loglikelihood", {}, ("the quick", " brown fox"), 1),
    ]
    out = lm.loglikelihood(reqs)
    assert len(out) == 2
    for ll, greedy in out:
        assert np.isfinite(ll) and ll < 0
        assert isinstance(greedy, (bool, np.bool_))

    # verify request 0 against a direct forward computation
    tok = tiny_model.tokenizer
    ctx = tok("hello world", return_tensors="np").input_ids[0]
    cont = tok(" again", return_tensors="np",
               add_special_tokens=False).input_ids[0]
    ids = np.concatenate([ctx, cont])[None, :]
    logits = np.asarray(tiny_model.forward(jnp.asarray(ids, jnp.int32)))[0]
    lp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)
                                ).sum(-1, keepdims=True)) \
        - logits.max(-1, keepdims=True)
    start = len(ctx) - 1
    want = sum(float(lp[start + i, cont[i]]) for i in range(len(cont)))
    assert abs(out[0][0] - want) < 1e-3


def test_loglikelihood_rolling_protocol(stub_lm_eval, tiny_model):
    Instance = stub_lm_eval
    from lightcompress_tpu.eval.harness import make_lm_eval_adapter

    lm = make_lm_eval_adapter(tiny_model)
    out = lm.loglikelihood_rolling(
        [Instance("loglikelihood_rolling", {}, ("some rolling text",), 0)])
    assert len(out) == 1 and np.isfinite(out[0][0]) and out[0][0] < 0


def test_generate_until_protocol(stub_lm_eval, tiny_model):
    Instance = stub_lm_eval
    from lightcompress_tpu.eval.harness import make_lm_eval_adapter

    lm = make_lm_eval_adapter(tiny_model)
    out = lm.generate_until(
        [Instance("generate_until", {},
                  ("tell me", {"max_gen_toks": 4, "until": ["\n"]}), 0)])
    assert len(out) == 1 and isinstance(out[0], str)


def test_simple_evaluate_style_loop(stub_lm_eval, tiny_model):
    """A simple_evaluate-shaped driver: build Instances for a fake
    2-choice task, score with loglikelihood, pick argmax — the exact
    call protocol lm-eval's evaluator uses."""
    Instance = stub_lm_eval
    from lightcompress_tpu.eval.harness import make_lm_eval_adapter

    lm = make_lm_eval_adapter(tiny_model)
    docs = [("the sky is", [" blue", " green"]),
            ("water is", [" wet", " dry"])]
    reqs = []
    for di, (ctx, choices) in enumerate(docs):
        for ci, ch in enumerate(choices):
            reqs.append(Instance("loglikelihood", {"doc": di},
                                 (ctx, ch), di * 2 + ci))
    res = lm.loglikelihood(reqs)
    assert len(res) == 4
    picks = [int(np.argmax([res[d * 2][0], res[d * 2 + 1][0]]))
             for d in range(len(docs))]
    assert all(p in (0, 1) for p in picks)
