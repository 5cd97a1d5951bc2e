"""External-harness bridges and generation evals.

- ``LmEvalAdapter``: exposes a compressed model to lm-evaluation-harness
  (the reference's tools/llm_eval.py bridge).  Import-gated: lm_eval is an
  optional dependency.
- ``HumanEvalRunner``: code-generation pass@k (llmc eval/eval_code.py) via
  the serving engine; gated on the human-eval package for scoring, with a
  built-in exec-based fallback scorer.
- ``CustomGenerate``: qualitative generation (eval_custom_generate.py).
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def make_lm_eval_adapter(model, batch_size: int = 1):
    """Build an lm-eval ``LM`` implementation wrapping a model adapter.

    Usage:
        lm = make_lm_eval_adapter(model)
        results = lm_eval.simple_evaluate(model=lm, tasks=[...])
    """
    try:
        from lm_eval.api.model import LM
        from lm_eval.api.instance import Instance
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "lm-eval-harness is not installed; pip install lm-eval"
        ) from e

    fwd = model.jit_forward()
    tok = model.tokenizer

    class _Adapter(LM):
        def loglikelihood(self, requests):
            out = []
            for req in requests:
                context, continuation = req.args
                ctx_ids = tok(context, return_tensors="np").input_ids[0]
                cont_ids = tok(
                    continuation, return_tensors="np", add_special_tokens=False
                ).input_ids[0]
                ids = np.concatenate([ctx_ids, cont_ids])[None, :]
                logits = np.asarray(fwd(jnp.asarray(ids, jnp.int32)))[0]
                logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
                start = len(ctx_ids) - 1
                lls = [
                    float(logp[start + i, cont_ids[i]])
                    for i in range(len(cont_ids))
                ]
                greedy = all(
                    int(np.argmax(logits[start + i])) == cont_ids[i]
                    for i in range(len(cont_ids))
                )
                out.append((sum(lls), greedy))
            return out

        def loglikelihood_rolling(self, requests):
            out = []
            for req in requests:
                (text,) = req.args
                ids = tok(text, return_tensors="np").input_ids
                logits = np.asarray(fwd(jnp.asarray(ids, jnp.int32)))[0]
                logp = np.asarray(
                    jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
                )
                ll = sum(
                    float(logp[i - 1, ids[0, i]]) for i in range(1, ids.shape[1])
                )
                out.append((ll,))
            return out

        def generate_until(self, requests):
            from ..serving import LLMEngine, SamplingParams, \
                build_serving_weights
            from ..quant import QuantSpec

            # ONE engine for the whole request set (weights quantized
            # once); prompts stream through its continuous batching
            ids_list = [
                tok(req.args[0], return_tensors="np").input_ids[0].tolist()
                for req in requests
            ]
            if not ids_list:
                return []
            max_ids = max(len(i) for i in ids_list)
            sw = build_serving_weights(
                model, QuantSpec(bit=8, symmetric=True,
                                 granularity="per_channel"))
            max_new = max(req.args[1].get("max_gen_toks", 128)
                          for req in requests)
            eng = LLMEngine(sw, max_slots=min(8, len(ids_list)),
                            max_len=max_ids + max_new + 8)
            outs = eng.generate(
                ids_list, SamplingParams(max_new_tokens=max_new),
                eos_token_id=getattr(tok, "eos_token_id", None))
            results = []
            for req, out in zip(requests, outs):
                gen_kwargs = req.args[1]
                text = tok.decode(out[:gen_kwargs.get("max_gen_toks",
                                                      128)])
                for stop in gen_kwargs.get("until", []):
                    if stop in text:
                        text = text.split(stop)[0]
                results.append(text)
            return results

    return _Adapter()


class CustomGenerate:
    """Qualitative generation check (eval_custom_generate.py:1-59)."""

    def __init__(self, model, wspec=None, max_new_tokens: int = 64,
                 kv_bits: int = 16):
        from ..quant import QuantSpec
        from ..serving import LLMEngine, build_serving_weights

        wspec = wspec or QuantSpec(bit=8, symmetric=True,
                                   granularity="per_channel")
        self.model = model
        self.sw = build_serving_weights(model, wspec)
        self.max_new_tokens = max_new_tokens
        self.kv_bits = kv_bits

    def generate(self, prompts: Sequence[str],
                 sampling=None) -> List[str]:
        from ..serving import LLMEngine, SamplingParams

        tok = self.model.tokenizer
        token_lists = [
            list(p) if not isinstance(p, str)
            else tok(p, return_tensors="np").input_ids[0].tolist()
            for p in prompts
        ]
        max_len = max(len(t) for t in token_lists) + self.max_new_tokens + 8
        eng = LLMEngine(self.sw, max_slots=min(4, len(prompts)),
                        max_len=max_len, kv_bits=self.kv_bits)
        outs = eng.generate(
            token_lists,
            sampling or SamplingParams(max_new_tokens=self.max_new_tokens),
            eos_token_id=getattr(tok, "eos_token_id", None),
        )
        if tok is None:
            return outs
        return [tok.decode(o) for o in outs]


class CustomGenerateJustInfer:
    """Two-turn VQA consistency check (eval_custom_generate_just_infer.py).

    Reads ``samples.json`` from the eval path: a flat list where
    consecutive pairs share one image and ask the same two questions in
    both orders (``question`` is a 2-turn list, ``gt`` the 2 expected
    answers).  Answers each turn with greedy decoding through the VLM's
    ``forward_multimodal`` (full-forward decode — qualitative eval, not a
    throughput path), then scores the reference's T1V / T1V_T2V metric:
    of the pairs whose turn-1 answer is right, how often the *same
    question asked second* is also right (answer-consistency probability,
    eval_custom_generate_just_infer.py:34-67).
    """

    def __init__(self, model, path: str, save_path: Optional[str] = None,
                 max_new_tokens: int = 16):
        self.model = model
        self.path = path
        self.save_path = save_path
        self.max_new_tokens = max_new_tokens

    # -- generation --------------------------------------------------------
    def _answer(self, pixels, question: str) -> str:
        model, tok = self.model, self.model.tokenizer
        assert tok is not None, "just_infer needs a tokenizer"
        ids = tok(question, return_tensors="np").input_ids
        if not (ids == model.image_token_id).any():
            ids = np.concatenate(
                [ids[:, :1],
                 np.full((1, 1), model.image_token_id, ids.dtype),
                 ids[:, 1:]], axis=1)
        ids = jnp.asarray(ids)
        px = jnp.asarray(pixels)
        fwd = jax.jit(model.forward_multimodal)
        out_ids: List[int] = []
        eos = getattr(tok, "eos_token_id", None)
        for _ in range(self.max_new_tokens):
            logits = fwd(ids, px)
            nxt = int(jnp.argmax(logits[0, -1]))
            if eos is not None and nxt == eos:
                break
            out_ids.append(nxt)
            ids = jnp.concatenate(
                [ids, jnp.full((1, 1), nxt, ids.dtype)], axis=1)
        return tok.decode(out_ids)

    def eval(self, model=None, eval_pos=None) -> str:
        import json
        import os

        with open(os.path.join(self.path, "samples.json")) as f:
            questions_list = json.load(f)
        answered = []
        for sample in questions_list:
            img = sample["image"]
            pixels = np.load(img) if isinstance(img, str) else np.asarray(img)
            ans = [self._answer(pixels, q) for q in sample["question"]]
            answered.append({**sample, "answer": ans})
        self.eval_answer(answered)
        if self.save_path:
            with open(self.save_path, "w") as f:
                json.dump([{k: v for k, v in s.items()
                            if not isinstance(v, np.ndarray)}
                           for s in answered], f, indent=4)
        return "custom gen done."

    # -- scoring (reference metric, verbatim semantics) ---------------------
    @staticmethod
    def eval_answer(data) -> Optional[float]:
        t1v = t1v_t2v = 0

        def check(gt, answer, turn):
            return gt[turn].lower() in answer[turn].lower()

        pairs = [(data[i], data[i + 1]) for i in range(0, len(data) - 1, 2)]
        for p1, p2 in pairs:
            if check(p1["gt"], p1["answer"], 0):
                t1v += 1
                if check(p2["gt"], p2["answer"], 1):
                    t1v_t2v += 1
            if check(p2["gt"], p2["answer"], 0):
                t1v += 1
                if check(p1["gt"], p1["answer"], 1):
                    t1v_t2v += 1
        log.info("CustomGenerateJustInfer T1V: %d, T1V_T2V: %d",
                 t1v, t1v_t2v)
        if t1v:
            log.info("CustomGenerateJustInfer Possibility: %s",
                     t1v_t2v / t1v)
            return t1v_t2v / t1v
        return None
