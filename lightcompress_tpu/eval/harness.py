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

            results = []
            for req in requests:
                context, gen_kwargs = req.args
                ids = tok(context, return_tensors="np").input_ids[0].tolist()
                sw = build_serving_weights(
                    model, QuantSpec(bit=8, symmetric=True,
                                     granularity="per_channel")
                )
                eng = LLMEngine(sw, max_slots=1,
                                max_len=len(ids) + 256)
                out = eng.generate(
                    [ids],
                    SamplingParams(max_new_tokens=gen_kwargs.get(
                        "max_gen_toks", 128)),
                    eos_token_id=getattr(tok, "eos_token_id", None),
                )[0]
                text = tok.decode(out)
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
