"""VQA evaluation: lmms-eval harness bridge + per-stage latency statistics.

Reference llmc/eval/eval_vqa.py: wraps lmms-eval for VQA benchmarks and
registers forward hooks that time the vision/prefill/decode stages
(eval_vqa.py:32-57).  Here:

- ``VQAEval.eval`` shells into lmms-eval when it is installed (it is not in
  this sandbox — zero egress) and raises a clear error otherwise;
- ``stage_latency`` is the hook-free TPU analogue of the per-stage timers:
  it times vision tower / projector / language prefill / decode steps with
  proper device synchronization (block_until_ready, the TPU equivalent of
  torch.cuda.synchronize in the reference hooks).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def _sync(x):
    jax.block_until_ready(x)
    return x


def stage_latency(vlm, input_ids, pixels, n_decode: int = 8,
                  n_warmup: int = 1) -> Dict[str, float]:
    """Per-stage latencies (s) of one VQA-style query on a Llava-family
    adapter: vision tower, projector, language prefill, per-token decode."""
    from ..models import arch as A

    ids = jnp.asarray(input_ids)
    px = jnp.asarray(pixels)
    vis = jax.jit(vlm.vision.forward_features)
    proj = jax.jit(vlm.project_features)
    lang = vlm.language

    def prefill(embeds):
        arch = lang.arch
        T = embeds.shape[1]
        cos, sin = A.rope_cos_sin(arch, jnp.arange(T))
        mask = A.causal_mask(T, T)
        x = embeds
        for bp in lang.params["blocks"]:
            x, _, _ = A.block_forward(arch, bp, x, cos, sin, mask)
        return A.head_forward(arch, lang.params, x)

    prefill_j = jax.jit(prefill)

    out: Dict[str, float] = {}
    for _ in range(n_warmup):
        f = _sync(vis(px))
        p = _sync(proj(f))
        emb = _sync(vlm.multimodal_embed(ids, px))
        _sync(prefill_j(emb))

    t0 = time.time()
    feats = _sync(vis(px))
    out["vision_s"] = time.time() - t0

    t0 = time.time()
    _sync(proj(feats))
    out["projector_s"] = time.time() - t0

    emb = _sync(vlm.multimodal_embed(ids, px))
    t0 = time.time()
    logits = _sync(prefill_j(emb))
    out["prefill_s"] = time.time() - t0

    # decode: re-run prefill on a sequence extended by one embedding each
    # step (naive full-forward decode — latency shape, not a KV-cache bench)
    t0 = time.time()
    cur = emb
    for _ in range(n_decode):
        tok = jnp.argmax(logits[:, -1], axis=-1)
        nxt = A.embed_forward(lang.arch, lang.params, tok[:, None])
        cur = jnp.concatenate([cur, nxt], axis=1)
        logits = _sync(prefill_j(cur))
    out["decode_s"] = time.time() - t0
    out["decode_per_token_s"] = out["decode_s"] / n_decode
    return out


class VQAEval:
    """lmms-eval bridge (eval_vqa.py): runs VQA task suites on the current
    (possibly fake-quant-deployed) VLM."""

    def __init__(self, model, tasks: Sequence[str] = ("mme",),
                 batch_size: int = 1, limit: Optional[int] = None,
                 statistics: bool = False):
        self.model = model
        self.tasks = list(tasks)
        self.batch_size = batch_size
        self.limit = limit
        # eval_vqa.py:30,138: per-stage latency statistics alongside scores
        self.statistics = statistics

    def collect_statistics(self, input_ids, pixels, n_decode: int = 8):
        """Per-stage latency stats (the set_statistics_modules analogue —
        hook-free: stage_latency re-times vision/prefill/decode)."""
        return stage_latency(self.model, input_ids, pixels,
                             n_decode=n_decode)

    def eval(self, model=None):
        model = model or self.model
        try:
            import lmms_eval  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "lmms-eval is not installed in this environment; VQAEval "
                "requires it (reference eval_vqa.py wraps the lmms-eval "
                "CLI).  Use stage_latency() for the per-stage timing part."
            ) from e
        from lmms_eval import evaluator  # pragma: no cover

        return evaluator.simple_evaluate(  # pragma: no cover
            model=model, tasks=self.tasks, batch_size=self.batch_size,
            limit=self.limit)


def make_lmms_eval_adapter(vlm, batch_size: int = 1,
                           max_new_tokens: int = 64):
    """Wrap a compressed VLM adapter as an lmms-eval ``lmms`` model.

    The reference registers one wrapper per family (LlavaEval llava.py:241,
    Qwen2VLEval qwen2vl.py:196, InternVL2Eval, ...) — each re-implements
    the same three lmms-eval entry points around the quantized model.  One
    generic adapter covers every family here because all our VLM adapters
    share the functional ``forward_multimodal`` surface.  Import-gated:
    lmms-eval is optional (and absent in the zero-egress sandbox).
    """
    from lmms_eval.api.model import lmms  # raises if not installed

    class _LmmsAdapter(lmms):
        def __init__(self):
            super().__init__()
            self.vlm = vlm
            self.batch_size_per_gpu = batch_size

        def _greedy(self, ids, px, n):
            fwd = jax.jit(self.vlm.forward_multimodal)
            out = []
            eos = getattr(self.vlm.tokenizer, "eos_token_id", None)
            for _ in range(n):
                logits = fwd(ids, px)
                nxt = int(jnp.argmax(logits[0, -1]))
                if eos is not None and nxt == eos:
                    break
                out.append(nxt)
                ids = jnp.concatenate(
                    [ids, jnp.full((1, 1), nxt, ids.dtype)], axis=1)
            return out

        def generate_until(self, requests) -> list:
            res = []
            tok = self.vlm.tokenizer
            for req in requests:
                ctx, gen_kwargs, doc_to_visual, doc_id, task, split = \
                    req.args
                visuals = doc_to_visual(doc_id)
                import numpy as np

                px = jnp.asarray(np.asarray(visuals[0]))[None]
                ids = jnp.asarray(tok(ctx, return_tensors="np").input_ids)
                n = gen_kwargs.get("max_new_tokens", max_new_tokens)
                res.append(tok.decode(self._greedy(ids, px, n)))
            return res

        def loglikelihood(self, requests) -> list:
            res = []
            tok = self.vlm.tokenizer
            for req in requests:
                ctx, continuation, doc_to_visual, doc_id, task, split = \
                    req.args
                import numpy as np

                visuals = doc_to_visual(doc_id)
                px = jnp.asarray(np.asarray(visuals[0]))[None]
                c_ids = tok(ctx, return_tensors="np").input_ids
                t_ids = tok(continuation, return_tensors="np").input_ids
                ids = jnp.concatenate([jnp.asarray(c_ids),
                                       jnp.asarray(t_ids)], axis=1)
                logits = self.vlm.forward_multimodal(ids, px)
                lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), -1)
                n_c, n_t = c_ids.shape[1], t_ids.shape[1]
                tgt = ids[0, n_c:]
                ll = float(jnp.sum(lp[jnp.arange(n_c - 1, n_c - 1 + n_t),
                                      tgt]))
                greedy = bool(jnp.all(
                    jnp.argmax(lp[n_c - 1: n_c - 1 + n_t], -1) == tgt))
                res.append((ll, greedy))
            return res

        def loglikelihood_rolling(self, requests):
            raise NotImplementedError

    return _LmmsAdapter()
