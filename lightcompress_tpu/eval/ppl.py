"""Evaluation: perplexity, decode-perplexity, token consistency.

Functional re-implementations of llmc/eval/eval_ppl.py and
eval_token_consist.py.  The model is an adapter (models.base.BaseModel); the
forward is jitted once per (batch, seq_len) shape.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean token CE, float32 (eval_ppl.py:38-44)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def make_eval_text(raw, name: str) -> str:
    field = {"wikitext2": "text", "c4": "text", "ptb": "sentence"}.get(name, "text")
    join = " " if name == "ptb" else "\n\n"
    return join.join(raw[field])


def tokenize_eval(tokenizer, text: str) -> np.ndarray:
    return tokenizer(text, return_tensors="np").input_ids.astype(np.int32)


class PerplexityEval:
    """Stride-seq_len PPL over a flat token stream (eval_ppl.py:13-58)."""

    def __init__(self, testenc: np.ndarray, seq_len: int = 2048, bs: int = 1,
                 inference_per_block: bool = False):
        self.testenc = testenc
        self.seq_len = seq_len
        self.bs = bs
        self.inference_per_block = inference_per_block

    def eval(self, model) -> float:
        seq_len, bs = self.seq_len, self.bs
        nsamples = self.testenc.size // seq_len
        if self.inference_per_block:
            from ..models.streaming import stream_forward

            fwd = lambda ids: stream_forward(model, ids)  # noqa: E731
        else:
            fwd = model.jit_forward()

        total_nll = 0.0
        for i in range(0, nsamples, bs):
            j = min(i + bs, nsamples)
            inputs = self.testenc[:, i * seq_len : j * seq_len].reshape(j - i, seq_len)
            logits = fwd(jnp.asarray(inputs))
            nll = _cross_entropy(logits[:, :-1, :], jnp.asarray(inputs[:, 1:]))
            total_nll += float(nll) * seq_len * (j - i)
        return math.exp(total_nll / (nsamples * seq_len))


class TokenConsistencyEval:
    """Argmax-token agreement between two deployments of the same model
    (eval_token_consist.py:9-72)."""

    def __init__(self, testenc: np.ndarray, seq_len: int = 2048, bs: int = 1):
        self.testenc = testenc
        self.seq_len = seq_len
        self.bs = bs

    def eval(self, model_quant, model_origin) -> float:
        seq_len, bs = self.seq_len, self.bs
        nsamples = self.testenc.size // seq_len
        fwd_q = model_quant.jit_forward()
        fwd_o = model_origin.jit_forward()
        consistent = total = 0
        for i in range(0, nsamples, bs):
            j = min(i + bs, nsamples)
            inputs = jnp.asarray(
                self.testenc[:, i * seq_len : j * seq_len].reshape(j - i, seq_len)
            )
            p1 = jnp.argmax(fwd_o(inputs), axis=-1)
            p2 = jnp.argmax(fwd_q(inputs), axis=-1)
            consistent += int(jnp.sum(p1 == p2))
            total += p1.size
        return consistent / total


class DecodePerplexityEval:
    """Token-by-token decode PPL exercising the KV-cache path — including
    quantized KV caches (eval_ppl.py:61-93).

    TPU-idiomatic decode: preallocated fixed-shape KV buffers + a position
    counter (no shape-growing concat, one compile for the whole stream); the
    inner update is a dynamic_update_slice, attention masked by position.
    """

    def __init__(
        self,
        testenc: np.ndarray,
        num_eval_tokens: Optional[int] = None,
        max_len: Optional[int] = None,
        num_samples: Optional[int] = None,
    ):
        self.testenc = testenc
        self.num_eval_tokens = num_eval_tokens
        self.max_len = max_len
        # eval_ppl.py:65: number of eval texts (rows) when testenc is 2D
        self.num_samples = num_samples

    def eval(self, model, kv_hook_factory: Optional[Callable] = None) -> float:
        from ..models import arch as A

        te = np.asarray(self.testenc)
        if te.ndim == 2 and te.shape[0] > 1 and self.num_samples is not None:
            te = te[: self.num_samples]
        ids = te.reshape(-1)
        n = len(ids) - 1
        if self.num_eval_tokens is not None:
            n = min(n, self.num_eval_tokens)
        max_len = self.max_len or (n + 1)

        arch, params = model.arch, model.params
        nb = model.num_blocks
        nkv, hd = arch.num_kv_heads, arch.head_dim
        kv_hooks = model.kv_hooks or [None] * nb

        k_caches = jnp.zeros((nb, 1, nkv, max_len, hd), arch.dtype)
        v_caches = jnp.zeros((nb, 1, nkv, max_len, hd), arch.dtype)

        def step(params, k_caches, v_caches, tok, pos):
            x = A.embed_forward(arch, params, tok[None, None])
            if arch.family == "llama":
                cos, sin = A.rope_cos_sin(arch, pos[None])
            else:
                cos = sin = None
            # mask over the fixed cache length: key j valid iff j <= pos
            j_idx = jnp.arange(max_len)
            mask = jnp.where(j_idx <= pos, 0.0, jnp.finfo(jnp.float32).min)[
                None, None, None, :
            ]
            new_k, new_v = [], []
            for idx in range(nb):
                bp = params["blocks"][idx]
                ap = bp["attn"]
                h1 = A.apply_norm(x, bp["ln1"], arch) if (
                    arch.family == "llama" or arch.do_layer_norm_before
                ) else x
                q = A.default_linear("q", ap["q"]["weight"], ap["q"].get("bias"), h1)
                k = A.default_linear("k", ap["k"]["weight"], ap["k"].get("bias"), h1)
                v = A.default_linear("v", ap["v"]["weight"], ap["v"].get("bias"), h1)
                q = q.reshape(1, 1, arch.num_heads, hd).transpose(0, 2, 1, 3)
                k = k.reshape(1, 1, nkv, hd).transpose(0, 2, 1, 3)
                v = v.reshape(1, 1, nkv, hd).transpose(0, 2, 1, 3)
                if arch.qk_norm:
                    q = A.rmsnorm(q, ap["q_norm"]["weight"], arch.rms_eps)
                    k = A.rmsnorm(k, ap["k_norm"]["weight"], arch.rms_eps)
                if cos is not None:
                    q, k = A.apply_rope(q, k, cos, sin)
                kc = jax.lax.dynamic_update_slice(
                    k_caches[idx], k.astype(arch.dtype), (0, 0, pos, 0)
                )
                vc = jax.lax.dynamic_update_slice(
                    v_caches[idx], v.astype(arch.dtype), (0, 0, pos, 0)
                )
                new_k.append(kc)
                new_v.append(vc)
                k_use, v_use = kc, vc
                if kv_hooks[idx] is not None:
                    k_use, v_use = kv_hooks[idx](k_use, v_use)
                ctx = A.sdpa(q, k_use, v_use, mask, kv_groups=arch.num_heads // nkv)
                ctx = ctx.transpose(0, 2, 1, 3).reshape(1, 1, arch.num_heads * hd)
                ao = A.default_linear("o", ap["o"]["weight"], ap["o"].get("bias"), ctx)
                if arch.family == "opt" and not arch.do_layer_norm_before:
                    h = A.apply_norm(x + ao, bp["ln1"], arch)
                else:
                    h = x + ao
                if arch.family == "llama":
                    h2 = A.apply_norm(h, bp["ln2"], arch)
                    mp = bp["mlp"]
                    g = A.default_linear("g", mp["gate"]["weight"], mp["gate"].get("bias"), h2)
                    u = A.default_linear("u", mp["up"]["weight"], mp["up"].get("bias"), h2)
                    mid = jax.nn.silu(g) * u
                    d = A.default_linear("d", mp["down"]["weight"], mp["down"].get("bias"), mid)
                    x = h + d
                else:
                    h2 = A.apply_norm(h, bp["ln2"], arch) if arch.do_layer_norm_before else h
                    mp = bp["mlp"]
                    f1 = A.default_linear("f1", mp["fc1"]["weight"], mp["fc1"].get("bias"), h2)
                    mid = jax.nn.relu(f1) if arch.act_fn == "relu" else jax.nn.silu(f1)
                    f2 = A.default_linear("f2", mp["fc2"]["weight"], mp["fc2"].get("bias"), mid)
                    x = h + f2
                    if not arch.do_layer_norm_before:
                        x = A.apply_norm(x, bp["ln2"], arch)
            logits = A.head_forward(arch, params, x)
            return logits[0, 0], jnp.stack(new_k), jnp.stack(new_v)

        step_j = jax.jit(step)
        total = 0.0
        for idx in range(n):
            logits, k_caches, v_caches = step_j(
                params, k_caches, v_caches,
                jnp.asarray(ids[idx], jnp.int32), jnp.asarray(idx, jnp.int32),
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            total += -float(logp[int(ids[idx + 1])])
        return math.exp(total / n)
