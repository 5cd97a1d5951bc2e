"""Video-generation eval for the Wan DiT family.

Reference llmc/eval/eval_video_generate.py: drives the diffusers
``WanPipeline`` end-to-end (t2v_eval / i2v_eval, eval_video_generate.py:57-98)
and exports MP4s.  TPU-native analogue: a flow-matching Euler sampler with
classifier-free guidance compiled as ONE jitted function over the functional
DiT stack — the whole denoising trajectory runs on-device via
``lax.fori_loop``, no per-step host round-trips.  The VAE decode / MP4
muxing of the reference lives outside the compression scope (diffusers is
the codec there); we persist final latents per sample as
``{eval_pos}_output_{i}.npy`` so a downstream decoder can render them.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def flow_match_sigmas(num_steps: int, shift: float = 5.0) -> np.ndarray:
    """Wan's shifted flow-matching schedule (UniPC/Euler over sigma in
    (1, 0]); shift=5.0 is the Wan2.1 default."""
    t = np.linspace(1.0, 0.0, num_steps + 1)
    sig = shift * t / (1.0 + (shift - 1.0) * t)
    return sig.astype(np.float32)


def sinusoidal_timestep_embedding(t, dim: int = 256,
                                  max_period: float = 10000.0):
    """diffusers ``Timesteps`` (flip_sin_to_cos=True, shift=0): the input
    to Wan's time embedder MLP.  ``t`` is (B,) in [0, 1000]."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half) / half)
    ang = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def wan_time_modulation(cond: Dict, t, hidden: int, dtype):
    """(B,) timestep -> (B, 6, H) adaLN modulation via the checkpoint's
    condition_embedder (time_embedder MLP + time_proj), the diffusers
    WanTransformer3DModel conditioning path.  Falls back to zeros when the
    embedder isn't in the checkpoint (tiny test models)."""
    te1 = cond.get("condition_embedder.time_embedder.linear_1")
    te2 = cond.get("condition_embedder.time_embedder.linear_2")
    tp = cond.get("condition_embedder.time_proj")
    B = t.shape[0]
    if te1 is None or te2 is None or tp is None:
        return jnp.zeros((B, 6, hidden), dtype)
    def lin(node, x):
        y = x @ node["weight"].astype(jnp.float32).T
        return y if node.get("bias") is None else y + node["bias"]

    emb = sinusoidal_timestep_embedding(t, te1["weight"].shape[1])
    h = jax.nn.silu(lin(te1, emb.astype(jnp.float32)))
    h = lin(te2, h)
    m = lin(tp, jax.nn.silu(h))
    return m.reshape(B, 6, hidden).astype(dtype)


class VideoGenerateEval:
    """eval_video_generate.py semantics on the functional Wan adapter.

    ``testenc`` (set via :meth:`set_testenc` or constructor) is a list of
    dicts — per sample:
      - ``ctx``      (1, L, cross_dim)  text-encoder states (prompt)
      - ``neg_ctx``  (1, L, cross_dim)  negative-prompt states (optional;
                      zeros if absent — guidance then sharpens vs null)
      - ``ctx_img``  (1, Li, cross_dim) image states for WanI2V (optional)
      - ``n_tokens`` int — latent token count (frames x h x w patches)
    """

    def __init__(self, model, output_video_path: str,
                 testenc: Optional[List[Dict]] = None,
                 num_steps: int = 20, guidance_scale: float = 5.0,
                 n_tokens: int = 256, shift: float = 5.0, seed: int = 42):
        self.model = model
        self.out_dir = output_video_path
        os.makedirs(self.out_dir, exist_ok=True)
        self.testenc = testenc or []
        self.num_steps = num_steps
        self.guidance_scale = float(guidance_scale)
        self.n_tokens = n_tokens
        self.shift = shift
        self.seed = seed

    def set_testenc(self, testenc: List[Dict]):
        self.testenc = testenc

    def _sample_fn(self, has_img: bool):
        model = self.model
        sigmas = jnp.asarray(flow_match_sigmas(self.num_steps, self.shift))
        g = self.guidance_scale
        cond = model.params.get("cond", {})
        hidden = model.arch.hidden_size
        dtype = model.arch.dtype

        def velocity(lat, t_emb, ctx, ctx_img):
            extra = {"t_emb": t_emb, "ctx": ctx}
            if has_img:
                extra["ctx_img"] = ctx_img
            x = lat
            for idx in range(model.num_blocks):
                x, _, _ = model.block_forward(idx, x, extra=extra)
            return x

        def sample(lat0, ctx, neg_ctx, ctx_img):
            def step(i, lat):
                s, s_next = sigmas[i], sigmas[i + 1]
                t = jnp.full((lat.shape[0],), s * 1000.0)
                te = wan_time_modulation(cond, t, hidden, dtype)
                v_c = velocity(lat, te, ctx, ctx_img)
                v_u = velocity(lat, te, neg_ctx, ctx_img)
                v = v_u + g * (v_c - v_u)  # CFG
                return lat + (s_next - s) * v

            return jax.lax.fori_loop(0, self.num_steps, step, lat0)

        return jax.jit(sample)

    def eval(self, model=None, eval_pos: str = "video") -> Optional[str]:
        del model  # the adapter's (possibly fake-quant) params are bound
        if not self.testenc:
            return None
        key = jax.random.PRNGKey(self.seed)
        fns = {}
        for i, data in enumerate(self.testenc):
            ctx = jnp.asarray(data["ctx"])
            neg = jnp.asarray(data.get("neg_ctx", np.zeros_like(data["ctx"])))
            has_img = "ctx_img" in data
            img = jnp.asarray(data["ctx_img"]) if has_img else ctx[:, :1]
            n_tok = int(data.get("n_tokens", self.n_tokens))
            h = self.model.arch.hidden_size
            key, k1 = jax.random.split(key)
            lat0 = jax.random.normal(k1, (ctx.shape[0], n_tok, h),
                                     self.model.arch.dtype)
            if has_img not in fns:
                fns[has_img] = self._sample_fn(has_img)
            lat = fns[has_img](lat0, ctx, neg, img)
            np.save(os.path.join(self.out_dir,
                                 f"{eval_pos}_output_{i}.npy"),
                    np.asarray(lat))
        return None
