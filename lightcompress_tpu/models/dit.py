"""DiT family — video-diffusion transformer blocks (Wan-class).

The reference's video_gen modality (llmc/models/wan_t2v.py + the
LlmcWanTransformerBlock re-implementation, module_utils.py:63-128):
adaLN-modulated blocks with self-attention (qk-normed), text cross-attention
and a GELU FFN.  The modulated norms are expressed with **fake-affine**
weights (ones) — ``affine_norm1``/``affine_norm3`` — so equivalent-transform
scales have a norm weight to fold into, exactly the reference trick.

Calibration captures per-denoising-step block inputs: calib batches are
``(latents, extras)`` tuples where extras carry the modulation/time
embedding and text context (the Wan Catcher records args+kwargs per step,
wan_t2v.py:52-99); the blockwise engine threads extras through untouched.

Note: binds to random/tiny weights in this sandbox (no diffusers); the
WanPipeline checkpoint loader lands with the diffusers-format reader.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..registry import MODEL_REGISTRY
from . import arch as A
from .base import BaseModel, Subset

Array = jax.Array

DIT_SUBSETS = (
    Subset(layers=("attn1.q", "attn1.k", "attn1.v"), prev_op="affine_norm1",
           prev_type="norm", input="attn1.q", inspect="attn1",
           has_kwargs=True),
    Subset(layers=("attn2.q",), prev_op="norm2", prev_type="norm",
           input="attn2.q", inspect="attn2", has_kwargs=True),
    Subset(layers=("ffn.proj",), prev_op="affine_norm3", prev_type="norm",
           input="ffn.proj", inspect="ffn.proj", is_mlp=True),
)


def make_dit_arch(hidden=128, ffn=256, heads=4, layers=2, cross_dim=64,
                  dtype=jnp.float32) -> A.ArchSpec:
    return A.ArchSpec(
        family="dit", vocab_size=0, hidden_size=hidden,
        intermediate_size=ffn, num_layers=layers, num_heads=heads,
        num_kv_heads=heads, head_dim=hidden // heads, act_fn="gelu",
        dtype=dtype,
    )


def init_dit_block(key, arch: A.ArchSpec, cross_dim: int) -> Dict:
    from .arch import _lin

    ks = jax.random.split(key, 10)
    h, f = arch.hidden_size, arch.intermediate_size
    dt = arch.dtype
    return {
        "affine_norm1": {"weight": jnp.ones((h,), dt)},  # fake-affine
        "norm2": {"weight": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
        "affine_norm3": {"weight": jnp.ones((h,), dt)},
        "scale_shift_table": (
            jax.random.normal(ks[0], (6, h)) * 0.02
        ).astype(dt),
        "attn1": {
            "q": _lin(ks[1], h, h, True, dt),
            "k": _lin(ks[2], h, h, True, dt),
            "v": _lin(ks[3], h, h, True, dt),
            "o": _lin(ks[4], h, h, True, dt),
            "norm_q": {"weight": jnp.ones((h,), dt)},
            "norm_k": {"weight": jnp.ones((h,), dt)},
        },
        "attn2": {
            "q": _lin(ks[5], h, h, True, dt),
            "k": _lin(ks[6], h, cross_dim, True, dt),
            "v": _lin(ks[7], h, cross_dim, True, dt),
            "o": _lin(ks[8], h, h, True, dt),
        },
        "ffn": {
            "proj": _lin(ks[9], f, h, True, dt),
            "out": _lin(ks[0], h, f, True, dt),
        },
    }


def _ln_noaffine(x: Array, eps: float = 1e-6) -> Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _mha(ap: Dict, xq: Array, xkv: Array, heads: int,
         linear_fn: A.LinearFn, prefix: str, qk_norm: bool,
         rms_eps: float = 1e-6) -> Array:
    B, Tq, H = xq.shape
    hd = H // heads
    q = linear_fn(f"{prefix}.q", ap["q"]["weight"], ap["q"].get("bias"), xq)
    k = linear_fn(f"{prefix}.k", ap["k"]["weight"], ap["k"].get("bias"), xkv)
    v = linear_fn(f"{prefix}.v", ap["v"]["weight"], ap["v"].get("bias"), xkv)
    if qk_norm:
        q = A.rmsnorm(q, ap["norm_q"]["weight"], rms_eps)
        k = A.rmsnorm(k, ap["norm_k"]["weight"], rms_eps)
    Tk = xkv.shape[1]
    q = q.reshape(B, Tq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Tk, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Tk, heads, hd).transpose(0, 2, 1, 3)
    ctx = A.sdpa(q, k, v, None)  # bidirectional
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Tq, H)
    return linear_fn(f"{prefix}.o", ap["o"]["weight"], ap["o"].get("bias"),
                     ctx)


def dit_block_forward(
    arch: A.ArchSpec,
    bp: Dict,
    x: Array,
    t_emb: Array,  # (B, 6, H) adaLN modulation input
    ctx: Array,  # (B, T_text, cross_dim)
    linear_fn: A.LinearFn = A.default_linear,
    ctx_img: Optional[Array] = None,  # (B, T_img, cross_dim) I2V branch
) -> Tuple[Array, Dict[str, Array]]:
    """One Wan-style DiT block; returns (y, feats)."""
    feats: Dict[str, Array] = {}
    mod = (bp["scale_shift_table"][None] + t_emb.astype(jnp.float32)).astype(
        x.dtype
    )
    shift1, scale1, gate1, shift2, scale2, gate2 = [
        mod[:, i][:, None, :] for i in range(6)
    ]
    h1 = _ln_noaffine(x) * (1 + scale1) + shift1
    h1 = h1 * bp["affine_norm1"]["weight"]  # fake-affine fold point
    feats["attn1.q"] = h1
    feats["attn1.k"] = h1
    feats["attn1.v"] = h1
    a1 = _mha(bp["attn1"], h1, h1, arch.num_heads, linear_fn, "attn1", True)
    x = x + gate1 * a1

    h2 = A.layernorm(x, bp["norm2"]["weight"], bp["norm2"].get("bias"), 1e-6)
    feats["attn2.q"] = h2
    a2 = _mha(bp["attn2"], h2, ctx, arch.num_heads, linear_fn, "attn2",
              "norm_q" in bp["attn2"])  # Wan cross-attn has rms qk-norm
    if ctx_img is not None and "add_k_proj" in bp["attn2"]:
        a2 = a2 + _mha_img(bp["attn2"], h2, ctx_img, arch.num_heads,
                           linear_fn)
    x = x + a2

    h3 = _ln_noaffine(x) * (1 + scale2) + shift2
    h3 = h3 * bp["affine_norm3"]["weight"]
    feats["ffn.proj"] = h3
    f1 = linear_fn("ffn.proj", bp["ffn"]["proj"]["weight"],
                   bp["ffn"]["proj"].get("bias"), h3)
    f2 = linear_fn("ffn.out", bp["ffn"]["out"]["weight"],
                   bp["ffn"]["out"].get("bias"), jax.nn.gelu(f1))
    x = x + gate2 * f2
    return x, feats


@MODEL_REGISTRY
class WanT2V(BaseModel):
    """Generic Wan-class DiT adapter (video_gen modality)."""

    subsets = DIT_SUBSETS

    def __init__(self, arch, params, tokenizer=None, config=None,
                 cross_dim: int = 64):
        super().__init__(arch, params, tokenizer, config)
        self.cross_dim = cross_dim

    @staticmethod
    def tiny(seed=0, hidden=128, ffn=256, heads=4, layers=2, cross_dim=64,
             dtype=jnp.float32) -> "WanT2V":
        arch = make_dit_arch(hidden, ffn, heads, layers, cross_dim, dtype)
        ks = jax.random.split(jax.random.PRNGKey(seed), layers)
        params = {"blocks": [init_dit_block(k, arch, cross_dim) for k in ks]}
        return WanT2V(arch, params, cross_dim=cross_dim)

    def get_subsets_in_block(self, block_idx):
        return DIT_SUBSETS

    def collect_first_block_input(self, calib_batches):
        """calib batches: dicts {latents, t_emb, ctx} — one per
        (prompt, denoising step), the Wan Catcher capture."""
        out = []
        for b in calib_batches:
            out.append(
                (jnp.asarray(b["latents"]),
                 {"t_emb": jnp.asarray(b["t_emb"]),
                  "ctx": jnp.asarray(b["ctx"])})
            )
        return out

    def block_forward(self, block_idx, x, linear_fn=None, kv_hook=None,
                      block_params=None, extra=None):
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        assert extra is not None, "DiT blocks need (t_emb, ctx) extras"
        y, feats = dit_block_forward(
            self.arch, bp, x, extra["t_emb"], extra["ctx"],
            linear_fn=linear_fn or A.default_linear,
        )
        return y, feats, None

    def inspect_forward(self, block_idx, subset, x, linear_fn=None,
                        block_params=None):
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        lf = linear_fn or A.default_linear
        if subset.inspect == "attn1":
            return _mha(bp["attn1"], x, x, self.arch.num_heads, lf, "attn1",
                        True)
        if subset.inspect == "attn2":
            # cross-attn needs the text context; search restricted to to_q
            return A.linear_inspect(bp, "attn2.q", x, linear_fn=lf)
        return A.linear_inspect(bp, subset.inspect, x, linear_fn=lf)

    def forward_denoise(self, latents: Array, t_emb: Array, ctx: Array):
        """Full DiT stack for one denoising step."""
        x = latents
        for idx in range(self.num_blocks):
            x, _, _ = self.block_forward(
                idx, x, extra={"t_emb": t_emb, "ctx": ctx}
            )
        return x


@MODEL_REGISTRY
class WanI2V(WanT2V):
    """Wan image-to-video adapter (reference llmc/models/wan_i2v.py).

    Differs from T2V only in cross-attention: conditioning carries an
    image-embedding prefix attended through dedicated ``add_k_proj`` /
    ``add_v_proj`` heads whose output is summed with the text-attention
    output (diffusers WanAttnProcessor I2V branch).  Calibration extras
    gain a ``ctx_img`` entry; the blockwise engine threads it untouched.
    """

    def collect_first_block_input(self, calib_batches):
        out = []
        for b in calib_batches:
            extra = {"t_emb": jnp.asarray(b["t_emb"]),
                     "ctx": jnp.asarray(b["ctx"])}
            if "ctx_img" in b:
                extra["ctx_img"] = jnp.asarray(b["ctx_img"])
            out.append((jnp.asarray(b["latents"]), extra))
        return out

    def block_forward(self, block_idx, x, linear_fn=None, kv_hook=None,
                      block_params=None, extra=None):
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        assert extra is not None, "DiT blocks need (t_emb, ctx) extras"
        y, feats = dit_block_forward(
            self.arch, bp, x, extra["t_emb"], extra["ctx"],
            linear_fn=linear_fn or A.default_linear,
            ctx_img=extra.get("ctx_img"),
        )
        return y, feats, None


def _mha_img(ap: Dict, xq: Array, ctx_img: Array, heads: int,
             linear_fn: A.LinearFn) -> Array:
    """I2V image-branch attention: q from to_q, k/v from add_{k,v}_proj.
    diffusers sums image- and text-attention outputs *before* to_out; an
    equivalent fused form projects each through ``o`` but counts the bias
    only once — so this branch projects with bias=None."""
    B, Tq, H = xq.shape
    hd = H // heads
    q = linear_fn("attn2.q", ap["q"]["weight"], ap["q"].get("bias"), xq)
    k = ctx_img @ ap["add_k_proj"]["weight"].T
    if ap["add_k_proj"].get("bias") is not None:
        k = k + ap["add_k_proj"]["bias"]
    v = ctx_img @ ap["add_v_proj"]["weight"].T
    if ap["add_v_proj"].get("bias") is not None:
        v = v + ap["add_v_proj"]["bias"]
    if "norm_q" in ap:
        q = A.rmsnorm(q, ap["norm_q"]["weight"], 1e-6)
    if "norm_added_k" in ap:
        k = A.rmsnorm(k, ap["norm_added_k"]["weight"], 1e-6)
    Tk = ctx_img.shape[1]
    q = q.reshape(B, Tq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Tk, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Tk, heads, hd).transpose(0, 2, 1, 3)
    ctx = A.sdpa(q, k, v, None)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Tq, H)
    return linear_fn("attn2.o", ap["o"]["weight"], None, ctx)


# ---------------------------------------------------------------------------
# diffusers WanTransformer3DModel checkpoint reader (wan_t2v.py:18-165)
# ---------------------------------------------------------------------------

def load_wan_transformer(model_dir: str, dtype=jnp.float32) -> "WanT2V":
    """Read a diffusers-format Wan transformer directory
    (config.json + *.safetensors) into a WanT2V adapter.

    Key map (diffusers transformer_wan.py):
      blocks.{i}.attn1.to_{q,k,v} / to_out.0 / norm_{q,k}  -> attn1.*
      blocks.{i}.attn2.*                                    -> attn2.*
      blocks.{i}.norm2                                      -> norm2
      blocks.{i}.ffn.net.0.proj / ffn.net.2                 -> ffn.proj/out
      blocks.{i}.scale_shift_table (1,6,H)                  -> (6,H)
      condition_embedder.* / patch_embedding / proj_out / scale_shift_table
        kept under params['cond'] for the generation path.
    The fake-affine fold points (affine_norm1/3, module_utils.py:63-128
    LlmcWanTransformerBlock) initialize to ones.
    """
    import json
    import os

    from .hf_loader import _ShardReader, _np_to_jnp

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    dim = cfg["num_attention_heads"] * cfg["attention_head_dim"]
    arch = make_dit_arch(
        hidden=dim, ffn=cfg["ffn_dim"], heads=cfg["num_attention_heads"],
        layers=cfg["num_layers"], cross_dim=cfg.get("text_dim", dim),
        dtype=dtype,
    )
    reader = _ShardReader(model_dir)

    def g(k):
        t = reader.get(k)
        return None if t is None else _np_to_jnp(t, dtype)

    def lin(prefix):
        node = {"weight": g(prefix + ".weight")}
        b = g(prefix + ".bias")
        if b is not None:
            node["bias"] = b
        return node

    h = dim
    blocks = []
    for i in range(arch.num_layers):
        p = f"blocks.{i}."
        attn1 = {c: lin(p + f"attn1.to_{c}") for c in ("q", "k", "v")}
        attn1["o"] = lin(p + "attn1.to_out.0")
        for nrm in ("norm_q", "norm_k"):
            w = g(p + f"attn1.{nrm}.weight")
            if w is not None:
                attn1[nrm] = {"weight": w}
        attn2 = {c: lin(p + f"attn2.to_{c}") for c in ("q", "k", "v")}
        attn2["o"] = lin(p + "attn2.to_out.0")
        for nrm in ("norm_q", "norm_k", "norm_added_k"):
            w = g(p + f"attn2.{nrm}.weight")
            if w is not None:
                attn2[nrm] = {"weight": w}
        # i2v: image branch projections (WanI2V cross-attn)
        for extra in ("add_k_proj", "add_v_proj"):
            w = g(p + f"attn2.{extra}.weight")
            if w is not None:
                attn2[extra] = {"weight": w,
                                "bias": g(p + f"attn2.{extra}.bias")}
        n2w = g(p + "norm2.weight")
        bp = {
            "affine_norm1": {"weight": jnp.ones((h,), dtype)},
            "affine_norm3": {"weight": jnp.ones((h,), dtype)},
            "norm2": ({"weight": n2w, "bias": g(p + "norm2.bias")}
                      if n2w is not None
                      else {"weight": jnp.ones((h,), dtype)}),
            "scale_shift_table": g(p + "scale_shift_table").reshape(6, h),
            "attn1": attn1,
            "attn2": attn2,
            "ffn": {"proj": lin(p + "ffn.net.0.proj"),
                    "out": lin(p + "ffn.net.2")},
        }
        blocks.append(bp)
    params = {"blocks": blocks}
    cond = {}
    for key in ("patch_embedding", "proj_out",
                "condition_embedder.text_embedder.linear_1",
                "condition_embedder.text_embedder.linear_2",
                "condition_embedder.time_embedder.linear_1",
                "condition_embedder.time_embedder.linear_2",
                "condition_embedder.time_proj"):
        w = g(key + ".weight")
        if w is not None:
            cond[key] = {"weight": w, "bias": g(key + ".bias")}
    sst = g("scale_shift_table")
    if sst is not None:
        cond["scale_shift_table"] = sst.reshape(-1, h)
    params["cond"] = cond
    cls = WanI2V if any("add_k_proj" in b["attn2"] for b in blocks) else \
        WanT2V
    return cls(arch, params, config=cfg,
               cross_dim=cfg.get("text_dim", dim))
