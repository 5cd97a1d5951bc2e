"""Architecture specs and pure functional transformer forward passes.

TPU-first re-design of the reference's model adapter layer
(llmc/models/base_model.py + per-arch files): models are **param pytrees +
pure apply functions**, not nn.Modules.  Forward-hook activation capture
becomes an explicit ``collect`` return — every block forward returns
``(y, feats)`` where ``feats`` maps canonical linear names to the exact
tensors the reference's ``cache_input_hook`` would have recorded
(blockwise_optimization.py:53-61).

Two families cover most LLM adapters:
- ``llama``: RMSNorm + RoPE + GQA + SiLU-gated MLP (llama.py, mistral.py,
  qwen2.py [attn bias], qwen3.py [qk norm], smollm, stablelm, minicpm, ...)
- ``opt``: LayerNorm + learned positions + ReLU MLP + attn bias (opt.py)

Weights are stored (out_features, in_features) like the reference so the
quantizer's rows == output channels convention (quant.py:612-642) carries
over unchanged; matmuls are ``x @ W.T``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
# linear_fn(name, w, b, x) -> y : the functional module-library swap point
# (the analogue of replacing nn.Linear with FakeQuantLinear etc.,
# module_utils.py:679-853)
LinearFn = Callable[[str, Array, Optional[Array], Array], Array]


def default_linear(name: str, w: Array, b: Optional[Array], x: Array) -> Array:
    if w.ndim == 3:  # stacked experts (E, out, in) — dense MoE compute
        if x.ndim == 4 and x.shape[0] == w.shape[0]:
            # paired: x already carries the expert dim (down_proj input is
            # (E, B, T, I); gate/up inputs are 3D (B, T, H))
            y = jnp.einsum(
                "e...i,eoi->e...o", x, w, preferred_element_type=jnp.float32
            ).astype(x.dtype)
        else:
            y = jnp.einsum(
                "...i,eoi->e...o", x, w, preferred_element_type=jnp.float32
            ).astype(x.dtype)
        if b is not None:
            y = y + b.reshape(b.shape[0], *([1] * (y.ndim - 2)), b.shape[-1])
        return y
    y = jnp.einsum(
        "...i,oi->...o", x, w, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


@dataclasses.dataclass(frozen=True)
class MLASpec:
    """DeepSeek multi-head latent attention (deepseekv3.py MLA subsets):
    low-rank compressed q (optional) and kv projections with a decoupled
    rope sub-dimension shared MQA-style across heads."""

    kv_lora_rank: int
    qk_rope_head_dim: int
    qk_nope_head_dim: int
    v_head_dim: int
    q_lora_rank: Optional[int] = None
    rope_interleave: bool = True

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim


@dataclasses.dataclass(frozen=True)
class MoESpec:
    """Mixture-of-experts MLP config (mixtral / qwen2moe / deepseek-class).

    Experts are stored stacked (E, out, in) so expert-parallel sharding is a
    NamedSharding over axis 0 and the dense-compute path is one einsum."""

    num_experts: int
    top_k: int
    moe_intermediate_size: int
    num_shared_experts: int = 0  # deepseek/qwen2moe shared expert
    gating: str = "softmax"  # 'softmax' (mixtral) | 'sigmoid' (deepseek-v3)
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0
    # deepseek-v3 group-limited routing (DeepseekV3TopkRouter)
    n_group: int = 1
    topk_group: int = 1


@dataclasses.dataclass(frozen=True)
class ArchSpec:
    family: str  # 'llama' | 'opt'
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    attn_bias: bool = False
    mlp_bias: bool = False
    qk_norm: bool = False  # qwen3
    tie_word_embeddings: bool = False
    act_fn: str = "silu"  # 'silu' | 'relu' | 'gelu'
    # opt family
    do_layer_norm_before: bool = True
    # 'default' | 'rmsnorm': QuaRot converts LayerNorm models to RMSNorm
    # after mean-removal + bias folding (quarot preprocess)
    norm_type: str = "default"
    moe: Optional[MoESpec] = None
    mla: Optional[MLASpec] = None
    # gemma2 family variants
    gemma_norm: bool = False      # rmsnorm uses (1 + w)
    sandwich_norms: bool = False  # post-attn / post-mlp norms
    attn_softcap: float = 0.0
    final_softcap: float = 0.0
    query_scale: float = 0.0      # 0 -> 1/sqrt(head_dim)
    embed_scale: bool = False     # gemma: embeddings * sqrt(hidden)
    # learned-position offset (OPT uses 2, gpt_bigcode 0)
    pos_offset: int = 2
    # bloom / falcon / phi / chatglm / minicpm family features
    alibi: bool = False            # bloom: ALiBi attention bias, no positions
    use_rope: Optional[bool] = None  # default: llama yes, opt no
    learned_pos: bool = True       # opt family learned position embeddings
    embed_norm: bool = False       # bloom word_embeddings_layernorm
    parallel_residual: bool = False  # falcon/phi: x + attn(n(x)) + mlp(n(x))
    parallel_two_norms: bool = False  # falcon new-arch: ln_attn + ln_mlp
    partial_rotary_factor: float = 1.0  # phi/chatglm: rope on a dim prefix
    rope_interleave: bool = False  # chatglm: interleaved pair rotation
    glm_rope: bool = False  # HF-Glm: truncated repeat-interleaved tables
    opt_bias: bool = True          # opt-family linear biases (falcon: False)
    head_bias: bool = False        # phi: lm_head has a bias
    residual_multiplier: float = 0.0  # minicpm scale_depth/sqrt(L); 0 = off
    embed_multiplier: float = 0.0  # minicpm scale_emb; 0 = off
    logit_divisor: float = 0.0     # minicpm hidden/dim_model_base; 0 = off
    # llama3 rope scaling (factor, low_freq_factor, high_freq_factor,
    # original_max_position_embeddings); None = off
    rope_llama3: Optional[Tuple[float, float, float, int]] = None
    dtype: Any = jnp.bfloat16

    @property
    def kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads

    @property
    def rotary_dim(self) -> int:
        d = int(self.head_dim * self.partial_rotary_factor)
        return d - (d % 2)

    @property
    def rope_enabled(self) -> bool:
        if self.alibi:
            return False
        if self.use_rope is not None:
            return self.use_rope
        return self.family == "llama"


# ---------------------------------------------------------------------------
# initialization (tiny random models for tests / benchmarks; zero-egress)
# ---------------------------------------------------------------------------

def _lin(key, out_f, in_f, bias, dtype, scale=None):
    if scale is None:
        scale = (2.0 / (in_f + out_f)) ** 0.5
    p = {"weight": (jax.random.normal(key, (out_f, in_f)) * scale).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_f,), dtype)
    return p


def init_block_params(key, arch: ArchSpec) -> Dict:
    ks = jax.random.split(key, 12)
    h, i = arch.hidden_size, arch.intermediate_size
    qd = arch.num_heads * arch.head_dim
    kvd = arch.num_kv_heads * arch.head_dim
    dt = arch.dtype
    if arch.family == "llama":
        if arch.mla is not None:
            mla = arch.mla
            attn = {
                "kv_a": _lin(ks[1], mla.kv_lora_rank + mla.qk_rope_head_dim,
                             h, arch.attn_bias, dt),
                "kv_a_norm": {"weight": jnp.ones((mla.kv_lora_rank,), dt)},
                "kv_b": _lin(ks[2], arch.num_heads * (
                    mla.qk_nope_head_dim + mla.v_head_dim), mla.kv_lora_rank,
                    False, dt),
                "o": _lin(ks[3], h, arch.num_heads * mla.v_head_dim, False,
                          dt),
            }
            if mla.q_lora_rank:
                attn["q_a"] = _lin(ks[0], mla.q_lora_rank, h,
                                   arch.attn_bias, dt)
                attn["q_a_norm"] = {"weight": jnp.ones((mla.q_lora_rank,),
                                                       dt)}
                attn["q_b"] = _lin(ks[8], arch.num_heads * mla.qk_head_dim,
                                   mla.q_lora_rank, False, dt)
            else:
                attn["q"] = _lin(ks[0], arch.num_heads * mla.qk_head_dim, h,
                                 False, dt)
        else:
            attn = {
                "q": _lin(ks[0], qd, h, arch.attn_bias, dt),
                "k": _lin(ks[1], kvd, h, arch.attn_bias, dt),
                "v": _lin(ks[2], kvd, h, arch.attn_bias, dt),
                "o": _lin(ks[3], h, qd, False, dt),
            }
        bp = {
            "ln1": {"weight": jnp.ones((h,), dt)},
            "ln2": {"weight": jnp.ones((h,), dt)},
            "attn": attn,
        }
        if arch.moe is not None:
            m = arch.moe
            mi = m.moe_intermediate_size
            ek = jax.random.split(ks[4], 4)
            scale = (2.0 / (h + mi)) ** 0.5
            bp["mlp"] = {
                "router": {"weight": (
                    jax.random.normal(ek[0], (m.num_experts, h)) * 0.02
                ).astype(dt)},
                "gate": {"weight": (
                    jax.random.normal(ek[1], (m.num_experts, mi, h)) * scale
                ).astype(dt)},
                "up": {"weight": (
                    jax.random.normal(ek[2], (m.num_experts, mi, h)) * scale
                ).astype(dt)},
                "down": {"weight": (
                    jax.random.normal(ek[3], (m.num_experts, h, mi)) * scale
                ).astype(dt)},
            }
            if m.num_shared_experts > 0:
                si = mi * m.num_shared_experts
                bp["mlp"]["shared_gate"] = _lin(ks[5], si, h, False, dt)
                bp["mlp"]["shared_up"] = _lin(ks[6], si, h, False, dt)
                bp["mlp"]["shared_down"] = _lin(ks[7], h, si, False, dt)
        else:
            bp["mlp"] = {
                "gate": _lin(ks[4], i, h, arch.mlp_bias, dt),
                "up": _lin(ks[5], i, h, arch.mlp_bias, dt),
                "down": _lin(ks[6], h, i, arch.mlp_bias, dt),
            }
        if arch.sandwich_norms:
            init = jnp.zeros if arch.gemma_norm else jnp.ones
            bp["ln1_post"] = {"weight": init((h,), dt)}
            bp["ln2_post"] = {"weight": init((h,), dt)}
            bp["ln1"]["weight"] = init((h,), dt)
            bp["ln2"]["weight"] = init((h,), dt)
        if arch.qk_norm:
            bp["attn"]["q_norm"] = {"weight": jnp.ones((arch.head_dim,), dt)}
            bp["attn"]["k_norm"] = {"weight": jnp.ones((arch.head_dim,), dt)}
        return bp
    if arch.family == "opt":
        b = arch.opt_bias
        return {
            "ln1": {"weight": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
            "ln2": {"weight": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
            "attn": {
                "q": _lin(ks[0], qd, h, b, dt),
                "k": _lin(ks[1], kvd, h, b, dt),
                "v": _lin(ks[2], kvd, h, b, dt),
                "o": _lin(ks[3], h, qd, b, dt),
            },
            "mlp": {
                "fc1": _lin(ks[4], i, h, b, dt),
                "fc2": _lin(ks[5], h, i, b, dt),
            },
        }
    raise ValueError(arch.family)


def init_params(key, arch: ArchSpec) -> Dict:
    ks = jax.random.split(key, arch.num_layers + 4)
    h, v = arch.hidden_size, arch.vocab_size
    dt = arch.dtype
    params: Dict[str, Any] = {
        "embed": {"weight": (jax.random.normal(ks[0], (v, h)) * 0.02).astype(dt)},
        "blocks": [init_block_params(ks[2 + n], arch) for n in range(arch.num_layers)],
    }
    if arch.family == "llama":
        params["norm"] = {"weight": jnp.ones((h,), dt)}
    else:
        params["norm"] = {"weight": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)}
        if arch.learned_pos:
            params["embed_pos"] = {
                "weight": (
                    jax.random.normal(ks[1], (arch.max_position_embeddings + 2, h)) * 0.02
                ).astype(dt)
            }
    if arch.embed_norm:
        params["embed_norm"] = {"weight": jnp.ones((h,), dt),
                                "bias": jnp.zeros((h,), dt)}
    if not arch.tie_word_embeddings:
        params["lm_head"] = {
            "weight": (jax.random.normal(ks[-1], (v, h)) * 0.02).astype(dt)
        }
        if arch.head_bias:
            params["lm_head"]["bias"] = jnp.zeros((v,), dt)
    return params


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def rmsnorm(x: Array, w: Optional[Array], eps: float) -> Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if w is not None:
        xn = xn * w.astype(jnp.float32)
    return xn.astype(dt)


def layernorm(x: Array, w: Optional[Array], b: Optional[Array], eps: float) -> Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        xn = xn * w.astype(jnp.float32)
    if b is not None:
        xn = xn + b.astype(jnp.float32)
    return xn.astype(dt)


def apply_norm(x: Array, np_: Dict, arch: ArchSpec) -> Array:
    if arch.family == "llama" or arch.norm_type == "rmsnorm":
        w = np_.get("weight")
        if arch.gemma_norm and w is not None:
            w = 1.0 + w.astype(jnp.float32)
        return rmsnorm(x, w, arch.rms_eps)
    return layernorm(x, np_.get("weight"), np_.get("bias"), 1e-5)


def _act(x: Array, name: str) -> Array:
    if name == "silu":
        return jax.nn.silu(x)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "gelu":
        return jax.nn.gelu(x)
    if name == "quick_gelu":  # CLIP: x * sigmoid(1.702 x)
        return x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu_tanh":  # SigLIP: gelu_pytorch_tanh
        return jax.nn.gelu(x, approximate=True)
    if name == "gelu_exact":  # HF 'gelu' (erf form; InternViT)
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_cos_sin(arch: ArchSpec, positions: Array) -> Tuple[Array, Array]:
    """HF-Llama-convention rotary tables; positions (T,) or (B, T).

    Partial-rotary models (phi/chatglm/stablelm) build tables for the
    rotary prefix only (``arch.rotary_dim``)."""
    d = arch.rotary_dim
    inv_freq = 1.0 / (
        arch.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )
    if arch.rope_llama3 is not None:
        # HF ROPE_INIT_FUNCTIONS['llama3']: scale low-frequency components,
        # smooth ramp between the low/high wavelength cutoffs
        factor, lo_f, hi_f, orig_max = arch.rope_llama3
        wavelen = 2 * jnp.pi / inv_freq
        lo_wl = orig_max / lo_f
        hi_wl = orig_max / hi_f
        smooth = (orig_max / wavelen - lo_f) / (hi_f - lo_f)
        smoothed = (1 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = jnp.where(wavelen > lo_wl, inv_freq / factor,
                             jnp.where(wavelen < hi_wl, inv_freq, smoothed))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (..., T, d/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: Array, k: Array, cos: Array, sin: Array):
    # q,k: (B, H, T, D); cos/sin: (T, D) or (B, T, D)
    if cos.ndim == 2:
        cos = cos[None, None, :, :]
        sin = sin[None, None, :, :]
    else:
        cos = cos[:, None, :, :]
        sin = sin[:, None, :, :]
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)
    return q * cos + _rotate_half(q) * sin, k * cos + _rotate_half(k) * sin


def rope_apply_arch(arch: ArchSpec, q: Array, k: Array, cos: Array,
                    sin: Array):
    """Arch-aware rope: partial rotary (phi/chatglm apply rope to the first
    ``rotary_dim`` dims only), interleaved pair convention (chatglm), and
    the HF-Glm convention (tables truncated to d/2 then repeat-interleaved,
    modeling_glm.apply_rotary_pos_emb)."""
    d = arch.rotary_dim
    if arch.glm_rope:
        cos = jnp.repeat(cos[..., : d // 2], 2, axis=-1)
        sin = jnp.repeat(sin[..., : d // 2], 2, axis=-1)
        fn = apply_rope
    else:
        fn = apply_rope_interleave if arch.rope_interleave else apply_rope
    if d >= q.shape[-1]:
        return fn(q, k, cos, sin)
    q1, k1 = fn(q[..., :d], k[..., :d], cos, sin)
    return (jnp.concatenate([q1, q[..., d:]], axis=-1),
            jnp.concatenate([k1, k[..., d:]], axis=-1))


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def causal_mask(t_q: int, t_k: int, dtype=jnp.float32) -> Array:
    i = jax.lax.broadcasted_iota(jnp.int32, (t_q, t_k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t_q, t_k), 1)
    offset = t_k - t_q
    return jnp.where(j <= i + offset, 0.0, jnp.finfo(dtype).min).astype(dtype)


def alibi_slopes(num_heads: int) -> Array:
    """Standard ALiBi head slopes (HF bloom build_alibi_tensor semantics)."""
    import math

    p2 = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(p2) - 3)))
    slopes = [base ** (i + 1) for i in range(p2)]
    if p2 != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * p2) - 3)))
        slopes += [extra_base ** (2 * i + 1) for i in range(num_heads - p2)]
    return jnp.asarray(slopes, jnp.float32)


def alibi_bias(num_heads: int, t_q: int, t_k: int) -> Array:
    """(H, t_q, t_k) additive attention bias: slope_h * key_position_delta
    (relative distance; matches HF bloom where bias = slopes * arange(T)
    broadcast over queries, shifted so the diagonal is 0)."""
    slopes = alibi_slopes(num_heads)  # (H,)
    i = jnp.arange(t_q)[:, None] + (t_k - t_q)
    j = jnp.arange(t_k)[None, :]
    rel = (j - i).astype(jnp.float32)  # <= 0 on the causal part
    return slopes[:, None, None] * rel[None]


def sdpa(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array],
    kv_groups: int = 1,
    matmul_hook: Optional[Callable] = None,
    softmax_hook: Optional[Callable] = None,
    query_scale: float = 0.0,
    softcap: float = 0.0,
) -> Array:
    """Scaled dot-product attention with optional quantization hooks on the
    two matmuls and the softmax (the LlmcMatmul/LlmcSoftmax analogue,
    attn_utils.py:7-60)."""
    scale = query_scale if query_scale else q.shape[-1] ** -0.5
    # dots run in the input dtype (bf16 stays bf16 on the MXU — upcasting
    # K/V to f32 would double decode KV-cache read traffic, measured
    # dominant at serving shapes); accumulation is always f32 and the
    # softmax runs in f32 below.
    if q.dtype == jnp.float32:
        qf, kf, vf = q, k.astype(jnp.float32), v.astype(jnp.float32)
    else:
        qf, kf, vf = q, k.astype(q.dtype), v.astype(q.dtype)
    if matmul_hook is not None:
        qf, kf = matmul_hook("qk", qf, kf)
    if kv_groups > 1:
        # grouped GQA attention: never materialize the repeated K/V —
        # jnp.repeat would write+read kv_groups x the KV cache through HBM
        # (measured dominant in decode); a batched einsum broadcasts instead
        B, H, Tq, D = qf.shape
        nkv = H // kv_groups
        qg = qf.reshape(B, nkv, kv_groups, Tq, D)
        scores = jnp.einsum("bkgqd,bksd->bkgqs", qg, kf,
                            preferred_element_type=jnp.float32) * scale
        scores = scores.reshape(B, H, Tq, -1)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                            preferred_element_type=jnp.float32) * scale
    if softcap:
        scores = softcap * jnp.tanh(scores / softcap)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    if softmax_hook is not None:
        probs = softmax_hook(probs)
    if matmul_hook is not None:
        probs, vf = matmul_hook("pv", probs, vf)
    probs = probs.astype(vf.dtype)
    if kv_groups > 1:
        pg = probs.reshape(B, nkv, kv_groups, Tq, -1)
        out = jnp.einsum("bkgqs,bksd->bkgqd", pg, vf,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, H, Tq, D)
    else:
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vf,
                         preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def apply_rope_interleave(q: Array, k: Array, cos: Array, sin: Array):
    """DeepSeek interleaved-weight rope: de-interleave pairs then standard
    rotate_half (modeling_deepseek_v3.apply_rotary_pos_emb_interleave)."""
    if cos.ndim == 2:
        cos_b = cos[None, None, :, :]
        sin_b = sin[None, None, :, :]
    else:
        cos_b = cos[:, None, :, :]
        sin_b = sin[:, None, :, :]

    def deint(x):
        b, h, t, d = x.shape
        return x.reshape(b, h, t, d // 2, 2).transpose(0, 1, 2, 4, 3).reshape(
            b, h, t, d)

    q = deint(q)
    k = deint(k)
    cos_b = cos_b.astype(q.dtype)
    sin_b = sin_b.astype(q.dtype)
    return (q * cos_b + _rotate_half(q) * sin_b,
            k * cos_b + _rotate_half(k) * sin_b)


def mla_attn_forward(
    arch: ArchSpec,
    ap: Dict,
    x: Array,
    cos: Array,
    sin: Array,
    mask: Optional[Array],
    linear_fn: LinearFn = default_linear,
    feats: Optional[Dict[str, Array]] = None,
    kv_hook: Optional[Callable] = None,
):
    """Multi-head latent attention (HF DeepseekV3Attention semantics).

    Returns (attn_out, (k, v))."""
    mla = arch.mla
    B, T, _ = x.shape
    nh = arch.num_heads
    qk_d, nope, rope_d = mla.qk_head_dim, mla.qk_nope_head_dim, \
        mla.qk_rope_head_dim
    if feats is not None:
        key = "attn.q_a" if mla.q_lora_rank else "attn.q"
        feats[key] = x
        feats["attn.kv_a"] = x
    if mla.q_lora_rank:
        qa = linear_fn("attn.q_a", ap["q_a"]["weight"],
                       ap["q_a"].get("bias"), x)
        qa = rmsnorm(qa, ap["q_a_norm"]["weight"], arch.rms_eps)
        if feats is not None:
            feats["attn.q_b"] = qa
        q_states = linear_fn("attn.q_b", ap["q_b"]["weight"], None, qa)
    else:
        q_states = linear_fn("attn.q", ap["q"]["weight"], None, x)
    q_states = q_states.reshape(B, T, nh, qk_d).transpose(0, 2, 1, 3)
    q_pass, q_rot = q_states[..., :nope], q_states[..., nope:]

    ckv = linear_fn("attn.kv_a", ap["kv_a"]["weight"],
                    ap["kv_a"].get("bias"), x)
    k_pass_c, k_rot = ckv[..., : mla.kv_lora_rank], ckv[..., mla.kv_lora_rank:]
    k_pass_n = rmsnorm(k_pass_c, ap["kv_a_norm"]["weight"], arch.rms_eps)
    if feats is not None:
        feats["attn.kv_b"] = k_pass_n
    kv = linear_fn("attn.kv_b", ap["kv_b"]["weight"], None, k_pass_n)
    kv = kv.reshape(B, T, nh, nope + mla.v_head_dim).transpose(0, 2, 1, 3)
    k_pass, v = kv[..., :nope], kv[..., nope:]
    k_rot = k_rot.reshape(B, 1, T, rope_d)

    if mla.rope_interleave:
        q_rot, k_rot = apply_rope_interleave(q_rot, k_rot, cos, sin)
    else:
        q_rot, k_rot = apply_rope(q_rot, k_rot, cos, sin)
    k_rot = jnp.broadcast_to(k_rot, (B, nh, T, rope_d))

    q = jnp.concatenate([q_pass, q_rot], axis=-1)
    k = jnp.concatenate([k_pass, k_rot], axis=-1)
    if kv_hook is not None:
        out = kv_hook(k, v)
        k, v = out[0], out[1]
    ctx = sdpa(q, k, v, mask, kv_groups=1, query_scale=qk_d**-0.5)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, nh * mla.v_head_dim)
    if feats is not None:
        feats["attn.o"] = ctx
    attn_out = linear_fn("attn.o", ap["o"]["weight"], ap["o"].get("bias"),
                         ctx)
    return attn_out, (k, v)


# ---------------------------------------------------------------------------
# block forward (returns per-linear input features — the hook replacement)
# ---------------------------------------------------------------------------

def _mlp_tail(arch: ArchSpec, bp: Dict, h: Array, linear_fn: LinearFn,
              feats: Dict[str, Array], new_kv):
    """llama-family MLP (dense, MoE, sandwich norms) after the residual."""
    h2 = apply_norm(h, bp["ln2"], arch)
    mp = bp["mlp"]
    rm = arch.residual_multiplier or 1.0
    feats["mlp.gate"] = h2
    feats["mlp.up"] = h2
    if arch.moe is not None and "router" in mp:
        feats["mlp.router"] = h2
        y = h + moe_mlp_forward(arch, mp, h2, linear_fn, feats=feats) * rm
    else:
        g = linear_fn("mlp.gate", mp["gate"]["weight"], mp["gate"].get("bias"), h2)
        u = linear_fn("mlp.up", mp["up"]["weight"], mp["up"].get("bias"), h2)
        mid = _act(g, arch.act_fn) * u
        feats["mlp.down"] = mid
        d = linear_fn("mlp.down", mp["down"]["weight"], mp["down"].get("bias"), mid)
        if arch.sandwich_norms:
            d = apply_norm(d, bp["ln2_post"], arch)
        y = h + d * rm
    return y, feats, new_kv


def block_forward(
    arch: ArchSpec,
    bp: Dict,
    x: Array,
    cos: Optional[Array],
    sin: Optional[Array],
    mask: Optional[Array],
    linear_fn: LinearFn = default_linear,
    kv_hook: Optional[Callable] = None,
    kv_cache: Optional[Tuple[Array, Array]] = None,
    matmul_hook: Optional[Callable] = None,
    softmax_hook: Optional[Callable] = None,
) -> Tuple[Array, Dict[str, Array], Optional[Tuple[Array, Array]]]:
    """One transformer block.  Returns (y, feats, new_kv).

    ``feats`` records the input of every linear, matching the reference's
    input_feat dict keyed like llama.py:52-91 subsets.
    ``kv_hook(k, v) -> (k, v)`` implements KV-cache fake quant.
    """
    feats: Dict[str, Array] = {}
    B, T, H = x.shape
    nh, nkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim

    if arch.family == "llama":
        h1 = apply_norm(x, bp["ln1"], arch)
    else:
        h1 = apply_norm(x, bp["ln1"], arch) if arch.do_layer_norm_before else x

    if arch.mla is not None:
        attn_out, new_kv = mla_attn_forward(
            arch, bp["attn"], h1, cos, sin, mask, linear_fn=linear_fn,
            feats=feats, kv_hook=kv_hook,
        )
        h = x + attn_out
        return _mlp_tail(arch, bp, h, linear_fn, feats, new_kv)

    feats["attn.q"] = h1
    feats["attn.k"] = h1
    feats["attn.v"] = h1

    ap = bp["attn"]
    q = linear_fn("attn.q", ap["q"]["weight"], ap["q"].get("bias"), h1)
    k = linear_fn("attn.k", ap["k"]["weight"], ap["k"].get("bias"), h1)
    v = linear_fn("attn.v", ap["v"]["weight"], ap["v"].get("bias"), h1)
    if "q_norm_full" in ap:  # InternViT: RMSNorm over the full embed dim
        q = rmsnorm(q, ap["q_norm_full"]["weight"], arch.rms_eps)
        k = rmsnorm(k, ap["k_norm_full"]["weight"], arch.rms_eps)
    q = q.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)

    if arch.qk_norm:
        q = rmsnorm(q, ap["q_norm"]["weight"], arch.rms_eps)
        k = rmsnorm(k, ap["k_norm"]["weight"], arch.rms_eps)
    k_pre = k  # pre-rope view (ShadowKV's SVD runs pre-rope, get_svd)
    if cos is not None:
        q, k = rope_apply_arch(arch, q, k, cos, sin)
    if kv_cache is not None:
        pk, pv = kv_cache
        k = jnp.concatenate([pk, k], axis=2)
        v = jnp.concatenate([pv, v], axis=2)
    new_kv = (k, v)
    if kv_hook is not None:
        if getattr(kv_hook, "needs_query", False):
            # query-aware sparse-KV hooks (ShadowKV retrieval): live query
            # + pre-rope K + rope tables for low-rank re-roping
            out = kv_hook(k, v, q=q, k_pre=k_pre, cos=cos, sin=sin)
        else:
            out = kv_hook(k, v)
        if len(out) == 3:  # sparse-KV hooks also modify the attention mask
            k, v, extra_mask = out
            if extra_mask is not None:
                if extra_mask.ndim == 4 and extra_mask.shape[1] not in (1, nh):
                    extra_mask = jnp.repeat(
                        extra_mask, nh // extra_mask.shape[1], axis=1
                    )
                mask = extra_mask if mask is None else mask + extra_mask
        else:
            k, v = out

    ctx = sdpa(q, k, v, mask, kv_groups=nh // nkv,
               matmul_hook=matmul_hook, softmax_hook=softmax_hook,
               query_scale=arch.query_scale, softcap=arch.attn_softcap)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)
    feats["attn.o"] = ctx
    attn_out = linear_fn("attn.o", ap["o"]["weight"], ap["o"].get("bias"), ctx)
    if "ls1" in bp:  # InternViT layer scale (lambda_1)
        attn_out = attn_out * bp["ls1"]

    if arch.sandwich_norms:
        attn_out = apply_norm(attn_out, bp["ln1_post"], arch)
    rm = arch.residual_multiplier or 1.0
    if arch.parallel_residual:
        # falcon/phi decoder: mlp reads the SAME normed input as attention
        # and both residuals add at once (modeling_falcon parallel_attn);
        # falcon new-decoder-architecture norms the mlp branch separately
        # (ln_attn/ln_mlp -> our ln1/ln2)
        mp = bp["mlp"]
        mlp_in = apply_norm(x, bp["ln2"], arch) if arch.parallel_two_norms \
            else h1
        feats["mlp.fc1"] = mlp_in
        f1 = linear_fn("mlp.fc1", mp["fc1"]["weight"], mp["fc1"].get("bias"),
                       mlp_in)
        mid = _act(f1, arch.act_fn)
        feats["mlp.fc2"] = mid
        f2 = linear_fn("mlp.fc2", mp["fc2"]["weight"], mp["fc2"].get("bias"),
                       mid)
        return x + attn_out + f2, feats, new_kv
    if arch.family == "opt" and not arch.do_layer_norm_before:
        attn_out = apply_norm(x + attn_out, bp["ln1"], arch)
        h = attn_out
    else:
        h = x + attn_out * rm

    if arch.family == "llama":
        y, feats, new_kv = _mlp_tail(arch, bp, h, linear_fn, feats, new_kv)
        return y, feats, new_kv
    else:
        h2 = apply_norm(h, bp["ln2"], arch) if arch.do_layer_norm_before else h
        mp = bp["mlp"]
        feats["mlp.fc1"] = h2
        f1 = linear_fn("mlp.fc1", mp["fc1"]["weight"], mp["fc1"].get("bias"), h2)
        mid = _act(f1, arch.act_fn)
        feats["mlp.fc2"] = mid
        f2 = linear_fn("mlp.fc2", mp["fc2"]["weight"], mp["fc2"].get("bias"), mid)
        if "ls2" in bp:  # InternViT layer scale (lambda_2)
            f2 = f2 * bp["ls2"]
        y = h + f2
        if not arch.do_layer_norm_before:
            y = apply_norm(y, bp["ln2"], arch)
    return y, feats, new_kv


# ---------------------------------------------------------------------------
# sub-module "inspect" forwards (for AWQ grid search etc., awq.py:110-126)
# ---------------------------------------------------------------------------

def attn_inspect(
    arch: ArchSpec,
    bp: Dict,
    x: Array,
    cos: Optional[Array],
    sin: Optional[Array],
    mask: Optional[Array],
    linear_fn: LinearFn = default_linear,
) -> Array:
    """self_attn sub-forward: x is the post-ln1 hidden states."""
    if arch.mla is not None:
        return mla_attn_forward(arch, bp["attn"], x, cos, sin, mask,
                                linear_fn=linear_fn)[0]
    B, T, _ = x.shape
    nh, nkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim
    ap = bp["attn"]
    q = linear_fn("attn.q", ap["q"]["weight"], ap["q"].get("bias"), x)
    k = linear_fn("attn.k", ap["k"]["weight"], ap["k"].get("bias"), x)
    v = linear_fn("attn.v", ap["v"]["weight"], ap["v"].get("bias"), x)
    q = q.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)
    if arch.qk_norm:
        q = rmsnorm(q, ap["q_norm"]["weight"], arch.rms_eps)
        k = rmsnorm(k, ap["k_norm"]["weight"], arch.rms_eps)
    if cos is not None:
        q, k = rope_apply_arch(arch, q, k, cos, sin)
    ctx = sdpa(q, k, v, mask, kv_groups=nh // nkv,
               query_scale=arch.query_scale, softcap=arch.attn_softcap)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)
    return linear_fn("attn.o", ap["o"]["weight"], ap["o"].get("bias"), ctx)


def moe_route(m: MoESpec, lf: Array,
              router_bias: Optional[Array] = None):
    """Router selection from (n, E) f32 logits -> (topi (n, k) int32,
    topw (n, k) f32).  DeepseekV3TopkRouter / MixtralSparseMoeBlock
    semantics: sigmoid|softmax scoring, + e_score_correction_bias on the
    SELECTION scores only, optional group-limited top-k, norm_topk_prob,
    routed_scaling_factor.  Shared by the calibration forward
    (``moe_mlp_forward``) and the serving decode step (serving/engine.py)
    so routing can never diverge between the two."""
    if m.gating == "sigmoid":
        scores = jax.nn.sigmoid(lf)
    else:
        scores = jax.nn.softmax(lf, axis=-1)
    # selection scores: + e_score_correction_bias, optionally group-limited
    # (DeepseekV3TopkRouter); combination WEIGHTS use the raw scores
    sel = scores
    if router_bias is not None:
        sel = sel + router_bias.astype(jnp.float32)[None, :]
    if m.n_group > 1:
        n = sel.shape[0]
        gsize = m.num_experts // m.n_group
        grouped = sel.reshape(n, m.n_group, gsize)
        group_scores = jnp.sum(jax.lax.top_k(grouped, 2)[0], axis=-1)
        gidx = jax.lax.top_k(group_scores, m.topk_group)[1]
        gmask = jnp.zeros((n, m.n_group), jnp.float32)
        gmask = gmask.at[jnp.arange(n)[:, None], gidx].set(1.0)
        sel = jnp.where(
            jnp.repeat(gmask, gsize, axis=1) > 0, sel, -jnp.inf
        )
    topi = jax.lax.top_k(sel, m.top_k)[1]
    topw = jnp.take_along_axis(scores, topi, axis=-1)
    if m.norm_topk_prob:
        topw = topw / jnp.clip(jnp.sum(topw, axis=-1, keepdims=True), 1e-9,
                               None)
    return topi, topw * m.routed_scaling_factor


def moe_mlp_forward(
    arch: ArchSpec,
    mp: Dict,
    x: Array,
    linear_fn: LinearFn = default_linear,
    feats: Optional[Dict[str, Array]] = None,
) -> Array:
    """Mixture-of-experts MLP: dense-compute all experts (one stacked einsum
    per projection — MXU-friendly; EP shards the leading expert dim), then
    combine by the router's top-k weights."""
    m = arch.moe
    B, T, H = x.shape
    logits = linear_fn("mlp.router", mp["router"]["weight"], None, x)
    lf = logits.reshape(-1, m.num_experts).astype(jnp.float32)
    topi, topw = moe_route(m, lf, mp.get("router_bias"))

    g = linear_fn("mlp.gate", mp["gate"]["weight"], None, x)  # (E,B,T,I)
    u = linear_fn("mlp.up", mp["up"]["weight"], None, x)
    mid = _act(g, arch.act_fn) * u
    if feats is not None:
        feats["mlp.down"] = mid
    d = linear_fn("mlp.down", mp["down"]["weight"], None, mid)  # (E,B,T,H)

    n = B * T
    w_full = jnp.zeros((n, m.num_experts), jnp.float32)
    w_full = w_full.at[jnp.arange(n)[:, None], topi].set(topw)
    y = jnp.einsum(
        "enh,ne->nh", d.reshape(m.num_experts, n, H).astype(jnp.float32),
        w_full,
    ).reshape(B, T, H).astype(x.dtype)

    if "shared_gate" in mp:
        if feats is not None:
            feats["mlp.shared_gate"] = x
            feats["mlp.shared_up"] = x
        sg = linear_fn("mlp.shared_gate", mp["shared_gate"]["weight"], None, x)
        su = linear_fn("mlp.shared_up", mp["shared_up"]["weight"], None, x)
        smid = _act(sg, arch.act_fn) * su
        if feats is not None:
            feats["mlp.shared_down"] = smid
        y = y + linear_fn(
            "mlp.shared_down", mp["shared_down"]["weight"], None, smid
        )
    return y


def mlp_inspect(
    arch: ArchSpec, bp: Dict, x: Array, linear_fn: LinearFn = default_linear
) -> Array:
    mp = bp["mlp"]
    if arch.family == "llama" and arch.moe is not None and "router" in mp:
        return moe_mlp_forward(arch, mp, x, linear_fn)
    if arch.family == "llama":
        g = linear_fn("mlp.gate", mp["gate"]["weight"], mp["gate"].get("bias"), x)
        u = linear_fn("mlp.up", mp["up"]["weight"], mp["up"].get("bias"), x)
        mid = _act(g, arch.act_fn) * u
        return linear_fn("mlp.down", mp["down"]["weight"], mp["down"].get("bias"), mid)
    f1 = linear_fn("mlp.fc1", mp["fc1"]["weight"], mp["fc1"].get("bias"), x)
    return linear_fn("mlp.fc2", mp["fc2"]["weight"], mp["fc2"].get("bias"), _act(f1, arch.act_fn))


def linear_inspect(
    bp: Dict, name: str, x: Array, linear_fn: LinearFn = default_linear
) -> Array:
    p = _resolve(bp, name)
    return linear_fn(name, p["weight"], p.get("bias"), x)


def _resolve(tree: Dict, dotted: str) -> Dict:
    # canonical param paths use short names: attn.q == params['attn']['q']
    node = tree
    for part in dotted.split("."):
        node = node[part]
    return node


# ---------------------------------------------------------------------------
# whole-model forward
# ---------------------------------------------------------------------------

def embed_forward(arch: ArchSpec, params: Dict, input_ids: Array) -> Array:
    x = params["embed"]["weight"][input_ids]
    if arch.embed_scale:
        x = x * jnp.asarray(arch.hidden_size**0.5, x.dtype)
    if arch.embed_multiplier:
        x = x * jnp.asarray(arch.embed_multiplier, x.dtype)
    if arch.family == "opt" and arch.learned_pos:
        T = input_ids.shape[-1]
        pos = jnp.arange(T) + arch.pos_offset
        x = x + params["embed_pos"]["weight"][pos]
    if arch.embed_norm and "embed_norm" in params:
        x = apply_norm(x, params["embed_norm"], arch)
    return x


def head_forward(arch: ArchSpec, params: Dict, x: Array) -> Array:
    x = apply_norm(x, params["norm"], arch)
    w = (
        params["embed"]["weight"]
        if arch.tie_word_embeddings
        else params["lm_head"]["weight"]
    )
    if arch.logit_divisor:
        x = x / jnp.asarray(arch.logit_divisor, x.dtype)
    logits = jnp.einsum("...i,oi->...o", x, w,
                        preferred_element_type=jnp.float32)
    if not arch.tie_word_embeddings and arch.head_bias:
        b = params["lm_head"].get("bias")
        if b is not None:
            logits = logits + b.astype(logits.dtype)
    if arch.final_softcap:
        logits = arch.final_softcap * jnp.tanh(logits / arch.final_softcap)
    return logits


def model_forward(
    arch: ArchSpec,
    params: Dict,
    input_ids: Array,
    linear_fns: Optional[List[LinearFn]] = None,
    kv_hooks: Optional[List[Optional[Callable]]] = None,
    matmul_hook: Optional[Callable] = None,
    softmax_hook: Optional[Callable] = None,
) -> Array:
    """Full causal-LM forward returning float32 logits."""
    B, T = input_ids.shape
    x = embed_forward(arch, params, input_ids)
    mask = causal_mask(T, T)
    if arch.alibi:
        mask = mask[None] + alibi_bias(arch.num_heads, T, T)  # (H, T, T)
    if arch.rope_enabled:
        cos, sin = rope_cos_sin(arch, jnp.arange(T))
    else:
        cos = sin = None
    for idx, bp in enumerate(params["blocks"]):
        lf = linear_fns[idx] if linear_fns is not None else default_linear
        kh = kv_hooks[idx] if kv_hooks is not None else None
        x, _, _ = block_forward(arch, bp, x, cos, sin, mask, linear_fn=lf,
                                kv_hook=kh, matmul_hook=matmul_hook,
                                softmax_hook=softmax_hook)
    return head_forward(arch, params, x)
