"""Pure-JAX quantizer core.

Functional re-design of the reference quantizer classes
(llmc/compression/quantization/quant.py:46-1369):

- ``IntegerQuantizer`` semantics  -> int path of these functions
  (quant.py:661-960): sym/asym INT2-16, custom int_range, round_zp,
  mixed int/fp outlier columns, static/dynamic fake + real quant.
- ``FloatQuantizer`` semantics    -> float path (quant.py:963-1229):
  e4m3/e5m2/e3m2/e2m1/e4m7 with bit-exact RNE rounding emulation in pure JAX
  (the qtorch ``float_quantize`` equivalent, no CUDA extension needed).
- granularity reshape             -> ``reshape_tensor``/``restore_tensor``
  (quant.py:612-658) for per_tensor/per_channel/per_group/per_head/per_block.
- calib ranges                    -> minmax (quant.py:132-143),
  mse shrink-grid (quant.py:145-203), static minmax / moving minmax
  (quant.py:253-263,524-543), hqq proximal (quant.py:588-610).

Everything is jittable with ``spec`` static; no Python-level data-dependent
control flow (the MSE grid is a ``lax.fori_loop``, HQQ a ``lax.while_loop``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .spec import QuantSpec


class QParams(NamedTuple):
    """Quantization parameters for one tensor (already in grouped 2D view)."""

    scales: jax.Array
    zeros: jax.Array  # 0.0 scalar when symmetric


# ---------------------------------------------------------------------------
# granularity reshaping (quant.py:612-658)
# ---------------------------------------------------------------------------

def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def reshape_tensor(t: jax.Array, spec: QuantSpec, allow_padding: bool = False):
    """Reshape to the 2D (rows = quantization groups) view."""
    if spec.granularity == "per_group":
        if t.shape[-1] >= spec.group_size:
            if t.shape[-1] % spec.group_size == 0:
                return t.reshape(-1, spec.group_size)
            if allow_padding:
                deficiency = spec.group_size - t.shape[-1] % spec.group_size
                pad = [(0, 0)] * (t.ndim - 1) + [(0, deficiency)]
                return jnp.pad(t, pad).reshape(-1, spec.group_size)
            raise ValueError(
                f"dim {t.shape[-1]} not divisible by group size {spec.group_size}"
            )
        return t
    if spec.granularity == "per_head":
        return t.reshape(spec.head_num, -1)
    if spec.granularity == "per_block":
        m, n = t.shape
        bs = spec.block_size
        mp, np_ = _cdiv(m, bs) * bs, _cdiv(n, bs) * bs
        tp = jnp.zeros((mp, np_), dtype=t.dtype).at[:m, :n].set(t)
        return tp.reshape(mp // bs, bs, np_ // bs, bs)
    return t


def restore_tensor(t: jax.Array, shape: Tuple[int, ...], spec: QuantSpec):
    if t.shape == shape:
        return t
    if spec.granularity == "per_block":
        mp = t.shape[0] * t.shape[1]
        return t.reshape(mp, -1)[: shape[0], : shape[1]]
    n = 1
    for s in shape:
        n *= s
    if t.size == n:
        return t.reshape(shape)
    # padded per_group case
    flat = t.reshape(*shape[:-1], -1)
    return flat[..., : shape[-1]]


# ---------------------------------------------------------------------------
# ranges
# ---------------------------------------------------------------------------

def minmax_range(t: jax.Array, spec: QuantSpec):
    """quant.py:132-143 (note: per_block uses abs-amin/amax by design)."""
    if spec.granularity == "per_tensor":
        return jnp.min(t), jnp.max(t)
    if spec.granularity == "per_block":
        a = jnp.abs(t).astype(jnp.float32)
        return (
            jnp.min(a, axis=(1, 3), keepdims=True),
            jnp.max(a, axis=(1, 3), keepdims=True),
        )
    return (
        jnp.min(t, axis=-1, keepdims=True),
        jnp.max(t, axis=-1, keepdims=True),
    )


def mse_range(t: jax.Array, spec: QuantSpec, norm: float = 2.4):
    """Shrink-grid MSE range search (quant.py:145-203), fully vectorized over
    rows; the grid is a compiled fori_loop instead of a Python loop."""
    t = t.astype(jnp.float32)
    mn, mx = minmax_range(t, spec)
    n_steps = int(spec.maxshrink * spec.mse_grid)

    def body(i, carry):
        best_err, best_mn, best_mx = carry
        p = 1.0 - i.astype(jnp.float32) / spec.mse_grid
        xmin, xmax = p * mn, p * mx
        qp = qparams_from_range((xmin, xmax), spec)
        q = quant_dequant(t, qp, spec)
        err = jnp.sum(jnp.abs(q - t) ** norm, axis=-1, keepdims=True)
        if spec.granularity == "per_tensor":
            err = jnp.sum(err)
        better = err < best_err
        return (
            jnp.where(better, err, best_err),
            jnp.where(better, xmin, best_mn),
            jnp.where(better, xmax, best_mx),
        )

    if spec.granularity == "per_tensor":
        init_err = jnp.asarray(jnp.inf, jnp.float32)
    else:
        init_err = jnp.full(mn.shape, jnp.inf, jnp.float32)
    _, best_mn, best_mx = jax.lax.fori_loop(
        0, n_steps, body, (init_err, mn, mx)
    )
    return best_mn, best_mx


def learnable_range(
    t: jax.Array,
    spec: QuantSpec,
    lowbound_factor: Optional[jax.Array] = None,
    upbound_factor: Optional[jax.Array] = None,
):
    """Sigmoid-factored learnable range (quant.py:205-219), used by
    OmniQuant-style learnable weight clipping."""
    mn, mx = minmax_range(t, spec)
    if spec.symmetric:
        if upbound_factor is not None:
            amax = jnp.maximum(jnp.abs(mx), jnp.abs(mn))
            amax = jnp.clip(amax, 1e-5, None) * jax.nn.sigmoid(upbound_factor)
            return -amax, amax
        return mn, mx
    if upbound_factor is not None and lowbound_factor is not None:
        return jax.nn.sigmoid(lowbound_factor) * mn, jax.nn.sigmoid(upbound_factor) * mx
    return mn, mx


def get_tensor_range(t: jax.Array, spec: QuantSpec, args: Optional[dict] = None):
    args = args or {}
    if spec.calib_algo == "mse":
        return mse_range(t, spec)
    if spec.calib_algo == "learnable":
        return learnable_range(
            t, spec, args.get("lowbound_factor"), args.get("upbound_factor")
        )
    return minmax_range(t, spec)


# ---------------------------------------------------------------------------
# qparams
# ---------------------------------------------------------------------------

def qparams_from_range(tensor_range, spec: QuantSpec) -> QParams:
    """quant.py:545-559 — scale/zero-point from a (min, max) range."""
    mn, mx = tensor_range
    qmin, qmax = spec.qmin, spec.qmax
    if spec.symmetric or spec.is_float:
        amax = jnp.maximum(jnp.abs(mx), jnp.abs(mn))
        amax = jnp.clip(amax, 1e-5, None)
        scales = amax / qmax
        zeros = jnp.asarray(0.0, jnp.float32)
    else:
        scales = jnp.clip(mx - mn, 1e-5, None) / (qmax - qmin)
        if spec.round_zp:
            zeros = jnp.clip(qmin - jnp.round(mn / scales), qmin, qmax)
        else:
            zeros = qmin - (mn / scales)
    return QParams(scales, zeros)


# ---------------------------------------------------------------------------
# float rounding emulation (pure-JAX qtorch.float_quantize equivalent)
# ---------------------------------------------------------------------------

def float_round(x: jax.Array, e_bits: int, m_bits: int, qmax: float) -> jax.Array:
    """Round-to-nearest-even into an (e_bits, m_bits) float format with
    saturation; handles subnormals.  Replaces the CUDA qtorch extension
    (quant.py:8-15,1061-1072) with exponent/mantissa math."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x = jnp.clip(x, -qmax, qmax)
    bias = 2 ** (e_bits - 1) - 1
    min_norm_exp = 1 - bias
    ax = jnp.abs(x)
    # floor(log2(ax)), safe at 0; exact for powers of two via frexp
    mant, exp = jnp.frexp(ax)  # ax = mant * 2**exp, mant in [0.5, 1)
    e = exp - 1  # floor(log2(ax)) for ax > 0
    e = jnp.maximum(e, min_norm_exp)
    # exact power-of-two quantum (exp2 is an approximate VPU polynomial)
    quantum = jnp.ldexp(jnp.ones_like(x), e - m_bits)
    q = jnp.round(x / quantum) * quantum
    q = jnp.clip(q, -qmax, qmax)
    return jnp.where(ax == 0, jnp.zeros_like(q), q).astype(dtype)


# ---------------------------------------------------------------------------
# quant / dequant
# ---------------------------------------------------------------------------

def quantize(
    t: jax.Array,
    qp: QParams,
    spec: QuantSpec,
    rounding: Optional[jax.Array] = None,
) -> jax.Array:
    """To integer codes (float32-valued) or float-format values.

    ``rounding``: optional additive rounding mask in [0,1] replacing
    round() with floor()+mask (TesseraQ, quant.py:797-799).
    """
    scales, zeros = qp
    if spec.is_float:
        safe = jnp.where(scales == 0, 1.0, scales)
        return float_round(t / safe + zeros, spec.e_bits, spec.m_bits, spec.qmax)
    if rounding is not None:
        rounded = jnp.floor(t / scales) + rounding
        return jnp.clip(rounded + zeros, spec.qmin, spec.qmax)
    if spec.round_zp:
        return jnp.clip(_round(t / scales, spec) + zeros, spec.qmin, spec.qmax)
    return jnp.clip(
        _round(t / jnp.clip(scales, 1e-9, None) + zeros, spec),
        spec.qmin,
        spec.qmax,
    )


def _round(x: jax.Array, spec: QuantSpec) -> jax.Array:
    if spec.ste:
        # straight-through estimator: identity gradient (quant.py:63-64)
        return x + jax.lax.stop_gradient(jnp.round(x) - x)
    return jnp.round(x)


def dequantize(q: jax.Array, qp: QParams) -> jax.Array:
    scales, zeros = qp
    return (q - zeros) * scales


def quant_dequant(
    t: jax.Array,
    qp: QParams,
    spec: QuantSpec,
    output_scale_factor: float = 1.0,
    rounding: Optional[jax.Array] = None,
) -> jax.Array:
    q = quantize(t, qp, spec, rounding=rounding)
    if output_scale_factor != 1.0:
        qp = QParams(qp.scales * output_scale_factor, qp.zeros)
    return dequantize(q, qp)


# ---------------------------------------------------------------------------
# hqq proximal optimization (quant.py:588-610)
# ---------------------------------------------------------------------------

def _shrink(x: jax.Array, beta: jax.Array, lp_norm: float) -> jax.Array:
    if lp_norm == 1:
        return jnp.sign(x) * jax.nn.relu(jnp.abs(x) - 1.0 / beta)
    return jnp.sign(x) * jax.nn.relu(
        jnp.abs(x) - (1.0 / beta) * jnp.abs(x) ** (lp_norm - 1)
    )


def hqq_optimize(t: jax.Array, qp: QParams, spec: QuantSpec) -> QParams:
    """Half-quadratic proximal zero-point optimization; data-dependent early
    stop expressed as a lax.while_loop."""
    inv_scales = 1.0 / qp.scales
    qmin, qmax = spec.qmin, spec.qmax

    def cond(carry):
        i, _, _, _, done = carry
        return jnp.logical_and(i < spec.iters, jnp.logical_not(done))

    def body(carry):
        i, zeros, beta, best_err, _ = carry
        w_q = jnp.clip(jnp.round(t * inv_scales + zeros), qmin, qmax)
        w_r = (w_q - zeros) * qp.scales
        w_e = _shrink(t - w_r, beta, spec.lp_norm)
        new_zeros = jnp.mean(w_q - (t - w_e) * inv_scales, axis=-1, keepdims=True)
        err = jnp.mean(jnp.abs(t - w_r))
        improved = err < best_err
        return (
            i + 1,
            new_zeros,
            beta * spec.kappa,
            jnp.where(improved, err, best_err),
            jnp.logical_not(improved),
        )

    _, zeros, _, _, _ = jax.lax.while_loop(
        cond,
        body,
        (0, qp.zeros * jnp.ones_like(qp.scales), jnp.asarray(spec.beta, jnp.float32),
         jnp.asarray(1e4, jnp.float32), jnp.asarray(False)),
    )
    return QParams(qp.scales, zeros)


# ---------------------------------------------------------------------------
# top-level qparam computation (quant.py:690-697,1043-1059)
# ---------------------------------------------------------------------------

def _ref_manual_float_qdq(t2: jax.Array, spec: QuantSpec, rng) -> jax.Array:
    """The reference's manual (non-qtorch) float fake quant
    (get_float_qparams, quant.py:1005-1027 + quant :1061-1076): per-element
    power-of-two scale from the element's exponent, biased so the row max
    maps to the top of a generic (2-2^-m)*2^(2^e-1) grid, then plain
    round()."""
    import numpy as _np

    mn, mx = rng
    maxval = jnp.maximum(mx, -mn)
    e, m = float(spec.e_bits), float(spec.m_bits)
    bias = (2.0 ** e) - jnp.log2(maxval) + _np.log2(2.0 - 2.0 ** (-m)) - 1.0
    xc = jnp.clip(t2, -maxval, maxval)
    log_scales = jnp.clip(
        jnp.floor(jnp.log2(jnp.abs(xc)) + bias), 1.0, None)
    scales = 2.0 ** (log_scales - m - bias)
    return jnp.round(xc / scales) * scales


def get_tensor_qparams(t: jax.Array, spec: QuantSpec, args: Optional[dict] = None):
    """Returns (reshaped_tensor, QParams)."""
    t2 = reshape_tensor(t, spec)
    if spec.calib_algo == "hqq":
        t2 = t2.astype(jnp.float32)
        qp = qparams_from_range(minmax_range(t2, spec), spec)
        qp = hqq_optimize(t2, qp, spec)
        return t2, qp
    rng = get_tensor_range(t2, spec, args)
    return t2, qparams_from_range(rng, spec)


# ---------------------------------------------------------------------------
# fake quant: weights (quant.py:785-869,1111-1159)
# ---------------------------------------------------------------------------

def fake_quant_weight_dynamic(
    w: jax.Array,
    spec: QuantSpec,
    dim_ic: bool = False,
    int_indices: Optional[Sequence[int]] = None,
    fp_indices: Optional[Sequence[int]] = None,
    args: Optional[dict] = None,
) -> jax.Array:
    """Per-call qparam computation then qdq.  ``dim_ic`` quantizes along input
    channels (AdaDim); ``int_indices``/``fp_indices`` keep outlier columns in
    float (LLM.int8/QUIK)."""
    if int_indices is not None:
        qw = fake_quant_weight_dynamic(w[:, jnp.asarray(int_indices)], spec, args=args)
        out = jnp.zeros_like(w)
        out = out.at[:, jnp.asarray(int_indices)].set(qw)
        out = out.at[:, jnp.asarray(fp_indices)].set(w[:, jnp.asarray(fp_indices)])
        return out
    qw = w.T if dim_ic else w
    shape, dtype = qw.shape, qw.dtype
    if spec.is_float and spec.float_mode == "ref_manual":
        t2 = reshape_tensor(qw, spec)
        q = _ref_manual_float_qdq(t2, spec, get_tensor_range(t2, spec, args))
    else:
        t2, qp = get_tensor_qparams(qw, spec, args)
        q = quant_dequant(t2, qp, spec)
    q = restore_tensor(q, shape, spec).astype(dtype)
    return q.T if dim_ic else q


def fake_quant_weight_static(
    w: jax.Array,
    spec: QuantSpec,
    qp: QParams,
    dim_ic: bool = False,
    output_scale_factor: float = 1.0,
    rounding: Optional[jax.Array] = None,
) -> jax.Array:
    qw = w.T if dim_ic else w
    shape, dtype = qw.shape, qw.dtype
    t2 = reshape_tensor(qw, spec)
    q = quant_dequant(t2, qp, spec, output_scale_factor, rounding=rounding)
    q = restore_tensor(q, shape, spec).astype(dtype)
    return q.T if dim_ic else q


# ---------------------------------------------------------------------------
# fake quant: activations (quant.py:719-783,1083-1109)
# ---------------------------------------------------------------------------

def fake_quant_act_dynamic(
    x: jax.Array,
    spec: QuantSpec,
    int_indices: Optional[Sequence[int]] = None,
    fp_indices: Optional[Sequence[int]] = None,
    args: Optional[dict] = None,
) -> jax.Array:
    if int_indices is not None:
        qx = fake_quant_act_dynamic(x[..., jnp.asarray(int_indices)], spec, args=args)
        out = jnp.zeros_like(x)
        out = out.at[..., jnp.asarray(int_indices)].set(qx)
        out = out.at[..., jnp.asarray(fp_indices)].set(x[..., jnp.asarray(fp_indices)])
        return out
    shape, dtype = x.shape, x.dtype
    if spec.is_float and spec.float_mode == "ref_manual":
        t2 = reshape_tensor(x, spec)
        q = _ref_manual_float_qdq(t2, spec, get_tensor_range(t2, spec, args))
    else:
        t2, qp = get_tensor_qparams(x, spec, args)
        q = quant_dequant(t2, qp, spec)
    return restore_tensor(q, shape, spec).astype(dtype)


def fake_quant_act_static(x: jax.Array, spec: QuantSpec, qp: QParams) -> jax.Array:
    shape, dtype = x.shape, x.dtype
    t2 = reshape_tensor(x, spec)
    q = quant_dequant(t2, qp, spec)
    return restore_tensor(q, shape, spec).astype(dtype)


# ---------------------------------------------------------------------------
# real quant (quant.py:871-953,1161-1221)
# ---------------------------------------------------------------------------

def _int_store_dtype(spec: QuantSpec):
    if spec.is_float:
        return jnp.float8_e4m3fn if spec.bit == "e4m3" else jnp.float8_e5m2
    if spec.bit == 8:
        return jnp.int8 if spec.qmin != 0 else jnp.uint8
    if spec.bit == 4:
        return jnp.int8  # packed later by the exporter (2 nibbles / byte)
    return jnp.int32


def real_quant_weight(
    w: jax.Array,
    spec: QuantSpec,
    qp: Optional[QParams] = None,
    output_scale_factor: float = 1.0,
):
    """Quantize to storage codes.  Returns (codes, scales, zeros|None) with
    qparams viewed per-row (quant.py:903-914)."""
    if spec.is_float and spec.bit not in ("e4m3", "e5m2"):
        raise ValueError("only e4m3/e5m2 support real quant (quant.py:1162)")
    shape = w.shape
    if qp is None:
        t2, qp = get_tensor_qparams(w, spec)
    else:
        t2 = reshape_tensor(w, spec)
    q = quantize(t2, qp, spec)
    q = restore_tensor(q, shape, spec)
    scales = qp.scales * output_scale_factor
    store = _int_store_dtype(spec)
    q = q.astype(store)
    zeros = qp.zeros
    if spec.symmetric or spec.is_float:
        zeros = None
    elif spec.round_zp:
        zeros = zeros.astype(store)
    if spec.granularity == "per_tensor":
        qshape = (1,)
    elif spec.granularity == "per_block":
        qshape = (scales.shape[0], scales.shape[2])
    else:
        qshape = (shape[0], -1)
    scales = scales.reshape(qshape)
    if zeros is not None:
        zeros = zeros.reshape(qshape)
    return q, scales, zeros


# ---------------------------------------------------------------------------
# static activation calibration over batches (quant.py:221-263,524-586)
# ---------------------------------------------------------------------------

def static_minmax_range(batches: Sequence[jax.Array], spec: QuantSpec):
    """Mean of per-batch minmax ranges (quant.py:253-263)."""
    mins, maxs = [], []
    for b in batches:
        t2 = reshape_tensor(b, spec)
        mn, mx = minmax_range(t2, spec)
        mins.append(jnp.min(mn))
        maxs.append(jnp.max(mx))
    return (
        jnp.mean(jnp.stack(mins)),
        jnp.mean(jnp.stack(maxs)),
    )


def static_moving_minmax_range(
    batches: Sequence[jax.Array], spec: QuantSpec, alpha: float = 0.01
):
    """EMA of per-batch ranges (quant.py:524-543)."""
    mmn = mmx = None
    for b in batches:
        t2 = reshape_tensor(b, spec)
        mn, mx = minmax_range(t2, spec)
        if mmn is None:
            mmn, mmx = mn, mx
        else:
            mmn = mmn + alpha * (mn - mmn)
            mmx = mmx + alpha * (mx - mmx)
    return mmn, mmx


def static_act_qparams(
    batches: Sequence[jax.Array], spec: QuantSpec, alpha: float = 0.01
) -> QParams:
    """Static activation qparams over calib batches (quant.py:561-586)."""
    algo = spec.calib_algo
    if algo in ("static_minmax", "minmax", "mse"):
        rng = static_minmax_range(batches, spec)
    elif algo == "static_moving_minmax":
        rng = static_moving_minmax_range(batches, spec, alpha)
    elif algo == "static_hist":
        from .hist import static_hist_range

        rng = static_hist_range(batches, spec)
    else:
        raise ValueError(f"unsupported static act calib {algo!r}")
    return qparams_from_range(rng, spec)


# ---------------------------------------------------------------------------
# Weight48 double quantization (DGQ; quant.py:1232-1369)
# ---------------------------------------------------------------------------

def fake_quant_weight_w48(w: jax.Array, spec8: QuantSpec, spec4: QuantSpec):
    """INT8 outer (per-channel) then INT4 inner (per-group) double quant."""
    shape16, dtype16 = w.shape, w.dtype
    t8 = reshape_tensor(w, spec8)
    qp8 = qparams_from_range(minmax_range(t8, spec8), spec8)
    q8 = quantize(t8, qp8, spec8)

    shape8 = q8.shape
    t4 = reshape_tensor(q8, spec4)
    qp4 = qparams_from_range(minmax_range(t4, spec4), spec4)
    q4 = quantize(t4, qp4, spec4)

    d8 = dequantize(q4, qp4)
    d8 = restore_tensor(d8, shape8, spec4)
    d16 = dequantize(d8, qp8)
    return restore_tensor(d16, shape16, spec8).astype(dtype16)


# ---------------------------------------------------------------------------
# FP8 block-wise weight round-trip (quant.py:18-43, kernel.py:56-138)
# ---------------------------------------------------------------------------

FP8_BLOCK_SPEC = QuantSpec(
    bit="e4m3", symmetric=True, granularity="per_block", block_size=128
)


def weight_cast_to_fp8(w: jax.Array, block_size: int = 128):
    """128x128-block E4M3 quantization; returns (fp8 codes, inv scales)."""
    spec = FP8_BLOCK_SPEC.with_(block_size=block_size)
    q, scales, _ = real_quant_weight(w.astype(jnp.float32), spec)
    return q, scales.astype(jnp.float32)


def weight_cast_to_bf16(q: jax.Array, scales: jax.Array, block_size: int = 128):
    """Dequantize block-FP8 weights back to bf16."""
    m, n = q.shape
    spec = FP8_BLOCK_SPEC.with_(block_size=block_size)
    t2 = reshape_tensor(q.astype(jnp.float32), spec)
    s = scales.reshape(scales.shape[0], 1, scales.shape[1], 1)
    d = t2 * s
    return restore_tensor(d, (m, n), spec).astype(jnp.bfloat16)
