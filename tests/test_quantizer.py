"""Golden tests for the quantizer core against analytical values and the
reference's semantics (llmc/compression/quantization/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightcompress_tpu.quant import (
    QParams,
    QuantSpec,
    fake_quant_act_dynamic,
    fake_quant_weight_dynamic,
    fake_quant_weight_w48,
    float_round,
    get_tensor_qparams,
    qparams_from_range,
    quant_dequant,
    real_quant_weight,
    reshape_tensor,
    restore_tensor,
    static_act_qparams,
    weight_cast_to_bf16,
    weight_cast_to_fp8,
)


def test_reshape_per_group():
    spec = QuantSpec(bit=4, granularity="per_group", group_size=4)
    t = jnp.arange(24.0).reshape(2, 12)
    r = reshape_tensor(t, spec)
    assert r.shape == (6, 4)
    back = restore_tensor(r, (2, 12), spec)
    np.testing.assert_array_equal(back, t)


def test_reshape_per_group_padding():
    spec = QuantSpec(bit=4, granularity="per_group", group_size=5)
    t = jnp.arange(14.0).reshape(2, 7)
    r = reshape_tensor(t, spec, allow_padding=True)
    assert r.shape == (4, 5)
    back = restore_tensor(r, (2, 7), spec)
    np.testing.assert_array_equal(back, t)


def test_int8_symmetric_roundtrip():
    spec = QuantSpec(bit=8, symmetric=True, granularity="per_channel")
    w = jnp.array([[1.0, -2.0, 0.5], [4.0, 2.0, -1.0]])
    t2, qp = get_tensor_qparams(w, spec)
    # per-channel scales = amax/127
    np.testing.assert_allclose(np.asarray(qp.scales).ravel(), [2 / 127, 4 / 127], rtol=1e-6)
    q = quant_dequant(t2, qp, spec)
    assert jnp.max(jnp.abs(q - w)) < 4 / 127  # within one quantum


def test_int4_asym_values():
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_channel")
    w = jnp.array([[0.0, 15.0]])
    q = fake_quant_weight_dynamic(w, spec)
    # scale = 1.0, zero = 0 -> values representable exactly
    np.testing.assert_allclose(np.asarray(q), [[0.0, 15.0]], atol=1e-6)


def test_asym_zero_point():
    spec = QuantSpec(bit=8, symmetric=False, granularity="per_tensor")
    w = jnp.array([[2.0, 4.0]])
    t2, qp = get_tensor_qparams(w, spec)
    # scale=(4-2)/255, zp = clip(0 - round(2/s)) -> clipped to 0 then quant clamps
    q = quant_dequant(t2, qp, spec)
    assert np.asarray(q).max() <= 4.0 + 1e-5


def test_fake_quant_identity_high_bits():
    # 16-bit quantization should be nearly lossless
    spec = QuantSpec(bit=16, symmetric=True, granularity="per_channel")
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 32))
    q = fake_quant_weight_dynamic(w, spec)
    np.testing.assert_allclose(np.asarray(q), np.asarray(w), atol=1e-3)


def test_mse_range_beats_or_matches_minmax_on_outliers():
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (4, 64))
    w = w.at[0, 0].set(30.0)  # big outlier
    minmax = QuantSpec(bit=4, symmetric=True, granularity="per_channel")
    mse = minmax.with_(calib_algo="mse")
    qm = fake_quant_weight_dynamic(w, minmax)
    qs = fake_quant_weight_dynamic(w, mse)
    err_m = float(jnp.mean((qm - w) ** 2))
    err_s = float(jnp.mean((qs - w) ** 2))
    assert err_s <= err_m + 1e-9


def test_float_round_e4m3_exact_values():
    # representable values map to themselves
    vals = jnp.array([0.0, 1.0, 1.125, 448.0, -448.0, 0.001953125])
    out = float_round(vals, 4, 3, 448.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vals), rtol=0, atol=0)
    # 1 + 1/16 is not representable in e4m3 (3 mantissa bits) -> rounds to 1.0 (RNE)
    out2 = float_round(jnp.array([1.0625]), 4, 3, 448.0)
    assert float(out2[0]) in (1.0, 1.125)
    # saturation
    out3 = float_round(jnp.array([1e9]), 4, 3, 448.0)
    assert float(out3[0]) == 448.0


def test_float_round_matches_hw_dtype():
    # compare against XLA's native fp8 cast on an in-range grid (the native
    # cast NaNs on overflow since e4m3fn has no inf; ours saturates instead)
    x = jnp.linspace(-448, 448, 4097, dtype=jnp.float32)
    ours = float_round(x, 4, 3, 448.0)
    native = x.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(native), rtol=0, atol=0)

    x2 = jnp.linspace(-57344, 57344, 2049, dtype=jnp.float32)
    ours2 = float_round(x2, 5, 2, 57344.0)
    native2 = x2.astype(jnp.float8_e5m2).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(ours2), np.asarray(native2), rtol=0, atol=0)


def test_fp8_fake_quant_per_tensor():
    spec = QuantSpec(bit="e4m3", granularity="per_tensor")
    w = jax.random.normal(jax.random.PRNGKey(2), (16, 16))
    q = fake_quant_weight_dynamic(w, spec)
    assert float(jnp.mean((q - w) ** 2)) < 1e-3


def test_real_quant_int4_per_group():
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group", group_size=8)
    w = jax.random.normal(jax.random.PRNGKey(3), (4, 32))
    codes, scales, zeros = real_quant_weight(w, spec)
    assert codes.dtype == jnp.int8
    assert codes.shape == w.shape
    assert scales.shape == (4, 4)
    assert zeros.shape == (4, 4)
    assert int(codes.min()) >= 0 and int(codes.max()) <= 15
    # dequant reconstructs within one quantum
    deq = (codes.astype(jnp.float32).reshape(-1, 8)
           - zeros.astype(jnp.float32).reshape(-1, 1)) * scales.reshape(-1, 1)
    np.testing.assert_allclose(
        np.asarray(deq.reshape(4, 32)), np.asarray(w),
        atol=float(scales.max()) + 1e-6,
    )


def test_real_quant_int8_dtype():
    spec = QuantSpec(bit=8, symmetric=True, granularity="per_channel")
    w = jax.random.normal(jax.random.PRNGKey(4), (4, 16))
    codes, scales, zeros = real_quant_weight(w, spec)
    assert codes.dtype == jnp.int8
    assert zeros is None


def test_per_head_granularity():
    spec = QuantSpec(bit=8, granularity="per_head", head_num=4)
    w = jax.random.normal(jax.random.PRNGKey(5), (8, 16))
    q = fake_quant_weight_dynamic(w, spec)
    assert q.shape == w.shape


def test_per_block_fp8_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(6), (256, 384), dtype=jnp.float32)
    codes, scales = weight_cast_to_fp8(w, block_size=128)
    assert codes.shape == w.shape
    assert scales.shape == (2, 3)
    back = weight_cast_to_bf16(codes, scales, block_size=128)
    assert back.dtype == jnp.bfloat16
    rel = float(jnp.mean(jnp.abs(back.astype(jnp.float32) - w)) / jnp.mean(jnp.abs(w)))
    assert rel < 0.05


def test_act_dynamic_per_tensor():
    spec = QuantSpec(bit=8, symmetric=True, granularity="per_tensor", calib_algo="minmax")
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 16))
    q = fake_quant_act_dynamic(x, spec)
    assert q.shape == x.shape
    assert float(jnp.mean((q - x) ** 2)) < 1e-3


def test_static_act_qparams_minmax():
    spec = QuantSpec(
        bit=8, symmetric=True, granularity="per_tensor", calib_algo="static_minmax"
    )
    batches = [jax.random.normal(jax.random.PRNGKey(i), (2, 8, 16)) for i in range(3)]
    qp = static_act_qparams(batches, spec)
    assert qp.scales.ndim == 0 or qp.scales.size == 1
    assert float(qp.scales) > 0


def test_static_hist_range():
    spec = QuantSpec(
        bit=8, symmetric=True, granularity="per_tensor", calib_algo="static_hist"
    )
    batches = [np.random.RandomState(i).randn(1024).astype(np.float32) for i in range(3)]
    qp = static_act_qparams(batches, spec)
    assert float(qp.scales) > 0


def test_hqq_improves_l1():
    spec = QuantSpec(
        bit=4, symmetric=False, granularity="per_group", group_size=32,
        calib_algo="hqq",
    )
    base = spec.with_(calib_algo="minmax")
    w = jax.random.normal(jax.random.PRNGKey(8), (16, 64))
    w = w.at[0, 0].set(12.0)
    q_hqq = fake_quant_weight_dynamic(w, spec)
    q_min = fake_quant_weight_dynamic(w, base)
    l1_hqq = float(jnp.mean(jnp.abs(q_hqq - w)))
    l1_min = float(jnp.mean(jnp.abs(q_min - w)))
    assert l1_hqq <= l1_min * 1.05


def test_w48_double_quant():
    # DGQ layout: symmetric int8 outer per-channel, asym int4 inner per-group
    # (configs/quantization/methods/DGQ/dgq_w4a8.yml)
    spec8 = QuantSpec(bit=8, symmetric=True, granularity="per_channel")
    spec4 = QuantSpec(bit=4, symmetric=False, granularity="per_group", group_size=8)
    w = jax.random.normal(jax.random.PRNGKey(9), (4, 32))
    q = fake_quant_weight_w48(w, spec8, spec4)
    assert q.shape == w.shape
    assert float(jnp.mean((q - w) ** 2)) < 0.1


def test_jit_with_static_spec():
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group", group_size=16)
    f = jax.jit(fake_quant_weight_dynamic, static_argnums=(1,))
    w = jax.random.normal(jax.random.PRNGKey(10), (8, 64))
    q1 = f(w, spec)
    q2 = fake_quant_weight_dynamic(w, spec)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-6)


def test_spec_validation():
    with pytest.raises(ValueError):
        QuantSpec(bit=4, granularity="per_group")  # missing group_size
    with pytest.raises(ValueError):
        QuantSpec(bit="e9m9")
    with pytest.raises(ValueError):
        QuantSpec(bit=4, granularity="per_block", block_size=16, symmetric=False)


def test_fp8_block_act_quant_and_gemm():
    """Per-128-block dynamic fp8 act quant + W8A8-FP8 block GEMM
    (reference Triton act_quant_kernel / fp8_gemm_kernel analogues)."""
    import numpy as np
    from lightcompress_tpu.ops.scaled_matmul import (
        fp8_matmul_block_dynamic, quantize_act_fp8_block)
    from lightcompress_tpu.quant import weight_cast_to_fp8

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    q, s = quantize_act_fp8_block(x, block=128)
    assert q.shape == x.shape and s.shape == (4, 2)
    xd = q.astype(jnp.float32).reshape(4, 2, 128) * s[..., None]
    rel = float(jnp.abs(xd.reshape(4, 256) - x).max()
                / jnp.abs(x).max())
    assert rel < 0.1, rel  # e4m3 rounding error only
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32)) * 0.05
    wq, ws = weight_cast_to_fp8(w, block_size=128)
    y = fp8_matmul_block_dynamic(x, wq, ws, block=128)
    ref = x @ w.T
    corr = float(jnp.corrcoef(jnp.ravel(y), jnp.ravel(ref))[0, 1])
    assert corr > 0.999, corr
