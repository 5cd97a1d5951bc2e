"""Pallas W4A16 fused dequant-matmul kernel: correctness in interpret mode
(CPU) against the XLA dequant reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightcompress_tpu.ops.pallas_matmul import (
    pack_int4_planes,
    unpack_int4_planes,
    w4a16_matmul_planes,
)


def test_plane_pack_roundtrip():
    rng = np.random.RandomState(0)
    codes = jnp.asarray(rng.randint(0, 16, (16, 64)), jnp.int32)
    packed = pack_int4_planes(codes)
    assert packed.shape == (16, 8)
    back = unpack_int4_planes(packed, 64)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))


@pytest.mark.parametrize("B,N,K,g", [(8, 256, 1024, 128), (8, 128, 2048, 256),
                                     (1, 128, 1024, 128)])
def test_w4a16_kernel_matches_reference(B, N, K, g):
    rng = np.random.RandomState(1)
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    scales = jnp.asarray(rng.rand(N, K // g).astype(np.float32) * 0.1)
    zeros = jnp.asarray(rng.randint(0, 16, (N, K // g)).astype(np.float32))
    x = jnp.asarray(rng.randn(B, K).astype(np.float32))

    packed = pack_int4_planes(codes)
    y = w4a16_matmul_planes(x, packed, scales, zeros, group=g, n_tile=128,
                            interpret=True)

    # reference: dequant then matmul
    w = (codes.astype(jnp.float32).reshape(N, K // g, g)
         - zeros[:, :, None]) * scales[:, :, None]
    w = w.reshape(N, K)
    ref = x @ w.T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-2,
                               atol=2e-1)


def test_w4a16_symmetric_no_zeros():
    rng = np.random.RandomState(2)
    N, K, g, B = 128, 2048, 128, 4
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    scales = jnp.asarray(rng.rand(N, K // g).astype(np.float32))
    x = jnp.asarray(rng.randn(B, K).astype(np.float32))
    packed = pack_int4_planes(codes)
    y = w4a16_matmul_planes(x, packed, scales, None, group=g, n_tile=128,
                            interpret=True)
    w = (codes.astype(jnp.float32).reshape(N, K // g, g)) * scales[:, :, None]
    ref = x @ w.reshape(N, K).T
    # unscaled codes 0..15 give outputs ~O(100); bf16 dot => ~0.5% rel error
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-2,
                               atol=2.0)


def test_qlinear_apply_uses_pallas_path():
    from lightcompress_tpu.ops import quantize_linear
    from lightcompress_tpu.ops.pallas_matmul import w4a16_matmul_available
    from lightcompress_tpu.quant import QuantSpec

    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(256, 1024).astype(np.float32))
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=128)
    qp = quantize_linear(w, spec, layout="planes")
    assert qp.layout == "planes"
    x = jnp.asarray(rng.randn(2, 1024).astype(np.float32))
    assert w4a16_matmul_available(x, qp)
    from lightcompress_tpu.ops.pallas_matmul import w4a16_matmul
    from lightcompress_tpu.ops import qlinear_xla

    y_pallas = w4a16_matmul(x, qp, interpret=True)
    y_xla = qlinear_xla(x, qp)
    # xla path matmuls in bf16; kernel accumulates f32 — loose comparison
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_xla),
                               rtol=5e-2, atol=5e-1)
    # and quantization error vs the float weight is small
    y_ref = x @ w.T
    rel = np.abs(np.asarray(y_pallas) - np.asarray(y_ref)).mean() / (
        np.abs(np.asarray(y_ref)).mean() + 1e-9
    )
    # analytic W4 g128 noise on N(0,1) weights: sigma_q/sigma ~ 0.107
    assert rel < 0.15


@pytest.mark.parametrize("B,N,K,g", [(8, 256, 1024, 128), (1, 128, 2048, 256)])
def test_w4a8_kernel_matches_int_reference(B, N, K, g):
    """W4A8 is integer-exact inside the kernel: given int8 acts, the output
    must match the f32 formula y = sx * sum_g s*(xq@c) - sx * s*z*sum(xq)."""
    from lightcompress_tpu.ops.pallas_matmul import (
        quantize_act_per_token,
        w4a8_matmul_planes,
    )

    rng = np.random.RandomState(7)
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    scales = jnp.asarray(rng.rand(N, K // g).astype(np.float32) * 0.1)
    zeros = jnp.asarray(rng.randint(0, 16, (N, K // g)).astype(np.float32))
    x = jnp.asarray(rng.randn(B, K).astype(np.float32))

    xq, sx = quantize_act_per_token(x)
    packed = pack_int4_planes(codes)
    y = w4a8_matmul_planes(xq, sx, packed, scales, zeros, group=g,
                           n_tile=128, interpret=True)

    w = (codes.astype(jnp.float32).reshape(N, K // g, g)
         - zeros[:, :, None]) * scales[:, :, None]
    ref = (xq.astype(jnp.float32) * sx) @ w.reshape(N, K).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4,
                               atol=1e-3)


def test_w4a8_end_to_end_accuracy():
    """Full W4A8 apply (incl. dynamic act quant) vs float: error stays small."""
    from lightcompress_tpu.ops import quantize_linear
    from lightcompress_tpu.ops.pallas_matmul import w4a8_matmul
    from lightcompress_tpu.quant import QuantSpec

    rng = np.random.RandomState(11)
    w = jnp.asarray(rng.randn(256, 1024).astype(np.float32))
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=128)
    qp = quantize_linear(w, spec, layout="planes")
    x = jnp.asarray(rng.randn(4, 1024).astype(np.float32))
    y = w4a8_matmul(x, qp, interpret=True)
    y_ref = x @ w.T
    rel = np.abs(np.asarray(y) - np.asarray(y_ref)).mean() / (
        np.abs(np.asarray(y_ref)).mean() + 1e-9
    )
    # int8 act error is negligible next to W4 weight error (~0.107)
    assert rel < 0.15


def test_m_threshold_dispatch():
    """Prefill-regime inputs (M > 256) must fall back to the XLA
    dequant+dense path — the decode kernel holds the whole M slab in VMEM
    and fails to compile at M=1024 (tools/prefill_matmul_sweep.py)."""
    from lightcompress_tpu.ops import quantize_linear
    from lightcompress_tpu.ops.pallas_matmul import w4a16_matmul_available
    from lightcompress_tpu.quant import QuantSpec

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(256, 1024).astype(np.float32))
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=128)
    qp = quantize_linear(w, spec, layout="planes")
    assert w4a16_matmul_available(jnp.zeros((256, 1024)), qp)
    assert not w4a16_matmul_available(jnp.zeros((257, 1024)), qp)
    assert not w4a16_matmul_available(jnp.zeros((4, 512, 1024)), qp)
    assert w4a16_matmul_available(jnp.zeros((2, 128, 1024)), qp)


def test_pretiled_scales_layout_roundtrip():
    """quantize_linear pre-tiles scales (4D, zeros premultiplied) for the
    serving layout; dequant_weight and both kernels consume it, and the
    result matches an untiled 'rows'-layout dequant exactly."""
    from lightcompress_tpu.ops import dequant_weight, quantize_linear
    from lightcompress_tpu.quant import QuantSpec

    rng = np.random.RandomState(7)
    w = jnp.asarray(rng.randn(256, 1024).astype(np.float32))
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=128)
    qp_planes = quantize_linear(w, spec, layout="planes",
                                scale_dtype=jnp.float32)
    qp_rows = quantize_linear(w, spec, layout="rows")
    assert qp_planes.scales.ndim == 4  # (gpp, N/NT, 8, NT)
    assert qp_planes.zeros.ndim == 4
    np.testing.assert_allclose(
        np.asarray(dequant_weight(qp_planes), np.float32),
        np.asarray(dequant_weight(qp_rows), np.float32),
        rtol=1e-5, atol=1e-5,
    )
    # default bf16 scales: rel error far below the W4 quant noise (0.107)
    qp_bf16 = quantize_linear(w, spec, layout="planes")
    assert qp_bf16.scales.dtype == jnp.bfloat16
    a = np.asarray(dequant_weight(qp_bf16), np.float32)
    b = np.asarray(dequant_weight(qp_rows), np.float32)
    assert np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9) < 0.01


def test_w4a8_s4_kernel_matches_reference():
    """s4-native W4A8 kernel (hardware nibble unpack): integer-exact vs the
    dequant formula with the c' = u - 8 offset folded into zs."""
    from lightcompress_tpu.ops.pallas_matmul import (
        quantize_act_per_token,
        tile_s4,
        tile_scales_s4,
        w4a8_matmul_s4,
    )

    rng = np.random.RandomState(5)
    N, K, g, B, NT = 256, 1024, 128, 8, 128
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    scales = jnp.asarray(rng.rand(N, K // g).astype(np.float32) * 0.1)
    zeros = jnp.asarray(rng.randint(0, 16, (N, K // g)).astype(np.float32))
    x = jnp.asarray(rng.randn(B, K).astype(np.float32))
    xq, sx = quantize_act_per_token(x)
    y = w4a8_matmul_s4(
        xq, sx, tile_s4(codes, NT), tile_scales_s4(scales, NT),
        tile_scales_s4((zeros - 8.0) * scales, NT),
        group=g, n_tile=NT, interpret=True)
    w = (codes.astype(jnp.float32).reshape(N, K // g, g)
         - zeros[:, :, None]) * scales[:, :, None]
    ref = (xq.astype(jnp.float32) * sx) @ w.reshape(N, K).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4,
                               atol=1e-3)


def test_s4_bytes_layout_end_to_end():
    """Serving s4 layout: int8 byte-packed codes crossing the jit boundary,
    bitcast to s4 in-jit; quantize_linear -> qlinear_apply(act_bits=8)
    matches the dequant-then-matmul reference."""
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_s4_bytes,
        quantize_act_per_token,
        s4_matmul_available,
        s4_view,
        w4a8_matmul_bytes,
    )
    from lightcompress_tpu.ops.qlinear import (
        QLinearParams,
        dequant_weight,
        quantize_linear,
    )
    from lightcompress_tpu.quant import QuantSpec

    rng = np.random.RandomState(7)
    N, K, g, B = 256, 1024, 128, 8

    # bitcast view roundtrip: low nibble first
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    bytes_ = pack_s4_bytes(codes, 128)
    v = jax.jit(lambda b: s4_view(b).astype(jnp.int8))(bytes_)
    np.testing.assert_array_equal(
        np.asarray(v).reshape(N, K), np.asarray(codes) - 8)

    # full path: quantize_linear(layout='s4') on a real weight
    w = jnp.asarray(rng.randn(N, K).astype(np.float32) * 0.05)
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=g)
    qp = quantize_linear(w, spec, layout="s4", scale_dtype=jnp.float32)
    assert qp.layout == "s4" and qp.codes.dtype == jnp.int8
    x = jnp.asarray(rng.randn(B, K).astype(np.float32))
    assert s4_matmul_available(x, qp)

    # dequant_weight(s4) matches the rows-layout dequant
    qp_rows = quantize_linear(w, spec, layout="rows")
    np.testing.assert_allclose(
        np.asarray(dequant_weight(qp, jnp.float32)),
        np.asarray(dequant_weight(qp_rows, jnp.float32)),
        rtol=1e-5, atol=1e-5)

    # kernel (interpret mode) matches dequant matmul with act quant
    xq, sx = quantize_act_per_token(x)
    y = w4a8_matmul_bytes(
        xq, sx, qp.codes, qp.scales,
        qp.zeros, group=g, interpret=True)
    ref = (xq.astype(jnp.float32) * sx) @ np.asarray(
        dequant_weight(qp, jnp.float32)).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4,
                               atol=1e-3)


def test_s4_symmetric_zero_correction():
    """Symmetric spec: codes are signed; the +8 offset fold makes the
    correction term exactly zero."""
    from lightcompress_tpu.ops.qlinear import dequant_weight, quantize_linear
    from lightcompress_tpu.quant import QuantSpec

    rng = np.random.RandomState(9)
    w = jnp.asarray(rng.randn(128, 512).astype(np.float32) * 0.05)
    spec = QuantSpec(bit=4, symmetric=True, granularity="per_group",
                     group_size=128)
    qp = quantize_linear(w, spec, layout="s4", scale_dtype=jnp.float32)
    assert qp.layout == "s4"
    np.testing.assert_allclose(np.asarray(qp.zeros), 0.0, atol=1e-7)
    qp_rows = quantize_linear(w, spec, layout="rows")
    np.testing.assert_allclose(
        np.asarray(dequant_weight(qp, jnp.float32)),
        np.asarray(dequant_weight(qp_rows, jnp.float32)),
        rtol=1e-5, atol=1e-5)


def test_w4a8_bytes_kernel_matches_reference():
    """In-kernel bitcast byte-unpack kernel (w4a8_matmul_bytes): no XLA s4
    array, natural-K-order acts."""
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_s4_pairs, quantize_act_per_token, tile_scales_pairs,
        w4a8_matmul_bytes,
    )

    rng = np.random.RandomState(7)
    B, N, K, g = 8, 256, 1024, 128
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    s = jnp.asarray(rng.rand(N, K // g).astype(np.float32) * 0.01 + 0.004)
    z = jnp.asarray(np.round(rng.rand(N, K // g) * 8 + 4).astype(np.float32))
    nt = 128
    wb = pack_s4_pairs(codes, nt)
    sr = tile_scales_pairs(s, nt)
    zsr = tile_scales_pairs((z - 8.0) * s, nt)

    x = jnp.asarray(rng.randn(B, K).astype(np.float32))
    xq, xs = quantize_act_per_token(x)
    wdq = (codes.astype(jnp.float32)
           - jnp.repeat(z, g, 1)) * jnp.repeat(s, g, 1)
    ref = (xq.astype(jnp.float32) @ wdq.T) * xs

    y = w4a8_matmul_bytes(xq, xs, wb, sr, zsr, group=g, interpret=True)
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-5  # f32 scales: integer-exact up to scale rounding


def test_w4a8_bytes_fused_prologue():
    """Fused kernel: in-kernel RMSNorm + per-token int8 quant + epilogue
    rescale must match doing those steps in XLA + the plain bytes kernel."""
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_s4_pairs, quantize_act_per_token, tile_scales_pairs,
        w4a8_linear_bytes_fused,
    )

    rng = np.random.RandomState(8)
    B, N, K, g = 8, 128, 512, 128
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    s = jnp.asarray(rng.rand(N, K // g).astype(np.float32) * 0.01 + 0.004)
    nt = 128
    wb = pack_s4_pairs(codes, nt)
    sr = tile_scales_pairs(s, nt)
    zsr = tile_scales_pairs(jnp.zeros_like(s), nt)
    x = jnp.asarray(rng.randn(B, K), jnp.float32)

    for rms in (False, True):
        xf = x
        if rms:
            xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True)
                                    + 1e-6)
        xq, xs = quantize_act_per_token(xf)
        wdq = (codes.astype(jnp.float32) - 8.0) * jnp.repeat(s, g, 1)
        ref = (xq.astype(jnp.float32) @ wdq.T) * xs
        y = w4a8_linear_bytes_fused(x, wb, sr, zsr, group=g, rms=rms,
                                    interpret=True)
        rel = float(jnp.linalg.norm(y.astype(jnp.float32) - ref)
                    / jnp.linalg.norm(ref))
        assert rel < 1e-5, (rms, rel)


def test_w4a8_planes_fused_prologue():
    """Fused-prologue PLANES kernel (natural-order x, in-kernel RMSNorm +
    act quant + rescale) matches the XLA-glue + plain kernel pipeline."""
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_int4_planes, quantize_act_per_token, tile_packed, tile_scales,
        w4a8_linear_planes_fused,
    )

    rng = np.random.RandomState(11)
    B, N, K, g = 8, 256, 2048, 128
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    s = jnp.asarray(rng.rand(N, K // g).astype(np.float32) * 0.01 + 0.004)
    z = jnp.asarray(np.round(rng.rand(N, K // g) * 8 + 4).astype(np.float32))
    nt = 128
    gpp = K // 8 // g
    wp = tile_packed(pack_int4_planes(codes), nt, g)
    sr = tile_scales(s, nt, gpp)
    zsr = tile_scales(z * s, nt, gpp)
    x = jnp.asarray(rng.randn(B, K), jnp.float32)
    wdq = (codes.astype(jnp.float32)
           - jnp.repeat(z, g, 1)) * jnp.repeat(s, g, 1)
    for rms in (False, True):
        xf = x
        if rms:
            xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True)
                                    + 1e-6)
        xq, xs = quantize_act_per_token(xf)
        ref = (xq.astype(jnp.float32) @ wdq.T) * xs
        y = w4a8_linear_planes_fused(x, wp, sr, zsr, group=g, rms=rms,
                                     interpret=True)
        rel = float(jnp.linalg.norm(y.astype(jnp.float32) - ref)
                    / jnp.linalg.norm(ref))
        assert rel < 1e-5, (rms, rel)


def test_w4a16_masked_kernel_matches_dequant():
    """Mask-only unpack + bf16 dots (pack_int4_planes_masked / pre-divided
    scales / plane-7 XOR-0x8 sign trick) == explicit dequant matmul."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_int4_planes_masked, w4a16_matmul_planes_masked,
    )

    rng = np.random.RandomState(3)
    B, N, K, g = 8, 256, 2048, 128
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    scales = jnp.asarray(rng.rand(N, K // g) * 0.02 + 0.005, jnp.float32)
    zeros = jnp.asarray(rng.randint(0, 16, (N, K // g)), jnp.float32)
    x = jnp.asarray(rng.randn(B, K), jnp.float32)

    from lightcompress_tpu.ops.pallas_matmul import masked_zero_scales
    wp = pack_int4_planes_masked(codes)
    # the -8 plane-7 offset belongs to the PACKED codes, so the zero
    # correction must come from masked_zero_scales (not plain z*s)
    zs_m = masked_zero_scales(zeros, scales, K // 8 // g)
    out = w4a16_matmul_planes_masked(x, wp, scales, zs_m, group=g,
                                     n_tile=128, interpret=True)

    w_deq = (codes.astype(jnp.float32)
             - jnp.repeat(zeros, g, 1)) * jnp.repeat(scales, g, 1)
    ref = (x.astype(jnp.bfloat16).astype(jnp.float32)) @ w_deq.T
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 5e-3, rel  # bf16 activation rounding only


def test_attn_tail_megakernel_matches_composition():
    """Layer-tail megakernel (o + residual + RMS + gateup + silu*mul +
    down, one pallas_call) == composition of the separate proven ops."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_int4_planes, quantize_act_per_token, tile_packed, tile_scales,
        w4a8_attn_tail_fused, w4a8_matmul_planes,
    )

    rng = np.random.RandomState(7)
    B, H, I, g = 8, 1024, 2048, 128

    def mk(oc, ic, nt):
        codes = jnp.asarray(rng.randint(0, 16, (oc, ic)), jnp.int32)
        s = jnp.asarray(rng.rand(oc, ic // g) * 0.02 + 0.005, jnp.float32)
        z = jnp.asarray(rng.randint(0, 16, (oc, ic // g)), jnp.float32)
        gpp = ic // 8 // g
        wp = tile_packed(pack_int4_planes(codes), nt, g)
        sr = tile_scales(s, nt, gpp).astype(jnp.bfloat16)
        zsr = tile_scales(z * s, nt, gpp).astype(jnp.bfloat16)
        return wp, sr, zsr

    wo, so, zso = mk(H, H, 256)
    wg, sg, zsg = mk(2 * I, H, 512)
    wd, sd, zsd = mk(H, I, 256)
    ctx = jnp.asarray(rng.randn(B, H), jnp.bfloat16)
    x = jnp.asarray(rng.randn(B, H), jnp.bfloat16)

    y = w4a8_attn_tail_fused(ctx, x, wo, so, zso, wg, sg, zsg, wd, sd,
                             zsd, group=g, interpret=True)

    def ql(h, wp, sr, zsr, nt):
        xq, xs = quantize_act_per_token(h)
        return w4a8_matmul_planes(xq, xs, wp, sr, zsr, group=g, n_tile=nt,
                                  interpret=True)

    h = x.astype(jnp.float32) + ql(ctx, wo, so, zso, 256)
    h2 = h * jax.lax.rsqrt(jnp.mean(h * h, -1, keepdims=True) + 1e-6)
    gu = ql(h2.astype(jnp.float32), wg, sg, zsg, 512)
    mid = jax.nn.silu(gu[:, :I]) * gu[:, I:]
    yref = h + ql(mid, wd, sd, zsd, 256)
    rel = float(jnp.linalg.norm(y.astype(jnp.float32) - yref)
                / jnp.linalg.norm(yref))
    # the megakernel re-quantizes its intermediates in-kernel (same spots
    # the split pipeline quantizes in XLA) — only bf16 rounding differs
    assert rel < 2e-2, rel


def test_layer_fused_kernel_matches_composition():
    """Single-launch layer kernel (tail + next block's qkv) == composed
    separate ops."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_int4_planes, quantize_act_per_token, tile_packed, tile_scales,
        w4a8_layer_fused, w4a8_matmul_planes,
    )

    rng = np.random.RandomState(9)
    B, H, I, g = 8, 1024, 2048, 128
    Nq = int(1.5 * H)

    def mk(oc, ic, nt):
        codes = jnp.asarray(rng.randint(0, 16, (oc, ic)), jnp.int32)
        s = jnp.asarray(rng.rand(oc, ic // g) * 0.02 + 0.005, jnp.float32)
        z = jnp.asarray(rng.randint(0, 16, (oc, ic // g)), jnp.float32)
        gpp = ic // 8 // g
        wp = tile_packed(pack_int4_planes(codes), nt, g)
        sr = tile_scales(s, nt, gpp).astype(jnp.bfloat16)
        zsr = tile_scales(z * s, nt, gpp).astype(jnp.bfloat16)
        return wp, sr, zsr

    wo, so, zso = mk(H, H, 256)
    wg, sg, zsg = mk(2 * I, H, 512)
    wd, sd, zsd = mk(H, I, 256)
    wq, sq, zsq = mk(Nq, H, 256)
    ctx = jnp.asarray(rng.randn(B, H), jnp.bfloat16)
    x = jnp.asarray(rng.randn(B, H), jnp.bfloat16)

    y, qkv = w4a8_layer_fused(ctx, x, wo, so, zso, wg, sg, zsg,
                              wd, sd, zsd, wq, sq, zsq, group=g,
                              interpret=True)

    def ql(h, wp, sr, zsr, nt):
        xq, xs = quantize_act_per_token(h)
        return w4a8_matmul_planes(xq, xs, wp, sr, zsr, group=g, n_tile=nt,
                                  interpret=True)

    h = x.astype(jnp.float32) + ql(ctx, wo, so, zso, 256)
    h2 = h * jax.lax.rsqrt(jnp.mean(h * h, -1, keepdims=True) + 1e-6)
    gu = ql(h2.astype(jnp.float32), wg, sg, zsg, 512)
    mid = jax.nn.silu(gu[:, :I]) * gu[:, I:]
    yref = h + ql(mid, wd, sd, zsd, 256)
    y2 = yref * jax.lax.rsqrt(jnp.mean(yref * yref, -1, keepdims=True)
                              + 1e-6)
    qref = ql(y2.astype(jnp.float32), wq, sq, zsq, 256)

    rel = float(jnp.linalg.norm(y.astype(jnp.float32) - yref)
                / jnp.linalg.norm(yref))
    relq = float(jnp.linalg.norm(qkv.astype(jnp.float32) - qref)
                 / jnp.linalg.norm(qref))
    assert rel < 2e-2, rel
    assert relq < 3e-2, relq


def test_w4a8_mtiled_prefill_kernel_matches_decode_kernel():
    """M-tiled prefill kernel == decode kernel bit-for-bit on every
    scale layout (combined 3D, pre-tiled 4D, raw), incl. M padding."""
    import numpy as np

    from lightcompress_tpu.ops.pallas_matmul import (
        pack_int4_planes, quantize_act_per_token, tile_packed,
        tile_scales_combined, w4a8_matmul_planes,
        w4a8_matmul_planes_mtiled)

    rng = np.random.RandomState(0)
    N, K, g = 256, 256, 32
    gpp = K // (8 * g)
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    scales = jnp.asarray(rng.rand(N, K // g) * 0.1 + 0.01, jnp.float32)
    zeros = jnp.asarray(rng.randint(0, 16, (N, K // g)), jnp.float32)
    packed = pack_int4_planes(codes)
    x = jnp.asarray(rng.randn(300, K), jnp.float32)  # M=300: pads to 512
    xq, sx = quantize_act_per_token(x)

    ref = w4a8_matmul_planes(xq, sx, packed, scales, zeros, group=g,
                             n_tile=128, interpret=True)
    wp_t = tile_packed(packed, 128, g)
    szs = tile_scales_combined(scales, zeros * scales, 128, gpp)
    y = w4a8_matmul_planes_mtiled(xq, sx, wp_t, szs, group=g,
                                  m_tile=256, out_dtype=jnp.float32,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_w4a8_matmul_routes_large_m_to_mtiled():
    """qlinear_apply at M>256 stays on the Pallas path (the prefill
    kernel) and matches the XLA dequant reference."""
    import numpy as np

    from lightcompress_tpu.ops import quantize_linear
    from lightcompress_tpu.ops.pallas_matmul import (
        w4a8_matmul, w4a8_prefill_available)
    from lightcompress_tpu.quant import QuantSpec

    rng = np.random.RandomState(1)
    N, K, g = 256, 256, 32
    w = jnp.asarray(rng.randn(N, K) * 0.05, jnp.float32)
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=g)
    for layout_kw in ({}, {"scale_layout": "contig"}):
        qp = quantize_linear(w, spec, layout="planes", **layout_kw)
        x = jnp.asarray(rng.randn(2, 300, K) * 0.5, jnp.float32)
        assert w4a8_prefill_available(x, qp)
        y = w4a8_matmul(x, qp, interpret=True)
        # decode kernel on a <=256-row slice: same scales -> must agree
        # to accumulation noise
        y_dec = w4a8_matmul(x[:, :128], qp, interpret=True)
        err_k = float(jnp.max(jnp.abs(y[:, :128] - y_dec)))
        assert err_k < 1e-4, err_k
        # loose check vs the f32 XLA dequant reference (serving scales
        # are bf16 tiles -> ~3e-3 expected)
        from lightcompress_tpu.ops.qlinear import dequant_weight
        wd = dequant_weight(qp)
        x2 = x.reshape(-1, K)
        amax = jnp.clip(jnp.max(jnp.abs(x2), axis=-1, keepdims=True),
                        1e-8, None)
        sxa = amax / 127.0
        xqa = jnp.clip(jnp.round(x2 / sxa), -127, 127) * sxa
        ref = (xqa @ wd.T).reshape(2, 300, N)
        err = float(jnp.max(jnp.abs(y - ref)))
        assert err < 2e-2, err


def test_w4a8_ksplit_kernel_matches_reference():
    """K-split grid kernel (output accumulation over K halves) ==
    the standard combined kernel bit-for-near on a high-gpp shape."""
    import numpy as np

    from lightcompress_tpu.ops.pallas_matmul import (
        pack_int4_planes, quantize_act_per_token, tile_packed,
        tile_packed_ksplit, tile_scales_combined,
        tile_scales_combined_ksplit, w4a8_matmul_planes,
        w4a8_matmul_planes_ksplit)

    rng = np.random.RandomState(3)
    N, K, g = 128, 2048, 64   # gpp = 4 -> gpp2 = 2
    gpp = K // 8 // g
    codes = jnp.asarray(rng.randint(0, 16, (N, K)), jnp.int32)
    scales = jnp.asarray(rng.rand(N, K // g) * 0.1 + 0.01, jnp.float32)
    zeros = jnp.asarray(rng.randint(0, 16, (N, K // g)), jnp.float32)
    packed = pack_int4_planes(codes)
    x = jnp.asarray(rng.randn(8, K), jnp.float32)
    xq, sx = quantize_act_per_token(x)

    ref = w4a8_matmul_planes(xq, sx, packed, scales, zeros, group=g,
                             n_tile=128, interpret=True)
    wp5 = tile_packed_ksplit(packed, 128, g)
    szs = tile_scales_combined_ksplit(scales, zeros * scales, 128, gpp)
    y = w4a8_matmul_planes_ksplit(xq, sx, wp5, szs, group=g,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
