"""Pallas int8-KV decode attention kernel vs float reference
(SURVEY §2.6 'paged/quantized KV-cache attention' row)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_decode_attention_kv8_matches_reference():
    from lightcompress_tpu.ops.pallas_attention import decode_attention_kv8

    rng = np.random.RandomState(0)
    B, H, G, S, D = 4, 2, 4, 64, 16
    q = jnp.asarray(rng.randn(B, H, G, D), jnp.float32)
    kq = jnp.asarray(rng.randint(-127, 127, (B, H, S, D)), jnp.int8)
    vq = jnp.asarray(rng.randint(-127, 127, (B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, H, S) * 0.02, jnp.float32)
    vs = jnp.asarray(rng.rand(B, H, S) * 0.02, jnp.float32)
    out = decode_attention_kv8(q, kq, ks, vq, vs, b_block=2, interpret=True)

    sc = np.einsum("bhgd,bhsd->bhgs", np.asarray(q),
                   np.asarray(kq, np.float32))
    sc = sc * np.asarray(ks)[:, :, None, :] * (D ** -0.5)
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhgs,bhsd->bhgd",
                    p * np.asarray(vs)[:, :, None, :],
                    np.asarray(vq, np.float32))
    err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-2  # bf16 in-kernel dequant noise


def test_decode_attention_i8_matches_reference():
    """Batched int8-MXU decode attention (h_block slabs): ~int8 quant noise
    vs the f32 reference, both with and without the read-only-cache append
    path (fresh token as an in-register extra softmax column)."""
    from lightcompress_tpu.ops.pallas_attention import decode_attention_i8

    B, H, G, S, D = 4, 2, 4, 256, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, G, D), jnp.float32)
    k8 = jnp.asarray(rng.randint(-127, 128, (B, H, S, D)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, H, S) * 0.01 + 0.005, jnp.float32)
    vs = jnp.asarray(rng.rand(B, H, S) * 0.01 + 0.005, jnp.float32)
    kn = jnp.asarray(rng.randint(-127, 128, (B, H, D)), jnp.int8)
    vn = jnp.asarray(rng.randint(-127, 128, (B, H, D)), jnp.int8)
    kns = jnp.asarray(rng.rand(B, H) * 0.01 + 0.005, jnp.float32)
    vns = jnp.asarray(rng.rand(B, H) * 0.01 + 0.005, jnp.float32)

    def ref_attn(q, kf, vf):
        sc = jnp.einsum("bhgd,bhsd->bhgs", q, kf) * (D ** -0.5)
        p = jax.nn.softmax(sc, -1)
        return jnp.einsum("bhgs,bhsd->bhgd", p, vf)

    kf = k8.astype(jnp.float32) * ks[..., None]
    vf = v8.astype(jnp.float32) * vs[..., None]
    out = decode_attention_i8(q, k8, ks, v8, vs, h_block=8, interpret=True)
    ref = ref_attn(q, kf, vf)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel  # q-int8 + probs-int8 quantization noise

    kf2 = jnp.concatenate(
        [kf, (kn.astype(jnp.float32) * kns[..., None])[:, :, None, :]], 2)
    vf2 = jnp.concatenate(
        [vf, (vn.astype(jnp.float32) * vns[..., None])[:, :, None, :]], 2)
    out2 = decode_attention_i8(q, k8, ks, v8, vs, kn, kns, vn, vns,
                               h_block=8, interpret=True)
    ref2 = ref_attn(q, kf2, vf2)
    rel2 = float(jnp.linalg.norm(out2 - ref2) / jnp.linalg.norm(ref2))
    assert rel2 < 0.03, rel2


def test_decode_attention_bd_matches_reference():
    """Block-diagonal GQA kernel + fresh-token merge vs the f32 reference:
    full-size int8 MXU dots (no G=4-row dots), read-only cache."""
    from lightcompress_tpu.ops.pallas_attention import (
        bd_merge_new_token, decode_attention_bd,
    )

    B, H, G, S, D = 4, 2, 4, 256, 128
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, H, G, D), jnp.float32)
    k8 = jnp.asarray(rng.randint(-127, 128, (B, H, S, D)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, H, S) * 0.01 + 0.005, jnp.float32)
    vs = jnp.asarray(rng.rand(B, H, S) * 0.01 + 0.005, jnp.float32)
    kn = jnp.asarray(rng.randint(-127, 128, (B, H, D)), jnp.int8)
    vn = jnp.asarray(rng.randint(-127, 128, (B, H, D)), jnp.int8)
    kns = jnp.asarray(rng.rand(B, H) * 0.01 + 0.005, jnp.float32)
    vns = jnp.asarray(rng.rand(B, H) * 0.01 + 0.005, jnp.float32)

    # feature-major K (B, H*D, S); time-major V (B, S, H*D)
    kt = jnp.transpose(k8, (0, 1, 3, 2)).reshape(B, H * D, S)
    vt = jnp.transpose(v8, (0, 2, 1, 3)).reshape(B, S, H * D)

    qctx = decode_attention_bd(q, kt, ks, vt, vs, b_block=2, interpret=True)
    out = bd_merge_new_token(q, qctx, kn, vn, kns, vns, D ** -0.5)

    kf = jnp.concatenate(
        [k8.astype(jnp.float32) * ks[..., None],
         (kn.astype(jnp.float32) * kns[..., None])[:, :, None, :]], 2)
    vf = jnp.concatenate(
        [v8.astype(jnp.float32) * vs[..., None],
         (vn.astype(jnp.float32) * vns[..., None])[:, :, None, :]], 2)
    sc = jnp.einsum("bhgd,bhsd->bhgs", q, kf) * (D ** -0.5)
    p = jax.nn.softmax(sc, -1)
    ref = jnp.einsum("bhgs,bhsd->bhgd", p, vf)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel  # q-int8 + probs-int8 quantization noise


def test_decode_attention_bd_masked_lengths():
    """Serving shape: per-slot valid lengths mask cache columns; a length-0
    slot must come out NaN-free (the fresh token carries it)."""
    from lightcompress_tpu.ops.pallas_attention import (
        bd_merge_new_token, decode_attention_bd,
    )

    B, H, G, S, D = 4, 2, 4, 256, 128
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, H, G, D), jnp.float32)
    k8 = jnp.asarray(rng.randint(-127, 128, (B, H, S, D)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, H, S) * 0.01 + 0.005, jnp.float32)
    vs = jnp.asarray(rng.rand(B, H, S) * 0.01 + 0.005, jnp.float32)
    kn = jnp.asarray(rng.randint(-127, 128, (B, H, D)), jnp.int8)
    vn = jnp.asarray(rng.randint(-127, 128, (B, H, D)), jnp.int8)
    kns = jnp.asarray(rng.rand(B, H) * 0.01 + 0.005, jnp.float32)
    vns = jnp.asarray(rng.rand(B, H) * 0.01 + 0.005, jnp.float32)
    lengths = jnp.asarray([0, 7, 128, 256], jnp.int32)

    kt = jnp.transpose(k8, (0, 1, 3, 2)).reshape(B, H * D, S)
    vt = jnp.transpose(v8, (0, 2, 1, 3)).reshape(B, S, H * D)
    qctx = decode_attention_bd(q, kt, ks, vt, vs, lengths=lengths,
                               b_block=2, interpret=True)
    out = bd_merge_new_token(q, qctx, kn, vn, kns, vns, D ** -0.5)
    assert not bool(jnp.any(jnp.isnan(out)))

    # reference: mask then append the fresh token
    kf = jnp.concatenate(
        [k8.astype(jnp.float32) * ks[..., None],
         (kn.astype(jnp.float32) * kns[..., None])[:, :, None, :]], 2)
    vf = jnp.concatenate(
        [v8.astype(jnp.float32) * vs[..., None],
         (vn.astype(jnp.float32) * vns[..., None])[:, :, None, :]], 2)
    sc = jnp.einsum("bhgd,bhsd->bhgs", q, kf) * (D ** -0.5)
    col = jnp.arange(S + 1)[None, None, None, :]
    vis = (col < lengths[:, None, None, None]) | (col == S)
    sc = jnp.where(vis, sc, -jnp.inf)
    p = jax.nn.softmax(sc, -1)
    ref = jnp.einsum("bhgs,bhsd->bhgd", p, vf)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_decode_attention_bd4_matches_unpacked():
    """kv4 nibble kernel (decode_attention_bd4): matches attention over
    the dequantized nibble planes, masked and unmasked."""
    from lightcompress_tpu.ops.pallas_attention import (
        _quantize_q, decode_attention_bd4)
    from lightcompress_tpu.serving.kv_cache import quantize_kv4, unpack_kv4

    B, H, G, D, S = 2, 4, 4, 32, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, G, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k4, ks = quantize_kv4(k)
    v4, vs = quantize_kv4(v)
    kt4 = k4.transpose(0, 1, 3, 2).reshape(B, H * D // 2, S)
    vt4 = v4.transpose(0, 2, 1, 3).reshape(B, S, H * D // 2)
    q8, qs = _quantize_q(q)
    qf = q8.astype(jnp.float32) * qs[..., None]
    kd = unpack_kv4(k4) * ks[..., None]
    vd = unpack_kv4(v4) * vs[..., None]
    sc = jnp.einsum("bhgd,bhsd->bhgs", qf, kd) * D ** -0.5
    for lengths in (None, jnp.asarray([100, 3], jnp.int32)):
        ctx, m, d = decode_attention_bd4(
            q, kt4, ks.astype(jnp.bfloat16), vt4, vs.astype(jnp.bfloat16),
            lengths, interpret=True)
        n = np.asarray(ctx) / np.maximum(np.asarray(d)[..., None], 1e-30)
        scm = sc
        if lengths is not None:
            vis = jnp.arange(S)[None, None, None, :] < \
                lengths[:, None, None, None]
            scm = jnp.where(vis, sc, -jnp.inf)
        p = jax.nn.softmax(scm, -1)
        ref = np.asarray(jnp.einsum("bhgs,bhsd->bhgd", p, vd))
        assert np.abs(n - ref).max() < 0.05


def test_decode_attention_bd4_flash_matches_bd4():
    """S-split kv4 flash kernel: same results as the full-S bd4 kernel."""
    from lightcompress_tpu.ops.pallas_attention import (
        decode_attention_bd4, decode_attention_bd4_flash)
    from lightcompress_tpu.serving.kv_cache import quantize_kv4

    B, H, G, D, S = 2, 4, 4, 32, 256
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, H, G, D), jnp.bfloat16)
    k4, ks = quantize_kv4(jnp.asarray(rng.randn(B, H, S, D), jnp.float32))
    v4, vs = quantize_kv4(jnp.asarray(rng.randn(B, H, S, D), jnp.float32))
    kt4 = k4.transpose(0, 1, 3, 2).reshape(B, H * D // 2, S)
    vt4 = v4.transpose(0, 2, 1, 3).reshape(B, S, H * D // 2)
    for L in (None, jnp.asarray([200, 5], jnp.int32)):
        c1, m1, d1 = decode_attention_bd4(
            q, kt4, ks.astype(jnp.bfloat16), vt4, vs.astype(jnp.bfloat16),
            L, interpret=True)
        c2, m2, d2 = decode_attention_bd4_flash(
            q, kt4, ks.astype(jnp.bfloat16), vt4, vs.astype(jnp.bfloat16),
            L, s_block=64, interpret=True)
        n1 = np.asarray(c1) / np.maximum(np.asarray(d1)[..., None], 1e-30)
        n2 = np.asarray(c2) / np.maximum(np.asarray(d2)[..., None], 1e-30)
        assert np.abs(n1 - n2).max() < 0.05
