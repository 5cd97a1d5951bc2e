"""Selection-parity tests for the video token-reduction methods (VERDICT
r2 #6): kept-token sets / merged values must match NumPy ports of the
REFERENCE scoring on the same synthetic features.

Ports follow:
- dycole_ttm        /root/reference/llmc/compression/token_reduction/dycoke.py:20-104
- DySeg cuts        .../fastvid.py:262-283
- density score     .../fastvid.py:357-389
- DTM merge         .../fastvid.py:400-431
- HoliTom merge     .../holitom.py:1374-1421
"""

import numpy as np

import jax
import jax.numpy as jnp

from lightcompress_tpu.compression.token_reduction.video import (
    dycoke_ttm, fastvid_density_score, fastvid_dtm_merge,
    fastvid_dyseg_cuts, holitom_merge)


def _np_normalize(x, axis=-1):
    return x / np.clip(np.linalg.norm(x, axis=axis, keepdims=True),
                       1e-12, None)


def np_dycoke_ttm(frames, merging_ratio):
    """NumPy port of the reference dycole_ttm (pair pass + 4-stride pass,
    ascending-similarity gather order, trailing odd frame dropped)."""
    F, Tp, H = frames.shape
    n_keep = int((1 - merging_ratio) * Tp)
    fn = _np_normalize(frames)
    out = []
    for i in range(0, F - 1, 2):
        sim = np.sum(fn[i] * fn[i + 1], -1)
        idx = np.argsort(sim, kind="stable")[:n_keep]
        out.append(frames[i])
        out.append(frames[i + 1][idx])
    for i in range(0, F - 4, 4):
        sim = np.sum(fn[i] * fn[i + 2], -1)
        idx = np.argsort(sim, kind="stable")[:n_keep]
        out[i + 2] = frames[i + 2][idx]
    return np.concatenate(out, 0)


def test_dycoke_parity():
    rng = np.random.RandomState(0)
    frames = rng.randn(8, 16, 12).astype(np.float32)
    got = np.asarray(dycoke_ttm(jnp.asarray(frames), 0.7))
    want = np_dycoke_ttm(frames, 0.7)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
    # odd F: trailing frame dropped AND the stride-4 pass runs one more
    # step (range(0, F-4, 4) sees F=9) — match the reference port exactly
    frames9 = rng.randn(9, 16, 12).astype(np.float32)
    got9 = np.asarray(dycoke_ttm(jnp.asarray(frames9), 0.7))
    np.testing.assert_allclose(got9, np_dycoke_ttm(frames9, 0.7),
                               atol=1e-5)


def test_fastvid_dyseg_parity():
    rng = np.random.RandomState(1)
    g = rng.randn(12, 8).astype(np.float32)
    c, tau = 4, 0.3
    is_cut, sims = fastvid_dyseg_cuts(jnp.asarray(g), c, tau)
    gn = _np_normalize(g)
    sim_np = np.sum(gn[:-1] * gn[1:], -1)
    np.testing.assert_allclose(np.asarray(sims), sim_np, atol=1e-5)
    want = np.zeros(11, bool)
    want[np.argsort(sim_np, kind="stable")[:c - 1]] = True
    want |= sim_np < tau
    assert (np.asarray(is_cut) == want).all()


def np_fastvid_density(feats, k=4):
    F, N, H = feats.shape
    out = np.zeros((F, N))
    for f in range(F):
        d = np.sqrt(((feats[f][:, None] - feats[f][None]) ** 2
                     ).sum(-1)) / np.sqrt(H)
        near = np.sort(d, axis=-1)[:, :k]
        density = np.exp(-(near ** 2).mean(-1))
        mask = density[None, :] > density[:, None]
        dmax = d.max()
        d0 = np.where(mask, d, dmax).min(-1)
        out[f] = d0 * density
    return out


def test_fastvid_density_parity():
    rng = np.random.RandomState(2)
    feats = rng.randn(3, 20, 8).astype(np.float32)
    got = np.asarray(fastvid_density_score(jnp.asarray(feats)))
    want = np_fastvid_density(feats)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
    # selection parity: context top-k identical
    C = 5
    gi = np.argsort(-got, -1)[:, :C]
    wi = np.argsort(-want, -1)[:, :C]
    assert (np.sort(gi, -1) == np.sort(wi, -1)).all()


def test_fastvid_dtm_merge_parity():
    rng = np.random.RandomState(3)
    filtered = rng.randn(2, 12, 8).astype(np.float32)
    ctx_idx = np.stack([rng.choice(12, 4, replace=False) for _ in range(2)])
    alpha = 0.3
    got = np.asarray(fastvid_dtm_merge(jnp.asarray(filtered),
                                       jnp.asarray(ctx_idx), alpha))
    # NumPy port (fastvid.py:400-431)
    for f in range(2):
        tb = _np_normalize(filtered[f])
        tgt = tb[ctx_idx[f]]
        sim = tb @ tgt.T
        assign = sim.argmax(-1)
        one_hot = np.eye(4)[assign]
        counts = one_hot.sum(0)
        w = np.clip(1.0 / (counts + 1.0), alpha, None)[:, None]
        agg = (one_hot.T @ filtered[f]) / np.clip(counts, 1, None)[:, None]
        want = w * filtered[f][ctx_idx[f]] + (1 - w) * agg
        np.testing.assert_allclose(got[f], want, rtol=1e-4, atol=1e-5)


def test_holitom_merge_parity():
    """Sequential pairwise-average fold: later merges must see earlier
    results (the reference's in-place loop)."""
    rng = np.random.RandomState(4)
    B, T, H, n_vis, n_keep = 2, 20, 8, 12, 5
    x = rng.randn(B, T, H).astype(np.float32)
    vis_start = np.array([3, 5], np.int32)
    keep_off = np.stack([rng.choice(n_vis, n_keep, replace=False)
                         for _ in range(B)]).astype(np.int32)
    got = np.asarray(holitom_merge(jnp.asarray(x), jnp.asarray(vis_start),
                                   n_vis, jnp.asarray(keep_off)))
    want = x.copy()
    for b in range(B):
        s = vis_start[b]
        vis = x[b, s:s + n_vis]
        kept = set(keep_off[b].tolist())
        non_idx = [i for i in range(n_vis) if i not in kept]
        topk = vis[keep_off[b]].copy()
        nn_ = _np_normalize(vis[non_idx])
        tk = _np_normalize(vis[keep_off[b]])
        tgt = (nn_ @ tk.T).argmax(-1)
        for j, i in enumerate(non_idx):
            topk[tgt[j]] = (topk[tgt[j]] + vis[i]) / 2.0
        want[b, s + keep_off[b]] = topk
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
