"""Williamson quadruple search for H_156 (n=39) and H_172 (n=43).

Finds symmetric circulant +-1 matrices A,B,C,D of odd order n with
A^2+B^2+C^2+D^2 = 4nI; the Williamson array then yields a Hadamard matrix
of order 4n (the two orders the reference ships as hard-coded tables,
hadamard_utils.py get_had156/172 — we generate instead).

Search design (classic PAF/PSD machinery, vectorized):
1. symmetric +-1 first rows with x0=+1 (WLOG: negation preserves PAF);
2. PSD prune: DFT power of each sequence <= 4n at every frequency
   (the four PSDs are >= 0 and sum to exactly 4n);
3. row-sum classes: at k=0 the PSD identity reads
   s_A^2+s_B^2+s_C^2+s_D^2 = 4n with odd s_X — only a handful of odd-square
   decompositions exist, pairing down the search to class products;
4. decimation canonicalization: i -> u*i (u a unit mod n) maps solutions to
   solutions and permutes PAF vectors uniformly, so the first component is
   WLOG an orbit representative (~phi(n)/2-fold reduction);
5. meet-in-the-middle hash join on pair PAF sums with pairwise-PSD
   feasibility (PSD_i + PSD_j <= 4n) pruning both sides.

Run:  python tools/williamson_search.py 39 43
"""

from __future__ import annotations

import sys
import time

import numpy as np


def symmetric_sequences(n: int) -> np.ndarray:
    m = (n - 1) // 2
    bits = np.arange(2**m, dtype=np.int64)
    free = ((bits[:, None] >> np.arange(m)[None, :]) & 1).astype(np.int8)
    free = 2 * free - 1
    seq = np.empty((2**m, n), np.int8)
    seq[:, 0] = 1
    seq[:, 1 : m + 1] = free
    seq[:, m + 1 :] = free[:, ::-1]
    return seq


def psd_table(seq: np.ndarray, n: int) -> np.ndarray:
    F = np.fft.rfft(seq.astype(np.float64), axis=1)
    return (F.real**2 + F.imag**2).astype(np.float32)  # (N, n//2+1)


def paf_table(seq: np.ndarray, n: int) -> np.ndarray:
    m = (n - 1) // 2
    s32 = seq.astype(np.int32)
    out = np.empty((seq.shape[0], m), np.int8)
    for s in range(1, m + 1):
        out[:, s - 1] = np.sum(s32 * np.roll(s32, -s, axis=1), axis=1)
    return out


def decompositions(n: int):
    """Multisets of 4 odd positives with sum of squares = 4n."""
    target = 4 * n
    odds = [k for k in range(1, int(target**0.5) + 1, 2)]
    out = []
    for a in odds:
        for b in odds:
            if b < a:
                continue
            for c in odds:
                if c < b:
                    continue
                d2 = target - a * a - b * b - c * c
                if d2 < c * c:
                    continue
                d = int(round(d2**0.5))
                if d * d == d2 and d % 2 == 1:
                    out.append((a, b, c, d))
    return out


def orbit_reps(seqs: np.ndarray, n: int) -> np.ndarray:
    """Indices of decimation-orbit representatives (lexicographic min)."""
    units = [u for u in range(1, n) if np.gcd(u, n) == 1]
    idx_maps = [(np.arange(n) * u) % n for u in units]
    # bit-encode each sequence for fast comparison
    enc = ((seqs > 0).astype(np.uint64) << np.arange(n, dtype=np.uint64)[None, : min(n, 64)][:, :n]).sum(axis=1) \
        if n <= 64 else None
    keep = np.ones(seqs.shape[0], bool)
    base = (seqs > 0).astype(np.uint8)
    codes = np.packbits(base, axis=1)
    code_set = {c.tobytes(): i for i, c in enumerate(codes)}
    for j, im in enumerate(idx_maps):
        dec = base[:, im]
        dcodes = np.packbits(dec, axis=1)
        for i in range(seqs.shape[0]):
            if not keep[i]:
                continue
            other = code_set.get(dcodes[i].tobytes())
            if other is not None and other < i:
                keep[i] = False
    return np.nonzero(keep)[0]


def circulant(row: np.ndarray) -> np.ndarray:
    n = len(row)
    idx = (np.arange(n)[None, :] - np.arange(n)[:, None]) % n
    return row[idx]


def williamson_hadamard(A, B, C, D) -> np.ndarray:
    a, b, c, d = (circulant(np.asarray(x, np.int64)) for x in (A, B, C, D))
    return np.block([
        [a, b, c, d],
        [-b, a, -d, c],
        [-c, d, a, -b],
        [-d, -c, b, a],
    ])


def check(H: np.ndarray) -> bool:
    n = H.shape[0]
    return bool(np.array_equal(H @ H.T, n * np.eye(n, dtype=H.dtype)))


def _feasible_pairs(psd_i, psd_j, n, chunk_rows):
    """Yield (rows, cols) index arrays of pairs with PSD_i+PSD_j <= 4n."""
    lim = 4 * n + 1e-4
    Nj = psd_j.shape[0]
    for r0 in range(0, psd_i.shape[0], chunk_rows):
        pi = psd_i[r0 : r0 + chunk_rows]  # (R, F)
        ok = np.ones((pi.shape[0], Nj), bool)
        for f in range(1, pi.shape[1]):  # skip k=0 (class-constrained)
            ok &= pi[:, f : f + 1] + psd_j[None, :, f] <= lim
        rr, cc = np.nonzero(ok)
        if rr.size:
            yield rr + r0, cc


def search(n: int, max_solutions: int = 1, verbose: bool = True,
           only_dec: int = None):
    t0 = time.time()
    seqs = symmetric_sequences(n)
    psd = psd_table(seqs, n)
    feas = np.all(psd <= 4 * n + 1e-4, axis=1)
    seqs, psd = seqs[feas], psd[feas]
    pafs = paf_table(seqs, n)
    sums = seqs.sum(axis=1).astype(np.int32)
    classes = {}
    for s in np.unique(np.abs(sums)):
        classes[int(s)] = np.nonzero(np.abs(sums) == s)[0]
    if verbose:
        print(f"n={n}: {seqs.shape[0]} feasible; classes "
              f"{ {k: len(v) for k, v in classes.items()} }; "
              f"decomps {decompositions(n)}", flush=True)

    m = (n - 1) // 2
    sols = []
    for di, dec in enumerate(decompositions(n)):
        if only_dec is not None and di != only_dec:
            continue
        if any(s not in classes for s in dec):
            continue
        # choose the A-class (decimation-canonicalized) = rarest class value
        counts = {s: len(classes[s]) for s in set(dec)}
        a_val = min(set(dec), key=lambda s: counts[s])
        rest = list(dec)
        rest.remove(a_val)
        # pairing: (A, B) hashed; (C, D) streamed. Put the largest class in
        # the streamed pair.
        rest_sorted = sorted(rest, key=lambda s: counts[s])
        b_val, c_val, d_val = rest_sorted[0], rest_sorted[1], rest_sorted[2]
        ia = classes[a_val]
        reps_local = orbit_reps(seqs[ia], n)
        ia = ia[reps_local]
        ib, ic, id_ = classes[b_val], classes[c_val], classes[d_val]
        if verbose:
            print(f"n={n} dec={dec}: A={a_val}({len(ia)} reps) B={b_val}"
                  f"({len(ib)}) | C={c_val}({len(ic)}) D={d_val}"
                  f"({len(id_)})", flush=True)
        # hash side: (A, B)
        keys = []
        pairs = []
        for rr, cc in _feasible_pairs(psd[ia], psd[ib], n, 256):
            k = pafs[ia[rr]].astype(np.int16) + pafs[ib[cc]].astype(np.int16)
            keys.append(k)
            pairs.append(np.stack([ia[rr], ib[cc]], 1))
        if not keys:
            continue
        keys = np.concatenate(keys).astype(np.int8)
        pairs = np.concatenate(pairs)
        kv = keys.view([("", np.int8)] * m).ravel()
        order = np.argsort(kv)
        kv_sorted = kv[order]
        pairs = pairs[order]
        if verbose:
            print(f"  hash side: {len(kv_sorted)} feasible (A,B) pairs "
                  f"[{time.time()-t0:.0f}s]", flush=True)
        # stream side: (C, D)
        for rr, cc in _feasible_pairs(psd[ic], psd[id_], n, 128):
            k2 = -(pafs[ic[rr]].astype(np.int16) + pafs[id_[cc]].astype(np.int16))
            if np.any(k2 > 127) or np.any(k2 < -128):
                valid = np.all((k2 <= 127) & (k2 >= -128), axis=1)
                rr, cc, k2 = rr[valid], cc[valid], k2[valid]
            k2 = k2.astype(np.int8)
            kv2 = k2.view([("", np.int8)] * m).ravel()
            pos = np.searchsorted(kv_sorted, kv2)
            pos = np.clip(pos, 0, len(kv_sorted) - 1)
            hit = kv_sorted[pos] == kv2
            for h in np.nonzero(hit)[0]:
                # walk all equal keys at pos[h]
                p = pos[h]
                while p < len(kv_sorted) and kv_sorted[p] == kv2[h]:
                    iA, iB = pairs[p]
                    A, B = seqs[iA], seqs[iB]
                    C, D = seqs[ic[rr[h]]], seqs[id_[cc[h]]]
                    H = williamson_hadamard(A, B, C, D)
                    if check(H):
                        sols.append((A, B, C, D))
                        print(f"n={n}: SOLUTION [{time.time()-t0:.0f}s]",
                              flush=True)
                        for nm, row in zip("ABCD", (A, B, C, D)):
                            print(f"  {nm} = {row.tolist()}", flush=True)
                        if len(sols) >= max_solutions:
                            return sols
                    p += 1
    return sols


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--dec="):
            only = int(a.split("=")[1])
    for n in [int(a) for a in args] or [39, 43]:
        search(n, only_dec=only)
