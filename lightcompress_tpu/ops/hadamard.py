"""Hadamard transforms and matrices.

TPU-native replacement for the reference's fast_hadamard_transform CUDA
extension + 97k lines of hard-coded constants (hadamard_utils.py):

- ``fwht``: XLA butterfly Walsh-Hadamard transform (log2 n reshape steps —
  XLA fuses these into a few kernels; a Pallas variant exists for the
  serving hot path).
- non-power-of-2 factors are **generated** via Paley I/II constructions
  (prime and prime-squared fields) instead of shipping constant tables;
  covers K in {12,20,28,36,44,52,60,76,84,108,124,140,148,...} — enough for
  Llama-3/Qwen-class dims (14336=2^9*28, 13824=2^7*108, 3584=2^7*28, ...).
- ``get_hadK``, ``matmul_hadU``, ``random_hadamard_matrix``,
  ``apply_exact_had_to_linear`` mirror hadamard_utils.py:19-170 semantics.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Paley constructions (numpy, host-side, cached)
# ---------------------------------------------------------------------------

def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in range(2, int(n**0.5) + 1):
        if n % p == 0:
            return False
    return True


def _paley1(q: int) -> np.ndarray:
    """Paley I: q prime, q % 4 == 3 -> H of order q+1."""
    residues = set((i * i) % q for i in range(1, q))

    def chi(x):
        x %= q
        if x == 0:
            return 0
        return 1 if x in residues else -1

    Q = np.array([[chi(j - i) for j in range(q)] for i in range(q)])
    H = np.ones((q + 1, q + 1), dtype=np.int64)
    H[1:, 1:] = Q - np.eye(q, dtype=np.int64)
    H[0, 1:] = -1  # column normalization variant
    # standard Paley I: S = Q + I gives skew-type; use jacket form:
    H = np.ones((q + 1, q + 1), dtype=np.int64)
    H[1:, 0] = -1
    H[1:, 1:] = Q + np.eye(q, dtype=np.int64)
    assert _check_hadamard(H)
    return H


def _gf_p2_elements(p: int):
    """GF(p^2) as pairs (a, b) = a + b*t with t^2 = nr (non-residue)."""
    residues = set((i * i) % p for i in range(1, p))
    nr = next(x for x in range(2, p) if x not in residues)
    elems = [(a, b) for a in range(p) for b in range(p)]

    def mul(x, y):
        a, b = x
        c, d = y
        return ((a * c + b * d * nr) % p, (a * d + b * c) % p)

    return elems, mul


def _paley_chi_table(q: int):
    """Quadratic character over GF(q) for q prime or p^2."""
    if _is_prime(q):
        residues = set((i * i) % q for i in range(1, q))
        elems = list(range(q))

        def sub(x, y):
            return (x - y) % q

        def chi(x):
            if x % q == 0:
                return 0
            return 1 if x % q in residues else -1

        return elems, sub, chi
    # prime square
    p = int(round(q**0.5))
    assert p * p == q and _is_prime(p), f"unsupported field order {q}"
    elems, mul = _gf_p2_elements(p)
    squares = set()
    for e in elems:
        if e != (0, 0):
            squares.add(mul(e, e))

    def sub(x, y):
        return ((x[0] - y[0]) % p, (x[1] - y[1]) % p)

    def chi(x):
        if x == (0, 0):
            return 0
        return 1 if x in squares else -1

    return elems, sub, chi


def _paley2(q: int) -> np.ndarray:
    """Paley II: q ≡ 1 mod 4 (prime or prime^2) -> H of order 2(q+1)."""
    elems, sub, chi = _paley_chi_table(q)
    n = q + 1
    # conference-like matrix C (symmetric): C[0,0]=0, borders 1
    C = np.zeros((n, n), dtype=np.int64)
    C[0, 1:] = 1
    C[1:, 0] = 1
    for i, a in enumerate(elems):
        for j, b in enumerate(elems):
            if i != j:
                C[i + 1, j + 1] = chi(sub(a, b))
    # H = C⊗[[1,1],[1,-1]] + I⊗[[1,-1],[-1,-1]]
    P = np.array([[1, 1], [1, -1]])
    M = np.array([[1, -1], [-1, -1]])
    H = np.kron(C, P) + np.kron(np.eye(n, dtype=np.int64), M)
    assert _check_hadamard(H)
    return H


def _check_hadamard(H: np.ndarray) -> bool:
    n = H.shape[0]
    return bool(np.array_equal(H @ H.T, n * np.eye(n, dtype=H.dtype)))


# Williamson quadruples found by tools/williamson_search.py (symmetric
# circulant first rows; verified H H^T = K I at construction time).  The
# reference ships these orders as hard-coded 156x156 / 172x172 tables
# (hadamard_utils.py get_had156/get_had172); we store 4 first rows and
# rebuild.  '+-' strings decode to +1/-1.
_WILLIAMSON_ROWS = {
    39: ("+-+-++-+--+--++----------++--+--+-++-+-",
         "+-+++-++------+--+-++-+--+------++-+++-",
         "+-+-++----+++--++------++--+++----++-+-",
         "++---+-++++---+---+--+---+---++++-+---+"),
    43: ("++---++++-+--+--++--------++--+--+-++++---+",
         "++-++++++----+-+--++-++-++--+-+----++++++-+",
         "+++-+-++--+-+-++++-+----+-++++-+-+--++-+-++",
         "+---++--++++-+-+++-++--++-+++-+-++++--++---"),
}


def _williamson_K(n: int) -> np.ndarray:
    rows = _WILLIAMSON_ROWS[n]
    mats = []
    for r in rows:
        row = np.array([1 if c == "+" else -1 for c in r], np.int64)
        assert len(row) == n, (len(row), n)
        idx = (np.arange(n)[None, :] - np.arange(n)[:, None]) % n
        mats.append(row[idx])
    a, b, c, d = mats
    H = np.block([
        [a, b, c, d],
        [-b, a, -d, c],
        [-c, d, a, -b],
        [-d, -c, b, a],
    ])
    assert _check_hadamard(H), f"Williamson rows for n={n} are not valid"
    return H


@functools.lru_cache(maxsize=None)
def hadamard_matrix_K(K: int) -> np.ndarray:
    """Small non-pow2 Hadamard matrix of order K (generated, not tabulated)."""
    if K == 1:
        return np.ones((1, 1), dtype=np.int64)
    if K & (K - 1) == 0:
        H = np.ones((1, 1), dtype=np.int64)
        while H.shape[0] < K:
            H = np.block([[H, H], [H, -H]])
        return H
    if K % 4 == 0 and K // 4 in _WILLIAMSON_ROWS:
        return _williamson_K(K // 4)
    q = K - 1
    if _is_prime(q) and q % 4 == 3:
        return _paley1(q)
    q2 = K // 2 - 1
    if K % 2 == 0:
        p = int(round(q2**0.5))
        if (_is_prime(q2) and q2 % 4 == 1) or (
            p * p == q2 and _is_prime(p) and q2 % 4 == 1
        ):
            return _paley2(q2)
    # even K: try K/2 recursively (Sylvester doubling)
    if K % 2 == 0:
        try:
            Hh = hadamard_matrix_K(K // 2)
            return np.block([[Hh, Hh], [Hh, -Hh]])
        except ValueError:
            pass
    raise ValueError(
        f"no generated Hadamard construction for order {K} "
        f"(Paley I/II + Sylvester); Williamson-type orders (156, 172) "
        f"are not yet supported"
    )


def get_hadK(n: int) -> Tuple[Optional[np.ndarray], int]:
    """Factor n = 2^a * K with a maximal such that H_K is constructible
    (hadamard_utils.py:19-70 semantics, constructive)."""
    K = n
    while K % 2 == 0:
        K //= 2
    # grow K by powers of 2 until constructible (bounded: the dense factor
    # matmul cost grows with K; the reference's largest table is 172)
    while K <= min(n, 256):
        try:
            hadamard_matrix_K(K)
            break
        except ValueError:
            K *= 2
    else:
        raise ValueError(
            f"no Hadamard factorization for n={n} with factor <= 256"
        )
    if K == 1:
        return None, 1
    return hadamard_matrix_K(K).astype(np.float32), K


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def fwht(x: Array) -> Array:
    """Unnormalized Walsh-Hadamard transform over the last dim (pow2)."""
    n = x.shape[-1]
    assert n & (n - 1) == 0, "fwht needs a power-of-2 dim"
    shape = x.shape
    x = x.reshape(-1, n)
    h = 1
    while h < n:
        x = x.reshape(-1, n // (2 * h), 2, h)
        a = x[:, :, 0, :]
        b = x[:, :, 1, :]
        x = jnp.stack([a + b, a - b], axis=2)
        h *= 2
    return x.reshape(shape)


def matmul_hadU(x: Array, scale: Optional[float] = None) -> Array:
    """x @ H_n^T / sqrt(n) — normalized Hadamard along the last dim, with the
    non-pow2 factor handled by a small dense matmul (hadamard_utils
    matmul_hadU_cuda:109-122)."""
    n = x.shape[-1]
    hadK, K = get_hadK(n)
    if scale is None:
        scale = 1.0 / math.sqrt(n)
    if K == 1:
        return fwht(x) * scale
    shape = x.shape
    xr = x.reshape(-1, K, n // K)
    xr = fwht(xr) * scale
    hk = jnp.asarray(hadK, xr.dtype)
    xr = jnp.einsum("kj,bjm->bkm", hk, xr)
    return xr.reshape(shape)


def random_hadamard_matrix(n: int, key) -> Array:
    """Randomized orthogonal Hadamard: H_n diag(±1) / sqrt(n)
    (hadamard_utils.py:100-107)."""
    signs = jax.random.rademacher(key, (n,), dtype=jnp.float32)
    D = jnp.diag(signs)
    # matmul_hadU applies H along the LAST dim: rows of D are basis vectors
    return matmul_hadU(D.astype(jnp.float64)).T.astype(jnp.float64)


def random_orthogonal_matrix(n: int, key) -> Array:
    """QR-based random orthogonal (quarot.py:86-92)."""
    m = jax.random.normal(key, (n, n), dtype=jnp.float64)
    q, r = jnp.linalg.qr(m)
    return q * jnp.sign(jnp.diagonal(r))[None, :]


def apply_had_right(W: Array, scale_dim: Optional[int] = None) -> Array:
    """W @ H/sqrt(n) along the input-channel (last) dim."""
    return matmul_hadU(W.astype(jnp.float64)).astype(W.dtype)


def apply_had_left(W: Array) -> Array:
    """(H/sqrt(n)) @ W — rotate output channels."""
    return matmul_hadU(W.T.astype(jnp.float64)).T.astype(W.dtype)


def apply_exact_had_to_linear(
    W: Array, had_dim: int = -1, output: bool = False
) -> Array:
    """Bake an exact Hadamard into a weight (hadamard_utils.py:129-170).

    output=True rotates output channels (optionally per-head blocks of
    ``had_dim``); output=False rotates input channels.
    """
    Wf = W.astype(jnp.float64)
    if had_dim == -1:
        return (apply_had_left(Wf) if output else apply_had_right(Wf)).astype(
            W.dtype
        )
    assert had_dim & (had_dim - 1) == 0
    if output:
        Wt = Wf.T  # (in, out)
        r = Wt.reshape(Wt.shape[0], -1, had_dim)
        r = fwht(r) / math.sqrt(had_dim)
        return r.reshape(Wt.shape).T.astype(W.dtype)
    r = Wf.reshape(Wf.shape[0], -1, had_dim)
    r = fwht(r) / math.sqrt(had_dim)
    return r.reshape(Wf.shape).astype(W.dtype)
