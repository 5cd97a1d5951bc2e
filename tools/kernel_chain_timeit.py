"""Shared CORRECT chain-timing protocol for kernel probes through the
axon tunnel (r5 session-2 finding, tools/r5logs/dedup_check):

- a repeated IDENTICAL execution (same executable + args) is
  dedup-cached and returns in ~30 ms regardless of work — any timed
  repeat of a warmup call measures nothing;
- the FIRST execution of an executable pays a multi-second
  compile/load cost that does NOT cancel between different-iter
  executables.

Protocol: make every execution unique with a traced float SALT (feeds
the carry init, so dedup never hits), warm BOTH iter-count executables
once (pays compile+load), then time salted runs of I and 3I and
difference — per-dispatch tunnel latency cancels, per-iteration cost
survives.  Usage:

    def chain(salt, iters):  # jitted, static iters, salt traced
        ...
    dt = timeit_salted(chain, iters)
"""

import time

import jax.numpy as jnp


def timeit_salted(chain, iters, reps: int = 1):
    """chain(salt: f32 scalar, iters: int static) -> scalar array.
    Returns per-iteration seconds."""
    salt = iter(range(10_000))

    def run(n):
        return float(chain(jnp.float32(next(salt) * 1e-6), n))

    run(iters)          # compile + load (I executable)
    run(3 * iters)      # compile + load (3I executable)
    lo = hi = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        run(iters)
        lo += time.perf_counter() - t0
        t0 = time.perf_counter()
        run(3 * iters)
        hi += time.perf_counter() - t0
    return (hi - lo) / (2 * iters * reps)
