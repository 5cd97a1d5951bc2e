"""Distributed calibration collectives.

The reference merges per-rank calibration statistics with NCCL all-reduces
(GPTQ Hessians gptq.py:292-295, static act scales bbq.py:577, clip ranges
auto_clip.py:72-76, AWQ best-scale argmin-broadcast awq.py:256-273).

TPU-native equivalent: under multi-process JAX (`jax.distributed.initialize`)
these become psum/pmean over the ``data`` mesh axis.  For host-side (numpy)
calibration state we use ``multihost_utils`` broadcast/allreduce.  In
single-process runs every op is an identity — the default everywhere in CI.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def world_size() -> int:
    return jax.process_count()


def rank() -> int:
    return jax.process_index()


def is_distributed() -> bool:
    return jax.process_count() > 1


def _psum_host(x):
    """All-reduce a host value across processes via a tiny collective."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(jnp.asarray(x)).sum(axis=0)


def all_reduce_sum(x):
    if not is_distributed():
        return x
    return _psum_host(x)


def all_reduce_mean(x):
    if not is_distributed():
        return x
    return _psum_host(x) / world_size()


def all_reduce_min_scalar(x: float) -> float:
    if not is_distributed():
        return x
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(jnp.asarray([x]))
    return float(vals.min())


def broadcast_from(x, src: int):
    """Broadcast array x from process ``src`` (AWQ best-scale pattern)."""
    if not is_distributed():
        return x
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(jnp.asarray(x))
    return gathered[src]


def argmin_rank(local_val: float) -> int:
    """Which process holds the global minimum (awq.py:260-266)."""
    if not is_distributed():
        return 0
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(jnp.asarray([local_val]))
    return int(jnp.argmin(vals.reshape(-1)))
