"""Sequence (context) parallelism for long prefill.

Absent from the reference (SURVEY §5 "no sequence/context parallelism of
any kind"); TPU-native new design, not a port: activations are sharded on
the SEQUENCE axis over the ``sp`` mesh axis, every per-token op (norms,
linears, MLP) stays sequence-local, and attention contracts over the
sharded axis — XLA's SPMD partitioner inserts the K/V all-gather over ICI
(the "annotate shardings, let XLA insert collectives" recipe).  Memory per
chip for a prefill of length T drops to O(T/sp) activations + O(T) KV only
inside attention.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def sp_prefill_forward(
    mesh: Mesh,
    arch,
    params: Dict,
    ids: Array,
    axis_name: str = "sp",
    linear_fns=None,
) -> Array:
    """Full-model prefill with sequence-sharded activations.

    ids: (B, T) with T divisible by the ``sp`` axis size.  Returns logits
    (B, T, V) (sequence-sharded; device_get or re-shard as needed).
    Numerically identical to the unsharded forward — tested against it on a
    CPU mesh (tests/test_parallel.py).
    """
    from ..models import arch as A

    sp = mesh.shape[axis_name]
    B, T = ids.shape
    assert T % sp == 0, f"T={T} not divisible by sp={sp}"

    seq_spec = P(None, axis_name)

    def fwd(params, ids):
        x = A.embed_forward(arch, params, ids)
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, axis_name, None)))
        cos, sin = A.rope_cos_sin(arch, jnp.arange(T))
        mask = A.causal_mask(T, T)
        lfs = linear_fns or [None] * len(params["blocks"])
        for bp, lf in zip(params["blocks"], lfs):
            x, _, _ = A.block_forward(arch, bp, x, cos, sin, mask,
                                      linear_fn=lf or A.default_linear)
            # re-pin the residual stream to the sequence sharding so every
            # block's per-token work stays local and only attention's
            # score/context contractions cross chips
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, axis_name, None)))
        return A.head_forward(arch, params, x)

    ids = jax.device_put(ids, NamedSharding(mesh, seq_spec))
    with jax.set_mesh(mesh):
        return jax.jit(fwd)(params, ids)
