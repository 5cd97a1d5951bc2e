"""Pipeline parallelism: GPipe microbatch schedule over a ``pp`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.11 — its memory scaling
is block streaming on one GPU); this is a TPU-native capability for serving
and calibrating models deeper than one chip's HBM.  Design:

- layers are split into ``pp`` contiguous stages; each stage's block params
  are STACKED on a leading axis sharded ``P("pp")`` so every device holds
  exactly its own stage (no replication).
- the schedule runs inside one ``shard_map`` over the ``pp`` axis: a
  ``lax.fori_loop`` over ``n_micro + pp - 1`` ticks where every device
  computes its stage on its current buffer and passes the result to the next
  device with ``lax.ppermute`` (XLA lowers this to an ICI neighbour copy that
  overlaps with the next tick's compute).
- stage 0 feeds microbatch ``t`` from the input stream; the last stage
  deposits finished microbatches into the output buffer.  Bubble fraction is
  the standard (pp-1)/(n_micro+pp-1).

Everything is shape-static and jit-compiled once; no Python-level
per-microbatch dispatch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def stack_stage_params(block_params: List[Dict], pp: int) -> Any:
    """[L blocks] -> pytree of arrays with leading dims (pp, L//pp, ...).

    Every leaf of the per-block param trees is stacked; the result is laid
    out so that ``leaf[s, i]`` is stage ``s``'s ``i``-th block.  Shard the
    result with ``P("pp")`` on axis 0 (see ``shard_stage_params``).
    """
    L = len(block_params)
    assert L % pp == 0, f"layers {L} not divisible by pp {pp}"
    per = L // pp

    def stack(*leaves):
        x = jnp.stack(leaves)  # (L, ...)
        return x.reshape(pp, per, *x.shape[1:])

    return jax.tree.map(stack, *block_params)


def shard_stage_params(stacked: Any, mesh: Mesh) -> Any:
    """Place stacked stage params with stage axis over ``pp``."""
    def put(x):
        spec = P("pp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, stacked)


def pipeline_forward(
    mesh: Mesh,
    stage_fn: Callable[[Any, Array], Array],
    stacked_params: Any,
    x_micro: Array,
    axis_name: str = "pp",
) -> Array:
    """Run the pipeline on ``x_micro`` of shape (n_micro, mb, ...).

    ``stage_fn(stage_params, x) -> y`` applies ONE stage (``L/pp`` blocks,
    e.g. a ``lax.scan`` over the stacked block dim) to a microbatch; input
    and output must have identical shape/dtype (transformer residual
    stream).  Returns (n_micro, mb, ...) outputs equal to sequentially
    applying all ``pp`` stages.
    """
    from jax import shard_map

    pp = mesh.shape[axis_name]
    n_micro = x_micro.shape[0]
    n_ticks = n_micro + pp - 1
    feat_shape = x_micro.shape[1:]

    in_spec_params = jax.tree.map(
        lambda x: P(axis_name, *([None] * (x.ndim - 1))), stacked_params)

    def per_device(params_stage, xs):
        # params_stage leaves: (1, L/pp, ...) — drop the unit stage dim
        params_stage = jax.tree.map(lambda x: x[0], params_stage)
        sidx = jax.lax.axis_index(axis_name)
        buf = jnp.zeros(feat_shape, xs.dtype)          # current input
        outs = jnp.zeros((n_micro,) + feat_shape, xs.dtype)

        def tick(t, carry):
            buf, outs = carry
            # stage 0 ingests microbatch t (clamped; masked-out later ticks
            # write garbage that is never propagated to outs)
            mi = jnp.minimum(t, n_micro - 1)
            inp = jnp.where(sidx == 0, xs[mi], buf)
            y = stage_fn(params_stage, inp)
            # last stage finished microbatch (t - (pp-1)) at this tick
            oi = jnp.clip(t - (pp - 1), 0, n_micro - 1)
            write = (sidx == pp - 1) & (t >= pp - 1)
            outs = jax.lax.dynamic_update_slice(
                outs,
                jnp.where(write, y, jax.lax.dynamic_slice(
                    outs, (oi,) + (0,) * len(feat_shape),
                    (1,) + feat_shape)[0])[None],
                (oi,) + (0,) * len(feat_shape))
            # shift activations one stage to the right
            buf = jax.lax.ppermute(
                y, axis_name, [(i, i + 1) for i in range(pp - 1)])
            return buf, outs

        _, outs = jax.lax.fori_loop(0, n_ticks, tick, (buf, outs))
        # only the LAST device's outs are real; psum after zeroing others
        outs = jnp.where(sidx == pp - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, axis_name)
        return outs

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(in_spec_params, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, x_micro)


def pipeline_blocks_forward(
    mesh: Mesh,
    arch,
    block_params: List[Dict],
    x: Array,
    n_micro: int,
    axis_name: str = "pp",
    **fwd_kwargs,
) -> Array:
    """Convenience: run a model's transformer blocks as a pipeline.

    ``x``: (B, T, H) hidden states after embedding; B must divide into
    ``n_micro`` microbatches.  RoPE tables / mask are computed per stage
    from ``arch`` (identical on every stage).  Returns (B, T, H).
    """
    from ..models import arch as A

    pp = mesh.shape[axis_name]
    stacked = stack_stage_params(block_params, pp)
    stacked = shard_stage_params(stacked, mesh)
    B, T, H = x.shape
    assert B % n_micro == 0
    mb = B // n_micro
    cos, sin = A.rope_cos_sin(arch, jnp.arange(T))
    mask = A.causal_mask(T, T)

    def stage_fn(params_stage, xx):
        def body(h, bp):
            h, _, _ = A.block_forward(arch, bp, h, cos, sin, mask)
            return h, None

        y, _ = jax.lax.scan(body, xx, params_stage)
        return y

    xm = x.reshape(n_micro, mb, T, H)
    ym = pipeline_forward(mesh, stage_fn, stacked, xm, axis_name=axis_name)
    return ym.reshape(B, T, H)
