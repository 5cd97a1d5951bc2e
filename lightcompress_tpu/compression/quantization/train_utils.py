"""Shared utilities for gradient-based block reconstruction algorithms
(llmc train_utils.py + the omniq/tesseraq/ntweak training loops).

A block trainer minimizes ``MSE(block_fp(x), block_quant(x; theta))`` over the
calib batches with optax AdamW; the quantized forward uses STE rounding so
gradients flow to the trainables.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def mse_loss(a: Array, b: Array) -> Array:
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


class RectifiedSigmoid:
    """sigma(x)*(h-l)+l clipped to [0,1] (tesseraq.py:51)."""

    def __init__(self, l: float = -0.1, h: float = 1.1):
        self.l = l
        self.h = h

    def __call__(self, x: Array) -> Array:
        return jnp.clip(jax.nn.sigmoid(x) * (self.h - self.l) + self.l, 0.0, 1.0)

    def inverse(self, y: Array) -> Array:
        y = jnp.clip(y, 1e-4, 1 - 1e-4)
        p = (y - self.l) / (self.h - self.l)
        p = jnp.clip(p, 1e-6, 1 - 1e-6)
        return jnp.log(p / (1 - p))


def train_block(
    loss_fn: Callable[[Dict, Array, Array], Array],
    trainables: Dict,
    batches: List[Array],
    targets: List[Array],
    lr: float,
    epochs: int,
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
    lr_overrides: Optional[Dict[str, float]] = None,
):
    """Generic per-block AdamW loop; returns (trained params, final loss).

    ``lr_overrides`` maps top-level trainable keys to their own learning
    rate (the reference's per-param-group lr, e.g. tesseraq.py:239
    scale_lr)."""
    if lr_overrides:
        labels = {k: jax.tree.map(lambda _: k, v)
                  for k, v in trainables.items()}
        tx = optax.multi_transform(
            {k: optax.adamw(lr_overrides.get(k, lr),
                            weight_decay=weight_decay)
             for k in trainables},
            labels,
        )
    else:
        tx = optax.adamw(lr, weight_decay=weight_decay)
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    state = tx.init(trainables)

    @jax.jit
    def step(params, opt_state, x, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, target)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = jnp.asarray(0.0)
    for _ in range(epochs):
        for x, t in zip(batches, targets):
            trainables, state, loss = step(trainables, state, x, t)
    return trainables, float(loss)
