"""Quantization analysis tooling (reference tools/quant_analysis.py:25-112):
per-block activation kurtosis and fp-vs-quant cosine similarity."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def kurtosis(x: Array) -> float:
    """Excess kurtosis over all elements (outlier indicator)."""
    xf = jnp.ravel(x).astype(jnp.float32)
    mu = jnp.mean(xf)
    var = jnp.mean((xf - mu) ** 2)
    k = jnp.mean((xf - mu) ** 4) / jnp.clip(var**2, 1e-12, None)
    return float(k - 3.0)


def cosine_sim(a: Array, b: Array) -> float:
    af = jnp.ravel(a).astype(jnp.float32)
    bf = jnp.ravel(b).astype(jnp.float32)
    return float(
        jnp.dot(af, bf)
        / jnp.clip(jnp.linalg.norm(af) * jnp.linalg.norm(bf), 1e-12, None)
    )


def analyze_blocks(model, algo, calib_batches: List[Array]) -> List[Dict]:
    """Per block: input kurtosis + cosine(fp block out, quant block out)."""
    report = []
    xs = list(calib_batches)
    for idx in range(model.num_blocks):
        fp_outs, q_outs, kurt = [], [], []
        lf = algo.fq_linear_fn(idx)
        for x in xs:
            y_fp, feats, _ = model.block_forward(idx, x)
            y_q, _, _ = model.block_forward(idx, x, linear_fn=lf)
            fp_outs.append(y_fp)
            q_outs.append(y_q)
            kurt.append(kurtosis(x))
        cos = float(
            np.mean([cosine_sim(a, b) for a, b in zip(fp_outs, q_outs)])
        )
        report.append({
            "block": idx,
            "input_kurtosis": float(np.mean(kurt)),
            "fp_quant_cosine": cos,
        })
        xs = fp_outs
    return report
