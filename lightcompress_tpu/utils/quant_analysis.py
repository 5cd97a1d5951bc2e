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


def kurtosis_channel(x: Array) -> float:
    """Mean per-row kurtosis (reference calculate_kurtosis_channel,
    tools/quant_analysis.py:25-47) — the per_channel/per_group profile."""
    xf = x.reshape(x.shape[0], -1).astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    sd = jnp.clip(jnp.std(xf, axis=1, keepdims=True), 1e-8, None)
    z = (xf - mu) / sd
    return float(jnp.mean(jnp.mean(z ** 4, axis=1)))


def analyze_linears(model, algo, calib_batches: List[Array],
                    granularity: str = "per_tensor",
                    group_size: int = 128) -> List[Dict]:
    """Per-LINEAR sweep over eval batches (reference analysis_block_cosine
    + analysis_block_outlier, tools/quant_analysis.py:88-185): for every
    block linear, min/avg cosine between the fp output and the fake-quant
    output per calibration sample, plus weight and input-activation
    kurtosis at the requested granularity (per_tensor | per_channel |
    per_group)."""
    from ..models import arch as A
    from ..models.base import resolve

    if granularity == "per_channel":
        def kurt_w(w):
            return kurtosis_channel(w)
    elif granularity == "per_group":
        def kurt_w(w):
            g = min(group_size, w.shape[-1])
            return kurtosis_channel(w.reshape(-1, g))
    else:
        kurt_w = kurtosis

    report = []
    xs = list(calib_batches)
    for idx in range(model.num_blocks):
        per_linear: Dict[str, Dict] = {}
        fp_outs = []
        for x in xs:
            y_fp, feats, _ = model.block_forward(idx, x)
            fp_outs.append(y_fp)
            for name in model.get_block_linear_names(idx):
                if name not in feats:
                    continue
                node = resolve(model.blocks[idx], name)
                w = node["weight"]
                if w.ndim != 2:
                    continue  # stacked experts: skip in the linear sweep
                xin = feats[name]
                o_fp = A.default_linear(name, w, node.get("bias"), xin)
                wq = algo.w_qdq(w, idx, name)
                o_q = A.default_linear(name, wq, node.get("bias"), xin)
                of = o_fp.reshape(o_fp.shape[0], -1).astype(jnp.float32)
                oq = o_q.reshape(o_q.shape[0], -1).astype(jnp.float32)
                num = jnp.sum(of * oq, axis=1)
                den = jnp.clip(jnp.linalg.norm(of, axis=1)
                               * jnp.linalg.norm(oq, axis=1), 1e-12, None)
                cos_rows = [float(c) for c in np.asarray(num / den)]
                d = per_linear.setdefault(name, {
                    "cos": [], "w_kurtosis": kurt_w(w),
                    "act_kurtosis": []})
                d["cos"].extend(cos_rows)
                d["act_kurtosis"].append(kurt_w(
                    xin.reshape(-1, xin.shape[-1])))
        for name, d in per_linear.items():
            report.append({
                "block": idx,
                "linear": name,
                "min_cos": min(d["cos"]),
                "avg_cos": float(np.mean(d["cos"])),
                "w_kurtosis": d["w_kurtosis"],
                "act_kurtosis": float(np.mean(d["act_kurtosis"])),
            })
        xs = fp_outs
    return report


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
