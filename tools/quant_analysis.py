"""Quantization-analysis CLI (reference tools/quant_analysis.py):
per-block activation kurtosis and fp-vs-quant cosine similarity over a
calibration set, printed as a table + optional JSON.

Usage:
  python tools/quant_analysis.py --config cfg.yml [--out analysis.json]
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

log = logging.getLogger("lightcompress_tpu.tools")


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--per-linear", action="store_true",
                   help="per-linear min/avg cosine + kurtosis sweep "
                        "(reference analysis_block_cosine/outlier)")
    p.add_argument("--prof-gra", default="per_tensor",
                   choices=["per_tensor", "per_channel", "per_group"])
    p.add_argument("--group-size", type=int, default=128)
    args = p.parse_args()

    import jax.numpy as jnp

    from lightcompress_tpu.config import (get_compress_config,
                                          get_modalities, load_config)
    from lightcompress_tpu.models.hf_loader import load_model
    from lightcompress_tpu.pipeline import _build_calib
    from lightcompress_tpu.registry import ALGO_REGISTRY
    from lightcompress_tpu.utils.quant_analysis import analyze_blocks
    import lightcompress_tpu.compression  # noqa: F401

    cfg = load_config(args.config)
    model = load_model(cfg.model.path,
                       dtype=jnp.bfloat16
                       if cfg.model.get("torch_dtype") == "bfloat16"
                       else jnp.float32)
    calib_batches, padding_masks = _build_calib(model, cfg)
    ccfg = get_compress_config(cfg, get_modalities(cfg)[0])
    first = model.collect_first_block_input(
        [jnp.asarray(b) for b in calib_batches])
    algo = ALGO_REGISTRY[ccfg.method](model, ccfg, first, padding_masks, cfg)
    if args.per_linear:
        from lightcompress_tpu.utils.quant_analysis import analyze_linears

        rows = analyze_linears(model, algo, first,
                               granularity=args.prof_gra,
                               group_size=args.group_size)
        print(f"{'block':>5} {'linear':>18} {'min_cos':>10} {'avg_cos':>10}"
              f" {'w_kurt':>8} {'act_kurt':>9}")
        for r in rows:
            print(f"{r['block']:>5} {r['linear']:>18} {r['min_cos']:>10.6f}"
                  f" {r['avg_cos']:>10.6f} {r['w_kurtosis']:>8.2f}"
                  f" {r['act_kurtosis']:>9.2f}")
    else:
        rows = analyze_blocks(model, algo, first)
        print(f"{'block':>5} {'kurtosis':>10} {'cos(fp,quant)':>14}")
        for r in rows:
            print(f"{r['block']:>5} {r['input_kurtosis']:>10.3f} "
                  f"{r['fp_quant_cosine']:>14.6f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
