"""lm-evaluation-harness bridge CLI (reference tools/llm_eval.py).

The reference extends lm-eval's CLI with ``--config``/``--quarot`` and
evaluates the *transformed* (equivalence-preserving) checkpoint.  Here the
bridge loads the lightcompress config, loads either the original model or
the ``save_trans`` output directory, wraps it with
``make_lm_eval_adapter`` (eval/harness.py) and runs
``lm_eval.simple_evaluate``.  Import-gated: lm-eval is optional.

Usage:
  python tools/llm_eval.py --config cfg.yml --tasks arc_easy,hellaswag \
      [--use_transformed] [--limit N] [--batch_size B]
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
    p.add_argument("--tasks", required=True,
                   help="comma-separated lm-eval task names")
    p.add_argument("--use_transformed", action="store_true",
                   help="evaluate save.save_path/transformed_model instead "
                        "of model.path")
    p.add_argument("--quarot", action="store_true",
                   help="reference parity flag: transformed QuaRot "
                        "checkpoints need no special handling here (norms "
                        "are folded into the saved params)")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--output", default=None)
    args = p.parse_args()

    try:
        import lm_eval
    except ImportError:
        raise SystemExit(
            "lm-eval is not installed; install lm-evaluation-harness to "
            "use this bridge (reference runs it as a git submodule)")

    import jax.numpy as jnp

    from lightcompress_tpu.config import load_config
    from lightcompress_tpu.eval import make_lm_eval_adapter
    from lightcompress_tpu.models.hf_loader import load_model

    cfg = load_config(args.config)
    path = cfg.model.path
    if args.use_transformed:
        path = os.path.join(cfg.save.save_path, "transformed_model")
    dtype = jnp.bfloat16 if cfg.model.get("torch_dtype") == "bfloat16" \
        else jnp.float32
    model = load_model(path, dtype=dtype)
    adapter = make_lm_eval_adapter(model, batch_size=args.batch_size)
    results = lm_eval.simple_evaluate(
        model=adapter, tasks=args.tasks.split(","), limit=args.limit)
    out = json.dumps(results.get("results", results), indent=2, default=str)
    print(out)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
