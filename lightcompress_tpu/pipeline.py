"""End-to-end compression pipeline (the reference's main(),
llmc/__main__.py:28-177, as a callable library function)."""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from .config import DotDict, get_compress_config, get_modalities, load_config
from .data import CalibDataset
from .eval import PerplexityEval, TokenConsistencyEval, make_eval_text, tokenize_eval
from .models.hf_loader import load_model
from .registry import ALGO_REGISTRY
from . import compression  # noqa: F401  (registers algorithms)

log = logging.getLogger("lightcompress_tpu")


def build_eval(model, config) -> Optional[Dict]:
    ec = config.get("eval", None)
    if not ec or not ec.get("eval_pos"):
        return None
    name = ec.get("name", "wikitext2")
    seq_len = ec.get("seq_len", 2048)
    bs = ec.get("bs", 1)
    if name == "synthetic":
        vocab = model.arch.vocab_size
        rng = np.random.RandomState(ec.get("seed", 0))
        n_tok = ec.get("n_tokens", seq_len * 8)
        testenc = rng.randint(0, vocab, size=(1, n_tok)).astype(np.int32)
    else:
        from datasets import load_from_disk

        raw = load_from_disk(ec["path"])
        testenc = tokenize_eval(model.tokenizer, make_eval_text(raw, name))
    if ec.get("type") == "decode_ppl":
        from .eval import DecodePerplexityEval

        return {
            "ppl": DecodePerplexityEval(
                testenc[:, : ec.get("num_eval_tokens", 256) + 1],
                num_eval_tokens=ec.get("num_eval_tokens", 256),
            ),
            "token_consist": None,
            "positions": list(ec.get("eval_pos", [])),
        }
    return {
        "ppl": PerplexityEval(
            testenc, seq_len=seq_len, bs=bs,
            inference_per_block=ec.get("inference_per_block", False),
        ),
        "token_consist": (
            TokenConsistencyEval(testenc, seq_len=seq_len, bs=bs)
            if ec.get("eval_token_consist", False)
            else None
        ),
        "positions": list(ec.get("eval_pos", [])),
    }


def run_pipeline(config: DotDict) -> Dict[str, float]:
    """Run the full quantize->eval->save pipeline; returns eval results."""
    from .utils.profiling import device_trace, timer

    t0 = time.time()
    results: Dict[str, float] = {}

    with timer.phase("load_model"):
        model = load_model(
            config.model.path,
            dtype=jnp.bfloat16
            if config.model.get("torch_dtype") == "bfloat16"
            else jnp.float32,
        )
    evals = build_eval(model, config)

    if evals and "pretrain" in evals["positions"]:
        with timer.phase("eval/pretrain"):
            results["ppl_pretrain"] = evals["ppl"].eval(model)
        log.info("EVAL: ppl (pretrain) = %.4f", results["ppl_pretrain"])

    blockwise_opt = None
    trace_dir = config.get("base", {}).get("trace_dir")
    for modality in get_modalities(config):
        ccfg = get_compress_config(config, modality)
        if not ccfg or "method" not in ccfg:
            continue
        with timer.phase("calib_data"):
            calib_batches, padding_masks = _build_calib(model, config)
            first_inputs = model.collect_first_block_input(
                [jnp.asarray(b) for b in calib_batches]
            )
        blockwise_opt = ALGO_REGISTRY[ccfg.method](
            model, ccfg, first_inputs, padding_masks, config
        )
        with device_trace(trace_dir):
            blockwise_opt.run_block_loop()

    if blockwise_opt is None:
        return results

    if evals and "transformed" in evals["positions"]:
        blockwise_opt.deploy("transformed")
        results["ppl_transformed"] = evals["ppl"].eval(model)
        log.info("EVAL: ppl (transformed) = %.4f", results["ppl_transformed"])

    save_cfg = config.get("save", {})
    if save_cfg.get("save_trans", False):
        blockwise_opt.deploy("transformed")
        blockwise_opt.save_model(
            os.path.join(save_cfg["save_path"], "transformed_model")
        )

    for pos in ("fake_quant", "fake_quant_wo_kv"):
        if evals and pos in evals["positions"]:
            blockwise_opt.deploy(pos)
            results[f"ppl_{pos}"] = evals["ppl"].eval(model)
            log.info("EVAL: ppl (%s) = %.4f", pos, results[f"ppl_{pos}"])
            if evals["token_consist"] is not None:
                origin = load_model(
                    config.model.path,
                    dtype=jnp.bfloat16
                    if config.model.get("torch_dtype") == "bfloat16"
                    else jnp.float32,
                    with_tokenizer=False,
                )
                results["token_consistency"] = evals["token_consist"].eval(
                    model, origin
                )
                log.info(
                    "EVAL: token consistency = %.4f", results["token_consistency"]
                )
            blockwise_opt.restore_float()

    if save_cfg.get("save_fake", False):
        blockwise_opt.deploy("fake_quant")
        blockwise_opt.save_model(os.path.join(save_cfg["save_path"], "fake_quant_model"))
        blockwise_opt.restore_float()

    # real-quant exports (save_vllm/save_sgl/... analogues)
    from .export import run_exports

    run_exports(blockwise_opt, config)

    # external-harness bridge (__main__.py:164-176)
    from .eval.opencompass_bridge import run_opencompass

    run_opencompass(blockwise_opt, config)

    profile_out = config.get("base", {}).get("profile_out")
    if profile_out:
        timer.dump(profile_out)
    timer.log_report()
    log.info("pipeline done in %.1fs", time.time() - t0)
    return results


def _build_calib(model, config):
    ds = CalibDataset(model.tokenizer, config.calib)
    from .parallel import dist

    return ds.get_calib_dataset(shard=(dist.rank(), dist.world_size()))


def main():
    import argparse

    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser("lightcompress_tpu")
    p.add_argument("--config", required=True)
    p.add_argument("--task_id", default="0")
    args = p.parse_args()
    cfg = load_config(args.config)
    seed = cfg.get("base", {}).get("seed", 42)
    np.random.seed(seed)
    import random

    random.seed(seed)
    results = run_pipeline(cfg)
    for k, v in results.items():
        print(f"RESULT {k} = {v}")


if __name__ == "__main__":
    main()
