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


def _load_testenc(model, ec, name):
    seq_len = ec.get("seq_len", 2048)
    if name == "synthetic":
        vocab = model.arch.vocab_size
        rng = np.random.RandomState(ec.get("seed", 0))
        n_tok = ec.get("n_tokens", seq_len * 8)
        return rng.randint(0, vocab, size=(1, n_tok)).astype(np.int32)
    from datasets import load_from_disk

    path = ec["path"]
    raw = load_from_disk(path)
    return tokenize_eval(model.tokenizer, make_eval_text(raw, name))


def _build_one_eval(model, ec, name):
    """One (eval object, tag) for an eval sub-config (eval/utils.py:12-75)."""
    etype = ec.get("type", "ppl")
    seq_len = ec.get("seq_len", 2048)
    bs = ec.get("bs", 1)
    if etype == "decode_ppl":
        testenc = _load_testenc(model, ec, name)
        n = ec.get("num_eval_tokens", 256)
        # reference decode_ppl reads num_samples texts (eval_ppl.py:65)
        return DecodePerplexityEvalWrap(testenc[:, : n + 1], n), etype
    if etype in ("ppl", "token_acc"):
        testenc = _load_testenc(model, ec, name)
        if etype == "token_acc":
            return TokenConsistencyEval(testenc, seq_len=seq_len, bs=bs), etype
        return PerplexityEval(
            testenc, seq_len=seq_len, bs=bs,
            inference_per_block=ec.get("inference_per_block", False),
        ), etype
    if etype == "generate_only":
        from .eval import CustomGenerate

        gen = CustomGenerate(model, max_new_tokens=ec.get("max_new_tokens",
                                                          32))
        prompts = list(ec.get("prompts", ["Hello"]))

        class _GenEval:
            def eval(self, model):
                return gen.generate(prompts)

        return _GenEval(), etype
    if etype == "acc":
        from .models.vit import AccuracyEval

        data = np.load(ec["path"], allow_pickle=True)
        batches = list(data["batches"]) if "batches" in data else [
            (data["pixels"], data["labels"])
        ]
        return AccuracyEval(batches), etype
    if etype == "vqa":
        from .eval import VQAEval

        return VQAEval(model, tasks=ec.get("tasks", ("mme",)),
                       batch_size=bs, limit=ec.get("limit"),
                       statistics=ec.get("statistics", False)), etype
    if etype == "code" and name == "human_eval":
        from .eval import HumanEvalRunner
        from .eval.code import load_problems

        runner = HumanEvalRunner(
            model, n_samples=ec.get("n_samples", 1),
            k=ec.get("k", (1,)),
            max_new_tokens=ec.get("max_new_tokens", 256),
            allow_execution=ec.get("allow_execution", False))
        problems = load_problems(ec["path"])

        class _CodeEval:
            def eval(self, model):
                return runner.evaluate(problems)

        return _CodeEval(), etype
    if etype == "just_infer":
        from .eval import CustomGenerateJustInfer

        return CustomGenerateJustInfer(
            model, ec["path"], save_path=ec.get("answer_path"),
            max_new_tokens=ec.get("max_new_tokens", 16)), etype
    if etype == "video_gen":
        from .eval import VideoGenerateEval

        ev = VideoGenerateEval(
            model, ec["output_video_path"],
            num_steps=ec.get("num_steps", 20),
            guidance_scale=ec.get("guidance_scale", 5.0),
            n_tokens=ec.get("n_tokens", 256))
        if ec.get("path"):
            samples = np.load(ec["path"], allow_pickle=True)
            ev.set_testenc(list(samples["samples"])
                           if "samples" in samples else [dict(samples)])
        return ev, etype
    raise ValueError(f"Unsupported eval type: {etype} (eval/utils.py:72)")


def DecodePerplexityEvalWrap(testenc, n, ns=None):
    from .eval import DecodePerplexityEval

    return DecodePerplexityEval(testenc, num_eval_tokens=n,
                                num_samples=ns)


def build_eval(model, config) -> Optional[Dict]:
    """reference get_eval_list semantics (eval/utils.py:12-75): config.eval
    may be a single dict or a list; each entry's ``name`` may be one dataset
    or a list (multi-dataset eval reads {path}/{name})."""
    ec_all = config.get("eval", None)
    if not ec_all:
        return None
    ec_list = ec_all if isinstance(ec_all, list) else [ec_all]
    evals = []  # (eval_obj, etype, name, positions)
    token_consist = None
    positions: set = set()
    for ec in ec_list:
        if not ec.get("eval_pos"):
            continue
        pos = list(ec.get("eval_pos", []))
        positions.update(pos)
        names = ec.get("name", "wikitext2")
        names = [names] if isinstance(names, str) else list(names)
        for name in names:
            sub = DotDict(dict(ec))
            sub["name"] = name
            if len(names) > 1:
                sub["path"] = os.path.join(ec["path"], name)
            obj, etype = _build_one_eval(model, sub, name)
            evals.append((obj, etype, name, pos))
            if etype == "ppl" and ec.get("eval_token_consist", False) \
                    and token_consist is None:
                testenc = _load_testenc(model, sub, name)
                token_consist = TokenConsistencyEval(
                    testenc, seq_len=ec.get("seq_len", 2048),
                    bs=ec.get("bs", 1))
    if not evals:
        return None
    return {"list": evals, "token_consist": token_consist,
            "positions": sorted(positions)}


def _run_evals(evals, model, pos: str, results: Dict[str, float]):
    multi = len(evals["list"]) > 1
    for obj, etype, name, poss in evals["list"]:
        if pos not in poss or etype == "token_acc":
            continue  # token_acc needs the origin model (fake_quant section)
        res = (obj.eval(model, eval_pos=pos)
               if etype in ("video_gen", "just_infer") else obj.eval(model))
        key = (f"{etype}_{name}_{pos}" if multi
               else ("token_consistency_" + pos if etype == "token_acc"
                     else f"{etype}_{pos}"))
        if isinstance(res, (int, float)):
            results[key] = float(res)
        log.info("EVAL: %s on %s (%s) is %s", etype, name, pos, res)


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
            _run_evals(evals, model, "pretrain", results)

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
        with timer.phase("eval/transformed"):
            _run_evals(evals, model, "transformed", results)

    save_cfg = config.get("save", {})
    if save_cfg.get("save_trans", False):
        blockwise_opt.deploy("transformed")
        blockwise_opt.save_model(
            os.path.join(save_cfg["save_path"], "transformed_model")
        )

    for pos in ("fake_quant", "fake_quant_wo_kv"):
        if evals and pos in evals["positions"]:
            blockwise_opt.deploy(pos)
            with timer.phase(f"eval/{pos}"):
                _run_evals(evals, model, pos, results)
            tc_evals = [e for e in evals["list"] if e[1] == "token_acc"
                        and pos in e[3]]
            if evals["token_consist"] is not None:
                tc_evals.insert(0, (evals["token_consist"], "token_acc",
                                    "", [pos]))
            if tc_evals:
                origin = load_model(
                    config.model.path,
                    dtype=jnp.bfloat16
                    if config.model.get("torch_dtype") == "bfloat16"
                    else jnp.float32,
                    with_tokenizer=False,
                )
                for obj, _, name, _ in tc_evals:
                    key = ("token_consistency" if not name
                           else f"token_acc_{name}_{pos}")
                    results[key] = obj.eval(model, origin)
                    log.info("EVAL: token consistency%s = %.4f",
                             f" ({name})" if name else "", results[key])
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


def _mkdirs(path: str):
    """Refuse to overwrite an existing save dir (reference
    utils/utils.py:55-59 — the only run-collision guard)."""
    if os.path.exists(path):
        raise FileExistsError(
            f"{path} existed before. Please delete it or pick another "
            f"save_path (utils.py:55-59 semantics)")
    os.makedirs(path)


def _log_versions():
    """Package-version dump at startup (reference utils/utils.py:71-77)."""
    import importlib.metadata as md

    for pkg in ("jax", "jaxlib", "transformers", "safetensors", "numpy",
                "datasets"):
        try:
            log.info("%s version: %s", pkg, md.version(pkg))
        except md.PackageNotFoundError:
            pass


def main():
    import argparse

    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser("lightcompress_tpu")
    p.add_argument("--config", required=True)
    p.add_argument("--task_id", default="0")
    args = p.parse_args()
    cfg = load_config(args.config)
    # per-rank seed offset (reference __main__.py:207: seed_all(seed+RANK))
    from .parallel import dist

    seed = cfg.get("base", {}).get("seed", 42) + dist.rank()
    np.random.seed(seed)
    import random

    random.seed(seed)
    _log_versions()
    save_cfg = cfg.get("save", {})
    if save_cfg and any(str(k).startswith("save_") and v
                        for k, v in save_cfg.items()) \
            and save_cfg.get("save_path"):
        _mkdirs(save_cfg["save_path"])
    results = run_pipeline(cfg)
    for k, v in results.items():
        print(f"RESULT {k} = {v}")


if __name__ == "__main__":
    main()
