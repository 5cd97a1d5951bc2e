"""Schema parity against EVERY shipped reference config.

Loads all 140+ YAMLs under /root/reference/configs/{quantization,
sparsification} through our loader and asserts every registry key they
reference resolves: model types, compression methods (ALGO_REGISTRY),
token-reduction specials, KV-cache methods, calib preprocs, eval types,
and save_* export modes.  This is the strongest static guarantee that a
reference user's config runs here unmodified (llmc/__main__.py:188-190,
utils/registry_factory.py:45-49 surface).
"""

import glob
import os

import pytest

import lightcompress_tpu.compression  # noqa: F401 - populate registries
import lightcompress_tpu.data  # noqa: F401
import lightcompress_tpu.models  # noqa: F401
from lightcompress_tpu.config import (
    DotDict,
    get_compress_config,
    get_modalities,
    load_config,
)
from lightcompress_tpu.registry import (
    ALGO_REGISTRY,
    KV_REGISTRY,
    MODEL_REGISTRY,
    PREPROC_REGISTRY,
    TOKEN_REDUCTION_REGISTRY,
)

CONFIG_ROOT = "/root/reference/configs"
CONFIG_PATHS = sorted(
    glob.glob(f"{CONFIG_ROOT}/quantization/**/*.yml", recursive=True)
    + glob.glob(f"{CONFIG_ROOT}/sparsification/**/*.yml", recursive=True)
)

# placeholder strings the reference ships where the user fills in a value
_MODEL_PLACEHOLDERS = {"model_type", "model type", "chat_model_type"}

# eval types the pipeline dispatches (_build_one_eval) + reference-only
# aliases handled by the same paths
_EVAL_TYPES = {
    None, "ppl", "decode_ppl", "token_acc", "acc", "code", "vqa",
    "img_txt", "video_gen", "generate_only", "just_infer",
}


def _eval_entries(cfg):
    ec = cfg.get("eval", None)
    if not ec:
        return []
    return ec if isinstance(ec, list) else [ec]


@pytest.mark.parametrize(
    "path", CONFIG_PATHS, ids=[os.path.relpath(p, CONFIG_ROOT)
                               for p in CONFIG_PATHS]
)
def test_reference_config_resolves(path):
    cfg = load_config(path)

    mt = cfg.model.type
    if mt not in _MODEL_PLACEHOLDERS:
        assert mt in MODEL_REGISTRY, f"model type {mt!r} unregistered"

    for modality in get_modalities(cfg):
        cc = get_compress_config(cfg, modality)
        method = cc.get("method")
        if method:
            assert method in ALGO_REGISTRY, f"method {method!r} unregistered"
        sp = cc.get("special", DotDict())
        # token-reduction sub-method (sparse.method: TokenReduction)
        if method == "TokenReduction":
            sub = sp.get("method")
            assert sub in TOKEN_REDUCTION_REGISTRY, \
                f"token-reduction {sub!r} unregistered"
        # quant-composable token reduction
        tr = sp.get("token_reduction", None)
        if isinstance(tr, dict) and tr.get("method"):
            assert tr["method"] in TOKEN_REDUCTION_REGISTRY
        # KV-cache method
        kv = cc.get("kvcache", None)
        if kv is not None and kv.get("method"):
            assert kv["method"] in KV_REGISTRY, \
                f"kv method {kv['method']!r} unregistered"

    calib = cfg.get("calib", None)
    if calib is not None and calib.get("preproc"):
        assert calib.preproc in PREPROC_REGISTRY, \
            f"preproc {calib.preproc!r} unregistered"

    for ec in _eval_entries(cfg):
        assert ec.get("type") in _EVAL_TYPES, \
            f"eval type {ec.get('type')!r} unsupported"

    save = cfg.get("save", DotDict())
    known_save = {
        "save_trans", "save_fake", "save_vllm", "save_sgl", "save_lightllm",
        "save_autoawq", "save_mlcllm", "save_trtllm", "save_lightx2v",
        "save_path", "trtllm_cfg",
    }
    # stale/disabled keys the reference driver itself ignores (e.g.
    # save_autogptq: False in tesseraq_w4a16.yml) only matter when truthy
    unknown = {k for k in save if k not in known_save and save[k]}
    assert not unknown, f"unknown save keys {unknown}"


def test_config_corpus_nonempty():
    assert len(CONFIG_PATHS) > 100, "reference config corpus missing?"
