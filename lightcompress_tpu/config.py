"""YAML config system.

Schema-compatible with the reference's single-YAML layout
(sections ``base/model/calib/eval/quant|sparse/save``; see
llmc/__main__.py:188-190 and docs/en/source/configs.md), loaded into an
attribute-access dict. Validation mirrors ``check_config``
(llmc/utils/utils.py:21-52): weight-granularity invariants, mix-bit
sub-configs, modality sub-sections.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional

import yaml


class DotDict(dict):
    """dict with attribute access, recursively (EasyDict equivalent)."""

    def __init__(self, d: Optional[Dict] = None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, DotDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def __deepcopy__(self, memo):
        return DotDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


def load_config(path: str) -> DotDict:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    cfg = DotDict(cfg)
    check_config(cfg)
    return cfg


def _check_weight_cfg(w: DotDict) -> None:
    gran = w.get("granularity", "per_channel")
    if gran == "per_group":
        if "group_size" not in w:
            raise ValueError("per_group weight quant requires quant.weight.group_size")
    if gran == "per_block":
        if "block_size" not in w:
            raise ValueError("per_block weight quant requires quant.weight.block_size")
    bit = w.get("bit", 8)
    # 48 = INT4-in-INT8 double quantization (Weight48IntegerQuantizer,
    # quant.py:1232-1369; rtn_w_a_wint4aint8.yml)
    if isinstance(bit, int) and not (1 <= bit <= 16 or bit == 48):
        raise ValueError(f"unsupported integer bit-width {bit}")
    if isinstance(bit, str) and bit not in (
        "e4m3", "e5m2", "e3m2", "e2m1", "e4m7",
    ):
        raise ValueError(f"unsupported float format {bit!r}")


def check_config(config: DotDict) -> None:
    """Validate invariants the engine relies on (reference: utils.py:21-52)."""
    if "model" not in config:
        raise ValueError("config must have a 'model' section")
    quant = config.get("quant", None)
    if quant is not None:
        # modality sub-configs nest quant specs one level deeper
        modality_keys = [k for k in ("language", "vision", "video_gen") if k in quant]
        quant_cfgs = [quant[k] for k in modality_keys] or [quant]
        for qc in quant_cfgs:
            if "weight" in qc:
                _check_weight_cfg(qc.weight)
            # mixed-bits sub-configs (reference: utils.py:38-43)
            for sub in ("w_1", "w_2"):
                if sub in qc:
                    _check_weight_cfg(qc[sub])
    calib = config.get("calib", None)
    if calib is not None and "n_samples" in calib:
        if calib.n_samples <= 0:
            raise ValueError("calib.n_samples must be positive")


def get_modalities(config: DotDict) -> List[str]:
    """Which modalities to compress (reference: utils.py:80-97).

    Returns ['language'] unless the compression section nests per-modality
    sub-configs.
    """
    for section in ("quant", "sparse"):
        sec = config.get(section, None)
        if sec is None:
            continue
        mods = [k for k in ("vision", "language", "video_gen") if k in sec]
        if mods:
            return mods
        return ["language"]
    return ["language"]


def get_compress_config(config: DotDict, modality: str) -> DotDict:
    """Per-modality compression sub-config, or the flat section."""
    for section in ("quant", "sparse"):
        sec = config.get(section, None)
        if sec is None:
            continue
        if modality in sec:
            sub = copy.deepcopy(sec[modality])
            if "method" not in sub and "method" in sec:
                sub["method"] = sec["method"]
            return sub
        return sec
    return DotDict()
