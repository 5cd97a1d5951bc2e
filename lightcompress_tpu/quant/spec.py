"""QuantSpec — hashable, static quantization specification.

The functional analogue of the reference's quantizer-object constructor args
(llmc/compression/quantization/quant.py:46-101).  A QuantSpec is a frozen
dataclass so it can be passed as a static argument to jitted functions; the
quantizer core (quantizer.py) is a set of pure functions parameterized by it.

Integer formats: bit ∈ {2..16}, symmetric/asymmetric, optional custom
int_range.  Float formats: bit ∈ {'e4m3','e5m2','e3m2','e2m1','e4m7'}
(quant.py:963-1003).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

# Float format table: name -> (exponent bits, mantissa bits, qmax)
# qmax values follow the reference's bit_ranges (quant.py:982-988):
# e4m3 -> torch.float8_e4m3fn finfo max = 448, e5m2 -> 57344,
# e3m2 -> 28, e2m1 -> 6, e4m7 -> 510.
FLOAT_FORMATS = {
    "e4m3": (4, 3, 448.0),
    "e5m2": (5, 2, 57344.0),
    "e3m2": (3, 2, 28.0),
    "e2m1": (2, 1, 6.0),
    "e4m7": (4, 7, 510.0),
}

GRANULARITIES = ("per_tensor", "per_channel", "per_group", "per_head", "per_block")


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    bit: Union[int, str] = 8
    symmetric: bool = True
    granularity: str = "per_channel"
    group_size: int = 0
    head_num: int = 0
    block_size: int = 0
    calib_algo: str = "minmax"
    round_zp: bool = True
    int_range: Optional[Tuple[int, int]] = None
    # mse calib (quant.py:76-79)
    mse_b_num: int = 1
    maxshrink: float = 0.8
    mse_grid: int = 100
    # hqq calib (quant.py:87-101)
    lp_norm: float = 0.7
    beta: float = 10.0
    kappa: float = 1.01
    iters: int = 20
    # use straight-through-estimator rounding in grads
    ste: bool = False
    # float fake-quant flavor: "hw" = RNE onto the true e/m grid scaled so
    # amax -> format max (the reference's use_qtorch=True / qtorch path);
    # "ref_manual" = the reference's manual per-element-exponent scheme
    # (get_float_qparams, quant.py:1005-1027, use_qtorch=False)
    float_mode: str = "hw"

    def __post_init__(self):
        if self.granularity not in GRANULARITIES:
            raise ValueError(f"unknown granularity {self.granularity!r}")
        if self.granularity == "per_group" and self.group_size <= 0:
            raise ValueError("per_group requires group_size > 0")
        if self.granularity == "per_head" and self.head_num <= 0:
            raise ValueError("per_head requires head_num > 0")
        if self.granularity == "per_block":
            if self.block_size <= 0:
                raise ValueError("per_block requires block_size > 0")
            if not (self.symmetric and self.calib_algo == "minmax"):
                raise ValueError("per_block requires symmetric minmax (quant.py:60)")
        if self.is_float and self.bit not in FLOAT_FORMATS:
            raise ValueError(f"unknown float format {self.bit!r}")

    @property
    def is_float(self) -> bool:
        return isinstance(self.bit, str)

    @property
    def e_bits(self) -> int:
        return FLOAT_FORMATS[self.bit][0]

    @property
    def m_bits(self) -> int:
        return FLOAT_FORMATS[self.bit][1]

    @property
    def qmin(self) -> float:
        if self.is_float:
            return -FLOAT_FORMATS[self.bit][2]
        if self.int_range is not None:
            return float(self.int_range[0])
        if self.symmetric:
            return float(-(2 ** (self.bit - 1)))
        return 0.0

    @property
    def qmax(self) -> float:
        if self.is_float:
            return FLOAT_FORMATS[self.bit][2]
        if self.int_range is not None:
            return float(self.int_range[1])
        if self.symmetric:
            return float(2 ** (self.bit - 1) - 1)
        return float(2**self.bit - 1)

    @property
    def dst_nbins(self) -> int:
        if self.is_float:
            return 2 ** (self.e_bits + self.m_bits + 1)
        return 2**self.bit

    def with_(self, **kw) -> "QuantSpec":
        return dataclasses.replace(self, **kw)


def spec_from_config(cfg: dict, extra: Optional[dict] = None) -> QuantSpec:
    """Build a QuantSpec from a reference-style YAML sub-dict.

    Accepts the reference's ``quant.weight`` / ``quant.act`` schema
    (bit, symmetric, granularity, group_size, calib_algo, ...).
    """
    cfg = dict(cfg or {})
    cfg.update(extra or {})
    # 'per_token' (activation rows) is the reference's default reshape branch
    # (quant.py:640-641) — same math as per_channel here.
    if cfg.get("granularity") == "per_token":
        cfg["granularity"] = "per_channel"
    # reference flag: use_qtorch False selects the manual float path
    if "use_qtorch" in cfg and "float_mode" not in cfg:
        cfg["float_mode"] = "hw" if cfg["use_qtorch"] else "ref_manual"
    known = {f.name for f in dataclasses.fields(QuantSpec)}
    kwargs = {k: v for k, v in cfg.items() if k in known}
    if "int_range" in kwargs and kwargs["int_range"] is not None:
        kwargs["int_range"] = tuple(kwargs["int_range"])
    return QuantSpec(**kwargs)
