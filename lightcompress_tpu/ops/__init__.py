from .qlinear import (  # noqa: F401
    QLinearParams,
    dequant_weight,
    qlinear_apply,
    qlinear_xla,
    quantize_linear,
)
