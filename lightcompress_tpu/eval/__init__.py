from .ppl import (  # noqa: F401
    DecodePerplexityEval,
    PerplexityEval,
    TokenConsistencyEval,
    make_eval_text,
    tokenize_eval,
)
from .code import HumanEvalRunner, pass_at_k  # noqa: F401
from .harness import CustomGenerate, make_lm_eval_adapter  # noqa: F401
