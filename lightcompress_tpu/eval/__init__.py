from .ppl import (  # noqa: F401
    DecodePerplexityEval,
    PerplexityEval,
    TokenConsistencyEval,
    make_eval_text,
    tokenize_eval,
)
