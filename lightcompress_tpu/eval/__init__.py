from .ppl import (  # noqa: F401
    DecodePerplexityEval,
    PerplexityEval,
    TokenConsistencyEval,
    make_eval_text,
    tokenize_eval,
)
from .code import HumanEvalRunner, pass_at_k  # noqa: F401
from .harness import (  # noqa: F401
    CustomGenerate,
    CustomGenerateJustInfer,
    make_lm_eval_adapter,
)
from .video_gen import VideoGenerateEval, flow_match_sigmas  # noqa: F401
from .vqa import VQAEval, stage_latency  # noqa: F401
