from .arch import (  # noqa: F401
    ArchSpec,
    apply_norm,
    attn_inspect,
    block_forward,
    causal_mask,
    default_linear,
    embed_forward,
    head_forward,
    init_block_params,
    init_params,
    layernorm,
    linear_inspect,
    mlp_inspect,
    model_forward,
    rmsnorm,
    rope_cos_sin,
    sdpa,
)
from .base import (  # noqa: F401
    LLAMA_SUBSETS,
    OPT_SUBSETS,
    BaseModel,
    Llama,
    Mistral,
    Opt,
    Qwen2,
    Qwen3,
    Subset,
    resolve,
)
from .hf_loader import (  # noqa: F401
    arch_from_hf_config,
    load_model,
    load_params,
    save_params,
)
from .vit import Vit  # noqa: F401
from .llava import Llava  # noqa: F401
from .vlm import (InternOmni, InternVL, LlavaOnevision,  # noqa: F401
                  MiniCPMV, VideoLlava, Vila)
from .qwen_vl import (Glm4VL, Glm4vVisionTower, Qwen2VL,  # noqa: F401
                      QwenVLVisionTower)
from .mllama import Mllama, MllamaVisionModel  # noqa: F401
from .audio import AudioTower, Qwen2Audio  # noqa: F401
from .dit import WanI2V, WanT2V, load_wan_transformer  # noqa: F401

# ---------------------------------------------------------------------------
# lmms-eval wrapper registry keys (reference registers one per VLM family:
# LlavaEval llava.py:241, Qwen2VLEval qwen2vl.py:196, InternVL2Eval,
# VideoLLaVAHfEval, ... ).  One generic adapter covers all families here;
# these aliases keep reference YAML/config keys resolvable.
from ..registry import MODEL_REGISTRY as _MR


def _eval_wrapper(key: str):
    def factory(llmc_model, batch_size: int = 1, **kw):
        from ..eval.vqa import make_lmms_eval_adapter

        bs = int(batch_size) if str(batch_size).isdigit() else 1
        return make_lmms_eval_adapter(llmc_model, batch_size=bs)

    factory.__name__ = key
    return _MR.register(key)(factory)


for _k in ("LlavaEval", "LlavaHfEval", "Llava_OneVision_Eval",
           "Qwen2VLEval", "Qwen2_5VLEval", "InternVL2Eval",
           "InternVL3_5Eval", "MiniCPMVEval", "VideoLLaVAHfEval",
           "VilaEval"):
    _eval_wrapper(_k)
del _k, _MR
