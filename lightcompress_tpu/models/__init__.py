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
