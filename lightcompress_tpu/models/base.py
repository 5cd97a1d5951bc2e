"""Model adapter base + subset topology tables.

The functional analogue of the reference's ``BaseModel`` ABC
(llmc/models/base_model.py:22-462).  An adapter owns:

- an :class:`~lightcompress_tpu.models.arch.ArchSpec` (static architecture)
- a params pytree (list-of-blocks layout, see arch.init_params)
- the tokenizer
- the **subset table** — the single source of truth the scale/rotate
  algorithms consume, mirroring ``get_subsets_in_block``
  (llama.py:52-91, opt.py): each subset names its layers, the prev op the
  equivalent-transform scale folds into, which collected feature is its
  input, and which sub-forward re-runs it (AWQ's ``inspect_module``).

First-block input capture (base_model.py:174-192 Catcher) is just running
the embedding prologue — no exception-raising hooks needed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..registry import MODEL_REGISTRY
from . import arch as A

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Subset:
    """One equivalent-transform unit inside a block."""

    layers: Tuple[str, ...]
    prev_op: Optional[str]  # canonical param path ('ln1', 'attn.v', ...) or None
    prev_type: Optional[str]  # 'norm' | 'linear' | None
    input: str  # key into the collected feats dict
    inspect: str  # 'attn' | 'mlp' | a single linear name
    has_kwargs: bool = False
    is_mlp: bool = False
    skip_rotate: bool = False


# llama.py:52-91 topology, canonical names
LLAMA_SUBSETS = (
    Subset(
        layers=("attn.q", "attn.k", "attn.v"),
        prev_op="ln1",
        prev_type="norm",
        input="attn.q",
        inspect="attn",
        has_kwargs=True,
    ),
    Subset(
        layers=("attn.o",),
        prev_op="attn.v",
        prev_type="linear",
        input="attn.o",
        inspect="attn.o",
    ),
    Subset(
        layers=("mlp.gate", "mlp.up"),
        prev_op="ln2",
        prev_type="norm",
        input="mlp.gate",
        inspect="mlp",
        is_mlp=True,
    ),
    Subset(
        layers=("mlp.down",),
        prev_op="mlp.up",
        prev_type="linear",
        input="mlp.down",
        inspect="mlp.down",
        is_mlp=True,
    ),
)

# MoE topology (deepseekv3.py:69-192 / mixtral.py / qwen2moe.py): router +
# all experts' gate/up (+ shared) scaled together under ln2; expert down
# projections form their own subset (stacked 3D weights here).
MOE_SUBSETS = LLAMA_SUBSETS[:2] + (
    Subset(
        layers=("mlp.router", "mlp.gate", "mlp.up",
                "mlp.shared_gate", "mlp.shared_up"),
        prev_op="ln2",
        prev_type="norm",
        input="mlp.gate",
        inspect="mlp",
        is_mlp=True,
    ),
    Subset(
        layers=("mlp.down",),
        prev_op="mlp.up",
        prev_type="linear",
        input="mlp.down",
        inspect="mlp.down",
        is_mlp=True,
    ),
    Subset(
        layers=("mlp.shared_down",),
        prev_op="mlp.shared_up",
        prev_type="linear",
        input="mlp.shared_down",
        inspect="mlp.shared_down",
        is_mlp=True,
    ),
)

# opt.py topology
OPT_SUBSETS = (
    Subset(
        layers=("attn.q", "attn.k", "attn.v"),
        prev_op="ln1",
        prev_type="norm",
        input="attn.q",
        inspect="attn",
        has_kwargs=True,
    ),
    Subset(
        layers=("attn.o",),
        prev_op="attn.v",
        prev_type="linear",
        input="attn.o",
        inspect="attn.o",
    ),
    Subset(
        layers=("mlp.fc1",),
        prev_op="ln2",
        prev_type="norm",
        input="mlp.fc1",
        inspect="mlp.fc1",
        is_mlp=True,
    ),
    Subset(
        layers=("mlp.fc2",),
        prev_op="mlp.fc1",
        prev_type="linear",
        input="mlp.fc2",
        inspect="mlp.fc2",
        is_mlp=True,
    ),
)


# parallel-residual blocks (falcon.py / phi.py): attention AND mlp.fc1 read
# the SAME ln1 output, so an equivalent-transform scale into ln1 must divide
# all four consumers together — one fused subset (the reference keeps them
# separate, which double-scales the shared LN; grouping is strictly safer).
PARALLEL_SUBSETS = (
    Subset(
        layers=("attn.q", "attn.k", "attn.v", "mlp.fc1"),
        prev_op="ln1",
        prev_type="norm",
        input="attn.q",
        inspect="attn",
        has_kwargs=True,
    ),
    Subset(
        layers=("attn.o",),
        prev_op="attn.v",
        prev_type="linear",
        input="attn.o",
        inspect="attn.o",
    ),
    Subset(
        layers=("mlp.fc2",),
        prev_op="mlp.fc1",
        prev_type="linear",
        input="mlp.fc2",
        inspect="mlp.fc2",
        is_mlp=True,
    ),
)


def resolve(tree: Dict, dotted: str) -> Dict:
    node = tree
    for part in dotted.split("."):
        node = node[part]
    return node


def set_path(tree: Dict, dotted: str, leaf_key: str, value) -> None:
    resolve(tree, dotted)[leaf_key] = value


class BaseModel:
    """Holds arch + params + tokenizer and exposes the engine-facing API."""

    subsets: Tuple[Subset, ...] = LLAMA_SUBSETS

    def __init__(
        self,
        arch: A.ArchSpec,
        params: Dict,
        tokenizer=None,
        config=None,
    ):
        self.arch = arch
        self.params = params
        self.tokenizer = tokenizer
        self.config = config
        # per-block deployed linear_fn (None = float); set by deploy()
        self.linear_fns: Optional[List[A.LinearFn]] = None
        self.kv_hooks: Optional[List[Optional[Callable]]] = None
        # QuaRot online rotations: name -> ('full', 0) | ('head', head_dim)
        # (the RotateLinear analogue, module_utils.py:553-676)
        self.rotate_cfg: Dict[str, tuple] = {}
        # attention-internal quant hooks (LlmcMatmul/LlmcSoftmax analogue,
        # attn_utils.py:7-60); installed by deploy when quant_attn is set
        self.attn_matmul_hook = None
        self.attn_softmax_hook = None

    # -- online rotation ---------------------------------------------------
    def apply_online_rotate(self, name: str, x: Array) -> Array:
        cfg = self.rotate_cfg.get(name)
        if cfg is None:
            return x
        from ..ops.hadamard import fwht, matmul_hadU

        mode, dim = cfg
        if mode == "full":
            return matmul_hadU(x)
        # per-head partial hadamard (online_partial_had)
        shape = x.shape
        r = x.reshape(*shape[:-1], shape[-1] // dim, dim)
        r = fwht(r) * (1.0 / dim**0.5)
        return r.reshape(shape)

    def default_linear_fn(self) -> Optional[A.LinearFn]:
        if not self.rotate_cfg:
            return None

        def lf(name, w, b, x):
            x = self.apply_online_rotate(name, x)
            return A.default_linear(name, w, b, x)

        return lf

    # -- topology ----------------------------------------------------------
    @property
    def blocks(self) -> List[Dict]:
        return self.params["blocks"]

    def get_param_blocks(self) -> List[Dict]:
        """Blocks of the ACTIVE modality (VLMs override)."""
        return self.params["blocks"]

    def set_param_blocks(self, blocks: List[Dict]) -> None:
        self.params["blocks"] = blocks

    @property
    def num_blocks(self) -> int:
        return len(self.params["blocks"])

    def get_subsets_in_block(self, block_idx: int) -> Tuple[Subset, ...]:
        bp = self.get_param_blocks()[block_idx]
        if self.arch.mla is not None:
            return self._mla_subsets(bp)
        if self.arch.moe is not None and "router" in bp.get("mlp", {}):
            has_shared = "shared_gate" in bp["mlp"]
            subsets = []
            for s in MOE_SUBSETS:
                layers = tuple(
                    n for n in s.layers
                    if has_shared or not n.startswith("mlp.shared")
                )
                if not layers:
                    continue
                subsets.append(dataclasses.replace(s, layers=layers))
            return tuple(subsets)
        return self.subsets

    def _mla_subsets(self, bp) -> Tuple[Subset, ...]:
        """DeepSeek MLA topology (deepseekv3.py:69-127)."""
        mla = self.arch.mla
        subsets = []
        if mla.q_lora_rank:
            subsets.append(Subset(
                layers=("attn.q_a", "attn.kv_a"), prev_op="ln1",
                prev_type="norm", input="attn.q_a", inspect="attn",
                has_kwargs=True,
            ))
            subsets.append(Subset(
                layers=("attn.q_b",), prev_op="attn.q_a_norm",
                prev_type="norm", input="attn.q_b", inspect="attn.q_b",
                skip_rotate=True,
            ))
        else:
            subsets.append(Subset(
                layers=("attn.q", "attn.kv_a"), prev_op="ln1",
                prev_type="norm", input="attn.q", inspect="attn",
                has_kwargs=True,
            ))
        subsets.append(Subset(
            layers=("attn.o",), prev_op=None, prev_type=None,
            input="attn.o", inspect="attn.o",
        ))
        subsets.append(Subset(
            layers=("attn.kv_b",), prev_op="attn.kv_a_norm",
            prev_type="norm", input="attn.kv_b", inspect="attn.kv_b",
            skip_rotate=True,
        ))
        if "router" in bp.get("mlp", {}):
            has_shared = "shared_gate" in bp["mlp"]
            for sub in MOE_SUBSETS[2:]:
                layers = tuple(
                    n for n in sub.layers
                    if has_shared or not n.startswith("mlp.shared")
                )
                if layers:
                    subsets.append(dataclasses.replace(sub, layers=layers))
        else:
            subsets.extend(LLAMA_SUBSETS[2:])
        return tuple(subsets)

    def get_block_linear_names(self, block_idx: int) -> List[str]:
        names: List[str] = []
        for s in self.get_subsets_in_block(block_idx):
            names.extend(s.layers)
        return names

    def get_layernorm_names(self, block_idx: int) -> List[str]:
        return ["ln1", "ln2"]

    def get_head_names(self) -> List[str]:
        return [] if self.arch.tie_word_embeddings else ["lm_head"]

    # -- forwards ----------------------------------------------------------
    def rope_tables(self, T: int):
        if self.arch.rope_enabled:
            return A.rope_cos_sin(self.arch, jnp.arange(T))
        return None, None

    def collect_first_block_input(self, calib_batches: List[Array]) -> List[Array]:
        """Run the embedding prologue on each calib batch
        (base_model.py:279-336 Catcher equivalent)."""
        f = jax.jit(lambda ids: A.embed_forward(self.arch, self.params, ids))
        return [f(b) for b in calib_batches]

    def block_forward(
        self,
        block_idx: int,
        x: Array,
        linear_fn: Optional[A.LinearFn] = None,
        kv_hook=None,
        block_params: Optional[Dict] = None,
    ):
        bp = block_params if block_params is not None else self.blocks[block_idx]
        T = x.shape[1]
        cos, sin = self.rope_tables(T)
        mask = A.causal_mask(T, T)
        if self.arch.alibi:
            mask = mask[None] + A.alibi_bias(self.arch.num_heads, T, T)
        return A.block_forward(
            self.arch,
            bp,
            x,
            cos,
            sin,
            mask,
            linear_fn=linear_fn or self.default_linear_fn() or A.default_linear,
            kv_hook=kv_hook,
            matmul_hook=self.attn_matmul_hook,
            softmax_hook=self.attn_softmax_hook,
        )

    def inspect_forward(
        self,
        block_idx: int,
        subset: Subset,
        x: Array,
        linear_fn: Optional[A.LinearFn] = None,
        block_params: Optional[Dict] = None,
    ) -> Array:
        """Re-run one subset's sub-module (awq.py:110-126 inspect_module)."""
        bp = block_params if block_params is not None else self.blocks[block_idx]
        lf = linear_fn or self.default_linear_fn() or A.default_linear
        if subset.inspect == "attn":
            T = x.shape[1]
            cos, sin = self.rope_tables(T)
            mask = A.causal_mask(T, T)
            if self.arch.alibi:
                mask = mask[None] + A.alibi_bias(self.arch.num_heads, T, T)
            return A.attn_inspect(self.arch, bp, x, cos, sin, mask, linear_fn=lf)
        if subset.inspect == "mlp":
            return A.mlp_inspect(self.arch, bp, x, linear_fn=lf)
        return A.linear_inspect(bp, subset.inspect, x, linear_fn=lf)

    def forward(self, input_ids: Array) -> Array:
        lfs = self.linear_fns
        if lfs is None:
            lf = self.default_linear_fn()
            if lf is not None:
                lfs = [lf] * self.num_blocks
        return A.model_forward(
            self.arch,
            self.params,
            input_ids,
            linear_fns=lfs,
            kv_hooks=self.kv_hooks,
            matmul_hook=self.attn_matmul_hook,
            softmax_hook=self.attn_softmax_hook,
        )

    def jit_forward(self):
        """A safely-jitted forward bound to the CURRENT deployment.

        NEVER use ``jax.jit(model.forward)``: bound methods of the same
        object hash equal, so pjit can reuse a cached executable traced with
        OLD params (they're closed-over constants) after the params tree was
        replaced — e.g. evaluating 'transformed' silently re-running the
        'pretrain' model.  Here params are a traced ARGUMENT and the wrapper
        is a fresh function object (own cache) per call.
        """
        arch = self.arch
        lfs = self.linear_fns
        if lfs is None:
            lf = self.default_linear_fn()
            if lf is not None:
                lfs = [lf] * self.num_blocks
        hooks = self.kv_hooks
        mh, sh = self.attn_matmul_hook, self.attn_softmax_hook

        @jax.jit
        def f(params, input_ids):
            return A.model_forward(
                arch, params, input_ids, linear_fns=lfs, kv_hooks=hooks,
                matmul_hook=mh, softmax_hook=sh,
            )

        return lambda ids: f(self.params, ids)

    # -- deploy ------------------------------------------------------------
    def deploy_float(self):
        self.linear_fns = None
        self.kv_hooks = None

    def deploy_fake_quant(
        self,
        w_qdq_fns: List[Dict[str, Callable]],
        a_qdq_fns: Optional[List[Dict[str, Callable]]] = None,
        kv_hooks: Optional[List[Optional[Callable]]] = None,
    ):
        """Bake weight qdq into params once (EffcientFakeQuantLinear
        semantics, module_utils.py:774-852) and install per-block act-quant
        linear fns."""
        for idx, bp in enumerate(self.params["blocks"]):
            fns = w_qdq_fns[idx] if idx < len(w_qdq_fns) else {}
            for name, fn in fns.items():
                node = resolve(bp, name)
                node["weight"] = fn(node["weight"], name)
        self.linear_fns = []
        for idx in range(self.num_blocks):
            afns = (a_qdq_fns[idx] if a_qdq_fns is not None else {}) or {}

            def make_fn(afns):
                def lf(name, w, b, x):
                    x = self.apply_online_rotate(name, x)
                    if name in afns:
                        x = afns[name](x)
                    return A.default_linear(name, w, b, x)

                return lf

            self.linear_fns.append(make_fn(afns))
        self.kv_hooks = kv_hooks


@MODEL_REGISTRY
class Llama(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Mistral(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Qwen2(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Qwen3(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Opt(BaseModel):
    subsets = OPT_SUBSETS


@MODEL_REGISTRY
class Mixtral(BaseModel):
    subsets = LLAMA_SUBSETS  # overridden by get_subsets_in_block via arch.moe


@MODEL_REGISTRY
class Qwen2Moe(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Qwen3Moe(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class DeepseekV2(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class DeepseekV3(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Gemma2(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Phi3(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Starcoder(BaseModel):
    subsets = OPT_SUBSETS


@MODEL_REGISTRY
class SmolLM(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class StableLm(BaseModel):
    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Bloom(BaseModel):
    """ALiBi + LayerNorm + gelu MLP (reference bloom.py); fused
    query_key_value split by the loader."""

    subsets = OPT_SUBSETS


@MODEL_REGISTRY
class Falcon(BaseModel):
    """Parallel attention/MLP residual, MQA, rope, no biases
    (reference falcon.py)."""

    @property
    def subsets(self):
        single_ln = self.arch.parallel_residual and \
            not self.arch.parallel_two_norms
        return PARALLEL_SUBSETS if single_ln else OPT_SUBSETS

    def get_layernorm_names(self, block_idx):
        single_ln = self.arch.parallel_residual and \
            not self.arch.parallel_two_norms
        return ["ln1"] if single_ln else ["ln1", "ln2"]


@MODEL_REGISTRY
class Phi(BaseModel):
    """phi-1/1.5/2: parallel residual + partial rotary + LayerNorm
    (reference phi.py)."""

    subsets = PARALLEL_SUBSETS

    def get_layernorm_names(self, block_idx):
        return ["ln1"]


@MODEL_REGISTRY
class ChatGLM(BaseModel):
    """GLM-2/3 lineage: RMSNorm, SwiGLU, MQA, half-dim interleaved rope
    (reference chatglm.py)."""

    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Glm(BaseModel):
    """HF-native GLM-4 (model_type 'glm'/'glm4'): partial rotary with the
    Glm table convention; glm4 adds sandwich norms."""

    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class InternLM2(BaseModel):
    """Llama topology with fused wqkv / w1-w3-w2 naming
    (reference internlm2.py); loader renames + splits."""

    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class Qwen(BaseModel):
    """Qwen-1 (reference qwen.py): llama topology, fused c_attn with bias,
    w2=gate / w1=up MLP naming."""

    subsets = LLAMA_SUBSETS


@MODEL_REGISTRY
class MiniCPM(BaseModel):
    """MiniCPM (reference minicpm.py): llama topology with depth-scaled
    residuals (scale_depth/sqrt(L)), scaled embeddings and logits."""

    subsets = LLAMA_SUBSETS
