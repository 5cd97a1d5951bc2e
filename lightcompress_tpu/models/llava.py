"""LLaVA-style VLM adapter (reference llmc/models/llava.py, 364 LoC).

vision tower (ViT) -> 2-layer GELU projector -> language model; image
features are spliced into the text embedding sequence at the image-token
position.  Compression runs one modality at a time (reference
``deploy_all_modality``): ``set_modality('vision'|'language')`` switches
which submodel the blockwise engine sees — the functional analogue of the
reference adapters swapping ``self.blocks``.

Token reduction operates on the vision tower's ``token_hooks``
(``pruning_config`` analogue, llava.py:65-75).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..registry import MODEL_REGISTRY
from . import arch as A
from .base import BaseModel
from .vit import Vit

Array = jax.Array


@MODEL_REGISTRY.register("LlavaHf")
@MODEL_REGISTRY
class Llava(BaseModel):
    # 'default' drops the CLS token; 'full' keeps every patch (SigLIP towers)
    select_strategy = "default"

    def __init__(
        self,
        language: BaseModel,
        vision: Vit,
        projector: Dict[str, Dict[str, Array]],  # {'fc1': {...}, 'fc2': {...}}
        tokenizer=None,
        config=None,
        image_token_id: int = 32000,
    ):
        super().__init__(language.arch, language.params, tokenizer, config)
        self.language = language
        self.vision = vision
        self.projector = projector
        self.image_token_id = image_token_id
        self.modality = "language"
        # token-reduction hook surfaces (reference pruning_config analogue):
        #  feature_hooks: applied to projected image features (B, Tv, H)
        #    in encode_images — the reference's projector/2dPool hook stage
        #    (visionzip/fastervlm/dycoke act here).
        #  lang_token_hooks: idx -> fn(model, idx, x, vis_start, n_vis) ->
        #    (x', vis_start', n_vis') applied before language block idx —
        #    the reference's LLM-decoder-layer hook stage (sparsevlm/fastv-
        #    on-LLM act here).  Must keep static shapes (fixed keep counts).
        self.feature_hooks: List[Any] = []
        self.lang_token_hooks: Dict[int, Any] = {}
        self.num_frames: int = 1  # video inputs: frames stacked in batch dim
        n_vis_tokens = vision.arch.max_position_embeddings - (
            1 if self.select_strategy == "default" else 0)
        self.pruning_config: Dict[str, Any] = {
            "image_token_length": n_vis_tokens,
            "select_layer": vision.arch.num_layers - 1,
            "select_feature": "patch",
            "image_token_index": image_token_id,
        }

    # -- modality switch ---------------------------------------------------
    def set_modality(self, modality: str):
        assert modality in ("language", "vision")
        self.modality = modality

    @property
    def active(self) -> BaseModel:
        return self.vision if self.modality == "vision" else self.language

    # engine-facing delegation
    @property
    def blocks(self):
        return self.active.params["blocks"]

    @property
    def num_blocks(self):
        return len(self.active.params["blocks"])

    @property
    def token_hooks(self):
        return self.vision.token_hooks

    def get_param_blocks(self):
        return self.active.params["blocks"]

    def set_param_blocks(self, blocks):
        self.active.params["blocks"] = blocks

    def get_subsets_in_block(self, block_idx):
        return self.active.get_subsets_in_block(block_idx)

    def get_block_linear_names(self, block_idx):
        return self.active.get_block_linear_names(block_idx)

    def block_forward(self, *a, **k):
        return self.active.block_forward(*a, **k)

    def inspect_forward(self, *a, **k):
        return self.active.inspect_forward(*a, **k)

    def rope_tables(self, T):
        return self.active.rope_tables(T)

    # -- multimodal forward ------------------------------------------------
    def encode_images(self, pixels: Array) -> Array:
        """pixels (B,H,W,C) -> projected vision tokens (B, T_v, H_llm).

        ``vision_feature_layer`` follows llava-hf semantics: -1 = full
        tower, -2 = penultimate hidden state (no final norm)."""
        # vision_feature_layer indexes HF's hidden_states tuple, which never
        # includes the post-layernorm: -1 = last block output (no final LN),
        # -2 = penultimate.
        vfl = getattr(self, "vision_feature_layer", -1)
        L = len(self.vision.params["blocks"])
        feats = self.vision.forward_features(
            pixels, until_layer=L + 1 + vfl, final_norm=False)
        if getattr(self, "select_strategy", "default") == "default":
            feats = feats[:, 1:]  # drop cls
        h = self.project_features(feats)
        for hook in self.feature_hooks:
            h = hook(self, h)
        return h

    def project_features(self, feats: Array) -> Array:
        """2-layer GELU projector (llava); subclasses override."""
        fc1, fc2 = self.projector["fc1"], self.projector["fc2"]
        h = A.default_linear("proj.fc1", fc1["weight"], fc1.get("bias"), feats)
        h = jax.nn.gelu(h)
        return A.default_linear("proj.fc2", fc2["weight"], fc2.get("bias"), h)

    def multimodal_embed(self, input_ids: Array, pixels: Array) -> Array:
        """Splice image tokens at the (single) image-token position.

        Static shapes: output length = T_text - 1 + T_vision; the image
        token position may vary per row (dynamic_update via gather of a
        per-row permutation).
        """
        return self._splice(input_ids, self.encode_images(pixels))

    def _splice(self, input_ids: Array, img_embeds: Array):
        txt = A.embed_forward(self.language.arch, self.language.params,
                              input_ids)  # (B, T, H)
        B, T, H = txt.shape
        Tv = img_embeds.shape[1]
        pos = jnp.argmax(
            (input_ids == self.image_token_id).astype(jnp.int32), axis=1
        )  # (B,)
        # output index map: for out position j, pick text token or image token
        out_T = T - 1 + Tv
        j = jnp.arange(out_T)[None, :]
        p = pos[:, None]
        from_text_before = j < p
        from_image = (j >= p) & (j < p + Tv)
        text_idx = jnp.where(from_text_before, j, j - Tv + 1)
        text_idx = jnp.clip(text_idx, 0, T - 1)
        img_idx = jnp.clip(j - p, 0, Tv - 1)
        bi = jnp.arange(B)[:, None]
        out = jnp.where(
            from_image[..., None],
            img_embeds[bi, img_idx],
            txt[bi, text_idx],
        )
        return out

    def forward_multimodal(self, input_ids: Array, pixels: Array) -> Array:
        img_embeds = self.encode_images(pixels)
        x = self._splice(input_ids, img_embeds)
        arch = self.language.arch
        n_vis = img_embeds.shape[1]
        vis_start = jnp.argmax(
            (input_ids == self.image_token_id).astype(jnp.int32), axis=1
        )
        lfs = self.language.linear_fns
        cos_sin_cache: Dict[int, Any] = {}
        for idx, bp in enumerate(self.language.params["blocks"]):
            if idx in self.lang_token_hooks:
                x, vis_start, n_vis = self.lang_token_hooks[idx](
                    self, idx, x, vis_start, n_vis
                )
            T = x.shape[1]
            if T not in cos_sin_cache:
                cos, sin = self.language.rope_tables(T)
                cos_sin_cache[T] = (cos, sin, A.causal_mask(T, T))
            cos, sin, mask = cos_sin_cache[T]
            lf = lfs[idx] if lfs is not None else None
            x, _, _ = A.block_forward(
                arch, bp, x, cos, sin, mask,
                linear_fn=lf or A.default_linear,
                kv_hook=(self.language.kv_hooks or [None] * 99)[idx]
                if self.language.kv_hooks else None,
            )
        return A.head_forward(arch, self.language.params, x)

    # -- calibration (batch_process analogue) ------------------------------
    def batch_process(
        self, samples: Sequence[Tuple[Array, Array]]
    ) -> List[Array]:
        """[(input_ids (1,T), pixels (1,H,W,C))] -> multimodal embeddings
        ready as first-block inputs (the Catcher analogue for VLMs)."""
        f = jax.jit(self.multimodal_embed)
        return [f(jnp.asarray(ids), jnp.asarray(px)) for ids, px in samples]

    def collect_first_block_input(self, calib_batches):
        if self.modality == "vision":
            return self.vision.collect_first_block_input(calib_batches)
        # language calib batches: token ids (text-only) or (ids, pixels)
        out = []
        for b in calib_batches:
            if isinstance(b, tuple):
                out.extend(self.batch_process([b]))
            else:
                f = jax.jit(lambda ids: A.embed_forward(
                    self.language.arch, self.language.params, ids))
                out.append(f(b))
        return out


def make_tiny_llava(seed: int = 0, vocab: int = 256, hidden: int = 64,
                    vit_hidden: int = 48, image_size: int = 32,
                    patch: int = 8, dtype=jnp.float32) -> Llava:
    """Random-init tiny VLM for tests (zero-egress)."""
    from .arch import ArchSpec, init_params
    from .base import Llama
    from .vit import init_vit_params, make_vit_arch

    la = ArchSpec(family="llama", vocab_size=vocab, hidden_size=hidden,
                  intermediate_size=hidden * 2, num_layers=2, num_heads=4,
                  num_kv_heads=2, head_dim=hidden // 4, dtype=dtype)
    lang = Llama(la, init_params(jax.random.PRNGKey(seed), la))
    va = make_vit_arch(image_size=image_size, patch_size=patch,
                       hidden=vit_hidden, inter=vit_hidden * 2, layers=2,
                       heads=4, num_classes=10, dtype=dtype)
    vit = Vit(va, init_vit_params(jax.random.PRNGKey(seed + 1), va,
                                  patch_size=patch), patch_size=patch)
    k = jax.random.PRNGKey(seed + 2)
    k1, k2 = jax.random.split(k)
    projector = {
        "fc1": {"weight": (jax.random.normal(k1, (hidden, vit_hidden))
                           * 0.05).astype(dtype),
                "bias": jnp.zeros((hidden,), dtype)},
        "fc2": {"weight": (jax.random.normal(k2, (hidden, hidden))
                           * 0.05).astype(dtype),
                "bias": jnp.zeros((hidden,), dtype)},
    }
    return Llava(lang, vit, projector, image_token_id=vocab - 1)
