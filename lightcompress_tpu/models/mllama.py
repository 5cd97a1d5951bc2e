"""Mllama (Llama-3.2-Vision) adapter — reference llmc/models/mllama.py.

Two genuinely new structures vs the Llava-style VLMs:

- **Vision**: tiled CLIP-like tower with gated tile/position embeddings,
  a local transformer whose intermediate hidden states are collected, and a
  tanh-gated *global* transformer; output = concat(last, intermediates)
  along features (modeling_mllama.py:998-1132).
- **Language**: a Llama stack where ``cross_attention_layers`` are
  replaced by tanh-gated cross-attention blocks attending to projected
  vision states with per-head-dim q/k RMSNorm and no RoPE
  (modeling_mllama.py:674-728).

The blockwise engine sees the language blocks (mixed self/cross) or the
vision blocks (local + global) via ``set_modality``; cross blocks get the
vision states through the per-batch ``extra`` channel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..registry import MODEL_REGISTRY
from . import arch as A
from .base import BaseModel, Subset

Array = jax.Array

MLLAMA_VISION_SUBSETS = (
    Subset(layers=("attn.q", "attn.k", "attn.v"), prev_op="ln1",
           prev_type="norm", input="attn.q", inspect="attn", has_kwargs=True),
    Subset(layers=("attn.o",), prev_op="attn.v", prev_type="linear",
           input="attn.o", inspect="attn.o"),
    Subset(layers=("mlp.fc1",), prev_op="ln2", prev_type="norm",
           input="mlp.fc1", inspect="mlp.fc1", is_mlp=True),
    Subset(layers=("mlp.fc2",), prev_op="mlp.fc1", prev_type="linear",
           input="mlp.fc2", inspect="mlp.fc2", is_mlp=True),
)

MLLAMA_CROSS_SUBSETS = (
    # q reads the normed hidden state; k/v read the vision states — the
    # ln->fcs scale migration only covers q (skip_rotate analogue).
    Subset(layers=("attn.q",), prev_op="ln1", prev_type="norm",
           input="attn.q", inspect="attn.q"),
    Subset(layers=("attn.o",), prev_op="attn.v", prev_type="linear",
           input="attn.o", inspect="attn.o"),
    Subset(layers=("mlp.gate", "mlp.up"), prev_op="ln2", prev_type="norm",
           input="mlp.gate", inspect="mlp", is_mlp=True),
    Subset(layers=("mlp.down",), prev_op="mlp.up", prev_type="linear",
           input="mlp.down", inspect="mlp.down", is_mlp=True),
)


@dataclasses.dataclass(frozen=True)
class MllamaVisionSpec:
    hidden: int
    intermediate: int
    num_layers: int
    num_global_layers: int
    num_heads: int
    patch_size: int
    image_size: int
    max_num_tiles: int
    intermediate_layers_indices: Tuple[int, ...]
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


def _gated_vis_block(spec, bp: Dict, x: Array, mask, linear_fn,
                     gated: bool, feats: Optional[Dict] = None) -> Array:
    """One (optionally tanh-gated) Mllama vision block; opt-family layout
    with biasless attention projections."""
    nh = spec.num_heads
    hd = spec.hidden // nh
    B, T, _ = x.shape

    def lf(name, w, b, u):
        if feats is not None:
            feats.setdefault(name, u)
        return linear_fn(name, w, b, u)

    h1 = A.layernorm(x, bp["ln1"]["weight"], bp["ln1"].get("bias"), 1e-5)
    ap = bp["attn"]
    q = lf("attn.q", ap["q"]["weight"], ap["q"].get("bias"), h1)
    k = lf("attn.k", ap["k"]["weight"], ap["k"].get("bias"), h1)
    v = lf("attn.v", ap["v"]["weight"], ap["v"].get("bias"), h1)
    q = q.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    ctx = A.sdpa(q, k, v, mask, kv_groups=1)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)
    attn = lf("attn.o", ap["o"]["weight"], ap["o"].get("bias"), ctx)
    if gated:
        attn = attn * jnp.tanh(bp["gate_attn"])
    x = x + attn
    h2 = A.layernorm(x, bp["ln2"]["weight"], bp["ln2"].get("bias"), 1e-5)
    mp = bp["mlp"]
    f1 = lf("mlp.fc1", mp["fc1"]["weight"], mp["fc1"].get("bias"), h2)
    f2 = lf("mlp.fc2", mp["fc2"]["weight"], mp["fc2"].get("bias"),
            jax.nn.gelu(f1, approximate=False))
    if gated:
        f2 = f2 * jnp.tanh(bp["gate_ffn"])
    return x + f2


@MODEL_REGISTRY
class MllamaVisionModel(BaseModel):
    """Blockwise-engine-compatible vision side; ``blocks`` = local layers
    followed by global layers."""

    def __init__(self, spec: MllamaVisionSpec, params: Dict,
                 tokenizer=None, config=None):
        arch = A.ArchSpec(
            family="opt", vocab_size=1, hidden_size=spec.hidden,
            intermediate_size=spec.intermediate,
            num_layers=spec.num_layers + spec.num_global_layers,
            num_heads=spec.num_heads, num_kv_heads=spec.num_heads,
            head_dim=spec.hidden // spec.num_heads, act_fn="gelu_exact",
            dtype=spec.dtype)
        super().__init__(arch, params, tokenizer, config)
        self.spec = spec
        self.subsets = MLLAMA_VISION_SUBSETS
        self.token_hooks: Dict[int, Any] = {}

    def get_subsets_in_block(self, block_idx):
        return self.subsets

    def _is_global(self, idx: int) -> bool:
        return idx >= self.spec.num_layers

    def block_forward(self, block_idx, x, linear_fn=None, kv_hook=None,
                      block_params=None, extra=None):
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        feats: Dict[str, Array] = {}
        mask = extra.get("mask") if extra else None
        y = _gated_vis_block(self.spec, bp, x, mask,
                             linear_fn or A.default_linear,
                             self._is_global(block_idx), feats)
        return y, feats, None

    def inspect_forward(self, block_idx, subset, x, linear_fn=None,
                        block_params=None):
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        lf = linear_fn or A.default_linear
        if subset.inspect == "attn":
            return A.attn_inspect(self.arch, bp, x, None, None, None,
                                  linear_fn=lf)
        return A.linear_inspect(bp, subset.inspect, x, linear_fn=lf)

    # -- full vision forward -------------------------------------------
    def embed_tiles(self, pixels: Array, aspect_id: int) -> Array:
        """pixels (tiles, H, W, C) -> padded token tensor (tiles, Tp, D)."""
        from .vit import patchify

        spec, p = self.spec, self.params
        tiles = pixels.shape[0]
        patches = patchify(pixels, spec.patch_size)
        x = A.default_linear("patch", p["patch_embed"]["weight"],
                             p["patch_embed"].get("bias"), patches)
        # pre-tile positional embedding (gated)
        pre = p["pre_tile_pos"]
        emb = pre["embedding"][aspect_id].reshape(
            spec.max_num_tiles, 1, spec.hidden)
        x = x + jnp.tanh(pre["gate"]) * emb[:tiles]
        # cls token
        cls = jnp.broadcast_to(p["class_embedding"][None, None],
                               (tiles, 1, spec.hidden)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        # gated positional embedding
        gp = p["pos_embed"]
        g = jnp.tanh(gp["gate"])
        x = x + (1 - g) * gp["embedding"][None]
        tile_pos = gp["tile_embedding"][aspect_id].reshape(
            spec.max_num_tiles, spec.num_patches, spec.hidden)
        x = x + g * tile_pos[:tiles]
        x = A.layernorm(x, p["ln_pre"]["weight"], p["ln_pre"].get("bias"),
                        1e-5)
        # pad token axis to a multiple of 8 (modeling_mllama.py:1070)
        T = x.shape[1]
        pad = (-T) % 8
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    def _pad_mask(self, tiles: int, Tp: int) -> Optional[Array]:
        """Padding patch tokens are masked out as attention keys
        (_prepare_aspect_ratio_attention_mask, modeling_mllama.py:75-100)."""
        if Tp == self.spec.num_patches:
            return None
        # HF quirk: bias = min only where BOTH query and key are padding
        # (outer product of the inverted mask) — pad keys still participate
        # in real queries' softmax with their zeroed embeddings.
        pad = (np.arange(Tp) >= self.spec.num_patches)
        pad = np.tile(pad, tiles).astype(np.float32)  # (tiles*Tp,)
        mask = np.outer(pad, pad) * np.finfo(np.float32).min
        return jnp.asarray(mask)

    def forward_features(self, pixels: Array, aspect_id: int = 1) -> Array:
        """(tiles, H, W, C) -> (tiles, num_patches, D*(1+n_intermediate))."""
        spec, p = self.spec, self.params
        x = self.embed_tiles(pixels, aspect_id)
        tiles, Tp, D = x.shape
        mask = self._pad_mask(tiles, Tp)
        # local transformer over all tiles' tokens jointly
        x = x.reshape(1, tiles * Tp, D)
        inters = []
        for i in range(spec.num_layers):
            if i in self.token_hooks:
                x = self.token_hooks[i](self, i, x)
            x, _, _ = self.block_forward(i, x, extra={"mask": mask})
            # hidden_states[i] = OUTPUT of layer i (MllamaVisionEncoder
            # appends after the layer call)
            if i in spec.intermediate_layers_indices:
                inters.append(x)
        x = A.layernorm(x, p["ln_post"]["weight"], p["ln_post"].get("bias"),
                        1e-5)
        # post-tile positional embedding, then the gated global transformer
        post = p["post_tile_pos"]
        emb = post["embedding"][aspect_id].reshape(
            spec.max_num_tiles, 1, spec.hidden)
        x = x.reshape(tiles, Tp, D) + jnp.tanh(post["gate"]) * emb[:tiles]
        x = x.reshape(1, tiles * Tp, D)
        for j in range(spec.num_global_layers):
            x, _, _ = self.block_forward(spec.num_layers + j, x,
                                         extra={"mask": mask})
        # un-pad + concat intermediates (which skip ln_post)
        out = jnp.concatenate([x] + inters, axis=-1)
        out = out.reshape(tiles, Tp, -1)[:, :spec.num_patches]
        return out

    def collect_first_block_input(self, calib_batches):
        out = []
        for b in calib_batches:
            px, aid = b if isinstance(b, tuple) else (b, 1)
            x = self.embed_tiles(jnp.asarray(px), aid)
            t, Tp, D = x.shape
            out.append(x.reshape(1, t * Tp, D))
        return out


# ---------------------------------------------------------------------------
# language side
# ---------------------------------------------------------------------------

def cross_attn_block(arch: A.ArchSpec, bp: Dict, x: Array, cross: Array,
                     linear_fn=A.default_linear,
                     feats: Optional[Dict] = None,
                     row_mask: Optional[Array] = None) -> Array:
    """Tanh-gated cross-attention decoder layer (modeling_mllama.py:674)."""
    B, T, H = x.shape
    nh, nkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim

    def lf(name, w, b, u):
        if feats is not None:
            feats.setdefault(name, u)
        return linear_fn(name, w, b, u)

    S = cross.shape[1]
    h1 = A.rmsnorm(x, bp["ln1"]["weight"], arch.rms_eps)
    ap = bp["attn"]
    q = lf("attn.q", ap["q"]["weight"], None, h1)
    k = lf("attn.k", ap["k"]["weight"], None, cross)
    v = lf("attn.v", ap["v"]["weight"], None, cross)
    q = q.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, nkv, hd).transpose(0, 2, 1, 3)
    q = A.rmsnorm(q, ap["q_norm"]["weight"], arch.rms_eps)
    k = A.rmsnorm(k, ap["k_norm"]["weight"], arch.rms_eps)
    ctx = A.sdpa(q, k, v, None, kv_groups=nh // nkv)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)
    attn = lf("attn.o", ap["o"]["weight"], None, ctx)
    x = x + jnp.tanh(bp["gate_attn"]) * attn
    h2 = A.rmsnorm(x, bp["ln2"]["weight"], arch.rms_eps)
    mp = bp["mlp"]
    g = lf("mlp.gate", mp["gate"]["weight"], None, h2)
    u = lf("mlp.up", mp["up"]["weight"], None, h2)
    mid = jax.nn.silu(g) * u
    f = lf("mlp.down", mp["down"]["weight"], None, mid)
    if row_mask is not None:
        f = f * row_mask
    return x + jnp.tanh(bp["gate_mlp"]) * f


@MODEL_REGISTRY
class Mllama(BaseModel):
    """Composite Mllama; ``set_modality`` switches engine targets."""

    def __init__(self, arch: A.ArchSpec, params: Dict,
                 vision: MllamaVisionModel, projector: Dict,
                 cross_layers, tokenizer=None, config=None,
                 image_token_id: int = 128256):
        super().__init__(arch, params, tokenizer, config)
        self.vision = vision
        self.projector = projector
        self.cross_layers = set(int(i) for i in cross_layers)
        self.image_token_id = image_token_id
        self.modality = "language"
        self.feature_hooks: List[Any] = []

    def set_modality(self, modality: str):
        assert modality in ("language", "vision")
        self.modality = modality

    @property
    def active(self):
        return self.vision if self.modality == "vision" else self

    @property
    def blocks(self):
        if self.modality == "vision":
            return self.vision.params["blocks"]
        return self.params["blocks"]

    @property
    def num_blocks(self):
        return len(self.blocks)

    def get_param_blocks(self):
        return self.blocks

    def set_param_blocks(self, blocks):
        if self.modality == "vision":
            self.vision.params["blocks"] = blocks
        else:
            self.params["blocks"] = blocks

    def get_subsets_in_block(self, block_idx):
        if self.modality == "vision":
            return MLLAMA_VISION_SUBSETS
        if block_idx in self.cross_layers:
            return MLLAMA_CROSS_SUBSETS
        return super().get_subsets_in_block(block_idx)

    def block_forward(self, block_idx, x, linear_fn=None, kv_hook=None,
                      block_params=None, extra=None):
        if self.modality == "vision":
            return self.vision.block_forward(
                block_idx, x, linear_fn=linear_fn,
                block_params=block_params)
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        if block_idx in self.cross_layers:
            if extra is None or "cross" not in extra:
                # text-only batch: HF skips cross layers when no vision
                # states exist (modeling_mllama.py cross-attn cache check)
                return x, {}, None
            feats: Dict[str, Array] = {}
            y = cross_attn_block(self.arch, bp, x, extra["cross"],
                                 linear_fn or A.default_linear, feats)
            return y, feats, None
        return super().block_forward(block_idx, x, linear_fn=linear_fn,
                                     kv_hook=kv_hook,
                                     block_params=block_params)

    def inspect_forward(self, block_idx, subset, x, linear_fn=None,
                        block_params=None):
        if self.modality == "vision":
            return self.vision.inspect_forward(
                block_idx, subset, x, linear_fn=linear_fn,
                block_params=block_params)
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        lf = linear_fn or A.default_linear
        if block_idx in self.cross_layers:
            if subset.inspect == "mlp":
                return A.mlp_inspect(self.arch, bp, x, linear_fn=lf)
            return A.linear_inspect(bp, subset.inspect, x, linear_fn=lf)
        return super().inspect_forward(block_idx, subset, x,
                                       linear_fn=linear_fn, block_params=bp)

    # -- multimodal ----------------------------------------------------
    def encode_images(self, pixels: Array, aspect_id: int = 1) -> Array:
        """(tiles, H, W, C) -> cross-attention states (1, tiles*Tv, H)."""
        feats = self.vision.forward_features(pixels, aspect_id)
        pw = self.projector
        h = A.default_linear("mm_proj", pw["weight"], pw.get("bias"), feats)
        for hook in self.feature_hooks:
            h = hook(self, h)
        return h.reshape(1, -1, h.shape[-1])

    def forward_multimodal(self, input_ids, pixels: Array,
                           aspect_id: int = 1) -> Array:
        cross = self.encode_images(jnp.asarray(pixels), aspect_id)
        ids = jnp.asarray(input_ids)
        x = A.embed_forward(self.arch, self.params, ids)
        T = x.shape[1]
        cos, sin = self.rope_tables(T)
        mask = A.causal_mask(T, T)
        lfs = self.linear_fns
        for idx, bp in enumerate(self.params["blocks"]):
            lf = lfs[idx] if lfs is not None else None
            if idx in self.cross_layers:
                x = cross_attn_block(self.arch, bp, x, cross,
                                     lf or A.default_linear)
            else:
                x, _, _ = A.block_forward(self.arch, bp, x, cos, sin, mask,
                                          linear_fn=lf or A.default_linear)
        return A.head_forward(self.arch, self.params, x)

    def collect_first_block_input(self, calib_batches):
        if self.modality == "vision":
            return self.vision.collect_first_block_input(calib_batches)
        out = []
        for b in calib_batches:
            if isinstance(b, tuple):
                ids, px, aid = b if len(b) == 3 else (*b, 1)
                cross = self.encode_images(jnp.asarray(px), aid)
                emb = A.embed_forward(self.arch, self.params,
                                      jnp.asarray(ids))
                out.append((emb, {"cross": cross}))
            else:
                out.append(A.embed_forward(self.arch, self.params,
                                           jnp.asarray(b)))
        return out
