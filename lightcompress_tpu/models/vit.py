"""Vision Transformer family (reference llmc/models/vit.py).

Plain ViT for image classification: patch embedding (the conv expressed as
an unfold+matmul — MXU-native), cls token + learned position embeddings,
pre-LN encoder blocks (LayerNorm/GELU, same block structure as the opt
family but bidirectional), final LN + classifier head.

Enables ``quant_attn`` (the reference's LlmcViTSelfAttention path) and hosts
the token-reduction subsystem (vision-token pruning/merging between blocks).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..registry import MODEL_REGISTRY
from . import arch as A
from .base import BaseModel, Subset

Array = jax.Array

VIT_SUBSETS = (
    Subset(layers=("attn.q", "attn.k", "attn.v"), prev_op="ln1",
           prev_type="norm", input="attn.q", inspect="attn", has_kwargs=True),
    Subset(layers=("attn.o",), prev_op="attn.v", prev_type="linear",
           input="attn.o", inspect="attn.o"),
    Subset(layers=("mlp.fc1",), prev_op="ln2", prev_type="norm",
           input="mlp.fc1", inspect="mlp.fc1", is_mlp=True),
    Subset(layers=("mlp.fc2",), prev_op="mlp.fc1", prev_type="linear",
           input="mlp.fc2", inspect="mlp.fc2", is_mlp=True),
)


def make_vit_arch(image_size=224, patch_size=16, hidden=768, inter=3072,
                  layers=12, heads=12, num_classes=1000, dtype=jnp.float32,
                  cls_token=True, act_fn="gelu"):
    n_patches = (image_size // patch_size) ** 2 + (1 if cls_token else 0)
    return A.ArchSpec(
        family="opt",  # block structure: LayerNorm + GELU + biases
        vocab_size=num_classes,
        hidden_size=hidden,
        intermediate_size=inter,
        num_layers=layers,
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=hidden // heads,
        max_position_embeddings=n_patches,
        act_fn=act_fn,
        do_layer_norm_before=True,
        dtype=dtype,
    )


def init_vit_params(key, arch: A.ArchSpec, patch_size: int = 16,
                    channels: int = 3, cls_token: bool = True) -> Dict:
    ks = jax.random.split(key, arch.num_layers + 5)
    h = arch.hidden_size
    dt = arch.dtype
    n_pos = arch.max_position_embeddings
    patch_dim = channels * patch_size * patch_size
    params: Dict[str, Any] = {
        "patch_embed": {
            "weight": (jax.random.normal(ks[0], (h, patch_dim)) * 0.02
                       ).astype(dt),
            "bias": jnp.zeros((h,), dt),
        },
        "pos_embed": (jax.random.normal(ks[2], (1, n_pos, h)) * 0.02
                      ).astype(dt),
        "blocks": [
            A.init_block_params(ks[3 + i], arch)
            for i in range(arch.num_layers)
        ],
        "norm": {"weight": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
        "head": {
            "weight": (jax.random.normal(ks[-1], (arch.vocab_size, h)) * 0.02
                       ).astype(dt),
            "bias": jnp.zeros((arch.vocab_size,), dt),
        },
    }
    if cls_token:
        params["cls_token"] = (
            jax.random.normal(ks[1], (1, 1, h)) * 0.02).astype(dt)
    return params


def patchify(pixels: Array, patch_size: int) -> Array:
    """(B, H, W, C) -> (B, n_patches, C*P*P) — the conv as unfold+matmul."""
    B, H, W, C = pixels.shape
    p = patch_size
    x = pixels.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, nh, nw, p, p, C
    return x.reshape(B, (H // p) * (W // p), p * p * C)


@MODEL_REGISTRY
class Vit(BaseModel):
    subsets = VIT_SUBSETS

    def __init__(self, arch, params, tokenizer=None, config=None,
                 patch_size: int = 16):
        super().__init__(arch, params, tokenizer, config)
        self.patch_size = patch_size
        # token reduction hooks: idx -> (x -> x') applied before block idx
        self.token_hooks: Dict[int, Callable] = {}

    # -- vision forward ----------------------------------------------------
    def embed_pixels(self, pixels: Array) -> Array:
        p = self.params
        patches = patchify(pixels, self.patch_size)
        # conv weight layout: (h, C*P*P) rows match patch unfold order
        x = A.default_linear("patch", p["patch_embed"]["weight"],
                             p["patch_embed"].get("bias"), patches)
        B = x.shape[0]
        if "cls_token" in p:  # SigLIP towers have no CLS token
            cls = jnp.broadcast_to(p["cls_token"], (B, 1, x.shape[-1]))
            x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
        x = x + p["pos_embed"][:, : x.shape[1]]
        if "pre_ln" in p:  # CLIP vision pre_layrnorm
            x = A.layernorm(x, p["pre_ln"]["weight"], p["pre_ln"].get("bias"),
                            1e-5)
        return x

    def forward_features(self, pixels: Array,
                         linear_fns: Optional[List] = None,
                         until_layer: Optional[int] = None,
                         final_norm: bool = True) -> Array:
        """until_layer: stop after that many blocks (llava-hf's
        vision_feature_layer=-2 reads the penultimate hidden state, i.e.
        until_layer = num_layers - 1, no final norm)."""
        x = self.embed_pixels(pixels)
        n = until_layer if until_layer is not None else \
            len(self.params["blocks"])
        for idx, bp in enumerate(self.params["blocks"][:n]):
            if idx in self.token_hooks:
                x = self.token_hooks[idx](self, idx, x)
            lf = (linear_fns[idx] if linear_fns is not None
                  else (self.linear_fns[idx] if self.linear_fns else None))
            x, _, _ = A.block_forward(
                self.arch, bp, x, None, None, None,
                linear_fn=lf or A.default_linear,
                matmul_hook=self.attn_matmul_hook,
                softmax_hook=self.attn_softmax_hook,
            )
        if not final_norm:
            return x
        return A.layernorm(x, self.params["norm"]["weight"],
                           self.params["norm"]["bias"], 1e-5)

    def classify(self, pixels: Array) -> Array:
        feats = self.forward_features(pixels)
        cls = feats[:, 0]
        return A.default_linear("head", self.params["head"]["weight"],
                                self.params["head"].get("bias"), cls)

    # -- engine-facing overrides (calibration on vision tokens) ------------
    def collect_first_block_input(self, calib_batches):
        f = jax.jit(lambda px: self.embed_pixels(px))
        return [f(b) for b in calib_batches]

    def block_forward(self, block_idx, x, linear_fn=None, kv_hook=None,
                      block_params=None):
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        return A.block_forward(
            self.arch, bp, x, None, None, None,
            linear_fn=linear_fn or A.default_linear, kv_hook=kv_hook,
            matmul_hook=self.attn_matmul_hook,
            softmax_hook=self.attn_softmax_hook,
        )

    def inspect_forward(self, block_idx, subset, x, linear_fn=None,
                        block_params=None):
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        lf = linear_fn or A.default_linear
        if subset.inspect == "attn":
            return A.attn_inspect(self.arch, bp, x, None, None, None,
                                  linear_fn=lf)
        if subset.inspect == "mlp":
            return A.mlp_inspect(self.arch, bp, x, linear_fn=lf)
        return A.linear_inspect(bp, subset.inspect, x, linear_fn=lf)


class AccuracyEval:
    """ImageNet-style top-1 over (images, labels) batches
    (llmc eval/eval_acc.py)."""

    def __init__(self, batches):
        self.batches = batches  # list of (pixels (B,H,W,C), labels (B,))

    def eval(self, model: Vit) -> float:
        correct = total = 0
        f = jax.jit(lambda px: model.classify(px))
        for px, labels in self.batches:
            preds = jnp.argmax(f(jnp.asarray(px)), axis=-1)
            correct += int(jnp.sum(preds == jnp.asarray(labels)))
            total += len(labels)
        return correct / total
