"""Additional VLM adapters: LLaVA-OneVision, VILA, Video-LLaVA.

Reference adapters: llmc/models/llava_onevision.py, vila.py,
videollava.py — each is a thin wrapper exposing ``vision_model`` /
``mm_projector`` / ``language_model`` plus ``batch_process``; the
compression engine always operates on one modality's block list at a
time.  Here they are `Llava` subclasses differing in vision tower
(SigLIP vs CLIP), projector shape, and feature packing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..registry import MODEL_REGISTRY
from . import arch as A
from .llava import Llava
from .vit import Vit

Array = jax.Array


@MODEL_REGISTRY.register("Llava OneVision")  # space-form used by the
# reference's shipped video token-reduction configs (dycoke.yml et al.)
@MODEL_REGISTRY.register("Llava_OneVision")
@MODEL_REGISTRY
class LlavaOnevision(Llava):
    """SigLIP tower + 2-layer projector + Qwen2 LM with anyres tiling
    (reference llava_onevision.py; HF LlavaOnevisionForConditionalGeneration).

    ``encode_images`` projects per-tile features ('full' select — SigLIP has
    no CLS).  ``pack_anyres`` implements the exact-fit anyres packing: base
    tile followed by the grid tiles row-major with the learned
    ``image_newline`` embedding appended at each grid row end (the unpad /
    bilinear-shrink branches only trigger for non-exact aspect ratios and
    are out of scope for fixed-shape TPU compilation).
    """

    select_strategy = "full"

    def __init__(self, *a, image_newline: Optional[Array] = None, **k):
        super().__init__(*a, **k)
        self.image_newline = image_newline

    def pack_anyres(self, tile_feats: Array, grid_hw=(1, 1)) -> Array:
        """(n_tiles, T, H) -> (1, T_packed, H).  tile 0 = base image."""
        base, grid = tile_feats[0], tile_feats[1:]
        gh, gw = grid_hw
        T, H = base.shape
        side = int(round(T ** 0.5))
        # (gh, gw, side, side, H) -> rows of (gh*side, gw*side) patches
        g = grid.reshape(gh, gw, side, side, H)
        g = g.transpose(0, 2, 1, 3, 4).reshape(gh * side, gw * side, H)
        if self.image_newline is not None:
            nl = jnp.broadcast_to(
                self.image_newline.astype(g.dtype), (gh * side, 1, H))
            g = jnp.concatenate([g, nl], axis=1)
        packed = jnp.concatenate([base, g.reshape(-1, H)], axis=0)
        return packed[None]

    def encode_images(self, pixels: Array) -> Array:
        """pixels (n_tiles, H, W, C) for one image -> (1, T_packed, H_llm)."""
        feats = super().encode_images(pixels)
        if feats.shape[0] == 1:  # single tile: no anyres packing
            return feats
        n_grid = feats.shape[0] - 1
        side = int(round(n_grid ** 0.5))
        grid_hw = (side, side) if side * side == n_grid else (1, n_grid)
        return self.pack_anyres(feats, grid_hw)


@MODEL_REGISTRY
class Vila(Llava):
    """VILA (reference vila.py): SigLIP tower + 'mlp_downsample' projector
    (2x2 spatial concat -> LayerNorm -> Linear -> GELU -> Linear) + Llama.
    """

    select_strategy = "full"

    def project_features(self, feats: Array) -> Array:
        B, T, H = feats.shape
        side = int(round(T ** 0.5))
        x = feats.reshape(B, side, side, H)
        # 2x2 neighborhood concat (flat_square downsample)
        x = x.reshape(B, side // 2, 2, side // 2, 2, H)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, (side // 2) * (side // 2), 4 * H)
        ln = self.projector["ln"]
        x = A.layernorm(x, ln["weight"], ln.get("bias"), 1e-5)
        fc1, fc2 = self.projector["fc1"], self.projector["fc2"]
        x = A.default_linear("proj.fc1", fc1["weight"], fc1.get("bias"), x)
        x = jax.nn.gelu(x)
        return A.default_linear("proj.fc2", fc2["weight"], fc2.get("bias"), x)


@MODEL_REGISTRY.register("InternVL2")
@MODEL_REGISTRY.register("InternVL3_5")
@MODEL_REGISTRY
class InternVL(Llava):
    """InternVL2 / InternVL3.5 (reference internvl2.py, internvl3_5.py; HF
    InternVLForConditionalGeneration): InternViT tower (layer-scale, optional
    full-dim QK RMSNorm) + pixel-shuffle 0.5x downsample + LN/MLP projector.
    """

    downsample_ratio = 0.5

    def pixel_shuffle(self, x: Array) -> Array:
        """(B, T, C) -> (B, T*ds^2 tokens merged, C/ds^2), HF pixel_shuffle
        semantics (modeling_internvl.py:688-721)."""
        B, T, C = x.shape
        fs = int(round(T ** 0.5))
        sf = self.downsample_ratio
        x = x.reshape(B, fs, fs, C)
        x = x.reshape(B, fs, int(fs * sf), int(C / sf))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(B, int(fs * sf), int(fs * sf), int(C / sf ** 2))
        x = x.transpose(0, 2, 1, 3)
        return x.reshape(B, -1, int(C / sf ** 2))

    def project_features(self, feats: Array) -> Array:
        x = self.pixel_shuffle(feats)
        ln = self.projector["ln"]
        x = A.layernorm(x, ln["weight"], ln.get("bias"), 1e-5)
        fc1, fc2 = self.projector["fc1"], self.projector["fc2"]
        x = A.default_linear("proj.fc1", fc1["weight"], fc1.get("bias"), x)
        x = jax.nn.gelu(x, approximate=False)
        return A.default_linear("proj.fc2", fc2["weight"], fc2.get("bias"), x)


@MODEL_REGISTRY.register("VideoLLaVA")
@MODEL_REGISTRY
class VideoLlava(Llava):
    """Video-LLaVA (reference videollava.py): separate CLIP image and video
    towers (LanguageBind weights share the CLIP layout) + shared projector.

    Videos arrive as (B, frames, H, W, C); every frame goes through the
    video tower, CLS dropped, projected, and frames are concatenated along
    the token axis.
    """

    def __init__(self, language, vision, projector, video_tower: Vit = None,
                 tokenizer=None, config=None, image_token_id: int = 32000,
                 video_token_id: int = 32001):
        super().__init__(language, vision, projector, tokenizer, config,
                         image_token_id)
        self.video_tower = video_tower or vision
        self.video_token_id = video_token_id

    def encode_videos(self, pixels: Array) -> Array:
        """(B, F, H, W, C) -> (B, F*T_v, H_llm)."""
        B, F = pixels.shape[:2]
        px = pixels.reshape(B * F, *pixels.shape[2:])
        vfl = getattr(self, "vision_feature_layer", -2)
        L = len(self.video_tower.params["blocks"])
        until = None if vfl == -1 else L + 1 + vfl
        feats = self.video_tower.forward_features(
            px, until_layer=until, final_norm=(vfl == -1))
        h = self.project_features(feats)  # HF keeps CLS for video frames
        for hook in self.feature_hooks:
            h = hook(self, h)
        Tv = h.shape[1]
        return h.reshape(B, F * Tv, -1)

    def forward_video(self, input_ids: Array, video_pixels: Array) -> Array:
        emb = self.encode_videos(video_pixels)
        x = self._splice_token(input_ids, emb, self.video_token_id)
        return self._lm_forward(x)

    def _splice_token(self, input_ids, embeds, token_id):
        old = self.image_token_id
        self.image_token_id = token_id
        try:
            return self._splice(input_ids, embeds)
        finally:
            self.image_token_id = old

    def _lm_forward(self, x: Array) -> Array:
        arch = self.language.arch
        T = x.shape[1]
        cos, sin = self.language.rope_tables(T)
        mask = A.causal_mask(T, T)
        lfs = self.language.linear_fns
        for idx, bp in enumerate(self.language.params["blocks"]):
            lf = lfs[idx] if lfs is not None else None
            x, _, _ = A.block_forward(arch, bp, x, cos, sin, mask,
                                      linear_fn=lf or A.default_linear)
        return A.head_forward(arch, self.language.params, x)


def make_tiny_vila(seed: int = 0, vocab: int = 256, hidden: int = 64,
                   vit_hidden: int = 48, image_size: int = 32,
                   patch: int = 8, dtype=jnp.float32) -> Vila:
    """Random-init tiny VILA (zero-egress tests)."""
    from .arch import ArchSpec, init_params
    from .base import Llama
    from .vit import init_vit_params, make_vit_arch

    la = ArchSpec(family="llama", vocab_size=vocab, hidden_size=hidden,
                  intermediate_size=hidden * 2, num_layers=2, num_heads=4,
                  num_kv_heads=2, head_dim=hidden // 4, dtype=dtype)
    lang = Llama(la, init_params(jax.random.PRNGKey(seed), la))
    va = make_vit_arch(image_size=image_size, patch_size=patch,
                       hidden=vit_hidden, inter=vit_hidden * 2, layers=2,
                       heads=4, num_classes=10, dtype=dtype,
                       cls_token=False, act_fn="gelu_tanh")
    vit = Vit(va, init_vit_params(jax.random.PRNGKey(seed + 1), va,
                                  patch_size=patch, cls_token=False),
              patch_size=patch)
    ks = jax.random.split(jax.random.PRNGKey(seed + 2), 2)
    projector = {
        "ln": {"weight": jnp.ones((4 * vit_hidden,), dtype),
               "bias": jnp.zeros((4 * vit_hidden,), dtype)},
        "fc1": {"weight": (jax.random.normal(ks[0], (hidden, 4 * vit_hidden))
                           * 0.05).astype(dtype),
                "bias": jnp.zeros((hidden,), dtype)},
        "fc2": {"weight": (jax.random.normal(ks[1], (hidden, hidden))
                           * 0.05).astype(dtype),
                "bias": jnp.zeros((hidden,), dtype)},
    }
    return Vila(lang, vit, projector, image_token_id=vocab - 1)


def sincos_2d_pos_embed(dim: int, h: int, w: int) -> Array:
    """Standard 2D sin-cos position embedding (MiniCPM-V resampler)."""
    assert dim % 4 == 0
    d4 = dim // 4
    omega = 1.0 / (10000.0 ** (jnp.arange(d4, dtype=jnp.float32) / d4))
    gh = jnp.arange(h, dtype=jnp.float32)[:, None] * omega[None]
    gw = jnp.arange(w, dtype=jnp.float32)[:, None] * omega[None]
    eh = jnp.concatenate([jnp.sin(gh), jnp.cos(gh)], -1)  # (h, d/2)
    ew = jnp.concatenate([jnp.sin(gw), jnp.cos(gw)], -1)  # (w, d/2)
    out = jnp.concatenate([
        jnp.broadcast_to(eh[:, None], (h, w, dim // 2)),
        jnp.broadcast_to(ew[None, :], (h, w, dim // 2)),
    ], -1)
    return out.reshape(h * w, dim)


@MODEL_REGISTRY
class MiniCPMV(Llava):
    """MiniCPM-V (reference minicpmv.py): SigLIP tower (`vpm`) + perceiver
    resampler (learned queries cross-attending to vision features with 2D
    sin-cos positions) + MiniCPM LM (`llm`).

    projector params: query (Q, H), kv_proj, attn {q,k,v,o} (the split
    nn.MultiheadAttention in_proj), ln_q/ln_kv/ln_post, proj (H, H).
    """

    select_strategy = "full"

    def __init__(self, *a, num_resampler_heads: int = 8, **k):
        super().__init__(*a, **k)
        self.num_resampler_heads = num_resampler_heads

    def project_features(self, feats: Array) -> Array:
        p = self.projector
        B, T, _ = feats.shape
        H = p["query"].shape[-1]
        nh = self.num_resampler_heads
        hd = H // nh
        side = int(round(T ** 0.5))
        kv = A.default_linear("resampler.kv", p["kv_proj"]["weight"],
                              p["kv_proj"].get("bias"), feats)
        kv = A.layernorm(kv, p["ln_kv"]["weight"], p["ln_kv"].get("bias"),
                         1e-5)
        q = A.layernorm(p["query"], p["ln_q"]["weight"],
                        p["ln_q"].get("bias"), 1e-5)  # (Q, H)
        pos = sincos_2d_pos_embed(H, side, side).astype(kv.dtype)
        k_in = kv + pos[None]
        ap = p["attn"]
        qq = A.default_linear("resampler.q", ap["q"]["weight"],
                              ap["q"].get("bias"), q)  # (Q, H)
        kk = A.default_linear("resampler.k", ap["k"]["weight"],
                              ap["k"].get("bias"), k_in)
        vv = A.default_linear("resampler.v", ap["v"]["weight"],
                              ap["v"].get("bias"), kv)
        Q = qq.shape[0]
        qh = qq.reshape(Q, nh, hd).transpose(1, 0, 2)
        kh = kk.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        vh = vv.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        sc = jnp.einsum("hqd,bhtd->bhqt", qh, kh) / (hd ** 0.5)
        pr = jax.nn.softmax(sc, axis=-1)
        ctx = jnp.einsum("bhqt,bhtd->bhqd", pr, vh)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Q, H)
        out = A.default_linear("resampler.o", ap["o"]["weight"],
                               ap["o"].get("bias"), ctx)
        out = A.layernorm(out, p["ln_post"]["weight"],
                          p["ln_post"].get("bias"), 1e-5)
        return out @ p["proj"]


@MODEL_REGISTRY
class InternOmni(InternVL):
    """InternOmni (reference internomni.py): InternVL plus a Whisper-style
    audio tower with an LN+MLP audio projector (mlp2); audio embeddings are
    spliced at ``audio_token_id`` like image tokens."""

    def __init__(self, language, vision, projector, audio=None,
                 audio_projector=None, tokenizer=None, config=None,
                 image_token_id: int = 151667,
                 audio_token_id: int = 151668):
        super().__init__(language, vision, projector, tokenizer, config,
                         image_token_id)
        self.audio = audio
        self.audio_projector = audio_projector or {}
        self.audio_token_id = audio_token_id

    def set_modality(self, modality: str):
        assert modality in ("language", "vision", "audio")
        self.modality = modality

    @property
    def active(self):
        if self.modality == "audio":
            return self.audio
        return self.vision if self.modality == "vision" else self.language

    def encode_audio(self, mel: Array) -> Array:
        feats = self.audio.forward_features(mel)  # (B, T_a, D_a)
        ap = self.audio_projector
        x = A.layernorm(feats, ap["ln"]["weight"], ap["ln"].get("bias"),
                        1e-5)
        x = A.default_linear("audio.fc1", ap["fc1"]["weight"],
                             ap["fc1"].get("bias"), x)
        x = jax.nn.gelu(x, approximate=False)
        return A.default_linear("audio.fc2", ap["fc2"]["weight"],
                                ap["fc2"].get("bias"), x)

    def forward_audio_visual(self, input_ids: Array, pixels: Array,
                             mel: Array) -> Array:
        """Image tokens expand at the image-token slot (``_splice``); the
        single audio-token slot is overwritten with the mean-pooled audio
        embedding (static shapes; the reference expands per audio_token_num
        which is dynamic)."""
        img = self.encode_images(pixels)
        aud = self.encode_audio(mel)
        x = self._splice(jnp.asarray(input_ids), img)
        return self._lm_apply(x, aud, input_ids)

    def _lm_apply(self, x: Array, aud: Array, input_ids) -> Array:
        # position of the audio token in the POST-image-splice sequence
        ids = jnp.asarray(input_ids)
        Tv = x.shape[1] - ids.shape[1] + 1
        img_pos = jnp.argmax((ids == self.image_token_id).astype(jnp.int32),
                             axis=1)
        aud_pos = jnp.argmax((ids == self.audio_token_id).astype(jnp.int32),
                             axis=1)
        aud_pos = jnp.where(aud_pos > img_pos, aud_pos + Tv - 1, aud_pos)
        # overwrite the single audio-token slot with mean-pooled audio
        # embedding window (static shapes: pooled to 1 token)
        pooled = jnp.mean(aud, axis=1, keepdims=True)  # (B, 1, H)
        bi = jnp.arange(x.shape[0])
        x = x.at[bi, aud_pos].set(pooled[:, 0])
        arch = self.language.arch
        T = x.shape[1]
        cos, sin = self.language.rope_tables(T)
        mask = A.causal_mask(T, T)
        lfs = self.language.linear_fns
        for idx, bp in enumerate(self.language.params["blocks"]):
            lf = lfs[idx] if lfs is not None else None
            x, _, _ = A.block_forward(arch, bp, x, cos, sin, mask,
                                      linear_fn=lf or A.default_linear)
        return A.head_forward(arch, self.language.params, x)

    def collect_first_block_input(self, calib_batches):
        if self.modality == "audio":
            return self.audio.collect_first_block_input(calib_batches)
        return super().collect_first_block_input(calib_batches)
