"""Audio-language model adapters (reference llmc/models/qwen2audio.py,
internomni.py).

Qwen2-Audio = Whisper-style audio encoder -> linear projector -> Qwen2 LLM.
The encoder is two 1-D convs (k=3; second strided 2) + learned positions +
pre-LN bidirectional transformer blocks (exactly our ``opt`` family block)
+ final LayerNorm + temporal avg-pool 2 (Qwen2AudioEncoder,
modeling_qwen2_audio).  Convs run through ``lax.conv_general_dilated`` —
XLA lowers them onto the MXU directly; no im2col copies.

Compression runs per modality like the VLM adapters: ``set_modality
('audio'|'language')`` flips which blocks the engine sees
(deploy_all_modality analogue)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..registry import MODEL_REGISTRY
from . import arch as A
from .base import BaseModel, OPT_SUBSETS
from .vit import make_vit_arch

Array = jax.Array


def conv1d(x: Array, w: Array, b: Array, stride: int = 1,
           padding: int = 1) -> Array:
    """x (B, C, T), w (D, C, K) -> (B, D, T')."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        y = y + b.astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype)


def make_audio_arch(d_model=1280, layers=32, heads=20, ffn=5120,
                    num_mel_bins=128, max_source_positions=1500,
                    dtype=jnp.float32) -> A.ArchSpec:
    arch = make_vit_arch(hidden=d_model, inter=ffn, layers=layers,
                         heads=heads, num_classes=1, dtype=dtype)
    import dataclasses

    return dataclasses.replace(
        arch, max_position_embeddings=max_source_positions,
        rms_eps=1e-5,
    )


def init_audio_params(key, arch: A.ArchSpec, num_mel_bins: int = 128) -> Dict:
    ks = jax.random.split(key, arch.num_layers + 4)
    d = arch.hidden_size
    dt = arch.dtype
    return {
        "conv1": {"weight": (jax.random.normal(ks[0], (d, num_mel_bins, 3))
                             * 0.02).astype(dt),
                  "bias": jnp.zeros((d,), dt)},
        "conv2": {"weight": (jax.random.normal(ks[1], (d, d, 3)) * 0.02
                             ).astype(dt),
                  "bias": jnp.zeros((d,), dt)},
        "pos_embed": (jax.random.normal(
            ks[2], (arch.max_position_embeddings, d)) * 0.02).astype(dt),
        "blocks": [A.init_block_params(ks[3 + i], arch)
                   for i in range(arch.num_layers)],
        "norm": {"weight": jnp.ones((d,), dt), "bias": jnp.zeros((d,), dt)},
    }


@MODEL_REGISTRY
class AudioTower(BaseModel):
    """Whisper-encoder-style audio feature extractor."""

    subsets = OPT_SUBSETS

    def __init__(self, arch, params, tokenizer=None, config=None,
                 num_mel_bins: int = 128):
        super().__init__(arch, params, tokenizer, config)
        self.num_mel_bins = num_mel_bins

    def embed_audio(self, mel: Array) -> Array:
        """mel (B, num_mel_bins, T) -> (B, T//2, d) pre-block embeddings."""
        p = self.params
        h = jax.nn.gelu(conv1d(mel, p["conv1"]["weight"],
                               p["conv1"].get("bias")))
        h = jax.nn.gelu(conv1d(h, p["conv2"]["weight"],
                               p["conv2"].get("bias"), stride=2))
        h = h.transpose(0, 2, 1)  # (B, T', d)
        return h + p["pos_embed"][None, : h.shape[1]].astype(h.dtype)

    def forward_features(self, mel: Array) -> Array:
        """Full encoder: conv stem, blocks (bidirectional), final LN,
        temporal avg-pool 2 (Qwen2AudioEncoder.avg_pooler)."""
        x = self.embed_audio(mel)
        lfs = self.linear_fns
        for idx, bp in enumerate(self.params["blocks"]):
            lf = lfs[idx] if lfs is not None else None
            x, _, _ = A.block_forward(
                self.arch, bp, x, None, None, None,
                linear_fn=lf or A.default_linear,
                matmul_hook=self.attn_matmul_hook,
                softmax_hook=self.attn_softmax_hook,
            )
        B, T, D = x.shape
        x = x[:, : T - T % 2].reshape(B, T // 2, 2, D).mean(axis=2)
        return A.layernorm(x, self.params["norm"]["weight"],
                           self.params["norm"]["bias"], 1e-5)

    # engine-facing: calibration works on audio-token sequences
    def collect_first_block_input(self, calib_batches):
        f = jax.jit(lambda mel: self.embed_audio(mel))
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


@MODEL_REGISTRY
class Qwen2Audio(BaseModel):
    """Audio tower + single-linear projector + Qwen2 LLM; audio features
    spliced at the audio-token position (qwen2audio.py:19-115)."""

    def __init__(self, language: BaseModel, audio: AudioTower,
                 projector: Dict[str, Array], tokenizer=None, config=None,
                 audio_token_id: int = 151646):
        super().__init__(language.arch, language.params, tokenizer, config)
        self.language = language
        self.audio = audio
        self.projector = projector  # {'weight', 'bias'}
        self.audio_token_id = audio_token_id
        self.modality = "language"

    def set_modality(self, modality: str):
        assert modality in ("language", "audio")
        self.modality = modality

    @property
    def active(self) -> BaseModel:
        return self.audio if self.modality == "audio" else self.language

    @property
    def blocks(self):
        return self.active.params["blocks"]

    @property
    def num_blocks(self):
        return len(self.active.params["blocks"])

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

    # -- multimodal --------------------------------------------------------
    def encode_audio(self, mel: Array) -> Array:
        feats = self.audio.forward_features(mel)
        return A.default_linear("audio_proj", self.projector["weight"],
                                self.projector.get("bias"), feats)

    def forward_multimodal(self, input_ids: Array, mel: Array) -> Array:
        emb = self.multimodal_embed(input_ids, mel)
        arch = self.language.arch
        T = emb.shape[1]
        cos, sin = self.language.rope_tables(T)
        mask = A.causal_mask(T, T)
        lfs = self.language.linear_fns
        x = emb
        for idx, bp in enumerate(self.language.params["blocks"]):
            lf = lfs[idx] if lfs is not None else None
            x, _, _ = A.block_forward(
                arch, bp, x, cos, sin, mask,
                linear_fn=lf or A.default_linear,
            )
        return A.head_forward(arch, self.language.params, x)

    def multimodal_embed(self, input_ids: Array, mel: Array) -> Array:
        """Splice projected audio tokens at the audio-token position
        (same static-shape gather as the VLM adapter)."""
        au = self.encode_audio(mel)  # (B, Ta, H)
        txt = A.embed_forward(self.language.arch, self.language.params,
                              input_ids)
        B, T, H = txt.shape
        Ta = au.shape[1]
        pos = jnp.argmax(
            (input_ids == self.audio_token_id).astype(jnp.int32), axis=1)
        out_T = T - 1 + Ta
        j = jnp.arange(out_T)[None, :]
        p = pos[:, None]
        from_audio = (j >= p) & (j < p + Ta)
        text_idx = jnp.clip(jnp.where(j < p, j, j - Ta + 1), 0, T - 1)
        au_idx = jnp.clip(j - p, 0, Ta - 1)
        bi = jnp.arange(B)[:, None]
        return jnp.where(from_audio[..., None], au[bi, au_idx],
                         txt[bi, text_idx])

    def batch_process(self, samples: Sequence[Tuple[Array, Array]]
                      ) -> List[Array]:
        f = jax.jit(self.multimodal_embed)
        return [f(jnp.asarray(ids), jnp.asarray(mel)) for ids, mel in samples]

    def collect_first_block_input(self, calib_batches):
        if self.modality == "audio":
            return self.audio.collect_first_block_input(calib_batches)
        out = []
        for b in calib_batches:
            if isinstance(b, tuple):
                out.extend(self.batch_process([b]))
            else:
                f = jax.jit(lambda ids: A.embed_forward(
                    self.language.arch, self.language.params, ids))
                out.append(f(b))
        return out


def make_tiny_qwen2audio(seed: int = 0, vocab: int = 256, hidden: int = 64,
                         d_audio: int = 48, mel_bins: int = 16,
                         dtype=jnp.float32) -> Qwen2Audio:
    """Random-init tiny ALM for tests (zero-egress)."""
    from .arch import ArchSpec, init_params
    from .base import Qwen2

    la = ArchSpec(family="llama", vocab_size=vocab, hidden_size=hidden,
                  intermediate_size=hidden * 2, num_layers=2, num_heads=4,
                  num_kv_heads=2, head_dim=hidden // 4, attn_bias=True,
                  dtype=dtype)
    lang = Qwen2(la, init_params(jax.random.PRNGKey(seed), la))
    aa = make_audio_arch(d_model=d_audio, layers=2, heads=4,
                         ffn=d_audio * 2, num_mel_bins=mel_bins,
                         max_source_positions=64, dtype=dtype)
    tower = AudioTower(aa, init_audio_params(jax.random.PRNGKey(seed + 1),
                                             aa, mel_bins),
                       num_mel_bins=mel_bins)
    k = jax.random.PRNGKey(seed + 2)
    projector = {
        "weight": (jax.random.normal(k, (hidden, d_audio)) * 0.05
                   ).astype(dtype),
        "bias": jnp.zeros((hidden,), dtype),
    }
    return Qwen2Audio(lang, tower, projector, audio_token_id=vocab - 2)
