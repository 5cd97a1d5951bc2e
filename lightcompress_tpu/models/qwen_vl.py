"""Qwen2-VL / Qwen2.5-VL adapters (reference llmc/models/qwen2vl.py,
qwen2_5vl.py).

Vision tower: a packed-sequence ViT — 3D patch embedding (temporal 2),
2D rotary position embedding over the (h, w) patch grid, and a 2x2
PatchMerger into the LLM width.  Qwen2.5 additionally uses RMSNorm,
SiLU-gated MLPs, and window attention (full attention only at
``fullatt_block_indexes``) over a window-sorted token order.

Language model: Qwen2 with M-RoPE — 3D (temporal/height/width) rotary
tables merged per ``mrope_section``; text tokens carry identical t/h/w
positions so text-only forwards reduce to standard RoPE.

All grid arithmetic (positions, window indices) is static Python/NumPy —
shapes are compile-time constants, so the XLA graph stays fixed-shape.
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

QWENVL_VISION_SUBSETS = (
    Subset(layers=("attn.q", "attn.k", "attn.v"), prev_op="ln1",
           prev_type="norm", input="attn.q", inspect="attn", has_kwargs=True),
    Subset(layers=("attn.o",), prev_op="attn.v", prev_type="linear",
           input="attn.o", inspect="attn.o"),
    Subset(layers=("mlp.fc1",), prev_op="ln2", prev_type="norm",
           input="mlp.fc1", inspect="mlp.fc1", is_mlp=True),
    Subset(layers=("mlp.fc2",), prev_op="mlp.fc1", prev_type="linear",
           input="mlp.fc2", inspect="mlp.fc2", is_mlp=True),
)

QWENVL25_VISION_SUBSETS = (
    Subset(layers=("attn.q", "attn.k", "attn.v"), prev_op="ln1",
           prev_type="norm", input="attn.q", inspect="attn", has_kwargs=True),
    Subset(layers=("attn.o",), prev_op="attn.v", prev_type="linear",
           input="attn.o", inspect="attn.o"),
    Subset(layers=("mlp.gate", "mlp.up"), prev_op="ln2", prev_type="norm",
           input="mlp.gate", inspect="mlp", is_mlp=True),
    Subset(layers=("mlp.down",), prev_op="mlp.up", prev_type="linear",
           input="mlp.down", inspect="mlp.down", is_mlp=True),
)


@dataclasses.dataclass(frozen=True)
class QwenVLVisionSpec:
    depth: int
    embed_dim: int          # tower width
    out_hidden: int         # LLM width after merger
    num_heads: int
    intermediate: int
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    in_channels: int = 3
    v25: bool = False       # Qwen2.5: RMSNorm + gated SiLU MLP + windows
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = ()
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2


def _vision_pos_ids(spec: QwenVLVisionSpec, grid_thw) -> np.ndarray:
    """(h, w) patch positions in merge-group order (Qwen2VL rot_pos_emb)."""
    t, h, w = grid_thw
    m = spec.spatial_merge_size
    hpos = np.arange(h)[:, None].repeat(w, 1)
    hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).ravel()
    wpos = np.arange(w)[None, :].repeat(h, 0)
    wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).ravel()
    return np.tile(np.stack([hpos, wpos], -1), (t, 1))


def _vision_rope(spec: QwenVLVisionSpec, grid_thw) -> Tuple[Array, Array]:
    """cos/sin (S, head_dim) from the 2D grid."""
    dim = spec.head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64)
                                  / dim))
    pos = _vision_pos_ids(spec, grid_thw)  # (S, 2)
    max_grid = max(grid_thw[1], grid_thw[2])
    table = np.outer(np.arange(max_grid, dtype=np.float64), inv_freq)
    rot = table[pos].reshape(pos.shape[0], -1)  # (S, head_dim/2)
    emb = np.concatenate([rot, rot], axis=-1)
    return (jnp.asarray(np.cos(emb), jnp.float32),
            jnp.asarray(np.sin(emb), jnp.float32))


def _window_index(spec: QwenVLVisionSpec, grid_thw):
    """Qwen2.5 get_window_index: merge-token order sorted into windows.
    Returns (window_index (S/4,), window_id_per_token (S,))."""
    t, h, w = grid_thw
    m = spec.spatial_merge_size
    lh, lw = h // m, w // m
    ws = spec.window_size // m // spec.patch_size
    pad_h = (-lh) % ws
    pad_w = (-lw) % ws
    nwh, nww = (lh + pad_h) // ws, (lw + pad_w) // ws
    idx = np.arange(t * lh * lw).reshape(t, lh, lw)
    idxp = np.full((t, lh + pad_h, lw + pad_w), -100, dtype=np.int64)
    idxp[:, :lh, :lw] = idx
    idxp = idxp.reshape(t, nwh, ws, nww, ws).transpose(0, 1, 3, 2, 4)
    idxp = idxp.reshape(t, nwh * nww, ws, ws)
    seqlens = (idxp != -100).sum((2, 3)).ravel()
    flat = idxp.ravel()
    win_index = flat[flat != -100]
    # window id for every merge token, in the sorted order
    wid_sorted = np.repeat(np.arange(len(seqlens)), seqlens)
    # expand to patch tokens (merge_unit each)
    wid_tokens = np.repeat(wid_sorted, spec.merge_unit)
    return win_index, wid_tokens


def _packed_attn(spec: QwenVLVisionSpec, bp: Dict, x: Array, cos: Array,
                 sin: Array, mask: Optional[Array], linear_fn) -> Array:
    """(S, D) packed-sequence attention with per-token rope."""
    S, D = x.shape
    nh, hd = spec.num_heads, spec.head_dim
    q = linear_fn("attn.q", bp["attn"]["q"]["weight"],
                  bp["attn"]["q"].get("bias"), x)
    k = linear_fn("attn.k", bp["attn"]["k"]["weight"],
                  bp["attn"]["k"].get("bias"), x)
    v = linear_fn("attn.v", bp["attn"]["v"]["weight"],
                  bp["attn"]["v"].get("bias"), x)
    q = q.reshape(S, nh, hd).transpose(1, 0, 2)
    k = k.reshape(S, nh, hd).transpose(1, 0, 2)
    v = v.reshape(S, nh, hd).transpose(1, 0, 2)
    c = cos[None].astype(q.dtype)
    s = sin[None].astype(q.dtype)

    def rot(u):
        u1, u2 = jnp.split(u, 2, axis=-1)
        return jnp.concatenate([-u2, u1], axis=-1)

    q = q * c + rot(q) * s
    k = k * c + rot(k) * s
    scores = jnp.einsum("hqd,hkd->hqk", q, k,
                        preferred_element_type=jnp.float32) / (hd ** 0.5)
    if mask is not None:
        scores = scores + mask[None]
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("hqk,hkd->hqd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    ctx = ctx.transpose(1, 0, 2).reshape(S, D)
    return linear_fn("attn.o", bp["attn"]["o"]["weight"],
                     bp["attn"]["o"].get("bias"), ctx)


def _tower_norm(spec: QwenVLVisionSpec, p: Dict, x: Array) -> Array:
    if spec.v25:
        return A.rmsnorm(x, p["weight"], 1e-6)
    return A.layernorm(x, p["weight"], p.get("bias"), 1e-6)


def _tower_mlp(spec: QwenVLVisionSpec, bp: Dict, x: Array, linear_fn):
    mlp = bp["mlp"]
    if spec.v25:
        g = linear_fn("mlp.gate", mlp["gate"]["weight"],
                      mlp["gate"].get("bias"), x)
        u = linear_fn("mlp.up", mlp["up"]["weight"], mlp["up"].get("bias"), x)
        return linear_fn("mlp.down", mlp["down"]["weight"],
                         mlp["down"].get("bias"), jax.nn.silu(g) * u)
    h = linear_fn("mlp.fc1", mlp["fc1"]["weight"], mlp["fc1"].get("bias"), x)
    h = A._act(h, "quick_gelu")
    return linear_fn("mlp.fc2", mlp["fc2"]["weight"], mlp["fc2"].get("bias"),
                     h)


@MODEL_REGISTRY
class QwenVLVisionTower(BaseModel):
    """Blockwise-engine-compatible packed-sequence vision tower.

    The current image grid is model state (``set_grid``); positions,
    window order, and masks are all derived statically from it.
    """

    def __init__(self, spec: QwenVLVisionSpec, params: Dict,
                 tokenizer=None, config=None):
        arch = A.ArchSpec(
            family="opt", vocab_size=1, hidden_size=spec.embed_dim,
            intermediate_size=spec.intermediate, num_layers=spec.depth,
            num_heads=spec.num_heads, num_kv_heads=spec.num_heads,
            head_dim=spec.head_dim, act_fn="gelu", dtype=spec.dtype)
        super().__init__(arch, params, tokenizer, config)
        self.spec = spec
        self.subsets = (QWENVL25_VISION_SUBSETS if spec.v25
                        else QWENVL_VISION_SUBSETS)
        self.token_hooks: Dict[int, Any] = {}
        self._grid = (1, 4, 4)

    def set_grid(self, grid_thw):
        self._grid = tuple(int(g) for g in grid_thw)

    def get_subsets_in_block(self, block_idx):
        return self.subsets

    # -- core forward -------------------------------------------------
    def _rope_and_masks(self):
        spec = self.spec
        cos, sin = _vision_rope(spec, self._grid)
        if not spec.v25:
            return cos, sin, None, None, None
        win_index, wid = _window_index(spec, self._grid)
        order = np.repeat(win_index * spec.merge_unit, spec.merge_unit) + \
            np.tile(np.arange(spec.merge_unit), len(win_index))
        cos = cos[order]
        sin = sin[order]
        wmask = jnp.where(wid[:, None] == wid[None, :], 0.0, -jnp.inf
                          ).astype(jnp.float32)
        return cos, sin, order, np.argsort(win_index), wmask

    def block_forward(self, block_idx, x, linear_fn=None, kv_hook=None,
                      block_params=None, extra=None):
        """x: (1, S, D) window-ordered patch tokens."""
        spec = self.spec
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        lf = linear_fn or A.default_linear
        cos, sin, _, _, wmask = self._rope_and_masks()
        mask = None if (not spec.v25 or block_idx in
                        spec.fullatt_block_indexes) else wmask
        xs = x[0]
        feats: Dict[str, Array] = {}

        def collect(name, w, b, u):
            feats.setdefault(name, u)
            return lf(name, w, b, u)

        h1 = _tower_norm(spec, bp["ln1"], xs)
        attn = _packed_attn(spec, bp, h1, cos, sin, mask, collect)
        h = xs + attn
        h2 = _tower_norm(spec, bp["ln2"], h)
        y = h + _tower_mlp(spec, bp, h2, collect)
        return y[None], feats, None

    def inspect_forward(self, block_idx, subset, x, linear_fn=None,
                        block_params=None):
        spec = self.spec
        bp = block_params if block_params is not None else \
            self.blocks[block_idx]
        lf = linear_fn or A.default_linear
        if subset.inspect == "attn":
            cos, sin, _, _, wmask = self._rope_and_masks()
            mask = None if (not spec.v25 or block_idx in
                            spec.fullatt_block_indexes) else wmask
            S = cos.shape[0]
            # cached feats concatenate batches along axis 0: (n*S, D)
            xb = x.reshape(-1, S, x.shape[-1])
            return jax.vmap(
                lambda u: _packed_attn(spec, bp, u, cos, sin, mask, lf)
            )(xb).reshape(x.shape)
        if subset.inspect == "mlp":
            return _tower_mlp(spec, bp, x, lf)
        return A.linear_inspect(bp, subset.inspect, x, linear_fn=lf)

    def forward_features(self, patches: Array,
                         linear_fns: Optional[List] = None) -> Array:
        """patches: (S, C*tps*P*P) HF-processor layout -> (S/4, out_hidden).

        Output is in the original merge-token order (window sort reversed).
        """
        spec = self.spec
        p = self.params
        x = A.default_linear("patch", p["patch_embed"]["weight"],
                             p["patch_embed"].get("bias"), patches)
        cos, sin, order, rev, wmask = self._rope_and_masks()
        if order is not None:
            x = x[order]
        for idx, bp in enumerate(p["blocks"]):
            if idx in self.token_hooks:
                x = self.token_hooks[idx](self, idx, x)
            lf = (linear_fns[idx] if linear_fns is not None
                  else (self.linear_fns[idx] if self.linear_fns else None))
            y, _, _ = self.block_forward(idx, x[None], linear_fn=lf,
                                         block_params=bp)
            x = y[0]
        # merger: norm -> group merge_unit -> 2-layer GELU MLP
        mg = p["merger"]
        x = _tower_norm(spec, mg["ln_q"], x)
        x = x.reshape(-1, spec.merge_unit * spec.embed_dim)
        x = A.default_linear("merger.fc1", mg["fc1"]["weight"],
                             mg["fc1"].get("bias"), x)
        x = jax.nn.gelu(x, approximate=False)
        x = A.default_linear("merger.fc2", mg["fc2"]["weight"],
                             mg["fc2"].get("bias"), x)
        if rev is not None:
            x = x[rev]
        return x

    def collect_first_block_input(self, calib_batches):
        out = []
        for b in calib_batches:
            p = self.params
            x = A.default_linear("patch", p["patch_embed"]["weight"],
                                 p["patch_embed"].get("bias"),
                                 jnp.asarray(b))
            _, _, order, _, _ = self._rope_and_masks()
            if order is not None:
                x = x[order]
            out.append(x[None])
        return out


# ---------------------------------------------------------------------------
# top-level VLM
# ---------------------------------------------------------------------------

def merge_mrope(arch: A.ArchSpec, pos_ids_3d: Array,
                mrope_section) -> Tuple[Array, Array]:
    """pos_ids_3d (3, B, T) -> merged cos/sin (B, T, head_dim) per
    apply_multimodal_rotary_pos_emb (modeling_qwen2_vl.py)."""
    cos3, sin3 = A.rope_cos_sin(arch, pos_ids_3d)  # (3, B, T, D)
    secs = list(mrope_section) * 2
    starts = np.cumsum([0] + secs[:-1])
    cos = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(cos3[i % 3], int(st), int(sz), axis=-1)
         for i, (st, sz) in enumerate(zip(starts, secs))], axis=-1)
    sin = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(sin3[i % 3], int(st), int(sz), axis=-1)
         for i, (st, sz) in enumerate(zip(starts, secs))], axis=-1)
    return cos, sin


def qwen_vl_rope_index(ids: np.ndarray, grid_thw, merge_size: int,
                       image_token_id: int) -> np.ndarray:
    """Single-image get_rope_index (modeling_qwen2_vl.py:925): text tokens
    sequential on all 3 axes; the image-token span carries (t, h, w) grid
    positions.  ids: (B, T) with each row containing the image span."""
    B, T = ids.shape
    t, h, w = grid_thw
    lh, lw = h // merge_size, w // merge_size
    n_vis = t * lh * lw
    pos = np.zeros((3, B, T), dtype=np.int64)
    for b in range(B):
        row = ids[b]
        starts = np.nonzero(row == image_token_id)[0]
        if len(starts) == 0:
            pos[:, b] = np.arange(T)
            continue
        st = int(starts[0])
        pos[:, b, :st] = np.arange(st)
        t_idx = np.repeat(np.arange(t), lh * lw)
        h_idx = np.tile(np.repeat(np.arange(lh), lw), t)
        w_idx = np.tile(np.arange(lw), t * lh)
        grid = np.stack([t_idx, h_idx, w_idx]) + st
        pos[:, b, st:st + n_vis] = grid
        tail_start = grid.max() + 1
        n_tail = T - st - n_vis
        pos[:, b, st + n_vis:] = np.arange(n_tail) + tail_start
    return pos


@MODEL_REGISTRY.register("Qwen2_5VL")
@MODEL_REGISTRY
class Qwen2VL(BaseModel):
    """Composite Qwen2-VL: tower + Qwen2 LM with M-RoPE.  Modality switch
    follows the reference adapter (qwen2vl.py): the engine sees either the
    vision tower blocks or the LLM blocks."""

    def __init__(self, language: BaseModel, vision: QwenVLVisionTower,
                 tokenizer=None, config=None, image_token_id: int = 151655,
                 video_token_id: int = 151656,
                 vision_start_token_id: int = 151652,
                 mrope_section=(16, 24, 24)):
        super().__init__(language.arch, language.params, tokenizer, config)
        self.language = language
        self.vision = vision
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.vision_start_token_id = vision_start_token_id
        self.mrope_section = tuple(mrope_section)
        self.modality = "language"
        self.feature_hooks: List[Any] = []
        self.pruning_config: Dict[str, Any] = {
            "image_token_index": image_token_id,
            "select_feature": "patch",
        }

    # modality plumbing (same shape as Llava)
    def set_modality(self, modality: str):
        assert modality in ("language", "vision")
        self.modality = modality

    @property
    def active(self):
        return self.vision if self.modality == "vision" else self.language

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

    def get_subsets_in_block(self, i):
        return self.active.get_subsets_in_block(i)

    def get_block_linear_names(self, i):
        return self.active.get_block_linear_names(i)

    def block_forward(self, *a, **k):
        return self.active.block_forward(*a, **k)

    def inspect_forward(self, *a, **k):
        return self.active.inspect_forward(*a, **k)

    def rope_tables(self, T):
        return self.active.rope_tables(T)

    # -- multimodal forward -------------------------------------------
    def encode_images(self, patches: Array, grid_thw) -> Array:
        """HF-processor patches (S, C*tps*P*P) -> (S/4, H_llm)."""
        self.vision.set_grid(grid_thw)
        h = self.vision.forward_features(jnp.asarray(patches))
        for hook in self.feature_hooks:
            h = hook(self, h)
        return h

    def scatter_image_tokens(self, input_ids: Array, img: Array) -> Array:
        """Replace image-token positions (already expanded to T_v) with
        image embeddings, in order — HF's masked_scatter, static-shape."""
        txt = A.embed_forward(self.language.arch, self.language.params,
                              input_ids)
        B, T, H = txt.shape
        mask = input_ids == self.image_token_id
        img_idx = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, img.shape[0] - 1)
        return jnp.where(mask[..., None], img[img_idx], txt)

    def forward_multimodal(self, input_ids, patches, grid_thw) -> Array:
        """input_ids: (B, T) numpy/array with the image token repeated
        t*(h/2)*(w/2) times per row."""
        ids_np = np.asarray(input_ids)
        img = self.encode_images(patches, grid_thw)
        x = self.scatter_image_tokens(jnp.asarray(ids_np), img)
        pos = qwen_vl_rope_index(ids_np, grid_thw,
                                 self.vision.spec.spatial_merge_size,
                                 self.image_token_id)
        return self._lm_forward(x, jnp.asarray(pos))

    def forward(self, input_ids) -> Array:
        """Text-only: M-RoPE degenerates to standard RoPE."""
        ids = jnp.asarray(input_ids)
        x = A.embed_forward(self.language.arch, self.language.params, ids)
        B, T = ids.shape
        pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
        return self._lm_forward(x, pos)

    def _lm_forward(self, x: Array, pos_ids_3d: Array) -> Array:
        arch = self.language.arch
        cos, sin = merge_mrope(arch, pos_ids_3d, self.mrope_section)
        T = x.shape[1]
        mask = A.causal_mask(T, T)
        lfs = self.language.linear_fns
        for idx, bp in enumerate(self.language.params["blocks"]):
            lf = lfs[idx] if lfs is not None else None
            x, _, _ = A.block_forward(arch, bp, x, cos, sin, mask,
                                      linear_fn=lf or A.default_linear)
        return A.head_forward(arch, self.language.params, x)

    def collect_first_block_input(self, calib_batches):
        if self.modality == "vision":
            return self.vision.collect_first_block_input(calib_batches)
        out = []
        for b in calib_batches:
            if isinstance(b, tuple):
                ids, patches, grid = b
                img = self.encode_images(patches, grid)
                out.append(self.scatter_image_tokens(jnp.asarray(ids), img))
            else:
                out.append(A.embed_forward(self.language.arch,
                                           self.language.params,
                                           jnp.asarray(b)))
        return out


def init_qwen_vl_tower(key, spec: QwenVLVisionSpec) -> Dict:
    """Random tiny tower params (zero-egress tests)."""
    ks = jax.random.split(key, spec.depth + 4)
    D, I = spec.embed_dim, spec.intermediate
    dt = spec.dtype
    pdim = spec.in_channels * spec.temporal_patch_size * spec.patch_size ** 2

    def lin(k, o, i, bias=True):
        p = {"weight": (jax.random.normal(k, (o, i)) * (1.0 / i) ** 0.5
                        ).astype(dt)}
        if bias:
            p["bias"] = jnp.zeros((o,), dt)
        return p

    def norm(d):
        p = {"weight": jnp.ones((d,), dt)}
        if not spec.v25:
            p["bias"] = jnp.zeros((d,), dt)
        return p

    blocks = []
    for i in range(spec.depth):
        kk = jax.random.split(ks[i], 8)
        mlp = ({"gate": lin(kk[4], I, D), "up": lin(kk[5], I, D),
                "down": lin(kk[6], D, I)} if spec.v25 else
               {"fc1": lin(kk[4], I, D), "fc2": lin(kk[5], D, I)})
        blocks.append({
            "ln1": norm(D), "ln2": norm(D),
            "attn": {c: lin(kk[j], D, D) for j, c in enumerate(
                ("q", "k", "v", "o"))},
            "mlp": mlp,
        })
    mdim = spec.merge_unit * D
    return {
        "patch_embed": lin(ks[-1], D, pdim, bias=False),
        "blocks": blocks,
        "merger": {"ln_q": norm(D), "fc1": lin(ks[-2], mdim, mdim),
                   "fc2": lin(ks[-3], spec.out_hidden, mdim)},
    }


# ---------------------------------------------------------------------------
# GLM-4V / GLM-4.1V (reference llmc/models/glm4v.py)
# ---------------------------------------------------------------------------

@MODEL_REGISTRY
class Glm4vVisionTower(QwenVLVisionTower):
    """GLM-4V tower = Qwen2.5-style blocks (RMSNorm, gated SiLU MLP, 2D
    rope) with NO window attention, plus: post-conv RMSNorm, interpolated
    absolute position embeddings, post RMSNorm, a 2x2 conv downsample to
    the LLM width, and a gated-MLP merger (modeling_glm4v.py:678-790)."""

    def _rope_and_masks(self):
        cos, sin = _vision_rope(self.spec, self._grid)
        return cos, sin, None, None, None

    def _abs_pos(self) -> Array:
        """Bicubic-interpolated absolute positions; at the native grid the
        cubic kernel is exact at sample points, so this reduces to a gather
        in (h, w) patch order (then merge-group reordered)."""
        p = self.params
        pe = p["pos_embed"]  # (n_pos, D)
        orig = int(round(pe.shape[0] ** 0.5))
        t, h, w = self._grid
        pos = _vision_pos_ids(self.spec, self._grid)  # (S, 2) merge order
        if (h, w) == (orig, orig):
            idx = pos[:, 0] * orig + pos[:, 1]
            return pe[jnp.asarray(idx)]
        # non-native grids: bicubic resize of the 2D table, then gather
        grid2d = pe.reshape(orig, orig, -1)
        resized = jax.image.resize(grid2d, (h, w, pe.shape[-1]), "cubic")
        idx = pos[:, 0] * w + pos[:, 1]
        return resized.reshape(h * w, -1)[jnp.asarray(idx)]

    def forward_features(self, patches: Array,
                         linear_fns: Optional[List] = None) -> Array:
        spec = self.spec
        p = self.params
        x = A.default_linear("patch", p["patch_embed"]["weight"],
                             p["patch_embed"].get("bias"), patches)
        x = A.rmsnorm(x, p["post_conv_ln"]["weight"], 1e-5)
        x = x + self._abs_pos().astype(x.dtype)
        for idx, bp in enumerate(p["blocks"]):
            if idx in self.token_hooks:
                x = self.token_hooks[idx](self, idx, x)
            lf = (linear_fns[idx] if linear_fns is not None
                  else (self.linear_fns[idx] if self.linear_fns else None))
            y, _, _ = self.block_forward(idx, x[None], linear_fn=lf,
                                         block_params=bp)
            x = y[0]
        x = A.rmsnorm(x, p["post_ln"]["weight"], 1e-5)
        # 2x2 conv downsample over each merge group == linear on the
        # flattened (2, 2, D) neighborhood
        ds = p["downsample"]
        x = x.reshape(-1, spec.merge_unit * spec.embed_dim)
        x = A.default_linear("downsample", ds["weight"], ds.get("bias"), x)
        # merger: proj -> LayerNorm -> GELU -> gated SiLU MLP
        mg = p["merger"]
        x = A.default_linear("merger.proj", mg["proj"]["weight"],
                             mg["proj"].get("bias"), x)
        pn = mg["post_norm"]
        x = jax.nn.gelu(A.layernorm(x, pn["weight"], pn.get("bias"), 1e-5),
                        approximate=False)
        g = A.default_linear("merger.gate", mg["gate"]["weight"],
                             mg["gate"].get("bias"), x)
        u = A.default_linear("merger.up", mg["up"]["weight"],
                             mg["up"].get("bias"), x)
        return A.default_linear("merger.down", mg["down"]["weight"],
                                mg["down"].get("bias"), jax.nn.silu(g) * u)


@MODEL_REGISTRY.register("GLM4V")
@MODEL_REGISTRY
class Glm4VL(Qwen2VL):
    """GLM-4V composite: Glm4vVisionTower + GLM-4 LM with M-RoPE over the
    GLM half-dim interleaved rope (apply_multimodal_rotary_pos_emb,
    modeling_glm4v.py:433-480 — sections split the rotary table, then the
    GLM convention truncates to d/2 and repeat-interleaves)."""

    def _lm_forward(self, x: Array, pos_ids_3d: Array) -> Array:
        arch = self.language.arch
        cos, sin = merge_mrope(arch, pos_ids_3d, self.mrope_section)
        T = x.shape[1]
        mask = A.causal_mask(T, T)
        lfs = self.language.linear_fns
        for idx, bp in enumerate(self.language.params["blocks"]):
            lf = lfs[idx] if lfs is not None else None
            x, _, _ = A.block_forward(arch, bp, x, cos, sin, mask,
                                      linear_fn=lf or A.default_linear)
        return A.head_forward(arch, self.language.params, x)
