"""Attention / kept-patch visualizers.

Functional analogues of the reference's llmc/utils/visualizer.py
(visualize_heads / visualize_grid_to_grid / visualize_kept_patches) used by
the token-reduction ``Visualizer`` module and tools/attention_vis.py.
Inputs are JAX/NumPy arrays; figures are written as PNG (Agg backend — the
sandbox has no display).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _to_img(image: np.ndarray) -> np.ndarray:
    """(C,H,W) or (H,W,C) float/uint8 -> (H,W,C) float in [0,1]."""
    img = np.asarray(image)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = np.transpose(img, (1, 2, 0))
    img = img.astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    lo, hi = img.min(), img.max()
    if hi > 1.0 or lo < 0.0:
        img = (img - lo) / max(hi - lo, 1e-8)
    return img


def visualize_heads(attn: np.ndarray, cols: int = 4,
                    save_path: str = "attn_heads.png") -> str:
    """Grid of per-head attention maps.

    attn: (B, n_heads, T, T) or (n_heads, T, T) — first batch element used.
    """
    plt = _plt()
    a = np.asarray(attn, dtype=np.float32)
    if a.ndim == 4:
        a = a[0]
    n = a.shape[0]
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_1d(axes).reshape(rows, cols)
    for i in range(rows * cols):
        ax = axes[i // cols, i % cols]
        ax.axis("off")
        if i < n:
            ax.imshow(a[i], cmap="viridis")
            ax.set_title(f"head {i}", fontsize=8)
    fig.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def visualize_grid_to_grid(attn: np.ndarray, token_idx: int,
                           image: np.ndarray, grid_size: int = 24,
                           alpha: float = 0.6,
                           save_path: str = "attn_grid.png") -> str:
    """Overlay one token's attention distribution on the source image.

    attn: (T, T) single-head/averaged map over the visual tokens.
    token_idx: query token whose attention row is shown.
    """
    plt = _plt()
    a = np.asarray(attn, dtype=np.float32)
    row = a[token_idx]
    n = grid_size * grid_size
    row = row[:n] if row.shape[0] >= n else np.pad(row, (0, n - row.shape[0]))
    heat = row.reshape(grid_size, grid_size)
    img = _to_img(image)
    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    axes[0].imshow(img)
    axes[0].set_title("image")
    axes[0].axis("off")
    axes[1].imshow(img)
    h, w = img.shape[:2]
    heat_up = np.kron(heat, np.ones((h // grid_size + 1, w // grid_size + 1)))
    axes[1].imshow(heat_up[:h, :w], cmap="jet", alpha=alpha)
    axes[1].set_title(f"attn of token {token_idx}")
    axes[1].axis("off")
    fig.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def visualize_kept_patches(image: np.ndarray, keep_idx: Sequence[int],
                           grid_size: Optional[int] = None,
                           save_path: str = "kept_patches.png") -> str:
    """Darken pruned patches, keep retained ones bright (token-reduction
    debugging — which vision tokens survived)."""
    plt = _plt()
    img = _to_img(image)
    h, w = img.shape[:2]
    keep_idx = np.asarray(list(keep_idx), dtype=np.int64).reshape(-1)
    if grid_size is None:
        g = 1
        while (g + 1) * (g + 1) <= int(keep_idx.max(initial=0)) + 1:
            g += 1
        grid_size = max(g, 1)
    mask = np.zeros(grid_size * grid_size, dtype=np.float32)
    valid = keep_idx[(keep_idx >= 0) & (keep_idx < mask.size)]
    mask[valid] = 1.0
    mask = mask.reshape(grid_size, grid_size)
    mask_up = np.kron(mask, np.ones((h // grid_size + 1, w // grid_size + 1)))
    mask_up = mask_up[:h, :w, None]
    shaded = img * (0.25 + 0.75 * mask_up)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(shaded)
    ax.set_title(f"kept {int(mask.sum())}/{mask.size} patches")
    ax.axis("off")
    fig.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path
