"""Visualization utilities (reference: ``utils/visualization.py`` +
``cmdise.py:238-305`` training-vis grids).

Host-side only (matplotlib stays off the device path): palette colorization,
subplot grids of images / colorized predictions / heatmaps, saved as the
per-iteration PNG grids the reference emits every ``vis_period``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

CITYSCAPES_PALETTE = [
    128, 64, 128, 244, 35, 232, 70, 70, 70, 102, 102, 156, 190, 153, 153,
    153, 153, 153, 250, 170, 30, 220, 220, 0, 107, 142, 35, 152, 251, 152,
    70, 130, 180, 220, 20, 60, 255, 0, 0, 0, 0, 142, 0, 0, 70,
    0, 60, 100, 0, 80, 100, 0, 0, 230, 119, 11, 32,
]


def colorize_mask(mask: np.ndarray, palette: Sequence[int]) -> np.ndarray:
    """[H, W] int ids -> [H, W, 3] uint8 palette colors (255 -> black)."""
    table = np.zeros((256, 3), np.uint8)
    flat = np.asarray(palette, np.uint8).reshape(-1, 3)
    table[: flat.shape[0]] = flat
    return table[np.clip(mask, 0, 255)]


def attention_overlay(attn: np.ndarray, image: np.ndarray) -> np.ndarray:
    """Jet-colormap attention heatmap blended onto the image (reference
    ``show_cam_on_image`` / ``show_image_attention_maps``,
    ``utils/visualization.py:92-118`` — cv2.applyColorMap(JET) replaced by
    matplotlib's jet colormap).

    attn: [h, w] (any resolution); image: [H, W, 3] in [0, 1].
    Returns [H, W, 3] float in [0, 1]."""
    from matplotlib import cm
    from PIL import Image as PILImage

    h, w = image.shape[:2]
    a = np.asarray(attn, np.float32)
    a = np.asarray(
        PILImage.fromarray(a).resize((w, h), PILImage.BILINEAR), np.float32
    )
    img = np.asarray(image, np.float32)
    rng = img.max() - img.min()
    img = (img - img.min()) / (rng if rng > 0 else 1.0)
    heat = cm.jet(np.clip(a, 0.0, 1.0))[..., :3].astype(np.float32)
    cam = heat + img
    return cam / max(cam.max(), 1e-6)


def save_vis_grid(
    vis_data: List[Dict],
    save_path: str,
    iter_index: int,
    palette: Sequence[int],
    max_cols: int = 5,
    rank: int = 0,
) -> Optional[str]:
    """Save a prediction grid like the reference's ``vis_results``.

    vis_data entries: {'data_type': 'image'|'logits'|'label'|'heatmap'|
    'attention_maps', 'info': str, 'data': np [B,H,W,C] / [B,H,W]};
    'attention_maps' entries also carry 'image' [B,H,W,3] to overlay onto
    (reference ``cmdise.py:238-305`` + ``utils/visualization.py:44-118``).
    Returns the written path, or None when matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None

    batch = vis_data[0]["data"].shape[0]
    n = len(vis_data)
    cols = min(max_cols, n)
    rows_per_sample = -(-n // cols)
    rows = batch * rows_per_sample
    fig, axs = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    for i, item in enumerate(vis_data):
        for j in range(batch):
            r = j * rows_per_sample + i // cols
            c = i % cols
            ax = axs[r][c]
            d = np.asarray(item["data"][j])
            if item["data_type"] == "image":
                ax.imshow(np.clip(d, 0, 1))
            elif item["data_type"] == "logits":
                ax.imshow(colorize_mask(d.argmax(-1), palette))
            elif item["data_type"] == "label":
                ax.imshow(colorize_mask(d.astype(np.int32), palette))
            elif item["data_type"] == "attention_maps":
                ax.imshow(attention_overlay(d, np.asarray(item["image"][j])))
            else:  # heatmap — jet like the reference's cv2.COLORMAP_JET
                ax.imshow(d, cmap="jet")
            ax.set_title(item["info"], fontsize=8)
    for ax in axs.flat:
        ax.axis("off")
    out_dir = os.path.join(save_path, "vis_results")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{iter_index:06d}_rank{rank}.png")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path
