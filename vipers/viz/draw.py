"""LOST visualizations: box overlays, degree/affinity maps, seed expansion.

Counterpart of `/root/reference/visualizations.py:24-145` (cv2-based) and
the drawing utilities in `/root/reference/torchvision_utils.py:155-255`,
rebuilt on PIL (no cv2 dependency).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw


def draw_boxes(
    image: np.ndarray,  # uint8 (H, W, 3)
    boxes: Sequence,  # iterable of xyxy
    colors: Optional[Sequence] = None,
    width: int = 3,
) -> np.ndarray:
    img = Image.fromarray(image.astype(np.uint8))
    d = ImageDraw.Draw(img)
    for i, box in enumerate(boxes):
        color = (colors[i] if colors else (255, 0, 0))
        d.rectangle([float(box[0]), float(box[1]), float(box[2]), float(box[3])],
                    outline=tuple(color), width=width)
    return np.asarray(img)


def visualize_predictions(image, pred, gt_boxes=None, seed_box=None, out_path=None):
    """Pred box (red) + optional GT (green) + seed patch (blue)
    (`visualizations.py:24-60`)."""
    boxes = [pred]
    colors = [(255, 0, 0)]
    if gt_boxes is not None:
        for g in np.asarray(gt_boxes).reshape(-1, 4):
            boxes.append(g)
            colors.append((0, 255, 0))
    if seed_box is not None:
        boxes.append(seed_box)
        colors.append((0, 0, 255))
    out = draw_boxes(image, boxes, colors)
    if out_path:
        Image.fromarray(out).save(out_path)
    return out


def _colormap(gray: np.ndarray) -> np.ndarray:
    """Normalize to [0,1] and apply a jet-like map, uint8 (H, W, 3)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm

    g = gray.astype(np.float64)
    g = (g - g.min()) / (g.max() - g.min() + 1e-12)
    return (cm.jet(g)[..., :3] * 255).astype(np.uint8)


def visualize_fms(A: np.ndarray, seed: int, scores: np.ndarray, dims, scales,
                  out_dir: str, im_name: str):
    """Degree map + seed-affinity map images (`visualizations.py:62-107`)."""
    os.makedirs(out_dir, exist_ok=True)
    gh, gw = dims
    deg = (-scores).reshape(gh, gw)
    Image.fromarray(_colormap(deg)).resize(
        (gw * int(scales[1]), gh * int(scales[0])), Image.NEAREST
    ).save(os.path.join(out_dir, f"{im_name}_degree.png"))
    aff = A[seed].reshape(gh, gw)
    Image.fromarray(_colormap(aff)).resize(
        (gw * int(scales[1]), gh * int(scales[0])), Image.NEAREST
    ).save(os.path.join(out_dir, f"{im_name}_seed_affinity.png"))


def visualize_seed_expansion(image, pred, seed: int, dims, scales, out_dir, im_name):
    """Seed patch box + final box (`visualizations.py:109-145`)."""
    os.makedirs(out_dir, exist_ok=True)
    gh, gw = dims
    r, c = seed // gw, seed % gw
    seed_box = [c * scales[1], r * scales[0], (c + 1) * scales[1], (r + 1) * scales[0]]
    out = visualize_predictions(image, pred, seed_box=seed_box)
    Image.fromarray(out).save(os.path.join(out_dir, f"{im_name}_seed_expansion.png"))


def save_lost_visualization(kind, image_path, pred, gt, A, scores, seed,
                            dims, scales, out_dir, im_name):
    """Dispatch used by the LOST driver (`main_lost.py:614-665`)."""
    image = np.asarray(Image.open(image_path).convert("RGB"))
    os.makedirs(out_dir, exist_ok=True)
    if kind == "pred":
        out = visualize_predictions(image, pred, gt_boxes=gt)
        Image.fromarray(out).save(os.path.join(out_dir, f"{im_name}_pred.png"))
    elif kind == "fms" and A is not None:
        visualize_fms(np.asarray(A), int(seed), np.asarray(scores), dims, scales,
                      out_dir, im_name)
    elif kind == "seed_expansion" and seed is not None:
        visualize_seed_expansion(image, pred, int(seed), dims, scales, out_dir, im_name)
