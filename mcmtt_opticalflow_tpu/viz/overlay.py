"""Host-side result visualisation (numpy, no GUI dependency).

Covers the reference's Visualize path: per-camera overlays of detections /
tracklet boxes / reprojected 3D tracks, 2x2 frame tiling, and a top-view
trajectory rendering (ref psn_where/PSNWhere.cpp:301-477, drawing helpers
PSNWhere_Utils.cpp:647-892).  Output frames are float RGB arrays; save_ppm
writes them without external imaging libraries.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from mcmtt_opticalflow_tpu.utils.colors import generate_colors


def draw_box(img: np.ndarray, box, color, thickness: int = 1) -> None:
    """In-place rectangle on [H, W, 3] image; box = (x, y, w, h)."""
    h, w, _ = img.shape
    x0, y0 = int(max(box[0], 0)), int(max(box[1], 0))
    x1 = int(min(box[0] + box[2], w - 1))
    y1 = int(min(box[1] + box[3], h - 1))
    if x1 <= x0 or y1 <= y0:
        return
    t = thickness
    img[y0:y0 + t, x0:x1] = color
    img[max(y1 - t, 0):y1, x0:x1] = color
    img[y0:y1, x0:x0 + t] = color
    img[y0:y1, max(x1 - t, 0):x1] = color


def draw_overlay(frame: np.ndarray, boxes, ids,
                 colors: Optional[np.ndarray] = None) -> np.ndarray:
    """Copy of frame with id-coloured boxes."""
    out = np.asarray(frame).copy()
    if colors is None:
        colors = generate_colors(256)
    for box, i in zip(boxes, ids):
        draw_box(out, box, colors[int(i) % len(colors)])
    return out


def draw_top_view(points_by_frame: Sequence[np.ndarray],
                  ids_by_frame: Sequence[Sequence[int]],
                  extent: float = 8000.0, size: int = 512,
                  trail: int = 40) -> np.ndarray:
    """Ground-plane trajectory rendering (ref SHOW_TOPVIEW path,
    PSNWhere.cpp:301-477); keeps the last `trail` frames like
    DISP_TRAJECTORY3D_LENGTH (ref PSNWhere_Defines.h:76)."""
    img = np.full((size, size, 3), 0.1, np.float32)
    colors = generate_colors(256)
    start = max(0, len(points_by_frame) - trail)
    for t in range(start, len(points_by_frame)):
        fade = 0.3 + 0.7 * (t - start + 1) / (len(points_by_frame) - start)
        for p, i in zip(points_by_frame[t], ids_by_frame[t]):
            u = int((p[0] / extent * 0.5 + 0.5) * (size - 1))
            v = int((p[1] / extent * 0.5 + 0.5) * (size - 1))
            if 0 <= u < size and 0 <= v < size:
                img[max(v - 1, 0):v + 2, max(u - 1, 0):u + 2] = \
                    colors[int(i) % 256] * fade
    return img


def tile_frames(frames: Sequence[np.ndarray], cols: int = 2) -> np.ndarray:
    """2x2-style tiling of camera views (ref PSNWhere.cpp display tiling)."""
    frames = [np.asarray(f) for f in frames]
    h, w, c = frames[0].shape
    rows = (len(frames) + cols - 1) // cols
    out = np.zeros((rows * h, cols * w, c), frames[0].dtype)
    for i, f in enumerate(frames):
        r, cc = divmod(i, cols)
        out[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = f
    return out


def save_ppm(path: str, img: np.ndarray) -> None:
    """Write a float [0,1] RGB image as binary PPM (no deps)."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.tobytes())
