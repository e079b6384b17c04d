"""RGB appearance histograms from fixed-lattice box samples.

The reference crops each tracklet's detection box and histograms each colour
channel into 16 bins, concatenated [R; G; B] and normalised by pixel count
(ref psn_where/PSNWhere_Associator3D.cpp:2542-2556, psn::histogram
PSNWhere_Utils.cpp:445-460).  Variable-size crops are hostile to static
shapes, so we sample a fixed PxP lattice inside the box — the histogram of a
uniform sample converges to the crop histogram and keeps every box the same
shape, letting all boxes of all cameras batch in one call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_bins", "patch"))
def rgb_histogram(img: jnp.ndarray,
                  boxes: jnp.ndarray,
                  num_bins: int = 16,
                  patch: int = 16) -> jnp.ndarray:
    """Normalised concatenated RGB histogram per box.

    Args:
      img:   [H, W, 3] float image in [0, 1] (channel order R, G, B).
      boxes: [B, 4] (x, y, w, h).

    Returns [B, 3*num_bins] float histogram, rows ordered R, G, B to match
    the reference's vconcat(R, G, B) layout.
    """
    h, w, _ = img.shape
    b = boxes.shape[0]
    lin = (jnp.arange(patch, dtype=img.dtype) + 0.5) / patch
    gx, gy = jnp.meshgrid(lin, lin)
    lattice = jnp.stack([gx, gy], -1).reshape(-1, 2)         # [P*P, 2]
    xy = boxes[:, None, 0:2] + lattice[None] * boxes[:, None, 2:4]
    xi = jnp.clip(xy[..., 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(xy[..., 1].astype(jnp.int32), 0, h - 1)
    px = img[yi, xi]                                         # [B, P*P, 3]
    bins = jnp.clip((px * num_bins).astype(jnp.int32), 0, num_bins - 1)
    one_hot = jax.nn.one_hot(bins, num_bins, dtype=img.dtype)  # [B,P*P,3,bins]
    hist = jnp.sum(one_hot, axis=1)                          # [B, 3, bins]
    hist = hist / (patch * patch)
    return hist.reshape(b, 3 * num_bins)


def rgb_cost(feat1: jnp.ndarray, feat2: jnp.ndarray, time_gap,
             min_dist: float = 0.2, coef: float = 100.0,
             decay: float = 0.1) -> jnp.ndarray:
    """Appearance cost between two histogram features (batched)
    (ref ComputeRGBCost, PSNWhere_Associator3D.cpp:2394-2400)."""
    diff = feat1 - feat2
    norm2 = jnp.sum(diff * diff, axis=-1)
    gap = jnp.asarray(time_gap, norm2.dtype)
    scale = coef * jnp.exp(-decay * (gap - 1.0))
    return jnp.where(norm2 > min_dist, scale * (norm2 - min_dist), 0.0)
