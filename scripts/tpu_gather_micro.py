#!/usr/bin/env python
"""Microbench point-sampling formulations on TPU: which gather lowering
is fast for ~50k scattered point reads from a [C, H, W] image stack."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args):
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    out = compiled(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(8):
            out = compiled(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 8)
    ms = float(np.median(ts)) * 1e3
    mb = cost.get("bytes accessed", 0.0) / 1e6
    print(f"{name:<42} {ms:8.3f} ms  {mb:10.1f} MB", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    c, h, w = 4, 576, 768
    n = 12288
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(c, h, w).astype(np.float32))
    yi = jnp.asarray(rng.randint(0, h, (c, n)).astype(np.int32))
    xi = jnp.asarray(rng.randint(0, w, (c, n)).astype(np.int32))

    timed("vmapped 2D adv-index img[y, x]",
          lambda im, y, x: jax.vmap(lambda i2, y2, x2: i2[y2, x2])(im, y, x),
          img, yi, xi)
    timed("global flat 1D take",
          lambda im, y, x: jnp.take(
              im.reshape(-1),
              (jnp.arange(c, dtype=jnp.int32)[:, None] * (h * w)
               + y * w + x).reshape(-1)).reshape(c, n),
          img, yi, xi)
    timed("global flat dyn-slice loop-free take unique",
          lambda im, y, x: im.reshape(-1)[
              (jnp.arange(c, dtype=jnp.int32)[:, None] * (h * w)
               + y * w + x).reshape(-1)].reshape(c, n),
          img, yi, xi)
    # one-hot matmul on the MXU: [N, HW_block] is too big; instead do
    # two-stage: row pick via bf16 matmul [N, H] x [H, W], then col pick
    def two_matmul(im, y, x):
        def per_cam(i2, y2, x2):
            oy = (y2[:, None] == jnp.arange(h)[None, :]).astype(jnp.bfloat16)
            rows = jax.lax.dot(oy, i2.astype(jnp.bfloat16))   # [N, W]
            ox = (x2[:, None] == jnp.arange(w)[None, :])
            return jnp.sum(jnp.where(ox, rows.astype(jnp.float32), 0.0), -1)
        return jax.vmap(per_cam)(im, y, x)
    timed("one-hot bf16 matmul rows + mask cols", two_matmul, img, yi, xi)

    # sort-based: sort indices, contiguous segments... just measure sorted take
    timed("global flat take, SORTED indices",
          lambda im, y, x: jnp.take(
              im.reshape(-1),
              jnp.sort((jnp.arange(c, dtype=jnp.int32)[:, None] * (h * w)
                        + y * w + x).reshape(-1))).reshape(c, n),
          img, yi, xi)


if __name__ == "__main__":
    main()
