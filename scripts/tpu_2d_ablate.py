#!/usr/bin/env python
"""Ablate the 2D step's sub-programs to locate its ~130 ms exec time.

Each candidate sub-program runs chained (output feeds next input where
possible) with a forcing np.asarray fetch per iteration; reported number
is median wall-clock minus the fetch-only floor.

Run: python scripts/tpu_2d_ablate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from mcmtt_opticalflow_tpu.config import Tracker2DConfig
from mcmtt_opticalflow_tpu.ops.features import detect_grid_features
from mcmtt_opticalflow_tpu.ops.hungarian import solve_assignment
from mcmtt_opticalflow_tpu.ops.lk import lk_track_pyramid
from mcmtt_opticalflow_tpu.ops.pyramid import build_pyramid

H, W = 576, 768
C, D, T, F = 4, 48, 64, 36
REPS = 8


def timed(name, fn, *args):
    # 2 warmup (compile), then REPS chained timings
    for _ in range(2):
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = fn(*args)
        # force: materialize first leaf fully
        np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} median={1e3 * np.median(ts):8.1f} ms  "
          f"all={[round(1e3 * x, 1) for x in ts]}", flush=True)


def main():
    rng = np.random.RandomState(0)
    gray = jnp.asarray(rng.rand(C, H, W).astype(np.float32))
    gray2 = jnp.asarray(rng.rand(C, H, W).astype(np.float32))
    pts = jnp.asarray((rng.rand(C, D * F, 2)
                       * np.asarray([W - 40, H - 40]) + 20)
                      .astype(np.float32))
    act = jnp.asarray(np.ones((C, D * F), bool))
    boxes = jnp.asarray(
        np.concatenate([rng.rand(C, D, 2) * [[W - 80, H - 120]],
                        40 + rng.rand(C, D, 2) * [[40, 80]]], -1)
        .astype(np.float32))
    bmask = jnp.asarray(np.ones((C, D), bool))
    cost = jnp.asarray(rng.rand(C, D, T).astype(np.float32))
    rvalid = jnp.asarray(np.ones((C, D), bool))
    cvalid = jnp.asarray(np.ones((C, T), bool))

    # tiny fetch floor
    tinyf = jax.jit(lambda x: jnp.sum(x, axis=(1, 2)))
    timed("fetch-floor (sum)", tinyf, gray)

    lk1 = jax.vmap(lambda a, b, p, m: lk_track_pyramid(
        a, b, p, levels=2, window=16, iterations=8, active=m))
    lk1 = jax.jit(lk1)
    timed("lk_pyramid x1 (l2 i8)", lk1, gray, gray2, pts, act)

    def lk4(a, b, p, m):
        outs = []
        for _ in range(4):
            t, s, r = jax.vmap(lambda x, y, q, mm: lk_track_pyramid(
                x, y, q, levels=2, window=16, iterations=8,
                active=mm))(a, b, p, m)
            p = t
            outs.append(s)
        return t, outs
    timed("lk_pyramid x4 chained", jax.jit(lk4), gray, gray2, pts, act)

    pyr = jax.jit(jax.vmap(lambda g: build_pyramid(g, 2)[1]))
    timed("build_pyramid x1", pyr, gray)

    feats = jax.jit(jax.vmap(lambda g, b, m: detect_grid_features(
        g, b, m, grid=6, sub=2, quality=0.01)))
    timed("detect_grid_features", feats, gray, boxes, bmask)

    asn = jax.jit(jax.vmap(solve_assignment))
    timed("solve_assignment 48x64", asn, cost, rvalid, cvalid)


if __name__ == "__main__":
    main()
