#!/usr/bin/env python
"""Bisect the 2D tracker step's device time + XLA-visible HBM bytes into
its sub-programs (VERDICT r3 #5: the step moves ~25 GB/frame through HBM
at 60% of peak; find which glue materializes it)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args):
    import jax
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    out = compiled(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(4):
            out = compiled(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 4)
    ms = float(np.median(ts)) * 1e3
    mb = cost.get("bytes accessed", 0.0) / 1e6
    gf = cost.get("flops", 0.0) / 1e9
    print(f"{name:<34} {ms:8.2f} ms  {mb:10.1f} MB  {gf:8.2f} GF", flush=True)
    return ms, mb


def main():
    import jax
    import jax.numpy as jnp
    from mcmtt_opticalflow_tpu.config import Tracker2DConfig, EngineConfig
    from mcmtt_opticalflow_tpu.data import make_scenario
    from mcmtt_opticalflow_tpu.models.tracker2d import (init_tracker2d_state,
                                                        make_tracker2d_step)
    from mcmtt_opticalflow_tpu.geometry.tsai import stack_cameras
    from mcmtt_opticalflow_tpu.ops.lk import lk_track_pyramid
    from mcmtt_opticalflow_tpu.ops.pyramid import build_pyramid
    from mcmtt_opticalflow_tpu.ops.features import (detect_grid_features,
                                                    shi_tomasi_response)

    t2 = Tracker2DConfig(lk_pyramid_levels=2, lk_iterations=8,
                         max_detections=48, max_trackers=64)
    sc = make_scenario(num_cameras=4, num_frames=3, num_people=22,
                       image_size=(768, 576), arena=9000.0, seed=0)
    cams = stack_cameras(sc.cameras)
    rng = np.random.RandomState(0)
    gray = jnp.asarray(np.stack(sc.frames(0)).mean(-1).astype(np.float32))
    gray2 = jnp.asarray(np.stack(sc.frames(1)).mean(-1).astype(np.float32))
    boxes = jnp.asarray(rng.rand(4, 48, 4).astype(np.float32) * 100 + 20)
    bmask = jnp.ones((4, 48), bool)

    # full step
    step = make_tracker2d_step(t2, multi_camera=True)
    state = init_tracker2d_state(t2, 576, 768, num_cameras=4)
    timed("full 2D step (4 cam)", lambda s, g, b, m, c: step(
        s, g, b, m, c, jnp.int32(0))[1].boxes, state, gray, boxes, bmask,
        cams)

    n = 48 * 64
    pts = jnp.asarray(rng.rand(4, n, 2).astype(np.float32)
                      * np.asarray([700, 500]) + 30)
    act = jnp.ones((4, n), bool)

    def one_lk(p, nx, pt, a):
        return jax.vmap(lambda pp, nn, tt, aa: lk_track_pyramid(
            pp, nn, tt, levels=2, window=t2.lk_window,
            iterations=8, active=aa)[0])(p, nx, pt, a)

    timed("lk_track_pyramid x1 (4cam, 3072f)", one_lk, gray, gray2, pts, act)

    timed("build_pyramid x2 (4cam)",
          lambda a, b2: (build_pyramid(a, 2)[1], build_pyramid(b2, 2)[1]),
          gray, gray2)
    timed("shi_tomasi_response (4cam)",
          lambda g: jax.vmap(shi_tomasi_response)(g), gray)
    timed("detect_grid_features (4cam)",
          lambda g, b, m: jax.vmap(
              lambda gg, bb, mm: detect_grid_features(gg, bb, mm, grid=8,
                                                      sub=2))(g, b, m),
          gray, boxes, bmask)


if __name__ == "__main__":
    main()
