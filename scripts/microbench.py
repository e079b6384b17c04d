#!/usr/bin/env python
"""Per-device-program microbenchmark at bench.py's steady-state shapes.

Times each jitted program in isolation (post-warmup medians) so host
bookkeeping and device compute can be attributed separately.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, n=10):
    fn(*args)  # warm
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} med={np.median(ts)*1e3:8.2f}ms "
          f"min={min(ts)*1e3:8.2f}ms")


def main():
    from mcmtt_opticalflow_tpu.config import (EngineConfig, Tracker2DConfig,
                                              SolverConfig)
    from mcmtt_opticalflow_tpu.data import make_scenario
    from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine
    from mcmtt_opticalflow_tpu.models.mwcp import solve_mwcp_batch

    sc = make_scenario(num_cameras=4, num_frames=6, num_people=6,
                       image_size=(768, 576), arena=6000.0, seed=0)
    cfg = EngineConfig(
        num_cameras=4, image_width=768, image_height=576,
        tracker2d=Tracker2DConfig(lk_pyramid_levels=2, lk_iterations=8),
        solver=SolverConfig(num_replicas=8, max_vertices=256,
                            max_iterations=300, solve_batch=8),
    )
    eng = TrackingEngine(cfg, sc.cameras, pipelined=False)
    frames = [(np.clip(np.stack(sc.frames(t)), 0, 1) * 255 + 0.5)
              .astype(np.uint8) for t in range(6)]
    for t in range(6):
        eng.process_frame(frames[t], sc.detections[t], frame_idx=t)

    a = eng.assoc
    rgb = jnp.asarray(frames[5])
    gray = eng._to_gray(rgb)
    boxes, mask = eng._pad_detections(sc.detections[5])

    # --- 2D step (full chain) ---
    def step2d(g):
        st, out = eng.step2d(eng.state2d, g, jnp.asarray(boxes),
                             jnp.asarray(mask), eng.cams, jnp.int32(5))
        return out.boxes
    bench("step2d", step2d, gray)

    # --- ingest ---
    bx = jnp.zeros((4, 64, 4), jnp.float32)
    mk = jnp.ones((4, 64), bool)
    bench("ingest", a._ingest, bx, mk, rgb)

    # --- all-pair distance ---
    at = jnp.zeros((4, 16, 3)); ab = jnp.ones((4, 16, 3))
    nt = jnp.zeros((4, 8, 3)); nb = jnp.ones((4, 8, 3))
    bench("all_pair_distance", a._all_pair_distance, at, ab, nt, nb)

    # --- score_windows at branch-candidate scale ---
    w = a.win
    for nb_ in (32, 128):
        pts = jnp.zeros((nb_, w, 3))
        raws = jnp.zeros((nb_, w, 4, 3))
        rm = jnp.ones((nb_, w, 4), bool)
        me = jnp.full((nb_, w), 500.0)
        ln = jnp.full((nb_,), w, jnp.int32)
        bench(f"score_windows[{nb_}]", a._score_windows, pts, raws, rm,
              me, ln)

    # --- compat matrix ---
    for nb_ in (64, 256):
        tree_ids = jnp.arange(nb_, dtype=jnp.int32)
        shared = jnp.zeros((nb_, nb_), bool)
        wp = jnp.zeros((nb_, w, 3), jnp.float32)
        hv = jnp.ones((nb_, w), bool)
        vd = jnp.ones((nb_,), bool)
        bench(f"compat[{nb_}]", a._compat_matrix, tree_ids, shared, wp, hv,
              vd)

    # --- solver ---
    kb, v = cfg.solver.solve_batch, cfg.solver.max_vertices
    wts = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (kb, v)))
    adj = jax.random.bernoulli(jax.random.PRNGKey(1), 0.5, (kb, v, v))
    adj = adj & adj.transpose(0, 2, 1) & ~jnp.eye(v, dtype=bool)[None]
    vld = jnp.ones((kb, v), bool)
    ini = jnp.zeros((kb, v), bool)
    keys = jax.random.split(jax.random.PRNGKey(2), kb)
    for iters in (100, 300):
        bench(f"solver[{iters}it]",
              lambda w_, a_, v_, i_, k_, it=iters: solve_mwcp_batch(
                  w_, a_, v_, i_, k_, cfg.solver, it),
              wts, adj, vld, ini, keys, n=5)

    # --- upload ---
    f = frames[5]
    bench("upload_u8", lambda x: jnp.asarray(x).block_until_ready(), f)


if __name__ == "__main__":
    main()
