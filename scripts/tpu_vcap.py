#!/usr/bin/env python
"""Solver graph-capacity scaling on the real chip (VERDICT r3 #6).

Measures the fused rescore+compat+solve program's device time at
max_vertices V in {512, 1024, 2048} with chained dependent executions
(async dispatch cannot fake completion).  The BLS while-loop is
latency-bound — the per-move matvec is tiny — so V growth should be
near-free until the [V, V] adjacency matmuls dominate.  The result picks
the bench's V (reference budget: 2000 tracks, Associator3D.cpp:23 +
GraphSolver.cpp:530-553).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from mcmtt_opticalflow_tpu.config import (Associator3DConfig,
                                              EngineConfig, SolverConfig,
                                              Tracker2DConfig)
    from mcmtt_opticalflow_tpu.data import make_scenario
    from mcmtt_opticalflow_tpu.models.associator3d import Associator3D

    sc = make_scenario(num_cameras=4, num_frames=3, num_people=22,
                      image_size=(768, 576), arena=9000.0, seed=0)
    rows = []
    for vmax in (512, 1024, 2048):
        cfg = EngineConfig(
            num_cameras=4, image_width=768, image_height=576,
            tracker2d=Tracker2DConfig(max_detections=48, max_trackers=64),
            assoc3d=Associator3DConfig(k_best_size=30),
            solver=SolverConfig(num_replicas=8, max_vertices=vmax,
                                max_iterations=150))
        assoc = Associator3D(cfg, sc.cameras)
        w, c = assoc.win, 4
        nres = 512
        rng = np.random.RandomState(0)
        nb = vmax
        shared = np.zeros((nb, nb), bool)
        args = (
            jnp.asarray(rng.randn(nres, assoc.win_rescore, 3)
                        .astype(np.float16) * 1000),
            jnp.asarray(rng.randn(nres, assoc.win_rescore, c, 3)
                        .astype(np.float16) * 1000),
            jnp.asarray(rng.rand(nres, assoc.win_rescore, c) < 0.7),
            jnp.asarray(np.abs(rng.randn(nres, assoc.win_rescore))
                        .astype(np.float16) * 50),
            jnp.asarray(rng.randint(2, assoc.win_rescore + 1, nres)
                        .astype(np.int32)),
            assoc.cams,
            jnp.asarray((np.arange(vmax) % nres).astype(np.int32)),
            jnp.asarray(rng.rand(vmax).astype(np.float32) * -5),
            jnp.asarray((np.arange(nb) // 3).astype(np.int32)),
            jnp.asarray(np.packbits(shared, axis=1)),
            jnp.asarray(rng.randn(nb, w, 3).astype(np.float16) * 1000),
            jnp.asarray(rng.rand(nb, w) < 0.8),
            jnp.ones((nb,), bool),
            jnp.zeros((30, vmax), bool),
            jax.random.PRNGKey(0),
        )
        print(f"V={vmax}: compiling...", flush=True)
        t0 = time.perf_counter()
        out = assoc._rescore_and_solve(*args, iters=150)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0

        def step(prev):
            a = list(args)
            if prev is not None:
                a[7] = a[7] + (prev[2][0] % 7).astype(jnp.float32) * 1e-6
            return assoc._rescore_and_solve(*a, iters=150)

        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            y = None
            for _ in range(4):
                y = step(y)
            jax.block_until_ready(y)
            ts.append((time.perf_counter() - t0) / 4)
        ms = float(np.median(ts)) * 1e3
        print(f"V={vmax}: {ms:.2f} ms/solve (compile {compile_s:.0f}s)",
              flush=True)
        rows.append(dict(vmax=vmax, ms=round(ms, 2),
                         compile_s=round(compile_s, 1)))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
