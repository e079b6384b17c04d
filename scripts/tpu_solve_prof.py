#!/usr/bin/env python
"""Honest wall-clock of the fused rescore+compat+solve program at bench
shapes (rescore bucket 512, graph 1024, K=30, 150 iters), split into:

  noup   inputs resident on device (exec + 2-leaf download only)
  full   fresh f16/bool uploads every call (adds the ~620 KB upload)

Chaining: each call's key derives from the previous call's output sum,
so calls serialize; np.asarray on both leaves forces completion.

Run: python scripts/tpu_solve_prof.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from mcmtt_opticalflow_tpu.config import (Associator3DConfig, EngineConfig,
                                          SolverConfig, Tracker2DConfig)
from mcmtt_opticalflow_tpu.data import make_scenario
from mcmtt_opticalflow_tpu.models.associator3d import Associator3D

REPS = 8
NR, NB, K = 512, 1024, 30


def main():
    unroll = int(os.environ.get("SOLVE_UNROLL", "1"))
    nb = int(os.environ.get("SOLVE_NB", str(NB)))
    nr = int(os.environ.get("SOLVE_NR", str(NR)))
    iters = int(os.environ.get("SOLVE_ITERS", "150"))
    cfg = EngineConfig(
        num_cameras=4, image_width=768, image_height=576,
        tracker2d=Tracker2DConfig(max_detections=48, max_trackers=64,
                                  max_features=36),
        assoc3d=Associator3DConfig(k_best_size=K),
        solver=SolverConfig(num_replicas=8, max_vertices=nb,
                            max_iterations=iters, unroll=unroll))
    sc = make_scenario(num_cameras=4, num_frames=2, num_people=5,
                       image_size=(768, 576), arena=9000.0, seed=0)
    assoc = Associator3D(cfg, sc.cameras)
    w = assoc.win_rescore
    wg = assoc.win
    rng = np.random.RandomState(0)
    c = 4
    vmax = nb

    host = dict(
        pts=rng.randn(nr, w, 3).astype(np.float16),
        raws=rng.randn(nr, w, c, 3).astype(np.float16),
        rmask=rng.rand(nr, w, c) > 0.3,
        merr=np.abs(rng.randn(nr, w)).astype(np.float16),
        lens=np.full((nr,), w, np.int32),
        row_map=np.arange(vmax, dtype=np.int32) % nr,
        host_base=rng.randn(vmax).astype(np.float32),
        tree_ids=(np.arange(vmax) // 2).astype(np.int32),
        shared=np.packbits(np.zeros((nb, nb), bool), axis=1),
        pos_grid=rng.randn(nb, wg, 3).astype(np.float16),
        have=np.ones((nb, wg), bool),
        pvalid=np.ones((nb,), bool),
        init_masks=rng.rand(K, vmax) > 0.9,
    )
    dev = {k: jnp.asarray(v) for k, v in host.items()}
    key = jax.random.PRNGKey(0)

    def call(d, key):
        return assoc._rescore_and_solve(
            d["pts"], d["raws"], d["rmask"], d["merr"], d["lens"],
            assoc.cams, d["row_map"], d["host_base"], d["tree_ids"],
            d["shared"], d["pos_grid"], d["have"], d["pvalid"],
            d["init_masks"], key, iters)

    for mode in ("noup", "full"):
        np.asarray(call(dev, key))           # compile + settle
        ts = []
        chain = 0
        for i in range(REPS):
            t0 = time.perf_counter()
            if mode == "full":
                d = {k: jnp.asarray(v) for k, v in host.items()}
            else:
                d = dev
            k2 = jax.random.fold_in(key, chain)
            an = np.asarray(call(d, k2))
            chain = int(abs(float(an[0])) * 0 + i)
            ts.append(time.perf_counter() - t0)
        print(f"{mode:5s} median={1e3 * np.median(ts):7.1f} ms  "
              f"all={[round(1e3 * x, 1) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
