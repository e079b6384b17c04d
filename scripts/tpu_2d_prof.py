#!/usr/bin/env python
"""Honest wall-clock measurement of the 2D tracker step's tunnel
occupancy at bench config (4 cams, 768x576, 48 dets, 36 feats).

The axon runtime is fetch-driven (CLAUDE.md): block_until_ready lies, so
each iteration forces execution with np.asarray on an output leaf; the
carried state chains the steps so nothing overlaps.  Variants split the
cost into upload / exec / download:

  full    upload fresh gray every step + fetch ids/boxes/mask
  noup    reuse the device-resident gray (no upload)
  tiny    upload fresh gray + fetch ids only (4 x T int32)

Run:  python scripts/tpu_2d_prof.py [n_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from mcmtt_opticalflow_tpu.config import EngineConfig, Tracker2DConfig
from mcmtt_opticalflow_tpu.data import make_scenario
from mcmtt_opticalflow_tpu.geometry.tsai import stack_cameras
from mcmtt_opticalflow_tpu.models.tracker2d import (init_tracker2d_state,
                                                    make_tracker2d_step)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    cfg = EngineConfig(
        num_cameras=4, image_width=768, image_height=576,
        tracker2d=Tracker2DConfig(lk_pyramid_levels=2, lk_iterations=8,
                                  max_detections=48, max_trackers=64,
                                  max_features=36))
    sc = make_scenario(num_cameras=4, num_frames=n + 3, num_people=22,
                       image_size=(768, 576), arena=9000.0,
                       noise_px=1.0, fp_rate=0.10, fn_rate=0.05, seed=0)
    cams = stack_cameras(sc.cameras)
    step = make_tracker2d_step(cfg.tracker2d, multi_camera=True)

    grays = []
    dets = []
    for t in range(n + 3):
        f = (np.clip(np.stack(sc.frames(t)), 0, 1) * 255 + 0.5).astype(np.uint8)
        g = ((f[..., 0].astype(np.uint16) + f[..., 1] + f[..., 2]) // 3
             ).astype(np.float32) / 255.0
        grays.append(g)
        d = cfg.tracker2d.max_detections
        boxes = np.zeros((4, d, 4), np.float32)
        mask = np.zeros((4, d), bool)
        for ci in range(4):
            bs = np.asarray(sc.detections[t][ci], np.float32).reshape(-1, 4)
            k = min(len(bs), d)
            boxes[ci, :k] = bs[:k]
            mask[ci, :k] = True
        dets.append((boxes, mask))

    def run(mode):
        state = init_tracker2d_state(cfg.tracker2d, 576, 768, num_cameras=4)
        g_dev = jnp.asarray(grays[0])
        times = []
        for t in range(n + 3):
            t0 = time.perf_counter()
            g = g_dev if mode == "noup" else jnp.asarray(grays[t])
            b, m = dets[t]
            state, out = step(state, g, jnp.asarray(b), jnp.asarray(m),
                              cams, jnp.int32(t))
            if mode == "tiny":
                np.asarray(out.ids)
            else:
                np.asarray(out.ids)
                np.asarray(out.boxes)
                np.asarray(out.mask)
            times.append(time.perf_counter() - t0)
        return times[3:]   # drop compile frames

    # upload-only baseline: ship gray + force materialization via a
    # trivial dependent reduction fetch
    red = jax.jit(lambda x: jnp.sum(x))
    up = []
    for t in range(n + 3):
        t0 = time.perf_counter()
        np.asarray(red(jnp.asarray(grays[t])))
        up.append(time.perf_counter() - t0)

    for mode in ("full", "tiny", "noup"):
        ts = run(mode)
        print(f"{mode:5s} median={1e3 * np.median(ts):7.1f} ms  "
              f"mean={1e3 * np.mean(ts):7.1f} ms  "
              f"all={[round(1e3 * x, 1) for x in ts]}")
    print(f"upload+sum median={1e3 * np.median(up[3:]):7.1f} ms  "
          f"all={[round(1e3 * x, 1) for x in up[3:]]}")


if __name__ == "__main__":
    main()
