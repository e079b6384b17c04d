#!/usr/bin/env python
"""End-to-end throughput benchmark.

Runs the full pipeline (camera-batched LK 2D tracking -> 3D MHT association
-> K-best hypothesis solve) on a synthetic PETS-like 4-camera scenario at
768x576 and reports frames/s.

The reference publishes no throughput numbers (BASELINE.md); its dataset
runs at 7 fps (psn_where/PSNWhere_Associator3D.cpp:88), so vs_baseline here
is real-time factor: fps / 7.0.  Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    num_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from mcmtt_opticalflow_tpu.config import (EngineConfig, Tracker2DConfig,
                                              SolverConfig)
    from mcmtt_opticalflow_tpu.data import make_scenario
    from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine

    sc = make_scenario(num_cameras=4, num_frames=num_frames + 4,
                       num_people=6, image_size=(768, 576), arena=6000.0,
                       seed=0)
    cfg = EngineConfig(
        num_cameras=4, image_width=768, image_height=576,
        # 2 pyramid levels cover the PETS-scale per-frame motion (<16 px)
        # and keep the cold-compile budget bounded
        tracker2d=Tracker2DConfig(lk_pyramid_levels=2, lk_iterations=8),
        solver=SolverConfig(num_replicas=8, max_vertices=256,
                            max_iterations=300, solve_batch=8),
    )
    eng = TrackingEngine(cfg, sc.cameras, pipelined=True)

    # pre-render frames so rendering cost stays out of the measurement;
    # uint8, as dataset JPEGs decode to (the engine's native ingest format)
    frames = [(np.clip(np.stack(sc.frames(t)), 0, 1) * 255 + 0.5)
              .astype(np.uint8) for t in range(num_frames + 4)]

    # warmup (compilation; the engine's device programs compile on the
    # first few frames as batch-size buckets appear)
    verbose = os.environ.get("BENCH_VERBOSE")
    for t in range(4):
        tw = time.perf_counter()
        eng.process_frame(frames[t], sc.detections[t], frame_idx=t)
        if verbose:
            print(f"warmup frame {t}: {time.perf_counter() - tw:.1f}s",
                  file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    per_frame = []
    for t in range(4, num_frames + 4):
        f0 = time.perf_counter()
        eng.process_frame(frames[t], sc.detections[t], frame_idx=t)
        per_frame.append(time.perf_counter() - f0)
    elapsed = time.perf_counter() - t0

    # median per-frame time is robust to residual bucket compiles mid-run
    fps = 1.0 / float(np.median(per_frame))
    if verbose:
        print(eng.assoc.timer.summary(), file=sys.stderr)
        print(f"per-frame: {[round(x, 2) for x in per_frame]}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "end_to_end_frames_per_sec_4cam_768x576",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 7.0, 3),
    }))


if __name__ == "__main__":
    main()
