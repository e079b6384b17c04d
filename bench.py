#!/usr/bin/env python
"""End-to-end throughput benchmark at PETS-like density.

Runs the full pipeline (camera-batched LK 2D tracking -> 3D MHT association
-> K-best hypothesis solve) on a synthetic 4-camera scenario at 768x576 with
PETS S2.L1-like load: >=20 concurrent people, detector noise (10% FP, 5% FN,
1 px jitter), K=30 carried hypotheses (ref parameters.txt:51 sweeps K up to
30/50), 30 measured frames.

The reference publishes no throughput numbers (BASELINE.md); its dataset
runs at 7 fps (psn_where/PSNWhere_Associator3D.cpp:88), so vs_baseline here
is real-time factor: fps / 7.0.  Prints ONE JSON line; the per-stage timing
breakdown goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

WARMUP = 7   # enough frames for the pool to reach its terminal batch
#              buckets, so bucket compiles stay out of the measured window


def main():
    num_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    from mcmtt_opticalflow_tpu.config import (Associator3DConfig,
                                              EngineConfig, SolverConfig,
                                              Tracker2DConfig)
    from mcmtt_opticalflow_tpu.data import make_scenario
    from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine

    from mcmtt_opticalflow_tpu.eval.clearmot import ClearMotAccumulator

    total = num_frames + WARMUP
    sc = make_scenario(num_cameras=4, num_frames=total,
                       num_people=22, image_size=(768, 576), arena=9000.0,
                       noise_px=1.0, fp_rate=0.10, fn_rate=0.05, seed=0)
    # quality co-report: CLEAR-MOT at deferred windows {0, 3, 6} over the
    # whole run, so perf work cannot silently trade MOTA (the zone covers
    # the synthetic arena; margin = the reference's match radius)
    gx, gy = sc.gt_matrices()
    zone = (-9000.0, -9000.0, 9000.0, 9000.0)
    windows = (0, 3, 6)
    accs = {w: ClearMotAccumulator(gx, gy, zone, 1000.0) for w in windows}
    harvested = -1

    def harvest(eng):
        nonlocal harvested
        done = getattr(eng.assoc, "completed_frame", eng.assoc.frame_idx)
        while harvested < done:
            harvested += 1
            for w in windows:
                td = harvested - w
                if td >= 0:
                    r = eng.deferred_result(td)
                    accs[w].set_result(td, [(i, p[0], p[1]) for i, p in
                                            zip(r.ids, r.points)])
    # quality-tuning experiments: BENCH_ASSOC_OVERRIDES="k=v,k=v" patches
    # Associator3DConfig fields (ints/floats) without editing the bench
    overrides = {}
    for kv in os.environ.get("BENCH_ASSOC_OVERRIDES", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            overrides[k.strip()] = float(v) if "." in v else int(v)
    cfg = EngineConfig(
        num_cameras=4, image_width=768, image_height=576,
        # 2 pyramid levels cover the PETS-scale per-frame motion (<16 px)
        # and keep the cold-compile budget bounded.  36 features/box (6x6
        # grid): measured BETTER dense-scene MOTA than 64 on the full
        # pipeline (0.779/0.788/0.774 vs 0.738/0.770/0.753 at w0/3/6)
        # and ~44% less LK kernel work
        tracker2d=Tracker2DConfig(lk_pyramid_levels=2, lk_iterations=8,
                                  max_detections=48, max_trackers=64,
                                  max_features=36),
        assoc3d=Associator3DConfig(k_best_size=30, **overrides),
        # 150 BLS iterations: every carried hypothesis warm-starts a
        # replica, so convergence needs far fewer moves than the
        # reference's cold 2000-iteration budget; the recorded-graph
        # quality harness (tests/test_solver_quality.py) certifies
        # brute-force-ratio >= 0.99 at this setting.  max_vertices=1024:
        # scripts/tpu_vcap.py measured the fused solve at 22/28/48 ms for
        # V=512/1024/2048 — 1024 costs +6 ms (hidden in the pipeline
        # shadow), brings the survivor cap to the reference's 2000 tracks
        # (min(2000, 2V), ref Associator3D.cpp:23) and keeps pool_dropped
        # at ~0 at this density (V=512 dropped ~60/frame)
        solver=SolverConfig(num_replicas=8, max_vertices=1024,
                            max_iterations=150),
    )
    eng = TrackingEngine(cfg, sc.cameras, pipelined=True)

    # pre-render frames so rendering cost stays out of the measurement;
    # uint8, as dataset JPEGs decode to (the engine's native ingest format)
    frames = [(np.clip(np.stack(sc.frames(t)), 0, 1) * 255 + 0.5)
              .astype(np.uint8) for t in range(total)]

    # warmup (compilation; the engine's device programs compile on the
    # first few frames as batch-size buckets appear)
    verbose = os.environ.get("BENCH_VERBOSE")
    for t in range(WARMUP):
        tw = time.perf_counter()
        eng.process_frame(frames[t], sc.detections[t], frame_idx=t)
        harvest(eng)
        if verbose:
            print(f"warmup frame {t}: {time.perf_counter() - tw:.1f}s",
                  file=sys.stderr, flush=True)
    # force-compile the terminal batch buckets the growing track pool
    # reaches only mid-run (a 1-8 s Mosaic compile inside the measured
    # window otherwise lands on 1-2 frames)
    tw = time.perf_counter()
    eng.assoc.precompile()
    if verbose:
        print(f"bucket precompile: {time.perf_counter() - tw:.1f}s",
              file=sys.stderr, flush=True)
    eng.assoc.timer.reset()   # steady-state stage times only

    prof = None
    if os.environ.get("BENCH_PROFILE"):
        import cProfile
        prof = cProfile.Profile()
        prof.enable()
    t0 = time.perf_counter()
    per_frame = []
    tracks_peak = 0
    for t in range(WARMUP, total):
        f0 = time.perf_counter()
        eng.process_frame(frames[t], sc.detections[t], frame_idx=t)
        per_frame.append(time.perf_counter() - f0)
        tracks_peak = max(tracks_peak, len(eng.assoc.registry.tracks))
        harvest(eng)
    elapsed = time.perf_counter() - t0
    if prof is not None:
        prof.disable()
        prof.dump_stats(os.environ["BENCH_PROFILE"])
    while eng.flush() is not None:       # drain the pipeline tail
        harvest(eng)
    # finalize-time backfill (every window scores every frame)
    for w in windows:
        for td in range(max(harvested - w + 1, 0), harvested + 1):
            r = eng.deferred_result(td)
            accs[w].set_result(td, [(i, p[0], p[1]) for i, p in
                                    zip(r.ids, r.points)])
    evals = {w: accs[w].evaluate() for w in windows}
    for w in windows:
        print(f"w{w}: {evals[w].summary()}", file=sys.stderr)
    quality = {f"mota_w{w}": round(evals[w].mota, 4) for w in windows}

    # median per-frame time is robust to residual bucket compiles mid-run
    fps = 1.0 / float(np.median(per_frame))

    timer = eng.assoc.timer
    stage_ms = {
        name: round(1e3 * sorted(timer.samples[name])
                    [timer.counts[name] // 2], 2)
        for name in sorted(timer.totals, key=lambda n: -timer.totals[n])
        if not name.startswith("_")
    }
    print(timer.summary(), file=sys.stderr)
    dominant = next(iter(stage_ms), "?")
    print(f"dominant stage: {dominant} ({stage_ms.get(dominant)} ms median); "
          f"{len(per_frame)} frames in {elapsed:.1f}s, "
          f"tracks_peak={tracks_peak}", file=sys.stderr)
    if verbose:
        print(f"per-frame: {[round(x, 2) for x in per_frame]}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "end_to_end_frames_per_sec_4cam_768x576_22ppl_k30",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 7.0, 3),
        "frames": len(per_frame),
        "tracks_peak": tracks_peak,
        "pool_dropped": eng.assoc.pool_dropped_total,
        **quality,
        "stage_ms": stage_ms,
    }))


if __name__ == "__main__":
    main()
