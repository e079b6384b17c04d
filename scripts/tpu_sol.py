"""Speed-of-light / MFU accounting for the two flagship device programs
(BASELINE.md's "kernels at speed-of-light per chip" clause).

FLOPs + HBM bytes come from XLA's own cost analysis of the compiled
executables; device time comes from CHAINED dependent executions (each
call consumes the previous call's output), so async dispatch cannot fake
completion and tunnel RTT amortises away.  Utilisation = work / (time x
peak) against TPU v5e (v5 lite) single-chip peaks.

Caveat: Pallas/Mosaic custom calls inside the 2D step report zero flops
to XLA's analysis; the LK kernel's arithmetic is therefore undercounted
there (its bytes still appear).  The LK kernel is DMA-bound by design
(patch gathers), so its roofline bound is the bytes row.
"""

import dataclasses
import time

import numpy as np

# TPU v5e single-chip peaks (public: cloud.google.com/tpu/docs/v5e)
PEAK_BF16 = 197e12         # FLOP/s
PEAK_F32 = PEAK_BF16 / 4   # MXU f32 rate
PEAK_HBM = 819e9           # B/s


def chained_time(make_step, n=8, reps=5):
    """Median wall time of n back-to-back dependent executions / n: each
    call consumes the previous output, so the device runs them serially
    and the per-call tunnel overhead amortises."""
    import jax
    x = make_step(None)
    jax.block_until_ready(x)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = None
        for _ in range(n):
            y = make_step(y)
        jax.block_until_ready(y)
        ts.append((time.perf_counter() - t0) / n)
    return float(np.median(ts))


def report(name, secs, cost):
    flops = cost.get("flops", 0.0)
    byts = cost.get("bytes accessed", 0.0)
    mfu = flops / (secs * PEAK_F32) * 100
    hbm = byts / (secs * PEAK_HBM) * 100
    bound = "HBM" if hbm > mfu else "MXU"
    print(f"{name:<28} {secs*1e3:8.2f} ms  {flops/1e9:9.3f} GFLOP "
          f"{byts/1e6:9.2f} MB  MXU(f32) {mfu:5.1f}%  HBM {hbm:5.1f}%  "
          f"-> {bound}-bound", flush=True)
    return dict(name=name, ms=secs * 1e3, gflop=flops / 1e9,
                mb=byts / 1e6, mfu_pct=mfu, hbm_pct=hbm, bound=bound)


def main():
    import jax
    import jax.numpy as jnp
    from mcmtt_opticalflow_tpu.config import (Associator3DConfig,
                                              EngineConfig, SolverConfig,
                                              Tracker2DConfig)
    from mcmtt_opticalflow_tpu.data import make_scenario
    from mcmtt_opticalflow_tpu.models.associator3d import Associator3D
    from mcmtt_opticalflow_tpu.models.tracker2d import (
        init_tracker2d_state, make_tracker2d_step)
    from mcmtt_opticalflow_tpu.geometry.tsai import stack_cameras

    cfg = EngineConfig(
        num_cameras=4, image_width=768, image_height=576,
        tracker2d=Tracker2DConfig(lk_pyramid_levels=2, lk_iterations=8,
                                  max_detections=48, max_trackers=64),
        assoc3d=Associator3DConfig(k_best_size=30),
        solver=SolverConfig(num_replicas=8, max_vertices=256,
                            max_iterations=150))
    sc = make_scenario(num_cameras=4, num_frames=3, num_people=22,
                       image_size=(768, 576), arena=9000.0, seed=0)
    assoc = Associator3D(cfg, sc.cameras)
    w, vmax, nres, c = assoc.win, 256, 512, 4
    rng = np.random.RandomState(0)

    # ---- fused rescore + compat + BLS solve --------------------------------
    args = (
        jnp.asarray(rng.randn(nres, w, 3).astype(np.float16) * 1000),
        jnp.asarray(rng.randn(nres, w, c, 3).astype(np.float16) * 1000),
        jnp.asarray(rng.rand(nres, w, c) < 0.7),
        jnp.asarray(np.abs(rng.randn(nres, w)).astype(np.float16) * 50),
        jnp.asarray(rng.randint(2, w + 1, nres).astype(np.int32)),
        assoc.cams,
        jnp.asarray(np.where(np.arange(vmax) < vmax,
                             np.arange(vmax) % nres, -1).astype(np.int32)),
        jnp.asarray(rng.rand(vmax).astype(np.float32) * -5),
        jnp.asarray(np.arange(vmax, dtype=np.int32) // 3),
        jnp.asarray(rng.rand(vmax, vmax) < 0.02),
        jnp.asarray(rng.randn(vmax, w, 3).astype(np.float16) * 1000),
        jnp.asarray(rng.rand(vmax, w) < 0.8),
        jnp.ones((vmax,), bool),
        jnp.zeros((30, vmax), bool),
        jax.random.PRNGKey(0),
    )
    print("compiling fused solve...", flush=True)
    lowered = assoc._rescore_and_solve.lower(*args, iters=150)
    cost_solve = lowered.compile().cost_analysis()

    def step_solve(prev):
        # dependent chain: perturb the weights by the previous K-best
        # score so each dispatch must wait for the one before it
        a = list(args)
        if prev is not None:
            a[7] = a[7] + (prev[2][0] % 7).astype(jnp.float32) * 1e-6
        return assoc._rescore_and_solve(*a, iters=150)

    t_solve = chained_time(step_solve, n=4, reps=3)
    print(f"TPU v5e peaks: bf16 {PEAK_BF16/1e12:.0f} TF/s, "
          f"f32 {PEAK_F32/1e12:.1f} TF/s, HBM {PEAK_HBM/1e9:.0f} GB/s",
          flush=True)
    rows = [report("rescore+compat+solve (V=256)", t_solve, cost_solve)]

    # ---- camera-batched 2D tracker step ------------------------------------
    step2d = make_tracker2d_step(cfg.tracker2d, multi_camera=True)
    state = init_tracker2d_state(cfg.tracker2d, 576, 768, num_cameras=4)
    cams = stack_cameras(sc.cameras)
    gray = jnp.asarray(np.stack(sc.frames(0)).mean(-1).astype(np.float32))
    boxes = jnp.asarray(rng.rand(4, 48, 4).astype(np.float32) * 100)
    bmask = jnp.asarray(np.ones((4, 48), bool))
    print("compiling 2D step...", flush=True)
    lowered2d = jax.jit(step2d).lower(state, gray, boxes, bmask, cams,
                                      jnp.int32(0))
    cost_2d = lowered2d.compile().cost_analysis()

    holder = {"state": state}

    def step_2d(prev):
        s, out = step2d(holder["state"], gray, boxes, bmask, cams,
                        jnp.int32(0))
        holder["state"] = s       # chained: state feeds the next call
        return out.boxes

    t_2d = chained_time(step_2d, n=4, reps=3)
    rows.append(report("2D tracker step (4 cams)", t_2d, cost_2d))
    import json
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
