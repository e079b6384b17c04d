"""Measure the 2D tracker device step's wall time at bench config on the
real TPU, isolated from the 3D stage (which normally overlaps it)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mcmtt_opticalflow_tpu.config import (Associator3DConfig,
                                              EngineConfig, SolverConfig,
                                              Tracker2DConfig)
    from mcmtt_opticalflow_tpu.data import make_scenario
    from mcmtt_opticalflow_tpu.models.tracker2d import (init_tracker2d_state,
                                                        make_tracker2d_step)
    from mcmtt_opticalflow_tpu.geometry.tsai import stack_cameras

    cfg = EngineConfig(
        num_cameras=4, image_width=768, image_height=576,
        tracker2d=Tracker2DConfig(lk_pyramid_levels=2, lk_iterations=8,
                                  max_detections=48, max_trackers=64),
        assoc3d=Associator3DConfig(k_best_size=30),
        solver=SolverConfig(num_replicas=8, max_vertices=256,
                            max_iterations=150),
    )
    total = 14
    sc = make_scenario(num_cameras=4, num_frames=total, num_people=22,
                       image_size=(768, 576), arena=9000.0,
                       noise_px=1.0, fp_rate=0.10, fn_rate=0.05, seed=0)
    cams = stack_cameras(sc.cameras)
    step = make_tracker2d_step(cfg.tracker2d, multi_camera=True)
    state = init_tracker2d_state(cfg.tracker2d, 576, 768, num_cameras=4)

    d = cfg.tracker2d.max_detections
    times = []
    for t in range(total):
        f = (np.clip(np.stack(sc.frames(t)), 0, 1) * 255 + 0.5).astype(np.uint8)
        gray = ((f[..., 0].astype(np.uint16) + f[..., 1] + f[..., 2]) // 3
                ).astype(np.uint8)
        g = jnp.asarray(gray).astype(jnp.float32) / 255.0
        boxes = np.zeros((4, d, 4), np.float32)
        mask = np.zeros((4, d), bool)
        for ci in range(4):
            det = np.asarray(sc.detections[t][ci], np.float32).reshape(-1, 4)
            n = min(len(det), d)
            boxes[ci, :n] = det[:n]
            mask[ci, :n] = True
        t0 = time.perf_counter()
        state, out = step(state, g, jnp.asarray(boxes), jnp.asarray(mask),
                          cams, jnp.int32(t))
        jax.block_until_ready((state, out))
        dt = time.perf_counter() - t0
        times.append(dt)
        ndet = int(mask.sum())
        print(f"frame {t:2d}: {dt*1e3:8.1f} ms  ({ndet} detections)")
    steady = times[6:]
    print(f"2D step steady-state median: {np.median(steady)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
