"""Time each piece of the fused rescore+compat+solve program on the TPU
at bench-realistic shapes (4 cams, rescore bucket 512, graph 256, W=20)."""

import dataclasses
import time

import numpy as np


def bench(fn, n=10):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from mcmtt_opticalflow_tpu.config import (Associator3DConfig,
                                              EngineConfig, SolverConfig,
                                              Tracker2DConfig)
    from mcmtt_opticalflow_tpu.data import make_scenario
    from mcmtt_opticalflow_tpu.models.associator3d import Associator3D
    from mcmtt_opticalflow_tpu.models.costs import score_track_windows

    cfg = EngineConfig(
        num_cameras=4, image_width=768, image_height=576,
        tracker2d=Tracker2DConfig(lk_pyramid_levels=2, lk_iterations=8,
                                  max_detections=48, max_trackers=64),
        assoc3d=Associator3DConfig(k_best_size=30),
        solver=SolverConfig(num_replicas=8, max_vertices=256,
                            max_iterations=150),
    )
    sc = make_scenario(num_cameras=4, num_frames=3, num_people=22,
                       image_size=(768, 576), arena=9000.0, seed=0)
    assoc = Associator3D(cfg, sc.cameras)
    w = assoc.win
    vmax = cfg.solver.max_vertices
    nb = 256
    nres = 512
    c = 4
    rng = np.random.RandomState(0)
    print(f"win={w} vmax={vmax} nres={nres}")

    pts = jnp.asarray(rng.randn(nres, w, 3).astype(np.float32) * 1000)
    raws = jnp.asarray(rng.randn(nres, w, c, 3).astype(np.float32) * 1000)
    rmask = jnp.asarray(rng.rand(nres, w, c) < 0.7)
    merr = jnp.asarray(np.abs(rng.randn(nres, w)).astype(np.float32) * 50)
    lens = jnp.asarray(rng.randint(2, w + 1, nres).astype(np.int32))
    tree_ids = jnp.asarray(np.arange(nb, dtype=np.int32) // 3)
    shared = jnp.asarray(rng.rand(nb, nb) < 0.02)
    pos_grid = jnp.asarray(rng.randn(nb, w, 3).astype(np.float32) * 1000)
    have = jnp.asarray(rng.rand(nb, w) < 0.8)
    pvalid = jnp.ones((nb,), bool)
    row_map = jnp.asarray(
        np.where(np.arange(vmax) < nb, np.arange(vmax) % nres, -1)
        .astype(np.int32))
    host_base = jnp.asarray(rng.rand(vmax).astype(np.float32) * -5)
    init_masks = jnp.zeros((30, vmax), bool)
    key = jax.random.PRNGKey(0)

    sw = jax.jit(lambda *a: score_track_windows(*a, cfg=assoc.acfg))
    t = bench(lambda: jax.block_until_ready(
        sw(pts, raws, rmask, merr, lens, assoc.cams)))
    print(f"score_track_windows [{nres},{w},{c}]: {t:7.2f} ms")

    cm = jax.jit(assoc._compat_matrix)
    t = bench(lambda: jax.block_until_ready(
        cm(tree_ids, shared, pos_grid, have, pvalid)))
    print(f"compat_matrix [{nb},{nb},{w}]:        {t:7.2f} ms")

    full = lambda: assoc._rescore_and_solve(
        pts, raws, rmask, merr, lens, assoc.cams, row_map, host_base,
        tree_ids, shared, pos_grid, have, pvalid, init_masks, key, 150)
    t = bench(lambda: jax.block_until_ready(full()))
    print(f"full rescore_and_solve (no fetch):    {t:7.2f} ms")

    out = full()
    t = bench(lambda: jax.device_get(out))
    print(f"fetch of outputs:                     {t:7.2f} ms")

    def full_fetch():
        o = full()
        return jax.device_get(o)
    t = bench(full_fetch)
    print(f"dispatch+device+fetch:                {t:7.2f} ms")


if __name__ == "__main__":
    main()
