"""Microbenchmark the fused hypothesis-solve path on the real TPU.

Separates solve_mwcp's while-loop per-iteration cost from fixed costs
(init, K-best compaction) to decide where the optimization leverage is.
"""

import dataclasses
import time

import numpy as np


def bench(fn, n=12):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from mcmtt_opticalflow_tpu.config import SolverConfig
    from mcmtt_opticalflow_tpu.models.mwcp import (device_k_best, solve_mwcp)

    v = 256
    rng = np.random.RandomState(0)
    w = np.abs(rng.randn(v)).astype(np.float32) + 0.1
    a = rng.rand(v, v) < 0.3
    a = np.triu(a, 1)
    a = a | a.T
    valid = np.ones(v, bool)
    cfg = dataclasses.replace(SolverConfig(), num_replicas=38,
                              max_vertices=v, max_iterations=150)
    init = np.zeros((38, v), bool)
    key = jax.random.PRNGKey(0)

    wj, aj, vj, ij = map(jnp.asarray, (w, a, valid, init))

    import os
    unrolls = tuple(int(x) for x in
                    os.environ.get("UNROLLS", "1,8").split(","))
    for unroll in unrolls:
        cfg_u = dataclasses.replace(cfg, unroll=unroll)
        for iters in (150,):
            t = bench(lambda: jax.block_until_ready(
                solve_mwcp(wj, aj, vj, ij, key, cfg_u, iters)))
            r = solve_mwcp(wj, aj, vj, ij, key, cfg_u, iters)
            print(f"solve_mwcp iters={iters:4d} unroll={unroll:2d}: "
                  f"{t:8.2f} ms  best={float(jnp.max(r.best_score)):.3f}",
                  flush=True)

    res = solve_mwcp(wj, aj, vj, ij, key, cfg, 150)
    t = bench(lambda: jax.block_until_ready(device_k_best(res, 30)))
    print(f"device_k_best(k=30):        {t:8.2f} ms")

    # tunnel round-trip floor: trivial program dispatch+fetch
    one = jnp.ones((8,))
    f = jax.jit(lambda x: x + 1)
    t = bench(lambda: jax.block_until_ready(f(one)))
    print(f"tunnel RTT floor:           {t:8.2f} ms")


if __name__ == "__main__":
    main()
