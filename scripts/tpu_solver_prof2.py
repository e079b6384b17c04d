"""Honest solver timing: chain N dependent solves in one dispatch so
per-solve device time = total/N, immune to async-dispatch artifacts."""
import dataclasses, os, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from mcmtt_opticalflow_tpu.config import SolverConfig
    from mcmtt_opticalflow_tpu.models.mwcp import solve_mwcp, device_k_best

    v = 256
    rng = np.random.RandomState(0)
    w = np.abs(rng.randn(v)).astype(np.float32) + 0.1
    a = rng.rand(v, v) < 0.3
    a = np.triu(a, 1); a = a | a.T
    valid = np.ones(v, bool)
    init = np.zeros((38, v), bool)
    key = jax.random.PRNGKey(0)
    wj, aj, vj, ij = map(jnp.asarray, (w, a, valid, init))

    unroll = int(os.environ.get("UNROLL", "1"))
    chain = int(os.environ.get("CHAIN", "8"))
    cfg = dataclasses.replace(SolverConfig(), num_replicas=38,
                              max_vertices=v, max_iterations=150,
                              unroll=unroll)

    @jax.jit
    def chained(wgt, adj, val, ini, k):
        # each solve's weights depend on the previous solve's output, so
        # the device must run them sequentially: wall/chain = one solve
        out = None
        for i in range(chain):
            res = solve_mwcp(wgt, adj, val, ini, jax.random.fold_in(k, i),
                             cfg, 150)
            km, ks = device_k_best(res, 30)
            bump = (jnp.sum(ks[0]) % 7).astype(jnp.float32) * 1e-6
            wgt = wgt + bump
            out = (km, ks)
        return out

    r = chained(wj, aj, vj, ij, key); jax.block_until_ready(r)  # compile
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        r = chained(wj, aj, vj, ij, key)
        r = jax.device_get(r)          # full fetch like the engine does
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"unroll={unroll} chain={chain}: total={med*1e3:.1f} ms  "
          f"per-solve(+kbest)={med/chain*1e3:.2f} ms", flush=True)

if __name__ == "__main__":
    main()
    bandwidth()

def bandwidth():
    import jax, jax.numpy as jnp, numpy as np, time
    x = jnp.ones((256, 20, 3), jnp.float32)  # the ws.smoothed shape
    f = jax.jit(lambda a: a * 2)
    y = f(x); jax.block_until_ready(y)
    for shape in ((256, 20, 3), (512, 512), (2048, 2048)):
        z = jax.block_until_ready(jax.jit(lambda a: a + 1)(jnp.ones(shape)))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter(); np.asarray(jax.device_get(z))
            ts.append(time.perf_counter() - t0)
        mb = np.prod(shape) * 4 / 1e6
        med = float(np.median(ts))
        print(f"device_get {str(shape):>14} {mb:7.2f} MB: {med*1e3:7.2f} ms "
              f"({mb/med:.1f} MB/s)", flush=True)
