"""Bisect the LK Pallas kernel's per-feature cost on the real TPU:
iteration count scaling, occupancy scaling, batch-size scaling."""

import time

import numpy as np


def scene(rng, h=576, w=768, shift=(2.3, -1.6)):
    base = rng.rand(h + 8, w + 8).astype(np.float32)
    for _ in range(3):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, -1, 0) + np.roll(base, -1, 1)) / 5.0
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)

    def sample(img, y, x):
        iy, ix = np.floor(y).astype(int), np.floor(x).astype(int)
        fy, fx = y - iy, x - ix
        return (img[iy, ix] * (1 - fy) * (1 - fx)
                + img[iy, ix + 1] * (1 - fy) * fx
                + img[iy + 1, ix] * fy * (1 - fx)
                + img[iy + 1, ix + 1] * fy * fx)

    prev = sample(base, ys + 2, xs + 2)
    nxt = sample(base, ys + 2 + shift[1], xs + 2 + shift[0])
    return prev, nxt


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
    from mcmtt_opticalflow_tpu.ops.lk_pallas import lk_level_pallas

    rng = np.random.RandomState(7)
    prev, nxt = scene(rng)
    h, w = prev.shape
    pv = jnp.asarray(prev)[None]
    nx = jnp.asarray(nxt)[None]

    n = 512
    pts = np.stack([rng.uniform(32, w - 32, n),
                    rng.uniform(24, h - 24, n)], -1).astype(np.float32)
    p = jnp.asarray(pts)
    ci = jnp.zeros(n, jnp.int32)

    for iters in (1, 2, 4, 8):
        t = bench(lambda: jax.block_until_ready(lk_level_pallas(
            pv, nx, ci, p, p, window=16, iters=iters)))
        print(f"512 feats, iters={iters}: {t:7.2f} ms "
              f"({t/n*1e3:6.1f} us/feat)")

    # occupancy scaling: same 512 slots, fewer active
    for frac in (0.25, 0.5, 1.0):
        act = jnp.asarray(np.arange(n) < int(n * frac))
        t = bench(lambda: jax.block_until_ready(lk_level_pallas(
            pv, nx, ci, p, p, active=act, window=16, iters=8)))
        print(f"512 slots, {int(frac*100):3d}% active, iters=8: {t:7.2f} ms")

    # large displacement: forces full 8 iterations (no early exit)
    g = jnp.asarray(pts + np.array([6.0, 5.0], np.float32))
    t = bench(lambda: jax.block_until_ready(lk_level_pallas(
        pv, nx, ci, p, g, window=16, iters=8)))
    print(f"512 feats, bad guess (full iters):  {t:7.2f} ms")

    # serial-vs-batched kernel comparison, measured as PURE DEVICE time:
    # 50 data-dependent invocations chained inside one jitted lax.scan so
    # the ~28 ms tunnel dispatch overhead amortises away (single calls of
    # either variant are tunnel-bound and indistinguishable).
    import functools

    off = jnp.asarray(np.array([6.0, 5.0], np.float32))
    K = 50

    @functools.partial(jax.jit, static_argnames=("variant",))
    def chain(p_, ci_, variant):
        def body(cur, _):
            tr, ok, _res = lk_level_pallas(pv, nx, ci_, p_, cur, window=16,
                                           iters=8, variant=variant)
            return jnp.clip(tr + off, 32.0, 500.0), ok
        out, _ = jax.lax.scan(body, p_ + off, None, length=K)
        return out

    import time as _time
    for variant in ("serial", "batched"):
        jax.block_until_ready(chain(p, ci, variant))
        ts = []
        for _ in range(7):
            t0 = _time.perf_counter()
            jax.block_until_ready(chain(p, ci, variant))
            ts.append(_time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{variant:7s} 512 feats, full iters, device-chained: "
              f"{med*1e6/K:7.1f} us/call")


if __name__ == "__main__":
    main()
