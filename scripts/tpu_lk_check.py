"""Validate the Mosaic-compiled LK Pallas kernel on the real TPU chip.

Runs lk_level_pallas on the TPU and the XLA gather path (ops/lk.py) on the
host CPU backend, then compares tracked positions.  The CPU tests only
exercise interpret mode; this is the check that the compiled kernel —
subpatch rolls, while_loop early exit — is numerically right on hardware.
"""

import time

import numpy as np


def scene(rng, h=64, w=256, shift=(2.3, -1.6)):
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


def main():
    import jax
    import jax.numpy as jnp
    from mcmtt_opticalflow_tpu.ops.lk import lk_track_points
    from mcmtt_opticalflow_tpu.ops.lk_pallas import lk_level_pallas
    from mcmtt_opticalflow_tpu.ops.pyramid import image_gradients

    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print("tpu device:", tpu)

    rng = np.random.RandomState(7)
    worst = 0.0
    for shift in [(2.3, -1.6), (0.4, 0.9), (-3.1, 2.2)]:
        prev, nxt = scene(rng, shift=shift)
        h, w = prev.shape
        n = 64
        pts = np.stack([rng.uniform(32, w - 32, n),
                        rng.uniform(24, h - 24, n)], -1).astype(np.float32)

        t0 = time.perf_counter()
        tr_p, ok_p, _ = lk_level_pallas(
            jax.device_put(jnp.asarray(prev)[None], tpu),
            jax.device_put(jnp.asarray(nxt)[None], tpu),
            jnp.zeros(n, jnp.int32), jnp.asarray(pts), jnp.asarray(pts),
            window=16, iters=8)
        tr_p, ok_p = np.asarray(tr_p), np.asarray(ok_p)
        t1 = time.perf_counter()

        with jax.default_device(cpu):
            pv = jnp.asarray(prev)
            gx, gy = image_gradients(pv)
            tr_x, ok_x, _ = lk_track_points(
                pv, jnp.asarray(nxt), gx, gy,
                jnp.asarray(pts), jnp.asarray(pts), window=16, iterations=8)
        tr_x, ok_x = np.asarray(tr_x), np.asarray(ok_x)

        both = ok_p & ok_x
        err = np.abs(tr_p[both] - tr_x[both]).max() if both.any() else -1.0
        worst = max(worst, err)
        print(f"shift={shift}: ok_p={ok_p.sum()}/{n} ok_x={ok_x.sum()}/{n} "
              f"max|pallas-xla|={err:.4f}px  tpu call {t1-t0:.2f}s")
        assert both.sum() >= n - 8, (ok_p.sum(), ok_x.sum())
        assert err < 0.2, err

    # steady-state timing on the compiled kernel (one shape)
    prev, nxt = scene(rng)
    n = 512
    pts = np.stack([rng.uniform(32, 256 - 32, n),
                    rng.uniform(24, 64 - 24, n)], -1).astype(np.float32)
    pv = jax.device_put(jnp.asarray(prev)[None], tpu)
    nx = jax.device_put(jnp.asarray(nxt)[None], tpu)
    ci = jnp.zeros(n, jnp.int32)
    p = jnp.asarray(pts)
    lk_level_pallas(pv, nx, ci, p, p, window=16, iters=8)[0].block_until_ready()
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        lk_level_pallas(pv, nx, ci, p, p, window=16,
                        iters=8)[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"steady-state 512 feats: median {np.median(ts)*1e3:.2f} ms")
    print("PASS worst err", worst)


if __name__ == "__main__":
    main()
