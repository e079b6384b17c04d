"""Pallas LK kernel parity vs the XLA gather path (interpret mode on the
CPU mesh — Mosaic compilation is exercised on real TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmtt_opticalflow_tpu.ops.lk import lk_track_points
from mcmtt_opticalflow_tpu.ops.lk_pallas import lk_level_pallas
from mcmtt_opticalflow_tpu.ops.pyramid import image_gradients


def _scene(rng, h=64, w=256, shift=(2.3, -1.6)):
    """Smooth random texture and a subpixel-shifted copy."""
    base = rng.rand(h + 8, w + 8).astype(np.float32)
    for _ in range(3):  # cheap smoothing for differentiable texture
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


class TestPallasKernelParity:
    @pytest.mark.parametrize("variant", ["serial", "batched"])
    @pytest.mark.parametrize("shift", [(2.3, -1.6), (0.4, 0.9), (-3.1, 2.2)])
    def test_matches_xla_path(self, shift, variant):
        rng = np.random.RandomState(42)   # scene must not depend on
        #                                   which tests ran before
        prev, nxt = _scene(rng, shift=shift)
        h, w = prev.shape
        n = 16
        pts = np.stack([rng.uniform(32, w - 32, n),
                        rng.uniform(24, h - 24, n)], -1).astype(np.float32)
        act = np.ones(n, bool)
        act[-3:] = False

        tr_p, ok_p, res_p = lk_level_pallas(
            jnp.asarray(prev)[None], jnp.asarray(nxt)[None],
            jnp.zeros(n, jnp.int32), jnp.asarray(pts), jnp.asarray(pts),
            active=jnp.asarray(act), window=16, iters=8, interpret=True,
            variant=variant)

        gx, gy = image_gradients(jnp.asarray(prev))
        tr_x, ok_x, res_x = lk_track_points(
            jnp.asarray(prev), jnp.asarray(nxt), gx, gy,
            jnp.asarray(pts), jnp.asarray(pts), window=16, iterations=8)

        tr_p, ok_p = np.asarray(tr_p), np.asarray(ok_p)
        tr_x, ok_x = np.asarray(tr_x), np.asarray(ok_x)
        assert not ok_p[-3:].any(), "inactive features must report invalid"
        both = ok_p[:-3] & ok_x[:-3]
        assert both.sum() >= n - 6, (ok_p, ok_x)
        np.testing.assert_allclose(tr_p[:-3][both], tr_x[:-3][both],
                                   atol=0.15)
        # and both recover the true motion for most features (sampling
        # base at +shift moves the scene content by -shift; a couple of
        # features on a weakly-textured spot may stall at a single level
        # — the production tracker runs a pyramid on top)
        for flow in (tr_x[:-3][both] - pts[:-3][both],
                     tr_p[:-3][both] - pts[:-3][both]):
            good = (np.abs(flow[:, 0] + shift[0]) < 0.3) \
                & (np.abs(flow[:, 1] + shift[1]) < 0.3)
            assert good.mean() >= 0.8, flow
