"""Ops layer tests: SG smoothing, assignment, histograms, features, LK."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from mcmtt_opticalflow_tpu.ops import (
    sg_smooth, sg_smooth_masked, sg_smoothing_matrix,
    solve_assignment, hungarian_host, rgb_histogram,
    build_pyramid, detect_grid_features, lk_track_pyramid,
)
from mcmtt_opticalflow_tpu.ops.sgsmooth import smoothing_matrix_np


def reference_sg_smooth(data, span=9, degree=1):
    """Direct port of the reference's smoothing recursion for testing
    (ref PSNWhere_SGSmooth.cpp:198-260): begin rows via Qbegin, causal
    moving-average middle, end rows via Qend."""
    data = np.asarray(data, np.float64)
    n = len(data)
    w = min(span, n)
    w -= (w + 1) % 2
    if w <= degree:
        return data.copy()
    h = (w - 1) // 2
    t = np.arange(-h, h + 1, dtype=np.float64)
    v = np.stack([t ** k for k in range(degree + 1)], 1)
    q, _ = np.linalg.qr(v)
    b = q @ q.T
    out = np.zeros(n)
    for i in range(h):
        out[i] = b[i] @ data[:w]
    for i in range(h, n - h):
        out[i] = data[i - h:i + h + 1].mean()   # Qmid = uniform (deg<=1)
    for j in range(h):
        out[n - h + j] = b[h + 1 + j] @ data[n - w:]
    return out


class TestSGSmooth:
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 9, 10, 17, 30])
    def test_matches_reference_recursion(self, n, rng):
        data = rng.randn(n).astype(np.float64) * 100
        ours = np.asarray(sg_smooth(jnp.asarray(data), 9, 1))
        ref = reference_sg_smooth(data, 9, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_linear_preserved(self):
        # degree-1 SG reproduces straight lines exactly
        data = np.arange(20, dtype=np.float64) * 3.0 + 5.0
        out = np.asarray(sg_smooth(jnp.asarray(data), 9, 1))
        np.testing.assert_allclose(out, data, atol=1e-4)

    def test_masked_batch(self, rng):
        cap = 16
        data = rng.randn(4, cap, 3).astype(np.float32)
        lengths = np.asarray([1, 5, 9, 16], np.int32)
        out = np.asarray(sg_smooth_masked(jnp.asarray(data),
                                          jnp.asarray(lengths)))
        for i, ln in enumerate(lengths):
            for d in range(3):
                ref = reference_sg_smooth(data[i, :ln, d], 9, 1)
                np.testing.assert_allclose(out[i, :ln, d], ref, atol=1e-3)
            # padding untouched
            np.testing.assert_allclose(out[i, ln:], data[i, ln:])

    def test_matrix_cache_shape(self):
        m = sg_smoothing_matrix(8, 9, 1)
        assert m.shape == (9, 8, 8)


class TestAssignment:
    @pytest.mark.parametrize("r,c", [(3, 3), (5, 8), (8, 5), (1, 4)])
    def test_matches_hungarian(self, r, c, rng):
        for trial in range(10):
            cost = rng.rand(r, c).astype(np.float32) * 10
            col, mc = solve_assignment(jnp.asarray(cost),
                                       jnp.ones(r, bool), jnp.ones(c, bool))
            col = np.asarray(col)
            rows_h, cols_h = hungarian_host(cost)
            ours = sum(cost[i, col[i]] for i in range(r) if col[i] >= 0)
            exact = cost[rows_h, cols_h].sum()
            assert abs(ours - exact) < 1e-3, (trial, cost, col, cols_h)
            # assignment is a matching
            used = [c_ for c_ in col if c_ >= 0]
            assert len(used) == len(set(used))

    @pytest.mark.parametrize("r,c", [(32, 48), (64, 64), (48, 32)])
    def test_optimal_at_scale_with_forbidden(self, r, c, rng):
        """Tracker-sized matrices with ~30% forbidden pairs: the
        eps-scaled auction must land on the exact optimum (certifies the
        n*eps_final bound really is below matching-cost resolution)."""
        for trial in range(3):
            cost = rng.rand(r, c).astype(np.float32) * 10
            cost[rng.rand(r, c) < 0.3] = np.inf
            col, mc = solve_assignment(jnp.asarray(cost),
                                       jnp.ones(r, bool), jnp.ones(c, bool))
            col = np.asarray(col)
            rows_h, cols_h = hungarian_host(cost)
            ours = sum(cost[i, col[i]] for i in range(r) if col[i] >= 0)
            exact = cost[rows_h, cols_h].sum()
            matched_ours = int((col >= 0).sum())
            assert matched_ours == len(rows_h), (trial, matched_ours,
                                                 len(rows_h))
            assert abs(ours - exact) < 1e-2, (trial, ours, exact)
            used = [c_ for c_ in col if c_ >= 0]
            assert len(used) == len(set(used))

    def test_forbidden_entries(self):
        cost = np.full((2, 2), np.inf, np.float32)
        cost[0, 0] = 1.0
        col, mc = solve_assignment(jnp.asarray(cost),
                                   jnp.ones(2, bool), jnp.ones(2, bool))
        assert int(col[0]) == 0
        assert int(col[1]) == -1
        assert not np.isfinite(float(mc[1]))

    def test_masks(self):
        cost = np.ones((3, 3), np.float32)
        col, _ = solve_assignment(jnp.asarray(cost),
                                  jnp.asarray([True, False, True]),
                                  jnp.asarray([True, True, False]))
        col = np.asarray(col)
        assert col[1] == -1
        assert 2 not in col


class TestHistogram:
    def test_uniform_patch(self):
        img = jnp.full((64, 64, 3), 0.5)
        boxes = jnp.asarray([[8.0, 8.0, 32.0, 32.0]])
        h = np.asarray(rgb_histogram(img, boxes, num_bins=16))
        assert h.shape == (1, 48)
        # all mass in bin 8 of each channel
        for ch in range(3):
            assert h[0, ch * 16 + 8] == pytest.approx(1.0)
        assert h.sum() == pytest.approx(3.0)

    def test_distinguishes_colors(self):
        img = np.zeros((64, 64, 3), np.float32)
        img[:, :32, 0] = 0.9   # left red
        img[:, 32:, 2] = 0.9   # right blue
        img = jnp.asarray(img)
        b = jnp.asarray([[0.0, 0.0, 30.0, 60.0], [34.0, 0.0, 30.0, 60.0]])
        h = np.asarray(rgb_histogram(img, b))
        assert np.linalg.norm(h[0] - h[1]) > 0.5

    def test_uint8_matches_float(self, rng):
        from mcmtt_opticalflow_tpu.ops.histogram import host_rgb_histogram
        img8 = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        boxes = np.asarray([[4.0, 6.0, 20.0, 30.0], [10.0, 2.0, 30.0, 40.0]],
                           np.float32)
        h_dev = np.asarray(rgb_histogram(jnp.asarray(img8),
                                         jnp.asarray(boxes)))
        h_host = host_rgb_histogram(img8, boxes)
        np.testing.assert_allclose(h_dev, h_host, atol=1e-6)
        assert h_host.sum() == pytest.approx(6.0)  # 3 channels x 2 boxes

    def test_host_matches_device_float(self, rng):
        from mcmtt_opticalflow_tpu.ops.histogram import host_rgb_histogram
        img = rng.rand(48, 48, 3).astype(np.float32)
        boxes = np.asarray([[4.0, 6.0, 20.0, 30.0]], np.float32)
        h_dev = np.asarray(rgb_histogram(jnp.asarray(img),
                                         jnp.asarray(boxes)))
        np.testing.assert_allclose(h_dev, host_rgb_histogram(img, boxes),
                                   atol=1e-6)


class TestLK:
    def _textured(self, rng, h=128, w=128):
        img = rng.rand(h, w).astype(np.float32)
        # smooth it a little so gradients are meaningful
        from mcmtt_opticalflow_tpu.ops.pyramid import gaussian_blur_3x3
        img = np.asarray(gaussian_blur_3x3(jnp.asarray(img)))
        return img

    def test_pure_translation(self, rng):
        img = self._textured(rng)
        shift = (3, 2)  # (dy, dx)
        img2 = np.roll(np.roll(img, shift[0], 0), shift[1], 1)
        pts = jnp.asarray(rng.rand(32, 2).astype(np.float32) * 64 + 32)
        tracked, status, resid = lk_track_pyramid(
            jnp.asarray(img), jnp.asarray(img2), pts,
            levels=3, window=16, iterations=15)
        tracked, status = np.asarray(tracked), np.asarray(status)
        good = status
        assert good.sum() >= 24
        flow = tracked[good] - np.asarray(pts)[good]
        np.testing.assert_allclose(flow[:, 0].mean(), shift[1], atol=0.3)
        np.testing.assert_allclose(flow[:, 1].mean(), shift[0], atol=0.3)

    def test_static_scene(self, rng):
        img = self._textured(rng)
        pts = jnp.asarray(rng.rand(16, 2).astype(np.float32) * 64 + 32)
        tracked, status, _ = lk_track_pyramid(
            jnp.asarray(img), jnp.asarray(img), pts, levels=2, window=16)
        flow = np.asarray(tracked) - np.asarray(pts)
        assert np.abs(flow[np.asarray(status)]).max() < 0.1

    def test_pyramid_shapes(self, rng):
        img = jnp.asarray(rng.rand(64, 96).astype(np.float32))
        pyr = build_pyramid(img, 3)
        assert pyr[0].shape == (64, 96)
        assert pyr[1].shape == (32, 48)
        assert pyr[2].shape == (16, 24)


class TestFeatures:
    def test_finds_corners(self, rng):
        img = np.zeros((96, 96), np.float32)
        img[30:60, 30:60] = 1.0   # a bright square has 4 strong corners
        img += rng.rand(96, 96).astype(np.float32) * 0.01
        boxes = jnp.asarray([[20.0, 20.0, 50.0, 50.0]])
        pts, valid = detect_grid_features(jnp.asarray(img), boxes,
                                          jnp.ones(1, bool), grid=4, sub=4)
        assert pts.shape == (1, 16, 2)
        pts, valid = np.asarray(pts), np.asarray(valid)
        assert valid.any()
        # the strongest features should cluster near the square corners
        strongest = pts[0][valid[0]]
        corners = np.asarray([[30, 30], [30, 60], [60, 30], [60, 60]], np.float32)
        d = np.linalg.norm(strongest[:, None] - corners[None], axis=-1).min(1)
        assert (d < 6.0).sum() >= 2

    def test_masked_box(self, rng):
        img = jnp.asarray(rng.rand(64, 64).astype(np.float32))
        boxes = jnp.asarray([[8.0, 8.0, 32.0, 32.0]])
        _, valid = detect_grid_features(img, boxes, jnp.zeros(1, bool))
        assert not np.asarray(valid).any()
