"""Cost-model unit tests against the reference's closed-form formulas
(psn_where/PSNWhere_Associator3D.cpp:2267-2400)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erfc as scipy_erfc

pytestmark = pytest.mark.smoke

from mcmtt_opticalflow_tpu.config import Associator3DConfig, EngineConfig
from mcmtt_opticalflow_tpu.models.costs import (
    link_probability, reconstruction_probability, enter_probability,
    exit_cost, tracklet_connectivity, score_track_windows)
from mcmtt_opticalflow_tpu.data import ring_cameras
from mcmtt_opticalflow_tpu.geometry import stack_cameras

CFG = Associator3DConfig()


class TestLinkProbability:
    def test_formula(self):
        # 0.5*erfc(4d/maxDist - 2) with maxDist = 900*gap (ref :2314-2319)
        p1 = jnp.asarray([0.0, 0.0, 0.0])
        p2 = jnp.asarray([300.0, 0.0, 0.0])
        got = float(link_probability(p1, p2, 1.0, 900.0))
        want = 0.5 * scipy_erfc(4.0 * 300.0 / 900.0 - 2.0)
        assert got == pytest.approx(want, rel=1e-5)

    def test_still_point_high_probability(self):
        p = jnp.zeros(3)
        assert float(link_probability(p, p, 1.0)) > 0.97

    def test_fast_motion_low_probability(self):
        p1 = jnp.zeros(3)
        p2 = jnp.asarray([2000.0, 0.0, 0.0])
        assert float(link_probability(p1, p2, 1.0)) < 1e-6

    def test_time_gap_scales_threshold(self):
        p1 = jnp.zeros(3)
        p2 = jnp.asarray([1500.0, 0.0, 0.0])
        assert float(link_probability(p1, p2, 3.0)) \
            > float(link_probability(p1, p2, 1.0))


class TestReconstructionProbability:
    def test_detection_ratio_single_view(self):
        # one tracklet, visible from 2 cams: p=0.5, ratio = pos * neg
        point = jnp.zeros(3)
        raw = jnp.zeros((2, 3))
        mask = jnp.asarray([True, False])
        vis = jnp.asarray([True, True])
        got = float(reconstruction_probability(
            point, raw, mask, jnp.asarray(500.0), vis, CFG))
        pos = (1 - CFG.fp_rate) / CFG.fp_rate
        neg = CFG.fn_rate / (1 - CFG.fn_rate)
        want = pos * neg * 0.5 / 0.5
        assert got == pytest.approx(want, rel=1e-4)

    def test_scatter_gate_zeroes(self):
        # mean scatter beyond max_error invalidates (ref :2362)
        point = jnp.zeros(3)
        raw = jnp.asarray([[3000.0, 0, 0], [-3000.0, 0, 0]])
        mask = jnp.ones(2, bool)
        vis = jnp.ones(2, bool)
        got = float(reconstruction_probability(
            point, raw, mask, jnp.asarray(500.0), vis, CFG))
        assert got == 0.0

    def test_tight_scatter_high(self):
        point = jnp.zeros(3)
        raw = jnp.asarray([[10.0, 0, 0], [-10.0, 0, 0]])
        mask = jnp.ones(2, bool)
        vis = jnp.ones(2, bool)
        got = float(reconstruction_probability(
            point, raw, mask, jnp.asarray(500.0), vis, CFG))
        pos = ((1 - CFG.fp_rate) / CFG.fp_rate) ** 2
        assert got > pos * 0.9


class TestEnterExit:
    def test_enter_deep_inside_is_expensive(self):
        deep = float(enter_probability(jnp.asarray(5000.0),
                                       jnp.asarray(False), CFG))
        near = float(enter_probability(jnp.asarray(100.0),
                                       jnp.asarray(False), CFG))
        assert near == pytest.approx(0.0, abs=1e-6)
        assert deep == CFG.cost_enter_max or deep > 6.0

    def test_enter_penalty_free(self):
        got = float(enter_probability(jnp.asarray(5000.0),
                                      jnp.asarray(True), CFG))
        assert got == 0.0

    def test_exit_costs(self):
        near = float(exit_cost(jnp.asarray(100.0), jnp.asarray(10.0), CFG))
        deep = float(exit_cost(jnp.asarray(5000.0), jnp.asarray(10.0), CFG))
        assert deep >= near
        # invisible point exits freely (ref :2296)
        free = float(exit_cost(jnp.asarray(-100.0), jnp.asarray(10.0), CFG))
        assert free == 0.0


class TestConnectivity:
    def test_gate(self):
        a = jnp.zeros(3)
        b = jnp.asarray([1000.0, 0, 0])
        ok = tracklet_connectivity(a, b, 1.0, 1.0, 1, CFG)
        assert bool(ok)  # 1000 < 1500 min dist
        c = jnp.asarray([3000.0, 0, 0])
        assert not bool(tracklet_connectivity(a, c, 1.0, 1.0, 1, CFG))
        # time gap > 1 always passes (ref :793)
        assert bool(tracklet_connectivity(a, c, 1.0, 1.0, 3, CFG))


class TestWindowScorer:
    def test_smooth_straight_track_scores_well(self):
        cams = stack_cameras(ring_cameras(2, image_size=(256, 192)))
        n, w, c = 2, 12, 2
        t = np.arange(w, dtype=np.float32)
        pts = np.zeros((n, w, 3), np.float32)
        pts[:, :, 0] = t[None] * 200.0       # 200 mm/frame straight walk
        raw = np.repeat(pts[:, :, None, :], c, axis=2)
        raw[:, :, 0, 0] += 20.0              # small per-camera scatter
        raw[:, :, 1, 0] -= 20.0
        rmask = np.ones((n, w, c), bool)
        merr = np.full((n, w), 1000.0, np.float32)
        lens = np.asarray([w, 5], np.int32)
        res = score_track_windows(jnp.asarray(pts), jnp.asarray(raw),
                                  jnp.asarray(rmask), jnp.asarray(merr),
                                  jnp.asarray(lens), cams, CFG)
        assert bool(res.valid[0])
        # smoothing preserves a straight line
        np.testing.assert_allclose(np.asarray(res.smoothed[0, :, 0]),
                                   pts[0, :, 0], atol=2.0)
        # costs finite and negative-log-likelihood-ish
        assert np.isfinite(float(res.window_cost[0]))
