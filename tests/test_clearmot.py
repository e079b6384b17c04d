"""CLEAR-MOT evaluator tests on constructed toy scenarios."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from mcmtt_opticalflow_tpu.eval import (ClearMotAccumulator,
                                        evaluate_clear_mot)

ZONE = (-10000.0, -10000.0, 10000.0, 10000.0)


def make_acc(gt_x, gt_y):
    return ClearMotAccumulator(gt_x, gt_y, ZONE)


class TestClearMot:
    def test_perfect_tracking(self):
        t, p = 10, 3
        rng = np.random.RandomState(0)
        gx = rng.uniform(-5000, 5000, (t, p))
        gy = rng.uniform(-5000, 5000, (t, p))
        acc = make_acc(gx, gy)
        for ti in range(t):
            acc.set_result(ti, [(j, gx[ti, j], gy[ti, j]) for j in range(p)])
        r = acc.evaluate()
        assert r.mota == 1.0
        assert r.motp == 1.0
        assert r.id_switches == 0
        assert r.most_tracked == p
        assert r.missed == 0 and r.false_positives == 0

    def test_miss_counts(self):
        t, p = 4, 2
        gx = np.full((t, p), 1000.0); gy = np.full((t, p), 1000.0)
        gx[:, 1] = 2500.0
        acc = make_acc(gx, gy)
        for ti in range(t):
            acc.set_result(ti, [(0, 1000.0, 1000.0)])  # only person 0 tracked
        r = acc.evaluate()
        assert r.missed == t          # person 1 missed every frame
        assert r.mota == 1.0 - t / (2 * t)
        assert r.most_lost == 1
        assert r.most_tracked == 1

    def test_false_positive_counts(self):
        t = 4
        gx = np.full((t, 1), 1000.0); gy = np.full((t, 1), 1000.0)
        acc = make_acc(gx, gy)
        for ti in range(t):
            acc.set_result(ti, [(0, 1000.0, 1000.0), (7, 8000.0, 8000.0)])
        r = acc.evaluate()
        assert r.false_positives == t
        assert r.precision == 0.5

    def test_id_switch(self):
        t = 6
        gx = np.full((t, 1), 0.0); gy = np.full((t, 1), 0.0)
        gx[:, 0] = 1000.0; gy[:, 0] = 1000.0
        acc = make_acc(gx, gy)
        for ti in range(t):
            sid = 0 if ti < 3 else 5       # identity change mid-track
            acc.set_result(ti, [(sid, 1000.0, 1000.0)])
        r = acc.evaluate()
        assert r.id_switches == 1
        assert r.fragments == 0

    def test_fragmentation(self):
        t = 7
        gx = np.full((t, 1), 1000.0); gy = np.full((t, 1), 1000.0)
        acc = make_acc(gx, gy)
        for ti in range(t):
            if ti in (3,):
                acc.set_result(ti, [])     # gap
            else:
                acc.set_result(ti, [(0, 1000.0, 1000.0)])
        r = acc.evaluate()
        assert r.fragments == 1
        assert r.missed == 1

    def test_match_radius(self):
        t = 3
        gx = np.full((t, 1), 0.0); gy = np.full((t, 1), 0.0)
        gx[:, 0] = 1000.0; gy[:, 0] = 1000.0
        acc = make_acc(gx, gy)
        for ti in range(t):
            # 1500 mm away: outside the 1000 mm radius -> miss + FP
            acc.set_result(ti, [(0, 2500.0, 1000.0)])
        r = acc.evaluate()
        assert r.missed == t
        assert r.false_positives == t

    def test_motp_scales_with_error(self):
        t = 5
        gx = np.full((t, 1), 1000.0); gy = np.full((t, 1), 1000.0)
        acc = make_acc(gx, gy)
        for ti in range(t):
            acc.set_result(ti, [(0, 1500.0, 1000.0)])   # constant 500 mm error
        r = acc.evaluate()
        assert abs(r.motp - 0.5) < 1e-9

    def test_direct_matrix_api(self):
        gt_x = np.asarray([[1000.0], [1000.0]])
        gt_y = np.asarray([[1000.0], [1000.0]])
        r = evaluate_clear_mot(gt_x, gt_y, gt_x.copy(), gt_y.copy())
        assert r.mota == 1.0
