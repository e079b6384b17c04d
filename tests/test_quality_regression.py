"""Quality regression: the full pipeline must hold a MOTA floor on a
noisy multi-camera scenario, and deferred-output windows must not hurt
accuracy (the reference's evaluation protocol, Associator3D.cpp:282-286).

Thresholds are set well below the measured round-1 numbers
(window 6: MOTA 0.93 / recall 0.97 — see STATUS.md) so environmental
jitter doesn't flake the suite, while real regressions still trip it.
"""

import numpy as np
import pytest

from mcmtt_opticalflow_tpu.config import (EngineConfig, SolverConfig,
                                          Tracker2DConfig)
from mcmtt_opticalflow_tpu.data import make_scenario
from mcmtt_opticalflow_tpu.eval import ClearMotAccumulator
from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine

W, H = 384, 288


@pytest.fixture(scope="module")
def results():
    sc = make_scenario(num_cameras=3, num_frames=22, num_people=4,
                       image_size=(W, H), arena=3500.0, seed=3,
                       fp_rate=0.2, fn_rate=0.05, noise_px=1.0)
    cfg = EngineConfig(
        num_cameras=3, image_width=W, image_height=H,
        tracker2d=Tracker2DConfig(max_detections=16, max_trackers=32,
                                  max_features=16, lk_window=12,
                                  lk_pyramid_levels=2, lk_iterations=8),
        solver=SolverConfig(num_replicas=4, max_vertices=128,
                            solutions_per_replica=8, max_iterations=300,
                            solve_batch=8))
    eng = TrackingEngine(cfg, sc.cameras)
    gx, gy = sc.gt_matrices()
    zone = (-9000.0, -9000.0, 9000.0, 9000.0)
    accs = {w: ClearMotAccumulator(gx, gy, zone) for w in (0, 5)}
    for t in range(sc.num_frames):
        eng.process_frame(np.stack(sc.frames(t)), sc.detections[t],
                          frame_idx=t)
        for w, acc in accs.items():
            td = t - w
            if td >= 0:
                rr = eng.deferred_result(td)
                acc.set_result(td, [(i, p[0], p[1])
                                    for i, p in zip(rr.ids, rr.points)])
    return {w: acc.evaluate() for w, acc in accs.items()}


class TestQualityRegression:
    def test_mota_floor(self, results):
        assert results[5].mota > 0.55, results[5].summary()

    def test_recall_and_precision(self, results):
        assert results[5].recall > 0.7, results[5].summary()
        assert results[5].precision > 0.8, results[5].summary()

    def test_deferred_window_improves(self, results):
        # the deferred window lets the MHT revise early mistakes
        assert results[5].mota >= results[0].mota - 0.05, (
            results[0].summary(), results[5].summary())

    def test_mostly_tracked(self, results):
        assert results[5].most_tracked >= 2, results[5].summary()
        assert results[5].most_lost <= 1, results[5].summary()
