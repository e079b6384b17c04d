"""Associator3D unit tests: tracklet ingest, associability gating,
combination generation, seeds, compatibility matrix, dumps, experiment
runner (2-camera association milestone, config 3 of BASELINE.json)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mcmtt_opticalflow_tpu.config import (EngineConfig, SolverConfig,
                                          Tracker2DConfig)
from mcmtt_opticalflow_tpu.data import make_scenario
from mcmtt_opticalflow_tpu.models.associator3d import Associator3D


def small_cfg(num_cams=2, w=256, h=192):
    return EngineConfig(
        num_cameras=num_cams, image_width=w, image_height=h,
        tracker2d=Tracker2DConfig(max_detections=8, max_trackers=16,
                                  max_features=16),
        solver=SolverConfig(num_replicas=2, max_vertices=32,
                            solutions_per_replica=4, max_iterations=100,
                            solve_batch=4))


@pytest.fixture(scope="module")
def assoc_and_scenario():
    # small frames give the ring cameras a tight FOV: keep the arena small
    # so every person stays visible in both views
    sc = make_scenario(num_cameras=2, num_frames=6, num_people=3,
                       image_size=(256, 192), arena=2000.0, seed=11)
    cfg = small_cfg()
    assoc = Associator3D(cfg, sc.cameras)
    return assoc, sc


def feed_frame(assoc, sc, t, next_id=None):
    """Feed detections to the associator as if they were 2D tracker output
    (ids stable per person via GT index to keep the test deterministic)."""
    c = len(sc.cameras)
    cap = 16
    ids = np.zeros((c, cap), np.int64)
    boxes = np.zeros((c, cap, 4), np.float32)
    mask = np.zeros((c, cap), bool)
    for ci in range(c):
        dets = sc.detections[t][ci]
        for j, b in enumerate(dets[:cap]):
            ids[ci, j] = 1000 * t + j if next_id == "rotate" else j
            boxes[ci, j] = b
            mask[ci, j] = True
    rgb = jnp.asarray(np.stack(sc.frames(t)))
    return assoc.step(t, ids, boxes, mask, rgb)


class TestAssociator:
    def test_first_frame_builds_tracklets_and_seeds(self, assoc_and_scenario):
        assoc, sc = assoc_and_scenario
        r = feed_frame(assoc, sc, 0)
        # tracklets registered per camera
        n0 = len(assoc.active_tracklets[0])
        n1 = len(assoc.active_tracklets[1])
        assert n0 >= 1 and n1 >= 1 and n0 + n1 >= 3
        # seeds created: at least one per visible person, bounded by
        # combination count
        assert len(assoc.registry.tracks) >= 2
        # associability maps exist for cross-camera pairs
        tk = assoc.tracklets[0][assoc.active_tracklets[0][0]]
        assert 1 in tk.assoc

    def test_cross_camera_combination_found(self, assoc_and_scenario):
        assoc, sc = assoc_and_scenario
        # after a couple frames some track should use tracklets from BOTH
        # cameras (true cross-camera association)
        feed_frame(assoc, sc, 1)
        feed_frame(assoc, sc, 2)
        multi = [t for t in assoc.registry.tracks.values()
                 if sum(x >= 0 for x in t.combination) >= 2]
        assert multi, "no multi-camera track hypothesis was formed"

    def test_best_solution_positions_near_gt(self, assoc_and_scenario):
        assoc, sc = assoc_and_scenario
        r = feed_frame(assoc, sc, 3)
        gt = sc.gt_xy[3]
        gt = gt[~np.isnan(gt[:, 0])]
        assert len(r.ids) >= 1
        for p in r.points:
            d = np.linalg.norm(gt - p[:2], axis=-1).min()
            assert d < 600.0

    def test_gtprob_accumulated(self, assoc_and_scenario):
        assoc, sc = assoc_and_scenario
        feed_frame(assoc, sc, 4)
        probs = [t.gt_prob for t in assoc.registry.tracks.values()]
        assert any(p > 0 for p in probs)

    def test_hypotheses_sorted_and_probabilities_normalised(
            self, assoc_and_scenario):
        assoc, sc = assoc_and_scenario
        feed_frame(assoc, sc, 5)
        hyps = assoc.prev_hypotheses
        assert hyps
        lls = [h.log_likelihood for h in hyps]
        assert lls == sorted(lls, reverse=True)


class TestDumps:
    def test_dump_files(self, assoc_and_scenario, tmp_path):
        from mcmtt_opticalflow_tpu.utils.dumps import (
            dump_tracks, dump_hypotheses, dump_trees, dump_track2d_result)
        assoc, sc = assoc_and_scenario
        p1 = str(tmp_path / "tracks.txt")
        dump_tracks(p1, assoc.registry, list(assoc.registry.tracks)[:5])
        assert "costTotal" in open(p1).read()
        p2 = str(tmp_path / "hyp.txt")
        dump_hypotheses(p2, assoc.prev_hypotheses, 5)
        assert "logLikelihood" in open(p2).read()
        p3 = str(tmp_path / "trees.txt")
        dump_trees(p3, assoc.registry)
        assert "bConfirmed" in open(p3).read()
        p4 = str(tmp_path / "t2d.txt")
        dump_track2d_result(p4, 0, 5, np.asarray([1]),
                            np.asarray([[1.0, 2, 3, 4]]), np.asarray([True]),
                            np.asarray([[1.0, 2, 3, 4]]), np.asarray([True]))
        text = open(p4).read()
        assert "camIdx:0" in text and "trackerRects:1" in text


class TestExperimentRunner:
    def test_k_sweep_runs(self):
        from mcmtt_opticalflow_tpu.eval.experiment import k_sweep
        from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine
        import dataclasses

        sc = make_scenario(num_cameras=2, num_frames=5, num_people=2,
                           image_size=(128, 96), arena=3000.0, seed=2)
        gx, gy = sc.gt_matrices()
        zone = (-8000.0, -8000.0, 8000.0, 8000.0)

        def make_engine(k):
            cfg = small_cfg(2, 128, 96)
            cfg = dataclasses.replace(
                cfg, tracker2d=dataclasses.replace(
                    cfg.tracker2d, lk_window=8, lk_pyramid_levels=2,
                    lk_iterations=4),
                assoc3d=dataclasses.replace(cfg.assoc3d, k_best_size=k))
            return TrackingEngine(cfg, sc.cameras)

        results = k_sweep(make_engine, lambda t: np.stack(sc.frames(t)),
                          lambda t: sc.detections[t], sc.num_frames,
                          (gx, gy), zone, ks=[3], num_experiments=1,
                          deferred_windows=2)
        assert len(results) == 1
        assert 0 in results[0].per_window
        assert results[0].fps > 0
