"""End-to-end pipeline test: synthetic multi-camera scenario -> 2D tracker
-> 3D MHT association -> CLEAR-MOT score (configs 3/4 of BASELINE.json)."""

import numpy as np
import pytest

from mcmtt_opticalflow_tpu.config import (EngineConfig, Tracker2DConfig,
                                          Associator3DConfig, SolverConfig)
from mcmtt_opticalflow_tpu.data import make_scenario
from mcmtt_opticalflow_tpu.eval import ClearMotAccumulator
from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine

NUM_FRAMES = 10
ARENA = 5000.0


@pytest.fixture(scope="module")
def scenario():
    return make_scenario(num_cameras=2, num_frames=NUM_FRAMES, num_people=3,
                         image_size=(256, 192), arena=ARENA, seed=11)


@pytest.fixture(scope="module")
def engine_run(scenario):
    sc = scenario
    cfg = EngineConfig(
        num_cameras=2, image_width=256, image_height=192,
        tracker2d=Tracker2DConfig(max_detections=16, max_trackers=32,
                                  max_features=16, lk_window=8,
                                  lk_pyramid_levels=2, lk_iterations=6),
        solver=SolverConfig(num_replicas=4, max_vertices=64,
                            solutions_per_replica=8, max_iterations=200),
    )
    eng = TrackingEngine(cfg, sc.cameras)
    results = []
    for t in range(sc.num_frames):
        frames = np.stack(sc.frames(t))
        dets = sc.detections[t]
        results.append(eng.process_frame(frames, dets))
    return eng, results


@pytest.mark.smoke
class TestPipelineE2E:
    def test_tracks_exist(self, engine_run):
        eng, results = engine_run
        # after warmup the best hypothesis should contain tracks
        assert any(len(r.ids) > 0 for r in results[2:])

    def test_track_count_close_to_people(self, engine_run, scenario):
        _, results = engine_run
        counts = [len(r.ids) for r in results[4:]]
        assert np.mean(counts) >= 1.5, counts
        assert max(counts) <= scenario.num_people + 2

    def test_positions_near_ground_truth(self, engine_run, scenario):
        _, results = engine_run
        errs = []
        for r in results[3:]:
            gt = scenario.gt_xy[r.frame_idx]
            gt = gt[~np.isnan(gt[:, 0])]
            for p in r.points:
                errs.append(np.linalg.norm(gt - p[:2], axis=-1).min())
        assert errs, "no tracked points"
        assert np.median(errs) < 400.0, np.median(errs)

    def test_clearmot_reasonable(self, engine_run, scenario):
        eng, results = engine_run
        gx, gy = scenario.gt_matrices()
        zone = (-ARENA * 2, -ARENA * 2, ARENA * 2, ARENA * 2)
        acc = ClearMotAccumulator(gx, gy, zone)
        for r in results:
            acc.set_result(r.frame_idx,
                           [(i, p[0], p[1]) for i, p in zip(r.ids, r.points)])
        res = acc.evaluate()
        # synthetic, near-noiseless detections: association should track
        # most people most of the time
        assert res.recall > 0.5, res.summary()
        assert res.mota > 0.0, res.summary()

    def test_deferred_results_available(self, engine_run):
        eng, _ = engine_run
        r = eng.deferred_result(NUM_FRAMES - 3)
        assert r.frame_idx == NUM_FRAMES - 3


class TestPipelinedMode:
    def test_pipelined_matches_sequential(self, scenario):
        """Frame pipelining reorders work but must not change any result."""
        import jax
        from mcmtt_opticalflow_tpu.config import (EngineConfig, SolverConfig,
                                                  Tracker2DConfig)
        sc = scenario
        cfg = EngineConfig(
            num_cameras=2, image_width=256, image_height=192,
            tracker2d=Tracker2DConfig(max_detections=16, max_trackers=32,
                                      max_features=16, lk_window=8,
                                      lk_pyramid_levels=2, lk_iterations=6),
            solver=SolverConfig(num_replicas=4, max_vertices=64,
                                solutions_per_replica=8, max_iterations=200,
                                solve_batch=4))
        seq = TrackingEngine(cfg, sc.cameras)
        pipe = TrackingEngine(cfg, sc.cameras, pipelined=True)
        seq_results, pipe_results = [], []
        for t in range(6):
            frames = np.stack(sc.frames(t))
            seq_results.append(seq.process_frame(frames, sc.detections[t],
                                                 frame_idx=t))
            r = pipe.process_frame(frames, sc.detections[t], frame_idx=t)
            if r is not None:
                pipe_results.append(r)
        while True:
            tail = pipe.flush()
            if tail is None:
                break
            pipe_results.append(tail)
        assert len(pipe_results) == len(seq_results)
        for rs, rp in zip(seq_results, pipe_results):
            assert rs.frame_idx == rp.frame_idx
            assert rs.ids == rp.ids
            np.testing.assert_allclose(rs.points, rp.points, atol=1e-4)


class TestTileDeltaUpload:
    def test_tile_upload_bitwise_equals_full_upload(self):
        """The tile-delta gray path must reproduce the full upload
        bit-for-bit (it is lossless by construction)."""
        import numpy as np
        from mcmtt_opticalflow_tpu.config import (EngineConfig,
                                                  SolverConfig,
                                                  Tracker2DConfig)
        from mcmtt_opticalflow_tpu.data import make_scenario
        from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine

        sc = make_scenario(num_cameras=2, num_frames=4, num_people=2,
                           image_size=(256, 192), arena=2000.0, seed=9)
        cfg = EngineConfig(
            num_cameras=2, image_width=256, image_height=192,
            tracker2d=Tracker2DConfig(max_detections=8, max_trackers=16,
                                      max_features=16, lk_window=8),
            solver=SolverConfig(num_replicas=2, max_vertices=32))
        eng = TrackingEngine(cfg, sc.cameras)
        assert eng._tiles_ok
        rng = np.random.RandomState(0)
        for t in range(4):
            g = (np.clip(np.stack(sc.frames(t)), 0, 1) * 255).astype(
                np.uint8).mean(-1).astype(np.uint8)
            if t == 2:   # adversarial: change >50% of pixels
                g = rng.randint(0, 255, g.shape).astype(np.uint8)
            got = np.asarray(eng._upload_gray(g))
            want = np.asarray(eng._dequant(g))
            assert got.shape == want.shape
            assert (got == want).all(), f"frame {t} mismatch"
