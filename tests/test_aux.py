"""Auxiliary subsystem tests: checkpoint/resume, viz, config, data IO,
timing, experiment runner."""

import os

import numpy as np
import pytest

from mcmtt_opticalflow_tpu.config import (EngineConfig, Tracker2DConfig,
                                          SolverConfig, parse_parameters_txt)
from mcmtt_opticalflow_tpu.data import (make_scenario, write_detection_file,
                                        read_detection_file,
                                        write_ground_truth, read_ground_truth)
from mcmtt_opticalflow_tpu.data.pets import write_tsai_xml, read_tsai_xml
from mcmtt_opticalflow_tpu.utils import StageTimer, generate_colors
from mcmtt_opticalflow_tpu.viz import (draw_overlay, tile_frames, save_ppm,
                                       draw_top_view)


class TestConfig:
    def test_json_round_trip(self):
        cfg = EngineConfig(num_cameras=3, cam_ids=(1, 5, 7))
        cfg2 = EngineConfig.from_json(cfg.to_json())
        assert cfg2.num_cameras == 3
        assert cfg2.resolved_cam_ids() == (1, 5, 7)
        assert cfg2.assoc3d.max_moving_speed == cfg.assoc3d.max_moving_speed

    def test_parameters_txt(self):
        text = ("% comment\nNUM_EXPERIMENTS=2\nSTART_FRAME_IDX=0\n"
                "SIZE_OF_KS=1,5,10\nDATASET_PATH=D:/data\n")
        p = parse_parameters_txt(text)
        assert p["NUM_EXPERIMENTS"] == 2
        assert p["SIZE_OF_KS"] == [1, 5, 10]
        assert p["DATASET_PATH"] == "D:/data"


class TestDataIO:
    def test_detection_round_trip(self, tmp_path):
        boxes = np.asarray([[10.0, 20.0, 30.0, 60.0],
                            [100.0, 120.0, 25.0, 50.0]], np.float32)
        path = str(tmp_path / "frame_0000.txt")
        write_detection_file(path, boxes)
        out, parts = read_detection_file(path)
        np.testing.assert_allclose(out, boxes, rtol=1e-5)
        assert parts is not None and parts.shape == (2, 8, 4)

    def test_missing_detection_file(self, tmp_path):
        out, parts = read_detection_file(str(tmp_path / "nope.txt"))
        assert out.shape == (0, 4)

    def test_gt_round_trip(self, tmp_path):
        x = np.random.RandomState(0).rand(5, 3) * 100
        y = np.random.RandomState(1).rand(5, 3) * 100
        path = str(tmp_path / "groundTruth" / "cropped.txt")
        write_ground_truth(path, x, y)
        x2, y2 = read_ground_truth(path)
        np.testing.assert_allclose(x2, x, atol=1e-3)
        np.testing.assert_allclose(y2, y, atol=1e-3)

    def test_tsai_xml_round_trip(self, tmp_path):
        from mcmtt_opticalflow_tpu.geometry import TsaiCamera, image_to_world
        import jax.numpy as jnp
        cam = TsaiCamera.create(
            width=768, height=576, dpx=0.0083, dpy=0.0083, focal=8.0,
            kappa1=1e-6, cx=384.0, cy=288.0, sx=1.0,
            tx=100.0, ty=-11000.0, tz=8000.0, rx=2.4, ry=0.2, rz=0.3)
        path = str(tmp_path / "cam.xml")
        write_tsai_xml(path, cam, rx=2.4, ry=0.2, rz=0.3)
        cam2 = read_tsai_xml(path)
        p = jnp.asarray([400.0, 300.0])
        w1 = np.asarray(image_to_world(cam, p, 0.0))
        w2 = np.asarray(image_to_world(cam2, p, 0.0))
        np.testing.assert_allclose(w1, w2, atol=1.0)


class TestCheckpoint:
    def test_snapshot_resume(self, tmp_path):
        from mcmtt_opticalflow_tpu.checkpoint import (save_snapshot,
                                                      load_snapshot)
        from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine
        sc = make_scenario(num_cameras=2, num_frames=6, num_people=2,
                           image_size=(128, 96), arena=3000.0, seed=5)
        cfg = EngineConfig(
            num_cameras=2, image_width=128, image_height=96,
            tracker2d=Tracker2DConfig(max_detections=8, max_trackers=16,
                                      max_features=16, lk_window=8,
                                      lk_pyramid_levels=2, lk_iterations=4),
            solver=SolverConfig(num_replicas=2, max_vertices=32,
                                solutions_per_replica=4, max_iterations=100))
        eng = TrackingEngine(cfg, sc.cameras)
        for t in range(3):
            eng.process_frame(np.stack(sc.frames(t)), sc.detections[t],
                              frame_idx=t)
        path = str(tmp_path / "snap.pkl")
        save_snapshot(eng, path)
        n_tracks = len(eng.assoc.registry.tracks)

        eng2 = TrackingEngine(cfg, sc.cameras)
        saved_frame = load_snapshot(eng2, path)
        assert saved_frame == 2
        assert len(eng2.assoc.registry.tracks) == n_tracks
        assert eng2.assoc.best_solution == eng.assoc.best_solution
        # resumed engine continues
        r = eng2.process_frame(np.stack(sc.frames(3)), sc.detections[3],
                               frame_idx=3)
        assert r.frame_idx == 3

    def test_snapshot_restores_results_for_deferred_eval(self, tmp_path):
        """A resumed engine must reproduce the saved run's result history
        and deferred outputs (the reference replays results on load,
        ref Associator3D.cpp:437-445, 3948-4845)."""
        from mcmtt_opticalflow_tpu.checkpoint import (save_snapshot,
                                                      load_snapshot)
        from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine
        sc = make_scenario(num_cameras=2, num_frames=6, num_people=2,
                           image_size=(128, 96), arena=3000.0, seed=5)
        cfg = EngineConfig(
            num_cameras=2, image_width=128, image_height=96,
            tracker2d=Tracker2DConfig(max_detections=8, max_trackers=16,
                                      max_features=16, lk_window=8,
                                      lk_pyramid_levels=2, lk_iterations=4),
            solver=SolverConfig(num_replicas=2, max_vertices=32,
                                solutions_per_replica=4, max_iterations=100))
        eng = TrackingEngine(cfg, sc.cameras, pipelined=True)
        for t in range(4):
            eng.process_frame(np.stack(sc.frames(t)), sc.detections[t],
                              frame_idx=t)
        path = str(tmp_path / "snap.pkl")
        save_snapshot(eng, path)       # drains the pipeline first
        assert eng.assoc.completed_frame == 3
        assert len(eng.results) == 4

        eng2 = TrackingEngine(cfg, sc.cameras, pipelined=True)
        load_snapshot(eng2, path)
        assert eng2.assoc.completed_frame == 3
        assert len(eng2.results) == len(eng.results)
        for ra, rb in zip(eng.results, eng2.results):
            assert ra.frame_idx == rb.frame_idx
            assert ra.ids == rb.ids
        # deferred outputs reproduce exactly
        for td in range(4):
            a = eng.deferred_result(td)
            b = eng2.deferred_result(td)
            assert a.ids == b.ids
            np.testing.assert_array_equal(a.points, b.points)


class TestVizAndUtils:
    def test_overlay_and_tile(self):
        frame = np.zeros((32, 48, 3), np.float32)
        out = draw_overlay(frame, [[4, 4, 10, 12]], [3])
        assert out.sum() > 0
        tiled = tile_frames([frame, frame, frame, frame])
        assert tiled.shape == (64, 96, 3)

    def test_top_view_and_ppm(self, tmp_path):
        pts = [np.asarray([[100.0, 200.0, 0.0]]) for _ in range(5)]
        ids = [[1]] * 5
        img = draw_top_view(pts, ids, extent=1000.0, size=64)
        assert img.shape == (64, 64, 3)
        p = str(tmp_path / "x.ppm")
        save_ppm(p, img)
        assert os.path.getsize(p) > 64 * 64 * 3

    def test_flow_vectors(self):
        from mcmtt_opticalflow_tpu.viz.overlay import draw_flow_vectors
        img = np.zeros((32, 48, 3), np.float32)
        feats = np.asarray([[20.0, 10.0], [30.0, 20.0], [5.0, 5.0]])
        valid = np.asarray([True, True, False])
        out = draw_flow_vectors(img, feats, valid, np.asarray([6.0, 3.0]))
        assert out.sum() > 0 and img.sum() == 0
        # the invalid feature leaves its neighbourhood untouched
        assert out[3:8, 0:8].sum() == 0
        # vector pixels lie between prev (14, 7) and current (20, 10)
        assert out[8, 16].sum() > 0

    def test_avi_writer_clip(self, tmp_path):
        """Render a short overlay clip from a synthetic run and record it
        (ref MJPG AVI recording, PSNWhere.cpp:206-231 + 301-477)."""
        from mcmtt_opticalflow_tpu.data import make_scenario
        from mcmtt_opticalflow_tpu.viz.video import (AviWriter,
                                                     read_avi_frame_count)
        sc = make_scenario(num_cameras=2, num_frames=5, num_people=2,
                           image_size=(64, 48), seed=0)
        path = str(tmp_path / "clip.avi")
        with AviWriter(path, fps=7.0) as wr:
            for t in range(5):
                views = [draw_overlay(f, sc.detections[t][c],
                                      range(len(sc.detections[t][c])))
                         for c, f in enumerate(sc.frames(t))]
                wr.add(tile_frames(views))
        assert read_avi_frame_count(path) == 5
        data = open(path, "rb").read()
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        assert b"movi" in data and b"idx1" in data

    def test_avi_writer_raw_mode(self, tmp_path):
        from mcmtt_opticalflow_tpu.viz.video import (AviWriter,
                                                     read_avi_frame_count)
        path = str(tmp_path / "raw.avi")
        with AviWriter(path, fps=10.0, force_raw=True) as wr:
            for _ in range(3):
                wr.add(np.random.rand(24, 30, 3).astype(np.float32))
        assert read_avi_frame_count(path) == 3
        assert b"DIB " in open(path, "rb").read()[:120]

    def test_colors_distinct(self):
        c = generate_colors(16)
        assert c.shape == (16, 3)
        assert len({tuple(np.round(x, 3)) for x in c}) == 16

    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            pass
        assert "a" in t.summary()


class TestMathUtils:
    def test_nchoosek(self):
        from mcmtt_opticalflow_tpu.utils.math import nchoosek
        assert nchoosek(4, 2) == [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3],
                                  [2, 3]]
        assert nchoosek(2, 3) == []

    def test_erfc_matches_reference_series(self):
        # the reference uses a double-precision erfc series
        # (Utils.cpp:335-433); scipy is the same function
        from mcmtt_opticalflow_tpu.utils.math import erfc
        import jax.numpy as jnp
        from jax.scipy.special import erfc as jerfc
        for x in [-2.0, -0.5, 0.0, 0.3, 1.0, 2.5]:
            assert abs(float(jerfc(jnp.float32(x))) - erfc(x)) < 1e-5

    def test_histogram_channel(self):
        from mcmtt_opticalflow_tpu.utils.math import histogram_channel
        h = histogram_channel(np.asarray([0, 15, 16, 255]), 16)
        assert h[0] == 2 and h[1] == 1 and h[15] == 1


class TestResultMatrixIO:
    def test_round_trip(self, tmp_path):
        from mcmtt_opticalflow_tpu.eval import ClearMotAccumulator
        gt = np.full((4, 2), 500.0)
        acc = ClearMotAccumulator(gt, gt, (-10000, -10000, 10000, 10000))
        for t in range(4):
            acc.set_result(t, [(0, 500.0, 500.0), (3, 700.0, 900.0)])
        p = str(tmp_path / "res.txt")
        acc.save_result_matrix(p)
        acc2 = ClearMotAccumulator(gt, gt, (-10000, -10000, 10000, 10000))
        acc2.load_result_matrix(p)
        r1, r2 = acc.evaluate(), acc2.evaluate()
        assert r1.mota == pytest.approx(r2.mota)
        assert r1.missed == r2.missed


class TestTrack2DResultIO:
    def test_round_trip(self, tmp_path):
        from mcmtt_opticalflow_tpu.utils.dumps import dump_track2d_result
        from mcmtt_opticalflow_tpu.data.pets import read_track2d_result
        p = str(tmp_path / "t2d.txt")
        dump_track2d_result(p, 2, 17, np.asarray([4, 9]),
                            np.asarray([[1.0, 2, 3, 4], [5.0, 6, 7, 8]]),
                            np.asarray([True, True]),
                            np.asarray([[1.0, 2, 3, 4]]),
                            np.asarray([True]))
        cam, frame, ids, boxes = read_track2d_result(p)
        assert cam == 2 and frame == 17
        assert list(ids) == [4, 9]
        np.testing.assert_allclose(boxes[1], [5.0, 6, 7, 8])
