"""Drop-in dataset compatibility: write a scenario to disk in the
reference's exact file layout (View_%03d/detectionResult/frame_%04d.txt,
calibration XML, groundTruth/cropped.txt), then run the engine purely from
those files — what a user of the reference would do when switching over.

Also stresses the MHT under detector noise (FP/FN) and enter/exit.
"""

import os

import numpy as np
import pytest

from mcmtt_opticalflow_tpu.config import (EngineConfig, SolverConfig,
                                          Tracker2DConfig)
from mcmtt_opticalflow_tpu.data import (make_scenario, read_detection_file,
                                        read_ground_truth, read_tsai_xml,
                                        write_detection_file,
                                        write_ground_truth)
from mcmtt_opticalflow_tpu.data.synthetic import ring_cameras
from mcmtt_opticalflow_tpu.data.pets import write_tsai_xml
from mcmtt_opticalflow_tpu.eval import ClearMotAccumulator
from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine

W, H = 256, 192
ZONE = (-10000.0, -10000.0, 10000.0, 10000.0)


def small_engine(cams, num_cams=2):
    cfg = EngineConfig(
        num_cameras=num_cams, image_width=W, image_height=H,
        tracker2d=Tracker2DConfig(max_detections=16, max_trackers=32,
                                  max_features=16, lk_window=8,
                                  lk_pyramid_levels=2, lk_iterations=6),
        solver=SolverConfig(num_replicas=4, max_vertices=64,
                            solutions_per_replica=8, max_iterations=200,
                            solve_batch=4))
    return TrackingEngine(cfg, cams)


class TestDatasetDir:
    def test_run_from_reference_layout(self, tmp_path):
        sc = make_scenario(num_cameras=2, num_frames=8, num_people=3,
                           image_size=(W, H), arena=4000.0, seed=13)
        root = str(tmp_path)
        cam_ids = [1, 5]
        # --- write the dataset in the reference's layout ----------------
        # Tsai extrinsics are recovered from the synthetic ring geometry
        import math
        for ci, cid in enumerate(cam_ids):
            cam = sc.cameras[ci]
            # recover euler angles from the rotation matrix (ZYX, as built)
            ry = math.asin(-float(cam.r31))
            rx = math.atan2(float(cam.r32), float(cam.r33))
            rz = math.atan2(float(cam.r21), float(cam.r11))
            write_tsai_xml(os.path.join(root, "calibrationInfos",
                                        f"View_{cid:03d}.xml"),
                           cam, rx=rx, ry=ry, rz=rz)
        for t in range(sc.num_frames):
            for ci, cid in enumerate(cam_ids):
                write_detection_file(
                    os.path.join(root, f"View_{cid:03d}", "detectionResult",
                                 f"frame_{t:04d}.txt"),
                    sc.detections[t][ci])
        gx, gy = sc.gt_matrices()
        write_ground_truth(os.path.join(root, "groundTruth", "cropped.txt"),
                           gx, gy)

        # --- load everything back through the readers --------------------
        cams = [read_tsai_xml(os.path.join(
            root, "calibrationInfos", f"View_{cid:03d}.xml"))
            for cid in cam_ids]
        gx2, gy2 = read_ground_truth(
            os.path.join(root, "groundTruth", "cropped.txt"))
        np.testing.assert_allclose(gx2, gx, atol=1e-2)

        eng = small_engine(cams)
        acc = ClearMotAccumulator(gx2, gy2, ZONE)
        for t in range(sc.num_frames):
            dets = [read_detection_file(os.path.join(
                root, f"View_{cid:03d}", "detectionResult",
                f"frame_{t:04d}.txt"))[0] for cid in cam_ids]
            frames = np.stack(sc.frames(t))   # images aren't shipped; render
            r = eng.process_frame(frames, dets, frame_idx=t)
            acc.set_result(t, [(i, p[0], p[1])
                               for i, p in zip(r.ids, r.points)])
        res = acc.evaluate()
        assert res.recall > 0.4, res.summary()


class TestSideMapFiles:
    def test_round_trip(self, tmp_path):
        from mcmtt_opticalflow_tpu.geometry.sidemaps import (
            read_sidemap_txt, write_sidemap_txt)
        m = np.linspace(0, 50, 12, dtype=np.float32).reshape(3, 4)
        p = str(tmp_path / "ProjectionSensitivity_View001.txt")
        write_sidemap_txt(p, m)
        # header format matches the reference's fscanf pattern
        assert open(p).readline() == "row:3,col:4\n"
        np.testing.assert_allclose(read_sidemap_txt(p), m, atol=1e-5)

    def test_engine_uses_loaded_maps(self, tmp_path):
        """A reference-layout dataset with precomputed map files runs with
        those maps (ref PSNWhere.cpp:489-573)."""
        from mcmtt_opticalflow_tpu.geometry.sidemaps import (
            load_or_compute_sidemaps, write_sidemap_txt)
        sc = make_scenario(num_cameras=2, num_frames=2, num_people=2,
                           image_size=(W, H), arena=4000.0, seed=3)
        root = str(tmp_path)
        cam_ids = [1, 5]
        os.makedirs(os.path.join(root, "calibrationInfos"))
        # export full-resolution maps with a recognisable offset so we can
        # tell loaded from computed
        for cid in cam_ids:
            write_sidemap_txt(
                os.path.join(root, "calibrationInfos",
                             f"ProjectionSensitivity_View{cid:03d}.txt"),
                np.full((H, W), 7.25, np.float32))
            write_sidemap_txt(
                os.path.join(root, "calibrationInfos",
                             f"DistanceFromBoundary_View{cid:03d}.txt"),
                np.full((H, W), 123.0, np.float32))
        sidemaps = [load_or_compute_sidemaps(c, W, H, 4, dataset_path=root,
                                             cam_id=cid)
                    for c, cid in zip(sc.cameras, cam_ids)]
        assert sidemaps[0][2] == 1          # loaded => full-res stride
        eng = TrackingEngine(small_engine(sc.cameras).cfg, sc.cameras,
                             sidemaps=sidemaps)
        assert float(eng.assoc.sens_maps[0][0, 0]) == 7.25
        assert eng.assoc._sensitivity_at(0, np.asarray([10.0, 10.0])) == 7.25
        assert eng.assoc._distance_from_boundary(
            np.asarray([[0.0, 0.0, 0.0]])) == 123.0
        # absent files fall back to computed maps at the requested stride
        nomap = load_or_compute_sidemaps(sc.cameras[0], W, H, 4,
                                         dataset_path=str(tmp_path / "x"),
                                         cam_id=1)
        assert nomap[2] == 4


class TestImageIngest:
    def test_image_round_trip(self, tmp_path):
        from mcmtt_opticalflow_tpu.data import read_image, write_image
        rgb = (np.random.RandomState(0).rand(24, 32, 3) * 255).astype(
            np.uint8)
        p_png = str(tmp_path / "a.png")
        write_image(p_png, rgb)
        np.testing.assert_array_equal(read_image(p_png), rgb)
        p_ppm = str(tmp_path / "a.ppm")
        write_image(p_ppm, rgb)
        from mcmtt_opticalflow_tpu.data.images import _read_ppm
        np.testing.assert_array_equal(_read_ppm(p_ppm), rgb)

    def test_dataset_run_on_real_pixels(self, tmp_path):
        """Full pipeline from a reference-layout tree INCLUDING jpeg
        frames: LK must see real pixels and produce non-trivial tracklets
        (ref frame grabbing, main.cpp:128-151)."""
        from mcmtt_opticalflow_tpu.data import FrameSource, write_image
        sc = make_scenario(num_cameras=2, num_frames=8, num_people=3,
                           image_size=(W, H), arena=4000.0, seed=13)
        root = str(tmp_path)
        cam_ids = [1, 5]
        for t in range(sc.num_frames):
            imgs = sc.frames(t)
            for ci, cid in enumerate(cam_ids):
                rgb = (np.clip(imgs[ci], 0, 1) * 255 + 0.5).astype(np.uint8)
                os.makedirs(os.path.join(root, f"View_{cid:03d}"),
                            exist_ok=True)
                write_image(os.path.join(root, f"View_{cid:03d}",
                                         f"frame_{t:04d}.jpg"), rgb)
        src = FrameSource(root, cam_ids, W, H)
        f0 = src(0)
        assert f0.shape == (2, H, W, 3) and f0.std() > 1.0, \
            "frames must carry real pixel content"
        eng = small_engine(sc.cameras)
        for t in range(sc.num_frames):
            dets = sc.detections[t]
            r = eng.process_frame(src(t), dets, frame_idx=t)
        # LK on real (jpeg-compressed) pixels produced persistent tracklets
        durs = [tk.duration for cam in eng.assoc.tracklets
                for tk in cam.values()]
        assert durs and max(durs) >= 4, durs
        assert r.points.shape[0] >= 1

    def test_missing_frames_fall_back_to_gray(self, tmp_path):
        from mcmtt_opticalflow_tpu.data import FrameSource
        src = FrameSource(str(tmp_path), [1], 16, 12)
        f = src(0)
        assert f.shape == (1, 12, 16, 3) and (f == 128).all()


class TestNoiseRobustness:
    def test_fp_fn_noise(self):
        sc = make_scenario(num_cameras=3, num_frames=10, num_people=3,
                           image_size=(W, H), arena=4000.0, seed=21,
                           fp_rate=0.3, fn_rate=0.1, noise_px=1.5)
        eng = small_engine(sc.cameras, num_cams=3)
        gx, gy = sc.gt_matrices()
        acc = ClearMotAccumulator(gx, gy, ZONE)
        for t in range(sc.num_frames):
            r = eng.process_frame(np.stack(sc.frames(t)), sc.detections[t],
                                  frame_idx=t)
            acc.set_result(t, [(i, p[0], p[1])
                               for i, p in zip(r.ids, r.points)])
        res = acc.evaluate()
        # MHT should still track most people despite 30% FP / 10% FN
        assert res.recall > 0.35, res.summary()
        assert res.precision > 0.5, res.summary()

    def test_enter_exit(self):
        sc = make_scenario(num_cameras=2, num_frames=14, num_people=4,
                           image_size=(W, H), arena=4000.0, seed=31,
                           enter_exit=True)
        eng = small_engine(sc.cameras)
        gx, gy = sc.gt_matrices()
        acc = ClearMotAccumulator(gx, gy, ZONE)
        for t in range(sc.num_frames):
            r = eng.process_frame(np.stack(sc.frames(t)), sc.detections[t],
                                  frame_idx=t)
            acc.set_result(t, [(i, p[0], p[1])
                               for i, p in zip(r.ids, r.points)])
        res = acc.evaluate()
        assert res.recall > 0.3, res.summary()
