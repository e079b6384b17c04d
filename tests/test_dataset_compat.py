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
