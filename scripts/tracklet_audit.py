#!/usr/bin/env python
"""Audit the 2D stage's tracklet quality on the bench density scene:
per-camera detection->tracklet coverage of GT, tracklet purity (does one
id stay on one person), and length distribution.  Separates '3D stage
can't recover identity' from '2D stage never delivered the tracklets'.
"""

import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=35)
    ap.add_argument("--people", type=int, default=22)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from mcmtt_opticalflow_tpu.config import (EngineConfig, SolverConfig,
                                              Tracker2DConfig)
    from mcmtt_opticalflow_tpu.data import make_scenario
    from mcmtt_opticalflow_tpu.geometry.tsai_np import HostCamera
    from mcmtt_opticalflow_tpu.models.pipeline import TrackingEngine

    sc = make_scenario(num_cameras=4, num_frames=args.frames,
                       num_people=args.people, image_size=(768, 576),
                       arena=9000.0, noise_px=1.0, fp_rate=0.10,
                       fn_rate=0.05, seed=0)
    cfg = EngineConfig(
        num_cameras=4, image_width=768, image_height=576,
        tracker2d=Tracker2DConfig(lk_pyramid_levels=2, lk_iterations=8,
                                  max_detections=48, max_trackers=64),
        solver=SolverConfig(num_replicas=2, max_vertices=64,
                            max_iterations=20))
    eng = TrackingEngine(cfg, sc.cameras, pipelined=False)
    host_cams = [HostCamera(c) for c in sc.cameras]

    # GT feet pixels per frame/cam/person
    det_cover = np.zeros((4,))          # person-frames with a detection
    trk_cover = np.zeros((4,))          # person-frames with a tracklet box
    gt_total = np.zeros((4,))
    # tracklet -> person votes
    votes = [defaultdict(lambda: defaultdict(int)) for _ in range(4)]
    lengths = [defaultdict(int) for _ in range(4)]

    from mcmtt_opticalflow_tpu.parallel.mesh import fetch
    for t in range(sc.num_frames):
        frames = (np.clip(np.stack(sc.frames(t)), 0, 1) * 255 + 0.5
                  ).astype(np.uint8)
        boxes, mask = eng._pad_detections(sc.detections[t])
        gray = eng._upload_gray(
            ((frames[..., 0].astype(np.uint16) + frames[..., 1]
              + frames[..., 2]) // 3).astype(np.uint8))
        import jax.numpy as jnp
        eng.state2d, out2d = eng.step2d(
            eng.state2d, gray, eng._put_cam(boxes), eng._put_cam(mask),
            eng.cams, jnp.int32(t))
        ids_np, boxes_np, mask_np = fetch((out2d.ids, out2d.boxes,
                                           out2d.mask))
        for c in range(4):
            cam = host_cams[c]
            feet = {}
            for p in range(sc.num_people):
                xy = sc.gt_xy[t, p]
                if np.isnan(xy[0]):
                    continue
                f = cam.world_to_image(np.asarray([xy[0], xy[1], 0.0]))
                if not np.isfinite(f).all():
                    continue
                if 0 <= f[0] < 768 and 0 <= f[1] < 576:
                    feet[p] = f
                    gt_total[c] += 1
            # detections near GT feet
            det = np.asarray(sc.detections[t][c]).reshape(-1, 4)
            dbc = np.stack([det[:, 0] + det[:, 2] / 2,
                            det[:, 1] + det[:, 3]], -1) if len(det) else \
                np.zeros((0, 2))
            tb = boxes_np[c][mask_np[c]]
            tid = ids_np[c][mask_np[c]]
            tbc = np.stack([tb[:, 0] + tb[:, 2] / 2,
                            tb[:, 1] + tb[:, 3]], -1) if len(tb) else \
                np.zeros((0, 2))
            for p, f in feet.items():
                if len(dbc) and np.min(np.linalg.norm(dbc - f, axis=1)) < 20:
                    det_cover[c] += 1
                if len(tbc):
                    d = np.linalg.norm(tbc - f, axis=1)
                    j = int(np.argmin(d))
                    if d[j] < 20:
                        trk_cover[c] += 1
                        votes[c][int(tid[j])][p] += 1
            for i in range(len(tid)):
                lengths[c][int(tid[i])] += 1

    purity = []
    for c in range(4):
        for tid_, vs in votes[c].items():
            tot = sum(vs.values())
            purity.append(max(vs.values()) / tot)
    ln = [l for c in range(4) for l in lengths[c].values()]
    print(json.dumps({
        "gt_person_frames": gt_total.sum(),
        "det_coverage": round(float(det_cover.sum() / gt_total.sum()), 3),
        "tracklet_coverage": round(float(trk_cover.sum() / gt_total.sum()), 3),
        "tracklet_purity_mean": round(float(np.mean(purity)), 3),
        "tracklet_len_mean": round(float(np.mean(ln)), 2),
        "num_tracklets": len(ln),
    }))


if __name__ == "__main__":
    main()
