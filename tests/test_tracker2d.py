"""2D tracker end-to-end on a small synthetic scenario: config 1/2 of
BASELINE.json (single-camera LK tracklet generation + full 2D tracker)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcmtt_opticalflow_tpu.config import Tracker2DConfig
from mcmtt_opticalflow_tpu.data import make_scenario
from mcmtt_opticalflow_tpu.models import (
    init_tracker2d_state, make_tracker2d_step)


CFG = Tracker2DConfig(max_detections=16, max_trackers=32, max_features=16,
                      lk_window=8, lk_pyramid_levels=2, lk_iterations=8)


def pad_dets(boxes, cap):
    out = np.zeros((cap, 4), np.float32)
    mask = np.zeros((cap,), bool)
    n = min(len(boxes), cap)
    out[:n] = boxes[:n]
    mask[:n] = True
    return out, mask


@pytest.fixture(scope="module")
def scenario():
    return make_scenario(num_cameras=1, num_frames=8, num_people=3,
                         image_size=(256, 192), arena=4000.0, seed=3)


@pytest.fixture(scope="module")
def run_result(scenario):
    sc = scenario
    cam = sc.cameras[0]
    step = make_tracker2d_step(CFG)
    state = init_tracker2d_state(CFG, 192, 256)
    outs = []
    for t in range(sc.num_frames):
        gray = jnp.asarray(sc.render_frame(t, 0).mean(-1))
        det, mask = pad_dets(sc.detections[t][0], CFG.max_detections)
        state, out = step(state, gray, jnp.asarray(det), jnp.asarray(mask),
                          cam, jnp.int32(t))
        outs.append(out)
    return outs


class TestTracker2D:
    def test_emits_tracklets(self, run_result, scenario):
        # after the first frame every valid detection should have a tracklet
        out = run_result[0]
        n_det = int(np.asarray(out.det_mask).sum())
        n_obj = int(np.asarray(out.mask).sum())
        assert n_det >= 2          # people are visible
        assert n_obj == n_det      # each spawns a tracker

    def test_ids_persist_across_frames(self, run_result):
        # tracked people should keep their tracker ids from frame 1 to 2
        ids0 = set(np.asarray(run_result[1].ids)[np.asarray(run_result[1].mask)])
        ids1 = set(np.asarray(run_result[2].ids)[np.asarray(run_result[2].mask)])
        assert len(ids0 & ids1) >= 2, (ids0, ids1)

    def test_boxes_follow_detections(self, run_result, scenario):
        # emitted boxes coincide with this frame's detections (matched case)
        for t in [2, 4]:
            out = run_result[t]
            boxes = np.asarray(out.boxes)[np.asarray(out.mask)]
            dets = scenario.detections[t][0]
            for b in boxes:
                d = np.abs(dets[:, :2] - b[:2]).sum(-1).min() if len(dets) else 1e9
                assert d < 1.0

    def test_max_tracklet_length_respected(self, run_result):
        # ids must rotate: with max length 3+1 no id may persist more than
        # max_tracklet_length+1 consecutive frames
        seen = {}
        for t, out in enumerate(run_result):
            for i in np.asarray(out.ids)[np.asarray(out.mask)]:
                seen.setdefault(int(i), []).append(t)
        for i, ts in seen.items():
            assert len(ts) <= CFG.max_tracklet_length + 2, (i, ts)

    def test_height_estimates_sane(self, run_result, scenario):
        out = run_result[3]
        mask = np.asarray(out.mask)
        h = np.asarray(out.heights)[mask]
        assert ((h > 1300) & (h < 2400)).all()

    def test_locations_near_gt(self, run_result, scenario):
        out = run_result[3]
        mask = np.asarray(out.mask)
        locs = np.asarray(out.locations)[mask][:, :2]
        gt = scenario.gt_xy[3]
        gt = gt[~np.isnan(gt[:, 0])]
        for l in locs:
            d = np.linalg.norm(gt - l, axis=-1).min()
            assert d < 500.0, (l, gt)
