"""Top-level tracking engine — the redesign of the reference orchestrator
CPSNWhere (psn_where/PSNWhere.h:11-57, PSNWhere.cpp:243-283).

Per frame:
  1. camera-batched 2D tracklet step (one vmapped device program replacing
     the OpenMP per-camera fan-out, ref PSNWhere.cpp:257-266 — results are
     indexed by camera, fixing the reference's completion-order race)
  2. 3D MHT association step
  3. optional deferred CLEAR-MOT evaluation feed (ref Associator3D.cpp:507-512)
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mcmtt_opticalflow_tpu.config import EngineConfig
from mcmtt_opticalflow_tpu.geometry.tsai import TsaiCamera, stack_cameras
from mcmtt_opticalflow_tpu.models.associator3d import (Associator3D,
                                                       Track3DResult)
from mcmtt_opticalflow_tpu.models.tracker2d import (init_tracker2d_state,
                                                    make_tracker2d_step)


class TrackingEngine:
    def __init__(self, cfg: EngineConfig, cameras: Sequence[TsaiCamera],
                 pipelined: bool = False, sidemaps=None, mesh=None):
        """pipelined=True overlaps the device 2D stage of frame t+1 with
        the host-side 3D association of frame t (the frame-pipeline axis of
        SURVEY.md §2's parallelism table; the reference is strictly
        sequential per frame).  Results then trail the input by one frame:
        process_frame(t) returns the frame t-1 result (None at t=0); call
        flush() after the last frame for the final one.

        sidemaps: optional per-camera (sensitivity, boundary, stride)
        triples (see Associator3D).

        mesh: optional ('cam', 'block') jax.sharding.Mesh.  The camera
        axis of the 2D stage shards over 'cam' (the TPU replacement for
        the reference's per-camera OpenMP fan-out, ref PSNWhere.cpp:257);
        the 3D stage's track/hypothesis batches shard over all devices
        (see Associator3D)."""
        assert len(cameras) == cfg.num_cameras
        self.cfg = cfg
        self.cameras = list(cameras)
        self.cams = stack_cameras(cameras)
        self.step2d = make_tracker2d_step(cfg.tracker2d, multi_camera=True)
        self.state2d = init_tracker2d_state(
            cfg.tracker2d, cfg.image_height, cfg.image_width,
            num_cameras=cfg.num_cameras)
        self.mesh = mesh
        self._s_cam = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            assert cfg.num_cameras % mesh.shape["cam"] == 0, \
                (cfg.num_cameras, dict(mesh.shape))
            self._s_cam = NamedSharding(mesh, P("cam"))
            self.cams = jax.tree.map(
                lambda x: jax.device_put(x, self._s_cam), self.cams)
            self.state2d = jax.tree.map(
                lambda x: jax.device_put(
                    x, self._s_cam if x.ndim > 0 else
                    NamedSharding(mesh, P())), self.state2d)
        self.assoc = Associator3D(cfg, cameras, sidemaps=sidemaps,
                                  mesh=mesh)
        # Only GRAY frames cross the host-device boundary, as uint8 — 12x
        # less tunnel traffic than f32 RGB.  Computing gray on device was
        # tried and reverted: the axon tunnel is bandwidth-poor, so the
        # 3x-bigger RGB upload cost ~50 ms/frame against ~9 ms of host
        # gray math.  8-bit gray matches the reference, whose cvtColor
        # produces CV_8U gray from 8-bit JPEGs (ref Tracker2D.cpp:256-262).
        self._dequant = jax.jit(
            lambda u8: u8.astype(jnp.float32) * jnp.float32(1.0 / 255.0))
        self.frame_idx = -1
        self.results: List[Track3DResult] = []
        self.timing: List[float] = []
        self.pipelined = pipelined
        self._pending = None   # (frame_idx, out2d device arrays, host rgb u8)

    def _put_cam(self, x):
        """Upload a camera-leading host array (sharded over 'cam' when a
        mesh is active)."""
        a = jnp.asarray(x)
        if self._s_cam is not None:
            a = jax.device_put(a, self._s_cam)
        return a

    def _pad_detections(self, detections):
        c = self.cfg.num_cameras
        d = self.cfg.tracker2d.max_detections
        boxes = np.zeros((c, d, 4), np.float32)
        mask = np.zeros((c, d), bool)
        for ci in range(c):
            det = np.asarray(detections[ci], np.float32).reshape(-1, 4)
            n = min(len(det), d)
            boxes[ci, :n] = det[:n]
            mask[ci, :n] = True
        return boxes, mask

    def process_frame(self, frames_rgb: np.ndarray,
                      detections: Sequence[np.ndarray],
                      frame_idx: Optional[int] = None) -> Track3DResult:
        """Args:
          frames_rgb: [C, H, W, 3] images — uint8 in [0, 255] (preferred;
            this is what dataset JPEGs decode to) or float in [0, 1]
            (quantised to uint8 on the host before upload).
          detections: per camera [K_c, 4] (x, y, w, h) arrays.
        """
        t0 = time.perf_counter()
        self.frame_idx = self.frame_idx + 1 if frame_idx is None else frame_idx
        boxes, mask = self._pad_detections(detections)
        # one upload per frame: 8-bit gray goes up for the LK stage; RGB
        # stays on host for appearance ingest
        f = np.asarray(frames_rgb)
        with self.assoc.timer.stage("gray"):
            if f.dtype != np.uint8:
                f = (np.clip(f, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
            gray_u8 = ((f[..., 0].astype(np.uint16) + f[..., 1] + f[..., 2])
                       // 3).astype(np.uint8)
        with self.assoc.timer.stage("upload"):
            gray = self._dequant(self._put_cam(gray_u8))

        with self.assoc.timer.stage("tracker2d"):
            # dispatch is async: the device chews on this frame's 2D stage
            # while (in pipelined mode) the host associates the previous one
            self.state2d, out2d = self.step2d(
                self.state2d, gray, self._put_cam(boxes),
                self._put_cam(mask), self.cams, jnp.int32(self.frame_idx))

        if self.pipelined:
            # start the device->host copy of this frame's 2D outputs NOW:
            # by the time next frame's _associate fetches them, the bytes
            # are already on the host (the fetch otherwise pays a full
            # tunnel round trip, ~50 ms on axon)
            for a in (out2d.ids, out2d.boxes, out2d.mask):
                try:
                    a.copy_to_host_async()
                except AttributeError:
                    break
            prev, self._pending = self._pending, (self.frame_idx, out2d, f)
            if prev is None:
                return None
            prev_idx, prev_out, prev_rgb = prev
            result = self._associate(prev_idx, prev_out, prev_rgb)
        else:
            result = self._associate(self.frame_idx, out2d, f)
        result.processing_time = time.perf_counter() - t0
        self.timing.append(result.processing_time)
        self.results.append(result)
        return result

    def _associate(self, frame_idx, out2d, rgb_dev) -> Track3DResult:
        with self.assoc.timer.stage("get2d"):
            from mcmtt_opticalflow_tpu.parallel.mesh import fetch
            ids_np, boxes_np, mask_np = fetch(
                (out2d.ids, out2d.boxes, out2d.mask))
        return self.assoc.step(frame_idx, ids_np, boxes_np, mask_np, rgb_dev)

    def flush(self) -> Optional[Track3DResult]:
        """Drain the pipelined tail: associate the last submitted frame."""
        if self._pending is None:
            return None
        prev_idx, prev_out, prev_rgb = self._pending
        self._pending = None
        result = self._associate(prev_idx, prev_out, prev_rgb)
        self.results.append(result)
        return result

    def deferred_result(self, frame_idx: int) -> Track3DResult:
        return self.assoc.result_at(frame_idx)
