"""Cross-camera 3D MHT association — the TPU redesign of the reference's
CPSNWhere_Associator3D (psn_where/PSNWhere_Associator3D.cpp, ~5.2 kLoC).

Architecture: *host enumerates, device scores*.

  host   — tracklet registry, track trees, combination enumeration,
           hypothesis lists, pruning walks (variable topology);
  device — every hot loop as one batched call per frame:
             * tracklet ingest (ground points, back-projection lines,
               sensitivities, RGB histograms)          [per camera, vmapped]
             * cross-camera associability gating        (ref :1233-1268)
             * window smoothing + cost model for ALL track updates,
               branches and seeds in a single fused pass (ref :1379-2242)
             * track-pair compatibility matrix          (ref :2411-2503)
             * K-hypothesis batched-replica BLS clique solve
                                                        (ref :2663-2834)

Per-frame step order mirrors the reference's Run (ref :431-533).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mcmtt_opticalflow_tpu.config import EngineConfig
from mcmtt_opticalflow_tpu.geometry.tsai import TsaiCamera, stack_cameras
from mcmtt_opticalflow_tpu.geometry.triangulation import segments_intersect
from mcmtt_opticalflow_tpu.geometry.sidemaps import (
    projection_sensitivity_map, distance_from_boundary_map)
from mcmtt_opticalflow_tpu.models.costs import score_track_windows
from mcmtt_opticalflow_tpu.models.mwcp import (solve_mwcp, device_k_best,
                                               NEG as _SOLVER_NEG)
from mcmtt_opticalflow_tpu.models.trees import (
    Track, TrackRegistry, Tracklet, TrackTree)
from mcmtt_opticalflow_tpu.ops.sgsmooth import smoothing_matrix_np

_MAP_STRIDE = 4

from scipy.special import erfc as _erfc  # noqa: E402  (host scalar math)
from scipy.special import erfcinv as _erfcinv  # noqa: E402


def _bucket(n: int, lo: int = 8) -> int:
    """Round up to a power of two so device programs compile per bucket
    instead of per exact batch size."""
    b = lo
    while b < n:
        b *= 2
    return b


def _link_prob_batch(p1s: np.ndarray, p2s: np.ndarray, gaps: np.ndarray,
                     max_speed: float) -> np.ndarray:
    """Vectorised link probability over N candidate pairs."""
    d = np.linalg.norm(np.asarray(p1s) - np.asarray(p2s), axis=-1)
    g = np.maximum(np.asarray(gaps, np.float64), 1.0)
    return 0.5 * _erfc(4.0 * d / (max_speed * g) - 2.0)


@dataclasses.dataclass
class Hypothesis:
    """A global hypothesis (ref stGlobalHypothesis,
    PSNWhere_Associator3D.h:101-109)."""

    selected: List[int]
    related: List[int]
    log_likelihood: float
    probability: float = 0.0
    valid: bool = True


@dataclasses.dataclass
class Track3DResult:
    frame_idx: int
    ids: List[int]                    # stable ids (tree ids) per object
    track_ids: List[int]
    points: np.ndarray                # [K, 3] smoothed positions
    processing_time: float = 0.0
    # visualization payload (ref stObject3DInfo, PSNWhere_Types.h:222-227
    # + ResultWithTracks, Associator3D.cpp:3058-3168): small reusable
    # display ids and each object's recent trajectory, in 3D and
    # reprojected into every camera
    vis_ids: List[int] = dataclasses.field(default_factory=list)
    recent_points: List[np.ndarray] = dataclasses.field(
        default_factory=list)         # per object [T, 3] (newest last)
    recent_proj: List[np.ndarray] = dataclasses.field(
        default_factory=list)         # per object [C, T, 2] image coords


class Associator3D:
    def __init__(self, cfg: EngineConfig, cameras: Sequence[TsaiCamera],
                 sidemaps: Optional[Sequence[Tuple]] = None, mesh=None,
                 deferred_solve: bool = False):
        """sidemaps: optional per-camera (sensitivity_map, boundary_map,
        stride) triples — e.g. the reference's precomputed text matrices
        via geometry.sidemaps.load_or_compute_sidemaps (ref
        PSNWhere.cpp:103-122).  Default: computed from the Tsai model.

        deferred_solve: pipeline the hypothesis solve one frame deep —
        step(t) dispatches frame t's fused rescore+solve program and
        returns frame t-1's result; the fetch happens at the start of
        step(t+1), so the device solve and its (slow-tunnel) device->host
        copy run in the shadow of the next frame's host work.  The host-
        side operation sequence is IDENTICAL to the sequential mode —
        results are bit-equal, only delayed one frame (call collect()
        after the last frame for the final one).

        mesh: optional ('cam', 'block') jax.sharding.Mesh.  When given,
        the fused per-frame device program runs SPMD: the track-window
        batch, the compatibility matrix rows and the hypothesis batch are
        sharded over ALL mesh devices (host inputs are device_put with
        explicit shardings; XLA GSPMD inserts the collectives) — the
        device-parallel replacement for the reference's OpenMP hypothesis
        loop (ref PSNWhere_Associator3D.cpp:2676-2684)."""
        self.cfg = cfg
        self.acfg = cfg.assoc3d
        self.num_cams = len(cameras)
        self.cameras = list(cameras)
        self.cams = stack_cameras(cameras)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._s_rep = NamedSharding(mesh, P())
            self._s_blocks = NamedSharding(mesh, P(("cam", "block")))
            self.cams = jax.device_put(self.cams, self._s_rep)

        w, h = cfg.image_width, cfg.image_height
        if sidemaps is not None:
            assert len(sidemaps) == self.num_cams
            self.sens_maps = [np.asarray(s[0]) for s in sidemaps]
            self.bound_maps = [np.asarray(s[1]) for s in sidemaps]
            self.map_strides = [int(s[2]) for s in sidemaps]
        else:
            self.sens_maps = [np.asarray(projection_sensitivity_map(
                c, w, h, _MAP_STRIDE)) for c in cameras]
            self.bound_maps = [np.asarray(distance_from_boundary_map(
                c, w, h, _MAP_STRIDE)) for c in cameras]
            self.map_strides = [_MAP_STRIDE] * self.num_cams

        from mcmtt_opticalflow_tpu.geometry.tsai_np import HostCamera
        self.host_cams = [HostCamera(c) for c in cameras]

        self.registry = TrackRegistry()
        self.tracklets: List[Dict[int, Tracklet]] = [
            {} for _ in range(self.num_cams)]
        self.active_tracklets: List[List[int]] = [
            [] for _ in range(self.num_cams)]
        self.new_measurements: List[List[int]] = [
            [] for _ in range(self.num_cams)]

        self.active_tracks: List[int] = []
        self.paused_tracks: List[int] = []
        self._pending_rescore: List[Track] = []
        self._ut_prep = None
        self.tracks_in_window: List[int] = []
        self.prev_hypotheses: List[Hypothesis] = []
        self.best_solution: List[int] = []
        self.frame_idx = -1
        self.num_frames_proc = 0
        self.deferred_solve = deferred_solve
        # True when the engine owns the solve download (combined with the
        # 2D result into one tunnel request; see pipeline.py)
        self.external_fetch = False
        self._pending_solve: Optional[dict] = None
        # last frame whose hypothesis solve has been applied (== frame_idx
        # except between a deferred dispatch and its collect)
        self.completed_frame = -1
        # hypothesis-pool overflow accounting (the solver graph holds
        # SolverConfig.max_vertices tracks; overflow is rank-pruned, never
        # silently truncated)
        self.pool_dropped_last = 0
        self.pool_dropped_total = 0
        self.seed_combos_truncated = 0
        # admission-gate containment telemetry (see _admit_seeds)
        self.seeds_suppressed_total = 0
        # persistent (camera, tracklet id) -> integer code map for the
        # tracklet-share relation (see _track_share_codes)
        self._share_codes: Dict[Tuple[int, int], int] = {}
        # per-frame cache for the batched combination enumerator
        # (False = not built this frame; None = >64-measurement fallback)
        self._combo_tabs = False
        # per-frame diagnostic counters (cheap ints; density_lab --debug
        # prints them): track deaths by cause + population composition
        self.diag: Dict[str, int] = {}
        # tree-id -> display id map + free list (ref queuePairTreeIDToVisualizationID,
        # Associator3D.cpp:3077-3100)
        self.vis_id_map: Dict[int, int] = {}
        self.vis_free: List[int] = []
        self._gt_prob_touched: List[int] = []
        self.solver_key = jax.random.PRNGKey(cfg.solver.seed)
        # when set to a list, every frame's hypothesis graph (weights,
        # adjacency, validity, warm starts) is appended to it — the
        # recorded-graph corpus for the solver quality harness
        # (tests/test_solver_quality.py)
        self.graph_dump: Optional[List[dict]] = None
        from mcmtt_opticalflow_tpu.utils.timing import StageTimer
        self.timer = StageTimer()

        # window capacity for device scoring: covers re-smoothing reach
        self.win = max(2 * self.acfg.sg_span + 2,
                       self.acfg.proc_window_size + self.acfg.sg_span)
        # re-scoring window: the longest tail whose smoothed values can
        # change in one frame is a temporal branch's interpolated gap
        # (<= max_time_jump) plus the smoother's half-span reach and the
        # seam — everything earlier keeps its previous costs (the
        # reference re-smooths from smoother.Insert's updateStartPos,
        # ref Associator3D.cpp:1469-1473).  Smaller window = fewer f16
        # bytes over the host->device link per frame.
        self.win_rescore = min(
            self.win,
            self.acfg.max_time_jump + self.acfg.sg_span // 2 + 3)

        self._build_device_fns()

    # ------------------------------------------------------------------
    # device programs
    # ------------------------------------------------------------------
    def _build_device_fns(self):
        acfg = self.acfg

        # NOTE: device-resident arrays (the stacked cameras) must be passed
        # as ARGUMENTS, never closed over — a captured device array becomes
        # an executable-embedded constant, which forces the axon runtime to
        # synchronise EVERY subsequent dispatch in the process (~25 ms
        # each, observed; async dispatch never recovers).
        @functools.partial(jax.jit, static_argnames=())
        def score_windows(points, raw_points, raw_mask, max_error, lengths,
                          cams):
            return score_track_windows(points, raw_points, raw_mask,
                                       max_error, lengths, cams, acfg)

        self._score_windows = score_windows

        @jax.jit
        def compat_matrix(tree_ids, shared, pos_grid, have, valid):
            """[N, N] bool COMPATIBILITY (edge) matrix
            (ref CheckIncompatibility, Associator3D.cpp:2411-2503).

            `shared` [N, N] is the host-precomputed full-history tracklet-
            share relation (the reference scans each track pair's complete
            per-camera id deques, ref :2422-2466; the host builds the exact
            relation as one sparse incidence product — see _shared_matrix).

            pos_grid [N, W, 3] holds every track's positions on a COMMON
            absolute time grid (slot k = frame t0+k), have [N, W] marks
            filled slots.  Pair windows align by construction, so the
            proximity / crossing checks are pure broadcasts — no per-pair
            gathers (the previous take_along_axis formulation dominated
            the hypothesis stage at large pools)."""
            n = tree_ids.shape[0]
            same_tree = tree_ids[:, None] == tree_ids[None, :]
            incompat = same_tree | shared

            use = have[:, None, :] & have[None, :, :]          # [N, N, W]
            pi = pos_grid[:, None]                             # [N, 1, W, 3]
            pj = pos_grid[None, :]                             # [1, N, W, 3]
            dist = jnp.linalg.norm(pi - pj, axis=-1)           # [N, N, W]
            # the reference skips BOTH checks when the tracks are far apart
            # at that instant (`> MAX_MOVING_SPEED * 2` continue, ref :2489)
            near = dist <= 2.0 * acfg.max_moving_speed
            too_close = jnp.any(use & (dist < acfg.min_target_proximity), -1)
            cross = segments_intersect(pi[..., :-1, :2], pi[..., 1:, :2],
                                       pj[..., :-1, :2], pj[..., 1:, :2])
            crossing = jnp.any(cross & near[..., :-1]
                               & use[..., :-1] & use[..., 1:], -1)
            incompat = incompat | too_close | crossing
            compat = ~incompat & valid[:, None] & valid[None, :]
            return compat & ~jnp.eye(n, dtype=bool)

        self._compat_matrix = compat_matrix

        # ONE MWCP instance per frame, with every carried hypothesis warm-
        # starting one replica: base exploration replicas + k_best_size
        # warm slots.  The replica count is static, so the fused program
        # compiles once — the reference instead solves K instances on
        # OpenMP threads (ref Associator3D.cpp:2676-2684), whose device
        # equivalent (a K-batched solve) costs K-fold compute for the same
        # merged-local-optima K-best list.
        solver_cfg = dataclasses.replace(
            self.cfg.solver,
            num_replicas=self.cfg.solver.num_replicas
            + self.acfg.k_best_size)
        self._solver_cfg_fused = solver_cfg

        @functools.partial(jax.jit, static_argnames=("iters",))
        def rescore_and_solve(pts, raws, rmask, merr, lens, cams,
                              row_map, host_base,
                              tree_ids, shared, pos_grid, have, pvalid,
                              init_masks, key, iters):
            """ONE dispatch per frame for the whole 3D scoring tail: window
            re-smoothing/re-costing of every updated track and branch
            candidate, track weights (host cost prefix + device window
            cost), the compatibility graph, and the replica-parallel BLS
            solve.  Replaces two dependent dispatch->get chains (each
            ~26 ms of tunnel RTT on axon) with one.

            The fat position arrays arrive as float16 (the axon tunnel
            moves ~10-27 MB/s, so upload bytes are the frame-time floor;
            f16 quantizes mm-scale coordinates by <=8 mm against 500+ mm
            cost scales) and widen to f32 on device."""
            pts = pts.astype(jnp.float32)
            raws = raws.astype(jnp.float32)
            merr = merr.astype(jnp.float32)
            # `shared` arrives bit-packed ([nb, ceil(nb/8)] u8, np.packbits
            # big-endian) — [nb, nb] bool is the second-largest upload
            nb_ = tree_ids.shape[0]
            bits = (shared[:, :, None] >> (7 - jnp.arange(8, dtype=jnp.uint8)
                                           )[None, None, :]) & 1
            shared = (bits.reshape(nb_, -1)[:, :nb_]).astype(bool)
            ws = score_track_windows(pts, raws, rmask, merr, lens, cams,
                                     acfg)
            # velocity never crosses back to the host: it is recomputed
            # there from the fetched smoothed window (same diff + speed
            # gate), saving a [N, W, 3] f32 slice of the ~10 MB/s tunnel
            # download every frame.  The per-position outputs downcast to
            # f16 for the same reason (smoothed: <=8 mm quantisation;
            # costs: ~0.1% — the bench's CLEAR-MOT co-report gates this)
            ws = ws._replace(
                velocity=jnp.zeros((0,), jnp.float32),
                smoothed=ws.smoothed.astype(jnp.float16),
                cost_recon=ws.cost_recon.astype(jnp.float16),
                cost_link=ws.cost_link.astype(jnp.float16))
            nb = tree_ids.shape[0]
            vmax = solver_cfg.max_vertices
            rm = jnp.clip(row_map, 0)
            has_row = row_map >= 0
            # tracks below the smoothing-length gate keep their host-side
            # raw-point costs (the reference only REPLACES per-position
            # costs once duration >= MIN_SMOOTHING_LENGTH, ref
            # Associator3D.cpp:1475-1511): their host_base already carries
            # the full cost, so the device window contribution must be 0
            short_row = lens[rm] < (acfg.sg_span // 2)
            wcost = jnp.where(has_row & ~short_row, ws.window_cost[rm], 0.0)
            wvalid = jnp.where(has_row, ws.valid[rm], True)
            weights = -(host_base + wcost)              # [vmax]
            # vertices need positive log-likelihood (the host-side
            # total_cost() < 0 filter of the unfused path)
            vert_ok = wvalid & (weights > 0.0)
            compat = compat_matrix(tree_ids, shared,
                                   pos_grid.astype(jnp.float32), have,
                                   pvalid & vert_ok[:nb])
            adj = jnp.zeros((vmax, vmax), bool).at[:nb, :nb].set(compat)
            valid = vert_ok & jnp.zeros((vmax,), bool).at[:nb].set(pvalid)
            res = solve_mwcp(weights, adj, valid, init_masks, key,
                             solver_cfg, iters)
            # K-best compaction ON DEVICE: ship K masks to the host, not
            # the whole [R, S, V] local-optima ring (~20x less tunnel
            # traffic per frame); masks additionally BIT-PACK (8x)
            kb_masks, kb_scores = device_k_best(res, acfg.k_best_size)
            shifts = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
            kb_packed = jnp.sum(
                kb_masks.reshape(kb_masks.shape[0], -1, 8)
                .astype(jnp.uint8) * shifts[None, None, :], axis=-1,
                dtype=jnp.uint8)
            # pack the whole downloaded payload into ONE leaf: the axon
            # tunnel serves one request at a time at ~33 ms overhead per
            # fetched array (scripts/tpu_solve_prof.py: the fused solve's
            # wall is flat in iterations AND graph size — it is pure
            # per-leaf RTT), so the original 8-leaf tree cost far more in
            # round trips than in bytes.  Layout: [rescore rows as f16
            # bytes: smoothed*3w | cost_recon*w | cost_link*w |
            # window_cost | valid] ++ [K-best rows as u8: mask bits |
            # score f32 bytes].
            nr = ws.smoothed.shape[0]
            pack_a = jnp.concatenate([
                ws.smoothed.reshape(nr, -1),
                ws.cost_recon, ws.cost_link,
                ws.window_cost.astype(jnp.float16)[:, None],
                ws.valid.astype(jnp.float16)[:, None]], axis=1)
            pack_b = jnp.concatenate([
                kb_packed,
                jax.lax.bitcast_convert_type(kb_scores, jnp.uint8)], axis=1)
            import os
            mode = os.environ.get("MCMTT_SOLVE_LEAVES", "f16")
            if mode == "1":
                # one bitcast u8 blob: one request but a device relayout
                # of the whole f16 block
                return jnp.concatenate([
                    jax.lax.bitcast_convert_type(pack_a,
                                                 jnp.uint8).reshape(-1),
                    pack_b.reshape(-1)])
            if mode == "2":
                # two typed leaves: no relayout, but two ~33 ms requests
                return pack_a, pack_b
            # default: ONE f16 leaf with no relayout of the big block —
            # the K-best masks/scores ride as K extra rows whose f16
            # values are bit-cast byte pairs (only the tiny [K, vmax/8]
            # block relayouts); raw f16 bit patterns survive the wire
            vb = kb_packed.shape[1]
            kb_even = jnp.pad(kb_packed, ((0, 0), (0, vb & 1)))
            kt = jnp.concatenate([
                jax.lax.bitcast_convert_type(
                    kb_even.reshape(kb_even.shape[0], -1, 2),
                    jnp.float16),
                jax.lax.bitcast_convert_type(kb_scores, jnp.float16),
            ], axis=1)
            width = max(pack_a.shape[1], kt.shape[1])
            pa = jnp.pad(pack_a, ((0, 0), (0, width - pack_a.shape[1])))
            kt = jnp.pad(kt, ((0, 0), (0, width - kt.shape[1])))
            return jnp.concatenate([pa, kt], axis=0)

        self._rescore_and_solve = rescore_and_solve

    # ------------------------------------------------------------------
    # host -> device placement
    # ------------------------------------------------------------------
    def _dev(self, x, shard: bool = False):
        """Upload a host array.  With a mesh: explicit sharding — leading
        axis split over all devices when `shard` is set and the size
        divides the mesh (else replicated).  Without a mesh: plain
        transfer."""
        a = jnp.asarray(x)
        if self.mesh is None:
            return a
        if shard and a.ndim > 0 and a.shape[0] % self.mesh.size == 0:
            return jax.device_put(a, self._s_blocks)
        return jax.device_put(a, self._s_rep)

    # ------------------------------------------------------------------
    # side-map sampling (host, numpy)
    # ------------------------------------------------------------------
    def _sensitivity_at(self, cam_idx: int, uv: np.ndarray) -> float:
        m = self.sens_maps[cam_idx]
        st = self.map_strides[cam_idx]
        iu = int(np.clip(uv[0] / st, 0, m.shape[1] - 1))
        iv = int(np.clip(uv[1] / st, 0, m.shape[0] - 1))
        return float(m[iv, iu])

    def _distance_from_boundary_batch(self, points: np.ndarray,
                                      mask: np.ndarray) -> np.ndarray:
        """Batched boundary distance: points [N, P, 3] with validity mask
        [N, P] -> [N] = max over cameras and valid points of the
        boundary-distance map at the projected pixel (ref
        GetDistanceFromBoundary, Associator3D.cpp:1076-1087); -100 where
        invisible everywhere.  One vectorised pass per camera over the
        whole track batch — this sits on the per-frame host path (every
        pausing track's exit cost), so no per-track Python loops."""
        n, p = points.shape[:2]
        best = np.full((n,), -100.0)
        if n == 0 or not mask.any():
            return best
        flat = points.reshape(n * p, 3)
        fmask = mask.reshape(n * p)
        for c, hc in enumerate(self.host_cams):
            uvs = hc.world_to_image(flat)
            m = self.bound_maps[c]
            st = self.map_strides[c]
            ok = (fmask & np.isfinite(uvs).all(-1)
                  & (uvs[:, 0] >= 0) & (uvs[:, 0] < self.cfg.image_width)
                  & (uvs[:, 1] >= 0) & (uvs[:, 1] < self.cfg.image_height))
            iu = np.clip(np.where(ok, uvs[:, 0], 0.0) / st, 0,
                         m.shape[1] - 1).astype(int)
            iv = np.clip(np.where(ok, uvs[:, 1], 0.0) / st, 0,
                         m.shape[0] - 1).astype(int)
            d = np.where(ok, m[iv, iu], -100.0).reshape(n, p)
            best = np.maximum(best, d.max(axis=1))
        return best

    def _distance_from_boundary(self, points: np.ndarray) -> float:
        pts = np.atleast_2d(points)
        return float(self._distance_from_boundary_batch(
            pts[None], np.ones((1, len(pts)), bool))[0])

    def _enter_cost(self, points: np.ndarray) -> float:
        """(ref ComputeEnterProbability :2267-2277, host numpy)"""
        if self.num_frames_proc <= self.acfg.enter_penalty_free_length:
            return 0.0
        d = self._distance_from_boundary(points)
        a = self.acfg
        if d < 0 or d <= a.boundary_distance:
            p = 1.0
        else:
            p = a.p_en_max * np.exp(-a.p_en_decay * (d - a.boundary_distance))
        return float(min(a.cost_enter_max, -np.log(max(p, 1e-300))))

    def _exit_cost(self, points: np.ndarray, length: int) -> float:
        """(ref ComputeExitProbability :2288-2303, host numpy)"""
        d = self._distance_from_boundary(points)
        a = self.acfg
        if d < 0:
            p = 1.0
        elif d < a.boundary_distance:
            p = a.p_ex_max
        else:
            p = (a.p_ex_max
                 * np.exp(-a.p_ex_decay_dist * (d - a.boundary_distance))
                 * np.exp(-a.p_ex_decay_length
                          * max(0.0, length - a.num_frames_for_confirmation)))
        return float(min(a.cost_exit_max, -np.log(max(p, 1e-300))))

    def _enter_cost_batch(self, points: np.ndarray,
                          mask: np.ndarray) -> np.ndarray:
        """Vectorised _enter_cost over a seed batch: points [N, P, 3],
        mask [N, P] -> costs [N] (ref ComputeEnterProbability
        :2267-2277)."""
        a = self.acfg
        n = len(points)
        if self.num_frames_proc <= a.enter_penalty_free_length:
            return np.zeros((n,))
        d = self._distance_from_boundary_batch(points, mask)
        p = np.where((d < 0) | (d <= a.boundary_distance), 1.0,
                     a.p_en_max * np.exp(-a.p_en_decay
                                         * np.maximum(d - a.boundary_distance,
                                                      0.0)))
        return np.minimum(a.cost_enter_max, -np.log(np.maximum(p, 1e-300)))

    def _exit_cost_batch(self, points: np.ndarray, mask: np.ndarray,
                         lengths: np.ndarray) -> np.ndarray:
        """Vectorised _exit_cost over a track batch: points [N, P, 3],
        mask [N, P], lengths [N] -> costs [N] (ref ComputeExitProbability
        :2288-2303)."""
        a = self.acfg
        d = self._distance_from_boundary_batch(points, mask)
        decayed = (a.p_ex_max
                   * np.exp(-a.p_ex_decay_dist
                            * np.maximum(d - a.boundary_distance, 0.0))
                   * np.exp(-a.p_ex_decay_length
                            * np.maximum(0.0, np.asarray(lengths, float)
                                         - a.num_frames_for_confirmation)))
        p = np.where(d < 0, 1.0,
                     np.where(d < a.boundary_distance, a.p_ex_max, decayed))
        return np.minimum(a.cost_exit_max, -np.log(np.maximum(p, 1e-300)))

    def _visible_anywhere_batch(self, points: np.ndarray) -> np.ndarray:
        """[N, 3] -> [N] bool: visible in at least one camera, with the
        body-height pad of ref CheckVisibility (Associator3D.cpp:718-733,
        consumed by the extrapolation check :1567)."""
        vis = np.zeros((len(points),), bool)
        for hc in self.host_cams:
            vis |= hc.visible(points, self.acfg.default_height)
        return vis

    def _visible_anywhere(self, point: np.ndarray) -> bool:
        return bool(self._visible_anywhere_batch(
            np.asarray(point)[None])[0])

    # ------------------------------------------------------------------
    # reconstruction (host assembly; heavy math stays on device in the
    # batched window scorer — this covers single new positions)
    # ------------------------------------------------------------------
    def _reconstruct(self, combination: Tuple[int, ...]):
        """Reconstruction of one tracklet combination.

        Full-body mode: mean of per-camera ground points
        (ref PointReconstruction full-body branch, :830-856 +
        NViewGroundingPointReconstruction :995-1046).
        Head mode: least-squares intersection of back-projection lines
        (ref head branch :857-884 + NViewPointReconstruction :930-982).

        Returns (point [3], raw_points [C, 3], raw_mask [C], max_error,
        cost_recon) or None if infeasible."""
        locs = np.zeros((self.num_cams, 3))
        mask = np.zeros((self.num_cams,), bool)
        max_error = self.acfg.e_cal
        tks = {}
        for c, tid in enumerate(combination):
            if tid < 0:
                continue
            tk = self.tracklets[c][tid]
            tks[c] = tk
            locs[c] = tk.loc3d
            mask[c] = True
            max_error += self.acfg.e_det * tk.sensitivity
        num = int(mask.sum())
        if num == 0:
            return None
        if self.acfg.detection_mode == "head":
            # max-based error and line-meet point (ref :871, :879-881)
            max_error = self.acfg.e_cal
            for c in tks:
                max_error = max(max_error,
                                self.acfg.e_det * tks[c].sensitivity)
            if not self.acfg.consider_sensitivity:
                max_error = self.acfg.max_body_width / 2.0
            if num < 2:
                point = next(iter(tks.values())).bp_bottom.astype(np.float64)
                mean_dist = self.acfg.max_tracklet_distance / 2.0
                prob = 0.5
            else:
                # host 3x3 LS line meet: A = sum (vv^T - I)^T (vv^T - I)
                # (numpy version of ref NViewPointReconstruction :930-982)
                a_mat = np.zeros((3, 3))
                b_vec = np.zeros(3)
                dirs, origins = [], []
                for c in tks:
                    v = tks[c].bp_bottom - tks[c].bp_top
                    v = v / max(np.linalg.norm(v), 1e-12)
                    pmat = np.outer(v, v) - np.eye(3)
                    pp = pmat.T @ pmat
                    a_mat += pp
                    b_vec += pp @ tks[c].bp_top
                    dirs.append(v)
                    origins.append(tks[c].bp_top)
                point = np.linalg.solve(a_mat, b_vec)
                mean_dist = float(np.mean([
                    np.linalg.norm(o + np.dot(v, point - o) * v - point)
                    for v, o in zip(dirs, origins)]))
                if mean_dist > max_error:
                    return None
                from scipy.special import erfc
                prob = 0.5 * erfc(4.0 * mean_dist / max_error - 2.0)
            return self._finish_reconstruction(point, locs, mask, max_error,
                                               prob)
        point = locs[mask].mean(0)
        if num < 2:
            mean_dist = self.acfg.max_body_width / 2.0
            prob = 0.5
        else:
            mean_dist = float(np.linalg.norm(locs[mask] - point, axis=-1).mean())
            if mean_dist > max_error:
                return None
            from scipy.special import erfc
            prob = 0.5 * erfc(4.0 * mean_dist / max_error - 2.0)
        return self._finish_reconstruction(point, locs, mask, max_error, prob)

    def _finish_reconstruction(self, point, locs, mask, max_error, prob):
        # detection likelihood ratio over body-pad-visible cameras
        # (ref :900-912 via CheckVisibility's pad, :718-733)
        ratio = 1.0
        for c in range(self.num_cams):
            if not self._visible_anywhere_cam(point, c):
                continue
            if mask[c]:
                ratio *= (1 - self.acfg.fp_rate) / self.acfg.fp_rate
            else:
                ratio *= self.acfg.fn_rate / (1 - self.acfg.fn_rate)
        prob = min(max(prob, 1e-12), 1 - 1e-12)
        cost = np.log(1 - prob) - np.log(prob) - np.log(ratio)
        return point, locs, mask, max_error, float(cost)

    def _visible_anywhere_cam(self, point, c) -> bool:
        return bool(self.host_cams[c].visible(
            point, self.acfg.default_height))

    def _tracklet_tables(self):
        """Per-camera (sorted ids, loc3d, bp_top, bp_bottom, sensitivity)
        arrays over the ACTIVE tracklets, rebuilt once per frame (cache
        cleared by _update_tracklets) and shared by every
        _reconstruct_batch call that frame."""
        tabs = getattr(self, "_tk_tables", None)
        if tabs is not None:
            return tabs
        tabs = []
        nbins = 3 * self.acfg.num_rgb_bins
        for c in range(self.num_cams):
            live = [(tid, tk) for tid, tk in self.tracklets[c].items()
                    if tk.activated]
            live.sort(key=lambda kv: kv[0])
            if live:
                tids = np.asarray([tid for tid, _ in live], np.int64)
                tl = np.stack([tk.loc3d for _, tk in live])
                tt = np.stack([tk.bp_top for _, tk in live])
                tb = np.stack([tk.bp_bottom for _, tk in live])
                ts = np.asarray([tk.sensitivity for _, tk in live])
                rh = np.stack([tk.rgb_head for _, tk in live])
                rt = np.stack([tk.rgb_tail for _, tk in live])
            else:
                tids = np.zeros((0,), np.int64)
                tl = tt = tb = np.zeros((0, 3))
                ts = np.zeros((0,))
                rh = rt = np.zeros((0, nbins), np.float32)
            tabs.append((tids, tl, tt, tb, ts, rh, rt))
        self._tk_tables = tabs
        return tabs

    def _recon_cost_batch(self, point: np.ndarray, mask: np.ndarray,
                          prob: np.ndarray) -> np.ndarray:
        """Reconstruction cost from geometry probability + the FP/FN
        detection likelihood ratio over pad-visible cameras (ref :900-912
        + CheckVisibility :718-733).  Split out of _reconstruct_batch so
        callers that discard most candidates (spatial branching) can
        compute it for survivors only — the per-camera visibility
        projections (2 distortion inversions per camera) are the dominant
        host cost of reconstruction at bench density."""
        n = len(point)
        ratio = np.ones(n)
        a = self.acfg
        for c, hc in enumerate(self.host_cams):
            vis = np.asarray(hc.visible(point, a.default_height)).reshape(n)
            f = np.where(mask[:, c], (1 - a.fp_rate) / a.fp_rate,
                         a.fn_rate / (1 - a.fn_rate))
            ratio *= np.where(vis, f, 1.0)
        p = np.clip(prob, 1e-12, 1 - 1e-12)
        return np.log(1 - p) - np.log(p) - np.log(ratio)

    def _reconstruct_batch(self, combos,
                           skip_cost: bool = False,
                           as_arrays: bool = False):
        """Vectorised `_reconstruct` over a list of combinations, both
        detection modes.  One numpy pass replaces N Python-loop
        reconstructions — the host-side cost of the reference's per-branch
        reconstruction loop (ref Track3D_BranchTracks,
        Associator3D.cpp:1885-2047; head mode :857-884 + :930-982).

        Returns a list aligned with `combos` of
        (point, raw_points, raw_mask, max_error, cost) or None.  With
        skip_cost=True the cost slot holds the geometry PROBABILITY
        instead (feed it to _recon_cost_batch for the rows that
        survive).  With as_arrays=True, returns the column arrays
        (point [n,3], locs [n,C,3], mask [n,C], max_err [n], cost [n],
        ok [n]) instead of the per-row tuple list (the tuple+view
        construction costs ~2 us/row — material at branch batch sizes).
        `combos` may be a list of tuples or an [n, C] int array."""
        n = len(combos)
        if n == 0:
            return ((np.zeros((0, 3)), np.zeros((0, self.num_cams, 3)),
                     np.zeros((0, self.num_cams), bool), np.zeros(0),
                     np.zeros(0), np.zeros(0, bool))
                    if as_arrays else [])
        nc = self.num_cams
        head = self.acfg.detection_mode == "head"
        # per-camera sorted-id lookup tables (built lazily per frame by
        # _tracklet_tables): the n x C Python fill loop this replaces
        # cost ~8 ms/frame at ~800 seed combos
        tabs = self._tracklet_tables()
        cm = np.asarray(combos, np.int64)                   # [n, C]
        locs = np.zeros((n, nc, 3))
        tops = np.zeros((n, nc, 3)) if head else None
        mask = np.zeros((n, nc), bool)
        sens = np.zeros((n, nc))
        for c in range(nc):
            tids, tl, tt, tb, ts = tabs[c][:5]
            if len(tids) == 0:
                continue
            col = cm[:, c]
            idx = np.searchsorted(tids, col)
            safe = np.clip(idx, 0, len(tids) - 1)
            hit = (col >= 0) & (idx < len(tids)) & (tids[safe] == col)
            locs[:, c] = np.where(hit[:, None],
                                  (tb if head else tl)[safe], 0.0)
            if head:
                tops[:, c] = np.where(hit[:, None], tt[safe], 0.0)
            mask[:, c] = hit
            sens[:, c] = np.where(hit, ts[safe], 0.0)
        num = mask.sum(1)
        single = num < 2
        if head:
            # batched LS line meet of the masked back-projection lines
            # (the numpy mirror of geometry.triangulation.
            # nview_point_reconstruction; ref NViewPointReconstruction
            # :930-982).  max-based error (ref :871); single-line combos
            # fall back to that line's ground end (ref :875-878)
            if self.acfg.consider_sensitivity:
                max_err = np.maximum(self.acfg.e_cal,
                                     (self.acfg.e_det * sens * mask).max(1))
            else:
                max_err = np.full(n, self.acfg.max_body_width / 2.0)
            d = locs - tops
            d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
            p = (d[..., :, None] * d[..., None, :]
                 - np.eye(3))                          # [n, C, 3, 3]
            pp = (p @ p) * mask[..., None, None]       # P^T P (P symmetric)
            a_mat = pp.sum(1)
            b_vec = np.einsum("ncij,ncj->ni", pp, tops * mask[..., None])
            a_mat[single] = np.eye(3)
            point = np.linalg.solve(a_mat, b_vec[..., None])[..., 0]
            lam = np.sum(d * (point[:, None, :] - tops), -1)
            foot = tops + lam[..., None] * d
            dist = np.linalg.norm(foot - point[:, None, :], axis=-1)
            mean_dist = (dist * mask).sum(1) / np.maximum(num, 1)
            # single-line fallback point: the line's ground (bottom) end
            first = np.argmax(mask, axis=1)
            point = np.where(single[:, None],
                             locs[np.arange(n), first], point)
            mean_dist = np.where(single,
                                 self.acfg.max_tracklet_distance / 2.0,
                                 mean_dist)
        else:
            max_err = (self.acfg.e_cal
                       + self.acfg.e_det * (sens * mask).sum(1))
            denom = np.maximum(num, 1)[:, None]
            point = (locs * mask[..., None]).sum(1) / denom
            d = np.linalg.norm(locs - point[:, None, :], axis=-1)
            mean_dist = (d * mask).sum(1) / np.maximum(num, 1)
        prob = np.where(single, 0.5,
                        0.5 * _erfc(4.0 * mean_dist
                                    / np.maximum(max_err, 1e-12) - 2.0))
        ok = (num > 0) & (single | (mean_dist <= max_err))
        if skip_cost:
            cost = prob
        else:
            cost = self._recon_cost_batch(point, mask, prob)
        if as_arrays:
            return point, locs, mask, max_err, cost, ok
        return [
            (point[i], locs[i], mask[i], float(max_err[i]), float(cost[i]))
            if ok[i] else None
            for i in range(n)]

    # ==================================================================
    # per-frame step
    # ==================================================================
    def step(self, frame_idx: int, ids, boxes, mask, rgb_frames
             ) -> Track3DResult:
        """Run one frame of association.

        Args:
          ids:   [C, T] int tracklet ids from the 2D stage.
          boxes: [C, T, 4] boxes.
          mask:  [C, T] bool.
          rgb_frames: [C, H, W, 3] images, uint8 or float (for appearance).
        """
        prev = self.step_begin(frame_idx, ids, boxes, mask, rgb_frames)
        result = self.step_finish(frame_idx)
        return prev if self.deferred_solve else result

    def step_begin(self, frame_idx, ids, boxes, mask, rgb_frames
                   ) -> Optional[Track3DResult]:
        """Phase 1 of the frame: tracklet ingest, seed enumeration (both
        solve-independent) and the collect of the in-flight deferred
        solve.  The pipelined engine dispatches the NEXT frame's 2D device
        program between the two phases, so the device queue orders
        [solve(t), 2D(t+1)] — the solve lands with a full frame of host
        shadow instead of waiting behind the 2D program."""
        self.frame_idx = frame_idx
        self.num_frames_proc += 1

        t = self.timer
        with t.stage("assoc.tracklets"):
            self._update_tracklets(frame_idx, np.asarray(ids),
                                   np.asarray(boxes), np.asarray(mask),
                                   rgb_frames)
        # seed enumeration depends only on this frame's tracklets, so it
        # runs BEFORE the previous frame's solve is collected — tracklet
        # ingest + the full seed sweep shadow the in-flight device solve
        # and its (slow-tunnel) device->host copy
        with t.stage("assoc.seed_enum"):
            self._seed_prep = self._enumerate_seeds(frame_idx)
        # solve-independent half of the track update (combination
        # refresh, exit costs, reconstruction, link probabilities) also
        # shadows the in-flight solve; _update_tracks applies it to the
        # post-prune survivors after collect()
        with t.stage("assoc.ut_prep"):
            self._ut_prep = self._update_tracks_prep(frame_idx)
        return self.collect() if self.deferred_solve else None

    def step_finish(self, frame_idx) -> Optional[Track3DResult]:
        t = self.timer
        seed_prep, self._seed_prep = self._seed_prep, None
        with t.stage("assoc.update_tracks"):
            self._update_tracks(frame_idx)
        with t.stage("assoc.seeds"):
            seeds = self._materialize_seeds(frame_idx, seed_prep)
        with t.stage("assoc.branch"):
            self._branch_tracks(frame_idx, seeds)
        with t.stage("assoc.hypotheses"):
            self._form_hypotheses(frame_idx, seeds)
        if self.deferred_solve:
            return None
        with t.stage("assoc.prune"):
            self._prune(frame_idx)
            self.registry.gc(frame_idx - self.acfg.proc_window_size,
                             self._gc_roots())
        self.completed_frame = frame_idx
        return self._package_result(frame_idx)

    def _gc_roots(self):
        """Every id the engine can still reach: terminated-but-valid
        tracks outside this set are garbage (see TrackRegistry.gc)."""
        roots = set(self.active_tracks)
        roots.update(self.paused_tracks)
        roots.update(self.tracks_in_window)
        roots.update(self.best_solution)
        roots.update(self._gt_prob_touched)
        for h in self.prev_hypotheses:
            roots.update(h.selected)
            roots.update(h.related)
        return roots

    def collect(self) -> Optional[Track3DResult]:
        """Finish the in-flight deferred solve (fetch, apply, hypothesis
        bookkeeping, pruning) and return that frame's result; None when
        nothing is pending.  The sequence [dispatch -> collect] performs
        exactly the host operations of a sequential step, so deferred and
        sequential runs produce identical results."""
        p = self._pending_solve
        if p is None:
            return None
        self._pending_solve = None
        if not p.get("empty"):
            self._collect_solve(p)
        with self.timer.stage("assoc.prune"):
            self._prune(p["frame_idx"])
            self.registry.gc(p["frame_idx"] - self.acfg.proc_window_size,
                             self._gc_roots())
        self.completed_frame = p["frame_idx"]
        return self._package_result(p["frame_idx"])

    # ------------------------------------------------------------------
    # 7a. tracklet ingest & cross-camera gating (ref :1099-1268)
    # ------------------------------------------------------------------
    def _update_tracklets(self, frame_idx, ids, boxes, mask, rgb_frames):
        self._tk_tables = None   # invalidate the per-frame lookup tables
        self._combo_tabs = False  # invalidate the enumerator tables
        # Tracklet ingest runs on host: the batch is tens of boxes per
        # camera, far below the size where a device dispatch pays for
        # itself (the heavy per-frame device programs are the 2D tracker,
        # window scoring, compatibility and the hypothesis solver).
        from mcmtt_opticalflow_tpu.ops.histogram import host_rgb_histogram
        rgb = np.asarray(rgb_frames)
        locs = np.zeros((self.num_cams,) + boxes.shape[1:2] + (3,))
        tops = np.zeros_like(locs)
        bottoms = np.zeros(locs.shape[:2] + (2,))
        hists = np.zeros(locs.shape[:2] + (3 * self.acfg.num_rgb_bins,),
                         np.float32)
        senss = np.zeros(locs.shape[:2])
        for c in range(self.num_cams):
            bx = boxes[c]
            bottom = np.stack([bx[:, 0] + np.ceil(bx[:, 2] / 2.0),
                               bx[:, 1] + bx[:, 3]], -1)
            bottoms[c] = bottom
            locs[c] = self.host_cams[c].image_to_world(bottom, 0.0)
            tops[c] = self.host_cams[c].image_to_world(bottom, 2000.0)
            hists[c] = host_rgb_histogram(rgb[c], bx, self.acfg.num_rgb_bins)
            m = self.sens_maps[c]
            st = self.map_strides[c]
            iu = np.clip(bottom[:, 0] / st, 0, m.shape[1] - 1).astype(int)
            iv = np.clip(bottom[:, 1] / st, 0, m.shape[0] - 1).astype(int)
            senss[c] = m[iv, iu]

        for c in range(self.num_cams):
            self.new_measurements[c] = []
            seen = set()
            for j in range(ids.shape[1]):
                if not mask[c, j]:
                    continue
                tid = int(ids[c, j])
                seen.add(tid)
                sens = float(senss[c, j])
                # row views of this frame's freshly allocated batch arrays
                # — no defensive copies needed (nothing mutates them)
                if tid in self.tracklets[c]:
                    tk = self.tracklets[c][tid]
                    tk.activated = True
                    tk.box = boxes[c, j]
                    tk.loc3d = locs[c, j]
                    tk.bp_top = tops[c, j]
                    tk.bp_bottom = locs[c, j]
                    tk.sensitivity = sens
                    tk.rgb_tail = hists[c, j]
                    tk.time_end = frame_idx
                    tk.duration += 1
                    tk.assoc = {}
                else:
                    tk = Tracklet(
                        id=tid, cam=c, time_start=frame_idx,
                        time_end=frame_idx, box=boxes[c, j],
                        loc3d=locs[c, j], bp_top=tops[c, j],
                        bp_bottom=locs[c, j], sensitivity=sens,
                        rgb_head=hists[c, j],
                        rgb_tail=hists[c, j])
                    self.tracklets[c][tid] = tk
                    self.active_tracklets[c].append(tid)
                    self.new_measurements[c].append(tid)
            # deactivate / retire missing tracklets (ref :1183-1196:
            # one grace frame as inactive, then removal)
            still = []
            for tid in self.active_tracklets[c]:
                tk = self.tracklets[c][tid]
                if tid in seen:
                    still.append(tid)
                elif tk.activated:
                    tk.activated = False
                    still.append(tid)
                # else: drop from active list entirely
            self.active_tracklets[c] = still

        # associability maps (ref :1233-1268), one vectorised host pass for
        # every (active tracklet, new measurement) camera pair — the
        # reference's O(T*M) per-pair loop, :1233-1268
        any_new = any(self.new_measurements[c] for c in range(self.num_cams))
        if not any_new:
            return
        from mcmtt_opticalflow_tpu.geometry.tsai_np import (
            triangulate_two_lines_np)
        acts = [[self.tracklets[c][t] for t in self.active_tracklets[c]]
                for c in range(self.num_cams)]
        news = [[self.tracklets[c][t] for t in self.new_measurements[c]]
                for c in range(self.num_cams)]
        na = max([len(a) for a in acts] + [1])
        nb = max([len(b) for b in news] + [1])
        act_top = np.zeros((self.num_cams, na, 3), np.float32)
        act_bot = np.zeros_like(act_top)
        new_top = np.zeros((self.num_cams, nb, 3), np.float32)
        new_bot = np.zeros_like(new_top)
        for c in range(self.num_cams):
            for i, t in enumerate(acts[c]):
                act_top[c, i] = t.bp_top
                act_bot[c, i] = t.bp_bottom
            for i, t in enumerate(news[c]):
                new_top[c, i] = t.bp_top
                new_bot[c, i] = t.bp_bottom
        # mean line-to-point distance = half the common-perpendicular gap
        # (the 2-line case of ref NViewPointReconstruction :930-982)
        _, gap = triangulate_two_lines_np(
            act_top[:, :, None, None], act_bot[:, :, None, None],
            new_top[None, None, :, :], new_bot[None, None, :, :])
        d = 0.5 * gap
        ok = d <= self.acfg.max_tracklet_distance
        # associability is stored as one PYTHON-INT BITMASK per target
        # camera (bit j = new_measurements[c2][j] admissible): combination
        # enumeration ANDs these masks thousands of times per frame, and
        # an integer AND is ~100x cheaper than a small-ndarray AND (the
        # recursion was the top pure-host cost at density)
        for c1 in range(self.num_cams):
            n1 = len(acts[c1])
            if n1 == 0:
                continue
            for c2 in range(self.num_cams):
                n2 = len(news[c2])
                if c1 == c2 or n2 == 0:
                    for t in acts[c1]:
                        t.assoc[c2] = 0
                    continue
                if n2 <= 64:
                    # whole-column bit pack: [n1, 64] bool -> little-endian
                    # bytes -> one uint64 mask per active tracklet (the
                    # per-row flatnonzero/shift loop cost ~4 ms/frame)
                    rows = np.zeros((n1, 64), bool)
                    rows[:, :n2] = ok[c1, :n1, c2, :n2]
                    vs = np.packbits(rows, axis=1, bitorder="little") \
                        .view(np.uint64).ravel().tolist()
                else:
                    vs = []
                    for i in range(n1):
                        row = ok[c1, i, c2, :n2]
                        v = 0
                        for j in np.flatnonzero(row):
                            v |= 1 << int(j)
                        vs.append(v)
                for t, v in zip(acts[c1], vs):
                    t.assoc[c2] = v

    # ------------------------------------------------------------------
    # 7c. track update (ref Track3D_UpdateTracks :1379-1715)
    # ------------------------------------------------------------------
    def _update_tracks_prep(self, frame_idx):
        """Solve-independent half of _update_tracks (VERDICT r4 item 3):
        the combination refresh against tracklet liveness, the pausing
        exit costs, and the live-set reconstruction + link probabilities
        read only this frame's tracklet tables and the tracks'
        pre-update state — none of it depends on the in-flight
        hypothesis solve, so the pipelined engine computes it in
        step_begin, in the shadow of the previous frame's solve fetch.
        All MUTATIONS stay in _update_tracks (post-collect), applied
        only to the tracks that survive pruning — bit-identical to the
        unsplit formulation in both modes."""
        reg = self.registry
        acfg = self.acfg
        p = self._pending_solve
        if p is not None and not p.get("empty"):
            # pipelined mode: the in-flight collect() will REBUILD
            # active_tracks as [updated, seeds, candidates] (valid ones,
            # in that order — _finish_rescore) and then prune-filter it.
            # Enumerate that superset here in the same order; phase B's
            # alive filter reproduces the post-collect membership exactly
            # (validity can both drop AND resurrect in N-scan pruning, so
            # no validity pre-filter here)
            trs = (list(p["updated"])
                   + [reg.tracks[s] for s in p["seeds"] if s in reg.tracks]
                   + list(p["candidates"]))
        else:
            # sequential mode / empty frame: active_tracks is already
            # final for this frame
            trs = [tr for tid in self.active_tracks
                   if (tr := reg.tracks.get(tid)) is not None]
        prep = dict(frame=frame_idx, trs=trs)
        if not trs:
            return prep
        # combination refresh, vectorised per camera over the whole
        # active set (the per-track dict walk cost ~10 ms/frame at
        # density)
        nc = self.num_cams
        combos = np.asarray([tr.combination for tr in trs], np.int64)
        new_combos = combos.copy()
        tabs = self._tracklet_tables()
        upd = []
        kills: List[int] = []
        for c in range(nc):
            tids, tl, _tt, _tb, ts_, _rh, rt = tabs[c]
            col = combos[:, c]
            if len(tids):
                pos = np.searchsorted(tids, col)
                safe = np.clip(pos, 0, len(tids) - 1)
                h = (col >= 0) & (pos < len(tids)) & (tids[safe] == col)
                hi = np.flatnonzero(h)
                # gather the matched tracklets' latest state for the
                # phase-B last_t_* writes
                upd.append((hi.tolist(), tl[safe[hi]], ts_[safe[hi]],
                            rt[safe[hi]]))
            else:
                # empty tracklet table for this camera: h is all-False so
                # there is nothing to gather — and tl[safe] on an empty
                # table would IndexError (the reference's dict lookup
                # simply misses here, Associator3D.cpp:1386-1421)
                h = np.zeros(len(trs), bool)
                upd.append(None)
            miss = (col >= 0) & ~h
            new_combos[miss, c] = -1
            if acfg.min_tracklet_length > 1 and miss.any():
                # a deactivated tracklet shorter than the minimum kills
                # the whole branch (ref MIN_TRACKLET_LENGTH gate,
                # Associator3D.cpp:1399-1404; dead at the default of 1).
                # Detection is pure; the set_branch_validity mutation is
                # deferred to phase B
                for i in np.flatnonzero(miss):
                    tk = self.tracklets[c].get(int(col[i]))
                    if (tk is not None and not tk.activated
                            and tk.duration < acfg.min_tracklet_length):
                        kills.append(int(i))
        changed = (new_combos != combos).any(1)
        dead_all = (new_combos < 0).all(1)
        prep.update(new_combos=new_combos, changed=changed,
                    dead_all=dead_all, upd=upd, kills=kills)
        # exit costs for the pausing rows: no camera matched, so their
        # last_t_loc is untouched by the phase-B writes — reading it now
        # gives the same values the unsplit code read after them
        pa = np.flatnonzero(dead_all)
        if len(pa):
            pb = np.stack([trs[i].last_t_loc for i in pa])
            pm = np.stack([trs[i].raw_mask[trs[i].n_measured - 1]
                           if trs[i].n_measured > 0
                           else np.ones((nc,), bool) for i in pa])
            nm = [trs[i].n_measured for i in pa]
            prep["exit_costs"] = self._exit_cost_batch(
                pb, pm, np.asarray([trs[i].duration for i in pa]))
            prep["exit_rows"] = pa.tolist()
            # duration snapshot: _prune's trim_front (between prep and
            # apply) shortens n_measured, which the exit cost's length
            # decay reads — phase B recomputes any row that trimmed
            prep["exit_nm"] = nm
        # reconstruction + link probability for the live rows (reads the
        # refreshed combinations, tracklet tables and raw points — all
        # fixed for this frame before the solve lands)
        live_rows = np.flatnonzero(~dead_all)
        recs = self._reconstruct_batch(new_combos[live_rows])
        ok = [k for k, r in enumerate(recs) if r is not None]
        p_links = None
        if ok:
            p_links = _link_prob_batch(
                np.stack([trs[live_rows[k]].points[-1] for k in ok]),
                np.stack([recs[k][0] for k in ok]),
                np.ones(len(ok)), acfg.max_moving_speed)
        prep.update(live_rows=live_rows.tolist(), recs=recs, rec_ok=ok,
                    p_links=p_links)
        return prep

    def _update_tracks(self, frame_idx):
        reg = self.registry
        acfg = self.acfg
        prep = self._ut_prep
        self._ut_prep = None
        if prep is None or prep["frame"] != frame_idx:
            prep = self._update_tracks_prep(frame_idx)
        trs_all: List[Track] = prep["trs"]
        pending: List[Track] = []
        live: List[Track] = []
        n_live = n_pausing = 0
        if trs_all:
            # survivor filter: in pipelined mode the prep ran BEFORE the
            # previous frame's collect(), whose _finish_rescore rebuilt
            # active_tracks and whose prune filtered it — the unsplit
            # code iterated exactly that list, so membership in it (not
            # a validity re-check: N-scan pruning can also RESURRECT
            # validity) is the survivor criterion.  prep's trs is a
            # superset in the same order.  (Computed BEFORE the
            # min-length kills: the unsplit refresh wrote last_t_* to
            # gate-killed rows too.)
            active_set = set(self.active_tracks)
            alive = [tr.id in active_set and tr.valid
                     and reg.tracks.get(tr.id) is tr for tr in trs_all]
            for i in prep["kills"]:
                if alive[i]:
                    reg.set_branch_validity(trs_all[i].id, False)
            for c, u in enumerate(prep["upd"]):
                if u is None:
                    continue
                hi, locs, senss, rgbs = u
                for k, i in enumerate(hi):
                    if not alive[i]:
                        continue
                    tr = trs_all[i]
                    tr.last_t_end[c] = frame_idx
                    tr.last_t_loc[c] = locs[k]
                    tr.last_sens[c] = senss[k]
                    tr.last_rgb[c] = rgbs[k]
            changed, dead_all = prep["changed"], prep["dead_all"]
            new_combos = prep["new_combos"]
            exit_rows = prep.get("exit_rows", ())
            exit_of = dict(zip(exit_rows, prep.get("exit_costs", ())))
            stale = [i for i, nm in zip(exit_rows, prep.get("exit_nm", ()))
                     if alive[i] and trs_all[i].n_measured != nm]
            if stale:
                # trimmed between prep and apply: recompute with the
                # post-trim duration the unsplit code would have read
                nc = self.num_cams
                pb = np.stack([trs_all[i].last_t_loc for i in stale])
                pm = np.stack([trs_all[i].raw_mask[trs_all[i].n_measured - 1]
                               if trs_all[i].n_measured > 0
                               else np.ones((nc,), bool) for i in stale])
                fresh = self._exit_cost_batch(
                    pb, pm,
                    np.asarray([trs_all[i].duration for i in stale]))
                exit_of.update(zip(stale, fresh))
            for i, tr in enumerate(trs_all):
                if not alive[i] or not tr.valid:  # pruned / gate-killed
                    continue
                if changed[i]:
                    tr.combination = tuple(map(int, new_combos[i]))
                if dead_all[i]:
                    # pause: exit cost from the last per-camera locations
                    cx = exit_of[i]
                    if tr._cost_cache is not None:
                        # delta-update the cost memo, not invalidate
                        tr._cost_cache += float(cx) - tr.cost_exit
                    tr.cost_exit = float(cx)
                    tr.active = False
                    n_pausing += 1
                    self.paused_tracks.append(tr.id)
                else:
                    live.append(i)
                    n_live += 1
        d = self.diag
        d.clear()
        d["n_live"] = n_live
        d["n_pausing"] = n_pausing
        if live:
            recs, p_links = prep["recs"], prep["p_links"]
            pos_of = {row: k for k, row in enumerate(prep["live_rows"])}
            pl_of = dict(zip(prep["rec_ok"],
                             p_links if p_links is not None else ()))
            for i in live:
                tr = trs_all[i]
                k = pos_of[i]
                r = recs[k]
                if r is None:
                    tr.valid = False
                    d["died_recon"] = d.get("died_recon", 0) + 1
                    continue
                point, raws, rmask, max_err, cost_rec = r
                p_link = float(pl_of[k])
                if p_link < acfg.min_linking_probability:
                    tr.valid = False
                    d["died_plink"] = d.get("died_plink", 0) + 1
                    continue
                self._append_position(tr, point, raws, rmask, max_err,
                                      cost_rec,
                                      -np.log(max(p_link, 1e-300)),
                                      is_meas=True)
                tr.time_end = frame_idx
                tr.n_measured = tr.length
                tr.num_outpoint = 0
                pending.append(tr)

        # re-smoothing + re-costing of the updated tracks is DEFERRED and
        # batched together with the branch candidates' scoring in
        # _branch_tracks — one device dispatch per frame instead of two
        self._pending_rescore = list(pending)
        self.active_tracks = [tr.id for tr in pending]

        # paused tracks: dummy extrapolation (ref :1529-1584); visibility
        # of all extrapolated points checked in one batched host pass
        extrapolating: List[Track] = []
        lasts: List[np.ndarray] = []
        for tid in self.paused_tracks:
            tr = reg.tracks.get(tid)
            if tr is None or not tr.valid:
                continue
            if tr.time_end + self.acfg.max_time_jump < frame_idx:
                if tr.total_cost() >= 0.0:
                    tr.valid = False
                continue
            extrapolating.append(tr)
            lasts.append(tr.smoothed[-1] + tr.velocity[-1])
        visible = (self._visible_anywhere_batch(np.stack(lasts))
                   if lasts else np.zeros((0,), bool))
        new_paused = []
        for tr, last, vis in zip(extrapolating, lasts, visible):
            self._append_position(
                tr, last, np.zeros((self.num_cams, 3)),
                np.zeros((self.num_cams,), bool), 0.0, 0.0, 0.0,
                is_meas=False, velocity=tr.velocity[-1])
            if not vis:
                tr.num_outpoint += 1
            if tr.num_outpoint > self.acfg.max_outpoint:
                continue
            new_paused.append(tr.id)
        self.paused_tracks = new_paused

        # window management (ref :1589-1604)
        self.tracks_in_window = [
            tid for tid in self.tracks_in_window
            if tid in reg.tracks and reg.tracks[tid].valid
            and reg.tracks[tid].time_end + self.acfg.proc_window_size
            > frame_idx]

        # tree upkeep (ref :1609-1659).  GTProb resets touch only the
        # tracks the last solve scored (recorded at collect time) instead
        # of sweeping the whole registry
        for tid in self._gt_prob_touched:
            t = reg.tracks.get(tid)
            if t is not None:
                t.gt_prob = 0.0
                t.current_best = False
        self._gt_prob_touched = []
        # one registry pass builds the valid-id set; the tree and
        # hypothesis sweeps below then run as C-speed set operations
        # (the per-element function/memo formulation cost ~3 ms/frame at
        # K=30 x ~700-track pools)
        valid_ids = {tid for tid, t in reg.tracks.items() if t.valid}
        confirm_by = frame_idx - self.acfg.num_frames_for_confirmation
        for tree in list(reg.trees.values()):
            if valid_ids.isdisjoint(tree.track_ids):
                tree.valid = False
                continue
            if not tree.confirmed and tree.time_generation <= confirm_by:
                tree.confirmed = True

        # hypothesis validity (ref :1664-1688)
        for h in self.prev_hypotheses:
            h.valid = valid_ids.issuperset(h.selected)
            h.related = [t for t in h.related if t in valid_ids]
        self.prev_hypotheses = [h for h in self.prev_hypotheses if h.valid]

    def _append_position(self, tr: Track, point, raws, rmask, max_err,
                         cost_rec, cost_link, is_meas, velocity=None):
        v = (point - tr.smoothed[-1]) if velocity is None else velocity
        tr.append_position_row(point, point, v, raws, rmask, max_err,
                               is_meas, cost_rec, cost_link)

    def _pack_windows(self, tracks: List[Track]):
        """Gather each track's scoring window into padded batch arrays
        (bucketed batch size — one compile per bucket)."""
        w = self.win_rescore
        c = self.num_cams
        # floor the bucket at 64: the fused rescore+solve program compiles
        # once per (rescore bucket, graph bucket) pair, so coarse buckets
        # keep the combination count at 1 for typical scenes (padding is
        # cheap; the program is tunnel-latency-bound, not compute-bound)
        n = _bucket(len(tracks), lo=64)
        self.timer.push("rescore.prep")
        pts = np.zeros((n, w, 3), np.float32)
        raws = np.zeros((n, w, c, 3), np.float32)
        rmask = np.zeros((n, w, c), bool)
        merr = np.zeros((n, w), np.float32)
        lens = np.zeros((n,), np.int32)
        starts = np.zeros((n,), np.int64)
        for i, tr in enumerate(tracks):
            ln = min(tr.length, w)
            starts[i] = tr.length - ln
            pts[i, :ln] = tr.points[starts[i]:]
            raws[i, :ln] = tr.raw_points[starts[i]:]
            rmask[i, :ln] = tr.raw_mask[starts[i]:]
            merr[i, :ln] = tr.max_error[starts[i]:]
            lens[i] = ln
        self.timer.pop()
        return pts, raws, rmask, merr, lens, starts

    def _rescore_tails(self, tracks: List[Track]):
        """Batched window re-smoothing + re-costing for a set of tracks
        (the device replacement for the reference's per-track tail loops,
        ref :1468-1516).  Standalone dispatch — the per-frame hot path
        instead fuses this into _rescore_and_solve."""
        if not tracks:
            return
        pts, raws, rmask, merr, lens, starts = self._pack_windows(tracks)
        with self.timer.stage("rescore.dispatch"):
            out = self._score_windows(
                self._dev(pts, True), self._dev(raws, True),
                self._dev(rmask, True), self._dev(merr, True),
                self._dev(lens, True), self.cams)
        with self.timer.stage("rescore.device"):
            from mcmtt_opticalflow_tpu.parallel.mesh import fetch
            res = fetch(out)
        self._apply_window_scores(tracks, res, lens, starts)

    def _apply_window_scores(self, tracks: List[Track], res, lens, starts):
        smoothed = np.asarray(res.smoothed, np.float64)
        velocity = np.asarray(res.velocity, np.float64)
        if velocity.size == 0:
            # fetch-trimmed path: recompute the window velocities on host
            # from the smoothed positions — the exact formula of
            # costs.score_track_windows (diff + min-speed gate)
            velocity = np.diff(smoothed, axis=1,
                               prepend=smoothed[:, :1])
            speed = np.linalg.norm(velocity, axis=-1)
            velocity = np.where(
                (speed > self.acfg.min_moving_speed)[..., None],
                velocity, 0.0)
        cost_r = np.asarray(res.cost_recon, np.float64)
        cost_l = np.asarray(res.cost_link, np.float64)
        valid = res.valid
        gate = self.acfg.sg_span // 2
        # batched window-cost sums (one vectorised pass; feeds the direct
        # cost-memo refresh below instead of invalidating ~pool-size memos
        # that the next frame's ordering passes would each re-sum)
        lens_a = np.asarray(lens)
        in_win = np.arange(cost_r.shape[1])[None, :] < lens_a[:, None]
        sum_r = (cost_r * in_win).sum(1)
        sum_l = (cost_l * in_win).sum(1)
        for i, tr in enumerate(tracks):
            ln = int(lens[i])
            s = int(starts[i])
            if not valid[i]:
                tr.valid = False
                continue
            tr.smoothed[s:] = smoothed[i, :ln]
            tr.velocity[s:] = velocity[i, :ln]
            if ln < gate:
                # below the smoothing-length gate the per-position costs
                # keep their host raw-point values — the reference only
                # replaces them once smoothing kicks in (ref :1475-1511)
                continue
            tr.cost_recon_pos[s:] = cost_r[i, :ln]
            if s > 0:
                # the device zeroes window position 0's link cost (its
                # predecessor lies outside the window); the seam link
                # (s-1, s) keeps its previously computed value
                tr.cost_link_pos[s + 1:] = cost_l[i, 1:ln]
                prefix = (float(tr.cost_recon_pos[:s].sum())
                          + float(tr.cost_link_pos[:s + 1].sum()))
                link_new = float(sum_l[i]) - float(cost_l[i, 0])
            else:
                tr.cost_link_pos[:] = cost_l[i, :ln]
                prefix = 0.0
                link_new = float(sum_l[i])
            tr._cost_cache = (tr.cost_enter + tr.cost_trimmed + tr.cost_rgb
                              + tr.cost_exit + prefix
                              + float(sum_r[i]) + link_new)

    # ------------------------------------------------------------------
    # 7b. combination generation (ref :1283-1336)
    # ------------------------------------------------------------------
    def _generate_combinations(self, assoc_maps: List[int], base: List[int],
                               cam_idx: int, out: List[Tuple[int, ...]],
                               cap: int = 256):
        """Recursive enumeration of feasible tracklet combinations
        (ref GenerateTrackletCombinations, Associator3D.cpp:1283-1336).
        assoc_maps: per-camera INT BITMASKS over that camera's new
        measurements (bit j = new_measurements[cam][j] admissible);
        base: current combination (tracklet ids, -1 = none)."""
        if len(out) >= cap:
            return
        if cam_idx >= self.num_cams:
            out.append(tuple(base))
            return
        if base[cam_idx] >= 0:
            tk = self.tracklets[cam_idx][base[cam_idx]]
            assoc = tk.assoc
            new_maps = [m & assoc.get(c2, 0) if c2 > cam_idx else m
                        for c2, m in enumerate(assoc_maps)]
            self._generate_combinations(new_maps, base, cam_idx + 1, out, cap)
            return
        # null tracklet
        self._generate_combinations(assoc_maps, base, cam_idx + 1, out, cap)
        m = assoc_maps[cam_idx]
        nm = self.new_measurements[cam_idx]
        tks = self.tracklets[cam_idx]
        while m:
            j = (m & -m).bit_length() - 1
            m &= m - 1
            tid = nm[j]
            assoc = tks[tid].assoc
            base2 = list(base)
            base2[cam_idx] = tid
            new_maps = [mm & assoc.get(c2, 0) if c2 > cam_idx else mm
                        for c2, mm in enumerate(assoc_maps)]
            self._generate_combinations(new_maps, base2, cam_idx + 1, out,
                                        cap)

    def _combo_tables(self):
        """Per-frame cache for the batched enumerator: per camera, the
        new-measurement tracklet ids as an int64 array plus each new
        tracklet's associability masks to every camera as a [n_c, C]
        uint64 matrix.  None when any camera has > 64 new measurements
        (the uint64 bit-matrix can't hold the mask; callers fall back to
        the exact recursive enumerator)."""
        if self._combo_tabs is not False:
            return self._combo_tabs
        C = self.num_cams
        tabs = []
        for c in range(C):
            nm = self.new_measurements[c]
            if len(nm) > 64:
                self._combo_tabs = None
                return None
            A = np.zeros((len(nm), C), np.uint64)
            tks = self.tracklets[c]
            for j, tid in enumerate(nm):
                assoc = tks[tid].assoc
                for c2 in range(C):
                    A[j, c2] = assoc.get(c2, 0)
            tabs.append((np.asarray(nm, np.int64), A))
        self._combo_tabs = tabs
        return tabs

    def _generate_combinations_batch(self, bases: np.ndarray,
                                     maps0: np.ndarray, cap: int):
        """Vectorised combination enumeration for a whole batch of roots
        at once — numerically identical output (same combinations, same
        DFS/lexicographic emission order, same cap-prefix semantics) to
        running `_generate_combinations` per root, at ~1/10 the host cost
        (the recursion was ~9600 Python calls/frame at bench density; ref
        GenerateTrackletCombinations, Associator3D.cpp:1283-1336).

        The level-by-level expansion keeps partial states in DFS order
        (null choice first, then admissible bits ascending), so trimming
        each root's partials to its first `cap` is exact: every partial
        completes at least once (the all-null suffix), in root-blocked
        lexicographic order.

        Args:
          bases: [T, C] int64 — fixed tracklet ids per camera (-1 free).
            Rows must be pre-ANDed into maps0 for their fixed cameras
            (as _branch_tracks does).
          maps0: [T, C] uint64 admissibility bitmasks.
          cap:   per-root emission cap.
        Returns (root_idx [N] int64, combos [N, C] int64) or None when the
        >64-measurement fallback applies."""
        tabs = self._combo_tables()
        if tabs is None:
            return None
        T, C = bases.shape
        root = np.arange(T, dtype=np.int64)
        choices = bases.copy()
        masks = maps0.astype(np.uint64, copy=True)
        for c in range(C):
            nm_c, A_c = tabs[c]
            free = choices[:, c] < 0
            m = np.where(free, masks[:, c], np.uint64(0))
            # ascending bit positions per partial, vectorised: little-
            # endian unpack of the 8 mask bytes -> [P, 64] bit matrix
            bits_mat = np.unpackbits(
                m[:, None].view(np.uint8), axis=1,
                bitorder="little").astype(bool)
            pcount = bits_mat.sum(1)
            counts = 1 + pcount
            ends = np.cumsum(counts)
            starts_b = ends - counts
            parent = np.repeat(np.arange(len(counts)), counts)
            nchoices = choices[parent]
            nmasks = masks[parent]
            nroot = root[parent]
            pr, bit = np.nonzero(bits_mat)
            if len(pr):
                rank = np.arange(len(pr)) - np.repeat(
                    np.cumsum(pcount) - pcount, pcount)
                dest = starts_b[pr] + 1 + rank
                nchoices[dest, c] = nm_c[bit]
                if c + 1 < C:
                    nmasks[dest, c + 1:] &= A_c[bit, c + 1:]
            choices, masks, root = nchoices, nmasks, nroot
            # per-root cap: roots arrive blocked and in order, so rank
            # within the root segment is positional
            if len(root):
                seg_new = np.empty(len(root), bool)
                seg_new[0] = True
                np.not_equal(root[1:], root[:-1], out=seg_new[1:])
                seg_start = np.flatnonzero(seg_new)
                seg_len = np.diff(np.append(seg_start, len(root)))
                rank_in_seg = (np.arange(len(root))
                               - np.repeat(seg_start, seg_len))
                keep = rank_in_seg < cap
                if not keep.all():
                    choices, masks, root = (choices[keep], masks[keep],
                                            root[keep])
        return root, choices

    # ------------------------------------------------------------------
    # seeds (ref Track3D_GenerateSeedTracks :1727-1819)
    # ------------------------------------------------------------------
    def _generate_seeds(self, frame_idx) -> List[int]:
        return self._materialize_seeds(frame_idx,
                                       self._enumerate_seeds(frame_idx))

    def _enumerate_seeds(self, frame_idx):
        """Solve-INDEPENDENT half of seed generation: combination
        enumeration, batched reconstruction and the admission gate.  Reads
        only this frame's tracklet state (set by _update_tracklets), so the
        pipelined engine runs it in the shadow of the in-flight hypothesis
        solve, before collect() — identical results, ~40 ms of host work
        overlapped with the device solve + its tunnel download."""
        if not any(self.new_measurements[c] for c in range(self.num_cams)):
            return ([], [])
        combos: List[Tuple[int, ...]] = []
        maps = [(1 << len(self.new_measurements[c])) - 1
                for c in range(self.num_cams)]
        cap = self.acfg.max_seed_combinations
        batch = self._generate_combinations_batch(
            np.full((1, self.num_cams), -1, np.int64),
            np.asarray([maps], np.uint64), cap)
        if batch is not None:
            combos = [tuple(row) for row in batch[1].tolist()]
        else:
            self._generate_combinations(maps, [-1] * self.num_cams, 0,
                                        combos, cap=cap)
        if len(combos) >= cap:
            self.seed_combos_truncated += 1
        combos = [c for c in combos if any(t >= 0 for t in c)]
        oks = [(combo, rec) for combo, rec
               in zip(combos, self._reconstruct_batch(combos))
               if rec is not None]
        enter_costs = self._admit_seeds(oks)
        oks = [oks[i] for i in range(len(oks)) if enter_costs[i] is not None]
        enter_costs = [e for e in enter_costs if e is not None]
        return (oks, enter_costs)

    def _materialize_seeds(self, frame_idx, prep) -> List[int]:
        """Registry-mutating half: turn admitted seed candidates into
        tracks + trees (must run after the previous frame's collect/prune
        so id allocation and prune visibility match sequential mode)."""
        oks, enter_costs = prep
        seeds: List[int] = []
        new_tracks = []
        if oks:
            # one stacked allocation per field for the whole seed batch;
            # each Track gets disjoint row VIEWS (appends re-buffer via
            # append_position_row, so views are never resized in place).
            # At 22-person density this is ~800 seeds/frame — per-seed
            # allocation of 16 tiny arrays dominated the stage
            n = len(oks)
            c = self.num_cams
            cap = 8  # append capacity prepaid: a surviving seed appends
            #          one position/frame, so its first appends would
            #          otherwise re-buffer all 9 per-position arrays
            b_pts = np.zeros((n, cap, 3))
            b_pts[:, 0] = np.stack([r[0] for _, r in oks])
            b_smo = b_pts.copy()
            b_vel = np.zeros((n, cap, 3))
            b_raw = np.zeros((n, cap, c, 3))
            b_raw[:, 0] = np.stack([r[1] for _, r in oks])
            b_rm = np.zeros((n, cap, c), bool)
            b_rm[:, 0] = np.stack([r[2] for _, r in oks])
            b_me = np.zeros((n, cap))
            b_me[:, 0] = [r[3] for _, r in oks]
            b_im = np.zeros((n, cap), bool)
            b_im[:, 0] = True
            b_cr = np.zeros((n, cap))
            b_cr[:, 0] = [r[4] for _, r in oks]
            b_cl = np.zeros((n, cap))
            b_lte = np.zeros((n, c), np.int64)
            b_ltl = np.zeros((n, c, 3))
            b_ls = np.zeros((n, c))
            b_lr = np.zeros((n, c, 48))
            for i, (combo, _) in enumerate(oks):
                tr = self._new_track_from_seed(
                    frame_idx, combo, b_pts[i], b_smo[i], b_vel[i],
                    b_raw[i], b_rm[i], b_me[i], b_im[i], b_cr[i], b_cl[i],
                    b_lte[i], b_ltl[i], b_ls[i], b_lr[i], cap)
                new_tracks.append(tr)
                seeds.append(tr.id)
        for tr, ce in zip(new_tracks, enter_costs):
            # enter cost precomputed by _admit_seeds' batched pass; a
            # 1-position seed's total is enter + its recon cost (link,
            # rgb, exit all zero) — set the memo directly
            tr.cost_enter = float(ce)
            tr._cost_cache = tr.cost_enter + float(tr.cost_recon_pos[0])
        return seeds

    def _admit_seeds(self, oks) -> List[Optional[float]]:
        """Seed admission gate (containment — new vs the reference, which
        births every feasible combination and prunes after the fact, ref
        Track3D_GenerateSeedTracks :1727-1819 + GTP prune :2959-2994).

        Ranks candidates by birth cost (reconstruction + enter), then
        greedily admits at most `seeds_per_cluster` per
        min_target_proximity-radius spatial cluster and at most
        `max_new_tracks_per_frame` overall.  Same-cluster candidates are
        pairwise incompatible in the hypothesis graph anyway (ref
        CheckIncompatibility :2470-2489), so the suppressed ones could
        never co-exist with the admitted — only REPLACE them, which the
        kept per-cluster alternates still allow.

        Returns a list aligned with `oks`: the candidate's enter cost if
        admitted, None if suppressed."""
        n = len(oks)
        if n == 0:
            return []
        locs = np.stack([r[1] for _, r in oks])
        masks = np.stack([r[2] for _, r in oks])
        enter = self._enter_cost_batch(locs, masks)
        acfg = self.acfg
        gcap = acfg.max_new_tracks_per_frame
        per_cluster = acfg.seeds_per_cluster
        if n <= per_cluster and n <= gcap:
            return [float(e) for e in enter]
        pts = np.stack([r[0] for _, r in oks])
        score = np.asarray([r[4] for _, r in oks]) + enter
        order = np.argsort(score, kind="stable")
        prox = acfg.min_target_proximity
        prox2 = prox * prox
        # spatial-hash greedy admission: accepted points bucket into
        # prox-sized cells; each candidate checks only its 3x3 cell
        # neighbourhood (exact distances) — O(n) instead of O(n * accepted)
        cellx = np.floor(pts[:, 0] / prox).astype(np.int64).tolist()
        celly = np.floor(pts[:, 1] / prox).astype(np.int64).tolist()
        # pure-python floats in the sequential greedy loop: numpy scalar
        # indexing/arithmetic cost ~5x more per op at this (tiny) size
        px_l, py_l, pz_l = (pts[:, 0].tolist(), pts[:, 1].tolist(),
                            pts[:, 2].tolist())
        enter_l = enter.tolist()
        grid: Dict[Tuple[int, int], List[Tuple[float, float, float]]] = {}
        na = 0
        out: List[Optional[float]] = [None] * n
        for i in order.tolist():
            if na >= gcap:
                break
            px, py, pz = px_l[i], py_l[i], pz_l[i]
            cx, cy = cellx[i], celly[i]
            near = 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for qx, qy, qz in grid.get((cx + dx, cy + dy), ()):
                        ddx = px - qx
                        ddy = py - qy
                        ddz = pz - qz
                        if ddx * ddx + ddy * ddy + ddz * ddz < prox2:
                            near += 1
            if near >= per_cluster:
                continue
            grid.setdefault((cx, cy), []).append((px, py, pz))
            na += 1
            out[i] = enter_l[i]
        self.seeds_suppressed_total += n - na
        return out

    def _new_track_from_seed(self, frame_idx, combo, points, smoothed,
                             velocity, raws, rmask, max_err, is_meas,
                             cost_rec, cost_link, last_t_end, last_t_loc,
                             last_sens, last_rgb, cap) -> Track:
        """Array arguments are [cap, ...] row views into the caller's
        batched seed allocations (disjoint rows; in-place writes never
        alias); they double as the track's append buffers."""
        reg = self.registry
        tree = reg.new_tree(frame_idx)
        # C-level dict assembly instead of the 30-kwarg dataclass
        # constructor (same motivation as _clone_track: ~140 seeds/frame
        # at bench density, ~40 us per Python-level __init__)
        tr = object.__new__(Track)
        tr.__dict__.update(dict(
            id=reg.alloc_track_id(), tree_id=tree.id, parent=None,
            num_cams=self.num_cams, combination=tuple(combo),
            time_start=frame_idx, time_end=frame_idx,
            time_generation=frame_idx,
            children=[],
            tid_hist=[[t] if t >= 0 else [] for t in combo],
            active=True, valid=True, new_track=True, current_best=False,
            n_measured=1,
            points=points[:1], smoothed=smoothed[:1],
            velocity=velocity[:1],
            raw_points=raws[:1], raw_mask=rmask[:1],
            max_error=max_err[:1], is_meas=is_meas[:1],
            cost_recon_pos=cost_rec[:1], cost_link_pos=cost_link[:1],
            cost_enter=0.0, cost_exit=0.0, cost_rgb=0.0,
            cost_trimmed=0.0, gt_prob=0.0, num_outpoint=0,
            last_t_end=last_t_end, last_t_loc=last_t_loc,
            last_sens=last_sens, last_rgb=last_rgb,
            _cost_cache=None, _share_cache=None,
            _cap=cap,
            _bufs=dict(zip(Track._POS_ARRAYS,
                           (points, smoothed, velocity, raws, rmask,
                            max_err, is_meas, cost_rec, cost_link)))))
        for ci, t2 in enumerate(combo):
            if t2 < 0:
                continue
            tk = self.tracklets[ci][t2]
            tr.last_t_end[ci] = frame_idx
            tr.last_t_loc[ci] = tk.loc3d
            tr.last_sens[ci] = tk.sensitivity
            tr.last_rgb[ci] = tk.rgb_tail
        # cost_enter assigned by the caller's batched pass
        reg.add_track(tr)
        self.active_tracks.append(tr.id)
        self.tracks_in_window.append(tr.id)
        return tr

    # ------------------------------------------------------------------
    # branching (ref Track3D_BranchTracks :1832-2242)
    # ------------------------------------------------------------------
    def _branch_tracks(self, frame_idx, seeds: List[int]):
        reg = self.registry
        candidates: List[Track] = []
        # spatial (parent, combination) pairs accumulate as array chunks:
        # each entry is ([m, C] int64 combination rows, aligned parents)
        pair_chunks: List[Tuple[np.ndarray, List[Track]]] = []

        # ---- spatial branching -------------------------------------------
        # Branch ALLOCATION must be fair across parents: with the real 2D
        # stream, tracklet rotations are STAGGERED across cameras, so a
        # re-seeded track starts as a 1-camera combination whose recon
        # cost stays positive ("visible in C, detected in 1") until a
        # spatial branch adds the other cameras.  Sorting purely by
        # (-gt_prob, cost) starved exactly those tracks of branches — they
        # died at confirmation with gt_prob 0 and re-seeded forever (the
        # round-3 density recall collapse).  Order therefore interleaves
        # unconfirmed-tree tracks with established ones, and
        # materialization is per-parent round-robin under the budget.
        self.timer.push("branch.enum")
        cost_of = {t: reg.tracks[t].total_cost()
                   for t in set(self.active_tracks) | set(self.paused_tracks)
                   if t in reg.tracks}
        budget = self.acfg.max_branches_per_frame
        est: List[int] = []
        yng: List[int] = []
        for t in self.active_tracks:
            if t in seeds:
                continue
            tree = reg.trees.get(reg.tracks[t].tree_id)
            (yng if tree is not None and not tree.confirmed else est).append(t)
        key = lambda t: (-reg.tracks[t].gt_prob, cost_of[t])
        est.sort(key=key)
        yng.sort(key=key)
        order = [t for pair in zip(yng, est) for t in pair]
        order += yng[len(est):] + est[len(yng):]
        per_track = self.acfg.spatial_branches_per_track
        parent_seq: List[int] = []
        nc = self.num_cams
        full = [(1 << len(self.new_measurements[c])) - 1
                for c in range(nc)]
        # chunked batched enumeration: roots process in `order` in chunks,
        # stopping at the 8*budget pair bound with whole-track granularity
        # exactly like the per-track loop this replaces — without paying
        # map-prep or enumeration for the (usually large) tail of roots
        # the bound cuts off
        use_batch = self._combo_tables() is not None
        CHUNK = 128
        pos = 0
        while (pos < len(order)
               and sum(len(c) for c, _ in pair_chunks) < 8 * budget):
            chunk = order[pos:pos + CHUNK]
            pos += CHUNK
            roots_maps: List[List[int]] = []
            roots_tr: List[Track] = []
            for tid in chunk:
                tr = reg.tracks[tid]
                combo = tr.combination
                maps = list(full)
                for c in range(nc):
                    if combo[c] < 0:
                        continue
                    assoc = self.tracklets[c][combo[c]].assoc
                    for c2 in range(nc):
                        m = assoc.get(c2)
                        if m is not None:
                            maps[c2] &= m
                roots_maps.append(maps)
                roots_tr.append(tr)
            if use_batch:
                bases_arr = np.asarray(
                    [tr.combination for tr in roots_tr], np.int64)
                root_idx, combos_arr = self._generate_combinations_batch(
                    bases_arr, np.asarray(roots_maps, np.uint64),
                    2 * per_track)
                # array-native selection: drop rows equal to the root's
                # own combination and apply the pair bound with
                # whole-root granularity — all without tolist/tuple
                # conversions (those cost ~2 us/row at ~2k rows/frame)
                nonbase = (combos_arr != bases_arr[root_idx]).any(1)
                seg_new = np.empty(len(root_idx), bool)
                if len(root_idx):
                    seg_new[0] = True
                    np.not_equal(root_idx[1:], root_idx[:-1],
                                 out=seg_new[1:])
                seg_starts = np.flatnonzero(seg_new)
                seg_counts = np.add.reduceat(nonbase, seg_starts) \
                    if len(seg_starts) else np.zeros(0, np.int64)
                before = np.cumsum(seg_counts) - seg_counts
                rem = 8 * budget - sum(len(c) for c, _ in pair_chunks)
                allowed_seg = before < rem
                row_allowed = np.repeat(
                    allowed_seg,
                    np.diff(np.append(seg_starts, len(root_idx))))
                keep_rows = np.flatnonzero(nonbase & row_allowed)
                if len(keep_rows):
                    pair_chunks.append((combos_arr[keep_rows],
                                        [roots_tr[int(r)]
                                         for r in root_idx[keep_rows]]))
                for k in np.flatnonzero(allowed_seg & (seg_counts > 0)):
                    parent_seq.append(
                        roots_tr[int(root_idx[seg_starts[k]])].id)
            else:
                rows: List[Tuple[int, ...]] = []
                row_parents: List[Track] = []
                total = sum(len(c) for c, _ in pair_chunks)
                for i, tr in enumerate(roots_tr):
                    if total + len(rows) >= 8 * budget:
                        break   # reconstruction-batch bound
                    combo = tr.combination
                    branches: List[Tuple[int, ...]] = []
                    self._generate_combinations(roots_maps[i], list(combo),
                                                0, branches,
                                                cap=2 * per_track)
                    had = False
                    for br in branches:
                        if br != combo:
                            rows.append(br)
                            row_parents.append(tr)
                            had = True
                    if had:
                        parent_seq.append(tr.id)
                if rows:
                    pair_chunks.append((np.asarray(rows, np.int64),
                                        row_parents))

        self.timer.pop()
        # batch-reconstruct all spatial branch combinations (geometry
        # only — the visibility-ratio cost pass runs later, for the
        # materialized survivors only), then batch the link probabilities
        self.timer.push("branch.spawn")
        if pair_chunks:
            all_combos = np.concatenate([c for c, _ in pair_chunks], 0)
            all_parents: List[Track] = []
            for _, ps in pair_chunks:
                all_parents.extend(ps)
        else:
            all_combos = np.zeros((0, nc), np.int64)
            all_parents = []
        r_point, r_locs, r_mask, r_merr, r_prob, r_ok = \
            self._reconstruct_batch(all_combos, skip_cost=True,
                                    as_arrays=True)
        ok_idx = np.flatnonzero(r_ok)
        if len(ok_idx):
            # previous point per parent (cached per parent id — parents
            # repeat across their branch rows)
            prev_cache: Dict[int, np.ndarray] = {}
            prev_rows = []
            for i in ok_idx:
                parent = all_parents[i]
                p = prev_cache.get(parent.id)
                if p is None:
                    p = (parent.points[0] if parent.length < 2
                         else parent.points[-2])
                    prev_cache[parent.id] = p
                prev_rows.append(p)
            p_links = _link_prob_batch(
                np.stack(prev_rows), r_point[ok_idx],
                np.ones(len(ok_idx)), self.acfg.max_moving_speed)
            groups: Dict[int, List[Tuple[int, float]]] = {}
            pl_list = p_links.tolist()
            pmin = self.acfg.min_linking_probability
            for j, i in enumerate(ok_idx.tolist()):
                pl = pl_list[j]
                if pl < pmin:
                    continue
                groups.setdefault(all_parents[i].id, []).append((i, pl))
            # round-robin selection: every parent gets its first branch
            # before any parent gets its second
            chosen: List[Tuple[int, float]] = []
            ptr = {pid: 0 for pid in groups}
            quota = budget - len(candidates)
            progress = True
            while len(chosen) < quota and progress:
                progress = False
                for pid in parent_seq:
                    lst = groups.get(pid)
                    if lst is None:
                        continue
                    k = ptr[pid]
                    if k >= min(len(lst), per_track):
                        continue
                    ptr[pid] = k + 1
                    progress = True
                    chosen.append(lst[k])
                    if len(chosen) >= quota:
                        break
            if chosen:
                sel = np.asarray([i for i, _ in chosen])
                costs = self._recon_cost_batch(
                    r_point[sel], r_mask[sel], r_prob[sel])
                candidates.extend(self._spawn_spatial_batch(
                    frame_idx, [all_parents[i] for i in sel.tolist()],
                    all_combos[sel], r_point[sel], r_locs[sel],
                    r_mask[sel], r_merr[sel], np.asarray(costs),
                    np.asarray([pl for _, pl in chosen])))

        self.timer.pop()
        # ---- temporal branching ------------------------------------------
        self.timer.push("branch.temporal")
        order_p = sorted(self.paused_tracks,
                         key=lambda t: (-reg.tracks[t].gt_prob, cost_of[t]))
        seed_trs = [reg.tracks[sid] for sid in seeds if sid in reg.tracks]
        if order_p and seed_trs:
            # the pair gate only needs a THRESHOLD, not the probability:
            # p = 0.5*erfc(4d/(ms*g) - 2) >= pmin  <=>
            # d <= ms*g*(2 + erfcinv(2*pmin))/4  (erfc is monotone
            # decreasing), so the paused x seeds sweep is one squared-
            # distance matrix (Gram-trick matmul) against a per-gap
            # radius — no erfc/norm over the full cross product (that
            # erfc pass was ~60% of the branch stage at 22-person load)
            paused_trs = [reg.tracks[t] for t in order_p]
            # every seed is born THIS frame (time_start == frame_idx), so
            # the time gap — and with it the link-probability radius — is
            # constant per paused row; rows with an infeasible gap never
            # touch the distance sweep at all
            gap_row = frame_idx - np.asarray(
                [t.time_end for t in paused_trs])
            row_ok = (gap_row >= 1) & (gap_row <= self.acfg.max_time_jump)
            # temporal branches get their OWN budget — a saturated spatial
            # pass must not cancel the paused tracks' resume candidates
            budget = len(candidates) + self.acfg.max_branches_per_frame
            if row_ok.any():
                rows = np.flatnonzero(row_ok)
                last_pts = np.stack([paused_trs[pi].points
                                     [paused_trs[pi].n_measured - 1]
                                     for pi in rows])
                seed_pts = np.stack([s.points[0] for s in seed_trs])
                d2 = ((last_pts * last_pts).sum(1)[:, None]
                      + (seed_pts * seed_pts).sum(1)[None, :]
                      - 2.0 * (last_pts @ seed_pts.T))
                r = (self.acfg.max_moving_speed * gap_row[rows]
                     * (2.0 + _erfcinv(
                         2.0 * self.acfg.min_linking_probability)) / 4.0)
                # clamp: erfcinv makes r NEGATIVE when pmin > 0.5*erfc(-2)
                # (~0.9977) — squaring would silently flip the gate open
                ok = d2 <= (np.maximum(r, 0.0) ** 2)[:, None]
                # row-major scan with the budget break of the original
                # nested loop; each paused track takes only its CLOSEST
                # few seeds (temporal_branches_per_track) so the global
                # budget spreads across all paused tracks — at density,
                # letting the best-ranked rows consume the budget on every
                # feasible pairing starved later targets of their resume
                # candidates (the r3 deferred-window MOTA inversion)
                per_track = self.acfg.temporal_branches_per_track
                for k, pi in enumerate(rows):
                    if len(candidates) >= budget:
                        break
                    g = int(gap_row[pi])
                    feas = np.flatnonzero(ok[k])
                    if len(feas) > per_track:
                        sub = np.argsort(d2[k, feas],
                                         kind="stable")[:per_track]
                        feas = feas[sub]
                    for si in feas:
                        if len(candidates) >= budget:
                            break
                        cand = self._make_temporal_branch(
                            frame_idx, paused_trs[pi], seed_trs[si], g)
                        if cand is not None:
                            candidates.append(cand)

        self.timer.pop()
        # batched history/connectivity/RGB application decides the final
        # candidate survivors
        candidates = self._apply_history_batch(candidates, frame_idx)
        # The batched smoothing/scoring of this frame's updated tracks
        # (deferred from _update_tracks) + every branch candidate is fused
        # into the hypothesis solve (ONE device dispatch per frame).
        # Candidates register optimistically; _form_hypotheses drops the
        # ones the device invalidates.
        updated = getattr(self, "_pending_rescore", [])
        self._pending_rescore = []
        self.diag["branches"] = len(candidates)
        self.diag["seeds"] = len(seeds)
        for cand in candidates:
            reg.add_track(cand)
            self.tracks_in_window.append(cand.id)
        self._rescore_updated = updated
        self._rescore_candidates = candidates

    def _spawn_spatial_batch(self, frame_idx, parents: List[Track],
                             combos, points, raws, rmasks, merrs,
                             cost_recs, p_links) -> List[Track]:
        """Materialize the chosen spatial-branch survivors in one batched
        pass: each candidate is a full-length clone of its parent with the
        LAST position row replaced by the branch reconstruction (ref
        branch loop, Associator3D.cpp:1839-2237).  The per-candidate
        formulation did 9 Python-level array copies per clone (~2100
        np copies/frame at bench density); here each per-position array
        copies once for ALL candidates via a single C-level concatenate,
        and the last-row replacements land as one advanced-indexed write
        per array.  Bit-identical to the per-candidate path."""
        reg = self.registry
        lens = np.fromiter((p.length for p in parents), np.int64,
                           len(parents))
        offs = np.zeros(len(parents) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        last = offs[1:] - 1
        blocks = {name: np.concatenate([getattr(p, name) for p in parents],
                                       0) for name in Track._POS_ARRAYS}
        new_links = -np.log(np.maximum(p_links, 1e-300))
        # cost-memo deltas read BEFORE the last-row overwrite
        old_rec = blocks["cost_recon_pos"][last].copy()
        old_lnk = blocks["cost_link_pos"][last].copy()
        blocks["points"][last] = points
        blocks["smoothed"][last] = points
        blocks["raw_points"][last] = raws
        blocks["raw_mask"][last] = rmasks
        blocks["max_error"][last] = merrs
        blocks["is_meas"][last] = True
        blocks["cost_recon_pos"][last] = cost_recs
        blocks["cost_link_pos"][last] = new_links
        # per-camera last-tracklet state: one C-level stack per field —
        # each candidate owns its (disjoint) row, replacing 4 np copies
        # per clone
        lt_end = np.stack([p.last_t_end for p in parents])
        lt_loc = np.stack([p.last_t_loc for p in parents])
        lt_sens = np.stack([p.last_sens for p in parents])
        lt_rgb = np.stack([p.last_rgb for p in parents])
        out: List[Track] = []
        names = Track._POS_ARRAYS
        offs_l = offs.tolist()
        combos_l = np.asarray(combos).tolist()
        for j, p in enumerate(parents):
            tr = self._clone_track(p, reg.alloc_track_id(), frame_idx,
                                   share_arrays=True, share_last=True)
            a, b = offs_l[j], offs_l[j + 1]
            d = tr.__dict__
            for name in names:
                d[name] = blocks[name][a:b]
            d["last_t_end"] = lt_end[j]
            d["last_t_loc"] = lt_loc[j]
            d["last_sens"] = lt_sens[j]
            d["last_rgb"] = lt_rgb[j]
            if p._cost_cache is not None:
                # same grouping as the scalar path (clone transfer, then
                # the last-row recon/link delta) for bit-identical floats
                tr._cost_cache = ((p._cost_cache - p.cost_exit)
                                  + ((float(cost_recs[j]) - float(old_rec[j]))
                                     + (float(new_links[j])
                                        - float(old_lnk[j]))))
            tr.combination = tuple(combos_l[j])
            # tracklet history + connectivity + RGB applied by the
            # caller's batched _apply_history_batch pass
            out.append(tr)
        return out

    def _make_temporal_branch(self, frame_idx, paused: Track,
                              seed: Track, gap: int) -> Optional[Track]:
        """Caller (_branch_tracks) has already gate-checked the gap range
        and the batched link probability for this (paused, seed) pair."""
        last_meas = paused.points[paused.n_measured - 1]
        seed_pt = seed.points[0]
        reg = self.registry
        # build the branched arrays in ONE allocation each (clone of the
        # measured prefix + interpolated gap + the seed position) — the
        # clone-then-append formulation this replaces copied every array
        # twice per candidate (ref interpolation loop :2104-2121)
        ln = paused.n_measured
        c = self.num_cams
        delta = (seed_pt - last_meas) / gap
        pts = last_meas[None] + delta[None] * np.arange(1, gap + 1)[:, None]
        pts[-1] = seed_pt
        vel = np.diff(np.vstack([paused.smoothed[ln - 1:ln], pts]), axis=0)

        def blk(prefix, tail_shape, last_val, dtype=None):
            out = np.zeros((ln + gap,) + tail_shape,
                           prefix.dtype if dtype is None else dtype)
            out[:ln] = prefix[:ln]
            if last_val is not None:
                out[-1] = last_val
            return out

        tr = self._clone_track(paused, reg.alloc_track_id(), frame_idx,
                               length=ln, share_arrays=True)
        tr.points = np.concatenate([paused.points[:ln], pts], 0)
        tr.smoothed = np.concatenate([paused.smoothed[:ln], pts], 0)
        tr.velocity = np.concatenate([paused.velocity[:ln], vel], 0)
        tr.raw_points = blk(paused.raw_points, (c, 3), seed.raw_points[0])
        tr.raw_mask = blk(paused.raw_mask, (c,), seed.raw_mask[0])
        tr.max_error = blk(paused.max_error, (), seed.max_error[0])
        tr.is_meas = blk(paused.is_meas, (), True)
        tr.cost_recon_pos = blk(paused.cost_recon_pos, (),
                                seed.cost_recon_pos[0])
        tr.cost_link_pos = blk(paused.cost_link_pos, (), None)
        tr.combination = seed.combination
        tr.time_end = seed.time_end
        tr.n_measured = tr.length
        # tracklet history applied by the caller's batched pass
        return tr

    def _clone_track(self, src: Track, new_id: int, frame_idx: int,
                     length: Optional[int] = None,
                     share_arrays: bool = False,
                     share_last: bool = False) -> Track:
        """share_arrays=True skips the per-position array copies — the
        caller promises to REPLACE every per-position array before the
        track is used (the temporal-branch constructor builds them in one
        pass).  share_last=True likewise skips the four last_t_* copies
        (the batched spawner assigns stacked rows).

        Built via a C-level __dict__ copy instead of the 30-kwarg
        dataclass constructor: ~420 branch candidates clone per frame at
        bench density and the Python-level __init__ alone was the single
        largest host cost (~40 us/clone)."""
        ln = src.length if length is None else length
        tr = object.__new__(Track)
        d = tr.__dict__
        d.update(src.__dict__)
        d["id"] = new_id
        d["parent"] = src.id
        d["children"] = []
        d["tid_hist"] = [list(h) for h in src.tid_hist]
        d["time_generation"] = frame_idx
        d["n_measured"] = min(src.n_measured, ln)
        d["active"] = True
        d["valid"] = True
        d["new_track"] = True
        d["current_best"] = False
        d["num_outpoint"] = 0
        d["cost_exit"] = 0.0
        d["_cap"] = None
        d["_bufs"] = {}
        # _share_cache rides along: the copied tid_hist has the same
        # content, and the cache key (total hist length) invalidates it
        # naturally on the clone's own appends
        if not share_last:
            d["last_t_end"] = src.last_t_end.copy()
            d["last_t_loc"] = src.last_t_loc.copy()
            d["last_sens"] = src.last_sens.copy()
            d["last_rgb"] = src.last_rgb.copy()
        if share_arrays:
            d["_cost_cache"] = None
        else:
            for name in Track._POS_ARRAYS:
                d[name] = getattr(src, name)[:ln].copy()
            if ln == src.length and src._cost_cache is not None:
                # full-prefix clone: identical per-position costs, exit
                # reset to 0 — the parent's warm memo transfers by delta
                d["_cost_cache"] = src._cost_cache - src.cost_exit
            else:
                d["_cost_cache"] = None
        return tr

    def _apply_history_batch(self, cands: List[Track],
                             frame_idx) -> List[Track]:
        """Tracklet-history append + connectivity gate + RGB cost for a
        whole candidate batch (ref :1985-2031), one vectorised pass per
        camera — the per-candidate scalar version cost ~15 ms/frame at
        bench density.  Returns the surviving candidates."""
        if not cands:
            return cands
        acfg = self.acfg
        tabs = self._tracklet_tables()
        ok = np.ones(len(cands), bool)
        for c in range(self.num_cams):
            idxs = [i for i, tr in enumerate(cands)
                    if ok[i] and tr.combination[c] >= 0
                    and (not tr.tid_hist[c]
                         or tr.tid_hist[c][-1] != tr.combination[c])]
            if not idxs:
                continue
            tids, tl, _, _, ts_, rh, rt = tabs[c]
            t2s = np.asarray([cands[i].combination[c] for i in idxs])
            pos = np.searchsorted(tids, t2s)
            loc = tl[pos]
            sens = ts_[pos]
            first = np.asarray([not cands[i].tid_hist[c] for i in idxs])
            last_end = np.asarray([cands[i].last_t_end[c] for i in idxs])
            last_loc = np.stack([cands[i].last_t_loc[c] for i in idxs])
            last_sens = np.asarray([cands[i].last_sens[c] for i in idxs])
            last_rgb = np.stack([cands[i].last_rgb[c] for i in idxs])
            gap = frame_idx - last_end
            d = np.linalg.norm(last_loc - loc, axis=1)
            thresh = np.maximum(acfg.cost_tracklet_link_min_dist,
                                acfg.e_cal + acfg.e_det
                                * (last_sens + sens))
            fail = (~first) & (gap <= 1) & (d > thresh)
            n2 = ((last_rgb - rh[pos]) ** 2).sum(-1)
            rgbc = np.where(
                (n2 <= acfg.cost_rgb_min_dist) | first, 0.0,
                acfg.cost_rgb_coef
                * np.exp(-acfg.cost_rgb_decay
                         * (np.asarray(gap, np.float64) - 1.0))
                * (n2 - acfg.cost_rgb_min_dist))
            for k, i in enumerate(idxs):
                if fail[k]:
                    ok[i] = False
                    continue
                tr = cands[i]
                tr.tid_hist[c].append(int(t2s[k]))
                tr._hist_ver += 1
                if rgbc[k]:
                    tr.cost_rgb += float(rgbc[k])
                    if tr._cost_cache is not None:
                        tr._cost_cache += float(rgbc[k])
                tr.last_rgb[c] = rt[pos[k]]
                tr.last_t_loc[c] = loc[k]
                tr.last_t_end[c] = frame_idx
                tr.last_sens[c] = sens[k]
        return [tr for i, tr in enumerate(cands) if ok[i]]

    # ------------------------------------------------------------------
    # 7f. hypothesis formation (ref :2589-2834)
    # ------------------------------------------------------------------
    def _track_share_codes(self, tr: Track) -> np.ndarray:
        """Global integer codes of every (camera, tracklet id) in the
        track's history, cached on the track (_hist_ver invalidates);
        histories only grow on rotation frames, so ~all lookups hit."""
        hl = tr._hist_ver
        cached = tr._share_cache
        if cached is not None and cached[0] == hl:
            return cached[1]
        codes = self._share_codes
        out = []
        for c, hist in enumerate(tr.tid_hist):
            for t2 in hist:
                k = (c, t2)
                v = codes.get(k)
                if v is None:
                    v = len(codes)
                    codes[k] = v
                out.append(v)
        arr = np.asarray(out, np.int64)
        tr._share_cache = (hl, arr)
        return arr

    def _shared_matrix(self, pool: List[int], nb: int) -> np.ndarray:
        """[nb, nb] bool: tracks i and j share a 2D tracklet id in any
        camera, over their FULL id histories — the exact relation the
        reference computes by scanning both tracks' complete per-camera
        deques (ref CheckIncompatibility, Associator3D.cpp:2422-2466; its
        first/back range tests there are monotone-id skip optimisations,
        not semantics).  One sparse incidence product over per-track
        cached code arrays replaces the O(N^2 * |hist|^2) pairwise scan."""
        from scipy import sparse

        reg = self.registry
        code_arrs = [self._track_share_codes(reg.tracks[t]) for t in pool]
        lens = np.asarray([len(a) for a in code_arrs])
        shared = np.zeros((nb, nb), bool)
        if lens.sum():
            rows = np.repeat(np.arange(len(pool)), lens)
            cols = np.concatenate(code_arrs)
            m = sparse.csr_matrix(
                (np.ones(len(rows), np.int8), (rows, cols)),
                shape=(len(pool), len(self._share_codes)))
            shared[:len(pool), :len(pool)] = (m @ m.T).toarray() > 0
        return shared

    def _finish_rescore(self, updated: List[Track],
                        candidates: List[Track], seeds: List[int]):
        """Post-device bookkeeping: the frame's active set is the surviving
        updated tracks, this frame's seeds, and the surviving branch
        candidates.  (The merged-rescore predecessor of this code dropped
        seeds from the active set whenever any track updated — seed tracks
        then never received a second position.)"""
        reg = self.registry
        self.active_tracks = (
            [tr.id for tr in updated if tr.valid]
            + [s for s in seeds
               if s in reg.tracks and reg.tracks[s].valid]
            + [c.id for c in candidates if c.valid])

    def _form_hypotheses(self, frame_idx, seeds: List[int]):
        reg = self.registry
        vmax = self.cfg.solver.max_vertices
        updated = getattr(self, "_rescore_updated", [])
        candidates = getattr(self, "_rescore_candidates", [])
        self._rescore_updated = []
        self._rescore_candidates = []
        rescore = updated + candidates
        pending = {tr.id for tr in rescore}

        self.timer.push("hyp.inputs")
        # frame-scoped cost cache (memoized sums, one dict pass)
        cost_of = {tid: tr.total_cost() for tid, tr in reg.tracks.items()}

        # update related sets (ref Hypothesis_UpdateHypotheses :2589-2652):
        # every carried hypothesis's related set = its previous related
        # plus new-track children; the sets only feed the UNION pool the
        # single per-frame solve optimises over, so build that union in
        # one pass instead of 30 sorted per-hypothesis lists (the
        # per-hypothesis solve partitioning collapsed into one warm-
        # started instance long ago)
        hyp_inputs: List[Hypothesis] = []
        related_union: List[int] = []
        seen_rel = set()

        # the K hypotheses' related lists share their unconfirmed tail
        # (set in _prune), so the inline dup-skip below fires for ~29/30
        # of the iterations; skipping the whole body on a dup is exact —
        # a dup's children pass adds nothing (a track first seen as a
        # CHILD is a this-frame track with no children of its own yet)
        for h in self.prev_hypotheses[:self.acfg.k_best_size]:
            for tid in h.related:
                if tid in seen_rel:
                    continue
                seen_rel.add(tid)
                related_union.append(tid)
                t = reg.tracks.get(tid)
                if t is None:
                    continue
                for ch in t.children:
                    if ch in seen_rel:
                        continue
                    cht = reg.tracks.get(ch)
                    if cht is not None and cht.new_track:
                        seen_rel.add(ch)
                        related_union.append(ch)
            hyp_inputs.append(Hypothesis(
                selected=list(h.selected), related=[],
                log_likelihood=h.log_likelihood))

        for s in seeds:
            if s not in seen_rel:
                seen_rel.add(s)
                related_union.append(s)
        if not hyp_inputs:
            related_union = [t for t in self.tracks_in_window]
            hyp_inputs = [Hypothesis(selected=[], related=[],
                                     log_likelihood=0.0)]

        # global candidate pool: the related union, filtered; tracks
        # awaiting this frame's window re-scoring stay in (the device
        # applies the loglik > 0 vertex filter to them after re-costing)
        pool: List[int] = []
        for t in related_union:
            tr = reg.tracks.get(t)
            if tr is not None and tr.valid \
                    and (t in pending or cost_of[t] < 0.0):
                pool.append(t)
        self.timer.pop()
        if not pool:
            self._rescore_tails(rescore)
            self._finish_rescore(updated, candidates, seeds)
            self.prev_hypotheses = []
            self.best_solution = []
            if self.deferred_solve:
                self._pending_solve = dict(frame_idx=frame_idx, empty=True)
            return
        if len(pool) > vmax:
            # explicit rank-pruning instead of a silent truncation: keep
            # the top-V by (-gt_prob, cost) — the same priority order the
            # reference's MAX_TRACK_IN_OPTIMIZATION cap applies
            # (ref Associator3D.cpp:23 + 2959-2994) — and count the drops
            pool.sort(key=lambda t: (-reg.tracks[t].gt_prob, cost_of[t]))
            self.pool_dropped_last = len(pool) - vmax
            self.pool_dropped_total += self.pool_dropped_last
            pool = pool[:vmax]
        else:
            self.pool_dropped_last = 0
        pool_idx = {t: i for i, t in enumerate(pool)}
        n = len(pool)
        # only pool members' graph weights need fresh window scores, and
        # only their windows changed this frame matter — tracks outside
        # the solver pool keep their host raw-point costs (they are the
        # rank-pruned tail; the reference re-smooths everything because it
        # can afford to on CPU, ref :1468-1516, but their smoothed state
        # is never read before they are pruned or re-enter the pool).
        # This caps the fat f16 window upload at the pool size instead of
        # the full updated-track count.
        rescore = [tr for tr in rescore if tr.id in pool_idx]

        # compatibility matrix on device (bucketed padding, one compile
        # per graph-size bucket); track windows land on a COMMON absolute
        # time grid [frame_idx - W + 1 .. frame_idx] so the device program
        # needs no per-pair index alignment
        self.timer.push("hyp.prep")
        # graph bucket floored at min(256, vmax): padding is cheap, and a
        # coarse floor keeps the fused-program compile count at <=3 per
        # run (each ~8 s at V=1024 through the tunnel) so bucket compiles
        # land in the bench's warmup frames instead of the measured window
        nb = min(_bucket(n, lo=min(256, vmax)), vmax)
        tree_ids = np.full((nb,), -1, np.int32)
        shared = self._shared_matrix(pool, nb)
        w = self.win
        pos_grid = np.zeros((nb, w, 3), np.float32)
        have = np.zeros((nb, w), bool)
        pvalid = np.zeros((nb,), bool)
        t0_grid = frame_idx - w + 1
        # ragged scatter: collect each track's in-grid slice, then land
        # them all in two vectorised index assignments (the per-track
        # slice-assign loop cost ~1/3 of hyp.prep at 1000-track pools)
        # per-vertex cost split (computed in the SAME pool pass as the
        # grid collect below): the window part comes from the device's
        # fused re-scoring (row_map points into the rescore batch); the
        # host part is everything outside the window — enter/RGB/exit plus
        # the pre-window positions' recon costs and link costs up to and
        # including the seam link (s-1, s), which the device window cannot
        # see (its predecessor position lies outside the window)
        pts, raws, rmask, merr, lens, starts = self._pack_windows(rescore)
        row_of = {tr.id: i for i, tr in enumerate(rescore)}
        row_map = np.full((vmax,), -1, np.int32)
        host_base = np.zeros((vmax,), np.float32)
        gate = self.acfg.sg_span // 2
        lens_l = lens.tolist()
        starts_l = starts.tolist()
        tracks_d = reg.tracks
        # columnar pool pass: listcomp attr gathers + vectorised grid
        # arithmetic replace the ~15-op-per-row interpreter loop this
        # evolved from (~9 ms at 1000-track pools); only the in-grid
        # slice views and the rescore rows' prefix sums stay as loops
        pool_trs = [tracks_d[t] for t in pool]
        tree_ids[:n] = [tr.tree_id for tr in pool_trs]
        ts0_a = np.fromiter((tr.time_start for tr in pool_trs), np.int64, n)
        te_a = ts0_a + np.fromiter((tr.length for tr in pool_trs),
                                   np.int64, n) - 1
        ts_a = np.maximum(ts0_a, t0_grid)
        rows_l = np.flatnonzero(te_a >= ts_a)
        k0_l = ts_a[rows_l] - t0_grid
        ln_l = te_a[rows_l] - ts_a[rows_l] + 1
        s0s = (ts_a - ts0_a)[rows_l]
        vals = [pool_trs[i].points[s0:s0 + c]
                for i, s0, c in zip(rows_l.tolist(), s0s.tolist(),
                                    ln_l.tolist())]
        row_map[:n] = [row_of.get(t, -1) for t in pool]
        # short tracks / non-rescore rows keep their host raw-point costs
        # in full (the device adds no window cost for them)
        host_base[:n] = [cost_of[t] for t in pool]
        rm_n = row_map[:n]
        for i in np.flatnonzero(rm_n >= 0).tolist():
            r = rm_n[i]
            if lens_l[r] < gate:
                continue
            tr = pool_trs[i]
            s = starts_l[r]
            hb = (tr.cost_enter + tr.cost_rgb + tr.cost_exit
                  + tr.cost_trimmed
                  + float(tr.cost_recon_pos[:s].sum()))
            if s > 0:
                hb += float(tr.cost_link_pos[:s + 1].sum())
            host_base[i] = hb
        pvalid[:n] = True
        if len(rows_l):
            ln_a = np.asarray(ln_l)
            cum = np.cumsum(ln_a)
            flat_i = np.repeat(np.asarray(rows_l), ln_a)
            offs = np.arange(cum[-1]) - np.repeat(cum - ln_a, ln_a)
            flat_k = np.repeat(np.asarray(k0_l), ln_a) + offs
            pos_grid[flat_i, flat_k] = np.concatenate(vals, 0)
            have[flat_i, flat_k] = True
        # pad rows get unique fake tree ids so they never count as same-tree
        tree_ids[n:] = -(np.arange(nb - n) + 2)

        # solve the frame's hypothesis graph in ONE device call: every
        # carried hypothesis warm-starts a replica of a single replica-
        # parallel BLS over the union pool (the merged local optima give
        # the K-best list — same dedup/sort semantics as the reference's
        # per-hypothesis OpenMP solves + merge, ref Associator3D.cpp:
        # 2676-2708 + 2797-2828, at 1/K the device cost).  Warm-slot count
        # = k_best_size (static), so this compiles once.
        iters = self.cfg.solver.max_iterations
        init_masks = np.zeros((self.acfg.k_best_size, vmax), bool)
        for hi, h in enumerate(hyp_inputs[:self.acfg.k_best_size]):
            for t in h.selected:
                if t in pool_idx:
                    init_masks[hi, pool_idx[t]] = True
        self.solver_key, k = jax.random.split(self.solver_key)
        self.timer.pop()
        with self.timer.stage("hyp.dispatch"):
            # position arrays ship as f16 (see rescore_and_solve)
            out = self._rescore_and_solve(
                self._dev(pts.astype(np.float16), True),
                self._dev(raws.astype(np.float16), True),
                self._dev(rmask, True),
                self._dev(merr.astype(np.float16), True),
                self._dev(lens, True), self.cams,
                self._dev(row_map), self._dev(host_base),
                self._dev(tree_ids, True),
                self._dev(np.packbits(shared, axis=1)),
                self._dev(pos_grid.astype(np.float16), True),
                self._dev(have, True),
                self._dev(pvalid, True), self._dev(init_masks),
                self._dev(k), iters)
        # new_track consumption point (the related-set expansion above was
        # this frame's only reader)
        for t in reg.tracks.values():
            t.new_track = False
        pend = dict(frame_idx=frame_idx, out=out, updated=updated,
                    candidates=candidates, seeds=seeds, rescore=rescore,
                    pool=pool, n=n, nb=nb, row_map=row_map,
                    host_base=host_base, lens=lens, starts=starts,
                    init_masks=init_masks, tree_ids=tree_ids,
                    shared=shared, pos_grid=pos_grid, have=have,
                    pvalid=pvalid)
        if self.deferred_solve:
            if self.external_fetch:
                # the engine combines this solve's download with the 2D
                # step's into ONE tunnel round trip (pipeline.py attaches
                # pend["fetch"] right after the 2D dispatch) — each fetch
                # request costs ~33 ms of serial tunnel occupancy
                # regardless of payload
                self._pending_solve = pend
                return
            # background-thread fetch: the axon runtime executes + streams
            # results only when a fetch arrives (copy_to_host_async is a
            # no-op there), so the fetch must START now to overlap the
            # next frame's host work (see parallel.mesh.AsyncFetch)
            from mcmtt_opticalflow_tpu.parallel.mesh import AsyncFetch
            pend["fetch"] = AsyncFetch(out)
            self._pending_solve = pend
            return
        self._collect_solve(pend)

    def precompile(self, pairs=((256, 1024), (512, 512), (512, 1024))):
        """Force-compile the fused rescore+compat+solve program at the
        given (rescore bucket, graph bucket) pairs with zero-filled
        inputs.  Long runs otherwise hit their terminal buckets mid-
        measurement (~1-8 s Mosaic compiles through the tunnel; the
        persistent jax cache does not capture them).  Call after the
        engine's own warmup frames; pairs beyond max_vertices skip."""
        vmax = self.cfg.solver.max_vertices
        c = self.num_cams
        w, wg = self.win_rescore, self.win
        k = self.acfg.k_best_size
        iters = self.cfg.solver.max_iterations
        from mcmtt_opticalflow_tpu.parallel.mesh import fetch
        for nr, nb in pairs:
            if nb > vmax:
                continue
            out = self._rescore_and_solve(
                self._dev(np.zeros((nr, w, 3), np.float16), True),
                self._dev(np.zeros((nr, w, c, 3), np.float16), True),
                self._dev(np.zeros((nr, w, c), bool), True),
                self._dev(np.zeros((nr, w), np.float16), True),
                self._dev(np.ones((nr,), np.int32), True), self.cams,
                self._dev(np.full((vmax,), -1, np.int32)),
                self._dev(np.zeros((vmax,), np.float32)),
                self._dev(np.full((nb,), -1, np.int32), True),
                self._dev(np.packbits(np.zeros((nb, nb), bool), axis=1)),
                self._dev(np.zeros((nb, wg, 3), np.float16), True),
                self._dev(np.zeros((nb, wg), bool), True),
                self._dev(np.zeros((nb,), bool), True),
                self._dev(np.zeros((k, vmax), bool)),
                self._dev(jax.random.PRNGKey(0)), iters)
            fetch(out)

    def _unpack_solve(self, flat, nr):
        """Host inverse of rescore_and_solve's single-leaf packing.
        nr: the rescore bucket size (rows of the f16 block)."""
        from mcmtt_opticalflow_tpu.models.costs import WindowScore

        w = self.win_rescore
        cols = 5 * w + 2

        def make_ws(a):
            return WindowScore(
                smoothed=a[:, :3 * w].reshape(nr, w, 3),
                velocity=np.zeros((0,), np.float32),
                cost_recon=a[:, 3 * w:4 * w],
                cost_link=a[:, 4 * w:5 * w],
                window_cost=a[:, 5 * w].astype(np.float32),
                valid=a[:, 5 * w + 1] > 0.5)

        if isinstance(flat, tuple):          # MCMTT_SOLVE_LEAVES=2
            a, b2 = np.asarray(flat[0]), np.asarray(flat[1])
            return (make_ws(a), b2[:, :-4],
                    b2[:, -4:].copy().view(np.float32).ravel())
        flat = np.asarray(flat)
        if flat.ndim == 2:                   # default f16 single leaf
            vb = self.cfg.solver.max_vertices // 8
            vbp = vb + (vb & 1)              # device pads mask bytes even
            a = flat[:nr]
            kt = flat[nr:]
            kb_masks = kt[:, :vbp // 2].copy().view(np.uint8)[:, :vb]
            kb_scores = (kt[:, vbp // 2:vbp // 2 + 2].copy()
                         .view(np.float32).ravel())
            return make_ws(a), kb_masks, kb_scores
        a = flat[:nr * cols * 2].view(np.float16).reshape(nr, cols)
        ws = WindowScore(
            smoothed=a[:, :3 * w].reshape(nr, w, 3),
            velocity=np.zeros((0,), np.float32),
            cost_recon=a[:, 3 * w:4 * w],
            cost_link=a[:, 4 * w:5 * w],
            window_cost=a[:, 5 * w].astype(np.float32),
            valid=a[:, 5 * w + 1] > 0.5)
        b = flat[nr * cols * 2:].reshape(self.acfg.k_best_size, -1)
        kb_masks = b[:, :-4]
        kb_scores = b[:, -4:].copy().view(np.float32).ravel()
        return ws, kb_masks, kb_scores

    def _collect_solve(self, p: dict):
        """Post-fetch half of the hypothesis step: apply window scores,
        collect the K-best local optima into hypotheses, set GTProb and
        the best solution (ref Associator3D.cpp:2687-2834)."""
        reg = self.registry
        frame_idx = p["frame_idx"]
        updated, candidates, seeds = p["updated"], p["candidates"], p["seeds"]
        rescore, pool, n, nb = p["rescore"], p["pool"], p["n"], p["nb"]
        row_map, host_base = p["row_map"], p["host_base"]
        lens, starts, init_masks = p["lens"], p["starts"], p["init_masks"]
        tree_ids, shared = p["tree_ids"], p["shared"]
        pos_grid, have, pvalid = p["pos_grid"], p["have"], p["pvalid"]
        all_solutions: List[Tuple[frozenset, float]] = []
        with self.timer.stage("hyp.solve"):
            if "fetch" in p:
                fetched = p["fetch"].get()
            else:
                from mcmtt_opticalflow_tpu.parallel.mesh import fetch
                fetched = fetch(p["out"])
            ws, kb_masks, kb_scores = self._unpack_solve(
                fetched, len(p["lens"]))
        with self.timer.stage("hyp.apply"):
            self._apply_window_scores(rescore, ws, lens, starts)
            self._finish_rescore(updated, candidates, seeds)
        if self.graph_dump is not None:
            # reconstruct the exact instance the device solved (weights
            # from the fetched window scores + host cost prefixes, the
            # adjacency from the standalone compat program)
            vmax = self.cfg.solver.max_vertices
            rm = np.clip(row_map, 0, None)
            has_row = row_map >= 0
            short_row = np.asarray(lens)[rm] < (self.acfg.sg_span // 2)
            wcost = np.where(has_row & ~short_row,
                             np.asarray(ws.window_cost)[rm], 0.0)
            wvalid = np.where(has_row, np.asarray(ws.valid)[rm], True)
            g_weights = -(host_base + wcost)
            vert_ok = wvalid & (g_weights > 0.0)
            compat = np.asarray(jax.device_get(self._compat_matrix(
                self._dev(tree_ids), self._dev(shared),
                self._dev(pos_grid), self._dev(have),
                self._dev(pvalid & vert_ok[:nb]))))
            g_adj = np.zeros((vmax, vmax), bool)
            g_adj[:nb, :nb] = compat
            g_valid = vert_ok & np.concatenate(
                [pvalid, np.zeros(vmax - nb, bool)])
            self.graph_dump.append(dict(
                frame=frame_idx, n=n, weights=g_weights.astype(np.float32),
                adj=g_adj, valid=g_valid, init_masks=init_masks.copy()))
        with self.timer.stage("hyp.collect"):
            kb_masks = np.unpackbits(
                np.asarray(kb_masks), axis=1).astype(bool)
            keep = kb_scores > _SOLVER_NEG / 2
            masks, scores = kb_masks[keep], kb_scores[keep]
            for m, s in zip(masks, scores):
                sel = frozenset(pool[i] for i in np.where(m[:n])[0])
                if sel:
                    all_solutions.append((sel, s))

        # dedup (ref :2812-2828); same track set => same likelihood, so a
        # dict keyed by the set is exact
        dedup: Dict[frozenset, float] = {}
        for sel, s in all_solutions:
            dedup.setdefault(sel, s)
        uniq = list(dedup.items())
        uniq.sort(key=lambda x: -x[1])
        uniq = uniq[:max(self.acfg.k_best_size, 1)]

        # probabilities + GTProb (ref :2687-2704)
        total = sum(s for _, s in uniq)
        hyps = []
        touched = self._gt_prob_touched
        for sel, s in uniq:
            prob = s / total if total > 0 else 0.0
            for t in sel:
                reg.tracks[t].gt_prob += prob
                touched.append(t)
            hyps.append(Hypothesis(selected=sorted(sel), related=pool,
                                   log_likelihood=s, probability=prob))
        self.prev_hypotheses = hyps
        self.best_solution = hyps[0].selected if hyps else []
        d = self.diag
        d["best"] = len(self.best_solution)
        for t in self.best_solution:
            tr = reg.tracks[t]
            tr.current_best = True
            if tr.time_start > frame_idx - 6:
                d["best_young"] = d.get("best_young", 0) + 1
            if tr.time_end < frame_idx:
                d["best_stale"] = d.get("best_stale", 0) + 1

    # ------------------------------------------------------------------
    # pruning (ref :2845-2994 + :3005-3047)
    # ------------------------------------------------------------------
    def _prune(self, frame_idx):
        reg = self.registry
        acfg = self.acfg
        # N-scan-back (ref Hypothesis_PruningNScanBack :2845-2948)
        t_prune = frame_idx - acfg.proc_window_size
        for tid in self.best_solution:
            tr = reg.tracks.get(tid)
            if tr is None:
                continue
            tree = reg.trees.get(tr.tree_id)
            if tree is None or tree.time_generation \
                    + acfg.num_frames_for_confirmation > frame_idx:
                continue
            seed_id = reg.oldest_track_in_branch(tid, t_prune)
            seed = reg.tracks[seed_id]
            if seed.parent is None:
                continue
            parent = reg.tracks.get(seed.parent)
            if parent is None:
                continue
            for ch in parent.children:
                if ch != seed_id:
                    reg.set_branch_validity(ch, False)

        # GTP pruning (ref Hypothesis_PruningTrackWithGTP :2959-2994);
        # one cost pass per frame, shared by both pruning sorts.  The
        # survivor cap is the reference's MAX_TRACK_IN_OPTIMIZATION
        # tightened to twice the solver's graph capacity: tracks ranked
        # below that can never enter a hypothesis (the pool applies the
        # same (-gt_prob, cost) rank-prune), so keeping them only grows
        # the per-frame host sweeps and the window-rescore upload batch
        cap = min(acfg.max_track_in_optimization,
                  2 * self.cfg.solver.max_vertices)
        # cost only for the tracks the two pruning sorts actually rank
        # (window + unconfirmed-tree members) — the registry also holds
        # invalid ancestors kept for the N-scan walk, which never sort
        need = set(self.tracks_in_window)
        for tree in reg.trees.values():
            if tree.valid and not tree.confirmed:
                need.update(tree.track_ids)
        cost_of = {tid: reg.tracks[tid].total_cost()
                   for tid in need if tid in reg.tracks}
        ranked = sorted(
            [t for t in self.tracks_in_window if t in reg.tracks],
            key=lambda t: (-reg.tracks[t].gt_prob, cost_of[t]))
        kept = 0
        for tid in ranked:
            tr = reg.tracks[tid]
            if not tr.valid:
                continue
            tree = reg.trees.get(tr.tree_id)
            if tree is not None and not tree.confirmed:
                continue
            if kept < cap and tr.gt_prob > 0.0:
                kept += 1
                continue
            tr.valid = False

        # unconfirmed trees: keep top-2 tracks (ref :2985-2993)
        uc_rank: List[Tuple[float, float, TrackTree]] = []
        for tree in reg.trees.values():
            if tree.confirmed or not tree.valid:
                continue
            ts = sorted([t for t in tree.track_ids if t in reg.tracks],
                        key=lambda t: (-reg.tracks[t].gt_prob, cost_of[t]))
            for tid in ts[acfg.max_track_in_unconfirmed_tree:]:
                reg.tracks[tid].valid = False
            live_ts = [t for t in ts[:acfg.max_track_in_unconfirmed_tree]
                       if reg.tracks[t].valid]
            if live_ts:
                b = live_ts[0]
                uc_rank.append((-reg.tracks[b].gt_prob, cost_of[b], tree))
        # hard cap on concurrent unconfirmed trees (containment — new vs
        # the reference; admission gating keeps this slack normally)
        if len(uc_rank) > acfg.max_unconfirmed_trees:
            uc_rank.sort(key=lambda x: (x[0], x[1]))
            for _, _, tree in uc_rank[acfg.max_unconfirmed_trees:]:
                for tid in tree.track_ids:
                    tr = reg.tracks.get(tid)
                    if tr is not None:
                        tr.valid = False
                tree.valid = False

        # refresh hypotheses (ref Hypothesis_RefreshHypotheses :3005-3047)
        unconfirmed = [t for tree in reg.trees.values()
                       if tree.valid and not tree.confirmed
                       for t in tree.track_ids
                       if t in reg.tracks and reg.tracks[t].valid]
        fresh = []
        for h in self.prev_hypotheses:
            if not all(t in reg.tracks and reg.tracks[t].valid
                       for t in h.selected):
                continue
            h.related = list(h.selected) + unconfirmed
            fresh.append(h)
        self.prev_hypotheses = fresh
        self.best_solution = fresh[0].selected if fresh else []

        # drop invalidated ids from live lists
        live = lambda ids: [t for t in ids if t in reg.tracks
                            and reg.tracks[t].valid]
        self.active_tracks = live(self.active_tracks)
        self.paused_tracks = live(self.paused_tracks)
        self.tracks_in_window = live(self.tracks_in_window)

        # bound per-track position history: rows older than every
        # consumer's reach (compat grid `win`, deferred-output window,
        # temporal-branch gap) trim off with their costs folded into
        # cost_trimmed — keeps branch clones and memory O(keep) on
        # arbitrarily long sequences.  Hysteresis: trim in 16-row chunks.
        keep = self.win + acfg.max_time_jump + 4
        for tid in self.tracks_in_window:
            tr = reg.tracks[tid]
            if tr.length > keep + 16:
                tr.trim_front(keep)

    # ------------------------------------------------------------------
    # result packaging (ref ResultWithTracks :3058-3168)
    # ------------------------------------------------------------------
    def _package_result(self, frame_idx) -> Track3DResult:
        reg = self.registry
        ids, tids, pts, recents = [], [], [], []
        for tid in self.best_solution:
            tr = reg.tracks.get(tid)
            if tr is None or tr.time_start + tr.length - 1 < frame_idx:
                continue
            p = tr.point_at(frame_idx)
            if p is None:
                continue
            ids.append(tr.tree_id)
            tids.append(tr.id)
            pts.append(p)
            # recent smoothed trajectory up to this frame (ref
            # ResultWithTracks fills numPoint recent points, :3104-3130).
            # Copy: the window rescore rewrites tr.smoothed in place, and
            # results are retained/snapshotted — a view would mutate
            # already-delivered results retroactively
            e = frame_idx - tr.time_start + 1
            s = max(0, e - self.acfg.proc_window_size)
            recents.append(tr.smoothed[s:e].copy())
        # tree-id -> reusable small display id (ref treeID/visID pairing,
        # :3077-3100): keep an id while its tree stays in the result,
        # recycle the smallest free one for newcomers
        for gone in [t for t in self.vis_id_map if t not in ids]:
            self.vis_free.append(self.vis_id_map.pop(gone))
        self.vis_free.sort(reverse=True)
        vis_ids = []
        for tree_id in ids:
            v = self.vis_id_map.get(tree_id)
            if v is None:
                v = (self.vis_free.pop() if self.vis_free
                     else len(self.vis_id_map))
                self.vis_id_map[tree_id] = v
            vis_ids.append(v)
        # reproject every object's recent trajectory into every camera
        # in ONE batched host pass per camera (ref :3131-3165 loops
        # per point per camera)
        recent_proj: List[np.ndarray] = []
        if recents:
            lens = [len(r) for r in recents]
            flat = (np.concatenate(recents, 0) if lens else
                    np.zeros((0, 3)))
            proj = np.stack([hc.world_to_image(flat)
                             for hc in self.host_cams])   # [C, sum, 2]
            o = 0
            for ln in lens:
                recent_proj.append(proj[:, o:o + ln])
                o += ln
        return Track3DResult(
            frame_idx=frame_idx, ids=ids, track_ids=tids,
            points=np.asarray(pts).reshape(-1, 3),
            vis_ids=vis_ids, recent_points=recents,
            recent_proj=recent_proj)

    def result_at(self, frame_idx: int) -> Track3DResult:
        """Deferred-output result: current best tracks evaluated at an
        earlier frame (ref deferred evaluation feed, :507-512)."""
        return self._package_result_at(frame_idx)

    def _package_result_at(self, frame_idx) -> Track3DResult:
        reg = self.registry
        ids, tids, pts = [], [], []
        for tid in self.best_solution:
            tr = reg.tracks.get(tid)
            if tr is None:
                continue
            p = tr.point_at(frame_idx)
            if p is None:
                continue
            ids.append(tr.tree_id)
            tids.append(tr.id)
            pts.append(p)
        return Track3DResult(frame_idx=frame_idx, ids=ids, track_ids=tids,
                             points=np.asarray(pts).reshape(-1, 3))
