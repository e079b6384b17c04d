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


@pytest.mark.smoke
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


class TestCompatibility:
    """Full-history tracklet-share relation + device compat gates
    (ref CheckIncompatibility, Associator3D.cpp:2411-2503)."""

    def _track_with_hist(self, assoc, tid, tree_id, hists):
        from mcmtt_opticalflow_tpu.models.trees import Track
        c = assoc.num_cams
        tr = Track(id=tid, tree_id=tree_id, parent=None, num_cams=c,
                   combination=tuple([-1] * c), time_start=0, time_end=0,
                   time_generation=0, tid_hist=[list(h) for h in hists],
                   points=np.zeros((1, 3)), smoothed=np.zeros((1, 3)),
                   velocity=np.zeros((1, 3)),
                   raw_points=np.zeros((1, c, 3)),
                   raw_mask=np.zeros((1, c), bool),
                   max_error=np.zeros(1), is_meas=np.ones(1, bool),
                   cost_recon_pos=np.zeros(1), cost_link_pos=np.zeros(1),
                   last_t_end=np.zeros(c, np.int64),
                   last_t_loc=np.zeros((c, 3)), last_sens=np.zeros(c),
                   last_rgb=np.zeros((c, 48)))
        assoc.registry.tracks[tid] = tr
        return tr

    def test_shared_id_beyond_16_slot_window_detected(self):
        """A tracklet id shared only at the START of a >16-entry history
        must still mark the pair incompatible (the old device matrix
        truncated each history to its last 16 ids and missed this)."""
        sc = make_scenario(num_cameras=2, num_frames=2, num_people=1,
                           image_size=(128, 96), arena=2000.0, seed=0)
        assoc = Associator3D(small_cfg(2, 128, 96), sc.cameras)
        # track A: ids 0..19 in cam 0; track B: shares ONLY id 0, then
        # 100..118 — the shared id is 20 entries deep in A's history
        self._track_with_hist(assoc, 1, 10, [list(range(20)), []])
        self._track_with_hist(assoc, 2, 11, [[0] + list(range(100, 119)), []])
        self._track_with_hist(assoc, 3, 12, [list(range(200, 220)), []])
        shared = assoc._shared_matrix([1, 2, 3], 4)
        assert shared[0, 1] and shared[1, 0]
        assert not shared[0, 2] and not shared[1, 2]
        # diagonal is irrelevant downstream (masked by ~eye) but must not
        # leak padding
        assert not shared[3].any() and not shared[:, 3].any()

    def test_device_compat_gates(self):
        sc = make_scenario(num_cameras=2, num_frames=2, num_people=1,
                           image_size=(128, 96), arena=2000.0, seed=0)
        assoc = Associator3D(small_cfg(2, 128, 96), sc.cameras)
        w = assoc.win
        n = 4
        tree_ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
        shared = np.zeros((n, n), bool)
        shared[0, 1] = shared[1, 0] = True
        pos = np.zeros((n, w, 3), np.float32)
        # tracks 0/1/2 far apart and parallel (compatible geometry);
        # track 3 crosses track 2's path at slow speed
        pos[0, :, 0] = 0.0
        pos[1, :, 0] = 10000.0
        pos[2, :, 0] = 20000.0
        pos[2, :, 1] = np.arange(w) * 10.0
        pos[3, :, 0] = np.linspace(19900.0, 20100.0, w)
        pos[3, :, 1] = np.arange(w) * 10.0 + 5.0
        have = np.ones((n, w), bool)
        valid = np.ones((n,), bool)
        compat = np.asarray(assoc._compat_matrix(
            tree_ids, jnp.asarray(shared), jnp.asarray(pos),
            jnp.asarray(have), jnp.asarray(valid)))
        assert not compat[0, 1], "shared-history pair must be incompatible"
        assert compat[0, 2], "distant parallel tracks are compatible"
        assert not compat[2, 3], "crossing nearby tracks are incompatible"

    def test_crossing_ignored_when_far_apart(self):
        """The reference skips the crossing test when tracks are more than
        2*MAX_MOVING_SPEED apart at that instant (ref :2489)."""
        sc = make_scenario(num_cameras=2, num_frames=2, num_people=1,
                           image_size=(128, 96), arena=2000.0, seed=0)
        assoc = Associator3D(small_cfg(2, 128, 96), sc.cameras)
        w = assoc.win
        n = 2
        tree_ids = jnp.asarray([0, 1], jnp.int32)
        shared = np.zeros((n, n), bool)
        pos = np.zeros((n, w, 3), np.float32)
        # two long jumps whose segments geometrically intersect but whose
        # endpoints are >1800mm apart at every instant
        pos[0, 0] = [-5000.0, -5000.0, 0.0]
        pos[0, 1] = [5000.0, 5000.0, 0.0]
        pos[1, 0] = [-5000.0, 5000.0, 0.0]
        pos[1, 1] = [5000.0, -5000.0, 0.0]
        have = np.zeros((n, w), bool)
        have[:, :2] = True
        valid = np.ones((n,), bool)
        compat = np.asarray(assoc._compat_matrix(
            tree_ids, jnp.asarray(shared), jnp.asarray(pos),
            jnp.asarray(have), jnp.asarray(valid)))
        assert compat[0, 1], \
            "far-apart crossing must be skipped like the reference"


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

    def test_finalize_backfill_scores_every_frame(self):
        """Window w must score the sequence's last w frames at finalize
        (ref Associator3D.cpp:364-372): a perfect fake engine must show
        ZERO misses at every deferred window."""
        from mcmtt_opticalflow_tpu.eval.experiment import run_sequence
        from mcmtt_opticalflow_tpu.models.associator3d import Track3DResult

        t_total, n_people = 8, 2
        gx = np.arange(1, t_total + 1)[:, None] * np.ones((1, n_people)) * 100
        gy = gx + np.arange(n_people)[None, :] * 500

        class FakeEngine:
            class _A:
                frame_idx = -1
            assoc = _A()

            def process_frame(self, frames, dets, frame_idx):
                self.assoc.frame_idx = frame_idx

            def deferred_result(self, td):
                pts = np.stack([gx[td], gy[td], np.zeros(n_people)], -1)
                return Track3DResult(frame_idx=td,
                                     ids=list(range(n_people)),
                                     track_ids=list(range(n_people)),
                                     points=pts)

        zone = (-1e5, -1e5, 1e5, 1e5)
        per_window = run_sequence(FakeEngine(), lambda t: None,
                                  lambda t: None, t_total, (gx, gy),
                                  zone, deferred_windows=4)
        for w, res in per_window.items():
            assert res.missed == 0, (w, res.missed)
            assert res.mota == 1.0, (w, res.mota)

    def test_result_file_format(self, tmp_path):
        """EvaluationResult.save writes the reference's result-file text
        (ref PrintResultToFile, Evaluator.cpp:1107-1137)."""
        from mcmtt_opticalflow_tpu.eval.clearmot import EvaluationResult

        res = EvaluationResult(mota=0.855, motp=0.912, motal=0.86,
                               recall=0.95, precision=0.97, missed=12,
                               false_positives=7, id_switches=2,
                               most_tracked=5, partially_tracked=1,
                               most_lost=0, fragments=3, far=0.23,
                               miss_per_gt=0.05, fa_per_gt=0.03)
        p = tmp_path / "K003" / "run_evaluation_K003_W000.txt"
        res.save(str(p))
        text = p.read_text()
        lines = text.splitlines()
        assert lines[0] == "Evaluating PETS on ground plane..."
        assert lines[1].startswith("| Recl Prcn  FAR|")
        # err = FN + FP + ID
        assert "%4i%4i%4i" % (7, 12, 2) in lines[2]
        assert "%5i" % 21 in lines[2]
        assert lines[2].startswith("| 95.0 97.0 0.23|  5  1  0|")


class TestHeadMode:
    """Head detection mode: batched LS line-meet reconstruction
    (ref Associator3D.cpp:857-884 + NViewPointReconstruction :930-982)."""

    def _head_assoc(self, sc, consider_sensitivity=False):
        import dataclasses
        cfg = small_cfg()
        cfg = dataclasses.replace(cfg, assoc3d=dataclasses.replace(
            cfg.assoc3d, detection_mode="head",
            consider_sensitivity=consider_sensitivity))
        return Associator3D(cfg, sc.cameras)

    def test_batch_matches_scalar_reconstruction(self):
        """_reconstruct_batch (vectorised) must agree with _reconstruct
        (the scalar reference mirror) on every combination, both modes."""
        import dataclasses
        sc = make_scenario(num_cameras=2, num_frames=3, num_people=3,
                           image_size=(256, 192), arena=2000.0, seed=7)
        for mode, sensit in (("head", False), ("head", True),
                             ("full_body", False)):
            cfg = small_cfg()
            cfg = dataclasses.replace(cfg, assoc3d=dataclasses.replace(
                cfg.assoc3d, detection_mode=mode,
                consider_sensitivity=sensit))
            assoc = Associator3D(cfg, sc.cameras)
            feed_frame(assoc, sc, 0)
            # every 1- and 2-camera combination of live tracklets
            combos = []
            for t0 in assoc.active_tracklets[0]:
                combos.append((t0, -1))
                for t1 in assoc.active_tracklets[1]:
                    combos.append((t0, t1))
            for t1 in assoc.active_tracklets[1]:
                combos.append((-1, t1))
            batch = assoc._reconstruct_batch(combos)
            for combo, got in zip(combos, batch):
                want = assoc._reconstruct(combo)
                if want is None:
                    assert got is None, (mode, combo)
                    continue
                assert got is not None, (mode, combo)
                np.testing.assert_allclose(got[0], want[0], rtol=1e-9,
                                           atol=1e-6)
                np.testing.assert_allclose(got[3], want[3], rtol=1e-9)
                np.testing.assert_allclose(got[4], want[4], rtol=1e-7,
                                           atol=1e-9)

    def test_head_mode_end_to_end(self):
        """A head-mode associator run produces tracks near GT."""
        sc = make_scenario(num_cameras=2, num_frames=5, num_people=3,
                           image_size=(256, 192), arena=2000.0, seed=11)
        assoc = self._head_assoc(sc)
        for t in range(5):
            r = feed_frame(assoc, sc, t)
        assert len(r.ids) >= 1
        gt = sc.gt_xy[4]
        gt = gt[~np.isnan(gt[:, 0])]
        for p in r.points:
            d = np.linalg.norm(gt - p[:2], axis=-1).min()
            assert d < 800.0


class TestMinTrackletLength:
    def test_short_deactivated_tracklet_kills_branch(self):
        """A track whose tracklet deactivates with duration <
        min_tracklet_length loses its whole branch (ref
        Associator3D.cpp:1399-1404); at the default (1) nothing dies."""
        import dataclasses
        sc = make_scenario(num_cameras=2, num_frames=3, num_people=2,
                           image_size=(256, 192), arena=2000.0, seed=3)
        for min_len, expect_kill in ((2, True), (1, False)):
            cfg = small_cfg()
            cfg = dataclasses.replace(cfg, assoc3d=dataclasses.replace(
                cfg.assoc3d, min_tracklet_length=min_len))
            assoc = Associator3D(cfg, sc.cameras)
            feed_frame(assoc, sc, 0)
            tracked = [t.id for t in assoc.registry.tracks.values()
                       if t.combination[0] >= 0]
            assert tracked
            # frame 1: camera 0 sees nothing -> its tracklets deactivate
            # at duration 1
            c = len(sc.cameras)
            ids = np.zeros((c, 16), np.int64)
            boxes = np.zeros((c, 16, 4), np.float32)
            mask = np.zeros((c, 16), bool)
            for j, b in enumerate(sc.detections[1][1][:16]):
                ids[1, j] = j
                boxes[1, j] = b
                mask[1, j] = True
            assoc.step(1, ids, boxes, mask,
                       jnp.asarray(np.stack(sc.frames(1))))
            survivors = [tid for tid in tracked
                         if tid in assoc.registry.tracks
                         and assoc.registry.tracks[tid].valid]
            if expect_kill:
                assert not survivors, survivors
            else:
                assert survivors


@pytest.mark.smoke
class TestEmptyCamera:
    def test_camera_with_zero_tracklets_while_tracks_live(self):
        """A camera reporting zero detections for several consecutive
        frames empties its active-tracklet table while 3D tracks remain
        live.  The reference tolerates this trivially (the per-track dict
        lookup just misses, Associator3D.cpp:1386-1421); the vectorised
        combination refresh must skip the gather instead of IndexErroring
        on the empty table (round-4 regression at associator3d.py:968)."""
        sc = make_scenario(num_cameras=2, num_frames=8, num_people=3,
                           image_size=(256, 192), arena=2000.0, seed=11)
        assoc = Associator3D(small_cfg(), sc.cameras)
        feed_frame(assoc, sc, 0)
        feed_frame(assoc, sc, 1)
        assert assoc.active_tracks
        c = len(sc.cameras)
        # frames 2..6: camera 0 goes dark; camera 1 keeps reporting.
        # Tracks must stay alive on the single-view branch and the engine
        # must not crash once camera 0's tracklet table is fully empty.
        for t in range(2, 7):
            ids = np.zeros((c, 16), np.int64)
            boxes = np.zeros((c, 16, 4), np.float32)
            mask = np.zeros((c, 16), bool)
            for j, b in enumerate(sc.detections[t][1][:16]):
                ids[1, j] = j
                boxes[1, j] = b
                mask[1, j] = True
            r = assoc.step(t, ids, boxes, mask,
                           jnp.asarray(np.stack(sc.frames(t))))
            assert r is not None
        assert not assoc.active_tracklets[0]
        # camera 0 comes back: the engine recovers without error
        r = feed_frame(assoc, sc, 7)
        assert r is not None


@pytest.mark.smoke
class TestBatchedComboEnumeration:
    def test_matches_recursive_enumerator(self):
        """The vectorised level-BFS enumerator must reproduce the exact
        recursive DFS output — same combinations, same emission order,
        same cap-prefix — for seed roots and for every active track root
        (ref GenerateTrackletCombinations, Associator3D.cpp:1283-1336)."""
        sc = make_scenario(num_cameras=3, num_frames=5, num_people=4,
                           image_size=(256, 192), arena=2500.0, seed=5)
        assoc = Associator3D(small_cfg(num_cams=3), sc.cameras)
        rng = np.random.RandomState(0)
        for t in range(5):
            c = 3
            cap16 = 16
            ids = np.zeros((c, cap16), np.int64)
            boxes = np.zeros((c, cap16, 4), np.float32)
            mask = np.zeros((c, cap16), bool)
            for ci in range(c):
                for j, b in enumerate(sc.detections[t][ci][:cap16]):
                    # rotate ids some frames so assoc maps stay non-trivial
                    ids[ci, j] = 100 * t + j if rng.rand() < 0.4 else j
                    boxes[ci, j] = b
                    mask[ci, j] = True
            assoc.step(t, ids, boxes, mask,
                       jnp.asarray(np.stack(sc.frames(t))))
            nc = assoc.num_cams
            full = [(1 << len(assoc.new_measurements[ci])) - 1
                    for ci in range(nc)]
            # roots: the seed root + every active track's (base, maps)
            roots = [([-1] * nc, list(full))]
            for tid in assoc.active_tracks:
                tr = assoc.registry.tracks.get(tid)
                if tr is None:
                    continue
                maps = list(full)
                for ci in range(nc):
                    if tr.combination[ci] < 0:
                        continue
                    a = assoc.tracklets[ci][tr.combination[ci]].assoc
                    for c2 in range(nc):
                        m = a.get(c2)
                        if m is not None:
                            maps[c2] &= m
                roots.append((list(tr.combination), maps))
            for cap in (3, 16, 8192):
                expect = []
                for base, maps in roots:
                    out = []
                    assoc._generate_combinations(list(maps), list(base), 0,
                                                 out, cap=cap)
                    expect.append(out)
                batch = assoc._generate_combinations_batch(
                    np.asarray([b for b, _ in roots], np.int64),
                    np.asarray([m for _, m in roots], np.uint64), cap)
                assert batch is not None
                root_idx, combos = batch
                got = [[] for _ in roots]
                for r, row in zip(root_idx.tolist(), combos.tolist()):
                    got[r].append(tuple(row))
                assert got == expect, (t, cap)


@pytest.mark.smoke
class TestCostMemo:
    def test_incremental_cost_matches_array_sums(self):
        """total_cost() is maintained incrementally across appends,
        window re-scores, branching, trimming and pause/exit updates;
        after several frames every live track's memo must equal the
        ground-truth re-sum of its cost arrays (ref GetCost,
        Associator3D.cpp:2567-2578)."""
        sc = make_scenario(num_cameras=2, num_frames=6, num_people=3,
                           image_size=(256, 192), arena=2000.0, seed=7)
        assoc = Associator3D(small_cfg(), sc.cameras)
        for t in range(6):
            feed_frame(assoc, sc, t)
        checked = 0
        for tr in assoc.registry.tracks.values():
            if tr._cost_cache is None:
                continue
            truth = (tr.cost_enter + tr.cost_trimmed + tr.cost_rgb
                     + tr.cost_exit + float(tr.cost_recon_pos.sum())
                     + float(tr.cost_link_pos.sum()))
            assert abs(tr.total_cost() - truth) < 1e-6 * max(
                1.0, abs(truth)), (tr.id, tr.total_cost(), truth)
            checked += 1
        assert checked > 0


class TestPoolOverflow:
    def test_pool_overflow_is_rank_pruned_and_counted(self):
        """With a solver graph smaller than the candidate pool the engine
        must rank-prune explicitly and count the drops (the reference
        instead carries MAX_TRACK_IN_OPTIMIZATION=2000 vertices,
        ref Associator3D.cpp:23)."""
        import dataclasses
        sc = make_scenario(num_cameras=2, num_frames=6, num_people=6,
                           image_size=(256, 192), arena=3000.0, seed=5)
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, max_vertices=8))
        assoc = Associator3D(cfg, sc.cameras)
        for t in range(6):
            # rotating tracklet ids churn seeds every frame, overflowing
            # the 8-vertex graph
            r = feed_frame(assoc, sc, t, next_id="rotate")
        assert assoc.pool_dropped_total > 0
        assert len(r.ids) >= 1          # engine still tracks


class TestResultPayload:
    def test_vis_ids_and_recent_projections(self):
        """Result packaging ships reusable display ids and per-camera
        recent-trajectory reprojections (ref ResultWithTracks,
        Associator3D.cpp:3058-3168 + stObject3DInfo payload,
        PSNWhere_Types.h:222-227)."""
        sc = make_scenario(num_cameras=2, num_frames=6, num_people=3,
                           image_size=(256, 192), arena=2000.0, seed=11)
        assoc = Associator3D(small_cfg(), sc.cameras)
        results = [feed_frame(assoc, sc, t) for t in range(6)]
        r = results[-1]
        assert len(r.vis_ids) == len(r.ids)
        assert len(r.recent_proj) == len(r.ids)
        # vis ids are small and unique within a frame
        assert len(set(r.vis_ids)) == len(r.vis_ids)
        assert all(0 <= v < 64 for v in r.vis_ids)
        # stability: a tree id present in consecutive frames keeps its id
        prev = results[-2]
        stable = set(prev.ids) & set(r.ids)
        for tree_id in stable:
            assert (prev.vis_ids[prev.ids.index(tree_id)]
                    == r.vis_ids[r.ids.index(tree_id)])
        # reprojections: [C, T, 2], T matching the recent 3D points, and
        # consistent with the camera model at the newest point
        for obj3d, obj2d in zip(r.recent_points, r.recent_proj):
            assert obj2d.shape == (2, len(obj3d), 2)
        from mcmtt_opticalflow_tpu.viz.overlay import (
            draw_result_trajectories)
        frame = np.zeros((192, 256, 3), np.float32)
        out = draw_result_trajectories(frame, r, cam_idx=0)
        assert out.shape == frame.shape and float(out.max()) > 0
