"""Native C++ runtime tests: exact LAP, serial BLS cross-check vs the
batched device solver, detection parser."""

import itertools

import numpy as np
import pytest

from mcmtt_opticalflow_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


class TestNativeLap:
    def test_matches_scipy(self, rng):
        from mcmtt_opticalflow_tpu.ops import hungarian_host
        for r, c in [(3, 3), (5, 8), (8, 5), (10, 10)]:
            for _ in range(5):
                cost = rng.rand(r, c) * 10
                col, total = native.lap_solve(cost)
                rows_h, cols_h = hungarian_host(cost)
                exact = cost[rows_h, cols_h].sum()
                assert total == pytest.approx(exact, abs=1e-9)
                used = [x for x in col if x >= 0]
                assert len(used) == len(set(used))

    def test_forbidden(self):
        cost = np.full((2, 2), np.inf)
        cost[0, 1] = 3.0
        col, total = native.lap_solve(cost)
        assert col[0] == 1 and col[1] == -1
        assert total == pytest.approx(3.0)


class TestNativeBls:
    def brute(self, weights, adj):
        n = len(weights)
        best = 0.0
        for r in range(1, n + 1):
            for combo in itertools.combinations(range(n), r):
                if all(adj[a, b] for a, b in
                       itertools.combinations(combo, 2)):
                    best = max(best, sum(weights[i] for i in combo))
        return best

    def test_optimal_small(self, rng):
        for trial in range(5):
            n = 10
            weights = rng.rand(n) * 10
            adj = rng.rand(n, n) < 0.5
            adj = np.triu(adj, 1)
            adj = adj | adj.T
            mask, score, sols, scores = native.bls_mwcp_solve(
                weights, adj, max_iterations=500, seed=trial)
            exact = self.brute(weights, adj)
            assert score == pytest.approx(exact, abs=1e-6), trial
            # mask is a clique with that score
            m = np.where(mask)[0]
            for a, b in itertools.combinations(m, 2):
                assert adj[a, b]
            assert weights[mask].sum() == pytest.approx(score)

    def test_deterministic(self, rng):
        n = 12
        weights = rng.rand(n) * 5
        adj = rng.rand(n, n) < 0.5
        adj = np.triu(adj, 1)
        adj = adj | adj.T
        r1 = native.bls_mwcp_solve(weights, adj, 300, seed=7)
        r2 = native.bls_mwcp_solve(weights, adj, 300, seed=7)
        assert r1[1] == r2[1]
        assert (r1[0] == r2[0]).all()

    def test_agrees_with_device_solver(self, rng):
        """The device batched-replica solver and the native serial solver
        must find the same optimum on moderate graphs."""
        import jax
        import jax.numpy as jnp
        from mcmtt_opticalflow_tpu.config import SolverConfig
        from mcmtt_opticalflow_tpu.models.mwcp import solve_mwcp
        n, pad = 14, 2
        weights = np.zeros(n + pad, np.float32)
        weights[:n] = rng.rand(n) * 10
        adj = rng.rand(n + pad, n + pad) < 0.55
        adj = np.triu(adj, 1)
        adj = adj | adj.T
        adj[n:, :] = adj[:, n:] = False
        valid = np.zeros(n + pad, bool)
        valid[:n] = True
        cfg = SolverConfig(num_replicas=4, max_vertices=n + pad,
                           solutions_per_replica=8)
        res = solve_mwcp(jnp.asarray(weights), jnp.asarray(adj),
                         jnp.asarray(valid), jnp.zeros(n + pad, bool),
                         jax.random.PRNGKey(0), cfg, 400)
        dev = float(np.max(np.asarray(res.best_score)))
        _, host, _, _ = native.bls_mwcp_solve(
            weights[:n].astype(np.float64), adj[:n, :n], 2000, seed=0)
        assert dev == pytest.approx(host, abs=1e-3)


class TestNativeParser:
    def test_parse(self, tmp_path):
        from mcmtt_opticalflow_tpu.data import write_detection_file
        boxes = np.asarray([[1.5, 2.5, 30.0, 60.0], [7.0, 8.0, 20.0, 40.0]])
        path = str(tmp_path / "d.txt")
        write_detection_file(path, boxes)
        out = native.parse_detections(open(path).read())
        np.testing.assert_allclose(out, boxes, rtol=1e-6)


class TestNativeGray:
    def test_matches_numpy_formula(self):
        from mcmtt_opticalflow_tpu import native
        if not native.available():
            import pytest
            pytest.skip("no native toolchain")
        rng = np.random.RandomState(0)
        rgb = rng.randint(0, 256, (2, 37, 53, 3)).astype(np.uint8)
        got = native.rgb_to_gray_u8(rgb)
        want = ((rgb[..., 0].astype(np.uint16) + rgb[..., 1]
                 + rgb[..., 2]) // 3).astype(np.uint8)
        assert got.shape == want.shape
        assert (got == want).all()
