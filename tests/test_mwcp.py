"""MWCP solver tests: clique validity, optimality on small graphs vs brute
force, K-best collection, warm starts (property tests per SURVEY.md §4)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmtt_opticalflow_tpu.config import SolverConfig
from mcmtt_opticalflow_tpu.models.mwcp import (solve_mwcp, collect_k_best)

CFG = SolverConfig(num_replicas=4, max_vertices=16,
                   solutions_per_replica=8, seed=0)


def brute_force_mwc(weights, adj, valid):
    """Exhaustive max-weight clique for small graphs."""
    n = len(weights)
    idx = [i for i in range(n) if valid[i]]
    best, best_w = frozenset(), 0.0
    for r in range(1, len(idx) + 1):
        for combo in itertools.combinations(idx, r):
            ok = all(adj[a][b] for a, b in itertools.combinations(combo, 2))
            if not ok:
                continue
            w = sum(weights[i] for i in combo)
            if w > best_w:
                best, best_w = frozenset(combo), w
    return best, best_w


def random_instance(rng, n, p_edge=0.5, pad=0):
    v = n + pad
    weights = np.zeros(v, np.float32)
    weights[:n] = rng.rand(n).astype(np.float32) * 10
    adj = np.zeros((v, v), bool)
    for i in range(n):
        for j in range(i + 1, n):
            if rng.rand() < p_edge:
                adj[i, j] = adj[j, i] = True
    valid = np.zeros(v, bool)
    valid[:n] = True
    return weights, adj, valid


def run_solver(weights, adj, valid, init=None, iters=300):
    v = len(weights)
    if init is None:
        init = np.zeros(v, bool)
    return solve_mwcp(jnp.asarray(weights), jnp.asarray(adj),
                      jnp.asarray(valid), jnp.asarray(init),
                      jax.random.PRNGKey(0), CFG, iters)


def is_clique(mask, adj):
    members = np.where(mask)[0]
    return all(adj[a, b] for a, b in itertools.combinations(members, 2))


class TestMwcp:
    @pytest.mark.parametrize("n,p", [(6, 0.5), (8, 0.6), (10, 0.4)])
    def test_optimal_on_small_graphs(self, n, p, rng):
        for trial in range(3):
            weights, adj, valid = random_instance(rng, n, p)
            _, exact = brute_force_mwc(weights, adj, valid)
            res = run_solver(weights, adj, valid)
            got = float(np.max(np.asarray(res.best_score)))
            assert got == pytest.approx(exact, abs=1e-3), (trial, weights, adj)

    def test_solutions_are_cliques(self, rng):
        weights, adj, valid = random_instance(rng, 12, 0.5, pad=4)
        res = run_solver(weights, adj, valid)
        masks = np.asarray(res.sol_masks).reshape(-1, 16)
        scores = np.asarray(res.sol_scores).reshape(-1)
        for m, s in zip(masks, scores):
            if s < -1e29:
                continue
            assert is_clique(m, adj)
            assert not m[~valid].any()
            assert s == pytest.approx(weights[m].sum(), abs=1e-3)

    def test_k_best_distinct_and_sorted(self, rng):
        weights, adj, valid = random_instance(rng, 12, 0.6)
        res = run_solver(weights, adj, valid)
        masks, scores = collect_k_best(res, 10)
        assert len(masks) >= 2
        assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))
        seen = set()
        for m in masks:
            key = tuple(np.where(m)[0])
            assert key not in seen
            seen.add(key)

    def test_device_k_best_matches_host_collect(self, rng):
        """device_k_best (traceable top-k, shipped by the fused per-frame
        program) returns the same distinct solutions in the same order as
        the host-side collect_k_best."""
        from mcmtt_opticalflow_tpu.models.mwcp import device_k_best, NEG
        weights, adj, valid = random_instance(rng, 16, 0.5)
        res = run_solver(weights, adj, valid)
        h_masks, h_scores = collect_k_best(res, 8)
        d_masks, d_scores = jax.jit(
            lambda r: device_k_best(r, 8))(res)
        d_masks, d_scores = np.asarray(d_masks), np.asarray(d_scores)
        got = d_scores > NEG / 2
        assert int(got.sum()) == len(h_masks)
        for i in range(len(h_masks)):
            np.testing.assert_allclose(d_scores[i], h_scores[i], rtol=1e-5)
            assert (d_masks[i] == h_masks[i]).all(), i

    def test_warm_start_valid_clique(self, rng):
        weights, adj, valid = random_instance(rng, 10, 0.7)
        exact_set, exact = brute_force_mwc(weights, adj, valid)
        init = np.zeros(10, bool)
        for i in exact_set:
            init[i] = True
        res = run_solver(weights, adj, valid, init=init, iters=50)
        assert float(np.max(np.asarray(res.best_score))) >= exact - 1e-3

    def test_per_replica_warm_starts(self, rng):
        """[R', V] warm starts: each valid row seeds its own replica (the
        engine's one-solve-per-frame hypothesis formation), and the K-best
        list can exceed any former batch cap."""
        import dataclasses
        weights, adj, valid = random_instance(rng, 16, 0.6)
        cfg = dataclasses.replace(CFG, num_replicas=24,
                                  solutions_per_replica=8)
        # build several distinct valid cliques as warm starts
        warm = np.zeros((6, 16), bool)
        rowi = 0
        for a in range(16):
            for b in range(a + 1, 16):
                if adj[a, b] and rowi < 6:
                    warm[rowi, a] = warm[rowi, b] = True
                    rowi += 1
        assert rowi == 6
        res = solve_mwcp(jnp.asarray(weights), jnp.asarray(adj),
                         jnp.asarray(valid), jnp.asarray(warm),
                         jax.random.PRNGKey(3), cfg, 200)
        masks = np.asarray(res.best_mask)
        scores = np.asarray(res.best_score)
        assert all(is_clique(masks[i], adj) for i in range(24))
        # every warm start's weight is a lower bound for its replica
        for i in range(6):
            w0 = weights[warm[i]].sum()
            assert scores[i] >= w0 - 1e-3
        # collection yields more distinct solutions than the old per-call
        # hypothesis cap of 8
        masks_k, scores_k = collect_k_best(res, 16)
        assert len(masks_k) > 8
        assert all(is_clique(m, adj) for m in masks_k)

    def test_empty_graph(self):
        weights = np.zeros(8, np.float32)
        adj = np.zeros((8, 8), bool)
        valid = np.zeros(8, bool)
        res = run_solver(weights, adj, valid, iters=20)
        assert np.asarray(res.best_score).max() <= 1e-6

    def test_single_vertex(self):
        weights = np.asarray([5.0] + [0.0] * 7, np.float32)
        adj = np.zeros((8, 8), bool)
        valid = np.asarray([True] + [False] * 7)
        res = run_solver(weights, adj, valid, iters=20)
        assert float(np.max(np.asarray(res.best_score))) == pytest.approx(5.0)
