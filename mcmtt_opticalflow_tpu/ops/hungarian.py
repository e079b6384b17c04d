"""Linear assignment (detection <-> tracker matching).

The reference ports Munkres from MATLAB as a 6-step state machine with
square-padding + infinity preprocessing (psn_where/helpers/PSNWhere_Hungarian.cpp:212-737).
A state machine is the wrong shape for a TPU, so the device path here is a
batched *auction* algorithm (Bertsekas) with epsilon scaling: every price
update is a vectorised max/argmax over the cost row, the whole solve is a
bounded lax.while_loop, and cameras batch with vmap.

The host path (`hungarian_host`) is an exact reference via
scipy.optimize.linear_sum_assignment, used by tests to certify the device
solver's optimality and available to host-side callers.

Infinite / forbidden entries follow the reference's convention: they are
replaced by (finite max + margin) before solving, and any match that lands
on such an entry is reported invalid (ref PSNWhere_Tracker2D.cpp:1040-1063).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hungarian_host(cost: np.ndarray):
    """Exact rectangular min-cost assignment on host.

    Returns (rows, cols) index arrays like scipy's linear_sum_assignment,
    with infinite-cost pairs filtered out.
    """
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, dtype=np.float64)
    finite = np.isfinite(cost)
    if not finite.any():
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    big = cost[finite].max() + 100.0
    work = np.where(finite, cost, big)
    rows, cols = linear_sum_assignment(work)
    keep = finite[rows, cols]
    return rows[keep], cols[keep]


@functools.partial(jax.jit, static_argnames=("num_iters",))
def solve_assignment(cost: jnp.ndarray,
                     row_mask: jnp.ndarray,
                     col_mask: jnp.ndarray,
                     num_iters: int = 2000):
    """Batched-friendly min-cost assignment via forward auction.

    Args:
      cost:     [R, C] float cost matrix (np.inf / masked = forbidden).
      row_mask: [R] bool, valid rows (bidders).
      col_mask: [C] bool, valid columns (objects).
      num_iters: auction round budget (each round re-bids every unassigned row).

    Returns:
      col_of_row: [R] int32, matched column per row, -1 if unmatched.
      match_cost: [R] float, cost of the match (inf if unmatched).
    """
    r, c = cost.shape
    if r > c:
        # the forward auction needs bidders <= objects to terminate; solve
        # the transposed problem and invert the matching
        row_of_col, _ = solve_assignment(cost.T, col_mask, row_mask,
                                         num_iters)
        col_of_row = jnp.full((r,), -1, jnp.int32)
        ok = row_of_col >= 0
        col_of_row = col_of_row.at[jnp.where(ok, row_of_col, r)].set(
            jnp.arange(c, dtype=jnp.int32), mode="drop")
        matched = col_of_row >= 0
        safe = jnp.where(matched, col_of_row, 0)
        mcost = cost[jnp.arange(r), safe]
        return (jnp.where(matched, col_of_row, -1),
                jnp.where(matched, mcost, jnp.inf))
    finite = jnp.isfinite(cost) & row_mask[:, None] & col_mask[None, :]
    maxfin = jnp.max(jnp.where(finite, cost, -jnp.inf))
    maxfin = jnp.where(jnp.isfinite(maxfin), maxfin, 0.0)
    minfin = jnp.min(jnp.where(finite, cost, jnp.inf))
    minfin = jnp.where(jnp.isfinite(minfin), minfin, 0.0)
    span = jnp.maximum(maxfin - minfin, 1.0)
    big = maxfin + 2.0 * span + 100.0
    # benefit maximisation: a = big - cost; forbidden pairs get benefit 0 but a
    # valid-dummy benefit floor so unassignable rows stay unmatched.
    benefit = jnp.where(finite, big - cost, -span * 4.0 - 100.0)
    # epsilon below resolution/size so the auction hits the optimum
    eps = span / (jnp.asarray(max(r, c) + 1, cost.dtype) * 64.0) + 1e-7

    def round_body(state):
        owner, price, it = state   # owner: [C] int32 row owning col; price: [C]
        col_of_row = jnp.full((r,), -1, jnp.int32)
        col_of_row = col_of_row.at[jnp.where(owner >= 0, owner, r)].set(
            jnp.arange(c, dtype=jnp.int32), mode="drop")
        unassigned = (col_of_row < 0) & row_mask

        value = benefit - price[None, :]                     # [R, C]
        value = jnp.where(col_mask[None, :], value, -jnp.inf)
        best_col = jnp.argmax(value, axis=1)                 # [R]
        best_val = jnp.max(value, axis=1)
        second = jnp.max(
            jnp.where(jax.nn.one_hot(best_col, c, dtype=bool), -jnp.inf, value),
            axis=1)
        second = jnp.where(jnp.isfinite(second), second, best_val - span)
        bid = price[best_col] + best_val - second + eps      # [R]
        do_bid = unassigned & jnp.isfinite(best_val)

        # highest bid per column wins (scatter-max, then resolve the row)
        bids = jnp.where(do_bid[:, None] &
                         (best_col[:, None] == jnp.arange(c)[None, :]),
                         bid[:, None], -jnp.inf)             # [R, C]
        win_bid = jnp.max(bids, axis=0)                      # [C]
        win_row = jnp.argmax(bids, axis=0).astype(jnp.int32)
        contested = jnp.isfinite(win_bid)
        # displaced owners become unassigned next round
        owner = jnp.where(contested, win_row, owner)
        price = jnp.where(contested, win_bid, price)
        return owner, price, it + 1

    def cond(state):
        owner, _, it = state
        col_of_row = jnp.full((r,), -1, jnp.int32)
        col_of_row = col_of_row.at[jnp.where(owner >= 0, owner, r)].set(
            jnp.arange(c, dtype=jnp.int32), mode="drop")
        has_finite = jnp.any(finite, axis=1)
        unhappy = jnp.any((col_of_row < 0) & row_mask & has_finite)
        return jnp.logical_and(unhappy, it < num_iters)

    owner0 = jnp.full((c,), -1, jnp.int32)
    price0 = jnp.zeros((c,), cost.dtype)
    owner, price, _ = jax.lax.while_loop(cond, round_body, (owner0, price0, 0))

    col_of_row = jnp.full((r,), -1, jnp.int32)
    col_of_row = col_of_row.at[jnp.where(owner >= 0, owner, r)].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop")
    matched = col_of_row >= 0
    safe_col = jnp.where(matched, col_of_row, 0)
    mcost = cost[jnp.arange(r), safe_col]
    valid = matched & jnp.isfinite(mcost) & finite[jnp.arange(r), safe_col]
    return (jnp.where(valid, col_of_row, -1),
            jnp.where(valid, mcost, jnp.inf))


solve_assignment_batch = jax.vmap(solve_assignment, in_axes=(0, 0, 0))
