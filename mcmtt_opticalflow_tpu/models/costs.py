"""Device-batched track cost model.

Implements the reference's track cost decomposition
cost = enter + reconstruction + link + RGB + exit
(ref GetCost, psn_where/PSNWhere_Associator3D.cpp:2567-2578) as batched JAX
functions over padded track windows, replacing the per-track serial loops of
Track3D_UpdateTracks / Track3D_BranchTracks (ref :1379-1715, 1832-2242).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

from mcmtt_opticalflow_tpu.config import Associator3DConfig
from mcmtt_opticalflow_tpu.geometry.tsai import TsaiCamera, check_visibility
from mcmtt_opticalflow_tpu.ops.sgsmooth import sg_smooth_masked


def link_probability(p1, p2, time_gap, max_speed: float = 900.0):
    """Motion link probability 0.5*erfc(4d/maxDist - 2)
    (ref ComputeLinkProbability, Associator3D.cpp:2314-2319)."""
    d = jnp.linalg.norm(p1 - p2, axis=-1)
    max_dist = max_speed * jnp.maximum(
        jnp.asarray(time_gap, d.dtype), 1.0)
    return 0.5 * erfc(4.0 * d / max_dist - 2.0)


def reconstruction_probability(point, raw_points, raw_mask, max_error,
                               visible, cfg: Associator3DConfig):
    """Scatter + detection-likelihood probability of a reconstruction
    (ref ComputeReconstructionProbability, Associator3D.cpp:2346-2383).

    Args:
      point:      [..., 3] (smoothed) reconstruction point.
      raw_points: [..., C, 3] per-camera raw ground points.
      raw_mask:   [..., C] bool (camera contributed a tracklet).
      max_error:  [...] scatter gate.
      visible:    [..., C] bool (point visible from camera).

    Returns probability ratio p_ratio = ratio * p/(1-p); 0 encodes the
    reference's invalidation (scatter > max_error).
    """
    num = jnp.sum(raw_mask, -1)
    d = jnp.linalg.norm(point[..., None, :] - raw_points, axis=-1)
    mean_d = jnp.sum(jnp.where(raw_mask, d, 0.0), -1) / jnp.maximum(num, 1)
    fallback = (cfg.max_sensitivity_error if cfg.consider_sensitivity
                else cfg.max_body_width / 2.0)
    max_err = jnp.where(max_error == 0.0, fallback, max_error)
    p = jnp.where(num > 1,
                  0.5 * erfc(4.0 * mean_d / max_err - 2.0),
                  0.5)
    valid = ~((num > 1) & (mean_d > max_err))

    fp, fn = cfg.fp_rate, cfg.fn_rate
    pos = (1.0 - fp) / fp
    neg = fn / (1.0 - fn)
    per_cam = jnp.where(visible, jnp.where(raw_mask, pos, neg), 1.0)
    ratio = jnp.prod(per_cam, axis=-1)
    p = jnp.clip(p, 1e-12, 1.0 - 1e-12)
    return jnp.where(valid, ratio * p / (1.0 - p), 0.0)


def enter_probability(distance_from_boundary, penalty_free, cfg):
    """(ref ComputeEnterProbability, Associator3D.cpp:2267-2277);
    distance < 0 means outside every view."""
    d = distance_from_boundary
    p = jnp.where(
        d < 0, 1.0,
        jnp.where(d <= cfg.boundary_distance, 1.0,
                  cfg.p_en_max * jnp.exp(-cfg.p_en_decay *
                                         jnp.maximum(0.0, d - cfg.boundary_distance))))
    cost = jnp.minimum(cfg.cost_enter_max, -jnp.log(p))
    return jnp.where(penalty_free, 0.0, cost)


def exit_cost(distance_from_boundary, track_length, cfg):
    """(ref ComputeExitProbability, Associator3D.cpp:2288-2303)."""
    d = distance_from_boundary
    p_far = (cfg.p_ex_max
             * jnp.exp(-cfg.p_ex_decay_dist *
                       jnp.maximum(0.0, d - cfg.boundary_distance))
             * jnp.exp(-cfg.p_ex_decay_length *
                       jnp.maximum(0.0, track_length
                                   - cfg.num_frames_for_confirmation)))
    p = jnp.where(d < 0, 1.0,
                  jnp.where(d < cfg.boundary_distance, cfg.p_ex_max, p_far))
    return jnp.minimum(cfg.cost_exit_max, -jnp.log(p))


def tracklet_connectivity(end_point, start_point, sens1, sens2, time_gap,
                          cfg):
    """Gate linking consecutive tracklets of one camera within a track
    (ref CheckTrackletConnectivity, Associator3D.cpp:791-796)."""
    d = jnp.linalg.norm(end_point - start_point, axis=-1)
    thresh = jnp.maximum(cfg.cost_tracklet_link_min_dist,
                         cfg.e_cal + cfg.e_det * (sens1 + sens2))
    return (time_gap > 1) | (d <= thresh)


class WindowScore(NamedTuple):
    smoothed: jnp.ndarray        # [N, W, 3]
    velocity: jnp.ndarray        # [N, W, 3]
    cost_recon: jnp.ndarray      # [N, W] per-position -log p_recon
    cost_link: jnp.ndarray       # [N, W] per-position -log p_link
    window_cost: jnp.ndarray     # [N] sum of the above over valid positions
    valid: jnp.ndarray           # [N] no zero-probability position


def score_track_windows(points, raw_points, raw_mask, max_error, lengths,
                        cams: TsaiCamera, cfg: Associator3DConfig,
                        prev_smoothed=None):
    """Smooth + cost a batch of track windows in one fused pass.

    This is the reference's per-track "insert, re-smooth tail, re-cost"
    loop (ref Associator3D.cpp:1468-1516) turned into a batch: smoothing is
    a gathered matmul, reconstruction and link probabilities are computed
    for every window position of every track at once.

    Args:
      points:     [N, W, 3] raw reconstruction points (window tail).
      raw_points: [N, W, C, 3] per-camera raw points.
      raw_mask:   [N, W, C] bool.
      max_error:  [N, W].
      lengths:    [N] valid positions per window.
      cams:       stacked TsaiCamera (leaves [C]).

    Returns WindowScore.
    """
    n, w, _ = points.shape
    short = lengths < (cfg.sg_span // 2)        # MIN_SMOOTHING_LENGTH gate
    smoothed = sg_smooth_masked(points, lengths, cfg.sg_span, cfg.sg_degree)
    smoothed = jnp.where(short[:, None, None], points, smoothed)

    pos_idx = jnp.arange(w)[None, :]
    pos_valid = pos_idx < lengths[:, None]

    vis = jax.vmap(lambda c: check_visibility(c, smoothed),
                   out_axes=-1)(cams)           # [N, W, C]
    p_recon = reconstruction_probability(
        smoothed, raw_points, raw_mask, max_error, vis, cfg)
    cost_recon = -jnp.log(jnp.maximum(p_recon, 1e-300))

    p_link = link_probability(smoothed[:, :-1], smoothed[:, 1:], 1.0,
                              cfg.max_moving_speed)
    p_link = jnp.concatenate([jnp.ones((n, 1), points.dtype), p_link], axis=1)
    link_valid = pos_valid & (pos_idx > 0)
    cost_link = -jnp.log(jnp.maximum(p_link, 1e-300))

    velocity = jnp.diff(smoothed, axis=1, prepend=smoothed[:, :1])
    speed = jnp.linalg.norm(velocity, axis=-1)
    velocity = jnp.where((speed > cfg.min_moving_speed)[..., None],
                         velocity, 0.0)

    bad = (pos_valid & ~short[:, None] & (p_recon == 0.0)) \
        | (link_valid & ~short[:, None] & (p_link == 0.0))
    valid = ~jnp.any(bad, axis=1)

    # positions below the smoothing-length gate keep zero incremental cost
    # contribution until the track is long enough (ref :1475, :1507-1511)
    use = pos_valid & ~short[:, None]
    window_cost = (jnp.sum(jnp.where(use, cost_recon, 0.0), 1)
                   + jnp.sum(jnp.where(link_valid & ~short[:, None],
                                       cost_link, 0.0), 1))
    return WindowScore(smoothed=smoothed, velocity=velocity,
                       cost_recon=jnp.where(use, cost_recon, 0.0),
                       cost_link=jnp.where(link_valid & ~short[:, None],
                                           cost_link, 0.0),
                       window_cost=window_cost, valid=valid)
