"""Numpy mirror of the Tsai camera model for host-side scalar queries.

The device path (geometry/tsai.py) serves the batched per-frame programs;
host bookkeeping (enter/exit costs, visibility checks, side-map sampling)
needs single-point projections where a device dispatch per call would be
pure overhead — especially through a remote-TPU tunnel.  Same math, same
field names (ref psn_where/calibration/cameraModel.cpp:494-663).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _cam_floats(cam):
    """Pull TsaiCamera leaves to python floats once."""
    return {f: float(np.asarray(getattr(cam, f)))
            for f in cam._fields}


class HostCamera:
    """Host-side projection for a single TsaiCamera."""

    def __init__(self, cam):
        self.p = _cam_floats(cam)

    def world_to_image(self, xyz: np.ndarray) -> np.ndarray:
        """[..., 3] -> [..., 2] (ref cameraModel.cpp:545-577)."""
        p = self.p
        xyz = np.asarray(xyz, np.float64)
        xw, yw, zw = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        xc = p["r11"] * xw + p["r12"] * yw + p["r13"] * zw + p["tx"]
        yc = p["r21"] * xw + p["r22"] * yw + p["r23"] * zw + p["ty"]
        zc = p["r31"] * xw + p["r32"] * yw + p["r33"] * zw + p["tz"]
        with np.errstate(divide="ignore", invalid="ignore"):
            xu = p["focal"] * xc / zc
            yu = p["focal"] * yc / zc
        xd, yd = _undistort_to_distort(p["kappa1"], xu, yu)
        xi = xd * p["sx"] / p["dpx"] + p["cx"]
        yi = yd / p["dpy"] + p["cy"]
        return np.stack([xi, yi], -1)

    def image_to_world(self, uv: np.ndarray, zw: float) -> np.ndarray:
        """[..., 2] -> [..., 3] at world height zw (ref :494-533)."""
        p = self.p
        uv = np.asarray(uv, np.float64)
        xi, yi = uv[..., 0], uv[..., 1]
        xd = p["dpx"] * (xi - p["cx"]) / p["sx"]
        yd = p["dpy"] * (yi - p["cy"])
        factor = 1.0 + p["kappa1"] * (xd * xd + yd * yd)
        xu, yu = xd * factor, yd * factor
        den = ((p["r11"] * p["r32"] - p["r12"] * p["r31"]) * yu
               + (p["r22"] * p["r31"] - p["r21"] * p["r32"]) * xu
               - p["focal"] * p["r11"] * p["r22"]
               + p["focal"] * p["r12"] * p["r21"])
        xw = (((p["r12"] * p["r33"] - p["r13"] * p["r32"]) * yu
               + (p["r23"] * p["r32"] - p["r22"] * p["r33"]) * xu
               - p["focal"] * p["r12"] * p["r23"]
               + p["focal"] * p["r13"] * p["r22"]) * zw
              + (p["r12"] * p["tz"] - p["r32"] * p["tx"]) * yu
              + (p["r32"] * p["ty"] - p["r22"] * p["tz"]) * xu
              - p["focal"] * p["r12"] * p["ty"]
              + p["focal"] * p["r22"] * p["tx"]) / den
        yw = -(((p["r11"] * p["r33"] - p["r13"] * p["r31"]) * yu
                + (p["r23"] * p["r31"] - p["r21"] * p["r33"]) * xu
                - p["focal"] * p["r11"] * p["r23"]
                + p["focal"] * p["r13"] * p["r21"]) * zw
               + (p["r11"] * p["tz"] - p["r31"] * p["tx"]) * yu
               + (p["r31"] * p["ty"] - p["r21"] * p["tz"]) * xu
               - p["focal"] * p["r11"] * p["ty"]
               + p["focal"] * p["r21"] * p["tx"]) / den
        zout = np.broadcast_to(zw, np.shape(xw))
        return np.stack([xw, yw, zout], -1)

    def visible(self, xyz: np.ndarray,
                pad_height: Optional[float] = None) -> np.ndarray:
        """In-view test.  With pad_height (the reference's DEFAULT_HEIGHT),
        the frame is shrunk by 1/6 of the target's projected body height —
        the detection-probability pad of ref CheckVisibility
        (psn_where/PSNWhere_Associator3D.cpp:718-733): a target that close
        to the image edge no longer counts as "should have been detected"
        in the FP/FN likelihood ratios."""
        xyz = np.asarray(xyz, np.float64)
        uv = self.world_to_image(xyz)
        u, v = uv[..., 0], uv[..., 1]
        half = 0.0
        if pad_height is not None:
            top = xyz.copy()
            top[..., 2] = pad_height
            half = np.linalg.norm(self.world_to_image(top) - uv, axis=-1) / 6.0
        return (np.isfinite(u) & np.isfinite(v)
                & (u >= half) & (u < self.p["width"] - half)
                & (v >= half) & (v < self.p["height"] - half))


def triangulate_two_lines_np(p1a, p1b, p2a, p2b):
    """Numpy mirror of geometry.triangulation.triangulate_two_lines —
    closest-point midpoint + gap of two 3D lines, batched
    (ref psn_where/PSNWhere_Utils.cpp:499-525).  Host-side so that the
    small per-frame cross-camera gating batch avoids a device dispatch."""
    p1a, p1b = np.asarray(p1a), np.asarray(p1b)
    p2a, p2b = np.asarray(p2a), np.asarray(p2b)
    d1 = p1a - p1b
    d2 = p2a - p2b
    off = p2b - p1b
    a11 = np.sum(d1 * d1, -1)
    a12 = np.sum(d1 * -d2, -1)
    a21 = np.sum(d2 * d1, -1)
    a22 = np.sum(d2 * -d2, -1)
    b1 = np.sum(d1 * off, -1)
    b2 = np.sum(d2 * off, -1)
    det = a11 * a22 - a12 * a21
    bad = np.abs(det) < 1e-12
    safe_det = np.where(bad, 1.0, det)
    t1 = (b1 * a22 - a12 * b2) / safe_det
    t2 = (a11 * b2 - b1 * a21) / safe_det
    c1 = p1b + d1 * t1[..., None]
    c2 = p2b + d2 * t2[..., None]
    mid = 0.5 * (c1 + c2)
    gap = np.where(bad, np.inf, np.linalg.norm(c1 - c2, axis=-1))
    return mid, gap


def _undistort_to_distort(kappa1, xu, yu):
    """Cardano inverse of the radial distortion (ref :579-663), numpy."""
    xu = np.asarray(xu, np.float64)
    yu = np.asarray(yu, np.float64)
    if kappa1 == 0.0:
        return xu, yu
    ru = np.hypot(xu, yu)
    c = 1.0 / kappa1
    d = -c * ru
    q = c / 3.0
    r = -d / 2.0
    disc = q ** 3 + r ** 2
    sq = np.sqrt(np.maximum(disc, 0.0))
    rd_one = np.cbrt(r + sq) + np.cbrt(r - sq)
    rd_max = np.sqrt(np.maximum(-1.0 / (3.0 * kappa1), 0.0))
    rd_one = np.where(rd_one < 0.0, rd_max, rd_one)
    sqn = np.sqrt(np.maximum(-disc, 0.0))
    s3 = np.cbrt(np.sqrt(r ** 2 + np.maximum(-disc, 0.0)))
    th = np.arctan2(sqn, r) / 3.0
    rd_three = -s3 * np.cos(th) + np.sqrt(3.0) * s3 * np.sin(th)
    rd = np.where(disc >= 0.0, rd_one, rd_three)
    lam = np.where(ru == 0.0, 1.0, rd / np.where(ru == 0.0, 1.0, ru))
    return np.where(ru == 0.0, xu, xu * lam), np.where(ru == 0.0, yu, yu * lam)
