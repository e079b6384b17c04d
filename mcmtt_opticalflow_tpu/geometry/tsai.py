"""Tsai calibrated camera model as pure, vmappable JAX functions.

Re-implements the math of the reference's Etiseo::CameraModel
(psn_where/calibration/cameraModel.cpp) as stateless functions over a
parameter pytree, so projections batch over cameras *and* points on device:

  * rotation / camera position precompute   (ref cameraModel.cpp:28-61)
  * world_to_image with radial distortion   (ref cameraModel.cpp:545-577)
  * image_to_world at a given world height  (ref cameraModel.cpp:494-533)
  * undistorted->distorted via Cardano cubic (ref cameraModel.cpp:579-663)

All math is float64-capable but defaults to float32 tensors; tests validate
round-trip error stays within the metric tolerance used downstream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TsaiCamera(NamedTuple):
    """Tsai calibration parameters (+ precomputed rotation), one camera.

    Every leaf is a scalar array so a stacked TsaiCamera (leaves of shape
    [C]) batches over cameras with vmap.  Mirrors the parameter set of
    ref cameraModel.h:140-178.
    """

    # geometry
    width: jnp.ndarray
    height: jnp.ndarray
    dpx: jnp.ndarray
    dpy: jnp.ndarray
    # intrinsic
    focal: jnp.ndarray
    kappa1: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    sx: jnp.ndarray
    # extrinsic
    tx: jnp.ndarray
    ty: jnp.ndarray
    tz: jnp.ndarray
    # rotation matrix (precomputed from rx, ry, rz as in ref cameraModel.cpp:38-53)
    r11: jnp.ndarray
    r12: jnp.ndarray
    r13: jnp.ndarray
    r21: jnp.ndarray
    r22: jnp.ndarray
    r23: jnp.ndarray
    r31: jnp.ndarray
    r32: jnp.ndarray
    r33: jnp.ndarray

    @staticmethod
    def create(width, height, dpx, dpy, focal, kappa1, cx, cy, sx,
               tx, ty, tz, rx, ry, rz, dtype=jnp.float32) -> "TsaiCamera":
        """Build a camera, precomputing the Euler rotation matrix
        (ZYX convention of ref cameraModel.cpp:38-53)."""
        sa, ca = np.sin(rx), np.cos(rx)
        sb, cb = np.sin(ry), np.cos(ry)
        sg, cg = np.sin(rz), np.cos(rz)
        vals = dict(
            width=width, height=height, dpx=dpx, dpy=dpy,
            focal=focal, kappa1=kappa1, cx=cx, cy=cy, sx=sx,
            tx=tx, ty=ty, tz=tz,
            r11=cb * cg,
            r12=cg * sa * sb - ca * sg,
            r13=sa * sg + ca * cg * sb,
            r21=cb * sg,
            r22=sa * sb * sg + ca * cg,
            r23=ca * sb * sg - cg * sa,
            r31=-sb,
            r32=cb * sa,
            r33=ca * cb,
        )
        return TsaiCamera(**{k: jnp.asarray(v, dtype) for k, v in vals.items()})


def stack_cameras(cams) -> TsaiCamera:
    """Stack a sequence of TsaiCamera into one pytree with leading [C] axis."""
    return TsaiCamera(*[jnp.stack([getattr(c, f) for c in cams])
                        for f in TsaiCamera._fields])


def camera_position(cam: TsaiCamera) -> jnp.ndarray:
    """World-space camera centre, -R^T t (ref cameraModel.cpp:56-58)."""
    px = -(cam.tx * cam.r11 + cam.ty * cam.r21 + cam.tz * cam.r31)
    py = -(cam.tx * cam.r12 + cam.ty * cam.r22 + cam.tz * cam.r32)
    pz = -(cam.tx * cam.r13 + cam.ty * cam.r23 + cam.tz * cam.r33)
    return jnp.stack([px, py, pz], axis=-1)


# ---------------------------------------------------------------------------
# distortion
# ---------------------------------------------------------------------------

def _distorted_to_undistorted_sensor(cam: TsaiCamera, xd, yd):
    """(ref cameraModel.cpp:535-543)"""
    factor = 1.0 + cam.kappa1 * (xd * xd + yd * yd)
    return xd * factor, yd * factor


def _undistorted_to_distorted_sensor(cam: TsaiCamera, xu, yu):
    """Invert the radial distortion by solving the Cardano cubic, exactly the
    branch structure of ref cameraModel.cpp:579-663, expressed with
    jnp.where so it vectorises."""
    ru_sq = xu * xu + yu * yu
    ru = jnp.sqrt(ru_sq)
    safe_kappa = jnp.where(cam.kappa1 == 0.0, 1.0, cam.kappa1)
    c = 1.0 / safe_kappa
    d = -c * ru
    q = c / 3.0
    r = -d / 2.0
    disc = q * q * q + r * r

    # --- one real root (disc >= 0) ------------------------------------------
    sq_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    s_val = jnp.cbrt(r + sq_disc)
    t_val = jnp.cbrt(r - sq_disc)
    rd_one = s_val + t_val
    # clamp at the maximum barrel-distortion radius (ref cameraModel.cpp:634-640)
    rd_max = jnp.sqrt(jnp.maximum(-1.0 / (3.0 * safe_kappa), 0.0))
    rd_one = jnp.where(rd_one < 0.0, rd_max, rd_one)

    # --- three real roots (disc < 0): smaller positive root ------------------
    sq_ndisc = jnp.sqrt(jnp.maximum(-disc, 0.0))
    s3 = jnp.cbrt(jnp.sqrt(r * r + jnp.maximum(-disc, 0.0)))
    theta = jnp.arctan2(sq_ndisc, r) / 3.0
    rd_three = -s3 * jnp.cos(theta) + jnp.sqrt(3.0) * s3 * jnp.sin(theta)

    rd = jnp.where(disc >= 0.0, rd_one, rd_three)
    lam = rd / jnp.where(ru == 0.0, 1.0, ru)
    identity = jnp.logical_or(ru == 0.0, cam.kappa1 == 0.0)
    xd = jnp.where(identity, xu, xu * lam)
    yd = jnp.where(identity, yu, yu * lam)
    return xd, yd


# ---------------------------------------------------------------------------
# projections
# ---------------------------------------------------------------------------

def world_to_image(cam: TsaiCamera, point3d: jnp.ndarray) -> jnp.ndarray:
    """Project world [..., 3] -> image [..., 2] (ref cameraModel.cpp:545-577)."""
    xw, yw, zw = point3d[..., 0], point3d[..., 1], point3d[..., 2]
    xc = cam.r11 * xw + cam.r12 * yw + cam.r13 * zw + cam.tx
    yc = cam.r21 * xw + cam.r22 * yw + cam.r23 * zw + cam.ty
    zc = cam.r31 * xw + cam.r32 * yw + cam.r33 * zw + cam.tz
    xu = cam.focal * xc / zc
    yu = cam.focal * yc / zc
    xd, yd = _undistorted_to_distorted_sensor(cam, xu, yu)
    xi = xd * cam.sx / cam.dpx + cam.cx
    yi = yd / cam.dpy + cam.cy
    return jnp.stack([xi, yi], axis=-1)


def image_to_world(cam: TsaiCamera, point2d: jnp.ndarray, zw) -> jnp.ndarray:
    """Back-project image [..., 2] at world height zw -> world [..., 3]
    (closed-form inverse projection, ref cameraModel.cpp:494-533)."""
    xi, yi = point2d[..., 0], point2d[..., 1]
    zw = jnp.broadcast_to(jnp.asarray(zw, xi.dtype), xi.shape)
    xd = cam.dpx * (xi - cam.cx) / cam.sx
    yd = cam.dpy * (yi - cam.cy)
    xu, yu = _distorted_to_undistorted_sensor(cam, xd, yd)

    den = ((cam.r11 * cam.r32 - cam.r12 * cam.r31) * yu
           + (cam.r22 * cam.r31 - cam.r21 * cam.r32) * xu
           - cam.focal * cam.r11 * cam.r22 + cam.focal * cam.r12 * cam.r21)
    xw = (((cam.r12 * cam.r33 - cam.r13 * cam.r32) * yu
           + (cam.r23 * cam.r32 - cam.r22 * cam.r33) * xu
           - cam.focal * cam.r12 * cam.r23 + cam.focal * cam.r13 * cam.r22) * zw
          + (cam.r12 * cam.tz - cam.r32 * cam.tx) * yu
          + (cam.r32 * cam.ty - cam.r22 * cam.tz) * xu
          - cam.focal * cam.r12 * cam.ty + cam.focal * cam.r22 * cam.tx) / den
    yw = -(((cam.r11 * cam.r33 - cam.r13 * cam.r31) * yu
            + (cam.r23 * cam.r31 - cam.r21 * cam.r33) * xu
            - cam.focal * cam.r11 * cam.r23 + cam.focal * cam.r13 * cam.r21) * zw
           + (cam.r11 * cam.tz - cam.r31 * cam.tx) * yu
           + (cam.r31 * cam.ty - cam.r21 * cam.tz) * xu
           - cam.focal * cam.r11 * cam.ty + cam.focal * cam.r21 * cam.tx) / den
    return jnp.stack([xw, yw, zw], axis=-1)


def back_projection_line(cam: TsaiCamera, point2d: jnp.ndarray,
                         z_top: float = 2000.0):
    """Back-projection line through a pixel as two world points at heights
    z_top and 0 (ref PSNWhere_Associator3D.cpp:1058-1064)."""
    top = image_to_world(cam, point2d, z_top)
    bottom = image_to_world(cam, point2d, 0.0)
    return top, bottom


def check_visibility(cam: TsaiCamera, point3d: jnp.ndarray) -> jnp.ndarray:
    """Whether a world point projects inside the camera frame
    (ref CheckVisibility usage, PSNWhere_Associator3D.cpp:901-912)."""
    uv = world_to_image(cam, point3d)
    u, v = uv[..., 0], uv[..., 1]
    return ((u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
            & jnp.isfinite(u) & jnp.isfinite(v))
