"""Pallas TPU kernel for iterative Lucas-Kanade refinement.

The XLA fallback (ops/lk.py) expresses window sampling as giant gathers —
~40 gathers of [N, window^2] per pyramid level, which measure ~100 ms each
on a v5e at production sizes.  This kernel restructures the work the way
the hardware wants it:

  * per feature, ONE async DMA brings a [PH, PW] patch of each image from
    HBM into VMEM; patch corners are tile-aligned (rows to 8, lanes to 128)
    as Mosaic requires for HBM slices, with margins sized so the LK window
    plus per-level drift always stays inside the patch;
  * bilinear sampling inside the patch is four dynamically-offset window
    slices blended with scalar weights — pure VPU arithmetic, no gathers;
  * the Newton iterations run on VMEM with a 2x2 solve;
  * each grid program processes BATCH features to amortise program and
    DMA-issue overhead, and one kernel instance covers every feature of
    every camera (images stacked [C, H, W], camera index per feature in
    the scalar-prefetch operands).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PH = 40             # patch rows (multiple of 8); y margin >= 16 both sides
BATCH = 8           # features per grid program


def _make_kernel(window: int, iters: int, ph: int, pw: int):
    def kernel(meta_ref,          # [N, 6] i32: cam, y0p, x0p, y0n, x0n, act
               srcg_ref,          # [N, 4] f32: sy, sx (rel prev), gy, gx (rel next)
               prev_ref,          # [C, H, W] f32 ANY
               next_ref,          # [C, H, W] f32 ANY
               out_ref,           # [BATCH, 8] f32 SMEM block
               pprev, pnext, sem):
        g = pl.program_id(0)
        num = pl.num_programs(0)
        slot = jax.lax.rem(g, 2)
        nslot = jax.lax.rem(g + 1, 2)

        def issue(prog, dst_slot):
            """Start the patch DMAs of program `prog` into buffer dst_slot.
            Inactive (padding) features skip their DMAs entirely — real
            workloads run at 10-30% slot occupancy, so this is the main
            throughput lever."""
            for b in range(BATCH):
                i = prog * BATCH + b

                @pl.when(meta_ref[5, i] > 0)
                def _():
                    y0p = pl.multiple_of(meta_ref[1, i], 8)
                    x0p = pl.multiple_of(meta_ref[2, i], 128)
                    y0n = pl.multiple_of(meta_ref[3, i], 8)
                    x0n = pl.multiple_of(meta_ref[4, i], 128)
                    pltpu.make_async_copy(
                        prev_ref.at[meta_ref[0, i], pl.ds(y0p, ph),
                                    pl.ds(x0p, pw)],
                        pprev.at[dst_slot, b], sem.at[dst_slot, 2 * b]).start()
                    pltpu.make_async_copy(
                        next_ref.at[meta_ref[0, i], pl.ds(y0n, ph),
                                    pl.ds(x0n, pw)],
                        pnext.at[dst_slot, b],
                        sem.at[dst_slot, 2 * b + 1]).start()

        # program 0 fetches its own patches; everyone prefetches the next
        # program's patches before computing (double-buffered pipeline)
        @pl.when(g == 0)
        def _():
            issue(0, 0)

        @pl.when(g + 1 < num)
        def _():
            issue(g + 1, nslot)

        copies = []
        for b in range(BATCH):
            cp = pltpu.make_async_copy(
                prev_ref.at[0, pl.ds(0, ph), pl.ds(0, pw)],
                pprev.at[slot, b], sem.at[slot, 2 * b])
            cn = pltpu.make_async_copy(
                next_ref.at[0, pl.ds(0, ph), pl.ds(0, pw)],
                pnext.at[slot, b], sem.at[slot, 2 * b + 1])
            copies.append((cp, cn))

        w = window
        half = (w - 1) / 2.0
        lo = 1.0
        hi_y = float(ph - w - 2)
        hi_x = float(pw - w - 2)
        # working-subpatch geometry: the Newton iterations roll a
        # [SUBH, SUBW] slice instead of the whole [ph, pw] DMA patch —
        # the per-iteration data volume drops ~5x (the DMA patch is
        # oversized only because HBM slice corners must be tile-aligned).
        # SUBM_* place the initial guess window inside the subpatch with
        # drift margins of ~±6 rows / ±54 lanes, ample for one pyramid
        # level's refinement.
        subh = min(32, ph)
        subw = min(128, pw)
        subm_y = (subh - w) // 2
        subm_x = (subw - w) // 2
        hi_ys = float(subh - w - 2)
        hi_xs = float(subw - w - 2)

        def rolled(patch_val, iy, ix):
            """Shift the patch so window-origin (iy-1, ix-1) lands at (0, 0);
            dynamic shifts via pltpu.roll (Mosaic rejects dynamic sublane
            slice offsets, but vector rolls take runtime amounts).  Shifts
            are wrapped positive — hardware rolls are unsigned."""
            r = pltpu.roll(patch_val, (1 - iy) % ph, 0)
            return pltpu.roll(r, (1 - ix) % pw, 1)

        def rolled_sub(patch_val, iy, ix):
            """rolled() for the [subh, subw] working subpatch."""
            r = pltpu.roll(patch_val, (1 - iy) % subh, 0)
            return pltpu.roll(r, (1 - ix) % subw, 1)

        def blend_at(r, oy, ox, fy_, fx_):
            """Bilinear sample of the rolled patch at static offset
            (oy, ox) from the window origin (origin sits at (1, 1))."""
            a = r[1 + oy:1 + oy + w, 1 + ox:1 + ox + w]
            b_ = r[1 + oy:1 + oy + w, 2 + ox:2 + ox + w]
            c_ = r[2 + oy:2 + oy + w, 1 + ox:1 + ox + w]
            d_ = r[2 + oy:2 + oy + w, 2 + ox:2 + ox + w]
            return (a * (1 - fy_) * (1 - fx_) + b_ * (1 - fy_) * fx_
                    + c_ * fy_ * (1 - fx_) + d_ * fy_ * fx_)

        for b in range(BATCH):
            i = g * BATCH + b
            active = meta_ref[5, i] > 0

            out_ref[b, 0] = 0.0
            out_ref[b, 1] = 0.0
            out_ref[b, 2] = 0.0
            out_ref[b, 3] = 0.0
            out_ref[b, 4] = 0.0
            out_ref[b, 5] = 0.0
            out_ref[b, 6] = 0.0
            out_ref[b, 7] = 0.0

            @pl.when(active)
            def _():
                copies[b][0].wait()
                copies[b][1].wait()

                pv_patch = pprev[slot, b]
                nx_patch = pnext[slot, b]

                sy = srcg_ref[0, i] - half   # window top-left, prev patch
                sx = srcg_ref[1, i] - half
                gy0 = srcg_ref[2, i] - half  # guess top-left, next patch
                gx0 = srcg_ref[3, i] - half

                src_ok = (sy >= lo) & (sy <= hi_y) & (sx >= lo) & (sx <= hi_x)
                sy_c = jnp.clip(sy, lo, hi_y)
                sx_c = jnp.clip(sx, lo, hi_x)
                isy = jnp.floor(sy_c).astype(jnp.int32)
                isx = jnp.floor(sx_c).astype(jnp.int32)
                fy = sy_c - isy.astype(jnp.float32)
                fx = sx_c - isx.astype(jnp.float32)

                rp = rolled(pv_patch, isy, isx)
                t = blend_at(rp, 0, 0, fy, fx)
                gx_p = 0.5 * (blend_at(rp, 0, 1, fy, fx)
                              - blend_at(rp, 0, -1, fy, fx))
                gy_p = 0.5 * (blend_at(rp, 1, 0, fy, fx)
                              - blend_at(rp, -1, 0, fy, fx))

                gxx = jnp.sum(gx_p * gx_p)
                gxy = jnp.sum(gx_p * gy_p)
                gyy = jnp.sum(gy_p * gy_p)
                det = gxx * gyy - gxy * gxy
                ok_g = det > 1e-7
                inv_det = jnp.where(ok_g, 1.0 / jnp.where(ok_g, det, 1.0),
                                    0.0)

                # Working subpatch around the initial guess: ONE pair of
                # full-patch rolls per feature, then every Newton
                # iteration rolls [subh, subw] (~5x less data).  The
                # drift clamps translate the full patch's valid range
                # into subpatch coordinates — the roll is circular, so
                # rows/cols past the original patch edge hold wrapped
                # garbage that the clamps must exclude.
                gy_cl = jnp.clip(gy0, lo, hi_y)
                gx_cl = jnp.clip(gx0, lo, hi_x)
                igy = jnp.floor(gy_cl).astype(jnp.int32)
                igx = jnp.floor(gx_cl).astype(jnp.int32)
                base_y = (igy - subm_y).astype(jnp.float32)
                base_x = (igx - subm_x).astype(jnp.float32)
                # rolled() maps origin (iy-1, ix-1) -> (0, 0); passing
                # iy = base + 1 puts patch row base_y at subpatch row 0
                sub = rolled(nx_patch, igy - subm_y + 1,
                             igx - subm_x + 1)[:subh, :subw]
                lo_ys = jnp.maximum(lo, lo - base_y)
                hi_ys_d = jnp.minimum(hi_ys, hi_y - base_y)
                lo_xs = jnp.maximum(lo, lo - base_x)
                hi_xs_d = jnp.minimum(hi_xs, hi_x - base_x)

                def warp(dy, dx):
                    dy_c = jnp.clip(dy, lo_ys, hi_ys_d)
                    dx_c = jnp.clip(dx, lo_xs, hi_xs_d)
                    iy = jnp.floor(dy_c).astype(jnp.int32)
                    ix = jnp.floor(dx_c).astype(jnp.int32)
                    fy2 = dy_c - iy.astype(jnp.float32)
                    fx2 = dx_c - ix.astype(jnp.float32)
                    rn = rolled_sub(sub, iy, ix)
                    return blend_at(rn, 0, 0, fy2, fx2), dy_c, dx_c

                def cond(carry):
                    _, _, it, go = carry
                    return (it < iters) & go

                def body(carry):
                    dy, dx, it, _ = carry
                    warped, dy_c, dx_c = warp(dy, dx)
                    diff = warped - t
                    bx = jnp.sum(diff * gx_p)
                    by = jnp.sum(diff * gy_p)
                    ux = -(gyy * bx - gxy * by) * inv_det
                    uy = -(-gxy * bx + gxx * by) * inv_det
                    # early exit at the reference's TermCriteria epsilon
                    # (ref Tracker2D.cpp:145: COUNT+EPS, eps 0.03):
                    # typical features converge in 2-4 iterations
                    go = (jnp.abs(ux) + jnp.abs(uy)) > 0.03
                    return (dy_c + uy, dx_c + ux, it + 1, go)

                dy, dx, _, _ = jax.lax.while_loop(
                    cond, body,
                    (gy0 - base_y, gx0 - base_x, jnp.int32(0), True))
                warped, dy_c, dx_c = warp(dy, dx)
                resid = jnp.mean(jnp.abs(warped - t))

                in_range = (dy >= lo_ys) & (dy <= hi_ys_d) \
                    & (dx >= lo_xs) & (dx <= hi_xs_d)
                valid = ok_g & src_ok & in_range

                out_ref[b, 0] = dx_c + base_x + half   # x, rel next patch
                out_ref[b, 1] = dy_c + base_y + half
                out_ref[b, 2] = valid.astype(jnp.float32)
                out_ref[b, 3] = resid

    return kernel


def _make_kernel_batched(window: int, iters: int, ph: int, pw: int):
    """Batch-vectorized variant: ONE Newton loop for all BATCH features.

    The serial kernel above runs 8 independent while_loops back-to-back,
    each blending one [w, w] window — the VPU sees a 16x16 tile at a time
    and pays 8x the loop-carry latency.  Here the per-feature dynamic
    window extraction is expressed as bilinear one-hot selection matrices
    (R [w, ph] rows, C [pw, w] cols with the fractional weights folded
    in), so a sample is two small MXU matmuls per feature and the Newton
    state (dy, dx, converged) is a [BATCH, 1, 1] vector updated by one
    shared while_loop with per-feature freeze masks.  No dynamic rolls,
    no vector->scalar extraction, VMEM-block output — the Mosaic-safe
    subset (see repo CLAUDE.md).

    Reference behaviour (window LK with TermCriteria eps 0.03, ref
    psn_where/PSNWhere_Tracker2D.cpp:145) is unchanged; parity with the
    serial kernel and the XLA path is tested in interpret mode."""
    w = window
    half = (w - 1) / 2.0
    lo = 1.0
    hi_y = float(ph - w - 2)
    hi_x = float(pw - w - 2)

    def kernel(meta_ref, srcg_ref, prev_ref, next_ref, out_ref,
               pprev, pnext, sem):
        g = pl.program_id(0)
        num = pl.num_programs(0)
        slot = jax.lax.rem(g, 2)
        nslot = jax.lax.rem(g + 1, 2)

        def issue(prog, dst_slot):
            for b in range(BATCH):
                i = prog * BATCH + b

                @pl.when(meta_ref[5, i] > 0)
                def _():
                    y0p = pl.multiple_of(meta_ref[1, i], 8)
                    x0p = pl.multiple_of(meta_ref[2, i], 128)
                    y0n = pl.multiple_of(meta_ref[3, i], 8)
                    x0n = pl.multiple_of(meta_ref[4, i], 128)
                    pltpu.make_async_copy(
                        prev_ref.at[meta_ref[0, i], pl.ds(y0p, ph),
                                    pl.ds(x0p, pw)],
                        pprev.at[dst_slot, b], sem.at[dst_slot, 2 * b]).start()
                    pltpu.make_async_copy(
                        next_ref.at[meta_ref[0, i], pl.ds(y0n, ph),
                                    pl.ds(x0n, pw)],
                        pnext.at[dst_slot, b],
                        sem.at[dst_slot, 2 * b + 1]).start()

        @pl.when(g == 0)
        def _():
            issue(0, 0)

        @pl.when(g + 1 < num)
        def _():
            issue(g + 1, nslot)

        for b in range(BATCH):
            i = g * BATCH + b

            @pl.when(meta_ref[5, i] > 0)
            def _():
                pltpu.make_async_copy(
                    prev_ref.at[0, pl.ds(0, ph), pl.ds(0, pw)],
                    pprev.at[slot, b], sem.at[slot, 2 * b]).wait()
                pltpu.make_async_copy(
                    next_ref.at[0, pl.ds(0, ph), pl.ds(0, pw)],
                    pnext.at[slot, b], sem.at[slot, 2 * b + 1]).wait()

        bi = jax.lax.broadcasted_iota(jnp.int32, (BATCH, 1, 1), 0)

        def vec(col_ref, col, cast=jnp.float32):
            """Assemble [BATCH, 1, 1] from BATCH SMEM scalars."""
            out = jnp.zeros((BATCH, 1, 1), cast)
            for b in range(BATCH):
                s = col_ref[col, g * BATCH + b]
                out = out + jnp.where(bi == b, cast(s), cast(0))
            return out

        active_v = vec(meta_ref, 5, jnp.int32) > 0
        sy = vec(srcg_ref, 0) - half
        sx = vec(srcg_ref, 1) - half
        gy0 = vec(srcg_ref, 2) - half
        gx0 = vec(srcg_ref, 3) - half

        def sel_rows(pos, frac, wh, extent):
            """[BATCH, wh, extent] bilinear row-selection one-hots:
            sel[b, r, k] = (1-frac_b)*[k == pos_b+r] + frac_b*[k == pos_b+r+1]."""
            k = jax.lax.broadcasted_iota(jnp.int32, (BATCH, wh, extent), 2)
            r = jax.lax.broadcasted_iota(jnp.int32, (BATCH, wh, extent), 1)
            tgt = pos + r
            return (jnp.where(k == tgt, 1.0 - frac, 0.0)
                    + jnp.where(k == tgt + 1, frac, 0.0))

        def sel_cols(pos, frac, wh, extent):
            """Transposed variant, [BATCH, extent, wh] — built directly so
            the kernel never transposes in-register."""
            k = jax.lax.broadcasted_iota(jnp.int32, (BATCH, extent, wh), 1)
            c = jax.lax.broadcasted_iota(jnp.int32, (BATCH, extent, wh), 2)
            tgt = pos + c
            return (jnp.where(k == tgt, 1.0 - frac, 0.0)
                    + jnp.where(k == tgt + 1, frac, 0.0))

        def sample(patch_ref, y, x, wh):
            """Bilinear [wh, wh] window per feature at float origin (y, x)
            of its patch (patch_ref(b) -> [ph, pw]); one-hot rows/cols
            never index out of range (the callers clamp), so out-of-patch
            taps contribute zero rather than the circular-wrap garbage of
            the roll-based kernel."""
            iy = jnp.floor(y).astype(jnp.int32)
            ix = jnp.floor(x).astype(jnp.int32)
            fy = y - iy.astype(jnp.float32)
            fx = x - ix.astype(jnp.float32)
            rsel = sel_rows(iy, fy, wh, ph)             # [B, wh, ph]
            csel = sel_cols(ix, fx, wh, pw)             # [B, pw, wh]
            outs = []
            for b in range(BATCH):
                tmp = jax.lax.dot(rsel[b], patch_ref(b),
                                  preferred_element_type=jnp.float32)
                win = jax.lax.dot(tmp, csel[b],
                                  preferred_element_type=jnp.float32)
                outs.append(win[None])
            return jnp.concatenate(outs, axis=0)        # [B, wh, wh]

        def rsum(x3):
            """Reduce [B, m, n] -> [B, 1, 1] (two single-axis sums)."""
            return jnp.sum(jnp.sum(x3, axis=2, keepdims=True),
                           axis=1, keepdims=True)

        pv3 = lambda b: pprev[slot, b]
        nx3 = lambda b: pnext[slot, b]

        src_ok = (sy >= lo) & (sy <= hi_y) & (sx >= lo) & (sx <= hi_x)
        sy_c = jnp.clip(sy, lo, hi_y)
        sx_c = jnp.clip(sx, lo, hi_x)
        # (w+2)-window at (sy-1, sx-1): template + central-diff gradients
        # in one sampling pass
        ext = sample(pv3, sy_c - 1.0, sx_c - 1.0, w + 2)
        t = ext[:, 1:w + 1, 1:w + 1]
        gx_p = 0.5 * (ext[:, 1:w + 1, 2:w + 2] - ext[:, 1:w + 1, 0:w])
        gy_p = 0.5 * (ext[:, 2:w + 2, 1:w + 1] - ext[:, 0:w, 1:w + 1])

        gxx = rsum(gx_p * gx_p)
        gxy = rsum(gx_p * gy_p)
        gyy = rsum(gy_p * gy_p)
        det = gxx * gyy - gxy * gxy
        ok_g = det > 1e-7
        inv_det = jnp.where(ok_g, 1.0 / jnp.where(ok_g, det, 1.0), 0.0)

        def warp(dy, dx):
            dy_c = jnp.clip(dy, lo, hi_y)
            dx_c = jnp.clip(dx, lo, hi_x)
            return sample(nx3, dy_c, dx_c, w), dy_c, dx_c

        # Python-unrolled Newton steps with per-feature freeze masks.
        # Mosaic cannot yield the padded [BATCH, 1, 1] vector layouts a
        # lax.while_loop carry would need ('scf.yield' legalization), and
        # the per-iteration work here is a handful of vector ops + 16
        # tiny matmuls — unrolling is cheaper than the loop would be.
        # Converged features stop moving (go mask), matching the serial
        # kernel's per-feature early exit bit-for-bit.
        dy, dx, go = gy0, gx0, active_v
        for _ in range(iters):
            warped, dy_c, dx_c = warp(dy, dx)
            diff = warped - t
            bx = rsum(diff * gx_p)
            by = rsum(diff * gy_p)
            ux = -(gyy * bx - gxy * by) * inv_det
            uy = -(-gxy * bx + gxx * by) * inv_det
            dy = jnp.where(go, dy_c + uy, dy)
            dx = jnp.where(go, dx_c + ux, dx)
            go = go & ((jnp.abs(ux) + jnp.abs(uy)) > 0.03)
        warped, dy_c, dx_c = warp(dy, dx)
        resid = rsum(jnp.abs(warped - t)) * (1.0 / (w * w))

        in_range = (dy >= lo) & (dy <= hi_y) & (dx >= lo) & (dx <= hi_x)
        valid = ok_g & src_ok & in_range & active_v

        def col(q):
            return jnp.broadcast_to(
                jnp.where(active_v, q, 0.0), (BATCH, 8, 1))

        out_ref[:, :, :] = jnp.concatenate(
            [col(dx_c + half), col(dy_c + half),
             col(valid.astype(jnp.float32)), col(resid),
             col(jnp.zeros((BATCH, 1, 1))), col(jnp.zeros((BATCH, 1, 1))),
             col(jnp.zeros((BATCH, 1, 1))), col(jnp.zeros((BATCH, 1, 1)))],
            axis=2)

    return kernel


# feature-chunk size: keeps the scalar-prefetch operands within SMEM.
# Rows pad to 512 B each, so the [col, N] operand layout costs ~10 rows
# total regardless of N — the chunking only guards pathological feature
# counts (the old [N, col] layout capped CHUNK at 512)
CHUNK = 16384


@functools.partial(jax.jit, static_argnames=("window", "iters", "interpret",
                                             "variant"))
def lk_level_pallas(prev: jnp.ndarray,
                    next_img: jnp.ndarray,
                    cam_idx: jnp.ndarray,
                    points: jnp.ndarray,
                    guess: jnp.ndarray,
                    active=None,
                    window: int = 16,
                    iters: int = 10,
                    interpret: bool = False,
                    variant: str = "batched"):
    """Single-level LK for a flat feature batch over stacked cameras.

    Args:
      prev, next_img: [C, H, W] float32; H must be a multiple of 8 and
        W a multiple of 128 (pyramid levels of 8/128-divisible frames are).
      cam_idx: [N] int32 camera of each feature; N multiple of BATCH.
      points:  [N, 2] (x, y) source positions.
      guess:   [N, 2] (x, y) initial target positions.
      active:  [N] bool — inactive features skip DMA + compute entirely
               (padding slots; real workloads run well below capacity).

    Returns (tracked [N, 2], valid [N] bool, resid [N]).
    """
    c, h, wid = prev.shape
    n = points.shape[0]
    assert n % BATCH == 0, (n, BATCH)
    ph = min(PH, h)
    pw = min(256, wid)
    half = (window - 1) / 2.0

    def corner(pts):
        # tile-aligned top-left patch corner with the point in the interior
        cy = (jnp.floor(pts[:, 1]).astype(jnp.int32) - ph // 2 + 4) & ~7
        cy = jnp.clip(cy, 0, max(h - ph, 0))
        cx = (jnp.floor(pts[:, 0]).astype(jnp.int32) - pw // 2 + 64) \
            & ~(128 - 1)
        cx = jnp.clip(cx, 0, max(wid - pw, 0))
        return cy, cx

    y0p, x0p = corner(points)
    y0n, x0n = corner(guess)
    cam32 = cam_idx.astype(jnp.int32)
    if active is None:
        act32 = jnp.ones_like(cam32)
    else:
        act32 = active.astype(jnp.int32)
    # scalar-prefetch operands are laid out [col, N] (features on the
    # minor axis): SMEM pads every ROW to 512 B, so the [N, col] layout
    # cost 512 B per FEATURE per operand (1 MB at 1024 features — the old
    # CHUNK=512 ceiling); transposed it is a handful of rows regardless
    # of N, removing the chunking pressure entirely
    meta = jnp.stack([cam32, y0p, x0p, y0n, x0n, act32], 0)
    srcg = jnp.stack([points[:, 1] - y0p, points[:, 0] - x0p,
                      guess[:, 1] - y0n, guess[:, 0] - x0n], 0)

    if variant == "batched":
        kernel = _make_kernel_batched(window, iters, ph, pw)
        out_spec = pl.BlockSpec((BATCH, 8, 8), lambda i, *_: (i, 0, 0))
        out_sds = lambda m: jax.ShapeDtypeStruct((m, 8, 8), jnp.float32)
    else:
        kernel = _make_kernel(window, iters, ph, pw)
        out_spec = pl.BlockSpec((BATCH, 8), lambda i, *_: (i, 0),
                                memory_space=pltpu.SMEM)
        out_sds = lambda m: jax.ShapeDtypeStruct((m, 8), jnp.float32)

    def call_chunk(meta_c, srcg_c):
        m = meta_c.shape[1]
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(m // BATCH,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=out_spec,
                scratch_shapes=[
                    pltpu.VMEM((2, BATCH, ph, pw), jnp.float32),
                    pltpu.VMEM((2, BATCH, ph, pw), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, 2 * BATCH)),
                ],
            ),
            out_shape=out_sds(m),
            interpret=interpret,
        )(meta_c, srcg_c, prev.astype(jnp.float32),
          next_img.astype(jnp.float32))
        return out[:, 0, :] if variant == "batched" else out

    meta = meta.astype(jnp.int32)
    srcg = srcg.astype(jnp.float32)
    if n <= CHUNK:
        out = call_chunk(meta, srcg)
    else:
        # chunk so the scalar-prefetch operands stay within SMEM limits
        pad = (-n) % CHUNK
        meta_p = jnp.pad(meta, ((0, 0), (0, pad)))
        srcg_p = jnp.pad(srcg, ((0, 0), (0, pad)))
        chunks = [call_chunk(meta_p[:, i:i + CHUNK],
                             srcg_p[:, i:i + CHUNK])
                  for i in range(0, n + pad, CHUNK)]
        out = jnp.concatenate(chunks, axis=0)[:n]

    tracked = jnp.stack([out[:, 0] + x0n.astype(jnp.float32),
                         out[:, 1] + y0n.astype(jnp.float32)], -1)
    valid = out[:, 2] > 0.5
    resid = out[:, 3]
    return tracked, valid, resid
