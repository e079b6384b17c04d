"""Geometry layer tests: Tsai projections, triangulation, side-maps.

The reference treats these as trusted primitives (no tests exist upstream);
here they are unit-tested directly, per SURVEY.md section 4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from mcmtt_opticalflow_tpu.geometry import (
    TsaiCamera, stack_cameras, world_to_image, image_to_world,
    back_projection_line, check_visibility, camera_position,
    triangulate_two_lines, nview_point_reconstruction,
    nview_ground_reconstruction, segments_intersect,
    projection_sensitivity_map, distance_from_boundary_map, sample_map,
)


def make_camera(rx=2.4, ry=0.2, rz=0.3, tz=8000.0, kappa1=1e-9,
                tx=100.0, ty=-11000.0):
    """A plausible PETS-like overhead camera looking at the ground plane."""
    return TsaiCamera.create(
        width=768, height=576, dpx=0.0083, dpy=0.0083,
        focal=8.0, kappa1=kappa1, cx=384.0, cy=288.0, sx=1.0,
        tx=tx, ty=ty, tz=tz, rx=rx, ry=ry, rz=rz)


class TestTsai:
    def test_round_trip_ground(self):
        cam = make_camera()
        pts = jnp.asarray([[384.0, 400.0], [100.0, 300.0], [600.0, 500.0]])
        world = image_to_world(cam, pts, 0.0)
        back = world_to_image(cam, world)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   atol=0.35)

    def test_round_trip_with_distortion(self):
        cam = make_camera(kappa1=2e-4)
        pts = jnp.asarray([[300.0, 350.0], [450.0, 420.0]])
        world = image_to_world(cam, pts, 0.0)
        back = world_to_image(cam, world)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=0.6)

    def test_world_round_trip(self):
        cam = make_camera()
        w = jnp.asarray([[500.0, -2000.0, 0.0], [-1500.0, -4000.0, 0.0]])
        img = world_to_image(cam, w)
        w2 = image_to_world(cam, img, 0.0)
        # f32 round-trip at mm scale: a few mm of error is irrelevant
        # against the evaluator's 1000 mm match radius
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=5.0)

    def test_height_changes_projection(self):
        cam = make_camera()
        head = world_to_image(cam, jnp.asarray([0.0, -3000.0, 1700.0]))
        feet = world_to_image(cam, jnp.asarray([0.0, -3000.0, 0.0]))
        assert float(jnp.linalg.norm(head - feet)) > 5.0

    def test_vmap_over_cameras(self):
        cams = stack_cameras([make_camera(), make_camera(rz=0.5, tx=5000.0)])
        pt = jnp.asarray([400.0, 300.0])
        out = jax.vmap(lambda c: image_to_world(c, pt, 0.0))(cams)
        assert out.shape == (2, 3)
        assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))

    def test_camera_position_invariant(self):
        # the camera centre c satisfies R c + t = 0 (ref cameraModel.cpp:56-58)
        cam = make_camera()
        pos = np.asarray(camera_position(cam), np.float64)
        r = np.asarray([[cam.r11, cam.r12, cam.r13],
                        [cam.r21, cam.r22, cam.r23],
                        [cam.r31, cam.r32, cam.r33]], np.float64)
        t = np.asarray([cam.tx, cam.ty, cam.tz], np.float64)
        np.testing.assert_allclose(r @ pos + t, 0.0, atol=1e-2)

    def test_visibility(self):
        cam = make_camera()
        centre_world = image_to_world(cam, jnp.asarray([384.0, 288.0]), 0.0)
        assert bool(check_visibility(cam, centre_world))
        far = centre_world + jnp.asarray([1e6, 1e6, 0.0])
        assert not bool(check_visibility(cam, far))


class TestTriangulation:
    def test_two_lines_meet(self):
        # two lines through the same point
        p = jnp.asarray([1.0, 2.0, 3.0])
        d1 = jnp.asarray([1.0, 0.0, 0.2])
        d2 = jnp.asarray([0.0, 1.0, -0.3])
        mid, gap = triangulate_two_lines(p + d1, p - d1, p + d2, p - d2)
        np.testing.assert_allclose(np.asarray(mid), np.asarray(p), atol=1e-4)
        assert float(gap) < 1e-4

    def test_two_lines_skew(self):
        a1, a2 = jnp.asarray([0., 0., 0.]), jnp.asarray([1., 0., 0.])
        b1, b2 = jnp.asarray([0., 1., 1.]), jnp.asarray([0., -1., 1.])
        mid, gap = triangulate_two_lines(a1, a2, b1, b2)
        np.testing.assert_allclose(float(gap), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mid), [0.0, 0.0, 0.5], atol=1e-5)

    def test_host_mirror_matches_device(self, rng):
        from mcmtt_opticalflow_tpu.geometry.tsai_np import (
            triangulate_two_lines_np)
        a1 = rng.rand(5, 3).astype(np.float32) * 100
        a2 = rng.rand(5, 3).astype(np.float32) * 100
        b1 = rng.rand(5, 3).astype(np.float32) * 100
        b2 = rng.rand(5, 3).astype(np.float32) * 100
        mid_d, gap_d = triangulate_two_lines(
            jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(b1),
            jnp.asarray(b2))
        mid_h, gap_h = triangulate_two_lines_np(a1, a2, b1, b2)
        np.testing.assert_allclose(np.asarray(mid_d), mid_h, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gap_d), gap_h, rtol=1e-3,
                                   atol=1e-3)

    def test_nview_point(self):
        target = jnp.asarray([100.0, 200.0, 1700.0])
        origins = jnp.asarray([[5000.0, 0.0, 3000.0],
                               [-4000.0, 2000.0, 3500.0],
                               [0.0, -6000.0, 2800.0]])
        tops = origins
        bottoms = origins + 2.0 * (target - origins)   # lines through target
        mask = jnp.ones(3, bool)
        pt, dist, num = nview_point_reconstruction(tops, bottoms, mask)
        # sub-mm f32 roundoff at mm scale is expected and irrelevant downstream
        np.testing.assert_allclose(np.asarray(pt), np.asarray(target), atol=1.0)
        assert float(dist) < 1.0
        assert int(num) == 3

    def test_nview_point_masked_fallback(self):
        tops = jnp.zeros((3, 3))
        bottoms = jnp.asarray([[1.0, 2.0, 0.0]] * 3)
        mask = jnp.asarray([True, False, False])
        pt, dist, num = nview_point_reconstruction(tops, bottoms, mask)
        np.testing.assert_allclose(np.asarray(pt), [1.0, 2.0, 0.0], atol=1e-6)
        assert int(num) == 1

    def test_nview_ground(self):
        pts = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [1.0, 3.0, 0.0]])
        mask = jnp.ones(3, bool)
        pt, dist, num = nview_ground_reconstruction(pts, mask)
        np.testing.assert_allclose(np.asarray(pt), [1.0, 1.0, 0.0], atol=1e-6)
        assert float(dist) > 0.0

    def test_segments(self):
        a1 = jnp.asarray([0.0, 0.0]); a2 = jnp.asarray([2.0, 2.0])
        b1 = jnp.asarray([0.0, 2.0]); b2 = jnp.asarray([2.0, 0.0])
        assert bool(segments_intersect(a1, a2, b1, b2))
        c1 = jnp.asarray([3.0, 3.0]); c2 = jnp.asarray([4.0, 4.0])
        assert not bool(segments_intersect(a1, a2, c1, c2))


class TestSideMaps:
    def test_sensitivity_monotone_with_distance(self):
        cam = make_camera()
        sens = projection_sensitivity_map(cam, 768, 576, stride=8)
        assert sens.shape == (72, 96)
        assert np.isfinite(np.asarray(sens)).all()
        assert float(sens.min()) > 0.0

    def test_boundary_map_zero_at_edges(self):
        cam = make_camera()
        dmap = distance_from_boundary_map(cam, 768, 576, stride=8)
        assert float(dmap[0, 0]) == 0.0
        assert float(dmap[36, 48]) > float(dmap[0, 48])

    def test_sample(self):
        cam = make_camera()
        dmap = distance_from_boundary_map(cam, 768, 576, stride=8)
        v = sample_map(dmap, jnp.asarray([[384.0, 288.0], [0.0, 0.0]]),
                       768, 576, stride=8)
        assert v.shape == (2,)
        assert float(v[0]) > float(v[1])
