"""Analytic disk/rect lights: exact sample/map/pdf forms + NEE parity with
the tessellated-emissive-mesh path.

Reference analog: lights.h:175-249 (DiskLight sample_impl/map_impl with
pdf = 1/(pi r^2); kRectangle is enum-declared at lights.h:51). The
tessellated path (scene/analytic_lights.add_*_light) remains the default
loader behavior; AreaLightsView adds the reference's analytic forms, and
this test pins that both estimators integrate to the same direct lighting.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fermat_tpu.core.camera import Camera
from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.scene.analytic_lights import (
    AreaLightsView,
    add_disk_light,
    add_rect_light,
)
from fermat_tpu.scene.procedural import floor_quad
from fermat_tpu.scene.view import SceneView

RES = 24


def _floor_cam():
    return Camera.create(eye=(0.0, 2.5, 4.0), aim=(0.0, 0.0, 0.0))


def _render_mean(view, passes=6, **opt_kw):
    opts = PTOptions(max_path_length=2, rr=False, **opt_kw)
    acc = np.zeros(3)
    for i in range(passes):
        out = render_pass(view, opts, RES, RES, jnp.uint32(i))
        acc += np.asarray(out.composited.stack()).mean(0)
    return acc / passes


class TestAnalyticForms:
    def test_disk_pdf_and_support(self):
        v = AreaLightsView.build([dict(
            kind="disk", pos=(0, 2, 0), normal=(0, -1, 0),
            color=(5, 5, 5), radius=0.5)])
        r = np.random.default_rng(0)
        u0 = jnp.asarray(r.random(4096, np.float32))
        u1 = jnp.asarray(r.random(4096, np.float32))
        pos, n, le, pdf = v.sample(0, u0, u1)
        # pdf == 1/(pi r^2) exactly (lights.h:229)
        np.testing.assert_allclose(np.asarray(pdf), 1.0 / (np.pi * 0.25),
                                   rtol=1e-6)
        rad = np.sqrt(np.asarray(pos.x) ** 2 + np.asarray(pos.z) ** 2)
        assert rad.max() <= 0.5 + 1e-6
        np.testing.assert_allclose(np.asarray(pos.y), 2.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(n.y), -1.0, atol=1e-6)
        # concentric warp is area-uniform: mean radius of uniform disk = 2r/3
        assert abs(rad.mean() - 2.0 * 0.5 / 3.0) < 0.01

    def test_rect_pdf_and_support(self):
        v = AreaLightsView.build([dict(
            kind="rect", pos=(1, 3, -1), normal=(0, -1, 0),
            color=(2, 3, 4), u_extent=0.8, v_extent=0.4)])
        r = np.random.default_rng(1)
        u0 = jnp.asarray(r.random(2048, np.float32))
        u1 = jnp.asarray(r.random(2048, np.float32))
        pos, _n, le, pdf = v.sample(0, u0, u1)
        np.testing.assert_allclose(np.asarray(pdf),
                                   1.0 / (4.0 * 0.8 * 0.4), rtol=1e-6)
        assert np.asarray(le.z)[0] == 4.0
        # support check in the light's own (u, v) frame
        dp = np.stack([np.asarray(pos.x) - 1.0, np.asarray(pos.y) - 3.0,
                       np.asarray(pos.z) + 1.0], -1)
        uvec = np.array([float(v.ux[0]), float(v.uy[0]), float(v.uz[0])])
        vvec = np.array([float(v.vx[0]), float(v.vy[0]), float(v.vz[0])])
        cu = dp @ uvec
        cv = dp @ vvec
        assert np.abs(cu).max() <= 0.8 + 1e-5 and np.abs(cu).max() > 0.7
        assert np.abs(cv).max() <= 0.4 + 1e-5 and np.abs(cv).max() > 0.35

    def test_map_matches_sample(self):
        v = AreaLightsView.build([dict(
            kind="disk", pos=(0, 1, 0), normal=(0, -1, 0),
            color=(1, 1, 1), radius=0.3)])
        u0 = jnp.asarray([0.3], jnp.float32)
        u1 = jnp.asarray([0.7], jnp.float32)
        s = v.sample(0, u0, u1)
        m = v.map(0, u0, u1)
        for a, b in zip(jax.tree_util.tree_leaves(s),
                        jax.tree_util.tree_leaves(m)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestAnalyticVsTessellated:
    def test_rect_nee_matches_tessellated(self):
        """Direct lighting from the analytic rect == the 2-triangle
        emissive-mesh version of the SAME rect (different estimators, same
        integral)."""
        floor = floor_quad(half=3.0, albedo=(0.7, 0.7, 0.7))
        ldef = dict(kind="rect", pos=(0.0, 2.0, 0.0), normal=(0.0, -1.0, 0.0),
                    color=(6.0, 6.0, 6.0), u_extent=0.7, v_extent=0.7)
        v_analytic = SceneView.build(floor, _floor_cam(),
                                     area_light_defs=[ldef])
        tess = add_rect_light(floor_quad(half=3.0, albedo=(0.7, 0.7, 0.7)),
                              (0.0, 2.0, 0.0), (0.0, -1.0, 0.0),
                              0.7, 0.7, (6.0, 6.0, 6.0))
        v_tess = SceneView.build(tess, _floor_cam())
        m_a = _render_mean(v_analytic, visible_lights=False)
        m_t = _render_mean(v_tess, visible_lights=False)
        np.testing.assert_allclose(m_a, m_t, rtol=0.05)

    def test_disk_nee_matches_tessellated(self):
        floor = floor_quad(half=3.0, albedo=(0.6, 0.6, 0.6))
        ldef = dict(kind="disk", pos=(0.5, 2.0, 0.0), normal=(0.0, -1.0, 0.0),
                    color=(8.0, 8.0, 8.0), radius=0.6)
        v_analytic = SceneView.build(floor, _floor_cam(),
                                     area_light_defs=[ldef])
        tess = add_disk_light(floor_quad(half=3.0, albedo=(0.6, 0.6, 0.6)),
                              (0.5, 2.0, 0.0), (0.0, -1.0, 0.0),
                              0.6, (8.0, 8.0, 8.0), segments=64)
        v_tess = SceneView.build(tess, _floor_cam())
        m_a = _render_mean(v_analytic, visible_lights=False)
        m_t = _render_mean(v_tess, visible_lights=False)
        # 64-segment fan underestimates the disk area by ~0.2%; MC noise
        # dominates the tolerance
        np.testing.assert_allclose(m_a, m_t, rtol=0.06)
