"""Textured emitters + VPL presampling (mesh-lights tier 2, part B).

Reference analog: the texture-integrated emissive CDF of
src/mesh_lights.cu:158-285 and the VPL presample/resample of :296-380.
The VERDICT done-criterion: a textured-emitter scene samples
proportionally to the texture integral.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.render.context import RenderingContext
from fermat_tpu.scene.mesh_lights import (
    build_vpls,
    textured_tri_energies,
)
from fermat_tpu.scene.procedural import cornell_box, cornell_camera
from fermat_tpu.utils.image import write_tga

# compile-heavy integrator tier — excluded from the default (fast) run
pytestmark = pytest.mark.heavy

RES = 32


def _halfdark(w=32, h=32):
    """Left half black, right half white."""
    img = np.zeros((h, w, 3), np.float32)
    img[:, w // 2 :] = 1.0
    return img


def test_textured_tri_energies_scale_by_texture_mean():
    mesh = cornell_box(light_size=2.0).device_view()
    base = textured_tri_energies(mesh, [])
    # point every emissive material at a half-dark texture
    emap = np.asarray(mesh.materials.emissive_map).copy()
    em_lum = np.asarray(mesh.materials.emissive.x)
    emap[em_lum > 0] = 0
    mats = mesh.materials._replace(emissive_map=jnp.asarray(emap))
    mesh2 = mesh._replace(materials=mats)
    tex = textured_tri_energies(mesh2, [_halfdark()], n_samples=512)
    em = base > 0
    ratio = tex[em] / base[em]
    # texture mean over the QUAD is 0.5 -> total energy halves; the quad's
    # two triangles individually see ~0.75 (lower-right tri, mostly u>0.5)
    # and ~0.25 of their untextured energy
    assert abs(ratio.sum() / em.sum() - 0.5) < 0.1, ratio
    assert abs(ratio[0] - 0.75) < 0.15 and abs(ratio[1] - 0.25) < 0.15, ratio


def test_vpls_concentrate_on_bright_texels():
    mesh = cornell_box(light_size=2.0).device_view()
    emap = np.asarray(mesh.materials.emissive_map).copy()
    em_lum = np.asarray(mesh.materials.emissive.x)
    emap[em_lum > 0] = 0
    mats = mesh.materials._replace(emissive_map=jnp.asarray(emap))
    mesh2 = mesh._replace(materials=mats)
    v = build_vpls(mesh2, n_vpls=512, images=[_halfdark()])
    assert v is not None
    rows = np.asarray(v.rows)
    le = rows[:, 6:9]
    # resampling is emission-proportional: essentially all VPLs must land
    # on the bright half (Le > 0)
    bright = (le.sum(1) > 1e-6).mean()
    assert bright > 0.95, bright
    # uniform pick: every stored pdf is positive and finite
    assert (rows[:, 9] > 0).all() and np.isfinite(rows[:, 9]).all()


def test_cdf_weights_shift_sampling():
    """MeshLightsView.build(weights) samples triangles ~ weights."""
    from fermat_tpu.scene.lights import MeshLightsView

    mesh = cornell_box(light_size=2.0).device_view()
    base = textured_tri_energies(mesh, [])
    em = np.nonzero(base > 0)[0]
    assert em.size >= 2
    w = base.copy()
    w[em[0]] *= 3.0  # boost one light triangle 3x
    lv = MeshLightsView.build(mesh, weights=w)
    n = 1 << 14
    r = np.random.default_rng(0)
    u = [jnp.asarray(r.random(n), jnp.float32) for _ in range(3)]
    _pos, _n, _le, _pdf, tri = lv.sample(mesh, *u)
    tri = np.asarray(tri)
    counts = np.array([(tri == t).sum() for t in em], np.float64)
    expect = w[em] / w[em].sum()
    got = counts / counts.sum()
    np.testing.assert_allclose(got, expect, atol=0.02)


def test_textured_emitter_end_to_end(tmp_path):
    """A file-textured emitter renders with texture-modulated radiance and
    texture-weighted NEE — image finite, and the dark-texel half of the
    light contributes ~nothing."""
    scene = cornell_box(light_size=2.0)
    tga = os.path.join(tmp_path, "halfdark.tga")
    write_tga(tga, _halfdark(64, 64))
    for m in scene.materials:
        if max(m.emissive) > 0:
            m.emissive_map_name = "halfdark.tga"
    ctx = RenderingContext.create(
        scene, cornell_camera(), RES, RES, renderer="pt",
        texture_dir=str(tmp_path), max_path_length=3,
    )
    img = np.asarray(ctx.render(8).composited)
    assert np.isfinite(img).all()
    assert img.max() > 0.01
    # untextured reference is ~2x brighter (texture mean = 0.5)
    ctx2 = RenderingContext.create(
        cornell_box(light_size=2.0), cornell_camera(), RES, RES,
        renderer="pt", max_path_length=3,
    )
    img2 = np.asarray(ctx2.render(8).composited)
    ratio = img.mean() / max(img2.mean(), 1e-9)
    assert 0.3 < ratio < 0.7, ratio


class TestVplNee:
    def test_pt_vpl_mode_runs(self):
        ctx = RenderingContext.create(
            cornell_box(light_size=2.0), cornell_camera(), RES, RES,
            renderer="pt", max_path_length=3, nee="vpl",
        )
        img = np.asarray(ctx.render(4).composited)
        assert np.isfinite(img).all()
        assert img.max() > 0.05

    @pytest.mark.slow
    def test_pt_vpl_matches_mesh_nee(self):
        scene = cornell_box(light_scale=0.5, light_size=2.0)
        ctx_m = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="pt",
            max_path_length=4, rr=False,
        )
        img_m = np.asarray(ctx_m.render_batch(128).composited)
        ctx_v = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="pt",
            max_path_length=4, rr=False, nee="vpl",
        )
        img_v = np.asarray(ctx_v.render_batch(128).composited)
        m_m = img_m.mean((0, 1))
        m_v = img_v.mean((0, 1))
        rel = np.abs(m_m - m_v) / np.maximum(m_m, 1e-3)
        assert rel.max() < 0.06, (m_m, m_v)
