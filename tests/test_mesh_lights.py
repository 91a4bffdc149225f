"""Mesh-lights tier 2: VTL decomposition, light-BVH cuts, adaptation.

Reference analog: MeshVTLStorage (src/mesh_lights.cu:632-891) and the
adaptive clustered-RL cuts (src/clustered_rl_inline.h). The reference has
no unit tests for these; the checks here are the measure-theoretic
invariants any correct build must satisfy (partitions, pdf normalization,
hit->VTL containment) plus RL-over-VTLs convergence to PT.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.integrators.rl import (
    RLState,
    pdf_area_of_vtl,
    sample_vtl,
)
from fermat_tpu.scene.mesh_lights import (
    build_vtls,
    leaf_corners_np,
    locate,
    reclustered,
)
from fermat_tpu.scene.procedural import cornell_box, cornell_camera

# compile-heavy integrator tier — excluded from the default (fast) run
pytestmark = pytest.mark.heavy

RES = 32


def _mesh(light_size=2.0):
    return cornell_box(light_size=light_size).device_view()


def test_locate_inverts_leaf_corners():
    rng = np.random.default_rng(0)
    for d in range(4):
        c = leaf_corners_np(d)
        L = c.shape[0]
        s = rng.random((L, 8))
        t = rng.random((L, 8))
        flip = s + t > 1
        s = np.where(flip, 1 - s, s)
        t = np.where(flip, 1 - t, t)
        pts = (c[:, None, 0] + (c[:, 1] - c[:, 0])[:, None] * s[..., None]
               + (c[:, 2] - c[:, 0])[:, None] * t[..., None])
        u = pts[..., 0].ravel()
        v = pts[..., 1].ravel()
        idx = np.asarray(locate(
            jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32),
            jnp.full(u.shape, d, jnp.int32),
        ))
        assert (idx == np.repeat(np.arange(L), 8)).mean() > 0.99


def test_vtl_build_invariants():
    mesh = _mesh()
    vtls, cut = build_vtls(mesh, target_clusters=8, n_target_vtls=64)
    assert vtls.n_vtls >= 4
    p = np.asarray(vtls.power)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)
    # leaf areas of each emissive tri sum to the tri area
    areas = np.asarray(mesh.triangle_areas())
    tri = np.asarray(vtls.tri)
    a = np.asarray(vtls.area)
    for tt in np.unique(tri):
        assert abs(a[tri == tt].sum() - areas[tt]) < 1e-4 * max(areas[tt], 1.0)
    # cluster offsets partition [0, V)
    offs = np.asarray(vtls.cluster_offset)
    assert offs[0] == 0 and offs[cut.n_clusters] == vtls.n_vtls
    assert (np.diff(offs) >= 0).all()


def test_vtl_sampler_pdf_consistency():
    """Importance-sampling identity: E[1/pdf] over samples equals the total
    emissive area, and the hit->VTL pdf integrates to 1 over that area."""
    mesh = _mesh()
    vtls, _cut = build_vtls(mesh, target_clusters=8, n_target_vtls=64)
    st = RLState.create(16, 8)
    n = 4096
    r = np.random.default_rng(1)
    u = [jnp.asarray(r.random(n), jnp.float32) for _ in range(4)]
    cell = jnp.asarray(r.integers(0, 16, n), jnp.int32)
    _pos, _n, _le, pdf_a, tri, _cl, _slot = sample_vtl(vtls, st, cell, *u)
    pdf_a = np.asarray(pdf_a)
    assert (pdf_a > 0).all() and np.isfinite(pdf_a).all()
    areas = np.asarray(mesh.triangle_areas())
    em_area = areas[np.unique(np.asarray(vtls.tri))].sum()
    est = (1.0 / pdf_a).mean()
    np.testing.assert_allclose(est, em_area, rtol=0.05)

    # reverse direction: uniform points on the emissive tris -> mean pdf
    # times area == 1 (density integrates to one)
    em_tris = np.unique(np.asarray(vtls.tri))
    m = 4096
    tt = jnp.asarray(r.choice(em_tris, m), jnp.int32)
    su = r.random(m)
    sv = r.random(m)
    flip = su + sv > 1
    su = np.where(flip, 1 - su, su)
    sv = np.where(flip, 1 - sv, sv)
    cell2 = jnp.asarray(r.integers(0, 16, m), jnp.int32)
    pdf2 = np.asarray(pdf_area_of_vtl(
        vtls, st, cell2, tt,
        jnp.asarray(su, jnp.float32), jnp.asarray(sv, jnp.float32),
    ))
    assert (pdf2 > 0).all()
    # uniform-over-tris sampling density: areas equal per cornell light
    # halves, so E[pdf] * em_area ~= 1
    np.testing.assert_allclose(pdf2.mean() * em_area, 1.0, rtol=0.08)


def test_sample_pdf_matches_pointwise():
    """The pdf returned by sample_vtl equals pdf_area_of_vtl evaluated at
    the sampled VTL (cluster+conditional factorization consistency)."""
    mesh = _mesh()
    vtls, _cut = build_vtls(mesh, target_clusters=4, n_target_vtls=32)
    st = RLState(q=jnp.asarray(
        np.random.default_rng(3).random((8, 4)).astype(np.float32) + 0.25))
    n = 1024
    r = np.random.default_rng(2)
    u = [jnp.asarray(r.random(n), jnp.float32) for _ in range(4)]
    cell = jnp.asarray(r.integers(0, 8, n), jnp.int32)
    _pos, _n, _le, pdf_a, _tri, cl, slot = sample_vtl(vtls, st, cell, *u)
    # direct recomputation from the slot
    from fermat_tpu.integrators.rl import cluster_probs

    probs = cluster_probs(st, cell, 0.25)
    p_cl = np.take_along_axis(np.asarray(probs), np.asarray(cl)[:, None], 1)[:, 0]
    ref = p_cl * np.asarray(vtls.pdf_area)[np.asarray(slot)]
    np.testing.assert_allclose(np.asarray(pdf_a), ref, rtol=1e-5)


def test_adaptive_cut_remap():
    mesh = _mesh()
    vtls, cut = build_vtls(mesh, target_clusters=8, n_target_vtls=64)
    c = cut.n_clusters
    # strong value imbalance drives a refine+coarsen step
    value = np.ones(c, np.float32) * 0.01
    value[0] = 100.0
    m = cut.adapt(value)
    if m is None:
        pytest.skip("cut not adaptable at this size")
    assert m.shape == (c, c)
    # remap rows are convex combinations (mass-preserving on average)
    np.testing.assert_allclose(m.sum(), c, rtol=0.3)
    v2 = reclustered(vtls, cut)
    offs = np.asarray(v2.cluster_offset)
    assert offs[0] == 0 and offs[cut.n_clusters] == vtls.n_vtls
    assert (np.diff(offs) >= 0).all()
    # pdfs still normalize within each new cluster
    pdf = np.asarray(v2.pdf_area)
    area = np.asarray(v2.area)
    for ci in range(cut.n_clusters):
        a, b = offs[ci], offs[ci + 1]
        if b > a:
            np.testing.assert_allclose(
                (pdf[a:b] * area[a:b]).sum(), 1.0, rtol=1e-4)


class TestPtrlVtl:
    def test_vtl_mode_renders_and_adapts(self):
        from fermat_tpu.render.context import RenderingContext

        ctx = RenderingContext.create(
            cornell_box(light_size=2.0), cornell_camera(), RES, RES,
            renderer="ptrl", max_path_length=3, n_clusters=8,
            sampler="vtl", n_vtls=64, adapt_every=2,
        )
        fb = ctx.render(6)
        img = np.asarray(fb.composited)
        assert np.isfinite(img).all()
        assert img.max() > 0.05

    @pytest.mark.slow
    def test_vtl_matches_pt(self):
        from fermat_tpu.render.context import RenderingContext

        scene = cornell_box(light_scale=0.5, light_size=2.0)
        ctx_pt = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="pt",
            max_path_length=4, rr=False,
        )
        img_pt = np.asarray(ctx_pt.render_batch(160).composited)
        ctx_rl = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="ptrl",
            max_path_length=4, rr=False, n_clusters=8,
            sampler="vtl", n_vtls=64, adapt_every=8,
        )
        img_rl = np.asarray(ctx_rl.render(160).composited)
        m_pt = img_pt.mean((0, 1))
        m_rl = img_rl.mean((0, 1))
        rel = np.abs(m_pt - m_rl) / np.maximum(m_pt, 1e-3)
        assert rel.max() < 0.06, (m_pt, m_rl)
