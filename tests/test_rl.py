"""Clustered-RL direct lighting tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.render.context import RenderingContext
from fermat_tpu.scene.procedural import cornell_box, cornell_camera

# compile-heavy integrator tier — excluded from the default (fast) run
pytestmark = pytest.mark.heavy

RES = 32


class TestClusters:
    def test_partition_covers_all_emissive(self):
        from fermat_tpu.integrators.rl import build_clusters

        mesh = cornell_box(light_size=2.0).device_view()
        cl = build_clusters(mesh, n_clusters=8)
        tc = np.asarray(cl.tri_cluster)
        em = np.asarray(mesh.materials.emissive.x)[np.asarray(mesh.material_id)] > 0
        assert (tc[em] >= 0).all()
        assert (tc[~em] == -1).all()
        # per-cluster pdfs integrate to ~1 over each cluster's area
        pdf = np.asarray(cl.tri_pdf_area)
        areas = np.asarray(mesh.triangle_areas())
        order = np.asarray(cl.sorted_tris)
        offs = np.asarray(cl.cluster_offset)
        for c in range(8):
            tris = order[offs[c] : offs[c + 1]]
            if tris.size:
                assert abs(float((pdf[tris] * areas[tris]).sum()) - 1.0) < 1e-4


class TestPtrl:
    def test_image_finite_nonzero_and_learns(self):
        ctx = RenderingContext.create(
            cornell_box(), cornell_camera(), RES, RES, renderer="ptrl",
            max_path_length=4, n_clusters=4,
        )
        fb = ctx.render(6)
        img = np.asarray(fb.composited)
        assert np.isfinite(img).all()
        assert img.max() > 0.05
        # Q table moved away from its uniform init where cells were visited
        q = np.asarray(ctx.renderer_state.qstate.q)
        assert (np.abs(q - 1.0) > 1e-4).any()

    @pytest.mark.slow
    def test_matches_pt(self):
        scene = cornell_box(light_scale=0.5, light_size=2.0)
        ctx_pt = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="pt",
            max_path_length=4, rr=False,
        )
        img_pt = np.asarray(ctx_pt.render_batch(160).composited)
        ctx_rl = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="ptrl",
            max_path_length=4, rr=False, n_clusters=8,
        )
        img_rl = np.asarray(ctx_rl.render(160).composited)
        m_pt = img_pt.mean((0, 1))
        m_rl = img_rl.mean((0, 1))
        rel = np.abs(m_pt - m_rl) / np.maximum(m_pt, 1e-3)
        assert rel.max() < 0.06, (m_pt, m_rl)

        def pool(x):
            return x.reshape(4, RES // 4, 4, RES // 4, 3).mean((1, 3))

        a, b = pool(img_pt), pool(img_rl)
        relp = np.abs(a - b) / np.maximum(np.maximum(a, b), 0.05)
        assert relp.mean() < 0.10, (relp.mean(), relp.max())
