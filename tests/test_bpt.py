"""BPT correctness: must converge to the same image as the (validated) PT.

This is the strongest possible test of the bidirectional machinery — every
mis-weighted strategy error shows up as a systematic image difference.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.render.context import RenderingContext
from fermat_tpu.scene.procedural import cornell_box, cornell_camera

# compile-heavy integrator tier — excluded from the default (fast) run
pytestmark = pytest.mark.heavy

RES = 32


def _render(renderer, passes, scene, **opts):
    ctx = RenderingContext.create(
        scene, cornell_camera(), RES, RES, renderer=renderer, **opts
    )
    return np.asarray(ctx.render(passes).composited)


class TestBPT:
    def test_image_finite_nonzero(self):
        img = _render("bpt", 4, cornell_box(), max_path_length=4)
        assert np.isfinite(img).all()
        assert img.max() > 0.05

    @pytest.mark.slow
    def test_bpt_matches_pt(self):
        scene = cornell_box(light_scale=0.5, light_size=2.0)
        img_pt = _render("pt", 192, scene, max_path_length=4, rr=False)
        img_bpt = _render("bpt", 96, scene, max_path_length=4)
        m_pt = img_pt.mean((0, 1))
        m_bpt = img_bpt.mean((0, 1))
        rel = np.abs(m_pt - m_bpt) / np.maximum(m_pt, 1e-3)
        assert rel.max() < 0.05, (m_pt, m_bpt)

        def pool(x):
            return x.reshape(4, RES // 4, 4, RES // 4, 3).mean((1, 3))

        a, b = pool(img_pt), pool(img_bpt)
        relp = np.abs(a - b) / np.maximum(np.maximum(a, b), 0.05)
        assert relp.mean() < 0.12, (relp.mean(), relp.max())

    def test_light_tracing_contributes(self):
        scene = cornell_box()
        ctx = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="bpt",
            max_path_length=4, light_tracing=True,
        )
        from fermat_tpu.integrators.bpt import BPTOptions, render_pass

        rad, splat, rays = render_pass(
            ctx.view, BPTOptions(max_path_length=4), RES, RES, jnp.uint32(0)
        )
        assert float(jnp.sum(splat)) > 0.0
        assert float(rays) > 0
