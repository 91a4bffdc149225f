"""RPT correctness: reuse machinery + convergence to PT.

Reference analog: rpt.cu has no unit tests; the strongest check is the same
one BPT/MLT use — convergence to the validated PT image. The pairwise-MIS
weights (1 / sum_i p(i,k)) make any pdf error a systematic shift.
"""
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


class TestRPT:
    def test_image_finite_nonzero(self):
        img = _render("rpt", 3, cornell_box(), max_path_length=4)
        assert np.isfinite(img).all()
        assert img.max() > 0.05
        assert (img > 0).mean() > 0.5

    @pytest.mark.slow
    def test_rpt_matches_pt(self):
        scene = cornell_box(light_scale=0.5, light_size=2.0)
        img_pt = _render("pt", 160, scene, max_path_length=4, rr=False)
        img_rpt = _render("rpt", 96, scene, max_path_length=4, rr=False)
        m_pt = img_pt.mean((0, 1))
        m_rpt = img_rpt.mean((0, 1))
        rel = np.abs(m_pt - m_rpt) / np.maximum(m_pt, 1e-3)
        assert rel.max() < 0.06, (m_pt, m_rpt)

        def pool(x):
            return x.reshape(4, RES // 4, 4, RES // 4, 3).mean((1, 3))

        a, b = pool(img_pt), pool(img_rpt)
        relp = np.abs(a - b) / np.maximum(np.maximum(a, b), 0.05)
        assert relp.mean() < 0.12, (relp.mean(), relp.max())
