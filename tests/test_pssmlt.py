"""PSSMLT tests: ergodicity + convergence to the PT reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.render.context import RenderingContext
from fermat_tpu.scene.procedural import cornell_box, cornell_camera

RES = 32


class TestPssmlt:
    def test_image_finite_nonzero(self):
        ctx = RenderingContext.create(
            cornell_box(), cornell_camera(), RES, RES, renderer="pssmlt",
            max_path_length=4,
        )
        fb = ctx.render(8)
        img = np.asarray(fb.composited)
        assert np.isfinite(img).all()
        assert img.max() > 0.01
        # chains moved (some acceptance happened): state luminance positive
        assert float(jnp.mean(ctx.renderer_state.i_lum)) > 0

    def test_brightness_preserved(self):
        """The MH estimator preserves mean image brightness ~= b."""
        ctx = RenderingContext.create(
            cornell_box(light_size=2.0), cornell_camera(), RES, RES,
            renderer="pssmlt", max_path_length=3,
        )
        fb = ctx.render(48)
        img_mean = float(np.asarray(fb.composited).mean())
        # brightness b is the luminance mean; compare within MC tolerance
        b = float(ctx.renderer_state.brightness)
        assert abs(img_mean - b) / max(b, 1e-6) < 0.35, (img_mean, b)

    @pytest.mark.slow
    def test_matches_pt(self):
        scene = cornell_box(light_scale=0.5, light_size=2.0)
        ctx_pt = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="pt",
            max_path_length=4, rr=False,
        )
        img_pt = np.asarray(ctx_pt.render_batch(128).composited)
        ctx_ml = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="pssmlt",
            max_path_length=4,
        )
        img_ml = np.asarray(ctx_ml.render(256).composited)
        m_pt = img_pt.mean((0, 1))
        m_ml = img_ml.mean((0, 1))
        rel = np.abs(m_pt - m_ml) / np.maximum(m_pt, 1e-3)
        assert rel.max() < 0.15, (m_pt, m_ml)

        def pool(x):
            return x.reshape(4, RES // 4, 4, RES // 4, 3).mean((1, 3))

        a, b = pool(img_pt), pool(img_ml)
        relp = np.abs(a - b) / np.maximum(np.maximum(a, b), 0.05)
        assert relp.mean() < 0.25, (relp.mean(), relp.max())
