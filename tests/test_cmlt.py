"""CMLT correctness: chart-swap machinery + convergence to PT.

Reference analog: src/renderers/cmlt.{h,cu} has no unit tests in the
reference; as with MLT, the strongest check is convergence of the MCMC
estimator to the validated PT image (any acceptance/transition-density or
chart-swap inversion error shows up as a systematic image shift). The
swap-specific checks exercise the +-1 proposal's reversibility bookkeeping.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.integrators import cmlt as cm
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


def test_dims():
    # K=6: light = point(3) + emit dir(2) + 3 scatters(y1..y3), eye = 2 + 5 scatters
    assert cm._dims_l(6) == 5 + 3 * 3
    assert cm._dims_e(6) == 2 + 3 * 5


def test_seed_state_shapes_and_brightness():
    scene = cornell_box()
    from fermat_tpu.core.camera import CameraSampler  # noqa: F401
    from fermat_tpu.scene.view import SceneView

    view = SceneView.build(scene, cornell_camera())
    opts = cm.CMLTOptions(max_path_length=4, n_seed_rounds=1)
    n = 64
    st = cm.init_state(view, opts, RES, RES, n, seed=0)
    assert st.u_l.shape == (n, cm._dims_l(4))
    assert st.u_e.shape == (n, cm._dims_e(4))
    assert float(st.brightness) > 0.0
    # charts are valid: t >= 2, s >= 0, s + t <= K + 1
    s = np.asarray(st.s)
    t = np.asarray(st.t)
    assert (t >= 2).all() and (s >= 0).all() and (s + t <= 5).all()
    # seeded luminances are non-negative and some lanes found light
    lum = np.asarray(st.lum)
    assert (lum >= 0).all() and (lum > 0).any()


def test_step_runs_and_splats():
    scene = cornell_box()
    from fermat_tpu.scene.view import SceneView

    view = SceneView.build(scene, cornell_camera())
    opts = cm.CMLTOptions(max_path_length=4, n_seed_rounds=1, swap_frequency=2)
    n = 64
    st = cm.init_state(view, opts, RES, RES, n, seed=1)
    total = np.zeros((RES * RES, 3), np.float32)
    for _ in range(4):  # exercises both mutation and swap branches
        st, splat, rays = cm.step(view, opts, RES, RES, st)
        total += np.asarray(splat)
    assert np.isfinite(total).all()
    assert total.sum() > 0.0
    s = np.asarray(st.s)
    t = np.asarray(st.t)
    assert (t >= 2).all() and (s >= 0).all() and (s + t <= 5).all()


class TestCMLT:
    def test_image_finite_nonzero(self):
        img = _render("cmlt", 3, cornell_box(), max_path_length=4,
                      n_seed_rounds=1)
        assert np.isfinite(img).all()
        assert img.max() > 0.01

    @pytest.mark.slow
    def test_cmlt_matches_pt(self):
        """VERDICT.md #4 done-criterion: cmlt converges to PT on glossy
        Cornell within the MLT test's tolerances."""
        scene = cornell_box(light_scale=0.5, light_size=2.0, glossy_boxes=True)
        img_pt = _render("pt", 192, scene, max_path_length=4, rr=False)
        img_cm = _render("cmlt", 512, scene, max_path_length=4)
        m_pt = img_pt.mean((0, 1))
        m_cm = img_cm.mean((0, 1))
        rel = np.abs(m_pt - m_cm) / np.maximum(m_pt, 1e-3)
        assert rel.max() < 0.08, (m_pt, m_cm)

        def pool(x):
            return x.reshape(4, RES // 4, 4, RES // 4, 3).mean((1, 3))

        a, b = pool(img_pt), pool(img_cm)
        relp = np.abs(a - b) / np.maximum(np.maximum(a, b), 0.05)
        # the channel-mean bound above is the bias detector; this pooled
        # bound tracks MCMC spatial variance (measured trajectory: 0.197 @
        # 384 frozen-chart passes, 0.156 @ 384 with chart-jump large
        # steps, 0.152 @ 512 — the floor includes the PT reference's own
        # 128-pass noise)
        assert relp.mean() < 0.17, (relp.mean(), relp.max())


@pytest.mark.slow
def test_brightness_estimator_bias_at_defaults():
    """VERDICT r2 #7: the MH normalization b multiplies the whole image, so
    its error is a uniform image bias. Regression-pin the shipped default
    (n_seed_rounds=8) against a 64-round reference: measured mean bias
    -0.3% over 4 seeds (per-seed spread ~±2.3%); the old 2-round default
    sat 15% low (cmlt.py:84-90)."""
    scene = cornell_box(light_scale=0.5, light_size=2.0, glossy_boxes=True)
    from fermat_tpu.scene.view import SceneView

    view = SceneView.build(scene, cornell_camera())
    n = RES * RES
    ref = float(cm.init_state(
        view, cm.CMLTOptions(max_path_length=4, n_seed_rounds=64),
        RES, RES, n, seed=0).brightness)
    bs = [
        float(cm.init_state(
            view, cm.CMLTOptions(max_path_length=4), RES, RES, n,
            seed=sd).brightness)
        for sd in (0, 1, 2, 3)
    ]
    mean_b = float(np.mean(bs))
    assert abs(mean_b / ref - 1.0) < 0.02, (bs, ref)
    for b in bs:
        assert abs(b / ref - 1.0) < 0.06, (b, ref)
