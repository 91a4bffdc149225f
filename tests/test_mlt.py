"""MLT correctness: perturbation kernels + convergence to PT.

Reference analog: the MLT renderer has no unit tests in the reference; the
strongest check is the same one BPT uses — the MCMC estimator must converge
to the (validated) PT image (mlt_core.h's whole machinery feeds one
expected-value splat accumulator, so any acceptance/transition-density error
shows up as a systematic image shift).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.core.math import Vec3, dot, normalize
from fermat_tpu.integrators import mlt as mlt_mod
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


def test_bounded_exp_map_range():
    u = jnp.linspace(0.001, 0.999, 257)
    r = mlt_mod.bounded_exp_map(u, 1e-4, 0.1)
    m = np.abs(np.asarray(r))
    assert (m >= 0.99e-4).all() and (m <= 0.1 * 1.001).all()


def test_exp_perturbation_small_angle():
    n = 128
    d = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    z0 = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    z1 = jax.random.uniform(jax.random.PRNGKey(1), (n,))
    out = mlt_mod.exp_spherical_perturbation(d, z0, z1, 0.1)
    cosang = np.asarray(dot(out, d))
    # angles bounded by the kernel radius
    assert (cosang >= np.cos(0.11)).all()
    ln = np.asarray(out.x**2 + out.y**2 + out.z**2)
    np.testing.assert_allclose(ln, 1.0, atol=1e-5)


def test_h_perturbation_identity_mode():
    """With identical old/new geometry and a tiny radius, the H-perturbed
    direction stays close to the original and preserves the mode."""
    n = 256
    key = jax.random.PRNGKey(3)
    win = normalize(Vec3(
        jax.random.normal(key, (n,)) * 0.3,
        jax.random.normal(jax.random.PRNGKey(4), (n,)) * 0.3,
        jnp.ones(n),
    ))
    nrm = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    wout = normalize(Vec3(
        jax.random.normal(jax.random.PRNGKey(5), (n,)) * 0.3,
        jax.random.normal(jax.random.PRNGKey(6), (n,)) * 0.3,
        jnp.ones(n),
    ))
    eta = jnp.full((n,), 1.0 / 1.5)
    z0 = jax.random.uniform(jax.random.PRNGKey(7), (n,))
    z1 = jax.random.uniform(jax.random.PRNGKey(8), (n,))
    out = mlt_mod.h_perturbation(win, wout, nrm, eta, win, nrm, eta, z0, z1, 0.02)
    c = np.asarray(dot(out, wout))
    assert (c > 0.98).all()
    # densities stay finite and positive
    dens = np.asarray(mlt_mod.h_perturbation_density(win, wout, nrm, eta))
    assert (dens > 0).all() and np.isfinite(dens).all()


class TestMLT:
    def test_image_finite_nonzero(self):
        img = _render("mlt", 3, cornell_box(), max_path_length=4, steps_per_pass=4)
        assert np.isfinite(img).all()
        assert img.max() > 0.01

    @pytest.mark.slow
    def test_mlt_matches_pt(self):
        """The done-criterion from VERDICT.md #3: mlt converges to PT on
        glossy Cornell within the BPT test's tolerances."""
        scene = cornell_box(light_scale=0.5, light_size=2.0, glossy_boxes=True)
        img_pt = _render("pt", 192, scene, max_path_length=4, rr=False)
        img_mlt = _render("mlt", 64, scene, max_path_length=4, steps_per_pass=8)
        m_pt = img_pt.mean((0, 1))
        m_mlt = img_mlt.mean((0, 1))
        rel = np.abs(m_pt - m_mlt) / np.maximum(m_pt, 1e-3)
        assert rel.max() < 0.08, (m_pt, m_mlt)

        def pool(x):
            return x.reshape(4, RES // 4, 4, RES // 4, 3).mean((1, 3))

        a, b = pool(img_pt), pool(img_mlt)
        relp = np.abs(a - b) / np.maximum(np.maximum(a, b), 0.05)
        assert relp.mean() < 0.15, (relp.mean(), relp.max())


class TestSTSwaps:
    """ST-swap mutations (VERDICT r2 missing #1; reference mlt_kernels.h
    swap machinery): relabeling the (s,t) split on the same geometric path
    must leave the estimator's target invariant."""

    def test_swap_on_off_agree(self):
        """Same-seed renders with swaps every 2nd step vs disabled must
        agree in the channel means (any value-rescale or measure error in
        the swap would shift path-class contributions systematically)."""
        scene = cornell_box(light_scale=0.5, light_size=2.0,
                            glossy_boxes=True)
        img_off = _render("mlt", 16, scene, max_path_length=4,
                          steps_per_pass=8, st_swap_frequency=0)
        img_on = _render("mlt", 16, scene, max_path_length=4,
                         steps_per_pass=8, st_swap_frequency=2)
        m_off = img_off.mean((0, 1))
        m_on = img_on.mean((0, 1))
        rel = np.abs(m_off - m_on) / np.maximum(m_off, 1e-3)
        assert np.isfinite(img_on).all()
        assert rel.max() < 0.10, (m_off, m_on)

    @pytest.mark.slow
    def test_swaps_converge_to_pt(self):
        """With aggressive swapping the chain still converges to PT."""
        scene = cornell_box(light_scale=0.5, light_size=2.0,
                            glossy_boxes=True)
        img_pt = _render("pt", 192, scene, max_path_length=4, rr=False)
        img_mlt = _render("mlt", 64, scene, max_path_length=4,
                          steps_per_pass=8, st_swap_frequency=2)
        m_pt = img_pt.mean((0, 1))
        m_mlt = img_mlt.mean((0, 1))
        rel = np.abs(m_pt - m_mlt) / np.maximum(m_pt, 1e-3)
        assert rel.max() < 0.08, (m_pt, m_mlt)
