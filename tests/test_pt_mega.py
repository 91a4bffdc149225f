"""Fused whole-pass megakernel vs the XLA pipeline: image parity.

The megakernel (ops/pallas_pt_mega) re-runs the SAME shade/NEE/RNG code the
XLA path uses, so its images must match the brute-tracer render_pass to
float tolerance on eligible scenes. Runs in Pallas interpret mode on CPU;
tools/tpu_mega_check.py is the hardware canary.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.scene.procedural import cornell_box, cornell_camera
from fermat_tpu.scene.view import SceneView

RES = 24


@pytest.fixture(scope="module")
def view():
    return SceneView.build(cornell_box(glossy_boxes=True), cornell_camera())


def _close(a, b, **kw):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), **kw)


class TestMegaParity:
    def test_eligibility(self, view):
        from fermat_tpu.ops.pallas_pt_mega import mega_eligible

        assert mega_eligible(view, PTOptions())
        assert not mega_eligible(view, PTOptions(nee="vpl"))

    def test_image_matches_brute(self, view):
        base = dict(max_path_length=4, rr=True)
        out_ref = render_pass(view, PTOptions(tracer="brute", **base),
                              RES, RES, jnp.uint32(3))
        out_m = render_pass(view, PTOptions(tracer="mega", **base),
                            RES, RES, jnp.uint32(3))
        # identical RNG + identical math modulo op ordering
        _close(out_m.composited.x, out_ref.composited.x, rtol=2e-4, atol=1e-5)
        _close(out_m.composited.y, out_ref.composited.y, rtol=2e-4, atol=1e-5)
        _close(out_m.diffuse.z, out_ref.diffuse.z, rtol=2e-4, atol=1e-5)
        _close(out_m.specular.x, out_ref.specular.x, rtol=2e-4, atol=1e-5)
        _close(out_m.direct.x, out_ref.direct.x, rtol=2e-4, atol=1e-5)
        assert float(out_m.rays) == float(out_ref.rays)

    def test_gbuffer_matches(self, view):
        base = dict(max_path_length=2, rr=False)
        out_ref = render_pass(view, PTOptions(tracer="brute", **base),
                              RES, RES, jnp.uint32(1))
        out_m = render_pass(view, PTOptions(tracer="mega", **base),
                            RES, RES, jnp.uint32(1))
        _close(out_m.depth, out_ref.depth, rtol=1e-5, atol=1e-6)
        _close(out_m.normal.x, out_ref.normal.x, rtol=1e-4, atol=1e-5)
        _close(out_m.position.y, out_ref.position.y, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(out_m.material), np.asarray(out_ref.material))
        np.testing.assert_array_equal(
            np.asarray(out_m.tri >= 0), np.asarray(out_ref.tri >= 0))
        _close(out_m.diffuse_albedo.x, out_ref.diffuse_albedo.x,
               rtol=1e-5, atol=1e-6)

    def test_e_pwl_matches_table(self):
        """The PWL rebuild must equal the bilinear table lookup exactly."""
        from fermat_tpu.bsdf import ggx
        from fermat_tpu.ops.pallas_pt_mega import _E_KNOTS, _e_pwl_coeffs

        rough = np.array([0.0, 0.12, 0.37, 0.5, 0.83, 1.0], np.float32)
        coef = _e_pwl_coeffs(rough)
        cs = np.linspace(0.0, 1.0, 97).astype(np.float32)
        for mi, r in enumerate(rough):
            ref = np.asarray(ggx.glossy_reflectance(
                jnp.full(cs.shape, r), jnp.asarray(cs)))
            acc = np.full(cs.shape, coef[mi, 0])
            for j in range(_E_KNOTS):
                k = (j + 0.5) / _E_KNOTS
                acc = acc + coef[mi, 1 + j] * np.maximum(cs - k, 0.0)
            np.testing.assert_allclose(acc, ref, rtol=2e-5, atol=2e-6)
