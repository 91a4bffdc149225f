"""Replay-gradient megakernel vs jax.grad of the XLA pipeline.

The round-5 replay kernel (ops/pallas_pt_mega._mega_grad_kernel)
accumulates dL/d diffuse for the detached estimator by replaying the
exact forward paths — it must match reverse-mode AD of the XLA
render_pass (the committed gradient contract, GRADIENTS.md) to float
tolerance. Runs in Pallas interpret mode on CPU; bench.py exercises it
on hardware as the train-step fast path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.ops.pallas_pt_mega import (
    build_mega_tables,
    mega_grad_eligible,
    render_grad_diffuse_mega,
    render_pass_mega,
)
from fermat_tpu.scene.procedural import cornell_box, cornell_camera
from fermat_tpu.scene.view import SceneView

RES = 24


@pytest.fixture(scope="module")
def scene():
    sc = cornell_box(glossy_boxes=True)
    return sc


@pytest.fixture(scope="module")
def view(scene):
    return SceneView.build(scene, cornell_camera())


def _ad_loss_and_grad(view, opts, target, inst):
    diffuse0 = view.mesh.materials.diffuse

    def loss_fn(diffuse):
        mats = view.mesh.materials._replace(diffuse=diffuse)
        v = view._replace(mesh=view.mesh._replace(materials=mats))
        out = render_pass(v, opts, RES, RES, inst)
        img = out.composited.stack()
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss_fn)(diffuse0)


def _replay_loss_and_grad(view, opts, target, inst):
    tb = build_mega_tables(view, RES, RES, opts.ray_eps)
    out = render_pass_mega(view, opts, RES, RES, inst, tables=tb)
    img = out.composited.stack()
    loss = jnp.mean((img - target) ** 2)
    n3 = img.shape[0] * 3
    adjoint = 2.0 * (img - target) / n3
    grad = render_grad_diffuse_mega(view, opts, RES, RES, inst,
                                    adjoint, tables=tb)
    return loss, grad


class TestMegaReplayGrad:
    def test_eligibility(self, view):
        opts = PTOptions(max_path_length=4)
        assert mega_grad_eligible(view, opts)

    @pytest.mark.parametrize("inst", [0, 3])
    def test_grad_matches_ad(self, view, inst):
        opts = PTOptions(max_path_length=4)
        target = jnp.zeros((RES * RES, 3), jnp.float32)
        l_ad, g_ad = _ad_loss_and_grad(view, opts, target, jnp.uint32(inst))
        l_rp, g_rp = _replay_loss_and_grad(view, opts, target,
                                           jnp.uint32(inst))
        np.testing.assert_allclose(float(l_rp), float(l_ad),
                                   rtol=1e-4, atol=1e-7)
        # materials.diffuse is a Vec3 of (M,) arrays; replay returns (M, 3)
        g_ad = np.stack([np.asarray(g_ad.x), np.asarray(g_ad.y),
                         np.asarray(g_ad.z)], axis=1)
        g_rp = np.asarray(g_rp)
        assert g_rp.shape == g_ad.shape
        scale = np.abs(g_ad).max()
        np.testing.assert_allclose(g_rp, g_ad, rtol=5e-3,
                                   atol=2e-3 * max(scale, 1e-12))

    def test_grad_matches_ad_with_rr_and_depth(self, view):
        """Longer paths + Russian roulette: the replay must reproduce
        the same RR decisions (same QMC) and the same gradients."""
        opts = PTOptions(max_path_length=6)
        target = jnp.full((RES * RES, 3), 0.2, jnp.float32)
        l_ad, g_ad = _ad_loss_and_grad(view, opts, target, jnp.uint32(1))
        l_rp, g_rp = _replay_loss_and_grad(view, opts, target,
                                           jnp.uint32(1))
        np.testing.assert_allclose(float(l_rp), float(l_ad),
                                   rtol=1e-4, atol=1e-7)
        g_ad = np.stack([np.asarray(g_ad.x), np.asarray(g_ad.y),
                         np.asarray(g_ad.z)], axis=1)
        scale = np.abs(g_ad).max()
        np.testing.assert_allclose(np.asarray(g_rp), g_ad, rtol=5e-3,
                                   atol=2e-3 * max(scale, 1e-12))

    def test_nonzero_gradient(self, view):
        opts = PTOptions(max_path_length=4)
        target = jnp.zeros((RES * RES, 3), jnp.float32)
        _l, g = _replay_loss_and_grad(view, opts, target, jnp.uint32(0))
        assert float(jnp.abs(g).max()) > 0.0
