"""Gradient validation to BASELINE's letter (config #5): finite-difference
checks of pixel gradients w.r.t. BSDF params (albedo, GGX roughness),
texture texels, and emitter radiance, plus the material-testball
inverse-rendering recovery demo.

Methodology: every loss is a deterministic function of a scalar parameter s
(fixed QMC instances, rr off), so a central finite difference of the SAME
estimator is an unbiased check of the autodiff value wherever sampling
decisions do not depend on s:
  * albedo / emitter scale / texels enter the throughput (multi)linearly and
    leave every sampling pdf invariant (uniform emitter scaling cancels in
    the normalized CDF), so FD == AD to O(eps^2).
  * roughness changes BSDF *sampling*; the detached estimator (pt.py) is
    unbiased in EXPECTATION but differs from a pathwise FD on any path that
    continues through a sampled direction, so the FD check runs with
    indirect lighting fully off: direct NEE light directions come from the
    emitter CDF alone and are roughness-independent, making FD == AD.
  * eps is chosen LARGE (0.05-0.2): the losses are low-degree polynomials or
    smooth in s, while f32 evaluation noise in a full renderer is ~1e-4
    absolute — FD error scales as noise/eps, so small eps drowns the signal
    (measured: the AD/FD gap grows as eps shrinks; see round-2 notes).
Reference: the reference has no gradient tests (no autodiff); BASELINE.md
demands pixel+gradient allclose — this file is that contract.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.scene.lights import MeshLightsView
from fermat_tpu.scene.procedural import cornell_box, cornell_camera
from fermat_tpu.scene.view import SceneView

# compile-heavy integrator tier — excluded from the default (fast) run
pytestmark = pytest.mark.heavy

RES = 16


def _loss_fn(view, opts, apply_s, n_passes=2, res=RES):
    """mean-image loss as a jitted scalar function of s (s0 = 1.0)."""

    def loss(s):
        v = apply_s(view, s)
        acc = 0.0
        for i in range(n_passes):
            out = render_pass(v, opts, res, res, jnp.uint32(i))
            acc = acc + jnp.mean(out.composited.stack())
        return acc / n_passes

    return jax.jit(loss)


def _fd_check(loss, eps, rtol, atol=0.0):
    s0 = jnp.float32(1.0)
    val, grad = jax.value_and_grad(loss)(s0)
    lp = loss(jnp.float32(1.0 + eps))
    lm = loss(jnp.float32(1.0 - eps))
    fd = (float(lp) - float(lm)) / (2.0 * eps)
    g = float(grad)
    assert np.isfinite(val) and np.isfinite(g), (val, g)
    assert abs(g - fd) <= rtol * max(abs(fd), abs(g)) + atol, (g, fd)
    return g, fd


class TestFiniteDifference:
    def test_fd_diffuse_albedo(self):
        scene = cornell_box(light_size=2.0)
        view = SceneView.build(scene, cornell_camera())
        opts = PTOptions(max_path_length=3, rr=False,
                         lobes=scene_lobes(scene.materials))

        def apply_s(v, s):
            d = v.mesh.materials.diffuse
            mats = v.mesh.materials._replace(
                diffuse=type(d)(d.x * s, d.y * s, d.z * s))
            return v._replace(mesh=v.mesh._replace(materials=mats))

        g, fd = _fd_check(_loss_fn(view, opts, apply_s), eps=0.2, rtol=2e-2)
        assert g > 0  # brighter albedo -> brighter image

    def test_fd_emitter_radiance(self):
        """d(image)/d(emitter scale): the light CDF + baked NEE rows are
        rebuilt inside the loss so the gradient flows through both the
        emissive-hit path and the NEE radiance."""
        scene = cornell_box(light_size=2.0)
        view = SceneView.build(scene, cornell_camera())
        opts = PTOptions(max_path_length=3, rr=False,
                         lobes=scene_lobes(scene.materials))

        def apply_s(v, s):
            e = v.mesh.materials.emissive
            mats = v.mesh.materials._replace(
                emissive=type(e)(e.x * s, e.y * s, e.z * s))
            mesh2 = v.mesh._replace(materials=mats)
            return v._replace(mesh=mesh2, lights=MeshLightsView.build(mesh2))

        g, fd = _fd_check(_loss_fn(view, opts, apply_s), eps=0.2, rtol=2e-2)
        # radiance is linear in the emitter scale: gradient == loss at s=1
        val = float(_loss_fn(view, opts, apply_s)(jnp.float32(1.0)))
        np.testing.assert_allclose(g, val, rtol=1e-3)

    def test_fd_ggx_roughness(self):
        """NEE-only DIRECT lighting, indirect off: light directions are
        independent of roughness, so detached-sampling AD must match FD
        exactly (the setting where detached-VNDF bias would otherwise show
        up). Only the glossy material's roughness is scaled — scaling the
        diffuse walls' roughness=1.0 through a clip creates a kink at s=1
        via the Kelemen coupling and breaks the central difference."""
        scene = cornell_box(light_size=2.0, glossy_boxes=True)
        for m in scene.materials:
            if m.name == "box":
                m.specular = (0.9, 0.9, 0.9)
                m.diffuse = (0.05, 0.05, 0.05)
                m.phong_exponent = 10.0  # roughness 0.1
        view = SceneView.build(scene, cornell_camera())
        opts = PTOptions(
            max_path_length=2, rr=False, visible_lights=False,
            direct_lighting_bsdf=False, indirect_lighting_nee=False,
            indirect_lighting_bsdf=False, lobes=scene_lobes(scene.materials),
        )
        glossy = view.mesh.materials.specular.x > 0.0

        def apply_s(v, s):
            r = v.mesh.materials.roughness
            mats = v.mesh.materials._replace(
                roughness=jnp.where(glossy, r * s, r))
            return v._replace(mesh=v.mesh._replace(materials=mats))

        g, fd = _fd_check(_loss_fn(view, opts, apply_s, n_passes=3),
                          eps=0.05, rtol=2e-2, atol=1e-7)

    @staticmethod
    def _textured_view(tmp_path, img):
        """Cornell with every non-emissive material diffuse-mapped to img.

        The texture must go through a real file: SceneView.build re-resolves
        material map indices from *_map_name (view.py:86-89), clobbering any
        manually-set diffuse_map."""
        import os

        from fermat_tpu.utils.image import write_tga

        scene = cornell_box(light_size=2.0)
        write_tga(os.path.join(str(tmp_path), "t.tga"), img)
        for m in scene.materials:
            if max(m.emissive) == 0:
                m.diffuse_map_name = "t.tga"
        view = SceneView.build(scene, cornell_camera(),
                               texture_dir=str(tmp_path))
        assert view.has_textures
        return scene, view

    def test_fd_texture_texels(self, tmp_path):
        """d(image)/d(texel scale) through the bilinear mip atlas: the
        diffuse map modulates albedo (multi)linearly in the texels."""
        r = np.random.default_rng(5)
        img = (0.25 + 0.75 * r.random((8, 8, 3))).astype(np.float32)
        scene, view = self._textured_view(tmp_path, img)
        opts = PTOptions(max_path_length=3, rr=False,
                         lobes=scene_lobes(scene.materials))

        def apply_s(v, s):
            t = v.textures.texels
            t2 = jnp.concatenate([t[:, :3] * s, t[:, 3:]], axis=1)
            return v._replace(textures=v.textures._replace(texels=t2))

        g, fd = _fd_check(_loss_fn(view, opts, apply_s), eps=0.2, rtol=2e-2)
        assert g > 0

    def test_grad_wrt_individual_texels(self, tmp_path):
        """Per-texel gradients exist and are nonzero on visible texels
        (BASELINE: gradients w.r.t. textures, not just a global scale)."""
        img = np.full((4, 4, 3), 0.6, np.float32)
        scene, view = self._textured_view(tmp_path, img)
        opts = PTOptions(max_path_length=2, rr=False,
                         lobes=scene_lobes(scene.materials))

        @jax.jit
        def loss(texels):
            v = view._replace(textures=view.textures._replace(texels=texels))
            out = render_pass(v, opts, RES, RES, jnp.uint32(0))
            return jnp.mean(out.composited.stack())

        g = jax.grad(loss)(view.textures.texels)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        # some mip level of the wall texture receives gradient (ray-cone
        # LOD may route lookups to coarser levels at this resolution)
        assert (np.abs(g[:, :3]) > 0).any()


@pytest.mark.slow
class TestTestballRecovery:
    def test_recover_testball_albedo(self):
        """BASELINE config #5: inverse rendering on material-testball —
        recover the ball's diffuse albedo from a rendered target."""
        from fermat_tpu.scene.loaders.pbrt import load_pbrt

        pb = load_pbrt("/root/reference/models/material-testball/scene.pbrt")
        view = SceneView.build(pb.mesh, pb.camera,
                               env_radiance=pb.env_radiance)
        opts = PTOptions(max_path_length=2, rr=False,
                         lobes=scene_lobes(pb.mesh.materials))
        res_x, res_y = 48, 32

        def render_mean(v):
            acc = 0.0
            for i in range(2):
                out = render_pass(v, opts, res_x, res_y, jnp.uint32(i))
                acc = acc + out.composited.stack()
            return acc / 2

        target = jax.lax.stop_gradient(render_mean(view))
        true_d = view.mesh.materials.diffuse

        wrong = type(true_d)(
            jnp.clip(true_d.x * 0.3 + 0.4, 0, 1),
            jnp.clip(true_d.y * 0.3 + 0.2, 0, 1),
            jnp.clip(true_d.z * 0.3 + 0.1, 0, 1),
        )

        @jax.jit
        def step(diffuse):
            def loss_fn(diffuse):
                mats = view.mesh.materials._replace(diffuse=diffuse)
                v = view._replace(mesh=view.mesh._replace(materials=mats))
                return jnp.mean((render_mean(v) - target) ** 2)

            return jax.value_and_grad(loss_fn)(diffuse)

        diffuse = wrong
        l0 = None
        for _ in range(25):
            loss, g = step(diffuse)
            if l0 is None:
                l0 = float(loss)
            diffuse = jax.tree_util.tree_map(
                lambda p, gr: jnp.clip(p - 4.0 * gr, 0.0, 1.0), diffuse, g)
        l1 = float(step(diffuse)[0])
        assert l1 < 0.3 * l0, (l0, l1)
        err0 = float(jnp.mean(jnp.abs(wrong.x - true_d.x)))
        err1 = float(jnp.mean(jnp.abs(diffuse.x - true_d.x)))
        assert err1 < err0
