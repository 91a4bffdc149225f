"""bathroom2 / water_caustic stand-in scenes (BASELINE configs #3/#4 shape).

The reference's demo assets ship without their .obj geometry, so these
scenes pair procedural geometry with the REAL bundled bathroom materials +
texture set (VERDICT r2 #5). CPU-sized here; bench.py's secondary metrics
capture the 1600x896 TPU numbers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.scene.procedural import bathroom_standin, caustic_standin
from fermat_tpu.scene.view import SceneView

pytestmark = pytest.mark.heavy


class TestBathroomStandin:
    def test_textured_render_converges(self):
        from fermat_tpu.bsdf.composite import scene_lobes

        mesh, cam, tdir = bathroom_standin(n_boxes=40)
        view = SceneView.build(mesh, cam, texture_dir=tdir)
        assert view.has_textures  # the REAL bathroom texture set
        # direct lighting only + tonemapped RMSE: the real bathroom
        # materials include Ns=4096 ceramics whose glossy indirect paths
        # throw fireflies that break RMSE monotonicity at tiny pass counts
        opts = PTOptions(max_path_length=2, rr=False,
                         lobes=scene_lobes(mesh.materials))
        res = 32

        f = jax.jit(lambda v, inst: render_pass(v, opts, res, res, inst)
                    .composited.stack())

        def render(passes, seed0=0):
            acc = 0.0
            for i in range(passes):
                acc = acc + np.asarray(f(view, jnp.uint32(seed0 + i)))
            return acc / passes

        golden = render(10, seed0=100)
        img2 = render(2)
        img6 = render(6)
        tm = lambda a: a / (1.0 + a)
        rmse = lambda a: float(np.sqrt(np.mean((tm(a) - tm(golden)) ** 2)))
        assert np.isfinite(img6).all()
        assert img6.mean() > 0.01  # lit
        # texture variation shows up across pixels (not a flat render)
        assert img6.std() > 0.05 * img6.mean()
        assert rmse(img6) < rmse(img2)  # converging toward the golden

    def test_gbuffer_uv_coverage(self):
        """The stand-in's per-face uv charts reach the shading path."""
        mesh, cam, tdir = bathroom_standin(n_boxes=20)
        view = SceneView.build(mesh, cam, texture_dir=tdir)
        out = render_pass(view, PTOptions(max_path_length=1, rr=False),
                          24, 24, jnp.uint32(0))
        uv = np.asarray(out.uv)
        hit = np.asarray(out.tri) >= 0
        assert hit.mean() > 0.9  # indoor scene: almost everything hits
        assert (np.abs(uv[hit]) > 0).any()


class TestCausticStandin:
    def test_bpt_renders_refracted_light(self):
        """BPT transports light through the refractive slab to the floor
        (the SDS situation water_caustic exists for)."""
        from fermat_tpu.bsdf.composite import scene_lobes
        from fermat_tpu.integrators import bpt as bpt_mod

        mesh, cam = caustic_standin()
        view = SceneView.build(mesh, cam)
        opts = bpt_mod.BPTOptions(max_path_length=4, rr=False,
                                  lobes=scene_lobes(mesh.materials))
        res = 24
        acc = 0.0
        for i in range(3):
            rad, splat, _rays = bpt_mod.render_pass(
                view, opts, res, res, jnp.uint32(i))
            img = np.stack([np.asarray(rad.x), np.asarray(rad.y),
                            np.asarray(rad.z)], -1) + np.asarray(splat)
            acc = acc + img
        acc /= 3
        assert np.isfinite(acc).all()
        assert acc.mean() > 1e-3  # light reaches the sensor through the slab

    def test_pt_bpt_agree_on_diffuse_floor(self):
        """Rough consistency: PT and BPT agree on the overall image mean
        (loose — PT is high-variance on the refracted paths)."""
        from fermat_tpu.bsdf.composite import scene_lobes
        from fermat_tpu.integrators import bpt as bpt_mod

        mesh, cam = caustic_standin()
        view = SceneView.build(mesh, cam)
        lobes = scene_lobes(mesh.materials)
        res = 24
        acc_pt = 0.0
        for i in range(12):
            out = render_pass(view, PTOptions(max_path_length=4, rr=False,
                                              lobes=lobes),
                              res, res, jnp.uint32(i))
            acc_pt = acc_pt + np.asarray(out.composited.stack())
        acc_pt /= 12
        acc_b = 0.0
        for i in range(12):
            rad, splat, _ = bpt_mod.render_pass(
                view, bpt_mod.BPTOptions(max_path_length=4, rr=False,
                                         lobes=lobes),
                res, res, jnp.uint32(i))
            acc_b = acc_b + np.stack(
                [np.asarray(rad.x), np.asarray(rad.y), np.asarray(rad.z)],
                -1) + np.asarray(splat)
        acc_b /= 12
        assert abs(acc_b.mean() - acc_pt.mean()) < 0.35 * max(
            acc_pt.mean(), 1e-6), (acc_pt.mean(), acc_b.mean())
