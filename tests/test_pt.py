"""End-to-end path tracer tests on the procedural Cornell box.

Validation strategy (SURVEY.md §4): estimator cross-consistency replaces the
reference's host-vs-device dual builds — NEE+MIS and BSDF-only sampling are
independent estimators of the same integral and must converge to the same
image; golden-image regression pins down accidental changes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.render.context import RenderingContext
from fermat_tpu.scene.procedural import cornell_box, cornell_camera

RES = 32


def _ctx(**opts):
    return RenderingContext.create(
        cornell_box(), cornell_camera(), RES, RES, renderer="pt", **opts
    )


class TestPTBasics:
    def test_image_finite_nonzero(self):
        ctx = _ctx(max_path_length=4)
        fb = ctx.render(2)
        img = np.asarray(fb.composited)
        assert np.isfinite(img).all()
        assert img.max() > 0.05
        # light source should be the brightest region
        assert img.max() > 5.0

    def test_red_green_bleeding(self):
        """Color bleeding: left half picks up red, right half green."""
        ctx = _ctx(max_path_length=6)
        fb = ctx.render(16)
        img = np.asarray(fb.composited)
        left = img[:, : RES // 4]
        right = img[:, -RES // 4 :]
        assert left[..., 0].mean() > left[..., 2].mean()  # red > blue on left
        assert right[..., 1].mean() > right[..., 0].mean()  # green > red on right

    def test_progressive_accumulation_consistent(self):
        """mean of k passes == accumulate_pass blending of k passes."""
        ctx = _ctx(max_path_length=3)
        fb = ctx.render(4)
        img4 = np.asarray(fb.composited)
        ctx2 = _ctx(max_path_length=3)
        fb1 = ctx2.render(1)
        img1 = np.asarray(fb1.composited)
        # after more passes variance shrinks: distance to 16-pass mean
        assert np.isfinite(img4).all()
        assert not np.allclose(img1, img4)  # different sample sets got blended

    def test_variance_decreases(self):
        ctx = _ctx(max_path_length=4)
        ctx.render(2)
        v_early = float(np.mean(np.asarray(ctx.fb.var_luminance)[..., 3]))
        ctx.render(14)
        v_late = float(np.mean(np.asarray(ctx.fb.var_luminance)[..., 3]))
        assert v_late < v_early

    def test_gbuffer(self):
        from fermat_tpu.integrators.pt import PTOptions, render_pass

        ctx = _ctx()
        out = render_pass(ctx.view, PTOptions(max_path_length=1), RES, RES, jnp.uint32(0))
        tri = np.asarray(out.tri)
        assert (tri >= 0).all()  # closed box: every primary ray hits
        depth = np.asarray(out.depth)
        assert np.isfinite(depth).all() and depth.min() > 0.1
        n = np.asarray(out.normal.stack())
        np.testing.assert_allclose((n**2).sum(-1), 1.0, atol=1e-4)

    def test_channels_compose(self):
        ctx = _ctx(max_path_length=4)
        fb = ctx.render(4)
        comp = np.asarray(fb.composited)
        parts = (
            np.asarray(fb.direct) + np.asarray(fb.diffuse) + np.asarray(fb.specular)
        )
        np.testing.assert_allclose(comp, parts, rtol=1e-5, atol=1e-6)

    def test_deterministic(self):
        a = _ctx(max_path_length=4).render(2)
        b = _ctx(max_path_length=4).render(2)
        np.testing.assert_array_equal(
            np.asarray(a.composited), np.asarray(b.composited)
        )


class TestEstimatorConsistency:
    """NEE+MIS vs pure BSDF sampling must agree — the core unbiasedness test."""

    @pytest.mark.slow
    def test_nee_vs_bsdf_only(self):
        """Uses an enlarged emitter so the BSDF-sampling estimator is
        well-conditioned, and compares global channel means (the pooled
        estimator has ~0.5% stderr at these sample counts)."""
        passes = 256
        scene = cornell_box(light_scale=0.4, light_size=2.5)
        common = dict(max_path_length=4, rr=False)
        ctx_mis = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="pt", **common
        )
        ctx_bsdf = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="pt",
            direct_lighting_nee=False, indirect_lighting_nee=False, **common
        )
        img_mis = np.asarray(ctx_mis.render(passes).composited)
        img_bsdf = np.asarray(ctx_bsdf.render(passes).composited)
        mean_mis = img_mis.mean((0, 1))
        mean_bsdf = img_bsdf.mean((0, 1))
        rel = np.abs(mean_mis - mean_bsdf) / np.maximum(mean_mis, 1e-3)
        assert rel.max() < 0.04, (mean_mis, mean_bsdf)
        # spatial agreement on 4x4 pooled blocks
        def pool(x):
            return x.reshape(4, RES // 4, 4, RES // 4, 3).mean((1, 3))
        a, b = pool(img_mis), pool(img_bsdf)
        relp = np.abs(a - b) / np.maximum(np.maximum(a, b), 0.05)
        assert relp.mean() < 0.10, (relp.mean(), relp.max())

    def test_nee_vs_mis_direct(self):
        """Direct lighting only (1 bounce): NEE-only vs MIS must agree."""
        passes = 120
        common = dict(max_path_length=2, rr=False)
        ctx_mis = _ctx(**common)
        ctx_nee = _ctx(
            direct_lighting_bsdf=False, indirect_lighting_bsdf=False, **common
        )
        img_mis = np.asarray(ctx_mis.render(passes).composited)
        img_nee = np.asarray(ctx_nee.render(passes).composited)

        def pool(x):
            return x.reshape(8, RES // 8, 8, RES // 8, 3).mean((1, 3))

        a, b = pool(img_mis), pool(img_nee)
        rel = np.abs(a - b) / np.maximum(np.maximum(a, b), 0.05)
        assert rel.mean() < 0.08, (rel.mean(), rel.max())


class TestQueueCompaction:
    def test_queued_matches_masked_bitwise(self):
        """PTOptions.queue_compaction is a pure lane permutation: the
        estimator (and every AOV) must match the masked-lane default
        exactly (warp_append analog, pathtracer_queues.h:69-93)."""
        from fermat_tpu.integrators.pt import PTOptions, render_pass
        from fermat_tpu.scene.view import SceneView

        view = SceneView.build(cornell_box(), cornell_camera())
        base = dict(max_path_length=4, rr=True)
        out_m = render_pass(view, PTOptions(**base), RES, RES, jnp.uint32(3))
        out_q = render_pass(
            view, PTOptions(queue_compaction=True, **base),
            RES, RES, jnp.uint32(3),
        )
        np.testing.assert_array_equal(
            np.asarray(out_m.composited.x), np.asarray(out_q.composited.x))
        np.testing.assert_array_equal(
            np.asarray(out_m.diffuse.y), np.asarray(out_q.diffuse.y))
        np.testing.assert_array_equal(
            np.asarray(out_m.depth), np.asarray(out_q.depth))
        np.testing.assert_array_equal(
            np.asarray(out_m.tri), np.asarray(out_q.tri))
        assert float(out_m.rays) == float(out_q.rays)


class TestNarrowingDriver:
    def test_narrow_matches_monolithic(self):
        """The narrowing-wavefront driver (render_pass_narrow) is the
        reference's shrinking queue model (path_trace_loop,
        pathtracer_kernels.h:310-391): live lanes compact into power-of-2
        width buckets between separately-jitted bounce segments. The
        estimator is the same sum re-associated — every radiance AOV must
        allclose the jitted monolithic pass; ray counts and discrete
        gbuffer fields must match exactly."""
        from fermat_tpu.integrators.pt import (
            PTOptions, render_pass, render_pass_narrow)
        from fermat_tpu.scene.view import SceneView

        view = SceneView.build(cornell_box(), cornell_camera())
        opts = PTOptions(max_path_length=5, rr=True)
        ref = jax.jit(lambda i: render_pass(view, opts, RES, RES, i))(
            jnp.uint32(3))
        # min_width far below the grid so several buckets actually engage
        out = render_pass_narrow(view, opts, RES, RES, jnp.uint32(3),
                                 min_width=64)
        for field in ("direct", "diffuse", "specular", "composited"):
            a = np.stack([np.asarray(v) for v in getattr(ref, field)], -1)
            b = np.stack([np.asarray(v) for v in getattr(out, field)], -1)
            np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ref.tri),
                                      np.asarray(out.tri))
        np.testing.assert_array_equal(np.asarray(ref.material),
                                      np.asarray(out.material))
        np.testing.assert_allclose(np.asarray(ref.depth),
                                   np.asarray(out.depth), rtol=1e-5)
        assert float(ref.rays) == float(out.rays)
        np.testing.assert_array_equal(np.asarray(ref.rays_lane),
                                      np.asarray(out.rays_lane))

    def test_context_narrow_option(self):
        """RenderingContext(-narrow 1) routes through the narrowing
        driver and produces the same progressive image."""
        a = _ctx(max_path_length=4).render(2)
        b = _ctx(max_path_length=4, narrow=True).render(2)
        np.testing.assert_allclose(np.asarray(a.composited),
                                   np.asarray(b.composited),
                                   atol=2e-5, rtol=1e-5)

    def test_context_narrow_render_batch(self):
        """render_batch on a narrow=True context must strip the driver-
        level key before calling the renderer factory (ADVICE r4 medium:
        PTOptions(**kw) got an unexpected 'narrow' argument) and match
        the plain batch render."""
        a = _ctx(max_path_length=4).render_batch(2)
        b = _ctx(max_path_length=4, narrow=True).render_batch(2)
        np.testing.assert_allclose(np.asarray(a.composited),
                                   np.asarray(b.composited),
                                   atol=2e-5, rtol=1e-5)


def test_compact_light_sampling_bit_parity():
    """Compact emissive-only light tables (round 4: the full-length CDF
    searchsorted was 2.15 s/pass at bathroom scale) must be BIT-equal to
    the full-table sampler on a > 2048-triangle scene."""
    import numpy as np

    import fermat_tpu.integrators.pt as pt
    from fermat_tpu.bsdf.composite import scene_lobes
    from fermat_tpu.core.camera import Camera
    from fermat_tpu.scene.procedural import big_room
    from fermat_tpu.scene.view import SceneView

    mesh = big_room(n_boxes=400)
    cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
    view = SceneView.build(mesh, cam)
    opts = pt.PTOptions(max_path_length=3, lobes=scene_lobes(mesh.materials))
    assert pt._light_compact_tables(view) is not None
    o1 = pt.render_pass(view, opts, 24, 24, jnp.uint32(0))
    orig = pt._light_compact_tables
    pt._light_compact_tables = lambda v: None
    try:
        o0 = pt.render_pass(view, opts, 24, 24, jnp.uint32(0))
    finally:
        pt._light_compact_tables = orig
    assert float(o0.rays) == float(o1.rays)
    np.testing.assert_array_equal(np.asarray(o1.composited.stack()),
                                  np.asarray(o0.composited.stack()))
