"""PSFPT + spatial hash + compaction primitive tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.ops.compact import Compaction, compact, gather_tree, scatter_tree, splat_add
from fermat_tpu.render.context import RenderingContext
from fermat_tpu.scene.procedural import cornell_box, cornell_camera

# compile-heavy integrator tier — excluded from the default (fast) run
pytestmark = pytest.mark.heavy

RES = 32


class TestCompact:
    def test_roundtrip(self):
        mask = jnp.asarray([True, False, True, True, False, False, True, False])
        c = compact(mask)
        assert int(c.count) == 4
        src = jnp.arange(8) * 10
        packed = src[c.gather_idx]
        np.testing.assert_array_equal(np.asarray(packed[:4]), [0, 20, 30, 60])
        # scatter back: live lanes get (packed*2), dead keep original
        restored = scatter_tree(c, packed * 2, src)
        np.testing.assert_array_equal(
            np.asarray(restored), [0, 10, 40, 60, 40, 50, 120, 70]
        )

    def test_empty_and_full(self):
        c0 = compact(jnp.zeros(16, bool))
        assert int(c0.count) == 0
        c1 = compact(jnp.ones(16, bool))
        assert int(c1.count) == 16
        np.testing.assert_array_equal(np.asarray(c1.gather_idx), np.arange(16))

    def test_splat_add(self):
        img = jnp.zeros((4, 3))
        pixel = jnp.asarray([1, 1, 3, 0])
        vals = jnp.ones((4, 3))
        out = splat_add(img, pixel, vals, enabled=jnp.asarray([True, True, True, False]))
        np.testing.assert_allclose(np.asarray(out[1]), 2.0)
        np.testing.assert_allclose(np.asarray(out[0]), 0.0)


class TestSpatialHash:
    def test_same_cell_same_key(self):
        from fermat_tpu.core.math import Vec3
        from fermat_tpu.scene.spatial_hash import hash_shading_point

        eye = Vec3(jnp.float32(0), jnp.float32(0), jnp.float32(5))
        pos = Vec3(jnp.asarray([1.0, 1.001, 5.0]), jnp.asarray([1.0, 1.0, 5.0]),
                   jnp.asarray([0.0, 0.0, 0.0]))
        nrm = Vec3(jnp.zeros(3), jnp.zeros(3), jnp.ones(3))
        slot, key = hash_shading_point(pos, nrm, eye, 0.1, 1 << 12)
        assert int(key[0]) == int(key[1])  # 1mm apart, same 10cm cell
        assert int(key[0]) != int(key[2])  # far away: different cell

    def test_accumulator(self):
        from fermat_tpu.scene.spatial_hash import HashAccumulator

        acc = HashAccumulator.create(64)
        slot = jnp.asarray([3, 3, 7], jnp.int32)
        key = jnp.asarray([42, 42, 99], jnp.uint32)
        acc = acc.deposit(slot, key, jnp.asarray([1.0, 3.0, 5.0]),
                          jnp.zeros(3), jnp.zeros(3), jnp.ones(3, bool))
        mean, ok = acc.lookup(slot, key)
        assert bool(ok[0])
        assert abs(float(mean.x[0]) - 2.0) < 1e-6  # (1+3)/2
        assert abs(float(mean.x[2]) - 5.0) < 1e-6


class TestPsfpt:
    def test_image_finite_nonzero(self):
        ctx = RenderingContext.create(
            cornell_box(), cornell_camera(), RES, RES, renderer="psfpt",
            max_path_length=4,
        )
        fb = ctx.render(4)
        img = np.asarray(fb.composited)
        assert np.isfinite(img).all()
        assert img.max() > 0.05

    @pytest.mark.slow
    def test_matches_pt_and_reduces_noise(self):
        scene = cornell_box(light_scale=0.5, light_size=2.0)
        passes = 48
        ctx_pt = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="pt",
            max_path_length=4, rr=False,
        )
        img_pt = np.asarray(ctx_pt.render_batch(256).composited)  # reference
        ctx_pt2 = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="pt",
            max_path_length=4, rr=False, seed=7,
        )
        img_pt48 = np.asarray(ctx_pt2.render_batch(passes).composited)
        ctx_ps = RenderingContext.create(
            scene, cornell_camera(), RES, RES, renderer="psfpt",
            max_path_length=4, rr=False, seed=7,
        )
        img_ps = np.asarray(ctx_ps.render(passes).composited)
        # mean agreement with the converged PT (PSF is consistent)
        m_ref = img_pt.mean((0, 1))
        rel = np.abs(img_ps.mean((0, 1)) - m_ref) / np.maximum(m_ref, 1e-3)
        assert rel.max() < 0.12, (img_ps.mean((0, 1)), m_ref)
        # PSF at equal sample count is closer to the converged image (indirect
        # noise filtered) than plain PT
        err_ps = np.abs(img_ps - img_pt).mean()
        err_pt = np.abs(img_pt48 - img_pt).mean()
        assert err_ps < err_pt * 1.1, (err_ps, err_pt)
