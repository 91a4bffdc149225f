"""Blue-noise dithered sampler (VERDICT r3 #7).

Reference analog: src/tiled_sampling.h:287-312 (tiled per-pixel shift
tables). The table itself is generated from scratch by
tools/gen_bluenoise.py (void-and-cluster); these tests pin (a) the
spectral property of the committed table, (b) sampler uniformity /
unbiasedness, (c) the perceptual claim itself: at equal spp the
blue-noise sampler's per-pixel error concentrates at HIGHER image
frequencies than the Owen sampler's on a flat-illumination patch.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.core.rng import BlueNoiseSequence, TiledSequence


def _table():
    import os

    import fermat_tpu

    path = os.path.join(os.path.dirname(fermat_tpu.__file__), "data",
                        "bluenoise64.npz")
    return np.load(path)["shift"]


def _low_freq_ratio(img: np.ndarray, cutoff: float = 0.15) -> float:
    f = np.abs(np.fft.fft2(img - img.mean())) ** 2
    k = img.shape[0]
    fx = np.minimum(np.arange(k), k - np.arange(k)) / (k / 2)
    r = np.sqrt(fx[:, None] ** 2 + fx[None, :] ** 2)
    return float(f[r < cutoff].sum() / max(f.sum(), 1e-30))


class TestTable:
    def test_committed_table_is_blue_and_uniform(self):
        t = _table()
        assert t.shape == (64, 64, 2)
        for c in range(2):
            ch = t[:, :, c]
            # every stratum occupied exactly once (full-rank V&C)
            ranks = np.sort(ch.reshape(-1))
            np.testing.assert_allclose(
                ranks, (np.arange(4096) + 0.5) / 4096, atol=1e-6
            )
            rng = np.random.default_rng(3)
            white = rng.random((64, 64))
            assert _low_freq_ratio(ch) < 0.3 * _low_freq_ratio(white)


class TestSequence:
    def test_uniform_and_in_range(self):
        seq = BlueNoiseSequence.create(seed=5, res_x=64).set_instance(3)
        pix = jnp.arange(64 * 64, dtype=jnp.uint32)
        u0, u1 = seq.sample_2d(pix, jnp.uint32(4))
        u0, u1 = np.asarray(u0), np.asarray(u1)
        for u in (u0, u1):
            assert (u >= 0).all() and (u < 1).all()
            assert abs(u.mean() - 0.5) < 0.02
        # per-pass points must differ across instances
        u0b, _ = seq.set_instance(4).sample_2d(pix, jnp.uint32(4))
        assert np.abs(np.asarray(u0b) - u0).max() > 0.01

    def test_pixel_error_is_blue(self):
        """Estimate mean of f(u) = u over 4 passes per pixel: the residual
        image's low-frequency energy must be well below the Owen
        sampler's (the whole point of dithered sampling)."""
        res = 64
        pix = jnp.arange(res * res, dtype=jnp.uint32)

        def residual(make):
            acc = np.zeros(res * res, np.float64)
            n_passes = 4
            for i in range(n_passes):
                seq = make(i)
                u0, _ = seq.sample_2d(pix, jnp.uint32(2))
                acc += np.asarray(u0, np.float64)
            return (acc / n_passes - 0.5).reshape(res, res)

        r_bn = residual(lambda i: BlueNoiseSequence.create(
            seed=9, res_x=res).set_instance(i))
        r_ow = residual(lambda i: TiledSequence.create(
            seed=9).set_instance(i))
        lo_bn = _low_freq_ratio(r_bn)
        lo_ow = _low_freq_ratio(r_ow)
        assert lo_bn < 0.5 * lo_ow, (lo_bn, lo_ow)


class TestRenderIntegration:
    @pytest.mark.parametrize("sampler", ["bluenoise"])
    def test_sampler_switch_renders_and_converges(self, sampler):
        """PTOptions(sampler=...) must render, stay finite, and agree
        with the Owen sampler's multi-pass mean (unbiasedness A/B)."""
        from fermat_tpu.integrators.pt import PTOptions, render_pass
        from fermat_tpu.scene.procedural import cornell_box, cornell_camera
        from fermat_tpu.scene.view import SceneView

        view = SceneView.build(cornell_box(), cornell_camera())
        res = 32
        n_passes = 24

        def mean_img(opts):
            acc = np.zeros((res * res, 3), np.float64)
            for i in range(n_passes):
                out = render_pass(view, opts, res, res, jnp.uint32(i))
                acc += np.asarray(out.composited.stack(), np.float64)
            return acc / n_passes

        img_bn = mean_img(PTOptions(max_path_length=3, sampler=sampler))
        assert np.isfinite(img_bn).all() and img_bn.max() > 0.1
        img_ow = mean_img(PTOptions(max_path_length=3))
        # same estimator, different sample points: means agree to MC noise
        denom = np.abs(img_ow).mean()
        rel = np.abs(img_bn - img_ow).mean() / max(denom, 1e-9)
        assert rel < 0.08, rel
