"""Core math / RNG / camera tests.

Mirrors the reference's self-check style (cugar diff_test.cpp, bsdf_test.h):
closed-form checks + statistical consistency.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.core.math import (
    Vec3,
    cross,
    dot,
    normalize,
    oct_decode,
    oct_encode,
    oct_pack16,
    oct_unpack16,
    orthonormal_basis,
    reflect,
    refract,
    to_local,
    to_world,
)
from fermat_tpu.core.morton import morton2d, morton3d
from fermat_tpu.core.rng import (
    TiledSequence,
    WhiteSequence,
    hash_u32,
    owen_scramble,
    sobol02_u32,
    uniform_from_bits,
)
from fermat_tpu.core.sampling import (
    power_heuristic,
    square_to_cosine_hemisphere,
    square_to_uniform_disk,
    square_to_uniform_triangle,
)
from fermat_tpu.core.camera import Camera, CameraSampler, generate_camera_rays


def rand_vec3(n, seed=0):
    r = np.random.default_rng(seed)
    a = r.normal(size=(3, n)).astype(np.float32)
    return Vec3(jnp.asarray(a[0]), jnp.asarray(a[1]), jnp.asarray(a[2]))


class TestVecMath:
    def test_dot_cross(self):
        a = rand_vec3(128, 1)
        b = rand_vec3(128, 2)
        c = cross(a, b)
        np.testing.assert_allclose(np.asarray(dot(c, a)), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dot(c, b)), 0.0, atol=1e-4)

    def test_normalize(self):
        a = rand_vec3(128, 3)
        n = normalize(a)
        np.testing.assert_allclose(np.asarray(dot(n, n)), 1.0, atol=1e-5)

    def test_onb(self):
        n = normalize(rand_vec3(256, 4))
        t, b = orthonormal_basis(n)
        np.testing.assert_allclose(np.asarray(dot(t, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(b, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(t, b)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(t, t)), 1.0, atol=1e-5)

    def test_local_world_roundtrip(self):
        n = normalize(rand_vec3(64, 5))
        t, b = orthonormal_basis(n)
        v = normalize(rand_vec3(64, 6))
        v2 = to_world(to_local(v, t, b, n), t, b, n)
        np.testing.assert_allclose(v2.stack(), v.stack(), atol=1e-5)

    def test_reflect(self):
        n = normalize(rand_vec3(64, 7))
        wi = normalize(rand_vec3(64, 8))
        # make wi face the normal
        flip = jnp.where(dot(wi, n) < 0, -1.0, 1.0)
        wi = wi * flip
        wo = reflect(wi, n)
        np.testing.assert_allclose(
            np.asarray(dot(wo, n)), np.asarray(dot(wi, n)), atol=1e-5
        )

    def test_refract_snell(self):
        n = Vec3(jnp.zeros(16), jnp.zeros(16), jnp.ones(16))
        wi = normalize(Vec3(jnp.full(16, 0.5), jnp.zeros(16), jnp.ones(16)))
        eta = 1.0 / 1.5
        wt, tir = refract(wi, n, eta)
        assert not bool(jnp.any(tir))
        sin_i = jnp.sqrt(jnp.maximum(0, 1 - dot(wi, n) ** 2))
        sin_t = jnp.sqrt(jnp.maximum(0, 1 - dot(wt, n) ** 2))
        np.testing.assert_allclose(np.asarray(sin_t), np.asarray(eta * sin_i), atol=1e-5)

    def test_oct_roundtrip(self):
        n = normalize(rand_vec3(512, 9))
        n2 = oct_decode(*oct_encode(n))
        np.testing.assert_allclose(np.asarray(dot(n, n2)), 1.0, atol=1e-5)
        n3 = oct_unpack16(oct_pack16(n))
        assert float(jnp.min(dot(n, n3))) > 0.9995  # 8-bit quantization


class TestRng:
    def test_hash_distribution(self):
        x = jnp.arange(1 << 16, dtype=jnp.uint32)
        u = uniform_from_bits(hash_u32(x))
        assert abs(float(jnp.mean(u)) - 0.5) < 1e-2
        assert abs(float(jnp.var(u)) - 1.0 / 12.0) < 1e-3

    def test_sobol02_stratification(self):
        # first 2^m points of a (0,2) sequence are stratified: one point per
        # cell of any 2^m-cell elementary interval grid
        m = 8
        idx = jnp.arange(1 << m, dtype=jnp.uint32)
        s0, s1 = sobol02_u32(idx)
        u0 = uniform_from_bits(s0)
        u1 = uniform_from_bits(s1)
        cells = (np.asarray(u0 * 16).astype(int)) * 16 + np.asarray(u1 * 16).astype(int)
        assert len(np.unique(cells)) == 256

    def test_owen_scramble_preserves_stratification(self):
        m = 8
        idx = jnp.arange(1 << m, dtype=jnp.uint32)
        s0, s1 = sobol02_u32(idx)
        seed = jnp.uint32(12345)
        u0 = uniform_from_bits(owen_scramble(s0, seed))
        u1 = uniform_from_bits(owen_scramble(s1, jnp.uint32(999)))
        cells = (np.asarray(u0 * 16).astype(int)) * 16 + np.asarray(u1 * 16).astype(int)
        assert len(np.unique(cells)) == 256

    @pytest.mark.parametrize("cls", [TiledSequence, WhiteSequence])
    def test_sequence_mean(self, cls):
        seq = cls.create(seed=7)
        pix = jnp.arange(4096, dtype=jnp.uint32)
        acc = 0.0
        for inst in range(8):
            s = seq.set_instance(inst)
            u0, u1 = s.sample_2d(pix, jnp.uint32(3))
            acc += float(jnp.mean(u0)) + float(jnp.mean(u1))
        assert abs(acc / 16 - 0.5) < 5e-3

    def test_sequence_decorrelated_across_pixels(self):
        seq = TiledSequence.create(seed=3)
        pix = jnp.arange(2, dtype=jnp.uint32)
        u0, _ = seq.sample_2d(pix, jnp.uint32(0))
        assert abs(float(u0[0]) - float(u0[1])) > 1e-6


class TestSampling:
    def test_cosine_hemisphere(self):
        r = np.random.default_rng(0)
        u = r.random((2, 1 << 14)).astype(np.float32)
        d = square_to_cosine_hemisphere(jnp.asarray(u[0]), jnp.asarray(u[1]))
        assert float(jnp.min(d.z)) >= 0.0
        np.testing.assert_allclose(np.asarray(dot(d, d)), 1.0, atol=1e-4)
        # E[cos] = 2/3 for pdf = cos/pi
        assert abs(float(jnp.mean(d.z)) - 2.0 / 3.0) < 5e-3

    def test_disk(self):
        r = np.random.default_rng(1)
        u = r.random((2, 1 << 14)).astype(np.float32)
        x, y = square_to_uniform_disk(jnp.asarray(u[0]), jnp.asarray(u[1]))
        r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
        assert r2.max() <= 1.0 + 1e-6
        assert abs(r2.mean() - 0.5) < 5e-3  # E[r^2] = 1/2 uniform on disk

    def test_triangle(self):
        r = np.random.default_rng(2)
        u = r.random((2, 1 << 14)).astype(np.float32)
        b0, b1 = square_to_uniform_triangle(jnp.asarray(u[0]), jnp.asarray(u[1]))
        assert float(jnp.min(b0)) >= 0 and float(jnp.min(b1)) >= 0
        assert float(jnp.max(b0 + b1)) <= 1.0 + 1e-6
        # centroid
        assert abs(float(jnp.mean(b0)) - 1 / 3) < 5e-3
        assert abs(float(jnp.mean(b1)) - 1 / 3) < 5e-3

    def test_power_heuristic(self):
        w = power_heuristic(jnp.float32(1.0), jnp.float32(1.0))
        assert abs(float(w) - 0.5) < 1e-6
        w2 = power_heuristic(jnp.float32(10.0), jnp.float32(0.1))
        assert float(w2) > 0.99


class TestMorton:
    def test_morton3d_order(self):
        # (0,0,0) < (1,1,1) in code space; distinct cells get distinct codes
        c0 = morton3d(jnp.float32(0), jnp.float32(0), jnp.float32(0))
        c1 = morton3d(jnp.float32(1), jnp.float32(1), jnp.float32(1))
        assert int(c0) == 0
        assert int(c1) == (1 << 30) - 1

    def test_morton2d_unique(self):
        xs = jnp.asarray(np.random.default_rng(0).random(1000, dtype=np.float32))
        ys = jnp.asarray(np.random.default_rng(1).random(1000, dtype=np.float32))
        codes = np.asarray(morton2d(xs, ys))
        assert len(np.unique(codes)) > 990


class TestCamera:
    def make(self):
        # CornellBox frontal camera (models/CornellBox/camera-frontal.txt)
        return Camera.create((0, 1.3, 1.5), (-0.01, 0.945, -0.025), (0, 1, 0), 1.81)

    def test_ray_through_center(self):
        cam = self.make()
        n = 64 * 64
        h = jnp.full(n, 0.5)
        o, d, pix = generate_camera_rays(cam, 64, 64, h, h)
        # center pixel looks towards aim
        aim_dir = normalize(cam.aim - cam.eye)
        center = 32 * 64 + 32
        cd = Vec3(d.x[center], d.y[center], d.z[center])
        assert float(dot(cd, aim_dir)) > 0.999

    def test_invert_roundtrip(self):
        cam = self.make()
        s = CameraSampler.create(cam, 1.0)
        ndc = jnp.asarray([0.25, 0.5, 0.75])
        d = s.sample_direction(ndc, jnp.asarray([0.6, 0.5, 0.2]))
        ix, iy = s.invert(d)
        np.testing.assert_allclose(np.asarray(ix), [0.25, 0.5, 0.75], atol=1e-4)
        np.testing.assert_allclose(np.asarray(iy), [0.6, 0.5, 0.2], atol=1e-4)

    def test_pdf_positive_inside(self):
        cam = self.make()
        s = CameraSampler.create(cam, 1.0)
        d = s.sample_direction(jnp.asarray([0.5]), jnp.asarray([0.5]))
        assert float(s.pdf(d)[0]) > 0.0
        # behind the camera: zero
        assert float(s.pdf(Vec3(-d.x, -d.y, -d.z))[0]) == 0.0
