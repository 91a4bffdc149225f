"""CUGAR-parity extras: SH, distributions/EM mixtures, mesh compression,
RGBE images.

Reference analogs: cugar/spherical/sh.h, cugar/sampling/{distributions,
mixtures,em}.h, src/mesh/MeshCompression.h, cugar/image (RGBE).
"""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.core.math import Vec3, normalize

N = 1 << 14


def _sphere_dirs(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return Vec3(*(jnp.asarray(v[:, i], jnp.float32) for i in range(3)))


class TestSH:
    def test_orthonormality(self):
        """MC <Y_i, Y_j> over the sphere == delta_ij."""
        from fermat_tpu.core.sh import n_coeffs, sh_basis

        d = _sphere_dirs(1 << 16)
        b = np.asarray(sh_basis(3, d))  # (N, 16)
        gram = 4.0 * math.pi * (b.T @ b) / b.shape[0]
        np.testing.assert_allclose(gram, np.eye(n_coeffs(3)), atol=0.06)

    def test_project_reconstruct(self):
        """A band-limited function is reproduced exactly (up to MC noise)."""
        from fermat_tpu.core.sh import project, reconstruct, sh_basis

        d = _sphere_dirs(1 << 16, seed=1)
        # band-limited target: fixed combination of l<=2 basis functions
        coeff_true = np.zeros(9, np.float32)
        coeff_true[0] = 1.0
        coeff_true[3] = 0.5
        coeff_true[6] = -0.3
        vals = jnp.sum(sh_basis(2, d) * coeff_true, axis=-1)
        c = np.asarray(project(2, d, vals))
        np.testing.assert_allclose(c, coeff_true, atol=0.03)
        dt = _sphere_dirs(128, seed=2)
        np.testing.assert_allclose(
            np.asarray(reconstruct(jnp.asarray(c), dt)),
            np.asarray(jnp.sum(sh_basis(2, dt) * coeff_true, axis=-1)),
            atol=0.05,
        )

    def test_rotate_zh_matches_direct(self):
        """rotate_ZH of a cosine lobe == analytic clamped-cosine SH."""
        from fermat_tpu.core.sh import rotate_zh, reconstruct

        # clamped-cosine zonal coefficients (classic: pi, 2pi/3 * sqrt(3)...)
        zh = jnp.asarray([
            0.5 * math.sqrt(math.pi),
            math.sqrt(math.pi / 3.0),
        ])
        axis = normalize(Vec3(jnp.asarray([0.3]), jnp.asarray([0.5]),
                              jnp.asarray([0.81])))
        coeffs = rotate_zh(1, zh, axis)[0]
        d = _sphere_dirs(1 << 14, seed=3)
        got = np.asarray(reconstruct(coeffs, d))
        ax = np.asarray([axis.x[0], axis.y[0], axis.z[0]])
        dd = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)
        cos = dd @ ax
        want = 0.25 + 0.75 * cos  # the L=1 expansion of (1+3cos)/4 shape
        # both are degree-1 polynomials in cos: check affine match
        A = np.stack([np.ones_like(cos), cos], 1)
        fit = np.linalg.lstsq(A, got, rcond=None)[0]
        resid = got - A @ fit
        assert np.abs(resid).max() < 1e-4  # exactly affine in cos
        assert fit[1] > 0  # aligned with the axis


class TestDistributions:
    def _check(self, dist, lo, hi, n=1 << 16, seed=0, atol=0.05):
        """Histogram of mapped uniforms matches density."""
        r = np.random.default_rng(seed)
        u = jnp.asarray(r.random(n, dtype=np.float32))
        x = np.asarray(dist.map(u))
        edges = np.linspace(lo, hi, 41)
        hist, _ = np.histogram(x, bins=edges, density=True)
        mid = 0.5 * (edges[:-1] + edges[1:])
        dens = np.asarray(dist.density(jnp.asarray(mid, jnp.float32)))
        sel = dens > 1e-3
        np.testing.assert_allclose(hist[sel], dens[sel], rtol=0.35, atol=atol)

    def test_uniform(self):
        from fermat_tpu.core.distributions import Uniform

        self._check(Uniform(2.0), 0.0, 2.0)

    def test_cosine(self):
        from fermat_tpu.core.distributions import Cosine

        self._check(Cosine(), -math.pi / 2, math.pi / 2)

    def test_pareto(self):
        from fermat_tpu.core.distributions import Pareto

        self._check(Pareto(2.5, 1.0), 1.0, 4.0)

    def test_cauchy(self):
        from fermat_tpu.core.distributions import Cauchy

        self._check(Cauchy(0.5), -3.0, 3.0)

    def test_exponential_and_gaussian(self):
        from fermat_tpu.core.distributions import Exponential, Gaussian

        self._check(Exponential(1.5), 0.0, 3.0)
        self._check(Gaussian(0.0, 1.0), -3.0, 3.0)

    def test_bounded_exponential(self):
        from fermat_tpu.core.distributions import BoundedExponential

        d = BoundedExponential(0.01, 1.0)
        r = np.random.default_rng(4)
        x = np.asarray(d.map(jnp.asarray(r.random(1 << 14, np.float32))))
        a = np.abs(x)
        assert (a >= 0.0099).all() and (a <= 1.0001).all()
        # symmetric two-sided
        assert abs((x > 0).mean() - 0.5) < 0.02


class TestMixtureEM:
    def test_em_recovers_two_clusters(self):
        from fermat_tpu.core.distributions import GaussianMixture2D, em_step

        r = np.random.default_rng(7)
        a = r.normal([0.25, 0.25], 0.05, (4096, 2))
        b = r.normal([0.75, 0.7], 0.08, (4096, 2))
        x = jnp.asarray(np.concatenate([a, b]), jnp.float32)
        mix = GaussianMixture2D.create(2, spread=0.3)
        step = jax.jit(em_step)
        for _ in range(30):
            mix = step(mix, x)
        means = np.asarray(mix.means)
        order = np.argsort(means[:, 0])
        np.testing.assert_allclose(means[order[0]], [0.25, 0.25], atol=0.02)
        np.testing.assert_allclose(means[order[1]], [0.75, 0.7], atol=0.02)
        np.testing.assert_allclose(np.asarray(mix.weights).sum(), 1.0, rtol=1e-5)

    def test_sample_matches_pdf_mass(self):
        from fermat_tpu.core.distributions import GaussianMixture2D

        mix = GaussianMixture2D(
            weights=jnp.asarray([0.3, 0.7]),
            means=jnp.asarray([[0.2, 0.2], [0.7, 0.8]]),
            covs=jnp.tile(jnp.eye(2) * 0.01, (2, 1, 1)),
        )
        r = np.random.default_rng(8)
        n = 1 << 15
        u = [jnp.asarray(r.random(n, np.float32)) for _ in range(3)]
        x = np.asarray(mix.sample(*u))
        frac_b = (x[:, 0] > 0.45).mean()
        assert abs(frac_b - 0.7) < 0.02
        # pdf integrates to ~1 over the covered box
        g = np.linspace(-0.3, 1.3, 120)
        gx, gy = np.meshgrid(g, g)
        pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], 1), jnp.float32)
        mass = float(np.asarray(mix.pdf(pts)).sum() * (g[1] - g[0]) ** 2)
        assert abs(mass - 1.0) < 0.02


class TestMeshCompression:
    def test_normal_roundtrip(self):
        from fermat_tpu.scene.compression import (
            compress_normals,
            decompress_normals,
        )

        r = np.random.default_rng(9)
        n = r.standard_normal((4096, 3))
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        dec = decompress_normals(compress_normals(n))
        dots = np.clip((dec * n).sum(1), -1, 1)
        err_deg = np.degrees(np.arccos(dots))
        assert err_deg.max() < 0.05, err_deg.max()

    def test_uv_roundtrip(self):
        from fermat_tpu.scene.compression import (
            compress_uv,
            decompress_uv,
            uv_bias_scale,
        )

        r = np.random.default_rng(10)
        uv = (r.random((4096, 2)) * 8.0 - 3.0).astype(np.float32)
        bias, scale = uv_bias_scale(uv)
        dec = decompress_uv(compress_uv(uv, bias, scale), bias, scale)
        # 15-bit fixed point over the range -> ~range/2^15 absolute error
        np.testing.assert_allclose(dec, uv, atol=8.0 / (1 << 14))

    def test_meshstorage_compress_render(self):
        """compress_normals + compress_tex on a real scene: device views
        agree to quantization error and render identically at test res."""
        from fermat_tpu.scene.procedural import cornell_box

        a = cornell_box()
        b = cornell_box().compress_normals().compress_tex()
        assert b.uvs.shape[0] == 0 and b.uvs_packed is not None
        va, vb = a.device_view(), b.device_view()
        np.testing.assert_allclose(
            np.asarray(va.uv0), np.asarray(vb.uv0), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(va.n0.x), np.asarray(vb.n0.x), atol=1e-4)


class TestRgbe:
    def test_roundtrip(self, tmp_path):
        from fermat_tpu.utils.image import read_hdr, write_hdr

        r = np.random.default_rng(11)
        img = (r.random((17, 23, 3)) ** 2 * 50.0).astype(np.float32)
        img[0, 0] = 0.0  # zero pixel
        p = os.path.join(str(tmp_path), "t.hdr")
        write_hdr(p, img)
        back = read_hdr(p)
        assert back.shape == img.shape
        # shared-exponent format: the quantization step is 2^e/256 where
        # 2^e is the pixel max rounded UP to a power of two (mantissas are
        # truncated, Ward's original encoder) -> error < 2*max/256
        step = 2.0 * img.max(-1, keepdims=True) / 256.0
        assert (np.abs(back - img) <= step + 1e-4).all()
        np.testing.assert_allclose(back.max(), img.max(), rtol=0.02)

    def test_read_image_dispatch(self, tmp_path):
        from fermat_tpu.utils.image import read_image, write_hdr

        img = np.full((4, 4, 3), 2.5, np.float32)
        p = os.path.join(str(tmp_path), "d.hdr")
        write_hdr(p, img)
        got = read_image(p)
        np.testing.assert_allclose(got, 2.5, rtol=0.02)


class TestLTC:
    """LTC glossy lobe vs its own table + vs GGX (cugar/bsdf/ltc.h +
    ltc_test.cu analogs; table fit by tools/fit_ltc.py)."""

    def test_density_integrates_to_one(self):
        from fermat_tpu.bsdf.ltc import ltc_density
        from fermat_tpu.core.math import Vec3 as V

        nc, nph = 256, 128
        c = (np.arange(nc) + 0.5) / nc
        ph = (np.arange(nph) + 0.5) / nph * 2 * math.pi
        cc, pp = np.meshgrid(c, ph, indexing="ij")
        s = np.sqrt(1 - cc**2)
        m = nc * nph
        wo = V(jnp.asarray((s * np.cos(pp)).ravel(), jnp.float32),
               jnp.asarray((s * np.sin(pp)).ravel(), jnp.float32),
               jnp.asarray(cc.ravel(), jnp.float32))
        for rough, cos_i in ((0.3, 0.8), (0.6, 0.5), (0.9, 0.3)):
            si = math.sqrt(1 - cos_i**2)
            wi = V(jnp.full(m, si), jnp.zeros(m), jnp.full(m, cos_i))
            d = np.asarray(ltc_density(jnp.full(m, rough), wi, wo))
            est = d.mean() * 2 * math.pi
            assert abs(est - 1.0) < 0.03, (rough, cos_i, est)

    def test_sample_matches_density(self):
        from fermat_tpu.bsdf.ltc import ltc_density, ltc_sample
        from fermat_tpu.core.math import Vec3 as V

        n = 1 << 14
        r = np.random.default_rng(13)
        u0 = jnp.asarray(r.random(n, np.float32))
        u1 = jnp.asarray(r.random(n, np.float32))
        wi = V(jnp.full(n, 0.6), jnp.zeros(n), jnp.full(n, 0.8))
        rough = jnp.full(n, 0.4)
        wo, pdf = ltc_sample(rough, wi, u0, u1)
        pdf2 = ltc_density(rough, wi, wo)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)
        # 1/pdf MC of the density's own normalization
        est = float(jnp.mean(jnp.where(pdf > 1e-9, 1.0, 0.0)))
        assert est > 0.99

    def test_ltc_energy_matches_ggx_albedo(self):
        """MC integral of the LTC f*cos equals the GGX directional albedo
        (the magnitude plane is the fit's normalization)."""
        from fermat_tpu.bsdf import ggx
        from fermat_tpu.bsdf.ltc import ltc_eval, ltc_sample
        from fermat_tpu.core.math import Vec3 as V

        n = 1 << 15
        r = np.random.default_rng(14)
        u0 = jnp.asarray(r.random(n, np.float32))
        u1 = jnp.asarray(r.random(n, np.float32))
        for rough, cos_i in ((0.35, 0.8), (0.7, 0.6)):
            si = math.sqrt(1 - cos_i**2)
            wi = V(jnp.full(n, si), jnp.zeros(n), jnp.full(n, cos_i))
            rr = jnp.full(n, rough)
            wo, pdf = ltc_sample(rr, wi, u0, u1)
            f, p = ltc_eval(rr, wi, wo)
            ok = np.asarray(pdf) > 1e-9
            est = float(np.mean(np.where(
                ok, np.asarray(f) * np.abs(np.asarray(wo.z)) / np.maximum(np.asarray(pdf), 1e-12), 0.0)))
            tab = float(ggx.glossy_reflectance(
                jnp.asarray([rough]), jnp.asarray([cos_i]))[0])
            assert abs(est - tab) < 0.06, (rough, cos_i, est, tab)

    def test_ltc_approximates_ggx_shape(self):
        """Pointwise: the LTC proxy tracks GGX within the documented LTC
        approximation error at mid roughness (specular peak direction)."""
        from fermat_tpu.bsdf import ggx
        from fermat_tpu.bsdf.ltc import ltc_eval
        from fermat_tpu.core.math import Vec3 as V

        n = 1
        cos_i = 0.7
        si = math.sqrt(1 - cos_i**2)
        wi = V(jnp.full(n, si), jnp.zeros(n), jnp.full(n, cos_i))
        # mirror direction
        wo = V(jnp.full(n, -si), jnp.zeros(n), jnp.full(n, cos_i))
        for rough in (0.4, 0.7):
            rr = jnp.full(n, rough)
            f_ltc, _ = ltc_eval(rr, wi, wo)
            alpha = jnp.full(n, rough * rough)
            f_ggx = ggx.reflect_eval(alpha, wi, wo)
            ratio = float(f_ltc[0]) / max(float(f_ggx[0]), 1e-9)
            assert 0.6 < ratio < 1.6, (rough, ratio)


class TestUvBvh:
    def _mesh(self):
        from fermat_tpu.scene.procedural import cornell_box

        return cornell_box()

    def test_locate_finds_covering_triangle(self):
        from fermat_tpu.scene.uv_bvh import build_uv_bvh, locate

        ms = self._mesh()
        bvh = build_uv_bvh(ms)
        # every cornell quad spans [0,1]^2 in its own uv frame; query points
        # inside group 0 must land on a group-0 triangle with matching bary
        r = np.random.default_rng(15)
        n = 512
        su = jnp.asarray(r.random(n, np.float32) * 0.98 + 0.01)
        sv = jnp.asarray(r.random(n, np.float32) * 0.98 + 0.01)
        tri, u, v = locate(bvh, jnp.zeros(n, jnp.int32), su, sv)
        tri = np.asarray(tri)
        assert (tri >= 0).all()
        offs = np.asarray(ms.group_offsets)
        assert (tri < offs[1]).all()  # group 0 triangles only
        # barycentric reconstruction maps back to the query point
        uv0 = np.asarray(bvh.uv0)[tri]
        uv1 = np.asarray(bvh.uv1)[tri]
        uv2 = np.asarray(bvh.uv2)[tri]
        rec = (uv0 + (uv1 - uv0) * np.asarray(u)[:, None]
               + (uv2 - uv0) * np.asarray(v)[:, None])
        np.testing.assert_allclose(rec[:, 0], np.asarray(su), atol=1e-5)
        np.testing.assert_allclose(rec[:, 1], np.asarray(sv), atol=1e-5)

    def test_locate_miss_outside(self):
        from fermat_tpu.scene.uv_bvh import build_uv_bvh, locate

        bvh = build_uv_bvh(self._mesh())
        tri, _u, _v = locate(
            bvh, jnp.zeros(4, jnp.int32),
            jnp.asarray([1.5, -0.2, 2.0, 3.0], jnp.float32),
            jnp.asarray([0.5, 0.5, 2.0, -1.0], jnp.float32),
        )
        assert (np.asarray(tri) == -1).all()

    def test_uv_fix_splits_charts(self):
        """The cornell group holds many overlapping per-quad uv charts
        connected only through shared uv vertices per quad — uv_fix splits
        the single group into one chart per quad."""
        from fermat_tpu.scene.uv_bvh import uv_fix

        ms = self._mesh()
        n_groups_before = len(ms.group_names)
        tris_before = ms.triangles.copy()
        n_after = uv_fix(ms)
        # cornell: 1 group, 19 quads (6 walls/light + 2 boxes x 6 faces + 1)
        assert n_after > n_groups_before
        offs = np.asarray(ms.group_offsets)
        assert offs[-1] == ms.n_triangles
        assert (np.diff(offs) > 0).all()
        # triangles preserved as a set (rows permuted)
        a = np.sort(tris_before.view([('', tris_before.dtype)] * 3), 0)
        b = np.sort(ms.triangles.view([('', ms.triangles.dtype)] * 3), 0)
        assert (a == b).all()
        # each chart is exactly one quad here (2 triangles sharing uv edges)
        assert (np.diff(offs) == 2).all()
        # still renders
        from fermat_tpu.render.context import RenderingContext
        from fermat_tpu.scene.procedural import cornell_camera

        ctx = RenderingContext.create(ms, cornell_camera(), 8, 8,
                                      renderer="pt", max_path_length=2)
        img = np.asarray(ctx.render(1).composited)
        assert np.isfinite(img).all()


class TestLtcComposite:
    def test_pt_ltc_matches_ggx(self):
        """PT with glossy_model='ltc' approximates the GGX render on a
        glossy cornell (the LTC proxy is energy-matched; shape differences
        are the documented LTC approximation error)."""
        from fermat_tpu.render.context import RenderingContext
        from fermat_tpu.scene.procedural import cornell_box, cornell_camera

        scene = cornell_box(light_size=2.0, glossy_boxes=True)
        a = RenderingContext.create(
            scene, cornell_camera(), 16, 16, renderer="pt", max_path_length=3)
        img_g = np.asarray(a.render(12).composited)
        b = RenderingContext.create(
            scene, cornell_camera(), 16, 16, renderer="pt", max_path_length=3,
            glossy_model="ltc")
        img_l = np.asarray(b.render(12).composited)
        assert np.isfinite(img_l).all()
        mg, ml = img_g.mean(), img_l.mean()
        assert abs(mg - ml) / mg < 0.1, (mg, ml)


class TestMiscLoaders:
    """STL/OFF fallback importers (the assimp-path analog)."""

    def _cube_tris(self):
        from fermat_tpu.scene.procedural import cornell_box

        ms = cornell_box()
        v = ms.vertices[ms.triangles]
        return v  # (T, 3, 3)

    def test_binary_stl_roundtrip(self, tmp_path):
        import struct

        from fermat_tpu.scene.loaders.fa import load_mesh_any

        tris = self._cube_tris()
        p = str(tmp_path / "m.stl")
        with open(p, "wb") as f:
            f.write(b"\0" * 80)
            f.write(struct.pack("<I", tris.shape[0]))
            for t in tris:
                f.write(b"\0" * 12)
                f.write(np.asarray(t, np.float32).tobytes())
                f.write(b"\0\0")
        ms = load_mesh_any(p)
        assert ms.n_triangles == tris.shape[0]
        lo1, hi1 = ms.bbox()
        np.testing.assert_allclose(lo1, tris.reshape(-1, 3).min(0), atol=1e-5)
        np.testing.assert_allclose(hi1, tris.reshape(-1, 3).max(0), atol=1e-5)

    def test_ascii_stl(self, tmp_path):
        from fermat_tpu.scene.loaders.fa import load_mesh_any

        p = str(tmp_path / "a.stl")
        with open(p, "w") as f:
            f.write("solid a\n")
            f.write("facet normal 0 0 1\nouter loop\n")
            f.write("vertex 0 0 0\nvertex 1 0 0\nvertex 0 1 0\n")
            f.write("endloop\nendfacet\nendsolid a\n")
        ms = load_mesh_any(p)
        assert ms.n_triangles == 1

    def test_off_with_quads(self, tmp_path):
        from fermat_tpu.scene.loaders.fa import load_mesh_any

        p = str(tmp_path / "q.off")
        with open(p, "w") as f:
            f.write("OFF\n4 1 0\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2 3\n")
        ms = load_mesh_any(p)
        assert ms.n_triangles == 2  # quad fan-triangulated

    def test_unknown_format_message(self):
        from fermat_tpu.scene.loaders.fa import load_mesh_any

        with pytest.raises(ValueError, match="assimp"):
            load_mesh_any("model.fbx")


class TestKdTree:
    """Exact kNN vs numpy brute force (cugar/kd analog)."""

    def test_knn_matches_brute(self):
        from fermat_tpu.accel.kdtree import build_kdtree, knn

        r = np.random.default_rng(17)
        pts = r.random((3000, 3)).astype(np.float32)
        tree = build_kdtree(pts)
        nq = 256
        q = r.random((nq, 3)).astype(np.float32)
        k = 4
        d2, ids = knn(tree, jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1]),
                      jnp.asarray(q[:, 2]), k=k)
        d2 = np.asarray(d2)
        ids = np.asarray(ids)
        # brute force reference
        diff = q[:, None, :] - pts[None]
        bd = (diff ** 2).sum(-1)
        border = np.argsort(bd, axis=1)[:, :k]
        bref = np.take_along_axis(bd, border, axis=1)
        np.testing.assert_allclose(d2, bref, rtol=1e-4, atol=1e-6)
        # ids match up to equal-distance ties
        same = (ids == border).mean()
        assert same > 0.99, same

    def test_knn_small_cloud(self):
        from fermat_tpu.accel.kdtree import build_kdtree, knn

        pts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        tree = build_kdtree(pts)
        d2, ids = knn(tree, jnp.asarray([0.1]), jnp.asarray([0.0]),
                      jnp.asarray([0.0]), k=4)
        assert int(np.asarray(ids)[0, 0]) == 0
        assert int(np.asarray(ids)[0, 3]) == -1  # only 3 points exist
        assert np.asarray(d2)[0, 3] > 1e30
