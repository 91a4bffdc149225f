"""BSDF tests — statistical consistency in the style of
cugar/bsdf/bsdf_test.h:49-130 (sample/pdf agreement, f/p vs g, energy checks).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.bsdf import ggx
from fermat_tpu.bsdf.composite import (
    BsdfParams,
    f_and_pdf,
    sample,
)
from fermat_tpu.bsdf.fresnel import dielectric, schlick
from fermat_tpu.core.math import Vec3, dot, normalize
from fermat_tpu.core.sampling import square_to_uniform_sphere

N = 1 << 15


def _uniforms(n, seed=0, dims=3):
    r = np.random.default_rng(seed)
    return [jnp.asarray(r.random(n, dtype=np.float32)) for _ in range(dims)]


def _params(
    n,
    diffuse=(0.7, 0.5, 0.3),
    specular=(0.0, 0.0, 0.0),
    roughness=0.5,
    opacity=1.0,
    ior=1.5,
    diffuse_trans=(0.0, 0.0, 0.0),
    reflectivity=(0.0, 0.0, 0.0),
):
    full = lambda v: jnp.full(n, v, jnp.float32)
    return BsdfParams(
        diffuse=Vec3(full(diffuse[0]), full(diffuse[1]), full(diffuse[2])),
        diffuse_trans=Vec3(*(full(c) for c in diffuse_trans)),
        specular=Vec3(*(full(c) for c in specular)),
        roughness=full(roughness),
        ior=full(ior),
        opacity=full(opacity),
        reflectivity=Vec3(*(full(c) for c in reflectivity)),
    )


def _fixed_wi(n, z=0.6):
    s = np.sqrt(1 - z * z)
    return Vec3(jnp.full(n, s, jnp.float32), jnp.zeros(n), jnp.full(n, z, jnp.float32))


class TestFresnel:
    def test_schlick_limits(self):
        f0 = Vec3(jnp.asarray([0.04]), jnp.asarray([0.04]), jnp.asarray([0.04]))
        at_normal = schlick(jnp.asarray([1.0]), f0)
        assert abs(float(at_normal.x[0]) - 0.04) < 1e-6
        grazing = schlick(jnp.asarray([0.0]), f0)
        assert abs(float(grazing.x[0]) - 1.0) < 1e-6

    def test_dielectric_normal_incidence(self):
        # R0 = ((1-1.5)/(1+1.5))^2 = 0.04
        f, tir = dielectric(jnp.asarray([1.0]), jnp.asarray([1.0 / 1.5]))
        assert abs(float(f[0]) - 0.04) < 1e-3
        assert not bool(tir[0])

    def test_dielectric_tir(self):
        # from dense side beyond critical angle
        f, tir = dielectric(jnp.asarray([0.2]), jnp.asarray([1.5]))
        assert bool(tir[0]) and float(f[0]) == 1.0


class TestGGX:
    def test_ndf_normalization(self):
        """Integral of D(h) cos(h) over the hemisphere == 1 (1D quadrature:
        D depends only on cos_theta)."""
        m = 1 << 16
        c = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
        for rough in (0.2, 0.5, 1.0):
            alpha = jnp.full(m, rough * rough)
            est = float(jnp.mean(ggx.ndf_d(alpha, c) * c)) * 2.0 * np.pi
            assert abs(est - 1.0) < 0.01, (rough, est)

    def test_vndf_pdf_integrates_to_one(self):
        # stratified (cos, phi) quadrature over the upper hemisphere
        nc, nph = 1024, 256
        c = (np.arange(nc) + 0.5) / nc
        ph = (np.arange(nph) + 0.5) / nph * 2 * np.pi
        cc, pp = np.meshgrid(c, ph, indexing="ij")
        s = np.sqrt(1 - cc**2)
        d = Vec3(
            jnp.asarray((s * np.cos(pp)).ravel().astype(np.float32)),
            jnp.asarray((s * np.sin(pp)).ravel().astype(np.float32)),
            jnp.asarray(cc.ravel().astype(np.float32)),
        )
        m = nc * nph
        wi = _fixed_wi(m)
        for rough in (0.3, 0.8):
            alpha = jnp.full(m, rough * rough)
            pdf = ggx.vndf_pdf(alpha, wi, d)
            est = float(jnp.mean(pdf)) * 2.0 * np.pi  # d(cos) x d(phi) measure
            assert abs(est - 1.0) < 0.01, (rough, est)

    def test_reflect_sample_matches_pdf(self):
        """pdf returned by the sampler == reflect_pdf of the sampled wo."""
        u0, u1, _ = _uniforms(N, 3)
        wi = _fixed_wi(N)
        alpha = jnp.full(N, 0.25)
        wo, pdf_s = ggx.reflect_sample(alpha, wi, u0, u1)
        pdf_e = ggx.reflect_pdf(alpha, wi, wo)
        ok = pdf_s > 0
        rel = jnp.abs(pdf_s - pdf_e) / jnp.maximum(pdf_e, 1e-6)
        assert float(jnp.max(jnp.where(ok, rel, 0.0))) < 1e-2

    def test_reflect_reciprocity(self):
        u0, u1, _ = _uniforms(256, 4)
        wi = _fixed_wi(256, 0.7)
        alpha = jnp.full(256, 0.36)
        wo, pdf_s = ggx.reflect_sample(alpha, wi, u0, u1)
        f1 = ggx.reflect_eval(alpha, wi, wo)
        f2 = ggx.reflect_eval(alpha, wo, wi)
        ok = np.asarray(pdf_s > 0)
        np.testing.assert_allclose(
            np.asarray(f1)[ok], np.asarray(f2)[ok], rtol=1e-4
        )

    def test_white_furnace_energy(self):
        """MC integral of f*cos via VNDF sampling ~= E from the albedo table."""
        u0, u1, _ = _uniforms(N, 5)
        wi = _fixed_wi(N, 0.8)
        for rough in (0.3, 0.7):
            alpha = jnp.full(N, rough * rough)
            wo, pdf_s = ggx.reflect_sample(alpha, wi, u0, u1)
            fv = ggx.reflect_eval(alpha, wi, wo)
            ok = pdf_s > 0
            est = float(
                jnp.mean(jnp.where(ok, fv * jnp.abs(wo.z) / jnp.maximum(pdf_s, 1e-12), 0.0))
            )
            tab = float(ggx.glossy_reflectance(jnp.asarray([rough]), jnp.asarray([0.8]))[0])
            assert abs(est - tab) < 0.03, (rough, est, tab)
            assert est <= 1.01

    def test_refraction_direction(self):
        """Sampled refraction obeys Snell at low roughness."""
        n = 1024
        u0, u1, _ = _uniforms(n, 6)
        wi = _fixed_wi(n, 0.8)
        alpha = jnp.full(n, 1e-4)
        wo, pdf_s = ggx.refract_sample(alpha, jnp.full(n, 1.5), wi, u0, u1)
        ok = np.asarray(pdf_s > 0)
        assert ok.mean() > 0.9
        sin_i = np.sqrt(1 - 0.8**2)
        sin_t = np.sqrt(np.maximum(0, 1 - np.asarray(wo.z) ** 2))
        np.testing.assert_allclose(sin_t[ok], sin_i / 1.5, atol=2e-3)
        assert np.all(np.asarray(wo.z)[ok] < 0)


class TestComposite:
    def test_diffuse_furnace(self):
        """Pure Lambertian: E[g] == albedo."""
        p = _params(N, diffuse=(0.7, 0.5, 0.3), specular=(0, 0, 0), ior=0.0)
        wi = _fixed_wi(N)
        u0, u1, u2 = _uniforms(N, 7)
        s = sample(p, wi, u0, u1, u2)
        assert bool(jnp.all(s.valid))
        for ch, want in zip((s.g.x, s.g.y, s.g.z), (0.7, 0.5, 0.3)):
            assert abs(float(jnp.mean(ch)) - want) < 5e-3

    def test_sample_pdf_agreement(self):
        """f_and_pdf of a sampled direction agrees with the sampler's pdf/g
        (bsdf_test.h: 'f_and_p vs sample pdf agreement within 3%')."""
        p = _params(N, specular=(0.5, 0.5, 0.5), roughness=0.3)
        wi = _fixed_wi(N, 0.7)
        u0, u1, u2 = _uniforms(N, 8)
        s = sample(p, wi, u0, u1, u2)
        fv, pd = f_and_pdf(p, wi, s.wo)
        ok = np.asarray(s.valid)
        np.testing.assert_allclose(
            np.asarray(pd)[ok], np.asarray(s.pdf)[ok], rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(fv.x)[ok], np.asarray(s.f.x)[ok], rtol=1e-3
        )

    def test_composite_energy_bounded(self):
        """Layered white-ish material never gains energy."""
        p = _params(N, diffuse=(1, 1, 1), specular=(1, 1, 1), roughness=0.4)
        wi = _fixed_wi(N, 0.6)
        u0, u1, u2 = _uniforms(N, 9)
        s = sample(p, wi, u0, u1, u2)
        e = float(jnp.mean(jnp.where(s.valid, s.g.x, 0.0)))
        assert e <= 1.02, e

    def test_estimator_unbiased_vs_uniform(self):
        """MC reflectance via lobe sampling == via uniform sphere sampling."""
        p = _params(N, diffuse=(0.4, 0.4, 0.4), specular=(0.6, 0.6, 0.6), roughness=0.4)
        wi = _fixed_wi(N, 0.75)
        u0, u1, u2 = _uniforms(N, 10)
        s = sample(p, wi, u0, u1, u2)
        est_lobe = float(jnp.mean(jnp.where(s.valid, s.g.x, 0.0)))
        d = square_to_uniform_sphere(u0, u1)
        fv, _ = f_and_pdf(p, wi, d)
        est_uni = float(jnp.mean(fv.x * jnp.abs(d.z))) * 4.0 * np.pi
        assert abs(est_lobe - est_uni) < 0.03, (est_lobe, est_uni)

    def test_opacity_routes_to_transmission(self):
        p = _params(N, diffuse=(0.8, 0.8, 0.8), specular=(0.04,) * 3, roughness=0.1,
                    opacity=0.0, ior=1.5)
        wi = _fixed_wi(N, 0.9)
        u0, u1, u2 = _uniforms(N, 11)
        s = sample(p, wi, u0, u1, u2)
        # nearly everything transmits to the lower hemisphere
        frac_below = float(jnp.mean(jnp.where(s.valid, (s.wo.z < 0).astype(jnp.float32), 0.0)))
        assert frac_below > 0.8


class TestClearcoat:
    """The 5th, perfectly-specular coat layer (bsdf.h:102-135, 1202-1232)."""

    def test_fresnel_limits(self):
        from fermat_tpu.bsdf.composite import clearcoat_fresnel

        n = 4
        p = _params(n, reflectivity=(0.3, 0.2, 0.1))
        # normal incidence -> Fc == reflectivity
        wi_n = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
        fc = clearcoat_fresnel(p, wi_n)
        np.testing.assert_allclose(np.asarray(fc.x), 0.3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(fc.z), 0.1, atol=2e-3)
        # grazing -> toward white, channels converge (exact dielectric
        # Fresnel with ior ~3.4 reaches ~0.86 at cos=0.02, 1 in the limit)
        fc_g = clearcoat_fresnel(p, _fixed_wi(n, z=0.02))
        assert (np.asarray(fc_g.x) > 0.8).all()
        assert (np.asarray(fc_g.z) > 0.8).all()
        fc_g2 = clearcoat_fresnel(p, _fixed_wi(n, z=0.002))
        assert (np.asarray(fc_g2.z) > np.asarray(fc_g.z)).all()
        # no coating -> exactly zero at every angle
        p0 = _params(n)
        for z in (1.0, 0.5, 0.05):
            fc0 = clearcoat_fresnel(p0, _fixed_wi(n, z=max(z, 1e-3)))
            assert float(jnp.abs(fc0.x).max()) == 0.0

    def test_uncoated_material_unchanged(self):
        """clearcoat=True with reflectivity == 0 must be bit-identical to
        the 4-lobe model (static elision sanity)."""
        from fermat_tpu.bsdf.composite import f_and_pdf, sample

        n = 256
        p = _params(n, specular=(0.4, 0.4, 0.4), roughness=0.2)
        wi = _fixed_wi(n)
        u0, u1, u2 = _uniforms(n, seed=3)
        s_off = sample(p, wi, u0, u1, u2)
        s_on = sample(p, wi, u0, u1, u2, clearcoat=True)
        np.testing.assert_array_equal(np.asarray(s_off.wo.z), np.asarray(s_on.wo.z))
        np.testing.assert_array_equal(np.asarray(s_off.g.x), np.asarray(s_on.g.x))
        f0, pd0 = f_and_pdf(p, wi, s_off.wo)
        f1, pd1 = f_and_pdf(p, wi, s_off.wo, clearcoat=True)
        np.testing.assert_array_equal(np.asarray(f0.x), np.asarray(f1.x))
        np.testing.assert_array_equal(np.asarray(pd0), np.asarray(pd1))

    def test_coat_samples_mirror_direction(self):
        from fermat_tpu.bsdf.composite import CLEARCOAT_REFL, sample

        n = 4096
        p = _params(n, reflectivity=(0.5, 0.5, 0.5))
        wi = _fixed_wi(n, z=0.4)
        u0, u1, u2 = _uniforms(n, seed=5)
        s = sample(p, wi, u0, u1, u2, clearcoat=True)
        cc = np.asarray(s.component) == CLEARCOAT_REFL
        assert cc.mean() > 0.2  # Fc(0.4) is large for R0=0.5
        # mirror about the normal: (-wi.x, -wi.y, wi.z)
        np.testing.assert_allclose(np.asarray(s.wo.x)[cc], -np.asarray(wi.x)[cc], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s.wo.z)[cc], np.asarray(wi.z)[cc], rtol=1e-6)
        # delta pdf stand-in; finite g
        assert (np.asarray(s.pdf)[cc] > 1e29).all()
        assert np.isfinite(np.asarray(s.g.x)[cc]).all()

    def test_energy_conservation_with_coat(self):
        """One-sample throughput estimator of directional albedo stays <= 1
        for a coated white diffuse surface (coat redistributes, not adds)."""
        from fermat_tpu.bsdf.composite import sample

        n = 1 << 15
        p = _params(n, diffuse=(1.0, 1.0, 1.0), reflectivity=(0.25, 0.25, 0.25))
        wi = _fixed_wi(n, z=0.7)
        u0, u1, u2 = _uniforms(n, seed=7)
        s = sample(p, wi, u0, u1, u2, clearcoat=True)
        g = np.asarray(s.g.x)
        albedo = g[np.asarray(s.valid)].mean()
        assert albedo <= 1.02, albedo
        assert albedo > 0.5  # white diffuse + coat shouldn't destroy energy

    def test_pt_renders_coated_scene(self):
        """End-to-end: a coated cornell floor renders finite and brighter in
        specular reflections than the uncoated one."""
        from fermat_tpu.render.context import RenderingContext
        from fermat_tpu.scene.procedural import cornell_box, cornell_camera

        scene = cornell_box(light_size=2.0)
        for m in scene.materials:
            if m.name == "white":
                m.reflectivity = (0.3, 0.3, 0.3)
        ctx = RenderingContext.create(
            scene, cornell_camera(), 24, 24, renderer="pt", max_path_length=3)
        assert ctx.renderer_options.get("clearcoat") is True
        img = np.asarray(ctx.render(4).composited)
        assert np.isfinite(img).all()
        assert img.max() > 0.05
