"""BSDF inversion round-trip tests.

Reference analog: cugar/bsdf/bsdf_test.h:49-130 — sample -> invert ->
compare primary coords, and invert -> re-sample -> compare directions
(invert_layer's MAXIMUM_INVERSION_ERROR check, path_inversion.h:186-210).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermat_tpu.bsdf import ggx
from fermat_tpu.bsdf import inversion
from fermat_tpu.bsdf.composite import ALL_LOBES, BsdfParams, sample as bsdf_sample
from fermat_tpu.core.math import Vec3
from fermat_tpu.core.sampling import square_to_cosine_hemisphere


def _rand_wi(n, key, z_sign=1.0):
    k0, k1 = jax.random.split(key)
    u0 = jax.random.uniform(k0, (n,))
    u1 = jax.random.uniform(k1, (n,))
    d = square_to_cosine_hemisphere(u0, u1)
    return Vec3(d.x, d.y, d.z * z_sign)


def _params(n, diffuse=0.5, spec=0.8, rough=0.35, ior=1.5, opacity=1.0):
    c = lambda v: jnp.full((n,), v, jnp.float32)
    v3 = lambda v: Vec3(c(v), c(v), c(v))
    return BsdfParams(
        diffuse=v3(diffuse), diffuse_trans=v3(0.0), specular=v3(spec),
        roughness=c(rough), ior=c(ior), opacity=c(opacity),
    )


def test_cosine_hemisphere_roundtrip():
    n = 512
    u0 = jax.random.uniform(jax.random.PRNGKey(1), (n,))
    u1 = jax.random.uniform(jax.random.PRNGKey(2), (n,))
    wo = square_to_cosine_hemisphere(u0, u1)
    r0, r1, ok = inversion.invert_cosine_hemisphere(wo)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(r0), np.asarray(u0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(u1), atol=2e-5)


@pytest.mark.parametrize("rough", [0.1, 0.35, 0.8])
def test_vndf_roundtrip(rough):
    n = 512
    key = jax.random.PRNGKey(3)
    wi = _rand_wi(n, key)
    alpha = jnp.full((n,), rough * rough)
    u0 = jax.random.uniform(jax.random.PRNGKey(4), (n,))
    u1 = jax.random.uniform(jax.random.PRNGKey(5), (n,))
    h = ggx.sample_vndf(alpha, wi, u0, u1)
    r0, r1, ok = inversion.invert_vndf(alpha, wi, h)
    okn = np.asarray(ok)
    assert okn.mean() > 0.99
    # re-sample with the recovered coords and compare the half vectors
    h2 = ggx.sample_vndf(alpha, wi, r0, r1)
    d = np.asarray(h.x * h2.x + h.y * h2.y + h.z * h2.z)
    assert (1.0 - d[okn]).max() < 1e-4


@pytest.mark.parametrize("rough", [0.15, 0.5])
def test_ggx_reflect_roundtrip(rough):
    n = 512
    wi = _rand_wi(n, jax.random.PRNGKey(7))
    alpha = jnp.full((n,), rough * rough)
    u0 = jax.random.uniform(jax.random.PRNGKey(8), (n,))
    u1 = jax.random.uniform(jax.random.PRNGKey(9), (n,))
    wo, pdf = ggx.reflect_sample(alpha, wi, u0, u1)
    valid = np.asarray(pdf) > 0
    r0, r1, ok = inversion.invert_ggx_reflect(alpha, wi, wo)
    wo2, _ = ggx.reflect_sample(alpha, wi, r0, r1)
    d = np.asarray(wo.x * wo2.x + wo.y * wo2.y + wo.z * wo2.z)
    m = valid & np.asarray(ok)
    assert m.mean() > 0.9
    assert (1.0 - d[m]).max() < 1e-4


def test_ggx_refract_roundtrip():
    n = 512
    wi = _rand_wi(n, jax.random.PRNGKey(11))
    alpha = jnp.full((n,), 0.3 * 0.3)
    ior = jnp.full((n,), 1.5)
    u0 = jax.random.uniform(jax.random.PRNGKey(12), (n,))
    u1 = jax.random.uniform(jax.random.PRNGKey(13), (n,))
    wo, pdf = ggx.refract_sample(alpha, ior, wi, u0, u1)
    valid = np.asarray(pdf) > 0
    r0, r1, ok = inversion.invert_ggx_refract(alpha, ior, wi, wo)
    wo2, pdf2 = ggx.refract_sample(alpha, ior, wi, r0, r1)
    d = np.asarray(wo.x * wo2.x + wo.y * wo2.y + wo.z * wo2.z)
    m = valid & np.asarray(ok) & (np.asarray(pdf2) > 0)
    assert m.mean() > 0.85
    assert (1.0 - d[m]).max() < 1e-4


def test_composite_invert_roundtrip():
    """sample -> invert -> sample must reproduce the direction AND lobe."""
    n = 2048
    p = _params(n)
    wi = _rand_wi(n, jax.random.PRNGKey(21))
    ks = jax.random.split(jax.random.PRNGKey(22), 5)
    u0 = jax.random.uniform(ks[0], (n,))
    u1 = jax.random.uniform(ks[1], (n,))
    u2 = jax.random.uniform(ks[2], (n,))
    s = bsdf_sample(p, wi, u0, u1, u2, ALL_LOBES)
    u_comp = jax.random.uniform(ks[3], (n,))
    u_slot = jax.random.uniform(ks[4], (n,))
    inv = inversion.invert(p, wi, s.wo, u_comp, u_slot, ALL_LOBES)
    s2 = bsdf_sample(p, wi, inv.u0, inv.u1, inv.u2, ALL_LOBES)
    d = np.asarray(s.wo.x * s2.wo.x + s.wo.y * s2.wo.y + s.wo.z * s2.wo.z)
    m = np.asarray(s.valid & inv.ok & s2.valid)
    # classification can legitimately attribute wo to a different lobe than
    # the one that generated it; require the re-sampled DIRECTION to match
    # whenever the attributed lobe equals the re-sample lobe (always true by
    # construction of u2 placement)
    same_lobe = np.asarray(inv.component == s2.component)
    assert (m & same_lobe).mean() > 0.9
    assert (1.0 - d[m & same_lobe]).max() < 5e-4


def test_composite_invert_pdf_matches_forward():
    """The inversion Jacobian must equal the forward per-lobe pdf x p_sel."""
    n = 1024
    p = _params(n, rough=0.4)
    wi = _rand_wi(n, jax.random.PRNGKey(31))
    ks = jax.random.split(jax.random.PRNGKey(32), 5)
    u0 = jax.random.uniform(ks[0], (n,))
    u1 = jax.random.uniform(ks[1], (n,))
    u2 = jax.random.uniform(ks[2], (n,))
    s = bsdf_sample(p, wi, u0, u1, u2, ALL_LOBES)
    inv = inversion.invert(
        p, wi, s.wo, jax.random.uniform(ks[3], (n,)),
        jax.random.uniform(ks[4], (n,)), ALL_LOBES,
    )
    # summing the inversion pdf over lobes consistent with wo reproduces the
    # forward mixture pdf; with pdf-proportional classification, E over
    # u_comp of pdf/classification-prob is exactly the mixture pdf. Check the
    # mixture bound instead: inversion pdf <= mixture pdf (+eps).
    m = np.asarray(s.valid & inv.ok)
    assert (np.asarray(inv.pdf)[m] <= np.asarray(s.pdf)[m] * (1 + 1e-3) + 1e-6).all()
