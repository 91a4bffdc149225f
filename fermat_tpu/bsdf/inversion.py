"""BSDF sampling inversion — map (wi, wo) back to primary sample coords.

Reference analog: src/path_inversion.h:59-300 (`BsdfInverse`,
`invert_bsdf`, `invert_layer`) and the per-model `invert` methods in
cugar/bsdf/{lambert,ggx_smith}.h. Used by the MCMC renderers to move
between path space and primary-sample space: CMLT chart swaps re-express a
path in a different (s,t) chart by inverting every scatter decision
(cmlt.cu:613-644), and the sample->invert->sample round trip is the
reference's own consistency test (cugar/bsdf/bsdf_test.h:49-130).

Every map here is the exact inverse of the corresponding forward warp in
fermat_tpu.bsdf.{composite,ggx} / core.sampling:

  * cosine hemisphere:  u0 = 1 - z^2,  u1 = atan2(y, x)/2pi
  * GGX VNDF (Heitz spherical-cap): unstretch -> project onto the (t1, t2)
    cap basis -> un-blend the lower-cap mix -> polar coords -> (u0, u1)
  * reflection:   h = normalize(wi + wo), then VNDF inverse
  * transmission: h = -normalize(eta_i wi + eta_o wo), then VNDF inverse
  * lobe selection: u2 is recovered uniformly inside the chosen lobe's
    CDF interval (path_inversion.h:288 "z.z = z.z * w1" pattern)

All functions are flat-lane jnp math (chains = lanes).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fermat_tpu.bsdf import ggx
from fermat_tpu.bsdf.composite import (
    DIFFUSE_REFL,
    DIFFUSE_TRANS,
    GLOSSY_REFL,
    GLOSSY_TRANS,
    ALL_LOBES,
    BsdfParams,
    _selection_probs,
)
from fermat_tpu.core.math import Vec3, dot, normalize
from fermat_tpu.core.sampling import INV_PI, TWO_PI

Array = jax.Array


def _wrap01(x: Array) -> Array:
    return x - jnp.floor(x)


# ---------------------------------------------------------------------------
# Elementary warps
# ---------------------------------------------------------------------------

def invert_cosine_hemisphere(wo: Vec3) -> Tuple[Array, Array, Array]:
    """Inverse of square_to_cosine_hemisphere for +z-hemisphere wo.

    Returns (u0, u1, ok).
    """
    z = wo.z
    ok = z > 0.0
    u0 = jnp.clip(1.0 - z * z, 0.0, 1.0)
    phi = jnp.arctan2(wo.y, wo.x)
    u1 = _wrap01(phi / TWO_PI)
    return u0, u1, ok


def invert_vndf(alpha, wi: Vec3, h: Vec3) -> Tuple[Array, Array, Array]:
    """Inverse of ggx.sample_vndf: recover (u0, u1) that produce h from wi.

    wi must be in the +z hemisphere (callers flip). Returns (u0, u1, ok).
    """
    # stretch h back: forward did h = normalize(alpha*nh.x, alpha*nh.y, nh.z)
    nh = normalize(Vec3(h.x / alpha, h.y / alpha, h.z))
    v = normalize(Vec3(alpha * wi.x, alpha * wi.y, wi.z))
    lensq = v.x * v.x + v.y * v.y
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    t1 = Vec3(
        jnp.where(lensq > 1e-12, -v.y * inv, 1.0),
        jnp.where(lensq > 1e-12, v.x * inv, 0.0),
        jnp.zeros_like(v.z),
    )
    t2 = Vec3(
        v.y * t1.z - v.z * t1.y,
        v.z * t1.x - v.x * t1.z,
        v.x * t1.y - v.y * t1.x,
    )
    p1 = dot(nh, t1)
    p2b = dot(nh, t2)  # blended second coordinate
    p3 = dot(nh, v)
    s = 0.5 * (1.0 + v.z)
    disc = jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0))
    p2 = (p2b - (1.0 - s) * disc) / jnp.maximum(s, 1e-8)
    r2 = p1 * p1 + p2 * p2
    ok = (p3 >= 0.0) & (r2 <= 1.0 + 1e-6)
    u0 = jnp.clip(r2, 0.0, 1.0)
    phi = jnp.arctan2(p2, p1)
    u1 = _wrap01(phi / TWO_PI)
    return u0, u1, ok


def invert_ggx_reflect(alpha, wi: Vec3, wo: Vec3) -> Tuple[Array, Array, Array]:
    """Inverse of ggx.reflect_sample."""
    flip = jnp.where(wi.z < 0, -1.0, 1.0)
    wiu = Vec3(wi.x * flip, wi.y * flip, wi.z * flip)
    wou = Vec3(wo.x * flip, wo.y * flip, wo.z * flip)
    same = wou.z > 0.0
    h = normalize(wiu + wou)
    u0, u1, ok = invert_vndf(alpha, wiu, h)
    return u0, u1, ok & same


def invert_ggx_refract(alpha, ior, wi: Vec3, wo: Vec3) -> Tuple[Array, Array, Array]:
    """Inverse of ggx.refract_sample (Walter 2007 half-vector recovery)."""
    flip = jnp.where(wi.z < 0, -1.0, 1.0)
    wiu = Vec3(wi.x * flip, wi.y * flip, wi.z * flip)
    wou = Vec3(wo.x * flip, wo.y * flip, wo.z * flip)
    opposite = wou.z < 0.0
    # eta = eta_t/eta_i for the flipped (incoming-above) configuration
    eta = ior
    h = normalize(Vec3(wiu.x + wou.x * eta, wiu.y + wou.y * eta, wiu.z + wou.z * eta))
    h = h * jnp.where(h.z < 0, -1.0, 1.0)
    u0, u1, ok = invert_vndf(alpha, wiu, h)
    return u0, u1, ok & opposite


# ---------------------------------------------------------------------------
# Composite BSDF inversion (BsdfInverse analog)
# ---------------------------------------------------------------------------

class BsdfInversion(NamedTuple):
    """Result of inverting one scatter event."""

    u0: Array
    u1: Array
    u2: Array  # selection coordinate placed inside the chosen lobe interval
    component: Array  # int32 lobe id the inversion attributed (wo -> lobe)
    pdf: Array  # solid-angle pdf of re-sampling wo via that lobe x selection
    ok: Array


def classify_component(p: BsdfParams, wi: Vec3, wo: Vec3, u_comp: Array,
                       lobes=ALL_LOBES) -> Array:
    """Pick which lobe to attribute wo to, weighted by each lobe's pdf
    (the reference's kPdfComponentSelection strategy, path_inversion.h:66).

    u_comp drives the stochastic choice between lobes that could both have
    produced wo (e.g. diffuse + glossy reflection on the same side).
    """
    alpha = ggx._alpha(p.roughness)
    same = (wi.z * wo.z) > 0.0
    zero = jnp.zeros_like(wo.z)
    abs_co = jnp.abs(wo.z)
    p_dr, p_dt, p_gr, p_gt, _p_cc = _selection_probs(p, wi, lobes)
    w_dr = p_dr * (jnp.where(same, abs_co * INV_PI, 0.0) if lobes[0] else zero)
    w_dt = p_dt * (jnp.where(~same, abs_co * INV_PI, 0.0) if lobes[1] else zero)
    w_gr = p_gr * (ggx.reflect_pdf(alpha, wi, wo) if lobes[2] else zero)
    w_gt = p_gt * (ggx.refract_pdf(alpha, p.ior, wi, wo) if lobes[3] else zero)
    total = jnp.maximum(w_dr + w_dt + w_gr + w_gt, 1e-20)
    c0 = w_dr / total
    c1 = c0 + w_dt / total
    c2 = c1 + w_gr / total
    comp = (
        jnp.where(u_comp < c0, DIFFUSE_REFL,
        jnp.where(u_comp < c1, DIFFUSE_TRANS,
        jnp.where(u_comp < c2, GLOSSY_REFL, GLOSSY_TRANS)))
    ).astype(jnp.int32)
    return comp


def invert(
    p: BsdfParams,
    wi: Vec3,
    wo: Vec3,
    u_comp: Array,
    u_slot: Array,
    lobes=ALL_LOBES,
) -> BsdfInversion:
    """Invert composite sampling: find (u0, u1, u2) s.t. composite.sample
    reproduces wo (through the attributed lobe).

    u_comp picks the lobe among those consistent with wo; u_slot places u2
    uniformly inside that lobe's selection interval. The round trip
    sample(invert(wo)) == wo holds whenever `ok` (cf. invert_layer's
    MAXIMUM_INVERSION_ERROR check, path_inversion.h:186-210).
    """
    alpha = ggx._alpha(p.roughness)
    comp = classify_component(p, wi, wo, u_comp, lobes)
    side = jnp.where(wi.z >= 0, 1.0, -1.0)

    # per-lobe inversions (branchless; selected by comp)
    wo_r = Vec3(wo.x, wo.y, wo.z * side)  # into +z hemisphere for dr
    u0_dr, u1_dr, ok_dr = invert_cosine_hemisphere(wo_r)
    wo_t = Vec3(wo.x, wo.y, -wo.z * side)
    u0_dt, u1_dt, ok_dt = invert_cosine_hemisphere(wo_t)
    u0_gr, u1_gr, ok_gr = invert_ggx_reflect(alpha, wi, wo)
    u0_gt, u1_gt, ok_gt = invert_ggx_refract(alpha, p.ior, wi, wo)

    is_dr = comp == DIFFUSE_REFL
    is_dt = comp == DIFFUSE_TRANS
    is_gr = comp == GLOSSY_REFL

    u0 = jnp.where(is_dr, u0_dr, jnp.where(is_dt, u0_dt, jnp.where(is_gr, u0_gr, u0_gt)))
    u1 = jnp.where(is_dr, u1_dr, jnp.where(is_dt, u1_dt, jnp.where(is_gr, u1_gr, u1_gt)))
    ok = jnp.where(is_dr, ok_dr, jnp.where(is_dt, ok_dt, jnp.where(is_gr, ok_gr, ok_gt)))

    # place u2 inside the lobe's selection interval (CDF order dr|dt|gr|gt)
    p_dr, p_dt, p_gr, p_gt, _p_cc = _selection_probs(p, wi, lobes)
    lo = jnp.where(
        is_dr, 0.0,
        jnp.where(is_dt, p_dr, jnp.where(is_gr, p_dr + p_dt, p_dr + p_dt + p_gr)),
    )
    width = jnp.where(
        is_dr, p_dr, jnp.where(is_dt, p_dt, jnp.where(is_gr, p_gr, p_gt))
    )
    u2 = lo + u_slot * width
    ok = ok & (width > 0.0)

    # pdf of this inversion = p_sel(lobe) x per-lobe solid-angle pdf
    same = (wi.z * wo.z) > 0.0
    abs_co = jnp.abs(wo.z)
    zero = jnp.zeros_like(abs_co)
    pdf_lobe = jnp.where(
        is_dr, jnp.where(same, abs_co * INV_PI, 0.0),
        jnp.where(
            is_dt, jnp.where(~same, abs_co * INV_PI, 0.0),
            jnp.where(
                is_gr,
                ggx.reflect_pdf(alpha, wi, wo) if lobes[2] else zero,
                ggx.refract_pdf(alpha, p.ior, wi, wo) if lobes[3] else zero,
            ),
        ),
    )
    p_sel = jnp.where(is_dr, p_dr, jnp.where(is_dt, p_dt, jnp.where(is_gr, p_gr, p_gt)))
    return BsdfInversion(u0=u0, u1=u1, u2=u2, component=comp,
                         pdf=pdf_lobe * p_sel, ok=ok)
