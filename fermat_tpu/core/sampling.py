"""Sampling warps and MIS heuristics.

Reference analogs: cugar/sampling/distributions.h:98-545 (uniform/cosine/...),
cugar/spherical/mappings.h (square<->sphere/hemisphere warps), and the MIS
weights used throughout src/pathtracer_core.h / src/bpt_utils.h.
"""
from __future__ import annotations

import jax.numpy as jnp

from fermat_tpu.core.math import Vec3

TWO_PI = 6.283185307179586
INV_PI = 0.3183098861837907
PI = 3.141592653589793


def square_to_cosine_hemisphere(u0, u1) -> Vec3:
    """Cosine-weighted hemisphere about +z (pdf = cos/pi)."""
    r = jnp.sqrt(u0)
    phi = TWO_PI * u1
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u0))
    return Vec3(x, y, z)


def cosine_hemisphere_pdf(cos_theta):
    return jnp.maximum(cos_theta, 0.0) * INV_PI


def square_to_uniform_sphere(u0, u1) -> Vec3:
    z = 1.0 - 2.0 * u0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u1
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_disk(u0, u1):
    """Concentric (Shirley) disk mapping — low distortion."""
    ox = 2.0 * u0 - 1.0
    oy = 2.0 * u1 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        (PI / 4.0) * (oy / jnp.where(ox == 0.0, 1.0, ox)),
        (PI / 2.0) - (PI / 4.0) * (ox / jnp.where(oy == 0.0, 1.0, oy)),
    )
    r = jnp.where(zero, 0.0, r)
    theta = jnp.where(zero, 0.0, theta)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def square_to_uniform_triangle(u0, u1):
    """Uniform barycentrics on a triangle (sqrt warp)."""
    su0 = jnp.sqrt(u0)
    b0 = 1.0 - su0
    b1 = u1 * su0
    return b0, b1


# ---------------------------------------------------------------------------
# MIS heuristics — reference uses the power heuristic throughout
# (mis_selector / pdf products in pathtracer_core.h:773-1254, bpt_utils.h).
# ---------------------------------------------------------------------------

def balance_heuristic(pdf_a, pdf_b):
    """a/(a+b) in overflow-safe ratio form (f32 pdfs can reach ~1e27)."""
    r = pdf_b / jnp.maximum(pdf_a, 1e-32)
    return jnp.where(pdf_a > 0.0, 1.0 / (1.0 + r), 0.0)


def power_heuristic(pdf_a, pdf_b):
    """a^2/(a^2+b^2) in ratio form: naive squaring overflows f32 to inf/inf
    = NaN for sharp GGX pdfs; 1/(1+r^2) degrades gracefully (r=inf -> 0)."""
    r = pdf_b / jnp.maximum(pdf_a, 1e-32)
    return jnp.where(pdf_a > 0.0, 1.0 / (1.0 + r * r), 0.0)


def pdf_solid_angle_to_area(pdf_sa, dist2, cos_theta):
    """p_A = p_sa * |cos| / r^2 (measure conversion, bpt_utils.h)."""
    return pdf_sa * jnp.abs(cos_theta) / jnp.maximum(dist2, 1e-20)


def pdf_area_to_solid_angle(pdf_a, dist2, cos_theta):
    return pdf_a * dist2 / jnp.maximum(jnp.abs(cos_theta), 1e-8)
