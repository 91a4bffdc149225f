"""Fresnel terms — cugar/bsdf/fresnel.h analog."""
from __future__ import annotations

import jax.numpy as jnp

from fermat_tpu.core.math import Vec3


def schlick(cos_theta, f0: Vec3) -> Vec3:
    """Schlick approximation with Vec3 F0 (cugar::fresnel_schlick)."""
    c = jnp.clip(jnp.abs(cos_theta), 0.0, 1.0)
    m = 1.0 - c
    m2 = m * m
    w = m2 * m2 * m  # (1-c)^5
    return Vec3(
        f0.x + (1.0 - f0.x) * w,
        f0.y + (1.0 - f0.y) * w,
        f0.z + (1.0 - f0.z) * w,
    )


def dielectric(cos_i, eta):
    """Exact unpolarized dielectric Fresnel reflectance.

    cos_i: |cos| of the incident angle (>=0); eta = n_i/n_t relative IoR.
    Returns (F, total_internal_reflection mask).
    """
    c = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - c * c)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    r_par = (cos_t - eta * c) / jnp.maximum(cos_t + eta * c, 1e-12)
    r_perp = (c - eta * cos_t) / jnp.maximum(c + eta * cos_t, 1e-12)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, f), tir
