"""Morton (Z-order) codes — cugar/bits/morton.h analog, vectorized u32 ops."""
from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def expand_bits_3d(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(_U32)
    v = (v * _U32(0x00010001)) & _U32(0xFF0000FF)
    v = (v * _U32(0x00000101)) & _U32(0x0F00F00F)
    v = (v * _U32(0x00000011)) & _U32(0xC30C30C3)
    v = (v * _U32(0x00000005)) & _U32(0x49249249)
    return v


def morton3d(x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """30-bit 3D morton code from float coords in [0,1]^3."""
    scale = jnp.float32(1023.0)
    xi = jnp.clip(x * scale, 0.0, 1023.0).astype(_U32)
    yi = jnp.clip(y * scale, 0.0, 1023.0).astype(_U32)
    zi = jnp.clip(z * scale, 0.0, 1023.0).astype(_U32)
    return (expand_bits_3d(xi) << 2) | (expand_bits_3d(yi) << 1) | expand_bits_3d(zi)


def expand_bits_2d(v: jax.Array) -> jax.Array:
    v = v.astype(_U32)
    v = (v | (v << 8)) & _U32(0x00FF00FF)
    v = (v | (v << 4)) & _U32(0x0F0F0F0F)
    v = (v | (v << 2)) & _U32(0x33333333)
    v = (v | (v << 1)) & _U32(0x55555555)
    return v


def morton2d(x: jax.Array, y: jax.Array) -> jax.Array:
    """32-bit 2D morton code from float coords in [0,1]^2."""
    scale = jnp.float32(65535.0)
    xi = jnp.clip(x * scale, 0.0, 65535.0).astype(_U32)
    yi = jnp.clip(y * scale, 0.0, 65535.0).astype(_U32)
    return (expand_bits_2d(yi) << 1) | expand_bits_2d(xi)
