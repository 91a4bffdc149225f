"""Fused discrete-CDF inversion + row fetch (Pallas TPU).

Primitive: given a row table (L, C), its inclusive CDF (L,), and per-lane
uniforms u, return rows[upper_bound(cdf, u)] — the inner loop of every
light/emitter/VPL pick (mesh_lights.cu:298-330 analog).

Why a kernel: the XLA formulation `sum(cdf[None, :] <= u[:, None])`
materializes the (N, L) compare matrix through HBM in a loop-tiled while
(measured 1.64 s/pass = 273 ms/bounce at N=1.43M, L=544 on the bathroom2
stand-in — PERF_ATTRIB_bathroom.md), and `searchsorted` lowers to a
~log2(L)-step gather loop that is even worse at scale. Here the CDF row
and the row table live in VMEM; each 1024-lane block does the compare+sum
pick in vregs and fetches rows with one one-hot MXU matmul — no (N, L)
intermediate ever exists.

Exact: picks are the same upper_bound as the XLA path; the row fetch is
an f32-exact one-hot matmul (Precision.HIGHEST — see STATUS.md round-3
table-matmul fix).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BLK = 1024
MAX_ROWS = 4096  # VMEM gate: 4096 x C x 4 B (C <= 32 -> 512 KB)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pick_fetch_kernel(u_ref, cdf_ref, rows_ref, out_ref, *, n_rows: int):
    """Pick + fetch with vreg-friendly shapes: the count uses a (BLK, Lp)
    compare in Lp/128-tile chunks against a lane-replicated cdf row."""
    lp = cdf_ref.shape[1]
    u_col = u_ref[:]  # (BLK, 1)
    idx = jnp.zeros((_BLK, 1), jnp.int32)
    for s in range(0, lp, 128):
        crow = cdf_ref[0, pl.ds(s, 128)].reshape(1, 128)
        cnt = jnp.sum((crow <= u_col).astype(jnp.int32), axis=1,
                      keepdims=True)
        idx = idx + cnt
    idx = jnp.minimum(idx, n_rows - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lp), 1)
    oh = (idx == lane).astype(jnp.float32)  # (BLK, Lp)
    out_ref[:] = jnp.dot(oh, rows_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=())
def cdf_pick_rows(rows: Array, cdf: Array, u: Array) -> Array:
    """rows (L, C) f32, cdf (L,) inclusive, u (N,) in [0,1) ->
    (N, C) = rows[min(upper_bound(cdf, u), L-1)].

    Falls back to the XLA compare+sum for tiny N or oversized L."""
    l, c = rows.shape
    n = u.shape[0]
    lp = -(-l // 128) * 128
    if l > MAX_ROWS or n < 4 * _BLK:
        tri = jnp.sum((cdf[None, :] <= u[:, None]).astype(jnp.int32), axis=1)
        tri = jnp.minimum(tri, l - 1)
        from fermat_tpu.ops.gather import gather_rows

        return gather_rows(rows, tri)
    # pad C to 32, not 128: the out array is (N, Cp) f32 in HBM, and at
    # N=1.43M the 128-wide padding wrote 734 MB per call (~40 ms of pure
    # HBM traffic) for 23 useful columns. Mosaic handles 32-lane blocks
    # (VMEM-padded internally); HBM transfers stay dense at 128 B/row.
    cp = max(32, -(-c // 32) * 32)
    rows_p = jnp.pad(rows, ((0, lp - l), (0, cp - c)))
    cdf_p = jnp.pad(cdf, (0, lp - l), constant_values=2.0).reshape(1, lp)
    n_pad = -(-n // _BLK) * _BLK
    u_p = jnp.pad(u, (0, n_pad - n)).reshape(n_pad, 1)
    g = n_pad // _BLK
    out = pl.pallas_call(
        functools.partial(_pick_fetch_kernel, n_rows=l),
        out_shape=jax.ShapeDtypeStruct((n_pad, cp), jnp.float32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((_BLK, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, lp), lambda i: (0, 0)),
            pl.BlockSpec((lp, cp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_BLK, cp), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(u_p, cdf_p, rows_p)
    return out[:n, :c]
