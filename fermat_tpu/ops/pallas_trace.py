"""Pallas TPU kernels for ray-triangle intersection (small-scene path).

Reference analog: the OptiX ray-gen programs + RTContext::trace
(src/kernels/optix_rt.cu, src/rt.cpp:558-650). For scenes up to a few tens of
thousands of triangles the TPU-native optimum is NOT a tree: the whole
triangle soup lives in VMEM and every ray block tests every triangle tile as
dense (BLK x 128) VPU ops — zero divergence, zero gather traffic, one HBM
read of the rays and one write of the hits.

The XLA fallback (fermat_tpu.accel.traverse.trace_closest_brute) computes the
same function; this kernel keeps all (BLK, 128) intermediates in
VMEM/registers instead of round-tripping them through HBM.

Layout: rays are (N, 1) columns blocked (BLK, 1) — rays ride the sublane
dim, triangle tiles ride the 128 lanes; argmin is expressed purely with lane
reductions (min + iota select) because Mosaic has no 2D gather.

Runs in interpret mode on CPU (tests) and compiled on TPU.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fermat_tpu.accel.traverse import Hit
from fermat_tpu.core.math import Vec3
from fermat_tpu.scene.mesh import MeshView

Array = jax.Array

_EPS_DET = 1e-12
TRI_TILE = 128
DEF_BLK = 512
_BIG = 3.0e38  # python float: jnp constants would be captured consts in the kernel


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pad_tris(mesh: MeshView):
    """Triangle soup as 9 (1, Tp) arrays padded to a TRI_TILE multiple.

    Padding triangles are degenerate (all zeros -> det == 0) and never hit.
    """
    t = mesh.n_triangles
    tp = -(-t // TRI_TILE) * TRI_TILE
    pad = tp - t

    def p(a):
        return jnp.pad(a, (0, pad)).reshape(1, tp)

    return (
        p(mesh.p0.x), p(mesh.p0.y), p(mesh.p0.z),
        p(mesh.e1.x), p(mesh.e1.y), p(mesh.e1.z),
        p(mesh.e2.x), p(mesh.e2.y), p(mesh.e2.z),
    )


def _trace_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    p0x_ref, p0y_ref, p0z_ref, e1x_ref, e1y_ref, e1z_ref,
    e2x_ref, e2y_ref, e2z_ref,
    t_out, tri_out, u_out, v_out,
    *, n_tiles: int,
):
    blk = ox_ref.shape[0]
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tmin = tmin_ref[:]
    tmax0 = tmax_ref[:]

    col = jax.lax.broadcasted_iota(jnp.int32, (blk, TRI_TILE), 1)

    def tile(j, carry):
        t_best, tri_best, u_best, v_best = carry  # (blk,1), (blk,1)i32, ...
        s = j * TRI_TILE
        ld = lambda ref: ref[0, pl.ds(s, TRI_TILE)].reshape(1, TRI_TILE)
        p0x, p0y, p0z = ld(p0x_ref), ld(p0y_ref), ld(p0z_ref)
        e1x, e1y, e1z = ld(e1x_ref), ld(e1y_ref), ld(e1z_ref)
        e2x, e2y, e2z = ld(e2x_ref), ld(e2y_ref), ld(e2z_ref)

        # Moller-Trumbore, (blk, TRI_TILE)
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(
            jnp.abs(det) > _EPS_DET, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0
        )
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        ok = (
            (jnp.abs(det) > _EPS_DET)
            & (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt > tmin)
            & (tt < t_best)
        )
        tt = jnp.where(ok, tt, _BIG)
        t_new = jnp.min(tt, axis=1, keepdims=True)  # (blk,1)
        got = t_new < t_best
        # first column achieving the min — reductions only, no gathers
        cand = jnp.where(tt == t_new, col, TRI_TILE)
        kmin = jnp.min(cand, axis=1, keepdims=True)  # (blk,1)
        onehot = col == kmin
        u_new = jnp.sum(jnp.where(onehot, uu, 0.0), axis=1, keepdims=True)
        v_new = jnp.sum(jnp.where(onehot, vv, 0.0), axis=1, keepdims=True)
        t_best = jnp.where(got, t_new, t_best)
        tri_best = jnp.where(got, s + kmin, tri_best)
        u_best = jnp.where(got, u_new, u_best)
        v_best = jnp.where(got, v_new, v_best)
        return t_best, tri_best, u_best, v_best

    init = (
        tmax0,
        jnp.full((blk, 1), -1, jnp.int32),
        jnp.zeros((blk, 1), jnp.float32),
        jnp.zeros((blk, 1), jnp.float32),
    )
    t_best, tri_best, u_best, v_best = jax.lax.fori_loop(0, n_tiles, tile, init)
    t_out[:] = t_best
    tri_out[:] = tri_best
    u_out[:] = u_best
    v_out[:] = v_best


@functools.partial(jax.jit, static_argnames=("block",))
def _trace_impl(tris, o, d, tmin, tmax, block: int):
    n = o[0].shape[0]
    n_pad = -(-n // block) * block
    pad = n_pad - n
    g = n_pad // block

    def pr(a):
        return jnp.pad(a, (0, pad)).reshape(n_pad, 1)

    rays = tuple(pr(a) for a in (*o, *d, tmin, tmax))
    tp = tris[0].shape[1]
    n_tiles = tp // TRI_TILE

    # rays: (N,1) columns blocked (block,1) — rays on sublanes; triangles:
    # full (1,Tp) rows resident in VMEM across all grid steps
    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    tri_spec = pl.BlockSpec((1, tp), lambda i: (0, 0))
    out_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    t, tri, u, v = pl.pallas_call(
        functools.partial(_trace_kernel, n_tiles=n_tiles),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        grid=(g,),
        in_specs=[ray_spec] * 8 + [tri_spec] * 9,
        out_specs=[out_spec] * 4,
        # larger ray blocks exceed the default 16 MiB scoped-vmem budget
        # (v5e has far more VMEM); see ops/pallas_cluster_trace.py
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(*rays, *tris)
    flat = lambda a: a.reshape(n_pad)[:n]  # (N,1) -> (N,)
    return flat(t), flat(tri), flat(u), flat(v)


def trace_closest_pallas(
    mesh: MeshView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
) -> Hit:
    """Closest-hit over the whole soup; drop-in for trace_closest_brute."""
    n = o.x.shape[0]
    tris = _pad_tris(mesh)
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        # inactive lanes: empty interval -> guaranteed miss at equal cost
        tmax_b = jnp.where(active, tmax_b, -1.0)
    t, tri, u, v = _trace_impl(
        tris, (o.x, o.y, o.z), (d.x, d.y, d.z), tmin_b, tmax_b, block
    )
    missed = tri < 0
    return Hit(
        t=jnp.where(missed, jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,)), t),
        tri=tri,
        u=u,
        v=v,
    )


def _any_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    p0x_ref, p0y_ref, p0z_ref, e1x_ref, e1y_ref, e1z_ref,
    e2x_ref, e2y_ref, e2z_ref,
    occ_out,
    *, n_tiles: int,
):
    """Occlusion-only kernel: no closest-hit bookkeeping (no argmin/u/v) —
    the shadow-program analog of optix_rt.cu's binary shadow ray-gen."""
    blk = ox_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]

    def tile(j, occ):
        s = j * TRI_TILE
        ld = lambda ref: ref[0, pl.ds(s, TRI_TILE)].reshape(1, TRI_TILE)
        p0x, p0y, p0z = ld(p0x_ref), ld(p0y_ref), ld(p0z_ref)
        e1x, e1y, e1z = ld(e1x_ref), ld(e1y_ref), ld(e1z_ref)
        e2x, e2y, e2z = ld(e2x_ref), ld(e2y_ref), ld(e2z_ref)
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(
            jnp.abs(det) > _EPS_DET, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0
        )
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        ok = (
            (jnp.abs(det) > _EPS_DET)
            & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > tmin) & (tt < tmax)
        )
        return occ | jnp.any(ok, axis=1, keepdims=True)

    occ = jax.lax.fori_loop(
        0, n_tiles, tile, jnp.zeros((blk, 1), bool)
    )
    occ_out[:] = occ


@functools.partial(jax.jit, static_argnames=("block",))
def _any_impl(tris, o, d, tmin, tmax, block: int):
    n = o[0].shape[0]
    n_pad = -(-n // block) * block
    pad = n_pad - n

    def pr(a):
        return jnp.pad(a, (0, pad)).reshape(n_pad, 1)

    rays = tuple(pr(a) for a in (*o, *d, tmin, tmax))
    tp = tris[0].shape[1]
    n_tiles = tp // TRI_TILE
    g = n_pad // block
    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    tri_spec = pl.BlockSpec((1, tp), lambda i: (0, 0))
    occ = pl.pallas_call(
        functools.partial(_any_kernel, n_tiles=n_tiles),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), bool),
        grid=(g,),
        in_specs=[ray_spec] * 8 + [tri_spec] * 9,
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        # larger ray blocks exceed the default 16 MiB scoped-vmem budget
        # (v5e has far more VMEM); see ops/pallas_cluster_trace.py
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(*rays, *tris)
    return occ.reshape(n_pad)[:n]


def trace_any_pallas(
    mesh: MeshView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
) -> Array:
    n = o.x.shape[0]
    tris = _pad_tris(mesh)
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    occ = _any_impl(tris, (o.x, o.y, o.z), (d.x, d.y, d.z), tmin_b, tmax_b, block)
    if active is not None:
        occ = occ & active
    return occ
