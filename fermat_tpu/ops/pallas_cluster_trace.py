"""Pallas TPU kernels: two-level clustered ray traversal (large scenes).

Reference analog: RTContext::trace / trace_shadow over the RTX BVH
(src/rt.cpp:558-650). See fermat_tpu.accel.cluster for why the TPU-native
"BVH" is a morton-cluster/group structure instead of a per-thread-stack
tree walk.

Kernel shape (per ray block, grid over blocks):
  phase 1  slab-test the block against ALL group AABBs as dense
           (BLK x 128) tiles; reduce over rays to a per-group any-hit
           mask in a VMEM scratch row. Branch-free, fully vectorized.
  phase 2  lax.fori_loop over groups; each iteration reads its mask flag
           and lax.cond-skips the group entirely (no DMA, no math) when
           the block provably misses its AABB. A taken group DMAs its
           (10, 8, 128) triangle rectangle from HBM into VMEM scratch
           (40 KB) and runs eight 128-triangle Moller-Trumbore tile tests
           — the same proven dense kernel as ops/pallas_trace.py, with the
           original triangle id carried as an f32 lane row (no gathers).

Rays ride the sublane dim as (BLK, 1) columns; triangle tiles ride the
128 lanes. All heavy math is (BLK, 128) VPU tiles. Triangle data is
HBM-resident — scene size is bounded by HBM, not VMEM.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fermat_tpu.accel.cluster import CLUSTER, GROUP, ClusterView
from fermat_tpu.accel.traverse import Hit
from fermat_tpu.core.math import Vec3

Array = jax.Array

_EPS_DET = 1e-12
DEF_BLK = 512
_BIG = 3.0e38
# the kernel's live (BLK, 128) temporaries exceed the compiler's default
# 16 MiB scoped-vmem budget at BLK=512; v5e has 128 MiB of VMEM
_VMEM_LIMIT = 64 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _mask_flag(mask_ref, g):
    """Read the per-group flag at dynamic index g from the (1, Gp) VMEM
    mask. A direct scalar load `mask_ref[0, g]` is illegal on Mosaic (the
    index is not provably 128-aligned); instead load the aligned 128-tile
    containing g and extract with an iota select + reduce."""
    base = (g // 128) * 128  # provably a multiple of 128
    tile = mask_ref[0, pl.ds(base, 128)].reshape(1, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return jnp.sum(jnp.where(lane == (g % 128), tile, 0)) > 0


def _mt_tile(ox, oy, oz, dx, dy, dz, tmin, t_lim, tri):
    """Moller-Trumbore of a (BLK,1) ray block vs a (1,128) triangle tile.

    Returns (tt, uu, vv, ok) as (BLK, 128)."""
    p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = tri
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
        & (tt > tmin) & (tt < t_lim)
    )
    return tt, uu, vv, ok


def _group_mask_phase(
    ox, oy, oz, dx, dy, dz, tmin, tmax0,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    mask_ref, n_gtiles: int,
):
    """Phase 1: per-group any-ray slab-hit mask into mask_ref (1, Gp)."""
    inv = lambda c: jnp.where(
        jnp.abs(c) > 1e-20, 1.0 / jnp.where(c == 0.0, 1.0, c),
        jnp.where(c >= 0, 1e20, -1e20),
    )
    idx, idy, idz = inv(dx), inv(dy), inv(dz)
    for gt in range(n_gtiles):
        s = gt * 128
        ld = lambda ref: ref[0, pl.ds(s, 128)].reshape(1, 128)
        lox, loy, loz = ld(lox_ref), ld(loy_ref), ld(loz_ref)
        hix, hiy, hiz = ld(hix_ref), ld(hiy_ref), ld(hiz_ref)
        t0x = (lox - ox) * idx
        t1x = (hix - ox) * idx
        t0y = (loy - oy) * idy
        t1y = (hiy - oy) * idy
        t0z = (loz - oz) * idz
        t1z = (hiz - oz) * idz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), tmin),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), tmax0),
        )
        any_hit = jnp.any(near <= far, axis=0, keepdims=True)  # (1, 128)
        mask_ref[:, pl.ds(s, 128)] = any_hit.astype(jnp.int32)


def _stage_group(tri_hbm, tri_vmem, sem, g):
    """DMA group g's (10, 8, 128) triangle rectangle HBM -> VMEM."""
    cp = pltpu.make_async_copy(
        tri_hbm.at[:, pl.ds(g * GROUP, GROUP), :], tri_vmem, sem
    )
    cp.start()
    cp.wait()


def _row(tri_vmem, comp: int, r: int):
    return tri_vmem[comp, r, :].reshape(1, CLUSTER)


def _closest_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    tri_hbm,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    t_out, tri_out, u_out, v_out,
    mask_ref, tri_vmem, sem,
    *, n_groups: int, n_gtiles: int,
):
    blk = ox_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax0 = tmax_ref[:]

    _group_mask_phase(
        ox, oy, oz, dx, dy, dz, tmin, tmax0,
        lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
        mask_ref, n_gtiles,
    )

    col = jax.lax.broadcasted_iota(jnp.int32, (blk, CLUSTER), 1)

    def group_body(g, carry):
        def work(carry):
            _stage_group(tri_hbm, tri_vmem, sem, g)
            t_best, id_best, u_best, v_best = carry
            for r in range(GROUP):
                tri = tuple(_row(tri_vmem, c, r) for c in range(9))
                tt, uu, vv, ok = _mt_tile(
                    ox, oy, oz, dx, dy, dz, tmin, t_best, tri
                )
                tt = jnp.where(ok, tt, _BIG)
                t_new = jnp.min(tt, axis=1, keepdims=True)
                got = t_new < t_best
                cand = jnp.where(tt == t_new, col, CLUSTER)
                kmin = jnp.min(cand, axis=1, keepdims=True)
                onehot = col == kmin
                ids = _row(tri_vmem, 9, r)
                id_new = jnp.sum(jnp.where(onehot, ids, 0.0), axis=1,
                                 keepdims=True)
                u_new = jnp.sum(jnp.where(onehot, uu, 0.0), axis=1,
                                keepdims=True)
                v_new = jnp.sum(jnp.where(onehot, vv, 0.0), axis=1,
                                keepdims=True)
                t_best = jnp.where(got, t_new, t_best)
                id_best = jnp.where(got, id_new, id_best)
                u_best = jnp.where(got, u_new, u_best)
                v_best = jnp.where(got, v_new, v_best)
            return t_best, id_best, u_best, v_best

        m = _mask_flag(mask_ref, g)
        return jax.lax.cond(m, work, lambda cr: cr, carry)

    init = (
        tmax0,
        jnp.full((blk, 1), -1.0, jnp.float32),
        jnp.zeros((blk, 1), jnp.float32),
        jnp.zeros((blk, 1), jnp.float32),
    )
    t_best, id_best, u_best, v_best = jax.lax.fori_loop(
        0, n_groups, group_body, init
    )
    t_out[:] = t_best
    tri_out[:] = id_best.astype(jnp.int32)
    u_out[:] = u_best
    v_out[:] = v_best


def _any_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    tri_hbm,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    occ_out,
    mask_ref, tri_vmem, sem,
    *, n_groups: int, n_gtiles: int,
):
    blk = ox_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax0 = tmax_ref[:]

    _group_mask_phase(
        ox, oy, oz, dx, dy, dz, tmin, tmax0,
        lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
        mask_ref, n_gtiles,
    )

    # occlusion is carried as f32 0/1 — Mosaic cannot legalize (BLK, 1) i1
    # vectors as fori_loop carries (scf.for with vpad'ed i1 layouts)
    def group_body(g, occ):
        def work(occ):
            _stage_group(tri_hbm, tri_vmem, sem, g)
            for r in range(GROUP):
                tri = tuple(_row(tri_vmem, c, r) for c in range(9))
                _tt, _uu, _vv, ok = _mt_tile(
                    ox, oy, oz, dx, dy, dz, tmin, tmax0, tri
                )
                # exclude padding (oid < 0) — degenerate pads never pass
                # det, but keep the guard for safety
                ok = ok & (_row(tri_vmem, 9, r) >= 0.0)
                hit_f = jnp.max(
                    jnp.where(ok, 1.0, 0.0), axis=1, keepdims=True
                )
                occ = jnp.maximum(occ, hit_f)
            return occ

        live = jnp.sum(occ) < blk  # early skip once all occluded
        m = _mask_flag(mask_ref, g) & live
        return jax.lax.cond(m, work, lambda o: o, occ)

    occ = jax.lax.fori_loop(
        0, n_groups, group_body, jnp.zeros((blk, 1), jnp.float32)
    )
    occ_out[:] = occ > 0.0


def _boxes(cl: ClusterView):
    return (cl.lo_x, cl.lo_y, cl.lo_z, cl.hi_x, cl.hi_y, cl.hi_z)


@functools.partial(jax.jit, static_argnames=("block",))
def _closest_impl(tri, boxes, o, d, tmin, tmax, block: int):
    n = o[0].shape[0]
    n_pad = -(-n // block) * block
    pad = n_pad - n
    g = n_pad // block

    def pr(a):
        return jnp.pad(a, (0, pad)).reshape(n_pad, 1)

    rays = tuple(pr(a) for a in (*o, *d, tmin, tmax))
    n_groups = tri.shape[1] // GROUP
    gp = boxes[0].shape[1]

    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    box_spec = pl.BlockSpec((1, gp), lambda i: (0, 0))
    out_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    t, tri_id, u, v = pl.pallas_call(
        functools.partial(
            _closest_kernel, n_groups=n_groups, n_gtiles=gp // 128
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        grid=(g,),
        in_specs=[ray_spec] * 8 + [hbm_spec] + [box_spec] * 6,
        out_specs=[out_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((1, gp), jnp.int32),
            pltpu.VMEM((10, GROUP, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*rays, tri, *boxes)
    flat_out = lambda a: a.reshape(n_pad)[:n]
    return flat_out(t), flat_out(tri_id), flat_out(u), flat_out(v)


@functools.partial(jax.jit, static_argnames=("block",))
def _any_impl(tri, boxes, o, d, tmin, tmax, block: int):
    n = o[0].shape[0]
    n_pad = -(-n // block) * block
    pad = n_pad - n
    g = n_pad // block

    def pr(a):
        return jnp.pad(a, (0, pad)).reshape(n_pad, 1)

    rays = tuple(pr(a) for a in (*o, *d, tmin, tmax))
    n_groups = tri.shape[1] // GROUP
    gp = boxes[0].shape[1]
    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    box_spec = pl.BlockSpec((1, gp), lambda i: (0, 0))
    occ = pl.pallas_call(
        functools.partial(
            _any_kernel, n_groups=n_groups, n_gtiles=gp // 128
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), bool),
        grid=(g,),
        in_specs=[ray_spec] * 8 + [hbm_spec] + [box_spec] * 6,
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, gp), jnp.int32),
            pltpu.VMEM((10, GROUP, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*rays, tri, *boxes)
    return occ.reshape(n_pad)[:n]


def trace_closest_cluster(
    clusters: ClusterView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
) -> Hit:
    """Closest-hit over the clustered soup (drop-in for trace_closest)."""
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    t, tri, u, v = _closest_impl(
        clusters.tri, _boxes(clusters), (o.x, o.y, o.z), (d.x, d.y, d.z),
        tmin_b, tmax_b, block
    )
    missed = tri < 0
    return Hit(
        t=jnp.where(missed, jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,)), t),
        tri=tri,
        u=u,
        v=v,
    )


def trace_any_cluster(
    clusters: ClusterView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
) -> Array:
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    occ = _any_impl(
        clusters.tri, _boxes(clusters), (o.x, o.y, o.z), (d.x, d.y, d.z),
        tmin_b, tmax_b, block
    )
    if active is not None:
        occ = occ & active
    return occ
