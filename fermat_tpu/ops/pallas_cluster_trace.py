"""Pallas TPU kernels: two-level clustered ray traversal (large scenes).

Reference analog: RTContext::trace / trace_shadow over the RTX BVH
(src/rt.cpp:558-650). See fermat_tpu.accel.cluster for why the TPU-native
"BVH" is a morton-cluster/group structure instead of a per-thread-stack
tree walk.

Kernel shape (per ray block, grid over blocks):
  phase 1  slab-test the block against ALL group AABBs as dense
           (BLK x 128) tiles; reduce over rays to a per-group BLOCK-MIN
           ENTRY DISTANCE row (+inf where the whole block misses).
           Branch-free, fully vectorized.
  phase 2  a fori_loop visiting CLUSTERS (128 tris each) in NEAR-TO-FAR
           order: each step argmins the remaining entry distances, marks
           the cluster visited, and — unless the front-to-back early-out
           says no ray can still improve — DMAs the cluster's (16, 128)
           triangle rectangle from HBM into VMEM (8 KB) and runs
           one 128-triangle Moller-Trumbore tile test (the proven dense
           kernel of ops/pallas_trace.py, original triangle id carried
           as an f32 lane row, no gathers). Cluster granularity replaced
           the original 1024-tri group granularity: group AABBs were so
           coarse that room-scale ray blocks hit most of them and the
           tracer ran at brute-force speed (0.17 Mrays/s on the 99k-tri
           big_room). The early-out is the ordered-stack behavior an
           RT-core BVH gets for free (rt.cpp:558-650). Lane-coherence
           ray sorting (see _sort_perm) keeps blocks tight so both the
           culling and the exit bound bite.

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


def _argmin_row(row):
    """(scalar min, scalar first-argmin) of a (1, Gp) f32 row — iota-select
    reduction (no gathers)."""
    gp = row.shape[1]
    mn = jnp.min(row)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, gp), 1)
    g = jnp.min(jnp.where(row == mn, lane, gp))
    return mn, g


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


def _group_near_phase(
    ox, oy, oz, dx, dy, dz, tmin, tmax0,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    n_gtiles: int,
):
    """Phase 1: per-cluster BLOCK-MIN slab entry distance, +inf where the
    whole block misses. Returns the (1, Cp) row as a value (the phase-2
    loop carries and consumes it)."""
    inv = lambda c: jnp.where(
        jnp.abs(c) > 1e-20, 1.0 / jnp.where(c == 0.0, 1.0, c),
        jnp.where(c >= 0, 1e20, -1e20),
    )
    idx, idy, idz = inv(dx), inv(dy), inv(dz)
    rows = []
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
        # padding clusters carry inverted (+big, -big) boxes; the slab
        # arithmetic on them overflows to +-inf and degenerates to
        # near=tmin/far=tmax — i.e. they PASS. An explicit emptiness mask
        # keeps them out (they were stealing near-ordered visit
        # iterations from real clusters: measured ~3% missed hits on a
        # padded 80/128 cluster set).
        nonempty = lox <= hix
        near_v = jnp.where((near <= far) & nonempty, near, _BIG)
        rows.append(jnp.min(near_v, axis=0, keepdims=True))  # (1, 128)
    return jnp.concatenate(rows, axis=1) if len(rows) > 1 else rows[0]


def _cluster_dma(tri_hbm, tri_vmem, sem, c):
    """The (16, 128) HBM -> VMEM cluster copy descriptor (start/wait at the
    double-buffer schedule points).

    Two hardware constraints learned the hard way (interpret mode accepts
    all of these; the chip does not):
      * the cluster id must scalar-index the MAJORMOST dim (`ref.at[idx]`)
        — offsets into the middle dim of the old (10, C, 128) layout had
        to be multiples of 8, and arbitrary ids there produced
        silently-corrupt copies;
      * the copy extent must be whole (8, 128) tiles — a (10, 128) copy
        crashed the TPU worker, hence the 16-row padded layout."""
    return pltpu.make_async_copy(tri_hbm.at[c], tri_vmem, sem)


def _row(tri_vmem, slot, comp: int):
    """One component row of the staged cluster in buffer `slot`."""
    return tri_vmem[slot, comp, :].reshape(1, CLUSTER)


def _closest_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    tri_hbm,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    t_out, tri_out, u_out, v_out,
    tri_vmem, sem,
    *, n_units: int, n_gtiles: int,
):
    blk = ox_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax0 = tmax_ref[:]

    near_row = _group_near_phase(
        ox, oy, oz, dx, dy, dz, tmin, tmax0,
        lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
        n_gtiles,
    )
    gp = near_row.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, gp), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, CLUSTER), 1)

    # Double-buffered near-ordered visiting (guide: Patterns/Double
    # Buffering, adapted to a DYNAMIC argmin-driven visit sequence): each
    # iteration schedules the NEXT cluster's DMA into the other buffer
    # before waiting on the current one, hiding the per-visit copy latency
    # that serializes the single-buffer loop. The next-visit decision uses
    # the pre-visit t_best bound — conservative (at most one extra visit),
    # never skips a needed cluster.
    def dma(slot, g):
        return _cluster_dma(tri_hbm, tri_vmem.at[slot], sem.at[slot], g)

    def pick(near, t_best):
        mn, g = _argmin_row(near)
        near = jnp.where(lane == g, _BIG, near)  # mark visited
        do = mn < jnp.max(t_best)
        return near, g, do

    near_row, g0, do0 = pick(near_row, tmax0)

    @pl.when(do0)
    def _():
        dma(0, g0).start()

    def cluster_body(i, carry):
        near, g_cur, do_cur, t_best, id_best, u_best, v_best = carry
        slot = jax.lax.rem(i, 2)
        near, g_nxt, do_nxt = pick(near, t_best)

        @pl.when(do_nxt)
        def _():
            dma(1 - slot, g_nxt).start()

        def work(cr):
            t_best, id_best, u_best, v_best = cr
            dma(slot, g_cur).wait()
            tri = tuple(_row(tri_vmem, slot, c) for c in range(9))
            tt, uu, vv, ok = _mt_tile(
                ox, oy, oz, dx, dy, dz, tmin, t_best, tri
            )
            tt = jnp.where(ok, tt, _BIG)
            t_new = jnp.min(tt, axis=1, keepdims=True)
            got = t_new < t_best
            cand = jnp.where(tt == t_new, col, CLUSTER)
            kmin = jnp.min(cand, axis=1, keepdims=True)
            onehot = col == kmin
            ids = _row(tri_vmem, slot, 9)
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

        t_best, id_best, u_best, v_best = jax.lax.cond(
            do_cur, work, lambda cr: cr, (t_best, id_best, u_best, v_best)
        )
        return near, g_nxt, do_nxt, t_best, id_best, u_best, v_best

    init = (
        near_row,
        g0,
        do0,
        tmax0,
        jnp.full((blk, 1), -1.0, jnp.float32),
        jnp.zeros((blk, 1), jnp.float32),
        jnp.zeros((blk, 1), jnp.float32),
    )
    (_near, _g, _do, t_best, id_best, u_best, v_best) = jax.lax.fori_loop(
        0, n_units, cluster_body, init
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
    tri_vmem, sem,
    *, n_units: int, n_gtiles: int,
):
    blk = ox_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax0 = tmax_ref[:]

    near_row = _group_near_phase(
        ox, oy, oz, dx, dy, dz, tmin, tmax0,
        lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
        n_gtiles,
    )
    gp = near_row.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, gp), 1)

    # occlusion carried as f32 0/1 (Mosaic cannot legalize (BLK, 1) i1
    # vectors as loop carries). Same double-buffered near-ordered schedule
    # as the closest kernel; the pending bound shrinks as lanes occlude.
    def dma(slot, g):
        return _cluster_dma(tri_hbm, tri_vmem.at[slot], sem.at[slot], g)

    def pick(near, occ):
        mn, g = _argmin_row(near)
        near = jnp.where(lane == g, _BIG, near)
        pend_max = jnp.max(jnp.where(occ > 0.0, -1.0, tmax0))
        do = mn < pend_max
        return near, g, do

    occ0 = jnp.zeros((blk, 1), jnp.float32)
    near_row, g0, do0 = pick(near_row, occ0)

    @pl.when(do0)
    def _():
        dma(0, g0).start()

    def cluster_body(i, carry):
        near, g_cur, do_cur, occ = carry
        slot = jax.lax.rem(i, 2)
        near, g_nxt, do_nxt = pick(near, occ)

        @pl.when(do_nxt)
        def _():
            dma(1 - slot, g_nxt).start()

        def work(occ):
            dma(slot, g_cur).wait()
            tri = tuple(_row(tri_vmem, slot, c) for c in range(9))
            _tt, _uu, _vv, ok = _mt_tile(
                ox, oy, oz, dx, dy, dz, tmin, tmax0, tri
            )
            # exclude padding (oid < 0) — degenerate pads never pass
            # det, but keep the guard for safety
            ok = ok & (_row(tri_vmem, slot, 9) >= 0.0)
            hit_f = jnp.max(
                jnp.where(ok, 1.0, 0.0), axis=1, keepdims=True
            )
            occ = jnp.maximum(occ, hit_f)
            return occ

        occ = jax.lax.cond(do_cur, work, lambda o: o, occ)
        return near, g_nxt, do_nxt, occ

    _near, _g, _do, occ = jax.lax.fori_loop(
        0, n_units, cluster_body, (near_row, g0, do0, occ0)
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
    n_units = tri.shape[0]  # clusters (major dim)
    gp = boxes[0].shape[1]

    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    box_spec = pl.BlockSpec((1, gp), lambda i: (0, 0))
    out_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    t, tri_id, u, v = pl.pallas_call(
        functools.partial(
            _closest_kernel, n_units=n_units, n_gtiles=gp // 128
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
            pltpu.VMEM((2, 16, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
    n_units = tri.shape[0]  # clusters (major dim)
    gp = boxes[0].shape[1]
    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    box_spec = pl.BlockSpec((1, gp), lambda i: (0, 0))
    occ = pl.pallas_call(
        functools.partial(
            _any_kernel, n_units=n_units, n_gtiles=gp // 128
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), bool),
        grid=(g,),
        in_specs=[ray_spec] * 8 + [hbm_spec] + [box_spec] * 6,
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 16, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*rays, tri, *boxes)
    return occ.reshape(n_pad)[:n]


def _sort_perm(clusters: ClusterView, o: Vec3, d: Vec3) -> Array:
    """Coherence permutation: 15-bit origin morton + 3-bit direction octant.

    Wavefront rays arrive in pixel order; after the first bounce they are
    spatially incoherent, which defeats the block-level AABB culling and
    front-to-back exit (every group's entry distance ends up below some
    ray's best hit). Sorting restores block coherence — the same trick the
    reference gets implicitly from RT cores' per-ray traversal. Cost: one
    u32 argsort + gathers (~2% of a trace at 1.4M rays)."""
    from fermat_tpu.core.morton import morton3d

    lo = (jnp.min(clusters.lo_x), jnp.min(clusters.lo_y), jnp.min(clusters.lo_z))
    hi = (jnp.max(clusters.hi_x), jnp.max(clusters.hi_y), jnp.max(clusters.hi_z))
    inv = tuple(1.0 / jnp.maximum(h - l, 1e-20) for l, h in zip(lo, hi))
    nx = (o.x - lo[0]) * inv[0]
    ny = (o.y - lo[1]) * inv[1]
    nz = (o.z - lo[2]) * inv[2]
    m = morton3d(nx, ny, nz) >> 15  # keep the top 15 bits (5/axis)
    octant = (
        (d.x < 0).astype(jnp.uint32) * 4
        + (d.y < 0).astype(jnp.uint32) * 2
        + (d.z < 0).astype(jnp.uint32)
    )
    return jnp.argsort((m << 3) | octant)


def trace_closest_cluster(
    clusters: ClusterView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
    sort: bool = True,
) -> Hit:
    """Closest-hit over the clustered soup (drop-in for trace_closest)."""
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    do_sort = sort and n >= 4 * block
    if do_sort:
        perm = _sort_perm(clusters, o, d)
        g = lambda a: a[perm]
        o = Vec3(g(o.x), g(o.y), g(o.z))
        d = Vec3(g(d.x), g(d.y), g(d.z))
        tmin_b, tmax_b = g(tmin_b), g(tmax_b)
    t, tri, u, v = _closest_impl(
        clusters.tri, _boxes(clusters), (o.x, o.y, o.z), (d.x, d.y, d.z),
        tmin_b, tmax_b, block
    )
    if do_sort:
        un = lambda a: jnp.zeros_like(a).at[perm].set(a)
        t, tri, u, v = un(t), un(tri), un(u), un(v)
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
    sort: bool = True,
) -> Array:
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    do_sort = sort and n >= 4 * block
    if do_sort:
        perm = _sort_perm(clusters, o, d)
        g = lambda a: a[perm]
        o = Vec3(g(o.x), g(o.y), g(o.z))
        d = Vec3(g(d.x), g(d.y), g(d.z))
        tmin_b, tmax_b = g(tmin_b), g(tmax_b)
    occ = _any_impl(
        clusters.tri, _boxes(clusters), (o.x, o.y, o.z), (d.x, d.y, d.z),
        tmin_b, tmax_b, block
    )
    if do_sort:
        occ = jnp.zeros_like(occ).at[perm].set(occ)
    if active is not None:
        occ = occ & active
    return occ
