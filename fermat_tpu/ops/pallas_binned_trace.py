"""Pallas TPU kernels: binned-wavefront clustered traversal (large scenes).

Reference analog: RTContext::trace / trace_shadow over the RTX BVH
(src/rt.cpp:558-650) — specifically the per-ray ordered traversal an RT
core performs, which the round-2 cluster tracer (ops/pallas_cluster_trace)
could only approximate at BLOCK granularity: a 512-ray block jointly
visited every cluster ANY of its rays needed, so incoherent room-scale
wavefronts degenerated toward brute force (~775 visited clusters/block on
the 99.6k-tri big_room, 0.15 Mrays/s).

This module inverts the loop so work scales with Σ(per-ray visited
clusters) instead of Σ(block-union clusters):

  round loop (lax.while_loop, on-device, no host sync):
    1. FRONTIER SCAN (XLA, dense VPU): each ray computes its next cluster
       = min over clusters of the lexicographic key (slab entry distance,
       cluster id) that is strictly greater than the ray's last visited
       key and closer than its current best hit. This is the exact
       front-to-back visit order of an ordered BVH walk, derived by
       re-scanning the flat cluster-AABB table (C ≈ 1k boxes; dense
       (rays × 128) tiles, branch-free).
    2. BINNING: argsort rays by frontier cluster id (finished rays sort
       to the end with a sentinel key).
    3. TEST KERNEL (Pallas): the grid walks 512-ray blocks of the sorted
       order. Each block DMAs only its few DISTINCT frontier clusters
       (typically 1-3 after sorting) from HBM and runs one dense
       (512 × 128) Moller-Trumbore tile per cluster, masked to the rays
       whose frontier matches. A block is allowed up to U distinct
       clusters per round; rays beyond that are left untested (their
       `tested` flag stays 0) and simply retry next round — correctness
       never depends on U.
    4. MERGE (XLA): un-permute, fold this round's hits into the running
       best, and advance the (entry, cid) cursor of tested rays.

Rays ride the sublane dim as (BLK, 1) columns; triangle tiles ride the
128 lanes (same proven layout as ops/pallas_cluster_trace). Triangle data
is HBM-resident; each visit stages one (16, 128) cluster rectangle into
VMEM (whole-tile DMA, majormost-dim scalar index — both hardware
requirements, see accel/cluster.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fermat_tpu.accel.cluster import CLUSTER, ClusterView
from fermat_tpu.accel.traverse import Hit
from fermat_tpu.core.math import Vec3

Array = jax.Array

_EPS_DET = 1e-12
_BIG = 3.0e38
DEF_BLK = 512
U_STEPS = 8  # max distinct clusters a block may test per round
_SENT = 0x7FFFFFF0  # "no frontier" cluster id sentinel (python int: kernels
# must not capture traced constants, and jnp comparisons promote it fine)
_VMEM_LIMIT = 64 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _safe_inv(c):
    return jnp.where(
        jnp.abs(c) > 1e-20,
        1.0 / jnp.where(c == 0.0, 1.0, c),
        jnp.where(c >= 0, 1e20, -1e20),
    )


def _mt_tile(ox, oy, oz, dx, dy, dz, tmin, t_lim, tri):
    """Moller-Trumbore of a (BLK,1) ray block vs a (1,128) triangle tile."""
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


# ---------------------------------------------------------------------------
# Frontier scan (XLA)
# ---------------------------------------------------------------------------

def _frontier_scan(boxes, o, d, tmin, t_lim, last_e, last_c, *, ordered: bool):
    """Next cluster per ray in strict (entry, cid) lexicographic order.

    ordered=True  → closest-hit visit order (front-to-back by slab entry).
    ordered=False → any-hit order (by cluster id only; entry ignored in the
                    key, so the cursor is just last_c).

    Returns (entry, cid) with cid == _SENT when the ray has no remaining
    eligible cluster. All inputs (N,) arrays; boxes are the (1, Cp) rows
    of a ClusterView. Runs as a lax.scan over 128-wide box tiles so the
    (N, 128) temporaries never materialize in HBM.
    """
    lox, loy, loz, hix, hiy, hiz = (b.reshape(-1) for b in boxes)
    cp = lox.shape[0]
    n_tiles = cp // 128
    tiles = tuple(b.reshape(n_tiles, 128) for b in (lox, loy, loz, hix, hiy, hiz))

    idx, idy, idz = _safe_inv(d.x), _safe_inv(d.y), _safe_inv(d.z)
    ox, oy, oz = o.x[:, None], o.y[:, None], o.z[:, None]
    idx, idy, idz = idx[:, None], idy[:, None], idz[:, None]
    tmin_c = tmin[:, None]
    tlim_c = t_lim[:, None]
    le_c = last_e[:, None]
    lc_c = last_c[:, None]

    def tile_step(carry, inp):
        best_e, best_c = carry
        (tlox, tloy, tloz, thix, thiy, thiz), base = inp
        t0x = (tlox[None, :] - ox) * idx
        t1x = (thix[None, :] - ox) * idx
        t0y = (tloy[None, :] - oy) * idy
        t1y = (thiy[None, :] - oy) * idy
        t0z = (tloz[None, :] - oz) * idz
        t1z = (thiz[None, :] - oz) * idz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), tmin_c),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), tlim_c),
        )
        cid = base + jax.lax.broadcasted_iota(jnp.int32, near.shape, 1)
        nonempty = tlox[None, :] <= thix[None, :]
        hit_box = (near <= far) & nonempty & (near < tlim_c)
        if ordered:
            after = (near > le_c) | ((near == le_c) & (cid > lc_c))
        else:
            after = cid > lc_c
        elig = hit_box & after
        c_m = jnp.where(elig, cid, _SENT)
        if ordered:
            # per-ray lexicographic (entry, cid) min over the 128 lanes
            e_m = jnp.where(elig, near, _BIG)
            e_t = jnp.min(e_m, axis=1)
            c_t = jnp.min(jnp.where(e_m == e_t[:, None], c_m, _SENT), axis=1)
            take = (e_t < best_e) | ((e_t == best_e) & (c_t < best_c))
        else:
            # the cursor is cid-monotone, so the reduction must be min-by-cid
            # (min-by-entry here would strand smaller-id clusters behind the
            # cursor and silently drop occlusions)
            c_t = jnp.min(c_m, axis=1)
            e_t = jnp.zeros_like(best_e)
            take = c_t < best_c
        best_e = jnp.where(take, e_t, best_e)
        best_c = jnp.where(take, c_t, best_c)
        return (best_e, best_c), None

    n = o.x.shape[0]
    init = (jnp.full((n,), _BIG, jnp.float32), jnp.full((n,), _SENT, jnp.int32))
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * 128
    (best_e, best_c), _ = jax.lax.scan(tile_step, init, (tiles, bases))
    none = best_c >= _SENT
    return jnp.where(none, _BIG, best_e), jnp.where(none, _SENT, best_c)


# ---------------------------------------------------------------------------
# Pallas test kernels
# ---------------------------------------------------------------------------

def _binned_closest_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tlim_ref,
    cid_ref,
    tri_hbm,
    t_out, id_out, u_out, v_out, tested_out,
    tri_vmem, sem,
    *, n_units: int, u_steps: int,
):
    blk = ox_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    t_lim = tlim_ref[:]
    cid = cid_ref[:]  # (BLK, 1) i32, sorted ascending within the block
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, CLUSTER), 1)

    def dma(g):
        return pltpu.make_async_copy(tri_hbm.at[g], tri_vmem, sem)

    cur0 = jnp.min(cid)

    def body(i, carry):
        cur, t_f, id_f, u_f, v_f, tested = carry
        do = cur < n_units

        @pl.when(do)
        def _():
            dma(cur).start()

        def work(cr):
            t_f, id_f, u_f, v_f, tested = cr
            dma(cur).wait()
            tri = tuple(tri_vmem[c, :].reshape(1, CLUSTER) for c in range(9))
            tt, uu, vv, ok = _mt_tile(ox, oy, oz, dx, dy, dz, tmin, t_lim, tri)
            mask = cid == cur  # (BLK, 1)
            ids = tri_vmem[9, :].reshape(1, CLUSTER)
            ok = ok & mask & (ids >= 0.0)
            tt = jnp.where(ok, tt, _BIG)
            t_new = jnp.min(tt, axis=1, keepdims=True)
            got = t_new < t_f
            cand = jnp.where(tt == t_new, col, CLUSTER)
            kmin = jnp.min(cand, axis=1, keepdims=True)
            onehot = col == kmin
            id_new = jnp.sum(jnp.where(onehot, ids, 0.0), axis=1, keepdims=True)
            u_new = jnp.sum(jnp.where(onehot, uu, 0.0), axis=1, keepdims=True)
            v_new = jnp.sum(jnp.where(onehot, vv, 0.0), axis=1, keepdims=True)
            t_f = jnp.where(got, t_new, t_f)
            id_f = jnp.where(got, id_new, id_f)
            u_f = jnp.where(got, u_new, u_f)
            v_f = jnp.where(got, v_new, v_f)
            tested = jnp.maximum(tested, jnp.where(mask, 1.0, 0.0))
            return t_f, id_f, u_f, v_f, tested

        t_f, id_f, u_f, v_f, tested = jax.lax.cond(
            do, work, lambda cr: cr, (t_f, id_f, u_f, v_f, tested)
        )
        nxt = jnp.min(jnp.where(cid > cur, cid, _SENT))
        return nxt, t_f, id_f, u_f, v_f, tested

    init = (
        cur0,
        jnp.full((blk, 1), _BIG, jnp.float32),
        jnp.full((blk, 1), -1.0, jnp.float32),
        jnp.zeros((blk, 1), jnp.float32),
        jnp.zeros((blk, 1), jnp.float32),
        jnp.zeros((blk, 1), jnp.float32),
    )
    _cur, t_f, id_f, u_f, v_f, tested = jax.lax.fori_loop(0, u_steps, body, init)
    t_out[:] = t_f
    id_out[:] = id_f.astype(jnp.int32)
    u_out[:] = u_f
    v_out[:] = v_f
    tested_out[:] = tested


def _binned_any_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tlim_ref,
    cid_ref,
    tri_hbm,
    occ_out, tested_out,
    tri_vmem, sem,
    *, n_units: int, u_steps: int,
):
    blk = ox_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    t_lim = tlim_ref[:]
    cid = cid_ref[:]

    def dma(g):
        return pltpu.make_async_copy(tri_hbm.at[g], tri_vmem, sem)

    cur0 = jnp.min(cid)

    def body(i, carry):
        cur, occ, tested = carry
        do = cur < n_units

        @pl.when(do)
        def _():
            dma(cur).start()

        def work(cr):
            occ, tested = cr
            dma(cur).wait()
            tri = tuple(tri_vmem[c, :].reshape(1, CLUSTER) for c in range(9))
            _tt, _uu, _vv, ok = _mt_tile(
                ox, oy, oz, dx, dy, dz, tmin, t_lim, tri
            )
            mask = cid == cur
            ok = ok & mask & (tri_vmem[9, :].reshape(1, CLUSTER) >= 0.0)
            hit_f = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1, keepdims=True)
            occ = jnp.maximum(occ, hit_f)
            tested = jnp.maximum(tested, jnp.where(mask, 1.0, 0.0))
            return occ, tested

        occ, tested = jax.lax.cond(do, work, lambda cr: cr, (occ, tested))
        nxt = jnp.min(jnp.where(cid > cur, cid, _SENT))
        return nxt, occ, tested

    init = (
        cur0,
        jnp.zeros((blk, 1), jnp.float32),
        jnp.zeros((blk, 1), jnp.float32),
    )
    _cur, occ, tested = jax.lax.fori_loop(0, u_steps, body, init)
    occ_out[:] = occ
    tested_out[:] = tested


def _run_kernel(kernel, n_out, tri, rays_sorted, cid_sorted, block):
    """Grid pallas_call over sorted ray blocks. rays_sorted = 8 (N,) arrays."""
    n = rays_sorted[0].shape[0]
    n_pad = -(-n // block) * block
    pad = n_pad - n
    g = n_pad // block
    n_units = tri.shape[0]

    def pr(a, fill=0.0):
        if a.dtype == jnp.int32:
            return jnp.pad(a, (0, pad), constant_values=int(_SENT)).reshape(n_pad, 1)
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(n_pad, 1)

    ins = tuple(pr(a) for a in rays_sorted) + (pr(cid_sorted),)
    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, 1), jnp.int32 if k == "i" else jnp.float32)
        for k in n_out
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(g,),
        in_specs=[ray_spec] * 9 + [hbm_spec],
        out_specs=[out_spec] * len(n_out),
        scratch_shapes=[
            pltpu.VMEM((16, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*ins, tri)
    return tuple(o.reshape(n_pad)[:n] for o in outs)


# ---------------------------------------------------------------------------
# Round-loop drivers
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("block", "u_steps"))
def _closest_impl(tri, boxes, o, d, tmin, tmax, block: int, u_steps: int):
    n = o[0].shape[0]
    n_units = tri.shape[0]
    cp = boxes[0].shape[1]
    ov = Vec3(*o)
    dv = Vec3(*d)

    kernel = functools.partial(
        _binned_closest_kernel, n_units=n_units, u_steps=u_steps
    )

    # liveness bound: every round each block containing alive rays tests at
    # least its first distinct frontier cluster, so cursors advance
    # monotonically; 4*cp rounds is far beyond any real visit sequence.
    def cond(state):
        rounds, alive, *_ = state
        return (rounds < 4 * cp) & alive

    def body(state):
        rounds, _alive, t_best, id_b, u_b, v_b, last_e, last_c = state
        ent, cid = _frontier_scan(
            boxes, ov, dv, tmin, t_best, last_e, last_c, ordered=True
        )
        key = cid  # _SENT sorts finished rays to the end
        perm = jnp.argsort(key)
        gat = lambda a: a[perm]
        rays_s = tuple(
            gat(a) for a in (o[0], o[1], o[2], d[0], d[1], d[2], tmin, t_best)
        )
        t_f, id_f, u_f, v_f, tested = _run_kernel(
            kernel, ("f", "i", "f", "f", "f"), tri, rays_s, gat(cid), block
        )
        # un-permute this round's results
        inv = lambda a: jnp.zeros_like(a).at[perm].set(a)
        t_f, u_f, v_f, tested = inv(t_f), inv(u_f), inv(v_f), inv(tested)
        id_f = jnp.full_like(id_f, -1).at[perm].set(id_f)
        was_tested = tested > 0.0
        got = was_tested & (t_f < t_best)
        t_best = jnp.where(got, t_f, t_best)
        id_b = jnp.where(got, id_f, id_b)
        u_b = jnp.where(got, u_f, u_b)
        v_b = jnp.where(got, v_f, v_b)
        last_e = jnp.where(was_tested, ent, last_e)
        last_c = jnp.where(was_tested, cid, last_c)
        alive = jnp.any(cid < _SENT)
        return rounds + 1, alive, t_best, id_b, u_b, v_b, last_e, last_c

    init = (
        jnp.int32(0),
        jnp.bool_(True),
        tmax,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.full((n,), -_BIG, jnp.float32),
        jnp.full((n,), -1, jnp.int32),
    )
    (_r, _a, t_best, id_b, u_b, v_b, _le, _lc) = jax.lax.while_loop(
        cond, body, init
    )
    return t_best, id_b, u_b, v_b


@functools.partial(jax.jit, static_argnames=("block", "u_steps"))
def _any_impl(tri, boxes, o, d, tmin, tmax, block: int, u_steps: int):
    n = o[0].shape[0]
    n_units = tri.shape[0]
    cp = boxes[0].shape[1]
    ov = Vec3(*o)
    dv = Vec3(*d)
    kernel = functools.partial(
        _binned_any_kernel, n_units=n_units, u_steps=u_steps
    )

    def cond(state):
        rounds, alive, *_ = state
        return (rounds < 4 * cp) & alive

    def body(state):
        rounds, _alive, occ, last_c = state
        # occluded rays stop scanning (t_lim clamped below tmin)
        t_lim = jnp.where(occ, -_BIG, tmax)
        _ent, cid = _frontier_scan(
            boxes, ov, dv, tmin, t_lim, jnp.zeros_like(tmax), last_c,
            ordered=False,
        )
        perm = jnp.argsort(cid)
        gat = lambda a: a[perm]
        rays_s = tuple(
            gat(a) for a in (o[0], o[1], o[2], d[0], d[1], d[2], tmin, tmax)
        )
        occ_f, tested = _run_kernel(
            kernel, ("f", "f"), tri, rays_s, gat(cid), block
        )
        inv = lambda a: jnp.zeros_like(a).at[perm].set(a)
        occ_f, tested = inv(occ_f), inv(tested)
        was_tested = tested > 0.0
        occ = occ | (was_tested & (occ_f > 0.0))
        last_c = jnp.where(was_tested, cid, last_c)
        alive = jnp.any(cid < _SENT)
        return rounds + 1, alive, occ, last_c

    init = (
        jnp.int32(0),
        jnp.bool_(True),
        jnp.zeros((n,), bool),
        jnp.full((n,), -1, jnp.int32),
    )
    _r, _a, occ, _lc = jax.lax.while_loop(cond, body, init)
    return occ


# ---------------------------------------------------------------------------
# Public API (drop-in for trace_closest / trace_any)
# ---------------------------------------------------------------------------

def trace_closest_binned(
    clusters: ClusterView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
    u_steps: int = U_STEPS,
) -> Hit:
    """Closest-hit over the clustered soup, per-ray binned traversal."""
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    boxes = (clusters.lo_x, clusters.lo_y, clusters.lo_z,
             clusters.hi_x, clusters.hi_y, clusters.hi_z)
    t, tri, u, v = _closest_impl(
        clusters.tri, boxes, (o.x, o.y, o.z), (d.x, d.y, d.z),
        tmin_b, tmax_b, block, u_steps
    )
    missed = tri < 0
    return Hit(
        t=jnp.where(
            missed, jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,)), t
        ),
        tri=tri,
        u=u,
        v=v,
    )


def trace_any_binned(
    clusters: ClusterView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
    u_steps: int = U_STEPS,
) -> Array:
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    boxes = (clusters.lo_x, clusters.lo_y, clusters.lo_z,
             clusters.hi_x, clusters.hi_y, clusters.hi_z)
    occ = _any_impl(
        clusters.tri, boxes, (o.x, o.y, o.z), (d.x, d.y, d.z),
        tmin_b, tmax_b, block, u_steps
    )
    if active is not None:
        occ = occ & active
    return occ
