"""Pallas TPU kernels: composite subcluster frontier traversal (round 5).

Reference analog: RTContext::trace / trace_shadow over the RTX BVH
(src/rt.cpp:558-650), as for ops/pallas_frontier_trace — this is the
finer-granularity successor for incoherent wavefronts.

Why: the frontier kernel's visit unit is a 128-triangle cluster whose
MT tile costs a full (BLK, 128) vreg sweep even when few lanes matter.
The needed-set probe (tools/needed_set_probe.py) showed per-block visit
unions grow only ~2.1x when leaves shrink 4x (L128 -> L32), i.e. ~1.9x
fewer PAIR tests at L32 — but a (BLK, 32)-lane tile costs the same
vregs as (BLK, 128) (lane padding), so fine leaves only pay off if
several share one tile.

Mechanism: every L32 subcluster's packed triangle tile is stored at ALL
FOUR lane phases (accel/cluster.build_subclusters). Each loop iteration
picks the 4 nearest still-eligible subclusters, assigns them phases
0..3 in pick order, DMAs tile [sub*4 + phase] for each, and merges the
four staged tiles into ONE dense (BLK, 128) Moller-Trumbore composite
with 3 lane-group selects per component row. Everything else (per-ray
E matrix, K-wide pick amortization, 2-reduce extraction, dead-ray
packing sort, double-buffered DMA) is the gen-4 frontier design.

Exactness: identical argument to the frontier kernel — a subcluster is
skipped iff no ray's slab entry beats that ray's current best hit;
composite grouping only tests members against the group-start t_best
(conservative). Verified vs brute force in tests/test_sub_trace.py.

MEASURED RESULT (round 5, tools/tpu_sub_check.py, big_room incoherent
1.43M rays): pair tests DO drop ~2.3x (112 L32 visits/blk x 32 lanes vs
66 L128 visits x 128 lanes) but throughput LOSES to the frontier tracer
at every block size tried (best 1.70 Mrays/s at BLK=512 NC=4 vs
frontier 2.67): the 4x-wider E matrix (4480 vs 1152 columns) makes
E-build and every pick reduce ~4x more expensive, and block-level visit
unions grow faster at fine granularity (112@BLK128 -> 187@BLK512).
Kept as the tested structural alternative for scenes whose depth
complexity is dominated by a few dense hotspots (where leaf-granularity
culling wins); NOT wired into production routing.
"""
from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fermat_tpu.accel.cluster import SubclusterView
from fermat_tpu.accel.traverse import Hit
from fermat_tpu.core.math import Vec3
from fermat_tpu.ops.pallas_cluster_trace import _argmin_row, _mt_tile
from fermat_tpu.ops.pallas_frontier_trace import (
    _build_entry_matrix,
    _recompute_uv,
    _sort_perm_packed,
)

Array = jax.Array

DEF_BLK = int(_os.environ.get("FERMAT_SUB_BLK", "128"))
# composites (4-subcluster MT tiles) per loop iteration: the (BLK, Cs)
# pick reduce amortizes over NC * 4 visits
DEF_NC = int(_os.environ.get("FERMAT_SUB_NC", "2"))
_BIG = 3.0e38
_E_BUDGET = 32 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def max_subclusters(block: int = DEF_BLK) -> int:
    return (_E_BUDGET // (4 * block)) // 128 * 128


def _check_cs(subs: SubclusterView, block: int) -> None:
    cs = int(subs.lo_x.shape[1])
    if cs > max_subclusters(block):
        raise ValueError(
            f"sub tracer: {cs} (padded) subclusters exceeds the E-matrix "
            f"VMEM budget at block={block} (max {max_subclusters(block)}). "
            f"Use a smaller block or tracer='frontier'."
        )


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _sub_dma(tri_hbm, tri_vmem, sem, tile_idx):
    """(16, 128) HBM -> VMEM copy of one phase-replicated tile."""
    return pltpu.make_async_copy(tri_hbm.at[tile_idx], tri_vmem, sem)


def _merge_rows(tiles, lg_masks):
    """Merge 4 phase-staged (16, 128) tiles into composite (1, 128) rows.

    tiles: list of 4 'row reader' callables (comp -> (1, 128)); lg_masks:
    4 (1, 128) bool lane-group masks. Returns a 10-row reader."""
    def row(c):
        r = tiles[3](c)
        for p in (2, 1, 0):
            r = jnp.where(lg_masks[p], tiles[p](c), r)
        return r

    return row


def _closest_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    tri_hbm,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    t_out, tri_out, visits_out,
    e_ref, tri_vmem, sem,
    *, n_subs: int, n_gtiles: int, nc: int,
):
    blk = ox_ref.shape[0]
    cs = n_gtiles * 128
    NP = 4 * nc  # subcluster picks per iteration
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    e_lim = tmax_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lg = [(lane128 // 32) == p for p in range(4)]

    _build_entry_matrix(
        e_ref, ox, oy, oz, dx, dy, dz, tmin, e_lim,
        lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref, n_gtiles,
    )

    def dma(slot, sub, phase):
        return _sub_dma(tri_hbm, tri_vmem.at[slot], sem.at[slot],
                        sub * 4 + phase)

    def pick_group(t_best, excl):
        t_lim = jnp.minimum(t_best, e_lim)
        row = jnp.min(jnp.where(e_ref[:, :] < t_lim, e_ref[:, :], _BIG),
                      axis=0, keepdims=True)
        row = jnp.where(excl > 0.0, _BIG, row)
        subs, oks = [], []
        for _ in range(NP):
            mn, c = _argmin_row(row)
            on = mn < _BIG
            row = jnp.where(on, jnp.where(lane == c, _BIG, row), row)
            excl = jnp.where(on, jnp.where(lane == c, 1.0, excl), excl)
            subs.append(c)
            oks.append(on)
        return tuple(subs), tuple(oks), excl

    t_best0 = tmax_ref[:]
    excl0 = jnp.zeros((1, cs), jnp.float32)
    subs0, oks0, excl0 = pick_group(t_best0, excl0)
    for j in range(NP):
        @pl.when(oks0[j])
        def _(j=j):
            dma(j, subs0[j], j % 4).start()

    max_iters = n_subs // NP + 2

    def cond(carry):
        i, subs, oks, *_ = carry
        return oks[0] & (i < max_iters)

    def body(carry):
        (i, subs, oks, excl, t_best, id_best, nvis) = carry
        base = jax.lax.rem(i, 2) * NP

        subs_n, oks_n, excl = pick_group(t_best, excl)
        nbase = NP - base
        for j in range(NP):
            @pl.when(oks_n[j])
            def _(j=j):
                dma(nbase + j, subs_n[j], j % 4).start()

        nvis = nvis + sum(jnp.where(ok, 1.0, 0.0) for ok in oks)
        for c in range(nc):
            for j in range(4):
                @pl.when(oks[4 * c + j])
                def _(c=c, j=j):
                    dma(base + 4 * c + j, subs[4 * c + j], j).wait()
            readers = [
                (lambda comp, s=base + 4 * c + p:
                 tri_vmem[s, comp, :].reshape(1, 128))
                for p in range(4)
            ]
            row = _merge_rows(readers, lg)
            tri = tuple(row(comp) for comp in range(9))
            tt, _uu, _vv, ok = _mt_tile(
                ox, oy, oz, dx, dy, dz, tmin, t_best, tri
            )
            ids = row(9)
            # gate stale phases: an invalid pick's tile was never DMA'd
            # (or holds an earlier iteration's subcluster) — force ids -1
            live_row = jnp.zeros((1, 128), jnp.float32)
            for p in range(4):
                on = oks[4 * c + p]
                live_row = live_row + jnp.where(
                    on, jnp.where(lg[p], 1.0, 0.0), 0.0)
            ids = jnp.where(live_row > 0.0, ids, -1.0)
            ok = ok & (ids >= 0.0)
            tt = jnp.where(ok, tt, _BIG)
            t_new = jnp.min(tt, axis=1, keepdims=True)
            got = t_new < t_best
            id_new = jnp.min(jnp.where(tt == t_new, ids, _BIG), axis=1,
                             keepdims=True)
            t_best = jnp.where(got, t_new, t_best)
            id_best = jnp.where(got, id_new, id_best)

        return (i + 1, subs_n, oks_n, excl, t_best, id_best, nvis)

    init = (
        jnp.int32(0),
        subs0,
        oks0,
        excl0,
        t_best0,
        jnp.full((blk, 1), -1.0, jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    (_i, subs_p, oks_p, _excl, t_best, id_best, nvis) = (
        jax.lax.while_loop(cond, body, init)
    )
    # drain pending prefetches (un-waited DMAs at kernel end abort the TPU)
    pbase = jax.lax.rem(_i, 2) * NP
    for j in range(NP):
        @pl.when(oks_p[j])
        def _(j=j):
            dma(pbase + j, subs_p[j], j % 4).wait()

    t_out[:] = t_best
    tri_out[:] = id_best.astype(jnp.int32)
    visits_out[:] = jnp.full_like(t_best, 0.0) + nvis


def _any_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    tri_hbm,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    occ_out,
    e_ref, tri_vmem, sem,
    *, n_subs: int, n_gtiles: int, nc: int,
):
    blk = ox_ref.shape[0]
    cs = n_gtiles * 128
    NP = 4 * nc
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax0 = tmax_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lg = [(lane128 // 32) == p for p in range(4)]

    _build_entry_matrix(
        e_ref, ox, oy, oz, dx, dy, dz, tmin, tmax0,
        lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref, n_gtiles,
    )

    def dma(slot, sub, phase):
        return _sub_dma(tri_hbm, tri_vmem.at[slot], sem.at[slot],
                        sub * 4 + phase)

    def pick_group(occ, excl):
        t_lim = jnp.where(occ > 0.0, -_BIG, tmax0)
        row = jnp.min(jnp.where(e_ref[:, :] < t_lim, e_ref[:, :], _BIG),
                      axis=0, keepdims=True)
        row = jnp.where(excl > 0.0, _BIG, row)
        subs, oks = [], []
        for _ in range(NP):
            mn, c = _argmin_row(row)
            on = mn < _BIG
            row = jnp.where(on, jnp.where(lane == c, _BIG, row), row)
            excl = jnp.where(on, jnp.where(lane == c, 1.0, excl), excl)
            subs.append(c)
            oks.append(on)
        return tuple(subs), tuple(oks), excl

    occ0 = jnp.zeros((blk, 1), jnp.float32)
    excl0 = jnp.zeros((1, cs), jnp.float32)
    subs0, oks0, excl0 = pick_group(occ0, excl0)
    for j in range(NP):
        @pl.when(oks0[j])
        def _(j=j):
            dma(j, subs0[j], j % 4).start()

    max_iters = n_subs // NP + 2

    def cond(carry):
        i, subs, oks, *_ = carry
        return oks[0] & (i < max_iters)

    def body(carry):
        (i, subs, oks, excl, occ) = carry
        base = jax.lax.rem(i, 2) * NP
        subs_n, oks_n, excl = pick_group(occ, excl)
        nbase = NP - base
        for j in range(NP):
            @pl.when(oks_n[j])
            def _(j=j):
                dma(nbase + j, subs_n[j], j % 4).start()
        for c in range(nc):
            for j in range(4):
                @pl.when(oks[4 * c + j])
                def _(c=c, j=j):
                    dma(base + 4 * c + j, subs[4 * c + j], j).wait()
            readers = [
                (lambda comp, s=base + 4 * c + p:
                 tri_vmem[s, comp, :].reshape(1, 128))
                for p in range(4)
            ]
            row = _merge_rows(readers, lg)
            tri = tuple(row(comp) for comp in range(9))
            _tt, _uu, _vv, ok = _mt_tile(
                ox, oy, oz, dx, dy, dz, tmin, tmax0, tri
            )
            ids = row(9)
            live_row = jnp.zeros((1, 128), jnp.float32)
            for p in range(4):
                on = oks[4 * c + p]
                live_row = live_row + jnp.where(
                    on, jnp.where(lg[p], 1.0, 0.0), 0.0)
            ids = jnp.where(live_row > 0.0, ids, -1.0)
            ok = ok & (ids >= 0.0)
            hit_f = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1, keepdims=True)
            occ = jnp.maximum(occ, hit_f)
        return (i + 1, subs_n, oks_n, excl, occ)

    (_i, subs_p, oks_p, _ex, occ) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), subs0, oks0, excl0, occ0)
    )
    pbase = jax.lax.rem(_i, 2) * NP
    for j in range(NP):
        @pl.when(oks_p[j])
        def _(j=j):
            dma(pbase + j, subs_p[j], j % 4).wait()
    occ_out[:] = occ > 0.0


def _boxes(s: SubclusterView):
    return (s.lo_x, s.lo_y, s.lo_z, s.hi_x, s.hi_y, s.hi_z)


@functools.partial(jax.jit, static_argnames=("block", "nc"))
def _closest_impl(tri4, boxes, o, d, tmin, tmax, block: int, nc: int):
    n = o[0].shape[0]
    n_pad = -(-n // block) * block
    pad = n_pad - n
    g = n_pad // block

    def pr(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(n_pad, 1)

    rays = tuple(pr(a) for a in (*o, *d, tmin)) + (pr(tmax, -1.0),)
    n_subs = tri4.shape[0] // 4
    cs = boxes[0].shape[1]

    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    box_spec = pl.BlockSpec((1, cs), lambda i: (0, 0))
    out_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    f32 = jnp.float32
    t, tri_id, visits = pl.pallas_call(
        functools.partial(_closest_kernel, n_subs=n_subs,
                          n_gtiles=cs // 128, nc=nc),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), f32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
        ],
        grid=(g,),
        in_specs=[ray_spec] * 8 + [hbm_spec] + [box_spec] * 6,
        out_specs=[out_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((block, cs), jnp.float32),
            pltpu.VMEM((2 * 4 * nc, 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * 4 * nc,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*rays, tri4, *boxes)
    flat_out = lambda a: a.reshape(n_pad)[:n]
    return (flat_out(t), flat_out(tri_id),
            visits.reshape(g, block)[:, 0])


@functools.partial(jax.jit, static_argnames=("block", "nc"))
def _any_impl(tri4, boxes, o, d, tmin, tmax, block: int, nc: int):
    n = o[0].shape[0]
    n_pad = -(-n // block) * block
    pad = n_pad - n
    g = n_pad // block

    def pr(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(n_pad, 1)

    rays = tuple(pr(a) for a in (*o, *d, tmin)) + (pr(tmax, -1.0),)
    n_subs = tri4.shape[0] // 4
    cs = boxes[0].shape[1]
    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    box_spec = pl.BlockSpec((1, cs), lambda i: (0, 0))
    occ = pl.pallas_call(
        functools.partial(_any_kernel, n_subs=n_subs,
                          n_gtiles=cs // 128, nc=nc),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), bool),
        grid=(g,),
        in_specs=[ray_spec] * 8 + [hbm_spec] + [box_spec] * 6,
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block, cs), jnp.float32),
            pltpu.VMEM((2 * 4 * nc, 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * 4 * nc,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*rays, tri4, *boxes)
    return occ.reshape(n_pad)[:n]


def trace_closest_sub(
    subs: SubclusterView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
    sort: bool = True,
    return_visits: bool = False,
    nc: int = DEF_NC,
) -> Hit:
    """Closest-hit over the 4-phase subcluster structure."""
    _check_cs(subs, block)
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    do_sort = sort and n >= 4 * block
    if do_sort:
        perm = _sort_perm_packed(subs, o, d, tmin_b, tmax_b)
        g = lambda a: a[perm]
        po = (g(o.x), g(o.y), g(o.z))
        pd = (g(d.x), g(d.y), g(d.z))
        ptmin, ptmax = g(tmin_b), g(tmax_b)
    else:
        po, pd = (o.x, o.y, o.z), (d.x, d.y, d.z)
        ptmin, ptmax = tmin_b, tmax_b

    t, tri, visits = _closest_impl(
        subs.tri4, _boxes(subs), po, pd, ptmin, ptmax, block, nc)
    if do_sort:
        un = lambda a: jnp.zeros_like(a).at[perm].set(a)
        t, tri = un(t), un(tri)

    u, v = _recompute_uv(subs, o, d, tri)
    missed = tri < 0
    hit = Hit(
        t=jnp.where(missed,
                    jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,)),
                    t),
        tri=tri,
        u=u,
        v=v,
    )
    if return_visits:
        return hit, visits
    return hit


def trace_any_sub(
    subs: SubclusterView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
    sort: bool = True,
    nc: int = DEF_NC,
) -> Array:
    _check_cs(subs, block)
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    do_sort = sort and n >= 4 * block
    if do_sort:
        perm = _sort_perm_packed(subs, o, d, tmin_b, tmax_b)
        g = lambda a: a[perm]
        o = Vec3(g(o.x), g(o.y), g(o.z))
        d = Vec3(g(d.x), g(d.y), g(d.z))
        tmin_b, tmax_b = g(tmin_b), g(tmax_b)
    occ = _any_impl(
        subs.tri4, _boxes(subs), (o.x, o.y, o.z), (d.x, d.y, d.z),
        tmin_b, tmax_b, block, nc)
    if do_sort:
        occ = jnp.zeros_like(occ).at[perm].set(occ)
    if active is not None:
        occ = occ & active
    return occ
