"""Pallas TPU kernels: per-ray frontier cluster traversal (large scenes).

Reference analog: RTContext::trace / trace_shadow over the RTX BVH
(src/rt.cpp:558-650) — specifically the per-ray front-to-back ordered
traversal with per-ray t_best culling that an RT core performs.

Third-generation large-scene tracer, informed by measurements of the two
previous designs:

  * round-2 cluster tracer (ops/pallas_cluster_trace): one in-kernel
    near-to-far visit loop per 512-ray block, but the visit eligibility
    was the BLOCK-MIN entry vs the BLOCK-MAX t_best — on incoherent
    room-scale wavefronts a block visited ~775 of 784 clusters
    (brute force; 0.15 Mrays/s on the 99.6k-tri big_room).
  * round-3 binned tracer (ops/pallas_binned_trace): exact per-ray visit
    sets, but each visit ROUND is a separate XLA dispatch doing a full
    (N x Cp) frontier rescan + argsort; with hundreds of rounds the
    1.43M-ray trace ran for minutes and tripped the device/RPC deadline
    (tools/tpu_binned_bisect.py: every phase passes in isolation; the
    composed while_loop dies at scale).

This kernel keeps BOTH properties: the whole ordered walk stays inside
ONE kernel launch per block (no per-round dispatches), and eligibility
is PER-RAY. The trick is a per-block entry matrix E[r, c] = slab entry
distance of ray r into cluster c (+BIG on miss), built once per block
into VMEM scratch (BLK x Cp f32; 512 x 896 = 1.8 MB for big_room —
v5e has 128 MB of VMEM). The visit loop then:

  1. picks the globally nearest (ray, cluster) pair still eligible
     (E < per-ray t_best), i.e. exact front-to-back order over the
     union of per-ray needed sets;
  2. marks the cluster's E column visited (+BIG) and prefetches the
     NEXT cluster's (16, 128) triangle rectangle (double-buffered DMA,
     same proven schedule as the cluster tracer);
  3. Moller-Trumbore-tests ALL block rays against the cluster
     (dense (BLK, 128) tile — testing non-needing rays is free) and
     tightens per-ray t_best.

A cluster is skipped iff NO ray's slab entry beats that ray's own
current best hit — the exact per-ray early-out of an ordered BVH walk,
at block granularity. Visits per block = |union of per-ray needed
sets|, the minimum achievable without per-lane control flow.

Rays ride the sublane dim as (BLK, 1) columns; triangle tiles ride the
128 lanes. Triangle data stays HBM-resident; VMEM bounds only the
CLUSTER COUNT (Cp <= 4096 -> 8 MB E at BLK=512), not the scene.
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
from fermat_tpu.ops.pallas_cluster_trace import (
    _argmin_row,
    _cluster_dma,
    _mt_tile,
)


def _sort_perm_packed(clusters, o, d, tmin_b, tmax_b):
    """_sort_perm with DEAD RAYS (tmax <= tmin: masked-off wavefront
    lanes) packed LAST: a block of dead rays has an all-BIG E matrix and
    exits after one pick, so segregating them makes late-bounce traces
    (mostly dead lanes after RR) nearly free instead of diluting every
    block. Alive rays keep the morton+octant coherence order."""
    from fermat_tpu.core.morton import morton3d

    lo = (jnp.min(clusters.lo_x), jnp.min(clusters.lo_y),
          jnp.min(clusters.lo_z))
    hi = (jnp.max(clusters.hi_x), jnp.max(clusters.hi_y),
          jnp.max(clusters.hi_z))
    inv = tuple(1.0 / jnp.maximum(h - l, 1e-20) for l, h in zip(lo, hi))
    nx = (o.x - lo[0]) * inv[0]
    ny = (o.y - lo[1]) * inv[1]
    nz = (o.z - lo[2]) * inv[2]
    m = morton3d(nx, ny, nz) >> 15
    octant = (
        (d.x < 0).astype(jnp.uint32) * 4
        + (d.y < 0).astype(jnp.uint32) * 2
        + (d.z < 0).astype(jnp.uint32)
    )
    dead = (tmax_b <= tmin_b).astype(jnp.uint32)
    return jnp.argsort((dead << 18) | (m << 3) | octant)

Array = jax.Array

import os as _os

# block size: rays per grid block (per-block E matrix + MT tile height).
# Same-process hardware A/B on big_room 1.43M rays (tools/tpu_blk_ab.py):
# incoherent closest 128: 1.31s | 256: 1.73s | 512: 1.89s | 1024: ~2.1s;
# anyhit flat (~0.45s) — smaller blocks shrink the per-block visit union
# faster than they grow per-block overheads. Env override for experiments.
DEF_BLK = int(_os.environ.get("FERMAT_FRONTIER_BLK", "128"))
_BIG = 3.0e38
MAX_CP = 4096  # E-matrix VMEM gate: 512 x 4096 x 4 B = 8 MB
_VMEM_LIMIT = 100 * 1024 * 1024


def _check_cp(clusters: ClusterView) -> None:
    """Enforce the E-matrix VMEM gate (ADVICE r3: MAX_CP was documented
    but never checked — a big-enough scene would die at kernel compile
    time instead of failing with an actionable message)."""
    cp = int(clusters.lo_x.shape[1])
    if cp > MAX_CP:
        raise ValueError(
            f"frontier tracer: scene has {cp} (padded) clusters "
            f"> MAX_CP={MAX_CP} (~{MAX_CP * CLUSTER / 1e6:.1f} M "
            f"triangles at CLUSTER={CLUSTER}); the per-block E matrix "
            f"would blow the VMEM budget. Use tracer='cluster', or "
            f"rebuild with a larger CLUSTER size."
        )


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _build_entry_matrix(
    e_ref, ox, oy, oz, dx, dy, dz, tmin, t_lim0,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref, n_gtiles: int,
    horizon=None,
):
    """E[r, c] = slab entry of ray r into cluster c; +BIG on miss/empty.

    Written tile-by-tile into the (BLK, Cp) VMEM scratch. t_lim0 is the
    per-ray INITIAL limit (tmax; -1 rows for padded/inactive rays make
    every E entry BIG so those rays never cause visits).

    horizon (multi-round resume, (BLK, 1) or None): entries with
    near < horizon[r] are masked BIG — a prior round already visited every
    cluster whose entry beats the ray's recorded next-frontier distance,
    so re-visits are structurally excluded."""
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
            jnp.minimum(jnp.maximum(t0z, t1z), t_lim0),
        )
        # padded clusters carry inverted (+big, -big) boxes — the explicit
        # emptiness mask keeps their overflowed slab results out (see
        # pallas_cluster_trace._group_near_phase for the war story)
        keep = (near <= far) & (lox <= hix)
        if horizon is not None:
            keep = keep & (near >= horizon)
        e_ref[:, pl.ds(s, 128)] = jnp.where(keep, near, _BIG)


def _closest_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    h_ref, t0_ref, id0_ref, u0_ref, v0_ref,
    tri_hbm,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    t_out, tri_out, u_out, v_out, visits_out, nxe_out, nxc_out,
    e_ref, tri_vmem, sem,
    *, n_units: int, n_gtiles: int, cap: int,
):
    """One block's ordered frontier walk.

    Round-4 extensions over the round-3 kernel (all exact):
      * carried hit state (t0/id0/u0/v0) + resume horizon h — a later
        round continues where an earlier round stopped;
      * a static visit CAP — the multi-round driver re-sorts unfinished
        rays by their next needed cluster between rounds, collapsing the
        per-block visit union toward per-ray needed sets;
      * next-frontier outputs (nxe, nxc): per ray, the entry distance and
        id of the nearest UNVISITED still-eligible cluster (+BIG / -1
        when the ray is done) — the re-binning key;
      * all-dead blocks (every e-limit row <= 0) skip the E build
        entirely — with dead rays packed last by the sort, late-bounce
        trailing blocks cost ~nothing (previously they paid the full
        BLK x Cp x 24-op build).
    """
    blk = ox_ref.shape[0]
    cp = n_gtiles * 128
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    e_lim = tmax_ref[:]  # E far cap; -1 rows = inactive/finished rays
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, CLUSTER), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)

    # NB: the E build runs UNCONDITIONALLY. A round-4 attempt skipped it
    # for all-dead blocks behind pl.when — the conditional region cost
    # +40% on the WHOLE trace (1.31 s -> 1.85 s on the big_room 1.43M-ray
    # benchmark; tools/tpu_kernel_bisect2.py isolated it) — Mosaic cannot
    # pipeline the box-row loads/stores across the conditional. Dead
    # blocks pay ~3.4 us of build and exit on the first pick instead.
    _build_entry_matrix(
        e_ref, ox, oy, oz, dx, dy, dz, tmin, e_lim,
        lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref, n_gtiles,
        horizon=h_ref[:],
    )

    def dma(slot, c):
        return _cluster_dma(tri_hbm, tri_vmem.at[slot], sem.at[slot], c)

    def pick(t_best, excl):
        """Nearest still-eligible (per-ray E < t_best, unvisited) cluster.

        Exclusion is applied AFTER the (BLK, Cp) -> (1, Cp) reduce, on the
        cheap row, so E stays read-only after the build (the first design
        rewrote the whole E column to +BIG per visit — 3.6 MB of VMEM
        traffic per visit for what one row select does).

        t_lim = min(t_best, e_lim): finished/inactive rays carry their
        real t_best but e_lim = -1, so they can never elect clusters."""
        t_lim = jnp.minimum(t_best, e_lim)
        col = jnp.min(jnp.where(e_ref[:, :] < t_lim, e_ref[:, :], _BIG),
                      axis=0, keepdims=True)  # (1, Cp)
        col = jnp.where(excl > 0.0, _BIG, col)
        mn, c = _argmin_row(col)
        return c, mn < _BIG

    def mark(excl, c, on):
        # NB: scalar-bool `on` gates via jnp.where on the whole row —
        # `(lane == c) & on` (vector i1 AND broadcast scalar i1) is a
        # Mosaic legalization hazard (round-3 war story: i1 vectors in
        # unusual positions crash the pipeline)
        return jnp.where(on, jnp.where(lane == c, 1.0, excl), excl)

    t_best0 = t0_ref[:]
    excl0 = jnp.zeros((1, cp), jnp.float32)
    c0, do0 = pick(t_best0, excl0)
    excl0 = mark(excl0, c0, do0)

    @pl.when(do0)
    def _():
        dma(0, c0).start()

    cap_eff = min(n_units + 1, cap) if cap > 0 else n_units + 1

    def cond(carry):
        i, cur, do_cur, *_ = carry
        return do_cur & (i < cap_eff)

    def body(carry):
        i, cur, _do_cur, excl, t_best, id_best, u_best, v_best, nvis = carry
        slot = jax.lax.rem(i, 2)

        def work(cr):
            excl, t_best, id_best, u_best, v_best, nvis = cr
            nvis = nvis + 1.0
            # pick + prefetch next (pre-visit t_best: conservative by at
            # most one visit vs re-picking after the update below)
            c_nxt, do_nxt = pick(t_best, excl)
            excl = mark(excl, c_nxt, do_nxt)

            @pl.when(do_nxt)
            def _():
                dma(1 - slot, c_nxt).start()

            dma(slot, cur).wait()
            tri = tuple(
                tri_vmem[slot, c, :].reshape(1, CLUSTER) for c in range(9)
            )
            tt, uu, vv, ok = _mt_tile(
                ox, oy, oz, dx, dy, dz, tmin, t_best, tri
            )
            ids = tri_vmem[slot, 9, :].reshape(1, CLUSTER)
            ok = ok & (ids >= 0.0)
            tt = jnp.where(ok, tt, _BIG)
            t_new = jnp.min(tt, axis=1, keepdims=True)
            got = t_new < t_best
            cand = jnp.where(tt == t_new, col, CLUSTER)
            kmin = jnp.min(cand, axis=1, keepdims=True)
            onehot = col == kmin
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
            return c_nxt, do_nxt, excl, t_best, id_best, u_best, v_best, nvis

        return (i + 1,) + work(
            (excl, t_best, id_best, u_best, v_best, nvis)
        )

    init = (
        jnp.int32(0),
        c0,
        do0,
        excl0,
        t_best0,
        id0_ref[:],
        u0_ref[:],
        v0_ref[:],
        jnp.zeros((), jnp.float32),
    )
    # while_loop: the loop ENDS when no (ray, cluster) pair is eligible
    # (or the visit cap is reached). The first design ran a fori over all
    # n_units with a lax.cond guard — measured 1.3 us per SKIPPED
    # iteration on hardware, which at 784 clusters x 2800 blocks (2.2M
    # dead iterations) dominated the whole trace (tools/tpu_visits_probe:
    # camera blocks need only ~23 visits but paid 43 us/visit all-in).
    (_i, c_pend, do_pend, excl_f, t_best, id_best, u_best, v_best, nvis) = (
        jax.lax.while_loop(cond, body, init)
    )

    # A cap exit (do_pend still true) leaves the prefetch DMA for c_pend
    # in flight — an un-drained DMA at kernel end ABORTS the TPU (found
    # the hard way: every capped schedule died with "TPU backend error
    # (Aborted)" while uncapped ran clean; the only code delta was the
    # static loop bound). Drain it before returning.
    @pl.when(do_pend)
    def _():
        dma(jax.lax.rem(_i, 2), c_pend).wait()

    t_out[:] = t_best
    tri_out[:] = id_best.astype(jnp.int32)
    u_out[:] = u_best
    v_out[:] = v_best
    visits_out[:] = jnp.full_like(t_best, 0.0) + nvis

    # next frontier per ray: nearest unvisited cluster still beating the
    # ray's best hit. A cap exit leaves one PICKED-but-untested cluster
    # (c_pend, prefetch in flight) — unmark it so it stays "unvisited".
    # (f32 arithmetic instead of scalar-i1 AND: Mosaic legality.)
    pend = jnp.where(do_pend, 1.0, 0.0)
    excl_f = excl_f - jnp.where(lane == c_pend, pend, 0.0)
    elig = e_ref[:, :] < jnp.minimum(t_best, e_lim)
    unvis = excl_f <= 0.0
    e_open = jnp.where(elig & unvis, e_ref[:, :], _BIG)
    nxe = jnp.min(e_open, axis=1, keepdims=True)
    ccand = jnp.where(e_open == nxe, lane, cp)
    nxc = jnp.min(ccand, axis=1, keepdims=True)
    done = nxe >= _BIG
    nxe_out[:] = nxe
    nxc_out[:] = jnp.where(done, -1, nxc)


def _any_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    tri_hbm,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    occ_out,
    e_ref, tri_vmem, sem,
    *, n_units: int, n_gtiles: int,
):
    blk = ox_ref.shape[0]
    cp = n_gtiles * 128
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax0 = tmax_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)

    _build_entry_matrix(
        e_ref, ox, oy, oz, dx, dy, dz, tmin, tmax0,
        lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref, n_gtiles,
    )

    def dma(slot, c):
        return _cluster_dma(tri_hbm, tri_vmem.at[slot], sem.at[slot], c)

    def pick(occ, excl):
        # occluded rays stop being able to elect clusters
        t_lim = jnp.where(occ > 0.0, -_BIG, tmax0)
        col = jnp.min(jnp.where(e_ref[:, :] < t_lim, e_ref[:, :], _BIG),
                      axis=0, keepdims=True)
        col = jnp.where(excl > 0.0, _BIG, col)
        mn, c = _argmin_row(col)
        return c, mn < _BIG

    def mark(excl, c):
        return jnp.where(lane == c, 1.0, excl)

    occ0 = jnp.zeros((blk, 1), jnp.float32)
    excl0 = jnp.zeros((1, cp), jnp.float32)
    c0, do0 = pick(occ0, excl0)
    excl0 = jnp.where(do0, mark(excl0, c0), excl0)

    @pl.when(do0)
    def _():
        dma(0, c0).start()

    def cond(carry):
        i, cur, do_cur, *_ = carry
        return do_cur & (i < n_units + 1)

    def body(carry):
        i, cur, _do_cur, excl, occ = carry
        slot = jax.lax.rem(i, 2)

        def work(cr):
            excl, occ = cr
            c_nxt, do_nxt = pick(occ, excl)
            excl = jnp.where(do_nxt, mark(excl, c_nxt), excl)

            @pl.when(do_nxt)
            def _():
                dma(1 - slot, c_nxt).start()

            dma(slot, cur).wait()
            tri = tuple(
                tri_vmem[slot, c, :].reshape(1, CLUSTER) for c in range(9)
            )
            _tt, _uu, _vv, ok = _mt_tile(
                ox, oy, oz, dx, dy, dz, tmin, tmax0, tri
            )
            ok = ok & (tri_vmem[slot, 9, :].reshape(1, CLUSTER) >= 0.0)
            hit_f = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1, keepdims=True)
            return c_nxt, do_nxt, excl, jnp.maximum(occ, hit_f)

        return (i + 1,) + work((excl, occ))

    _i, _c, _do, _ex, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), c0, do0, excl0, occ0)
    )
    occ_out[:] = occ > 0.0


def _boxes(cl: ClusterView):
    return (cl.lo_x, cl.lo_y, cl.lo_z, cl.hi_x, cl.hi_y, cl.hi_z)


@functools.partial(jax.jit, static_argnames=("block", "cap"))
def _closest_impl(tri, boxes, o, d, tmin, tmax, block: int, cap: int = 0,
                  carry=None):
    """One capped/uncapped frontier sweep over all rays.

    carry = (h, t0, id0, u0, v0) flat (n,) arrays from a previous round
    (None for round 1). Returns per-ray (t, tri, u, v, nxe, nxc) plus
    per-block visit counts."""
    n = o[0].shape[0]
    n_pad = -(-n // block) * block
    pad = n_pad - n
    g = n_pad // block

    def pr(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(n_pad, 1)

    # padded rays get tmax = -1 -> empty E rows -> never elect clusters
    rays = tuple(pr(a) for a in (*o, *d, tmin)) + (pr(tmax, -1.0),)
    if carry is None:
        carries = (
            jnp.full((n_pad, 1), -_BIG, jnp.float32),      # horizon
            pr(tmax, -1.0),                                # t_best0
            jnp.full((n_pad, 1), -1.0, jnp.float32),       # id0
            jnp.zeros((n_pad, 1), jnp.float32),            # u0
            jnp.zeros((n_pad, 1), jnp.float32),            # v0
        )
    else:
        h, t0, id0, u0, v0 = carry
        carries = (pr(h, -_BIG), pr(t0, -1.0),
                   pr(id0.astype(jnp.float32), -1.0), pr(u0), pr(v0))
    n_units = tri.shape[0]
    gp = boxes[0].shape[1]

    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    box_spec = pl.BlockSpec((1, gp), lambda i: (0, 0))
    out_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    f32 = jnp.float32
    t, tri_id, u, v, visits, nxe, nxc = pl.pallas_call(
        functools.partial(
            _closest_kernel, n_units=n_units, n_gtiles=gp // 128, cap=cap
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), f32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        grid=(g,),
        in_specs=[ray_spec] * 13 + [hbm_spec] + [box_spec] * 6,
        out_specs=[out_spec] * 7,
        scratch_shapes=[
            pltpu.VMEM((block, gp), jnp.float32),
            pltpu.VMEM((2, 16, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*rays, *carries, tri, *boxes)
    flat_out = lambda a: a.reshape(n_pad)[:n]
    return (flat_out(t), flat_out(tri_id), flat_out(u), flat_out(v),
            flat_out(nxe), flat_out(nxc),
            visits.reshape(g, block)[:, 0])


@functools.partial(jax.jit, static_argnames=("block",))
def _any_impl(tri, boxes, o, d, tmin, tmax, block: int):
    n = o[0].shape[0]
    n_pad = -(-n // block) * block
    pad = n_pad - n
    g = n_pad // block

    def pr(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(n_pad, 1)

    rays = tuple(pr(a) for a in (*o, *d, tmin)) + (pr(tmax, -1.0),)
    n_units = tri.shape[0]
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
            pltpu.VMEM((block, gp), jnp.float32),
            pltpu.VMEM((2, 16, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*rays, tri, *boxes)
    return occ.reshape(n_pad)[:n]


def _parse_rounds(rounds) -> tuple:
    if rounds is None:
        spec = _os.environ.get("FERMAT_FRONTIER_ROUNDS", "0")
        rounds = tuple(int(x) for x in spec.split(",") if x.strip() != "")
    if not rounds:
        rounds = (0,)
    return tuple(rounds[:-1]) + (0,)  # final round is ALWAYS uncapped


def trace_closest_frontier(
    clusters: ClusterView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
    sort: bool = True,
    return_visits: bool = False,
    rounds=None,
) -> Hit:
    """Closest-hit over the clustered soup (drop-in for trace_closest).

    rounds: visit caps per re-binning round, final entry forced uncapped
    (0). ("0",) = single exhaustive sweep (the round-3 behavior). With
    e.g. (24, 0): sweep 1 walks each block's frontier for at most 24
    visits; unfinished rays are then RE-SORTED by the id of the next
    cluster they each need (their exact per-ray frontier, reported by the
    kernel) so rays needing the same clusters share blocks, and sweep 2
    finishes them with collapsed visit unions. Exact for any cap
    schedule: each ray resumes from its recorded horizon (every cluster
    with entry below it was already tested) and the last sweep is
    exhaustive. Default from FERMAT_FRONTIER_ROUNDS.

    return_visits=True additionally returns the per-block-per-round visit
    counts (concatenated) — the tracer's work metric, for attribution."""
    _check_cp(clusters)
    caps = _parse_rounds(rounds)
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    do_sort = sort and n >= 4 * block
    if not do_sort:
        caps = (0,)  # small traces: single exhaustive sweep, no re-binning

    tri_args = (clusters.tri, _boxes(clusters))
    ray_soa = ((o.x, o.y, o.z), (d.x, d.y, d.z), tmin_b)

    if do_sort:
        perm = _sort_perm_packed(clusters, o, d, tmin_b, tmax_b)
    else:
        perm = None

    def gather(a, p):
        return a[p] if p is not None else a

    state = None  # (t, tri, u, v, nxe, nxc) in ORIGINAL ray order
    all_visits = []
    for k, cap in enumerate(caps):
        if k > 0:
            done = state[5] < 0
            key = jnp.where(done, jnp.int32(2 ** 30), state[5])
            perm = jnp.argsort(key)
        po = tuple(gather(a, perm) for a in ray_soa[0])
        pd = tuple(gather(a, perm) for a in ray_soa[1])
        ptmin = gather(ray_soa[2], perm)
        if state is None:
            e_lim = gather(tmax_b, perm)
            carry = None
        else:
            t_c, id_c, u_c, v_c, nxe_c, nxc_c = state
            done = nxc_c < 0
            e_lim = gather(jnp.where(done, -1.0, t_c), perm)
            carry = tuple(gather(a, perm)
                          for a in (nxe_c, t_c, id_c, u_c, v_c))
        t, tri, u, v, nxe, nxc, visits = _closest_impl(
            *tri_args, po, pd, ptmin, e_lim, block, cap=cap, carry=carry
        )
        all_visits.append(visits)
        if perm is not None:
            un = lambda a: jnp.zeros_like(a).at[perm].set(a)
            t, tri, u, v = un(t), un(tri), un(u), un(v)
            nxe, nxc = un(nxe), un(nxc)
        state = (t, tri, u, v, nxe, nxc)

    t, tri, u, v, _nxe, _nxc = state
    missed = tri < 0
    hit = Hit(
        t=jnp.where(
            missed, jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,)), t
        ),
        tri=tri,
        u=u,
        v=v,
    )
    if return_visits:
        return hit, jnp.concatenate(all_visits)
    return hit


def trace_any_frontier(
    clusters: ClusterView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
    sort: bool = True,
) -> Array:
    _check_cp(clusters)
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    do_sort = sort and n >= 4 * block
    if do_sort:
        perm = _sort_perm_packed(clusters, o, d, tmin_b, tmax_b)
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
