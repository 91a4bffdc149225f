"""Pallas TPU kernels: per-ray frontier cluster traversal (large scenes).

Reference analog: RTContext::trace / trace_shadow over the RTX BVH
(src/rt.cpp:558-650) — specifically the per-ray front-to-back ordered
traversal with per-ray t_best culling that an RT core performs.

Fourth-generation large-scene tracer. Generations and their measured
lessons (ROOFLINE.md):

  * round-2 cluster tracer (ops/pallas_cluster_trace): block-min entry vs
    block-max t_best eligibility — incoherent blocks visited ~775 of 784
    clusters (brute force).
  * round-3 binned tracer: exact per-ray visit sets but one XLA dispatch
    per visit round — died at scale on dispatch count.
  * round-3/4 frontier tracer: whole ordered walk in ONE kernel per
    block over a per-ray entry matrix E[r, c] (slab entry of ray r into
    cluster c, +BIG on miss) in VMEM scratch; visits = |union of per-ray
    needed sets|, the minimum without per-lane control flow. Measured
    floor: ~1.4 us per visit at BLK=128, of which only ~0.35 us is
    VPU arithmetic (MT tile + pick reduce) — the rest is the serialized
    dependent chain pick -> DMA -> test -> update.
  * round 5 (this file): K-WIDE visits. Each loop iteration picks the K
    nearest still-eligible clusters in one (BLK, Cp) reduce + K cheap
    (1, Cp) argmins, issues all K DMAs, then tests K tiles back-to-back.
    The expensive reduce and the chain latency amortize over K visits,
    and the K MT tiles are independent work for the scheduler. Exactness
    is unchanged: picking K-at-a-time only means clusters k=2..K of a
    group are tested against the group-start t_best instead of a
    possibly-tighter one — conservative (extra visits possible, never a
    missed hit).

The multi-round capped re-binning machinery from round 4 was REMOVED:
full-pass A/Bs showed per-ray needed sets dominate visit counts on both
synthetic and real workloads, so re-binning only added sort/E-rebuild
overhead (ROOFLINE.md "Multi-round re-binning: full-pass verdict").

Rays ride the sublane dim as (BLK, 1) columns; triangle tiles ride the
128 lanes. Triangle data stays HBM-resident; VMEM bounds only the
CLUSTER COUNT (the per-block E matrix), not the scene.
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


def _sort_key(clusters, o, d, tmin_b, tmax_b):
    """Coherence sort key with DEAD RAYS (tmax <= tmin: masked-off
    wavefront lanes) packed LAST: a block of dead rays has an all-BIG E
    matrix and exits after one pick, so segregating them makes
    late-bounce traces (mostly dead lanes after RR) nearly free instead
    of diluting every block. Alive rays keep morton+octant order."""
    from fermat_tpu.core.morton import morton3d

    lo = (jnp.min(clusters.lo_x), jnp.min(clusters.lo_y),
          jnp.min(clusters.lo_z))
    hi = (jnp.max(clusters.hi_x), jnp.max(clusters.hi_y),
          jnp.max(clusters.hi_z))
    inv = tuple(1.0 / jnp.maximum(h - l, 1e-20) for l, h in zip(lo, hi))
    nx = (o.x - lo[0]) * inv[0]
    ny = (o.y - lo[1]) * inv[1]
    nz = (o.z - lo[2]) * inv[2]
    m = morton3d(nx, ny, nz) >> 6  # keep the top 24 bits (8/axis)
    octant = (
        (d.x < 0).astype(jnp.uint32) * 4
        + (d.y < 0).astype(jnp.uint32) * 2
        + (d.z < 0).astype(jnp.uint32)
    )
    dead = (tmax_b <= tmin_b).astype(jnp.uint32)
    # OCTANT-MAJOR (round 5): blocks share a direction octant first, then
    # morton position. Needed-set probe (tools/needed_set_probe.py, 40
    # blocks, big_room incoherent): block visit unions 73.8 -> 57.8
    # (-22%) vs the round-4 morton-major key; every sort variant tried is
    # in the probe's table.
    return (dead << 27) | (octant << 24) | m


def _sort_perm_packed(clusters, o, d, tmin_b, tmax_b):
    return jnp.argsort(_sort_key(clusters, o, d, tmin_b, tmax_b))


def _cosort_rays(clusters, o, d, tmin_b, tmax_b):
    """ONE multi-operand lax.sort carrying the 8 ray arrays + a perm iota
    alongside the key: the argsort + 8 separate gathers formulation left
    8 x ~10 ms kLoop gather fusions per trace call in the segment
    profile; the co-sort is one ~35-40 ms device sort total."""
    key = _sort_key(clusters, o, d, tmin_b, tmax_b)
    iota = jnp.arange(key.shape[0], dtype=jnp.int32)
    outs = jax.lax.sort(
        (key, iota, o.x, o.y, o.z, d.x, d.y, d.z, tmin_b, tmax_b),
        dimension=0, num_keys=1)
    perm = outs[1]
    return perm, outs[2:5], outs[5:8], outs[8], outs[9]

Array = jax.Array

import os as _os

# block size: rays per grid block (per-block E matrix + MT tile height).
# Round-5 hardware sweep (tools/tpu_kwide_ab.py, big_room 1.43M rays,
# cheap-extraction kernel + octant-major sort): incoherent closest best
# at BLK=256 (K=8: 2.06 Mrays/s; 128: 1.77, 64: 1.39, 512: 2.03) — the
# union grows sublinearly in block size, so bigger blocks amortize
# per-block E-build/pick costs per ray. (The round-4 BLK=128 optimum
# was an artifact of the 5-reduce per-visit extraction, now removed.)
DEF_BLK = int(_os.environ.get("FERMAT_FRONTIER_BLK", "256"))
# visits per loop iteration (K-wide groups): the (BLK, Cp) pick reduce
# and the pick->DMA->test chain latency amortize over K visits at ~1-2%
# extra visits. With the round-5 fully-jitted wrapper the sweep optimum
# moved to K=4 closest (2.67 Mrays/s big_room incoherent at BLK=256 vs
# 2.63 at K=8), K=2 anyhit (tools/tpu_kwide_ab.py).
DEF_K = int(_os.environ.get("FERMAT_FRONTIER_K", "4"))
DEF_K_ANY = int(_os.environ.get("FERMAT_FRONTIER_K_ANY", "2"))
_BIG = 3.0e38
# E-matrix VMEM budget: the gate is block*Cp*4B <= _E_BUDGET, i.e. at the
# default BLK=128 scenes up to 65536 clusters (~8.4M triangles) fit — the
# round-4 fixed Cp<=4096 fence (sized for BLK=512) is gone.
_E_BUDGET = 32 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def max_clusters(block: int = DEF_BLK) -> int:
    """Largest padded cluster count the per-block E matrix admits."""
    return (_E_BUDGET // (4 * block)) // 128 * 128


def _check_cp(clusters: ClusterView, block: int) -> None:
    cp = int(clusters.lo_x.shape[1])
    if cp > max_clusters(block):
        raise ValueError(
            f"frontier tracer: scene has {cp} (padded) clusters; at "
            f"block={block} the per-block E matrix would exceed the "
            f"{_E_BUDGET >> 20} MiB VMEM budget (max {max_clusters(block)} "
            f"clusters, ~{max_clusters(block) * CLUSTER / 1e6:.1f} M "
            f"triangles). Use a smaller block, or tracer='cluster'."
        )


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _build_entry_matrix(
    e_ref, ox, oy, oz, dx, dy, dz, tmin, t_lim0,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref, n_gtiles: int,
):
    """E[r, c] = slab entry of ray r into cluster c; +BIG on miss/empty.

    Written tile-by-tile into the (BLK, Cp) VMEM scratch. t_lim0 is the
    per-ray INITIAL limit (tmax; -1 rows for padded/inactive rays make
    every E entry BIG so those rays never cause visits).

    NB: this build runs UNCONDITIONALLY. A round-4 attempt skipped it
    for all-dead blocks behind pl.when — the conditional region cost
    +40% on the WHOLE trace (1.31 s -> 1.85 s on the big_room 1.43M-ray
    benchmark; tools/tpu_kernel_bisect2.py isolated it) — Mosaic cannot
    pipeline the box-row loads/stores across the conditional. Dead
    blocks pay ~3.4 us of build and exit on the first pick instead."""
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
        e_ref[:, pl.ds(s, 128)] = jnp.where(keep, near, _BIG)


def _closest_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    tri_hbm,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    t_out, tri_out, visits_out,
    e_ref, tri_vmem, sem,
    *, n_units: int, n_gtiles: int, k_wide: int,
):
    """One block's ordered K-wide frontier walk."""
    blk = ox_ref.shape[0]
    cp = n_gtiles * 128
    K = k_wide
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    e_lim = tmax_ref[:]  # E far cap; -1 rows = inactive/finished rays
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)

    _build_entry_matrix(
        e_ref, ox, oy, oz, dx, dy, dz, tmin, e_lim,
        lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref, n_gtiles,
    )

    def dma(slot, c):
        # slot indexes the flat (2K, 16, 128) staging buffer
        return _cluster_dma(tri_hbm, tri_vmem.at[slot], sem.at[slot], c)

    def pick_group(t_best, excl):
        """K nearest still-eligible clusters (per-ray E < t_lim,
        unvisited). ONE (BLK, Cp) masked reduce, then K cheap (1, Cp)
        argmin+mask steps on the reduced row. Exclusion is applied on
        the cheap row so E stays read-only after the build.

        t_lim = min(t_best, e_lim): finished/inactive rays carry their
        real t_best but e_lim = -1, so they can never elect clusters.

        Returns (cs, oks, excl): K scalar cluster ids, K scalar
        valid flags (monotone: oks[k] implies oks[k-1]), updated excl."""
        t_lim = jnp.minimum(t_best, e_lim)
        row = jnp.min(jnp.where(e_ref[:, :] < t_lim, e_ref[:, :], _BIG),
                      axis=0, keepdims=True)  # (1, Cp)
        row = jnp.where(excl > 0.0, _BIG, row)
        cs, oks = [], []
        for _ in range(K):
            mn, c = _argmin_row(row)
            on = mn < _BIG
            # scalar-bool gating via jnp.where on the whole row —
            # `(lane == c) & on` (vector i1 AND broadcast scalar i1) is
            # a Mosaic legalization hazard (round-3 war story)
            hide = jnp.where(on, jnp.where(lane == c, _BIG, row), row)
            excl = jnp.where(on, jnp.where(lane == c, 1.0, excl), excl)
            row = hide
            cs.append(c)
            oks.append(on)
        return tuple(cs), tuple(oks), excl

    t_best0 = tmax_ref[:]
    excl0 = jnp.zeros((1, cp), jnp.float32)
    cs0, oks0, excl0 = pick_group(t_best0, excl0)
    for k in range(K):
        @pl.when(oks0[k])
        def _(k=k):
            dma(k, cs0[k]).start()

    # group count bound: every group with oks[0] tests >= 1 new cluster
    max_groups = n_units + 1

    def cond(carry):
        i, cs, oks, *_ = carry
        return oks[0] & (i < max_groups)

    def body(carry):
        (i, cs, oks, excl, t_best, id_best, nvis) = carry
        base = jax.lax.rem(i, 2) * K

        # pick + prefetch the NEXT group (pre-test t_best: conservative
        # by at most one group vs re-picking after the updates below)
        cs_n, oks_n, excl = pick_group(t_best, excl)
        nbase = K - base  # the other buffer half (base is 0 or K)
        for k in range(K):
            @pl.when(oks_n[k])
            def _(k=k):
                dma(nbase + k, cs_n[k]).start()

        nvis = nvis + sum(jnp.where(ok, 1.0, 0.0) for ok in oks)
        for k in range(K):
            @pl.when(oks[k])
            def _(k=k):
                dma(base + k, cs[k]).wait()
            tri = tuple(
                tri_vmem[base + k, c, :].reshape(1, CLUSTER)
                for c in range(9)
            )
            tt, _uu, _vv, ok = _mt_tile(
                ox, oy, oz, dx, dy, dz, tmin, t_best, tri
            )
            ids = tri_vmem[base + k, 9, :].reshape(1, CLUSTER)
            ok = ok & (ids >= 0.0)
            tt = jnp.where(ok, tt, _BIG)
            # gate the whole tile on the group-slot validity (stale
            # staging data when the pick came up empty must not win)
            live = jnp.where(oks[k], 1.0, 0.0)
            tt = jnp.where(live > 0.0, tt, _BIG)
            # TWO lane-reduces per visit: min-t, then min-oid among the
            # t-ties (deterministic). The round-4 kernel extracted
            # id/u/v through a 5-reduce onehot — the per-visit cost
            # bisect (tools/tpu_visit_bisect.py) measured that at
            # ~0.5 us/visit, ~40% of the whole visit; u/v are now
            # recomputed OUTSIDE the kernel from the winning oid.
            t_new = jnp.min(tt, axis=1, keepdims=True)
            got = t_new < t_best
            id_new = jnp.min(jnp.where(tt == t_new, ids, _BIG), axis=1,
                             keepdims=True)
            t_best = jnp.where(got, t_new, t_best)
            id_best = jnp.where(got, id_new, id_best)

        return (i + 1, cs_n, oks_n, excl, t_best, id_best, nvis)

    init = (
        jnp.int32(0),
        cs0,
        oks0,
        excl0,
        t_best0,
        jnp.full((blk, 1), -1.0, jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    # while_loop: ends when no (ray, cluster) pair is eligible. A fori
    # over all units with a cond guard measured 1.3 us per SKIPPED
    # iteration on hardware (round 3) — dead iterations dominated.
    (_i, cs_p, oks_p, _excl, t_best, id_best, nvis) = (
        jax.lax.while_loop(cond, body, init)
    )

    # A loop exit with picks pending leaves their prefetch DMAs in
    # flight — an un-drained DMA at kernel end ABORTS the TPU (round-4
    # war story: "TPU backend error (Aborted)"). Drain them.
    pbase = jax.lax.rem(_i, 2) * K
    for k in range(K):
        @pl.when(oks_p[k])
        def _(k=k):
            dma(pbase + k, cs_p[k]).wait()

    t_out[:] = t_best
    tri_out[:] = id_best.astype(jnp.int32)
    visits_out[:] = jnp.full_like(t_best, 0.0) + nvis


def _any_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    tri_hbm,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    occ_out,
    e_ref, tri_vmem, sem,
    *, n_units: int, n_gtiles: int, k_wide: int,
):
    blk = ox_ref.shape[0]
    cp = n_gtiles * 128
    K = k_wide
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

    def pick_group(occ, excl):
        # occluded rays stop being able to elect clusters
        t_lim = jnp.where(occ > 0.0, -_BIG, tmax0)
        row = jnp.min(jnp.where(e_ref[:, :] < t_lim, e_ref[:, :], _BIG),
                      axis=0, keepdims=True)
        row = jnp.where(excl > 0.0, _BIG, row)
        cs, oks = [], []
        for _ in range(K):
            mn, c = _argmin_row(row)
            on = mn < _BIG
            row = jnp.where(on, jnp.where(lane == c, _BIG, row), row)
            excl = jnp.where(on, jnp.where(lane == c, 1.0, excl), excl)
            cs.append(c)
            oks.append(on)
        return tuple(cs), tuple(oks), excl

    occ0 = jnp.zeros((blk, 1), jnp.float32)
    excl0 = jnp.zeros((1, cp), jnp.float32)
    cs0, oks0, excl0 = pick_group(occ0, excl0)
    for k in range(K):
        @pl.when(oks0[k])
        def _(k=k):
            dma(k, cs0[k]).start()

    def cond(carry):
        i, cs, oks, *_ = carry
        return oks[0] & (i < n_units + 1)

    def body(carry):
        i, cs, oks, excl, occ = carry
        base = jax.lax.rem(i, 2) * K

        cs_n, oks_n, excl = pick_group(occ, excl)
        nbase = K - base
        for k in range(K):
            @pl.when(oks_n[k])
            def _(k=k):
                dma(nbase + k, cs_n[k]).start()

        for k in range(K):
            @pl.when(oks[k])
            def _(k=k):
                dma(base + k, cs[k]).wait()
            tri = tuple(
                tri_vmem[base + k, c, :].reshape(1, CLUSTER)
                for c in range(9)
            )
            _tt, _uu, _vv, ok = _mt_tile(
                ox, oy, oz, dx, dy, dz, tmin, tmax0, tri
            )
            ok = ok & (tri_vmem[base + k, 9, :].reshape(1, CLUSTER) >= 0.0)
            hit_f = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1, keepdims=True)
            live = jnp.where(oks[k], 1.0, 0.0)
            occ = jnp.maximum(occ, jnp.minimum(hit_f, live))

        return (i + 1, cs_n, oks_n, excl, occ)

    (_i, cs_p, oks_p, _ex, occ) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cs0, oks0, excl0, occ0)
    )
    pbase = jax.lax.rem(_i, 2) * K
    for k in range(K):
        @pl.when(oks_p[k])
        def _(k=k):
            dma(pbase + k, cs_p[k]).wait()
    occ_out[:] = occ > 0.0


def _boxes(cl: ClusterView):
    return (cl.lo_x, cl.lo_y, cl.lo_z, cl.hi_x, cl.hi_y, cl.hi_z)


def _recompute_uv(clusters: ClusterView, o: Vec3, d: Vec3, tri: Array):
    """Barycentric (u, v) for the winning triangle, one MT eval per ray
    on gathered triangle data — replaces the round-4 per-VISIT in-kernel
    onehot extraction, which tools/tpu_visit_bisect.py measured at
    ~0.5 us/visit (~40% of the whole visit cost).

    The 9 per-component gathers are packed into ONE (Nt, 16) padded
    row gather: XLA lowers a 1-D f32 gather as 1-lane row transfers, so
    nine separate gathers cost ~0.12 s at 1.43M rays on hardware where
    the single padded-row gather costs ~0.04 s (tools/tpu_gather_ab.py)."""
    idx = jnp.maximum(tri, 0)
    tab = jnp.stack([
        clusters.p0.x, clusters.p0.y, clusters.p0.z,
        clusters.e1.x, clusters.e1.y, clusters.e1.z,
        clusters.e2.x, clusters.e2.y, clusters.e2.z,
    ], axis=1)
    tab = jnp.pad(tab, ((0, 0), (0, 7)))
    g = tab[idx]
    p0 = Vec3(g[:, 0], g[:, 1], g[:, 2])
    e1 = Vec3(g[:, 3], g[:, 4], g[:, 5])
    e2 = Vec3(g[:, 6], g[:, 7], g[:, 8])
    pvx = d.y * e2.z - d.z * e2.y
    pvy = d.z * e2.x - d.x * e2.z
    pvz = d.x * e2.y - d.y * e2.x
    det = e1.x * pvx + e1.y * pvy + e1.z * pvz
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det),
                        0.0)
    tvx = o.x - p0.x
    tvy = o.y - p0.y
    tvz = o.z - p0.z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1.z - tvz * e1.y
    qvy = tvz * e1.x - tvx * e1.z
    qvz = tvx * e1.y - tvy * e1.x
    v = (d.x * qvx + d.y * qvy + d.z * qvz) * inv_det
    ok = tri >= 0
    return jnp.where(ok, u, 0.0), jnp.where(ok, v, 0.0)


@functools.partial(jax.jit, static_argnames=("block", "k_wide"))
def _closest_impl(tri, boxes, o, d, tmin, tmax, block: int, k_wide: int):
    """One frontier sweep over all rays. Returns per-ray (t, tri, u, v)
    plus per-block visit counts."""
    n = o[0].shape[0]
    n_pad = -(-n // block) * block
    pad = n_pad - n
    g = n_pad // block

    def pr(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(n_pad, 1)

    # padded rays get tmax = -1 -> empty E rows -> never elect clusters
    rays = tuple(pr(a) for a in (*o, *d, tmin)) + (pr(tmax, -1.0),)
    n_units = tri.shape[0]
    gp = boxes[0].shape[1]

    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    box_spec = pl.BlockSpec((1, gp), lambda i: (0, 0))
    out_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    f32 = jnp.float32
    t, tri_id, visits = pl.pallas_call(
        functools.partial(
            _closest_kernel, n_units=n_units, n_gtiles=gp // 128,
            k_wide=k_wide,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), f32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
        ],
        grid=(g,),
        in_specs=[ray_spec] * 8 + [hbm_spec] + [box_spec] * 6,
        out_specs=[out_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((block, gp), jnp.float32),
            pltpu.VMEM((2 * k_wide, 16, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * k_wide,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*rays, tri, *boxes)
    flat_out = lambda a: a.reshape(n_pad)[:n]
    return (flat_out(t), flat_out(tri_id),
            visits.reshape(g, block)[:, 0])


@functools.partial(jax.jit, static_argnames=("block", "k_wide"))
def _any_impl(tri, boxes, o, d, tmin, tmax, block: int, k_wide: int):
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
            _any_kernel, n_units=n_units, n_gtiles=gp // 128,
            k_wide=k_wide,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), bool),
        grid=(g,),
        in_specs=[ray_spec] * 8 + [hbm_spec] + [box_spec] * 6,
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block, gp), jnp.float32),
            pltpu.VMEM((2 * k_wide, 16, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * k_wide,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*rays, tri, *boxes)
    return occ.reshape(n_pad)[:n]


@functools.partial(
    jax.jit, static_argnames=("block", "k_wide", "do_sort", "with_uv"))
def _closest_full(clusters, o, d, tmin_b, tmax_b, tmax_fill,
                  block: int, k_wide: int, do_sort: bool,
                  with_uv: bool = True):
    """The WHOLE closest pipeline (sort -> gather -> kernel -> un-permute
    -> uv) under one jit: eager per-stage dispatch cost the round-4
    wrapper ~0.2 s per 1.43M-ray call (tools/tpu_trace_overhead.py);
    fused, the non-kernel stages are ~0.1 s."""
    if do_sort:
        perm, po, pd, ptmin, ptmax = _cosort_rays(
            clusters, o, d, tmin_b, tmax_b)
    else:
        po, pd = (o.x, o.y, o.z), (d.x, d.y, d.z)
        ptmin, ptmax = tmin_b, tmax_b

    t, tri, visits = _closest_impl(
        clusters.tri, _boxes(clusters), po, pd, ptmin, ptmax, block,
        k_wide,
    )
    if do_sort:
        # un-permute by co-sorting on the perm (a permutation of arange):
        # a multi-operand lax.sort beats two scatter-sets on hardware
        _p, t, tri = jax.lax.sort((perm, t, tri), dimension=0, num_keys=1)

    if with_uv:
        u, v = _recompute_uv(clusters, o, d, tri)
    else:
        # caller derives (u, v) from its own per-hit row fetch (the PT
        # shade fetch already gathers p0/e1/e2 by the same tri index) —
        # skipping the (Nt, 16) gather here saves ~20 ms per 1.43M rays
        u = jnp.zeros_like(t)
        v = jnp.zeros_like(t)
    missed = tri < 0
    hit = Hit(t=jnp.where(missed, tmax_fill, t), tri=tri, u=u, v=v)
    return hit, visits


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
    k_wide: int = DEF_K,
    with_uv: bool = True,
) -> Hit:
    """Closest-hit over the clustered soup (drop-in for trace_closest).

    return_visits=True additionally returns the per-block visit counts —
    the tracer's work metric, for attribution. with_uv=False skips the
    barycentric recompute (hit.u/v are zeros) for callers that derive
    them from their own per-hit row fetch."""
    _check_cp(clusters, block)
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    tmax_fill = tmax_b
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    do_sort = sort and n >= 4 * block
    hit, visits = _closest_full(clusters, o, d, tmin_b, tmax_b, tmax_fill,
                                block, k_wide, do_sort, with_uv)
    if return_visits:
        return hit, visits
    return hit


@functools.partial(
    jax.jit, static_argnames=("block", "k_wide", "do_sort"))
def _any_full(clusters, o, d, tmin_b, tmax_b, block: int, k_wide: int,
              do_sort: bool):
    if do_sort:
        perm, po, pd, tmin_b, tmax_b = _cosort_rays(
            clusters, o, d, tmin_b, tmax_b)
        o = Vec3(*po)
        d = Vec3(*pd)
    occ = _any_impl(
        clusters.tri, _boxes(clusters), (o.x, o.y, o.z), (d.x, d.y, d.z),
        tmin_b, tmax_b, block, k_wide
    )
    if do_sort:
        _p, occ_i = jax.lax.sort((perm, occ.astype(jnp.int32)),
                                 dimension=0, num_keys=1)
        occ = occ_i > 0
    return occ


def trace_any_frontier(
    clusters: ClusterView,
    o: Vec3,
    d: Vec3,
    tmin: Array,
    tmax: Array,
    active: Optional[Array] = None,
    block: int = DEF_BLK,
    sort: bool = True,
    k_wide: int = DEF_K_ANY,
) -> Array:
    _check_cp(clusters, block)
    n = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    do_sort = sort and n >= 4 * block
    occ = _any_full(clusters, o, d, tmin_b, tmax_b, block, k_wide, do_sort)
    if active is not None:
        occ = occ & active
    return occ
