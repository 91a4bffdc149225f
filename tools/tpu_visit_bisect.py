"""Bisect the frontier kernel's per-visit cost on hardware.

ROOFLINE says ~1.4 us/visit measured vs ~0.25 us of VPU arithmetic
(MT tile + pick reduce) — this tool isolates where the other ~1 us goes
by running stripped kernel variants on the big_room incoherent workload:

  full        the real K-wide kernel (baseline)
  no-mt       pick + DMA + loop, MT replaced by a 2-op dummy update
  no-pick     MT + DMA + loop, visits clusters round-robin (no E reduce,
              fixed visit count = measured mean)
  no-dma      pick + MT + loop, DMAs never issued (tests stale slot 0)
  loop-only   dummy everything: loop + DMA only, fixed visit count

Every variant runs the same visit COUNT (from the full kernel's visit
output) so the per-iteration overhead comparison is apples-to-apples.
Results are written to stdout; they decide the round-5 kernel design
(transposed fine-leaf MT vs pipeline restructuring).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), jax.devices(), flush=True)

from fermat_tpu.accel.cluster import CLUSTER, build_clusters
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_cluster_trace import (
    _argmin_row,
    _cluster_dma,
    _mt_tile,
)
from fermat_tpu.ops.pallas_frontier_trace import (
    _build_entry_matrix,
    _sort_perm_packed,
    trace_closest_frontier,
)
from fermat_tpu.scene.procedural import big_room

_BIG = 3.0e38
BLK = int(__import__('sys').argv[1]) if len(__import__('sys').argv)>1 else 128
K = int(__import__('sys').argv[2]) if len(__import__('sys').argv)>2 else 4


def _kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    tri_hbm,
    lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
    t_out, visits_out,
    e_ref, tri_vmem, sem,
    *, n_units, n_gtiles, mode, fixed_groups,
):
    blk = ox_ref.shape[0]
    cp = n_gtiles * 128
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    e_lim = tmax_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)

    do_pick = mode in ("full", "no-mt", "no-dma")
    do_mt = mode in ("full", "no-pick", "no-dma")
    do_dma = mode in ("full", "no-mt", "no-pick", "loop-only")

    if do_pick:
        _build_entry_matrix(
            e_ref, ox, oy, oz, dx, dy, dz, tmin, e_lim,
            lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref, n_gtiles,
        )

    def dma(slot, c):
        return _cluster_dma(tri_hbm, tri_vmem.at[slot], sem.at[slot], c)

    def pick_group(t_best, excl):
        t_lim = jnp.minimum(t_best, e_lim)
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

    def pick_rr(i):
        # round-robin cluster ids, always "on"
        cs = tuple(jax.lax.rem(i * K + k, n_units) for k in range(K))
        return cs, (jnp.bool_(True),) * K

    t_best0 = tmax_ref[:]
    excl0 = jnp.zeros((1, cp), jnp.float32)
    if do_pick:
        cs0, oks0, excl0 = pick_group(t_best0, excl0)
    else:
        cs0, oks0 = pick_rr(jnp.int32(0))
    if do_dma:
        for k in range(K):
            @pl.when(oks0[k])
            def _(k=k):
                dma(k, cs0[k]).start()

    def cond(carry):
        i, cs, oks, *_ = carry
        if do_pick:
            return oks[0] & (i < n_units + 1)
        return i < fixed_groups

    def body(carry):
        i, cs, oks, excl, t_best, nvis = carry
        base = jax.lax.rem(i, 2) * K
        if do_pick:
            cs_n, oks_n, excl = pick_group(t_best, excl)
        else:
            cs_n, oks_n = pick_rr(i + 1)
        if do_dma:
            nbase = K - base
            for k in range(K):
                @pl.when(oks_n[k])
                def _(k=k):
                    dma(nbase + k, cs_n[k]).start()
        nvis = nvis + sum(jnp.where(ok, 1.0, 0.0) for ok in oks)
        for k in range(K):
            if do_dma:
                @pl.when(oks[k])
                def _(k=k):
                    dma(base + k, cs[k]).wait()
            if do_mt:
                tri = tuple(
                    tri_vmem[base + k, c, :].reshape(1, CLUSTER)
                    for c in range(9)
                )
                tt, uu, vv, ok = _mt_tile(
                    ox, oy, oz, dx, dy, dz, tmin, t_best, tri
                )
                ids = tri_vmem[base + k, 9, :].reshape(1, CLUSTER)
                ok = ok & (ids >= 0.0)
                tt = jnp.where(ok, tt, _BIG)
                live = jnp.where(oks[k], 1.0, 0.0)
                tt = jnp.where(live > 0.0, tt, _BIG)
                t_new = jnp.min(tt, axis=1, keepdims=True)
                t_best = jnp.minimum(t_best, t_new)
            else:
                # 2-op dummy keeping the carry alive
                t_best = t_best - jnp.float32(0.0)
        return (i + 1, cs_n, oks_n, excl, t_best, nvis)

    init = (jnp.int32(0), cs0, oks0, excl0, t_best0,
            jnp.zeros((), jnp.float32))
    (_i, cs_p, oks_p, _ex, t_best, nvis) = jax.lax.while_loop(
        cond, body, init)
    if do_dma:
        pbase = jax.lax.rem(_i, 2) * K
        for k in range(K):
            @pl.when(oks_p[k])
            def _(k=k):
                dma(pbase + k, cs_p[k]).wait()
    t_out[:] = t_best
    visits_out[:] = jnp.zeros_like(t_best) + nvis


@functools.partial(jax.jit, static_argnames=("mode", "fixed_groups"))
def run(tri, boxes, o, d, tmin, tmax, mode, fixed_groups):
    n = o[0].shape[0]
    g = n // BLK
    gp = boxes[0].shape[1]
    rays = tuple(a.reshape(n, 1) for a in (*o, *d, tmin, tmax))
    ray_spec = pl.BlockSpec((BLK, 1), lambda i: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    box_spec = pl.BlockSpec((1, gp), lambda i: (0, 0))
    out_spec = pl.BlockSpec((BLK, 1), lambda i: (i, 0))
    t, v = pl.pallas_call(
        functools.partial(_kernel, n_units=tri.shape[0],
                          n_gtiles=gp // 128, mode=mode,
                          fixed_groups=fixed_groups),
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32)] * 2,
        grid=(g,),
        in_specs=[ray_spec] * 8 + [hbm_spec] + [box_spec] * 6,
        out_specs=[out_spec] * 2,
        scratch_shapes=[
            pltpu.VMEM((BLK, gp), jnp.float32),
            pltpu.VMEM((2 * K, 16, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * K,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*rays, tri, *boxes)
    return t, v


def main():
    room = big_room(n_boxes=8300).device_view()
    cl = build_clusters(room)
    n = 1600 * 896
    r = np.random.default_rng(3)
    o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
    o_np[:, 1] += 2.0
    d_np = r.standard_normal((n, 3)).astype(np.float32)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
    tmin_b = jnp.full((n,), 1e-4, jnp.float32)
    tmax_b = jnp.full((n,), 3e38, jnp.float32)
    perm = _sort_perm_packed(cl, o, d, tmin_b, tmax_b)
    g = lambda a: a[perm]
    o_s = (g(o.x), g(o.y), g(o.z))
    d_s = (g(d.x), g(d.y), g(d.z))

    # mean visit count from the real tracer (drives fixed-count variants)
    _, vis = trace_closest_frontier(cl, o, d, tmin_b, tmax_b,
                                    return_visits=True)
    mean_groups = int(np.ceil(float(jnp.mean(vis)) / K))
    print(f"mean visits/blk {float(jnp.mean(vis)):.1f} -> fixed groups "
          f"{mean_groups}", flush=True)

    boxes = (cl.lo_x, cl.lo_y, cl.lo_z, cl.hi_x, cl.hi_y, cl.hi_z)
    for mode in ("full", "no-mt", "no-dma", "no-pick", "loop-only"):
        fn = lambda: run(cl.tri, boxes, o_s, d_s, tmin_b, tmax_b,
                         mode, mean_groups)
        t, v = fn()
        jax.block_until_ready(t)
        best = 1e30
        for _ in range(2):
            t0 = time.time()
            t, v = fn()
            jax.block_until_ready(t)
            best = min(best, time.time() - t0)
        nvis = float(jnp.sum(v[:, 0].reshape(-1, BLK)[:, 0]))
        per_visit = best / max(nvis, 1) * 1e6
        print(f"{mode:10s}: {best:6.3f}s  visits {nvis/1e3:8.0f}k  "
              f"{per_visit:6.3f} us/visit", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
