"""Micro A/B: Moller-Trumbore vs Woop-affine triangle tile on TPU.

ROOFLINE.md puts the frontier tracer's per-visit floor at the MT tile:
~56 (BLK,128) VPU ops per visit (0.74 M lane-ops of the ~0.97 M total).
The Woop-style alternative precomputes a per-triangle world->barycentric
affine transform (a1,b1 / a2,b2 / n,c = 12 f32 rows vs MT's 9) so the
pair-dependent work becomes SIX tiny MXU matmuls ((BLK,3)@(3,128):
n.o, n.d, o.a1, d.a1, o.a2, d.a2) plus ~16 elementwise ops:

    t = (c - n.o) / (n.d)
    u = (o.a1 + b1) + t * (d.a1)     v = (o.a2 + b2) + t * (d.a2)

This tool measures both as standalone Pallas kernels with the SAME
dependent visit chain as the frontier kernel (fori over V visits of one
VMEM-resident 128-tri tile, t_best carried through) and cross-checks
hit agreement. If Woop wins big it is the round-5 lever for the
incoherent-trace floor; if not, the negative result goes to ROOFLINE.

Usage: python tools/tpu_micro_woop.py [visits] [blk]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_BIG = 3.0e37
_EPS_DET = 1e-12


def _mt_body(ox, oy, oz, dx, dy, dz, t_best, rows):
    p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = [
        rows[i, :].reshape(1, 128) for i in range(9)]
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = jnp.where(
        jnp.abs(det) > _EPS_DET, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tvx = ox - p0x
    tvy = oy - p0y
    tvz = oz - p0z
    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    ok = ((jnp.abs(det) > _EPS_DET)
          & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
          & (tt > 1e-4) & (tt < t_best))
    return jnp.where(ok, tt, _BIG)


def _woop_body(o3, d3, ox_b, t_best, rows):
    # rows: 12 x 128 = a1(3) b1 a2(3) b2 n(3) c
    a1 = rows[0:3, :]
    b1 = rows[3, :].reshape(1, 128)
    a2 = rows[4:7, :]
    b2 = rows[7, :].reshape(1, 128)
    nr = rows[8:11, :]
    cc = rows[11, :].reshape(1, 128)
    f32 = jnp.float32
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    n_o = mm(o3, nr)       # (BLK,128)
    n_d = mm(d3, nr)
    u0 = mm(o3, a1) + b1
    u1 = mm(d3, a1)
    v0 = mm(o3, a2) + b2
    v1 = mm(d3, a2)
    inv = jnp.where(jnp.abs(n_d) > _EPS_DET,
                    1.0 / jnp.where(n_d == 0.0, 1.0, n_d), 0.0)
    tt = (cc - n_o) * inv
    uu = u0 + tt * u1
    vv = v0 + tt * v1
    ok = ((jnp.abs(n_d) > _EPS_DET)
          & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
          & (tt > 1e-4) & (tt < t_best))
    return jnp.where(ok, tt, _BIG)


def _kernel(mode, visits, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            rows_ref, tb_ref, id_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    blk = ox.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, 128), 1).astype(
        jnp.float32)
    if mode == "woop":
        o3 = jnp.concatenate([ox, oy, oz], axis=1)  # (BLK,3)
        d3 = jnp.concatenate([dx, dy, dz], axis=1)

    nrows = 12 if mode == "woop" else 9

    def body(i, carry):
        # a DIFFERENT tile every visit (pl.ds over V stacked tiles):
        # with a static tile the compiler hoists the whole intersection
        # out of the loop and the timing measures nothing
        t_best, id_best = carry
        rows = rows_ref[pl.ds(i * nrows, nrows), :]
        if mode == "woop":
            tt = _woop_body(o3, d3, ox, t_best, rows)
        else:
            tt = _mt_body(ox, oy, oz, dx, dy, dz, t_best, rows)
        t_new = jnp.min(tt, axis=1, keepdims=True)
        got = t_new < t_best
        cand = jnp.where(tt == t_new, col, 128.0)
        kmin = jnp.min(cand, axis=1, keepdims=True)
        id_new = kmin + jnp.float32(128.0) * i
        t_best = jnp.where(got, t_new, t_best)
        id_best = jnp.where(got, id_new, id_best)
        return t_best, id_best

    t0 = jnp.full((blk, 1), _BIG, jnp.float32)
    i0 = jnp.full((blk, 1), -1.0, jnp.float32)
    t_b, i_b = jax.lax.fori_loop(0, visits, body, (t0, i0))
    tb_ref[:] = t_b
    id_ref[:] = i_b


@functools.partial(jax.jit, static_argnames=("mode", "visits", "blk"))
def run(o, d, rows, mode: str, visits: int, blk: int):
    n = o.shape[0]
    g = n // blk
    nrows = 12 if mode == "woop" else 9
    col1 = lambda i: pl.BlockSpec((blk, 1), lambda b: (b, 0))
    return pl.pallas_call(
        functools.partial(_kernel, mode, visits),
        grid=(g,),
        in_specs=[col1(i) for i in range(6)]
        + [pl.BlockSpec((visits * nrows, 128), lambda b: (0, 0))],
        out_specs=[pl.BlockSpec((blk, 1), lambda b: (b, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32)] * 2,
    )(o[:, 0:1], o[:, 1:2], o[:, 2:3], d[:, 0:1], d[:, 1:2], d[:, 2:3],
      rows)


def main():
    visits = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    blk = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(7)
    n = 1 << 20
    o = (r.random((n, 3), np.float32) - 0.5) * 2.0
    d = r.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    nt = 128 * visits  # a distinct 128-tri tile per visit
    v0 = (r.random((nt, 3), np.float32) - 0.5) * 4.0
    e1 = r.standard_normal((nt, 3)).astype(np.float32)
    e2 = r.standard_normal((nt, 3)).astype(np.float32)
    rows_mt = np.concatenate([
        np.concatenate([v0[s:s + 128].T, e1[s:s + 128].T, e2[s:s + 128].T],
                       axis=0)
        for s in range(0, nt, 128)], axis=0)  # (9*V, 128)
    nrm = np.cross(e1, e2)
    n2 = np.sum(nrm * nrm, axis=1, keepdims=True)
    a1 = np.cross(e2, nrm) / n2
    a2 = np.cross(nrm, e1) / n2
    b1 = -np.sum(a1 * v0, axis=1, keepdims=True)
    b2 = -np.sum(a2 * v0, axis=1, keepdims=True)
    # normalized plane equation: t = (c - n.o)/(n.d) with |n| = 1 keeps
    # the epsilon scale-free (MT's det carries |e1 x e2|)
    nhat = nrm / np.sqrt(n2)
    c = np.sum(nhat * v0, axis=1, keepdims=True)
    rows_wp = np.concatenate([
        np.concatenate([a1[s:s + 128].T, b1[s:s + 128].T, a2[s:s + 128].T,
                        b2[s:s + 128].T, nhat[s:s + 128].T, c[s:s + 128].T],
                       axis=0)
        for s in range(0, nt, 128)], axis=0)  # (12*V, 128)

    oj, dj = jnp.asarray(o), jnp.asarray(d)
    res = {}
    for mode, rows in (("mt", rows_mt), ("woop", rows_wp)):
        rj = jnp.asarray(rows)
        t, i = run(oj, dj, rj, mode, visits, blk)
        jax.block_until_ready(t)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            t, i = run(oj, dj, rj, mode, visits, blk)
        jax.block_until_ready(t)
        dt = (time.perf_counter() - t0) / reps
        per_visit = dt / (n // blk) / visits * 1e9
        res[mode] = (np.asarray(t), np.asarray(i), dt)
        print(f"{mode:4s}: {dt*1e3:7.2f} ms  ({per_visit:6.0f} ns/block-visit,"
              f" {dt/ (n*visits) * 1e12:.1f} ps/pair)", flush=True)
    tm, im, _ = res["mt"]
    tw, iw, _ = res["woop"]
    hitm = tm < _BIG
    hitw = tw < _BIG
    agree = np.mean(hitm == hitw)
    tdiff = np.abs(tm[hitm & hitw] - tw[hitm & hitw])
    rel = tdiff / np.maximum(np.abs(tm[hitm & hitw]), 1e-6)
    print(f"hit-mask agreement {agree*100:.4f}%  "
          f"t maxrel {rel.max() if rel.size else 0.0:.2e}  "
          f"id match {np.mean(im[hitm & hitw] == iw[hitm & hitw])*100:.3f}%",
          flush=True)
    print(f"SPEEDUP (mt/woop): {res['mt'][2]/res['woop'][2]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
