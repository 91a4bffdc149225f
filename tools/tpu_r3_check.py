"""Round-3 combined TPU canary: binned tracer + PT megakernel, one process.

Stages (each prints a line; failures keep going so one wedge-window run
yields maximum information):
  1. binned tracer exactness vs cluster tracer (10k soup)
  2. big_room 1.43M incoherent rays: binned vs cluster timings (closest+any)
  3. mega kernel: cornell 64x64 image parity vs XLA path, then the
     cornell512 16-pass batched bench A/B (mega vs current XLA pipeline)
  4. bigroom full PT pass with tracer='binned'

Run ALONE (one TPU job at a time; wedge protocol in memory).
"""
import sys, os, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("connecting...", flush=True)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.scene.procedural import big_room, cornell_box, cornell_camera, random_soup
from fermat_tpu.scene.view import SceneView
from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.integrators.pt import PTOptions, render_pass

tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)


def stage(name):
    print(f"--- {name}", flush=True)


# ---------------- stage 0: speed-of-light micro-bench ----------------
# measures the roofline denominators on THIS chip (ROOFLINE.md): f32 VPU
# throughput via a dependent-chain FMA loop (dense elementwise, no memory),
# and HBM bandwidth via a big copy.
try:
    stage("speed-of-light micro")

    @jax.jit
    def fma_loop(x):
        def body(i, v):
            return v * 1.0000001 + 0.5
        return jax.lax.fori_loop(0, 512, body, x)

    x = jnp.ones((2048, 1024), jnp.float32)  # 2M lanes x 512 FMA = 2.1 GFLOP*2
    jax.block_until_ready(fma_loop(x))
    t0 = time.perf_counter()
    for _ in range(8):
        x = fma_loop(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / 8
    flops = 2048 * 1024 * 512 * 2  # mul+add per element per iter
    print(f"VPU f32 (dependent FMA chain): {flops/dt/1e12:.3f} Tflop/s",
          flush=True)

    @jax.jit
    def copy(a):
        return a * 1.0 + 1.0

    big = jnp.zeros((4096, 8192), jnp.float32)  # 128 MB read + 128 MB write
    jax.block_until_ready(copy(big))
    t0 = time.perf_counter()
    for _ in range(8):
        big = copy(big)
    jax.block_until_ready(big)
    dt = (time.perf_counter() - t0) / 8
    print(f"HBM stream (r+w): {2*big.size*4/dt/1e9:.1f} GB/s", flush=True)
except Exception:
    traceback.print_exc()

# ---------------- stage 1: binned exactness ----------------
try:
    stage("binned 10k exactness")
    from fermat_tpu.ops.pallas_binned_trace import (
        trace_any_binned, trace_closest_binned,
    )
    from fermat_tpu.ops.pallas_cluster_trace import (
        trace_any_cluster, trace_closest_cluster,
    )

    mesh = random_soup(10000, seed=7).device_view()
    cl = build_clusters(mesh)
    r = np.random.default_rng(3)
    o_np = (r.random((4096, 3)).astype(np.float32) - 0.5) * 12.0
    d_np = r.standard_normal((4096, 3)).astype(np.float32)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
    h_b = jax.block_until_ready(trace_closest_binned(cl, o, d, tmin, tmax))
    h_c = jax.block_until_ready(trace_closest_cluster(cl, o, d, tmin, tmax))
    hm = (np.asarray(h_b.hit_mask) == np.asarray(h_c.hit_mask)).mean()
    m = np.asarray(h_b.hit_mask) & np.asarray(h_c.hit_mask)
    tok = np.allclose(np.asarray(h_b.t)[m], np.asarray(h_c.t)[m],
                      rtol=1e-4, atol=1e-4)
    occ_b = jax.block_until_ready(trace_any_binned(cl, o, d, tmin, jnp.float32(6.0)))
    occ_c = jax.block_until_ready(trace_any_cluster(cl, o, d, tmin, jnp.float32(6.0)))
    om = (np.asarray(occ_b) == np.asarray(occ_c)).mean()
    print(f"10k: mask={hm*100:.2f}% t={tok} occ={om*100:.2f}%", flush=True)
except Exception:
    traceback.print_exc()

# ---------------- stage 2: big_room timings ----------------
rcl = None
room = None
try:
    stage("bigroom binned vs cluster")
    room = big_room(n_boxes=8300)
    rmesh = room.device_view()
    rcl = build_clusters(rmesh)
    print(f"tris={rmesh.n_triangles} clusters={rcl.n_clusters}", flush=True)
    n = 1433600
    o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
    o_np[:, 1] += 2.0
    d_np = r.standard_normal((n, 3)).astype(np.float32)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))

    def timed(fn, label):
        out = jax.block_until_ready(fn())
        best = 1e30
        for _ in range(2):
            t0 = time.time()
            out = jax.block_until_ready(fn())
            best = min(best, time.time() - t0)
        print(f"{label}: {best:.3f}s = {n/best/1e6:.2f} Mrays/s", flush=True)
        return out

    hb = timed(lambda: trace_closest_binned(rcl, o, d, tmin, tmax),
               "binned closest incoh")
    hc = timed(lambda: trace_closest_cluster(rcl, o, d, tmin, tmax),
               "cluster closest incoh")
    mm = (np.asarray(hb.hit_mask) == np.asarray(hc.hit_mask)).mean()
    both = np.asarray(hb.hit_mask) & np.asarray(hc.hit_mask)
    tagree = np.isclose(np.asarray(hb.t)[both], np.asarray(hc.t)[both],
                        rtol=1e-4, atol=1e-4).mean()
    print(f"agreement: mask={mm*100:.3f}% t={tagree*100:.3f}%", flush=True)
    timed(lambda: trace_any_binned(rcl, o, d, tmin, jnp.float32(4.0)),
          "binned any")
    timed(lambda: trace_any_cluster(rcl, o, d, tmin, jnp.float32(4.0)),
          "cluster any")
except Exception:
    traceback.print_exc()

# ---------------- stage 2b: binned phase attribution ----------------
try:
    stage("binned phase attribution")
    import functools
    from fermat_tpu.ops import pallas_binned_trace as bt

    boxes = (rcl.lo_x, rcl.lo_y, rcl.lo_z, rcl.hi_x, rcl.hi_y, rcl.hi_z)
    n = o.x.shape[0]
    tmaxb = jnp.full((n,), 3e38, jnp.float32)
    tminb = jnp.full((n,), 1e-4, jnp.float32)

    @jax.jit
    def scan_once(last_e, last_c):
        return bt._frontier_scan(boxes, o, d, tminb, tmaxb, last_e, last_c,
                                 ordered=True)

    le0 = jnp.full((n,), -3e38, jnp.float32)
    lc0 = jnp.full((n,), -1, jnp.int32)
    ent, cid = jax.block_until_ready(scan_once(le0, lc0))
    t0 = time.perf_counter()
    for _ in range(4):
        ent, cid = scan_once(le0, lc0)
    jax.block_until_ready(cid)
    print(f"frontier scan: {(time.perf_counter()-t0)/4*1e3:.1f} ms", flush=True)

    srt = jax.jit(jnp.argsort)
    jax.block_until_ready(srt(cid))
    t0 = time.perf_counter()
    for _ in range(4):
        p = srt(cid)
    jax.block_until_ready(p)
    print(f"argsort: {(time.perf_counter()-t0)/4*1e3:.1f} ms", flush=True)

    @jax.jit
    def kernel_once(cid):
        perm = jnp.argsort(cid)
        g = lambda a: a[perm]
        rays_s = tuple(g(a) for a in (o.x, o.y, o.z, d.x, d.y, d.z,
                                      tminb, tmaxb))
        k = functools.partial(bt._binned_closest_kernel,
                              n_units=rcl.tri.shape[0], u_steps=bt.U_STEPS)
        return bt._run_kernel(k, ("f", "i", "f", "f", "f"), rcl.tri, rays_s,
                              g(cid), bt.DEF_BLK)[0]

    jax.block_until_ready(kernel_once(cid))
    t0 = time.perf_counter()
    for _ in range(4):
        r_ = kernel_once(cid)
    jax.block_until_ready(r_)
    print(f"sort+gather+kernel round: {(time.perf_counter()-t0)/4*1e3:.1f} ms",
          flush=True)

    # round count of the full trace (host loop mirror, cheap count)
    @jax.jit
    def count_rounds():
        def cond(st):
            r, alive, *_ = st
            return (r < 4 * boxes[0].shape[1]) & alive

        def body(st):
            r, _a, tb, le, lc = st
            e2, c2 = bt._frontier_scan(boxes, o, d, tminb, tb, le, lc,
                                       ordered=True)
            alive = jnp.any(c2 < bt._SENT)
            # advance as if every frontier were tested and missed (upper
            # bound on rounds; real rounds terminate earlier via t_best)
            return r + 1, alive, tb, jnp.where(c2 < bt._SENT, e2, le), \
                jnp.where(c2 < bt._SENT, c2, lc)

        st = (jnp.int32(0), jnp.bool_(True), tmaxb, le0, lc0)
        return jax.lax.while_loop(cond, body, st)[0]

    print(f"upper-bound rounds (no-hit walk): {int(count_rounds())}",
          flush=True)
except Exception:
    traceback.print_exc()

# ---------------- stage 4: bigroom full pass, binned ----------------
try:
    stage("bigroom PT pass binned")
    from fermat_tpu.core.camera import Camera

    cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
    rv = SceneView.build(room, cam)
    opts = PTOptions(max_path_length=6, lobes=scene_lobes(room.materials),
                     tracer="binned")
    out = render_pass(rv, opts, 1600, 896, jnp.uint32(0))
    jax.block_until_ready(out.composited.x)
    t0 = time.time()
    out = render_pass(rv, opts, 1600, 896, jnp.uint32(1))
    img = jax.block_until_ready(out.composited.x)
    dt = time.time() - t0
    print(f"bigroom 1600x896 binned pass: {dt:.2f}s  "
          f"{float(out.rays)/dt/1e6:.2f} Mrays/s  mean={float(jnp.mean(img)):.4f}",
          flush=True)
except Exception:
    traceback.print_exc()

# ---------------- stage 3: megakernel ----------------
try:
    stage("mega parity 64x64")
    scene = cornell_box(glossy_boxes=True)
    view = SceneView.build(scene, cornell_camera())
    mopts = PTOptions(max_path_length=6, lobes=scene_lobes(scene.materials),
                      tracer="mega")
    xopts = mopts._replace(tracer="pallas")
    out_m = render_pass(view, mopts, 64, 64, jnp.uint32(2))
    img_m = jax.block_until_ready(out_m.composited.x)
    out_x = render_pass(view, xopts, 64, 64, jnp.uint32(2))
    img_x = jax.block_until_ready(out_x.composited.x)
    close = np.isclose(np.asarray(img_m), np.asarray(img_x),
                       rtol=5e-4, atol=1e-5).mean()
    print(f"mega vs xla pixel agreement: {close*100:.3f}% "
          f"rays {float(out_m.rays):.0f} vs {float(out_x.rays):.0f}",
          flush=True)

    stage("cornell512 bench A/B")
    from fermat_tpu.ops.pallas_pt_mega import build_mega_tables, render_pass_mega

    res = 512
    n_passes = 16
    tb = build_mega_tables(view, res, res, mopts.ray_eps)

    @jax.jit
    def batch_mega(instance0):
        def body(i, carry):
            acc, rays = carry
            out = render_pass_mega(view, mopts, res, res, instance0 + i,
                                   tables=tb)
            return (acc + out.composited.x, rays + out.rays)
        return jax.lax.fori_loop(
            0, n_passes, body,
            (jnp.zeros(res * res, jnp.float32), jnp.zeros((), jnp.float32)))

    @jax.jit
    def batch_xla(instance0):
        def body(i, carry):
            acc, rays = carry
            out = render_pass(view, xopts, res, res, instance0 + i)
            return (acc + out.composited.x, rays + out.rays)
        return jax.lax.fori_loop(
            0, n_passes, body,
            (jnp.zeros(res * res, jnp.float32), jnp.zeros((), jnp.float32)))

    for name, fn in (("mega", batch_mega), ("xla", batch_xla)):
        img, rays = jax.block_until_ready(fn(jnp.uint32(0)))
        best = 1e30
        for rep in range(3):
            t0 = time.perf_counter()
            img, rays = jax.block_until_ready(fn(jnp.uint32(7 + rep)))
            best = min(best, time.perf_counter() - t0)
        print(f"cornell512 {name}: {float(rays)/best/1e6:.2f} Mrays/s  "
              f"{best/n_passes*1e3:.1f} ms/pass  mean={float(jnp.mean(img))/n_passes:.4f}",
              flush=True)
except Exception:
    traceback.print_exc()

print("DONE", flush=True)
