"""TPU validation + timing of the frontier tracer (round 3, v3 design).

Stages:
  1. 10k-soup exactness vs the cluster tracer (closest + any)
  2. big_room 1.43M incoherent rays: frontier closest/any timings vs the
     round-2 cluster tracer numbers (0.15 / 0.58 Mrays/s)
  3. big_room full PT pass, tracer='frontier' (round-2 cluster: 30.9 s)
Run ALONE (one TPU job at a time).
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
from fermat_tpu.scene.procedural import big_room, random_soup
from fermat_tpu.ops.pallas_frontier_trace import (
    trace_any_frontier, trace_closest_frontier,
)
from fermat_tpu.ops.pallas_cluster_trace import (
    trace_any_cluster, trace_closest_cluster,
)

tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
r = np.random.default_rng(3)


def mkrays(n, spread=12.0, ylift=0.0):
    o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * spread
    o_np[:, 1] += ylift
    d_np = r.standard_normal((n, 3)).astype(np.float32)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
    return o, d


try:
    print("--- 10k exactness", flush=True)
    mesh = random_soup(10000, seed=7).device_view()
    cl = build_clusters(mesh)
    o, d = mkrays(4096)
    h_f = jax.block_until_ready(trace_closest_frontier(cl, o, d, tmin, tmax))
    h_c = jax.block_until_ready(trace_closest_cluster(cl, o, d, tmin, tmax))
    hm = (np.asarray(h_f.hit_mask) == np.asarray(h_c.hit_mask)).mean()
    m = np.asarray(h_f.hit_mask) & np.asarray(h_c.hit_mask)
    tok = np.allclose(np.asarray(h_f.t)[m], np.asarray(h_c.t)[m],
                      rtol=1e-4, atol=1e-4)
    occ_f = jax.block_until_ready(
        trace_any_frontier(cl, o, d, tmin, jnp.float32(6.0)))
    occ_c = jax.block_until_ready(
        trace_any_cluster(cl, o, d, tmin, jnp.float32(6.0)))
    om = (np.asarray(occ_f) == np.asarray(occ_c)).mean()
    print(f"10k: mask={hm*100:.2f}% t={tok} occ={om*100:.2f}%", flush=True)
except Exception:
    traceback.print_exc()

try:
    print("--- bigroom 1.43M timings", flush=True)
    room = big_room(n_boxes=8300)
    rm = room.device_view()
    rcl = build_clusters(rm)
    print(f"tris={rm.n_triangles} clusters={rcl.n_clusters}", flush=True)
    n = 1433600
    o, d = mkrays(n, spread=10.0, ylift=2.0)

    def timed(fn, label):
        out = jax.block_until_ready(fn())
        best = 1e30
        for _ in range(2):
            t0 = time.time()
            out = jax.block_until_ready(fn())
            best = min(best, time.time() - t0)
        print(f"{label}: {best:.3f}s = {n/best/1e6:.2f} Mrays/s", flush=True)
        return out

    hf = timed(lambda: trace_closest_frontier(rcl, o, d, tmin, tmax),
               "frontier closest incoh")
    timed(lambda: trace_any_frontier(rcl, o, d, tmin, jnp.float32(4.0)),
          "frontier any")
    hc = jax.block_until_ready(trace_closest_cluster(rcl, o, d, tmin, tmax))
    mm = (np.asarray(hf.hit_mask) == np.asarray(hc.hit_mask)).mean()
    both = np.asarray(hf.hit_mask) & np.asarray(hc.hit_mask)
    tag = np.isclose(np.asarray(hf.t)[both], np.asarray(hc.t)[both],
                     rtol=1e-4, atol=1e-4).mean()
    print(f"agreement vs cluster: mask={mm*100:.3f}% t={tag*100:.3f}%",
          flush=True)
except Exception:
    traceback.print_exc()

try:
    print("--- bigroom PT pass (frontier)", flush=True)
    from fermat_tpu.bsdf.composite import scene_lobes
    from fermat_tpu.core.camera import Camera
    from fermat_tpu.integrators.pt import PTOptions, render_pass
    from fermat_tpu.scene.view import SceneView

    cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
    rv = SceneView.build(room, cam)
    opts = PTOptions(max_path_length=6, lobes=scene_lobes(room.materials),
                     tracer="frontier")
    out = render_pass(rv, opts, 1600, 896, jnp.uint32(0))
    jax.block_until_ready(out.composited.x)
    t0 = time.time()
    out = render_pass(rv, opts, 1600, 896, jnp.uint32(1))
    img = jax.block_until_ready(out.composited.x)
    dt = time.time() - t0
    print(f"bigroom 1600x896 frontier pass: {dt:.2f}s  "
          f"{float(out.rays)/dt/1e6:.2f} Mrays/s  "
          f"mean={float(jnp.mean(img)):.4f}", flush=True)
except Exception:
    traceback.print_exc()

print("DONE", flush=True)
