"""Hardware A/B + exactness check for the subcluster composite tracer.

Compares the round-5 L32 4-phase tracer (ops/pallas_sub_trace.py) to the
gen-4 frontier tracer on the big_room 1.43M-ray workload: camera-coherent
closest, incoherent closest, incoherent anyhit. Exactness spot-checked vs
the frontier results (themselves brute-verified on CPU).

Usage: python tools/tpu_sub_check.py [blk [nc,nc,...]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices(), flush=True)

from fermat_tpu.accel.cluster import build_clusters, build_subclusters
from fermat_tpu.core.camera import Camera, generate_camera_rays
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_frontier_trace import (
    trace_any_frontier,
    trace_closest_frontier,
)
from fermat_tpu.ops.pallas_sub_trace import trace_any_sub, trace_closest_sub
from fermat_tpu.scene.procedural import big_room

BLK = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NCS = ([int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2
       else [1, 2, 4])

room = big_room(n_boxes=8300).device_view()
cl = build_clusters(room)
sv = build_subclusters(room)
print(f"clusters (padded): {cl.lo_x.shape[1]}  subclusters (padded): "
      f"{sv.lo_x.shape[1]}", flush=True)
W, H = 1600, 896
n = W * H
cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
half = jnp.full((n,), 0.5, jnp.float32)
oc, dc, _ = generate_camera_rays(cam, W, H, half, half)
r = np.random.default_rng(3)
o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
o_np[:, 1] += 2.0
d_np = r.standard_normal((n, 3)).astype(np.float32)
oi = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
di = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))


def t(fn):
    jax.block_until_ready(fn())
    best = 1e30
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(fn())
        best = min(best, time.time() - t0)
    return best


# frontier baseline (its tuned defaults)
fc = t(lambda: trace_closest_frontier(cl, oc, dc, tmin, tmax).t)
fi = t(lambda: trace_closest_frontier(cl, oi, di, tmin, tmax).t)
fa = t(lambda: trace_any_frontier(cl, oi, di, tmin, jnp.float32(4.0)))
h_ref, vis_f = trace_closest_frontier(cl, oi, di, tmin, tmax,
                                      return_visits=True)
ref_t = np.asarray(h_ref.t)
occ_ref = np.asarray(trace_any_frontier(cl, oi, di, tmin, jnp.float32(4.0)))
print(f"frontier: camera {fc:.3f}s  incoh {fi:.3f}s "
      f"({n / fi / 1e6:.2f} Mrays/s)  any {fa:.3f}s  "
      f"visits/blk {float(jnp.mean(vis_f)):.1f}", flush=True)

for nc in NCS:
    sc = t(lambda: trace_closest_sub(sv, oc, dc, tmin, tmax, block=BLK,
                                     nc=nc).t)
    si = t(lambda: trace_closest_sub(sv, oi, di, tmin, tmax, block=BLK,
                                     nc=nc).t)
    sa = t(lambda: trace_any_sub(sv, oi, di, tmin, jnp.float32(4.0),
                                 block=BLK, nc=nc))
    hit, vis = trace_closest_sub(sv, oi, di, tmin, tmax, block=BLK, nc=nc,
                                 return_visits=True)
    occ = np.asarray(trace_any_sub(sv, oi, di, tmin, jnp.float32(4.0),
                                   block=BLK, nc=nc))
    tv = np.asarray(hit.t)
    agree = float(np.mean(np.isclose(tv, ref_t, rtol=1e-5, atol=1e-5)))
    agree_a = float(np.mean(occ == occ_ref))
    print(f"sub BLK={BLK} NC={nc}: camera {sc:.3f}s  incoh {si:.3f}s "
          f"({n / si / 1e6:.2f} Mrays/s)  any {sa:.3f}s  "
          f"visits/blk {float(jnp.mean(vis)):.1f}  "
          f"t-agree {agree * 100:.3f}%  any-agree {agree_a * 100:.3f}%",
          flush=True)
print("DONE", flush=True)
