"""Same-process K-wide A/B for the frontier tracer (round 5).

K = clusters visited per loop iteration. K=1 reproduces the round-4
one-visit-per-iteration schedule; larger K amortizes the (BLK, Cp) pick
reduce and the pick->DMA->test dependent-chain latency over K visits.
Measures camera-coherent closest, incoherent closest, incoherent anyhit
on the big_room 1.43M-ray workload, plus visit-count inflation.

Usage: python tools/tpu_kwide_ab.py [blk]
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

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.core.camera import Camera, generate_camera_rays
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_frontier_trace import (
    trace_any_frontier,
    trace_closest_frontier,
)
from fermat_tpu.scene.procedural import big_room

BLK = int(sys.argv[1]) if len(sys.argv) > 1 else 128

room = big_room(n_boxes=8300).device_view()
cl = build_clusters(room)
print("clusters (padded):", cl.lo_x.shape[1], flush=True)
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


ref_t = None
base_vis = None
for k in (1, 2, 4, 8):
    cc = t(lambda: trace_closest_frontier(
        cl, oc, dc, tmin, tmax, block=BLK, k_wide=k).t)
    ci = t(lambda: trace_closest_frontier(
        cl, oi, di, tmin, tmax, block=BLK, k_wide=k).t)
    ac = t(lambda: trace_any_frontier(
        cl, oi, di, tmin, jnp.float32(4.0), block=BLK, k_wide=k))
    hit, vis = trace_closest_frontier(
        cl, oi, di, tmin, tmax, block=BLK, k_wide=k, return_visits=True)
    vis = float(jnp.mean(vis))
    tv = np.asarray(hit.t)
    if ref_t is None:
        ref_t, base_vis = tv, vis
        agree = 1.0
    else:
        agree = float(np.mean(np.isclose(tv, ref_t, rtol=1e-5, atol=1e-5)))
    print(f"K={k}: camera-closest {cc:.3f}s  incoh-closest {ci:.3f}s "
          f"({n / ci / 1e6:.2f} Mrays/s)  incoh-any {ac:.3f}s  "
          f"visits/blk {vis:.1f} ({vis / base_vis:.3f}x)  "
          f"t-agree {agree * 100:.3f}%", flush=True)
print("DONE", flush=True)
