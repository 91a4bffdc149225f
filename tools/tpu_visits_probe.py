"""Measure frontier-tracer per-block visit counts on big_room (hardware).

Separates the two possible slowness causes: visit COUNT (union size) vs
per-visit COST. Prints visit histograms for camera-coherent and
incoherent 1.43M-ray closest traces + the timing, giving us s/visit.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices(),
      "blk=", os.environ.get("FERMAT_FRONTIER_BLK", "512"), flush=True)

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.core.camera import Camera, generate_camera_rays
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_frontier_trace import trace_closest_frontier
from fermat_tpu.scene.procedural import big_room

room = big_room(n_boxes=8300).device_view()
cl = build_clusters(room)
print(f"tris={room.n_triangles} clusters={cl.n_clusters}", flush=True)
W, H = 1600, 896
n = W * H
cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)


def probe(tag, o, d):
    h, vis = trace_closest_frontier(cl, o, d, tmin, tmax, return_visits=True)
    jax.block_until_ready(vis)
    t0 = time.time()
    h, vis = trace_closest_frontier(cl, o, d, tmin, tmax, return_visits=True)
    jax.block_until_ready(vis)
    dt = time.time() - t0
    v = np.asarray(vis)
    tot = v.sum()
    print(f"{tag}: {dt:.2f}s visits tot={tot:.0f} mean={v.mean():.1f} "
          f"p50={np.percentile(v,50):.0f} p90={np.percentile(v,90):.0f} "
          f"max={v.max():.0f}  -> {dt/max(tot,1)*1e6:.2f} us/visit",
          flush=True)


half = jnp.full((n,), 0.5, jnp.float32)
o, d, _ = generate_camera_rays(cam, W, H, half, half)
probe("camera", o, d)

r = np.random.default_rng(3)
o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
o_np[:, 1] += 2.0
d_np = r.standard_normal((n, 3)).astype(np.float32)
oi = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
di = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
probe("incoherent", oi, di)
print("DONE", flush=True)
