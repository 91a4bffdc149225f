"""600k-triangle proof for the frontier tracer (round 5, VERDICT #2).

The round-4 tracer was hard-fenced at 4096 padded clusters (~524k tris
at CLUSTER=128) because the per-block E matrix was sized for BLK=512.
With the VMEM-derived gate (max_clusters(128) = 65536) a 600k-triangle
scene must now (a) build, (b) trace EXACTLY vs brute force on a ray
subsample, and (c) post a committed throughput number.

Reference analog: the OptiX TRBVH accel build serves any triangle count
(/root/reference/src/rt.cpp:284-325).

Usage: python tools/tpu_600k_check.py [n_boxes=50000]
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
from fermat_tpu.accel.traverse import trace_closest_brute
from fermat_tpu.core.camera import Camera, generate_camera_rays
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_frontier_trace import (
    trace_any_frontier,
    trace_closest_frontier,
)
from fermat_tpu.scene.procedural import big_room

N_BOXES = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000

t0 = time.time()
room = big_room(n_boxes=N_BOXES).device_view()
n_tris = int(room.n_triangles)
print(f"scene: {n_tris} triangles ({time.time() - t0:.1f}s)", flush=True)
t0 = time.time()
cl = build_clusters(room)
cp = int(cl.lo_x.shape[1])
print(f"clusters: {cl.tri.shape[0]} ({cp} padded; build "
      f"{time.time() - t0:.1f}s)", flush=True)
assert cp > 4096, "scene must be past the old round-4 fence to prove the lift"

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

# -- exactness vs brute on a 4096-ray subsample (camera + incoherent) --
NS = 4096
sub = lambda v: Vec3(v.x[:NS], v.y[:NS], v.z[:NS])
for name, (o_s, d_s) in (("camera", (sub(oc), sub(dc))),
                         ("incoherent", (sub(oi), sub(di)))):
    h_ref = trace_closest_brute(room, o_s, d_s, tmin, tmax)
    h_fr = trace_closest_frontier(cl, o_s, d_s, tmin, tmax)
    m_ref = np.asarray(h_ref.hit_mask)
    m_fr = np.asarray(h_fr.hit_mask)
    assert (m_ref == m_fr).all(), f"{name}: hit-mask mismatch"
    tr, tf = np.asarray(h_ref.t)[m_ref], np.asarray(h_fr.t)[m_ref]
    ok = np.isclose(tr, tf, rtol=1e-5, atol=1e-5)
    assert ok.all(), f"{name}: t mismatch on {np.sum(~ok)} rays"
    print(f"exactness [{name}]: {NS} rays, masks equal, t allclose "
          f"(hit rate {m_ref.mean() * 100:.1f}%)", flush=True)


def t(fn):
    jax.block_until_ready(fn())
    best = 1e30
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(fn())
        best = min(best, time.time() - t0)
    return best


cc = t(lambda: trace_closest_frontier(cl, oc, dc, tmin, tmax).t)
ci = t(lambda: trace_closest_frontier(cl, oi, di, tmin, tmax).t)
ac = t(lambda: trace_any_frontier(cl, oi, di, tmin, jnp.float32(4.0)))
print(f"1.43M-ray closest: camera {cc:.3f}s ({n / cc / 1e6:.2f} Mrays/s)  "
      f"incoherent {ci:.3f}s ({n / ci / 1e6:.2f} Mrays/s)  "
      f"anyhit {ac:.3f}s ({n / ac / 1e6:.2f} Mrays/s)", flush=True)
print("DONE", flush=True)
