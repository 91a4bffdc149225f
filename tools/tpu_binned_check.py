"""TPU canary + bench for the binned-wavefront tracer (round 3).

Validates exactness vs the cluster tracer on a 10k soup, then times the
big_room 99.6k-tri workload (1.43M incoherent rays, closest + any) against
the round-2 cluster tracer in the SAME process, and finally one full
1600x896 PT pass with tracer="binned".

Run ALONE (one TPU job at a time; see memory wedge protocol).
"""
import sys, os, time
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
from fermat_tpu.ops.pallas_cluster_trace import (
    trace_any_cluster, trace_closest_cluster,
)
from fermat_tpu.ops.pallas_binned_trace import (
    trace_any_binned, trace_closest_binned,
)
from fermat_tpu.scene.procedural import big_room, random_soup

# --- exactness canary: 10k soup, binned vs cluster (cluster is validated
# against the BVH walk by tools/tpu_cluster_full_check.py) ---------------
mesh = random_soup(10000, seed=7).device_view()
cl = build_clusters(mesh)
r = np.random.default_rng(3)
o_np = (r.random((4096, 3)).astype(np.float32) - 0.5) * 12.0
d_np = r.standard_normal((4096, 3)).astype(np.float32)
o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
h_b = jax.block_until_ready(trace_closest_binned(cl, o, d, tmin, tmax))
print("canary closest ok", flush=True)
h_c = jax.block_until_ready(trace_closest_cluster(cl, o, d, tmin, tmax))
hm = (np.asarray(h_b.hit_mask) == np.asarray(h_c.hit_mask)).mean()
m = np.asarray(h_b.hit_mask) & np.asarray(h_c.hit_mask)
tok = np.allclose(np.asarray(h_b.t)[m], np.asarray(h_c.t)[m], rtol=1e-4, atol=1e-4)
occ_b = jax.block_until_ready(trace_any_binned(cl, o, d, tmin, jnp.float32(6.0)))
occ_c = jax.block_until_ready(trace_any_cluster(cl, o, d, tmin, jnp.float32(6.0)))
om = (np.asarray(occ_b) == np.asarray(occ_c)).mean()
print(f"10k check: mask={hm*100:.2f}% t={tok} occ={om*100:.2f}%", flush=True)
assert hm > 0.999 and tok and om > 0.999

# --- big_room timing: binned vs cluster, same process -------------------
room = big_room(n_boxes=8300)
rmesh = room.device_view()
rcl = build_clusters(rmesh)
print(f"bigroom tris={rmesh.n_triangles} clusters={rcl.n_clusters}", flush=True)
n = 1433600
o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
o_np[:, 1] += 2.0
d_np = r.standard_normal((n, 3)).astype(np.float32)
o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))


def timed(fn, label):
    jax.block_until_ready(fn())
    best = 1e30
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(fn())
        best = min(best, time.time() - t0)
    print(f"{label}: {best:.3f}s = {n/best/1e6:.2f} Mrays/s", flush=True)
    return best


hb = None
def run_binned():
    global hb
    hb = trace_closest_binned(rcl, o, d, tmin, tmax)
    return hb

timed(run_binned, "bigroom binned closest (incoherent)")
hc = None
def run_cluster():
    global hc
    hc = trace_closest_cluster(rcl, o, d, tmin, tmax)
    return hc

timed(run_cluster, "bigroom cluster closest (incoherent)")
mm = (np.asarray(hb.hit_mask) == np.asarray(hc.hit_mask)).mean()
mboth = np.asarray(hb.hit_mask) & np.asarray(hc.hit_mask)
tagree = np.isclose(
    np.asarray(hb.t)[mboth], np.asarray(hc.t)[mboth], rtol=1e-4, atol=1e-4
).mean()
print(f"bigroom closest agreement: mask={mm*100:.3f}% t={tagree*100:.3f}%", flush=True)

timed(lambda: trace_any_binned(rcl, o, d, tmin, jnp.float32(4.0)),
      "bigroom binned any")
timed(lambda: trace_any_cluster(rcl, o, d, tmin, jnp.float32(4.0)),
      "bigroom cluster any")

# --- one full PT pass at 1600x896 with tracer=binned --------------------
from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.core.camera import Camera
from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.scene.view import SceneView

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
print(f"bigroom PT pass 1600x896 binned: {dt:.2f}s  "
      f"{float(out.rays)/dt/1e6:.2f} Mrays/s  mean={float(jnp.mean(img)):.4f}",
      flush=True)
print("DONE", flush=True)
