"""Full TPU validation + bench of the clustered tracer: 10k-soup exactness
vs the BVH walk, big_room (99.6k tris) sorted/unsorted timings, one full
1600x896 PT pass, and the 512^2 CornellBox batch (same process)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.accel.bvh import build_bvh_for_mesh
from fermat_tpu.accel.traverse import trace_closest, trace_any
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_cluster_trace import trace_any_cluster, trace_closest_cluster
from fermat_tpu.scene.procedural import big_room, random_soup

print("backend:", jax.default_backend(), flush=True)
mesh = random_soup(10000, seed=7).device_view()
cl = build_clusters(mesh)
r = np.random.default_rng(3)
o_np = (r.random((4096, 3)).astype(np.float32) - 0.5) * 12.0
d_np = r.standard_normal((4096, 3)).astype(np.float32)
o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
h_cl = jax.block_until_ready(trace_closest_cluster(cl, o, d, tmin, tmax))
print("canary closest ok", flush=True)
occ_cl = jax.block_until_ready(trace_any_cluster(cl, o, d, tmin, jnp.float32(6.0)))
bvh = build_bvh_for_mesh(mesh, leaf_size=4)
h_ref = jax.block_until_ready(trace_closest(bvh, mesh, o, d, tmin, tmax))
occ_ref = jax.block_until_ready(trace_any(bvh, mesh, o, d, tmin, jnp.float32(6.0)))
hm = (np.asarray(h_cl.hit_mask) == np.asarray(h_ref.hit_mask)).mean()
m = np.asarray(h_ref.hit_mask) & np.asarray(h_cl.hit_mask)
tok = np.allclose(np.asarray(h_cl.t)[m], np.asarray(h_ref.t)[m], rtol=1e-4, atol=1e-4)
om = (np.asarray(occ_cl) == np.asarray(occ_ref)).mean()
print(f"10k check: mask={hm*100:.2f}% t={tok} occ={om*100:.2f}%", flush=True)
assert hm > 0.999 and tok and om > 0.999

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
    t0 = time.time()
    out = jax.block_until_ready(fn())
    dt = time.time() - t0
    print(f"{label}: {dt:.3f}s = {n/dt/1e6:.2f} Mrays/s", flush=True)
    return out

h_s = timed(lambda: trace_closest_cluster(rcl, o, d, tmin, tmax, sort=True), "incoh closest sorted")
h_u = timed(lambda: trace_closest_cluster(rcl, o, d, tmin, tmax, sort=False), "incoh closest unsorted")
tsame = np.isclose(np.asarray(h_s.t), np.asarray(h_u.t), rtol=1e-4, atol=1e-4).mean()
trisame = (np.asarray(h_s.tri) == np.asarray(h_u.tri)).mean()
print(f"  t agreement {tsame*100:.3f}%  tri agreement {trisame*100:.3f}% (tri diff = coplanar ties)", flush=True)
timed(lambda: trace_any_cluster(rcl, o, d, tmin, jnp.float32(6.0), sort=True), "incoh any sorted")

eye = np.array([0.0, 3.0, 10.0], np.float32)
px = (r.random(n).astype(np.float32) - 0.5) * 1.6
py = (r.random(n).astype(np.float32) - 0.5) * 0.9
d2 = np.stack([px, py, -np.ones(n, np.float32)], 1)
o2 = Vec3(*(jnp.full(n, eye[i]) for i in range(3)))
d2v = normalize(Vec3(*(jnp.asarray(d2[:, i]) for i in range(3))))
timed(lambda: trace_closest_cluster(rcl, o2, d2v, tmin, tmax, sort=True), "coher closest sorted")

from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.core.camera import Camera
from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.scene.view import SceneView
cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
rv = SceneView.build(room, cam)
opts = PTOptions(max_path_length=6, lobes=scene_lobes(room.materials), tracer="cluster")
out = render_pass(rv, opts, 1600, 896, jnp.uint32(0))
jax.block_until_ready(out.composited.x)
t0 = time.time()
out = render_pass(rv, opts, 1600, 896, jnp.uint32(1))
img = jax.block_until_ready(out.composited.x)
dt = time.time() - t0
print(f"render_pass steady: {dt:.1f}s  {float(out.rays)/dt/1e6:.2f} Mrays/s  mean={float(jnp.mean(img)):.4f}", flush=True)

from fermat_tpu.scene.procedural import cornell_box, cornell_camera
scene = cornell_box(glossy_boxes=True)
view = SceneView.build(scene, cornell_camera())
copts = PTOptions(max_path_length=6, lobes=scene_lobes(scene.materials))
@jax.jit
def batch(view, instance0):
    def body(i, carry):
        acc, rays = carry
        o = render_pass(view, copts, 512, 512, instance0 + i)
        return (acc + o.composited.x, rays + o.rays)
    return jax.lax.fori_loop(0, 16, body, (jnp.zeros(512*512, jnp.float32), jnp.zeros((), jnp.float32)))
img2, rays2 = jax.block_until_ready(batch(view, jnp.uint32(0)))
total = float(rays2)
best = 1e9
for rep in range(3):
    t0 = time.perf_counter()
    img2, rays2 = jax.block_until_ready(batch(view, jnp.uint32(7+rep)))
    best = min(best, time.perf_counter() - t0)
print(f"cornell512 fused-fetch: {total/best/1e6:.2f} Mrays/s  {best/16*1e3:.1f} ms/pass", flush=True)
print("ALL OK", flush=True)
