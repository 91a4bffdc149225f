"""Same-process block-size A/B for the frontier tracer (closest + any,
camera + incoherent + shadow-like short rays). One process, stable
timings (cross-process tunnel variance is ±15%)."""
import sys, os, time
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
    trace_any_frontier, trace_closest_frontier,
)
from fermat_tpu.scene.procedural import big_room

room = big_room(n_boxes=8300).device_view()
cl = build_clusters(room)
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


for blk in (128, 256, 512):
    cc = t(lambda: trace_closest_frontier(cl, oc, dc, tmin, tmax, block=blk).t)
    ci = t(lambda: trace_closest_frontier(cl, oi, di, tmin, tmax, block=blk).t)
    ac = t(lambda: trace_any_frontier(cl, oi, di, tmin, jnp.float32(4.0),
                                      block=blk))
    print(f"blk={blk}: camera-closest {cc:.3f}s  incoh-closest {ci:.3f}s  "
          f"incoh-any {ac:.3f}s", flush=True)
print("DONE", flush=True)
