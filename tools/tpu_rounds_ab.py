"""A/B the multi-round re-binned frontier tracer on hardware (big_room).

Same-process timings. Configs: cap schedules x block sizes, incoherent
closest 1.43M rays (the round-3 bottleneck: 82.5 visits/block at blk=128,
1.29 s), then camera-coherent, then a full 1600x896 PT pass with the best
schedule via FERMAT_FRONTIER_ROUNDS.

Run ALONE on TPU (no concurrent CPU-heavy jobs — host-thread starvation
pollutes timings; learned round 4).
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

print("connecting...", flush=True)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

from fermat_tpu.core.camera import Camera, generate_camera_rays
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_frontier_trace import trace_closest_frontier
from fermat_tpu.scene.procedural import big_room
from fermat_tpu.scene.view import SceneView

room = big_room(n_boxes=8300)
cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
view = SceneView.build(room, cam)
cl = view.clusters
W, H = 1600, 896
n = W * H
tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)

half = jnp.full((n,), 0.5, jnp.float32)
oc, dc, _ = generate_camera_rays(cam, W, H, half, half)

r = np.random.default_rng(3)
o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
o_np[:, 1] += 2.0
d_np = r.standard_normal((n, 3)).astype(np.float32)
oi = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
di = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))


def timed(f):
    x = jax.block_until_ready(f())
    t0 = time.perf_counter()
    x = jax.block_until_ready(f())
    return time.perf_counter() - t0, x


ref_i = None
ref_c = None
for blk in (128, 64):
    for caps in ((0,), (24, 0), (16, 0), (32, 0), (16, 16, 0)):
        try:
            dt_i, h_i = timed(lambda: trace_closest_frontier(
                cl, oi, di, tmin, tmax, block=blk, rounds=caps).t)
            dt_c, h_c = timed(lambda: trace_closest_frontier(
                cl, oc, dc, tmin, tmax, block=blk, rounds=caps).t)
            if ref_i is None:
                ref_i, ref_c = np.asarray(h_i), np.asarray(h_c)
                ok = "ref"
            else:
                ok = ("EXACT"
                      if np.allclose(np.asarray(h_i), ref_i, rtol=1e-5,
                                     atol=1e-5)
                      and np.allclose(np.asarray(h_c), ref_c, rtol=1e-5,
                                      atol=1e-5)
                      else "MISMATCH!")
            print(f"blk={blk} caps={caps}: incoherent {dt_i:.2f}s "
                  f"({n/dt_i/1e6:.2f} Mrays/s) camera {dt_c:.2f}s "
                  f"({n/dt_c/1e6:.2f} Mrays/s) [{ok}]", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"blk={blk} caps={caps}: FAILED {type(e).__name__} {e}",
                  flush=True)

# visit accounting for the best-looking configs
from fermat_tpu.ops.pallas_frontier_trace import trace_closest_frontier as tf

for caps in ((0,), (24, 0), (16, 16, 0)):
    _, vis = tf(cl, oi, di, tmin, tmax, block=128, rounds=caps,
                return_visits=True)
    vis = np.asarray(jax.block_until_ready(vis))
    nb = vis.shape[0] // len(caps)
    per = [vis[i * nb:(i + 1) * nb] for i in range(len(caps))]
    print(f"caps={caps}: visits/rnd "
          f"{[f'{p.mean():.1f}' for p in per]} total={vis.sum():.0f}",
          flush=True)

print("DONE", flush=True)
