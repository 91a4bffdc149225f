"""Same-process A/B: round-3 frontier kernel vs the round-4 kernel.

The round-3 file is materialized from git (`git show <rev>:...`) and
imported under a different module name so BOTH kernels run interleaved in
ONE process (cross-process timings vary +-15%; same-process +-0.3%).
Also prints visit counts per config to separate "visits dropped" from
"overhead ate the savings".
"""
import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R3_REV = os.environ.get("FERMAT_R3_REV", "6816639")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("connecting...", flush=True)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

# materialize + import the round-3 kernel under a private name
src = subprocess.run(
    ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
     "show", f"{R3_REV}:fermat_tpu/ops/pallas_frontier_trace.py"],
    capture_output=True, text=True, check=True).stdout
r3_path = "/tmp/frontier_r3_kernel.py"
with open(r3_path, "w") as f:
    f.write(src)
spec = importlib.util.spec_from_file_location("frontier_r3", r3_path)
r3 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(r3)

from fermat_tpu.core.camera import Camera
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops import pallas_frontier_trace as r4
from fermat_tpu.scene.procedural import big_room
from fermat_tpu.scene.view import SceneView

room = big_room(n_boxes=8300)
cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
view = SceneView.build(room, cam)
cl = view.clusters
n = 1600 * 896
r = np.random.default_rng(3)
o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
o_np[:, 1] += 2.0
d_np = r.standard_normal((n, 3)).astype(np.float32)
oi = Vec3(*(jnp.asarray(o_np[:, k]) for k in range(3)))
di = normalize(Vec3(*(jnp.asarray(d_np[:, k]) for k in range(3))))
tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)


def best3(f):
    jax.block_until_ready(f())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        best = min(best, time.perf_counter() - t0)
    return best


t_r3 = best3(lambda: r3.trace_closest_frontier(cl, oi, di, tmin, tmax,
                                               block=128).t)
print(f"r3 kernel single:      {t_r3:.3f}s ({n/t_r3/1e6:.2f} Mrays/s)",
      flush=True)
t_r4 = best3(lambda: r4.trace_closest_frontier(cl, oi, di, tmin, tmax,
                                               block=128, rounds=(0,)).t)
print(f"r4 kernel single:      {t_r4:.3f}s ({n/t_r4/1e6:.2f} Mrays/s)",
      flush=True)
for caps in ((24, 0), (48, 0), (16, 16, 0)):
    t_mr = best3(lambda: r4.trace_closest_frontier(
        cl, oi, di, tmin, tmax, block=128, rounds=caps).t)
    print(f"r4 kernel {caps}: {t_mr:.3f}s ({n/t_mr/1e6:.2f} Mrays/s)",
          flush=True)

# visit accounting (compiles separate programs; count-only comparison)
for caps in ((0,), (24, 0), (16, 16, 0)):
    _, vis = r4.trace_closest_frontier(cl, oi, di, tmin, tmax, block=128,
                                       rounds=caps, return_visits=True)
    vis = np.asarray(jax.block_until_ready(vis))
    nb = vis.shape[0] // len(caps)
    per = [float(vis[i * nb:(i + 1) * nb].mean()) for i in range(len(caps))]
    print(f"visits {caps}: per-round means "
          f"{[f'{p:.1f}' for p in per]} total {vis.sum():.0f}", flush=True)
print("DONE", flush=True)
