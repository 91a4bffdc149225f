"""A/B: morton vs SAH-leaf clustering through the frontier tracer.

Same-process, jitted full passes + standalone incoherent closest on
big_room and the bathroom2 stand-in. Run ALONE on TPU.
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

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.core.camera import Camera
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.ops.pallas_frontier_trace import trace_closest_frontier
from fermat_tpu.scene.procedural import bathroom_standin, big_room
from fermat_tpu.scene.view import SceneView

W, H = 1600, 896
n = W * H
tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)

r = np.random.default_rng(3)
o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
o_np[:, 1] += 2.0
d_np = r.standard_normal((n, 3)).astype(np.float32)
oi = Vec3(*(jnp.asarray(o_np[:, k]) for k in range(3)))
di = normalize(Vec3(*(jnp.asarray(d_np[:, k]) for k in range(3))))


def best2(f):
    jax.block_until_ready(f())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        best = min(best, time.perf_counter() - t0)
    return best


for scene in ("bigroom", "bathroom"):
    if scene == "bigroom":
        mesh = big_room(n_boxes=8300)
        cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
        build_view = lambda: SceneView.build(mesh, cam)
    else:
        mesh, cam, tdir = bathroom_standin(n_boxes=8300)
        build_view = lambda: SceneView.build(mesh, cam, texture_dir=tdir)
    opts = PTOptions(max_path_length=6, lobes=scene_lobes(mesh.materials))
    ref = None
    for method in ("morton", "sah"):
        os.environ["FERMAT_CLUSTER_METHOD"] = method
        view = build_view()
        cp = int(view.clusters.lo_x.shape[1])
        t_inc = best2(lambda: trace_closest_frontier(
            view.clusters, oi, di, tmin, tmax, block=128).t)
        fn = jax.jit(lambda inst: render_pass(view, opts, W, H, inst))
        t_pass = best2(lambda: fn(jnp.uint32(1)).composited.x)
        out = fn(jnp.uint32(1))
        img = np.asarray(jax.block_until_ready(out.composited.stack()))
        if ref is None:
            ref = img
            ok = "ref"
        else:
            ok = ("EXACT" if np.allclose(img, ref, rtol=1e-4, atol=1e-5)
                  else f"maxrel={np.abs(img-ref).max()/max(ref.max(),1e-9):.1e}")
        print(f"{scene} {method}: Cp={cp} incoherent {t_inc:.2f}s "
              f"({n/t_inc/1e6:.2f} Mrays/s) pass {t_pass:.2f}s "
              f"({1.0/t_pass:.4f} spp/s) [{ok}]", flush=True)
os.environ.pop("FERMAT_CLUSTER_METHOD", None)
print("DONE", flush=True)
