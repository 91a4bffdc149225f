"""Attribute the big_room frontier PT pass cost (same-process timings).

Configs (each timed after its own warm-up):
  A. full pass, mpl=6                      (baseline)
  B. full pass, mpl=6, no shadow anyhit    (A - B = anyhit cost; biased img)
  C. full pass, mpl=2                      (primary + 1 bounce)
  D. full pass, mpl=1                      (primary only + NEE)
  E. standalone camera-coherent closest    (1.43M primary rays)
  F. standalone incoherent closest         (bounce-like)
Run ALONE on TPU. FERMAT_FRONTIER_BLK env A/Bs the block size.
"""
import sys, os, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCENE = sys.argv[1] if len(sys.argv) > 1 else "bigroom"

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("connecting...", flush=True)
print("backend:", jax.default_backend(), jax.devices(), "scene=", SCENE,
      "blk=", os.environ.get("FERMAT_FRONTIER_BLK", "128"), flush=True)

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.core.camera import Camera, generate_camera_rays
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.ops.pallas_frontier_trace import trace_closest_frontier
from fermat_tpu.scene.procedural import big_room
from fermat_tpu.scene.view import SceneView

if SCENE == "bathroom":
    from fermat_tpu.scene.procedural import bathroom_standin

    room, cam, tdir = bathroom_standin(n_boxes=8300)
    view = SceneView.build(room, cam, texture_dir=tdir)
else:
    room = big_room(n_boxes=8300)
    cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
    view = SceneView.build(room, cam)
lobes = scene_lobes(room.materials)
base = PTOptions(max_path_length=6, lobes=lobes, tracer="frontier")
W, H = 1600, 896


def timed_pass(tag, opts):
    try:
        out = render_pass(view, opts, W, H, jnp.uint32(0))
        jax.block_until_ready(out.composited.x)
        t0 = time.time()
        out = render_pass(view, opts, W, H, jnp.uint32(1))
        jax.block_until_ready(out.composited.x)
        dt = time.time() - t0
        print(f"{tag}: {dt:.2f}s rays={float(out.rays)/1e6:.1f}M "
              f"({float(out.rays)/dt/1e6:.2f} Mrays/s)", flush=True)
        return dt
    except Exception:
        traceback.print_exc()
        return None


tA = timed_pass("A full mpl=6", base)
timed_pass("A2 no-NEE mpl=6", base._replace(direct_lighting_nee=False,
                                            indirect_lighting_nee=False))
timed_pass("A3 fixed-light mpl=6", base._replace(debug_nee_fixed_light=True))
timed_pass("A4 cheap-eval mpl=6", base._replace(debug_nee_cheap_eval=True))
tB = timed_pass("B no-shadow mpl=6", base._replace(debug_nee_no_shadow=True))
tC = timed_pass("C full mpl=2", base._replace(max_path_length=2))
tD = timed_pass("D full mpl=1", base._replace(max_path_length=1))

try:
    cl = view.clusters
    n = W * H
    half = jnp.full((n,), 0.5, jnp.float32)
    o, d, _pix = generate_camera_rays(cam, W, H, half, half)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h = jax.block_until_ready(trace_closest_frontier(cl, o, d, tmin, tmax))
    t0 = time.time()
    h = jax.block_until_ready(trace_closest_frontier(cl, o, d, tmin, tmax))
    print(f"E camera closest: {time.time()-t0:.2f}s", flush=True)

    r = np.random.default_rng(3)
    o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
    o_np[:, 1] += 2.0
    d_np = r.standard_normal((n, 3)).astype(np.float32)
    oi = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    di = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
    h = jax.block_until_ready(trace_closest_frontier(cl, oi, di, tmin, tmax))
    t0 = time.time()
    h = jax.block_until_ready(trace_closest_frontier(cl, oi, di, tmin, tmax))
    print(f"F incoherent closest: {time.time()-t0:.2f}s", flush=True)
except Exception:
    traceback.print_exc()

if tA and tB:
    print(f"anyhit total ~ {tA-tB:.2f}s; closest+shade ~ {tB:.2f}s",
          flush=True)
print("DONE", flush=True)
