"""Per-stage wall timing of the narrowing-wavefront pass (round 5).

Replays NarrowPass._dynamic with a block_until_ready after every
segment so each bounce's wall time is attributable (the production
driver overlaps dispatches, so this instrumented pass reads ~5-10%
slower than the real one — compare STAGE SHARES, not the total).

Usage: python tools/tpu_narrow_attrib.py [bathroom|bigroom]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

SCENE = sys.argv[1] if len(sys.argv) > 1 else "bathroom"
print("backend:", jax.default_backend(), jax.devices(), "scene:", SCENE,
      "blk:", os.environ.get("FERMAT_FRONTIER_BLK", "(default)"),
      "k:", os.environ.get("FERMAT_FRONTIER_K", "(default)"), flush=True)

from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.integrators.pt import NarrowPass, PTOptions
from fermat_tpu.scene.view import SceneView

if SCENE == "bigroom":
    from fermat_tpu.core.camera import Camera
    from fermat_tpu.scene.procedural import big_room

    mesh = big_room(n_boxes=8300)
    cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
    view = SceneView.build(mesh, cam)
else:
    from fermat_tpu.scene.procedural import bathroom_standin

    mesh, cam, tdir = bathroom_standin(n_boxes=8300)
    view = SceneView.build(mesh, cam, texture_dir=tdir)

W, H = 1600, 896
opts = PTOptions(max_path_length=6, lobes=scene_lobes(mesh.materials),
                 tracer="frontier")
drv = NarrowPass(view, opts, W, H)

# warm-up: compile all segments
for inst in (0, 1):
    out = drv(inst)
    jax.block_until_ready(out.composited.x)

# timed pass, production driver (overlapped)
t0 = time.perf_counter()
out = drv(2)
jax.block_until_ready(out.composited.x)
total = time.perf_counter() - t0
print(f"production pass: {total:.2f}s ({1.0/total:.4f} spp/s, "
      f"{float(out.rays)/total/1e6:.2f} Mrays/s)", flush=True)

# instrumented replay
inst = jnp.uint32(3)
t0 = time.perf_counter()
carry = jax.block_until_ready(drv._seg0(inst))
t_seg0 = time.perf_counter() - t0
g = drv._grab_g(carry)
acc = drv._zero_acc()
w = drv.n
identity = True
print(f"bounce 0 (full {drv.n}): {t_seg0:.2f}s", flush=True)
for b in range(1, opts.max_path_length):
    live = int(jax.device_get(jnp.sum(carry.alive, dtype=jnp.int32)))
    if live == 0:
        break
    wp = drv._bucket(live)
    t0 = time.perf_counter()
    if wp < w:
        carry, acc = jax.block_until_ready(
            drv._get_shrink(w, wp, identity)(carry, acc))
        w = wp
        identity = False
    t_shrink = time.perf_counter() - t0
    t0 = time.perf_counter()
    carry = jax.block_until_ready(
        drv._get_seg(w)(carry, jnp.asarray(b, jnp.uint32), inst))
    t_seg = time.perf_counter() - t0
    print(f"bounce {b} (w={w}, live={live} {100.0*live/w:.0f}%): "
          f"seg {t_seg:.2f}s  shrink {t_shrink:.2f}s", flush=True)
t0 = time.perf_counter()
acc = jax.block_until_ready(drv._get_finish(w, identity)(carry, acc))
print(f"finish: {time.perf_counter()-t0:.2f}s", flush=True)

if "--profile" in sys.argv:
    # device-op decomposition of the FULL-WIDTH bounce-1 segment
    import tempfile

    from fermat_tpu.utils.profiling import op_breakdown

    carry1 = jax.block_until_ready(drv._seg0(jnp.uint32(4)))
    seg = drv._get_seg(drv.n)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            jax.block_until_ready(
                seg(carry1, jnp.uint32(1), jnp.uint32(4)))
        rows = op_breakdown(td, top=25)
        total = sum(ms for _n, ms, _c in op_breakdown(td, top=100000))
        print(f"\nbounce-1 segment device total {total:.0f} ms; top 25:",
              flush=True)
        for name, ms, cnt in rows:
            print(f"  {ms:8.1f} ms  x{cnt:4d}  {name[:100]}", flush=True)
print("DONE", flush=True)
