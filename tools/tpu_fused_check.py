"""Hardware validation + A/B for the fused shade kernel (round 4).

Per scene: image parity (fused vs XLA shade, same instance) and
same-process pass timings. Run ALONE on TPU.

Usage: python tools/tpu_fused_check.py [bigroom|bathroom|cornell|all]
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

from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.scene.view import SceneView

which = sys.argv[1] if len(sys.argv) > 1 else "all"


def build(scene):
    if scene == "bathroom":
        from fermat_tpu.scene.procedural import bathroom_standin

        mesh, cam, tdir = bathroom_standin(n_boxes=8300)
        return SceneView.build(mesh, cam, texture_dir=tdir), mesh, 1600, 896
    if scene == "bigroom":
        from fermat_tpu.core.camera import Camera
        from fermat_tpu.scene.procedural import big_room

        mesh = big_room(n_boxes=8300)
        cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
        return SceneView.build(mesh, cam), mesh, 1600, 896
    from fermat_tpu.scene.procedural import cornell_box, cornell_camera

    mesh = cornell_box(glossy_boxes=True)
    return SceneView.build(mesh, cornell_camera()), mesh, 512, 512


def check(scene):
    view, mesh, W, H = build(scene)
    opts = PTOptions(max_path_length=6, lobes=scene_lobes(mesh.materials))

    # JIT the whole pass: an eager render_pass dispatches thousands of
    # ops one-by-one through the axon tunnel (cornell512: 21.8 s eager vs
    # ~0.14 s jitted — round-4 discovery; the round-3 secondary bench
    # numbers carried the same eager tax)
    fns = {f: jax.jit(lambda inst, f=f: render_pass(
        view, opts._replace(fused_shade=f), W, H, inst))
        for f in ("off", "auto")}

    def run(fused, inst):
        o = fns[fused](jnp.uint32(inst))
        jax.block_until_ready(o.composited.x)
        return o

    for fused in ("off", "auto"):
        o = run(fused, 0)  # compile+warm
        t0 = time.perf_counter()
        o = run(fused, 1)
        dt = time.perf_counter() - t0
        print(f"{scene} fused={fused}: {dt:.2f}s "
              f"({float(o.rays)/dt/1e6:.2f} Mrays/s, {1.0/dt:.4f} spp/s)",
              flush=True)
        if fused == "off":
            ref = np.asarray(o.composited.stack())
            ref_rays = float(o.rays)
        else:
            img = np.asarray(o.composited.stack())
            same_rays = float(o.rays) == ref_rays
            rel = np.abs(img - ref).max() / max(ref.max(), 1e-9)
            print(f"{scene} parity: rays_equal={same_rays} "
                  f"maxrel={rel:.2e}", flush=True)


for s in (("cornell", "bigroom", "bathroom") if which == "all"
          else (which,)):
    try:
        check(s)
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        print(f"{s}: FAILED {e}", flush=True)
print("DONE", flush=True)
