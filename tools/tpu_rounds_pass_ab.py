"""A/B FERMAT_FRONTIER_ROUNDS on REAL full passes (bigroom + bathroom).

The synthetic incoherent benchmark showed re-binning doesn't cut visits
(miss-heavy, per-ray sets dominate); real bounce rays are surface-born
and post-RR sparse, so the verdict may differ. Same-process, jitted.
Usage: python tools/tpu_rounds_pass_ab.py [rounds_spec ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

specs = sys.argv[1:] or ["0", "16,0", "24,0"]

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("connecting...", flush=True)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.core.camera import Camera
from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.ops import pallas_frontier_trace as ft
from fermat_tpu.scene.procedural import bathroom_standin, big_room
from fermat_tpu.scene.view import SceneView

W, H = 1600, 896

for scene in ("bigroom", "bathroom"):
    if scene == "bigroom":
        mesh = big_room(n_boxes=8300)
        cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
        view = SceneView.build(mesh, cam)
    else:
        mesh, cam, tdir = bathroom_standin(n_boxes=8300)
        view = SceneView.build(mesh, cam, texture_dir=tdir)
    opts = PTOptions(max_path_length=6, lobes=scene_lobes(mesh.materials))
    ref = None
    for spec in specs:
        os.environ["FERMAT_FRONTIER_ROUNDS"] = spec
        # rounds are read at trace time via _parse_rounds -> env; a fresh
        # lambda per spec forces a fresh trace (jit caches by identity)
        fn = jax.jit(lambda inst: render_pass(view, opts, W, H, inst))
        out = fn(jnp.uint32(1))
        jax.block_until_ready(out.composited.x)
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            out = fn(jnp.uint32(1))
            jax.block_until_ready(out.composited.x)
            best = min(best, time.perf_counter() - t0)
        img = np.asarray(out.composited.stack())
        if ref is None:
            ref, ok = img, "ref"
        else:
            ok = ("EXACT" if np.allclose(img, ref, rtol=1e-4, atol=1e-5)
                  else "MISMATCH")
        print(f"{scene} rounds={spec}: {best:.2f}s "
              f"({1.0/best:.4f} spp/s) [{ok}]", flush=True)
os.environ.pop("FERMAT_FRONTIER_ROUNDS", None)
print("DONE", flush=True)
