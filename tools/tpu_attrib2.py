"""Jitted-pass attribution for the bathroom2 stand-in (round 4).

The eager attribution tool (tpu_pass_attrib.py) conflated per-op dispatch
tax with real device cost; every stage here jits the WHOLE pass. Stages
isolate: textures (same geometry, atlas absent), the fused shade kernel,
shadow anyhit, path depth. Run ALONE on TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

print("connecting...", flush=True)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.scene.procedural import bathroom_standin
from fermat_tpu.scene.view import SceneView

mesh, cam, tdir = bathroom_standin(n_boxes=8300)
view_tex = SceneView.build(mesh, cam, texture_dir=tdir)
view_notex = SceneView.build(mesh, cam)
lobes = scene_lobes(mesh.materials)
W, H = 1600, 896


def timed(tag, view, opts):
    try:
        fn = jax.jit(lambda inst: render_pass(view, opts, W, H, inst))
        out = fn(jnp.uint32(0))
        jax.block_until_ready(out.composited.x)
        t0 = time.perf_counter()
        out = fn(jnp.uint32(1))
        jax.block_until_ready(out.composited.x)
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.2f}s rays={float(out.rays)/1e6:.1f}M "
              f"({float(out.rays)/dt/1e6:.2f} Mrays/s)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {e}", flush=True)
        return None


base = PTOptions(max_path_length=6, lobes=lobes, fused_shade="off")
timed("tex full xla     ", view_tex, base)
timed("tex full fused   ", view_tex, base._replace(fused_shade="auto"))
timed("notex full xla   ", view_notex, base)
timed("notex full fused ", view_notex, base._replace(fused_shade="auto"))
timed("tex no-shadow    ", view_tex, base._replace(debug_nee_no_shadow=True))
timed("tex no-nee       ", view_tex, base._replace(
    direct_lighting_nee=False, indirect_lighting_nee=False))
timed("tex mpl=2        ", view_tex, base._replace(max_path_length=2))
timed("tex mpl=1        ", view_tex, base._replace(max_path_length=1))
print("DONE", flush=True)
