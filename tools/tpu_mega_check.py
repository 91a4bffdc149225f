"""Standalone TPU check: PT megakernel parity + cornell512 bench A/B.

Split out of tpu_r3_check.py so a kernel fault in the binned-tracer
stages (which poisons the whole process's TPU client) cannot mask this
stage. Run ALONE (one TPU job at a time).
"""
import sys, os, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("connecting...", flush=True)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

from fermat_tpu.scene.procedural import cornell_box, cornell_camera
from fermat_tpu.scene.view import SceneView
from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.integrators.pt import PTOptions, render_pass

try:
    print("--- mega parity 64x64", flush=True)
    scene = cornell_box(glossy_boxes=True)
    view = SceneView.build(scene, cornell_camera())
    mopts = PTOptions(max_path_length=6, lobes=scene_lobes(scene.materials),
                      tracer="mega")
    xopts = mopts._replace(tracer="pallas")
    out_m = render_pass(view, mopts, 64, 64, jnp.uint32(2))
    img_m = jax.block_until_ready(out_m.composited.x)
    out_x = render_pass(view, xopts, 64, 64, jnp.uint32(2))
    img_x = jax.block_until_ready(out_x.composited.x)
    close = np.isclose(np.asarray(img_m), np.asarray(img_x),
                       rtol=5e-4, atol=1e-5).mean()
    print(f"mega vs xla pixel agreement: {close*100:.3f}% "
          f"rays {float(out_m.rays):.0f} vs {float(out_x.rays):.0f}",
          flush=True)

    print("--- cornell512 bench A/B", flush=True)
    from fermat_tpu.ops.pallas_pt_mega import build_mega_tables, render_pass_mega

    res = 512
    n_passes = 16
    tb = build_mega_tables(view, res, res, mopts.ray_eps)

    @jax.jit
    def batch_mega(instance0):
        def body(i, carry):
            acc, rays = carry
            out = render_pass_mega(view, mopts, res, res, instance0 + i,
                                   tables=tb)
            return (acc + out.composited.x, rays + out.rays)
        return jax.lax.fori_loop(
            0, n_passes, body,
            (jnp.zeros(res * res, jnp.float32), jnp.zeros((), jnp.float32)))

    @jax.jit
    def batch_xla(instance0):
        def body(i, carry):
            acc, rays = carry
            out = render_pass(view, xopts, res, res, instance0 + i)
            return (acc + out.composited.x, rays + out.rays)
        return jax.lax.fori_loop(
            0, n_passes, body,
            (jnp.zeros(res * res, jnp.float32), jnp.zeros((), jnp.float32)))

    for name, fn in (("mega", batch_mega), ("xla", batch_xla)):
        img, rays = jax.block_until_ready(fn(jnp.uint32(0)))
        best = 1e30
        for rep in range(3):
            t0 = time.perf_counter()
            img, rays = jax.block_until_ready(fn(jnp.uint32(7 + rep)))
            best = min(best, time.perf_counter() - t0)
        print(f"cornell512 {name}: {float(rays)/best/1e6:.2f} Mrays/s  "
              f"{best/n_passes*1e3:.1f} ms/pass  mean={float(jnp.mean(img))/n_passes:.4f}",
              flush=True)
except Exception:
    traceback.print_exc()

print("DONE", flush=True)
