"""Three-way mega divergence analysis: TPU-mega / TPU-xla / CPU golden.

Prints, for stage-2 (mpl2 NEE diffuse no-rr) and stage-5 (shipping) configs,
each image's deviation from the CPU golden (median/p99/max relative diff)
so we can tell WHICH hardware path diverges and whether the error is
ULP-chaos or a value bug. Run ALONE (one TPU job at a time).
"""
import sys, os, subprocess, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
gpath = "/tmp/mega_golden.npz"
if not os.path.exists(gpath):
    print("building CPU golden...", flush=True)
    subprocess.run([sys.executable, os.path.join(root, "tools/_mega_golden_cpu.py"),
                    gpath], check=True)

import numpy as np
G = np.load(gpath)

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

print("connecting...", flush=True)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

from fermat_tpu.scene.procedural import cornell_box, cornell_camera
from fermat_tpu.scene.view import SceneView
from fermat_tpu.bsdf.composite import scene_lobes
from fermat_tpu.integrators.pt import PTOptions, render_pass

RES = 64
scene = cornell_box(glossy_boxes=True)
view = SceneView.build(scene, cornell_camera())
lobes = scene_lobes(scene.materials)
base = PTOptions(max_path_length=6, lobes=lobes)
cfgs = {
    "s2": base._replace(max_path_length=2, lobes=(True, False, False, False),
                        rr=False, direct_lighting_bsdf=False,
                        indirect_lighting_bsdf=False, visible_lights=False),
    "s5": base,
}


def rel_stats(a, b):
    d = np.abs(a - b) / np.maximum(np.maximum(np.abs(a), np.abs(b)), 1e-6)
    return (f"med={np.median(d):.2e} p99={np.percentile(d, 99):.2e} "
            f"max={d.max():.2e} mean-ratio={a.mean()/max(b.mean(),1e-12):.5f}")


for k, o in cfgs.items():
    try:
        imgs = {}
        for trc in ("mega", "pallas"):
            r = render_pass(view, o._replace(tracer=trc), RES, RES,
                            jnp.uint32(2))
            imgs[trc] = np.asarray(jax.block_until_ready(r.composited.x))
        gm, gx = G[f"{k}_mega"], G[f"{k}_pallas"]
        print(f"[{k}] cpu-mega  vs cpu-xla : {rel_stats(gm, gx)}", flush=True)
        print(f"[{k}] tpu-xla   vs cpu-xla : {rel_stats(imgs['pallas'], gx)}",
              flush=True)
        print(f"[{k}] tpu-mega  vs cpu-mega: {rel_stats(imgs['mega'], gm)}",
              flush=True)
        print(f"[{k}] tpu-mega  vs tpu-xla : "
              f"{rel_stats(imgs['mega'], imgs['pallas'])}", flush=True)
    except Exception:
        traceback.print_exc()
print("DONE", flush=True)
