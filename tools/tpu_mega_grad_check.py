"""Hardware check + timing for the mega replay-gradient train step.

Compares the replay gradient against jax.grad of the XLA pipeline on
cornell512 (bench.py's exact train config) and times both.

Usage: python tools/tpu_mega_grad_check.py [res=512] [mpl=6]
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

print("backend:", jax.default_backend(), flush=True)

from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.ops.pallas_pt_mega import (
    build_mega_tables,
    mega_grad_eligible,
    render_grad_diffuse_mega,
    render_pass_mega,
)
from fermat_tpu.scene.procedural import cornell_box, cornell_camera
from fermat_tpu.scene.view import SceneView

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
MPL = int(sys.argv[2]) if len(sys.argv) > 2 else 6

view = SceneView.build(cornell_box(), cornell_camera())
opts = PTOptions(max_path_length=MPL)
assert mega_grad_eligible(view, opts)
target = jnp.zeros((RES * RES, 3), jnp.float32)
diffuse0 = view.mesh.materials.diffuse
tb = build_mega_tables(view, RES, RES, opts.ray_eps)


def ad_loss(diffuse, inst):
    mats = view.mesh.materials._replace(diffuse=diffuse)
    v = view._replace(mesh=view.mesh._replace(materials=mats))
    out = render_pass(v, opts, RES, RES, inst)
    img = out.composited.stack()
    return jnp.mean((img - target) ** 2), out.rays


ad_fn = jax.jit(jax.value_and_grad(ad_loss, has_aux=True))


@jax.jit
def replay_fn(inst):
    out = render_pass_mega(view, opts, RES, RES, inst, tables=tb)
    img = out.composited.stack()
    loss = jnp.mean((img - target) ** 2)
    adjoint = 2.0 * (img - target) / (img.shape[0] * 3)
    grad = render_grad_diffuse_mega(view, opts, RES, RES, inst, adjoint,
                                    tables=tb)
    return loss, out.rays, grad


(l_ad, rays_ad), g_ad = ad_fn(diffuse0, jnp.uint32(0))
l_rp, rays_rp, g_rp = replay_fn(jnp.uint32(0))
jax.block_until_ready((l_ad, l_rp))
g_ad_m = np.stack([np.asarray(g_ad.x), np.asarray(g_ad.y),
                   np.asarray(g_ad.z)], axis=1)
g_rp_m = np.asarray(g_rp)
print(f"loss ad {float(l_ad):.6f} replay {float(l_rp):.6f}")
rel = np.abs(g_rp_m - g_ad_m) / np.maximum(np.abs(g_ad_m).max(), 1e-12)
print(f"grad max-rel-diff {rel.max():.2e}")
print("grad ad:\n", g_ad_m)
print("grad replay:\n", g_rp_m)


def bench(name, fn, *a):
    best = 1e30
    for rep in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


t_ad = bench("ad", lambda i: ad_fn(diffuse0, i)[0][0], jnp.uint32(1))
t_rp = bench("rp", lambda i: replay_fn(i)[0], jnp.uint32(1))
rays = float(rays_rp)
print(f"AD fwd+bwd   : {t_ad*1e3:7.1f} ms  ({rays/t_ad/1e6:6.2f} Mrays/s)")
print(f"replay train : {t_rp*1e3:7.1f} ms  ({rays/t_rp/1e6:6.2f} Mrays/s)")
print("DONE", flush=True)
