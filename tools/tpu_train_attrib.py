"""Attribute the differentiable train step's device time (VERDICT r4 #3).

train_mrays (4.11) sits ~42x below the forward headline because the
fast kernels are forward-only: jax.grad runs the XLA pipeline fwd+bwd.
This tool profiles ONE train step (cornell512 mpl6, MSE + material
diffuse gradient — exactly bench.py's loss) and buckets device op time,
separating forward-recognizable ops (trace kernels, gathers) from the
backward's transpose/scatter ops. The output decides where a custom VJP
buys the most.

Usage: python tools/tpu_train_attrib.py [res=512] [mpl=6]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices(), flush=True)

from fermat_tpu.integrators.pt import PTOptions, render_pass
from fermat_tpu.scene.procedural import cornell_box, cornell_camera
from fermat_tpu.scene.view import SceneView
from fermat_tpu.utils.profiling import op_breakdown

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
MPL = int(sys.argv[2]) if len(sys.argv) > 2 else 6

view = SceneView.build(cornell_box(), cornell_camera())
opts = PTOptions(max_path_length=MPL)
target = jnp.zeros((RES * RES, 3), jnp.float32)
diffuse0 = view.mesh.materials.diffuse


def loss_fn(diffuse, inst):
    mats = view.mesh.materials._replace(diffuse=diffuse)
    v = view._replace(mesh=view.mesh._replace(materials=mats))
    out = render_pass(v, opts, RES, RES, inst)
    img = out.composited.stack()
    return jnp.mean((img - target) ** 2), out.rays


grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
fwd_fn = jax.jit(loss_fn)

# warm both
(loss_v, rays_v), _g = grad_fn(diffuse0, jnp.uint32(0))
jax.block_until_ready(loss_v)
l2, r2 = fwd_fn(diffuse0, jnp.uint32(0))
jax.block_until_ready(l2)

for name, fn in (("fwd", lambda i: fwd_fn(diffuse0, jnp.uint32(i))[0]),
                 ("fwd+bwd", lambda i: grad_fn(diffuse0, jnp.uint32(i))[0][0])):
    best = 1e30
    for rep in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(rep + 1))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:8s}: {best * 1e3:8.1f} ms  "
          f"({float(rays_v) / best / 1e6:6.2f} Mrays/s)", flush=True)

with tempfile.TemporaryDirectory() as td:
    with jax.profiler.trace(td):
        jax.block_until_ready(grad_fn(diffuse0, jnp.uint32(7))[0][0])
    rows = op_breakdown(td, top=40)
    total = sum(ms for _n, ms, _c in op_breakdown(td, top=100000))
    print(f"\ntotal device op time: {total:.1f} ms; top 40:", flush=True)
    for name, ms, cnt in rows:
        print(f"  {ms:8.2f} ms  x{cnt:4d}  {name[:110]}", flush=True)
print("DONE", flush=True)
