"""Micro-bench the non-trace stages of one full-width PT bounce segment.

The bounce-1 device profile shows closest 0.31 s + shadow-any 0.19 s +
~0.5 s of elementwise fusions per 1.43M-lane segment on the bathroom2
stand-in. This times each candidate stage at the same width with the
real scene data, so the 0.5 s gets names.

Usage: python tools/tpu_seg_stage_bench.py
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

from fermat_tpu.bsdf.composite import BsdfParams, f as bsdf_f, pdf as bsdf_pdf, sample, scene_lobes
from fermat_tpu.core.rng import TiledSequence
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.integrators.pt import PTOptions, _light_compact_tables, \
    _sample_lights_compact
from fermat_tpu.scene.procedural import bathroom_standin
from fermat_tpu.scene.view import SceneView

mesh, cam, tdir = bathroom_standin(n_boxes=8300)
view = SceneView.build(mesh, cam, texture_dir=tdir)
opts = PTOptions(max_path_length=6, lobes=scene_lobes(mesh.materials),
                 tracer="frontier")
N = 1_433_600
r = np.random.default_rng(0)
pix = jnp.asarray(r.integers(0, N, N, dtype=np.int64).astype(np.uint32))
tri = jnp.asarray(r.integers(0, int(mesh.n_triangles), N, dtype=np.int64)
                  .astype(np.int32))
u = jnp.asarray(r.random(N, np.float32) * 0.5)
v = jnp.asarray(r.random(N, np.float32) * 0.5)
uvx = jnp.asarray(r.random(N, np.float32))
uvy = jnp.asarray(r.random(N, np.float32))
w3 = lambda: Vec3(*(jnp.asarray(r.standard_normal(N).astype(np.float32))
                    for _ in range(3)))
wi = normalize(w3())
wo = normalize(w3())
u0 = jnp.asarray(r.random(N, np.float32))
u1 = jnp.asarray(r.random(N, np.float32))
u2 = jnp.asarray(r.random(N, np.float32))

dview = view  # device view already
seq = TiledSequence.create(jnp.uint32(7)).set_instance(jnp.uint32(3))
shade_tab = view.mesh.shade_rows()
compact = _light_compact_tables(view)


def t(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(*args))
        best = min(best, time.time() - t0)
    print(f"{name:28s}: {best * 1e3:7.1f} ms", flush=True)
    return best


t("rng sample_3d x1", lambda p: seq.sample_3d(p, jnp.uint32(2)), pix)
t("rng 8 dims (3d+3d+2d)",
  lambda p: (seq.sample_3d(p, jnp.uint32(2)),
             seq.sample_3d(p, jnp.uint32(5)),
             seq.sample_2d(p, jnp.uint32(8))), pix)
t("shade_fetch (52-col)",
  lambda tr, uu, vv: view.mesh.shade_fetch(tr, uu, vv, table=shade_tab),
  tri, u, v)
if view.has_textures:
    t("tex bilinear0 x2",
      lambda tx, uu, vv: (view.textures.sample_bilinear0(tx, uu, vv),
                          view.textures.sample_bilinear0(tx, uu, vv)),
      jnp.zeros(N, jnp.int32), uvx, uvy)
t("light compact pick",
  lambda a, b, cc: _sample_lights_compact(compact, a, b, cc), u0, u1, u2)

pp = BsdfParams.from_materials(view.mesh.materials.gather(
    jnp.zeros(N, jnp.int32)))


def eval_and_sample(w_i, w_o, a, b, cc):
    fv = bsdf_f(pp, w_i, w_o, opts.lobes)
    pv = bsdf_pdf(pp, w_i, w_o, opts.lobes)
    s = sample(pp, w_i, a, b, cc, opts.lobes)
    return fv, pv, s


t("bsdf eval + sample", eval_and_sample, wi, wo, u0, u1, u2)

# the carry fold: 3 channels x 3 comps of where-adds, plus misc
def fold(x, m):
    outs = []
    for k in range(9):
        outs.append(jnp.where(m, x * (k + 1.0), 0.0))
    return outs


t("9x where-add fold", fold, u0, tri > 0)
print("DONE", flush=True)
