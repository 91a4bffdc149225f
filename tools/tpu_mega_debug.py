"""Bisect the mega-kernel hardware numeric divergence (mega vs XLA).

Interpret-mode parity passes on CPU; on the real chip the mega image is
~6% systematically dim with ~3% fewer rays. Stages isolate the path:
  1. gbuf: primary-hit depth/normal/material — trace + fetch only,
     no sampling (should agree to ~1e-6)
  2. mpl=1, visible_lights only — camera + trace + emissive readout
  3. mpl=2, NEE only, diffuse lobes, no RR — light sample + shadow ray
  4. mpl=2, full lobes, no RR — GGX sampling/eval numerics
  5. mpl=6, RR on (shipping config)
Each prints mega/xla mean ratio, pixel agreement, ray counts.
Run ALONE (one TPU job at a time).
"""
import sys, os, traceback
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

RES = 64
scene = cornell_box(glossy_boxes=True)
view = SceneView.build(scene, cornell_camera())
lobes = scene_lobes(scene.materials)
diffuse_only = (True, False, False, False)


def ab(tag, opts, cmp_gbuf=False):
    try:
        m = render_pass(view, opts._replace(tracer="mega"), RES, RES,
                        jnp.uint32(2))
        x = render_pass(view, opts._replace(tracer="pallas"), RES, RES,
                        jnp.uint32(2))
        jax.block_until_ready((m.composited.x, x.composited.x))
        im = np.asarray(m.composited.x)
        ix = np.asarray(x.composited.x)
        agree = np.isclose(im, ix, rtol=5e-4, atol=1e-5).mean()
        mm, mx = im.mean(), ix.mean()
        print(f"{tag}: ratio={mm/max(mx,1e-12):.5f} agree={agree*100:.2f}% "
              f"rays {float(m.rays):.0f}/{float(x.rays):.0f}", flush=True)
        if cmp_gbuf:
            for k in ("depth", "material"):
                gm = np.asarray(getattr(m, k), dtype=np.float64)
                gx = np.asarray(getattr(x, k), dtype=np.float64)
                fin = np.isfinite(gm) & np.isfinite(gx)
                same_fin = (np.isfinite(gm) == np.isfinite(gx)).mean()
                d = np.abs(gm[fin] - gx[fin]).max() if fin.any() else 0.0
                print(f"  gbuf.{k}: finite-agree={same_fin*100:.2f}% "
                      f"max|d|={d:.2e}", flush=True)
    except Exception:
        traceback.print_exc()


base = PTOptions(max_path_length=6, lobes=lobes)

ab("1.gbuf/primary (mpl=1 vis-only)",
   base._replace(max_path_length=1, direct_lighting_nee=False,
                 indirect_lighting_nee=False, direct_lighting_bsdf=False,
                 indirect_lighting_bsdf=False, visible_lights=True, rr=False),
   cmp_gbuf=True)
ab("2.mpl2 NEE diffuse no-rr",
   base._replace(max_path_length=2, lobes=diffuse_only, rr=False,
                 direct_lighting_bsdf=False, indirect_lighting_bsdf=False,
                 visible_lights=False))
ab("3.mpl2 NEE+MIS full lobes no-rr",
   base._replace(max_path_length=2, rr=False))
ab("4.mpl6 no-rr", base._replace(rr=False))
ab("5.mpl6 full (shipping)", base)
print("DONE", flush=True)
