"""Helper: render the mega-debug stage-2/5 configs on XLA:CPU, save npz."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

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
out = {}
for k, o in cfgs.items():
    for trc in ("pallas", "mega"):
        r = render_pass(view, o._replace(tracer=trc), RES, RES, jnp.uint32(2))
        out[f"{k}_{trc}"] = np.asarray(r.composited.x)
        out[f"{k}_{trc}_rays"] = np.asarray(r.rays)
np.savez(sys.argv[1], **out)
print("golden saved", flush=True)
