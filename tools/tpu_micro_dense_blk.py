"""Micro A/B: dense Pallas trace block size at 512^2 rays, 60-tri cornell.

The per-bounce dense-trace fixed cost is 2.5 + 1.7 ms (PERF_ATTRIB) at
BLK=512 (512 grid blocks); larger blocks amortize the per-block fixed
cost. Times closest+any at BLK in {512, 1024, 2048} (same process).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
import jax.numpy as jnp
import numpy as np

from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_trace import trace_any_pallas, trace_closest_pallas
from fermat_tpu.scene.procedural import cornell_box

print("backend:", jax.default_backend(), flush=True)
mesh = cornell_box(glossy_boxes=True).device_view()
n = 512 * 512
r = np.random.default_rng(1)
o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 1.8
o_np[:, 1] += 1.0
d_np = r.standard_normal((n, 3)).astype(np.float32)
o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)

ref = None
for blk in (512, 1024, 2048):
    @jax.jit
    def batchc(o, d):
        def body(i, acc):
            h = trace_closest_pallas(mesh, o, d, tmin, tmax, block=blk)
            return acc + jnp.sum(h.t) + jnp.sum(h.tri.astype(jnp.float32))
        return jax.lax.fori_loop(0, 20, body, jnp.float32(0.0))
    jax.block_until_ready(batchc(o, d))
    t0 = time.perf_counter()
    jax.block_until_ready(batchc(o, d))
    dtc = (time.perf_counter() - t0) / 20
    @jax.jit
    def batcha(o, d):
        def body(i, acc):
            occ = trace_any_pallas(mesh, o, d, tmin, jnp.float32(2.0), block=blk)
            return acc + jnp.sum(occ.astype(jnp.int32))
        return jax.lax.fori_loop(0, 20, body, jnp.int32(0))
    jax.block_until_ready(batcha(o, d))
    t0 = time.perf_counter()
    jax.block_until_ready(batcha(o, d))
    dta = (time.perf_counter() - t0) / 20
    h = trace_closest_pallas(mesh, o, d, tmin, tmax, block=blk)
    tri = np.asarray(h.tri)
    if ref is None:
        ref = tri
    print(f"BLK={blk}: closest {dtc*1e3:.3f} ms  any {dta*1e3:.3f} ms  "
          f"match={np.mean(tri == ref)*100:.2f}%", flush=True)
