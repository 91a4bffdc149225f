"""Attribute the production frontier-trace overhead beyond the kernel.

The BLK=256 K=8 bisect puts the stripped kernel at ~0.41 s on big_room
incoherent; production trace_closest_frontier measures ~0.74 s. This
times each wrapper stage: sort-key+argsort, the 8 gathers, the kernel,
the un-permute scatter, uv recompute.
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

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_frontier_trace import (
    _boxes,
    _closest_impl,
    _recompute_uv,
    _sort_perm_packed,
    trace_closest_frontier,
)
from fermat_tpu.scene.procedural import big_room

room = big_room(n_boxes=8300).device_view()
cl = build_clusters(room)
n = 1600 * 896
r = np.random.default_rng(3)
o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
o_np[:, 1] += 2.0
d_np = r.standard_normal((n, 3)).astype(np.float32)
o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
tmin = jnp.full((n,), 1e-4, jnp.float32)
tmax = jnp.full((n,), 3e38, jnp.float32)


def t(fn, reps=3):
    out = jax.block_until_ready(fn())
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn())
        best = min(best, time.time() - t0)
    return best, out


bt, _ = t(lambda: trace_closest_frontier(cl, o, d, jnp.float32(1e-4),
                                         jnp.float32(3e38)).t)
print(f"production total      : {bt:.3f}s")

st, perm = t(lambda: _sort_perm_packed(cl, o, d, tmin, tmax))
print(f"sort key + argsort    : {st:.3f}s")

gfn = jax.jit(lambda p: tuple(a[p] for a in (o.x, o.y, o.z, d.x, d.y, d.z,
                                             tmin, tmax)))
gt, ga = t(lambda: gfn(perm))
print(f"8 perm gathers        : {gt:.3f}s")

po = ga[0:3]
pd = ga[3:6]
kt, res = t(lambda: _closest_impl(cl.tri, _boxes(cl), po, pd, ga[6], ga[7],
                                  256, 8))
print(f"kernel (sorted rays)  : {kt:.3f}s")

tt, tri = res[0], res[1]
ufn = jax.jit(lambda tv, trv, p: (jnp.zeros_like(tv).at[p].set(tv),
                                  jnp.zeros_like(trv).at[p].set(trv)))
ut, _ = t(lambda: ufn(tt, tri, perm))
print(f"un-permute scatters   : {ut:.3f}s")

uvt, _ = t(lambda: _recompute_uv(cl, o, d, tri))
print(f"uv recompute          : {uvt:.3f}s")
print("DONE", flush=True)
