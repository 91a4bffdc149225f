"""Bisect the binned-tracer TPU device fault (tpu_r3_check stage 2).

One configuration per PROCESS — a Mosaic kernel fault poisons the TPU
client for the rest of the process, so each probe must be isolated.

Usage: python tools/tpu_binned_bisect.py MODE [ARGS...]
  scan N          - frontier scan only, bigroom clusters, N rays
  sort N          - argsort of N synthetic cids
  kernel N        - pallas test kernel only: N rays, synthetic sorted cids
                    over the bigroom's 784 clusters
  full N          - trace_closest_binned on bigroom, N rays
  soup N TRIS     - trace_closest_binned on a TRIS-triangle soup, N rays
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.scene.procedural import big_room, random_soup
from fermat_tpu.ops import pallas_binned_trace as bt

mode = sys.argv[1]
n = int(sys.argv[2])
print(f"probe mode={mode} n={n} backend={jax.default_backend()}", flush=True)

r = np.random.default_rng(3)


def rays(n):
    o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
    o_np[:, 1] += 2.0
    d_np = r.standard_normal((n, 3)).astype(np.float32)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
    return o, d


def bigroom_clusters():
    room = big_room(n_boxes=8300)
    cl = build_clusters(room.device_view())
    print(f"tris={room.device_view().n_triangles} clusters={cl.n_clusters}",
          flush=True)
    return cl


tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)

t0 = time.time()
if mode == "scan":
    cl = bigroom_clusters()
    o, d = rays(n)
    boxes = (cl.lo_x, cl.lo_y, cl.lo_z, cl.hi_x, cl.hi_y, cl.hi_z)
    tl = jnp.full((n,), 3e38, jnp.float32)
    tm = jnp.full((n,), 1e-4, jnp.float32)
    le = jnp.full((n,), -3e38, jnp.float32)
    lc = jnp.full((n,), -1, jnp.int32)
    f = jax.jit(lambda: bt._frontier_scan(boxes, o, d, tm, tl, le, lc,
                                          ordered=True))
    ent, cid = jax.block_until_ready(f())
    print(f"scan ok: frontier set for {float((cid < bt._SENT).mean())*100:.1f}%"
          f" of rays", flush=True)
elif mode == "sort":
    cid = jnp.asarray(r.integers(0, 784, n), jnp.int32)
    perm = jax.block_until_ready(jnp.argsort(cid))
    print("sort ok", flush=True)
elif mode == "kernel":
    cl = bigroom_clusters()
    o, d = rays(n)
    cid = jnp.sort(jnp.asarray(r.integers(0, cl.n_clusters, n), jnp.int32))
    tm = jnp.full((n,), 1e-4, jnp.float32)
    tl = jnp.full((n,), 3e38, jnp.float32)
    import functools
    kernel = functools.partial(bt._binned_closest_kernel,
                               n_units=cl.tri.shape[0], u_steps=bt.U_STEPS)
    outs = bt._run_kernel(kernel, ("f", "i", "f", "f", "f"), cl.tri,
                          (o.x, o.y, o.z, d.x, d.y, d.z, tm, tl), cid,
                          bt.DEF_BLK)
    jax.block_until_ready(outs)
    print(f"kernel ok: tested={float(outs[4].mean())*100:.1f}%", flush=True)
elif mode == "full":
    cl = bigroom_clusters()
    o, d = rays(n)
    h = jax.block_until_ready(bt.trace_closest_binned(cl, o, d, tmin, tmax))
    print(f"full ok: hits={float((h.tri >= 0).mean())*100:.1f}%", flush=True)
elif mode == "soup":
    tris = int(sys.argv[3])
    cl = build_clusters(random_soup(tris, seed=7).device_view())
    print(f"clusters={cl.n_clusters}", flush=True)
    o, d = rays(n)
    h = jax.block_until_ready(bt.trace_closest_binned(cl, o, d, tmin, tmax))
    print(f"soup ok: hits={float((h.tri >= 0).mean())*100:.1f}%", flush=True)
print(f"elapsed {time.time()-t0:.1f}s", flush=True)
