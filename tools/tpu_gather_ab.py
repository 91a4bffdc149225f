"""A/B: strategies for the trace wrapper's permute/gather stages on TPU.

Stage 1 (ray permute): 8 f32 arrays of 1.43M permuted by a sort key.
  a) argsort + 8 separate 1-D gathers       (current production)
  b) argsort + one (n, 8) packed row gather
  c) lax.sort key with 8 value operands (no explicit gather)
Stage 2 (uv tri fetch): 9 f32 arrays of Nt gathered by per-ray tri id.
  a) 9 separate 1-D gathers                 (current production)
  b) one (Nt, 16) padded row gather
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

n = 1600 * 896
nt = 100_352
r = np.random.default_rng(0)
key = jnp.asarray(r.integers(0, 1 << 27, n, dtype=np.uint32))
vals = [jnp.asarray(r.standard_normal(n).astype(np.float32))
        for _ in range(8)]
tri = jnp.asarray(r.integers(0, nt, n, dtype=np.int32))
tdata = [jnp.asarray(r.standard_normal(nt).astype(np.float32))
         for _ in range(9)]


def t(fn, reps=3):
    out = jax.block_until_ready(fn())
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn())
        best = min(best, time.time() - t0)
    return best, out


@jax.jit
def a_sep(key, *vs):
    p = jnp.argsort(key)
    return tuple(v[p] for v in vs)


@jax.jit
def b_packed(key, *vs):
    p = jnp.argsort(key)
    m = jnp.stack(vs, axis=1)  # (n, 8)
    g = m[p]
    return tuple(g[:, i] for i in range(len(vs)))


@jax.jit
def c_cosort(key, *vs):
    outs = jax.lax.sort((key,) + vs, dimension=0, num_keys=1)
    return outs[1:]


ta, ra = t(lambda: a_sep(key, *vals))
tb, rb = t(lambda: b_packed(key, *vals))
tc, rc = t(lambda: c_cosort(key, *vals))
print(f"ray permute: 8x1D gathers {ta:.3f}s  packed-row {tb:.3f}s  "
      f"co-sort {tc:.3f}s")
for i in range(8):
    np.testing.assert_allclose(np.asarray(ra[i]), np.asarray(rb[i]))
    np.testing.assert_allclose(np.asarray(ra[i]), np.asarray(rc[i]))


@jax.jit
def uv_a(tri, *td):
    return tuple(a[tri] for a in td)


@jax.jit
def uv_b(tri, *td):
    m = jnp.stack(td, axis=1)  # (nt, 9)
    m = jnp.pad(m, ((0, 0), (0, 7)))
    g = m[tri]
    return tuple(g[:, i] for i in range(len(td)))


ua, r1 = t(lambda: uv_a(tri, *tdata))
ub, r2 = t(lambda: uv_b(tri, *tdata))
print(f"uv fetch: 9x1D gathers {ua:.3f}s  padded-row {ub:.3f}s")
for i in range(9):
    np.testing.assert_allclose(np.asarray(r1[i]), np.asarray(r2[i]))

# un-permute: scatter vs inverse-perm gather vs co-sort by perm
perm = jnp.argsort(key)
tv = vals[0]
iv = vals[1].astype(jnp.int32)


@jax.jit
def un_a(tv, iv, p):
    return (jnp.zeros_like(tv).at[p].set(tv),
            jnp.zeros_like(iv).at[p].set(iv))


@jax.jit
def un_b(tv, iv, p):
    outs = jax.lax.sort((p, tv, iv), dimension=0, num_keys=1)
    return outs[1], outs[2]


wa, s1 = t(lambda: un_a(tv, iv, perm))
wb, s2 = t(lambda: un_b(tv, iv, perm))
print(f"un-permute: scatter {wa:.3f}s  co-sort {wb:.3f}s")
np.testing.assert_allclose(np.asarray(s1[0]), np.asarray(s2[0]))
np.testing.assert_array_equal(np.asarray(s1[1]), np.asarray(s2[1]))
print("DONE", flush=True)
