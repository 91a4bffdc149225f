"""Micro A/B: light-CDF inversion strategies at 512^2 lanes, T=60 tris.

The 512^2 attribution shows the NEE CDF inversion (compare+reduce over
(N, T)) at ~2.4 ms/bounce (slice_reduce_fusion @ lights.py:109) — this
times the alternatives standalone: compare-sum, jnp.searchsorted, and a
fixed-depth binary search with dynamic gathers.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
import jax.numpy as jnp
import numpy as np

N = 512 * 512
T = 60
r = np.random.default_rng(0)
w = r.random(T); w /= w.sum()
cdf = jnp.asarray(np.cumsum(w), jnp.float32)
u = jnp.asarray(r.random(N), jnp.float32)

@jax.jit
def compare_sum(u):
    return jnp.sum((cdf[None, :] <= u[:, None]).astype(jnp.int32), axis=1)

@jax.jit
def searchsorted(u):
    return jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)

@jax.jit
def bsearch(u):
    lo = jnp.zeros(N, jnp.int32)
    hi = jnp.full(N, T, jnp.int32)
    def step(_, c):
        lo, hi = c
        mid = (lo + hi) // 2
        go = cdf[jnp.clip(mid, 0, T - 1)] <= u
        return jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid)
    lo, hi = jax.lax.fori_loop(0, 6, step, (lo, hi))
    return lo

for name, fn in (("compare_sum", compare_sum), ("searchsorted", searchsorted),
                 ("bsearch6", bsearch)):
    out = jax.block_until_ready(fn(u))
    # batch 100 calls in-graph for timing
    @jax.jit
    def batch(u):
        def body(i, acc):
            # full-array sum: a [0] here lets XLA slice the
            # computation away and time nothing
            return acc + jnp.sum(fn(u + i * 0.0))
        return jax.lax.fori_loop(0, 100, body, jnp.int32(0))
    jax.block_until_ready(batch(u))
    t0 = time.perf_counter()
    jax.block_until_ready(batch(u))
    dt = (time.perf_counter() - t0) / 100
    print(f"{name}: {dt*1e3:.3f} ms/call", flush=True)

a = np.asarray(compare_sum(u)); b = np.asarray(searchsorted(u)); c = np.asarray(bsearch(u))
print("agree:", (a == b).mean(), (a == c).mean(), flush=True)
