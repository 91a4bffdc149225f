"""Is block_until_ready through the axon tunnel actually waiting?

Scales the logistic-map micro by 10x/100x iterations and also times
with a forced host readback. If rate stays constant across scales, the
timing is real; if small workloads report impossible rates that
collapse at scale, block_until_ready returns early for short work and
ROOFLINE ceilings must come from the scaled/readback variant.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices(), flush=True)
SHAPE = (2048, 1024)
v0 = jnp.asarray(np.random.default_rng(0).random(SHAPE, np.float32) * 0.9 + 0.05)


@functools.partial(jax.jit, static_argnames=("iters",))
def logistic(v, iters):
    def body(i, v):
        return 3.999 * v * (1.0 - v)
    return jax.lax.fori_loop(0, iters, body, v)


for iters in (512, 5120, 51200):
    v = jax.block_until_ready(logistic(v0, iters))
    t0 = time.perf_counter()
    v = logistic(v0, iters)
    jax.block_until_ready(v)
    dt_b = time.perf_counter() - t0
    t0 = time.perf_counter()
    v = logistic(v0, iters)
    s = float(jnp.sum(v))  # forced host readback
    dt_r = time.perf_counter() - t0
    ops = SHAPE[0] * SHAPE[1] * iters * 3
    print(f"iters={iters}: block={dt_b*1e3:.2f}ms ({ops/dt_b/1e12:.2f}T) "
          f"readback={dt_r*1e3:.2f}ms ({ops/dt_r/1e12:.2f}T) sum={s:.1f}",
          flush=True)

big = jnp.asarray(np.random.default_rng(1).random((8192, 16384), np.float32))


@jax.jit
def stream(a):
    return a + 1.0


jax.block_until_ready(stream(big))
t0 = time.perf_counter()
out = stream(big)
s = float(jnp.sum(out))
dt = time.perf_counter() - t0
print(f"HBM 512MB r+w with readback: {2*big.size*4/dt/1e9:.1f} GB/s "
      f"({dt*1e3:.2f}ms, note readback adds a reduce+transfer)", flush=True)
print("DONE", flush=True)
