"""Speed-of-light micro-benchmarks for ROOFLINE.md (honest edition).

The first-round micro used v = v*a + b with CONSTANT a, b — an affine
chain XLA can (and apparently did) collapse, reporting an impossible
30.8 Tflop/s "VPU f32" rate. These kernels are algebraically opaque:

  * VPU f32: logistic map v = 3.999 * v * (1 - v) — chaotic, cannot be
    folded; 3 ops/elem/iter, all VPU mul/sub.
  * VPU select/cmp mix: the tracer's actual op diet (cmp, select, min)
    via v = min(|v - 0.5|, where(v > 0.25, v*0.5, v+0.25)).
  * HBM stream: y = x + 1 over a 256 MB resident array, 8 distinct
    buffers round-robined so no result feeds the next input.

Run ALONE on TPU.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices(), flush=True)

ITERS = 512
SHAPE = (2048, 1024)  # 2M lanes


@jax.jit
def logistic(v):
    def body(i, v):
        return 3.999 * v * (1.0 - v)
    return jax.lax.fori_loop(0, ITERS, body, v)


@jax.jit
def selmix(v):
    def body(i, v):
        w = jnp.where(v > 0.25, v * 0.5, v + 0.25)
        return jnp.minimum(jnp.abs(v - 0.5), w)
    return jax.lax.fori_loop(0, ITERS, body, v)


v0 = jnp.asarray(np.random.default_rng(0).random(SHAPE, np.float32) * 0.9 + 0.05)
for name, fn, ops in (("logistic f32 (mul/sub)", logistic, 3),
                      ("select/cmp/min mix", selmix, 5)):
    v = jax.block_until_ready(fn(v0))
    t0 = time.perf_counter()
    reps = 8
    x = v0
    for _ in range(reps):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / reps
    rate = SHAPE[0] * SHAPE[1] * ITERS * ops / dt / 1e12
    print(f"VPU {name}: {rate:.3f} T(lane-)op/s  ({dt*1e3:.2f} ms/call)",
          flush=True)

bufs = [jnp.asarray(np.random.default_rng(i).random((4096, 16384), np.float32))
        for i in range(8)]  # 256 MB each


@jax.jit
def stream(a):
    return a + 1.0


jax.block_until_ready(stream(bufs[0]))
t0 = time.perf_counter()
outs = [stream(b) for b in bufs]
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / len(bufs)
gbs = 2 * bufs[0].size * 4 / dt / 1e9
print(f"HBM stream (r+w): {gbs:.1f} GB/s  ({dt*1e3:.2f} ms per 256MB buf)",
      flush=True)
print("DONE", flush=True)
