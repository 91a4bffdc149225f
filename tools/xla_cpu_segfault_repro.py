"""Minimal repro: XLA:CPU segfault/abort after ~120 in-process compiles.

On this host, a single Python process that compiles many DISTINCT XLA:CPU
programs crashes inside backend_compile_and_load (SIGSEGV or SIGABRT, no
Python traceback) somewhere between ~100 and ~150 compilations — with or
without the persistent compile cache. This is why tools/run_suite.sh runs
one pytest process per test FILE.

This repro removes fermat_tpu entirely: each program is a fresh, unique
graph (distinct static shape), so nothing is cached or shared. Run:

    python tools/xla_cpu_segfault_repro.py [n_programs=300]

and watch for the process to die before the final "survived" line. The
loop prints a heartbeat every 10 compiles so the crash count is visible.
Suspected culprit: resource exhaustion in the CPU AOT loader (each load
mmaps a new code region; the crash count scales inversely with program
size). Upstream: report against jax/xla `backend_compile_and_load` with
this script; no issue tracker is reachable from this offline environment.
"""
import sys

import numpy as np


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    for i in range(n):
        k = 8 + i  # unique static shape -> unique program, no cache hits
        x = jnp.arange(k * 3, dtype=jnp.float32).reshape(k, 3)

        def f(x):
            y = jnp.sin(x) @ x.T
            return jnp.tanh(y).sum() + jnp.linalg.norm(x)

        v = jax.jit(f)(x)
        assert np.isfinite(float(v))
        if (i + 1) % 10 == 0:
            print(f"{i + 1} compiles ok", flush=True)
    print(f"survived {n} compiles — not reproduced on this host/version",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
