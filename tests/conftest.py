"""Test configuration: run everything on a virtual 8-device CPU mesh.

This mirrors the reference's host-vs-device dual-build checks
(e.g. /root/reference/contrib/cugar/bvh/cuda/lbvh_test.cu:59-240): we validate
kernels and sharding on the CPU backend; the driver separately compile-checks
the multi-chip path and benches on real TPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NOTE: this environment's sitecustomize force-registers the 'axon' TPU
# platform and overrides JAX_PLATFORMS, so we must override it back *after*
# importing jax via jax.config.update — env vars alone are not honored.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the integrator graphs take minutes to compile on
# CPU; caching makes suite re-runs compile-free
jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
