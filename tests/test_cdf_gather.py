"""Fused CDF-pick + row-fetch kernel exactness (ops/pallas_cdf_gather)."""
import jax.numpy as jnp
import numpy as np

from fermat_tpu.ops.pallas_cdf_gather import cdf_pick_rows


def _ref(rows, cdf, u):
    tri = np.minimum(np.sum(cdf[None, :] <= u[:, None], axis=1),
                     rows.shape[0] - 1)
    return rows[tri]


def test_kernel_matches_upper_bound():
    rng = np.random.default_rng(3)
    for L, C, N in ((544, 23, 8192), (7, 5, 4096), (2049, 17, 5000),
                    (128, 23, 100)):
        w = rng.random(L) + 1e-3
        cdf = (np.cumsum(w) / w.sum()).astype(np.float32)
        rows = rng.random((L, C)).astype(np.float32)
        u = rng.random(N).astype(np.float32)
        # include exact-boundary values (u == cdf entry)
        u[: min(L, N)] = cdf[: min(L, N)]
        out = np.asarray(cdf_pick_rows(jnp.asarray(rows), jnp.asarray(cdf),
                                       jnp.asarray(u)))
        np.testing.assert_allclose(out, _ref(rows, cdf, u), rtol=1e-6,
                                   atol=1e-6, err_msg=f"L={L} N={N}")
