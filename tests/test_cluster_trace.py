"""Clustered-traversal exactness: Pallas two-level kernel vs brute force.

Reference analog: lbvh_test_range_query.cu's brute-force-vs-BVH consistency
check (SURVEY.md §4.1) applied to the TPU cluster structure.
Runs in Pallas interpret mode on CPU; the same kernels compile on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.accel.traverse import trace_any_brute, trace_closest_brute
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_cluster_trace import (
    trace_any_cluster,
    trace_closest_cluster,
)
from fermat_tpu.scene.procedural import random_soup

N_RAYS = 512


def _rays(seed=0, n=N_RAYS, spread=12.0):
    r = np.random.default_rng(seed)
    o = (r.random((n, 3)).astype(np.float32) - 0.5) * spread
    d = r.standard_normal((n, 3)).astype(np.float32)
    o_v = Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    d_v = normalize(Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])))
    return o_v, d_v


def test_cluster_closest_matches_brute():
    mesh = random_soup(1500, seed=5).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(1)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax)
    h_cl = trace_closest_cluster(cl, o, d, tmin, tmax, block=256)
    ref_t = np.asarray(h_ref.t)
    cl_t = np.asarray(h_cl.t)
    # identical hit set; ties on t can pick either triangle
    np.testing.assert_array_equal(np.asarray(h_ref.hit_mask), np.asarray(h_cl.hit_mask))
    m = np.asarray(h_ref.hit_mask)
    np.testing.assert_allclose(cl_t[m], ref_t[m], rtol=1e-5, atol=1e-5)
    same_tri = np.asarray(h_ref.tri) == np.asarray(h_cl.tri)
    assert same_tri[m].mean() > 0.99  # rare exact-t ties may differ


def test_cluster_any_matches_brute():
    mesh = random_soup(1000, seed=9).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(2)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(8.0)
    occ_ref = np.asarray(trace_any_brute(mesh, o, d, tmin, tmax))
    occ_cl = np.asarray(trace_any_cluster(cl, o, d, tmin, tmax, block=256))
    np.testing.assert_array_equal(occ_ref, occ_cl)


def test_cluster_active_mask():
    mesh = random_soup(600, seed=3).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(3, n=256)
    active = jnp.arange(256) % 2 == 0
    h = trace_closest_cluster(cl, o, d, jnp.float32(1e-4), jnp.float32(3e38),
                              active=active, block=256)
    tri = np.asarray(h.tri)
    assert (tri[~np.asarray(active)] == -1).all()
