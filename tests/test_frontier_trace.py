"""Frontier-traversal exactness: per-ray culled kernel vs brute force.

Reference analog: lbvh_test_range_query.cu's brute-force-vs-BVH consistency
check (SURVEY.md §4.1) applied to the round-3 frontier tracer.
Runs in Pallas interpret mode on CPU; tools/tpu_frontier_check.py validates
the same kernels on hardware.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.accel.traverse import trace_any_brute, trace_closest_brute
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_frontier_trace import (
    trace_any_frontier,
    trace_closest_frontier,
)
from fermat_tpu.scene.procedural import random_soup

N_RAYS = 512


def _rays(seed=0, n=N_RAYS, spread=12.0):
    r = np.random.default_rng(seed)
    o = (r.random((n, 3)).astype(np.float32) - 0.5) * spread
    d = r.standard_normal((n, 3)).astype(np.float32)
    o_v = Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    d_v = normalize(
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    )
    return o_v, d_v


def test_frontier_closest_matches_brute():
    mesh = random_soup(1500, seed=5).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(1)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax)
    h_fr = trace_closest_frontier(cl, o, d, tmin, tmax, block=256)
    m = np.asarray(h_ref.hit_mask)
    np.testing.assert_array_equal(m, np.asarray(h_fr.hit_mask))
    np.testing.assert_allclose(
        np.asarray(h_fr.t)[m], np.asarray(h_ref.t)[m], rtol=1e-5, atol=1e-5
    )
    same_tri = np.asarray(h_ref.tri) == np.asarray(h_fr.tri)
    assert same_tri[m].mean() > 0.99  # rare exact-t ties may differ


def test_frontier_any_matches_brute():
    mesh = random_soup(1000, seed=9).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(2)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(8.0)
    occ_ref = np.asarray(trace_any_brute(mesh, o, d, tmin, tmax))
    occ_fr = np.asarray(trace_any_frontier(cl, o, d, tmin, tmax, block=256))
    np.testing.assert_array_equal(occ_ref, occ_fr)


def test_frontier_active_mask_and_per_ray_tmax():
    mesh = random_soup(600, seed=3).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(4, n=256)
    r = np.random.default_rng(11)
    active = jnp.asarray(r.random(256) < 0.5)
    tmax_v = jnp.asarray(2.0 + 6.0 * r.random(256).astype(np.float32))
    tmin = jnp.float32(1e-4)
    occ_ref = np.asarray(
        trace_any_brute(mesh, o, d, tmin, tmax_v, active=active)
    )
    occ_fr = np.asarray(
        trace_any_frontier(cl, o, d, tmin, tmax_v, active=active, block=256)
    )
    np.testing.assert_array_equal(occ_ref, occ_fr)
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax_v, active=active)
    h_fr = trace_closest_frontier(cl, o, d, tmin, tmax_v, active=active,
                                  block=256)
    m = np.asarray(h_ref.hit_mask) & np.asarray(active)
    np.testing.assert_array_equal(
        np.asarray(h_ref.hit_mask) & np.asarray(active),
        np.asarray(h_fr.hit_mask) & np.asarray(active),
    )
    np.testing.assert_allclose(
        np.asarray(h_fr.t)[m], np.asarray(h_ref.t)[m], rtol=1e-5, atol=1e-5
    )


def test_frontier_sorted_path_matches_unsorted():
    # n >= 4*block triggers the morton/octant sort + un-permute path
    mesh = random_soup(900, seed=13).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(7, n=1024)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h_s = trace_closest_frontier(cl, o, d, tmin, tmax, block=256, sort=True)
    h_u = trace_closest_frontier(cl, o, d, tmin, tmax, block=256, sort=False)
    np.testing.assert_array_equal(
        np.asarray(h_s.hit_mask), np.asarray(h_u.hit_mask)
    )
    m = np.asarray(h_s.hit_mask)
    np.testing.assert_allclose(
        np.asarray(h_s.t)[m], np.asarray(h_u.t)[m], rtol=1e-5, atol=1e-5
    )


def test_frontier_kwide_matches_brute_all_k():
    """K-wide visit groups (round 5) must be EXACT vs brute force for
    every group width, including K=1 (the round-4 behavior) and K larger
    than a typical per-block frontier."""
    mesh = random_soup(1500, seed=21).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(8, n=1024)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax)
    m_ref = np.asarray(h_ref.hit_mask)
    for k in (1, 2, 4, 8):
        h_k = trace_closest_frontier(cl, o, d, tmin, tmax, block=256,
                                     k_wide=k)
        np.testing.assert_array_equal(
            m_ref, np.asarray(h_k.hit_mask), err_msg=f"k_wide={k}"
        )
        np.testing.assert_allclose(
            np.asarray(h_k.t)[m_ref], np.asarray(h_ref.t)[m_ref],
            rtol=1e-5, atol=1e-5, err_msg=f"k_wide={k}",
        )


def test_frontier_kwide_any_and_masks():
    mesh = random_soup(900, seed=23).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(9, n=1024)
    r = np.random.default_rng(31)
    active = jnp.asarray(r.random(1024) < 0.6)
    tmax_v = jnp.asarray(2.0 + 6.0 * r.random(1024).astype(np.float32))
    tmin = jnp.float32(1e-4)
    act = np.asarray(active)
    occ_ref = np.asarray(
        trace_any_brute(mesh, o, d, tmin, tmax_v, active=active))
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax_v, active=active)
    for k in (2, 4):
        occ_k = np.asarray(trace_any_frontier(
            cl, o, d, tmin, tmax_v, active=active, block=256, k_wide=k))
        np.testing.assert_array_equal(occ_ref, occ_k, err_msg=f"k={k}")
        h_k = trace_closest_frontier(cl, o, d, tmin, tmax_v, active=active,
                                     block=256, k_wide=k)
        np.testing.assert_array_equal(
            np.asarray(h_ref.hit_mask) & act,
            np.asarray(h_k.hit_mask) & act, err_msg=f"k={k}")
        m = np.asarray(h_ref.hit_mask) & act
        np.testing.assert_allclose(
            np.asarray(h_k.t)[m], np.asarray(h_ref.t)[m],
            rtol=1e-5, atol=1e-5, err_msg=f"k={k}")


def test_frontier_kwide_visit_overhead_bounded():
    """K-wide groups may test a few extra clusters per block (the K-group
    commits before earlier members' results land) but must stay within a
    small additive bound of the 1-wide visit counts."""
    mesh = random_soup(2000, seed=25).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(10, n=2048)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    _, v1 = trace_closest_frontier(cl, o, d, tmin, tmax, block=256,
                                   k_wide=1, return_visits=True)
    _, v4 = trace_closest_frontier(cl, o, d, tmin, tmax, block=256,
                                   k_wide=4, return_visits=True)
    assert v4.shape == v1.shape
    n_blocks = v1.shape[0]
    assert float(v4.sum()) <= float(v1.sum()) + 2 * 4 * n_blocks


def test_frontier_sah_clusters_match_brute():
    """SAH-leaf clustering (VERDICT r3 next#2: 'SAH-guided clustering
    A/B'd vs morton') must be exact through the frontier tracer."""
    mesh = random_soup(1500, seed=29).device_view()
    cl = build_clusters(mesh, method="sah")
    o, d = _rays(11, n=512)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax)
    h_fr = trace_closest_frontier(cl, o, d, tmin, tmax, block=256)
    m = np.asarray(h_ref.hit_mask)
    np.testing.assert_array_equal(m, np.asarray(h_fr.hit_mask))
    np.testing.assert_allclose(
        np.asarray(h_fr.t)[m], np.asarray(h_ref.t)[m], rtol=1e-5, atol=1e-5
    )
    occ_ref = np.asarray(trace_any_brute(mesh, o, d, tmin, jnp.float32(8.0)))
    occ_fr = np.asarray(trace_any_frontier(cl, o, d, tmin, jnp.float32(8.0),
                                           block=256))
    np.testing.assert_array_equal(occ_ref, occ_fr)
