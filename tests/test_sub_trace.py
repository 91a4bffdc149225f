"""Subcluster composite-traversal exactness: 4-phase L32 kernel vs brute.

Reference analog: lbvh_test_range_query.cu's brute-force-vs-BVH consistency
check (SURVEY.md §4.1) applied to the round-5 subcluster tracer
(ops/pallas_sub_trace.py). Runs in Pallas interpret mode on CPU;
tools/tpu_sub_check.py validates the same kernels on hardware.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fermat_tpu.accel.cluster import build_subclusters
from fermat_tpu.accel.traverse import trace_any_brute, trace_closest_brute
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_sub_trace import trace_any_sub, trace_closest_sub
from fermat_tpu.scene.procedural import random_soup


def _rays(seed=0, n=512, spread=12.0):
    r = np.random.default_rng(seed)
    o = (r.random((n, 3)).astype(np.float32) - 0.5) * spread
    d = r.standard_normal((n, 3)).astype(np.float32)
    o_v = Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    d_v = normalize(
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    )
    return o_v, d_v


def test_sub_closest_matches_brute():
    mesh = random_soup(1500, seed=5).device_view()
    sv = build_subclusters(mesh)
    o, d = _rays(1)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax)
    h_s = trace_closest_sub(sv, o, d, tmin, tmax, block=128)
    m = np.asarray(h_ref.hit_mask)
    np.testing.assert_array_equal(m, np.asarray(h_s.hit_mask))
    np.testing.assert_allclose(
        np.asarray(h_s.t)[m], np.asarray(h_ref.t)[m], rtol=1e-5, atol=1e-5
    )
    same_tri = np.asarray(h_ref.tri) == np.asarray(h_s.tri)
    assert same_tri[m].mean() > 0.99  # rare exact-t ties may differ


def test_sub_any_matches_brute():
    mesh = random_soup(1000, seed=9).device_view()
    sv = build_subclusters(mesh)
    o, d = _rays(2)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(8.0)
    occ_ref = np.asarray(trace_any_brute(mesh, o, d, tmin, tmax))
    occ_s = np.asarray(trace_any_sub(sv, o, d, tmin, tmax, block=128))
    np.testing.assert_array_equal(occ_ref, occ_s)


def test_sub_active_mask_and_per_ray_tmax():
    mesh = random_soup(600, seed=3).device_view()
    sv = build_subclusters(mesh)
    o, d = _rays(4, n=256)
    r = np.random.default_rng(11)
    active = jnp.asarray(r.random(256) < 0.5)
    tmax_v = jnp.asarray(2.0 + 6.0 * r.random(256).astype(np.float32))
    tmin = jnp.float32(1e-4)
    occ_ref = np.asarray(
        trace_any_brute(mesh, o, d, tmin, tmax_v, active=active)
    )
    occ_s = np.asarray(
        trace_any_sub(sv, o, d, tmin, tmax_v, active=active, block=128)
    )
    np.testing.assert_array_equal(occ_ref, occ_s)
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax_v, active=active)
    h_s = trace_closest_sub(sv, o, d, tmin, tmax_v, active=active, block=128)
    m = np.asarray(h_ref.hit_mask) & np.asarray(active)
    np.testing.assert_array_equal(
        np.asarray(h_ref.hit_mask) & np.asarray(active),
        np.asarray(h_s.hit_mask) & np.asarray(active),
    )
    np.testing.assert_allclose(
        np.asarray(h_s.t)[m], np.asarray(h_ref.t)[m], rtol=1e-5, atol=1e-5
    )


def test_sub_sorted_path_matches_unsorted():
    mesh = random_soup(900, seed=13).device_view()
    sv = build_subclusters(mesh)
    o, d = _rays(7, n=1024)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h_s = trace_closest_sub(sv, o, d, tmin, tmax, block=128, sort=True)
    h_u = trace_closest_sub(sv, o, d, tmin, tmax, block=128, sort=False)
    np.testing.assert_array_equal(
        np.asarray(h_s.hit_mask), np.asarray(h_u.hit_mask)
    )
    m = np.asarray(h_s.hit_mask)
    np.testing.assert_allclose(
        np.asarray(h_s.t)[m], np.asarray(h_u.t)[m], rtol=1e-5, atol=1e-5
    )


def test_sub_nc_widths_match_brute():
    """Every composite-group width (NC = composites per iteration) must be
    exact, including NC=1 and widths beyond a typical frontier."""
    mesh = random_soup(1200, seed=21).device_view()
    sv = build_subclusters(mesh)
    o, d = _rays(8, n=512)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax)
    m_ref = np.asarray(h_ref.hit_mask)
    for nc in (1, 2, 4):
        h_k = trace_closest_sub(sv, o, d, tmin, tmax, block=128, nc=nc)
        np.testing.assert_array_equal(
            m_ref, np.asarray(h_k.hit_mask), err_msg=f"nc={nc}"
        )
        np.testing.assert_allclose(
            np.asarray(h_k.t)[m_ref], np.asarray(h_ref.t)[m_ref],
            rtol=1e-5, atol=1e-5, err_msg=f"nc={nc}",
        )


def test_sub_pair_tests_below_cluster_tracer():
    """The point of L32 leaves: fewer triangle PAIR tests than L128 on an
    incoherent workload. visits * 128 lanes at both granularities; the
    sub tracer's composite groups must cut the tested-lane total."""
    from fermat_tpu.accel.cluster import build_clusters
    from fermat_tpu.ops.pallas_frontier_trace import trace_closest_frontier

    mesh = random_soup(4000, seed=33).device_view()
    sv = build_subclusters(mesh)
    cl = build_clusters(mesh)
    o, d = _rays(17, n=2048, spread=10.0)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    _h1, v_fr = trace_closest_frontier(cl, o, d, tmin, tmax, block=128,
                                       return_visits=True)
    _h2, v_sub = trace_closest_sub(sv, o, d, tmin, tmax, block=128,
                                   return_visits=True)
    # frontier visits are 128-lane cluster tiles; sub visits are 32-lane
    # subcluster quarters (4 per composite tile)
    pair_fr = float(np.asarray(v_fr).sum()) * 128
    pair_sub = float(np.asarray(v_sub).sum()) * 32
    assert pair_sub < pair_fr
