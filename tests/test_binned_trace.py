"""Binned-wavefront traversal exactness: per-ray frontier kernel vs brute.

Reference analog: lbvh_test_range_query.cu's brute-force-vs-BVH consistency
check (SURVEY.md §4.1) applied to the round-3 binned tracer
(ops/pallas_binned_trace). Runs in Pallas interpret mode on CPU; the same
kernels compile on TPU (tools/tpu_binned_check.py is the hardware canary).
"""
import jax
import jax.numpy as jnp
import numpy as np

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.accel.traverse import trace_any_brute, trace_closest_brute
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_binned_trace import (
    trace_any_binned,
    trace_closest_binned,
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


def test_binned_closest_matches_brute():
    mesh = random_soup(1500, seed=5).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(1)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax)
    h_b = trace_closest_binned(cl, o, d, tmin, tmax, block=256)
    m = np.asarray(h_ref.hit_mask)
    np.testing.assert_array_equal(m, np.asarray(h_b.hit_mask))
    np.testing.assert_allclose(
        np.asarray(h_b.t)[m], np.asarray(h_ref.t)[m], rtol=1e-5, atol=1e-5
    )
    same_tri = np.asarray(h_ref.tri) == np.asarray(h_b.tri)
    assert same_tri[m].mean() > 0.99  # rare exact-t ties may differ


def test_binned_closest_tiny_u_steps_still_exact():
    # u_steps=1 forces heavy tested-flag retries: correctness must not
    # depend on how many distinct clusters a block may test per round.
    mesh = random_soup(900, seed=11).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(4, n=192)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    h_ref = trace_closest_brute(mesh, o, d, tmin, tmax)
    h_b = trace_closest_binned(cl, o, d, tmin, tmax, block=64, u_steps=1)
    m = np.asarray(h_ref.hit_mask)
    np.testing.assert_array_equal(m, np.asarray(h_b.hit_mask))
    np.testing.assert_allclose(
        np.asarray(h_b.t)[m], np.asarray(h_ref.t)[m], rtol=1e-5, atol=1e-5
    )


def test_binned_any_matches_brute():
    mesh = random_soup(1000, seed=9).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(2)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(8.0)
    occ_ref = np.asarray(trace_any_brute(mesh, o, d, tmin, tmax))
    occ_b = np.asarray(trace_any_binned(cl, o, d, tmin, tmax, block=256))
    np.testing.assert_array_equal(occ_ref, occ_b)


def test_binned_active_mask():
    mesh = random_soup(600, seed=3).device_view()
    cl = build_clusters(mesh)
    o, d = _rays(7, n=256)
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    active = jnp.arange(256) % 3 != 0
    h = trace_closest_binned(cl, o, d, tmin, tmax, active=active, block=128)
    assert not np.any(np.asarray(h.hit_mask)[~np.asarray(active)])
    occ = trace_any_binned(cl, o, d, tmin, jnp.float32(8.0), active=active,
                           block=128)
    assert not np.any(np.asarray(occ)[~np.asarray(active)])


def test_pt_render_with_binned_tracer_matches_brute():
    """Full PT pass with tracer='binned' must produce the same image as the
    brute tracer (the trace is exact, everything downstream identical)."""
    import pytest
    pytest.importorskip("jax")
    from fermat_tpu.integrators.pt import PTOptions, render_pass
    from fermat_tpu.scene.procedural import cornell_box, cornell_camera
    from fermat_tpu.scene.view import SceneView

    view = SceneView.build(cornell_box(), cornell_camera())
    base = dict(max_path_length=3, rr=False)
    res = 32
    out_ref = render_pass(view, PTOptions(tracer="brute", **base), res, res,
                          jnp.uint32(2))
    out_b = render_pass(view, PTOptions(tracer="binned", **base), res, res,
                        jnp.uint32(2))
    np.testing.assert_allclose(
        np.asarray(out_b.composited.x), np.asarray(out_ref.composited.x),
        rtol=2e-4, atol=2e-5,
    )
