"""Isolated TPU check for the clustered Pallas tracer.

Traces a 10k-triangle random soup with trace_closest_cluster /
trace_any_cluster on the real chip and cross-checks hits against the
skip-link BVH walk (accel/traverse.py) on the same device.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")

    from fermat_tpu.accel.cluster import build_clusters
    from fermat_tpu.accel.bvh import build_bvh_for_mesh
    from fermat_tpu.accel.traverse import trace_closest, trace_any
    from fermat_tpu.core.math import Vec3, normalize
    from fermat_tpu.ops.pallas_cluster_trace import (
        trace_any_cluster,
        trace_closest_cluster,
    )
    from fermat_tpu.scene.procedural import random_soup

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    mesh = random_soup(n_tris, seed=7).device_view()
    cl = build_clusters(mesh)
    print(f"tris={mesh.n_triangles} clusters={cl.n_clusters} "
          f"groups={cl.n_groups}", flush=True)

    r = np.random.default_rng(3)
    o_np = (r.random((n_rays, 3)).astype(np.float32) - 0.5) * 12.0
    d_np = r.standard_normal((n_rays, 3)).astype(np.float32)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)

    h_cl = jax.block_until_ready(
        trace_closest_cluster(cl, o, d, tmin, tmax))
    print("cluster closest: ok", flush=True)
    occ_cl = jax.block_until_ready(
        trace_any_cluster(cl, o, d, tmin, jnp.float32(6.0)))
    print("cluster any: ok", flush=True)

    bvh = build_bvh_for_mesh(mesh, leaf_size=4)
    h_ref = jax.block_until_ready(trace_closest(bvh, mesh, o, d, tmin, tmax))
    occ_ref = jax.block_until_ready(
        trace_any(bvh, mesh, o, d, tmin, jnp.float32(6.0)))

    hm_cl = np.asarray(h_cl.hit_mask)
    hm_ref = np.asarray(h_ref.hit_mask)
    same_mask = (hm_cl == hm_ref).mean()
    m = hm_ref & hm_cl
    t_close = np.allclose(np.asarray(h_cl.t)[m], np.asarray(h_ref.t)[m],
                          rtol=1e-4, atol=1e-4)
    occ_same = (np.asarray(occ_cl) == np.asarray(occ_ref)).mean()
    print(f"hit-mask agreement: {same_mask*100:.2f}%  t allclose: {t_close}  "
          f"occlusion agreement: {occ_same*100:.2f}%", flush=True)
    assert same_mask > 0.999 and t_close and occ_same > 0.999
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
