"""Same-process A/B of the cluster tracer's coherence sort + near-ordered
traversal on the 99k-tri big_room (VERDICT r1 item 2 follow-up).

Ray sets: (a) incoherent random rays (worst case — post-bounce wavefront),
(b) camera-like coherent rays, each traced sorted vs unsorted. Then one
full 1600x896 PT pass.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from fermat_tpu.accel.cluster import build_clusters
    from fermat_tpu.core.math import Vec3, normalize
    from fermat_tpu.ops.pallas_cluster_trace import (
        trace_any_cluster,
        trace_closest_cluster,
    )
    from fermat_tpu.scene.procedural import big_room

    print("backend:", jax.default_backend(), flush=True)
    room = big_room(n_boxes=8300)
    mesh = room.device_view()
    cl = build_clusters(mesh)
    print(f"tris={mesh.n_triangles}", flush=True)
    r = np.random.default_rng(3)
    n = 1433600
    tmin = jnp.float32(1e-4)
    tmax = jnp.float32(3e38)

    def timed(fn, label):
        out = jax.block_until_ready(fn())
        t0 = time.time()
        out = jax.block_until_ready(fn())
        dt = time.time() - t0
        print(f"{label}: {dt:.3f}s = {n/dt/1e6:.2f} Mrays/s", flush=True)
        return out

    # (a) incoherent
    o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
    o_np[:, 1] += 2.0
    d_np = r.standard_normal((n, 3)).astype(np.float32)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
    h_s = timed(lambda: trace_closest_cluster(cl, o, d, tmin, tmax, sort=True),
                "incoherent closest SORTED")
    h_u = timed(lambda: trace_closest_cluster(cl, o, d, tmin, tmax, sort=False),
                "incoherent closest unsorted")
    same = (np.asarray(h_s.tri) == np.asarray(h_u.tri)).mean()
    print(f"  sorted==unsorted tri agreement: {same*100:.3f}%", flush=True)
    timed(lambda: trace_any_cluster(cl, o, d, tmin, jnp.float32(6.0), sort=True),
          "incoherent any SORTED")
    timed(lambda: trace_any_cluster(cl, o, d, tmin, jnp.float32(6.0), sort=False),
          "incoherent any unsorted")

    # (b) coherent (camera-like fan)
    eye = np.array([0.0, 3.0, 10.0], np.float32)
    px = (r.random(n).astype(np.float32) - 0.5) * 1.6
    py = (r.random(n).astype(np.float32) - 0.5) * 0.9
    d2 = np.stack([px, py, -np.ones(n, np.float32)], 1)
    o2 = Vec3(*(jnp.full(n, eye[i]) for i in range(3)))
    d2v = normalize(Vec3(*(jnp.asarray(d2[:, i]) for i in range(3))))
    timed(lambda: trace_closest_cluster(cl, o2, d2v, tmin, tmax, sort=True),
          "coherent closest SORTED")
    timed(lambda: trace_closest_cluster(cl, o2, d2v, tmin, tmax, sort=False),
          "coherent closest unsorted")

    # full pass
    from fermat_tpu.bsdf.composite import scene_lobes
    from fermat_tpu.core.camera import Camera
    from fermat_tpu.integrators.pt import PTOptions, render_pass
    from fermat_tpu.scene.view import SceneView

    cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
    rv = SceneView.build(room, cam)
    opts = PTOptions(max_path_length=6, lobes=scene_lobes(room.materials),
                     tracer="cluster")
    out = render_pass(rv, opts, 1600, 896, jnp.uint32(0))
    jax.block_until_ready(out.composited.x)
    t0 = time.time()
    out = render_pass(rv, opts, 1600, 896, jnp.uint32(1))
    img = jax.block_until_ready(out.composited.x)
    dt = time.time() - t0
    print(f"render_pass steady: {dt:.1f}s  {float(out.rays)/dt/1e6:.2f} Mrays/s"
          f"  mean={float(jnp.mean(img)):.4f}", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
