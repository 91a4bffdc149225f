"""Same-process TPU A/B: masked-lane PT vs queue-compaction PT at 512^2,
then the 100k-tri big_room scene (cluster tracer) at 1600x896.

VERDICT r1 item 8: "A/B it against masked lanes ... show the data".
Cross-process tunnel timings vary ~15%; all numbers here are same-process
best-of-3 in-graph batches.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, view, opts, res_x, res_y, n_passes):
    import jax
    import jax.numpy as jnp

    from fermat_tpu.integrators.pt import render_pass

    @jax.jit
    def batch(view, instance0):
        def body(i, carry):
            acc, rays = carry
            out = render_pass(view, opts, res_x, res_y, instance0 + i)
            return (acc + out.composited.x, rays + out.rays)

        return jax.lax.fori_loop(
            0, n_passes, body,
            (jnp.zeros(res_x * res_y, jnp.float32), jnp.zeros((), jnp.float32)),
        )

    t0 = time.time()
    img, rays = jax.block_until_ready(batch(view, jnp.uint32(0)))
    print(f"[{name}] compile+first {time.time()-t0:.1f}s", flush=True)
    total_rays = float(rays)
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        img, rays = jax.block_until_ready(batch(view, jnp.uint32(7 + rep)))
        best = min(best, time.perf_counter() - t0)
    import numpy as np

    mrays = total_rays / best / 1e6
    print(f"[{name}] {mrays:.2f} Mrays/s  {best/n_passes*1e3:.1f} ms/pass  "
          f"mean={float(np.asarray(img).mean()):.4f}", flush=True)
    return mrays


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fermat_tpu.bsdf.composite import scene_lobes
    from fermat_tpu.core.camera import Camera
    from fermat_tpu.integrators.pt import PTOptions
    from fermat_tpu.scene.procedural import big_room, cornell_box, cornell_camera
    from fermat_tpu.scene.view import SceneView

    scene = cornell_box(glossy_boxes=True)
    view = SceneView.build(scene, cornell_camera())
    lobes = scene_lobes(scene.materials)
    m = bench("masked-512", view,
              PTOptions(max_path_length=6, lobes=lobes), 512, 512, 16)
    q = bench("queued-512", view,
              PTOptions(max_path_length=6, lobes=lobes, queue_compaction=True),
              512, 512, 16)
    print(f"[AB] queued/masked throughput ratio: {q/m:.3f}", flush=True)

    room = big_room(n_boxes=8300)
    cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
    rv = SceneView.build(room, cam)
    print(f"[bigroom] tris={rv.mesh.n_triangles} "
          f"clusters={rv.clusters.n_clusters}", flush=True)
    bench("bigroom-cluster-1600x896", rv,
          PTOptions(max_path_length=6, lobes=scene_lobes(room.materials),
                    tracer="cluster"),
          1600, 896, 2)


if __name__ == "__main__":
    main()
