"""Round-2 TPU benchmarks: standard 512^2 CornellBox pass + 100k-tri room.

Same-process measurements (tunnel timings are only comparable within one
process). Prints one line per benchmark.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scene(name, scene, cam, res_x, res_y, n_passes, opts_kw, tracer="auto"):
    import jax
    import jax.numpy as jnp

    from fermat_tpu.bsdf.composite import scene_lobes
    from fermat_tpu.integrators.pt import PTOptions, render_pass
    from fermat_tpu.scene.view import SceneView

    opts = PTOptions(lobes=scene_lobes(scene.materials), tracer=tracer, **opts_kw)
    view = SceneView.build(scene, cam)
    print(f"[{name}] tris={view.mesh.n_triangles} "
          f"clusters={view.clusters.n_clusters}", flush=True)

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
    for _ in range(3):
        t0 = time.perf_counter()
        img, rays = jax.block_until_ready(batch(view, jnp.uint32(7)))
        best = min(best, time.perf_counter() - t0)
    mrays = total_rays / best / 1e6
    ms_pass = best / n_passes * 1e3
    import numpy as np

    img_np = np.asarray(img)
    print(f"[{name}] {mrays:.2f} Mrays/s  {ms_pass:.1f} ms/pass  "
          f"rays/pass={total_rays/n_passes:.0f}  img_mean={img_np.mean():.4f} "
          f"finite={np.isfinite(img_np).all()}", flush=True)
    return mrays


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fermat_tpu.scene.procedural import big_room, cornell_box, cornell_camera
    from fermat_tpu.core.camera import Camera

    scene = cornell_box(glossy_boxes=True)
    bench_scene("cornell512", scene, cornell_camera(), 512, 512, 16,
                dict(max_path_length=6))

    room = big_room(n_boxes=8300)
    cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
    bench_scene("bigroom100k", room, cam, 1600, 896, 2,
                dict(max_path_length=6), tracer="cluster")


if __name__ == "__main__":
    main()
