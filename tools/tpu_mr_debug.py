"""Isolate the multi-round frontier kernel's TPU fault (round 4).

Each stage runs in its OWN subprocess (a Mosaic fault poisons the TPU
client process-wide). Stages escalate: small scene single round ->
small multi-round -> big_room single -> big_room multi-round; a
mismatch/abort pins the first failing feature.

Usage: python tools/tpu_mr_debug.py            # run all stages
       python tools/tpu_mr_debug.py --one N    # run stage N in-process
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [
    ("small single (0,)", "small", (0,), 128),
    ("small cap (4,0)", "small", (4, 0), 128),
    ("small cap (1,1,0)", "small", (1, 1, 0), 128),
    ("big single (0,)", "big", (0,), 128),
    ("big cap (24,0)", "big", (24, 0), 128),
    ("big cap (16,16,0)", "big", (16, 16, 0), 128),
]


def run_stage(i: int) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from fermat_tpu.accel.cluster import build_clusters
    from fermat_tpu.core.math import Vec3, normalize
    from fermat_tpu.ops.pallas_frontier_trace import trace_closest_frontier
    from fermat_tpu.scene.procedural import random_soup

    name, scene, caps, blk = STAGES[i]
    if scene == "small":
        mesh = random_soup(20000, seed=5).device_view()
        cl = build_clusters(mesh)
        n = 131072
        spread = 12.0
    else:
        from fermat_tpu.core.camera import Camera
        from fermat_tpu.scene.procedural import big_room
        from fermat_tpu.scene.view import SceneView

        room = big_room(n_boxes=8300)
        cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
        view = SceneView.build(room, cam)
        cl = view.clusters
        n = 1600 * 896
        spread = 10.0

    r = np.random.default_rng(3)
    o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * spread
    o_np[:, 1] += 2.0
    d_np = r.standard_normal((n, 3)).astype(np.float32)
    o = Vec3(*(jnp.asarray(o_np[:, k]) for k in range(3)))
    d = normalize(Vec3(*(jnp.asarray(d_np[:, k]) for k in range(3))))
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)

    import jax as _j

    h = _j.block_until_ready(
        trace_closest_frontier(cl, o, d, tmin, tmax, block=blk, rounds=caps))
    t0 = time.perf_counter()
    h = _j.block_until_ready(
        trace_closest_frontier(cl, o, d, tmin, tmax, block=blk, rounds=caps))
    dt = time.perf_counter() - t0
    out = {"stage": name, "dt": round(dt, 3),
           "mrays": round(n / dt / 1e6, 3),
           "t_sum": float(jnp.sum(jnp.where(h.tri >= 0, h.t, 0.0))),
           "hits": int(jnp.sum(h.tri >= 0))}
    print(json.dumps(out), flush=True)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_stage(int(sys.argv[2]))
        return
    ref = {}
    for i, (name, scene, caps, blk) in enumerate(STAGES):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(i)],
                capture_output=True, text=True, timeout=900,
            )
            line = (r.stdout.strip().splitlines() or [""])[-1]
            if r.returncode == 0 and line.startswith("{"):
                o = json.loads(line)
                key = scene
                if key in ref:
                    match = (abs(o["t_sum"] - ref[key]["t_sum"])
                             <= 1e-4 * abs(ref[key]["t_sum"])
                             and o["hits"] == ref[key]["hits"])
                    o["match_vs_single"] = bool(match)
                else:
                    ref[key] = o
                print(f"[{i}] {name}: {json.dumps(o)}", flush=True)
            else:
                err = (r.stderr.strip().splitlines() or ["?"])[-1]
                print(f"[{i}] {name}: rc={r.returncode} {err}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{i}] {name}: {e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
