"""Secondary bench stages (bigroom + bathroom2 stand-in), fault-isolated.

Run by bench.py as a SUBPROCESS: a Mosaic kernel fault poisons the TPU
client for its whole process, so the large-scene tracers must not share
a process with the primary metric. Prints one JSON line on stdout.

Each tracer attempt ALSO runs in its own grandchild process (--one):
if the binned tracer faults, the cluster fallback still gets a live
client.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(scene: str, tracer: str) -> dict:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fermat_tpu.bsdf.composite import scene_lobes
    from fermat_tpu.integrators.pt import PTOptions, render_pass
    from fermat_tpu.scene.view import SceneView

    if scene == "bigroom":
        from fermat_tpu.core.camera import Camera
        from fermat_tpu.scene.procedural import big_room

        mesh = big_room(n_boxes=8300)
        cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
        view = SceneView.build(mesh, cam)
    else:
        from fermat_tpu.scene.procedural import bathroom_standin

        mesh, cam, tdir = bathroom_standin(n_boxes=8300)
        view = SceneView.build(mesh, cam, texture_dir=tdir)

    opts = PTOptions(max_path_length=6, lobes=scene_lobes(mesh.materials),
                     tracer=tracer)
    # primary: the narrowing-wavefront driver (round 4) — live lanes
    # compact into power-of-2 width buckets between jitted one-bounce
    # segments; image verified bit-identical to the monolithic pass on
    # hardware (bathroom 8.03 -> 4.25 s/pass)
    try:
        from fermat_tpu.integrators.pt import NarrowPass

        drv = NarrowPass(view, opts, 1600, 896)
        out = drv(0)  # warm-up pass (compiles the per-width segments)
        jax.block_until_ready(out.composited.x)
        out = drv(1)  # second warm-up (any remaining width buckets)
        jax.block_until_ready(out.composited.x)
        t0 = time.perf_counter()
        out = drv(2)
        jax.block_until_ready(out.composited.x)
        dt = time.perf_counter() - t0
        return {"mrays": float(out.rays) / dt / 1e6, "spp_s": 1.0 / dt,
                "tracer": tracer, "path": "narrow"}
    except Exception as e:  # noqa: BLE001 — monolithic fallback below
        print(f"narrow driver failed ({e}); monolithic fallback",
              file=sys.stderr, flush=True)
    # fallback: ONE jitted whole-pass program (eager render_pass pays
    # per-op dispatch through the axon tunnel — measured 2-3x inflation)
    fn = jax.jit(lambda inst: render_pass(view, opts, 1600, 896, inst))
    out = fn(jnp.uint32(0))
    jax.block_until_ready(out.composited.x)
    t0 = time.perf_counter()
    out = fn(jnp.uint32(1))
    jax.block_until_ready(out.composited.x)
    dt = time.perf_counter() - t0
    return {"mrays": float(out.rays) / dt / 1e6, "spp_s": 1.0 / dt,
            "tracer": tracer, "path": "mono"}


def run_integrator(which: str) -> dict:
    """Non-PT integrators on the hardware record (VERDICT r4 #4): a BPT
    pass on the water-caustic stand-in (the SDS transport BPT exists
    for, renderers/bpt_impl.h:196-260) and MLT chain-mutation throughput
    (mlt.cu's chain loop). One warm pass, then one timed pass."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fermat_tpu.bsdf.composite import scene_lobes
    from fermat_tpu.core.camera import Camera
    from fermat_tpu.scene.procedural import caustic_standin
    from fermat_tpu.scene.view import SceneView

    mesh, cam = caustic_standin()
    view = SceneView.build(mesh, cam)
    res = 512
    if which == "bpt":
        from fermat_tpu.integrators.bpt import BPTOptions, render_pass_fb

        opts = BPTOptions(max_path_length=6,
                          lobes=scene_lobes(mesh.materials))
        fn = jax.jit(lambda inst: render_pass_fb(
            view, opts, res, res, inst, 0))
        out = fn(jnp.uint32(0))
        jax.block_until_ready(out.composited.x)
        best = 1e30
        for rep in (1, 2):
            t0 = time.perf_counter()
            out = fn(jnp.uint32(rep))
            jax.block_until_ready(out.composited.x)
            best = min(best, time.perf_counter() - t0)
        return {"bpt_caustic512_spp_s": round(1.0 / best, 3),
                "bpt_caustic512_mrays": round(float(out.rays) / best / 1e6,
                                              3)}
    from fermat_tpu.integrators import mlt as mlt_mod

    opts = mlt_mod.MLTOptions(lobes=scene_lobes(mesh.materials))
    n_chains = res * res  # one chain per pixel (mlt.h n_chains default)
    fn = jax.jit(lambda inst: mlt_mod.render_pass(
        view, opts, res, res, inst, 0))
    img, _rays = fn(jnp.uint32(0))
    jax.block_until_ready(img)
    best = 1e30
    for rep in (1, 2):
        t0 = time.perf_counter()
        img, _rays = fn(jnp.uint32(rep))
        jax.block_until_ready(img)
        best = min(best, time.perf_counter() - t0)
    muts = n_chains * opts.steps_per_pass
    return {"mlt_caustic512_Mmut_s": round(muts / best / 1e6, 3)}


def run_train_textured() -> dict:
    """Differentiable path on a TEXTURED large-scene workload (VERDICT r4
    #3: 'no committed artifact trains on a textured/large scene at all').
    bathroom2 stand-in at 800x448 through the XLA pipeline's reverse-mode
    AD (the frontier tracer + texture modulation in the loss graph),
    gradient w.r.t. material diffuse albedo. Also records the forward
    time so ROOFLINE can state the fwd:bwd ratio."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fermat_tpu.bsdf.composite import scene_lobes
    from fermat_tpu.integrators.pt import PTOptions, render_pass
    from fermat_tpu.scene.procedural import bathroom_standin
    from fermat_tpu.scene.view import SceneView

    mesh, cam, tdir = bathroom_standin(n_boxes=8300)
    view = SceneView.build(mesh, cam, texture_dir=tdir)
    rx, ry = 800, 448
    opts = PTOptions(max_path_length=4, lobes=scene_lobes(mesh.materials),
                     tracer="frontier")
    target = jnp.zeros((rx * ry, 3), jnp.float32)
    diffuse0 = view.mesh.materials.diffuse

    def loss_fn(diffuse, inst):
        mats = view.mesh.materials._replace(diffuse=diffuse)
        v = view._replace(mesh=view.mesh._replace(materials=mats))
        out = render_pass(v, opts, rx, ry, inst)
        img = out.composited.stack()
        return jnp.mean((img - target) ** 2), out.rays

    fwd_fn = jax.jit(loss_fn)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (lv, rv), _g = grad_fn(diffuse0, jnp.uint32(0))
    jax.block_until_ready(lv)
    l2, _r2 = fwd_fn(diffuse0, jnp.uint32(0))
    jax.block_until_ready(l2)
    tf = 1e30
    tg = 1e30
    for rep in (1, 2):
        t0 = time.perf_counter()
        l2, _r2 = fwd_fn(diffuse0, jnp.uint32(rep))
        jax.block_until_ready(l2)
        tf = min(tf, time.perf_counter() - t0)
        t0 = time.perf_counter()
        (lv, rv), _g = grad_fn(diffuse0, jnp.uint32(rep))
        jax.block_until_ready(lv)
        tg = min(tg, time.perf_counter() - t0)
    return {
        "train_mrays_textured": round(float(rv) / tg / 1e6, 3),
        "train_textured_fwd_ms": round(tf * 1e3, 1),
        "train_textured_fwdbwd_ms": round(tg * 1e3, 1),
    }


def run_bigscene() -> dict:
    """600k-triangle trace stage (VERDICT r4 #2: the lifted Cp ceiling on
    the committed BENCH record, not just ROOFLINE). Mirrors
    tools/tpu_600k_check.py: big_room(n_boxes=50000) = 600,036 tris,
    6728 clusters — 1.6x past the round-4 fence — 1.43M-ray closest
    sweeps, camera-coherent + incoherent."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from fermat_tpu.accel.cluster import build_clusters
    from fermat_tpu.core.camera import Camera, generate_camera_rays
    from fermat_tpu.core.math import Vec3, normalize
    from fermat_tpu.ops.pallas_frontier_trace import trace_closest_frontier
    from fermat_tpu.scene.procedural import big_room

    room = big_room(n_boxes=50_000).device_view()
    cl = build_clusters(room)
    W, H = 1600, 896
    n = W * H
    cam = Camera.create(eye=(0.0, 3.0, 10.0), aim=(0.0, 1.5, 0.0))
    tmin, tmax = jnp.float32(1e-4), jnp.float32(3e38)
    half = jnp.full((n,), 0.5, jnp.float32)
    oc, dc, _ = generate_camera_rays(cam, W, H, half, half)
    r = np.random.default_rng(3)
    o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
    o_np[:, 1] += 2.0
    d_np = r.standard_normal((n, 3)).astype(np.float32)
    oi = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    di = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))

    def t(fn):
        jax.block_until_ready(fn())
        best = 1e30
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(fn())
            best = min(best, time.time() - t0)
        return best

    cc = t(lambda: trace_closest_frontier(cl, oc, dc, tmin, tmax).t)
    ci = t(lambda: trace_closest_frontier(cl, oi, di, tmin, tmax).t)
    return {
        "bigscene600k_tris": int(room.n_triangles),
        "bigscene600k_camera_mrays": round(n / cc / 1e6, 2),
        "bigscene600k_incoh_mrays": round(n / ci / 1e6, 2),
    }


def attempt_integrator(which: str, budget_s: float) -> dict | None:
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--integrator",
             which],
            capture_output=True, text=True, timeout=budget_s,
        )
        if r.returncode == 0 and r.stdout.strip():
            return json.loads(r.stdout.strip().splitlines()[-1])
        print(f"{which} rc={r.returncode}: "
              f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ''}",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{which} failed: {e}", file=sys.stderr, flush=True)
    return None


def attempt(scene: str, budget_s: float) -> dict | None:
    """budget_s bounds the WHOLE attempt (both tracer tries share it)."""
    deadline = time.time() + budget_s
    for tracer in ("frontier", "cluster"):
        left = deadline - time.time()
        if left < 30.0:
            print(f"{scene}[{tracer}] skipped: budget exhausted",
                  file=sys.stderr, flush=True)
            break
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", scene,
                 tracer],
                capture_output=True, text=True, timeout=left,
            )
            if r.returncode == 0 and r.stdout.strip():
                return json.loads(r.stdout.strip().splitlines()[-1])
            print(f"{scene}[{tracer}] rc={r.returncode}: "
                  f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ''}",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{scene}[{tracer}] failed: {e}", file=sys.stderr,
                  flush=True)
    return None


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        print(json.dumps(run_one(sys.argv[2], sys.argv[3])), flush=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--integrator":
        print(json.dumps(run_integrator(sys.argv[2])), flush=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--train-textured":
        print(json.dumps(run_train_textured()), flush=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--bigscene":
        print(json.dumps(run_bigscene()), flush=True)
        return
    # budget: stay under bench.py's 1500 s subprocess timeout with margin,
    # and print the partial JSON line after EVERY completed stage so a
    # parent-side timeout still salvages finished results (bench.py parses
    # the last line of whatever stdout it got).
    t0 = time.time()
    deadline = t0 + 1350.0
    out = {}
    big = attempt("bigroom", min(500.0, deadline - time.time()))
    if big is not None:
        out["bigroom_100k_1600x896_mrays"] = round(big["mrays"], 3)
        out["bigroom_tracer"] = big["tracer"]
        out["bigroom_path"] = big.get("path", "mono")
        print(json.dumps(out), flush=True)
    remaining = deadline - time.time()
    if remaining > 120.0:
        bath = attempt("bathroom", min(500.0, remaining))
        if bath is not None:
            out["bathroom2_standin_1600x896_spp_s"] = round(bath["spp_s"], 4)
            out["bathroom2_standin_mrays"] = round(bath["mrays"], 3)
            out["bathroom2_tracer"] = bath["tracer"]
            out["bathroom2_path"] = bath.get("path", "mono")
            print(json.dumps(out), flush=True)
    # non-PT integrators on the hardware record (VERDICT r4 #4)
    for which in ("bpt", "mlt"):
        remaining = deadline - time.time()
        if remaining < 120.0:
            print(f"{which} skipped: budget exhausted", file=sys.stderr,
                  flush=True)
            break
        r = attempt_integrator(which, remaining)
        if r is not None:
            out.update(r)
            print(json.dumps(out), flush=True)
    # textured differentiable path (VERDICT r4 #3)
    remaining = deadline - time.time()
    if remaining > 150.0:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--train-textured"],
                capture_output=True, text=True, timeout=remaining,
            )
            if r.returncode == 0 and r.stdout.strip():
                out.update(json.loads(r.stdout.strip().splitlines()[-1]))
                print(json.dumps(out), flush=True)
            else:
                print(f"train-textured rc={r.returncode}",
                      file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"train-textured failed: {e}", file=sys.stderr,
                  flush=True)
    else:
        print("train-textured skipped: budget exhausted", file=sys.stderr,
              flush=True)
    # 600k-triangle scene past the old round-4 fence (VERDICT r4 #2)
    remaining = deadline - time.time()
    if remaining > 240.0:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--bigscene"],
                capture_output=True, text=True, timeout=remaining,
            )
            if r.returncode == 0 and r.stdout.strip():
                out.update(json.loads(r.stdout.strip().splitlines()[-1]))
                print(json.dumps(out), flush=True)
            else:
                print(f"bigscene rc={r.returncode}",
                      file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bigscene failed: {e}", file=sys.stderr, flush=True)
    else:
        print("bigscene skipped: budget exhausted", file=sys.stderr,
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
