"""Benchmark: wavefront PT throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: Mrays/s/chip (closest + shadow rays actually traced, counted inside
the pass — masked dead lanes are NOT counted), CornellBox full-BSDF PT at
512x512, 6 bounces, NEE+MIS. The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against the round-1 recorded value
in BENCH_BASELINE.json once it exists (1.0 on first run).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # heartbeat BEFORE the first device touch: the axon connect can wedge
    # indefinitely (see memory notes) and this line tells a log reader the
    # hang is the backend grant, not scene build or compile
    print("bench: connecting to backend...", file=sys.stderr, flush=True)
    _devs = jax.devices()
    print(f"bench: backend up ({_devs[0].platform})", file=sys.stderr,
          flush=True)
    import jax.numpy as jnp

    from fermat_tpu.integrators.pt import PTOptions, render_pass
    from fermat_tpu.scene.procedural import cornell_box, cornell_camera
    from fermat_tpu.scene.view import SceneView

    from fermat_tpu.bsdf.composite import scene_lobes

    res = 512
    scene = cornell_box(glossy_boxes=True)
    base_opts = PTOptions(max_path_length=6, lobes=scene_lobes(scene.materials))
    view = SceneView.build(scene, cornell_camera())

    n_passes = 16
    t_start = time.perf_counter()

    # primary path: the whole-pass fused Pallas megakernel (round 3) with
    # a fallback to the round-2 XLA pipeline if the kernel fails on the
    # real chip (interpret-mode parity is tested; hardware is the canary)
    mode = "mega"
    try:
        from fermat_tpu.ops.pallas_pt_mega import (
            build_mega_tables, render_pass_mega,
        )

        mopts = base_opts._replace(tracer="mega")
        tb = build_mega_tables(view, res, res, mopts.ray_eps)

        @jax.jit
        def batch(view_unused, instance0):
            def body(i, carry):
                acc, rays = carry
                out = render_pass_mega(view, mopts, res, res, instance0 + i,
                                       tables=tb)
                return (acc + out.composited.x, rays + out.rays)

            return jax.lax.fori_loop(
                0, n_passes, body,
                (jnp.zeros(res * res, jnp.float32),
                 jnp.zeros((), jnp.float32)),
            )

        jax.block_until_ready(batch(view, jnp.uint32(0)))
    except Exception as e:  # noqa: BLE001
        print(f"bench: mega kernel failed ({e}); falling back to XLA "
              "pipeline", file=sys.stderr, flush=True)
        mode = "xla"
        opts = base_opts

        @jax.jit
        def batch(view, instance0):
            def body(i, carry):
                acc, rays = carry
                out = render_pass(view, opts, res, res, instance0 + i)
                return (acc + out.composited.x, rays + out.rays)

            return jax.lax.fori_loop(
                0, n_passes, body,
                (jnp.zeros(res * res, jnp.float32),
                 jnp.zeros((), jnp.float32)),
            )

    img, rays = jax.block_until_ready(batch(view, jnp.uint32(0)))  # compile
    total_rays = float(rays)
    # best of 3 batches: same-process timings are stable to ~0.3%; this
    # suppresses residual tunnel/host jitter
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        img, rays = batch(view, jnp.uint32(n_passes * (rep + 1)))
        jax.block_until_ready(img)
        best = min(best, time.perf_counter() - t0)

    mrays = total_rays / best / 1e6

    # differentiable train-step stage (VERDICT r3 #4: fwd+bwd throughput
    # as a first-class number): cornell512, MSE loss vs a dark target,
    # gradient w.r.t. material diffuse albedo, same 6-bounce config as the
    # primary. Reported as train_mrays = forward rays traced / wall time
    # of the full fwd+bwd step (detached-AD backward re-traces nothing,
    # so forward rays are the honest ray denominator).
    train_mrays = None
    train_path = None
    try:
        diffuse0 = view.mesh.materials.diffuse
        target = jnp.zeros((res * res, 3), jnp.float32)

        from fermat_tpu.ops.pallas_pt_mega import (
            build_mega_tables, mega_grad_eligible, render_grad_diffuse_mega,
            render_pass_mega,
        )

        if mega_grad_eligible(view, base_opts):
            # round-5 fast path: forward mega pass + replay-gradient
            # kernel (exact for the detached estimator; parity vs
            # jax.grad pinned by tests/test_mega_grad.py and
            # tools/tpu_mega_grad_check.py on hardware)
            gtb = build_mega_tables(view, res, res, base_opts.ray_eps)

            @jax.jit
            def train_fn(inst):
                out = render_pass_mega(view, base_opts, res, res, inst,
                                       tables=gtb)
                img = out.composited.stack()
                loss = jnp.mean((img - target) ** 2)
                adjoint = 2.0 * (img - target) / (img.shape[0] * 3)
                grad = render_grad_diffuse_mega(
                    view, base_opts, res, res, inst, adjoint, tables=gtb)
                return loss, out.rays, grad

            loss_v, rays_v, _g = train_fn(jnp.uint32(0))
            jax.block_until_ready(loss_v)
            best_t = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                loss_v, rays_v, _g = train_fn(jnp.uint32(rep + 1))
                jax.block_until_ready(loss_v)
                best_t = min(best_t, time.perf_counter() - t0)
            train_mrays = float(rays_v) / best_t / 1e6
            train_path = "replay"
        else:
            def loss_fn(diffuse, inst):
                mats = view.mesh.materials._replace(diffuse=diffuse)
                v = view._replace(mesh=view.mesh._replace(materials=mats))
                out = render_pass(v, base_opts, res, res, inst)
                img = out.composited.stack()
                return jnp.mean((img - target) ** 2), out.rays

            grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
            (loss_v, rays_v), _g = grad_fn(diffuse0, jnp.uint32(0))
            jax.block_until_ready(loss_v)
            best_t = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                (loss_v, rays_v), _g = grad_fn(diffuse0, jnp.uint32(rep + 1))
                jax.block_until_ready(loss_v)
                best_t = min(best_t, time.perf_counter() - t0)
            train_mrays = float(rays_v) / best_t / 1e6
            train_path = "ad"
    except Exception as e:  # noqa: BLE001 — keep the primary alive
        print(f"train-step bench skipped: {e}", file=sys.stderr, flush=True)

    # secondary metrics (bigroom + bathroom2 stand-in at 1600x896) run in
    # a SUBPROCESS: a Mosaic kernel fault poisons the TPU client for its
    # whole process, so the large-scene tracers must never share a
    # process with the primary metric above (learned the hard way —
    # tpu_r3_check round 1 lost every stage after a binned-tracer fault).
    secondaries = {}
    if time.perf_counter() - t_start < 600.0:
        import subprocess

        def last_json(text):
            for ln in reversed((text or "").strip().splitlines()):
                try:
                    return json.loads(ln)
                except Exception:  # noqa: BLE001
                    continue
            return {}

        try:
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "bench_secondaries.py")],
                capture_output=True, text=True, timeout=1500.0,
            )
            if r.stderr.strip():
                print(r.stderr.strip(), file=sys.stderr, flush=True)
            if r.returncode == 0:
                secondaries = last_json(r.stdout)
        except subprocess.TimeoutExpired as e:
            # bench_secondaries prints a partial JSON line after every
            # completed stage — salvage what finished before the kill
            secondaries = last_json(
                e.output if isinstance(e.output, str)
                else (e.output or b"").decode("utf-8", "replace"))
            print("secondary benches timed out; salvaged "
                  f"{sorted(secondaries)}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — keep the primary alive
            print(f"secondary benches skipped: {e}", file=sys.stderr)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    vs = 1.0
    if os.path.exists(base_path):
        try:
            with open(base_path) as f:
                vs = mrays / float(json.load(f)["value"])
        except Exception:
            vs = 1.0

    line = {
        "metric": "Mrays/s/chip (PT trace+shade, CornellBox 512x512)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
    }
    line["primary_path"] = mode
    if train_mrays is not None:
        line["train_mrays"] = round(train_mrays, 2)
        line["train_path"] = train_path
    line.update(secondaries)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
