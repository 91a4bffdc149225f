"""Attribute device time for the 512^2 bench pass to HLO fusions and ops.

Round-2 judge item #1: "Capture a profiler trace of the 512^2 bench, commit
the op breakdown ... until the ~2.2 ms/bounce mystery fusions are explained".

Compiles ONE render_pass fresh (compilation cache disabled so fusion names
match), grabs the optimized HLO via AOT `compile().as_text()`, captures a
chrome trace, and joins the two: for each top-cost trace op (fusion.NNN),
prints the fusion's op-type histogram, est. bytes touched, and the distinct
python source lines its instructions carry in metadata.
Writes PERF_ATTRIB.md at the repo root.

Usage:  python tools/perf_attrib.py [--res 512] [--out PERF_ATTRIB.md]
"""
from __future__ import annotations

import argparse
import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_SHAPE_RE = re.compile(r"(f32|s32|u32|pred|bf16|f16|s8|u8)\[([\d,]*)\]")


def _nbytes(shape_str: str) -> int:
    sizes = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2, "f16": 2, "s8": 1, "u8": 1}
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * sizes[dt]
    return total


def parse_hlo(text: str):
    """fusion name -> dict(ops=Counter, src=Counter, out_bytes, param_bytes)."""
    comp_of_fusion = {}
    fusion_shape = {}
    for m in re.finditer(
        r"%?([\w.-]+)\s*=\s*(\([^)]*\)|[\w\[\],{}]+)\s+fusion\([^\n]*calls=%?([\w.-]+)", text
    ):
        comp_of_fusion[m.group(3)] = m.group(1)
        fusion_shape[m.group(1)] = m.group(2)
    comp_ops: dict = {}
    cur = None
    for line in text.splitlines():
        if line and not line[0].isspace():
            m2 = re.match(r"(?:ENTRY\s+)?%?([\w.-]+)\s*[({ ]", line)
            if m2:
                cur = m2.group(1)
                comp_ops[cur] = {
                    "ops": collections.Counter(),
                    "src": collections.Counter(),
                    "param_bytes": 0,
                }
            continue
        if cur is None:
            continue
        m3 = re.match(r"\s+%?[\w.-]+\s*=\s*(\([^)]*\)|[\w\[\],{}]+)\s+([\w-]+)\(", line)
        if m3:
            shape, op = m3.group(1), m3.group(2)
            comp_ops[cur]["ops"][op] += 1
            if op == "parameter":
                comp_ops[cur]["param_bytes"] += _nbytes(shape)
            m4 = re.search(r'op_name="([^"]+)"', line)
            src = None
            m5 = re.search(r"source_file=\"([^\"]+)\"", line)
            m6 = re.search(r"source_line=(\d+)", line)
            if m5 and m6:
                src = os.path.basename(m5.group(1)) + ":" + m6.group(1)
            tag = (m4.group(1)[:70] if m4 else "") + (" @" + src if src else "")
            if tag:
                comp_ops[cur]["src"][tag] += 1
    out = {}
    for comp, fus in comp_of_fusion.items():
        if comp in comp_ops:
            d = dict(comp_ops[comp])
            d["out_bytes"] = _nbytes(fusion_shape.get(fus, ""))
            out[fus] = d
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--out", default="PERF_ATTRIB.md")
    ap.add_argument("--bounces", type=int, default=6)
    args = ap.parse_args()

    import jax

    # NO persistent cache: we need a fresh compile so HLO text matches trace
    import jax.numpy as jnp

    from fermat_tpu.bsdf.composite import scene_lobes
    from fermat_tpu.integrators.pt import PTOptions, render_pass
    from fermat_tpu.scene.procedural import cornell_box, cornell_camera
    from fermat_tpu.scene.view import SceneView
    from fermat_tpu.utils.profiling import capture_trace, op_breakdown

    res = args.res
    scene = cornell_box(glossy_boxes=True)
    opts = PTOptions(max_path_length=args.bounces, lobes=scene_lobes(scene.materials))
    view = SceneView.build(scene, cornell_camera())

    @jax.jit
    def one_pass(view, instance):
        out = render_pass(view, opts, res, res, instance)
        return out.composited.x.sum(), out.rays

    t0 = time.time()
    lowered = one_pass.lower(view, jnp.uint32(3))
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"compiled in {time.time()-t0:.1f}s, hlo {len(hlo)/1e6:.1f} MB")
    fusions = parse_hlo(hlo)
    print(f"parsed {len(fusions)} fusions")

    trace_dir = "/tmp/fermat_trace_attrib"
    t0 = time.time()
    r = capture_trace(lambda: compiled(view, jnp.uint32(3)), trace_dir, n_runs=5)
    print(f"capture done in {time.time()-t0:.1f}s, rays/pass={float(r[1]):.0f}")

    rows = op_breakdown(trace_dir, top=45)
    lines = [
        "# PERF_ATTRIB — 512^2 CornellBox PT pass, per-op device time",
        "",
        f"Captured on `{jax.devices()[0].device_kind}` "
        f"({args.res}x{args.res}, {args.bounces} bounces, 5 runs; "
        "times are totals across runs; fusions inside the bounce fori_loop "
        "run 5x per pass).",
        "",
    ]
    total_ms = sum(ms for _, ms, _ in rows)
    for name, ms, n in rows:
        lines.append(f"## {name} — {ms:.3f} ms total (x{n})")
        info = fusions.get(name)
        if info is None:
            base = name.split("(")[0]
            info = fusions.get(base)
        if info:
            lines.append(
                f"  bytes: out={info['out_bytes']/1e6:.2f} MB params={info['param_bytes']/1e6:.2f} MB"
            )
            lines.append(
                "  ops: " + ", ".join(f"{o}x{c}" for o, c in info["ops"].most_common(14))
            )
            for src, c in info["src"].most_common(12):
                lines.append(f"  src: {src} (x{c})")
        lines.append("")
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out
    )
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out_path}")
    for name, ms, n in rows[:16]:
        print(f"{ms:9.3f} ms x{n:4d}  {name[:90]}")


if __name__ == "__main__":
    main()
