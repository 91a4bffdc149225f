"""Rebuild a CONVERGENCE.md table from a gen_convergence checkpoint dump.

If a gen_convergence.py run is killed before finishing (wall budget), its
progressive /tmp/conv_ckpt_<scene>_<res>.npz still holds every power-of-2
checkpoint that landed. This tool treats the DEEPEST checkpoint as the
golden and emits the same table gen_convergence would have, labeled with
the actual golden depth.

Usage: python tools/salvage_convergence.py /tmp/conv_ckpt_bathroom_1600x896.npz
           [--scene bathroom] [--res 1600x896] [--out CONVERGENCE.md]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_convergence import rmse, rmse_linear  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--scene", default="bathroom")
    ap.add_argument("--res", default="1600x896")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    d = np.load(args.npz)
    spps = sorted(int(k) for k in d.files if k != "wall")
    golden_spp = spps[-1]
    golden = d[str(golden_spp)].astype(np.float64)
    wall = float(d["wall"]) if "wall" in d.files else float("nan")

    lines = [
        "",
        f"## {args.scene} {args.res}, {golden_spp}-spp golden "
        f"({wall:.0f}s wall, {golden_spp/wall:.4f} spp/s, salvaged "
        "from a budget-killed run's checkpoint dump)",
        "",
        "| spp | tone-mapped RMSE | ratio | linear RMSE | ratio |",
        "|---|---|---|---|---|",
    ]
    prev = prev_l = None
    for spp in spps[:-1]:
        e = rmse(d[str(spp)].astype(np.float64), golden)
        el = rmse_linear(d[str(spp)].astype(np.float64), golden)
        ratio = "" if prev is None else f"{e/prev:.3f}"
        ratio_l = "" if prev_l is None else f"{el/prev_l:.3f}"
        lines.append(f"| {spp} | {e:.5f} | {ratio} | {el:.5f} | {ratio_l} |")
        print(lines[-1], flush=True)
        prev, prev_l = e, el
    out = args.out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CONVERGENCE.md")
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    res_x, res_y = (int(v) for v in args.res.split("x"))
    gdir = os.path.join(os.path.dirname(out), "tests", "golden")
    os.makedirs(gdir, exist_ok=True)
    np.savez_compressed(
        os.path.join(gdir, f"{args.scene}_{args.res}_{golden_spp}spp.npz"),
        image=golden.astype(np.float32).reshape(res_y, res_x, 3))
    print(f"salvaged golden at {golden_spp} spp -> {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
