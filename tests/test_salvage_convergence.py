"""tools/salvage_convergence.py: rebuild a convergence table from a
budget-killed gen_convergence run's progressive checkpoint dump.

The salvage path is crash insurance for the committed CONVERGENCE.md
artifact (reference analog: the progressive accumulation loop in
/root/reference/src/main.cu:171-204 writes intermediates per pass); it
must reproduce gen_convergence's exact RMSE table semantics from the
on-disk checkpoints alone.
"""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_salvage_rebuilds_table_and_golden(tmp_path):
    rng = np.random.default_rng(7)
    res_x, res_y = 8, 4
    n = res_x * res_y
    truth = rng.random((n, 3))
    # synthetic progressive checkpoints: mean of spp noisy passes, so the
    # salvaged table must show decreasing RMSE toward the deepest one
    acc = np.zeros((n, 3))
    cks = {}
    for i in range(16):
        acc += truth + rng.normal(0, 0.3, (n, 3))
        if (i + 1) in (1, 2, 4, 8, 16):
            cks[str(i + 1)] = (acc / (i + 1)).astype(np.float32)
    npz = tmp_path / "ck.npz"
    np.savez_compressed(npz, **cks, wall=np.float64(12.5))

    out_md = tmp_path / "CONV.md"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "salvage_convergence.py"),
         str(npz), "--scene", "synth", "--res", f"{res_x}x{res_y}",
         "--out", str(out_md)],
        capture_output=True, text=True, timeout=120, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    text = out_md.read_text()
    # golden depth labeled, both RMSE columns present, golden row excluded
    assert "16-spp golden" in text and "linear RMSE" in text
    rows = [ln for ln in text.splitlines()
            if ln.startswith("| ") and not ln.startswith("| spp")
            and "---" not in ln]
    assert [int(ln.split("|")[1]) for ln in rows] == [1, 2, 4, 8]
    # tone-mapped + linear RMSE columns decrease monotonically here
    # (strong noise, tiny image: golden correlation can't flatten it)
    tm = [float(ln.split("|")[2]) for ln in rows]
    lin = [float(ln.split("|")[4]) for ln in rows]
    assert all(a > b for a, b in zip(tm, tm[1:])), tm
    assert all(a > b for a, b in zip(lin, lin[1:])), lin
    # golden image artifact written next to the out file, reshaped
    g = np.load(tmp_path / "tests" / "golden"
                / f"synth_{res_x}x{res_y}_16spp.npz")["image"]
    assert g.shape == (res_y, res_x, 3)
    np.testing.assert_allclose(
        g.reshape(n, 3), cks["16"], rtol=1e-6, atol=1e-6)
