"""RMSE-curve shape regression (VERDICT r3 #6, downscaled config).

The committed CONVERGENCE.md artifact is produced by
tools/gen_convergence.py on hardware; this test pins the same measurement
protocol on a CPU-sized bathroom2 stand-in: progressive accumulation must
converge to its own golden with tone-mapped RMSE decreasing at the Monte
Carlo rate (~1/sqrt(spp): halving per 4x spp within loose bounds).
Reference analog: the progressive accumulation loop of src/main.cu:171-204.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy


def test_rmse_curve_shape_bathroom_downscaled():
    from fermat_tpu.bsdf.composite import scene_lobes
    from fermat_tpu.integrators.pt import PTOptions, render_pass
    from fermat_tpu.scene.procedural import bathroom_standin
    from fermat_tpu.scene.view import SceneView

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from gen_convergence import rmse

    mesh, cam, tdir = bathroom_standin(n_boxes=60)
    view = SceneView.build(mesh, cam, texture_dir=tdir)
    opts = PTOptions(max_path_length=4, lobes=scene_lobes(mesh.materials))
    res = 48
    n_spp = 32

    fn = jax.jit(lambda inst: render_pass(
        view, opts, res, res, inst).composited.stack())
    acc = np.zeros((res * res, 3), np.float64)
    cps = {}
    for i in range(n_spp):
        acc += np.asarray(fn(jnp.uint32(i)), np.float64)
        if (i + 1) & i == 0:  # power of two
            cps[i + 1] = (acc / (i + 1)).copy()

    golden = cps[n_spp]
    errs = [rmse(cps[s], golden) for s in (1, 2, 4, 8)]
    # monotone decreasing
    assert all(a > b for a, b in zip(errs, errs[1:])), errs
    # MC rate: per 4x spp the RMSE-vs-golden ratio should be near 0.5
    # (loose: golden correlation inflates the tail, noise the head)
    r = errs[2] / errs[0]
    assert 0.25 < r < 0.75, (errs, r)
    # and the 8-spp image is already close-ish to the golden (sanity that
    # the scene is actually converging, not oscillating)
    assert errs[-1] < 0.6 * errs[0], errs
