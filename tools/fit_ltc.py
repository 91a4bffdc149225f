"""Fit the LTC (linearly transformed cosine) M-matrix table for GGX-Smith.

Reference analog: cugar/bsdf/ltc.h + the precomputed `ltc_ggx` table the
renderer loads at init (renderer.cu:669-679). The reference ships the table
as a 12 KLoC C array; here it is FIT from scratch against our own GGX
implementation (Heitz et al. 2016 "Real-Time Polygonal-Light Shading with
Linearly Transformed Cosines" — the method, not the data) and stored as
fermat_tpu/bsdf/ltc_ggx.npz (~20 KB).

Parameterization (the standard 3-parameter isotropic form):
    M = [[m00, 0, m02], [0, m11, 0], [m20, 0, 1]]
fit per (roughness, cos_theta) cell by Nelder-Mead on the L2 error between
the normalized GGX slice and the LTC density over the hemisphere, sweeping
cos DOWN per roughness row with warm starts.

Run: python tools/fit_ltc.py   (writes fermat_tpu/bsdf/ltc_ggx.npz)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = 32  # table resolution (matches ltc_ggx::size in the reference)
NQ = 32  # quadrature points per hemisphere axis


def _hemisphere_grid(nq=NQ):
    c = (np.arange(nq) + 0.5) / nq  # cos_theta in (0,1)
    ph = (np.arange(2 * nq) + 0.5) / (2 * nq) * 2.0 * np.pi
    cc, pp = np.meshgrid(c, ph, indexing="ij")
    s = np.sqrt(1.0 - cc * cc)
    dirs = np.stack([s * np.cos(pp), s * np.sin(pp), cc], -1).reshape(-1, 3)
    dw = (1.0 / nq) * (2.0 * np.pi / (2 * nq))  # d(cos) x d(phi)
    return dirs, dw


def _ggx_slice(alpha: float, wi: np.ndarray, wo: np.ndarray) -> np.ndarray:
    """Cosine-weighted GGX-Smith reflection (f * cos_o), unnormalized."""
    h = wi + wo
    hn = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    a2 = alpha * alpha
    dd = hn[:, 2] ** 2 * (a2 - 1.0) + 1.0
    D = a2 / np.maximum(np.pi * dd * dd, 1e-20)

    def lam(c):
        c = np.clip(np.abs(c), 1e-6, 1.0)
        s2 = np.maximum(1.0 - c * c, 0.0)
        return 0.5 * (np.sqrt(1.0 + a2 * s2 / (c * c)) - 1.0)

    G = 1.0 / (1.0 + lam(wi[2]) + lam(wo[:, 2]))
    f = D * G / np.maximum(4.0 * wi[2] * wo[:, 2], 1e-12)
    return f * np.maximum(wo[:, 2], 0.0)


def _ltc_density(params: np.ndarray, wo: np.ndarray) -> np.ndarray:
    """LTC density D(w) = D_cos(Minv w) |det Minv| / ||Minv w||^3."""
    m00, m11, m02, m20 = params
    minv = np.linalg.inv(np.array(
        [[m00, 0.0, m02], [0.0, m11, 0.0], [m20, 0.0, 1.0]]))
    lo = wo @ minv.T
    ln = np.maximum(np.linalg.norm(lo, axis=-1), 1e-12)
    jac = abs(np.linalg.det(minv)) / ln**3
    cosl = np.maximum(lo[:, 2] / ln, 0.0)
    return (cosl / np.pi) * jac


def fit_cell(alpha, cos_t, dirs, dw, x0):
    from scipy.optimize import minimize

    wi = np.array([np.sqrt(max(1.0 - cos_t * cos_t, 0.0)), 0.0, cos_t])
    target = _ggx_slice(alpha, wi, dirs)
    norm = target.sum() * dw
    if norm <= 1e-9:
        return x0, 0.0
    target = target / norm

    def err(p):
        if p[0] <= 1e-4 or p[1] <= 1e-4:
            return 1e9
        d = _ltc_density(p, dirs)
        e = d - target
        return float((e * e).sum() * dw)

    r = minimize(err, x0, method="Nelder-Mead",
                 options=dict(maxiter=400, xatol=1e-5, fatol=1e-9))
    return r.x, norm


def main():
    dirs, dw = _hemisphere_grid()
    tab = np.zeros((RES, RES, 4), np.float64)  # m00 m11 m02 m20
    mag = np.zeros((RES, RES), np.float64)  # directional albedo (ltc_A)
    t0 = time.time()
    for ri in range(RES):
        rough = (ri + 0.5) / RES
        alpha = max(rough * rough, 1e-4)
        # cos from 1 down to 0, warm-starting each cell from the previous
        x0 = np.array([alpha, alpha, 0.0, 0.0])
        for ci in range(RES - 1, -1, -1):
            cos_t = (ci + 0.5) / RES
            x, norm = fit_cell(alpha, cos_t, dirs, dw, x0)
            tab[ri, ci] = x
            mag[ri, ci] = norm
            x0 = x.copy()
        print(f"row {ri+1}/{RES} rough={rough:.3f} ({time.time()-t0:.0f}s)",
              flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "fermat_tpu", "bsdf", "ltc_ggx.npz")
    np.savez_compressed(out, table=tab.astype(np.float32),
                        magnitude=mag.astype(np.float32), res=RES)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
