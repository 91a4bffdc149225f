"""Whole-pass fused Pallas PT megakernel for VMEM-resident scenes.

Reference analog: the single `shade_vertex` CUDA kernel plus OptiX traversal
(src/pathtracer_core.h:773-1254, src/rt.cpp:558-650) — but taken further the
TPU way: for scenes whose triangle set fits VMEM (<= MEGA_T_MAX tris), the
ENTIRE progressive pass — camera ray gen, per-bounce closest-hit trace,
geometry+material fetch, emissive MIS, mesh-light NEE with CDF inversion,
shadow any-hit, composite-BSDF importance sampling, Owen-Sobol QMC, Russian
roulette, AOV/G-buffer accumulation — runs as ONE pallas_call. The round-2
XLA pipeline spent ~17 ms/bounce across ~20 fusions at 512^2
(PERF_ATTRIB_r2_fused.md) with every per-lane intermediate round-tripping
HBM; here the only HBM traffic is pixel ids in and final AOVs out.

Layout: rays ride FULL (8, 128) vector registers (sublanes AND lanes), so
every shade instruction uses all 1024 VPU lanes — unlike the trace-style
(BLK, 1) column layout, which only pays off when triangles fill the lane
dim. Scene data (triangle/material/light/camera tables) is LANE-REPLICATED
in VMEM: each table row r is stored as 128 copies, so `tab[t, col, :]`
loads a (1, 128) constant row that broadcasts against (8, 128) ray tiles
with no gathers and no SMEM — per-lane table reads become the loop-carried
select of the triangle loop (trace) or a short masked loop (materials,
lights, <= 32 entries).

The per-lane E-table lookup (GGX directional albedo, Kelemen coupling —
the one 2D-gather the BSDF needs) is rebuilt per material as an EXACT
32-knot piecewise-linear function of cos_theta: E(c) = v0 + sum_j a_j *
relu(c - k_j), whose coefficients are baked host-side from the same table
bsdf/ggx.py interpolates; the kernel threads it into the composite BSDF
via the e_fn hook (bsdf/composite.py).

The BSDF/MIS/RNG math is the SAME code the XLA path runs (f_split, sample,
TiledSequence, ... are shape-generic jnp), so the megakernel is pinned to
the reference path by image parity tests rather than re-derived numerics.

Eligibility (render_pass dispatches here when opts.tracer == "mega"):
triangle count <= MEGA_T_MAX, <= 32 materials, <= 32 emissive triangles,
constant environment (no env map), no textures, no point/directional
lights, mesh NEE, no shadow masks, no queue compaction. Forward-only (the
differentiable path keeps the XLA pipeline).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fermat_tpu.bsdf.composite import (
    GLOSSY_REFL,
    BsdfParams,
    f_split,
    sample as bsdf_sample,
)
from fermat_tpu.core.camera import CameraSampler
from fermat_tpu.core.math import (
    Vec3,
    dot,
    normalize,
    orthonormal_basis,
    to_local,
    to_world,
)
from fermat_tpu.core.rng import TiledSequence
from fermat_tpu.core.sampling import (
    power_heuristic,
    square_to_uniform_triangle,
)

Array = jax.Array

MEGA_T_MAX = 128  # triangle cap (trace loop is O(T) per 1024-ray block)
MEGA_M_MAX = 32  # material cap (masked select loop)
MEGA_L_MAX = 32  # emissive-triangle cap (CDF inversion loop)
_BIG = 3.0e38
_RB = 8  # sublane rows per block -> 1024 rays/block
_E_KNOTS = 32


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Host-side table build
# ---------------------------------------------------------------------------

class MegaTables(NamedTuple):
    tri: Array  # (T, 56, 128) lane-replicated shade rows + pdf_area
    mat: Array  # (M, 56, 128) lane-replicated material rows + E-PWL coeffs
    light: Array  # (L, 24, 128) lane-replicated emissive rows + cdf
    cam: Array  # (1, 24, 128) camera/env/consts rows
    n_tris: int
    n_mats: int
    n_lights: int


def _e_pwl_coeffs(roughness: np.ndarray) -> np.ndarray:
    """(M, 33) exact PWL rebuild of ggx.glossy_reflectance at fixed r.

    E(c) = v0 + sum_{j=0}^{31} a_j * relu(c - k_j) with k_j = (j+0.5)/32
    reproduces the bilinear table lookup exactly (flat clamps at both ends).
    """
    from fermat_tpu.bsdf import ggx

    if ggx._ALBEDO_TABLE_NP is None:
        ggx._ALBEDO_TABLE_NP = ggx._build_albedo_table()
    tab = np.asarray(ggx._ALBEDO_TABLE_NP, np.float64)  # (32, 32)
    res = _E_KNOTS
    # r-interp each material's row exactly like glossy_reflectance
    r = np.clip(roughness, 0.0, 1.0) * res - 0.5
    r0 = np.clip(np.floor(r), 0, res - 1).astype(np.int64)
    r1 = np.minimum(r0 + 1, res - 1)
    fr = np.clip(r - r0, 0.0, 1.0)
    rows = tab[r0] * (1.0 - fr)[:, None] + tab[r1] * fr[:, None]  # (M, 32)
    h = 1.0 / res
    s = (rows[:, 1:] - rows[:, :-1]) / h  # (M, 31) segment slopes
    a = np.zeros((rows.shape[0], res), np.float64)
    a[:, 0] = s[:, 0]
    a[:, 1:31] = s[:, 1:] - s[:, :-1]
    a[:, 31] = -s[:, 30]
    return np.concatenate([rows[:, :1], a], axis=1).astype(np.float32)


def _replicate(rows: np.ndarray, pad_cols: int) -> np.ndarray:
    """(R, C) -> (R, pad_cols, 128) lane-replicated f32."""
    r, c = rows.shape
    out = np.zeros((r, pad_cols, 128), np.float32)
    out[:, :c, :] = rows[:, :, None]
    return out


def mega_eligible(view, opts) -> bool:
    """Static dispatch gate (see module docstring)."""
    try:
        mesh = view.mesh
        if mesh.n_triangles == 0 or mesh.n_triangles > MEGA_T_MAX:
            return False
        if view.env_map is not None or view.has_textures:
            return False
        if view.point_lights.count > 0 or view.dir_lights.count > 0:
            return False
        if getattr(view, "area_lights", None) is not None:
            return False
        if view.shadow_sets is not None:
            return False
        if mesh.materials.count > MEGA_M_MAX:
            return False
        if opts.nee != "mesh" or opts.queue_compaction:
            return False
        if (opts.debug_nee_no_shadow or opts.debug_nee_fixed_light
                or opts.debug_nee_cheap_eval):
            return False
        n_l = int(np.sum(np.asarray(view.lights.pdf_area) > 0.0))
        if n_l > MEGA_L_MAX:
            return False
        return True
    except Exception:
        return False


def build_mega_tables(view, res_x: int, res_y: int, eps: float) -> MegaTables:
    """Bake the lane-replicated VMEM scene tables from a SceneView."""
    shade = np.asarray(view.mesh.shade_rows())  # (T, 52)
    pdf_area = np.asarray(view.lights.pdf_area)  # (T,)
    t_rows = np.concatenate([shade, pdf_area[:, None]], axis=1)  # (T, 53)
    tri = _replicate(t_rows, 56)

    mats = view.mesh.materials
    m_rows = np.asarray(mats.packed_rows())  # (M, 19)
    e_coef = _e_pwl_coeffs(np.asarray(mats.roughness))  # (M, 33)
    mat = _replicate(np.concatenate([m_rows, e_coef], axis=1), 56)  # 52 cols

    # emissive subset + normalized CDF (MeshLightsView.rows layout:
    # p0 e1 e2 n Le[12:15] pdf_area[15])
    l_rows_all = np.asarray(view.lights.rows)
    l_mask = pdf_area > 0.0
    l_rows = l_rows_all[l_mask][:, :16]  # (L, 16)
    cdf_full = np.asarray(view.lights.cdf)
    l_cdf = cdf_full[l_mask]
    n_lights = int(l_rows.shape[0])
    if n_lights == 0:
        l_rows = np.zeros((1, 16), np.float32)
        l_cdf = np.ones((1,), np.float32)
    light = _replicate(
        np.concatenate([l_rows, l_cdf[:, None]], axis=1).astype(np.float32),
        24,
    )

    cam_s = CameraSampler.create(view.camera, res_x / res_y)
    cone_spread = float(np.tan(float(view.camera.fov) * 0.5) * 2.0 / res_x)
    env = np.asarray(view.env)
    c_row = np.array(
        [
            float(view.camera.eye.x), float(view.camera.eye.y),
            float(view.camera.eye.z),
            float(cam_s.u.x), float(cam_s.u.y), float(cam_s.u.z),
            float(cam_s.v.x), float(cam_s.v.y), float(cam_s.v.z),
            float(cam_s.w.x), float(cam_s.w.y), float(cam_s.w.z),
            float(env[0]), float(env[1]), float(env[2]),
            eps, cone_spread, 1.0 / res_x, 1.0 / res_y, float(res_x),
            float(res_x * res_y), 0.0, 0.0, 0.0,
        ],
        np.float32,
    )[None, :]
    cam = _replicate(c_row, 24)
    return MegaTables(
        tri=jnp.asarray(tri), mat=jnp.asarray(mat), light=jnp.asarray(light),
        cam=jnp.asarray(cam),
        n_tris=int(view.mesh.n_triangles), n_mats=int(mats.count),
        n_lights=max(n_lights, 1),
    )


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------

def _row(ref, i, c):
    """(1, 128) lane-replicated 'scalar' row."""
    return ref[i, c, :].reshape(1, 128)


def _vec(ref, i, c):
    return Vec3(_row(ref, i, c), _row(ref, i, c + 1), _row(ref, i, c + 2))


def _trace_closest(tri_ref, n_tris, o, d, tmin, t_lim):
    """Front-to-back-free dense loop over all triangles; carries the
    winner's shade attributes so no separate fetch pass is needed.

    Returns (valid, t, pos, gn, sn, uv2, mat_id, pdf_area)."""
    shape = o.x.shape
    zero = jnp.zeros(shape, jnp.float32)

    def body(t, carry):
        (tb, ub, vb, p0b, e1b, e2b, gnb, n0b, n1b, n2b, uvb, midb, pab) = carry
        p0 = _vec(tri_ref, t, 0)
        e1 = _vec(tri_ref, t, 3)
        e2 = _vec(tri_ref, t, 6)
        # Moller-Trumbore (same formulation as the dense kernels)
        pvx = d.y * e2.z - d.z * e2.y
        pvy = d.z * e2.x - d.x * e2.z
        pvz = d.x * e2.y - d.y * e2.x
        det = e1.x * pvx + e1.y * pvy + e1.z * pvz
        inv_det = jnp.where(
            jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0
        )
        tvx = o.x - p0.x
        tvy = o.y - p0.y
        tvz = o.z - p0.z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1.z - tvz * e1.y
        qvy = tvz * e1.x - tvx * e1.z
        qvz = tvx * e1.y - tvy * e1.x
        vv = (d.x * qvx + d.y * qvy + d.z * qvz) * inv_det
        tt = (e2.x * qvx + e2.y * qvy + e2.z * qvz) * inv_det
        ok = (
            (jnp.abs(det) > 1e-12)
            & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > tmin) & (tt < t_lim) & (tt < tb)
        )
        sel3 = lambda new, old: Vec3(
            jnp.where(ok, new.x, old.x),
            jnp.where(ok, new.y, old.y),
            jnp.where(ok, new.z, old.z),
        )
        return (
            jnp.where(ok, tt, tb),
            jnp.where(ok, uu, ub),
            jnp.where(ok, vv, vb),
            sel3(p0, p0b), sel3(e1, e1b), sel3(e2, e2b),
            sel3(_vec(tri_ref, t, 9), gnb),
            sel3(_vec(tri_ref, t, 12), n0b),
            sel3(_vec(tri_ref, t, 15), n1b),
            sel3(_vec(tri_ref, t, 18), n2b),
            tuple(
                jnp.where(ok, _row(tri_ref, t, 21 + k), uvb[k])
                for k in range(6)
            ),
            jnp.where(ok, _row(tri_ref, t, 27), midb),
            jnp.where(ok, _row(tri_ref, t, 52), pab),
        )

    z3 = Vec3(zero, zero, zero)
    init = (
        jnp.full(shape, _BIG, jnp.float32), zero, zero,
        z3, z3, z3, z3, z3, z3, z3,
        tuple(zero for _ in range(6)),
        zero, zero,
    )
    (tb, ub, vb, p0, e1, e2, gn, n0, n1, n2, uvc, midf, pa) = (
        jax.lax.fori_loop(0, n_tris, body, init)
    )
    valid = tb < _BIG
    pos = Vec3(
        p0.x + e1.x * ub + e2.x * vb,
        p0.y + e1.y * ub + e2.y * vb,
        p0.z + e1.z * ub + e2.z * vb,
    )
    w = 1.0 - ub - vb
    sn = normalize(
        Vec3(
            n0.x * w + n1.x * ub + n2.x * vb,
            n0.y * w + n1.y * ub + n2.y * vb,
            n0.z * w + n1.z * ub + n2.z * vb,
        )
    )
    uv_x = uvc[0] * w + uvc[2] * ub + uvc[4] * vb
    uv_y = uvc[1] * w + uvc[3] * ub + uvc[5] * vb
    return valid, tb, pos, gn, sn, (uv_x, uv_y), midf, pa


def _trace_any(tri_ref, n_tris, o, d, tmin, t_lim, able):
    shape = o.x.shape

    def body(t, occ):
        p0 = _vec(tri_ref, t, 0)
        e1 = _vec(tri_ref, t, 3)
        e2 = _vec(tri_ref, t, 6)
        pvx = d.y * e2.z - d.z * e2.y
        pvy = d.z * e2.x - d.x * e2.z
        pvz = d.x * e2.y - d.y * e2.x
        det = e1.x * pvx + e1.y * pvy + e1.z * pvz
        inv_det = jnp.where(
            jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0
        )
        tvx = o.x - p0.x
        tvy = o.y - p0.y
        tvz = o.z - p0.z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1.z - tvz * e1.y
        qvy = tvz * e1.x - tvx * e1.z
        qvz = tvx * e1.y - tvy * e1.x
        vv = (d.x * qvx + d.y * qvy + d.z * qvz) * inv_det
        tt = (e2.x * qvx + e2.y * qvy + e2.z * qvz) * inv_det
        ok = (
            (jnp.abs(det) > 1e-12)
            & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > tmin) & (tt < t_lim)
        )
        # f32 carry: Mosaic cannot legalize i1 vectors as scf.for loop state
        return jnp.maximum(occ, jnp.where(ok, 1.0, 0.0))

    occ = jax.lax.fori_loop(0, n_tris, body, jnp.zeros(shape, jnp.float32))
    return (occ > 0.0) & able


def _fetch_materials(mat_ref, n_mats, mid):
    """Masked select loop over materials: params + E-PWL coeff lanes."""
    shape = mid.shape
    zero = jnp.zeros(shape, jnp.float32)
    cols = [zero] * 18  # 18 float param cols (skip flags)
    ecoef = [zero] * 33
    for m in range(n_mats):
        mk = jnp.abs(mid - float(m)) < 0.5
        for c in range(18):
            cols[c] = jnp.where(mk, _row(mat_ref, m, c), cols[c])
        for c in range(33):
            ecoef[c] = jnp.where(mk, _row(mat_ref, m, 19 + c), ecoef[c])
    params = BsdfParams(
        diffuse=Vec3(cols[0], cols[1], cols[2]),
        specular=Vec3(cols[3], cols[4], cols[5]),
        diffuse_trans=Vec3(cols[9], cols[10], cols[11]),
        reflectivity=Vec3(cols[12], cols[13], cols[14]),
        roughness=cols[15],
        ior=cols[16],
        opacity=cols[17],
    )
    emissive = Vec3(cols[6], cols[7], cols[8])

    def e_fn(_roughness, cos_t):
        c = jnp.clip(jnp.abs(cos_t), 0.0, 1.0)
        acc = ecoef[0]
        for j in range(_E_KNOTS):
            k = (j + 0.5) / _E_KNOTS
            acc = acc + ecoef[1 + j] * jnp.maximum(c - k, 0.0)
        return acc

    return params, emissive, e_fn


def _sample_light(light_ref, n_lights, u0, u1, u2):
    """CDF inversion + row fetch over the emissive subset (masked loop)."""
    shape = u2.shape
    zero = jnp.zeros(shape, jnp.float32)
    idx = jnp.zeros(shape, jnp.int32)
    for li in range(n_lights):
        cdf_l = _row(light_ref, li, 16)
        idx = idx + jnp.where(cdf_l <= u2, 1, 0)
    idx = jnp.minimum(idx, n_lights - 1)
    cols = [zero] * 16
    for li in range(n_lights):
        mk = idx == li
        for c in range(16):
            cols[c] = jnp.where(mk, _row(light_ref, li, c), cols[c])
    p0 = Vec3(cols[0], cols[1], cols[2])
    e1 = Vec3(cols[3], cols[4], cols[5])
    e2 = Vec3(cols[6], cols[7], cols[8])
    ln = Vec3(cols[9], cols[10], cols[11])
    le = Vec3(cols[12], cols[13], cols[14])
    pdf_a = cols[15]
    b0, b1 = square_to_uniform_triangle(u0, u1)
    pos = Vec3(
        p0.x + e1.x * b0 + e2.x * b1,
        p0.y + e1.y * b0 + e2.y * b1,
        p0.z + e1.z * b0 + e2.z * b1,
    )
    return pos, ln, le, pdf_a


def _offset_origin(pos, gn, d, eps):
    side = jnp.where(dot(gn, d) >= 0.0, 1.0, -1.0)
    return Vec3(
        pos.x + gn.x * side * eps,
        pos.y + gn.y * side * eps,
        pos.z + gn.z * side * eps,
    )

# ---------------------------------------------------------------------------
# The megakernel
# ---------------------------------------------------------------------------

def _mega_kernel(
    pix_ref, tri_ref, mat_ref, light_ref, cam_ref, seq_ref,
    # outputs (all (RB, 128) f32)
    ld_x, ld_y, ld_z, lf_x, lf_y, lf_z, ls_x, ls_y, ls_z,
    g_depth, g_tri, g_nx, g_ny, g_nz, g_px, g_py, g_pz,
    g_uvx, g_uvy, g_mat, g_dax, g_day, g_daz, g_sax, g_say, g_saz,
    rays_out,
    *, n_tris: int, n_mats: int, n_lights: int, res_x: int, opts,
):
    pix = pix_ref[:]  # (RB, 128) u32
    shape = pix.shape
    seed = seq_ref[0, 0, :].reshape(1, 128)
    inst = seq_ref[0, 1, :].reshape(1, 128)
    n_valid = seq_ref[0, 3, :].reshape(1, 128)
    seq = TiledSequence(seed=seed, instance=inst)

    eye = _vec(cam_ref, 0, 0)
    cam_u = _vec(cam_ref, 0, 3)
    cam_v = _vec(cam_ref, 0, 6)
    cam_w = _vec(cam_ref, 0, 9)
    env = (_row(cam_ref, 0, 12), _row(cam_ref, 0, 13), _row(cam_ref, 0, 14))
    eps = _row(cam_ref, 0, 15)
    inv_rx = _row(cam_ref, 0, 17)
    inv_ry = _row(cam_ref, 0, 18)

    # ---- camera ray gen (core/camera.generate_camera_rays) ----
    jx, jy = seq.sample_2d(pix, jnp.uint32(0))
    # res_x is STATIC: constant-divisor div/mod lowers reliably in Mosaic
    # (a vector divisor may not)
    # route through int32: Mosaic has no uint32->float32 lowering, and both
    # values are < 2^31 (pixel index / coordinate)
    pxf = (pix % jnp.uint32(res_x)).astype(jnp.int32).astype(jnp.float32)
    pyf = (pix // jnp.uint32(res_x)).astype(jnp.int32).astype(jnp.float32)
    ndc_x = (pxf + jx) * inv_rx
    ndc_y = (pyf + jy) * inv_ry
    dx_c = ndc_x * 2.0 - 1.0
    dy_c = ndc_y * 2.0 - 1.0
    d0 = normalize(Vec3(
        dx_c * cam_u.x + dy_c * cam_v.x + cam_w.x,
        dx_c * cam_u.y + dy_c * cam_v.y + cam_w.y,
        dx_c * cam_u.z + dy_c * cam_v.z + cam_w.z,
    ))
    bz = lambda a: jnp.broadcast_to(a, shape)
    o0 = Vec3(bz(eye.x), bz(eye.y), bz(eye.z))
    d0 = Vec3(bz(d0.x), bz(d0.y), bz(d0.z))
    alive0 = pix < n_valid

    zero = jnp.zeros(shape, jnp.float32)
    z3 = Vec3(zero, zero, zero)
    stride = jnp.uint32(opts.dims_per_bounce)

    def add_routed(acc, contrib, mask, channel):
        ld, lf, ls = acc
        def one(dst, sel):
            w = mask & (channel == sel)
            return Vec3(
                dst.x + jnp.where(w, contrib.x, 0.0),
                dst.y + jnp.where(w, contrib.y, 0.0),
                dst.z + jnp.where(w, contrib.z, 0.0),
            )
        return (one(ld, 0), one(lf, 1), one(ls, 2))

    def shade_bounce(first, b, c):
        (o, d, thr, alive_f, prev_pdf, channel, ld, lf, ls, rays, gbuf) = c
        # alive rides the loop carry as f32 (Mosaic cannot legalize i1
        # vectors as scf.for loop state); bool locally
        alive = alive_f > 0.0
        t_lim = jnp.where(alive, _BIG, -1.0)
        rays = rays + jnp.where(alive, 1.0, 0.0)
        valid, ht, pos, gn, sn, uv, midf, pdf_area_hit = _trace_closest(
            tri_ref, n_tris, o, d, eps, t_lim
        )
        valid = valid & alive
        missed = alive & ~valid

        # constant environment pickup on miss lanes
        ld, lf, ls = add_routed(
            (ld, lf, ls),
            Vec3(thr.x * env[0], thr.y * env[1], thr.z * env[2]),
            missed, channel,
        )

        wi = Vec3(-d.x, -d.y, -d.z)
        flip = jnp.where(dot(gn, wi) < 0.0, -1.0, 1.0)
        gn_f = Vec3(gn.x * flip, gn.y * flip, gn.z * flip)
        sn_f = Vec3(sn.x * flip, sn.y * flip, sn.z * flip)
        t_b, b_b = orthonormal_basis(sn_f)
        wi_loc = to_local(wi, t_b, b_b, sn_f)

        params, emissive, e_fn = _fetch_materials(mat_ref, n_mats, midf)

        if first:
            gbuf = dict(
                depth=jnp.where(valid, ht, jnp.inf),
                tri=jnp.where(valid, 1.0, -1.0),  # hit flag (id not carried)
                n=Vec3(jnp.where(valid, sn_f.x, 0.0),
                       jnp.where(valid, sn_f.y, 0.0),
                       jnp.where(valid, sn_f.z, 0.0)),
                p=Vec3(jnp.where(valid, pos.x, 0.0),
                       jnp.where(valid, pos.y, 0.0),
                       jnp.where(valid, pos.z, 0.0)),
                uvx=jnp.where(valid, uv[0], 0.0),
                uvy=jnp.where(valid, uv[1], 0.0),
                mat=jnp.where(valid, midf, -1.0),
                da=Vec3(jnp.where(valid, params.diffuse.x, 0.0),
                        jnp.where(valid, params.diffuse.y, 0.0),
                        jnp.where(valid, params.diffuse.z, 0.0)),
                sa=Vec3(jnp.where(valid, params.specular.x, 0.0),
                        jnp.where(valid, params.specular.y, 0.0),
                        jnp.where(valid, params.specular.z, 0.0)),
            )

        # ---- emissive accumulation + MIS (pathtracer_core.h head) ----
        show = opts.visible_lights if first else (
            opts.direct_lighting_bsdf or opts.indirect_lighting_bsdf
        )
        if show:
            front_e = dot(gn, wi) > 0.0
            le = Vec3(
                jnp.where(front_e, emissive.x, 0.0),
                jnp.where(front_e, emissive.y, 0.0),
                jnp.where(front_e, emissive.z, 0.0),
            )
            if first:
                w_mis = jnp.ones(shape, jnp.float32)
            else:
                is_direct = jnp.asarray(b, jnp.int32) == 1
                t_safe = jnp.where(valid, ht, 1.0)
                dist2 = t_safe * t_safe
                cos_l = jnp.abs(dot(gn, wi))
                pdf_sa = pdf_area_hit * dist2 / jnp.maximum(cos_l, 1e-8)
                w_pow = power_heuristic(prev_pdf, pdf_sa)
                nee_mask = jnp.where(
                    is_direct, opts.direct_lighting_nee,
                    opts.indirect_lighting_nee)
                w_mis = jnp.where(nee_mask, w_pow, 1.0)
                show_mask = jnp.where(
                    is_direct, opts.direct_lighting_bsdf,
                    opts.indirect_lighting_bsdf)
                w_mis = w_mis * show_mask.astype(jnp.float32)
            ld, lf, ls = add_routed(
                (ld, lf, ls),
                Vec3(thr.x * le.x * w_mis, thr.y * le.y * w_mis,
                     thr.z * le.z * w_mis),
                valid, channel,
            )

        # ---- NEE: mesh lights (same dims as integrators/pt.py) ----
        base_dim = jnp.uint32(2) + jnp.asarray(b, jnp.uint32) * stride
        nee_on = (opts.direct_lighting_nee if first
                  else opts.indirect_lighting_nee)
        if nee_on and n_lights > 0:
            ul0, ul1, ul2 = seq.sample_3d(pix, base_dim)
            lpos, ln, lle, lpdf_a = _sample_light(
                light_ref, n_lights, ul0, ul1, ul2
            )
            to_l = Vec3(lpos.x - pos.x, lpos.y - pos.y, lpos.z - pos.z)
            dist2 = jnp.maximum(dot(to_l, to_l), 1e-12)
            dist = jnp.sqrt(dist2)
            wo = Vec3(to_l.x / dist, to_l.y / dist, to_l.z / dist)
            cos_l = dot(ln, Vec3(-wo.x, -wo.y, -wo.z))
            wo_loc = to_local(wo, t_b, b_b, sn_f)
            fd, fg, bsdf_pdf = f_split(
                params, wi_loc, wo_loc, opts.lobes, opts.clearcoat,
                opts.glossy_model, e_fn=e_fn)
            pdf_sa = lpdf_a * dist2 / jnp.maximum(jnp.abs(cos_l), 1e-8)
            bsdf_on = (opts.direct_lighting_bsdf if first
                       else opts.indirect_lighting_bsdf)
            w_mis = (power_heuristic(pdf_sa, bsdf_pdf) if bsdf_on
                     else jnp.ones(shape, jnp.float32))
            cos_s = jnp.abs(wo_loc.z)
            able = (
                valid & (cos_l > 1e-6) & (pdf_sa > 1e-12)
                & ((fd.x + fd.y + fd.z + fg.x + fg.y + fg.z) > 0.0)
            )
            so = _offset_origin(pos, gn, wo, eps)
            occluded = _trace_any(
                tri_ref, n_tris, so, wo, jnp.zeros(shape, jnp.float32),
                jnp.where(able, dist * (1.0 - 1e-3), -1.0), able,
            )
            rays = rays + jnp.where(able, 1.0, 0.0)
            lit = able & ~occluded
            scale = cos_s * w_mis / jnp.maximum(pdf_sa, 1e-12)
            wX = thr.x * lle.x * scale
            wY = thr.y * lle.y * scale
            wZ = thr.z * lle.z * scale
            if first:
                lf = Vec3(
                    lf.x + jnp.where(lit, fd.x * wX, 0.0),
                    lf.y + jnp.where(lit, fd.y * wY, 0.0),
                    lf.z + jnp.where(lit, fd.z * wZ, 0.0),
                )
                ls = Vec3(
                    ls.x + jnp.where(lit, fg.x * wX, 0.0),
                    ls.y + jnp.where(lit, fg.y * wY, 0.0),
                    ls.z + jnp.where(lit, fg.z * wZ, 0.0),
                )
            else:
                contrib = Vec3((fd.x + fg.x) * wX, (fd.y + fg.y) * wY,
                               (fd.z + fg.z) * wZ)
                ld, lf, ls = add_routed((ld, lf, ls), contrib, lit, channel)

        # ---- BSDF scatter + RR (shade_vertex tail) ----
        ub0, ub1, ub2 = seq.sample_3d(pix, base_dim + jnp.uint32(3))
        s = bsdf_sample(params, wi_loc, ub0, ub1, ub2, opts.lobes,
                        opts.clearcoat, opts.glossy_model, e_fn=e_fn)
        wo_world = to_world(s.wo, t_b, b_b, sn_f)
        new_thr = Vec3(thr.x * s.g.x, thr.y * s.g.y, thr.z * s.g.z)
        new_alive = valid & s.valid & ((s.g.x + s.g.y + s.g.z) > 0.0)

        if opts.rr and not first:
            u_rr = seq.sample_1d(pix, base_dim + jnp.uint32(6))
            rr_on = jnp.asarray(b, jnp.int32) >= opts.rr_start_bounce
            q = jnp.clip(
                jnp.maximum(jnp.maximum(new_thr.x, new_thr.y), new_thr.z),
                0.05, 1.0)
            q = jnp.where(rr_on, q, 1.0)
            keep = u_rr < q
            new_alive = new_alive & keep
            inv_q = 1.0 / q
            new_thr = Vec3(new_thr.x * inv_q, new_thr.y * inv_q,
                           new_thr.z * inv_q)

        if first:
            new_channel = jnp.where(
                valid,
                jnp.where(s.component >= GLOSSY_REFL, 2, 1),
                channel,
            )
        else:
            new_channel = channel

        new_thr = Vec3(
            jnp.where(new_alive, new_thr.x, 0.0),
            jnp.where(new_alive, new_thr.y, 0.0),
            jnp.where(new_alive, new_thr.z, 0.0),
        )
        new_o = _offset_origin(pos, gn, wo_world, eps)
        return (new_o, wo_world, new_thr,
                jnp.where(new_alive, 1.0, 0.0), s.pdf, new_channel,
                ld, lf, ls, rays, gbuf)

    carry = (
        o0, d0, Vec3(jnp.ones(shape), jnp.ones(shape), jnp.ones(shape)),
        jnp.where(alive0, 1.0, 0.0), zero, jnp.zeros(shape, jnp.int32),
        z3, z3, z3, zero, None,
    )
    carry = shade_bounce(True, 0, carry)
    gbuf = carry[10]
    if opts.max_path_length > 1:
        loop_c = carry[:10]

        def body(b, cc):
            out = shade_bounce(False, b, cc + (None,))
            return out[:10]

        loop_c = jax.lax.fori_loop(1, opts.max_path_length, body, loop_c)
        carry = loop_c + (gbuf,)

    (_o, _d, _thr, _alive, _pp, _ch, ld, lf, ls, rays, gbuf) = carry
    ld_x[:], ld_y[:], ld_z[:] = ld.x, ld.y, ld.z
    lf_x[:], lf_y[:], lf_z[:] = lf.x, lf.y, lf.z
    ls_x[:], ls_y[:], ls_z[:] = ls.x, ls.y, ls.z
    g_depth[:] = gbuf["depth"]
    g_tri[:] = gbuf["tri"]
    g_nx[:], g_ny[:], g_nz[:] = gbuf["n"].x, gbuf["n"].y, gbuf["n"].z
    g_px[:], g_py[:], g_pz[:] = gbuf["p"].x, gbuf["p"].y, gbuf["p"].z
    g_uvx[:], g_uvy[:] = gbuf["uvx"], gbuf["uvy"]
    g_mat[:] = gbuf["mat"]
    g_dax[:], g_day[:], g_daz[:] = gbuf["da"].x, gbuf["da"].y, gbuf["da"].z
    g_sax[:], g_say[:], g_saz[:] = gbuf["sa"].x, gbuf["sa"].y, gbuf["sa"].z
    rays_out[:] = rays


@functools.partial(
    jax.jit,
    static_argnames=("n_tris", "n_mats", "n_lights", "res_x", "opts", "n"),
)
def _mega_impl(tri, mat, light, cam, seq_tab, n: int,
               n_tris: int, n_mats: int, n_lights: int, res_x: int, opts):
    rays_per_block = _RB * 128
    n_pad = -(-n // rays_per_block) * rays_per_block
    r_total = n_pad // 128
    g = r_total // _RB
    pix = jnp.arange(n_pad, dtype=jnp.uint32).reshape(r_total, 128)

    blk = pl.BlockSpec((_RB, 128), lambda i: (i, 0))
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    n_out = 27
    outs = pl.pallas_call(
        functools.partial(
            _mega_kernel, n_tris=n_tris, n_mats=n_mats, n_lights=n_lights,
            res_x=res_x, opts=opts,
        ),
        out_shape=[jax.ShapeDtypeStruct((r_total, 128), jnp.float32)] * n_out,
        grid=(g,),
        in_specs=[blk, full(tri), full(mat), full(light), full(cam),
                  full(seq_tab)],
        out_specs=[blk] * n_out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(pix, tri, mat, light, cam, seq_tab)
    return tuple(o.reshape(n_pad)[:n] for o in outs)


# ---------------------------------------------------------------------------
# Replay-gradient kernel (round 5): d loss / d material diffuse albedo
# ---------------------------------------------------------------------------

GRAD_M_MAX = 16  # per-material replay state is O(M) vregs


def _safe_inv(x):
    return jnp.where(x > 0.0, 1.0 / jnp.where(x <= 0.0, 1.0, x), 0.0)


def _mega_grad_kernel(
    pix_ref, ax_ref, ay_ref, az_ref,
    tri_ref, mat_ref, light_ref, cam_ref, seq_ref,
    gout_ref,
    *, n_tris: int, n_mats: int, n_lights: int, res_x: int, opts,
):
    """Replay pass accumulating dL/d diffuse_{m,c} for the DETACHED
    estimator, given the per-pixel adjoint A = dL/d composited.

    Why this works: with detached sampling every radiance term T is a
    polynomial in the diffuse albedos — a product of per-vertex factors
    in which the albedo enters only linearly through the diffuse lobe
    (fd = a * K, bsdf/composite.diffuse_refl_unit). So
    dT/da_{m,c} = T_c * U_{m,c}, where U accumulates K_c/f_c over the
    path's vertices at material m (plus the NEE vertex's local factor).
    The kernel replays the EXACT forward paths (same QMC sequence,
    same RR) and accumulates G = sum_terms A*T*U per (m, c) — no AD
    graph, no residuals, mega-kernel speed. Gradients match
    jax.grad of the XLA pipeline (tests/test_mega_grad.py).

    Known limit (shared with any log-derivative replay): a term whose
    per-channel f is exactly 0 at some vertex contributes 0 instead of
    its (possibly nonzero) derivative through that vertex — only
    reachable when BOTH the diffuse channel and glossy channel are
    exactly 0 there. Clearcoat is gated off (delta-lobe g is not
    f-linear)."""
    pix = pix_ref[:]
    shape = pix.shape
    adj = Vec3(ax_ref[:], ay_ref[:], az_ref[:])
    seed = seq_ref[0, 0, :].reshape(1, 128)
    inst = seq_ref[0, 1, :].reshape(1, 128)
    n_valid = seq_ref[0, 3, :].reshape(1, 128)
    seq = TiledSequence(seed=seed, instance=inst)

    eye = _vec(cam_ref, 0, 0)
    cam_u = _vec(cam_ref, 0, 3)
    cam_v = _vec(cam_ref, 0, 6)
    cam_w = _vec(cam_ref, 0, 9)
    env = (_row(cam_ref, 0, 12), _row(cam_ref, 0, 13), _row(cam_ref, 0, 14))
    eps = _row(cam_ref, 0, 15)
    inv_rx = _row(cam_ref, 0, 17)
    inv_ry = _row(cam_ref, 0, 18)

    jx, jy = seq.sample_2d(pix, jnp.uint32(0))
    pxf = (pix % jnp.uint32(res_x)).astype(jnp.int32).astype(jnp.float32)
    pyf = (pix // jnp.uint32(res_x)).astype(jnp.int32).astype(jnp.float32)
    ndc_x = (pxf + jx) * inv_rx
    ndc_y = (pyf + jy) * inv_ry
    dx_c = ndc_x * 2.0 - 1.0
    dy_c = ndc_y * 2.0 - 1.0
    d0 = normalize(Vec3(
        dx_c * cam_u.x + dy_c * cam_v.x + cam_w.x,
        dx_c * cam_u.y + dy_c * cam_v.y + cam_w.y,
        dx_c * cam_u.z + dy_c * cam_v.z + cam_w.z,
    ))
    bz = lambda a: jnp.broadcast_to(a, shape)
    o0 = Vec3(bz(eye.x), bz(eye.y), bz(eye.z))
    d0 = Vec3(bz(d0.x), bz(d0.y), bz(d0.z))
    alive0 = pix < n_valid

    zero = jnp.zeros(shape, jnp.float32)
    z3 = Vec3(zero, zero, zero)
    stride = jnp.uint32(opts.dims_per_bounce)
    M = n_mats

    from fermat_tpu.bsdf.composite import diffuse_refl_unit

    def shade_bounce(first, b, c):
        o, d, thr, alive_f, prev_pdf = c[:5]
        U = c[5:5 + M]          # per-material Vec3: d log thr / d a
        G = c[5 + M:5 + 2 * M]  # per-material Vec3: gradient accumulator
        U = list(U)
        G = list(G)
        alive = alive_f > 0.0
        t_lim = jnp.where(alive, _BIG, -1.0)
        valid, ht, pos, gn, sn, uv, midf, pdf_area_hit = _trace_closest(
            tri_ref, n_tris, o, d, eps, t_lim
        )
        valid = valid & alive
        missed = alive & ~valid

        # env-miss term: T = thr * env
        selx = jnp.where(missed, adj.x * thr.x * env[0], 0.0)
        sely = jnp.where(missed, adj.y * thr.y * env[1], 0.0)
        selz = jnp.where(missed, adj.z * thr.z * env[2], 0.0)
        for m in range(M):
            G[m] = Vec3(G[m].x + selx * U[m].x, G[m].y + sely * U[m].y,
                        G[m].z + selz * U[m].z)

        wi = Vec3(-d.x, -d.y, -d.z)
        flip = jnp.where(dot(gn, wi) < 0.0, -1.0, 1.0)
        gn_f = Vec3(gn.x * flip, gn.y * flip, gn.z * flip)
        sn_f = Vec3(sn.x * flip, sn.y * flip, sn.z * flip)
        t_b, b_b = orthonormal_basis(sn_f)
        wi_loc = to_local(wi, t_b, b_b, sn_f)
        params, emissive, e_fn = _fetch_materials(mat_ref, n_mats, midf)
        mk = [valid & (jnp.abs(midf - float(m)) < 0.5) for m in range(M)]

        # emissive term: T = thr * le * w_mis (no local albedo factor)
        show = opts.visible_lights if first else (
            opts.direct_lighting_bsdf or opts.indirect_lighting_bsdf
        )
        if show:
            front_e = dot(gn, wi) > 0.0
            le = Vec3(
                jnp.where(front_e, emissive.x, 0.0),
                jnp.where(front_e, emissive.y, 0.0),
                jnp.where(front_e, emissive.z, 0.0),
            )
            if first:
                w_mis = jnp.ones(shape, jnp.float32)
            else:
                is_direct = jnp.asarray(b, jnp.int32) == 1
                t_safe = jnp.where(valid, ht, 1.0)
                dist2 = t_safe * t_safe
                cos_l = jnp.abs(dot(gn, wi))
                pdf_sa = pdf_area_hit * dist2 / jnp.maximum(cos_l, 1e-8)
                w_pow = power_heuristic(prev_pdf, pdf_sa)
                nee_mask = jnp.where(
                    is_direct, opts.direct_lighting_nee,
                    opts.indirect_lighting_nee)
                w_mis = jnp.where(nee_mask, w_pow, 1.0)
                show_mask = jnp.where(
                    is_direct, opts.direct_lighting_bsdf,
                    opts.indirect_lighting_bsdf)
                w_mis = w_mis * show_mask.astype(jnp.float32)
            ex = jnp.where(valid, adj.x * thr.x * le.x * w_mis, 0.0)
            ey = jnp.where(valid, adj.y * thr.y * le.y * w_mis, 0.0)
            ez = jnp.where(valid, adj.z * thr.z * le.z * w_mis, 0.0)
            for m in range(M):
                G[m] = Vec3(G[m].x + ex * U[m].x, G[m].y + ey * U[m].y,
                            G[m].z + ez * U[m].z)

        # NEE term
        base_dim = jnp.uint32(2) + jnp.asarray(b, jnp.uint32) * stride
        nee_on = (opts.direct_lighting_nee if first
                  else opts.indirect_lighting_nee)
        if nee_on and n_lights > 0:
            ul0, ul1, ul2 = seq.sample_3d(pix, base_dim)
            lpos, ln, lle, lpdf_a = _sample_light(
                light_ref, n_lights, ul0, ul1, ul2
            )
            to_l = Vec3(lpos.x - pos.x, lpos.y - pos.y, lpos.z - pos.z)
            dist2 = jnp.maximum(dot(to_l, to_l), 1e-12)
            dist = jnp.sqrt(dist2)
            wo = Vec3(to_l.x / dist, to_l.y / dist, to_l.z / dist)
            cos_l = dot(ln, Vec3(-wo.x, -wo.y, -wo.z))
            wo_loc = to_local(wo, t_b, b_b, sn_f)
            fd, fg, bsdf_pdf = f_split(
                params, wi_loc, wo_loc, opts.lobes, opts.clearcoat,
                opts.glossy_model, e_fn=e_fn)
            pdf_sa = lpdf_a * dist2 / jnp.maximum(jnp.abs(cos_l), 1e-8)
            bsdf_on = (opts.direct_lighting_bsdf if first
                       else opts.indirect_lighting_bsdf)
            w_mis = (power_heuristic(pdf_sa, bsdf_pdf) if bsdf_on
                     else jnp.ones(shape, jnp.float32))
            cos_s = jnp.abs(wo_loc.z)
            able = (
                valid & (cos_l > 1e-6) & (pdf_sa > 1e-12)
                & ((fd.x + fd.y + fd.z + fg.x + fg.y + fg.z) > 0.0)
            )
            so = _offset_origin(pos, gn, wo, eps)
            occluded = _trace_any(
                tri_ref, n_tris, so, wo, jnp.zeros(shape, jnp.float32),
                jnp.where(able, dist * (1.0 - 1e-3), -1.0), able,
            )
            lit = able & ~occluded
            scale = cos_s * w_mis / jnp.maximum(pdf_sa, 1e-12)
            wX = thr.x * lle.x * scale
            wY = thr.y * lle.y * scale
            wZ = thr.z * lle.z * scale
            kd = diffuse_refl_unit(params, wi_loc, wo_loc,
                                   opts.clearcoat, e_fn, opts.lobes)
            ftx, fty, ftz = fd.x + fg.x, fd.y + fg.y, fd.z + fg.z
            nx = jnp.where(lit, adj.x * ftx * wX, 0.0)
            ny = jnp.where(lit, adj.y * fty * wY, 0.0)
            nz = jnp.where(lit, adj.z * ftz * wZ, 0.0)
            # local factor: dT/da at THIS vertex = T * kd/f_tot
            lx = nx * kd.x * _safe_inv(ftx)
            ly = ny * kd.y * _safe_inv(fty)
            lz = nz * kd.z * _safe_inv(ftz)
            for m in range(M):
                mkf = mk[m]
                G[m] = Vec3(
                    G[m].x + nx * U[m].x + jnp.where(mkf, lx, 0.0),
                    G[m].y + ny * U[m].y + jnp.where(mkf, ly, 0.0),
                    G[m].z + nz * U[m].z + jnp.where(mkf, lz, 0.0),
                )

        # BSDF scatter + RR (identical replay) + U update
        ub0, ub1, ub2 = seq.sample_3d(pix, base_dim + jnp.uint32(3))
        s = bsdf_sample(params, wi_loc, ub0, ub1, ub2, opts.lobes,
                        opts.clearcoat, opts.glossy_model, e_fn=e_fn)
        wo_world = to_world(s.wo, t_b, b_b, sn_f)
        new_thr = Vec3(thr.x * s.g.x, thr.y * s.g.y, thr.z * s.g.z)
        new_alive = valid & s.valid & ((s.g.x + s.g.y + s.g.z) > 0.0)

        if opts.rr and not first:
            u_rr = seq.sample_1d(pix, base_dim + jnp.uint32(6))
            rr_on = jnp.asarray(b, jnp.int32) >= opts.rr_start_bounce
            q = jnp.clip(
                jnp.maximum(jnp.maximum(new_thr.x, new_thr.y), new_thr.z),
                0.05, 1.0)
            q = jnp.where(rr_on, q, 1.0)
            keep = u_rr < q
            new_alive = new_alive & keep
            inv_q = 1.0 / q
            new_thr = Vec3(new_thr.x * inv_q, new_thr.y * inv_q,
                           new_thr.z * inv_q)

        # d log(thr * s.g)/da at this vertex: kd(wo_sampled)/f(wo_sampled)
        kd_s = diffuse_refl_unit(params, wi_loc, s.wo,
                                 opts.clearcoat, e_fn, opts.lobes)
        rx = kd_s.x * _safe_inv(s.f.x)
        ry = kd_s.y * _safe_inv(s.f.y)
        rz = kd_s.z * _safe_inv(s.f.z)
        for m in range(M):
            mkf = mk[m] & new_alive
            U[m] = Vec3(U[m].x + jnp.where(mkf, rx, 0.0),
                        U[m].y + jnp.where(mkf, ry, 0.0),
                        U[m].z + jnp.where(mkf, rz, 0.0))

        new_thr = Vec3(
            jnp.where(new_alive, new_thr.x, 0.0),
            jnp.where(new_alive, new_thr.y, 0.0),
            jnp.where(new_alive, new_thr.z, 0.0),
        )
        new_o = _offset_origin(pos, gn, wo_world, eps)
        return (new_o, wo_world, new_thr,
                jnp.where(new_alive, 1.0, 0.0), s.pdf,
                *U, *G)

    carry = (
        o0, d0, Vec3(jnp.ones(shape), jnp.ones(shape), jnp.ones(shape)),
        jnp.where(alive0, 1.0, 0.0), zero,
        *([z3] * M), *([z3] * M),
    )
    carry = shade_bounce(True, 0, carry)
    if opts.max_path_length > 1:
        def body(b, cc):
            return shade_bounce(False, b, cc)

        carry = jax.lax.fori_loop(1, opts.max_path_length, body, carry)

    G = carry[5 + M:5 + 2 * M]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.zeros((1, 128), jnp.float32)
    for m in range(M):
        for ci, comp in enumerate((G[m].x, G[m].y, G[m].z)):
            s_mc = jnp.sum(comp)
            row = row + jnp.where(lane == (3 * m + ci), s_mc, 0.0)
    # Mosaic requires (8, 128) output blocks: replicate the row across
    # sublanes; the wrapper reads sublane 0 of each block
    gout_ref[:] = jnp.broadcast_to(row, (_RB, 128))


def mega_grad_eligible(view, opts) -> bool:
    """Replay-gradient gate: mega_eligible AND no clearcoat (delta coat
    g is not f-linear) AND material count within the O(M) state cap."""
    if not mega_eligible(view, opts):
        return False
    if getattr(opts, "clearcoat", False):
        return False
    return int(view.mesh.materials.count) <= GRAD_M_MAX


@functools.partial(
    jax.jit,
    static_argnames=("n_tris", "n_mats", "n_lights", "res_x", "opts", "n"),
)
def _mega_grad_impl(tri, mat, light, cam, seq_tab, adjoint, n: int,
                    n_tris: int, n_mats: int, n_lights: int, res_x: int,
                    opts):
    rays_per_block = _RB * 128
    n_pad = -(-n // rays_per_block) * rays_per_block
    r_total = n_pad // 128
    g = r_total // _RB
    pix = jnp.arange(n_pad, dtype=jnp.uint32).reshape(r_total, 128)
    adj = jnp.pad(adjoint, ((0, n_pad - n), (0, 0)))
    ax = adj[:, 0].reshape(r_total, 128)
    ay = adj[:, 1].reshape(r_total, 128)
    az = adj[:, 2].reshape(r_total, 128)

    blk = pl.BlockSpec((_RB, 128), lambda i: (i, 0))
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    gout = pl.pallas_call(
        functools.partial(
            _mega_grad_kernel, n_tris=n_tris, n_mats=n_mats,
            n_lights=n_lights, res_x=res_x, opts=opts,
        ),
        out_shape=jax.ShapeDtypeStruct((g * _RB, 128), jnp.float32),
        grid=(g,),
        in_specs=[blk, blk, blk, blk, full(tri), full(mat), full(light),
                  full(cam), full(seq_tab)],
        out_specs=pl.BlockSpec((_RB, 128), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(pix, ax, ay, az, tri, mat, light, cam, seq_tab)
    summed = jnp.sum(gout.reshape(g, _RB, 128)[:, 0, :], axis=0)  # (128,)
    return summed[: 3 * n_mats].reshape(n_mats, 3)


def render_grad_diffuse_mega(view, opts, res_x: int, res_y: int, instance,
                             adjoint, seed: int = 0,
                             tables: MegaTables = None):
    """d loss / d materials.diffuse — (M, 3) — for loss with per-pixel
    adjoint dL/d composited = `adjoint` ((N, 3) f32). Replays the exact
    paths of render_pass_mega(view, opts, res_x, res_y, instance, seed)."""
    tb = tables if tables is not None else build_mega_tables(
        view, res_x, res_y, opts.ray_eps
    )
    n = res_x * res_y
    seq_row = np.zeros((1, 8, 128), np.uint32)
    seq_tab = jnp.asarray(seq_row)
    seq_tab = seq_tab.at[0, 0, :].set(jnp.uint32(seed))
    seq_tab = seq_tab.at[0, 1, :].set(jnp.asarray(instance, jnp.uint32))
    seq_tab = seq_tab.at[0, 2, :].set(jnp.uint32(res_x))
    seq_tab = seq_tab.at[0, 3, :].set(jnp.uint32(n))
    return _mega_grad_impl(
        tb.tri, tb.mat, tb.light, tb.cam, seq_tab,
        jnp.asarray(adjoint, jnp.float32), n,
        tb.n_tris, tb.n_mats, tb.n_lights, res_x, opts,
    )


def render_pass_mega(view, opts, res_x: int, res_y: int, instance,
                     seed: int = 0, tables: MegaTables = None):
    """One progressive pass through the fused megakernel.

    Returns the same _PassOutput as integrators.pt.render_pass (g_tri is a
    hit FLAG (0/-1 on miss) rather than the triangle id — the id is not
    carried through the fused trace; every other AOV matches).
    """
    from fermat_tpu.integrators.pt import _PassOutput

    tb = tables if tables is not None else build_mega_tables(
        view, res_x, res_y, opts.ray_eps
    )
    n = res_x * res_y
    seq_row = np.zeros((1, 8, 128), np.uint32)
    seq_tab = jnp.asarray(seq_row)
    seq_tab = seq_tab.at[0, 0, :].set(jnp.uint32(seed))
    seq_tab = seq_tab.at[0, 1, :].set(jnp.asarray(instance, jnp.uint32))
    seq_tab = seq_tab.at[0, 2, :].set(jnp.uint32(res_x))
    seq_tab = seq_tab.at[0, 3, :].set(jnp.uint32(n))

    outs = _mega_impl(
        tb.tri, tb.mat, tb.light, tb.cam, seq_tab, n,
        tb.n_tris, tb.n_mats, tb.n_lights, res_x, opts,
    )
    (ldx, ldy, ldz, lfx, lfy, lfz, lsx, lsy, lsz,
     dep, trif, nx, ny, nz, px, py, pz, uvx, uvy, matf,
     dax, day, daz, sax, say, saz, rays) = outs
    ld = Vec3(ldx, ldy, ldz)
    lf = Vec3(lfx, lfy, lfz)
    ls = Vec3(lsx, lsy, lsz)
    comp = Vec3(ld.x + lf.x + ls.x, ld.y + lf.y + ls.y, ld.z + lf.z + ls.z)
    return _PassOutput(
        direct=ld, diffuse=lf, specular=ls, composited=comp,
        diffuse_albedo=Vec3(dax, day, daz),
        specular_albedo=Vec3(sax, say, saz),
        depth=dep,
        tri=jnp.where(trif > 0.0, 1, -1).astype(jnp.int32),
        normal=Vec3(nx, ny, nz),
        position=Vec3(px, py, pz),
        uv=jnp.stack([uvx, uvy], axis=-1),
        material=jnp.round(matf).astype(jnp.int32),
        rays=jnp.sum(rays),
    )
