"""Fused per-bounce shade/NEE Pallas kernel for arbitrary-size scenes.

Reference analog: `shade_vertex` (src/pathtracer_core.h:773-1254) — ONE
device kernel serving every scene. The round-3 megakernel fused the whole
pass but only for VMEM-resident scenes (<=128 tris, no textures); this
kernel is the general-case companion the round-3 verdict asked for
(VERDICT r3 #3): the tracer (frontier/cluster/dense — any of them) and the
irreducibly-gathering fetches stay OUTSIDE, and everything elementwise in
a bounce fuses into one pallas_call:

    XLA per bounce:  closest trace -> 52-col shade-row gather (+ texture
                     atlas modulate) -> QMC dims -> light CDF inversion +
                     row gather -> [THIS KERNEL] -> shadow anyhit ->
                     2 masked adds -> next bounce
    in-kernel:       env-miss pickup, emissive MIS, NEE geometry +
                     f_split + MIS weight + shadow-ray setup, BSDF
                     sampling, RR, channel routing.

Light sampling stays in XLA (searchsorted over the emissive CDF + one row
gather = two fusions when jitted) so the kernel has NO light-count limit
and textured emitters modulate exactly like the XLA path.

Why: the XLA pipeline pays ~20 fusion dispatches per bounce; measured on
big_room 1600x896x6 (tools/tpu_pass_attrib.py, round 4) the NEE+shade
elementwise block is ~3.6 s of the 6.33 s pass while the actual traces
are ~2.7 s and f_split arithmetic itself is negligible — the cost is
fusion boundaries and dispatch, exactly what one kernel removes.

Same math as integrators/pt.py (f_split / sample / power_heuristic are
the SAME functions), with two deliberate deltas, both shared with the
megakernel: the GGX energy table evaluates through an exact-at-the-knots
PWL (per-lane coefficients gathered outside; rtol ~2e-4 vs the bilinear
table).

Differentiability: forward-only (pallas_call has no VJP); render_pass
auto-falls back to the XLA shade whenever the view is traced (training)
or a feature outside the eligibility matrix is present.
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
    BsdfParams,
    f_split,
    sample as bsdf_sample,
)
from fermat_tpu.core.math import (
    Vec3,
    dot,
    orthonormal_basis,
    to_local,
    to_world,
)
from fermat_tpu.core.sampling import power_heuristic
from fermat_tpu.ops.pallas_pt_mega import _e_pwl_coeffs

Array = jax.Array

_E_KNOTS = 32
_BLK = 1024  # lanes per grid step, reshaped (8, 128) in-kernel


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


class ShadeTables(NamedTuple):
    """Static (host-built) tables for the fused shade path."""

    ecoef: Array  # (M, 33) E-PWL coefficients (XLA-side gather table)
    has_lights: bool
    # COMPACT emissive-only light table for the XLA-side sampling: the
    # full-length MeshLightsView tables span ALL T triangles, so at
    # bigroom scale each bounce paid a searchsorted over 100k entries
    # plus a 23-col scalar row gather (measured: the fused pass got
    # SLOWER than XLA, 4.42 vs 4.23 s). The cdf only steps at emissive
    # rows, so sampling from the compressed table picks the identical
    # physical triangle; at L <= 2048 the pick is a fused compare+sum
    # and the row fetch rides the one-hot MXU path.
    light_rows: Array  # (L, 23) = MeshLightsView.rows[emissive]
    light_cdf: Array  # (L,) compressed inclusive cdf


def build_shade_tables(view) -> "ShadeTables | None":
    """Host-side table build; None if the view is traced or ineligible.

    Eligibility (fall back to the XLA shade otherwise):
      * concrete (non-traced) view — training paths stay differentiable
      * no env map (textured infinite light keeps the XLA path),
      * no analytic/point/directional lights (kept in XLA; can be added),
      * no per-material shadow-mask sets (masked shadow tracers differ).
    Light COUNT is unbounded: sampling runs in XLA outside the kernel.
    """
    import jax.core as jcore

    # ANY traced leaf disables fusion: a partially-traced view (e.g. only
    # materials.diffuse under jax.grad in a train step) still routes
    # tangents into the pallas_call, which has no VJP
    if any(isinstance(leaf, jcore.Tracer)
           for leaf in jax.tree_util.tree_leaves(view)):
        return None
    lv = view.lights
    if view.env_map is not None:
        return None
    if getattr(view, "area_lights", None) is not None and \
            view.area_lights.count > 0:
        return None
    if view.point_lights.count > 0 or view.dir_lights.count > 0:
        return None
    if view.shadow_sets is not None:
        return None
    pdf_area = np.asarray(jax.device_get(lv.pdf_area))
    emissive_ids = np.nonzero(pdf_area > 0.0)[0]
    has = emissive_ids.size > 0
    rows = np.asarray(jax.device_get(lv.rows))
    cdf = np.asarray(jax.device_get(lv.cdf))
    if has:
        lrows = rows[emissive_ids].astype(np.float32)
        lcdf = cdf[emissive_ids].astype(np.float32)
    else:
        lrows = np.zeros((1, rows.shape[1]), np.float32)
        lcdf = np.ones((1,), np.float32)
    mats = view.mesh.materials
    rough = np.asarray(jax.device_get(mats.roughness))
    ecoef = jnp.asarray(_e_pwl_coeffs(rough))
    return ShadeTables(ecoef=ecoef, has_lights=has,
                       light_rows=jnp.asarray(lrows),
                       light_cdf=jnp.asarray(lcdf))


def _row(ref, i, c):
    return ref[i, c, :].reshape(1, 128)


def _offset_origin(pos, gn, d, eps):
    side = jnp.where(dot(gn, d) >= 0.0, 1.0, -1.0)
    return Vec3(
        pos.x + gn.x * side * eps,
        pos.y + gn.y * side * eps,
        pos.z + gn.z * side * eps,
    )


def _shade_kernel(
    b_ref,  # SMEM (1, 1) i32 bounce index
    # per-lane inputs, each (8, 128)
    posx, posy, posz, dx, dy, dz, t_in, valid_f,
    gnx, gny, gnz, snx, sny, snz,
    thrx, thry, thrz, prev_pdf_r, channel_f, alive_f,
    dfx, dfy, dfz, spx, spy, spz,
    dtx, dty, dtz, rfx, rfy, rfz,
    rough_r, ior_r, opac_r,
    emx, emy, emz, pdfa_hit_r,
    lpx_r, lpy_r, lpz_r, lnx_r, lny_r, lnz_r,
    llex_r, lley_r, llez_r, lpdfa_r,
    ub0_r, ub1_r, ub2_r, urr_r,
    ec_refs,  # tuple of 33 (8, 128) E-PWL coeff refs (packed last in in-list)
    # outputs
    ldx_o, ldy_o, ldz_o, lfx_o, lfy_o, lfz_o, lsx_o, lsy_o, lsz_o,
    neex_o, neey_o, neez_o, shox_o, shoy_o, shoz_o,
    shdx_o, shdy_o, shdz_o, shtmax_o, able_o,
    nox_o, noy_o, noz_o, ndx_o, ndy_o, ndz_o,
    nthrx_o, nthry_o, nthrz_o, nalive_o, npdf_o, nchan_o,
    *, has_lights: bool, opts, env, eps: float,
):
    ld = lambda r: r[:]
    b = b_ref[0, 0]
    shape = (8, 128)
    zero = jnp.zeros(shape, jnp.float32)

    d = Vec3(ld(dx), ld(dy), ld(dz))
    t = ld(t_in)
    valid = ld(valid_f) > 0.0
    alive = ld(alive_f) > 0.0
    gn = Vec3(ld(gnx), ld(gny), ld(gnz))
    sn = Vec3(ld(snx), ld(sny), ld(snz))
    thr = Vec3(ld(thrx), ld(thry), ld(thrz))
    prev_pdf = ld(prev_pdf_r)
    channel = ld(channel_f)
    params = BsdfParams(
        diffuse=Vec3(ld(dfx), ld(dfy), ld(dfz)),
        specular=Vec3(ld(spx), ld(spy), ld(spz)),
        diffuse_trans=Vec3(ld(dtx), ld(dty), ld(dtz)),
        reflectivity=Vec3(ld(rfx), ld(rfy), ld(rfz)),
        roughness=ld(rough_r),
        ior=ld(ior_r),
        opacity=ld(opac_r),
    )
    emissive = Vec3(ld(emx), ld(emy), ld(emz))
    pdf_area_hit = ld(pdfa_hit_r)
    ecoef = [ld(r) for r in ec_refs]

    def e_fn(_roughness, cos_t):
        c = jnp.clip(jnp.abs(cos_t), 0.0, 1.0)
        acc = ecoef[0]
        for j in range(_E_KNOTS):
            k = (j + 0.5) / _E_KNOTS
            acc = acc + ecoef[1 + j] * jnp.maximum(c - k, 0.0)
        return acc

    missed = alive & ~valid
    pos = Vec3(ld(posx), ld(posy), ld(posz))
    wi = Vec3(-d.x, -d.y, -d.z)
    flip = jnp.where(dot(gn, wi) < 0.0, -1.0, 1.0)
    gn_f = Vec3(gn.x * flip, gn.y * flip, gn.z * flip)
    sn_f = Vec3(sn.x * flip, sn.y * flip, sn.z * flip)
    t_b, b_b = orthonormal_basis(sn_f)
    wi_loc = to_local(wi, t_b, b_b, sn_f)

    ldelta = [Vec3(zero, zero, zero) for _ in range(3)]  # direct/diff/spec

    def add_routed(contrib, mask):
        for ci in range(3):
            w = mask & (channel == float(ci))
            ldelta[ci] = Vec3(
                ldelta[ci].x + jnp.where(w, contrib.x, 0.0),
                ldelta[ci].y + jnp.where(w, contrib.y, 0.0),
                ldelta[ci].z + jnp.where(w, contrib.z, 0.0),
            )

    # ---- constant environment pickup on miss lanes ----
    add_routed(Vec3(thr.x * env[0], thr.y * env[1], thr.z * env[2]), missed)

    # ---- emissive accumulation + MIS (loop bounces: b >= 1) ----
    if opts.direct_lighting_bsdf or opts.indirect_lighting_bsdf:
        front_e = dot(gn, wi) > 0.0
        le = Vec3(
            jnp.where(front_e, emissive.x, 0.0),
            jnp.where(front_e, emissive.y, 0.0),
            jnp.where(front_e, emissive.z, 0.0),
        )
        is_direct = b == 1
        t_safe = jnp.where(valid, t, 1.0)
        dist2 = t_safe * t_safe
        cos_l = jnp.abs(dot(gn, wi))
        pdf_sa = pdf_area_hit * dist2 / jnp.maximum(cos_l, 1e-8)
        w_pow = power_heuristic(prev_pdf, pdf_sa)
        nee_mask = jnp.where(
            is_direct, opts.direct_lighting_nee, opts.indirect_lighting_nee
        )
        w_mis = jnp.where(nee_mask, w_pow, 1.0)
        show_mask = jnp.where(
            is_direct, opts.direct_lighting_bsdf, opts.indirect_lighting_bsdf
        )
        w_mis = w_mis * show_mask.astype(jnp.float32)
        add_routed(
            Vec3(thr.x * le.x * w_mis, thr.y * le.y * w_mis,
                 thr.z * le.z * w_mis),
            valid,
        )

    # ---- NEE: mesh lights ----
    nee3 = Vec3(zero, zero, zero)
    sh_o = Vec3(zero, zero, zero)
    sh_d = Vec3(zero, zero, jnp.ones(shape, jnp.float32))
    sh_tmax = jnp.full(shape, -1.0, jnp.float32)
    able = jnp.zeros(shape, bool)
    if opts.indirect_lighting_nee and has_lights:
        lpos = Vec3(ld(lpx_r), ld(lpy_r), ld(lpz_r))
        ln = Vec3(ld(lnx_r), ld(lny_r), ld(lnz_r))
        lle = Vec3(ld(llex_r), ld(lley_r), ld(llez_r))
        lpdf_a = ld(lpdfa_r)
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
        w_mis = (power_heuristic(pdf_sa, bsdf_pdf)
                 if opts.indirect_lighting_bsdf
                 else jnp.ones(shape, jnp.float32))
        cos_s = jnp.abs(wo_loc.z)
        able = (
            valid & (cos_l > 1e-6) & (pdf_sa > 1e-12)
            & ((fd.x + fd.y + fd.z + fg.x + fg.y + fg.z) > 0.0)
        )
        sh_o = _offset_origin(pos, gn, wo, eps)
        sh_d = wo
        sh_tmax = jnp.where(able, dist * (1.0 - 1e-3), -1.0)
        scale = cos_s * w_mis / jnp.maximum(pdf_sa, 1e-12)
        nee3 = Vec3(
            (fd.x + fg.x) * thr.x * lle.x * scale,
            (fd.y + fg.y) * thr.y * lle.y * scale,
            (fd.z + fg.z) * thr.z * lle.z * scale,
        )

    # ---- BSDF scatter + RR ----
    ub0, ub1, ub2 = ld(ub0_r), ld(ub1_r), ld(ub2_r)
    s = bsdf_sample(params, wi_loc, ub0, ub1, ub2, opts.lobes,
                    opts.clearcoat, opts.glossy_model, e_fn=e_fn)
    wo_world = to_world(s.wo, t_b, b_b, sn_f)
    new_thr = Vec3(thr.x * s.g.x, thr.y * s.g.y, thr.z * s.g.z)
    new_alive = valid & s.valid & ((s.g.x + s.g.y + s.g.z) > 0.0)

    if opts.rr:
        u_rr = ld(urr_r)
        rr_on = b >= opts.rr_start_bounce
        q = jnp.clip(
            jnp.maximum(jnp.maximum(new_thr.x, new_thr.y), new_thr.z),
            0.05, 1.0)
        q = jnp.where(rr_on, q, 1.0)
        keep = u_rr < q
        new_alive = new_alive & keep
        inv_q = 1.0 / q
        new_thr = Vec3(new_thr.x * inv_q, new_thr.y * inv_q,
                       new_thr.z * inv_q)

    new_thr = Vec3(
        jnp.where(new_alive, new_thr.x, 0.0),
        jnp.where(new_alive, new_thr.y, 0.0),
        jnp.where(new_alive, new_thr.z, 0.0),
    )
    new_o = _offset_origin(pos, gn, wo_world, eps)

    ldx_o[:], ldy_o[:], ldz_o[:] = ldelta[0].x, ldelta[0].y, ldelta[0].z
    lfx_o[:], lfy_o[:], lfz_o[:] = ldelta[1].x, ldelta[1].y, ldelta[1].z
    lsx_o[:], lsy_o[:], lsz_o[:] = ldelta[2].x, ldelta[2].y, ldelta[2].z
    neex_o[:], neey_o[:], neez_o[:] = nee3.x, nee3.y, nee3.z
    shox_o[:], shoy_o[:], shoz_o[:] = sh_o.x, sh_o.y, sh_o.z
    shdx_o[:], shdy_o[:], shdz_o[:] = sh_d.x, sh_d.y, sh_d.z
    shtmax_o[:] = sh_tmax
    able_o[:] = jnp.where(able, 1.0, 0.0)
    nox_o[:], noy_o[:], noz_o[:] = new_o.x, new_o.y, new_o.z
    ndx_o[:], ndy_o[:], ndz_o[:] = wo_world.x, wo_world.y, wo_world.z
    nthrx_o[:], nthry_o[:], nthrz_o[:] = new_thr.x, new_thr.y, new_thr.z
    nalive_o[:] = jnp.where(new_alive, 1.0, 0.0)
    npdf_o[:] = s.pdf
    nchan_o[:] = channel


def shade_bounce_fused(
    tables: ShadeTables,
    opts,
    env,  # (3,) concrete env constants
    b: Array,  # traced bounce index (>= 1)
    lanes: dict,  # name -> (N,) f32 arrays (see _LANES order)
):
    """Run the fused shade kernel over all lanes. Returns dict of outputs."""
    names = _LANES
    n = lanes[names[0]].shape[0]
    n_pad = -(-n // _BLK) * _BLK
    g = n_pad // _BLK

    def prep(a):
        a = jnp.asarray(a, jnp.float32)
        return jnp.pad(a, (0, n_pad - n)).reshape(n_pad // 128, 128)

    ins = [prep(lanes[k]) for k in names]
    ins += [prep(lanes["ecoef"][:, j]) for j in range(33)]

    lane_spec = pl.BlockSpec((8, 128), lambda i: (i, 0))
    out_names = _OUTS
    kernel = functools.partial(
        _wrapped_kernel, has_lights=tables.has_lights, opts=opts,
        env=tuple(float(v) for v in env), eps=float(opts.ray_eps),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32)
                   for _ in out_names],
        grid=(g,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [lane_spec] * (len(names) + 33)
        ),
        out_specs=[lane_spec] * len(out_names),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(jnp.asarray(b, jnp.int32).reshape(1, 1), *ins)
    flat = lambda a: a.reshape(n_pad)[:n]
    return {k: flat(v) for k, v in zip(out_names, outs)}


def _wrapped_kernel(b_ref, *refs, has_lights, opts, env, eps):
    n_named = len(_LANES)
    lane_refs = refs[:n_named]
    ec_refs = refs[n_named:n_named + 33]
    out_refs = refs[n_named + 33:]
    _shade_kernel(
        b_ref, *lane_refs, ec_refs, *out_refs,
        has_lights=has_lights, opts=opts, env=env, eps=eps,
    )


_LANES = (
    "posx", "posy", "posz", "dx", "dy", "dz", "t", "valid",
    "gnx", "gny", "gnz", "snx", "sny", "snz",
    "thrx", "thry", "thrz", "prev_pdf", "channel", "alive",
    "dfx", "dfy", "dfz", "spx", "spy", "spz",
    "dtx", "dty", "dtz", "rfx", "rfy", "rfz",
    "rough", "ior", "opac",
    "emx", "emy", "emz", "pdfa_hit",
    "lpx", "lpy", "lpz", "lnx", "lny", "lnz",
    "llex", "lley", "llez", "lpdfa",
    "ub0", "ub1", "ub2", "urr",
)

_OUTS = (
    "ldx", "ldy", "ldz", "lfx", "lfy", "lfz", "lsx", "lsy", "lsz",
    "neex", "neey", "neez", "shox", "shoy", "shoz",
    "shdx", "shdy", "shdz", "shtmax", "able",
    "nox", "noy", "noz", "ndx", "ndy", "ndz",
    "nthrx", "nthry", "nthrz", "nalive", "npdf", "nchan",
)
