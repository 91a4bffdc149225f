"""Path tracer with clustered-RL (Q-learning) direct lighting.

Reference: the PT's `nee_algorithm = rl` mode (pathtracer.h:161-250 options,
pathtracer_impl.h:168-193 RL table setup + 32-frame hash refresh cadence,
direct_lighting_rl.h sampling/update wiring into shade_vertex /
solve_occlusion).

The NEE light sample is drawn from per-cell Q-mixed cluster probabilities
(integrators/rl.py); after the shadow test the observed unshadowed
contribution luminance TD-updates the cell's cluster value. MIS against
BSDF sampling uses the cell-dependent RL pdf for emissive hits. The bias
mixing keeps every emissive triangle at nonzero pdf, so the estimator stays
unbiased for any Q — learning only moves variance.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fermat_tpu.bsdf.composite import BsdfParams, f_split, sample as bsdf_sample
from fermat_tpu.core.camera import generate_camera_rays
from fermat_tpu.core.math import Vec3, dot, orthonormal_basis, to_local, to_world
from fermat_tpu.core.rng import TiledSequence
from fermat_tpu.core.sampling import power_heuristic
from fermat_tpu.integrators import rl
from fermat_tpu.integrators.pt import PTOptions, _offset_origin, _pick_tracers
from fermat_tpu.scene.lights import emitter_radiance
from fermat_tpu.scene.spatial_hash import hash_shading_point
from fermat_tpu.scene.view import SceneView

Array = jax.Array
_sg = jax.lax.stop_gradient


class PtrlOptions(NamedTuple):
    max_path_length: int = 6
    n_clusters: int = 16
    table_size: int = 1 << 14
    sampler: str = "vtl"  # "vtl" = light-BVH cut over VTLs; "tri" = morton chunks
    n_vtls: int = 1024  # VTL decomposition target (mesh_lights.cu:694)
    adapt_every: int = 8  # cluster-cut refinement cadence (0 = static cut)
    bias: float = 0.25  # uniform mixing floor (clustered_rl bias term)
    learning_rate: float = 0.15
    cell_size: float = 0.1
    rr: bool = True
    rr_start_bounce: int = 2
    ray_eps: float = 1.0e-4
    tracer: str = "auto"
    dims_per_bounce: int = 8
    lobes: tuple = (True, True, True, True)


class PtrlState(NamedTuple):
    qstate: rl.RLState


def init_state(view: SceneView, opts: PtrlOptions) -> PtrlState:
    return PtrlState(qstate=rl.RLState.create(opts.table_size, opts.n_clusters))


def render_pass(
    view: SceneView,
    opts: PtrlOptions,
    clusters: rl.RLClusters,
    res_x: int,
    res_y: int,
    instance: Array,
    state: PtrlState,
    seed: int = 0,
) -> Tuple[Vec3, PtrlState, Array]:
    n = res_x * res_y
    pix = jnp.arange(n, dtype=jnp.uint32)
    seq = TiledSequence.create(seed=seed).set_instance(instance)
    closest, anyhit = _pick_tracers(view, PTOptions(tracer=opts.tracer))
    eps = opts.ray_eps
    n_rays = jnp.zeros((), jnp.float32)
    qstate = state.qstate

    jx, jy = seq.sample_2d(pix, jnp.uint32(0))
    o, d, _ = generate_camera_rays(view.camera, res_x, res_y, jx, jy)

    thr = Vec3.full((n,), 1.0, 1.0, 1.0)
    radiance = Vec3.zeros((n,))
    alive = jnp.ones(n, bool)
    prev_pdf = jnp.zeros(n, jnp.float32)
    prev_cell = jnp.zeros(n, jnp.int32)
    kc = opts.table_size * opts.n_clusters
    r_sums = jnp.zeros(kc, jnp.float32)
    r_cnts = jnp.zeros(kc, jnp.float32)

    for b in range(opts.max_path_length):
        hit = closest(o, d, jnp.float32(eps), jnp.float32(3.0e38), alive)
        n_rays = n_rays + jnp.sum(alive.astype(jnp.float32))
        valid = alive & hit.hit_mask
        tri_c = jnp.maximum(hit.tri, 0)
        pos, gn, sn, uv, mat_id = view.mesh.interpolate(tri_c, hit.u, hit.v)
        wi = -d
        flip = jnp.where(dot(gn, wi) < 0.0, -1.0, 1.0)
        gn_f = gn * flip
        sn_f = sn * flip
        t_b, b_b = orthonormal_basis(sn_f)
        wi_loc = to_local(wi, t_b, b_b, sn_f)
        mats = view.mesh.materials.gather(mat_id)
        params = BsdfParams.from_materials(mats)

        # escaped rays pick up the environment (weight 1 — RL NEE samples
        # only VTL/mesh emitters, never the env)
        from fermat_tpu.scene.envmap import scene_env_radiance

        missed = alive & ~hit.hit_mask
        env_l = scene_env_radiance(view, Vec3(d.x, d.y, d.z))
        radiance = Vec3(
            radiance.x + jnp.where(missed, thr.x * env_l.x, 0.0),
            radiance.y + jnp.where(missed, thr.y * env_l.y, 0.0),
            radiance.z + jnp.where(missed, thr.z * env_l.z, 0.0),
        )

        # emissive w/ MIS against the RL pdf of the PREVIOUS cell
        front_e = dot(gn, wi) > 0.0
        le = Vec3(
            jnp.where(front_e, mats.emissive.x, 0.0),
            jnp.where(front_e, mats.emissive.y, 0.0),
            jnp.where(front_e, mats.emissive.z, 0.0),
        )
        is_vtl = hasattr(clusters, "rows")  # VTLView vs RLClusters (static)
        if b == 0:
            w_mis = jnp.ones(n, jnp.float32)
        else:
            if is_vtl:
                pdf_area = rl.pdf_area_of_vtl(
                    clusters, qstate, prev_cell, tri_c, hit.u, hit.v, opts.bias
                )
            else:
                pdf_area = rl.pdf_area_of(clusters, qstate, prev_cell, tri_c, opts.bias)
            t_safe = jnp.where(valid, hit.t, 1.0)
            cos_l = jnp.abs(dot(gn, wi))
            pdf_sa = pdf_area * t_safe * t_safe / jnp.maximum(cos_l, 1e-8)
            w_mis = _sg(power_heuristic(prev_pdf, pdf_sa))
        radiance = Vec3(
            radiance.x + jnp.where(valid, thr.x * le.x * w_mis, 0.0),
            radiance.y + jnp.where(valid, thr.y * le.y * w_mis, 0.0),
            radiance.z + jnp.where(valid, thr.z * le.z * w_mis, 0.0),
        )

        # RL NEE (direct_lighting_rl.h::preprocess_vertex + sample)
        base_dim = jnp.uint32(2 + b * opts.dims_per_bounce)
        uj = seq.sample_1d(pix, base_dim + jnp.uint32(7))
        cell, _key = hash_shading_point(
            pos, sn_f, view.camera.eye, opts.cell_size, opts.table_size, uj
        )
        ul0, ul1, ul2 = seq.sample_3d(pix, base_dim)
        ul3 = seq.sample_1d(pix, base_dim + jnp.uint32(5))
        if is_vtl:
            lpos, ln, lle, lpdf_a, ltri, lcl, _slot = rl.sample_vtl(
                clusters, qstate, cell, ul0, ul1, ul2, ul3, opts.bias
            )
        else:
            lpos, ln, lle, lpdf_a, ltri, lcl = rl.sample(
                clusters, qstate, view.mesh, cell, ul0, ul1, ul2, ul3, opts.bias
            )
        to_l = lpos - pos
        dist2 = jnp.maximum(dot(to_l, to_l), 1e-12)
        dist = jnp.sqrt(dist2)
        wo = to_l * (1.0 / dist)
        cos_l = dot(ln, -wo)
        wo_loc = to_local(wo, t_b, b_b, sn_f)
        fd, fg, bsdf_pdf = f_split(params, wi_loc, wo_loc, opts.lobes)
        pdf_sa = _sg(lpdf_a * dist2 / jnp.maximum(jnp.abs(cos_l), 1e-8))
        w_mis = _sg(power_heuristic(pdf_sa, bsdf_pdf))
        cos_s = jnp.abs(wo_loc.z)
        able = (
            valid & (cos_l > 1e-6) & (pdf_sa > 1e-12)
            & ((fd.x + fd.y + fd.z + fg.x + fg.y + fg.z) > 0.0)
        )
        so = _offset_origin(pos, gn, wo, eps)
        occluded = anyhit(so, wo, jnp.float32(0.0), dist * (1.0 - 1e-3), able)
        n_rays = n_rays + jnp.sum(able.astype(jnp.float32))
        lit = able & ~occluded
        scale = cos_s * w_mis / jnp.maximum(pdf_sa, 1e-12)
        cx = (fd.x + fg.x) * lle.x * scale
        cy = (fd.y + fg.y) * lle.y * scale
        cz = (fd.z + fg.z) * lle.z * scale
        radiance = Vec3(
            radiance.x + jnp.where(lit, thr.x * cx, 0.0),
            radiance.y + jnp.where(lit, thr.y * cy, 0.0),
            radiance.z + jnp.where(lit, thr.z * cz, 0.0),
        )

        # TD reward accumulation (applied AFTER the pass so Q — and with it
        # every MIS pdf — stays fixed within the pass; the emissive hit at
        # bounce b+1 then exactly matches the NEE pdf of bounce b)
        reward = jnp.where(lit, 0.2126 * cx + 0.7152 * cy + 0.0722 * cz, 0.0)
        flat = jnp.where(able, cell * opts.n_clusters + lcl, 0)
        r_sums = r_sums.at[flat].add(_sg(jnp.where(able, reward, 0.0)))
        r_cnts = r_cnts.at[flat].add(able.astype(jnp.float32))

        # scatter + RR
        ub0, ub1, ub2 = seq.sample_3d(pix, base_dim + jnp.uint32(3))
        s = bsdf_sample(params, wi_loc, ub0, ub1, ub2, opts.lobes)
        wo_world = to_world(s.wo, t_b, b_b, sn_f)
        thr = Vec3(thr.x * s.g.x, thr.y * s.g.y, thr.z * s.g.z)
        alive = valid & s.valid
        if opts.rr and b >= opts.rr_start_bounce:
            u_rr = seq.sample_1d(pix, base_dim + jnp.uint32(6))
            q = _sg(jnp.clip(jnp.maximum(jnp.maximum(thr.x, thr.y), thr.z), 0.05, 1.0))
            keep = u_rr < q
            alive = alive & keep
            thr = thr * (1.0 / q)
        thr = Vec3(
            jnp.where(alive, thr.x, 0.0),
            jnp.where(alive, thr.y, 0.0),
            jnp.where(alive, thr.z, 0.0),
        )
        prev_pdf = s.pdf
        prev_cell = cell
        o = _offset_origin(pos, gn, wo_world, eps)
        d = wo_world

    # end-of-pass TD update (clustered_rl.cu update() analog)
    k, c = qstate.q.shape
    mean_r = r_sums / jnp.maximum(r_cnts, 1.0)
    seen = (r_cnts > 0).reshape(k, c)
    q_new = jnp.where(
        seen, (1.0 - opts.learning_rate) * qstate.q
        + opts.learning_rate * mean_r.reshape(k, c), qstate.q
    )
    return radiance, PtrlState(qstate=rl.RLState(q=q_new)), n_rays
