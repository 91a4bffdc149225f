"""Device-side LBVH build: morton sort + Karras radix tree, pure JAX.

Reference: cugar/bvh/cuda/lbvh_builder.h:60-166 (morton + radix tree build),
cugar/radixtree/cuda/radixtree.h (Karras 2012 topology), cugar/tree/reduce.h
(bottom-up bbox reduction), validated the same way lbvh_test.cu:59-240 does —
against the host builder via traversal equivalence.

Everything is vectorized over nodes with fixed-iteration binary searches
(30-bit codes -> <= 32 steps), so the whole build jits into one XLA program:
  * morton codes in the normalized scene box + argsort
  * per internal node: direction, range, split via common-prefix searches
    (ties broken by index bits, the standard Karras augmentation)
  * parent pointers -> iterative bottom-up bbox reduce (log-depth passes)
  * skip links + first-child arrays via parent-pointer fixpoint, yielding
    the same stackless traversal contract as the host builder (BvhView).

Node indexing: internal nodes 0..N-2, leaves N-1..2N-2 (leaf i holds sorted
primitive i; leaf_size == 1).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fermat_tpu.accel.bvh import BvhView
from fermat_tpu.core.morton import morton3d

Array = jax.Array
_U32 = jnp.uint32


def _clz32(x: Array) -> Array:
    """Count leading zeros of uint32 (bit smear + popcount)."""
    x = x.astype(_U32)
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    return (32 - jax.lax.population_count(x).astype(jnp.int32)).astype(jnp.int32)


def build_lbvh(
    cx: Array, cy: Array, cz: Array,
    lo_x: Array, lo_y: Array, lo_z: Array,
    hi_x: Array, hi_y: Array, hi_z: Array,
) -> Tuple[BvhView, Array]:
    """Build from per-primitive centroids + aabbs (all (T,) arrays).

    Returns (BvhView with leaf_size=1, sorted primitive order).
    """
    n = cx.shape[0]
    # scene box normalization
    smin = jnp.stack([jnp.min(lo_x), jnp.min(lo_y), jnp.min(lo_z)])
    smax = jnp.stack([jnp.max(hi_x), jnp.max(hi_y), jnp.max(hi_z)])
    inv = 1.0 / jnp.maximum(smax - smin, 1e-12)
    codes = morton3d(
        (cx - smin[0]) * inv[0], (cy - smin[1]) * inv[1], (cz - smin[2]) * inv[2]
    )
    order = jnp.argsort(codes).astype(jnp.int32)
    scodes = codes[order]

    idx32 = jnp.arange(n, dtype=_U32)

    def delta(i: Array, j: Array) -> Array:
        """Common-prefix length of sorted codes i, j; -1 outside range.

        Equal codes fall through to index bits (augmented 62-bit keys)."""
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        a = scodes[i]
        b = scodes[jc]
        x = a ^ b
        d_code = _clz32(x)
        d_idx = 32 + _clz32(i.astype(_U32) ^ jc.astype(_U32))
        d = jnp.where(x == 0, d_idx, d_code)
        return jnp.where(valid, d, -1)

    # ---- Karras internal-node topology (radixtree.h) ----
    i = jnp.arange(max(n - 1, 1), dtype=jnp.int32)
    d_dir = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d_dir = jnp.where(d_dir == 0, 1, d_dir)
    delta_min = delta(i, i - d_dir)

    # exponential upper bound on the range length
    def grow(_, lmax):
        probe = delta(i, i + lmax * d_dir)
        return jnp.where(probe > delta_min, lmax * 2, lmax)

    lmax = jax.lax.fori_loop(0, 31, grow, jnp.full_like(i, 2))

    # binary search the exact other end j
    def shrink(k, carry):
        l, t = carry
        t = jnp.maximum(t // 2, 1)
        probe = delta(i, i + (l + t) * d_dir)
        l = jnp.where(probe > delta_min, l + t, l)
        return (l, t)

    l, _ = jax.lax.fori_loop(
        0, 32, shrink, (jnp.zeros_like(i), jnp.maximum(lmax, 1))
    )
    j = i + l * d_dir
    delta_node = delta(i, j)

    # binary search the split point
    def split_step(k, carry):
        s, t, rem = carry
        t = (rem + 1) // 2
        probe = delta(i, i + (s + t) * d_dir)
        s = jnp.where(probe > delta_node, s + t, s)
        rem = jnp.where(rem > 1, t, 0)
        return (s, t, rem)

    s, _, _ = jax.lax.fori_loop(
        0, 32, split_step, (jnp.zeros_like(i), jnp.zeros_like(i), l)
    )
    gamma = i + s * d_dir + jnp.minimum(d_dir, 0)

    rng_lo = jnp.minimum(i, j)
    rng_hi = jnp.maximum(i, j)
    # child is a leaf when its range collapses; leaves live at n-1+k
    left_is_leaf = rng_lo == gamma
    right_is_leaf = rng_hi == gamma + 1
    left = jnp.where(left_is_leaf, (n - 1) + gamma, gamma)
    right = jnp.where(right_is_leaf, (n - 1) + gamma + 1, gamma + 1)

    n_nodes = 2 * n - 1
    # parent + sibling + is_left tables
    parent = jnp.full(n_nodes, -1, jnp.int32)
    sibling = jnp.full(n_nodes, -1, jnp.int32)
    is_left = jnp.zeros(n_nodes, bool)
    if n > 1:
        parent = parent.at[left].set(i).at[right].set(i)
        sibling = sibling.at[left].set(right).at[right].set(left)
        is_left = is_left.at[left].set(True)

    # ---- bottom-up bbox reduction (tree/reduce.h) ----
    bl_x = jnp.zeros(n_nodes)
    bl_y = jnp.zeros(n_nodes)
    bl_z = jnp.zeros(n_nodes)
    bh_x = jnp.zeros(n_nodes)
    bh_y = jnp.zeros(n_nodes)
    bh_z = jnp.zeros(n_nodes)
    leaf_ids = jnp.arange(n, dtype=jnp.int32) + (n - 1)
    bl_x = bl_x.at[leaf_ids].set(lo_x[order])
    bl_y = bl_y.at[leaf_ids].set(lo_y[order])
    bl_z = bl_z.at[leaf_ids].set(lo_z[order])
    bh_x = bh_x.at[leaf_ids].set(hi_x[order])
    bh_y = bh_y.at[leaf_ids].set(hi_y[order])
    bh_z = bh_z.at[leaf_ids].set(hi_z[order])

    if n > 1:
        def reduce_pass(_, boxes):
            blx, bly, blz, bhx, bhy, bhz = boxes
            lL, rL = left, right
            blx = blx.at[i].set(jnp.minimum(blx[lL], blx[rL]))
            bly = bly.at[i].set(jnp.minimum(bly[lL], bly[rL]))
            blz = blz.at[i].set(jnp.minimum(blz[lL], blz[rL]))
            bhx = bhx.at[i].set(jnp.maximum(bhx[lL], bhx[rL]))
            bhy = bhy.at[i].set(jnp.maximum(bhy[lL], bhy[rL]))
            bhz = bhz.at[i].set(jnp.maximum(bhz[lL], bhz[rL]))
            return (blx, bly, blz, bhx, bhy, bhz)

        # 64 passes cover any radix-tree height for n <= 2^30 (the index
        # tie-break keeps duplicate-code runs balanced)
        boxes = (bl_x, bl_y, bl_z, bh_x, bh_y, bh_z)
        boxes = jax.lax.fori_loop(0, 64, reduce_pass, boxes)
        bl_x, bl_y, bl_z, bh_x, bh_y, bh_z = boxes

    # ---- skip links: skip(x) = sibling if left child else skip(parent) ----
    skip = jnp.full(n_nodes, -1, jnp.int32)
    if n > 1:
        def skip_pass(_, sk):
            par = parent
            par_skip = jnp.where(par >= 0, sk[jnp.maximum(par, 0)], -1)
            new = jnp.where(is_left, sibling, par_skip)
            new = jnp.where(par >= 0, new, -1)  # root keeps -1
            return new.astype(jnp.int32)

        skip = jax.lax.fori_loop(0, 64, skip_pass, skip)

    first_child = jnp.zeros(n_nodes, jnp.int32)
    if n > 1:
        first_child = first_child.at[i].set(left)
    is_leaf_arr = jnp.arange(n_nodes) >= (n - 1)
    prim_start = jnp.where(
        is_leaf_arr, jnp.arange(n_nodes, dtype=jnp.int32) - (n - 1), 0
    )

    view = BvhView(
        lo_x=bl_x.astype(jnp.float32), lo_y=bl_y.astype(jnp.float32),
        lo_z=bl_z.astype(jnp.float32),
        hi_x=bh_x.astype(jnp.float32), hi_y=bh_y.astype(jnp.float32),
        hi_z=bh_z.astype(jnp.float32),
        skip=skip,
        prim_start=prim_start,
        is_leaf=is_leaf_arr,
        prims=order,
        leaf_size=1,
        child=first_child,
    )
    if n == 1:
        # single-leaf degenerate tree
        view = BvhView(
            lo_x=lo_x, lo_y=lo_y, lo_z=lo_z, hi_x=hi_x, hi_y=hi_y, hi_z=hi_z,
            skip=jnp.full(1, -1, jnp.int32),
            prim_start=jnp.zeros(1, jnp.int32),
            is_leaf=jnp.ones(1, bool),
            prims=jnp.zeros(1, jnp.int32),
            leaf_size=1,
            child=jnp.zeros(1, jnp.int32),
        )
    return view, order


def build_lbvh_for_mesh(mesh_view) -> BvhView:
    """LBVH over a MeshView's triangles (device-side, jittable)."""
    p0, e1, e2 = mesh_view.p0, mesh_view.e1, mesh_view.e2
    p1x, p1y, p1z = p0.x + e1.x, p0.y + e1.y, p0.z + e1.z
    p2x, p2y, p2z = p0.x + e2.x, p0.y + e2.y, p0.z + e2.z
    lo_x = jnp.minimum(jnp.minimum(p0.x, p1x), p2x) - 1e-7
    lo_y = jnp.minimum(jnp.minimum(p0.y, p1y), p2y) - 1e-7
    lo_z = jnp.minimum(jnp.minimum(p0.z, p1z), p2z) - 1e-7
    hi_x = jnp.maximum(jnp.maximum(p0.x, p1x), p2x) + 1e-7
    hi_y = jnp.maximum(jnp.maximum(p0.y, p1y), p2y) + 1e-7
    hi_z = jnp.maximum(jnp.maximum(p0.z, p1z), p2z) + 1e-7
    cx = (p0.x + p1x + p2x) / 3.0
    cy = (p0.y + p1y + p2y) / 3.0
    cz = (p0.z + p1z + p2z) / 3.0
    view, _ = build_lbvh(cx, cy, cz, lo_x, lo_y, lo_z, hi_x, hi_y, hi_z)
    return view
