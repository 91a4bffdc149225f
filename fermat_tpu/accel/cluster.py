"""Two-level clustered acceleration structure for the Pallas trace kernels.

Reference analog: the RTX BVH behind RTContext (src/rt.cpp:284-325 TRBVH
build; traversal rt.cpp:558-650). A GPU BVH walks per-thread stacks —
the exact shape a TPU cannot vectorize (per-lane dynamic gathers). The
TPU-native equivalent keeps the *hierarchy* but re-shapes it for the VPU
and the memory system:

  * triangles are morton-ordered into 128-triangle CLUSTERS (one VPU lane
    tile per cluster; GROUP=8 clusters only pads the cluster count),
  * the packed triangle data lives in HBM as a single cluster-major
    (C_pad, 16, 128) array so one cluster is one tile-aligned (16, 128)
    DMA rectangle at an arbitrary (majormost-dim) offset, staged into
    VMEM scratch on demand,
  * each CLUSTER carries an AABB; the trace kernel slab-tests every ray
    block against ALL cluster boxes as dense (rays x 128) tiles — a
    vectorized, branch-free "top level" — then visits clusters in
    near-to-far order, running the proven dense Moller-Trumbore tile test
    only while the front-to-back bound says a ray can still improve
    (lax.cond per cluster skips both the DMA and the math).

This preserves the O(log)-ish culling of a BVH for coherent ray blocks
while every executed instruction stays a dense (BLK, 128) vector op, and
scene size is bounded by HBM (16 GB ≈ 400 M triangles), not VMEM.
Original triangle ids ride along as an f32 row so the kernel needs no
gather to un-permute its hit ids (exact for meshes < 2^24 triangles).

Build is host-side numpy (one-time, like the SAH builder in accel/bvh.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

CLUSTER = 128  # triangles per cluster == VPU lane width
GROUP = 8  # clusters per group == sublanes per DMA tile


class ClusterView(NamedTuple):
    """Device view: packed permuted soup (HBM) + cluster AABBs (VMEM)."""

    # (C_pad, 16, 128) f32, C_pad = n_groups * 8, CLUSTER-MAJOR so a
    # single cluster is one dynamic-offset DMA slice along the untiled
    # majormost dim (a (10, C_pad, 128) layout needs sublane-aligned
    # offsets in dim 1 — arbitrary cluster ids silently corrupt the copy
    # on hardware). Rows on axis 1: p0x p0y p0z e1x e1y e1z e2x e2y e2z
    # oid + 6 zero-pad rows (copy extents must be full (8, 128) tiles —
    # a (10, 128) per-cluster DMA crashes the TPU worker). Padding
    # triangles are degenerate (det == 0), oid == -1.
    tri: jax.Array
    # (1, Cp) per-CLUSTER bounds, Cp = ceil(C_pad/128)*128; padding empty
    lo_x: jax.Array
    lo_y: jax.Array
    lo_z: jax.Array
    hi_x: jax.Array
    hi_y: jax.Array
    hi_z: jax.Array
    # ORIGINAL-ORDER triangle soup (views of the mesh arrays, no copy):
    # the round-5 kernel extracts only (t, oid) per visit; barycentric
    # u/v are recomputed outside from the winning oid via these.
    p0: object = None  # Vec3 of (T,) arrays
    e1: object = None
    e2: object = None

    @property
    def n_clusters(self) -> int:
        return self.tri.shape[0]

    @property
    def n_groups(self) -> int:
        return self.tri.shape[0] // GROUP


class SubclusterView(NamedTuple):
    """Round-5 fine-granularity acceleration view (32-triangle leaves).

    The frontier kernel's MT tile burns a full 128-lane vreg row per
    visit regardless of how many lanes hold useful triangles, so finer
    leaves only pay off if several can share one tile. Solution: each
    L32 subcluster's packed triangle tile is stored at ALL FOUR lane
    phases (tris at lanes [32p, 32p+32)), so the kernel can DMA the
    4 nearest eligible subclusters — one per phase — and merge them
    into ONE dense (BLK, 128) Moller-Trumbore tile with 3 lane-group
    selects per component row. Needed-set probe: L32 block unions are
    ~2.1x the L128 unions at 1/4 the triangles each -> ~1.9x fewer
    pair tests on the big_room incoherent workload.
    """

    # (Nsub * 4, 16, 128) f32: tile [s*4 + p] holds subcluster s's <=32
    # triangles at lanes [32p, 32p+32) (rows: p0 e1 e2 oid + 6 pad rows;
    # all other lanes degenerate det=0 / oid=-1)
    tri4: jax.Array
    # (1, Cs_pad) per-SUBCLUSTER bounds (padding boxes empty/inverted)
    lo_x: jax.Array
    lo_y: jax.Array
    lo_z: jax.Array
    hi_x: jax.Array
    hi_y: jax.Array
    hi_z: jax.Array
    # ORIGINAL-ORDER triangle soup (views, no copy) for u/v recompute
    p0: object = None
    e1: object = None
    e2: object = None

    @property
    def n_subclusters(self) -> int:
        return self.tri4.shape[0] // 4


SUB = 32  # triangles per subcluster; 4 phases fill the 128-lane tile


def build_subclusters(mesh_view) -> SubclusterView:
    """SAH leaves at max 32 triangles, 4-phase-replicated packed tiles."""
    p0 = np.stack([np.asarray(mesh_view.p0.x), np.asarray(mesh_view.p0.y),
                   np.asarray(mesh_view.p0.z)], axis=1)
    e1 = np.stack([np.asarray(mesh_view.e1.x), np.asarray(mesh_view.e1.y),
                   np.asarray(mesh_view.e1.z)], axis=1)
    e2 = np.stack([np.asarray(mesh_view.e2.x), np.asarray(mesh_view.e2.y),
                   np.asarray(mesh_view.e2.z)], axis=1)
    v1 = p0 + e1
    v2 = p0 + e2
    cent = (p0 + v1 + v2) / 3.0
    leaves = _sah_leaves(p0, e1, e2, cent, max_size=SUB)
    ns = len(leaves)

    slot = np.full((ns, SUB), -1, np.int64)
    for i, l in enumerate(leaves):
        slot[i, : l.size] = l
    flat = slot.reshape(-1)
    valid = flat >= 0
    take = np.where(valid, flat, 0)

    def comp(a):
        return np.where(valid, a[take], 0.0).astype(np.float32)

    comps = [comp(p0[:, 0]), comp(p0[:, 1]), comp(p0[:, 2]),
             comp(e1[:, 0]), comp(e1[:, 1]), comp(e1[:, 2]),
             comp(e2[:, 0]), comp(e2[:, 1]), comp(e2[:, 2]),
             np.where(valid, flat, -1).astype(np.float32)]
    rows = np.stack([c.reshape(ns, SUB) for c in comps], axis=1)  # (ns,10,32)

    # 4-phase replication: tile [s*4 + p] = rows placed at lanes
    # [32p, 32p+32), zero elsewhere (zero rows are degenerate: det == 0);
    # the oid row must read -1 off-phase so stale lanes never win ids.
    tri4 = np.zeros((ns, 4, 16, 128), np.float32)
    tri4[:, :, 9, :] = -1.0
    for p in range(4):
        tri4[:, p, :10, 32 * p: 32 * p + 32] = rows
    tri4 = tri4.reshape(ns * 4, 16, 128)

    # per-subcluster boxes over all three vertices of real triangles
    # (each comp is flat (ns*SUB,): reshape FIRST, then stack components —
    # stacking flats and reshaping would interleave x/y/z across slots)
    per3 = lambda cs3: np.stack([c.reshape(ns, SUB) for c in cs3], axis=1)
    p0p = per3(comps[0:3])
    e1p = per3(comps[3:6])
    e2p = per3(comps[6:9])
    v1p = p0p + e1p
    v2p = p0p + e2p
    big = 3.0e38
    vmask = valid.reshape(ns, 1, SUB)
    mins = np.where(vmask, np.minimum(np.minimum(p0p, v1p), v2p), big)
    maxs = np.where(vmask, np.maximum(np.maximum(p0p, v1p), v2p), -big)
    c_lo = mins.min(axis=2)
    c_hi = maxs.max(axis=2)

    cs = -(-ns // 128) * 128
    pad = cs - ns
    c_lo = np.concatenate([c_lo, np.full((pad, 3), big, np.float32)])
    c_hi = np.concatenate([c_hi, np.full((pad, 3), -big, np.float32)])

    r = lambda a: jnp.asarray(a.astype(np.float32)).reshape(1, -1)
    return SubclusterView(
        tri4=jnp.asarray(tri4),
        lo_x=r(c_lo[:, 0]), lo_y=r(c_lo[:, 1]), lo_z=r(c_lo[:, 2]),
        hi_x=r(c_hi[:, 0]), hi_y=r(c_hi[:, 1]), hi_z=r(c_hi[:, 2]),
        p0=mesh_view.p0, e1=mesh_view.e1, e2=mesh_view.e2,
    )


def _morton3d_np(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """10-bit-per-axis 3D morton codes (cugar/bits/morton.h analog)."""

    def expand(v):
        v = v.astype(np.uint64) & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (expand(x) << 2) | (expand(y) << 1) | expand(z)


def _median_leaves(cent: np.ndarray, max_size: int = CLUSTER) -> list:
    """Recursive longest-axis median split of triangle centroids.

    Returns a DFS-ordered list of index arrays, each <= max_size. Unlike
    morton slicing (which packs 128 CONSECUTIVE code-order triangles and
    can straddle large spatial jumps), median leaves are spatially tight
    boxes — measured on big_room they cut the frontier tracer's per-block
    visit unions by reducing cluster AABB volume/overlap."""
    out = []
    stack = [np.arange(cent.shape[0], dtype=np.int64)]
    while stack:
        ids = stack.pop()
        if ids.size <= max_size:
            out.append(ids)
            continue
        c = cent[ids]
        ext = c.max(axis=0) - c.min(axis=0)
        ax = int(np.argmax(ext))
        srt = ids[np.argsort(c[:, ax], kind="stable")]
        mid = ids.size // 2
        stack.append(srt[mid:])
        stack.append(srt[:mid])
    return out


def _sah_leaves(p0, e1, e2, cent, max_size: int = CLUSTER) -> list:
    """SAH-guided clusters: run the binned-SAH recursion (accel/bvh.py,
    cugar/bvh/bvh_sah_builder.h analog) with leaf_size = CLUSTER and take
    its LEAVES as clusters. SAH minimizes sum(area x count), i.e. exactly
    the expected number of (random) rays entering each cluster box — the
    quantity the frontier tracer's visit count integrates. Costs more
    interior padding than morton slicing (leaves rarely fill to 128) but
    each visit's box is tighter and overlaps less."""
    from fermat_tpu.accel.bvh import build_bvh

    v1 = p0 + e1
    v2 = p0 + e2
    lo = np.minimum(np.minimum(p0, v1), v2)
    hi = np.maximum(np.maximum(p0, v1), v2)
    _view, slots = build_bvh(cent, lo, hi, leaf_size=max_size)
    slots = slots.reshape(-1, max_size)  # DFS leaves, -1 padded
    leaves = [row[row >= 0].astype(np.int64) for row in slots]

    # greedy DFS-order merge: SAH leaves average ~60-70% fill; merging
    # DFS-consecutive leaves (spatial siblings) while (a) the union stays
    # <= CLUSTER and (b) the union box doesn't balloon (area <= 1.4x the
    # sum) recovers most of morton's packing without giving back the
    # tight-box win.
    def box(ids):
        return lo[ids].min(0), hi[ids].max(0)

    def area(b):
        d = np.maximum(b[1] - b[0], 0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    import os

    gate = float(os.environ.get("FERMAT_SAH_MERGE", "1.4"))
    merged = []
    cur = leaves[0]
    cb = box(cur)
    for nxt in leaves[1:]:
        if cur.size + nxt.size <= max_size:
            nb = box(nxt)
            ub = (np.minimum(cb[0], nb[0]), np.maximum(cb[1], nb[1]))
            if area(ub) <= gate * (area(cb) + area(nb)):
                cur = np.concatenate([cur, nxt])
                cb = ub
                continue
        merged.append(cur)
        cur, cb = nxt, box(nxt)
    merged.append(cur)
    return merged


def build_clusters(mesh_view, method: str = None) -> ClusterView:
    """Partition triangles into <=128-wide clusters / 8-cluster groups.

    method="median": recursive longest-axis median split (tight boxes,
    interior -1 padding where a leaf holds < 128 triangles).
    method="morton": 128-consecutive slices of the morton order (fully
    packed, looser boxes) — the round-2 behavior, kept for A/B.
    method="sah": binned-SAH leaves + greedy DFS merge (round 4).

    Default: sah — hardware A/B (tools/tpu_sah_ab.py, round 4): -18%
    total AABB area vs morton; big_room full pass 3.11 -> 2.96 s and
    bathroom2 7.65 -> 7.54 s with EXACT images. (Round-3's median-split
    lost to morton — +31% clusters and interior-padding MT waste — but
    SAH's area objective matches the frontier tracer's visit count, and
    the DFS merge recovers most of the packing.) Override per-process
    with FERMAT_CLUSTER_METHOD for experiments.
    """
    import os

    if method is None:
        method = os.environ.get("FERMAT_CLUSTER_METHOD", "sah")
    p0 = np.stack([np.asarray(mesh_view.p0.x), np.asarray(mesh_view.p0.y),
                   np.asarray(mesh_view.p0.z)], axis=1)
    e1 = np.stack([np.asarray(mesh_view.e1.x), np.asarray(mesh_view.e1.y),
                   np.asarray(mesh_view.e1.z)], axis=1)
    e2 = np.stack([np.asarray(mesh_view.e2.x), np.asarray(mesh_view.e2.y),
                   np.asarray(mesh_view.e2.z)], axis=1)
    t = p0.shape[0]
    v1 = p0 + e1
    v2 = p0 + e2
    cent = (p0 + v1 + v2) / 3.0

    if method == "sah":
        leaves = _sah_leaves(p0, e1, e2, cent)
    elif method == "median":
        leaves = _median_leaves(cent)
    else:
        lo = cent.min(axis=0)
        hi = cent.max(axis=0)
        ext = np.maximum(hi - lo, 1e-12)
        q = np.clip(((cent - lo) / ext) * 1023.0, 0, 1023).astype(np.uint32)
        code = _morton3d_np(q[:, 0], q[:, 1], q[:, 2])
        order = np.argsort(code, kind="stable").astype(np.int64)
        leaves = [order[s:s + CLUSTER] for s in range(0, t, CLUSTER)]

    n_clusters = len(leaves)
    c_pad = -(-n_clusters // GROUP) * GROUP  # clusters padded to group size
    tp = c_pad * CLUSTER

    # slot map: (c_pad, CLUSTER) original triangle id per lane, -1 = pad
    slot = np.full((c_pad, CLUSTER), -1, np.int64)
    for i, l in enumerate(leaves):
        slot[i, : l.size] = l
    flat = slot.reshape(-1)
    valid = flat >= 0
    take = np.where(valid, flat, 0)

    def comp(a):
        return np.where(valid, a[take], 0.0).astype(np.float32)

    comps = [comp(p0[:, 0]), comp(p0[:, 1]), comp(p0[:, 2]),
             comp(e1[:, 0]), comp(e1[:, 1]), comp(e1[:, 2]),
             comp(e2[:, 0]), comp(e2[:, 1]), comp(e2[:, 2]),
             np.where(valid, flat, -1).astype(np.float32)]
    # pad the 10 component rows to 16 = two full (8, 128) f32 tiles: DMA
    # copy extents in the (sublane, lane) dims must be tile multiples — a
    # (10, 128) per-cluster copy crashed the TPU worker outright
    comps = comps + [np.zeros(tp, np.float32)] * 6
    tri = np.stack([c.astype(np.float32).reshape(c_pad, CLUSTER) for c in comps], axis=1)

    # per-CLUSTER bboxes over all three vertices (empty box for padding).
    # Cluster granularity (128 tris) is the culling unit: group-level
    # (1024-tri) boxes proved too coarse — room-scale ray blocks hit most
    # group AABBs and the tracer degenerated toward brute force (round-2
    # big_room measurements, STATUS.md).
    p0p = np.stack(comps[0:3], 1)
    e1p = np.stack(comps[3:6], 1)
    e2p = np.stack(comps[6:9], 1)
    v1p = p0p + e1p
    v2p = p0p + e2p
    big = 3.0e38
    mins = np.where(valid[:, None], np.minimum(np.minimum(p0p, v1p), v2p), big)
    maxs = np.where(valid[:, None], np.maximum(np.maximum(p0p, v1p), v2p), -big)
    c_lo = mins.reshape(c_pad, CLUSTER, 3).min(axis=1)
    c_hi = maxs.reshape(c_pad, CLUSTER, 3).max(axis=1)

    cp = -(-c_pad // 128) * 128
    cpad = cp - c_pad
    c_lo = np.concatenate([c_lo, np.full((cpad, 3), big, np.float32)])
    c_hi = np.concatenate([c_hi, np.full((cpad, 3), -big, np.float32)])

    r = lambda a: jnp.asarray(a.astype(np.float32)).reshape(1, -1)
    return ClusterView(
        tri=jnp.asarray(tri),
        lo_x=r(c_lo[:, 0]), lo_y=r(c_lo[:, 1]), lo_z=r(c_lo[:, 2]),
        hi_x=r(c_hi[:, 0]), hi_y=r(c_hi[:, 1]), hi_z=r(c_hi[:, 2]),
        p0=mesh_view.p0, e1=mesh_view.e1, e2=mesh_view.e2,
    )
