"""Measure per-block needed-set sizes at different cluster granularities.

The frontier tracer's work is (block visit union) x (tile pairs/visit).
A visit's MT tile burns a full 128-lane vreg row regardless of how many
lanes hold useful triangles — so the only way to cut MT work is fewer
or SHORTER (sublane-dim) tiles. This probe computes, for leaf sizes
128/64/32/16, the exact per-block visit unions
    union(B, S) = |{c : exists r in B with entry_c(r) < t_hit(r)}|
on the big_room incoherent workload, and the implied relative MT cost
(union x leaf/128) of a transposed kernel whose visit tile is
(leaf, 128 rays) — i.e. leaf sublanes instead of 128 lanes.

Usage: python tools/needed_set_probe.py [n_blocks=40]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fermat_jax_cache")
import jax.numpy as jnp
import numpy as np

from fermat_tpu.accel.cluster import build_clusters
from fermat_tpu.accel.traverse import trace_closest_brute
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_frontier_trace import _sort_perm_packed
from fermat_tpu.scene.procedural import big_room

N_BLOCKS = int(sys.argv[1]) if len(sys.argv) > 1 else 40
BLK = 128

print("backend:", jax.default_backend(), flush=True)
room = big_room(n_boxes=8300).device_view()

# incoherent rays, sorted exactly like the tracer sorts them
n = 1600 * 896
r = np.random.default_rng(3)
o_np = (r.random((n, 3)).astype(np.float32) - 0.5) * 10.0
o_np[:, 1] += 2.0
d_np = r.standard_normal((n, 3)).astype(np.float32)
o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
d = normalize(Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3))))
cl128 = build_clusters(room)
tmin_b = jnp.full((n,), 1e-4, jnp.float32)
tmax_b = jnp.full((n,), 3e38, jnp.float32)
perm = np.asarray(_sort_perm_packed(cl128, o, d, tmin_b, tmax_b))


def _morton_np(x, y, z, bits):
    def expand(v):
        v = v.astype(np.uint64)
        v = (v | (v << 32)) & 0x1F00000000FFFF
        v = (v | (v << 16)) & 0x1F0000FF0000FF
        v = (v | (v << 8)) & 0x100F00F00F00F00F
        v = (v | (v << 4)) & 0x10C30C30C30C30C3
        v = (v | (v << 2)) & 0x1249249249249249
        return v

    q = lambda v: np.clip(v * (1 << bits), 0, (1 << bits) - 1).astype(
        np.uint64)
    return (expand(q(x)) << 2) | (expand(q(y)) << 1) | expand(q(z))


def sort_perms():
    """Alternative coherence permutations to A/B (block-union metric)."""
    lo = np.array([np.asarray(cl128.lo_x).min(), np.asarray(cl128.lo_y).min(),
                   np.asarray(cl128.lo_z).min()])
    hi = np.array([np.asarray(cl128.hi_x).max(), np.asarray(cl128.hi_y).max(),
                   np.asarray(cl128.hi_z).max()])
    ext = np.maximum(hi - lo, 1e-20)
    on = (o_all - lo) / ext
    octant = ((d_all[:, 0] < 0) * 4 + (d_all[:, 1] < 0) * 2
              + (d_all[:, 2] < 0)).astype(np.uint64)
    # finer direction key: octant + dominant axis (3 bits + 2 bits)
    dom = np.abs(d_all).argmax(axis=1).astype(np.uint64)
    # direction as a point on the cube face -> 2D morton inside octant
    dn = d_all / np.maximum(np.abs(d_all).max(axis=1, keepdims=True), 1e-20)
    du = (dn[:, 0] * 0.5 + 0.5)
    dv = (dn[:, 1] * 0.5 + 0.5)
    m5 = _morton_np(on[:, 0], on[:, 1], on[:, 2], 5)  # 15 bits
    m6 = _morton_np(on[:, 0], on[:, 1], on[:, 2], 6)  # 18 bits
    m8 = _morton_np(on[:, 0], on[:, 1], on[:, 2], 8)  # 24 bits
    dm = _morton_np(du, dv, np.zeros_like(du), 4) & 0xFF  # ~8 bits dir
    return {
        "m5|oct (current)": (m5 << 3) | octant,
        "oct|m5": (octant << 15) | m5,
        "oct|m8": (octant << 24) | m8,
        "oct.dom|m6": (((octant << 2) | dom) << 18) | m6,
        "oct.dir8|m6": (((octant << 8) | dm) << 18) | m6,
        "m6|oct.dir8": (m6 << 11) | (octant << 8) | dm,
    }

o_all = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], 1)
d_all = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)

# triangle data for SAH leaf builds at each granularity
from fermat_tpu.accel.cluster import _sah_leaves

p0 = np.stack([np.asarray(room.p0.x), np.asarray(room.p0.y),
               np.asarray(room.p0.z)], 1)
e1 = np.stack([np.asarray(room.e1.x), np.asarray(room.e1.y),
               np.asarray(room.e1.z)], 1)
e2 = np.stack([np.asarray(room.e2.x), np.asarray(room.e2.y),
               np.asarray(room.e2.z)], 1)
v1, v2 = p0 + e1, p0 + e2
tri_lo = np.minimum(np.minimum(p0, v1), v2)
tri_hi = np.maximum(np.maximum(p0, v1), v2)
cent = (p0 + v1 + v2) / 3.0

LEAVES = {}
for leaf in (128, 64, 32, 16):
    ls = _sah_leaves(p0, e1, e2, cent, max_size=leaf)
    LEAVES[leaf] = (np.stack([tri_lo[l].min(0) for l in ls]),
                    np.stack([tri_hi[l].max(0) for l in ls]))

blocks = np.linspace(0, n // BLK - 1, N_BLOCKS).astype(int)
base_pairs = {}
for sname, key in sort_perms().items():
    sp = np.argsort(key, kind="stable")
    ids = np.concatenate([sp[b * BLK:(b + 1) * BLK] for b in blocks])
    o_s = Vec3(*(jnp.asarray(o_all[ids, i]) for i in range(3)))
    d_s = Vec3(*(jnp.asarray(d_all[ids, i]) for i in range(3)))
    hit = trace_closest_brute(room, o_s, d_s, jnp.float32(1e-4),
                              jnp.float32(3e38))
    t_hit = np.where(np.asarray(hit.hit_mask), np.asarray(hit.t), 3e38)
    o_a, d_a = o_all[ids], d_all[ids]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d_a
    line = [f"{sname:18s}:"]
    for leaf, (lo, hi) in LEAVES.items():
        unions = []
        for b in range(N_BLOCKS):
            s = slice(b * BLK, (b + 1) * BLK)
            t0 = (lo[None, :, :] - o_a[s, None, :]) * inv[s, None, :]
            t1 = (hi[None, :, :] - o_a[s, None, :]) * inv[s, None, :]
            near = np.maximum(np.minimum(t0, t1).max(axis=2), 1e-4)
            far = np.minimum(np.maximum(t0, t1).min(axis=2), 3e38)
            needed = (near <= far) & (near < t_hit[s, None])
            unions.append(needed.any(axis=0).sum())
        u = float(np.mean(unions))
        pairs = u * leaf
        base_pairs.setdefault(leaf, pairs)
        line.append(f"L{leaf}: u={u:6.1f} vreg={u * max(leaf, 8) / 8:6.0f} "
                    f"({pairs / base_pairs[leaf]:.2f}x)")
    print("  ".join(line), flush=True)
print("DONE", flush=True)
