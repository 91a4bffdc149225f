import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from fermat_tpu.accel.cluster import build_subclusters
from fermat_tpu.accel.traverse import trace_any_brute, trace_closest_brute
from fermat_tpu.core.math import Vec3, normalize
from fermat_tpu.ops.pallas_sub_trace import trace_any_sub, trace_closest_sub
from fermat_tpu.scene.procedural import random_soup

mesh = random_soup(1000, seed=9).device_view()
sv = build_subclusters(mesh)
r = np.random.default_rng(2)
n = 512
o = (r.random((n, 3)).astype(np.float32) - 0.5) * 12.0
d = r.standard_normal((n, 3)).astype(np.float32)
o_v = Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
d_v = normalize(Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])))
tmin, tmax = jnp.float32(1e-4), jnp.float32(8.0)
occ_ref = np.asarray(trace_any_brute(mesh, o_v, d_v, tmin, tmax))
occ_s = np.asarray(trace_any_sub(sv, o_v, d_v, tmin, tmax, block=128))
bad = np.nonzero(occ_ref != occ_s)[0]
print("mismatch rays:", bad, "ref:", occ_ref[bad], "sub:", occ_s[bad])
# closest on those rays
h_ref = trace_closest_brute(mesh, o_v, d_v, tmin, jnp.float32(3e38))
print("closest t on bad:", np.asarray(h_ref.t)[bad], "tri:", np.asarray(h_ref.tri)[bad])
# unsorted anyhit
occ_u = np.asarray(trace_any_sub(sv, o_v, d_v, tmin, tmax, block=128, sort=False))
print("unsorted mismatches:", np.nonzero(occ_ref != occ_u)[0])
# nc=1
occ_1 = np.asarray(trace_any_sub(sv, o_v, d_v, tmin, tmax, block=128, sort=False, nc=1))
print("nc=1 unsorted mismatches:", np.nonzero(occ_ref != occ_1)[0])

h_c1 = trace_closest_sub(sv, o_v, d_v, tmin, jnp.float32(8.0), block=128, sort=False, nc=1)
print("closest nc=1 unsorted t[219]:", float(np.asarray(h_c1.t)[219]), "tri:", int(np.asarray(h_c1.tri)[219]))
print("brute t[219]:", float(np.asarray(h_ref.t)[219]), "tri:", int(np.asarray(h_ref.tri)[219]))
# which subcluster holds the hit triangle?
tri_hit = int(np.asarray(h_ref.tri)[219])
tri4 = np.asarray(sv.tri4)  # (ns*4, 16, 128)
ids = tri4[:, 9, :]
locs = np.argwhere(ids == tri_hit)
print("tiles holding tri", tri_hit, ":", locs[:, 0] // 4, "phase", locs[:, 0] % 4, "lane", locs[:, 1])
