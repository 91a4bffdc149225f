"""Analytic light types: Point / Disk / Rectangle.

Reference: src/lights.h LightType{Point, Disk, Rectangle, Directional, Mesh,
VTL} with manual-dispatch sample/eval (lights.h:47-330, DiskLight:175).

TPU-native routing:
  * Disk / Rectangle area lights become EMISSIVE GEOMETRY at scene build —
    tessellated into the mesh with an emissive material. Every integrator
    (PT NEE+MIS, BPT connections, RL clustering, PSF) then handles them
    through the one mesh-emitter path, exactly as the reference's mesh-light
    machinery subsumes its VTLs.
  * Point lights are delta distributions (no area) and are sampled in the
    delta-light NEE loop beside directional lights.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fermat_tpu.scene.materials import HostMaterial
from fermat_tpu.scene.mesh import MeshStorage


def _emissive_material(radiance) -> HostMaterial:
    m = HostMaterial("light")
    m.emissive = tuple(float(c) for c in radiance)
    return m


def _basis(n: np.ndarray):
    n = n / max(np.linalg.norm(n), 1e-12)
    a = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
    t = np.cross(n, a)
    t /= max(np.linalg.norm(t), 1e-12)
    return t, np.cross(n, t)


def add_rect_light(
    mesh: MeshStorage, center, normal, u_extent: float, v_extent: float, radiance
) -> MeshStorage:
    """Rectangle area light -> 2 emissive triangles (lights.h Rectangle)."""
    c = np.asarray(center, np.float32)
    t, b = _basis(np.asarray(normal, np.float32))
    corners = [
        c - t * u_extent - b * v_extent,
        c + t * u_extent - b * v_extent,
        c + t * u_extent + b * v_extent,
        c - t * u_extent + b * v_extent,
    ]
    sub = _quad_mesh(corners, radiance)
    return mesh.merge(sub)


def add_disk_light(
    mesh: MeshStorage, center, normal, radius: float, radiance, segments: int = 16
) -> MeshStorage:
    """Disk area light -> triangle fan (lights.h DiskLight:175)."""
    c = np.asarray(center, np.float32)
    t, b = _basis(np.asarray(normal, np.float32))
    verts = [c]
    for k in range(segments):
        a = 2 * np.pi * k / segments
        verts.append(c + (t * np.cos(a) + b * np.sin(a)) * radius)
    tris = []
    for k in range(segments):
        tris.append([0, 1 + k, 1 + (k + 1) % segments])
    v = np.asarray(verts, np.float32)
    tarr = np.asarray(tris, np.int32)
    sub = MeshStorage(
        vertices=v,
        triangles=tarr,
        normal_indices=np.full_like(tarr, -1),
        uv_indices=np.full_like(tarr, -1),
        material_ids=np.zeros(tarr.shape[0], np.int32),
        materials=[_emissive_material(radiance)],
        group_names=["disk_light"],
        group_offsets=np.asarray([0, tarr.shape[0]], np.int32),
    )
    return mesh.merge(sub)


def _quad_mesh(corners, radiance) -> MeshStorage:
    v = np.asarray(corners, np.float32)
    t = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return MeshStorage(
        vertices=v,
        triangles=t,
        normal_indices=np.full_like(t, -1),
        uv_indices=np.full_like(t, -1),
        material_ids=np.zeros(2, np.int32),
        materials=[_emissive_material(radiance)],
        group_names=["rect_light"],
        group_offsets=np.asarray([0, 2], np.int32),
    )


class PointLightsView(NamedTuple):
    """SoA point lights (delta; lights.h Point). Intensity in W/sr."""

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    ix: jax.Array
    iy: jax.Array
    iz: jax.Array

    @staticmethod
    def build(defs) -> "PointLightsView":
        p = np.array([l[0] for l in defs], np.float32).reshape(-1, 3)
        i = np.array([l[1] for l in defs], np.float32).reshape(-1, 3)
        j = jnp.asarray
        return PointLightsView(
            j(p[:, 0]), j(p[:, 1]), j(p[:, 2]), j(i[:, 0]), j(i[:, 1]), j(i[:, 2])
        )

    @property
    def count(self) -> int:
        return self.px.shape[0]
