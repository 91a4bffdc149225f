"""Wavefront OBJ + MTL loader.

Reference: src/mesh/glm.cpp + MeshBase.cpp:430-760 (`loadObj` / `glmReadMTL`).
Feature parity notes:
  * negative (relative) indices — CornellBox-JP.obj uses `f -4 -3 -2 -1`
  * polygon fan triangulation
  * v/vn/vt streams with independent index triplets `v/vt/vn`
  * groups (`g`) preserved with names (charts)
  * MTL fields parsed like MeshBase.cpp:530-700: Kd Ks Ka Ke Kr Ns Ni
    Tr Td d illum map_Kd/map_Ks/map_Ke/map_bump
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from fermat_tpu.scene.materials import HostMaterial
from fermat_tpu.scene.mesh import MeshStorage


def _texpath(name: str) -> str:
    """Normalize Windows-style texture paths (bathroom.mtl uses backslashes)."""
    return name.replace("\\", "/")


def load_mtl(path: str) -> List[HostMaterial]:
    mats: List[HostMaterial] = []
    cur: Optional[HostMaterial] = None
    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tok = line.split()
            key = tok[0]
            if key == "newmtl":
                cur = HostMaterial(tok[1] if len(tok) > 1 else "")
                mats.append(cur)
            elif cur is None:
                continue
            elif key == "Kd":
                cur.diffuse = tuple(float(x) for x in tok[1:4])
            elif key == "Ks":
                cur.specular = tuple(float(x) for x in tok[1:4])
            elif key in ("Ke", "emissive"):
                cur.emissive = tuple(float(x) for x in tok[1:4])
            elif key == "Kr":
                cur.reflectivity = tuple(float(x) for x in tok[1:4])
            elif key == "Td":
                cur.diffuse_trans = tuple(float(x) for x in tok[1:4])
            elif key == "Ns":
                cur.phong_exponent = float(tok[1])
            elif key == "Ni":
                cur.ior = float(tok[1])
            elif key == "d":
                cur.opacity = float(tok[1])
            elif key == "Tr":
                cur.opacity = 1.0 - float(tok[1])
            elif key == "map_Kd":
                cur.diffuse_map_name = _texpath(tok[-1])
            elif key == "map_Ks":
                cur.specular_map_name = _texpath(tok[-1])
            elif key == "map_Ke":
                cur.emissive_map_name = _texpath(tok[-1])
            elif key in ("map_Bump", "map_bump", "bump"):
                cur.bump_map_name = _texpath(tok[-1])
    return mats


def _resolve(idx: int, count: int) -> int:
    """OBJ 1-based / negative-relative index -> 0-based."""
    return idx - 1 if idx > 0 else count + idx


_NATIVE_MIN_BYTES = 1 << 20  # use the C++ parser for files over 1 MB


def load_obj(path: str) -> MeshStorage:
    """OBJ load; big files parse geometry through the native C++ runtime
    (native/fermat_native.cpp) with MTL still handled here."""
    if os.path.getsize(path) >= _NATIVE_MIN_BYTES:
        m = _load_obj_native(path)
        if m is not None:
            return m
    return _load_obj_python(path)


def _load_obj_native(path: str) -> Optional[MeshStorage]:
    from fermat_tpu.utils.native import load_obj_geometry

    geo = load_obj_geometry(path)
    if geo is None:
        return None
    # materials from the mtllib(s), remapped to usemtl first-use order
    base = os.path.dirname(path)
    mtl_mats: Dict[str, HostMaterial] = {}
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("mtllib"):
                mtl_path = os.path.join(base, line.split(None, 1)[1].strip())
                if os.path.exists(mtl_path):
                    for m in load_mtl(mtl_path):
                        mtl_mats[m.name] = m
    materials = [
        mtl_mats.get(n, HostMaterial(n)) for n in geo["material_names"]
    ] or [HostMaterial("default")]
    ntri = geo["tri_v"].shape[0]
    return MeshStorage(
        vertices=geo["vertices"],
        triangles=geo["tri_v"],
        normals=geo["normals"],
        normal_indices=geo["tri_n"],
        uvs=geo["uvs"],
        uv_indices=geo["tri_uv"],
        material_ids=geo["tri_mat"],
        materials=materials,
        group_names=["default"],
        group_offsets=np.asarray([0, ntri], np.int32),
    )


def _load_obj_python(path: str) -> MeshStorage:
    verts: List[List[float]] = []
    norms: List[List[float]] = []
    uvs: List[List[float]] = []
    tris: List[List[int]] = []
    tri_n: List[List[int]] = []
    tri_uv: List[List[int]] = []
    tri_mat: List[int] = []
    materials: List[HostMaterial] = []
    mat_index: Dict[str, int] = {}
    cur_mat = -1
    group_names: List[str] = []
    group_offsets: List[int] = [0]
    base = os.path.dirname(path)

    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tok = line.split()
            key = tok[0]
            if key == "v":
                verts.append([float(x) for x in tok[1:4]])
            elif key == "vn":
                norms.append([float(x) for x in tok[1:4]])
            elif key == "vt":
                uvs.append([float(x) for x in tok[1:3]])
            elif key == "mtllib":
                mtl_path = os.path.join(base, " ".join(tok[1:]))
                if os.path.exists(mtl_path):
                    for m in load_mtl(mtl_path):
                        mat_index[m.name] = len(materials)
                        materials.append(m)
            elif key == "usemtl":
                name = tok[1] if len(tok) > 1 else ""
                if name not in mat_index:
                    mat_index[name] = len(materials)
                    materials.append(HostMaterial(name))
                cur_mat = mat_index[name]
            elif key == "g" or key == "o":
                if len(tris) > group_offsets[-1]:
                    group_offsets.append(len(tris))
                    group_names.append(" ".join(tok[1:]) or f"group{len(group_names)}")
                elif group_names:
                    group_names[-1] = " ".join(tok[1:]) or group_names[-1]
                else:
                    group_names.append(" ".join(tok[1:]) or "group0")
            elif key == "f":
                corners = []
                for c in tok[1:]:
                    parts = c.split("/")
                    vi = _resolve(int(parts[0]), len(verts))
                    ti = (
                        _resolve(int(parts[1]), len(uvs))
                        if len(parts) > 1 and parts[1]
                        else -1
                    )
                    ni = (
                        _resolve(int(parts[2]), len(norms))
                        if len(parts) > 2 and parts[2]
                        else -1
                    )
                    corners.append((vi, ti, ni))
                # fan triangulation
                for k in range(1, len(corners) - 1):
                    a, b, c = corners[0], corners[k], corners[k + 1]
                    tris.append([a[0], b[0], c[0]])
                    tri_uv.append([a[1], b[1], c[1]])
                    tri_n.append([a[2], b[2], c[2]])
                    tri_mat.append(max(cur_mat, 0))

    if not materials:
        materials = [HostMaterial("default")]
        materials[0].diffuse = (0.75, 0.75, 0.75)
    if not group_names:
        group_names = ["default"]
    group_offsets.append(len(tris))

    return MeshStorage(
        vertices=np.asarray(verts, np.float32).reshape(-1, 3),
        triangles=np.asarray(tris, np.int32).reshape(-1, 3),
        normals=np.asarray(norms, np.float32).reshape(-1, 3),
        normal_indices=np.asarray(tri_n, np.int32).reshape(-1, 3),
        uvs=np.asarray(uvs, np.float32).reshape(-1, 2),
        uv_indices=np.asarray(tri_uv, np.int32).reshape(-1, 3),
        material_ids=np.asarray(tri_mat, np.int32),
        materials=materials,
        group_names=group_names,
        group_offsets=np.asarray(group_offsets, np.int32),
    )
