"""glTF 2.0 loader: synthetic .glb/.gltf round-trips.

The files are BUILT here (json + packed buffers), not shipped: each test
constructs a container exercising one spec feature (interleaved
bufferViews, node TRS hierarchies + instancing, triangle strips,
normalized texcoords, PBR material mapping) and asserts the MeshStorage
the loader produces. Reference analog: the assimp import path
(src/assimp_loader.cpp) this environment cannot link.
"""
import base64
import json
import struct

import numpy as np
import pytest

from fermat_tpu.scene.loaders.gltf import load_gltf


def _quad_gltf_dict(bin_len, uri=None):
    """Two-triangle unit quad in XY: positions+normals interleaved,
    u16 indices in a second view."""
    g = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"name": "quad", "primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3,
            "material": 0,
        }]}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.4, 0.2, 1.0],
                "metallicFactor": 0.25,
                "roughnessFactor": 0.5,
                "baseColorTexture": {"index": 0},
            },
            "emissiveFactor": [1.0, 2.0, 3.0],
        }],
        "textures": [{"source": 0}],
        "images": [{"uri": "albedo.png"}],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 4,
             "type": "VEC2", "normalized": True},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 96, "byteStride": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 16, "byteStride": 4},
            {"buffer": 0, "byteOffset": 112, "byteLength": 12},
        ],
        "buffers": [{"byteLength": bin_len}],
    }
    if uri is not None:
        g["buffers"][0]["uri"] = uri
    return g


def _quad_bin():
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    inter = np.concatenate([pos, nrm], axis=1).astype("<f4").tobytes()  # 96B
    uv = (np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
          * 65535).astype("<u2").tobytes()  # 16B normalized u16
    idx = np.array([0, 1, 2, 0, 2, 3], "<u2").tobytes()  # 12B
    return inter + uv + idx, pos


def _write_glb(path, g, blob):
    js = json.dumps(g).encode()
    js += b" " * (-len(js) % 4)
    blob = blob + b"\x00" * (-len(blob) % 4)
    body = (struct.pack("<I4s", len(js), b"JSON") + js
            + struct.pack("<I4s", len(blob), b"BIN\x00") + blob)
    with open(path, "wb") as f:
        f.write(b"glTF" + struct.pack("<II", 2, 12 + len(body)) + body)


class TestGlb:
    def test_glb_quad_interleaved(self, tmp_path):
        blob, pos = _quad_bin()
        p = tmp_path / "quad.glb"
        _write_glb(p, _quad_gltf_dict(len(blob)), blob)
        m = load_gltf(str(p))
        assert m.triangles.shape == (2, 3)
        np.testing.assert_allclose(m.vertices, pos)
        np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4)
        # normalized u16 uv decode + glTF top-down v flip
        np.testing.assert_allclose(
            m.uvs, [[0, 1], [1, 1], [1, 0], [0, 0]], atol=2e-5)
        np.testing.assert_array_equal(m.normal_indices, m.triangles)
        # PBR mapping: metallic splits base color, roughness -> exponent
        mat = m.materials[0]
        np.testing.assert_allclose(mat.diffuse, np.array([0.8, 0.4, 0.2]) * 0.75)
        np.testing.assert_allclose(mat.specular, np.array([0.8, 0.4, 0.2]) * 0.25)
        assert mat.phong_exponent == pytest.approx(2.0)
        assert mat.roughness == pytest.approx(0.5)
        assert mat.emissive == (1.0, 2.0, 3.0)
        assert mat.diffuse_map_name == "albedo.png"

    def test_gltf_json_with_data_uri(self, tmp_path):
        blob, pos = _quad_bin()
        uri = "data:application/octet-stream;base64," + \
            base64.b64encode(blob).decode()
        g = _quad_gltf_dict(len(blob), uri=uri)
        p = tmp_path / "quad.gltf"
        p.write_text(json.dumps(g))
        m = load_gltf(str(p))
        np.testing.assert_allclose(m.vertices, pos)

    def test_node_hierarchy_trs_and_instancing(self, tmp_path):
        blob, pos = _quad_bin()
        g = _quad_gltf_dict(len(blob))
        # root translates by (0,0,5); two children instance the same quad,
        # one rotated 180deg about Y (quaternion), one scaled by -1 in X
        # (negative determinant -> winding must flip)
        g["nodes"] = [
            {"children": [1, 2], "translation": [0, 0, 5]},
            {"mesh": 0, "rotation": [0, 1, 0, 0]},
            {"mesh": 0, "scale": [-1, 1, 1]},
        ]
        g["scenes"] = [{"nodes": [0]}]
        p = tmp_path / "inst.glb"
        _write_glb(p, g, blob)
        m = load_gltf(str(p))
        assert m.triangles.shape == (4, 3)
        # instance 1: rot Y pi -> (x,y,z) -> (-x, y, -z), then +5 z
        np.testing.assert_allclose(
            m.vertices[:4], pos * [-1, 1, -1] + [0, 0, 5], atol=1e-6)
        np.testing.assert_allclose(
            m.normals[:4], [[0, 0, -1]] * 4, atol=1e-6)
        # instance 2: mirrored in X -> winding flipped to keep the
        # geometric normal consistent with the shading normal
        np.testing.assert_allclose(
            m.vertices[4:], pos * [-1, 1, 1] + [0, 0, 5], atol=1e-6)
        t0 = m.triangles[2] - 4  # second instance, first tri
        assert t0.tolist() == [0, 2, 1]
        v = m.vertices[4:]
        e1 = v[t0[1]] - v[t0[0]]
        e2 = v[t0[2]] - v[t0[0]]
        geo_n = np.cross(e1, e2)
        # shading normal for the mirrored instance is inv-transpose -> +z
        assert np.dot(geo_n, m.normals[4 + t0[0]]) > 0

    def test_triangle_strip_mode(self, tmp_path):
        blob, _ = _quad_bin()
        g = _quad_gltf_dict(len(blob))
        g["meshes"][0]["primitives"][0]["mode"] = 5
        g["accessors"][3]["count"] = 4  # strip 0,1,2,3 -> 2 tris
        idx = np.array([0, 1, 2, 3], "<u2").tobytes()
        blob = blob[:112] + idx + blob[112 + 8:]
        g["bufferViews"][2]["byteLength"] = 8
        p = tmp_path / "strip.glb"
        _write_glb(p, g, blob)
        m = load_gltf(str(p))
        assert m.triangles.tolist() == [[0, 1, 2], [1, 3, 2]]

    def test_dispatch_and_render_smoke(self, tmp_path):
        """load_mesh_any routes .glb, and the loaded mesh renders through
        the public API (finite, lit by an emissive gltf material)."""
        blob, _ = _quad_bin()
        g = _quad_gltf_dict(len(blob))
        g["materials"][0]["emissiveFactor"] = [4.0, 4.0, 4.0]
        p = tmp_path / "lit.glb"
        _write_glb(p, g, blob)

        from fermat_tpu.scene.loaders.fa import load_mesh_any
        mesh = load_mesh_any(str(p))
        mesh.materials[0].finalize_flags()

        import jax.numpy as jnp
        from fermat_tpu.core.camera import Camera
        from fermat_tpu.integrators.pt import PTOptions, render_pass
        from fermat_tpu.scene.view import SceneView

        cam = Camera.create((0.5, 0.5, 2.5), (0.5, 0.5, 0.0), (0, 1, 0), 0.8)
        view = SceneView.build(mesh, cam)
        out = render_pass(view, PTOptions(max_path_length=2), 16, 16,
                          jnp.uint32(0))
        img = np.asarray(out.composited.stack())
        assert np.isfinite(img).all()
        assert img.max() > 1.0  # the emissive quad is visible
