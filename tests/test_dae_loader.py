"""COLLADA loader: synthetic .dae documents built in-test.

Each test writes a minimal document exercising one spec feature (Z_UP
conversion, split VERTEX/NORMAL/TEXCOORD index streams with offsets,
polylist fans, node transform composition + instancing, phong material
binding). Reference analog: assimp's COLLADA path (src/assimp_loader.cpp).
"""
import numpy as np

from fermat_tpu.scene.loaders.dae import load_dae

_HDR = '<?xml version="1.0" encoding="utf-8"?>\n'


def _doc(body, up="Y_UP"):
    return (_HDR +
            '<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" '
            'version="1.4.1">'
            f"<asset><up_axis>{up}</up_axis></asset>{body}</COLLADA>")


def _tri_geom(gid="g0", mat="m0"):
    """One triangle: split position/normal/uv index streams (offsets
    0/1/2), 3 positions, 1 normal, 3 uvs."""
    return f"""
  <library_geometries><geometry id="{gid}"><mesh>
    <source id="{gid}-pos"><float_array id="{gid}-pa" count="9">
      0 0 0  1 0 0  0 1 0</float_array>
      <technique_common><accessor source="#{gid}-pa" count="3" stride="3">
        <param name="X" type="float"/><param name="Y" type="float"/>
        <param name="Z" type="float"/></accessor></technique_common>
    </source>
    <source id="{gid}-nrm"><float_array id="{gid}-na" count="3">
      0 0 1</float_array>
      <technique_common><accessor source="#{gid}-na" count="1" stride="3"/>
      </technique_common></source>
    <source id="{gid}-uv"><float_array id="{gid}-ua" count="6">
      0 0  1 0  0 1</float_array>
      <technique_common><accessor source="#{gid}-ua" count="3" stride="2"/>
      </technique_common></source>
    <vertices id="{gid}-v"><input semantic="POSITION" source="#{gid}-pos"/>
    </vertices>
    <triangles count="1" material="{mat}">
      <input semantic="VERTEX" source="#{gid}-v" offset="0"/>
      <input semantic="NORMAL" source="#{gid}-nrm" offset="1"/>
      <input semantic="TEXCOORD" source="#{gid}-uv" offset="2"/>
      <p>0 0 0  1 0 1  2 0 2</p>
    </triangles>
  </mesh></geometry></library_geometries>"""


def test_split_streams_and_material(tmp_path):
    body = _tri_geom() + """
  <library_images><image id="img0"><init_from>wood.png</init_from></image>
  </library_images>
  <library_effects><effect id="e0"><profile_COMMON>
    <newparam sid="surf"><surface type="2D"><init_from>img0</init_from>
    </surface></newparam>
    <newparam sid="samp"><sampler2D><source>surf</source></sampler2D>
    </newparam>
    <technique sid="common"><phong>
      <emission><color>0.1 0.2 0.3</color></emission>
      <diffuse><texture texture="samp" texcoord="uv0"/></diffuse>
      <specular><color>0.5 0.5 0.5</color></specular>
      <shininess><float>32</float></shininess>
    </phong></technique>
  </profile_COMMON></effect></library_effects>
  <library_materials><material id="mat0" name="wood">
    <instance_effect url="#e0"/></material></library_materials>
  <library_visual_scenes><visual_scene id="vs"><node>
    <instance_geometry url="#g0">
      <bind_material><technique_common>
        <instance_material symbol="m0" target="#mat0"/>
      </technique_common></bind_material>
    </instance_geometry>
  </node></visual_scene></library_visual_scenes>"""
    p = tmp_path / "t.dae"
    p.write_text(_doc(body))
    m = load_dae(str(p))
    assert m.triangles.tolist() == [[0, 1, 2]]
    np.testing.assert_allclose(
        m.vertices, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    # one shared normal, separate uv stream
    assert m.normal_indices.tolist() == [[0, 0, 0]]
    np.testing.assert_allclose(m.normals, [[0, 0, 1]])
    assert m.uv_indices.tolist() == [[0, 1, 2]]
    mat = m.materials[0]
    assert mat.diffuse_map_name == "wood.png"
    assert mat.specular == (0.5, 0.5, 0.5)
    assert mat.emissive == (0.1, 0.2, 0.3)
    assert mat.phong_exponent == 32.0


def test_z_up_conversion(tmp_path):
    body = _tri_geom() + """
  <library_visual_scenes><visual_scene id="vs"><node>
    <instance_geometry url="#g0"/>
  </node></visual_scene></library_visual_scenes>"""
    p = tmp_path / "z.dae"
    p.write_text(_doc(body, up="Z_UP"))
    m = load_dae(str(p))
    # (x, y, z) -> (x, z, -y): vertex (0,1,0) -> (0,0,-1)
    np.testing.assert_allclose(
        m.vertices, [[0, 0, 0], [1, 0, 0], [0, 0, -1]], atol=1e-7)
    # normal +z -> +y (rotation: inverse-transpose == rotation)
    np.testing.assert_allclose(m.normals, [[0, 1, 0]], atol=1e-7)


def test_node_transforms_and_instancing(tmp_path):
    body = _tri_geom() + """
  <library_visual_scenes><visual_scene id="vs">
    <node><translate>0 0 5</translate>
      <node><rotate>0 1 0 180</rotate><instance_geometry url="#g0"/></node>
      <node><scale>-1 1 1</scale><instance_geometry url="#g0"/></node>
    </node>
  </visual_scene></library_visual_scenes>"""
    p = tmp_path / "inst.dae"
    p.write_text(_doc(body))
    m = load_dae(str(p))
    assert m.triangles.shape == (2, 3)
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    np.testing.assert_allclose(
        m.vertices[:3], pos * [-1, 1, -1] + [0, 0, 5], atol=1e-6)
    np.testing.assert_allclose(
        m.vertices[3:], pos * [-1, 1, 1] + [0, 0, 5], atol=1e-6)
    # mirrored instance flips winding
    assert (m.triangles[1] - 3).tolist() == [0, 2, 1]


def test_polylist_fan(tmp_path):
    body = """
  <library_geometries><geometry id="q"><mesh>
    <source id="q-pos"><float_array id="q-pa" count="12">
      0 0 0  1 0 0  1 1 0  0 1 0</float_array>
      <technique_common><accessor source="#q-pa" count="4" stride="3"/>
      </technique_common></source>
    <vertices id="q-v"><input semantic="POSITION" source="#q-pos"/>
    </vertices>
    <polylist count="1" material="m">
      <input semantic="VERTEX" source="#q-v" offset="0"/>
      <vcount>4</vcount>
      <p>0 1 2 3</p>
    </polylist>
  </mesh></geometry></library_geometries>"""
    p = tmp_path / "quad.dae"
    p.write_text(_doc(body))
    m = load_dae(str(p))
    assert m.triangles.tolist() == [[0, 1, 2], [0, 2, 3]]


def test_dispatch(tmp_path):
    from fermat_tpu.scene.loaders.fa import load_mesh_any

    body = _tri_geom()
    p = tmp_path / "d.dae"
    p.write_text(_doc(body))
    m = load_mesh_any(str(p))
    assert m.triangles.shape == (1, 3)
