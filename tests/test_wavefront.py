"""Wavefront reader tests (ref test model: reader/wavefront_test.go:15-579,
string fixtures via an in-memory resource)."""

import numpy as np
import pytest

from polaris_tpu.asset.resource import StringResource
from polaris_tpu.asset.wavefront import WavefrontError, WavefrontReader


def read_str(obj, **named):
    """Parse an inline .obj; ``named`` maps filename -> content for includes."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="wf_test_")
    for fname, content in named.items():
        with open(os.path.join(d, fname), "w") as f:
            f.write(content)
    main = os.path.join(d, "main.obj")
    with open(main, "w") as f:
        f.write(obj)
    from polaris_tpu.asset.resource import Resource

    return WavefrontReader().read(Resource(main))


def test_triangle_and_quad_faces():
    sc = read_str(
        """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3
f 1 2 3 4
"""
    )
    assert len(sc.meshes) == 1
    assert sc.meshes[0].num_triangles == 3  # 1 tri + quad split into 2
    # generated face normals (no vn in file)
    n = sc.meshes[0].normals[0, 0]
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-6)


def test_negative_and_relative_indices():
    sc = read_str(
        """
v 0 0 0
v 1 0 0
v 1 1 0
f -3 -2 -1
"""
    )
    np.testing.assert_allclose(sc.meshes[0].vertices[0, 1], [1, 0, 0])


def test_vertex_uv_normal_indexing():
    sc = read_str(
        """
v 0 0 0
v 1 0 0
v 0 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1
"""
    )
    m = sc.meshes[0]
    np.testing.assert_allclose(m.uvs[0, 1], [1, 0])
    np.testing.assert_allclose(m.normals[0, 2], [0, 0, 1])


def test_default_instances_and_camera_extensions():
    sc = read_str(
        """
camera_fov 60
camera_eye 1 2 3
camera_look 0 0 0
camera_up 0 1 0
o thing
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
"""
    )
    assert sc.camera.fov == 60
    np.testing.assert_allclose(sc.camera.eye, [1, 2, 3])
    assert len(sc.mesh_instances) == 1
    np.testing.assert_allclose(
        sc.mesh_instances[0].object_to_world, np.eye(4), atol=1e-7
    )


def test_instance_transform():
    sc = read_str(
        """
o box
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
instance box 10 20 30 0 0 0 2 2 2
"""
    )
    inst = sc.mesh_instances[0]
    m = inst.object_to_world
    # point (1,0,0) -> scaled (2,0,0) -> translated (12,20,30)
    p = m @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [12, 20, 30], atol=1e-5)


def test_instance_rotation():
    sc = read_str(
        """
o box
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
instance box 0 0 0 0 90 0 1 1 1
"""
    )
    m = sc.mesh_instances[0].object_to_world
    # yaw 90 about +y: +x -> -z
    p = m @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [0, 0, -1], atol=1e-5)


def test_unknown_instance_mesh():
    with pytest.raises(WavefrontError):
        read_str("instance nope 0 0 0 0 0 0 1 1 1\n")


def test_materials_and_auto_expressions():
    sc = read_str(
        """
mtllib lib.mtl
v 0 0 0
v 1 0 0
v 0 1 0
usemtl shiny
f 1 2 3
""",
        **{
            "lib.mtl": """
newmtl shiny
Ks 0.9 0.9 0.9
newmtl glassy
Ks 1 1 1
Ni 1.52
newmtl glow
Ke 5 5 5
KeScaler 2
newmtl plain
Kd 0.5 0.25 0.125
"""
        },
    )
    mats = {m.name: m for m in sc.materials}
    assert mats["shiny"].expression == "conductor(specularity: {0.9, 0.9, 0.9})"
    assert (
        mats["glassy"].expression
        == "dielectric(specularity: {1, 1, 1}, intIOR: 1.52)"
    )
    assert mats["glow"].expression == "emissive(radiance: {5, 5, 5}, scale: 2)"
    assert mats["plain"].expression == "diffuse(reflectance: {0.5, 0.25, 0.125})"
    # only 'shiny' is used; others pruned to the tail but still present
    assert mats["shiny"].used
    assert not mats["plain"].used


def test_mat_expr_and_include():
    sc = read_str(
        """
mtllib lib.mtl
v 0 0 0
v 1 0 0
v 0 1 0
usemtl special
f 1 2 3
""",
        **{
            "lib.mtl": """
newmtl base
Kd 0.1 0.2 0.3
newmtl special
include base
mat_expr mix(diffuse(), conductor(), 0.25)
"""
        },
    )
    mats = {m.name: m for m in sc.materials}
    assert mats["special"].expression == "mix(diffuse(), conductor(), 0.25)"


def test_undefined_usemtl():
    with pytest.raises(WavefrontError):
        read_str("usemtl nothere\n")


def test_default_material_applied():
    sc = read_str("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    assert len(sc.materials) == 1
    assert sc.materials[0].expression == "diffuse(reflectance: {0.7, 0.7, 0.7})"


def test_face_errors():
    with pytest.raises(WavefrontError):
        read_str("v 0 0 0\nf 1 2\n")  # too few verts
    with pytest.raises(WavefrontError):
        read_str("v 0 0 0\nf 1 2 3 4 5\n")  # too many
    with pytest.raises(WavefrontError):
        read_str("f 9 10 11\n")  # out of bounds
