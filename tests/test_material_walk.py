"""Vectorized layered-material tree walk (ops/material.py) unit tests."""

import numpy as np

from polaris_tpu.asset import material as M
from polaris_tpu.asset.compiler.compiler import compile_scene
from polaris_tpu.asset.input_scene import Material, Mesh, MeshInstance, RawScene
from polaris_tpu.ops import rng
from polaris_tpu.ops.material import (
    PATH_FLAG_DISPERSE_B,
    PATH_FLAG_DISPERSE_G,
    PATH_FLAG_DISPERSE_R,
    material_tree_depth,
    select_material,
)


def _scene_with(expr):
    tri = Mesh(
        name="m",
        vertices=np.zeros((1, 3, 3), np.float32)
        + np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        normals=np.tile(np.float32([0, 0, 1]), (1, 3, 1)),
        uvs=np.zeros((1, 3, 2), np.float32),
        material_index=np.zeros(1, np.int32),
    )
    raw = RawScene(
        meshes=[tri],
        mesh_instances=[MeshInstance(0, np.eye(4, dtype=np.float32))],
        materials=[Material("m", expr, used=True)],
    )
    return compile_scene(raw)


def _walk(scene, n=64, flags=None, seed=0):
    g, p = scene.split_params()
    S = {**g, **p}
    pix = np.arange(n, dtype=np.uint32)
    U = rng.make_uniform(rng.np_uniform, seed, pix, 0, 0)
    normal = np.tile(np.float32([0, 0, 1]), (n, 1))
    uv = np.full((n, 2), 0.5, np.float32)
    root = np.full(n, scene.tri_material[0], np.int32)
    if flags is None:
        flags = np.zeros(n, np.uint32)
    depth = material_tree_depth(scene.mat_type, scene.mat_left, scene.mat_right)
    return S, select_material(np, S, U, root, normal, uv, flags, max_depth=depth)


def test_leaf_material_depth_zero():
    sc = _scene_with("diffuse(reflectance: {0.5, 0.4, 0.3})")
    assert material_tree_depth(sc.mat_type, sc.mat_left, sc.mat_right) == 0
    S, (mat, normal, tint, flags) = _walk(sc)
    assert np.all(mat["type"] == M.BXDF_DIFFUSE)
    np.testing.assert_allclose(mat["reflectance"][0], [0.5, 0.4, 0.3])
    np.testing.assert_allclose(tint, 1.0)


def test_mix_follows_weight():
    sc = _scene_with("mix(diffuse(), conductor(), 0.25)")
    S, (mat, _, _, _) = _walk(sc, n=20000)
    frac_diffuse = (mat["type"] == M.BXDF_DIFFUSE).mean()
    # sample < weight -> left (diffuse)
    assert abs(frac_diffuse - 0.25) < 0.02


def test_nested_mix_depth():
    sc = _scene_with("mix(mix(diffuse(), conductor(), 0.5), dielectric(), 0.5)")
    assert material_tree_depth(sc.mat_type, sc.mat_left, sc.mat_right) == 2
    S, (mat, _, _, _) = _walk(sc, n=20000)
    types = mat["type"]
    for t, expect in [
        (M.BXDF_DIFFUSE, 0.25),
        (M.BXDF_CONDUCTOR, 0.25),
        (M.BXDF_DIELECTRIC, 0.5),
    ]:
        assert abs((types == t).mean() - expect) < 0.02, t


def test_disperse_sets_flags_and_tint():
    sc = _scene_with(
        "disperse(dielectric(), intIOR: {1.51, 1.52, 1.53}, extIOR: {0,0,0})"
    )
    S, (mat, _, tint, flags) = _walk(sc, n=30000)
    # every lane picked exactly one channel
    got = np.stack(
        [
            (flags & PATH_FLAG_DISPERSE_R) != 0,
            (flags & PATH_FLAG_DISPERSE_G) != 0,
            (flags & PATH_FLAG_DISPERSE_B) != 0,
        ],
        -1,
    )
    assert np.all(got.sum(-1) == 1)
    # tint is the channel primary
    np.testing.assert_allclose(tint.sum(-1), 1.0)
    np.testing.assert_allclose(tint.max(-1), 1.0)
    # forced per-channel IOR override (max(node, forced))
    r = got[:, 0]
    np.testing.assert_allclose(mat["int_ior"][r], 1.51714, atol=1e-5)  # Glass > 1.51
    b = got[:, 2]
    np.testing.assert_allclose(mat["int_ior"][b], 1.53, atol=1e-5)
    # channel fractions ~ 1/3 each
    assert abs(got[:, 0].mean() - 0.333) < 0.02


def test_disperse_reuses_existing_flag():
    sc = _scene_with(
        "disperse(dielectric(), intIOR: {1.51, 1.52, 1.53}, extIOR: {0,0,0})"
    )
    n = 100
    flags = np.full(n, PATH_FLAG_DISPERSE_G, np.uint32)
    S, (mat, _, tint, out_flags) = _walk(sc, n=n, flags=flags)
    np.testing.assert_array_equal(out_flags, flags)  # unchanged
    np.testing.assert_allclose(tint, np.tile([0.0, 1.0, 0.0], (n, 1)))
    np.testing.assert_allclose(mat["int_ior"], 1.52, atol=1e-5)


def test_debug_channels(cornell_scene):
    from polaris_tpu.render.debug import DEBUG_CHANNELS, render_debug
    from polaris_tpu.render.integrator import TpuRenderer
    from polaris_tpu.render.options import RenderOptions

    r = TpuRenderer(cornell_scene, mode="bvh")
    opt = RenderOptions(width=16, height=16, spp=1, num_bounces=1, min_bounces_for_rr=3)
    for ch in DEBUG_CHANNELS:
        img = render_debug(r, opt, ch)
        assert img.shape == (16, 16, 3)
        assert np.isfinite(img).all(), ch
        if ch != "uv":  # cornell has no texture coordinates
            assert img.max() > 0, ch
