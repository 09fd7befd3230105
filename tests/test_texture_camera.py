"""Texture sampling, camera frustum, raygen and tonemap unit tests."""

import numpy as np

from polaris_tpu.asset.camera import Camera
from polaris_tpu.ops import vec as V
from polaris_tpu.ops.texture import tex_bump_sample3, tex_sample1, tex_sample3


def _tex_s(data):
    """Build a scene dict with one texture."""
    h, w, _ = data.shape
    return {
        "tex_data": data.reshape(-1).astype(np.float32),
        "tex_offset": np.array([0], np.int32),
        "tex_width": np.array([w], np.int32),
        "tex_height": np.array([h], np.int32),
    }


def test_bilinear_texel_centers():
    """Sampling at scaled texel corners hits exact texel values
    (texture_sampler.cl indexing: floor(u*w) with corner clamp)."""
    data = np.zeros((2, 2, 4), np.float32)
    data[0, 0, :3] = (1, 0, 0)
    data[0, 1, :3] = (0, 1, 0)
    data[1, 0, :3] = (0, 0, 1)
    data[1, 1, :3] = (1, 1, 0)
    S = _tex_s(data)
    uv = np.array([[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [0.5, 0.5]], np.float32)
    idx = np.zeros(4, np.int32)
    out = tex_sample3(np, S, uv, idx)
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(out[3], [1, 1, 0], atol=1e-6)


def test_bilinear_interpolation_midpoint():
    data = np.zeros((1, 2, 4), np.float32)
    data[0, 0, 0] = 0.0
    data[0, 1, 0] = 1.0
    S = _tex_s(data)
    # halfway between texel 0 and 1 along u: scaledU = 0.5 -> coeff 0.5
    uv = np.array([[0.25, 0.0]], np.float32)
    out = tex_sample1(np, S, uv, np.zeros(1, np.int32))
    np.testing.assert_allclose(out, [0.5], atol=1e-6)


def test_repeat_wrap():
    data = np.zeros((1, 2, 4), np.float32)
    data[0, 1, 0] = 1.0
    S = _tex_s(data)
    for u in (0.5, 1.5, -0.5, 2.5):
        out = tex_sample1(np, S, np.array([[u, 0.0]], np.float32), np.zeros(1, np.int32))
        np.testing.assert_allclose(out, [1.0], atol=1e-6, err_msg=str(u))


def test_bump_reconstruction_flat():
    """A constant heightmap reconstructs the straight-up normal 0.5+0.5*z."""
    data = np.full((4, 4, 4), 0.7, np.float32)
    S = _tex_s(data)
    out = tex_bump_sample3(np, S, np.array([[0.4, 0.4]], np.float32), np.zeros(1, np.int32))
    np.testing.assert_allclose(out[0], [0.5, 0.5, 1.0], atol=1e-6)


def test_camera_frustum_geometry():
    cam = Camera(
        position=np.array([0, 0, 5], np.float32),
        look_at=np.array([0, 0, 0], np.float32),
        up=np.array([0, 1, 0], np.float32),
        fov=60.0,
    )
    cam.setup_projection(1.0)
    fr = cam.frustum
    # center of the frustum points toward -z (the look direction)
    center = V.normalize3(np, fr.mean(axis=0)[None, :])[0]
    np.testing.assert_allclose(center, [0, 0, -1], atol=1e-5)
    # top-left/top-right symmetric about x; TL has +y, BL has -y
    np.testing.assert_allclose(fr[0][1], fr[1][1], atol=1e-5)
    np.testing.assert_allclose(fr[0][0], -fr[1][0], atol=1e-5)
    assert fr[0][1] > 0 > fr[2][1]
    # vertical FOV check: angle between TL and BL directions == fov
    a = V.normalize3(np, fr[0][None, :])[0]
    b = V.normalize3(np, fr[2][None, :])[0]
    # compare the y/z opening half-angle (x-components cancel in the middle)
    mid_t = V.normalize3(np, ((fr[0] + fr[1]) / 2)[None, :])[0]
    mid_b = V.normalize3(np, ((fr[2] + fr[3]) / 2)[None, :])[0]
    ang = np.degrees(np.arccos(np.clip(np.dot(mid_t, mid_b), -1, 1)))
    np.testing.assert_allclose(ang, 60.0, atol=0.1)


def test_camera_move_directions():
    cam = Camera(
        position=np.array([0, 0, 5], np.float32),
        look_at=np.array([0, 0, 0], np.float32),
        up=np.array([0, 1, 0], np.float32),
        fov=45.0,
    )
    cam.setup_projection(1.0)
    cam.move("forward", 1.0)
    np.testing.assert_allclose(cam.position, [0, 0, 4], atol=1e-5)
    cam.move("right", 2.0)
    np.testing.assert_allclose(cam.position, [2, 0, 4], atol=1e-4)  # +x is screen-right facing -z


def test_tent_filter_range_and_mean():
    from polaris_tpu.ops.vec import tent_filter

    u = np.linspace(0, 1, 100001, dtype=np.float32)[:-1]
    t = tent_filter(np, u)
    assert t.min() >= -0.5 and t.max() <= 1.5
    np.testing.assert_allclose(t.mean(), 0.5, atol=1e-3)


def test_tonemap_matches_reference_formula():
    from polaris_tpu.render.shade import tonemap_reinhard

    acc = np.array([[[2.0, 0.5, 0.0]]], np.float32)
    out = tonemap_reinhard(np, acc, 0.5, 1.2)
    hdr = acc * 0.5 * 1.2
    expect = np.clip((hdr / (hdr + 1)) ** (1 / 2.2), 0, 1)
    np.testing.assert_allclose(out, expect, atol=1e-6)
