"""Remote-resource loading (round-4 VERDICT weak #8).

Mirrors the reference's httptest coverage: remote scenes with relative
.mtl/texture references (`wavefront_test.go:1-14`), remote textures
(`texure/texture_test.go:68-76`), and the resource error paths
(`resource_test.go:13-93`) — against a real local HTTP server.
"""

import os
import shutil
import threading

import numpy as np
import pytest

from polaris_tpu.asset.resource import Resource, ResourceError


@pytest.fixture(scope="module")
def http_scene(scenes_dir, tmp_path_factory):
    """Serve a textured scene directory over HTTP; yields the base URL."""
    import functools
    from http.server import HTTPServer, SimpleHTTPRequestHandler

    d = tmp_path_factory.mktemp("served")
    shutil.copy(os.path.join(scenes_dir, "checker.png"), d / "checker.png")
    (d / "s.mtl").write_text(
        'newmtl floor\nmat_expr diffuse(reflectance: "checker.png")\n\n'
        "newmtl lamp\nmat_expr emissive(radiance: {1, 1, 1}, scale: 10)\n\n"
    )
    (d / "s.obj").write_text(
        "mtllib s.mtl\n"
        "camera_fov 45\ncamera_eye 0 1.0 2.5\ncamera_look 0 0 0\n"
        "v -2 0 -2\nv -2 0 2\nv 2 0 2\nv 2 0 -2\n"
        "vt 0 0\nvt 0 2\nvt 2 2\nvt 2 0\n"
        "usemtl floor\nf 1/1 2/2 3/3 4/4\n"
        "v -0.7 2.8 -0.7\nv 0.7 2.8 -0.7\nv 0.7 2.8 0.7\nv -0.7 2.8 0.7\n"
        "usemtl lamp\nf 5 6 7 8\n"
    )
    handler = functools.partial(SimpleHTTPRequestHandler, directory=str(d))
    handler.log_message = lambda *a, **k: None
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()


def test_remote_scene_end_to_end(http_scene):
    """A scene fetched over HTTP resolves its relative .mtl and texture
    references against the scene URL, compiles, and renders — the full
    reference workflow (`polaris render frame http://.../scene.obj`)."""
    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.wavefront import read_scene
    from polaris_tpu.render.integrator import TpuRenderer
    from polaris_tpu.render.options import RenderOptions

    scene = compile_scene(read_scene(f"{http_scene}/s.obj"))
    # the checker texture really came over the wire
    assert scene.tex_offset.shape[0] >= 2
    assert scene.tex_data_u8.size > 0 or scene.tex_data.size > 4
    opt = RenderOptions(width=32, height=32, spp=1, num_bounces=2,
                        min_bounces_for_rr=3)
    img = TpuRenderer(scene, mode="bvh").render(opt)
    assert np.isfinite(img).all() and img.mean() > 0.01


def test_remote_matches_local(http_scene, scenes_dir, tmp_path):
    """Remote and local loads of the same bytes compile identically."""
    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.wavefront import read_scene

    remote = compile_scene(read_scene(f"{http_scene}/s.obj"))
    # reconstruct the same scene locally
    import urllib.request

    for name in ("s.obj", "s.mtl", "checker.png"):
        with urllib.request.urlopen(f"{http_scene}/{name}") as r:
            (tmp_path / name).write_bytes(r.read())
    local = compile_scene(read_scene(str(tmp_path / "s.obj")))
    np.testing.assert_array_equal(remote.tri_v0, local.tri_v0)
    np.testing.assert_array_equal(remote.tex_data_u8, local.tex_data_u8)
    np.testing.assert_array_equal(remote.tex_data, local.tex_data)


def test_relative_resolution_against_remote(http_scene):
    """A relative path resolved against a remote parent becomes a URL
    (resource.go:55-70)."""
    base = Resource(f"{http_scene}/s.obj")
    tex = Resource("checker.png", rel_to=base)
    assert tex.is_remote
    assert tex.path == f"{http_scene}/checker.png"
    # spooled copy is a seekable local file
    with tex.open_bytes() as f:
        head = f.read(8)
        f.seek(0)
        assert f.read(8) == head
    assert head[:4] == b"\x89PNG"
    local_copy = tex.local_path
    assert os.path.exists(local_copy)
    tex.close()
    assert not os.path.exists(local_copy)  # spool cleaned up
    base.close()


def test_resource_error_paths(http_scene, tmp_path):
    with pytest.raises(ResourceError):
        Resource(f"{http_scene}/missing.obj")  # HTTP 404
    with pytest.raises(ResourceError):
        Resource(str(tmp_path / "nope.obj"))  # missing local file
    with pytest.raises(ResourceError):
        Resource("ftp://example.invalid/scene.obj")  # unsupported scheme
