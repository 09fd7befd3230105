"""Progressive accumulation, camera updates, HTTP viewer + remote resources."""

import numpy as np
import pytest

from polaris_tpu.render.integrator import TpuRenderer
from polaris_tpu.render.options import RenderOptions
from polaris_tpu.render.progressive import ProgressiveRenderer


def test_progressive_equals_oneshot(cornell_scene):
    """k passes of spp each == one render at k*spp samples (absolute sample
    indices in the RNG counters)."""
    opt2 = RenderOptions(width=16, height=16, spp=2, num_bounces=2, min_bounces_for_rr=3)
    prog = ProgressiveRenderer(cornell_scene, opt2, mode="bvh")
    prog.step()
    prog.step()
    assert prog.accumulated_samples == 4

    opt4 = RenderOptions(width=16, height=16, spp=4, num_bounces=2, min_bounces_for_rr=3)
    oneshot = np.asarray(TpuRenderer(cornell_scene, mode="bvh").render_accum(opt4))
    np.testing.assert_allclose(prog.accum, oneshot, atol=1e-4)


def test_camera_change_resets_accumulation(cornell_scene):
    opt = RenderOptions(width=16, height=16, spp=1, num_bounces=2, min_bounces_for_rr=3)
    prog = ProgressiveRenderer(cornell_scene, opt, mode="bvh")
    prog.step()
    assert prog.accumulated_samples == 1
    prog.move_camera("forward", 0.2)
    # buffered async: applied (and accumulator reset) at the next pass
    assert prog.accumulated_samples == 1
    prog.step()
    assert prog.accumulated_samples == 1  # reset + one new pass


def test_spp_chunking_equals_single_launch(cornell_scene):
    r = TpuRenderer(cornell_scene, mode="bvh")
    r.spp_per_launch = 2
    opt = RenderOptions(width=16, height=16, spp=6, num_bounces=2, min_bounces_for_rr=3)
    chunked = np.asarray(r.render_accum(opt))
    r2 = TpuRenderer(cornell_scene, mode="bvh")
    r2.spp_per_launch = 99
    whole = np.asarray(r2.render_accum(opt))
    np.testing.assert_allclose(chunked, whole, atol=1e-4)


def test_http_viewer_and_camera_endpoint(cornell_scene):
    import urllib.request

    opt = RenderOptions(width=16, height=16, spp=1, num_bounces=2, min_bounces_for_rr=3)
    prog = ProgressiveRenderer(cornell_scene, opt, mode="bvh")
    img = prog.step()
    prog._publish(img)
    from polaris_tpu.render.progressive import _start_server

    server = _start_server(prog, 0)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/frame.png") as r:
            assert r.status == 200
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/move?dir=forward&step=0.1"
        ) as r:
            assert r.status == 204
        assert prog._pending_camera is not None
        # the root page is the interactive drag-orbit client (reference
        # mouse-look, opengl.go:273-291): pointer events wired to /orbit,
        # keys to /move, wheel to /fov, JS image refresh (no page reload)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert r.status == 200
            page = r.read().decode()
        assert "pointermove" in page and "/orbit?pitch=" in page
        assert "keydown" in page and "/move?dir=" in page
        assert "wheel" in page and "/fov?deg=" in page
        assert "http-equiv" not in page  # drags must survive refreshes
        # cache-busted frame fetches (the JS refresh path) still serve PNG
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.png?t=123"
        ) as r:
            assert r.status == 200
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        server.shutdown()


def test_orbit_endpoint_and_stats_blocks(cornell_scene):
    """/orbit rotates the look direction about the eye (reference mouse
    drag, opengl.go:273-291); /stats carries the block-assignment rows (the
    TAB overlay counterpart) and camera state."""
    import json
    import urllib.request

    opt = RenderOptions(width=16, height=16, spp=1, num_bounces=2, min_bounces_for_rr=3)
    prog = ProgressiveRenderer(cornell_scene, opt, mode="bvh")
    prog.step()
    from polaris_tpu.render.progressive import _start_server

    server = _start_server(prog, 0)
    port = server.server_address[1]
    try:
        eye0 = prog.camera.position.copy()
        look0 = prog.camera.look_at.copy()
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/orbit?pitch=0.0&yaw=0.5"
        ) as r:
            assert r.status == 204
        assert prog._pending_camera is not None
        cam = prog._pending_camera
        np.testing.assert_allclose(cam.position, eye0)  # orbit, not move
        d0 = look0 - eye0
        d1 = cam.look_at - cam.position
        # rotation preserves length but changes direction by the yaw angle
        np.testing.assert_allclose(
            np.linalg.norm(d1), np.linalg.norm(d0), rtol=1e-5
        )
        cosang = np.dot(d0, d1) / (np.linalg.norm(d0) * np.linalg.norm(d1))
        np.testing.assert_allclose(cosang, np.cos(0.5), atol=1e-5)
        # applied (and accumulation reset) at the next pass
        prog.step()
        assert prog.accumulated_samples == 1
        # deltas were consumed: a later move must not re-apply the rotation
        look_after = prog.camera.look_at.copy()
        prog.move_camera("up", 0.1)
        cam2 = prog._pending_camera
        np.testing.assert_allclose(
            cam2.look_at - cam2.position,
            look_after - prog.camera.position,
            atol=1e-6,
        )

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/fov?deg=60") as r:
            assert r.status == 204
        assert prog._pending_camera.fov == 60.0

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
            stats = json.loads(r.read())
        # pending fov is buffered, not committed yet
        assert prog.camera.fov != 60.0
        assert stats["camera"]["fov"] == prog.camera.fov
        assert len(stats["blocks"]) == 1
        assert stats["blocks"][0]["height"] == 16
    finally:
        server.shutdown()


def test_viewer_overlay_embeds_assignment_data(cornell_scene):
    """The viewer page draws the TAB overlay (block-assignment boxes over
    the image + stacked per-pass distribution chart, ≙ the reference's
    in-window UI, opengl.go:193-213,305-361) and /stats feeds it the block
    history + frame dimensions."""
    import json
    import urllib.request

    opt = RenderOptions(width=16, height=16, spp=1, num_bounces=2,
                        min_bounces_for_rr=3)
    prog = ProgressiveRenderer(cornell_scene, opt, mode="bvh")
    prog.step()
    prog.pass_history.append((1, 1.0))
    prog.block_history.append(prog.block_assignment())
    from polaris_tpu.render.progressive import _start_server

    server = _start_server(prog, 0)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        # overlay canvas stacked on the image, toggled by TAB
        assert 'canvas id=ov' in page and "'Tab'" in page
        # block boxes: strokeRect per device row with its render time
        assert "stats.blocks.forEach" in page and "strokeRect" in page
        assert "render_ms" in page
        # stacked distribution chart from the per-pass history
        assert "block_history" in page and "block distribution" in page
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
            stats = json.loads(r.read())
        assert stats["frame"] == {"width": 16, "height": 16}
        assert len(stats["block_history"]) == 1
        assert stats["block_history"][0][0]["height"] == 16
    finally:
        server.shutdown()


def test_progressive_pool_mode_blocks(cornell_scene):
    """Progressive rendering through the feedback worker pool: image equals
    the single-renderer result and /stats blocks are the measured bands."""
    from polaris_tpu.parallel.workers import BandWorker, WorkerPoolRenderer
    from polaris_tpu.render.integrator import TpuRenderer

    opt = RenderOptions(width=16, height=64, spp=1, num_bounces=2, min_bounces_for_rr=3)
    pool = WorkerPoolRenderer(
        [
            BandWorker("w0", TpuRenderer(cornell_scene, mode="bvh")),
            BandWorker("w1", TpuRenderer(cornell_scene, mode="bvh")),
        ],
        height_quantum=16,
    )
    prog = ProgressiveRenderer(cornell_scene, opt, pool=pool)
    prog.step()
    single = ProgressiveRenderer(cornell_scene, opt, mode="bvh")
    single.step()
    np.testing.assert_allclose(
        np.asarray(prog.accum), np.asarray(single.accum), atol=1e-5
    )
    blocks = prog.block_assignment()
    assert [b["device"] for b in blocks] == ["w0", "w1"]
    assert sum(b["height"] for b in blocks) == 64
    assert all(b["render_ms"] >= 0 for b in blocks)


def test_remote_scene_resource(tmp_path):
    """HTTP-served scene assets (≙ wavefront_test.go httptest servers)."""
    import functools
    import threading
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    (tmp_path / "r.obj").write_text(
        "mtllib r.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl m\nf 1 2 3\n"
    )
    (tmp_path / "r.mtl").write_text("newmtl m\nKd 0.5 0.5 0.5\n")
    handler = functools.partial(SimpleHTTPRequestHandler, directory=str(tmp_path))
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        from polaris_tpu.asset.wavefront import read_scene

        sc = read_scene(f"http://127.0.0.1:{port}/r.obj")
        assert sc.meshes[0].num_triangles == 1
        assert sc.materials[0].name == "m"
    finally:
        server.shutdown()
