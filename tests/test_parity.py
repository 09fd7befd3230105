"""Forward-image parity: TPU integrator (both traversal modes) vs the NumPy
golden renderer. This is the allclose gate the reference never had
(SURVEY.md §4 'no numerical ground truth')."""

import numpy as np
import pytest

from polaris_tpu.cpu_ref.renderer import CpuRenderer
from polaris_tpu.render.integrator import TpuRenderer
from polaris_tpu.render.options import RenderOptions


def _compare(scene, opt, modes=("bvh", "brute"), atol=1e-4):
    golden = CpuRenderer(scene).render_accum(opt)
    assert np.isfinite(golden).all()
    for mode in modes:
        got = np.asarray(TpuRenderer(scene, mode=mode).render_accum(opt))
        assert np.isfinite(got).all(), mode
        np.testing.assert_allclose(got, golden, atol=atol, rtol=1e-3, err_msg=mode)


def test_cornell_parity(cornell_scene):
    opt = RenderOptions(width=48, height=48, spp=2, num_bounces=3, min_bounces_for_rr=4)
    _compare(cornell_scene, opt)


def test_cornell_with_rr_parity(cornell_scene):
    opt = RenderOptions(width=32, height=32, spp=2, num_bounces=4, min_bounces_for_rr=2)
    _compare(cornell_scene, opt, modes=("bvh",))


def test_sphere_parity(sphere_scene):
    opt = RenderOptions(width=32, height=32, spp=2, num_bounces=2, min_bounces_for_rr=3)
    _compare(sphere_scene, opt)


@pytest.fixture(scope="module")
def _scene(scenes_dir):
    import os

    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.wavefront import read_scene

    def load(name):
        return compile_scene(read_scene(os.path.join(scenes_dir, f"{name}.obj")))

    return load


def test_mitsuba_parity(_scene):
    """BASELINE config 3: roughConductor/roughDielectric + textures."""
    opt = RenderOptions(width=24, height=24, spp=2, num_bounces=3, min_bounces_for_rr=4)
    _compare(_scene("mitsuba"), opt, modes=("bvh",), atol=2e-4)


def test_instanced_parity(_scene):
    """BASELINE config 4: two-level BVH with transformed instances."""
    opt = RenderOptions(width=24, height=24, spp=2, num_bounces=2, min_bounces_for_rr=3)
    _compare(_scene("instanced"), opt, modes=("bvh", "packet"))


def test_dispersive_parity(_scene):
    """BASELINE config 5: dispersive dielectric + HDR env map."""
    opt = RenderOptions(width=24, height=24, spp=2, num_bounces=3, min_bounces_for_rr=4)
    _compare(_scene("dispersive"), opt, modes=("bvh",), atol=2e-4)


def test_pallas_parity(cornell_scene):
    """Pallas kernels (interpret mode on CPU) against the golden renderer."""
    opt = RenderOptions(width=32, height=32, spp=1, num_bounces=2, min_bounces_for_rr=3)
    _compare(cornell_scene, opt, modes=("pallas", "pallas8"))


def test_pallas_nodes_matches_smem(cornell_scene, monkeypatch):
    """The streamed-NODES kernel (big-scene path: depth-ordered resident
    prefix + HBM record DMA) must produce EXACTLY the in-SMEM kernel's
    image. Resident prefix forced tiny so nearly every visit streams."""
    monkeypatch.setenv("POLARIS_RESIDENT_KB", "1")
    opt = RenderOptions(width=32, height=32, spp=1, num_bounces=2, min_bounces_for_rr=3)
    smem = np.asarray(TpuRenderer(cornell_scene, mode="pallas").render_accum(opt))
    nodes = np.asarray(
        TpuRenderer(cornell_scene, mode="pallas_nodes").render_accum(opt)
    )
    np.testing.assert_array_equal(nodes, smem)


def test_pallas_nodes_terrain_parity():
    """A procedural instanced terrain through the streamed-nodes kernel vs
    the per-lane XLA traversal (both intersection paths are independent)."""
    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.procedural import make_terrain_scene

    scene = compile_scene(make_terrain_scene(grid=32))
    opt = RenderOptions(width=24, height=24, spp=1, num_bounces=2, min_bounces_for_rr=3)
    ref = np.asarray(TpuRenderer(scene, mode="bvh").render_accum(opt))
    got = np.asarray(TpuRenderer(scene, mode="pallas_nodes").render_accum(opt))
    assert ref.mean() > 0.01  # scene actually renders something
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_pallas8_nodes_matches_smem(cornell_scene, monkeypatch):
    """The 8-wide streamed kernel (big-scene path round 4: wide nodes +
    resident prefix + HBM window DMA for nodes AND triangles) must produce
    EXACTLY the same image with a forced-tiny resident prefix (nearly every
    node visit streams) as with the full forest resident — pinning the
    window-cache/DMA machinery — and match the binary in-SMEM kernel's
    image bit-for-bit (same det^2-scaled leaf arithmetic; the wide visit
    order may only differ on exact ties, absent here)."""
    opt = RenderOptions(width=32, height=32, spp=1, num_bounces=2, min_bounces_for_rr=3)
    smem = np.asarray(TpuRenderer(cornell_scene, mode="pallas").render_accum(opt))
    full = np.asarray(
        TpuRenderer(cornell_scene, mode="pallas8_nodes").render_accum(opt)
    )
    monkeypatch.setenv("POLARIS_RESIDENT_KB", "1")
    tiny = np.asarray(
        TpuRenderer(cornell_scene, mode="pallas8_nodes").render_accum(opt)
    )
    np.testing.assert_array_equal(tiny, full)
    np.testing.assert_array_equal(full, smem)


def test_pallas8_nodes_terrain_parity():
    """Instanced terrain through the 8-wide streamed kernel vs the
    independent per-lane XLA traversal."""
    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.procedural import make_terrain_scene

    scene = compile_scene(make_terrain_scene(grid=32))
    opt = RenderOptions(width=24, height=24, spp=1, num_bounces=2, min_bounces_for_rr=3)
    ref = np.asarray(TpuRenderer(scene, mode="bvh").render_accum(opt))
    got = np.asarray(TpuRenderer(scene, mode="pallas8_nodes").render_accum(opt))
    assert ref.mean() > 0.01
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_pallas_stream_matches_smem(cornell_scene):
    """The HBM triangle-streaming kernel (big-scene path: leaves DMA'd into
    SMEM on demand) must produce EXACTLY the in-SMEM kernel's image."""
    opt = RenderOptions(width=32, height=32, spp=1, num_bounces=2, min_bounces_for_rr=3)
    smem = np.asarray(TpuRenderer(cornell_scene, mode="pallas").render_accum(opt))
    stream = np.asarray(
        TpuRenderer(cornell_scene, mode="pallas_stream").render_accum(opt)
    )
    np.testing.assert_array_equal(stream, smem)


def test_image_nonblack(cornell_scene):
    opt = RenderOptions(width=32, height=32, spp=1, num_bounces=3, min_bounces_for_rr=4)
    img = TpuRenderer(cornell_scene, mode="bvh").render(opt)
    assert img.mean() > 0.05
    assert img.max() <= 1.0


def test_tile_coherent_rr_parity(cornell_scene):
    """Tile-coherent Russian roulette (rr_tile_coherent): blocks draw one
    survival uniform, lanes keep their own survival probability and boost —
    unbiased, and the oracle (which shares shade() and the RNG layout) must
    agree exactly. Also checks it actually changes the RR pattern."""
    opt = RenderOptions(
        width=32, height=32, spp=2, num_bounces=4, min_bounces_for_rr=1,
        rr_tile_coherent=True,
    )
    _compare(cornell_scene, opt, modes=("bvh", "pallas"))
    base = RenderOptions(
        width=32, height=32, spp=2, num_bounces=4, min_bounces_for_rr=1,
    )
    a = np.asarray(TpuRenderer(cornell_scene, mode="bvh").render_accum(base))
    b = np.asarray(TpuRenderer(cornell_scene, mode="bvh").render_accum(opt))
    assert not np.array_equal(a, b)  # the mode is live, not a no-op
