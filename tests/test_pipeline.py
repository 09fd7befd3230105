"""Post-process pipeline plug-board (≙ tracer/opencl/pipeline.go:33-70)."""

import os

import numpy as np

from polaris_tpu.render.integrator import TpuRenderer
from polaris_tpu.render.options import RenderOptions
from polaris_tpu.render.pipeline import (
    Pipeline,
    default_pipeline,
    save_hdr_stage,
    save_png_stage,
    tonemap_stage,
)
from polaris_tpu.render.shade import tonemap_reinhard


def test_default_pipeline_matches_renderer_render(sphere_scene):
    opt = RenderOptions(width=32, height=32, spp=2, num_bounces=3,
                        min_bounces_for_rr=99)
    r = TpuRenderer(sphere_scene, mode="bvh")
    img_pipe = default_pipeline().run(r, opt)
    img_direct = r.render(opt)
    np.testing.assert_allclose(img_pipe, img_direct, atol=1e-6)


def test_stage_chain_order_and_outputs(sphere_scene, tmp_path):
    opt = RenderOptions(width=32, height=32, spp=2, num_bounces=3,
                        min_bounces_for_rr=99)
    r = TpuRenderer(sphere_scene, mode="bvh")
    hdr_path = str(tmp_path / "frame.hdr")
    png_path = str(tmp_path / "frame.png")
    pipe = Pipeline(post_process=[
        save_hdr_stage(hdr_path),   # raw accumulator, pre-tonemap
        tonemap_stage(),
        save_png_stage(png_path),
    ])
    img = pipe.run(r, opt)
    assert os.path.exists(hdr_path) and os.path.exists(png_path)
    assert img.shape == (32, 32, 3) and img.min() >= 0 and img.max() <= 1

    # the .hdr round-trips the raw accumulator (RGBE has ~1% mantissa error)
    from polaris_tpu.asset.texture import _load_hdr

    accum = np.asarray(r.render_accum(opt))
    back = _load_hdr(hdr_path).data[..., :3]
    np.testing.assert_allclose(back, accum, rtol=0.05, atol=1e-3)


def test_pipeline_accum_passthrough():
    """Supplying a precomputed accumulator skips rendering."""
    opt = RenderOptions(width=4, height=4, spp=8, num_bounces=2)
    acc = np.full((4, 4, 3), 2.0, np.float32)
    pipe = Pipeline(post_process=[tonemap_stage()])
    img = pipe.run(renderer=None, opt=opt, accum=acc, accumulated_samples=8)
    expect = np.asarray(tonemap_reinhard(np, acc, 1 / 8, opt.exposure))
    np.testing.assert_allclose(img, expect, atol=1e-6)
