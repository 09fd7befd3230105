"""Real multi-process (2-'host') rendering test over local CPU processes.

The multi-host path the reference never implemented (tracer/tracer.go:52-58
Remote flag): two jax.distributed processes share a (tile, sample) mesh and
must reproduce the single-process image bit-exactly (counter-based RNG)."""

import os

import numpy as np
import pytest

from polaris_tpu.render.integrator import TpuRenderer
from polaris_tpu.render.options import RenderOptions


@pytest.mark.slow
def test_two_process_render_matches(cornell_scene, tmp_path):
    from polaris_tpu.parallel.multihost import spawn_local_processes

    opt_kwargs = dict(
        width=16, height=16, spp=2, num_bounces=2, min_bounces_for_rr=3
    )
    opt = RenderOptions(**opt_kwargs)
    single = np.asarray(TpuRenderer(cornell_scene, mode="packet").render_accum(opt))

    scene_path = str(tmp_path / "scene.zip")
    cornell_scene.save(scene_path)
    out_path = str(tmp_path / "accum.npy")
    full = spawn_local_processes(
        scene_path, opt_kwargs, num_processes=2, tile=2, sample=1,
        out_path=out_path,
    )
    assert full.shape == single.shape
    np.testing.assert_allclose(full, single, atol=1e-5)
