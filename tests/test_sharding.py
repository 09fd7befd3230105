"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference tests its scheduler with mock tracers (scheduler_test.go);
here the real renderer runs on a real (virtual) mesh and must produce a
bit-identical image for every mesh shape, thanks to the counter-based RNG.
"""

import jax
import numpy as np
import pytest

from polaris_tpu.parallel.mesh import DistributedRenderer, make_mesh
from polaris_tpu.render.integrator import TpuRenderer
from polaris_tpu.render.options import RenderOptions


@pytest.fixture(scope="module")
def opt():
    return RenderOptions(width=32, height=32, spp=2, num_bounces=2, min_bounces_for_rr=3)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_tile_sharding_matches_single_chip(cornell_scene, opt):
    single = np.asarray(TpuRenderer(cornell_scene, mode="bvh").render_accum(opt))
    mesh = make_mesh(tile=4, sample=1)
    dist = np.asarray(
        DistributedRenderer(cornell_scene, mesh, mode="bvh").render_accum(opt)
    )
    np.testing.assert_allclose(dist, single, atol=1e-5)


def test_sample_sharding_matches_single_chip(cornell_scene, opt):
    single = np.asarray(TpuRenderer(cornell_scene, mode="bvh").render_accum(opt))
    mesh = make_mesh(tile=1, sample=2)
    dist = np.asarray(
        DistributedRenderer(cornell_scene, mesh, mode="bvh").render_accum(opt)
    )
    np.testing.assert_allclose(dist, single, atol=1e-5)


def test_2d_mesh_matches_single_chip(cornell_scene, opt):
    single = np.asarray(TpuRenderer(cornell_scene, mode="bvh").render_accum(opt))
    mesh = make_mesh(tile=4, sample=2)
    dist = np.asarray(
        DistributedRenderer(cornell_scene, mesh, mode="bvh").render_accum(opt)
    )
    np.testing.assert_allclose(dist, single, atol=1e-5)


def test_pallas_kernel_under_mesh_matches_single_chip(cornell_scene, opt):
    """The production Pallas traversal composed with shard_map (interpret
    mode on the CPU mesh). Row-band sharding changes which rays share a
    traversal tile, but intersections are exact regardless of tile
    composition and the RNG is keyed by pixel — so the sharded image must be
    BIT-identical to the single-chip Pallas render."""
    single = np.asarray(TpuRenderer(cornell_scene, mode="pallas").render_accum(opt))
    mesh = make_mesh(tile=4, sample=2)
    dist = np.asarray(
        DistributedRenderer(cornell_scene, mesh, mode="pallas").render_accum(opt)
    )
    np.testing.assert_array_equal(dist, single)


def test_pallas_kernel_distributed_train_step(cornell_scene, opt):
    """Full distributed training step (render -> loss -> gradient psum over
    tile x sample axes -> SGD) through the Pallas traversal kernel."""
    mesh = make_mesh(tile=4, sample=2)
    dist = DistributedRenderer(cornell_scene, mesh, mode="pallas")
    target = np.zeros((opt.height, opt.width, 3), np.float32)
    loss = dist.train_step(opt, target, lr=0.05)
    assert np.isfinite(loss) and loss > 0
