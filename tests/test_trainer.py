"""Trainer: optimization convergence + checkpoint/resume round trip."""

import numpy as np

from polaris_tpu.render.options import RenderOptions
from polaris_tpu.render.trainer import TrainConfig, Trainer


def _target(scene, opt, factor=0.55):
    """Render a target with scaled-down diffuse colors."""
    from polaris_tpu.render.grad import DifferentiableRenderer
    from polaris_tpu.render.shade import tonemap_reinhard

    r = DifferentiableRenderer(scene, mode="bvh")
    params = dict(r.params)
    params["mat_reflectance"] = r.params["mat_reflectance"] * factor
    accum = np.asarray(r.render_from_params(opt, params))
    return tonemap_reinhard(np, accum + 1e-6, 1.0 / opt.spp, opt.exposure)


def test_fit_reduces_loss(cornell_scene, tmp_path):
    opt = RenderOptions(width=24, height=24, spp=2, num_bounces=2, min_bounces_for_rr=3)
    target = _target(cornell_scene, opt)
    cfg = TrainConfig(
        learning_rate=3e-2,
        num_steps=6,
        reseed_each_step=False,
        checkpoint_dir=str(tmp_path),
        checkpoint_every=3,
    )
    tr = Trainer(cornell_scene, opt, cfg, mode="bvh")
    history = tr.fit(target)
    assert history[-1] < history[0] * 0.7, history
    # checkpoint exists and is restorable into a fresh trainer
    tr2 = Trainer(cornell_scene, opt, cfg, mode="bvh")
    tr2.restore_checkpoint()
    assert tr2.step_idx == tr.step_idx
    np.testing.assert_allclose(
        np.asarray(tr2.renderer.params["mat_reflectance"]),
        np.asarray(tr.renderer.params["mat_reflectance"]),
    )
    # resumed training continues to improve
    l0 = tr2.step(target)
    assert np.isfinite(l0)
