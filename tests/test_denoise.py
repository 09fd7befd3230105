"""Edge-avoiding à-trous wavelet denoiser (render/denoise.py).

No reference analogue — this is a beyond-the-reference post-process. The
contract under test: flat regions pass through unchanged, noise variance
drops, geometric edges (guided by normal/depth) are never crossed, the
filter is differentiable, and the guide pass + CLI wiring work end to end.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from polaris_tpu.render.denoise import (
    atrous_denoise,
    denoise_accum,
    render_guides,
)
from polaris_tpu.render.integrator import TpuRenderer
from polaris_tpu.render.options import RenderOptions


def _flat_guides(h, w):
    nrm = np.zeros((h, w, 3), np.float32)
    nrm[..., 2] = 1.0
    return jnp.asarray(nrm), jnp.full((h, w), 0.5, jnp.float32)


def test_flat_region_passes_through():
    h = w = 32
    nrm, z = _flat_guides(h, w)
    c = jnp.full((h, w, 3), 0.7, jnp.float32)
    out = atrous_denoise(jnp, c, nrm, z, iterations=3)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)


def test_noise_variance_drops():
    h = w = 64
    nrm, z = _flat_guides(h, w)
    rs = np.random.RandomState(7)
    noisy = 1.0 + 0.3 * rs.randn(h, w, 3).astype(np.float32)
    # large c_phi isolates the wavelet smoothing from the color edge-stop
    out = np.asarray(
        atrous_denoise(jnp, jnp.asarray(noisy), nrm, z,
                       iterations=3, c_phi=100.0)
    )
    # interior only (edge padding correlates border taps)
    sl = np.s_[8:-8, 8:-8]
    var_in = np.var(noisy[sl] - 1.0)
    var_out = np.var(out[sl] - 1.0)
    assert var_out < 0.05 * var_in
    # and the mean is preserved
    assert abs(out[sl].mean() - noisy[sl].mean()) < 0.01


def test_geometric_edges_not_crossed():
    h = w = 32
    c = np.zeros((h, w, 3), np.float32)
    c[:, w // 2:] = 5.0
    nrm = np.zeros((h, w, 3), np.float32)
    nrm[:, : w // 2, 2] = 1.0
    nrm[:, w // 2:, 0] = 1.0
    z = np.full((h, w), 0.2, np.float32)
    z[:, w // 2:] = 0.8
    out = np.asarray(
        atrous_denoise(jnp, jnp.asarray(c), jnp.asarray(nrm),
                       jnp.asarray(z), iterations=4)
    )
    # each side is flat and the guides kill every cross-edge tap, so the
    # hard 0 -> 5 step must survive essentially untouched
    np.testing.assert_allclose(out, c, atol=1e-3)


def test_despeckle_kills_isolated_firefly_preserves_features():
    from polaris_tpu.render.denoise import despeckle

    h = w = 16
    c = np.full((h, w, 3), 0.5, np.float32)
    c[4, 4] = 500.0            # isolated single-pixel firefly
    c[4, 10:12] = 300.0        # 2-pixel speckle pair (RR-boost shape)
    c[0, 0] = 400.0            # CORNER firefly (edge padding must not
    c[0, 6:8] = 200.0          # self-copy) + border speckle pair
    c[10:12, 10:12] = 8.0      # genuine 2x2 bright feature
    out = np.asarray(despeckle(jnp, jnp.asarray(c)))
    # fireflies and pairs drop to background luminance (second-max
    # neighbor clamp: a pair member has only ONE bright real neighbor),
    # including at the corner/border where OOB taps must not count
    np.testing.assert_allclose(out[4, 4], 0.5, rtol=1e-5)
    np.testing.assert_allclose(out[4, 10:12], 0.5, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0], 0.5, rtol=1e-5)
    np.testing.assert_allclose(out[0, 6:8], 0.5, rtol=1e-5)
    # the 2x2 feature gives each pixel 3 same-luminance neighbors: untouched
    np.testing.assert_array_equal(out[10:12, 10:12], c[10:12, 10:12])
    # everything else unchanged
    mask = np.ones((h, w), bool)
    mask[4, 4] = False
    mask[4, 10:12] = False
    mask[0, 0] = False
    mask[0, 6:8] = False
    np.testing.assert_array_equal(out[mask], c[mask])


def test_denoiser_is_differentiable():
    h = w = 16
    nrm, z = _flat_guides(h, w)
    rs = np.random.RandomState(3)
    c = jnp.asarray(1.0 + 0.1 * rs.randn(h, w, 3).astype(np.float32))

    g = jax.grad(
        lambda x: jnp.sum(atrous_denoise(jnp, x, nrm, z, iterations=2) ** 2)
    )(c)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0


def test_render_guides_sphere(sphere_scene):
    opt = RenderOptions(width=32, height=32, spp=1, num_bounces=2,
                        min_bounces_for_rr=99)
    r = TpuRenderer(sphere_scene, mode="bvh")
    nrm, z = render_guides(r, opt)
    assert nrm.shape == (32, 32, 3) and z.shape == (32, 32)
    lens = np.linalg.norm(nrm, axis=-1)
    hits = lens > 0.5
    assert hits.any()
    # unit normals at hits, zero off-hit; depth normalized with misses at 1
    np.testing.assert_allclose(lens[hits], 1.0, atol=1e-4)
    np.testing.assert_allclose(lens[~hits], 0.0, atol=1e-6)
    assert z.min() >= 0.0 and z.max() <= 1.0
    np.testing.assert_allclose(z[~hits], 1.0)
    # deterministic: seed-independent pixel-center rays
    nrm2, z2 = render_guides(r, opt)
    np.testing.assert_array_equal(nrm, nrm2)
    np.testing.assert_array_equal(z, z2)


def test_denoise_reduces_mse_against_converged_render(sphere_scene):
    W = H = 48
    r = TpuRenderer(sphere_scene, mode="bvh")
    noisy_opt = RenderOptions(width=W, height=H, spp=1, num_bounces=3,
                              min_bounces_for_rr=99)
    ref_opt = RenderOptions(width=W, height=H, spp=64, num_bounces=3,
                            min_bounces_for_rr=99)
    noisy = np.asarray(r.render_accum(noisy_opt)) / noisy_opt.spp
    ref = np.asarray(r.render_accum(ref_opt)) / ref_opt.spp
    den = denoise_accum(r, noisy_opt, noisy * noisy_opt.spp,
                        noisy_opt.spp) / noisy_opt.spp
    mse_noisy = np.mean((noisy - ref) ** 2)
    mse_den = np.mean((den - ref) ** 2)
    assert mse_den < mse_noisy


def test_pipeline_denoise_stage_matches_direct(sphere_scene):
    from polaris_tpu.render.pipeline import (
        Pipeline,
        denoise_stage,
        tonemap_stage,
    )
    from polaris_tpu.render.shade import tonemap_reinhard

    opt = RenderOptions(width=32, height=32, spp=2, num_bounces=3,
                        min_bounces_for_rr=99)
    r = TpuRenderer(sphere_scene, mode="bvh")
    accum = np.asarray(r.render_accum(opt))
    pipe = Pipeline(post_process=[denoise_stage(iterations=2),
                                  tonemap_stage()])
    img = pipe.run(r, opt, accum=accum)
    manual = np.asarray(
        tonemap_reinhard(
            np,
            denoise_accum(r, opt, accum, opt.spp, iterations=2),
            1.0 / opt.spp,
            opt.exposure,
        )
    )
    np.testing.assert_allclose(img, manual, atol=1e-6)


# ----- CLI wiring (run_cli fixture: conftest.py) -----


def test_cli_denoise_render(tmp_path, scenes_dir, run_cli):
    obj = os.path.join(scenes_dir, "sphere.obj")
    out = tmp_path / "den.png"
    r = run_cli(
        ["render", "frame", obj, "--width", "32", "--height", "32",
         "--spp", "2", "--num-bounces", "2", "--mode", "bvh",
         "--denoise", "2", "--out", str(out)],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert out.exists()


def test_cli_denoise_rejects_incompatible_flags(tmp_path, scenes_dir, run_cli):
    obj = os.path.join(scenes_dir, "sphere.obj")
    r = run_cli(
        ["render", "frame", obj, "--width", "32", "--height", "32",
         "--spp", "2", "--denoise", "2", "--adaptive", "0.02"],
        str(tmp_path),
    )
    assert r.returncode == 2
    r = run_cli(
        ["render", "progressive", obj, "--width", "32", "--height", "32",
         "--spp", "1", "--denoise", "2"],
        str(tmp_path),
    )
    assert r.returncode == 2
