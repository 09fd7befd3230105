"""Physical property tests for the shared BxDF/sampling math.

The reference has no numerical kernel tests at all (SURVEY.md §4); these
furnace-style checks pin the estimators the renderers share.
"""

import numpy as np

from polaris_tpu.ops import rng
from polaris_tpu.ops import vec as V
from polaris_tpu.ops.bxdf import (
    BXDF_CONDUCTOR,
    BXDF_DIELECTRIC,
    BXDF_DIFFUSE,
    BXDF_ROUGH_CONDUCTOR,
    BXDF_ROUGH_DIELECTRIC,
    bxdf_eval,
    bxdf_pdf,
    bxdf_sample,
    ggx_d,
)

N = 200_000


def _mat(btype, n, **kw):
    base = {
        "type": np.full(n, btype, np.int32),
        "reflectance": np.tile(np.float32(kw.get("kd", (0.6, 0.5, 0.4))), (n, 1)),
        "specularity": np.tile(np.float32(kw.get("ks", (1.0, 1.0, 1.0))), (n, 1)),
        "transmittance": np.tile(np.float32(kw.get("tf", (1.0, 1.0, 1.0))), (n, 1)),
        "radiance": np.zeros((n, 3), np.float32),
        "int_ior": np.full(n, kw.get("int_ior", 1.517), np.float32),
        "ext_ior": np.full(n, kw.get("ext_ior", 1.0002926), np.float32),
        "scale": np.zeros(n, np.float32),
        "roughness": np.full(n, kw.get("rough", 0.3), np.float32),
        "reflectance_tex": np.full(n, -1, np.int32),
        "specularity_tex": np.full(n, -1, np.int32),
        "transmittance_tex": np.full(n, -1, np.int32),
        "radiance_tex": np.full(n, -1, np.int32),
        "roughness_tex": np.full(n, -1, np.int32),
    }
    return base


_S = {
    "tex_data": np.zeros(4, np.float32),
    "tex_offset": np.zeros(1, np.int32),
    "tex_width": np.ones(1, np.int32),
    "tex_height": np.ones(1, np.int32),
}


def _setup(n=N, seed=3):
    normal = np.tile(np.float32([0, 0, 1]), (n, 1))
    uv = np.zeros((n, 2), np.float32)
    in_dir = V.normalize3(np, np.tile(np.float32([0.3, 0.1, 0.8]), (n, 1)))
    pix = np.arange(n, dtype=np.uint32)
    u1 = rng.np_uniform(seed, pix, 0, 0)
    u2 = rng.np_uniform(seed, pix, 0, 1)
    return normal, uv, in_dir, u1, u2


def test_diffuse_white_furnace():
    """E[f * cos / pdf] = reflectance for a white furnace."""
    normal, uv, in_dir, u1, u2 = _setup()
    mat = _mat(BXDF_DIFFUSE, N, kd=(0.8, 0.6, 0.4))
    out, pdf, val = bxdf_sample(np, _S, mat, normal, uv, in_dir, u1, u2)
    cos = np.maximum(V.dot3(np, normal, out), 0.0)
    est = val * (cos / np.maximum(pdf, 1e-9))[:, None]
    np.testing.assert_allclose(est.mean(0), [0.8, 0.6, 0.4], atol=0.01)


def test_diffuse_pdf_matches_sampling():
    normal, uv, in_dir, u1, u2 = _setup()
    mat = _mat(BXDF_DIFFUSE, N)
    out, pdf, _ = bxdf_sample(np, _S, mat, normal, uv, in_dir, u1, u2)
    pdf2 = bxdf_pdf(np, _S, mat, normal, uv, in_dir, out)
    np.testing.assert_allclose(pdf, pdf2, atol=1e-5)
    # cosine-weighted: mean cos = 2/3
    cos = V.dot3(np, normal, out)
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01


def test_conductor_reflection_law():
    normal, uv, in_dir, u1, u2 = _setup(1000)
    mat = _mat(BXDF_CONDUCTOR, 1000, int_ior=0.0)
    out, pdf, val = bxdf_sample(np, _S, mat, normal, uv, in_dir, u1, u2)
    expected = V.reflect(np, in_dir, normal)
    np.testing.assert_allclose(out, expected, atol=1e-6)
    np.testing.assert_allclose(pdf, 1.0)
    # F=1 (no ior): throughput val*cos = ks
    cos = V.dot3(np, normal, out)
    np.testing.assert_allclose(val * cos[:, None], 1.0, atol=1e-5)


def test_dielectric_energy_split():
    """Reflection/refraction choice follows fresnel; directions obey Snell."""
    normal, uv, in_dir, u1, u2 = _setup()
    mat = _mat(BXDF_DIELECTRIC, N)
    out, pdf, val = bxdf_sample(np, _S, mat, normal, uv, in_dir, u1, u2)
    cos_out = V.dot3(np, normal, out)
    refl = cos_out > 0
    frac_refl = refl.mean()
    f = V.fresnel_dielectric(
        np, mat["ext_ior"][0], mat["int_ior"][0], V.dot3(np, normal, in_dir)[0]
    )
    assert abs(frac_refl - f) < 0.01
    # Snell: sin(theta_t) = sin(theta_i) / eta
    sin_i = np.sqrt(1 - V.dot3(np, normal, in_dir)[0] ** 2)
    sin_t = np.sqrt(1 - cos_out[~refl] ** 2)
    np.testing.assert_allclose(
        sin_t, sin_i * (1.0002926 / 1.517), atol=1e-4
    )


def test_rough_conductor_furnace_bounded():
    """Microfacet throughput with F=1, ks=1 must stay below ~1 (G<=1)."""
    normal, uv, in_dir, u1, u2 = _setup()
    mat = _mat(BXDF_ROUGH_CONDUCTOR, N, int_ior=0.0, rough=0.4)
    out, pdf, val = bxdf_sample(np, _S, mat, normal, uv, in_dir, u1, u2)
    cos = np.abs(V.dot3(np, normal, out))
    ok = pdf > 1e-6
    est = (val[:, 0] * cos)[ok] / pdf[ok]
    assert est.mean() < 1.05
    assert est.mean() > 0.5  # not wildly lossy either


def test_rough_conductor_pdf_consistency():
    normal, uv, in_dir, u1, u2 = _setup()
    mat = _mat(BXDF_ROUGH_CONDUCTOR, N, rough=0.5)
    out, pdf, _ = bxdf_sample(np, _S, mat, normal, uv, in_dir, u1, u2)
    pdf2 = bxdf_pdf(np, _S, mat, normal, uv, in_dir, out)
    # exclude below-horizon reflections (value 0, path killed; the
    # recomputed half-vector flips sign there)
    ok = (pdf > 1e-5) & (V.dot3(np, normal, out) > 0)
    np.testing.assert_allclose(pdf[ok], pdf2[ok], rtol=2e-4, atol=1e-5)


def test_ggx_d_integrates_to_one():
    """Integral of D(m) cos(m) over the hemisphere = 1."""
    n = np.float32([0, 0, 1])
    for alpha in (0.1, 0.3, 0.8):
        # integrate over spherical coords
        nt, nph = 256, 128
        theta = (np.arange(nt) + 0.5) / nt * (np.pi / 2)
        phi = (np.arange(nph) + 0.5) / nph * (2 * np.pi)
        tt, pp = np.meshgrid(theta, phi, indexing="ij")
        m = np.stack(
            [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)], -1
        ).reshape(-1, 3).astype(np.float32)
        d = ggx_d(np, np.full(m.shape[0], alpha, np.float32), n[None, :], m)
        integrand = d * m[:, 2] * np.sin(tt).reshape(-1)
        total = integrand.sum() * (np.pi / 2 / nt) * (2 * np.pi / nph)
        np.testing.assert_allclose(total, 1.0, rtol=0.02)


def test_eval_reciprocity_diffuse():
    normal, uv, in_dir, u1, u2 = _setup(1000)
    mat = _mat(BXDF_DIFFUSE, 1000)
    out, _, _ = bxdf_sample(np, _S, mat, normal, uv, in_dir, u1, u2)
    a = bxdf_eval(np, _S, mat, normal, uv, in_dir, out)
    b = bxdf_eval(np, _S, mat, normal, uv, out, in_dir)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_fresnel_conductor_exact():
    """Normal incidence: ((n-1)^2+k^2)/((n+1)^2+k^2); grazing -> 1."""
    from polaris_tpu.ops.vec import fresnel_conductor_exact

    eta, k = np.float32(0.2), np.float32(3.9)  # gold-ish at 600nm
    f0 = fresnel_conductor_exact(np, np.float32(1.0), eta, k)
    expect = ((eta - 1) ** 2 + k**2) / ((eta + 1) ** 2 + k**2)
    np.testing.assert_allclose(f0, expect, rtol=1e-5)
    fg = fresnel_conductor_exact(np, np.float32(1e-4), eta, k)
    assert fg > 0.99
    # bounded in [0,1] everywhere (metals dip slightly before the grazing
    # rise, so monotonicity is NOT expected)
    c = np.linspace(1.0, 0.01, 50, dtype=np.float32)
    f = fresnel_conductor_exact(np, c, eta, k)
    assert np.all((f >= 0) & (f <= 1))


def test_ior_database_full_vocabulary():
    """All 245 reference material names resolve (ior.go:10-)."""
    from polaris_tpu.asset.material.ior import KNOWN_IORS, lookup_ior

    assert len(KNOWN_IORS) == 245
    assert lookup_ior("Glass") == np.float32(1.51714)
    assert lookup_ior("air") == np.float32(1.0002926)
    assert lookup_ior("DIAMOND") == np.float32(2.417)
    for name, v in KNOWN_IORS.items():
        got = lookup_ior(name.lower())
        # metals' real part can be <1; silicon tops the list at 4.24
        assert got is not None and 0.04 <= got <= 4.3, name
