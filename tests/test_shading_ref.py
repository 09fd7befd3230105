"""Cross-check the device shading formulas against the independent oracle.

Round-1 VERDICT weak #1: the golden renderer (cpu_ref/renderer.py) shares its
shading-formula modules with the device path, so a silently wrong GGX/MIS/NEE
formula passed every parity gate. cpu_ref/shading_ref.py is a second,
from-scratch f64 implementation of the same physics in algebraically
different forms (Walter'07 algebraic GGX vs the tan^2 form, Karis rational
G1, complex-arithmetic conductor Fresnel, plane+Gram light intersection vs
Moller-Trumbore) that deliberately imports nothing from ops/ or render/.

Every test here evaluates the device functions (ops/bxdf.py, ops/vec.py,
ops/emissive.py, render/shade.py) with ``xp = numpy`` at float64 on
randomized surface configurations and requires agreement with the oracle to
near machine precision — so a silent divergence of the shared formula
modules from the reference contract (docs/parity.md) fails here even though
the renderer-level parity gates would still "agree with themselves".

Reference anchors: CL/bxdf/*.cl, CL/samplers/distribution_sampler.cl:16-112,
CL/samplers/emissive_sampler.cl, CL/util/fresnel.cl, CL/kernels/hdr.cl.
"""

import numpy as np
import pytest

from polaris_tpu.cpu_ref import shading_ref as ref
from polaris_tpu.ops import bxdf as B
from polaris_tpu.ops import emissive as E
from polaris_tpu.ops import vec as V
from polaris_tpu.ops.statics import Static
from polaris_tpu.render import shade

xp = np  # device formulas evaluated in float64 numpy

N = 4096

ALL_BXDF = frozenset(
    int(b)
    for b in (
        B.BXDF_EMISSIVE,
        B.BXDF_DIFFUSE,
        B.BXDF_CONDUCTOR,
        B.BXDF_ROUGH_CONDUCTOR,
        B.BXDF_DIELECTRIC,
        B.BXDF_ROUGH_DIELECTRIC,
    )
)
# texture-free, all BxDFs live: mat_sample* returns constants directly
S = {
    "_stx": Static(
        tex_fields=frozenset(),
        ops=frozenset(),
        bxdf_types=ALL_BXDF,
        lights=frozenset({"area", "env"}),
        bg_tex=False,
    )
}


def _unit(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _hemi(rng, n, normal, lo=0.05):
    """Random unit dirs with dot(v, normal) in [lo, 1] (away from grazing)."""
    v = _unit(rng, n)
    d = np.sum(v * normal, axis=-1, keepdims=True)
    v = np.where(d < 0, v - 2 * d * normal, v)  # flip into upper hemisphere
    # reject near-grazing by blending toward the normal
    d = np.sum(v * normal, axis=-1, keepdims=True)
    v = np.where(d < lo, v + (lo - d + 0.05) * normal, v)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _mats(rng, n, kind_bit, kind_name, ior_zero=False):
    """Paired (device-mat, oracle-mat) dicts with identical random fields."""
    kd = rng.uniform(0.02, 0.98, (n, 3))
    ks = rng.uniform(0.02, 0.98, (n, 3))
    tf = rng.uniform(0.02, 0.98, (n, 3))
    # includes values below MIN_ROUGHNESS to exercise the Disney clamp
    rough = rng.uniform(0.02, 1.0, n)
    int_ior = np.zeros(n) if ior_zero else rng.uniform(1.05, 2.4, n)
    ext_ior = np.ones(n)
    neg1 = np.full(n, -1, np.int32)
    dev = {
        "type": np.full(n, kind_bit, np.int32),
        "reflectance": kd,
        "reflectance_tex": neg1,
        "specularity": ks,
        "specularity_tex": neg1,
        "transmittance": tf,
        "transmittance_tex": neg1,
        "roughness": rough,
        "roughness_tex": neg1,
        "int_ior": int_ior,
        "ext_ior": ext_ior,
    }
    orc = {
        "kind": kind_name,
        "kd": kd,
        "ks": ks,
        "tf": tf,
        "roughness": rough,
        "int_ior": int_ior,
        "ext_ior": ext_ior,
    }
    return dev, orc


def _surface(rng, n, two_sided=False):
    normal = _unit(rng, n)
    i = _hemi(rng, n, normal)
    o = _unit(rng, n) if two_sided else _hemi(rng, n, normal)
    uv = rng.uniform(0, 1, (n, 2))
    return normal, i, o, uv


# ------------------------------------------------------------- GGX pieces


def test_ggx_d_matches_walter_algebraic_form():
    rng = np.random.default_rng(0)
    n = _unit(rng, N)
    m = _unit(rng, N)
    alpha = rng.uniform(0.01, 1.0, N)
    # exclude exactly-grazing m (|cos| < 1e-5): the device's documented
    # gradient-safety floor (ggx_d cos^2 <= 1e-12 -> 0, docs/parity.md #11)
    # takes the limit there while the algebraic form is discontinuous
    keep = np.abs(np.sum(n * m, -1)) > 1e-5
    dev = B.ggx_d(xp, alpha, n, m)
    orc = ref.ggx_ndf(alpha, np.sum(n * m, -1))
    np.testing.assert_allclose(dev[keep], orc[keep], rtol=1e-9, atol=1e-12)


def test_smith_g1_matches_karis_rational_form():
    rng = np.random.default_rng(1)
    n = _unit(rng, N)
    v = _unit(rng, N)
    m = _unit(rng, N)
    alpha = rng.uniform(0.01, 1.0, N)
    dev = B.ggx_g1(xp, alpha, v, n, m)
    orc = ref.smith_g1(alpha, np.sum(n * v, -1), np.sum(m * v, -1))
    np.testing.assert_allclose(dev, orc, rtol=1e-9, atol=1e-12)


def test_ggx_sample_half_vector_polar_angle():
    rng = np.random.default_rng(2)
    n = _unit(rng, N)
    alpha = rng.uniform(0.02, 1.0, N)
    u1 = rng.uniform(0.001, 0.999, N)
    u2 = rng.uniform(0, 1, N)
    h = B.ggx_sample_h(xp, alpha, n, u1, u2)
    cos_dev = np.sum(h * n, -1)
    cos_orc = np.cos(ref.ggx_half_theta(alpha, u1))
    np.testing.assert_allclose(cos_dev, cos_orc, rtol=1e-7, atol=1e-9)


def test_ggx_pdfs_match_walter_jacobians():
    rng = np.random.default_rng(3)
    normal, i, o, _ = _surface(rng, N)
    alpha = rng.uniform(0.02, 1.0, N)
    h = i + o
    h /= np.linalg.norm(h, axis=-1, keepdims=True)
    dev = B.ggx_reflection_pdf(xp, alpha, i, o, normal, h)
    orc = ref.ggx_reflect_pdf(alpha, normal, h, o)
    np.testing.assert_allclose(dev, orc, rtol=1e-8, atol=1e-12)

    eta_i = rng.uniform(1.0, 1.8, N)
    eta_t = rng.uniform(1.0, 1.8, N)
    o2 = -_hemi(rng, N, normal)  # transmission side
    ht = -(eta_i[:, None] * i + eta_t[:, None] * o2)
    ht /= np.linalg.norm(ht, axis=-1, keepdims=True)
    dev = B.ggx_refraction_pdf(xp, alpha, eta_i, eta_t, i, o2, normal, ht)
    orc = ref.ggx_refract_pdf(alpha, eta_i, eta_t, normal, ht, i, o2)
    np.testing.assert_allclose(dev, orc, rtol=1e-8, atol=1e-12)


# --------------------------------------------------------------- fresnel


def test_fresnel_schlick_f0_identity():
    rng = np.random.default_rng(4)
    eta_i = rng.uniform(1.0, 2.5, N)
    eta_t = rng.uniform(1.0, 2.5, N)
    cos_i = rng.uniform(-1, 1, N)
    dev = V.fresnel_dielectric(xp, eta_i, eta_t, cos_i)
    orc = ref.schlick_fresnel(eta_i, eta_t, cos_i)
    np.testing.assert_allclose(dev, orc, rtol=1e-10, atol=1e-14)


def test_fresnel_conductor_exact_vs_complex_route():
    rng = np.random.default_rng(5)
    cos_i = rng.uniform(0.01, 1.0, N)
    eta = rng.uniform(0.1, 3.0, N)
    k = rng.uniform(0.1, 5.0, N)
    dev = V.fresnel_conductor_exact(xp, cos_i, eta, k)
    orc = ref.conductor_fresnel_exact(cos_i, eta, k)
    np.testing.assert_allclose(dev, orc, rtol=1e-7, atol=1e-9)


# ----------------------------------------------------------- eval / pdf


@pytest.mark.parametrize(
    "kind_bit,kind_name",
    [
        (B.BXDF_DIFFUSE, "diffuse"),
        (B.BXDF_ROUGH_CONDUCTOR, "roughConductor"),
        (B.BXDF_ROUGH_DIELECTRIC, "roughDielectric"),
    ],
)
def test_eval_matches_oracle(kind_bit, kind_name):
    rng = np.random.default_rng(kind_bit)
    normal, i, o, uv = _surface(rng, N, two_sided=True)
    dev_m, orc_m = _mats(rng, N, kind_bit, kind_name)
    dev = B.bxdf_eval(xp, S, dev_m, normal, uv, i, o)
    orc = ref.eval_bxdf(orc_m, normal, i, o)
    np.testing.assert_allclose(dev, orc, rtol=1e-6, atol=1e-9)


def test_eval_rough_conductor_no_ior_forces_f1():
    rng = np.random.default_rng(40)
    normal, i, o, uv = _surface(rng, N)
    dev_m, orc_m = _mats(rng, N, B.BXDF_ROUGH_CONDUCTOR, "roughConductor",
                         ior_zero=True)
    dev = B.bxdf_eval(xp, S, dev_m, normal, uv, i, o)
    orc = ref.eval_bxdf(orc_m, normal, i, o)
    np.testing.assert_allclose(dev, orc, rtol=1e-6, atol=1e-9)


def test_eval_singular_models_are_zero():
    rng = np.random.default_rng(41)
    normal, i, o, uv = _surface(rng, N)
    for bit, name in ((B.BXDF_CONDUCTOR, "conductor"),
                      (B.BXDF_DIELECTRIC, "dielectric")):
        dev_m, orc_m = _mats(rng, N, bit, name)
        assert np.all(B.bxdf_eval(xp, S, dev_m, normal, uv, i, o) == 0.0)
        assert np.all(ref.eval_bxdf(orc_m, normal, i, o) == 0.0)
        assert np.all(B.bxdf_pdf(xp, S, dev_m, normal, uv, i, o) == 0.0)
        assert np.all(ref.pdf_bxdf(orc_m, normal, i, o) == 0.0)


@pytest.mark.parametrize(
    "kind_bit,kind_name",
    [
        (B.BXDF_DIFFUSE, "diffuse"),
        (B.BXDF_ROUGH_CONDUCTOR, "roughConductor"),
        (B.BXDF_ROUGH_DIELECTRIC, "roughDielectric"),
    ],
)
def test_pdf_matches_oracle(kind_bit, kind_name):
    rng = np.random.default_rng(kind_bit + 100)
    normal, i, o, uv = _surface(rng, N, two_sided=True)
    dev_m, orc_m = _mats(rng, N, kind_bit, kind_name)
    dev = B.bxdf_pdf(xp, S, dev_m, normal, uv, i, o)
    orc = ref.pdf_bxdf(orc_m, normal, i, o)
    np.testing.assert_allclose(dev, orc, rtol=1e-6, atol=1e-10)


# ----------------------------------------------------------------- sample


def test_sample_conductor_matches_oracle():
    rng = np.random.default_rng(6)
    normal, i, _, uv = _surface(rng, N)
    dev_m, orc_m = _mats(rng, N, B.BXDF_CONDUCTOR, "conductor")
    u1 = rng.uniform(0, 1, N)
    u2 = rng.uniform(0, 1, N)
    d_out, d_pdf, d_val = B.bxdf_sample(xp, S, dev_m, normal, uv, i, u1, u2)
    o_out, o_pdf, o_val = ref.sample_value_conductor(orc_m, normal, i)
    np.testing.assert_allclose(d_out, o_out, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(d_pdf, o_pdf)
    np.testing.assert_allclose(d_val, o_val, rtol=1e-8, atol=1e-12)


def test_sample_dielectric_matches_oracle_including_tir():
    rng = np.random.default_rng(7)
    normal = _unit(rng, N)
    # half the batch hits from inside at shallow angles so TIR occurs
    i = _hemi(rng, N, normal, lo=0.01)
    flip = rng.uniform(0, 1, N) < 0.5
    i = np.where(flip[:, None], -i, i)
    uv = rng.uniform(0, 1, (N, 2))
    dev_m, orc_m = _mats(rng, N, B.BXDF_DIELECTRIC, "dielectric")
    u1 = rng.uniform(0, 1, N)
    u2 = rng.uniform(0, 1, N)
    d_out, d_pdf, d_val = B.bxdf_sample(xp, S, dev_m, normal, uv, i, u1, u2)
    o_out, o_pdf, o_val = ref.sample_value_dielectric(orc_m, normal, i, u1)
    # TIR must actually be exercised for the test to mean anything
    eta_i, _ = ref._oriented_iors(orc_m, ref._dot(i, normal))
    assert (eta_i > 1.0).any()
    np.testing.assert_allclose(d_out, o_out, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(d_pdf, o_pdf, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(d_val, o_val, rtol=1e-8, atol=1e-10)


def test_sample_diffuse_cosine_warp_and_pdf():
    rng = np.random.default_rng(8)
    normal, i, _, uv = _surface(rng, N)
    dev_m, _ = _mats(rng, N, B.BXDF_DIFFUSE, "diffuse")
    u1 = rng.uniform(0.001, 0.999, N)
    u2 = rng.uniform(0, 1, N)
    out, pdf, val = B.bxdf_sample(xp, S, dev_m, normal, uv, i, u1, u2)
    # the cosine warp's analytic invariant: cos(theta) = sqrt(1 - u1)
    np.testing.assert_allclose(
        np.sum(out * normal, -1), np.sqrt(1.0 - u1), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        pdf, np.sqrt(1.0 - u1) / np.pi, rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(val, dev_m["reflectance"] / np.pi, rtol=1e-9)


@pytest.mark.parametrize(
    "kind_bit,kind_name",
    [
        (B.BXDF_ROUGH_CONDUCTOR, "roughConductor"),
        (B.BXDF_ROUGH_DIELECTRIC, "roughDielectric"),
    ],
)
def test_sample_rough_is_consistent_with_eval_pdf_and_oracle(kind_bit, kind_name):
    """The sampled (out, pdf, value) triple must agree with eval()/pdf() at
    the sampled direction — and therefore (transitively) with the oracle,
    which the eval/pdf tests pin.

    Excluded lanes (domains where sample-pdf and pdf-function legitimately
    differ, in the reference too):
      * i.h <= 0 for the sampled half-vector h: reflect(i, h) lands below
        the surface and pdf()'s h-reconstruction normalize(i+o) yields -h
        (D(-h) = 0). The reference has the identical inconsistency: its
        pdf() also reconstructs h from i+o (rough_conductor.cl /
        rough_dielectric.cl:95-97) while sample() keeps the true h.
      * TIR lanes for roughDielectric (sample-pdf is defined as 1 there,
        not the GGX density).
    """
    rng = np.random.default_rng(kind_bit + 7)
    normal = _unit(rng, N)
    i = _hemi(rng, N, normal, lo=0.3)  # outside hits, away from grazing
    uv = rng.uniform(0, 1, (N, 2))
    dev_m, orc_m = _mats(rng, N, kind_bit, kind_name)
    u1 = rng.uniform(0.01, 0.99, N)
    u2 = rng.uniform(0, 1, N)
    out, pdf, val = B.bxdf_sample(xp, S, dev_m, normal, uv, i, u1, u2)
    pdf2 = B.bxdf_pdf(xp, S, dev_m, normal, uv, i, out)
    val2 = B.bxdf_eval(xp, S, dev_m, normal, uv, i, out)
    orc_pdf = ref.pdf_bxdf(orc_m, normal, i, out)
    orc_val = ref.eval_bxdf(orc_m, normal, i, out)
    # reconstruct the sampled half-vector deterministically (same warp)
    alpha = ref.alpha_from_roughness(dev_m["roughness"])
    h_s = B.ggx_sample_h(xp, alpha, normal, u1, u2)
    keep = np.sum(i * h_s, -1) > 1e-3
    if kind_name == "roughDielectric":
        cos_i = np.sum(i * normal, -1)
        eta_i, eta_t = ref._oriented_iors(orc_m, cos_i)
        eta = eta_i / eta_t
        keep &= eta * eta * (1.0 - cos_i**2) < 1.0  # not TIR
        # identify the reflect pick by comparing out to the mirror of i
        # about h_s (side-of-surface is not a valid proxy — refraction
        # about a tilted h can land on i's side); it must equal u1 <= F
        F = ref.schlick_fresnel(eta_i, eta_t, cos_i)
        refl = 2.0 * np.sum(i * h_s, -1)[:, None] * h_s - i
        picked_reflect = np.sum(out * refl, -1) > 1.0 - 1e-9
        assert np.array_equal(picked_reflect[keep], (u1 <= F)[keep])

        # refraction-picked lanes: eval()/pdf() dispatch on sign(cos_i)
        # (the reference contract, rough_dielectric.cl:93-95), so for an
        # outside hit they describe the REFLECTION lobe and legitimately
        # disagree with the refraction sample. Pin the sample directly
        # against the oracle's transmission-lobe formulas instead.
        refr = keep & ~picked_reflect
        assert refr.mean() > 0.2
        h_t = -(eta_i[:, None] * i + eta_t[:, None] * out)
        h_t /= np.linalg.norm(h_t, axis=-1, keepdims=True)
        o_pdf_t = ref.ggx_refract_pdf(alpha, eta_i, eta_t, normal, h_t, i, out)
        np.testing.assert_allclose(pdf[refr], o_pdf_t[refr], rtol=1e-6, atol=1e-10)
        ih = np.abs(np.sum(i * h_t, -1))
        oh = np.abs(np.sum(out * h_t, -1))
        cos_o = np.sum(out * normal, -1)
        focus = np.abs(
            ih * oh * eta_t**2 / (cos_i * cos_o * (eta_i * ih + eta_t * oh) ** 2)
        )
        trans = (
            (1.0 - F)
            * ref.ggx_ndf(alpha, np.sum(normal * h_t, -1))
            * ref.smith_g(alpha, normal, h_t, i, out)
            * focus
        )
        o_val_t = trans[:, None] * orc_m["tf"]
        np.testing.assert_allclose(val[refr], o_val_t[refr], rtol=1e-6, atol=1e-9)
        keep &= picked_reflect
    assert keep.sum() > 200  # the filters must not hollow out the test
    np.testing.assert_allclose(pdf[keep], pdf2[keep], rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(pdf[keep], orc_pdf[keep], rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(val[keep], val2[keep], rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(val[keep], orc_val[keep], rtol=1e-6, atol=1e-9)


# ----------------------------------------------------------------- lights


def _scene_dict(scene):
    geom, params = scene.split_params()
    return {**{k: np.asarray(v) if not k.startswith("_") else v
               for k, v in geom.items()},
            **{k: np.asarray(v) for k, v in params.items()}}


def _world_light_tris(Sc):
    """Plain-numpy reconstruction of the world-space light triangles (data
    plumbing only — the sampling/pdf FORMULAS under test come after)."""
    tri = Sc["emis_tri"]
    m = Sc["emis_o2w"]
    v0 = np.einsum("lij,lj->li", m[:, :3, :3], Sc["tri_v0"][tri]) + m[:, :3, 3]
    e1 = np.einsum("lij,lj->li", m[:, :3, :3], Sc["tri_e1"][tri])
    e2 = np.einsum("lij,lj->li", m[:, :3, :3], Sc["tri_e2"][tri])
    return v0, e1, e2


def test_area_light_sample_matches_oracle(cornell_scene):
    Sc = _scene_dict(cornell_scene)
    rng = np.random.default_rng(9)
    L = int(Sc["emis_area"].shape[0])
    assert L >= 1 and (np.asarray(Sc["emis_type"]) == 0).all()
    n = 2048
    point = rng.uniform(-0.8, 0.8, (n, 3)) * np.array([1, 1, 1.0])
    normal = _unit(rng, n)
    l_idx = rng.integers(0, L, n).astype(np.int32)
    u1 = rng.uniform(0.01, 0.99, n)
    u2 = rng.uniform(0.01, 0.99, n)
    d_val, d_dir, d_pdf, d_dist = E.emissive_sample(
        xp, Sc, point, normal, l_idx, u1, u2
    )

    v0w, e1w, e2w = _world_light_tris(Sc)
    mat = Sc["emis_mat"]
    # smooth interpolated normal at the sampled barycentrics, world-space —
    # same plumbing the device path uses; the formula under test is the
    # sqrt-warp + cos/d^2 estimator, recomputed independently by the oracle
    tn = Sc["tri_normals"][Sc["emis_tri"]]
    r = np.sqrt(u1)
    ru = (1 - u2) * r
    rv = u2 * r
    n_obj = (
        (1 - ru - rv)[:, None] * tn[l_idx, 0]
        + ru[:, None] * tn[l_idx, 1]
        + rv[:, None] * tn[l_idx, 2]
    )
    nmat = Sc["emis_nmat"][l_idx]
    l_normal = np.einsum("nij,nj->ni", nmat, n_obj)
    o_val, o_dir, o_pdf, o_dist = ref.area_light_sample(
        v0w[l_idx],
        e1w[l_idx],
        e2w[l_idx],
        l_normal,
        Sc["emis_area"][l_idx],
        Sc["mat_scale"][mat][l_idx],
        Sc["mat_radiance"][mat][l_idx],
        point,
        u1,
        u2,
    )
    np.testing.assert_allclose(d_dir, o_dir, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(d_dist, o_dist, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(d_pdf, o_pdf, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(d_val, o_val, rtol=1e-5, atol=1e-8)


def test_area_light_pdf_of_direction_matches_plane_gram_oracle(cornell_scene):
    """Device: Moller-Trumbore. Oracle: supporting plane + Gram-system
    barycentrics — a genuinely independent intersection route."""
    Sc = _scene_dict(cornell_scene)
    rng = np.random.default_rng(10)
    L = int(Sc["emis_area"].shape[0])
    n = 4096
    point = rng.uniform(-0.9, 0.9, (n, 3))
    normal = _unit(rng, n)
    l_idx = rng.integers(0, L, n).astype(np.int32)
    v0w, e1w, e2w = _world_light_tris(Sc)
    # half aimed at a random point ON the light (hits), half random (misses)
    u1 = rng.uniform(0.05, 0.95, n)
    u2 = rng.uniform(0.05, 0.95, n)
    lp, _, _ = ref.triangle_sample(v0w[l_idx], e1w[l_idx], e2w[l_idx], u1, u2)
    aimed = lp - point
    aimed /= np.linalg.norm(aimed, axis=-1, keepdims=True)
    rnd = _unit(rng, n)
    out_dir = np.where((np.arange(n) % 2 == 0)[:, None], aimed, rnd)

    d_pdf = E.emissive_pdf(xp, Sc, point, normal, l_idx, out_dir)
    o_pdf = ref.area_light_pdf_of_dir(
        v0w[l_idx], e1w[l_idx], e2w[l_idx], Sc["emis_area"][l_idx], point, out_dir
    )
    # hit/miss classification may differ within epsilon of triangle edges;
    # compare where both agree on the classification (>99% of lanes) and
    # require that disagreements are edge-grazing only
    both = (d_pdf > 0) == (o_pdf > 0)
    assert both.mean() > 0.99
    np.testing.assert_allclose(d_pdf[both], o_pdf[both], rtol=1e-5, atol=1e-8)
    assert (d_pdf > 0).any() and (d_pdf == 0).any()


def test_env_light_sample_matches_oracle():
    """Synthetic single-environment-light scene dict."""
    rng = np.random.default_rng(11)
    n = 2048
    Sc = {
        "_stx": Static(
            tex_fields=frozenset(),
            ops=frozenset(),
            bxdf_types=ALL_BXDF,
            lights=frozenset({"env"}),
            bg_tex=False,
        ),
        "emis_tri": np.zeros(1, np.int32),
        "emis_o2w": np.eye(4)[None],
        "emis_nmat": np.eye(3)[None],
        "emis_mat": np.zeros(1, np.int32),
        "emis_type": np.ones(1, np.int32),
        "emis_area": np.ones(1),
        "tri_v0": np.zeros((1, 3)),
        "tri_e1": np.eye(3)[:1],
        "tri_e2": np.eye(3)[1:2],
        "tri_normals": np.tile(np.eye(3)[2], (1, 3, 1)),
        "tri_uvs": np.zeros((1, 3, 2)),
        "mat_scale": np.array([2.5]),
        "mat_radiance": np.array([[0.9, 0.7, 0.5]]),
        "mat_radiance_tex": np.array([-1], np.int32),
    }
    point = rng.uniform(-1, 1, (n, 3))
    normal = _unit(rng, n)
    l_idx = np.zeros(n, np.int32)
    u1 = rng.uniform(0, 1, n)
    u2 = rng.uniform(0, 1, n)
    val, out, pdf, dist = E.emissive_sample(xp, Sc, point, normal, l_idx, u1, u2)
    # pdf must be the cosine-hemisphere density of the returned direction
    np.testing.assert_allclose(
        pdf, ref.env_light_pdf(normal, out), rtol=1e-7, atol=1e-10
    )
    # value = scale * ke / pi (the cos/pdf cancellation is the estimator)
    np.testing.assert_allclose(
        val,
        np.broadcast_to(2.5 * np.array([0.9, 0.7, 0.5]) / np.pi, val.shape),
        rtol=1e-7,
    )
    assert (np.sum(out * normal, -1) >= 0).all()
    assert (dist == V.FLT_MAX).all()
    # pdf-of-direction route
    d = _unit(rng, n)
    np.testing.assert_allclose(
        E.emissive_pdf(xp, Sc, point, normal, l_idx, d),
        ref.env_light_pdf(normal, d),
        rtol=1e-7,
        atol=1e-10,
    )


# ------------------------------------------------------- MIS / RR / tonemap


def test_power_heuristic_matches_veach():
    rng = np.random.default_rng(12)
    a = np.concatenate([rng.uniform(0, 10, N), np.zeros(4)])
    b = np.concatenate([rng.uniform(0, 10, N), np.zeros(4)])
    dev = shade.power_heuristic(xp, a, b)
    orc = ref.power_heuristic(a, b)
    np.testing.assert_allclose(dev, orc, rtol=1e-9, atol=1e-12)


def test_rr_survival_probability_matches_oracle():
    rng = np.random.default_rng(13)
    tp = rng.uniform(0, 3, (N, 3))
    dev = np.maximum(np.minimum(0.5, V.luminance(xp, tp)), 0.01)
    orc = ref.russian_roulette_prob(tp)
    np.testing.assert_allclose(dev, orc, rtol=1e-9)


def test_tonemap_matches_oracle():
    rng = np.random.default_rng(14)
    hdr = rng.uniform(0, 20, (N, 3))
    dev = shade.tonemap_reinhard(xp, hdr, 1.0 / 16, 1.2)
    orc = ref.reinhard_tonemap(hdr, 1.0 / 16, 1.2)
    np.testing.assert_allclose(dev, orc, rtol=1e-9, atol=1e-12)
