"""Material DSL parser + validation (ref test model: material_expr_test.go)."""

import pytest

from polaris_tpu.asset import material as M


def test_parse_simple_bxdf():
    n = M.parse_expression("diffuse(reflectance: {0.9, 0.1, 0.1})")
    assert isinstance(n, M.BxdfNode)
    assert n.bxdf_type == M.BXDF_DIFFUSE
    assert n.params[0].name == "reflectance"
    assert n.params[0].value.value == (0.9, 0.1, 0.1)
    n.validate()


def test_parse_empty_params():
    n = M.parse_expression("diffuse()")
    n.validate()
    assert n.params == ()


def test_parse_texture_param():
    n = M.parse_expression('diffuse(reflectance: "tex.png")')
    assert isinstance(n.params[0].value, M.TextureNode)
    assert n.params[0].value.path == "tex.png"


def test_parse_named_ior():
    n = M.parse_expression('dielectric(intIOR: "Glass", extIOR: "Air")')
    n.validate()
    assert isinstance(n.params[0].value, M.MaterialNameNode)


def test_unknown_ior_name_rejected():
    n = M.parse_expression('dielectric(intIOR: "Unobtanium")')
    with pytest.raises(M.MaterialError):
        n.validate()


def test_parse_ops():
    n = M.parse_expression(
        "mix(diffuse(), conductor(specularity: {1,1,1}), 0.3)"
    )
    assert isinstance(n, M.MixNode)
    assert n.weight == pytest.approx(0.3)
    n.validate()

    n = M.parse_expression('mixMap(diffuse(), conductor(), "w.png")')
    assert isinstance(n, M.MixMapNode)

    n = M.parse_expression('bumpMap(diffuse(), "b.png")')
    assert isinstance(n, M.BumpMapNode)

    n = M.parse_expression('normalMap(diffuse(), "n.png")')
    assert isinstance(n, M.NormalMapNode)

    n = M.parse_expression(
        "disperse(dielectric(), intIOR: {1.51, 1.52, 1.53}, extIOR: {0, 0, 0})"
    )
    assert isinstance(n, M.DisperseNode)
    n.validate()


def test_material_reference_operand():
    n = M.parse_expression('mix("gold", "silver", 0.5)')
    assert isinstance(n.expressions[0], M.MaterialRefNode)
    assert n.expressions[0].name == "gold"


def test_energy_conservation_violations():
    with pytest.raises(M.MaterialError):
        M.parse_expression("diffuse(reflectance: {1.0, 0.5, 0.5})").validate()
    with pytest.raises(M.MaterialError):
        M.parse_expression("conductor(specularity: {1.1, 0.5, 0.5})").validate()
    with pytest.raises(M.MaterialError):
        M.parse_expression("roughConductor(roughness: 1.5)").validate()


def test_disallowed_parameter():
    with pytest.raises(M.MaterialError):
        M.parse_expression("diffuse(specularity: {1, 1, 1})").validate()


def test_parse_errors():
    for bad in [
        "",
        "unknownBxdf()",
        "diffuse(reflectance: )",
        "mix(diffuse(), 0.3)",
        "diffuse() trailing",
    ]:
        with pytest.raises(M.MaterialError):
            M.parse_expression(bad)


def test_mix_weight_range():
    with pytest.raises(M.MaterialError):
        M.parse_expression("mix(diffuse(), diffuse(), 1.5)").validate()


def test_disperse_requires_ior():
    with pytest.raises(M.MaterialError):
        M.parse_expression(
            "disperse(dielectric(), intIOR: {0,0,0}, extIOR: {0,0,0})"
        ).validate()
