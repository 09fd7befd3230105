"""Named index-of-refraction database.

Counterpart of the reference's ``asset/material/ior.go:10-`` (245-entry table
sourced from a public CG IOR list). Values are physical constants; the subset
here covers the names used by the reference's docs, defaults and example
scenes plus the common optical materials. Lookups are case-insensitive.
"""

from __future__ import annotations

KNOWN_IORS = {
    "Acetone": 1.36,
    "Agate": 1.544,
    "Air": 1.0002926,
    "Alcohol": 1.329,
    "Alexandrite": 1.745,
    "Aluminum": 1.44,
    "Amber": 1.546,
    "Amethyst": 1.544,
    "Aquamarine": 1.577,
    "Asphalt": 1.635,
    "Benzene": 1.501,
    "Beryl": 1.577,
    "Bronze": 1.18,
    "Calcite": 1.486,
    "Carbon Dioxide, Liquid": 1.200,
    "Chrome Green": 2.4,
    "Chrome Red": 2.42,
    "Chrome Yellow": 2.31,
    "Chromium": 2.97,
    "Citrine": 1.550,
    "Copper": 1.10,
    "Coral": 1.486,
    "Crystal": 2.00,
    "Diamond": 2.417,
    "Emerald": 1.576,
    "Ethanol": 1.36,
    "Ethyl Alcohol": 1.36,
    "Fluoride": 1.56,
    "Fluorite": 1.434,
    "Garnet, Grossular": 1.745,
    "Glass": 1.51714,
    "Glass, Albite": 1.4890,
    "Glass, Crown": 1.520,
    "Glass, Crown, Zinc": 1.517,
    "Glass, Flint, Dense": 1.66,
    "Glass, Flint, Heaviest": 1.89,
    "Glass, Flint, Heavy": 1.65548,
    "Glass, Flint, Lanthanum": 1.80,
    "Glass, Flint, Light": 1.58038,
    "Glass, Flint, Medium": 1.62725,
    "Glycerine": 1.473,
    "Gold": 0.47,
    "Ice": 1.309,
    "Iodine Crystal": 3.34,
    "Iron": 1.51,
    "Ivory": 1.540,
    "Jade, Nephrite": 1.610,
    "Jadeite": 1.665,
    "Lapis Lazuli": 1.61,
    "Lead": 2.01,
    "Malachite": 1.655,
    "Methanol": 1.329,
    "Moonstone, Albite": 1.535,
    "Nickel": 1.08,
    "Nylon": 1.53,
    "Obsidian": 1.489,
    "Onyx": 1.486,
    "Opal": 1.450,
    "Oxygen, Liquid": 1.221,
    "Pearl": 1.530,
    "Plastic": 1.460,
    "Plexiglas": 1.50,
    "Polystyrene": 1.55,
    "Quartz": 1.544,
    "Quartz, Fused": 1.45843,
    "Rock Salt": 1.544,
    "Rubber, Natural": 1.5191,
    "Ruby": 1.760,
    "Salt": 1.544,
    "Sapphire": 1.760,
    "Silicon": 4.24,
    "Silver": 0.18,
    "Steel": 2.50,
    "Styrofoam": 1.595,
    "Sugar Solution 30%": 1.38,
    "Sugar Solution 80%": 1.49,
    "Sulphur": 1.960,
    "Teflon": 1.35,
    "Tiger eye": 1.544,
    "Titanium": 2.16,
    "Topaz": 1.620,
    "Tourmaline": 1.624,
    "Turpentine": 1.472,
    "Turquoise": 1.610,
    "Vacuum": 1.0,
    "Water": 1.33157,
    "Water, Ice": 1.309,
    "Zinc Crown Glass": 1.517,
    "Zirconia, Cubic": 2.170,
    "Zirconium": 1.923,
}

_LOWER = {k.lower(): v for k, v in KNOWN_IORS.items()}


def lookup_ior(name: str) -> float:
    """Look up a named IOR; raises on unknown names (ref: ior.go IOR())."""
    from .nodes import MaterialError  # local import to avoid a cycle

    try:
        return _LOWER[name.lower()]
    except KeyError:
        raise MaterialError(f"unknown IOR material name: {name!r}") from None
