"""A/B the neighborhood-atlas texture fetch (round-3 fix for ATTRIB_r03's
finding that the 7-lookup bilinear path dominated the shading-bound configs).

Re-runs the texture-heavy attribution rows end-to-end on real TPU; compare
against ATTRIB_r03.json (old path). Writes TEXFIX_r03.json.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from scripts.bench_attrib import load, render_row  # noqa: E402

OUT = os.path.join(HERE, "TEXFIX_r03.json")


def main():
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    sphere = load("sphere")
    base_row, base_img = render_row("sphere_base", sphere)
    emit(base_row)
    row, img = render_row("sphere_tex_refl", sphere, force="tex:reflectance")
    row["bit_identical_to_base"] = bool((img == base_img).all())
    emit(row)
    row, img = render_row(
        "sphere_env", sphere, force="light:env,tex:radiance,bg_tex"
    )
    row["bit_identical_to_base"] = bool((img == base_img).all())
    emit(row)
    row, _ = render_row("mitsuba_base", load("mitsuba"))
    emit(row)
    row, _ = render_row("dispersive512_base", load("dispersive"))
    emit(row)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
