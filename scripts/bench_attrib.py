"""Shading-cost attribution for the shading-bound BASELINE configs (r3).

Method (docs/perf.md: only END-TO-END A/B marginals of the real program are
trustworthy): render full frames on the real TPU and difference them.

Two kinds of variants:

  * statics-force on sphere — POLARIS_STX_FORCE re-enables a pruned branch
    whose where-predicates stay all-false, so the image is bit-identical
    (asserted) and the frame-time delta is EXACTLY that machinery's cost at
    a fixed workload: rough_conductor branch, rough_dielectric branch,
    reflectance-texture gathers, env-light sampling, disperse walk level.
  * scene-patch on mitsuba/dispersive — textures stripped / disperse root
    bypassed; images change slightly (workload shifts via RR), so these are
    approximate totals, cross-checked against the exact sphere marginals.

Writes ATTRIB_r03.json incrementally (one JSON object per completed row).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "ATTRIB_r03.json")


def load(name):
    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.wavefront import read_scene

    return compile_scene(read_scene(os.path.join(HERE, "scenes", f"{name}.obj")))


def strip_textures(scene):
    """All material texture indices -> -1 (statics then drop the gathers)."""
    kw = {}
    for f in dataclasses.fields(scene):
        v = getattr(scene, f.name)
        if f.name.endswith("_tex") and isinstance(v, np.ndarray):
            v = np.full_like(v, -1)
        kw[f.name] = v
    return type(scene)(**kw)


def bypass_disperse(scene):
    """Point tri_material past any disperse root and retire the op node."""
    from polaris_tpu.ops.material import OP_DISPERSE
    from polaris_tpu.ops.bxdf import BXDF_DIFFUSE

    mat_type = np.array(scene.mat_type)
    tri_mat = np.array(scene.tri_material)
    left = np.asarray(scene.mat_left)
    for node in np.nonzero(mat_type == OP_DISPERSE)[0]:
        tri_mat[tri_mat == node] = left[node]
        mat_type[node] = BXDF_DIFFUSE  # unreachable; lets statics drop op
    kw = {f.name: getattr(scene, f.name) for f in dataclasses.fields(scene)}
    kw["mat_type"] = mat_type
    kw["tri_material"] = tri_mat
    return type(scene)(**kw)


def render_row(label, scene, w=512, h=512, spp=16, bounces=5, force="",
               mat_depth=None, reps=3):
    from polaris_tpu.render.integrator import TpuRenderer
    from polaris_tpu.render.options import RenderOptions

    os.environ["POLARIS_STX_FORCE"] = force
    try:
        r = TpuRenderer(scene, mode="auto")
    finally:
        os.environ.pop("POLARIS_STX_FORCE", None)
    if mat_depth is not None:
        r.material_depth = max(r.material_depth, mat_depth)
    r.spp_per_launch = 16
    opt = RenderOptions(width=w, height=h, spp=spp, num_bounces=bounces,
                        min_bounces_for_rr=3)
    t0 = time.time()
    img = np.asarray(r.render_u8(opt))
    print(f"# {label}: compile+first {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r.render_u8(opt)
        best = min(best, time.perf_counter() - t0)
    rays = w * h * spp * bounces * 2
    row = {
        "label": label,
        "frame_s": round(best, 4),
        "mrays_per_s": round(rays / best / 1e6, 2),
        "force": force,
    }
    return row, img


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

    for label, force, depth in [
        ("sphere_rc", "bxdf:rough_conductor", None),
        ("sphere_rd", "bxdf:rough_dielectric", None),
        ("sphere_tex_refl", "tex:reflectance", None),
        ("sphere_env", "light:env,tex:radiance,bg_tex", None),
        ("sphere_disperse", "op:disperse", 1),
    ]:
        row, img = render_row(label, sphere, force=force, mat_depth=depth)
        row["bit_identical_to_base"] = bool((img == base_img).all())
        emit(row)

    mits = load("mitsuba")
    row, mits_img = render_row("mitsuba_base", mits)
    emit(row)
    row, _ = render_row("mitsuba_notex", strip_textures(mits))
    emit(row)
    row, _ = render_row("mitsuba_b1", mits, bounces=1)
    emit(row)
    row, _ = render_row("mitsuba_b3", mits, bounces=3)
    emit(row)

    disp = load("dispersive")
    row, _ = render_row("dispersive512_base", disp)
    emit(row)
    row, _ = render_row("dispersive512_notex", strip_textures(disp))
    emit(row)
    row, _ = render_row("dispersive512_nodisp", bypass_disperse(disp))
    emit(row)
    row, _ = render_row("dispersive512_b1", disp, bounces=1)
    emit(row)

    print(json.dumps({"done": True, "rows": len(results)}))


if __name__ == "__main__":
    main()
