"""A/B: traversal packet height (POLARIS_TILE_ROWS) on real TPU.

Round-4 VERDICT item 2: the replay sweep (ROOFLINE_TERRAIN_*.json) counts
3.3x fewer triangle tests per ray at 256-ray packets on the 819k-tri
terrain — a tile traverses the UNION of its rays' BVH paths, and the
union tightens superlinearly with packet size — priced against ~1.6x
more per-node reduction syncs. This measures the real kernels end to end.

Usage: POLARIS_TILE_ROWS=2 python scripts/bench_tilerows.py --tag rows2
       python scripts/bench_tilerows.py --tag rows8
Each run appends its row to BENCH_TILEROWS.json.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def best_of(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cases", default="terrain819k,terrain320k,sphere")
    args = ap.parse_args()

    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.procedural import make_terrain_scene
    from polaris_tpu.asset.wavefront import read_scene
    from polaris_tpu.ops.intersect_pallas import TILE
    from polaris_tpu.render.integrator import TpuRenderer
    from polaris_tpu.render.options import RenderOptions

    row = {"tile": list(TILE)}
    for case in args.cases.split(","):
        if case.startswith("terrain"):
            grid = 640 if case == "terrain819k" else 400
            scene = compile_scene(make_terrain_scene(grid=grid))
            opt = RenderOptions(
                width=512, height=512, spp=4, num_bounces=4,
                min_bounces_for_rr=3,
            )
        else:
            scene = compile_scene(
                read_scene(os.path.join(HERE, "scenes", "sphere.obj"))
            )
            opt = RenderOptions(
                width=512, height=512, spp=16, num_bounces=5,
                min_bounces_for_rr=3,
            )
        r = TpuRenderer(scene, mode="auto")
        r.spp_per_launch = 16
        dt = best_of(lambda: r.render_u8(opt), args.reps)
        rays = opt.width * opt.height * opt.spp * opt.num_bounces * 2
        row[case] = {
            "seconds": round(dt, 4),
            "mrays_per_s": round(rays / dt / 1e6, 2),
        }
        print(case, json.dumps(row[case]))

    out_path = os.path.join(HERE, "BENCH_TILEROWS.json")
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data[args.tag] = row
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)


if __name__ == "__main__":
    main()
