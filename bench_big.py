"""Big-scene benchmark: 320k-triangle procedural terrain on real TPU.

Round-1 VERDICT missing #5: scenes whose BVH nodes bust the ~700 KB SMEM
budget used to fall back to the XLA packet mode (~0.9 Mrays/s). The
streamed-nodes Pallas kernel (ops/intersect_pallas_nodes.py) removes the
ceiling; this measures it end-to-end (auto mode selects it for this scene).

Prints one JSON line per config and writes BENCH_BIG.json.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def main():
    import numpy as np

    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.procedural import make_terrain_scene
    from polaris_tpu.render.integrator import TpuRenderer
    from polaris_tpu.render.options import RenderOptions

    results = []
    # (grid, mode, label): 320k tris fits streamed-triangles at leaf 48;
    # forcing pallas_nodes isolates the node-streaming cost on the same
    # scene; 819k tris busts the node budget so auto engages the 8-wide
    # resident-forest kernel (round 4); the forced pallas_nodes row keeps
    # the streamed-binary comparison measured
    cases = [
        (400, "auto", "terrain320k_auto"),
        (400, "pallas_nodes", "terrain320k_nodes"),
        (640, "auto", "terrain819k_auto"),
        (640, "pallas_nodes", "terrain819k_nodes"),
    ]
    for grid, mode, label in cases:
        t0 = time.time()
        scene = compile_scene(make_terrain_scene(grid=grid))
        print(
            f"# {label}: {int(scene.tri_v0.shape[0])} tris, "
            f"{int(scene.bvh_ldata.shape[0])} nodes, "
            f"compile {time.time()-t0:.1f}s",
            file=sys.stderr,
        )
        res, spp = 512, 4
        opt = RenderOptions(
            width=res, height=res, spp=spp, num_bounces=3, min_bounces_for_rr=4
        )
        r = TpuRenderer(scene, mode=mode)
        r.spp_per_launch = 1  # streamed traversal: keep launches short
        t0 = time.time()
        img = r.render_u8(opt)  # warmup/compile
        print(f"# {label} compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
        assert np.asarray(img).mean() > 1.0  # nonblack
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r.render_u8(opt)
            best = min(best, time.perf_counter() - t0)
        rays = res * res * spp * opt.num_bounces * 2
        results.append(
            {
                "metric": f"{label}_{res}x{res}_{spp}spp_Mrays_per_s",
                "value": round(rays / best / 1e6, 2),
                "unit": "Mrays/s",
                "frame_s": round(best, 3),
            }
        )
        print(json.dumps(results[-1]))
    with open(os.path.join(HERE, "BENCH_BIG.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
