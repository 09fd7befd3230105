"""A/B the traversal modes end-to-end on real TPU (bench.py workload).

Only end-to-end marginals of the real program are trustworthy
(docs/perf.md 'measurement traps'). Prints one JSON line per mode.

Usage: python scripts/bench_modes.py [--modes pallas,pallas8,...] [--spp 16]
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="pallas,pallas8")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--scene", default="sphere")
    args = ap.parse_args()

    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.wavefront import read_scene
    from polaris_tpu.render.integrator import TpuRenderer
    from polaris_tpu.render.options import RenderOptions

    scene = compile_scene(
        read_scene(os.path.join(HERE, "scenes", f"{args.scene}.obj"))
    )
    opt = RenderOptions(
        width=args.res, height=args.res, spp=args.spp, num_bounces=5,
        min_bounces_for_rr=3,
    )
    rays = opt.width * opt.height * opt.spp * opt.num_bounces * 2
    import numpy as np

    ref = None
    for mode in args.modes.split(","):
        r = TpuRenderer(scene, mode=mode)
        r.spp_per_launch = args.spp
        t0 = time.time()
        img = np.asarray(r.render_u8(opt))
        print(f"# {mode} compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
        if ref is None:
            ref = img
        else:
            eq = float((img == ref).mean())
            assert eq > 0.999, (mode, eq)  # modes must agree pixel-for-pixel
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r.render_u8(opt)
            best = min(best, time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "mode": mode,
                    "mrays_per_s": round(rays / best / 1e6, 2),
                    "frame_s": round(best, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
