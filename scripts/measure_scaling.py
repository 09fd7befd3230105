"""Measure rays/s scaling across mesh sizes (BASELINE: >=95% on 2 hosts).

On a multi-chip/multi-host TPU slice this reports true ICI/DCN scaling; on
this single-chip dev box it can exercise the virtual CPU mesh (functional
check) — run with --cpu to force that.

Usage:
  python scripts/measure_scaling.py [--res 512 --spp 8] [--cpu]
"""

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--scene", default="sphere")
    ap.add_argument("--out", default="",
                    help="merge results into this JSON artifact")
    ap.add_argument("--tag", default="run",
                    help="key for this run inside --out")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.wavefront import read_scene
    from polaris_tpu.parallel.mesh import DistributedRenderer, make_mesh
    from polaris_tpu.render.integrator import TpuRenderer
    from polaris_tpu.render.options import RenderOptions

    scene = compile_scene(read_scene(os.path.join(HERE, "scenes", f"{args.scene}.obj")))
    opt = RenderOptions(
        width=args.res, height=args.res, spp=args.spp,
        num_bounces=args.bounces, min_bounces_for_rr=3,
    )
    rays = args.res * args.res * args.spp * args.bounces * 2
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].device_kind}")

    def steady(render_fn):
        np.asarray(render_fn())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(render_fn())
            best = min(best, time.perf_counter() - t0)
        return best

    r1 = TpuRenderer(scene)
    t1 = steady(lambda: r1.render_accum(opt))
    base = rays / t1 / 1e6
    print(f"1 device: {t1:.2f}s  {base:.1f} Mrays/s")

    rows = [
        {"devices": 1, "seconds": round(t1, 3), "mrays_per_s": round(base, 2),
         "efficiency_pct": 100.0}
    ]
    d = 2
    while d <= n_dev:
        mesh = make_mesh(tile=d, sample=1)
        rd = DistributedRenderer(scene, mesh)
        td = steady(lambda: rd.render_accum(opt))
        mrays = rays / td / 1e6
        eff = mrays / (base * d) * 100
        rows.append(
            {"devices": d, "seconds": round(td, 3),
             "mrays_per_s": round(mrays, 2), "efficiency_pct": round(eff, 1)}
        )
        print(f"{d} devices (tile mesh): {td:.2f}s  {mrays:.1f} Mrays/s  "
              f"scaling efficiency {eff:.1f}%")
        d *= 2

    if args.out:
        import json

        artifact = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                artifact = json.load(f)
        artifact[args.tag] = {
            "device_kind": str(jax.devices()[0].device_kind),
            "config": {
                "scene": args.scene, "res": args.res, "spp": args.spp,
                "bounces": args.bounces,
            },
            "rows": rows,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.out}[{args.tag}]")
    return rows


if __name__ == "__main__":
    main()
