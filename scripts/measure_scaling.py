"""Measure rays/s scaling across mesh sizes (BASELINE: >=95% on 2 hosts).

On a multi-chip/multi-host TPU slice this reports true ICI/DCN scaling; on
this single-chip dev box it can exercise the virtual CPU mesh (functional
check) — run with --cpu to force that.

--weak: WEAK scaling — fixed work per device (a fixed row band each), so
compute dominates the fixed per-program cost that made the round-2
strong-scaling rows overhead-dominated noise. Round 4 replaced the
time-slice ideal with a measured PROCESS-CONTENTION baseline: for every N,
N independent single-device processes render the same bands concurrently
(file-barrier start, zero sharding machinery), and the shard_map run is
gated against that wall time. This charges hardware contention (shared
cache/membw/turbo — the real cause of the round-3 71% 2-device row; a
single XLA:CPU program uses one core here, so the old 'Eigen pool'
explanation was wrong) to the box, and only collectives/shard_map overhead
to the framework. The 2-DEVICE ROW is the stand-in for the reference's
2-host >=95% gate everywhere this artifact is cited.

Usage:
  python scripts/measure_scaling.py [--res 512 --spp 8] [--cpu] [--weak]
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
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: fixed rows per device")
    ap.add_argument("--rows-per-device", type=int, default=128)
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

    if args.weak:
        return weak_scaling(args, scene, n_dev)

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


_BASELINE_WORKER = """
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, {here!r})
from polaris_tpu.asset.compiler.compiler import compile_scene
from polaris_tpu.asset.wavefront import read_scene
from polaris_tpu.render.integrator import TpuRenderer
from polaris_tpu.render.options import RenderOptions

scene = compile_scene(read_scene({scene_path!r}))
opt = RenderOptions(width={W}, height={H}, spp={spp}, num_bounces={bounces},
                    min_bounces_for_rr=3)
r = TpuRenderer(scene, mode="packet")
r.spp_per_launch = 10**9
np.asarray(r.render_band_accum(opt, {y0}, {rpd}))  # compile + warmup
open({ready!r}, "w").close()
while not os.path.exists({go!r}):
    time.sleep(0.01)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(r.render_band_accum(opt, {y0}, {rpd}))
    best = min(best, time.perf_counter() - t0)
print(best)
"""


def _contention_baseline(args, n, rpd, scene_path, concurrent=True):
    """Wall time for n INDEPENDENT single-device processes, each rendering
    its own rpd-row band of the same frame concurrently (file-barrier
    start). This carries every hardware effect — cache/memory-bandwidth
    contention, turbo scaling, scheduler time-slicing — but ZERO sharding
    machinery, so gating the shard_map run against it isolates what
    sharding itself costs (round-4: the round-3 'Eigen pool' explanation
    for the 71% 2-device row was wrong — a single XLA:CPU program uses one
    core here; the residual is hardware contention)."""
    import subprocess
    import sys
    import tempfile

    d = tempfile.mkdtemp(prefix="polaris_scale_")

    def worker(pid, go):
        ready = os.path.join(d, f"ready_{pid}_{os.path.basename(go)}")
        code = _BASELINE_WORKER.format(
            here=HERE, scene_path=scene_path, W=args.res,
            H=rpd * n, spp=args.spp, bounces=args.bounces,
            y0=pid * rpd, rpd=rpd, ready=ready, go=go,
        )
        p = subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        return p, ready

    import time as _t

    def await_ready(readies, procs):
        deadline = _t.time() + 600
        while not all(os.path.exists(x) for x in readies):
            if _t.time() > deadline:
                for p in procs:
                    p.kill()
                raise RuntimeError("baseline worker failed to warm up")
            _t.sleep(0.05)

    def collect(p):
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(err.decode()[-2000:])
        return float(out.strip().splitlines()[-1])

    if concurrent:
        go = os.path.join(d, "go")
        pr = [worker(pid, go) for pid in range(n)]
        await_ready([r for _, r in pr], [p for p, _ in pr])
        open(go, "w").close()
        return max(collect(p) for p, _ in pr)
    # sequential: each band measured ALONE (the per-band solo reference
    # for the process-parallel efficiency — bands differ in content)
    times = []
    for pid in range(n):
        go = os.path.join(d, f"go_{pid}")
        p, ready = worker(pid, go)
        await_ready([ready], [p])
        open(go, "w").close()
        times.append(collect(p))
    return max(times)


def weak_scaling(args, scene, n_dev):
    import json
    import time

    import jax
    import numpy as np

    from polaris_tpu.parallel.mesh import DistributedRenderer, make_mesh
    from polaris_tpu.render.options import RenderOptions

    cores = os.cpu_count() or 1
    on_cpu = jax.devices()[0].platform == "cpu"
    W = args.res
    rpd = args.rows_per_device

    def steady(fn):
        np.asarray(fn())  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    def run(n):
        opt = RenderOptions(
            width=W, height=rpd * n, spp=args.spp,
            num_bounces=args.bounces, min_bounces_for_rr=3,
        )
        mesh = make_mesh(tile=n, sample=1)
        rd = DistributedRenderer(scene, mesh)
        return steady(lambda: rd.render_accum(opt))

    # quantify the fixed per-program cost from two 1-device sizes:
    # t(rows) = fixed + rows*c  =>  fixed = 2*t(rpd) - t(2*rpd)
    t1 = run(1)
    opt2 = RenderOptions(width=W, height=2 * rpd, spp=args.spp,
                         num_bounces=args.bounces, min_bounces_for_rr=3)
    rd1 = DistributedRenderer(scene, make_mesh(tile=1, sample=1))
    t1_double = steady(lambda: rd1.render_accum(opt2))
    fixed = max(0.0, 2 * t1 - t1_double)
    rays1 = W * rpd * args.spp * args.bounces * 2
    print(f"1 device, {rpd} rows: {t1:.3f}s ({rays1/t1/1e6:.2f} Mrays/s); "
          f"fixed per-program cost ~{fixed*1e3:.0f} ms "
          f"({fixed/t1*100:.0f}% of the 1-device row)")

    rows = [{
        "devices": 1, "rows": rpd, "seconds": round(t1, 4),
        "mrays_per_s": round(rays1 / t1 / 1e6, 2),
        "sharding_efficiency_pct": 100.0, "oversub_factor": 1.0,
    }]
    scene_path = os.path.join(HERE, "scenes", f"{args.scene}.obj")
    n = 2
    while n <= n_dev:
        tn = run(n)
        # N virtual devices on `cores` physical cores time-slice: the
        # naive ideal is t1 * max(1, N/cores). But that model misattributes
        # hardware contention (shared cache/memory bandwidth/turbo between
        # concurrent programs) to sharding. The honest gate compares
        # against N INDEPENDENT PROCESSES doing the same bands with no
        # sharding at all: sharding_eff = t_processes / t_shard_map.
        oversub = max(1.0, n / cores) if on_cpu else 1.0
        eff_naive = t1 * oversub / tn * 100
        tbase = tsolo = None
        if on_cpu:
            tbase = _contention_baseline(args, n, rpd, scene_path)
            tsolo = _contention_baseline(
                args, n, rpd, scene_path, concurrent=False
            )
        eff = (tbase / tn * 100) if tbase else eff_naive
        # the REAL distributed deployment runs one process per host/chip
        # (parallel/multihost.py) — its weak efficiency is the slowest
        # band measured alone vs the same bands run concurrently, with
        # the core-oversubscription ideal applied
        proc_eff = (
            tsolo * oversub / tbase * 100 if tbase else None
        )
        mrays = rays1 * n / tn / 1e6
        rows.append({
            "devices": n, "rows": rpd * n, "seconds": round(tn, 4),
            "mrays_per_s": round(mrays, 2),
            "process_baseline_s": round(tbase, 4) if tbase else None,
            "solo_band_max_s": round(tsolo, 4) if tsolo else None,
            "inprocess_mesh_vs_processes_pct": round(eff, 1),
            "process_parallel_eff_pct": (
                round(proc_eff, 1) if proc_eff else None
            ),
            "naive_timeslice_eff_pct": round(eff_naive, 1),
            "oversub_factor": round(oversub, 2),
        })
        print(f"{n} devices, {rpd*n} rows: mesh {tn:.3f}s  {mrays:.2f} "
              f"Mrays/s; processes {tbase and round(tbase,3)}s "
              f"(solo band max {tsolo and round(tsolo,3)}s) -> "
              f"process-parallel eff {proc_eff and round(proc_eff,1)}%, "
              f"in-process mesh vs processes {eff:.1f}% "
              f"(naive time-slice {eff_naive:.1f}%)")
        n *= 2

    if args.out:
        artifact = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                artifact = json.load(f)
        artifact[args.tag] = {
            "device_kind": str(jax.devices()[0].device_kind),
            "mode": "weak",
            "physical_cores": cores,
            "fixed_cost_s": round(fixed, 4),
            "config": {
                "scene": args.scene, "width": W, "rows_per_device": rpd,
                "spp": args.spp, "bounces": args.bounces,
            },
            "rows": rows,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.out}[{args.tag}]")
    return rows


if __name__ == "__main__":
    main()
