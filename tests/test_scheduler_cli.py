"""Scheduler policies (ref test model: tracer/scheduler_test.go table-driven
specs with mock workers) + CLI smoke tests."""

import os

import numpy as np
import pytest

from polaris_tpu.render.scheduler import (
    NaiveScheduler,
    PerfectScheduler,
    blocks_from_heights,
)


def test_naive_split_proportional():
    # speeds 1:2 over 10 rows -> 3:7? reference: int(h*s/total) with
    # remainder to worker 0 (scheduler.go:83-106): floor(10/3)=3,
    # floor(20/3)=6, remainder 1 -> [4, 6]
    s = NaiveScheduler([1.0, 2.0])
    assert s.schedule(10) == [4, 6]


def test_naive_equal():
    s = NaiveScheduler([1.0, 1.0, 1.0, 1.0])
    assert s.schedule(100) == [25, 25, 25, 25]


def test_perfect_first_frame_equal():
    s = PerfectScheduler(2)
    assert s.schedule(10) == [5, 5]


def test_perfect_feedback():
    # worker 0 renders 2x faster -> next frame gets ~2/3 of the rows
    s = PerfectScheduler(2)
    s.report(0, block_h=5, render_time_ms=50.0)   # 0.1 rows/ms
    s.report(1, block_h=5, render_time_ms=100.0)  # 0.05 rows/ms
    heights = s.schedule(12)
    assert heights == [8, 4]
    assert sum(heights) == 12


def test_blocks_walking_y():
    blocks = blocks_from_heights([4, 6], 16, 10, samples_per_pixel=8)
    assert blocks[0].block_y == 0 and blocks[0].block_h == 4
    assert blocks[1].block_y == 4 and blocks[1].block_h == 6
    assert blocks[1].samples_per_pixel == 8


# ----- CLI smoke (run_cli fixture: conftest.py) -----


def test_cli_devices(tmp_path, run_cli):
    r = run_cli(["devices"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "cpu" in r.stdout.lower()


def test_cli_scene_compile_info_and_render(tmp_path, scenes_dir, run_cli):
    obj = os.path.join(scenes_dir, "cornell.obj")
    r = run_cli(["scene", "compile", obj, "--out", str(tmp_path / "c.zip")], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "c.zip").exists()
    assert "BVH nodes" in r.stdout

    r = run_cli(["scene", "info", str(tmp_path / "c.zip")], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "Triangles" in r.stdout

    r = run_cli(
        [
            "render", "frame", str(tmp_path / "c.zip"),
            "--width", "32", "--height", "32", "--spp", "1",
            "--num-bounces", "2", "--mode", "bvh",
            "--out", str(tmp_path / "f.png"),
        ],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "f.png").exists()
    assert "TOTAL" in r.stdout


def test_cli_adaptive_render(tmp_path, scenes_dir, run_cli):
    obj = os.path.join(scenes_dir, "cornell.obj")
    r = run_cli(
        [
            "-v", "render", "frame", obj, "--width", "64", "--height", "64",
            "--spp", "8", "--num-bounces", "2", "--mode", "bvh",
            "--adaptive", "0.3",
            "--out", str(tmp_path / "a.png"),
        ],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "a.png").exists()
    assert "adaptive: spp min/mean/max" in (r.stderr + r.stdout)


def test_cli_debug_channel(tmp_path, scenes_dir, run_cli):
    obj = os.path.join(scenes_dir, "cornell.obj")
    r = run_cli(
        [
            "render", "frame", obj, "--width", "32", "--height", "32",
            "--mode", "bvh", "--debug", "normals",
            "--out", str(tmp_path / "n.png"),
        ],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "n.png").exists()


def test_cli_render_pool_reports_measured_times(tmp_path, scenes_dir, run_cli):
    obj = os.path.join(scenes_dir, "cornell.obj")
    r = run_cli(
        ["render", "frame", obj, "--width", "32", "--height", "32",
         "--spp", "1", "--num-bounces", "2", "--mode", "bvh",
         "--pool", "2", "--out", str(tmp_path / "p.png")],
        str(tmp_path), n_devices=4,
    )
    assert r.returncode == 0, r.stderr
    # two worker rows, each with its own measured time (not one shared value)
    rows = [l for l in r.stdout.splitlines() if " ms" in l and "TOTAL" not in l]
    assert len(rows) == 2, r.stdout


def test_cli_render_mesh_no_fabricated_times(tmp_path, scenes_dir, run_cli):
    obj = os.path.join(scenes_dir, "cornell.obj")
    r = run_cli(
        ["render", "frame", obj, "--width", "32", "--height", "32",
         "--spp", "1", "--num-bounces", "2", "--mode", "bvh",
         "--tiles", "2", "--out", str(tmp_path / "m.png")],
        str(tmp_path), n_devices=4,
    )
    assert r.returncode == 0, r.stderr
    assert "(spmd)" in r.stdout, r.stdout


def test_device_selection_blacklist_and_primary():
    """Blacklist + primary election (≙ initTracers policy,
    default.go:199-292)."""
    import argparse

    import pytest

    from polaris_tpu.cli import _select_devices

    ns = argparse.Namespace(blacklist=None, force_primary=None)
    all_devs = _select_devices(ns)
    assert len(all_devs) == 8  # the virtual CPU mesh

    ns = argparse.Namespace(blacklist="nomatch", force_primary="cpu_3")
    devs = _select_devices(ns)
    assert "3" in str(devs[0])
    assert len(devs) == 8

    ns = argparse.Namespace(blacklist="cpu", force_primary=None)
    with pytest.raises(SystemExit):
        _select_devices(ns)

    ns = argparse.Namespace(blacklist=None, force_primary="gpu999")
    with pytest.raises(SystemExit):
        _select_devices(ns)


def test_cli_adaptive_rejects_multi_device_flags(tmp_path, scenes_dir, run_cli):
    obj = os.path.join(scenes_dir, "cornell.obj")
    r = run_cli(
        [
            "render", "frame", obj, "--width", "32", "--height", "32",
            "--spp", "2", "--mode", "bvh", "--adaptive", "0.1",
            "--pool", "2", "--out", str(tmp_path / "x.png"),
        ],
        str(tmp_path),
    )
    assert r.returncode == 2
    assert "adaptive" in (r.stderr + r.stdout)
