"""Test harness: force JAX onto a virtual 8-device CPU mesh.

The axon TPU tunnel (JAX_PLATFORMS=axon) is for benchmarks only; unit tests
must be hermetic and exercise multi-chip sharding without hardware, per the
reference's mock-tracer testing strategy (SURVEY.md §4).
"""

import os

# Must be set before jax imports anywhere.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon plugin rewrites jax_platforms to "axon,cpu" at import time; force
# it back before any backend initializes so tests stay on the virtual mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def scenes_dir():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = os.path.join(here, "scenes")
    if not os.path.exists(os.path.join(d, "cornell.obj")):
        import subprocess, sys

        subprocess.run([sys.executable, os.path.join(d, "generate.py")], check=True)
    return d


@pytest.fixture(scope="session")
def cornell_scene(scenes_dir):
    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.wavefront import read_scene

    return compile_scene(read_scene(os.path.join(scenes_dir, "cornell.obj")))


@pytest.fixture(scope="session")
def sphere_scene(scenes_dir):
    from polaris_tpu.asset.compiler.compiler import compile_scene
    from polaris_tpu.asset.wavefront import read_scene

    return compile_scene(read_scene(os.path.join(scenes_dir, "sphere.obj")))
