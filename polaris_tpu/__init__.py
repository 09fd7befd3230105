"""polaris-tpu: a TPU-native differentiable physically-based path tracer.

Public API:

    from polaris_tpu import (
        read_scene, compile_scene, SceneData,         # asset pipeline
        RenderOptions, TpuRenderer, CpuRenderer,      # rendering
        DifferentiableRenderer, Trainer, TrainConfig, # inverse rendering
        DistributedRenderer, make_mesh,               # multi-chip
    )

See README.md for the architecture and docs/coverage.md for the mapping to
the reference renderer's component inventory.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `import polaris_tpu` light (no jax import) for CLI
    # paths that only touch the asset pipeline.
    if name == "read_scene":
        from .asset.wavefront import read_scene

        return read_scene
    if name == "compile_scene":
        from .asset.compiler.compiler import compile_scene

        return compile_scene
    if name == "SceneData":
        from .asset.scene_data import SceneData

        return SceneData
    if name == "Camera":
        from .asset.camera import Camera

        return Camera
    if name == "RenderOptions":
        from .render.options import RenderOptions

        return RenderOptions
    if name == "TpuRenderer":
        from .render.integrator import TpuRenderer

        return TpuRenderer
    if name == "CpuRenderer":
        from .cpu_ref.renderer import CpuRenderer

        return CpuRenderer
    if name == "DifferentiableRenderer":
        from .render.grad import DifferentiableRenderer

        return DifferentiableRenderer
    if name == "Trainer":
        from .render.trainer import Trainer

        return Trainer
    if name == "TrainConfig":
        from .render.trainer import TrainConfig

        return TrainConfig
    if name == "ProgressiveRenderer":
        from .render.progressive import ProgressiveRenderer

        return ProgressiveRenderer
    if name in ("Pipeline", "default_pipeline"):
        from .render import pipeline as _pl

        return getattr(_pl, name)
    if name == "DistributedRenderer":
        from .parallel.mesh import DistributedRenderer

        return DistributedRenderer
    if name == "make_mesh":
        from .parallel.mesh import make_mesh

        return make_mesh
    raise AttributeError(name)
