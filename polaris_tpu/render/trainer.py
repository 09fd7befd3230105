"""Inverse-rendering trainer: optimize scene parameters against target
images, with optax optimizers and checkpoint/resume.

This is the production face of the differentiable path (SURVEY.md §7 item 5
plus the checkpoint/resume subsystem the reference only has for compiled
scenes, writer/zip.go:31-56): fit material colors/roughness/IORs, texture
atlases, or the camera to one or more reference photographs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..asset.camera import Camera
from ..asset.scene_data import PARAM_FIELDS, SceneData
from ..utils.log import Timer, get_logger
from .grad import DifferentiableRenderer
from .options import RenderOptions

_log = get_logger("trainer")


@dataclass
class TrainConfig:
    learning_rate: float = 5e-2
    optimizer: str = "adam"  # adam | sgd | rmsprop
    num_steps: int = 100
    # which parameter leaves to optimize (default: all material+texture)
    trainable: Sequence[str] = tuple(PARAM_FIELDS)
    optimize_camera: bool = False
    # per-step sample reseeding decorrelates gradient noise across steps
    reseed_each_step: bool = True
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 25


_PARAM_BOUNDS = {
    # (min, max) projection applied after every update — keeps the physics
    # valid (the DSL validator enforces the same ranges at parse time,
    # asset/material/nodes.py)
    "mat_reflectance": (0.0, 0.999),
    "mat_specularity": (0.0, 1.0),
    "mat_transmittance": (0.0, 1.0),
    "mat_radiance": (0.0, None),
    "mat_scale": (0.0, None),
    "mat_roughness": (0.0, 1.0),
    "mat_mix_weight": (0.0, 1.0),
    "mat_int_ior": (0.0, 4.0),
    "mat_ext_ior": (0.0, 4.0),
    "mat_int_disp_ior": (0.0, 4.0),
    "mat_ext_disp_ior": (0.0, 4.0),
    "tex_data": (0.0, None),
}


def project_params(params: Dict) -> Dict:
    """Clamp every parameter leaf to its physically-valid range."""
    out = dict(params)
    for k, (lo, hi) in _PARAM_BOUNDS.items():
        if k in out:
            out[k] = jnp.clip(out[k], lo, hi)
    return out


class Trainer:
    def __init__(
        self,
        scene: SceneData,
        opt: RenderOptions,
        cfg: TrainConfig,
        mode: str = "auto",
    ):
        import optax

        self.renderer = DifferentiableRenderer(scene, mode=mode)
        self.opt = opt
        self.cfg = cfg
        self.step_idx = 0
        tx = {
            "adam": optax.adam,
            "sgd": optax.sgd,
            "rmsprop": optax.rmsprop,
        }[cfg.optimizer](cfg.learning_rate)
        self.tx = tx
        self.camera = Camera.from_scene(scene, opt.width, opt.height)
        self.cam_params = {
            "frustum": jnp.asarray(self.camera.frustum),
            "eye": jnp.asarray(self.camera.position),
        }
        self.opt_state = tx.init(self._trainable(self.renderer.params))
        self.history: List[float] = []

    def _trainable(self, params: Dict) -> Dict:
        return {k: v for k, v in params.items() if k in self.cfg.trainable}

    def step(self, target: np.ndarray) -> float:
        """One optimization step; returns the loss."""
        opt = self.opt
        if self.cfg.reseed_each_step:
            from dataclasses import replace

            opt = replace(opt, seed=self.opt.seed + self.step_idx)
        loss, g_params, g_cam = self.renderer.loss_and_grad(opt, target, self.camera)
        g_train = self._trainable(g_params)
        updates, self.opt_state = self.tx.update(
            g_train, self.opt_state, self._trainable(self.renderer.params)
        )
        new_train = jax.tree.map(
            lambda p, u: p + u, self._trainable(self.renderer.params), updates
        )
        self.renderer.params = project_params(
            {**self.renderer.params, **new_train}
        )
        if self.cfg.optimize_camera:
            self.camera.position = np.asarray(
                self.cam_params["eye"] - self.cfg.learning_rate * g_cam["eye"]
            )
            self.camera.update()
            self.cam_params["eye"] = jnp.asarray(self.camera.position)
            self.cam_params["frustum"] = jnp.asarray(self.camera.frustum)
        self.step_idx += 1
        self.history.append(loss)
        return loss

    def fit(self, target: np.ndarray) -> List[float]:
        for i in range(self.cfg.num_steps):
            with Timer() as t:
                loss = self.step(target)
            _log.info("step %d: loss %.6f (%.0f ms)", self.step_idx, loss, t.ms)
            if (
                self.cfg.checkpoint_dir
                and self.step_idx % self.cfg.checkpoint_every == 0
            ):
                self.save_checkpoint()
        if self.cfg.checkpoint_dir:
            self.save_checkpoint()
        return self.history

    # ----- checkpoint / resume -----

    def save_checkpoint(self) -> str:
        d = self.cfg.checkpoint_dir
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"ckpt_{self.step_idx:06d}.npz")
        flat = {f"param.{k}": np.asarray(v) for k, v in self.renderer.params.items()}
        leaves, treedef = jax.tree.flatten(self.opt_state)
        for i, leaf in enumerate(leaves):
            flat[f"opt.{i}"] = np.asarray(leaf)
        flat["step"] = np.asarray(self.step_idx)
        flat["history"] = np.asarray(self.history, np.float32)
        flat["camera_eye"] = np.asarray(self.camera.position)
        np.savez_compressed(path, **flat)
        _log.info("wrote checkpoint %s", path)
        return path

    def restore_checkpoint(self, path: Optional[str] = None) -> None:
        if path is None:
            d = self.cfg.checkpoint_dir
            ckpts = sorted(
                f for f in os.listdir(d) if f.startswith("ckpt_") and f.endswith(".npz")
            )
            if not ckpts:
                raise FileNotFoundError(f"no checkpoints in {d}")
            path = os.path.join(d, ckpts[-1])
        data = np.load(path)
        params = dict(self.renderer.params)
        for k in data.files:
            if k.startswith("param."):
                params[k[len("param."):]] = jnp.asarray(data[k])
        self.renderer.params = params
        leaves, treedef = jax.tree.flatten(self.opt_state)
        new_leaves = [
            jnp.asarray(data[f"opt.{i}"]) for i in range(len(leaves))
        ]
        self.opt_state = jax.tree.unflatten(treedef, new_leaves)
        self.step_idx = int(data["step"])
        self.history = list(np.asarray(data["history"]))
        self.camera.position = np.asarray(data["camera_eye"])
        self.camera.update()
        _log.info("restored checkpoint %s (step %d)", path, self.step_idx)
