"""Differentiable rendering: pixel gradients w.r.t. materials, textures and
camera.

This is the capability the reference does not have (its device code is
OpenCL; SURVEY.md §7 item 5 defines the target): the forward path in
``render_sample_block`` is pure JAX, so ``jax.grad`` flows through

  * material leaves: reflectance/specularity/transmittance/radiance colors,
    IORs, roughness, scale, mix weights (SceneData.PARAM_FIELDS)
  * the texture atlas (bilinear sampling is piecewise-differentiable)
  * camera eye + frustum corner rays

while hit geometry (BVH traversal) and all discrete decisions (light/lobe
selection, Russian roulette, material-mix branches) are gradient-stopped —
the standard path-tracing differentiation strategy (discontinuities from
visibility are ignored; correct for the dominant continuous terms).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..asset.camera import Camera
from ..asset.scene_data import SceneData
from .integrator import TpuRenderer, render_sample_block
from .options import RenderOptions
from .shade import tonemap_reinhard


class DifferentiableRenderer(TpuRenderer):
    """TpuRenderer + loss/grad evaluation over the scene parameter pytree."""

    def __init__(self, scene, *args, **kwargs):
        super().__init__(scene, *args, **kwargs)
        store = getattr(scene, "tex_store", None)
        if store is not None and np.any(np.asarray(store) != 0):
            from ..utils.log import get_logger

            get_logger("grad").warning(
                "scene has byte-stored textures (the compile default): "
                "their texels are NOT differentiable and tex_data "
                "gradients will be zero — recompile with "
                "compile_scene(..., float_textures=True) to train textures"
            )

    def _loss_fn(self, opt: RenderOptions):
        key = ("loss", opt.width, opt.height, opt.spp, opt.num_bounces,
               opt.min_bounces_for_rr, opt.rr_tile_coherent)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                jax.value_and_grad(self._build_loss(opt), argnums=(0, 1))
            )
        return self._jit_cache[key]

    def loss_only(self, opt: RenderOptions):
        """The same loss program jitted WITHOUT the gradient — the forward
        side of the backward/forward cost ratio (bench_grad.py)."""
        key = ("lossval", opt.width, opt.height, opt.spp, opt.num_bounces,
               opt.min_bounces_for_rr, opt.rr_tile_coherent)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._build_loss(opt))
        return self._jit_cache[key]

    def _build_loss(self, opt: RenderOptions):
        W, H = opt.width, opt.height
        n = W * H

        def forward(params, cam_params, geom, seed):
            S = {**geom, **params}
            pixel_idx = jnp.arange(n, dtype=jnp.uint32)
            xs = (pixel_idx % W).astype(jnp.int32)
            ys = (pixel_idx // W).astype(jnp.int32)

            def sample_body(s, accum):
                rad = render_sample_block(
                    S,
                    self.closest,
                    self.any_hit,
                    frustum=cam_params["frustum"],
                    eye=cam_params["eye"],
                    width=W,
                    height=H,
                    pixel_x=xs,
                    pixel_y=ys,
                    pixel_idx=pixel_idx,
                    sample_idx=s,
                    seed=seed,
                    num_bounces=opt.num_bounces,
                    min_bounces_for_rr=opt.min_bounces_for_rr,
                    num_emissives=self.num_emissives,
                    scene_diffuse_mat=self.scene_diffuse_mat,
                    material_depth=self.material_depth,
                    rr_tile_coherent=opt.rr_tile_coherent,
                )
                return accum + rad

            accum = jax.lax.fori_loop(
                0, opt.spp, sample_body, jnp.zeros((n, 3), jnp.float32)
            )
            return accum.reshape(H, W, 3)

        def loss_fn(params, cam_params, geom, seed, target):
            accum = forward(params, cam_params, geom, seed)
            img = tonemap_reinhard(
                jnp, accum + 1e-6, 1.0 / opt.spp, opt.exposure
            )
            return jnp.mean((img - target) ** 2)

        return loss_fn

    def loss_and_grad(
        self,
        opt: RenderOptions,
        target: np.ndarray,
        camera: Optional[Camera] = None,
    ) -> Tuple[float, Dict, Dict]:
        """Returns (loss, grads over material/texture params, camera grads)."""
        cam = camera or Camera.from_scene(self.scene, opt.width, opt.height)
        cam_params = {
            "frustum": jnp.asarray(cam.frustum),
            "eye": jnp.asarray(cam.position),
        }
        fn = self._loss_fn(opt)
        loss, (g_params, g_cam) = fn(
            self.params, cam_params, self.geom, jnp.uint32(opt.seed),
            jnp.asarray(target),
        )
        return float(loss), g_params, g_cam

    def render_from_params(self, opt: RenderOptions, params, camera=None):
        """Forward render with externally-supplied params (optimizer loop)."""
        cam = camera or Camera.from_scene(self.scene, opt.width, opt.height)
        saved = self.params
        self.params = params
        try:
            return self.render_accum(opt, cam)
        finally:
            self.params = saved
