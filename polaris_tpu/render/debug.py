"""Debug output renders (≙ the reference's 6 debug kernels + 8 DebugFlags).

The reference dumps diagnostic PNGs per debug flag
(``tracer/opencl/pipeline.go:20-30,116-200``; kernels in
``CL/kernels/debug.cl:16-156``): primary intersection depth, normals,
emissive-sample occlusion masks, path throughput, per-bounce accumulator.

Here each channel is a small jitted render over primary rays.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..asset.camera import Camera
from ..ops import rng
from ..ops import vec as V
from ..render.options import RenderOptions
from ..render.raygen import gen_rays

DEBUG_CHANNELS = (
    "depth",
    "normals",
    "uv",
    "hitmask",
    "instance",
    "emissive_vis",
    "throughput",
    "accumulator",
)


def render_debug(renderer, opt: RenderOptions, channel: str, camera=None) -> np.ndarray:
    """Render one debug channel to a [H, W, 3] float image in [0, 1]."""
    scene = renderer.scene
    cam = camera or Camera.from_scene(scene, opt.width, opt.height)
    if channel == "accumulator":
        # raw radiance accumulator normalized by sample count
        # (≙ debugAccumulator, debug.cl:143-156)
        acc = np.asarray(renderer.render_accum(opt, camera=cam))
        return np.clip(acc / max(opt.spp, 1), 0.0, 1.0)
    S = {**renderer.geom, **renderer.params}
    W, H = opt.width, opt.height
    n = W * H

    @jax.jit
    def run(frustum, eye, seed):
        pixel_idx = jnp.arange(n, dtype=jnp.uint32)
        xs = (pixel_idx % W).astype(jnp.int32)
        ys = (pixel_idx // W).astype(jnp.int32)
        U0 = rng.make_uniform(rng.jnp_uniform, seed, pixel_idx, 0, 0)
        o, d = gen_rays(jnp, frustum, eye, W, H, xs, ys, U0)
        hit = renderer.closest(
            S, o, d, jnp.full(n, V.FLT_MAX), jnp.ones(n, bool)
        )
        if channel == "depth":
            # normalized inverse depth (debugRayIntersectionDepth computes a
            # host-side max reduction, resources.go:378-419 — here the
            # normalization happens in-program)
            t = jnp.where(hit.mask, hit.t, 0.0)
            tmax = jnp.maximum(jnp.max(t), 1e-6)
            v = (t / tmax)[..., None].repeat(3, -1)
        elif channel == "normals":
            # flat-row fetch (shade.py: the (T, 3, 3) multi-dim gather is
            # the measured ~5 ms/262k-lane trap)
            tn = S["tri_normals"].reshape(-1, 9)[hit.tri]
            w = 1.0 - hit.u - hit.v
            n_obj = (
                w[..., None] * tn[..., 0:3]
                + hit.u[..., None] * tn[..., 3:6]
                + hit.v[..., None] * tn[..., 6:9]
            )
            nw = V.normalize3(
                jnp, V.transform_normal(jnp, S["inst_w2o"][hit.inst], n_obj)
            )
            v = jnp.where(hit.mask[..., None], nw * 0.5 + 0.5, 0.0)
        elif channel == "uv":
            tuv = S["tri_uvs"].reshape(-1, 6)[hit.tri]
            w = 1.0 - hit.u - hit.v
            uv = (
                w[..., None] * tuv[..., 0:2]
                + hit.u[..., None] * tuv[..., 2:4]
                + hit.v[..., None] * tuv[..., 4:6]
            )
            v = jnp.concatenate([uv % 1.0, jnp.zeros((n, 1))], axis=-1)
            v = jnp.where(hit.mask[..., None], v, 0.0)
        elif channel == "hitmask":
            v = hit.mask[..., None].astype(jnp.float32).repeat(3, -1)
        elif channel == "instance":
            k = (hit.inst.astype(jnp.uint32) + 1) * jnp.uint32(2654435761)
            v = jnp.stack(
                [
                    ((k >> 16) & 0xFF).astype(jnp.float32) / 255.0,
                    ((k >> 8) & 0xFF).astype(jnp.float32) / 255.0,
                    (k & 0xFF).astype(jnp.float32) / 255.0,
                ],
                axis=-1,
            )
            v = jnp.where(hit.mask[..., None], v, 0.0)
        elif channel == "throughput":
            # path throughput after the first bounce's BxDF sample
            # (≙ debugThroughput, debug.cl:122-140)
            from ..render.shade import shade

            U = rng.make_uniform(rng.jnp_uniform, seed, pixel_idx, 0, 0)
            t = jnp.where(hit.mask, hit.t, 0.0)
            out = shade(
                jnp, S, U,
                bounce=0,
                min_bounces_for_rr=99,
                num_emissives=renderer.num_emissives,
                material_depth=renderer.material_depth,
                ray_o=o, ray_d=d, t=t,
                inst=hit.inst, tri=hit.tri, bary_u=hit.u, bary_v=hit.v,
                hit_mask=hit.mask,
                throughput=jnp.ones((n, 3), jnp.float32),
                flags=jnp.zeros(n, jnp.uint32),
            )
            v = jnp.where(out["next_mask"][..., None], out["throughput"], 0.0)
        elif channel == "emissive_vis":
            # visibility of the NEE occlusion rays from the first bounce
            # (≙ debugEmissiveSamples occluded/visible masks)
            from ..render.shade import shade

            U = rng.make_uniform(rng.jnp_uniform, seed, pixel_idx, 0, 0)
            t = jnp.where(hit.mask, hit.t, 0.0)
            out = shade(
                jnp, S, U,
                bounce=0,
                min_bounces_for_rr=99,
                num_emissives=renderer.num_emissives,
                material_depth=renderer.material_depth,
                ray_o=o, ray_d=d, t=t,
                inst=hit.inst, tri=hit.tri, bary_u=hit.u, bary_v=hit.v,
                hit_mask=hit.mask,
                throughput=jnp.ones((n, 3), jnp.float32),
                flags=jnp.zeros(n, jnp.uint32),
            )
            occluded = renderer.any_hit(
                S, out["occl_o"], out["occl_d"], out["occl_maxt"], out["occl_mask"]
            )
            vis = out["occl_mask"] & (~occluded)
            v = jnp.stack(
                [
                    vis.astype(jnp.float32),
                    (out["occl_mask"] & occluded).astype(jnp.float32),
                    jnp.zeros(n),
                ],
                axis=-1,
            )
        else:
            raise ValueError(f"unknown debug channel {channel!r}")
        return v.reshape(H, W, 3)

    img = run(jnp.asarray(cam.frustum), jnp.asarray(cam.position), jnp.uint32(opt.seed))
    return np.clip(np.asarray(img), 0.0, 1.0)
