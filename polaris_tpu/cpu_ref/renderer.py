"""NumPy golden renderer — the correctness oracle for the TPU integrator.

The reference ships no numerical ground truth (SURVEY.md §4); this renderer
provides it. It shares the *formula* modules (ops/bxdf, ops/emissive,
ops/material, render/shade) with the TPU path but uses a completely
independent intersection method — brute-force Möller–Trumbore over every
instance's triangle list, recovered by walking the compiled BVH leaves — so
BVH construction + traversal bugs on the device path cannot self-validate.

The RNG counter layout is shared (ops/rng.py), so for identical options the
TPU image must match this one to float32 tolerance.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..asset.camera import Camera
from ..asset.scene_data import SceneData
from ..ops import rng
from ..ops import vec as V
from ..render.options import RenderOptions
from ..render.raygen import gen_rays
from ..render.shade import shade, shade_miss, tonemap_reinhard
from ..utils.log import get_logger

_log = get_logger("cpu renderer")

_CHUNK = 1024  # rays per brute-force chunk (bounds the N x T work matrix)


def _collect_blas_triangles(scene: SceneData, root: int) -> np.ndarray:
    """Walk a BLAS subtree host-side and return its triangle indices.

    Exercises the shared node encoding (optimized_scene.go:14-75): inner
    nodes have ldata > 0; bottom leaves store (-first_tri, count).
    """
    tris: List[int] = []
    stack = [root]
    while stack:
        i = stack.pop()
        l = int(scene.bvh_ldata[i])
        r = int(scene.bvh_rdata[i])
        if l > 0:
            stack.extend([l, r])
        else:
            first, count = -l, r
            tris.extend(range(first, first + count))
    return np.asarray(sorted(tris), np.int64)


class CpuRenderer:
    def __init__(self, scene: SceneData):
        self.scene = scene
        geom, params = scene.split_params()
        self.S: Dict[str, np.ndarray] = {**geom, **params}
        # per-instance triangle lists (object space)
        self.inst_tris = [
            _collect_blas_triangles(scene, int(root)) for root in scene.inst_bvh_root
        ]
        from ..ops.material import material_tree_depth

        self.material_depth = material_tree_depth(
            scene.mat_type, scene.mat_left, scene.mat_right
        )

    # ----- intersection (independent of the device BVH traversal) -----

    def _mt_batch(self, o, d, maxt, tris):
        """Möller–Trumbore: rays [C,3] vs triangles [T] (intersect.cl:90-125).

        Returns (t [C], tri_idx [C], u [C], v [C]) with t=inf for misses.
        """
        v0 = self.scene.tri_v0[tris]  # (T,3)
        e1 = self.scene.tri_e1[tris]
        e2 = self.scene.tri_e2[tris]
        pvec = np.cross(d[:, None, :], e2[None, :, :])
        det = np.einsum("tj,ctj->ct", e1, pvec)
        ok = np.abs(det) >= V.INTERSECTION_EPSILON
        inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o[:, None, :] - v0[None, :, :]
        u = np.einsum("ctj,ctj->ct", tvec, pvec) * inv_det
        ok &= (u >= 0.0) & (u <= 1.0)
        qvec = np.cross(tvec, e1[None, :, :])
        v = np.einsum("cj,ctj->ct", d, qvec) * inv_det
        ok &= (v >= 0.0) & (u + v <= 1.0)
        t = np.einsum("tj,ctj->ct", e2, qvec) * inv_det
        ok &= (t > V.INTERSECTION_EPSILON) & (t < maxt[:, None])
        t = np.where(ok, t, np.inf)
        best = np.argmin(t, axis=1)
        rows = np.arange(t.shape[0])
        return t[rows, best], best, u[rows, best], v[rows, best]

    def intersect_closest(self, o, d, maxt, active):
        """Closest hit over all instances (≙ rayIntersectionQuery)."""
        n = o.shape[0]
        best_t = np.full(n, np.inf, np.float32)
        best_tri = np.zeros(n, np.int32)
        best_inst = np.zeros(n, np.int32)
        best_u = np.zeros(n, np.float32)
        best_v = np.zeros(n, np.float32)
        idx_all = np.nonzero(active)[0]
        for c0 in range(0, idx_all.size, _CHUNK):
            idx = idx_all[c0 : c0 + _CHUNK]
            for ii, tris in enumerate(self.inst_tris):
                w2o = self.scene.inst_w2o[ii]
                oo = o[idx] @ w2o[:3, :3].T + w2o[:3, 3]
                dd = d[idx] @ w2o[:3, :3].T
                t, rel_tri, u, v = self._mt_batch(oo, dd, best_t[idx], tris)
                upd = t < best_t[idx]
                gi = idx[upd]
                best_t[gi] = t[upd]
                best_tri[gi] = tris[rel_tri[upd]]
                best_inst[gi] = ii
                best_u[gi] = u[upd]
                best_v[gi] = v[upd]
        hit = active & np.isfinite(best_t)
        return best_t, best_inst, best_tri, best_u, best_v, hit

    def intersect_any(self, o, d, maxt, active):
        """Occlusion test (≙ rayIntersectionTest)."""
        n = o.shape[0]
        occluded = np.zeros(n, bool)
        idx_all = np.nonzero(active)[0]
        for c0 in range(0, idx_all.size, _CHUNK):
            idx = idx_all[c0 : c0 + _CHUNK]
            rem = np.ones(idx.size, bool)
            for ii, tris in enumerate(self.inst_tris):
                if not rem.any():
                    break
                w2o = self.scene.inst_w2o[ii]
                sub = idx[rem]
                oo = o[sub] @ w2o[:3, :3].T + w2o[:3, 3]
                dd = d[sub] @ w2o[:3, :3].T
                t, _, _, _ = self._mt_batch(oo, dd, maxt[sub], tris)
                hit = np.isfinite(t)
                occluded[sub[hit]] = True
                rem[np.nonzero(rem)[0]] = ~hit
        return occluded

    # ----- rendering -----

    def render_accum(
        self, opt: RenderOptions, camera: Camera = None, sample_offset: int = 0
    ) -> np.ndarray:
        """Render the HDR accumulator [H, W, 3] (sum over spp samples).

        ``sample_offset`` shifts the absolute sample indices (the RNG is
        keyed on them), mirroring TpuRenderer.render_accum_offset — so the
        oracle can gate progressive/offset rendering and the spp axis."""
        sc = self.scene
        cam = camera or Camera.from_scene(sc, opt.width, opt.height)
        W, H = opt.width, opt.height
        n = W * H
        ys, xs = np.divmod(np.arange(n, dtype=np.uint32), np.uint32(W))
        pixel_idx = np.arange(n, dtype=np.uint32)
        rr_key = (
            rng.rr_block_key(np, pixel_idx, W) if opt.rr_tile_coherent else None
        )
        accum = np.zeros((n, 3), np.float32)
        num_emissives = int(sc.emis_area.shape[0])
        # per-bounce live-lane fractions (closest pass entry / NEE any-hit),
        # averaged over samples — the honest "useful ray" accounting behind
        # bench_configs.py's useful_mrays companion metric
        live_closest = np.zeros(opt.num_bounces)
        live_occl = np.zeros(opt.num_bounces)

        for s in range(sample_offset, sample_offset + opt.spp):
            U0 = rng.make_uniform(rng.np_uniform, opt.seed, pixel_idx, s, 0)
            ray_o, ray_d = gen_rays(
                np, cam.frustum, cam.position, W, H, xs, ys, U0
            )
            throughput = np.ones((n, 3), np.float32)
            flags = np.zeros(n, np.uint32)
            alive = np.ones(n, bool)
            maxt = np.full(n, V.FLT_MAX, np.float32)

            for b in range(opt.num_bounces):
                live_closest[b] += alive.mean() / opt.spp
                t, inst, tri, bu, bv, hit = self.intersect_closest(
                    ray_o, ray_d, maxt, alive
                )
                t = np.where(hit, t, 0.0).astype(np.float32)  # keep lanes finite
                # miss shading (pt_integrator.cl:214-275)
                if sc.scene_diffuse_mat >= 0:
                    miss = alive & (~hit)
                    bg = shade_miss(
                        np, self.S, ray_d, throughput, b == 0, sc.scene_diffuse_mat
                    )
                    accum[miss] += bg[miss]
                U = rng.make_uniform(
                    rng.np_uniform, opt.seed, pixel_idx, s, b, rr_key=rr_key
                )
                out = shade(
                    np,
                    self.S,
                    U,
                    bounce=b,
                    min_bounces_for_rr=opt.min_bounces_for_rr,
                    num_emissives=num_emissives,
                    material_depth=self.material_depth,
                    ray_o=ray_o,
                    ray_d=ray_d,
                    t=t,
                    inst=inst,
                    tri=tri,
                    bary_u=bu,
                    bary_v=bv,
                    hit_mask=hit,
                    throughput=throughput,
                    flags=flags,
                )
                accum += out["emit_add"]
                live_occl[b] += out["occl_mask"].mean() / opt.spp
                # occlusion test + NEE accumulation (pt_integrator.cl:278-296)
                if num_emissives > 0:
                    occluded = self.intersect_any(
                        out["occl_o"], out["occl_d"], out["occl_maxt"], out["occl_mask"]
                    )
                    nee = out["occl_mask"] & (~occluded)
                    accum[nee] += out["occl_value"][nee]
                ray_o = out["next_o"]
                ray_d = out["next_d"]
                throughput = out["throughput"]
                flags = out["flags"]
                alive = out["next_mask"]
                if not alive.any():
                    break
            _log.debug("sample %d/%d done", s + 1, opt.spp)

        self.last_live_stats = {
            "closest": live_closest.tolist(),
            "occl": live_occl.tolist(),
            # fraction of the nominal 2*bounces queries/pixel/sample that
            # were actually live
            "useful_fraction": float(
                (live_closest.sum() + live_occl.sum()) / (2 * opt.num_bounces)
            ),
        }
        return accum.reshape(H, W, 3)

    def render(self, opt: RenderOptions, camera: Camera = None) -> np.ndarray:
        """Render a tonemapped LDR image [H, W, 3] float in [0, 1]."""
        accum = self.render_accum(opt, camera)
        return tonemap_reinhard(np, accum, 1.0 / opt.spp, opt.exposure)
