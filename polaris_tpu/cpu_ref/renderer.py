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

# ---- decision-stability probing (docs/parity.md #14) ----
# A float32 render is not a well-defined function of the scene on lanes
# where an epsilon/branch decision sits within input-ulp noise of its
# boundary: NumPy and XLA round identical formulas differently (FMA,
# association), the resulting rays differ by ~1 ulp, and Möller–Trumbore
# amplifies that by |terms|/|det| (measured: 1 ulp of shadow-ray direction
# moved u+v by 1.2e-5 at det = -6.2e-4 — 200x per ulp). The oracle
# therefore *forward-identifies* such lanes by probing every near-boundary
# decision under perturbations PROBE_ETA ~ 16x the real 1-ulp noise; the
# full-resolution gates demand exactness on all stable lanes and bound the
# unstable fraction. This is an a-priori analysis, not post-hoc diffing.
PROBE_ETA = 1e-6  # ~16 f32 ulps at unit scale
# cap for the propagated per-lane noise estimate: the MEASURED cross-
# backend divergence envelope (sphere 3-bounce np-vs-jnp-shade pipeline:
# median 3e-8, p99 3e-7, max 3.6e-6) plus margin — the conservative band
# model's grazing-det tails would otherwise compound ~100x beyond reality
NOISE_CAP = 4e-6
_PROBE_PATTERNS = (
    np.array([1.0, -1.0, 1.0], np.float32),
    np.array([-0.5, 1.0, 1.0], np.float32),
)


def _probe_rays(o, d, eta=None):
    """Yield noise-scale perturbed copies of the given rays (4 probes).

    ``eta`` is the per-lane input noise scale (defaults to PROBE_ETA): the
    forward noise-propagation analysis (render_accum stability loop) grows
    it along paths whose shading amplifies input noise — e.g. dispersive
    refraction chains — so later-bounce probes perturb at the noise the
    lane has actually accumulated, not at primary-ray ulps."""
    e = np.float32(PROBE_ETA) if eta is None else eta[:, None]
    for p in _PROBE_PATTERNS:
        for sgn in (np.float32(1.0), np.float32(-1.0)):
            dp = (d + (sgn * e) * p).astype(np.float32)
            op = (o + (sgn * e) * p * np.maximum(1.0, np.abs(o))).astype(
                np.float32
            )
            yield op, dp


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

    def _mt_risk(self, o, d, maxt, tris, mult=1.0):
        """Per-ray decision-risk info vs one triangle set (docs/parity.md #14).

        Returns (possible, solid, risky_c, t1, B1, t2, B2):
          possible — some candidate accepted under *loosened* boundary bands
          solid    — some candidate accepted under *tightened* bands
          risky_c  — some candidate whose acceptance differs between the two
                     (its validity is not decided at f32 + input-ulp noise)
          t1,t2    — two smallest nominally-valid candidate ts (inf pad)
          B1,B2    — their uv-space noise bands

        The band B = 5e-7/|det| is the measured MT amplification of
        PROBE_ETA-sized input noise (1 ulp of ray direction moved u+v by
        1.2e-5 at |det| = 6.2e-4 on the sphere terminator incident), with a
        4x safety factor; bands are deliberate supersets — _probe_* then
        decides actual instability on the flagged subset.
        """
        v0 = self.scene.tri_v0[tris]
        e1 = self.scene.tri_e1[tris]
        e2 = self.scene.tri_e2[tris]
        pvec = np.cross(d[:, None, :], e2[None, :, :])
        det = np.einsum("tj,ctj->ct", e1, pvec)
        absdet = np.abs(det)
        safe = absdet > 1e-12
        inv = np.where(safe, 1.0 / np.where(safe, det, 1.0), 0.0)
        tvec = o[:, None, :] - v0[None, :, :]
        u = np.einsum("ctj,ctj->ct", tvec, pvec) * inv
        qvec = np.cross(tvec, e1[None, :, :])
        v = np.einsum("cj,ctj->ct", d, qvec) * inv
        t = np.einsum("tj,ctj->ct", e2, qvec) * inv
        eps = V.INTERSECTION_EPSILON
        # B_out: the PROBE_ETA-noise amplification band (lane-independent,
        # returned for per-lane rescaling); B: the prescreen band, widened
        # by the worst accumulated path noise in this chunk (supersets are
        # free — the probes decide; but B_out must NOT carry mult, or one
        # noisy lane would inflate every lane's shade-probe scale)
        B_out = np.clip(5e-7 / np.maximum(absdet, 1e-12), 1e-4, 0.5)
        B = np.clip(B_out * mult, 0.0, 0.5)
        tband = B * np.maximum(np.abs(t), 1e-2) + 1e-5
        mx = maxt[:, None]

        def accept(sign):
            b, tb = sign * B, sign * tband
            det_ok = absdet >= (eps * 0.5 if sign > 0 else eps * 2.0)
            return (
                safe
                & det_ok
                & (u >= -b)
                & (u <= 1 + b)
                & (v >= -b)
                & (u + v <= 1 + b)
                & (t > eps - tb)
                & (t < mx + tb)
            )

        loose, tight = accept(1.0), accept(-1.0)
        possible = loose.any(axis=1)
        solid = tight.any(axis=1)
        risky_c = (loose & ~tight).any(axis=1)
        ok_n = (
            safe
            & (absdet >= eps)
            & (u >= 0)
            & (u <= 1)
            & (v >= 0)
            & (u + v <= 1)
            & (t > eps)
            & (t < mx)
        )
        tn = np.where(ok_n, t, np.inf)
        rows = np.arange(tn.shape[0])
        i1 = np.argmin(tn, axis=1)
        t1 = tn[rows, i1]
        B1 = np.where(np.isfinite(t1), B[rows, i1], 0.0)
        tn[rows, i1] = np.inf
        i2 = np.argmin(tn, axis=1)
        t2 = tn[rows, i2]
        B2 = np.where(np.isfinite(t2), B[rows, i2], 0.0)
        return possible, solid, risky_c, t1, B1, t2, B2

    def _closest_risky(self, o, d, maxt, idx, mult=1.0):
        """Lanes (subset ``idx``) whose closest-hit *decision outputs*
        (hit flag / winning instance / winning triangle) are near a
        boundary: a risky candidate exists, or the two best ts tie within
        their noise bands. ``mult`` scales the bands for lanes whose
        accumulated path noise exceeds PROBE_ETA. Returns (risky, B1)."""
        m = idx.size
        risky = np.zeros(m, bool)
        # global top-2 (t, B) across instances, merged pairwise
        g_t = np.full((m, 2), np.inf, np.float32)
        g_B = np.zeros((m, 2), np.float32)
        for c0 in range(0, m, _CHUNK):
            sl = slice(c0, min(c0 + _CHUNK, m))
            gi = idx[sl]
            for ii, tris in enumerate(self.inst_tris):
                w2o = self.scene.inst_w2o[ii]
                oo = o[gi] @ w2o[:3, :3].T + w2o[:3, 3]
                dd = d[gi] @ w2o[:3, :3].T
                _, _, rc, t1, B1, t2, B2 = self._mt_risk(
                    oo, dd, maxt[gi], tris, mult=mult
                )
                risky[sl] |= rc
                cand_t = np.concatenate(
                    [g_t[sl], t1[:, None], t2[:, None]], axis=1
                )
                cand_B = np.concatenate(
                    [g_B[sl], B1[:, None], B2[:, None]], axis=1
                )
                order = np.argsort(cand_t, axis=1)[:, :2]
                r = np.arange(cand_t.shape[0])[:, None]
                g_t[sl] = cand_t[r, order]
                g_B[sl] = cand_B[r, order]
        with np.errstate(invalid="ignore"):
            tie = np.isfinite(g_t[:, 1]) & (
                g_t[:, 1] - g_t[:, 0]
                < (g_B[:, 0] + g_B[:, 1]) * np.maximum(g_t[:, 0], 1e-2) + 1e-5
            )
        return risky | tie, g_B[:, 0]

    def probe_closest(self, o, d, maxt, active, nominal, noise=None):
        """Flag lanes whose closest-hit outcome flips under noise-scale
        probes (``noise``: per-lane accumulated input noise, see
        _probe_rays). Returns (unstable [n] bool, uv_band [n] f32) —
        uv_band is the winner's barycentric noise band, used to scale the
        shade probes."""
        n = o.shape[0]
        unstable = np.zeros(n, bool)
        uv_band = np.zeros(n, np.float32)
        idx = np.nonzero(active)[0]
        if idx.size == 0:
            return unstable, uv_band
        mult = 1.0
        if noise is not None and idx.size:
            mult = max(
                1.0, float(np.clip(noise[idx], 0, NOISE_CAP).max()) / PROBE_ETA
            )
        risky, B1 = self._closest_risky(o, d, maxt, idx, mult=mult)
        uv_band[idx] = B1
        pidx = idx[risky]
        if pidx.size == 0:
            return unstable, uv_band
        t0, inst0, tri0, _, _, hit0 = nominal
        act = np.ones(pidx.size, bool)
        # flip probes run at the TYPICAL accumulated noise, capped at the
        # measured per-bounce amplification bound (~6x/bounce from 1-2
        # ulps => <= ~3e-5 at depth 3; the uncapped conservative estimate
        # is kept for the smooth value-jump criterion, where worst-casing
        # costs accuracy, not false discrete flips): probing discrete
        # flips inside the worst-case noise BALL would flag every lane
        # whose ball touches a silhouette, ~10x the honest set
        eta = (
            np.full(pidx.size, 2e-7, np.float32)
            if noise is None
            else np.clip(noise[pidx], 2e-7, 3e-5)
        )
        nrm = self.scene.tri_normals.mean(axis=1)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
        for op, dp in _probe_rays(o[pidx], d[pidx], eta=eta):
            pt, pinst, ptri, _, _, phit = self.intersect_closest(
                op, dp, maxt[pidx], act
            )
            # a winner change only matters if it changes SHADING: on smooth
            # meshes a noisy ray legitimately lands on the edge-adjacent
            # same-material near-coplanar triangle with continuous
            # radiance — flagging those inflates the unstable set ~10x on
            # the glass-sphere scene (its internal lens chain really does
            # amplify ray noise; the radiance stays continuous)
            swap = hit0[pidx] & phit & (
                (pinst != inst0[pidx]) | (ptri != tri0[pidx])
            )
            severe = (
                (pinst != inst0[pidx])
                | (
                    self.scene.tri_material[ptri]
                    != self.scene.tri_material[tri0[pidx]]
                )
                | (
                    np.abs(
                        np.where(np.isfinite(pt), pt, 0.0)
                        - np.where(np.isfinite(t0[pidx]), t0[pidx], 0.0)
                    )
                    > 0.05
                    * np.maximum(
                        np.abs(np.where(np.isfinite(t0[pidx]), t0[pidx], 0.0)),
                        0.1,
                    )
                )
                | (np.einsum("ij,ij->i", nrm[ptri], nrm[tri0[pidx]]) < 0.9)
            )
            flip = (phit != hit0[pidx]) | (swap & severe)
            unstable[pidx[flip]] = True
        return unstable, uv_band

    def probe_any(self, o, d, maxt, active, occluded, noise=None):
        """Flag lanes whose occlusion decision flips under noise probes."""
        n = o.shape[0]
        unstable = np.zeros(n, bool)
        idx = np.nonzero(active)[0]
        if idx.size == 0:
            return unstable
        mult = 1.0
        if noise is not None:
            mult = max(
                1.0, float(np.clip(noise[idx], 0, NOISE_CAP).max()) / PROBE_ETA
            )
        poss = np.zeros(idx.size, bool)
        sol = np.zeros(idx.size, bool)
        for c0 in range(0, idx.size, _CHUNK):
            sl = slice(c0, min(c0 + _CHUNK, idx.size))
            gi = idx[sl]
            for ii, tris in enumerate(self.inst_tris):
                w2o = self.scene.inst_w2o[ii]
                oo = o[gi] @ w2o[:3, :3].T + w2o[:3, 3]
                dd = d[gi] @ w2o[:3, :3].T
                p, s, _, _, _, _, _ = self._mt_risk(
                    oo, dd, maxt[gi], tris, mult=mult
                )
                poss[sl] |= p
                sol[sl] |= s
        pidx = idx[poss & ~sol]
        if pidx.size == 0:
            return unstable
        act = np.ones(pidx.size, bool)
        eta = (
            np.full(pidx.size, 2e-7, np.float32)
            if noise is None
            else np.clip(noise[pidx], 2e-7, NOISE_CAP)
        )
        es = eta
        for op, dp in _probe_rays(o[pidx], d[pidx], eta=eta):
            for sgn in (-1.0, 1.0):
                pocc = self.intersect_any(
                    op, dp, maxt[pidx] * (1.0 + sgn * es), act
                )
                unstable[pidx[pocc != occluded[pidx]]] = True
        return unstable

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

    def _probe_shade(
        self, U, bounce, opt, num_emissives, ray_o, ray_d, t, inst, tri,
        bu, bv, hit, throughput, flags, uv_band, out0, chk, noise,
    ):
        """Flag lanes where a shading *branch* flips under input-ulp noise.

        Covers every comparison inside the shared shade/bxdf/material
        modules (RR survival vs its uniform, fresnel branch choice, pdf
        floors, mask predicates) without instrumenting them: shade is
        re-run with inputs perturbed at the REALISTIC cross-backend noise
        scale — a few ulps on values, the per-lane MT amplification band
        scaled back from its 16-ulp/4x-safety superset to ~2 ulps on
        barycentrics — and a lane is unstable if a discrete output flips
        or a value response exceeds the parity gate's own tolerance band
        (then the lane provably cannot meet the gate under legitimate
        backend noise, branch flip or smooth hyper-sensitivity alike).
        Probing at the superset band instead over-flags smooth rough-
        surface shading ~30x (measured: 4087 of 4154 mitsuba-512 flags
        were smooth GGX responses to a 100x-overscale perturbation).

        Round 5 (VERDICT item 8): barycentric noise is probed by its OWN
        probe pair at the lane's REAL uv-noise envelope, unrescaled —
        texture fetches respond to uv noise as STEP functions (texel
        edges), and the old single pair perturbed uv at the measurable
        eta scale then linearly rescaled the step response, flagging
        every lane whose 4x-safety superset band reached an edge the
        real noise never crosses (measured on mitsuba-512: 9.2k of 9.8k
        flags were such value/throughput jumps). The envelope is
        calibrated: measured cross-backend uv divergence on mitsuba
        primaries is p50 0.11x / p99 0.60x / max 1.3x of
        pred = B1*noise/(4*PROBE_ETA) (docs/parity.md #14 round-5 note),
        so the probe band is 1.5x pred — a 1.15x margin over the worst
        measured lane, chosen with the magnitude filter's own slack on
        top (realized divergences sit at p50 0.11x pred)."""
        # Pair 1 — everything EXCEPT barycentrics, probed at a measurable
        # scale (>= ~4 ulps), responses rescaled by ratio = noise/(2*eta)
        # (the response to the lane's ACTUAL accumulated noise under
        # first-order linearity; A-B spans 2*eta).
        eta = np.maximum(noise, np.float32(4e-7))
        ratio = (noise / (2.0 * eta)).astype(np.float32)
        outs = []
        for sgn in (np.float32(1.0), np.float32(-1.0)):
            outs.append(
                shade(
                    np, self.S, U,
                    bounce=bounce,
                    min_bounces_for_rr=opt.min_bounces_for_rr,
                    num_emissives=num_emissives,
                    material_depth=self.material_depth,
                    ray_o=ray_o * (1 + sgn * eta[:, None]),
                    ray_d=(
                        ray_d + (sgn * eta)[:, None] * _PROBE_PATTERNS[0]
                    ).astype(np.float32),
                    t=t * (1 + sgn * eta),
                    inst=inst,
                    tri=tri,
                    bary_u=bu,
                    bary_v=bv,
                    hit_mask=hit,
                    throughput=throughput * (1 + sgn * eta[:, None]),
                    flags=flags,
                )
            )
        A, B = outs

        def jump(key):
            # the parity gate's own tolerance band (test_parity_full._gate
            # atol/rtol), evaluated at the lane's actual noise: a lane
            # whose response exceeds it — branch flip or smooth hyper-
            # sensitivity — can legitimately violate the gate and is
            # excluded a priori
            d = np.abs(A[key] - B[key]).max(axis=1) * ratio
            r = np.abs(out0[key]).max(axis=1)
            return d > (2e-4 + 1e-3 * r)

        masks = (A["occl_mask"] != B["occl_mask"]) | (
            A["next_mask"] != B["next_mask"]
        )
        values = jump("occl_value") | jump("emit_add")
        d_resp = np.abs(A["next_d"] - B["next_d"]).max(axis=1) * ratio
        dirs = (d_resp > 0.05) & out0["next_mask"]
        tps = jump("throughput") & out0["next_mask"]

        # Pair 2 — barycentrics only, at the lane's CALIBRATED uv-noise
        # envelope: measured cross-backend uv divergence (mitsuba 512²
        # primaries, oracle vs XLA, same-hit lanes) is p50 0.11x / p99
        # 0.60x / max 1.3x of pred = B1*noise/(4*PROBE_ETA), so the probe
        # band 1.5*pred covers the worst measured lane with margin — vs
        # the old eta-floored B1*eta/(4*PROBE_ETA), a 2.7x overshoot at
        # primary noise. The magnitude filter (same `ratio` rescale as
        # pair 1) is retained: it is what kept smooth/small texel
        # gradients out of the flag set through seven zero-violation
        # gates; only responses a realistic crossing makes AND whose
        # step size can break the gate band are flagged.
        uvq = np.clip(
            uv_band * (noise * 1.5 / (4.0 * PROBE_ETA)), 0.0, 2e-2
        ).astype(np.float32)
        A2, B2 = (
            shade(
                np, self.S, U,
                bounce=bounce,
                min_bounces_for_rr=opt.min_bounces_for_rr,
                num_emissives=num_emissives,
                material_depth=self.material_depth,
                ray_o=ray_o, ray_d=ray_d, t=t, inst=inst, tri=tri,
                bary_u=bu + np.float32(sgn) * uvq,
                bary_v=bv - np.float32(sgn) * uvq,
                hit_mask=hit, throughput=throughput, flags=flags,
            )
            for sgn in (1.0, -1.0)
        )

        def jump2(key):
            d = np.abs(A2[key] - B2[key]).max(axis=1) * ratio
            r = np.abs(out0[key]).max(axis=1)
            return d > (2e-4 + 1e-3 * r)

        uv_bad = (A2["occl_mask"] != B2["occl_mask"]) | (
            A2["next_mask"] != B2["next_mask"]
        )
        uv_bad |= jump2("occl_value") | jump2("emit_add")
        uv_bad |= (
            np.abs(A2["next_d"] - B2["next_d"]).max(axis=1) * ratio > 0.05
        ) & out0["next_mask"]
        uv_bad |= jump2("throughput") & out0["next_mask"]

        bad = masks | values | dirs | tps | uv_bad
        # cause decomposition (diagnostics for tightening the per-scene
        # unstable bounds)
        for k, m in (("mask_flip", masks), ("value_jump", values),
                     ("dir_resp", dirs), ("throughput_jump", tps),
                     ("uv_step", uv_bad)):
            self.stab_sources[k] = self.stab_sources.get(k, 0) + int(
                (chk & m).sum()
            )
        # forward noise propagation: the rescaled probe response IS the
        # first-order noise estimate for the next bounce's inputs
        # (dispersive/specular chains amplify multiplicatively; probing at
        # primary-ray ulps forever would miss the accumulated divergence)
        tp_ref = np.abs(out0["throughput"]).max(axis=1) + 1e-6
        tp_resp = (
            np.abs(A["throughput"] - B["throughput"]).max(axis=1)
            / tp_ref
            * ratio
        )
        noise_next = np.clip(
            np.maximum(d_resp, tp_resp), noise, NOISE_CAP
        ).astype(np.float32)
        noise_next = np.where(out0["next_mask"], noise_next, noise)
        return chk & bad, noise_next

    # ----- rendering -----

    def render_accum(
        self,
        opt: RenderOptions,
        camera: Camera = None,
        sample_offset: int = 0,
        stability: bool = False,
    ) -> np.ndarray:
        """Render the HDR accumulator [H, W, 3] (sum over spp samples).

        ``sample_offset`` shifts the absolute sample indices (the RNG is
        keyed on them), mirroring TpuRenderer.render_accum_offset — so the
        oracle can gate progressive/offset rendering and the spp axis.

        ``stability=True`` additionally runs the decision-stability
        analysis (docs/parity.md #14): every intersection/occlusion/branch
        decision is probed under ulp-scale input perturbations, and lanes
        whose decision flips — lanes where a float32 render is not a
        well-defined function of the scene — are recorded in
        ``self.last_unstable`` [H, W]. Full-resolution parity gates demand
        exactness on stable lanes only and bound the unstable fraction."""
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
        unstable = np.zeros(n, bool)
        # flag-cause counters. Diagnostics ONLY: causes within one shade
        # probe overlap (a lane may increment several keys), and 'uv_step'
        # is the whole bary-probe OR (incl. bary-induced mask flips), so
        # per-cause sums can exceed the flagged-lane count.
        self.stab_sources = {}
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
            # per-lane accumulated input-noise scale for this sample's path
            # (forward noise propagation — see _probe_shade); primary rays
            # carry ~1-2 ulps of cross-backend rounding
            noise = np.full(n, 1.5e-7, np.float32)

            for b in range(opt.num_bounces):
                live_closest[b] += alive.mean() / opt.spp
                t, inst, tri, bu, bv, hit = self.intersect_closest(
                    ray_o, ray_d, maxt, alive
                )
                uv_band = np.zeros(n, np.float32)
                if stability:
                    chk = alive & ~unstable
                    u_new, uv_band = self.probe_closest(
                        ray_o, ray_d, maxt, chk, (t, inst, tri, bu, bv, hit),
                        noise,
                    )
                    self.stab_sources["closest"] = self.stab_sources.get(
                        "closest", 0
                    ) + int(u_new.sum())
                    unstable |= u_new
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
                if stability:
                    bad, noise = self._probe_shade(
                        U, b, opt, num_emissives, ray_o, ray_d, t, inst, tri,
                        bu, bv, hit, throughput, flags, uv_band, out,
                        alive & ~unstable, noise,
                    )
                    unstable |= bad
                # occlusion test + NEE accumulation (pt_integrator.cl:278-296)
                if num_emissives > 0:
                    occluded = self.intersect_any(
                        out["occl_o"], out["occl_d"], out["occl_maxt"], out["occl_mask"]
                    )
                    nee = out["occl_mask"] & (~occluded)
                    accum[nee] += out["occl_value"][nee]
                    if stability:
                        u_any = self.probe_any(
                            out["occl_o"],
                            out["occl_d"],
                            out["occl_maxt"],
                            out["occl_mask"] & ~unstable,
                            occluded,
                            noise,
                        )
                        self.stab_sources["any"] = self.stab_sources.get(
                            "any", 0
                        ) + int(u_any.sum())
                        unstable |= u_any
                ray_o = out["next_o"]
                ray_d = out["next_d"]
                throughput = out["throughput"]
                flags = out["flags"]
                alive = out["next_mask"]
                if not alive.any():
                    break
            _log.debug("sample %d/%d done", s + 1, opt.spp)

        self.last_unstable = unstable.reshape(H, W)
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
