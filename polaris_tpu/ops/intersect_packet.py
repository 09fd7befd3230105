"""Tile-coherent ("packet") two-level BVH traversal — the fast device path.

TPU-native reinterpretation of the reference's packet kernel
(``rayPacketIntersectionQuery``, CL/kernels/intersect.cl:353-575, after
Günther et al. 2007): a workgroup of rays shares one traversal stack, votes
on which child to visit, and fetches vertices cooperatively. Here the same
idea is restructured for XLA vectorization:

  * rays are grouped into tiles of R rays; each tile keeps ONE stack and ONE
    cursor (per-tile scalars), so the expensive per-step state updates are
    [T]-sized gathers instead of [N]-sized ones (T = N / R)
  * child "voting" is a lane-reduction: a tile descends into a child if ANY
    of its live rays' slab test passes (the reference's 4-slot vote table +
    reduction, intersect.cl:510-540, collapses to jnp.any / argmin)
  * leaf triangles are tested densely: a [T, MAX_LEAF] index block gathers
    the leaf's triangles once per tile and all R rays test all of them as a
    masked [T, R, MAX_LEAF] VPU operation — no per-lane pointer chasing
  * near-child-first ordering uses the tile-min slab distance

Unlike the reference — which only packet-traces *primary* rays on GPUs
(pipeline.go:107-111) — this path is profitable for every ray generation on
TPU because divergence costs vector lanes, not warps; the per-lane
single-ray variant (ops/intersect.py) remains as the reference-faithful
fallback. Both produce identical hits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import vec as V
from .intersect import Hit

STACK_SIZE = 64
# must cover the compiler's largest leaf
from ..asset.compiler.compiler import MIN_PRIMITIVES_PER_LEAF as MAX_LEAF  # noqa: E402

PHASE_NODE = 0
PHASE_POP = 1
PHASE_DONE = 2


def _slab(o, d, bmin, bmax, best_t):
    """Per-ray slab test against a per-tile box: o,d [T,R,3]; bmin/bmax [T,3].

    Returns entry distance with FLT_MAX for misses (intersect.cl:135-155)."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, jnp.where(d < 0, -1e-30, 1e-30), d)
    t0 = (bmin[:, None, :] - o) * inv
    t1 = (bmax[:, None, :] - o) * inv
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    minmax = jnp.min(tmax, axis=-1)
    maxmin = jnp.max(tmin, axis=-1)
    miss = (minmax < 0.0) | (maxmin > minmax) | (maxmin >= best_t)
    return jnp.where(miss, V.FLT_MAX, maxmin)


def intersect_packet(S, o, d, maxt, active, *, any_hit: bool, rays_per_tile: int = 64):
    """Closest-hit (or any-hit) over tiles of rays with shared stacks.

    o, d: [N, 3]; maxt, active: [N]. N must be a multiple of rays_per_tile
    (the callers' ray counts are frame-sized; we pad if needed).
    """
    n = o.shape[0]
    R = rays_per_tile
    pad = (-n) % R
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        maxt = jnp.pad(maxt, (0, pad))
        active = jnp.pad(active, (0, pad))
    T = o.shape[0] // R
    o3 = o.reshape(T, R, 3)
    d3 = d.reshape(T, R, 3)
    mt = maxt.reshape(T, R)
    act = active.reshape(T, R)
    rows = jnp.arange(T)

    tile_live = jnp.any(act, axis=1)
    state = dict(
        phase=jnp.where(tile_live, PHASE_NODE, PHASE_DONE).astype(jnp.int32),
        node=jnp.zeros(T, jnp.int32),
        stack=jnp.zeros((T, STACK_SIZE), jnp.int32),
        sp=jnp.zeros(T, jnp.int32),
        msbi=jnp.full(T, -1, jnp.int32),
        inst=jnp.zeros(T, jnp.int32),
        cur_o=o3,
        cur_d=d3,
        best_t=jnp.where(act, mt, 0.0).astype(jnp.float32),
        best_tri=jnp.zeros((T, R), jnp.int32),
        best_inst=jnp.zeros((T, R), jnp.int32),
        best_u=jnp.zeros((T, R), jnp.float32),
        best_v=jnp.zeros((T, R), jnp.float32),
        found=jnp.zeros((T, R), bool),
    )

    num_tris = S["tri_v0"].shape[0]
    leaf_js = jnp.arange(MAX_LEAF, dtype=jnp.int32)

    def cond(st):
        return jnp.any(st["phase"] != PHASE_DONE)

    def body(st):
        phase = st["phase"]
        in_node = phase == PHASE_NODE
        node = st["node"]
        ld = S["bvh_ldata"][node]
        rd = S["bvh_rdata"][node]
        is_leaf = ld <= 0
        is_top = in_node & is_leaf & (rd == 0)
        is_bot = in_node & is_leaf & (rd > 0)
        is_inner = in_node & (~is_leaf)

        # per-ray participation: any-hit rays retire once occluded
        ray_live = act & (~st["found"] if any_hit else jnp.ones_like(act))

        # ---- top-level leaf: enter instance BLAS (intersect.cl:74-88)
        inst_id = jnp.clip(-ld, 0, S["inst_w2o"].shape[0] - 1)
        w2o = S["inst_w2o"][inst_id]  # [T,4,4]
        rot = w2o[:, :3, :3]
        to = (
            jnp.sum(rot[:, None, :, :] * st["cur_o"][:, :, None, :], axis=-1)
            + w2o[:, None, :3, 3]
        )
        td = jnp.sum(rot[:, None, :, :] * st["cur_d"][:, :, None, :], axis=-1)
        sel = is_top[:, None, None]
        cur_o = jnp.where(sel, to, st["cur_o"])
        cur_d = jnp.where(sel, td, st["cur_d"])
        inst = jnp.where(is_top, inst_id, st["inst"])
        msbi = jnp.where(is_top, st["sp"], st["msbi"])
        node = jnp.where(is_top, S["inst_bvh_root"][inst_id], node)

        # ---- bottom leaf: dense Möller–Trumbore over MAX_LEAF tris
        first = jnp.clip(-ld, 0, None)
        tri_idx = jnp.clip(first[:, None] + leaf_js[None, :], 0, num_tris - 1)
        jmask = leaf_js[None, :] < rd[:, None]  # [T, L]
        v0 = S["tri_v0"][tri_idx]  # [T, L, 3]
        e1 = S["tri_e1"][tri_idx]
        e2 = S["tri_e2"][tri_idx]
        co = cur_o[:, :, None, :]  # [T, R, 1, 3]
        cd = cur_d[:, :, None, :]
        pvec = V.cross3(jnp, cd, e2[:, None, :, :])
        det = V.dot3(jnp, e1[:, None, :, :], pvec)
        ok = jnp.abs(det) >= V.INTERSECTION_EPSILON
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tvec = co - v0[:, None, :, :]
        uu = V.dot3(jnp, tvec, pvec) * inv_det
        ok &= (uu >= 0.0) & (uu <= 1.0)
        qvec = V.cross3(jnp, tvec, e1[:, None, :, :])
        vv = V.dot3(jnp, cd, qvec) * inv_det
        ok &= (vv >= 0.0) & (uu + vv <= 1.0)
        tt = V.dot3(jnp, e2[:, None, :, :], qvec) * inv_det
        ok &= (tt > V.INTERSECTION_EPSILON) & (tt < st["best_t"][:, :, None])
        ok &= jmask[:, None, :] & is_bot[:, None, None] & ray_live[:, :, None]
        tt = jnp.where(ok, tt, jnp.inf)  # [T, R, L]
        t_best = jnp.min(tt, axis=-1)
        j_best = jnp.argmin(tt, axis=-1)
        upd = jnp.isfinite(t_best)
        best_t = jnp.where(upd, t_best, st["best_t"])
        best_tri = jnp.where(upd, first[:, None] + j_best.astype(jnp.int32), st["best_tri"])
        best_inst = jnp.where(upd, inst[:, None], st["best_inst"])
        ru = jnp.take_along_axis(uu, j_best[..., None], axis=-1)[..., 0]
        rv = jnp.take_along_axis(vv, j_best[..., None], axis=-1)[..., 0]
        best_u = jnp.where(upd, ru, st["best_u"])
        best_v = jnp.where(upd, rv, st["best_v"])
        found = st["found"] | upd
        phase = jnp.where(is_bot, PHASE_POP, phase)
        if any_hit:
            ray_live = ray_live & (~found)

        # ---- inner node: slab vote (≙ packet vote, intersect.cl:510-540)
        lmin = S["bvh_min"][jnp.clip(ld, 0, None)]
        lmax = S["bvh_max"][jnp.clip(ld, 0, None)]
        rmin = S["bvh_min"][jnp.clip(rd, 0, None)]
        rmax = S["bvh_max"][jnp.clip(rd, 0, None)]
        l_dist = jnp.where(ray_live, _slab(cur_o, cur_d, lmin, lmax, best_t), V.FLT_MAX)
        r_dist = jnp.where(ray_live, _slab(cur_o, cur_d, rmin, rmax, best_t), V.FLT_MAX)
        l_min = jnp.min(l_dist, axis=1)
        r_min = jnp.min(r_dist, axis=1)
        want_l = is_inner & (l_min < V.FLT_MAX)
        want_r = is_inner & (r_min < V.FLT_MAX)
        both = want_l & want_r
        near_is_l = l_min <= r_min
        near = jnp.where(near_is_l, ld, rd)
        far = jnp.where(near_is_l, rd, ld)

        sp_c = jnp.clip(st["sp"], 0, STACK_SIZE - 1)
        old = st["stack"][rows, sp_c]
        stack = st["stack"].at[rows, sp_c].set(jnp.where(both, far, old))
        sp = jnp.where(both, st["sp"] + 1, st["sp"])
        node = jnp.where(both, near, node)
        node = jnp.where(want_l ^ want_r, jnp.where(want_l, ld, rd), node)
        phase = jnp.where(is_inner & ~(want_l | want_r), PHASE_POP, phase)
        # any-hit early out: all rays in the tile are occluded
        if any_hit:
            phase = jnp.where(
                in_node & ~jnp.any(ray_live, axis=1), PHASE_DONE, phase
            )

        # ---- pop (intersect.cl:163-176)
        in_pop = phase == PHASE_POP
        restore = in_pop & (sp == msbi)
        cur_o = jnp.where(restore[:, None, None], o3, cur_o)
        cur_d = jnp.where(restore[:, None, None], d3, cur_d)
        msbi = jnp.where(restore, -1, msbi)
        sp = jnp.where(in_pop, sp - 1, sp)
        sp_c2 = jnp.clip(sp, 0, STACK_SIZE - 1)
        node = jnp.where(in_pop & (sp >= 0), stack[rows, sp_c2], node)
        phase = jnp.where(in_pop, jnp.where(sp >= 0, PHASE_NODE, PHASE_DONE), phase)

        return dict(
            phase=phase,
            node=node,
            stack=stack,
            sp=sp,
            msbi=msbi,
            inst=inst,
            cur_o=cur_o,
            cur_d=cur_d,
            best_t=best_t,
            best_tri=best_tri,
            best_inst=best_inst,
            best_u=best_u,
            best_v=best_v,
            found=found,
        )

    st = jax.lax.while_loop(cond, body, state)
    found = st["found"].reshape(-1)[:n]
    t = jnp.where(found, st["best_t"].reshape(-1)[:n], 0.0)
    return Hit(
        t,
        st["best_inst"].reshape(-1)[:n],
        st["best_tri"].reshape(-1)[:n],
        st["best_u"].reshape(-1)[:n],
        st["best_v"].reshape(-1)[:n],
        active & found,
    )
