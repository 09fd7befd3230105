"""Pallas TPU kernel: 8-wide BVH packet traversal.

Second-generation device kernel. Profiling the binary kernel
(docs/perf.md) showed the node rate is bounded by the scalar core consuming
vector-reduction results (two per binary node): every vote stalls the scalar
pipeline on the VPU. Collapsing the compiler's binary BVH into 8-wide nodes
(host-side, SAH-greedy frontier expansion) lets one iteration slab-test all
8 children and consume one *batch* of reductions, cutting both the number of
scalar-sync chains and the iteration count by ~3-7x.

Child slots are packed host-side into immediate i32 entries

    entry = type<<28 | count<<22 | index      (type: 0 empty, 1 wide-inner,
                                               2 triangle leaf, 3 instance)

so the kernel's stack holds self-describing work items: a popped entry
dispatches directly to slab/MT/instance-transform phases with no extra
memory lookups. Two-level semantics (instance entry transforms the tile's
rays; leaving the instance's subtree restores them — ≙ intersect.cl:74-88,
164-169) are preserved via the same stack-watermark trick as the binary
kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import vec as V
from .intersect import Hit

from .intersect_pallas import TILE  # POLARIS_TILE_ROWS applies here too

TILE_RAYS = TILE[0] * TILE[1]
BLOCK_TILES = 16
BLOCK_RAYS = BLOCK_TILES * TILE_RAYS
STACK_SIZE = 96
WIDTH = 8

T_EMPTY = 0
T_WIDE = 1
T_BOT = 2
T_TOP = 3

SMEM_SCENE_BUDGET = 700 * 1024


def _entry(typ: int, index: int, count: int = 0) -> int:
    assert 0 <= index < (1 << 22) and 0 <= count < (1 << 6)
    return (typ << 28) | (count << 22) | index


# ------------------------------------------------------------- host packer


def collapse_wide(scene):
    """Collapse the binary two-level BVH into 8-wide nodes (host-side).

    Returns dict with wc_boxes (W,48) f32, wc_entry (W,8) i32,
    root_entry i32, inst_entry (I,) i32.
    """
    ld = scene.bvh_ldata
    rd = scene.bvh_rdata
    bmin = scene.bvh_min
    bmax = scene.bvh_max

    def area(i):
        s = bmax[i] - bmin[i]
        return float(s[0] * s[1] + s[1] * s[2] + s[0] * s[2])

    wc_boxes: list = []
    wc_entry: list = []

    def is_inner(i):
        return ld[i] > 0

    def leaf_entry(i):
        if rd[i] == 0:  # top-level leaf -> instance
            return _entry(T_TOP, int(-ld[i]))
        return _entry(T_BOT, int(-ld[i]), int(rd[i]))

    def collapse(root):
        """Returns the packed entry for the subtree at binary node `root`."""
        if not is_inner(root):
            return leaf_entry(root)
        # SAH-greedy frontier expansion to up to WIDTH slots
        frontier = [int(ld[root]), int(rd[root])]
        while len(frontier) < WIDTH:
            cands = [f for f in frontier if is_inner(f)]
            if not cands:
                break
            x = max(cands, key=area)
            frontier.remove(x)
            frontier += [int(ld[x]), int(rd[x])]
        w = len(wc_entry)
        wc_boxes.append(np.zeros(WIDTH * 6, np.float32))
        wc_entry.append(np.zeros(WIDTH, np.int32))
        for s, f in enumerate(frontier):
            wc_boxes[w][s * 6 : s * 6 + 3] = bmin[f]
            wc_boxes[w][s * 6 + 3 : s * 6 + 6] = bmax[f]
        # recurse after allocating w so indices are stable
        entries = [collapse(f) if is_inner(f) else leaf_entry(f) for f in frontier]
        for s, e in enumerate(entries):
            wc_entry[w][s] = e
        return _entry(T_WIDE, w)

    root_entry = collapse(0)
    inst_entry = np.array(
        [collapse(int(r)) for r in scene.inst_bvh_root], np.int32
    )
    return {
        "w8_boxes": np.stack(wc_boxes) if wc_boxes else np.zeros((1, 48), np.float32),
        "w8_entry": np.stack(wc_entry) if wc_entry else np.zeros((1, 8), np.int32),
        "w8_root": np.int32(root_entry),
        "w8_inst_entry": inst_entry,
    }


def pack_scene8(scene) -> dict:
    wide = collapse_wide(scene)
    tris = (
        np.concatenate([scene.tri_v0, scene.tri_e1, scene.tri_e2], axis=1)
        .astype(np.float32)
        .reshape(-1)
    )
    w2o = scene.inst_w2o[:, :3, :].astype(np.float32).reshape(-1)
    return {
        "pk_boxes": wide["w8_boxes"].reshape(-1),
        "pk_entry": wide["w8_entry"].reshape(-1),
        "pk_inst_entry": wide["w8_inst_entry"],
        "pk_root": np.full(1, wide["w8_root"], np.int32),
        "pk_tris": tris,
        "pk_w2o": w2o,
    }


def scene_smem_bytes8(scene) -> int:
    n_wide = max(1, scene.bvh_ldata.shape[0] // 4)
    return int(
        n_wide * (48 * 4 + 8 * 4)
        + scene.tri_v0.nbytes * 3
        + scene.inst_w2o.nbytes
    )


# ------------------------------------------------------------------ kernel


def _kernel(
    boxes_ref,   # SMEM (W*48,) f32 — flat (2D SMEM pads the last dim)
    entry_ref,   # SMEM (W*8,) i32 — flat
    ie_ref,      # SMEM (I,) i32 instance subtree entries
    root_ref,    # SMEM (1,) i32
    tris_ref,    # SMEM (T*9,) f32 — flat
    w2o_ref,     # SMEM (I*12,) f32 — flat
    # rays (VMEM)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, maxt_ref, act_ref,
    # outputs (VMEM)
    t_ref, u_ref, v_ref, tri_ref, inst_ref, found_ref,
    # scratch
    stack_ref,   # SMEM (STACK_SIZE,) i32
    dmin_ref,    # SMEM (WIDTH,) f32 per-child tile-min distances
    cox, coy, coz, cdx, cdy, cdz,
    *,
    any_hit: bool,
    max_leaf: int,
):
    num_tris = tris_ref.shape[0] // 9
    num_wide = entry_ref.shape[0] // 8

    def run_tile(k, _):
        act = act_ref[k] != 0

        cox[:] = ox_ref[k]
        coy[:] = oy_ref[k]
        coz[:] = oz_ref[k]
        cdx[:] = dx_ref[k]
        cdy[:] = dy_ref[k]
        cdz[:] = dz_ref[k]
        t_ref[k] = jnp.where(act, maxt_ref[k], 0.0)
        u_ref[k] = jnp.zeros(TILE, jnp.float32)
        v_ref[k] = jnp.zeros(TILE, jnp.float32)
        tri_ref[k] = jnp.zeros(TILE, jnp.int32)
        inst_ref[k] = jnp.zeros(TILE, jnp.int32)
        found_ref[k] = jnp.zeros(TILE, jnp.int32)

        def live_mask():
            if any_hit:
                return act & (found_ref[k] == 0)
            return act

        # carry: (alive, entry, sp, msbi, inst)
        def cond(c):
            return c[0] != 0

        def body(c):
            alive, entry, sp, msbi, inst = c
            typ = (entry >> 28) & 0x7
            idx = entry & 0x3FFFFF
            cnt = (entry >> 22) & 0x3F

            is_wide = typ == T_WIDE
            is_bot = typ == T_BOT
            is_top = typ == T_TOP

            # ---------- instance entry: transform rays, jump to subtree
            @pl.when(is_top)
            def _():
                m = [w2o_ref[idx * 12 + c_] for c_ in range(12)]
                px, py, pz = cox[:], coy[:], coz[:]
                cox[:] = m[0] * px + m[1] * py + m[2] * pz + m[3]
                coy[:] = m[4] * px + m[5] * py + m[6] * pz + m[7]
                coz[:] = m[8] * px + m[9] * py + m[10] * pz + m[11]
                qx, qy, qz = cdx[:], cdy[:], cdz[:]
                cdx[:] = m[0] * qx + m[1] * qy + m[2] * qz
                cdy[:] = m[4] * qx + m[5] * qy + m[6] * qz
                cdz[:] = m[8] * qx + m[9] * qy + m[10] * qz

            msbi = jnp.where(is_top, sp, msbi)
            inst = jnp.where(is_top, idx, inst)
            entry = jnp.where(is_top, ie_ref[idx], entry)

            # ---------- triangle leaf: dense MT, accumulate in registers
            @pl.when(is_bot)
            def _():
                first = idx
                live = live_mask()
                px, py, pz = cox[:], coy[:], coz[:]
                qx, qy, qz = cdx[:], cdy[:], cdz[:]
                bt = t_ref[k]
                bu = u_ref[k]
                bv = v_ref[k]
                btri = tri_ref[k]
                binst = inst_ref[k]
                bfound = found_ref[k]
                for j in range(max_leaf):
                    ti = jnp.clip(first + j, 0, num_tris - 1)
                    v0x = tris_ref[ti * 9 + 0]
                    v0y = tris_ref[ti * 9 + 1]
                    v0z = tris_ref[ti * 9 + 2]
                    e1x = tris_ref[ti * 9 + 3]
                    e1y = tris_ref[ti * 9 + 4]
                    e1z = tris_ref[ti * 9 + 5]
                    e2x = tris_ref[ti * 9 + 6]
                    e2y = tris_ref[ti * 9 + 7]
                    e2z = tris_ref[ti * 9 + 8]
                    pvx = qy * e2z - qz * e2y
                    pvy = qz * e2x - qx * e2z
                    pvz = qx * e2y - qy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    ok = jnp.abs(det) >= V.INTERSECTION_EPSILON
                    inv_det = 1.0 / jnp.where(ok, det, 1.0)
                    tvx = px - v0x
                    tvy = py - v0y
                    tvz = pz - v0z
                    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    ok &= (uu >= 0.0) & (uu <= 1.0)
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    vv = (qx * qvx + qy * qvy + qz * qvz) * inv_det
                    ok &= (vv >= 0.0) & (uu + vv <= 1.0)
                    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    ok &= (tt > V.INTERSECTION_EPSILON) & (tt < bt)
                    ok &= live & (j < cnt)
                    bt = jnp.where(ok, tt, bt)
                    bu = jnp.where(ok, uu, bu)
                    bv = jnp.where(ok, vv, bv)
                    btri = jnp.where(ok, first + j, btri)
                    binst = jnp.where(ok, inst, binst)
                    bfound = jnp.where(ok, 1, bfound)
                t_ref[k] = bt
                u_ref[k] = bu
                v_ref[k] = bv
                tri_ref[k] = btri
                inst_ref[k] = binst
                found_ref[k] = bfound

            # ---------- wide node: slab all 8 children, one reduction batch
            @pl.when(is_wide)
            def _():
                live = live_mask()
                px, py, pz = cox[:], coy[:], coz[:]
                qx, qy, qz = cdx[:], cdy[:], cdz[:]
                ix = 1.0 / jnp.where(jnp.abs(qx) < 1e-30, jnp.where(qx < 0, -1e-30, 1e-30), qx)
                iy = 1.0 / jnp.where(jnp.abs(qy) < 1e-30, jnp.where(qy < 0, -1e-30, 1e-30), qy)
                iz = 1.0 / jnp.where(jnp.abs(qz) < 1e-30, jnp.where(qz < 0, -1e-30, 1e-30), qz)
                best = t_ref[k]
                for s in range(WIDTH):
                    b0 = boxes_ref[idx * 48 + s * 6 + 0]
                    b1 = boxes_ref[idx * 48 + s * 6 + 1]
                    b2 = boxes_ref[idx * 48 + s * 6 + 2]
                    b3 = boxes_ref[idx * 48 + s * 6 + 3]
                    b4 = boxes_ref[idx * 48 + s * 6 + 4]
                    b5 = boxes_ref[idx * 48 + s * 6 + 5]
                    tx0 = (b0 - px) * ix
                    tx1 = (b3 - px) * ix
                    ty0 = (b1 - py) * iy
                    ty1 = (b4 - py) * iy
                    tz0 = (b2 - pz) * iz
                    tz1 = (b5 - pz) * iz
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1),
                    )
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1),
                    )
                    hit = live & ~((tf < 0.0) | (tn > tf) | (tn >= best))
                    # all 8 reductions issue back-to-back: one scalar drain
                    dmin_ref[s] = jnp.min(jnp.where(hit, tn, V.FLT_MAX))

            # scalar descent decision: continue at nearest child, push rest
            hit_s = []
            ent_s = []
            for s in range(WIDTH):
                e_s = entry_ref[jnp.clip(idx, 0, num_wide - 1) * 8 + s]
                valid = is_wide & (((e_s >> 28) & 0x7) != T_EMPTY)
                hit_s.append(valid & (dmin_ref[s] < V.FLT_MAX))
                ent_s.append(e_s)
            # nearest child
            best_d = jnp.float32(V.FLT_MAX)
            best_e = jnp.int32(0)
            any_c = jnp.bool_(False)
            for s in range(WIDTH):
                d_s = jnp.where(hit_s[s], dmin_ref[s], V.FLT_MAX)
                take = d_s < best_d
                best_d = jnp.where(take, d_s, best_d)
                best_e = jnp.where(take, ent_s[s], best_e)
                any_c = any_c | hit_s[s]
            # push the non-best hit children
            for s in range(WIDTH):
                push = hit_s[s] & (ent_s[s] != best_e)

                @pl.when(push)
                def _(s=s):
                    stack_ref[jnp.clip(sp, 0, STACK_SIZE - 1)] = ent_s[s]

                sp = jnp.where(push, sp + 1, sp)

            entry = jnp.where(is_wide & any_c, best_e, entry)

            # ---------- pop when: leaf done, empty wide, or anyhit all-found
            need_pop = is_bot | (is_wide & ~any_c)
            if any_hit:
                all_found = ~jnp.any(act & (found_ref[k] == 0))
                need_pop = need_pop | ((is_bot | is_wide) & all_found)
                # drain the stack entirely once all rays are occluded
                sp = jnp.where((is_bot | is_wide) & all_found, 0, sp)

            restore = need_pop & (sp == msbi)

            @pl.when(restore)
            def _():
                cox[:] = ox_ref[k]
                coy[:] = oy_ref[k]
                coz[:] = oz_ref[k]
                cdx[:] = dx_ref[k]
                cdy[:] = dy_ref[k]
                cdz[:] = dz_ref[k]

            msbi = jnp.where(restore, -1, msbi)
            sp = jnp.where(need_pop, sp - 1, sp)
            popped = stack_ref[jnp.clip(sp, 0, STACK_SIZE - 1)]
            entry = jnp.where(need_pop & (sp >= 0), popped, entry)
            alive = jnp.where(need_pop & (sp < 0), 0, alive)
            return (alive, entry, sp, msbi, inst)

        tile_live = jnp.any(act)
        init = (
            tile_live.astype(jnp.int32),
            root_ref[0],
            jnp.int32(0),
            jnp.int32(-1),
            jnp.int32(0),
        )
        jax.lax.while_loop(cond, body, init)
        return 0

    jax.lax.fori_loop(0, BLOCK_TILES, run_tile, 0)


@functools.lru_cache(maxsize=None)
def _build_call(num_wide, num_tris, num_inst, grid, any_hit, max_leaf):
    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(_kernel, any_hit=any_hit, max_leaf=max_leaf)
    ray_spec = pl.BlockSpec(
        (None, BLOCK_TILES) + TILE, lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem()] * 6 + [ray_spec] * 8,
        out_specs=[ray_spec] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.float32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.float32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.float32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.int32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.int32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_SIZE,), jnp.int32),
            pltpu.SMEM((WIDTH,), jnp.float32),
        ]
        + [pltpu.VMEM(TILE, jnp.float32)] * 6,
        interpret=interpret,
    )


def intersect_pallas8(P, o, d, maxt, active, *, any_hit: bool, max_leaf: int):
    n = o.shape[0]
    pad = (-n) % BLOCK_RAYS
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        maxt = jnp.pad(maxt, (0, pad))
        active = jnp.pad(active, (0, pad))
    g = o.shape[0] // BLOCK_RAYS
    shape = (g, BLOCK_TILES, *TILE)

    def comp(x, i):
        return x[:, i].reshape(shape)

    call = _build_call(
        int(P["pk_boxes"].shape[0]),
        int(P["pk_tris"].shape[0]),
        int(P["pk_w2o"].shape[0]),
        g,
        any_hit,
        max_leaf,
    )
    t, u, v, tri, inst, found = call(
        P["pk_boxes"],
        P["pk_entry"],
        P["pk_inst_entry"],
        P["pk_root"],
        P["pk_tris"],
        P["pk_w2o"],
        comp(o, 0), comp(o, 1), comp(o, 2),
        comp(d, 0), comp(d, 1), comp(d, 2),
        maxt.reshape(shape),
        active.astype(jnp.int32).reshape(shape),
    )
    found_flat = found.reshape(-1)[:n] != 0
    t_flat = jnp.where(found_flat, t.reshape(-1)[:n], 0.0)
    return Hit(
        t_flat,
        inst.reshape(-1)[:n],
        tri.reshape(-1)[:n],
        u.reshape(-1)[:n],
        v.reshape(-1)[:n],
        active[:n] & found_flat,
    )
