"""Pallas TPU kernel: dense (traversal-free) intersection for small scenes.

Profiling (docs/perf.md) showed that for incoherent bounce rays on
benchmark-scale scenes the packet BVH union covers nearly every leaf — the
kernel degenerates to dense testing *plus* per-node scalar-core sync stalls.
This kernel embraces that: a fully static loop over all triangles (per
instance, with the instance ray transform hoisted) — zero stack, zero votes,
zero vector->scalar synchronization. The scalar core just streams triangle
constants from SMEM while the VPU runs back-to-back Möller–Trumbore on the
(8, 128) ray tile.

Used by the integrator for bounce/occlusion rays when the scene is small;
primary rays keep the BVH packet kernel (coherent tiles prune well there).
"""

from __future__ import annotations

import functools
from typing import Tuple

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

# dense testing is sensible only up to a few thousand triangles
DENSE_MAX_TRIS = 4096


def _kernel(
    ranges_ref,  # SMEM (I*2,) i32: (first, count) per instance — passed as
                 # data so the triangle fori bounds are dynamic (static
                 # python bounds make Mosaic fully unroll the loop and
                 # explode compile time)
    tris_ref,    # SMEM (T*9,) f32 flat
    w2o_ref,     # SMEM (I*12,) f32 flat
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, maxt_ref, act_ref,
    t_ref, u_ref, v_ref, tri_ref, inst_ref, found_ref,
    *,
    any_hit: bool,
    num_inst: int,
):
    def run_tile(k, _):
        act = act_ref[k] != 0
        bt = jnp.where(act, maxt_ref[k], 0.0)
        bt_den = jnp.ones(TILE, jnp.float32)
        bu = jnp.zeros(TILE, jnp.float32)
        bv = jnp.zeros(TILE, jnp.float32)
        btri = jnp.zeros(TILE, jnp.int32)
        binst = jnp.zeros(TILE, jnp.int32)
        bfound = jnp.zeros(TILE, jnp.int32)

        wx, wy, wz = ox_ref[k], oy_ref[k], oz_ref[k]
        wdx, wdy, wdz = dx_ref[k], dy_ref[k], dz_ref[k]

        for ii in range(num_inst):
            first = ranges_ref[ii * 2 + 0]
            count = ranges_ref[ii * 2 + 1]
            m = [w2o_ref[ii * 12 + c] for c in range(12)]
            px = m[0] * wx + m[1] * wy + m[2] * wz + m[3]
            py = m[4] * wx + m[5] * wy + m[6] * wz + m[7]
            pz = m[8] * wx + m[9] * wy + m[10] * wz + m[11]
            qx = m[0] * wdx + m[1] * wdy + m[2] * wdz
            qy = m[4] * wdx + m[5] * wdy + m[6] * wdz
            qz = m[8] * wdx + m[9] * wdy + m[10] * wdz

            # division-free MT (see intersect_pallas.py): u/v/t scaled by
            # det over a det^2 denominator, cross-multiplied best-t compare,
            # one divide per tile at the end
            def tri_body(j, carry):
                bt_num, bt_den, bu_num, bv_num, btri, binst, bfound = carry
                base = j * 9
                v0x = tris_ref[base + 0]
                v0y = tris_ref[base + 1]
                v0z = tris_ref[base + 2]
                e1x = tris_ref[base + 3]
                e1y = tris_ref[base + 4]
                e1z = tris_ref[base + 5]
                e2x = tris_ref[base + 6]
                e2y = tris_ref[base + 7]
                e2z = tris_ref[base + 8]
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
                ok &= (t_num > V.INTERSECTION_EPSILON * det_a) & (
                    t_num * bt_den < bt_num * det_a
                )
                if any_hit:
                    ok &= act & (bfound == 0)
                else:
                    ok &= act
                bt_num = jnp.where(ok, t_num, bt_num)
                bt_den = jnp.where(ok, det_a, bt_den)
                bu_num = jnp.where(ok, u_num, bu_num)
                bv_num = jnp.where(ok, v_num, bv_num)
                btri = jnp.where(ok, j, btri)
                binst = jnp.where(ok, ii, binst)
                bfound = jnp.where(ok, 1, bfound)
                return bt_num, bt_den, bu_num, bv_num, btri, binst, bfound

            bt, bt_den, bu, bv, btri, binst, bfound = jax.lax.fori_loop(
                first, first + count, tri_body,
                (bt, bt_den, bu, bv, btri, binst, bfound),
            )

        inv = 1.0 / bt_den
        t_ref[k] = bt * inv
        u_ref[k] = bu * inv
        v_ref[k] = bv * inv
        tri_ref[k] = btri
        inst_ref[k] = binst
        found_ref[k] = bfound
        return 0

    jax.lax.fori_loop(0, BLOCK_TILES, run_tile, 0)


@functools.lru_cache(maxsize=None)
def _build_call(num_tris, grid, any_hit, num_inst):
    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(_kernel, any_hit=any_hit, num_inst=num_inst)
    ray_spec = pl.BlockSpec(
        (None, BLOCK_TILES) + TILE, lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem(), smem(), smem()] + [ray_spec] * 8,
        out_specs=[ray_spec] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.float32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.float32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.float32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.int32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.int32),
            jax.ShapeDtypeStruct((grid, BLOCK_TILES, *TILE), jnp.int32),
        ],
        interpret=interpret,
    )


def pack_scene_dense(scene) -> dict:
    from ..cpu_ref.renderer import _collect_blas_triangles

    tris = (
        np.concatenate([scene.tri_v0, scene.tri_e1, scene.tri_e2], axis=1)
        .astype(np.float32)
        .reshape(-1)
    )
    w2o = scene.inst_w2o[:, :3, :].astype(np.float32).reshape(-1)
    ranges = []
    for root in scene.inst_bvh_root:
        t = _collect_blas_triangles(scene, int(root))
        first, count = int(t.min()), int(t.size)
        assert t.max() - first + 1 == count
        ranges.append((first, count))
    return {
        "pk_ranges": np.asarray(ranges, np.int32).reshape(-1),
        "pk_tris": tris,
        "pk_w2o": w2o,
    }


def intersect_pallas_dense(P, o, d, maxt, active, *, any_hit: bool):
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
        int(P["pk_tris"].shape[0]) // 9, g, any_hit,
        int(P["pk_w2o"].shape[0]) // 12,
    )
    t, u, v, tri, inst, found = call(
        P["pk_ranges"],
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
