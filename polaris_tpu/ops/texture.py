"""Backend-generic texture sampling from the flat float32 RGBA atlas.

Counterpart of the reference's manual global-memory texture fetch
(``CL/samplers/texture_sampler.cl:14-252``): repeat wrap, bilinear filtering,
plus the 3-tap bump-to-normal reconstruction. Because the compile-time loader
normalizes every texture to float32 RGBA (asset/texture.py), the four-format
switch disappears — sampling is a pure gather + lerp, differentiable w.r.t.
the atlas.

The scene dict ``S`` must contain tex_data (K,), tex_offset/width/height (Tx,).
"""

from __future__ import annotations


def _fetch_rgba(xp, S, base_px):
    """Gather 4 consecutive floats starting at pixel slot ``base_px*4``."""
    tex = S["tex_data"].reshape(-1, 4)
    return tex[base_px]


def _bilinear_setup(xp, S, uv, tex_idx):
    """Common uv -> texel corner indices + lerp coefficients."""
    safe_idx = xp.maximum(tex_idx, 0)
    w = S["tex_width"][safe_idx]
    h = S["tex_height"][safe_idx]
    off = S["tex_offset"][safe_idx] // 4  # pixel offset
    wf = w.astype(uv.dtype)
    hf = h.astype(uv.dtype)
    su = (uv[..., 0] - xp.floor(uv[..., 0])) * wf
    sv = (uv[..., 1] - xp.floor(uv[..., 1])) * hf
    tx = xp.clip(su.astype(w.dtype), 0, w - 1)
    ty = xp.clip(sv.astype(h.dtype), 0, h - 1)
    bx = xp.clip(tx + 1, 0, w - 1)
    by = xp.clip(ty + 1, 0, h - 1)
    cx = su - tx.astype(uv.dtype)
    cy = sv - ty.astype(uv.dtype)
    return off, w, tx, ty, bx, by, cx, cy


def tex_sample_rgba(xp, S, uv, tex_idx):
    """Bilinear RGBA sample; tex_idx may be -1 (caller masks the result)."""
    off, w, tx, ty, bx, by, cx, cy = _bilinear_setup(xp, S, uv, tex_idx)
    tl = _fetch_rgba(xp, S, off + ty * w + tx)
    tr = _fetch_rgba(xp, S, off + ty * w + bx)
    bl = _fetch_rgba(xp, S, off + by * w + tx)
    br = _fetch_rgba(xp, S, off + by * w + bx)
    cxe = cx[..., None]
    cye = cy[..., None]
    return (tl * (1 - cye) + bl * cye) * (1 - cxe) + (tr * (1 - cye) + br * cye) * cxe


def tex_sample3(xp, S, uv, tex_idx):
    return tex_sample_rgba(xp, S, uv, tex_idx)[..., :3]


def tex_sample1(xp, S, uv, tex_idx):
    """Red-channel sample (texture_sampler.cl texGetSample1f)."""
    return tex_sample_rgba(xp, S, uv, tex_idx)[..., 0]


def tex_bump_sample3(xp, S, uv, tex_idx):
    """3-tap height-to-normal reconstruction (texture_sampler.cl:187-253).

    Returns 0.5 + 0.5*normalize(s1-s0, s2-s0, 1), like the reference, so the
    caller's ``*2-1`` decode applies uniformly to bump and normal maps.
    """
    off, w, tx, ty, bx, by, cx, cy = _bilinear_setup(xp, S, uv, tex_idx)
    s0 = _fetch_rgba(xp, S, off + ty * w + tx)[..., 0]
    s1 = _fetch_rgba(xp, S, off + ty * w + bx)[..., 0]
    s2 = _fetch_rgba(xp, S, off + by * w + tx)[..., 0]
    dx = s1 - s0
    dy = s2 - s0
    inv_len = 1.0 / xp.sqrt(dx * dx + dy * dy + 1.0)
    n = xp.stack([dx * inv_len, dy * inv_len, inv_len], axis=-1)
    return 0.5 + 0.5 * n


def mat_sample3(xp, S, uv, default3, tex_idx, field=None):
    """Texture-or-constant float3 (material_sampler.cl matGetSample3f).

    ``field`` names the material field so texture-free scenes can skip the
    atlas gathers entirely (ops/statics.py); when the host proved no node of
    this field has a texture, every ``tex_idx`` is -1 and the where() below
    would select ``default3`` on all lanes anyway.
    """
    if field is not None:
        from .statics import tex_on

        if not tex_on(S, field):
            return default3
    sampled = tex_sample3(xp, S, uv, tex_idx)
    return xp.where((tex_idx < 0)[..., None], default3, sampled)


def mat_sample1(xp, S, uv, default1, tex_idx, field=None):
    if field is not None:
        from .statics import tex_on

        if not tex_on(S, field):
            return default1
    sampled = tex_sample1(xp, S, uv, tex_idx)
    return xp.where(tex_idx < 0, default1, sampled)
