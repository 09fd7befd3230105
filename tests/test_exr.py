"""EXR codec: scanline/tiled round-trips in every compression (incl. PIZ),
codec-piece inverse properties, texture-loader integration."""

import os
import struct
import numpy as np
import pytest

from polaris_tpu.asset import exr as E
from polaris_tpu.asset.exr import read_exr, write_exr, write_exr_tiled
from polaris_tpu.asset.texture import RGBA32F, load_texture


def test_exr_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    rgb = (rs.uniform(0, 50, (17, 23, 3))).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, rgb)
    out = read_exr(p)
    assert out.shape == (17, 23, 4)
    np.testing.assert_allclose(out[..., :3], rgb, rtol=1e-6)
    np.testing.assert_allclose(out[..., 3], 1.0)


def test_exr_texture_loading(tmp_path):
    rgb = np.linspace(0, 4, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    p = str(tmp_path / "env.exr")
    write_exr(p, rgb)
    tex = load_texture(p)
    assert tex.format == RGBA32F
    assert tex.width == 8 and tex.height == 8
    np.testing.assert_allclose(tex.data[..., :3], rgb, rtol=1e-6)


def test_exr_zip_compression(tmp_path):
    """Read a ZIPS-compressed file produced by hand (predictor + zlib)."""
    import struct
    import zlib

    from polaris_tpu.asset import exr as E

    rgb = np.arange(4 * 5 * 3, dtype=np.float32).reshape(4, 5, 3) * 0.25
    h, w = 4, 5

    def attr(name, typ, val):
        return (name.encode() + b"\x00" + typ.encode() + b"\x00"
                + struct.pack("<i", len(val)) + val)

    chan = b""
    for c in ("B", "G", "R"):
        chan += c.encode() + b"\x00" + struct.pack("<iiii", E.PIXEL_FLOAT, 0, 1, 1)
    chan += b"\x00"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (attr("channels", "chlist", chan)
              + attr("compression", "compression", bytes([E.ZIPS_COMPRESSION]))
              + attr("dataWindow", "box2i", box)
              + attr("displayWindow", "box2i", box)
              + b"\x00")
    head = struct.pack("<ii", E.MAGIC, 2) + header
    chunks = []
    for y in range(h):
        line = (rgb[y, :, 2].astype("<f4").tobytes()
                + rgb[y, :, 1].astype("<f4").tobytes()
                + rgb[y, :, 0].astype("<f4").tobytes())
        comp = zlib.compress(E._predictor_apply(line))
        if len(comp) >= len(line):
            comp = line  # stored raw when compression doesn't help
        chunks.append(struct.pack("<ii", y, len(comp)) + comp)
    table_pos = len(head)
    data_start = table_pos + 8 * h
    offsets, off = [], data_start
    for c in chunks:
        offsets.append(off)
        off += len(c)
    p = str(tmp_path / "z.exr")
    with open(p, "wb") as f:
        f.write(head)
        f.write(struct.pack(f"<{h}q", *offsets))
        for c in chunks:
            f.write(c)
    out = read_exr(p)
    np.testing.assert_allclose(out[..., :3], rgb, rtol=1e-6)


# ------------------------------------------------- compression round-trips


@pytest.mark.parametrize(
    "compression",
    [E.NO_COMPRESSION, E.ZIPS_COMPRESSION, E.ZIP_COMPRESSION, E.PIZ_COMPRESSION],
)
def test_scanline_roundtrip_all_compressions(tmp_path, compression):
    """FLOAT data is lossless in every supported compression; 37 rows spans
    multiple ZIP (16-line) and PIZ (32-line) chunks including short tails."""
    rs = np.random.RandomState(1)
    rgb = rs.uniform(0, 50, (37, 23, 3)).astype(np.float32)
    p = str(tmp_path / f"c{compression}.exr")
    write_exr(p, rgb, compression=compression)
    out = read_exr(p)
    np.testing.assert_array_equal(out[..., :3], rgb)


@pytest.mark.parametrize(
    "compression", [E.NO_COMPRESSION, E.ZIP_COMPRESSION, E.PIZ_COMPRESSION]
)
def test_tiled_roundtrip(tmp_path, compression):
    """Tiled ONE_LEVEL files with non-divisible edge tiles."""
    rs = np.random.RandomState(2)
    rgb = rs.uniform(0, 10, (45, 70, 3)).astype(np.float32)
    p = str(tmp_path / f"t{compression}.exr")
    write_exr_tiled(p, rgb, tile_size=(32, 16), compression=compression)
    out = read_exr(p)
    np.testing.assert_array_equal(out[..., :3], rgb)


def test_piz_compresses_smooth_data(tmp_path):
    """PIZ must actually compress (wavelet+huffman beating raw) on smooth
    gradients — guards against the store-raw fallback hiding a broken codec."""
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    rgb = np.stack([y / 64, x / 64, (x + y) / 128], -1)
    p_raw = str(tmp_path / "raw.exr")
    p_piz = str(tmp_path / "piz.exr")
    write_exr(p_raw, rgb, compression=E.NO_COMPRESSION)
    write_exr(p_piz, rgb, compression=E.PIZ_COMPRESSION)
    import os

    assert os.path.getsize(p_piz) < 0.7 * os.path.getsize(p_raw)
    np.testing.assert_array_equal(read_exr(p_piz)[..., :3], rgb)


def test_piz_16bit_wavelet_branch(tmp_path):
    """More than 2^14 distinct u16 values forces the wdec16/wenc16 wavelet
    variant; the round-trip must stay lossless there too."""
    # hash-pattern bits so both shorts of every float vary (uniform floats
    # concentrate the exponent byte and stay under 2^14 distinct shorts)
    i = np.arange(96 * 96 * 3, dtype=np.uint64)
    bits = ((i * 2654435761) & 0xFFFFFFFF).astype(np.uint32)
    rgb = bits.view(np.float32).reshape(96, 96, 3)
    # sanity: the first 32-scanline chunk really has > 2^14 distinct shorts
    shorts = np.frombuffer(rgb[:32].tobytes(), np.uint16)
    assert len(np.unique(shorts)) > (1 << 14)
    p = str(tmp_path / "w16.exr")
    write_exr(p, rgb, compression=E.PIZ_COMPRESSION)
    out = read_exr(p)[..., :3]
    # bit-exact including NaN payloads: compare the raw u32 views
    np.testing.assert_array_equal(
        np.ascontiguousarray(out).view(np.uint32), bits.reshape(96, 96, 3)
    )


def test_tiled_mipmap_level0(tmp_path):
    """A MIPMAP file: the reader must size the offset table over all levels
    and decode level (0,0) only. Levels >0 are written as valid chunks."""
    import struct

    rs = np.random.RandomState(4)
    rgb = rs.uniform(0, 4, (16, 16, 3)).astype(np.float32)
    txs = tys = 8
    tiles_attr = struct.pack("<IIB", txs, tys, E.MIPMAP_LEVELS)  # round down
    head = struct.pack("<ii", E.MAGIC, 2 | 0x200) + E._header_bytes(
        16, 16, E.NO_COMPRESSION, tiles_attr
    )
    chans = [("B", E.PIXEL_FLOAT), ("G", E.PIXEL_FLOAT), ("R", E.PIXEL_FLOAT)]
    chunks = []
    # level sizes (round down): 16, 8, 4, 2, 1
    for lvl, d in enumerate((16, 8, 4, 2, 1)):
        img = rgb[:d, :d] if lvl == 0 else np.zeros((d, d, 3), np.float32)
        n = (d + txs - 1) // txs
        for dy in range(n):
            for dx in range(n):
                cw = min(txs, d - dx * txs)
                ch = min(tys, d - dy * tys)
                raw = E._interleave_rgb(
                    img[dy * tys : dy * tys + ch, dx * txs : dx * txs + cw]
                )
                chunks.append(
                    struct.pack("<iiiii", dx, dy, lvl, lvl, len(raw)) + raw
                )
    data_start = len(head) + 8 * len(chunks)
    offsets, off = [], data_start
    for c in chunks:
        offsets.append(off)
        off += len(c)
    p = str(tmp_path / "mip.exr")
    with open(p, "wb") as f:
        f.write(head)
        f.write(struct.pack(f"<{len(chunks)}q", *offsets))
        for c in chunks:
            f.write(c)
    np.testing.assert_array_equal(read_exr(p)[..., :3], rgb)


def test_rle_scanline(tmp_path):
    """Hand-built RLE chunk (predictor + signed-count runs)."""
    import struct

    rgb = np.ones((2, 8, 3), np.float32) * 0.5
    w, h = 8, 2
    head = struct.pack("<ii", E.MAGIC, 2) + E._header_bytes(
        w, h, E.RLE_COMPRESSION
    )
    chunks = []
    for y in range(h):
        raw = E._interleave_rgb(rgb[y : y + 1])
        pred = E._predictor_apply(raw)
        # simple RLE encode: literal/repeat runs
        out = bytearray()
        i = 0
        while i < len(pred):
            j = i
            while j + 1 < len(pred) and pred[j + 1] == pred[i] and j - i < 126:
                j += 1
            if j > i:  # repeat run
                out.append(j - i)
                out.append(pred[i])
                i = j + 1
            else:
                k = i
                while (
                    k + 1 < len(pred)
                    and (k + 2 >= len(pred) or pred[k + 2] != pred[k + 1])
                    and k - i < 126
                ):
                    k += 1
                n = k - i + 1
                out.append(256 - n)
                out += pred[i : k + 1]
                i = k + 1
        data = bytes(out) if len(out) < len(raw) else raw
        chunks.append(struct.pack("<ii", y, len(data)) + data)
    data_start = len(head) + 8 * h
    offsets, off = [], data_start
    for c in chunks:
        offsets.append(off)
        off += len(c)
    p = str(tmp_path / "rle.exr")
    with open(p, "wb") as f:
        f.write(head)
        f.write(struct.pack(f"<{h}q", *offsets))
        for c in chunks:
            f.write(c)
    np.testing.assert_array_equal(read_exr(p)[..., :3], rgb)


# ----------------------------------------------------- codec-piece inverses


def test_wavelet_inverse_property():
    rs = np.random.RandomState(5)
    for shape in ((7, 13), (16, 16), (1, 9), (9, 1), (33, 5)):
        for mx in (100, 1 << 15):
            a = rs.randint(0, mx + 1, shape).astype(np.uint16)
            b = a.copy()
            E._wav2_encode(b, mx)
            if a.size > 4 and min(shape) > 1:
                assert not np.array_equal(a, b)  # it must actually transform
            E._wav2_decode(b, mx)
            np.testing.assert_array_equal(a, b)


def test_huffman_roundtrip():
    rs = np.random.RandomState(6)
    cases = [
        rs.randint(0, 65536, 5000).astype(np.uint16),       # dense alphabet
        rs.randint(0, 4, 5000).astype(np.uint16),           # tiny alphabet
        np.repeat(rs.randint(0, 9, 40), 700).astype(np.uint16),  # long runs
        np.zeros(1000, np.uint16),
        np.array([7], np.uint16),
        np.zeros(0, np.uint16),
    ]
    for data in cases:
        comp = E._huf_compress(data)
        out = E._huf_uncompress(comp, len(data))
        np.testing.assert_array_equal(out, data)
    # long runs must actually engage the RLE escape (beat 1 code/symbol)
    runs = np.repeat(rs.randint(0, 9, 40), 700).astype(np.uint16)
    assert len(E._huf_compress(runs)) < 0.1 * len(runs)


def test_lut_inverse_property():
    rs = np.random.RandomState(7)
    data = rs.randint(0, 65536, 3000).astype(np.uint16)
    bitmap = E._bitmap_from_data(data)
    fwd, mx1 = E._forward_lut(bitmap)
    rev, mx2 = E._reverse_lut(bitmap)
    assert mx1 == mx2
    np.testing.assert_array_equal(rev[fwd[data]], data)
    assert fwd[data].max() == mx1


def test_native_piz_decoder_matches_python():
    """The C++ PIZ decoder (native/exr_piz.cpp) must reproduce the Python
    decoder bit-for-bit on every chunk shape, including the 16-bit wavelet
    branch and RLE-heavy data."""
    from polaris_tpu.native import get_lib, piz_decode_native

    if get_lib() is None:
        pytest.skip("no native toolchain")
    rs = np.random.RandomState(8)
    chans = [("B", E.PIXEL_FLOAT), ("G", E.PIXEL_FLOAT), ("R", E.PIXEL_FLOAT)]
    cases = [
        rs.uniform(0, 50, (32, 23, 3)).astype(np.float32),      # generic
        np.ones((7, 5, 3), np.float32) * 0.25,                  # runs
        rs.uniform(-1e4, 1e4, (32, 96, 3)).astype(np.float32),  # w16 branch
    ]
    for rgb in cases:
        h, w = rgb.shape[:2]
        raw = E._interleave_rgb(rgb)
        comp = E._piz_compress(raw, chans, w, h)
        py = E._piz_uncompress_py(comp, chans, w, h)
        nat = piz_decode_native(
            comp, [s for _, s in E._chan_shorts(chans, w)], h
        )
        assert nat is not None
        assert bytes(py) == nat.astype("<u2").tobytes()


def test_native_piz_speed_on_large_map():
    """A production-size chunk must decode fast natively (the Python loop
    takes minutes at this size — that's why the native tier exists)."""
    import time

    from polaris_tpu.native import get_lib, piz_decode_native

    if get_lib() is None:
        pytest.skip("no native toolchain")
    rs = np.random.RandomState(9)
    chans = [("B", E.PIXEL_FLOAT), ("G", E.PIXEL_FLOAT), ("R", E.PIXEL_FLOAT)]
    y, x = np.mgrid[0:32, 0:2048].astype(np.float32)
    rgb = np.stack([np.sin(x / 60) + y / 16, x / 2048, y / 32], -1)
    raw = E._interleave_rgb(rgb)
    comp = E._piz_compress(raw, chans, 2048, 32)
    t0 = time.perf_counter()
    nat = piz_decode_native(comp, [s for _, s in E._chan_shorts(chans, 2048)], 32)
    dt = time.perf_counter() - t0
    assert nat is not None and dt < 0.5, dt
    assert nat.astype("<u2").tobytes() == raw


def test_piz_half_channels(tmp_path):
    """HALF channels (1 short/value — the most common EXR pixel type in the
    wild) through the PIZ pipeline, hand-built file."""
    import struct

    rs = np.random.RandomState(10)
    rgb16 = rs.uniform(0, 30, (40, 31, 3)).astype(np.float16)
    h, w = rgb16.shape[:2]

    def attr(name, typ, val):
        return (name.encode() + b"\x00" + typ.encode() + b"\x00"
                + struct.pack("<i", len(val)) + val)

    chan = b""
    for c in ("B", "G", "R"):
        chan += c.encode() + b"\x00" + struct.pack("<iiii", E.PIXEL_HALF, 0, 1, 1)
    chan += b"\x00"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (attr("channels", "chlist", chan)
              + attr("compression", "compression", bytes([E.PIZ_COMPRESSION]))
              + attr("dataWindow", "box2i", box)
              + attr("displayWindow", "box2i", box)
              + b"\x00")
    head = struct.pack("<ii", E.MAGIC, 2) + header
    chans = [("B", E.PIXEL_HALF), ("G", E.PIXEL_HALF), ("R", E.PIXEL_HALF)]
    chunks = []
    for y0 in range(0, h, 32):
        n_lines = min(32, h - y0)
        raw = b""
        for y in range(y0, y0 + n_lines):
            raw += (rgb16[y, :, 2].tobytes() + rgb16[y, :, 1].tobytes()
                    + rgb16[y, :, 0].tobytes())
        data = E._piz_compress(raw, chans, w, n_lines)
        if len(data) >= len(raw):
            data = raw
        chunks.append(struct.pack("<ii", y0, len(data)) + data)
    data_start = len(head) + 8 * len(chunks)
    offsets, off = [], data_start
    for c in chunks:
        offsets.append(off)
        off += len(c)
    p = str(tmp_path / "half.exr")
    with open(p, "wb") as f:
        f.write(head)
        f.write(struct.pack(f"<{len(chunks)}q", *offsets))
        for c in chunks:
            f.write(c)
    out = read_exr(p)
    np.testing.assert_array_equal(
        out[..., :3].astype(np.float16), rgb16
    )


# ---------------------------------------------------------------------------
# round 3: B44/B44A + crop windows, pinned bit-for-bit against files written
# AND decoded by the official libOpenEXR (scripts/gen_exr_fixtures.cpp; the
# .bin dumps are the library's own float32 display-window composition)

import os as _os

_FIXDIR = _os.path.join(_os.path.dirname(__file__), "fixtures")


def _load_official_dump(name):
    with open(_os.path.join(_FIXDIR, name + ".bin"), "rb") as f:
        h, w = np.frombuffer(f.read(8), np.int32)
        return np.frombuffer(f.read(), np.float32).reshape(h, w, 4)


@pytest.mark.parametrize(
    "name",
    [
        "b44_rgb",          # odd dims: partial edge blocks
        "b44a_flat",        # 3-byte constant blocks (B44A)
        "b44_mixed_float",  # HALF RGB + FLOAT Z (raw passthrough)
        "b44_tall",         # >32 scanlines: multiple chunks
        "crop_zip",         # dataWindow inside displayWindow, scanline
        "crop_piz",         # crop + PIZ
        "crop_tiled_zip",   # crop + tiled (tiles anchored at dataWindow)
    ],
)
def test_matches_official_openexr(name):
    got = E.read_exr(_os.path.join(_FIXDIR, name + ".exr"))
    exp = _load_official_dump(name)
    assert got.shape == exp.shape
    assert (got == exp).all(), np.abs(got - exp).max()


def test_dwaa_rejected_gracefully():
    with pytest.raises(E.ExrError, match="DWAA"):
        E.read_exr(_os.path.join(_FIXDIR, "dwaa.exr"))


# --------------------------------------------------------------- PXR24


def test_pxr24_float_roundtrip(tmp_path):
    """PXR24 FLOAT is lossy by exactly the 24-bit truncation: reading back
    must equal float24(x) expanded, never the original."""
    rs = np.random.RandomState(7)
    rgb = (rs.standard_normal((37, 23, 3)) * 40).astype(np.float32)
    rgb[4:8, 4:8] = 0.0
    p = str(tmp_path / "p24.exr")
    write_exr(p, rgb, compression=E.PXR24_COMPRESSION)
    out = read_exr(p)[..., :3]
    expect = (
        (E._float_to_float24(rgb.reshape(-1)) << 8)
        .astype(np.uint32)
        .view(np.float32)
        .reshape(rgb.shape)
    )
    np.testing.assert_array_equal(out, expect)
    # the truncation is a real 24-bit float: max relative error 2^-16
    nz = np.abs(rgb) > 1e-6
    rel = np.abs(out[nz] - rgb[nz]) / np.abs(rgb[nz])
    assert rel.max() < 2.0 ** -16
    # and the zlib'd delta planes actually compress smooth data
    smooth = np.tile(
        np.linspace(0, 8, 64, dtype=np.float32)[None, :, None], (64, 1, 3)
    )
    p2 = str(tmp_path / "p24s.exr")
    write_exr(p2, smooth, compression=E.PXR24_COMPRESSION)
    raw_size = 64 * 64 * 3 * 4
    assert os.path.getsize(p2) < raw_size * 0.5


def test_pxr24_half_channels_lossless(tmp_path):
    """HALF channels pass through PXR24 losslessly (2-byte delta planes)."""
    rs = np.random.RandomState(8)
    rgb = rs.uniform(0, 50, (20, 19, 3)).astype(np.float16).astype(np.float32)
    p = str(tmp_path / "p24h.exr")
    write_exr(
        p, rgb, compression=E.PXR24_COMPRESSION, pixel_type=E.PIXEL_HALF
    )
    out = read_exr(p)[..., :3]
    np.testing.assert_array_equal(out, rgb)


def test_pxr24_known_answer():
    """Hand-built PXR24 chunk decoded against hand-computed expectations
    (delta byte planes, MSB first, per scanline per channel; FLOAT pixels
    are 24-bit bits expanded <<8) — pins the byte layout independently of
    the round-trip."""
    import struct
    import zlib

    w = 3
    vals = np.array([1.0, 2.0, -0.5], np.float32)
    bits24 = (vals.view(np.uint32) >> 8).astype(np.int64)
    diffs = np.diff(bits24, prepend=0) & 0xFFFFFF
    planes = b"".join(
        bytes((diffs >> sh & 0xFF).astype(np.uint8)) for sh in (16, 8, 0)
    )
    raw = zlib.compress(planes)
    out = E._pxr24_uncompress(raw, [("R", E.PIXEL_FLOAT)], w, 1)
    got = np.frombuffer(out, "<f4")
    np.testing.assert_array_equal(got, vals)  # these values are 24-bit exact


# --------------------------------------------------------- HALF writer


@pytest.mark.parametrize(
    "compression",
    [E.NO_COMPRESSION, E.ZIP_COMPRESSION, E.PIZ_COMPRESSION,
     E.PXR24_COMPRESSION],
)
def test_half_writer_roundtrip(tmp_path, compression):
    """The HALF scanline writer (the dominant interchange format the
    reference writes via OIIO) round-trips exactly for f16-representable
    data in every compression."""
    rs = np.random.RandomState(9)
    rgb = rs.uniform(0, 100, (37, 23, 3)).astype(np.float16).astype(np.float32)
    p = str(tmp_path / f"h{compression}.exr")
    write_exr(p, rgb, compression=compression, pixel_type=E.PIXEL_HALF)
    out = read_exr(p)[..., :3]
    np.testing.assert_array_equal(out, rgb)
    # header really declares HALF channels
    data = open(p, "rb").read()
    ci = data.index(b"channels\x00chlist\x00")
    assert struct.unpack_from("<i", data, ci + 22)[0] == E.PIXEL_HALF


def test_pxr24_float24_clamps_finite(tmp_path):
    """Finite f32 values near FLT_MAX clamp to the largest finite float24
    instead of rounding over into infinity (review finding)."""
    big = np.float32(3.4028235e38)
    bits = E._float_to_float24(np.array([big, -big, 1.0], np.float32))
    back = (bits.astype(np.uint32) << 8).view(np.float32)
    assert np.isfinite(back).all()
    assert back[0] > 3.0e38 and back[1] < -3.0e38
    # inf/NaN are still preserved as inf/NaN
    bits2 = E._float_to_float24(np.array([np.inf, np.nan], np.float32))
    back2 = (bits2.astype(np.uint32) << 8).view(np.float32)
    assert np.isinf(back2[0]) and np.isnan(back2[1])
