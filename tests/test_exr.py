"""Minimal EXR codec: round-trip + texture-loader integration."""

import numpy as np

from polaris_tpu.asset.exr import read_exr, write_exr
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
