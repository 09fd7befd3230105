"""Minimal OpenEXR (v2) scanline reader/writer.

The reference loads EXR through OpenImageIO (README.md:19); this image has
no EXR bindings, so a self-contained decoder covers the common case:
single-part scanline images, NONE/ZIP/ZIPS compression, HALF or FLOAT
channels R/G/B(/A/Y), data window == display window.

The writer emits uncompressed FLOAT scanlines (used by tests and for
dumping HDR render output).
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Tuple

import numpy as np

MAGIC = 20000630

# compression ids
NO_COMPRESSION = 0
RLE_COMPRESSION = 1
ZIPS_COMPRESSION = 2  # 1 scanline per chunk
ZIP_COMPRESSION = 3   # 16 scanlines per chunk

PIXEL_UINT = 0
PIXEL_HALF = 1
PIXEL_FLOAT = 2

_DTYPE = {PIXEL_HALF: np.float16, PIXEL_FLOAT: np.float32, PIXEL_UINT: np.uint32}


class ExrError(ValueError):
    pass


def _read_cstr(buf: bytes, pos: int) -> Tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("latin-1"), end + 1


def _predictor_undo(data: bytearray) -> bytes:
    """EXR zip post-processing: delta-decode then de-interleave."""
    # undo delta encoding
    for i in range(1, len(data)):
        data[i] = (data[i] + data[i - 1] - 128) & 0xFF
    # de-interleave: first half = even bytes, second half = odd bytes
    half = (len(data) + 1) // 2
    out = bytearray(len(data))
    out[0::2] = data[:half]
    out[1::2] = data[half:]
    return bytes(out)


def _predictor_apply(data: bytes) -> bytes:
    """Inverse of _predictor_undo (interleave + delta-encode)."""
    src = bytearray(len(data))
    half = (len(data) + 1) // 2
    src[:half] = data[0::2]
    src[half:] = data[1::2]
    out = bytearray(len(data))
    prev = 0
    for i, b in enumerate(src):
        if i == 0:
            out[0] = b
            prev = b
        else:
            out[i] = (b - prev + 128) & 0xFF
            prev = b
    return bytes(out)


def read_exr(path: str) -> np.ndarray:
    """Read an EXR image to (H, W, 4) float32 RGBA (missing channels: A=1,
    Y replicated to RGB)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != MAGIC:
        raise ExrError(f"{path}: not an EXR file")
    if version & 0x200:
        raise ExrError(f"{path}: multi-part EXR not supported")
    if version & 0x800:
        raise ExrError(f"{path}: deep data not supported")
    pos = 8

    channels: List[Tuple[str, int]] = []
    compression = NO_COMPRESSION
    data_window = None
    while True:
        name, pos = _read_cstr(buf, pos)
        if name == "":
            break
        typ, pos = _read_cstr(buf, pos)
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        val = buf[pos : pos + size]
        pos += size
        if name == "channels":
            cp = 0
            while val[cp] != 0:
                cname, cp = _read_cstr(val, cp)
                ptype, _plin, _x, _y = struct.unpack_from("<iiii", val, cp)
                cp += 16
                channels.append((cname, ptype))
        elif name == "compression":
            compression = val[0]
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", val)

    if data_window is None:
        raise ExrError(f"{path}: missing dataWindow")
    x0, y0, x1, y1 = data_window
    width = x1 - x0 + 1
    height = y1 - y0 + 1
    if compression not in (NO_COMPRESSION, ZIPS_COMPRESSION, ZIP_COMPRESSION):
        raise ExrError(f"{path}: unsupported compression {compression}")
    lines_per_chunk = {NO_COMPRESSION: 1, ZIPS_COMPRESSION: 1, ZIP_COMPRESSION: 16}[
        compression
    ]
    num_chunks = (height + lines_per_chunk - 1) // lines_per_chunk

    # channels are stored alphabetically within a scanline
    chan_sorted = sorted(channels, key=lambda c: c[0])
    offsets = struct.unpack_from(f"<{num_chunks}q", buf, pos)

    planes: Dict[str, np.ndarray] = {
        c: np.zeros((height, width), np.float32) for c, _ in channels
    }
    for off in offsets:
        (y,) = struct.unpack_from("<i", buf, off)
        (nbytes,) = struct.unpack_from("<i", buf, off + 4)
        raw = buf[off + 8 : off + 8 + nbytes]
        n_lines = min(lines_per_chunk, y1 - y + 1)
        expect = n_lines * sum(
            width * np.dtype(_DTYPE[t]).itemsize for _, t in channels
        )
        if compression != NO_COMPRESSION and nbytes < expect:
            raw = _predictor_undo(bytearray(zlib.decompress(raw)))
        cp = 0
        for line in range(n_lines):
            for cname, ptype in chan_sorted:
                dt = _DTYPE[ptype]
                nb = width * np.dtype(dt).itemsize
                vals = np.frombuffer(raw, dtype=dt, count=width, offset=cp)
                planes[cname][y - y0 + line] = vals.astype(np.float32)
                cp += nb

    out = np.zeros((height, width, 4), np.float32)
    out[..., 3] = 1.0
    names = {c for c, _ in channels}
    if "Y" in names and "R" not in names:
        for i in range(3):
            out[..., i] = planes["Y"]
    else:
        for i, c in enumerate("RGB"):
            if c in planes:
                out[..., i] = planes[c]
    if "A" in planes:
        out[..., 3] = planes["A"]
    return out


def write_exr(path: str, rgb: np.ndarray) -> None:
    """Write (H, W, 3) float32 as an uncompressed FLOAT scanline EXR."""
    h, w, _ = rgb.shape

    def attr(name: str, typ: str, val: bytes) -> bytes:
        return (
            name.encode() + b"\x00" + typ.encode() + b"\x00"
            + struct.pack("<i", len(val)) + val
        )

    chan = b""
    for c in ("B", "G", "R"):
        chan += c.encode() + b"\x00" + struct.pack("<iiii", PIXEL_FLOAT, 0, 1, 1)
    chan += b"\x00"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (
        attr("channels", "chlist", chan)
        + attr("compression", "compression", bytes([NO_COMPRESSION]))
        + attr("dataWindow", "box2i", box)
        + attr("displayWindow", "box2i", box)
        + attr("lineOrder", "lineOrder", b"\x00")
        + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
        + attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\x00"
    )
    head = struct.pack("<ii", MAGIC, 2) + header
    table_pos = len(head)
    data_start = table_pos + 8 * h
    line_bytes = 8 + 3 * 4 * w
    offsets = [data_start + i * line_bytes for i in range(h)]
    body = b""
    for y in range(h):
        # channels alphabetical: B, G, R
        line = (
            rgb[y, :, 2].astype("<f4").tobytes()
            + rgb[y, :, 1].astype("<f4").tobytes()
            + rgb[y, :, 0].astype("<f4").tobytes()
        )
        body += struct.pack("<ii", y, len(line)) + line
    with open(path, "wb") as f:
        f.write(head)
        f.write(struct.pack(f"<{h}q", *offsets))
        f.write(body)
