"""Generic image decode: magic-byte dispatch over the in-repo codecs.

Closes the last PIL-class stub in the multimodal path: `decode_image`
sniffs the payload's magic bytes and routes to a REAL in-repo decoder —
P6 PPM, PNG (zlib + full de-filter), JPEG (baseline SOF0 + progressive
SOF2 Huffman/DCT), and the two codecs added here, BMP (Windows
BITMAPINFOHEADER, 24-bit BI_RGB) and GIF (GIF87a/89a, variable-width
LZW per the GIF89a spec Appendix F). Every branch returns the same
(h, w, 3) uint8 contract, so downstream feature extractors are
format-blind — exactly the dispatch shape a PIL-backed decode would
have on a real cluster, with five real codecs behind it instead of a
NotImplementedError.

Reference parity: the reference engine treats payload columns as opaque
bytes end-to-end (mariadb-cdc ColumnValue BLOB passthrough); the decode
layer is this repo's training-data-pipeline extension, public formats
only (BMP: Windows BITMAPFILEHEADER/BITMAPINFOHEADER layout; GIF:
GIF89a specification, CompuServe 1990).

Scale shape: all decoders are called inside mapInPandas Arrow batches
(one Python worker per partition, no shuffle); a corrupt payload raises
a _DECODE_ERRORS member and the caller emits a null-feature row, never
a task failure.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- BMP
# 24-bit uncompressed (BI_RGB) Windows bitmap: 14-byte file header +
# 40-byte BITMAPINFOHEADER, rows stored bottom-up (positive height) or
# top-down (negative), BGR byte order, each row padded to 4 bytes.


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp BI_RGB BMP bytes (bottom-up rows)."""
    h, w, _ = pixels.shape
    row = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row), dtype=np.uint8)
    # bottom-up row order, RGB -> BGR
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    img = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(img), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return header + info + img


def decode_bmp(payload: bytes) -> "np.ndarray":
    """24bpp BI_RGB BMP -> (h, w, 3) uint8 RGB. Handles bottom-up and
    top-down row order; other bit depths / compressions raise."""
    if payload is None or not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    _, _fsize, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h_signed, _planes, bpp, comp = struct.unpack_from(
        "<iiHHI", payload, 18
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24bpp BI_RGB supported, got {bpp}/{comp}")
    h = abs(h_signed)
    row = (w * 3 + 3) // 4 * 4
    data = np.frombuffer(payload, dtype=np.uint8, count=h * row, offset=offset)
    rows = data.reshape(h, row)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


# ----------------------------------------------------------------- GIF
# GIF87a/89a with a global (or per-image local) color table and the
# spec's variable-code-width LZW (GIF89a Appendix F): codes start at
# min_code_size+1 bits, the table resets on CLEAR, and the code width
# grows as the table fills, capped at 12 bits.


def _lzw_encode(indices: "np.ndarray", min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    buf = b""
    for k in indices.tobytes():
        cand = buf + bytes([k])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        buf = bytes([k])
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    # LSB-first bit reader over the concatenated sub-block payload
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    pos = 0
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    out = bytearray()
    n = len(bits)
    while pos + code_size <= n:
        code = 0
        for i in range(code_size):
            code |= int(bits[pos + i]) << i
        pos += code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    return bytes(out)


def encode_gif(pixels: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB -> single-frame GIF89a with a global color
    table. The image must have <= 256 distinct colors (quantization is a
    modelling choice that belongs to the caller, not the codec)."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 colors, image has {len(palette)}")
    gct_exp = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    gct = np.zeros((1 << gct_exp, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    mcs = max(2, gct_exp)
    lzw = _lzw_encode(indices.astype(np.uint8), mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | (gct_exp - 1), 0, 0)
    out += gct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> "np.ndarray":
    """First frame of a GIF87a/89a -> (h, w, 3) uint8 RGB. Extension
    blocks are skipped; local color tables override the global one;
    interlaced images raise NotImplementedError."""
    if payload is None or payload[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    lw, lh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 1 << ((ipacked & 0x07) + 1)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        if ct is None:
            raise ValueError("GIF image with no color table")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(data), mcs), dtype=np.uint8, count=w * h
        )
        if idx.max(initial=0) >= len(ct):
            raise ValueError("GIF index out of palette range")
        return ct[idx].reshape(h, w, 3)
    raise ValueError("GIF contains no image block")


# ----------------------------------------------- universal dispatcher

_FORMAT_MAGIC = (
    ("ppm", b"P6"),
    ("png", b"\x89PNG\r\n\x1a\n"),
    ("jpeg", b"\xff\xd8"),
    ("gif", b"GIF8"),
    ("bmp", b"BM"),
)


def sniff_image_format(payload: bytes) -> str:
    """Magic-byte format sniff; raises ValueError on unknown payloads."""
    if payload:
        for name, magic in _FORMAT_MAGIC:
            if payload.startswith(magic):
                return name
    raise ValueError("unrecognized image payload")


def decode_image(payload: bytes) -> "np.ndarray":
    """Format-blind decode: sniff the magic bytes, route to the matching
    in-repo codec, return (h, w, 3) uint8 regardless of format."""
    from mariadb_cdc_spark.functions import jpeg as _jpeg
    from mariadb_cdc_spark.functions import multimodal as _mm

    fmt = sniff_image_format(payload)
    if fmt == "ppm":
        return _mm.decode_ppm(payload)
    if fmt == "png":
        return _mm.decode_png(payload)
    if fmt == "jpeg":
        return _jpeg.decode_jpeg(payload)
    if fmt == "gif":
        return decode_gif(payload)
    return decode_bmp(payload)


# ------------------------------------------------- Spark-side plumbing


def synthesize_mixed_media(docs):
    """Deterministic MIXED-FORMAT media table: doc_id % 5 picks the
    container (ppm/png/jpeg/gif/bmp), all five carrying the same
    closed-form solid-color image, so one oracle covers every codec and
    the dispatcher. mapInPandas over a parallelism-spread id projection
    (see multimodal._spread_ids)."""
    from collections.abc import Iterator

    import pandas as pd

    from mariadb_cdc_spark.functions.jpeg import encode_jpeg
    from mariadb_cdc_spark.functions.multimodal import (
        _spread_ids,
        encode_png,
        encode_ppm,
    )

    encoders = [encode_ppm, encode_png, encode_jpeg, encode_gif, encode_bmp]

    def _fn(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 8 + d % 24
                h = 8 + (d * 3) % 16
                rgb = np.array(
                    [d % 256, (d * 7) % 256, (d * 13) % 256], dtype=np.uint8
                )
                px = np.ascontiguousarray(np.broadcast_to(rgb, (h, w, 3)))
                out.append((d, encoders[d % 5](px)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return _spread_ids(docs).mapInPandas(
        _fn, "media_id long, payload binary"
    )


MIXED_STATS_SCHEMA = (
    "media_id long, fmt string, width int, height int, n_pixels int,"
    " color_ok boolean"
)


def mixed_image_stats(media, jpeg_tol: int = 8):
    """Format-blind decode of a mixed-format payload column via
    `decode_image`, emitting per-image dims plus `color_ok` — whether
    the decoded pixels match the closed-form expected color (exactly
    for the lossless codecs, within `jpeg_tol` levels for JPEG).
    Corrupt/unsupported payloads emit a null-feature row."""
    from collections.abc import Iterator

    import pandas as pd

    from mariadb_cdc_spark.functions.multimodal import _DECODE_ERRORS

    def _fn(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                try:
                    fmt = sniff_image_format(payload)
                    px = decode_image(payload)
                except _DECODE_ERRORS:
                    rows.append((mid, None, None, None, None, None))
                    continue
                h, w, _ = px.shape
                want = np.array(
                    [mid % 256, (mid * 7) % 256, (mid * 13) % 256], dtype=int
                )
                err = int(np.abs(px.astype(int) - want).max())
                tol = jpeg_tol if fmt == "jpeg" else 0
                rows.append((mid, fmt, w, h, w * h, err <= tol))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "fmt", "width", "height", "n_pixels",
                         "color_ok"],
            )

    return media.select("media_id", "payload").mapInPandas(
        _fn, MIXED_STATS_SCHEMA
    )
