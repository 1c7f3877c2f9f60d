"""REAL GIF codec (pure Python LZW) — the second hash-checkable codec.

GIF87a/89a is, like PNG, fully decodable from public arithmetic alone:
a fixed-layout header, a palette, and LZW-compressed index streams
with variable-width codes (GIF89a specification / ISO-adjacent W3C
publication; no normative constant tables). And like PNG it is
LOSSLESS over its indexed pixels, so the registry entry gets the
formula-oracle treatment: fixture pixels and palette are modular
formulas of (id, x, y, index), and the DuckDB twin recomputes the
exact integer channel sums without parsing a GIF byte — a
mis-stepped LZW code width or a botched interlace pass breaks the
hash.

- :func:`decode_gif` — header + logical screen descriptor, global
  color table, extension-block skipping, image descriptor (local
  palettes and interlace supported), full LZW decode (variable code
  width, clear/EOI, the KwKwK first-use case, 4096-entry cap),
  Adam-less GIF 4-pass interlace reorder. First frame only (an
  animation's later frames are counted, not composited — reported via
  ``n_images``).
- :func:`encode_gif` — a REAL LZW encoder (dictionary growth + width
  bumps, not the emit-clear-every-symbol shortcut), so fixtures
  exercise the same code paths real-world GIFs do, including KwKwK.
- :func:`synthesize_gif` / :func:`decode_gif_features` — the operator
  pair; ``gif_features_oracle_sql`` is the no-GIF-bytes DuckDB twin.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# LZW
# --------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width, next_code
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        next_code = eoi + 1

    width = min_code_size + 1
    next_code = eoi + 1
    reset()
    acc = 0
    nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if code < next_code and (code < clear or table[code]):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + [entry[0]])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out[:n_pixels]
    return out


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    codes: list[tuple[int, int]] = []  # (code, width at emit time)
    table: dict[tuple[int, ...], int] = {}

    def reset():
        nonlocal table, width, next_code
        table = {(i,): i for i in range(clear)}
        width = min_code_size + 1
        next_code = eoi + 1

    width = min_code_size + 1
    next_code = eoi + 1
    reset()
    codes.append((clear, width))
    buf: tuple[int, ...] = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        codes.append((table[buf], width))
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # GIF width bump happens when next_code EXCEEDS the width
            # capacity (encoder emits old width up to and including
            # 2^width - 1, then grows)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            codes.append((clear, width))
            reset()
        buf = (sym,)
    if buf:
        codes.append((table[buf], width))
    codes.append((eoi, width))
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list[list[int]], h: int) -> list[list[int]]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out: list[list[int]] = [None] * h  # type: ignore[list-item]
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return out


def decode_gif(b: bytes):
    """GIF bytes -> numpy uint8 (h, w, 3) of the FIRST image, plus the
    image count, as ``(pixels, n_images)``. Raises ValueError on
    malformed containers/LZW streams."""
    import numpy as np

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x7)
        gct = b[off : off + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        off += 3 * n
    first = None
    n_images = 0
    while off < len(b):
        marker = b[off]
        off += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks
            off += 1
            while off < len(b) and b[off] != 0:
                off += 1 + b[off]
            off += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected block marker 0x{marker:02x}")
        ix, iy, iw, ih, ip = struct.unpack("<HHHHB", b[off : off + 9])
        off += 9
        palette = gct
        if ip & 0x80:
            n = 2 << (ip & 0x7)
            palette = b[off : off + 3 * n]
            off += 3 * n
        if palette is None:
            raise ValueError("image with no color table")
        min_code = b[off]
        off += 1
        data = bytearray()
        while off < len(b) and b[off] != 0:
            size = b[off]
            data.extend(b[off + 1 : off + 1 + size])
            off += 1 + size
        off += 1  # block terminator
        n_images += 1
        if first is None:
            idx = _lzw_decode(min_code, bytes(data), iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("LZW stream short of the pixel count")
            rows = [idx[r * iw : (r + 1) * iw] for r in range(ih)]
            if ip & 0x40:
                rows = _deinterlace(rows, ih)
            pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
            flat = np.array(
                [i for row in rows for i in row], dtype=np.int32
            )
            if (flat >= len(pal)).any():
                raise ValueError("palette index out of range")
            first = pal[flat].reshape(ih, iw, 3)
    if first is None:
        raise ValueError("no image block")
    return first, n_images


def encode_gif(indices, palette, interlace: bool = False) -> bytes:
    """(h, w) index array + (n, 3) palette -> single-image GIF89a.
    ``interlace`` writes the 4-pass row order (decode must undo it)."""
    import numpy as np

    indices = np.asarray(indices)
    h, w = indices.shape
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    bits = max((n - 1).bit_length(), 1)
    full = 1 << bits
    pal_bytes = palette.tobytes() + bytes(3 * (full - n))
    hdr = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | ((full.bit_length() - 2) & 0x7), 0, 0
    )
    desc = b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    rows = list(range(h))
    if interlace:
        rows = [r for start, step in _INTERLACE_PASSES
                for r in range(start, h, step)]
    seq = [int(v) for r in rows for v in indices[r]]
    min_code = max(bits, 2)
    lzw = _lzw_encode(min_code, seq)
    blocks = bytearray([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return hdr + pal_bytes + desc + bytes(blocks) + b"\x3b"


# --------------------------------------------------------------------------
# operator pair with the formula oracle
# --------------------------------------------------------------------------

def _gif_dims(ident: int) -> tuple[int, int, int]:
    return 8 + ident % 9, 8 + ident % 7, 4 << (ident % 3)  # w, h, ncolors


def make_gif_bytes(ident: int) -> bytes:
    """Deterministic paletted GIF per id: index (x, y) =
    (7 id + 3 x + 11 y) mod ncolors with ncolors in {4, 8, 16};
    palette entry i = ((17 i + 11 + id) % 256, (29 i + 5 + id) % 256,
    (13 i + 7 + id) % 256); odd ids are interlaced."""
    import numpy as np

    w, h, nc = _gif_dims(ident)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    idx = (7 * ident + 3 * x + 11 * y) % nc
    i = np.arange(nc)
    palette = np.stack(
        [
            (17 * i + 11 + ident) % 256,
            (29 * i + 5 + ident) % 256,
            (13 * i + 7 + ident) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    return encode_gif(idx, palette, interlace=bool(ident % 2))


def synthesize_gif(df: DataFrame, id_col: str) -> DataFrame:
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = [int(i) for i in pdf["id"]]
            yield pd.DataFrame(
                {"id": ids, "payload": [make_gif_bytes(i) for i in ids]}
            )

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        gen, "id long, payload binary"
    )


GIF_FEATURES_SCHEMA = (
    "id long, width int, height int, n_images int, "
    "sum_r long, sum_g long, sum_b long"
)


def decode_gif_features(payloads: DataFrame) -> DataFrame:
    """REAL decode -> exact integer channel sums (hash-exact against
    `gif_features_oracle_sql`)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                img, n_images = decode_gif(bytes(blob))
                h, w, _ = img.shape
                sums = img.reshape(-1, 3).sum(axis=0, dtype="int64")
                rows.append(
                    (int(ident), w, h, n_images,
                     int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "width", "height", "n_images",
                         "sum_r", "sum_g", "sum_b"],
            )

    return payloads.mapInPandas(run, GIF_FEATURES_SCHEMA).orderBy("id")


def gif_features_oracle_sql(table: str, id_col: str, limit: int) -> str:
    """The DuckDB twin recomputes the sums from index + palette
    formulas over the (x, y) grid — LZW, sub-block framing, and the
    interlace reorder must all be exact for the hash to match (the
    reorder is sum-invariant, but a wrong ROW LENGTH or dropped pixel
    is not)."""
    return f"""
WITH ids AS (
  SELECT {id_col} AS id, 8 + {id_col} % 9 AS w, 8 + {id_col} % 7 AS h,
         4 * (2 ** ({id_col} % 3)) AS nc
  FROM {table} WHERE {id_col} < {limit}
),
px AS (
  SELECT id, w, h,
         (7 * id + 3 * x.range + 11 * y.range) % nc AS i
  FROM ids, range(17) x, range(15) y
  WHERE x.range < w AND y.range < h
)
SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(1 AS INT) AS n_images,
       CAST(SUM((17 * i + 11 + id) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((29 * i + 5 + id) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((13 * i + 7 + id) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY id, w, h ORDER BY id
"""
