"""ISO-BMFF (MP4/MOV) container probe — REAL video-container metadata.

The video story so far is `multimodal.sample_frames` (payload byte
slicing — honest plumbing, no parsing). This module adds the real
container walk a curation pipeline needs BEFORE scheduling any frame
decode: the ISO base-media file format (ISO/IEC 14496-12) is pure
length-prefixed box structure — ``[size:4][type:4]`` with 64-bit
largesize and to-end-of-file escapes — and the duration/track facts
live in fixed-layout full boxes (``mvhd`` timescale+duration,
``tkhd`` 16.16-fixed width/height, ``hdlr`` handler type). No codec
tables, no entropy coding: arithmetic only, same posture as the
MP3/ADTS probes.

- :func:`parse_mp4` — top-level box walk (ftyp brand, total boxes),
  recursive moov walk (mvhd v0/v1, per-trak tkhd + hdlr), truncation
  detection. Sample DECODING (H.264 et al.) stays out of scope with
  the compressed-audio closure — this is the container, which is
  fully parseable.
- :func:`mp4_probe` — Arrow-batched operator over (id, payload).
- :func:`synthesize_mp4` — deterministic minimal-but-valid fixtures
  (ftyp + moov(mvhd + N x trak(tkhd + mdia(hdlr))) + mdat), varied
  brands/timescales/durations/track layouts/dimensions per id, with
  the 64-bit mvhd path exercised on every third id.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the box sequence in
    b[start:end]; raises ValueError on malformed sizes."""
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack(">I", b[off : off + 4])
        btype = b[off + 4 : off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("truncated largesize header")
            (size,) = struct.unpack(">Q", b[off + 8 : off + 16])
            hdr = 16
        elif size == 0:
            size = end - off  # box extends to end of enclosing space
        if size < hdr or off + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, off + hdr, off + size
        off += size
    if off != end:
        raise ValueError("trailing bytes after last box")


def _parse_mvhd(b: bytes, s: int, e: int) -> tuple[int, int]:
    version = b[s]
    if version == 1:
        timescale, duration = struct.unpack(">IQ", b[s + 20 : s + 32])
    else:
        timescale, duration = struct.unpack(">II", b[s + 12 : s + 20])
    if timescale == 0:
        raise ValueError("mvhd timescale 0")
    return timescale, duration


def _parse_tkhd(b: bytes, s: int, e: int) -> tuple[int, int]:
    """ISO 14496-12 §8.3.2 layout: after version/flags(4) —
    v0: creation(4) modification(4) track_ID(4) reserved(4) duration(4)
    v1: creation(8) modification(8) track_ID(4) reserved(4) duration(8)
    then reserved(8) layer(2) alternate_group(2) volume(2) reserved(2)
    matrix(36) width(4) height(4), width/height as 16.16 fixed."""
    version = b[s]
    times = 36 if version == 1 else 24  # incl. the 4 version/flag bytes
    wh = s + times + 8 + 8 + 36
    if wh + 8 > e:
        raise ValueError("tkhd too short")
    w_fix, h_fix = struct.unpack(">II", b[wh : wh + 8])
    return w_fix >> 16, h_fix >> 16


def parse_mp4(b: bytes) -> dict:
    """One metadata row per payload: ``(parse_ok, major_brand,
    timescale, duration_ms, n_tracks, n_video, n_audio, width, height,
    n_boxes, n_bytes)`` — width/height from the FIRST video track's
    tkhd (0 if none). ``parse_ok`` is false for non-BMFF payloads,
    malformed box sizes, or a missing moov/mvhd."""
    out = {
        "parse_ok": False,
        "major_brand": None,
        "timescale": 0,
        "duration_ms": 0,
        "n_tracks": 0,
        "n_video": 0,
        "n_audio": 0,
        "width": 0,
        "height": 0,
        "n_boxes": 0,
        "n_bytes": len(b),
    }
    try:
        top = list(_boxes(b, 0, len(b)))
    except ValueError:
        return out
    if not top or top[0][0] != b"ftyp":
        return out
    out["n_boxes"] = len(top)
    out["major_brand"] = b[top[0][1] : top[0][1] + 4].decode(
        "ascii", "replace"
    )
    try:
        for btype, s, e in top:
            if btype != b"moov":
                continue
            for mtype, ms, me in _boxes(b, s, e):
                if mtype == b"mvhd":
                    ts, dur = _parse_mvhd(b, ms, me)
                    out["timescale"] = ts
                    out["duration_ms"] = dur * 1000 // ts
                elif mtype == b"trak":
                    out["n_tracks"] += 1
                    handler = None
                    dims = None
                    for ttype, tss, te in _boxes(b, ms, me):
                        if ttype == b"tkhd":
                            dims = _parse_tkhd(b, tss, te)
                        elif ttype == b"mdia":
                            for dtype, ds, de in _boxes(b, tss, te):
                                if dtype == b"hdlr":
                                    handler = b[ds + 8 : ds + 12]
                    if handler == b"vide":
                        out["n_video"] += 1
                        if dims and out["width"] == 0:
                            out["width"], out["height"] = dims
                    elif handler == b"soun":
                        out["n_audio"] += 1
        if out["timescale"]:
            out["parse_ok"] = True
    except ValueError:
        out["parse_ok"] = False
    return out


MP4_PROBE_SCHEMA = (
    "id long, parse_ok boolean, major_brand string, timescale int, "
    "duration_ms long, n_tracks int, n_video int, n_audio int, "
    "width int, height int, n_boxes int, n_bytes long"
)


def mp4_probe(payloads: DataFrame) -> DataFrame:
    """Container metadata over ``(id, payload: binary)`` — the video
    twin of `mp3_probe`/`adts_probe`, same Arrow-batched shape."""
    import pandas as pd

    cols = [
        "parse_ok", "major_brand", "timescale", "duration_ms", "n_tracks",
        "n_video", "n_audio", "width", "height", "n_boxes", "n_bytes",
    ]

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                r = parse_mp4(bytes(blob))
                rows.append([int(ident)] + [r[c] for c in cols])
            yield pd.DataFrame(rows, columns=["id"] + cols)

    return payloads.mapInPandas(probe, MP4_PROBE_SCHEMA).orderBy("id")


# --------------------------------------------------------------------------
# deterministic fixtures
# --------------------------------------------------------------------------

def _box(btype: bytes, payload: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I", 1) + btype + struct.pack(
            ">Q", 16 + len(payload)
        ) + payload
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(version: int, flags: int, body: bytes) -> bytes:
    return bytes([version]) + flags.to_bytes(3, "big") + body


def make_mp4_bytes(ident: int) -> bytes:
    """Minimal valid BMFF per id: brand/timescale/duration/track mix/
    dims vary; every third id uses the 64-bit mvhd (version 1) path and
    every fourth wraps moov in a largesize box."""
    brand = [b"isom", b"mp42", b"qt  "][ident % 3]
    timescale = [600, 1000, 90000][ident % 3]
    dur_units = (ident + 1) * timescale // 2  # (ident+1)*500 ms
    n_video = ident % 2
    n_audio = 1 + ident % 2
    w, h = 320 + 16 * (ident % 5), 240 + 16 * (ident % 3)

    ftyp = _box(b"ftyp", brand + struct.pack(">I", ident) + b"isommp42")
    if ident % 3 == 0:
        mvhd = _box(
            b"mvhd",
            _full(1, 0, struct.pack(">QQIQ", 0, 0, timescale, dur_units)
                  + bytes(80)),
        )
    else:
        mvhd = _box(
            b"mvhd",
            _full(0, 0, struct.pack(">IIII", 0, 0, timescale, dur_units)
                  + bytes(76)),
        )

    def trak(handler: bytes, tw: int, th: int) -> bytes:
        tkhd = _box(
            b"tkhd",
            # creation mod track_ID reserved duration | reserved(8)
            # layer/alt/volume/reserved(8) matrix(36) | w h (16.16)
            _full(0, 7, struct.pack(">IIIII", 0, 0, 1, 0, 0) + bytes(8)
                  + bytes(8) + bytes(36)
                  + struct.pack(">II", tw << 16, th << 16)),
        )
        hdlr = _box(b"hdlr", _full(0, 0, bytes(4) + handler + bytes(13)))
        return _box(b"trak", tkhd + _box(b"mdia", hdlr))

    traks = b"".join(trak(b"vide", w, h) for _ in range(n_video))
    traks += b"".join(trak(b"soun", 0, 0) for _ in range(n_audio))
    moov = _box(b"moov", mvhd + traks, large=(ident % 4 == 0))
    mdat = _box(b"mdat", bytes(16 + ident % 32))
    return ftyp + moov + mdat


def synthesize_mp4(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) deterministic BMFF fixtures, one per row."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = [int(x) for x in pdf["id"]]
            yield pd.DataFrame(
                {"id": ids, "payload": [make_mp4_bytes(i) for i in ids]}
            )

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        gen, "id long, payload binary"
    )
