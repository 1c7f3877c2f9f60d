"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decoded/feature-extracted through Arrow-batched
Pandas UDFs.

Decode status by format:

* **PCM WAV and 24-bit BMP: REAL decoders** (`decode_wav_features`,
  `decode_bmp_features`, bottom of this file) — the Python stdlib
  (`wave`, `struct`) parses these containers without any imaging/audio
  library, and the features are verified against a DuckDB twin that
  recomputes them from the payloads' closed-form generative formula
  (codec-independent oracle: a header/stride/endianness bug fails the
  hash check).
* **Baseline JPEG: REAL decoder (r9)** — ``decode_jpeg_features`` /
  ``decode_image_real`` run the in-repo pure-numpy baseline JFIF codec
  (`operators/jpeg.py`: Huffman + dequantize + IDCT + chroma upsample +
  color convert; the encoder twin synthesizes the fixtures). Pytest pins
  the decoded pixel hashes and the encode→decode error envelope.
* **Compressed audio (MP3/AAC) and PNG/H.264: decode_ok = false** —
  the honest boundary, uniform across modalities (r10: zero
  NotImplementedError left): ``decode_image_meta`` keeps a
  clearly-marked deterministic fake for generic payloads, and
  non-JPEG/BMP image containers and non-WAV audio containers report
  ``decode_ok = false`` with true byte lengths. Everything around the
  boundary — schema contract, binary handling, mapInPandas batch shape,
  partition-preserving plumbing — is real and tested, so swapping in a
  decoder is a one-function change.

Scale notes: binary payloads ride the scan as ordinary columns (parquet
keeps them row-grouped; column pruning drops them when untouched);
mapInPandas streams Arrow batches so peak memory is one batch of images,
not one partition; per-file parallelism is Spark's normal input split.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

DECODE_SCHEMA = (
    "id long, width int, height int, channels int, n_bytes long, decode_ok boolean"
)


def spread_ids(df: DataFrame, id_col: str) -> DataFrame:
    """Id-only frame, hash-distributed to the session's full width — the
    front door for EXPENSIVE payload synthesis (the full JPEG encode).
    A single-file parquet scan is one task, so a codec mapInPandas
    placed directly on it runs the whole corpus through ONE Python
    worker; repartitioning the ids (8 bytes/row — never the payloads,
    which are GENERATED after the shuffle) feeds the codec at full
    parallelism at any input partitioning. Deterministic hash on the id
    (safe under task retry); REPARTITION_BY_NUM, so AQE never coalesces
    the byte-cheap but compute-heavy stage back to one task.

    Deliberately NOT applied to the cheap synthesizers (WAV/BMP headers,
    PNG/GIF/MP3/ADTS/MP4 fixtures): measured at sf0.1, the exchange +
    32-task scheduling overhead costs more than their whole single-task
    codec pass (e.g. wav_decode 0.88 s -> 1.43 s, mp3_probe 0.49 s ->
    1.10 s), while the real JPEG codec wins 3.27 s -> 1.77 s. The
    boundary is per-row codec cost, not format."""
    return df.select(F.col(id_col).alias("id")).repartition(
        df.sparkSession.sparkContext.defaultParallelism, "id"
    )


def with_payload(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Attach an opaque binary payload + typed metadata. In the synthetic
    tables the 'media' is the UTF-8 text bytes; with real data this is the
    image/audio bytes column straight from parquet."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(content_col), "UTF-8").alias("payload"),
        F.length(F.encode(F.col(content_col), "UTF-8")).alias("byte_len"),
        F.sha2(F.col(content_col), 256).alias("sha"),
    )


def payload_meta_sql(table: str, id_col: str, content_col: str) -> str:
    """DuckDB twin of with_payload's metadata (payload bytes themselves are
    compared via sha, not raw)."""
    return f"""
SELECT {id_col} AS id,
       octet_length(encode({content_col})) AS byte_len,
       sha256({content_col}) AS sha
FROM {table}
ORDER BY id
"""


def decode_image_meta(payloads: DataFrame) -> DataFrame:
    """DETERMINISTIC FAKE decode (see module docstring): metadata is a pure
    function of the payload bytes so tests and reruns agree everywhere.
    Exercises the real plumbing: binary column -> Arrow batch -> pandas ->
    typed struct rows."""
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.map(len)
            first = payload.map(lambda b: b[0] if len(b) else 0)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": (first % 64 + 1).astype("int32"),
                    "height": (n_bytes % 64 + 1).astype("int32"),
                    "channels": 3,
                    "n_bytes": n_bytes.astype("int64"),
                    "decode_ok": True,
                }
            )

    return payloads.mapInPandas(decode, DECODE_SCHEMA)


def decode_meta_sql(table: str, id_col: str, content_col: str) -> str:
    """DuckDB twin of with_payload + decode_image_meta: the fake decode is
    a pure function of the payload bytes (first byte, byte length), so the
    mapInPandas plumbing is oracle-checkable end-to-end. First byte comes
    from the hex rendering of the UTF-8 blob (ascii() would give a code
    POINT, not a byte, for multibyte leaders)."""
    n_bytes = f"octet_length(encode({content_col}))"
    first = (
        f"CASE WHEN {n_bytes} = 0 THEN 0 "
        f"ELSE ('0x' || substr(hex(encode({content_col})), 1, 2))::INTEGER END"
    )
    return f"""
SELECT {id_col} AS id,
       CAST({first} % 64 + 1 AS INTEGER) AS width,
       CAST({n_bytes} % 64 + 1 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST({n_bytes} AS BIGINT) AS n_bytes,
       TRUE AS decode_ok
FROM {table}
ORDER BY id
"""


def decode_image_real(payloads: DataFrame) -> DataFrame:
    """REAL image decode: JPEG payloads (FFD8 magic) go through the
    in-repo numpy baseline codec (operators/jpeg.py — Huffman +
    dequantize + IDCT + color convert, r9); BMP payloads through
    :func:`_parse_bmp`; PNG payloads (r11) through the in-repo
    `operators/png.py` codec (chunk walk + zlib inflate + all five
    scanline filters — lossless, so the PNG entry is hash-checkable
    against a formula oracle). Returns the DECODE_SCHEMA shape with
    true dimensions from the decoded pixels. Remaining formats (H.264,
    paletted/interlaced/16-bit PNG) emit ``decode_ok = false`` — the
    honest boundary, now three codecs smaller."""
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bullet_storm_spark.operators.jpeg import decode_jpeg
        from bullet_storm_spark.operators.png import decode_png

        for pdf in batches:
            rows = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                b = bytes(blob)
                try:
                    if b[:2] == b"\xff\xd8":
                        img = decode_jpeg(b)
                    elif b[:2] == b"BM":
                        img = _parse_bmp(b)
                    elif b[:8] == b"\x89PNG\r\n\x1a\n":
                        img = decode_png(b)
                    elif b[:6] in (b"GIF87a", b"GIF89a"):
                        from bullet_storm_spark.operators.gif import (
                            decode_gif,
                        )

                        img, _ = decode_gif(b)
                    else:
                        raise ValueError("unsupported container")
                    h, w = img.shape[:2]
                    nch = img.shape[2] if img.ndim == 3 else 1
                    rows.append((int(ident), w, h, nch, len(b), True))
                except Exception:
                    rows.append((int(ident), 0, 0, 0, len(b), False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "channels", "n_bytes", "decode_ok",
                ],
            )

    return payloads.mapInPandas(decode, DECODE_SCHEMA).orderBy("id")


def decode_audio_real(payloads: DataFrame) -> DataFrame:
    """Audio decode front door, mirroring :func:`decode_image_real`'s
    honest-boundary contract: PCM WAV payloads decode for REAL
    (:func:`decode_wav_features` — stdlib RIFF parse + integer-exact
    features) and compressed containers (MP3 frame sync / ADTS AAC /
    anything else) report ``decode_ok = false`` with true byte lengths
    — a truthful row, never an exception (a faithful MPEG synthesis
    filterbank needs the spec's NORMATIVE coefficient tables — the
    512-entry Annex B synthesis window has no closed form — so sample
    synthesis for MP3/AAC is permanently closed; COVERAGE.md records
    the decision). Frame-level MP3 METADATA decodes for real via
    `operators.mpeg_audio.mp3_probe` (duration, rate, mode, CBR/VBR,
    truncation — the curation-time needs). Output: WAV_SCHEMA."""
    return decode_wav_features(payloads)


def sample_frames(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Video' frame sampling as pure column expressions: slice the payload
    into n_frames byte-ranges (uniform stride), one output row per frame.
    Output: (id, frame_idx, frame_bytes, frame_len)."""
    total = F.length("payload")
    frame_len = F.greatest((total / n_frames).cast("int"), F.lit(1))
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(
                F.col("payload"), (i * frame_len + 1).cast("int"), frame_len
            ).alias("frame_bytes"),
        ),
    )
    return (
        payloads.select("id", F.explode(frames).alias("f"))
        .select(
            "id",
            F.col("f.frame_idx").alias("frame_idx"),
            F.col("f.frame_bytes").alias("frame_bytes"),
            F.length(F.col("f.frame_bytes")).alias("frame_len"),
        )
        .where(F.col("frame_len") > 0)
    )


FEATURE_SCHEMA = "id long, n_bytes long, features array<int>, top_nibble int"


def extract_features(payloads: DataFrame) -> DataFrame:
    """Content-based feature extraction over the binary payload — REAL
    computation (unlike the decode stub): a 16-bin histogram of the
    high nibble of every byte, the cheapest content signature that is
    meaningful for any modality (byte-distribution features separate
    text/compressed/structured payloads). Output: ``(id, n_bytes,
    features, top_nibble)`` with INTEGER counts (no normalization, so the
    result is hash-exact against the SQL twin — a rounded ratio could tie
    at the rounding grid and split between HALF_UP and half-even
    engines). ``top_nibble`` is the argmax bin, ties to the lowest index.

    This is the mapInPandas shape a real extractor (CLIP embedding, mel
    spectrogram) drops into: binary column -> Arrow batch -> numpy ->
    fixed-width vector rows; peak memory is one Arrow batch of payloads
    per task regardless of partition size."""
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, tops, sizes = [], [], []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                counts = np.bincount(arr >> 4, minlength=16).astype("int64")
                feats.append([int(x) for x in counts])
                tops.append(int(np.argmax(counts)))
                sizes.append(len(arr))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "features": feats,
                    "top_nibble": pd.Series(tops, dtype="int32"),
                }
            )

    return payloads.mapInPandas(extract, FEATURE_SCHEMA)


def extract_features_sql(table: str, id_col: str, content_col: str) -> str:
    """DuckDB twin: the high nibble of byte i is the hex digit at position
    2i-1 of the blob's hex rendering, so the histogram is 16 filtered
    counts over that character list — integer-exact parity with the
    numpy path."""
    digits = "0123456789ABCDEF"
    counts = ", ".join(
        f"len(list_filter(nibs, c -> c = '{d}'))::INTEGER" for d in digits
    )
    # hex(encode(..)) binds ONCE per row in __x — inlining it into the
    # per-element lambda would re-render the full 2n-char hex string for
    # each of the n nibbles (DuckDB does not hoist loop-invariant lambda
    # subexpressions), making the twin O(n^2) per row
    return f"""
WITH __x AS (
  SELECT {id_col} AS id, octet_length(encode({content_col}))::BIGINT AS n_bytes,
         hex(encode({content_col})) AS hx
  FROM {table}
), __p AS (
  SELECT id, n_bytes,
         list_transform(range(1, n_bytes + 1), i -> substr(hx, 2*i - 1, 1))
           AS nibs
  FROM __x
), __h AS (
  SELECT id, n_bytes, [{counts}] AS features FROM __p
)
SELECT id, n_bytes, features,
       CAST(list_position(features, list_max(features)) - 1 AS INTEGER)
         AS top_nibble
FROM __h ORDER BY id
"""


# ---------------------------------------------------------------------------
# REAL decoders — formats the Python stdlib can decode without any
# imaging/audio library: PCM WAV (`wave` + numpy) and 24-bit BMP
# (`struct` + numpy). The synthetic payloads are REAL container bytes
# built from a closed-form sample/pixel formula, so the DuckDB twin can
# recompute the expected features independently of the codec: if the
# decoder misparses headers, padding, row order, or sample width, the
# hash check fails. This closes the decode gap for stdlib-decodable
# formats; JPEG decodes for real via the in-repo codec (r9), and the
# remaining exotic codecs (MP3/AAC/PNG/H.264) report decode_ok = false
# through the decode_image_real / decode_audio_real front doors.
# ---------------------------------------------------------------------------

WAV_SCHEMA = (
    "id long, sample_rate int, n_channels int, n_samples long, "
    "sum_sq long, peak int, zero_crossings long, decode_ok boolean"
)
BMP_SCHEMA = (
    "id long, width int, height int, n_pixels long, "
    "sum_r long, sum_g long, sum_b long, decode_ok boolean"
)

_WAV_SR = 8000


def _wav_samples(ident: int):
    """Closed-form int16 waveform for id: length 400 + id % 600, sample
    s_t = ((id*131 + t*65) % 2003) - 1001. Shared by the synthesizer and
    (re-expressed in SQL) the oracle twin."""
    import numpy as np

    n = 400 + ident % 600
    t = np.arange(n, dtype=np.int64)
    return (((ident * 131 + t * 65) % 2003) - 1001).astype(np.int16)


def synthesize_wav(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) — REAL RIFF/WAVE PCM bytes (stdlib `wave` writer),
    mono 16-bit at 8 kHz, waveform a pure function of id."""
    import io
    import wave as wavmod

    import pandas as pd

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for ident in pdf["id"]:
                buf = io.BytesIO()
                with wavmod.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(_WAV_SR)
                    w.writeframes(_wav_samples(int(ident)).tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"id": pdf["id"], "payload": payloads})

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        synth, "id long, payload binary"
    )


def decode_wav_features(payloads: DataFrame) -> DataFrame:
    """REAL WAV decode (stdlib `wave` parses the RIFF container) +
    integer-exact audio features: energy (sum of squared samples), peak
    amplitude, zero-crossing count. All-integer outputs so the SQL twin
    hashes exactly.

    Multi-channel WAVs are de-interleaved: ``n_samples`` counts ALL
    samples (frames x channels, the energy/peak domain), while
    ``zero_crossings`` is computed per channel and summed — a sign flip
    across a frame boundary between two different channels is not a
    crossing."""
    import io
    import wave as wavmod

    import numpy as np
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                try:
                    with wavmod.open(io.BytesIO(bytes(blob)), "rb") as w:
                        sr = w.getframerate()
                        nch = w.getnchannels()
                        nfr = w.getnframes()
                        raw = w.readframes(nfr)
                    s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                    # de-interleave: column j = channel j's sample series
                    ch = s.reshape(-1, nch) if nch > 1 else s.reshape(-1, 1)
                    rows.append(
                        (
                            int(ident), sr, nch, len(s),
                            int((s * s).sum()),
                            int(np.abs(s).max()) if len(s) else 0,
                            int(((ch[:-1] * ch[1:]) < 0).sum()),
                            True,
                        )
                    )
                except Exception:
                    rows.append((int(ident), 0, 0, 0, 0, 0, 0, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "sample_rate", "n_channels", "n_samples",
                    "sum_sq", "peak", "zero_crossings", "decode_ok",
                ],
            )

    return payloads.mapInPandas(decode, WAV_SCHEMA).orderBy("id")


def wav_features_sql(table: str, id_col: str) -> str:
    """DuckDB twin: recompute the closed-form waveform per id and
    aggregate the same integer features — fully independent of the WAV
    container parsing on the Spark side."""
    return f"""
WITH ids AS (
  SELECT {id_col} AS id, 400 + {id_col} % 600 AS n FROM {table}
), smp AS (
  SELECT id, n, t, ((id * 131 + t * 65) % 2003) - 1001 AS s
  FROM (SELECT id, n, unnest(range(0, n)) AS t FROM ids)
), nxt AS (
  SELECT id, n, s,
         LEAD(s) OVER (PARTITION BY id ORDER BY t) AS s2
  FROM smp
)
SELECT id, {_WAV_SR} AS sample_rate, 1 AS n_channels,
       COUNT(*)::BIGINT AS n_samples,
       SUM(s * s)::BIGINT AS sum_sq,
       MAX(ABS(s))::INTEGER AS peak,
       SUM(CASE WHEN s * s2 < 0 THEN 1 ELSE 0 END)::BIGINT AS zero_crossings,
       TRUE AS decode_ok
FROM nxt GROUP BY id ORDER BY id
"""


def _bmp_dims(ident: int) -> tuple[int, int]:
    return 8 + ident % 9, 8 + (ident // 7) % 9


def synthesize_bmp(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) — REAL 24-bit uncompressed BMP bytes (54-byte
    BITMAPFILEHEADER + BITMAPINFOHEADER, BGR pixel order, 4-byte padded
    rows, bottom-up), pixel (x, y, c) = (id + 3x + 7y + 11c) % 256."""
    import struct

    import numpy as np
    import pandas as pd

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for ident_ in pdf["id"]:
                ident = int(ident_)
                w, h = _bmp_dims(ident)
                x = np.arange(w, dtype=np.int64)[None, :, None]
                y = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(3, dtype=np.int64)[None, None, :]  # 0=R,1=G,2=B
                px = ((ident + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
                bgr = px[:, :, ::-1]  # BMP stores BGR
                row_len = w * 3
                pad = (-row_len) % 4
                rows = []
                for yy in range(h - 1, -1, -1):  # bottom-up
                    rows.append(bgr[yy].tobytes() + b"\x00" * pad)
                pixel_data = b"".join(rows)
                off = 54
                size = off + len(pixel_data)
                header = struct.pack(
                    "<2sIHHI", b"BM", size, 0, 0, off
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                    2835, 2835, 0, 0,
                )
                payloads.append(header + pixel_data)
            yield pd.DataFrame({"id": pdf["id"], "payload": payloads})

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        synth, "id long, payload binary"
    )


def decode_bmp_features(payloads: DataFrame) -> DataFrame:
    """REAL BMP decode via the shared :func:`_parse_bmp` parser (headers
    with `struct`, de-padded bottom-up BGR rows with numpy — ONE parser
    for the feature, resize, and dhash paths, so a container-handling
    fix can never diverge between them), emitting integer channel sums.
    A wrong stride, row order, or channel order changes the sums and
    fails the hash check."""
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                try:
                    img = _parse_bmp(bytes(blob))
                    h, w = img.shape[:2]
                    rows.append(
                        (
                            int(ident), w, h, w * h,
                            int(img[:, :, 0].sum()),
                            int(img[:, :, 1].sum()),
                            int(img[:, :, 2].sum()),
                            True,
                        )
                    )
                except Exception:
                    rows.append((int(ident), 0, 0, 0, 0, 0, 0, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "n_pixels",
                    "sum_r", "sum_g", "sum_b", "decode_ok",
                ],
            )

    return payloads.mapInPandas(decode, BMP_SCHEMA).orderBy("id")


def bmp_features_sql(table: str, id_col: str) -> str:
    """DuckDB twin: channel sums from the pixel formula over the (x, y)
    grid — independent of the BMP container bytes."""
    sums = ", ".join(
        f"SUM((id + 3 * x + 7 * y + {11 * c}) % 256)::BIGINT AS sum_{ch}"
        for c, ch in ((0, "r"), (1, "g"), (2, "b"))
    )
    return f"""
WITH ids AS (
  SELECT {id_col} AS id, 8 + {id_col} % 9 AS w, 8 + ({id_col} // 7) % 9 AS h
  FROM {table}
), grid AS (
  SELECT id, w, h, x, unnest(range(0, h)) AS y
  FROM (SELECT id, w, h, unnest(range(0, w)) AS x FROM ids)
)
SELECT id, MIN(w)::INTEGER AS width, MIN(h)::INTEGER AS height,
       COUNT(*)::BIGINT AS n_pixels, {sums}, TRUE AS decode_ok
FROM grid GROUP BY id ORDER BY id
"""


# --- real image resize + perceptual hash ---------------------------------

RESIZE_SCHEMA = (
    "id long, out_x long, out_y long, n_px long, sum_gray long, "
    "mean_gray double"
)


def _parse_bmp(b: bytes):
    """Shared 24-bit BMP parser (the decode_bmp_features logic, factored
    for reuse): returns an (h, w, 3) RGB int64 array, top-down."""
    import struct

    import numpy as np

    magic, _sz, _r1, _r2, off = struct.unpack_from("<2sIHHI", b, 0)
    assert magic == b"BM"
    (_hsz, w, h, _planes, bpp) = struct.unpack_from("<IiiHH", b, 14)
    assert bpp == 24 and h > 0
    row_len = w * 3
    stride = row_len + ((-row_len) % 4)
    img = np.zeros((h, w, 3), dtype=np.int64)
    for yy in range(h):
        start = off + yy * stride
        row = np.frombuffer(b[start : start + row_len], dtype=np.uint8).reshape(
            w, 3
        )
        img[h - 1 - yy] = row[:, ::-1]  # BGR -> RGB, un-flip
    return img


def resize_bmp(
    payloads: DataFrame, out_w: int = 8, out_h: int = 8, round_to: int = 6
) -> DataFrame:
    """REAL image resize: decode the BMP container, box-average onto an
    ``(out_w, out_h)`` grid with the floor mapping
    ``cell_x = x * out_w // w`` (every input pixel lands in exactly one
    output cell, so the reduction is an exact integer aggregation — no
    interpolation-kernel float soup to diverge between engines). One
    output row per cell: ``(id, out_x, out_y, n_px, sum_gray,
    mean_gray)`` with gray = r+g+b (integer, divide-free) and mean the
    single rounded division.

    This is the resize stage the brief's multimodal pipeline calls for —
    Arrow-batched mapInPandas over binary payloads, numpy bincount for
    the box sums, output fan-out a fixed out_w*out_h per image. The
    DuckDB twin recomputes the same cells from the synthesis pixel
    formula (codec-independent, like the decode oracles): a wrong
    stride, row order, channel order, or box mapping in the REAL decode
    path shifts integer sums and fails the hash."""
    import pandas as pd
    import numpy as np

    ow, oh, rt = int(out_w), int(out_h), int(round_to)

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                try:
                    img = _parse_bmp(bytes(blob))
                except Exception:
                    continue  # undecodable: contributes no cells
                h, w = img.shape[:2]
                gray = img.sum(axis=2)
                cx = np.arange(w, dtype=np.int64) * ow // w
                cy = np.arange(h, dtype=np.int64) * oh // h
                cell = (cy[:, None] * ow + cx[None, :]).ravel()
                sums = np.bincount(cell, weights=gray.ravel(), minlength=ow * oh)
                cnts = np.bincount(cell, minlength=ow * oh)
                for k in range(ow * oh):
                    n = int(cnts[k])
                    if n == 0:
                        continue
                    s = int(sums[k])
                    recs.append(
                        (int(ident), k % ow, k // ow, n, s, round(s / n, rt))
                    )
            yield pd.DataFrame(
                recs,
                columns=["id", "out_x", "out_y", "n_px", "sum_gray", "mean_gray"],
            )

    return payloads.mapInPandas(rz, RESIZE_SCHEMA).orderBy("id", "out_y", "out_x")


def _resize_cells_sql(table: str, id_col: str, out_w: int, out_h: int) -> str:
    """Shared cells CTE: the synthesis pixel formula box-averaged onto the
    (out_w, out_h) grid — the codec-independent twin of resize_bmp."""
    gray = (
        "((id + 3 * x + 7 * y) % 256 + (id + 3 * x + 7 * y + 11) % 256"
        " + (id + 3 * x + 7 * y + 22) % 256)"
    )
    return f"""
ids AS (
  SELECT {id_col} AS id, 8 + {id_col} % 9 AS w, 8 + ({id_col} // 7) % 9 AS h
  FROM {table}
), grid AS (
  SELECT id, w, h, x, unnest(range(0, h)) AS y
  FROM (SELECT id, w, h, unnest(range(0, w)) AS x FROM ids)
), cells AS (
  SELECT id, (x * {int(out_w)}) // w AS out_x, (y * {int(out_h)}) // h AS out_y,
         CAST(COUNT(*) AS BIGINT) AS n_px,
         CAST(SUM({gray}) AS BIGINT) AS sum_gray
  FROM grid GROUP BY id, (x * {int(out_w)}) // w, (y * {int(out_h)}) // h
)"""


def resize_bmp_sql(
    table: str, id_col: str, out_w: int = 8, out_h: int = 8, round_to: int = 6
) -> str:
    return f"""
WITH {_resize_cells_sql(table, id_col, out_w, out_h)}
SELECT id, out_x, out_y, n_px, sum_gray,
       CASE WHEN ABS(sum_gray / n_px) >= 1e16 THEN CAST((sum_gray / n_px) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((sum_gray / n_px) * CAST(ABS(sum_gray / n_px) >= POWER(10.0, -({int(round_to)}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{int(round_to)})) AS VARCHAR) AS DOUBLE) END AS mean_gray
FROM cells ORDER BY id, out_y, out_x
"""


def dhash_bmp(payloads: DataFrame, round_to: int = 6) -> DataFrame:
    """Perceptual difference-hash over the REAL decode path: box-average
    to an 8x8 gray grid (resize_bmp's mapping), then one bit per
    horizontal neighbor pair — ``mean(x+1, y) > mean(x, y)`` for x in
    0..6, y in 0..7 — emitted as a 56-char '0'/'1' string in (y, x)
    order. The classic dHash uses a 9x8 grid; 8x8-with-7-diffs keeps
    every cell nonempty for the smallest (8px-wide) synthesized images
    and changes nothing about the method. A bit-string (not a packed
    BIGINT) keeps the value dialect-portable and driver-hashable.

    Near-identical images (e.g. the same photo re-encoded or mildly
    cropped) collide; use the group report to collapse them the way the
    URL/content dedup passes collapse text."""
    import pandas as pd
    import numpy as np

    rt = int(round_to)

    def hsh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                try:
                    img = _parse_bmp(bytes(blob))
                except Exception:
                    ids.append(int(ident))
                    hashes.append(None)
                    continue
                h, w = img.shape[:2]
                gray = img.sum(axis=2)
                cx = np.arange(w, dtype=np.int64) * 8 // w
                cy = np.arange(h, dtype=np.int64) * 8 // h
                cell = (cy[:, None] * 8 + cx[None, :]).ravel()
                sums = np.bincount(cell, weights=gray.ravel(), minlength=64)
                cnts = np.bincount(cell, minlength=64)
                mean = np.round(sums / cnts, rt).reshape(8, 8)
                bits = (mean[:, 1:] > mean[:, :-1]).astype(int)  # (8, 7)
                ids.append(int(ident))
                hashes.append("".join(str(b) for b in bits.ravel()))
            yield pd.DataFrame({"id": ids, "dhash": hashes})

    return payloads.mapInPandas(hsh, "id long, dhash string").orderBy("id")


def dhash_bmp_sql(table: str, id_col: str, round_to: int = 6) -> str:
    return f"""
WITH {_resize_cells_sql(table, id_col, 8, 8)},
means AS (
  SELECT id, out_x, out_y,
         CASE WHEN ABS(sum_gray / n_px) >= 1e16 THEN CAST((sum_gray / n_px) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((sum_gray / n_px) * CAST(ABS(sum_gray / n_px) >= POWER(10.0, -({int(round_to)}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{int(round_to)})) AS VARCHAR) AS DOUBLE) END AS mean_gray
  FROM cells
),
bits AS (
  SELECT a.id, a.out_y, a.out_x,
         CASE WHEN b.mean_gray > a.mean_gray THEN '1' ELSE '0' END AS bit
  FROM means a JOIN means b
    ON a.id = b.id AND a.out_y = b.out_y AND b.out_x = a.out_x + 1
  WHERE a.out_x < 7
)
SELECT id, string_agg(bit, '' ORDER BY out_y, out_x) AS dhash
FROM bits GROUP BY id ORDER BY id
"""


def dhash_groups(hashes: DataFrame) -> DataFrame:
    """Perceptual duplicate groups: ``(dhash, n_images, canonical_id)``
    for hashes shared by >1 image — one hash aggregation on the 56-bit
    key, same shape as the URL dedup report."""
    return (
        hashes.where(F.col("dhash").isNotNull())
        .groupBy("dhash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("id").alias("canonical_id"),
        )
        .where(F.col("n_images") > 1)
        .orderBy("dhash", "canonical_id")
    )


def dhash_groups_sql(table: str, id_col: str, round_to: int = 6) -> str:
    inner = dhash_bmp_sql(table, id_col, round_to).strip().rstrip()
    return f"""
SELECT dhash, CAST(COUNT(*) AS BIGINT) AS n_images, MIN(id) AS canonical_id
FROM ({inner})
GROUP BY dhash HAVING COUNT(*) > 1
ORDER BY dhash, canonical_id
"""


# --- audio decimation resample -------------------------------------------

DECIMATE_SCHEMA = (
    "id long, frame_idx long, n_samples long, sum_amp long, sum_sq long, "
    "mean_amp double"
)


def decimate_wav(
    payloads: DataFrame, factor: int = 8, round_to: int = 6
) -> DataFrame:
    """REAL audio decimation over the real WAV decode path — the audio
    twin of :func:`resize_bmp`: parse the RIFF container (stdlib
    ``wave``), box-average the int16 sample stream into frames of
    ``factor`` samples (the last frame may be partial), one output row
    per frame: ``(id, frame_idx, n_samples, sum_amp, sum_sq,
    mean_amp)``. Sums are exact integers; ``mean_amp`` is the single
    rounded division — with frame sizes ≤ 8 the mean's denominator
    divides into a terminating or repeating decimal that can never land
    exactly mid-grid at 1e-6, so HALF_UP-vs-half-even rounding cannot
    diverge between engines.

    The DuckDB twin recomputes the frames from the closed-form waveform
    (codec-independent, like the decode oracles): a wrong sample width,
    endianness, or frame boundary in the REAL parser shifts the integer
    sums and fails the hash."""
    import io
    import wave as wavmod

    import numpy as np
    import pandas as pd

    fac, rt = int(factor), int(round_to)

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                try:
                    with wavmod.open(io.BytesIO(bytes(blob)), "rb") as w:
                        raw = w.readframes(w.getnframes())
                    s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                except Exception:
                    continue  # undecodable: contributes no frames
                frame = np.arange(len(s), dtype=np.int64) // fac
                nfr = int(frame[-1]) + 1 if len(s) else 0
                sums = np.bincount(frame, weights=s, minlength=nfr)
                sq = np.bincount(frame, weights=s * s, minlength=nfr)
                cnts = np.bincount(frame, minlength=nfr)
                for k in range(nfr):
                    n, sm = int(cnts[k]), int(sums[k])
                    recs.append(
                        (int(ident), k, n, sm, int(sq[k]), round(sm / n, rt))
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "id", "frame_idx", "n_samples", "sum_amp", "sum_sq",
                    "mean_amp",
                ],
            )

    return payloads.mapInPandas(dec, DECIMATE_SCHEMA).orderBy("id", "frame_idx")


def decimate_wav_sql(
    table: str, id_col: str, factor: int = 8, round_to: int = 6
) -> str:
    fac, rt = int(factor), int(round_to)
    return f"""
WITH ids AS (
  SELECT {id_col} AS id, 400 + {id_col} % 600 AS n FROM {table}
), ts AS (
  SELECT id, unnest(range(0, n)) AS t FROM ids
), s AS (
  SELECT id, t // {fac} AS frame_idx,
         ((id * 131 + t * 65) % 2003) - 1001 AS v
  FROM ts
)
SELECT id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(v) AS BIGINT) AS sum_amp,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CASE WHEN ABS(CAST(SUM(v) AS BIGINT) / CAST(COUNT(*) AS BIGINT)) >= 1e16 THEN CAST((CAST(SUM(v) AS BIGINT) / CAST(COUNT(*) AS BIGINT)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(SUM(v) AS BIGINT) / CAST(COUNT(*) AS BIGINT)) * CAST(ABS(CAST(SUM(v) AS BIGINT) / CAST(COUNT(*) AS BIGINT)) >= POWER(10.0, -({rt}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{rt})) AS VARCHAR) AS DOUBLE) END
         AS mean_amp
FROM s GROUP BY id, frame_idx ORDER BY id, frame_idx
"""


LOUDNESS_SCHEMA = (
    "id long, n_samples long, sum_sq long, sum_s long, n_clipped long, "
    "decode_ok boolean"
)


def decode_wav_loudness(
    payloads: DataFrame, clip_threshold: int = 32000, round_to: int = 9
) -> DataFrame:
    """REAL WAV decode → per-clip loudness/health report: ``(id,
    n_samples, rms, dc_offset, clip_rate, decode_ok)``.

    The audio-curation triage columns: RMS (perceived-loudness proxy —
    silent or near-silent clips waste training tokens), DC offset (a
    nonzero mean is the classic broken-recorder / bad-resample
    signature), and clip rate (share of samples at or beyond
    ``clip_threshold`` of the int16 range — hard-clipped audio
    distorts features downstream). Complements ``decode_wav_features``
    (energy/peak/zero-crossings) without touching its certified schema.

    Parity shape: the Arrow decode emits ONLY exact integers (Σs², Σs,
    clip count); the three ratios are IEEE finishes computed by BOTH
    engines from those integers — the SQL twin re-derives the integers
    from the closed-form waveform, fully independent of RIFF parsing
    (the decode_wav_features contract, multimodal.py:341). Undecodable
    payloads report decode_ok=false with NULL ratios."""
    import io
    import wave as wavmod

    import numpy as np
    import pandas as pd

    thr = int(clip_threshold)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                try:
                    with wavmod.open(io.BytesIO(bytes(blob)), "rb") as w:
                        raw = w.readframes(w.getnframes())
                    s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                    rows.append(
                        (
                            int(ident),
                            len(s),
                            int((s * s).sum()),
                            int(s.sum()),
                            int((np.abs(s) >= thr).sum()),
                            True,
                        )
                    )
                except Exception:
                    rows.append((int(ident), 0, 0, 0, 0, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "n_samples", "sum_sq", "sum_s", "n_clipped",
                    "decode_ok",
                ],
            )

    ints = payloads.mapInPandas(decode, LOUDNESS_SCHEMA)
    n_d = F.col("n_samples").cast("double")
    return ints.select(
        "id",
        "n_samples",
        F.round(
            F.sqrt(F.try_divide(F.col("sum_sq").cast("double"), n_d)), round_to
        ).alias("rms"),
        F.round(F.try_divide(F.col("sum_s").cast("double"), n_d), round_to).alias(
            "dc_offset"
        ),
        F.round(
            F.try_divide(F.col("n_clipped").cast("double"), n_d), round_to
        ).alias("clip_rate"),
        "decode_ok",
    ).orderBy("id")


def wav_loudness_sql(
    table: str, id_col: str, clip_threshold: int = 32000, round_to: int = 9
) -> str:
    return f"""
WITH ids AS (
  SELECT {id_col} AS id, 400 + {id_col} % 600 AS n FROM {table}
), smp AS (
  SELECT id, ((id * 131 + t * 65) % 2003) - 1001 AS s
  FROM (SELECT id, n, unnest(range(0, n)) AS t FROM ids)
), agg AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_samples,
         CAST(SUM(s * s) AS BIGINT) AS sum_sq,
         CAST(SUM(s) AS BIGINT) AS sum_s,
         CAST(SUM(CASE WHEN ABS(s) >= {clip_threshold} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_clipped
  FROM smp GROUP BY id
)
SELECT id, n_samples,
       CASE WHEN ABS(sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE))) >= 1e16 THEN CAST((sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE))) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE))) * CAST(ABS(sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS rms,
       CASE WHEN ABS(CAST(sum_s AS DOUBLE) / CAST(n_samples AS DOUBLE)) >= 1e16 THEN CAST((CAST(sum_s AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(sum_s AS DOUBLE) / CAST(n_samples AS DOUBLE)) * CAST(ABS(CAST(sum_s AS DOUBLE) / CAST(n_samples AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS dc_offset,
       CASE WHEN ABS(CAST(n_clipped AS DOUBLE) / CAST(n_samples AS DOUBLE)) >= 1e16 THEN CAST((CAST(n_clipped AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(n_clipped AS DOUBLE) / CAST(n_samples AS DOUBLE)) * CAST(ABS(CAST(n_clipped AS DOUBLE) / CAST(n_samples AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS clip_rate,
       TRUE AS decode_ok
FROM agg ORDER BY id
"""


# --- JPEG: REAL baseline codec (operators/jpeg.py, pure numpy) ---------------

JPEG_SCHEMA = (
    "id long, width int, height int, n_bytes long, mean_luma double, "
    "pixel_sha string, decode_ok boolean"
)


def _jpeg_pixels(ident: int):
    """Closed-form deterministic RGB test card per id (the BMP/WAV
    generative-formula discipline, but smooth — JPEG-friendly content):
    two sinusoid gradients + a diagonal ramp, id-dependent dimensions."""
    import numpy as np

    h = 24 + (ident * 5) % 17
    w = 24 + (ident * 7) % 23
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 100 * np.sin((xx + ident) / 9.0)).clip(0, 255)
    g = (128 + 100 * np.cos((yy + 2 * ident) / 7.0)).clip(0, 255)
    b = (xx + yy + ident) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def synthesize_jpeg(df: DataFrame, id_col: str, quality: int = 85) -> DataFrame:
    """(id, payload): one REAL baseline JFIF JPEG per id, encoded by the
    numpy codec — the fixture source for the decode entries (no imaging
    library exists in this environment to make them any other way)."""
    import pandas as pd

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bullet_storm_spark.operators.jpeg import encode_jpeg

        for pdf in batches:
            rows = [
                (int(i), encode_jpeg(_jpeg_pixels(int(i)), quality=quality))
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["id", "payload"])

    return spread_ids(df, id_col).mapInPandas(
        synth, "id long, payload binary"
    )


def decode_jpeg_features(payloads: DataFrame, round_to: int = 6) -> DataFrame:
    """REAL JPEG decode on the Arrow-batched path: Huffman + dequantize +
    IDCT + color convert (operators/jpeg.py), emitting per-image features
    from the DECODED pixels — ``(id, width, height, n_bytes, mean_luma,
    pixel_sha, decode_ok)``. ``pixel_sha`` is the sha256 of the raw RGB
    buffer (first 16 hex chars): any drift in the entropy decoder, IDCT,
    or upsampling changes it, which is what the pytest pixel-hash pins
    assert. Non-JPEG or non-baseline payloads emit decode_ok = false
    rows (the honest boundary: progressive/arithmetic profiles raise
    JpegFormatError inside and are reported, not faked)."""
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from bullet_storm_spark.operators.jpeg import decode_jpeg

        for pdf in batches:
            rows = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                try:
                    img = decode_jpeg(bytes(blob))
                    h, w = img.shape[:2]
                    luma = (
                        0.299 * img[..., 0].astype(np.float64)
                        + 0.587 * img[..., 1]
                        + 0.114 * img[..., 2]
                    )
                    rows.append(
                        (
                            int(ident), w, h, len(blob),
                            round(float(luma.mean()), round_to),
                            hashlib.sha256(img.tobytes()).hexdigest()[:16],
                            True,
                        )
                    )
                except Exception:
                    rows.append(
                        (int(ident), 0, 0, len(blob), 0.0, "", False)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "n_bytes",
                    "mean_luma", "pixel_sha", "decode_ok",
                ],
            )

    return payloads.mapInPandas(decode, JPEG_SCHEMA).orderBy("id")
