"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decoded/feature-extracted through Arrow-batched
Pandas UDFs.

The decode step itself is STUBBED (this container has no image/audio
libraries): ``decode_image_meta`` uses a clearly-marked deterministic fake
derived from the payload bytes, and ``decode_image_real`` raises
NotImplementedError until PIL/libvips is present. Everything around the
stub — schema contract, binary handling, mapInPandas batch shape,
partition-preserving plumbing — is real and tested, so swapping in a real
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
    """Real decode path — requires an imaging library not present in this
    environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decoding requires PIL/pillow; this environment has no "
            "imaging libraries. Use decode_image_meta (deterministic fake) "
            "for plumbing tests."
        ) from e
    raise NotImplementedError("wire PIL decode here when the library exists")


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
