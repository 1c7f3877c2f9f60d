"""REAL GIF codec: hand-decoded LZW pins, KwKwK, width-bump crossings,
interlace reorder, rejection honesty, and the formula-oracle parity."""

import struct

import duckdb
import numpy as np
import pytest

from bullet_storm_spark.operators import gif as G


def test_lzw_hand_decoded():
    # min_code 2 (clear=4, eoi=5, width starts 3). Stream: clear, 1, 2,
    # 6(=prev "1 2"... no — 6 is the FIRST add: "1"+"2"[0] = [1, 2]),
    # eoi. Pack codes 4, 1, 2, 6, 5 at width 3, LSB-first.
    codes = [4, 1, 2, 6, 5]
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 3
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    assert G._lzw_decode(2, bytes(out), 10) == [1, 2, 1, 2]


def test_lzw_kwkwk_first_use():
    # the code-equals-next_code case: stream "0 6" where 6 is not yet
    # in the table must decode as [0, 0, 0] (prev + prev[0])
    codes = [4, 0, 6, 5]
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 3
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    assert G._lzw_decode(2, bytes(out), 10) == [0, 0, 0]
    # but a code BEYOND next_code is corrupt
    codes = [4, 0, 7, 5]
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 3
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    with pytest.raises(ValueError, match="bad LZW code"):
        G._lzw_decode(2, bytes(out), 10)


def test_lzw_roundtrip_across_width_bumps():
    rng = np.random.RandomState(17)
    # 2000 symbols over 16 colors grows the dictionary through several
    # width boundaries (32/64/128/256...)
    seq = [int(v) for v in rng.randint(0, 16, 2000)]
    enc = G._lzw_encode(4, seq)
    assert G._lzw_decode(4, enc, len(seq)) == seq
    # and a low-entropy stream (dictionary-heavy, KwKwK-rich)
    seq = ([3] * 40 + [1, 3, 1] * 20) * 10
    enc = G._lzw_encode(2, seq)
    assert G._lzw_decode(2, enc, len(seq)) == seq


def test_container_roundtrip_and_interlace():
    rng = np.random.RandomState(23)
    idx = rng.randint(0, 8, size=(13, 11))
    pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
    plain, n1 = G.decode_gif(G.encode_gif(idx, pal, interlace=False))
    laced, n2 = G.decode_gif(G.encode_gif(idx, pal, interlace=True))
    assert n1 == n2 == 1
    assert (plain == pal[idx]).all()
    assert (laced == pal[idx]).all()  # the reorder must be undone


def test_rejection_honesty():
    idx = np.zeros((4, 4), dtype=int)
    pal = np.zeros((4, 3), dtype=np.uint8)
    good = G.encode_gif(idx, pal)
    with pytest.raises(ValueError, match="signature"):
        G.decode_gif(b"NOTG" + good[4:])
    with pytest.raises(ValueError, match="no image block"):
        G.decode_gif(good[:13] + bytes(12) + b"\x3b")
    # truncated LZW stream: fewer pixels than the descriptor promises
    trunc = bytearray(good)
    # zero out the data sub-block length to starve the decoder
    with pytest.raises(ValueError):
        G.decode_gif(bytes(trunc[: len(trunc) - 6]) + b"\x00\x3b")


def test_extension_blocks_are_skipped():
    idx = np.arange(16).reshape(4, 4) % 4
    pal = np.arange(12).reshape(4, 3).astype(np.uint8)
    g = G.encode_gif(idx, pal)
    # splice a graphic-control extension between the LSD+GCT and the
    # image descriptor
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = g[: 13 + 12] + ext + g[13 + 12 :]
    img, n = G.decode_gif(spliced)
    assert n == 1 and (img == pal[idx]).all()


def test_formula_oracle_parity(spark):
    sdf = G.decode_gif_features(
        G.synthesize_gif(
            spark.range(0, 30).withColumnRenamed("id", "doc_id"), "doc_id"
        )
    )
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT UNNEST(range(30)) AS doc_id")
    drows = sorted(
        con.sql(G.gif_features_oracle_sql("documents", "doc_id", 30)).fetchall()
    )
    assert srows == drows
