"""REAL PNG codec: hand-computed unfilter pins, roundtrip across all
filters/channel layouts, honest rejections, front-door integration, and
the hash-checkable formula-oracle parity."""

import struct
import zlib

import duckdb
import numpy as np
import pytest

from bullet_storm_spark.operators import png as P


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png(w, h, depth, color, interlace, raw) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_unfilter_hand_computed():
    # 2x3 grayscale, hand-walked through each filter type:
    # row0 filter 1 (Sub):  bytes 10, 5, 5  -> 10, 15, 20
    # row1 filter 2 (Up):   bytes 1, 2, 3   -> 11, 17, 23
    raw = bytes([1, 10, 5, 5]) + bytes([2, 1, 2, 3])
    img = P.decode_png(_png(3, 2, 8, 0, 0, raw))
    assert img[:, :, 0].tolist() == [[10, 15, 20], [11, 17, 23]]
    # Average: row0 f3 bytes 10, 10 -> 10, (10 + 10//2)=15;
    # row1 f3 bytes 4, 6 -> 4 + (0+10)//2 = 9, 6 + (9+15)//2 = 18
    raw = bytes([3, 10, 10]) + bytes([3, 4, 6])
    img = P.decode_png(_png(2, 2, 8, 0, 0, raw))
    assert img[:, :, 0].tolist() == [[10, 15], [9, 18]]
    # Paeth row over known predecessors: prev = [9, 18]; row f4 bytes
    # 1, 2: px0 paeth(0,9,0)=9 -> 10; px1 paeth(10,18,9): p=19,
    # pa=9, pb=1, pc=10 -> b=18 -> 20
    raw = bytes([3, 10, 10]) + bytes([3, 4, 6]) + bytes([4, 1, 2])
    img = P.decode_png(_png(2, 3, 8, 0, 0, raw))
    assert img[2, :, 0].tolist() == [10, 20]


def test_roundtrip_all_filters_and_channels():
    rng = np.random.RandomState(11)
    for nch in (1, 2, 3, 4):
        img = rng.randint(0, 256, size=(9, 7, nch)).astype(np.uint8)
        for filters in ([0], [1], [2], [3], [4], [2, 4, 1, 3, 0]):
            got = P.decode_png(P.encode_png(img, filters))
            assert (got == img).all(), (nch, filters)


def test_honest_rejections():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = P.encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"NOPE" + good[4:])
    with pytest.raises(ValueError, match="CRC"):
        bad = bytearray(good)
        bad[20] ^= 0xFF  # flip a byte inside IHDR data
        P.decode_png(bytes(bad))
    raw = bytes([0] + [0] * 4)
    with pytest.raises(ValueError, match="bit depth"):
        P.decode_png(_png(4, 1, 16, 0, 0, zlib.decompress(zlib.compress(raw)) and raw))
    with pytest.raises(ValueError, match="palette"):
        P.decode_png(_png(4, 1, 8, 3, 0, raw))
    with pytest.raises(ValueError, match="interlaced"):
        P.decode_png(_png(4, 1, 8, 0, 1, raw))
    with pytest.raises(ValueError, match="filter type"):
        P.decode_png(_png(4, 1, 8, 0, 0, bytes([9, 0, 0, 0, 0])))
    with pytest.raises(ValueError, match="size mismatch"):
        P.decode_png(_png(4, 2, 8, 0, 0, bytes([0, 0, 0, 0, 0])))


def test_front_door_decodes_png_for_real(spark):
    from bullet_storm_spark.operators import multimodal as mm

    ids = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    payloads = P.synthesize_png(ids, "doc_id")
    out = {r.id: r for r in mm.decode_image_real(payloads).collect()}
    for i in range(6):
        w, h = P._png_dims(i)
        r = out[i]
        assert r.decode_ok is True and (r.width, r.height) == (w, h), i
        assert r.channels == 3


def test_formula_oracle_parity(spark):
    sdf = P.decode_png_features(
        P.synthesize_png(
            spark.range(0, 30).withColumnRenamed("id", "doc_id"), "doc_id"
        )
    )
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT UNNEST(range(30)) AS doc_id")
    drows = sorted(
        con.sql(P.png_features_oracle_sql("documents", "doc_id", 30)).fetchall()
    )
    assert srows == drows
