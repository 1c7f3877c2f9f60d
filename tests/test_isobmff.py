"""ISO-BMFF (MP4) container probe: hand-built box pins (normative
tkhd/mvhd offsets), 64-bit paths, malformed-input honesty, operator."""

import struct

from bullet_storm_spark.operators import isobmff as V


def _hand_mp4() -> bytes:
    # hand-assembled: ftyp(isom) + moov(mvhd v0 ts=1000 dur=2500 +
    # one video trak 640x480) — every offset written out longhand so
    # the test does not reuse the module's own builders
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    mvhd_body = (
        b"\x00\x00\x00\x00"                     # version 0 + flags
        + struct.pack(">II", 0, 0)               # creation, modification
        + struct.pack(">II", 1000, 2500)         # timescale, duration
        + bytes(76)
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    tkhd_body = (
        b"\x00\x00\x00\x07"
        + struct.pack(">IIIII", 0, 0, 1, 0, 0)   # times, id, resv, dur
        + bytes(8) + bytes(8) + bytes(36)        # resv, layer.., matrix
        + struct.pack(">II", 640 << 16, 480 << 16)
    )
    tkhd = struct.pack(">I", 8 + len(tkhd_body)) + b"tkhd" + tkhd_body
    hdlr_body = b"\x00\x00\x00\x00" + bytes(4) + b"vide" + bytes(13)
    hdlr = struct.pack(">I", 8 + len(hdlr_body)) + b"hdlr" + hdlr_body
    mdia = struct.pack(">I", 8 + len(hdlr)) + b"mdia" + hdlr
    trak_inner = tkhd + mdia
    trak = struct.pack(">I", 8 + len(trak_inner)) + b"trak" + trak_inner
    moov_inner = mvhd + trak
    moov = struct.pack(">I", 8 + len(moov_inner)) + b"moov" + moov_inner
    return ftyp + moov


def test_hand_built_mp4():
    r = V.parse_mp4(_hand_mp4())
    assert r["parse_ok"] is True
    assert r["major_brand"] == "isom"
    assert r["timescale"] == 1000 and r["duration_ms"] == 2500
    assert r["n_tracks"] == 1 and r["n_video"] == 1 and r["n_audio"] == 0
    assert (r["width"], r["height"]) == (640, 480)
    assert r["n_boxes"] == 2


def test_malformed_inputs_stay_honest():
    good = _hand_mp4()
    # truncated mid-moov: top-level walk fails -> parse_ok false
    assert V.parse_mp4(good[:-30])["parse_ok"] is False
    # garbage / missing ftyp
    assert V.parse_mp4(b"\x00" * 64)["parse_ok"] is False
    assert V.parse_mp4(b"")["parse_ok"] is False
    # a box claiming a size beyond its container
    bad = bytearray(good)
    bad[0:4] = struct.pack(">I", len(good) + 99)
    assert V.parse_mp4(bytes(bad))["parse_ok"] is False


def test_v1_and_largesize_paths():
    # fixture ids divisible by 12 use BOTH the 64-bit mvhd (i%3==0)
    # and the largesize moov wrapper (i%4==0)
    r = V.parse_mp4(V.make_mp4_bytes(12))
    assert r["parse_ok"] and r["timescale"] == 600
    assert r["duration_ms"] == 13 * 500
    assert r["n_video"] == 0 and r["n_audio"] == 1


def test_mp4_probe_operator(spark):
    df = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = V.mp4_probe(V.synthesize_mp4(df, "doc_id")).collect()
    assert len(out) == 24
    for r in out:
        i = r.id
        assert r.parse_ok, i
        assert r.major_brand == ["isom", "mp42", "qt  "][i % 3], i
        assert r.duration_ms == (i + 1) * 500, i
        assert r.n_tracks == (i % 2) + 1 + (i % 2), i
        assert r.n_video == i % 2 and r.n_audio == 1 + i % 2, i
        if i % 2:
            assert (r.width, r.height) == (
                320 + 16 * (i % 5), 240 + 16 * (i % 3)
            ), i
