"""MP3 frame-level probe: pure-Python parser pins (hand-computed
expectations, NOT round-trips through the module's own tables) plus the
Arrow-batched operator end-to-end."""

import pytest

from bullet_storm_spark.operators import mpeg_audio as M


def test_parse_hand_built_layer2_cbr():
    # ident=1 fixture, hand-computed: MPEG-1 Layer II, 128 kbps, 48 kHz,
    # joint stereo, 3 frames with padding 1/0/1 -> 385+384+385 bytes,
    # duration 3*1152*1000 // 48000 = 72 ms
    b = M.make_mp3_bytes(1)
    assert len(b) == 385 + 384 + 385
    r = M.parse_mp3(b)
    assert r["parse_ok"] is True
    assert r["version"] == "MPEG-1"
    assert r["layer"] == 2
    assert r["sample_rate"] == 48000
    assert r["channel_mode"] == "joint_stereo"
    assert r["frames"] == 3
    assert r["duration_ms"] == 72
    assert r["bitrate_min_kbps"] == r["bitrate_max_kbps"] == 128
    assert r["is_cbr"] is True
    assert r["junk_bytes"] == 0 and r["trailing_bytes"] == 0


def test_parse_layer1_slot_stepping():
    # Layer I counts frame length in 4-byte SLOTS: 256 kbps @ 44.1 kHz,
    # padding 0 -> (12*256000//44100)*4 = 69*4 = 276 bytes; padding 1 ->
    # 280. Hand-build two frames and pin the walk.
    h0 = M._build_header(1, 8, 0, 0, 3)  # idx 8 -> 256 kbps Layer I
    h1 = M._build_header(1, 8, 0, 1, 3)
    f0 = h0 + bytes(276 - 4).replace(b"\xff", b"\x00")
    f1 = h1 + bytes(280 - 4)
    r = M.parse_mp3(f0 + f1)
    assert r["parse_ok"] and r["layer"] == 1 and r["frames"] == 2
    assert r["sample_rate"] == 44100 and r["channel_mode"] == "mono"
    # 2 * 384 * 1000 // 44100 = 17 ms
    assert r["duration_ms"] == 17


def test_parse_vbr_and_id3_and_junk():
    # VBR: same stream identity, different bitrate per frame. Layer III
    # 44.1 kHz mono; 128 kbps pad0 -> 144*128000//44100 = 417 bytes;
    # 192 kbps pad0 -> 626 bytes. Prefixed by ID3v2 (10+4 bytes) and
    # 3 junk bytes.
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x04abcd"
    junk = b"\x01\x02\x03"
    f0 = M._build_header(3, 9, 0, 0, 3) + bytes(417 - 4)
    f1 = M._build_header(3, 11, 0, 0, 3) + bytes(626 - 4)
    r = M.parse_mp3(id3 + junk + f0 + f1)
    assert r["parse_ok"] and r["frames"] == 2
    assert r["junk_bytes"] == 3  # counted AFTER the ID3 tag
    assert r["bitrate_min_kbps"] == 128 and r["bitrate_max_kbps"] == 192
    assert r["is_cbr"] is False
    assert r["duration_ms"] == 2 * 1152 * 1000 // 44100


def test_parse_truncated_tail_and_garbage():
    b = M.make_mp3_bytes(1)
    cut = M.parse_mp3(b[:-10])  # last frame loses its tail
    assert cut["parse_ok"] is True and cut["frames"] == 2
    assert cut["trailing_bytes"] == 385 - 10
    garbage = bytes(range(256)) * 4
    g = M.parse_mp3(garbage)
    assert g["parse_ok"] is False and g["frames"] == 0
    assert g["junk_bytes"] == len(garbage)


def test_lone_sync_in_junk_does_not_start_walk():
    # a bare 0xFFFB header pattern inside junk, with NO coherent second
    # frame at its stepped offset, must not be trusted by the
    # double-header sync scan... unless it is the stream's actual tail.
    fake = M._build_header(3, 9, 0, 0, 3)  # valid-looking header
    blob = b"\x00" * 7 + fake + b"\x00" * 800  # stepped offset holds zeros
    r = M.parse_mp3(blob)
    assert r["parse_ok"] is False and r["frames"] == 0


def test_mp3_probe_operator(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    out = M.mp3_probe(M.synthesize_mp3(df, "doc_id")).collect()
    assert len(out) == 40
    assert all(r.parse_ok for r in out)
    for r in out:
        i = r.id
        layer = [1, 2, 3][i % 3]
        sr = [44100, 48000, 32000][i % 3]
        n_frames = 2 + i % 5
        spf = 384 if layer == 1 else 1152
        assert r.layer == layer, i
        assert r.sample_rate == sr, i
        assert r.frames == n_frames, i
        assert r.duration_ms == n_frames * spf * 1000 // sr, i
        assert r.is_cbr is True, i
        assert r.version == "MPEG-1"
        assert r.trailing_bytes == 0 and r.junk_bytes == (
            18 if i % 5 == 0 else 0
        ), i


def test_mpeg2_halved_layer3_frames():
    # MPEG-2 Layer III: 576 samples/frame and the 72 coefficient.
    # 64 kbps @ 22050 Hz pad0 -> 72*64000//22050 = 208 bytes.
    h = (
        (0x7FF << 21) | (2 << 19) | (1 << 17) | (1 << 16)
        | (8 << 12) | (0 << 10) | (0 << 9) | (3 << 6)
    ).to_bytes(4, "big")
    frame = h + bytes(208 - 4)
    r = M.parse_mp3(frame * 3)
    assert r["parse_ok"] and r["version"] == "MPEG-2"
    assert r["sample_rate"] == 22050 and r["frames"] == 3
    assert r["bitrate_min_kbps"] == 64
    assert r["duration_ms"] == 3 * 576 * 1000 // 22050


def test_parse_adts_hand_built():
    # hand-built: MPEG-4 LC @ 48 kHz stereo, explicit 13-bit frame
    # lengths 100 and 120; duration 2*1024*1000 // 48000 = 42 ms
    def hdr(flen):
        h = bytearray(7)
        h[0], h[1] = 0xFF, 0xF1
        h[2] = (1 << 6) | (3 << 2) | 0  # LC, sr_idx 3 (48k), ch high bit 0
        h[3] = (2 << 6) | ((flen >> 11) & 0x3)
        h[4] = (flen >> 3) & 0xFF
        h[5] = ((flen & 0x7) << 5) | 0x1F
        h[6] = 0xFC
        return bytes(h)

    b = hdr(100) + bytes(93) + hdr(120) + bytes(113)
    r = M.parse_adts(b)
    assert r["parse_ok"] is True
    assert r["profile"] == "LC" and r["sample_rate"] == 48000
    assert r["channels"] == 2 and r["frames"] == 2
    assert r["duration_ms"] == 2 * 1024 * 1000 // 48000
    assert r["junk_bytes"] == 0 and r["trailing_bytes"] == 0
    # truncated tail: second frame loses bytes -> 1 frame + trailing
    cut = M.parse_adts(b[:-20])
    assert cut["frames"] == 1 and cut["trailing_bytes"] == 120 - 20
    # garbage never parses
    assert M.parse_adts(bytes(range(256)) * 3)["parse_ok"] is False


def test_adts_probe_operator(spark):
    df = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = M.adts_probe(M.synthesize_adts(df, "doc_id")).collect()
    assert len(out) == 24
    rates = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
             16000, 12000, 11025, 8000, 7350]
    profiles = ["Main", "LC", "SSR", "LTP"]
    for r in out:
        i = r.id
        assert r.parse_ok, i
        assert r.profile == profiles[i % 4], i
        assert r.sample_rate == rates[3 + i % 6], i
        assert r.channels == 1 + i % 2, i
        assert r.frames == 3 + i % 4, i
        assert r.duration_ms == (3 + i % 4) * 1024 * 1000 // rates[3 + i % 6]
        # the ID3 prefix is SKIPPED, not junk (junk counts after it)
        assert r.junk_bytes == 0, i
        assert r.trailing_bytes == 0, i
