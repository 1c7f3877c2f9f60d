"""Real stdlib codecs: WAV and BMP round-trip + codec-independent oracle."""

import duckdb

from bullet_storm_spark.operators.multimodal import (
    bmp_features_sql,
    decode_bmp_features,
    decode_wav_features,
    synthesize_bmp,
    synthesize_wav,
    wav_features_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def test_wav_roundtrip_matches_formula_oracle(spark):
    got = decode_wav_features(synthesize_wav(_docs(spark), "doc_id")).collect()
    want = _con().execute(wav_features_sql("documents", "doc_id")).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    assert all(r.decode_ok for r in got)


def test_bmp_roundtrip_matches_formula_oracle(spark):
    got = decode_bmp_features(synthesize_bmp(_docs(spark), "doc_id")).collect()
    want = _con().execute(bmp_features_sql("documents", "doc_id")).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    assert all(r.decode_ok for r in got)


def test_wav_bytes_are_real_riff(spark):
    rows = synthesize_wav(_docs(spark).limit(3), "doc_id").collect()
    for r in rows:
        b = bytes(r.payload)
        assert b[0:4] == b"RIFF" and b[8:12] == b"WAVE"


def test_bmp_bytes_are_real_bmp(spark):
    import struct

    rows = synthesize_bmp(_docs(spark).limit(3), "doc_id").collect()
    for r in rows:
        b = bytes(r.payload)
        assert b[0:2] == b"BM"
        (_hsz, w, h, _planes, bpp) = struct.unpack_from("<IiiHH", b, 14)
        assert bpp == 24 and w >= 8 and h >= 8


def test_decoder_flags_corrupt_payload(spark):
    from pyspark.sql import functions as F

    corrupt = synthesize_wav(_docs(spark).limit(2), "doc_id").withColumn(
        "payload", F.expr("substring(payload, 1, 10)")
    )
    rows = decode_wav_features(corrupt).collect()
    assert all(not r.decode_ok for r in rows)


def test_stereo_wav_deinterleaved_zero_crossings(spark):
    # build a 2-channel WAV where interleaved sign flips would overcount:
    # ch0 is all positive, ch1 is all negative -> 0 true crossings, but
    # the interleaved stream flips sign at every sample (ADVICE r5)
    import io
    import struct
    import wave as wavmod

    import numpy as np

    ch0 = np.array([100, 200, 300, 400], dtype="<i2")
    ch1 = np.array([-100, -200, -300, -400], dtype="<i2")
    inter = np.empty(8, dtype="<i2")
    inter[0::2], inter[1::2] = ch0, ch1
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(inter.tobytes())
    payload = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
    [row] = decode_wav_features(df).collect()
    assert row.decode_ok and row.n_channels == 2
    assert row.n_samples == 8  # frames x channels
    assert row.zero_crossings == 0  # per-channel, not interleaved
    s = inter.astype("int64")
    assert row.sum_sq == int((s * s).sum())
    assert row.peak == 400


def test_resize_matches_formula_oracle(spark):
    from bullet_storm_spark.operators.multimodal import resize_bmp, resize_bmp_sql

    sub = _docs(spark).where("doc_id < 40")
    got = resize_bmp(synthesize_bmp(sub, "doc_id")).collect()
    want = _con().execute(
        resize_bmp_sql("(SELECT * FROM documents WHERE doc_id < 40)", "doc_id")
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    # 8x8 grid per image, every cell populated (w, h >= 8 by synthesis)
    assert len(got) == 40 * 64
    # pixel conservation: the cells of each image partition its pixels
    by_img = {}
    for r in got:
        by_img.setdefault(r.id, []).append(r)
    for ident, rows in by_img.items():
        w, h = 8 + ident % 9, 8 + (ident // 7) % 9
        assert sum(r.n_px for r in rows) == w * h
        assert len(rows) == 64


def test_resize_exact_semantics(spark):
    """Hand-check one image: id=0 is 8x8, so every cell is exactly one
    pixel and mean_gray equals that pixel's r+g+b."""
    from bullet_storm_spark.operators.multimodal import resize_bmp

    sub = _docs(spark).where("doc_id = 0")
    got = {(r.out_x, r.out_y): r for r in
           resize_bmp(synthesize_bmp(sub, "doc_id")).collect()}
    for (x, y), r in got.items():
        gray = sum((0 + 3 * x + 7 * y + 11 * c) % 256 for c in range(3))
        assert r.n_px == 1 and r.sum_gray == gray and r.mean_gray == float(gray)


def test_dhash_matches_formula_oracle_and_groups(spark):
    from bullet_storm_spark.operators.multimodal import (
        dhash_bmp, dhash_bmp_sql, dhash_groups, dhash_groups_sql,
    )

    payloads = synthesize_bmp(_docs(spark), "doc_id")
    got = dhash_bmp(payloads).collect()
    want = _con().execute(dhash_bmp_sql("documents", "doc_id")).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    assert all(len(r.dhash) == 56 and set(r.dhash) <= {"0", "1"} for r in got)
    g = dhash_groups(dhash_bmp(payloads)).collect()
    wg = _con().execute(dhash_groups_sql("documents", "doc_id")).fetchall()
    assert [tuple(r) for r in g] == [tuple(w) for w in wg]
    assert all(r.n_images > 1 for r in g)


def test_dhash_corrupt_payload_is_null(spark):
    from pyspark.sql import functions as F
    from bullet_storm_spark.operators.multimodal import dhash_bmp

    bad = spark.range(1).select(
        F.col("id"), F.lit(b"not a bmp").alias("payload")
    )
    rows = dhash_bmp(bad).collect()
    assert rows[0].dhash is None


def test_decimate_matches_formula_oracle(spark):
    from bullet_storm_spark.operators.multimodal import (
        decimate_wav, decimate_wav_sql,
    )

    sub = _docs(spark).where("doc_id < 30")
    got = decimate_wav(synthesize_wav(sub, "doc_id")).collect()
    want = _con().execute(
        decimate_wav_sql("(SELECT * FROM documents WHERE doc_id < 30)", "doc_id")
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    # sample conservation per clip: frames partition the waveform
    by = {}
    for r in got:
        by.setdefault(r.id, 0)
        by[r.id] += r.n_samples
    for ident, n in by.items():
        assert n == 400 + ident % 600


def test_decimate_exact_frame(spark):
    """Hand-check clip 0's first frame: mean of the first 8 formula
    samples, exact integer sums."""
    from bullet_storm_spark.operators.multimodal import decimate_wav

    sub = _docs(spark).where("doc_id = 0")
    first = decimate_wav(synthesize_wav(sub, "doc_id")).collect()[0]
    samples = [((0 * 131 + t * 65) % 2003) - 1001 for t in range(8)]
    assert first.n_samples == 8
    assert first.sum_amp == sum(samples)
    assert first.sum_sq == sum(v * v for v in samples)
    assert first.mean_amp == round(sum(samples) / 8, 6)


# --- baseline JPEG codec (operators/jpeg.py) --------------------------------


def test_jpeg_roundtrip_error_envelope():
    # encode->decode must stay within baseline-JPEG quantization error on
    # smooth content; exercises non-multiple-of-8 dims (edge padding)
    import numpy as np

    from bullet_storm_spark.operators.jpeg import decode_jpeg, encode_jpeg

    h, w = 45, 62
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (128 + 100 * np.sin(xx / 9.0)).clip(0, 255),
            (128 + 100 * np.cos(yy / 7.0)).clip(0, 255),
            (xx + yy) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 3.0


def test_jpeg_decode_is_deterministic_pixel_hash():
    # the pixel-hash pin: any drift in Huffman/IDCT/color-convert flips it
    import hashlib

    import numpy as np

    from bullet_storm_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from bullet_storm_spark.operators.multimodal import _jpeg_pixels

    img = _jpeg_pixels(7)
    payload = encode_jpeg(img, quality=85)
    out1, out2 = decode_jpeg(payload), decode_jpeg(bytes(payload))
    assert np.array_equal(out1, out2)
    h1 = hashlib.sha256(out1.tobytes()).hexdigest()
    assert h1 == hashlib.sha256(out2.tobytes()).hexdigest()
    # encode determinism: same pixels -> same bytes
    assert encode_jpeg(img, quality=85) == payload


def test_jpeg_rejects_non_baseline():
    import numpy as np
    import pytest

    from bullet_storm_spark.operators.jpeg import (
        JpegFormatError,
        decode_jpeg,
        encode_jpeg,
    )

    with pytest.raises(JpegFormatError):
        decode_jpeg(b"\x00\x01not a jpeg")
    # flip the SOF0 marker to SOF2 (progressive): honest refusal, not junk
    payload = bytearray(encode_jpeg(_smooth(16, 16), quality=85))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(JpegFormatError):
        decode_jpeg(bytes(payload))


def test_jpeg_skips_ff_fill_bytes():
    # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    # bytes; real-world encoders pad with them (ADVICE r9). Injecting
    # fill bytes before each table/frame marker must not change the
    # decoded pixels.
    import numpy as np

    from bullet_storm_spark.operators.jpeg import decode_jpeg, encode_jpeg

    payload = encode_jpeg(_smooth(16, 16), quality=85)
    base = decode_jpeg(payload)
    padded = bytearray(payload[:2])
    pos = 2
    # walk the marker stream up to SOS and insert fill bytes before each
    # marker; after SOS copy verbatim (entropy-coded data must not change)
    import struct as _struct

    while pos < len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        padded += b"\xff\xff\xff" + payload[pos : pos + 2]
        pos += 2
        if marker == 0xDA:  # SOS: the rest is entropy data + EOI
            padded += payload[pos:]
            break
        (seglen,) = _struct.unpack(">H", payload[pos : pos + 2])
        padded += payload[pos : pos + seglen]
        pos += seglen
    out = decode_jpeg(bytes(padded))
    assert np.array_equal(out, base)


def _smooth(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([xx * 4 % 256, yy * 4 % 256, (xx + yy) % 256], axis=-1).astype(
        np.uint8
    )


def test_jpeg_entry_decodes_real_fixtures(spark):
    # the registry entry end-to-end on the Arrow path: every fixture
    # decodes, dims match the generator, and the decoded pixels equal a
    # local decode of the same payload (worker/driver agreement)
    import hashlib

    from bullet_storm_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from bullet_storm_spark.operators.multimodal import (
        _jpeg_pixels,
        decode_jpeg_features,
        synthesize_jpeg,
    )

    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = decode_jpeg_features(synthesize_jpeg(ids, "doc_id")).collect()
    assert len(out) == 12 and all(r.decode_ok for r in out)
    for r in out:
        img = _jpeg_pixels(r.id)
        assert (r.width, r.height) == (img.shape[1], img.shape[0])
        local = decode_jpeg(encode_jpeg(img, quality=85))
        assert r.pixel_sha == hashlib.sha256(local.tobytes()).hexdigest()[:16]


def test_decode_image_real_dispatches_jpeg_and_bmp(spark):
    from bullet_storm_spark.operators.multimodal import (
        decode_image_real,
        synthesize_bmp,
        synthesize_jpeg,
    )

    ids = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    jp = decode_image_real(synthesize_jpeg(ids, "doc_id")).collect()
    bm = decode_image_real(synthesize_bmp(ids, "doc_id")).collect()
    assert all(r.decode_ok and r.width > 0 for r in jp)
    assert all(r.decode_ok and r.width > 0 for r in bm)
    junk = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG....not really"))], "id long, payload binary"
    )
    assert [r.decode_ok for r in decode_image_real(junk).collect()] == [False]
