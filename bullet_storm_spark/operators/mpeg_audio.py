"""MPEG audio (MP3) frame-level probe — REAL compressed-audio metadata.

The multimodal front door (`multimodal.decode_audio_real`) keeps PCM
sample synthesis for MP3/AAC out of scope: a faithful MPEG-1 synthesis
filterbank requires the spec's NORMATIVE coefficient tables (the
512-entry synthesis window of ISO/IEC 11172-3 Annex B Table B.3 and the
Layer II allocation tables), which are published as tables of constants
with no closed form — they cannot be re-derived in this environment,
and an "approximate" window would produce deterministic-but-wrong
samples mislabeled as a real decode. That closure is documented in
COVERAGE.md; ``decode_ok = false`` with true byte lengths remains the
honest sample-level answer.

What a 100 TB training-data pipeline actually needs from compressed
audio at CURATION time, though, is frame-level METADATA — duration,
sample rate, channel layout, CBR/VBR, junk/truncation detection — to
build audio datacards, filter corrupt files, and budget decode compute
BEFORE shipping payloads to a GPU decode stage. All of that lives in
the frame HEADERS, whose syntax (11-bit sync, version/layer/bitrate/
samplerate fields, the ``144 * bitrate / samplerate + padding`` frame
stepping) is fully specified arithmetic with only two small public
tables (bitrate ladder, sample-rate triple) — no normative filter
constants. This module implements that for real:

- :func:`parse_mp3` — pure-Python frame walker (ID3v2 skip, sync scan,
  header decode, frame-length stepping, truncated-tail accounting,
  CBR/VBR classification). Works on MPEG-1 and MPEG-2/2.5 streams.
- :func:`mp3_probe` — the Arrow-batched mapInPandas operator over a
  binary payload column (the `extract_features` batch shape: one Arrow
  batch of payloads per task, scale-independent).
- :func:`synthesize_mp3` — deterministic valid MPEG-1 Layer I/II/III
  bitstreams (varied layer/bitrate/mode/padding/ID3 junk per id) so the
  probe is testable end-to-end on the driver's tables without an
  encoder in the container.

Reference scope note: the reference system (bullet-storm) has no
multimodal surface at all; this extends the engine's training-data
pipeline per the build brief's multimodal-columns mandate.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# MPEG-1 bitrate ladders (kbps) per layer, index 1..14 (0 = free-format,
# 15 = invalid). ISO/IEC 11172-3 §2.4.2.3.
_BITRATE_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
# MPEG-2 / 2.5 (ISO 13818-3): Layer I keeps its own ladder, Layers II+III share
_BITRATE_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATE = {
    3: [44100, 48000, 32000],  # version bits 11 = MPEG-1
    2: [22050, 24000, 16000],  # version bits 10 = MPEG-2
    0: [11025, 12000, 8000],   # version bits 00 = MPEG-2.5
}
_VERSION_NAME = {3: "MPEG-1", 2: "MPEG-2", 0: "MPEG-2.5"}
_MODE_NAME = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _samples_per_frame(version_bits: int, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    # Layer III: 1152 for MPEG-1, 576 for MPEG-2/2.5
    return 1152 if version_bits == 3 else 576


def _frame_length(
    version_bits: int, layer: int, bitrate_kbps: int, sr: int, padding: int
) -> int:
    """ISO frame stepping: Layer I counts in 4-byte slots; Layers II/III
    in bytes (coefficient 144 for MPEG-1, 72 for MPEG-2/2.5 Layer III)."""
    bps = bitrate_kbps * 1000
    if layer == 1:
        return (12 * bps // sr + padding) * 4
    coeff = 144 if (layer == 2 or version_bits == 3) else 72
    return coeff * bps // sr + padding


def _parse_header(b: bytes, off: int):
    """Decode the 4-byte frame header at ``off``; None if not a valid
    sync / header combination (free-format and reserved fields are
    treated as invalid — free-format streams carry no frame length)."""
    if off + 4 > len(b):
        return None
    h = int.from_bytes(b[off : off + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version_bits = (h >> 19) & 0x3
    layer_bits = (h >> 17) & 0x3
    if version_bits == 1 or layer_bits == 0:
        return None  # reserved version / reserved layer
    layer = 4 - layer_bits  # 11 -> Layer I, 10 -> II, 01 -> III
    bitrate_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    if bitrate_idx in (0, 15) or sr_idx == 3:
        return None
    table = _BITRATE_V1 if version_bits == 3 else _BITRATE_V2
    bitrate = table[layer][bitrate_idx]
    sr = _SAMPLE_RATE[version_bits][sr_idx]
    padding = (h >> 9) & 0x1
    mode = (h >> 6) & 0x3
    flen = _frame_length(version_bits, layer, bitrate, sr, padding)
    if flen < 4:
        return None
    return {
        "version_bits": version_bits,
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": sr,
        "padding": padding,
        "mode": mode,
        "frame_len": flen,
    }


def _skip_id3v2(b: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (syncsafe 28-bit size), 0
    if absent."""
    if len(b) >= 10 and b[:3] == b"ID3":
        size = (
            ((b[6] & 0x7F) << 21)
            | ((b[7] & 0x7F) << 14)
            | ((b[8] & 0x7F) << 7)
            | (b[9] & 0x7F)
        )
        return 10 + size
    return 0


def parse_mp3(b: bytes) -> dict:
    """Walk a (possibly ID3-prefixed, possibly junk-prefixed) MPEG audio
    stream: ``(parse_ok, version, layer, sample_rate, channel_mode,
    frames, duration_ms, bitrate_min_kbps, bitrate_max_kbps, is_cbr,
    junk_bytes, trailing_bytes)``.

    Stream identity (version/layer/sample rate/mode) is taken from the
    first frame; a header mid-stream that stops matching it ends the
    walk (the remainder counts as ``trailing_bytes`` — the corrupt-file
    signal). A truncated final frame is not counted as a frame and also
    lands in ``trailing_bytes``. ``duration_ms`` is integer-exact
    ``frames * samples_per_frame * 1000 // sample_rate``. The sync scan
    requires TWO consecutive valid headers (the second at the first
    frame's stepped offset) before trusting a sync match — a lone
    0xFFE pattern inside junk never starts a bogus walk."""
    out = {
        "parse_ok": False,
        "version": None,
        "layer": 0,
        "sample_rate": 0,
        "channel_mode": None,
        "frames": 0,
        "duration_ms": 0,
        "bitrate_min_kbps": 0,
        "bitrate_max_kbps": 0,
        "is_cbr": None,
        "junk_bytes": 0,
        "trailing_bytes": 0,
        "n_bytes": len(b),
    }
    off = _skip_id3v2(b)
    id3 = off
    # sync scan with double-header confirmation
    first = None
    while off + 4 <= len(b):
        hdr = _parse_header(b, off)
        if hdr is not None:
            nxt = off + hdr["frame_len"]
            if nxt + 4 > len(b):
                first = hdr  # single (possibly last) frame stream
                break
            peer = _parse_header(b, nxt)
            if peer is not None and all(
                peer[k] == hdr[k]
                for k in ("version_bits", "layer", "sample_rate", "mode")
            ):
                first = hdr
                break
        off += 1
    if first is None:
        out["junk_bytes"] = len(b) - id3
        return out
    out["junk_bytes"] = off - id3
    ident = {
        k: first[k] for k in ("version_bits", "layer", "sample_rate", "mode")
    }
    frames = 0
    br_min, br_max = 10**9, 0
    while off + 4 <= len(b):
        hdr = _parse_header(b, off)
        if hdr is None or any(hdr[k] != ident[k] for k in ident):
            break
        if off + hdr["frame_len"] > len(b):
            break  # truncated tail frame
        frames += 1
        br_min = min(br_min, hdr["bitrate_kbps"])
        br_max = max(br_max, hdr["bitrate_kbps"])
        off += hdr["frame_len"]
    out["trailing_bytes"] = len(b) - off
    if frames == 0:
        return out
    spf = _samples_per_frame(ident["version_bits"], ident["layer"])
    out.update(
        parse_ok=True,
        version=_VERSION_NAME[ident["version_bits"]],
        layer=ident["layer"],
        sample_rate=ident["sample_rate"],
        channel_mode=_MODE_NAME[ident["mode"]],
        frames=frames,
        duration_ms=frames * spf * 1000 // ident["sample_rate"],
        bitrate_min_kbps=br_min,
        bitrate_max_kbps=br_max,
        is_cbr=br_min == br_max,
    )
    return out


MP3_PROBE_SCHEMA = (
    "id long, parse_ok boolean, version string, layer int, "
    "sample_rate int, channel_mode string, frames int, duration_ms long, "
    "bitrate_min_kbps int, bitrate_max_kbps int, is_cbr boolean, "
    "junk_bytes long, trailing_bytes long, n_bytes long"
)


def mp3_probe(payloads: DataFrame) -> DataFrame:
    """Frame-level MP3 metadata over an ``(id, payload: binary)`` frame —
    the audio-datacard / corrupt-file-filter pass that runs BEFORE any
    sample decode is scheduled. Arrow-batched mapInPandas (the
    `extract_features` shape): peak memory is one Arrow batch of
    payloads per task at any corpus size; output is a fixed narrow row
    per payload, so the downstream aggregation is wordcount-shaped."""
    import pandas as pd

    cols = [
        "parse_ok", "version", "layer", "sample_rate", "channel_mode",
        "frames", "duration_ms", "bitrate_min_kbps", "bitrate_max_kbps",
        "is_cbr", "junk_bytes", "trailing_bytes", "n_bytes",
    ]

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                r = parse_mp3(bytes(blob))
                rows.append([int(ident)] + [r[c] for c in cols])
            yield pd.DataFrame(rows, columns=["id"] + cols)

    return payloads.mapInPandas(probe, MP3_PROBE_SCHEMA).orderBy("id")


# --------------------------------------------------------------------------
# deterministic fixture synthesis (no encoder in the container)
# --------------------------------------------------------------------------

def _build_header(
    layer: int, bitrate_idx: int, sr_idx: int, padding: int, mode: int
) -> bytes:
    h = (
        (0x7FF << 21)
        | (3 << 19)              # MPEG-1
        | ((4 - layer) << 17)
        | (1 << 16)              # no CRC
        | (bitrate_idx << 12)
        | (sr_idx << 10)
        | (padding << 9)
        | (mode << 6)
    )
    return h.to_bytes(4, "big")


def make_mp3_bytes(ident: int) -> bytes:
    """One deterministic valid MPEG-1 stream per id: layer cycles
    I/II/III, bitrate/samplerate/mode/frame-count vary by id, padding
    alternates per frame (so CBR streams still exercise both frame
    lengths), every third id gets an ID3v2 prefix and every fifth a
    junk-byte prefix after it; frame payloads are md5-keystream bytes
    WITH embedded 0xFF bytes masked out so no fake sync can appear."""
    layer = [1, 2, 3][ident % 3]
    bitrate_idx = 1 + (ident * 7) % 14
    sr_idx = ident % 3
    mode = ident % 4
    n_frames = 2 + ident % 5
    sr = _SAMPLE_RATE[3][sr_idx]
    parts = []
    if ident % 3 == 0:
        tag = b"tag payload %d" % ident
        parts.append(
            b"ID3\x04\x00\x00"
            + bytes(
                [
                    (len(tag) >> 21) & 0x7F,
                    (len(tag) >> 14) & 0x7F,
                    (len(tag) >> 7) & 0x7F,
                    len(tag) & 0x7F,
                ]
            )
            + tag
        )
    if ident % 5 == 0:
        parts.append(b"\x00junk\x01" * 3)
    for f in range(n_frames):
        padding = (ident + f) % 2
        bitrate = _BITRATE_V1[layer][bitrate_idx]
        flen = _frame_length(3, layer, bitrate, sr, padding)
        body = bytearray()
        seed = f"{ident}:{f}".encode()
        while len(body) < flen - 4:
            seed = hashlib.md5(seed).digest()
            body.extend(seed)
        frame = bytearray(_build_header(layer, bitrate_idx, sr_idx, padding, mode))
        frame.extend(body[: flen - 4])
        # mask embedded 0xFF so the payload can never alias a syncword
        for i in range(4, len(frame)):
            if frame[i] == 0xFF:
                frame[i] = 0x7F
        parts.append(bytes(frame))
    return b"".join(parts)


def synthesize_mp3(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) with one deterministic MPEG-1 stream per input row —
    the test-fixture source for :func:`mp3_probe` (same contract as
    `multimodal.synthesize_wav` / `synthesize_jpeg`: pure function of
    the id, Arrow-batched, no files)."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = [int(x) for x in pdf["id"]]
            yield pd.DataFrame(
                {"id": ids, "payload": [make_mp3_bytes(i) for i in ids]}
            )

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        gen, "id long, payload binary"
    )


# --------------------------------------------------------------------------
# ADTS (AAC) frame probe — same honest-metadata posture as parse_mp3
# --------------------------------------------------------------------------

# MPEG-4 sampling frequency index (ISO/IEC 14496-3 §1.6.3.4); 13-15 reserved
_ADTS_SAMPLE_RATE = [
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
]
_ADTS_PROFILE = ["Main", "LC", "SSR", "LTP"]  # 2-bit profile (object type - 1)


def _parse_adts_header(b: bytes, off: int):
    """Decode the 7/9-byte ADTS header at ``off``; None if invalid.
    Unlike MP3, the full frame length is an explicit 13-bit field —
    no bitrate arithmetic needed."""
    if off + 7 > len(b):
        return None
    if b[off] != 0xFF or (b[off + 1] & 0xF6) != 0xF0:
        return None  # 12-bit sync + layer bits must be 00
    sr_idx = (b[off + 2] >> 2) & 0xF
    if sr_idx >= 13:
        return None
    profile = (b[off + 2] >> 6) & 0x3
    channel_cfg = ((b[off + 2] & 0x1) << 2) | ((b[off + 3] >> 6) & 0x3)
    frame_len = (
        ((b[off + 3] & 0x3) << 11) | (b[off + 4] << 3) | ((b[off + 5] >> 5) & 0x7)
    )
    crc_absent = b[off + 1] & 0x1
    header_len = 7 if crc_absent else 9
    if frame_len < header_len:
        return None
    return {
        "mpeg4": (b[off + 1] >> 3) & 0x1 == 0,  # ID bit: 0 = MPEG-4
        "profile": profile,
        "sr_idx": sr_idx,
        "sample_rate": _ADTS_SAMPLE_RATE[sr_idx],
        "channel_cfg": channel_cfg,
        "frame_len": frame_len,
        "crc_absent": crc_absent,
    }


def parse_adts(b: bytes) -> dict:
    """Walk an ADTS AAC stream (ID3v2-prefix tolerant): ``(parse_ok,
    profile, sample_rate, channels, frames, duration_ms, junk_bytes,
    trailing_bytes)``. Each ADTS frame carries 1024 PCM samples per
    channel (one AAC access unit); duration is integer-exact
    ``frames * 1024 * 1000 // sample_rate``. Stream identity
    (profile, sample rate, channel config) comes from the first frame;
    the same double-header sync confirmation as :func:`parse_mp3`."""
    out = {
        "parse_ok": False,
        "profile": None,
        "sample_rate": 0,
        "channels": 0,
        "frames": 0,
        "duration_ms": 0,
        "junk_bytes": 0,
        "trailing_bytes": 0,
        "n_bytes": len(b),
    }
    off = _skip_id3v2(b)
    id3 = off
    first = None
    while off + 7 <= len(b):
        hdr = _parse_adts_header(b, off)
        if hdr is not None:
            nxt = off + hdr["frame_len"]
            if nxt + 7 > len(b):
                first = hdr
                break
            peer = _parse_adts_header(b, nxt)
            if peer is not None and all(
                peer[k] == hdr[k] for k in ("profile", "sr_idx", "channel_cfg")
            ):
                first = hdr
                break
        off += 1
    if first is None:
        out["junk_bytes"] = len(b) - id3
        return out
    out["junk_bytes"] = off - id3
    ident = {k: first[k] for k in ("profile", "sr_idx", "channel_cfg")}
    frames = 0
    while off + 7 <= len(b):
        hdr = _parse_adts_header(b, off)
        if hdr is None or any(hdr[k] != ident[k] for k in ident):
            break
        if off + hdr["frame_len"] > len(b):
            break
        frames += 1
        off += hdr["frame_len"]
    out["trailing_bytes"] = len(b) - off
    if frames == 0:
        return out
    out.update(
        parse_ok=True,
        profile=_ADTS_PROFILE[ident["profile"]],
        sample_rate=_ADTS_SAMPLE_RATE[ident["sr_idx"]],
        channels=ident["channel_cfg"],
        frames=frames,
        duration_ms=frames * 1024 * 1000 // _ADTS_SAMPLE_RATE[ident["sr_idx"]],
    )
    return out


ADTS_PROBE_SCHEMA = (
    "id long, parse_ok boolean, profile string, sample_rate int, "
    "channels int, frames int, duration_ms long, junk_bytes long, "
    "trailing_bytes long, n_bytes long"
)


def adts_probe(payloads: DataFrame) -> DataFrame:
    """Frame-level ADTS AAC metadata over ``(id, payload: binary)`` —
    the AAC twin of :func:`mp3_probe`, same Arrow-batched shape."""
    import pandas as pd

    cols = [
        "parse_ok", "profile", "sample_rate", "channels", "frames",
        "duration_ms", "junk_bytes", "trailing_bytes", "n_bytes",
    ]

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for ident, blob in zip(pdf["id"], pdf["payload"]):
                r = parse_adts(bytes(blob))
                rows.append([int(ident)] + [r[c] for c in cols])
            yield pd.DataFrame(rows, columns=["id"] + cols)

    return payloads.mapInPandas(probe, ADTS_PROBE_SCHEMA).orderBy("id")


def make_adts_bytes(ident: int) -> bytes:
    """One deterministic MPEG-4 ADTS stream per id: profile/rate/
    channels/frame sizes vary by id; payload bytes are md5 keystream
    with 0xFF masked (no fake sync); every fourth id gets an ID3v2
    prefix."""
    profile = ident % 4
    sr_idx = 3 + ident % 6  # 48000..12000 band
    channels = 1 + ident % 2
    n_frames = 3 + ident % 4
    parts = []
    if ident % 4 == 0:
        tag = b"aac tag %d" % ident
        parts.append(
            b"ID3\x04\x00\x00"
            + bytes(
                [
                    (len(tag) >> 21) & 0x7F,
                    (len(tag) >> 14) & 0x7F,
                    (len(tag) >> 7) & 0x7F,
                    len(tag) & 0x7F,
                ]
            )
            + tag
        )
    for f in range(n_frames):
        flen = 64 + ((ident * 13 + f * 7) % 200)  # varied frame sizes
        hdr = bytearray(7)
        hdr[0] = 0xFF
        hdr[1] = 0xF1  # MPEG-4, layer 00, no CRC
        hdr[2] = (profile << 6) | (sr_idx << 2) | ((channels >> 2) & 0x1)
        hdr[3] = ((channels & 0x3) << 6) | ((flen >> 11) & 0x3)
        hdr[4] = (flen >> 3) & 0xFF
        hdr[5] = ((flen & 0x7) << 5) | 0x1F  # buffer fullness high bits
        hdr[6] = 0xFC
        body = bytearray()
        seed = f"adts{ident}:{f}".encode()
        while len(body) < flen - 7:
            seed = hashlib.md5(seed).digest()
            body.extend(seed)
        frame = hdr + bytes(
            x if x != 0xFF else 0x7E for x in body[: flen - 7]
        )
        parts.append(bytes(frame))
    return b"".join(parts)


def synthesize_adts(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) deterministic ADTS fixture streams, one per row."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = [int(x) for x in pdf["id"]]
            yield pd.DataFrame(
                {"id": ids, "payload": [make_adts_bytes(i) for i in ids]}
            )

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        gen, "id long, payload binary"
    )
