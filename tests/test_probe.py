"""Header-only media probe: per-format field correctness,
hand-assembled spec bytes for the two gated formats (mp3/mp4), the
typed-error contract, and the Spark attach_probe plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from sif_spark.operators import multimodal as mm
from sif_spark.operators import probe as pb
from sif_spark.operators import video as vv
from sif_spark.operators.jpeg import encode_jpeg, encode_jpeg_progressive


def test_probe_every_builtin_format():
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (9, 14, 3), np.uint8)
    cases = {
        "ppm": (mm.encode_ppm(img), {"width": 14, "height": 9, "channels": 3}),
        "bmp": (mm.encode_bmp(img), {"width": 14, "height": 9}),
        "png": (mm.encode_png(img), {"width": 14, "height": 9}),
        "gif": (mm.encode_gif_animation([img] * 3), {"n_frames": 3, "width": 14}),
        "tiff": (mm.encode_tiff(img), {"width": 14, "height": 9}),
        "jpeg": (encode_jpeg(img), {"width": 14, "height": 9, "codec": "baseline"}),
    }
    for fmt, (blob, want) in cases.items():
        got = pb.probe_media(blob)
        assert got["format"] == fmt, fmt
        for k, v in want.items():
            assert got[k] == v, (fmt, k)

    wav = mm.encode_wav(np.zeros((500, 2), np.float32), sample_rate=8000)
    got = pb.probe_media(wav)
    assert (got["n_frames"], got["sample_rate"], got["channels"]) == (500, 8000, 2)
    assert got["duration_s"] == 500 / 8000

    avi = vv.encode_avi([img] * 4, codec="DIB ", fps=8)
    got = pb.probe_media(avi)
    assert (got["width"], got["n_frames"], got["codec"]) == (14, 4, "DIB ")
    assert got["duration_s"] == pytest.approx(0.5)

    prog = encode_jpeg_progressive(np.repeat(img[:, :, :1], 3, 2))
    assert pb.probe_media(prog)["codec"] == "progressive"


def test_probe_mp3_walk_and_id3_skip():
    blob = pb.encode_mp3_frames(7, 128, 44100, 2, id3_bytes=40)
    got = pb.probe_media(blob)
    assert got["format"] == "mp3" and got["n_frames"] == 7
    assert got["sample_rate"] == 44100 and got["channels"] == 2
    assert got["duration_s"] == 7 * 1152 / 44100

    mono = pb.probe_media(pb.encode_mp3_frames(3, 160, 32000, 1))
    assert (mono["channels"], mono["sample_rate"]) == (1, 32000)

    # one lone sync pattern must NOT probe as audio
    with pytest.raises(ValueError, match="fewer than 2"):
        pb.probe_mp3(pb.encode_mp3_frames(2, 128, 44100)[:300])
    # ID3 size bytes are syncsafe: a set high bit is a typed error
    bad = bytearray(pb.encode_mp3_frames(3, id3_bytes=10))
    bad[6] = 0x80
    with pytest.raises(ValueError, match="sync bit"):
        pb.probe_mp3(bytes(bad))


def test_probe_mp3_hand_assembled_spec_bytes():
    """Independent of encode_mp3_frames: MPEG-1 Layer III header built
    from ISO 11172-3 field by field — sync FFE, version 11 (MPEG-1),
    layer 01 (III), bitrate index 9 (128k), samplerate index 0
    (44100), no padding, mono. Frame length 144*128000/44100 = 417."""
    hdr = bytes([0xFF, 0xFB, (9 << 4) | (0 << 2), 0xC0])
    frame = hdr + bytes(417 - 4)
    got = pb.probe_mp3(frame * 3)
    assert got["n_frames"] == 3 and got["sample_rate"] == 44100
    assert got["channels"] == 1 and got["duration_s"] == 3 * 1152 / 44100

    # MPEG-2 Layer III (LSF): version bits 10, 576 samples/frame,
    # bitrate index 5 = 40k at 16 kHz (samplerate index 2):
    # 576/8*40000/16000 = 180 bytes
    hdr2 = bytes([0xFF, 0xF3, (5 << 4) | (2 << 2), 0x00])
    got2 = pb.probe_mp3((hdr2 + bytes(180 - 4)) * 2)
    assert got2["sample_rate"] == 16000 and got2["channels"] == 2
    assert got2["duration_s"] == 2 * 576 / 16000


def test_probe_mp4_hand_assembled_v1_boxes():
    """Version-1 mvhd/tkhd offsets (64-bit times) derived from ISO
    14496-12 §8.2.2/§8.3.2 in-test — independent of encode_mp4_stub,
    which authors version 0."""

    def box(t, p):
        return (8 + len(p)).to_bytes(4, "big") + t + p

    mvhd = box(
        b"mvhd",
        bytes([1, 0, 0, 0]) + bytes(16)  # v1 + creation/modification (8+8)
        + (90000).to_bytes(4, "big") + (45000).to_bytes(8, "big") + bytes(80),
    )
    tkhd = box(
        b"tkhd",
        bytes([1, 0, 0, 0]) + bytes(16) + (1).to_bytes(4, "big") + bytes(4)
        + (45000).to_bytes(8, "big")  # v1 64-bit duration
        + bytes(52)  # reserved + layer block + matrix
        + (320 << 16).to_bytes(4, "big") + (240 << 16).to_bytes(4, "big"),
    )
    blob = box(b"ftyp", b"mp42\x00\x00\x00\x00") + box(b"moov", mvhd + box(b"trak", tkhd))
    got = pb.probe_media(blob)
    assert got["duration_s"] == 45000 / 90000
    assert (got["width"], got["height"]) == (320, 240)

    # largesize (size==1) box is walked correctly
    big = (1).to_bytes(4, "big") + b"mdat" + (16).to_bytes(8, "big")
    got2 = pb.probe_media(blob + big)
    assert got2["width"] == 320


def test_probe_mp4_stub_and_typed_errors():
    got = pb.probe_media(pb.encode_mp4_stub(640, 360, 2500, 1000, b"vp09"))
    assert (got["width"], got["height"], got["codec"]) == (640, 360, "vp09")
    assert got["duration_s"] == 2.5

    with pytest.raises(ValueError, match="runs past"):
        pb.probe_mp4((100).to_bytes(4, "big") + b"moov" + bytes(8))
    with pytest.raises(ValueError, match="smaller than"):
        pb.probe_mp4((3).to_bytes(4, "big") + b"free" + bytes(20))
    with pytest.raises(NotImplementedError):
        pb.probe_media(b"garbage-bytes-here!!")


def test_probe_mutation_fuzz_never_hangs():
    rng = np.random.default_rng(32)
    bases = [
        pb.encode_mp3_frames(4, id3_bytes=20),
        pb.encode_mp4_stub(64, 48, 1000),
        mm.encode_gif_animation(
            [rng.integers(0, 256, (6, 7, 3), np.uint8) for _ in range(2)]
        ),
    ]
    for base in bases:
        base = bytearray(base)
        for _ in range(200):
            b = bytearray(base)
            for _ in range(rng.integers(1, 6)):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
            try:
                pb.probe_media(bytes(b))
            except (ValueError, NotImplementedError):
                pass


def test_attach_probe_spark_plumbing(spark):
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    rows = [
        (1, pb.encode_mp3_frames(5, 128, 44100, 2)),
        (2, vv.encode_avi([img] * 3, codec="MJPG", fps=6)),
        (3, b"not-media-at-all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = {
        r["doc_id"]: r["probe"]
        for r in pb.attach_probe(df, "blob", "doc_id").collect()
    }
    assert out[1]["format"] == "mp3" and out[1]["n_frames"] == 5
    assert out[2]["format"] == "avi" and out[2]["codec"] == "MJPG"
    assert out[2]["duration_s"] == 3 * (1_000_000 // 6) / 1e6
    assert out[3] is None and out[4] is None
    with pytest.raises(Exception):
        pb.attach_probe(df, "blob", "doc_id", on_error="raise").collect()


def test_probe_ogg_opus_and_vorbis():
    got = pb.probe_media(pb.encode_ogg_stub("opus", 2, 44100, 9600, pre_skip=312))
    assert got["format"] == "ogg" and got["codec"] == "opus"
    assert (got["channels"], got["sample_rate"]) == (2, 44100)
    # Opus granules tick at 48 kHz regardless of the input rate
    assert got["n_frames"] == 9600 and got["duration_s"] == 9600 / 48000

    v = pb.probe_media(pb.encode_ogg_stub("vorbis", 1, 22050, 44100))
    assert v["codec"] == "vorbis" and v["sample_rate"] == 22050
    assert v["duration_s"] == 44100 / 22050

    with pytest.raises(ValueError, match="bad Ogg page magic"):
        pb.probe_ogg(b"OggS" + bytes(23) + bytes([1, 5]) + bytes(5) + b"XXXX" + bytes(30))
    with pytest.raises(ValueError, match="runs past"):
        pb.probe_ogg(pb.encode_ogg_stub()[:40])


def test_probe_ogg_hand_assembled_page():
    """One EOS-only page assembled field-by-field from RFC 3533: magic,
    version 0, header_type 0x06 (BOS|EOS), granule 1234, one 3-byte
    segment — unknown codec but a well-formed container."""
    page = (
        b"OggS" + bytes([0])
        + bytes([0x06])
        + (1234).to_bytes(8, "little")
        + (9).to_bytes(4, "little") + (0).to_bytes(4, "little") + bytes(4)
        + bytes([1, 3]) + b"xyz"
    )
    got = pb.probe_ogg(page)
    assert got["format"] == "ogg" and got["codec"] == "unknown"
    assert "duration_s" not in got  # no id header -> no granule rate


def _exif_app1(orientation: int, bo: str = "II") -> bytes:
    """Hand-built APP1 Exif segment: TIFF header + one-entry IFD0
    carrying tag 274 (SHORT, left-justified value)."""
    if bo == "II":
        tiff = (
            b"II*\x00" + (8).to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + (274).to_bytes(2, "little") + (3).to_bytes(2, "little")
            + (1).to_bytes(4, "little")
            + orientation.to_bytes(2, "little") + bytes(2)
            + bytes(4)
        )
    else:
        tiff = (
            b"MM\x00*" + (8).to_bytes(4, "big")
            + (1).to_bytes(2, "big")
            + (274).to_bytes(2, "big") + (3).to_bytes(2, "big")
            + (1).to_bytes(4, "big")
            + orientation.to_bytes(2, "big") + bytes(2)
            + bytes(4)
        )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload


def test_probe_jpeg_exif_orientation():
    rng = np.random.default_rng(34)
    img = rng.integers(0, 256, (8, 16, 3), np.uint8)
    base = encode_jpeg(img)
    for bo in ("II", "MM"):
        blob = base[:2] + _exif_app1(6, bo) + base[2:]  # APP1 after SOI
        got = pb.probe_media(blob)
        assert got["orientation"] == 6, bo
        assert (got["width"], got["height"]) == (16, 8)
    assert "orientation" not in pb.probe_media(base)


def test_auto_orient_roundtrip_all_orientations():
    """For each EXIF value, apply the camera's forward transform to an
    upright image, then auto_orient must restore it exactly."""
    import numpy as np

    from sif_spark.operators import imageops as io

    rng = np.random.default_rng(35)
    u = rng.integers(0, 256, (6, 9, 3), np.uint8)
    t = np.ascontiguousarray(np.swapaxes(u, 0, 1))
    forward = {
        1: u,
        2: io.hflip(u),
        3: io.rot180(u),
        4: io.vflip(u),
        5: t,                 # transpose is self-inverse
        6: io.rot270(u),      # stored rotated 270 CW -> undo with 90 CW
        7: io.rot180(t),      # transverse is self-inverse
        8: io.rot90(u),       # stored rotated 90 CW -> undo with 270 CW
    }
    for o, stored in forward.items():
        assert np.array_equal(io.auto_orient(stored, o), u), o
    assert io.auto_orient(u, None) is u
    with pytest.raises(ValueError, match="1-8"):
        io.auto_orient(u, 9)


# ---------------------------------------------------------------------------
# ID3v2 text frames
# ---------------------------------------------------------------------------


def test_id3_roundtrip_v3_v4_and_no_tag():
    from sif_spark.operators.probe import encode_id3, encode_mp3_frames, id3_tags

    tags = {"TIT2": "Hello World", "TPE1": "Ärtist ünïcode", "TRCK": "7"}
    for v in (3, 4):  # v3 = UTF-16 BOM frames, v4 = UTF-8 frames
        blob = encode_id3(tags, v) + encode_mp3_frames(2)
        assert id3_tags(blob) == tags
    assert id3_tags(encode_mp3_frames(2)) == {}


def test_id3_v22_hand_assembled_spec_bytes():
    """An ID3v2.2 tag typed out from the spec (3-byte ids and sizes,
    latin-1 text) — independent of the encoder, which only writes
    v2.3/v2.4."""
    from sif_spark.operators.probe import id3_tags

    # TT2 (v2.2 title): size 6 = encoding byte + "Hello"
    frame = b"TT2" + (6).to_bytes(3, "big") + b"\x00Hello"
    body = frame + bytes(10)  # padding stops the walk
    hdr = b"ID3\x02\x00\x00" + bytes(
        [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
         (len(body) >> 7) & 0x7F, len(body) & 0x7F]
    )
    assert id3_tags(hdr + body) == {"TT2": "Hello"}


def test_id3_typed_errors():
    from sif_spark.operators.probe import encode_id3, id3_tags

    good = bytearray(encode_id3({"TIT2": "x"}, 4))
    # frame size past the tag end
    bad = bytearray(good)
    bad[14:18] = b"\x7f\x7f\x7f\x7f"
    with pytest.raises(ValueError, match="runs past"):
        id3_tags(bytes(bad))
    # unknown text encoding byte
    bad2 = bytearray(good)
    bad2[20] = 9
    with pytest.raises(ValueError, match="encoding 9"):
        id3_tags(bytes(bad2))
    with pytest.raises(ValueError, match="truncated ID3v2 header"):
        id3_tags(b"ID3\x04")


def test_attach_id3_spark(spark):
    from sif_spark.operators.probe import attach_id3, encode_id3, encode_mp3_frames

    ok = encode_id3({"TIT2": "t1", "TPE1": "a"}, 4) + encode_mp3_frames(2)
    none = encode_mp3_frames(2)
    broken = b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f"  # declared tag > buffer
    df = spark.createDataFrame(
        [(1, ok), (2, none), (3, broken)], "doc_id long, blob binary"
    )
    rows = {r["doc_id"]: r["id3"] for r in attach_id3(df, "blob", "doc_id").collect()}
    assert rows[1] == {"TIT2": "t1", "TPE1": "a"}
    assert rows[2] == {}
    assert rows[3] is None  # on_error="null"
    with pytest.raises(Exception):
        attach_id3(df, "blob", "doc_id", on_error="raise").collect()


# ---------------------------------------------------------------------------
# Matroska / WebM (EBML)
# ---------------------------------------------------------------------------


def test_mkv_probe_video_and_audio_tracks():
    from sif_spark.operators.probe import encode_mkv_stub, probe_media, probe_mkv

    v = encode_mkv_stub("webm", 2.5, ("V_VP9", 640, 360))
    p = probe_mkv(v)
    assert p == {"format": "webm", "codec": "V_VP9", "width": 640,
                 "height": 360, "duration_s": 2.5}
    a = encode_mkv_stub("matroska", 1.25, None, ("A_OPUS", 48000, 2))
    p = probe_mkv(a)
    assert p == {"format": "matroska", "codec": "A_OPUS",
                 "sample_rate": 48000, "channels": 2, "duration_s": 1.25}
    # video track wins when both exist; probe_media dispatches on magic
    both = encode_mkv_stub("webm", 3.0, ("V_AV1", 320, 240), ("A_VORBIS", 44100, 1))
    p = probe_media(both)
    assert (p["codec"], p["width"], p["height"]) == ("V_AV1", 320, 240)


def test_mkv_hand_assembled_spec_bytes():
    """An EBML stream typed out vint-by-vint from RFC 8794 §4 and the
    Matroska registry — independent of the stub encoder. Uses a
    2-byte size vint (0x40XX) and a 4-byte float duration where the
    encoder writes minimal 1-byte sizes and 8-byte doubles."""
    import struct

    from sif_spark.operators.probe import probe_mkv

    doctype = b"\x42\x82\x88matroska"              # DocType, size 0x88=8
    ebml = b"\x1a\x45\xdf\xa3" + bytes([0x80 | len(doctype)]) + doctype
    dur = b"\x44\x89\x84" + struct.pack(">f", 5000.0)   # Duration, float32
    ts = b"\x2a\xd7\xb1\x83" + (1_000_000).to_bytes(3, "big")
    info_body = ts + dur
    info = b"\x15\x49\xa9\x66" + b"\x40" + bytes([len(info_body)]) + info_body
    video = b"\xe0\x88" + b"\xb0\x82" + (1920).to_bytes(2, "big") \
        + b"\xba\x82" + (1080).to_bytes(2, "big")
    entry_body = b"\x83\x81\x01" + b"\x86\x86V_VP08" + video
    tracks_body = b"\xae" + bytes([0x80 | len(entry_body)]) + entry_body
    tracks = b"\x16\x54\xae\x6b" + bytes([0x80 | len(tracks_body)]) + tracks_body
    seg_body = info + tracks
    segment = b"\x18\x53\x80\x67" + b"\x40" + bytes([len(seg_body)]) + seg_body
    p = probe_mkv(ebml + segment)
    assert p == {"format": "matroska", "codec": "V_VP08", "width": 1920,
                 "height": 1080, "duration_s": 5.0}


def test_mkv_unknown_size_segment_and_typed_errors():
    import struct

    from sif_spark.operators.probe import encode_mkv_stub, probe_mkv

    # unknown-size Segment (what live-muxed webm writes): size vint
    # 0x01FFFFFFFFFFFFFF extends to end-of-buffer
    good = encode_mkv_stub()
    seg_at = good.find(b"\x18\x53\x80\x67")
    body_start = seg_at + 4 + 2  # stub writes a 2-byte size here?
    # rebuild: EBML header + unknown-size segment + original body
    from sif_spark.operators.probe import _ebml_vint
    _, after_id = _ebml_vint(good, seg_at, True)
    size, after_size = _ebml_vint(good, after_id, False)
    rebuilt = good[:after_id] + b"\x01\xff\xff\xff\xff\xff\xff\xff" + good[after_size:]
    assert probe_mkv(rebuilt)["codec"] == "V_VP9"

    with pytest.raises(ValueError, match="not an EBML"):
        probe_mkv(b"nope")
    with pytest.raises(ValueError, match="vint|truncated|runs past"):
        probe_mkv(good[: len(good) // 2])
    with pytest.raises(ValueError, match="no Matroska content"):
        probe_mkv(b"\x1a\x45\xdf\xa3\x80")


def test_mkv_mutation_fuzz_never_hangs():
    import numpy as np

    from sif_spark.operators.probe import encode_mkv_stub, probe_mkv

    rng = np.random.default_rng(31)
    base = bytearray(encode_mkv_stub("webm", 2.0, ("V_VP9", 64, 48),
                                     ("A_OPUS", 48000, 2)))
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            probe_mkv(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_sniff_format_detects_mkv(spark):
    from sif_spark.operators import multimodal as mm
    from sif_spark.operators.probe import encode_mkv_stub

    df = spark.createDataFrame([(encode_mkv_stub(),)], "blob binary")
    assert df.select(mm.sniff_format("blob")).collect()[0][0] == "mkv"


# ---------------------------------------------------------------------------
# Vorbis comments / unified audio tags
# ---------------------------------------------------------------------------


def test_vorbis_comments_flac_and_ogg_roundtrip():
    import numpy as np

    from sif_spark.operators.flac import decode_flac, encode_flac
    from sif_spark.operators.probe import (
        add_flac_tags,
        audio_tags,
        encode_mp3_frames,
        encode_ogg_tags,
        probe_ogg,
        vorbis_comments,
    )

    tags = {"TITLE": "Söng", "ARTIST": "bänd", "DATE": "2026"}
    flac = add_flac_tags(encode_flac(np.zeros((600, 1), np.int32), 16000, 16), tags)
    assert vorbis_comments(flac) == tags
    assert decode_flac(flac).shape == (600, 1)  # audio intact past the block
    ogg = encode_ogg_tags(tags)
    assert vorbis_comments(ogg) == tags
    assert probe_ogg(ogg)["duration_s"] == 0.2  # probe unaffected by the page
    # unified dispatch: all three families + the bare-frames empty map
    assert audio_tags(flac) == tags and audio_tags(ogg) == tags
    assert audio_tags(encode_mp3_frames(2)) == {}
    # key case-insensitivity per spec: lowercase keys normalize
    low = add_flac_tags(
        encode_flac(np.zeros((100, 1), np.int32), 8000, 16), {"title": "x"}
    )
    assert vorbis_comments(low) == {"TITLE": "x"}


def test_vorbis_comments_typed_errors():
    import numpy as np

    from sif_spark.operators.flac import encode_flac
    from sif_spark.operators.probe import add_flac_tags, vorbis_comments

    good = bytearray(add_flac_tags(
        encode_flac(np.zeros((100, 1), np.int32), 8000, 16), {"TITLE": "t"}
    ))
    # forge the comment entry length past the block
    i = bytes(good).find(b"TITLE=")
    good[i - 4 : i] = (1 << 24).to_bytes(4, "little")
    with pytest.raises(ValueError, match="runs past|truncated"):
        vorbis_comments(bytes(good))
    with pytest.raises(ValueError, match="not a FLAC or Ogg"):
        vorbis_comments(b"something else")


def test_attach_audio_tags_spark(spark):
    import numpy as np

    from sif_spark.operators.flac import encode_flac
    from sif_spark.operators.probe import (
        add_flac_tags,
        attach_audio_tags,
        encode_id3,
        encode_mp3_frames,
        encode_ogg_tags,
    )

    flac = add_flac_tags(
        encode_flac(np.zeros((100, 1), np.int32), 8000, 16), {"TITLE": "f"}
    )
    ogg = encode_ogg_tags({"TITLE": "o"})
    mp3 = encode_id3({"TIT2": "m"}, 4) + encode_mp3_frames(2)
    df = spark.createDataFrame(
        [(1, flac), (2, ogg), (3, mp3), (4, b"garbage")],
        "doc_id long, blob binary",
    )
    got = {r["doc_id"]: r["tags"]
           for r in attach_audio_tags(df, "blob", "doc_id").collect()}
    assert got[1] == {"TITLE": "f"}
    assert got[2] == {"TITLE": "o"}
    assert got[3] == {"TIT2": "m"}
    assert got[4] is None


def test_probe_mp4_zero_payload_tkhd_is_typed_error():
    """ADVICE r8: an empty tkhd box at the end of the buffer must raise
    the typed ValueError (not IndexError), so attach_probe's
    on_error='null' contract holds for corrupt blobs."""

    def box(t, p):
        return (8 + len(p)).to_bytes(4, "big") + t + p

    blob = box(b"ftyp", b"mp42\x00\x00\x00\x00") + box(
        b"moov", box(b"trak", box(b"tkhd", b""))
    )
    with pytest.raises(ValueError, match="truncated tkhd"):
        pb.probe_mp4(blob)
    # empty mvhd likewise stays in the typed contract
    blob2 = box(b"ftyp", b"mp42\x00\x00\x00\x00") + box(b"moov", box(b"mvhd", b""))
    with pytest.raises(ValueError, match="truncated mvhd"):
        pb.probe_mp4(blob2)


def test_probe_flac_n_frames_past_int32_through_spark(spark):
    """ADVICE r8: FLAC total_samples is a 36-bit field — a ~13h stream
    legitimately exceeds 2^31. n_frames is LongType and the value
    survives Arrow conversion through attach_probe."""
    total = 1 << 33
    fields = (44100 << 44) | (0 << 41) | (15 << 36) | total
    streaminfo = (
        (4096).to_bytes(2, "big") * 2  # min/max blocksize
        + bytes(6)  # min/max framesize
        + fields.to_bytes(8, "big")
        + bytes(16)  # md5
    )
    blob = b"fLaC" + bytes([0x80, 0, 0, 34]) + streaminfo
    got = pb.probe_media(blob)
    assert got["n_frames"] == total and got["channels"] == 1

    df = spark.createDataFrame([(1, blob)], "doc_id long, blob binary")
    out = pb.attach_probe(df, "blob", "doc_id")
    assert dict(out.select("probe.*").dtypes)["n_frames"] == "bigint"
    row = out.select("probe.n_frames").first()
    assert row[0] == total
