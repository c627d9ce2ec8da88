"""Binary media plumbing: deterministic payloads, Arrow batch shape."""

from __future__ import annotations

import hashlib

import pytest

from keycloak_event_stream_spark.llm import multimodal


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"document number {i} text body", "en", "s", 20) for i in range(10)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _payload(text: bytes) -> bytes:
    return b"".join(
        hashlib.md5(text + sfx).digest() for sfx in (b"", b"x", b"y", b"z")
    )


def test_fake_media_payload_deterministic(docs):
    out = multimodal.with_fake_media(docs).collect()
    by_id = {r.doc_id: r for r in out}
    expect = _payload(b"document number 3 text body")
    assert bytes(by_id[3].media) == expect
    assert by_id[3].media_meta.width == 64 + 3 % 512
    assert by_id[3].media_meta.mime == "fake/raw"


def test_media_feature_extraction_values(docs):
    import pyspark.sql.functions as F

    media = multimodal.with_fake_media(docs).select(
        "doc_id",
        "media",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
    feats = {
        r.doc_id: r
        for r in media.mapInPandas(
            multimodal.extract_media_features, multimodal.MEDIA_FEATURE_SCHEMA
        ).collect()
    }
    raw = _payload(b"document number 7 text body")
    assert feats[7].n_bytes == 64
    assert feats[7].byte_sum == sum(raw)
    assert feats[7].byte_max == max(raw)
    assert feats[7].width == 64 + 7 % 512


def test_feature_schema_stable(docs):
    import pyspark.sql.functions as F

    media = multimodal.with_fake_media(docs).select(
        "doc_id",
        "media",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
    df = media.mapInPandas(
        multimodal.extract_media_features, multimodal.MEDIA_FEATURE_SCHEMA
    )
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "n_bytes", "byte_sum", "byte_max", "width", "height",
    ]


def test_decode_image_stub_raises_without_codec():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub dispatches to it")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n")


def test_frame_sampling_fan_out(docs):
    import hashlib

    from keycloak_event_stream_spark.llm import multimodal as mm

    media = mm.with_fake_media(docs).select("doc_id", "media")
    frames = media.mapInPandas(mm.sample_frames, mm.FRAME_SCHEMA).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 64-byte payload, 16-byte frames, stride 2 -> frames 0 and 2
    assert all(len(v) == 2 for v in by_doc.values())
    raw = _payload(b"document number 4 text body")
    f0, f2 = sorted(by_doc[4], key=lambda r: r.frame_idx)
    assert f0.frame_hex == raw[:16].hex()
    assert f0.frame_sum == sum(raw[:16])
    assert f2.frame_idx == 2
    assert f2.frame_hex == raw[32:48].hex()  # md5(text || 'y')


def test_resize_stub_raises_without_codec():
    import pytest as _pytest

    from keycloak_event_stream_spark.llm import multimodal as mm

    try:
        import PIL  # noqa: F401

        _pytest.skip("PIL present")
    except ImportError:
        pass
    with _pytest.raises(NotImplementedError):
        mm.resize_image(b"xx", 8, 8)


def test_audio_windowing_semantics(spark):
    """window_audio: 16-bit LE PCM framing — window/hop arithmetic,
    integer energy, peak magnitude — pinned on a constructed payload."""
    import numpy as np
    import pandas as pd

    from keycloak_event_stream_spark.llm.multimodal import window_audio

    pcm = np.array([1, -2, 3, -4, 5, -6, 7, -8], dtype="<i2")
    pdf = pd.DataFrame({"doc_id": [7], "audio": [pcm.tobytes()]})
    (out,) = list(window_audio(iter([pdf]), window=4, hop=2))
    # windows: [1,-2,3,-4], [3,-4,5,-6], [5,-6,7,-8]
    assert list(out["window_idx"]) == [0, 1, 2]
    assert list(out["n_samples"]) == [4, 4, 4]
    assert list(out["energy"]) == [
        1 + 4 + 9 + 16,
        9 + 16 + 25 + 36,
        25 + 36 + 49 + 64,
    ]
    assert list(out["peak"]) == [4, 6, 8]
    assert all(out["doc_id"] == 7)


def test_audio_query_runs(spark):
    from keycloak_event_stream_spark.registry import collect

    qs, _ = collect()
    df = qs["q_multimodal_audio"](spark, "/root/testdata/sf0.001")
    rows = df.limit(5).collect()
    assert len(rows) == 5
    assert all(r.energy > 0 for r in rows)


def test_ppm_roundtrip_and_corrupt_detection():
    """The PPM parser is a real byte-level decoder: valid images parse
    to the generating dimensions; corrupt magic/truncation raise."""
    import pandas as pd

    from keycloak_event_stream_spark.llm import multimodal as mm

    (enc,) = list(mm.ppm_encode(iter([pd.DataFrame({"doc_id": [11]})])))
    blob = enc["media"][0]
    w, h = 4 + 11 % 5, 3 + 11 % 4
    assert blob.startswith(f"P6\n{w} {h}\n255\n".encode())
    (dec,) = list(mm.ppm_decode_features(iter([enc])))
    assert dec["width"][0] == w and dec["height"][0] == h
    assert dec["n_pix_bytes"][0] == w * h * 3
    assert dec["pixel_sum"][0] == sum((31 * 11 + 7 * k) % 256 for k in range(w * h * 3))
    bad = pd.DataFrame({"doc_id": [1], "media": [b"P5\n1 1\n255\n\x00"]})
    with pytest.raises(ValueError, match="P6"):
        list(mm.ppm_decode_features(iter([bad])))
    trunc = pd.DataFrame({"doc_id": [1], "media": [blob[:-1]]})
    with pytest.raises(ValueError, match="truncated"):
        list(mm.ppm_decode_features(iter([trunc])))


def test_wav_roundtrip_and_header_assertions():
    import struct

    import pandas as pd

    from keycloak_event_stream_spark.llm import multimodal as mm

    (enc,) = list(mm.wav_encode(iter([pd.DataFrame({"doc_id": [5]})])))
    blob = enc["audio"][0]
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    assert len(blob) == 44 + 2 * mm.WAV_N_SAMPLES
    (dec,) = list(mm.wav_decode_windows(iter([enc])))
    assert list(dec["window_idx"]) == [0, 1, 2]
    assert all(dec["sample_rate"] == mm.WAV_RATE)
    expect0 = sum(((13 * 5 + 17 * k) % 4096 - 2048) ** 2 for k in range(32))
    assert dec["energy"][0] == expect0
    # stereo header must be rejected
    stereo = bytearray(blob)
    stereo[22:24] = struct.pack("<H", 2)
    bad = pd.DataFrame({"doc_id": [5], "audio": [bytes(stereo)]})
    with pytest.raises(ValueError, match="mono"):
        list(mm.wav_decode_windows(iter([bad])))
