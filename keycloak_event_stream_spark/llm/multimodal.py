"""Multimodal columns for LLM data pipelines (north-star mandate).

Treats media as opaque ``binary`` columns with typed metadata structs,
exactly how a 100 TB multimodal corpus is laid out in parquet:

- ``q_multimodal_cols``  — bundle text + embedding + metadata into one
  typed struct column (the "sample" record), then project scalars out.
- ``q_multimodal_media`` — synthesize a deterministic binary payload per
  document (stand-in for image bytes; the container has no image codecs)
  and run a real Arrow-batched ``mapInPandas`` feature-extraction pass
  over it: byte histogram stats + parsed header fields. The *plumbing*
  (schema, batch shape, binary transport through Arrow) is production
  shape; only the codec is a deterministic fake.

``decode_image`` is the genuine decode hook: it dispatches to PIL when
available and raises ``NotImplementedError`` otherwise — clearly marked
stub per the build contract.

Scale notes: media bytes never shuffle — the mapInPandas pass is
map-side only, and anything that aggregates does so on the small
extracted features. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``; with ~MB-scale real
images you lower that instead of letting batches balloon.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from keycloak_event_stream_spark.catalog import load_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


@_q(
    "q_multimodal_cols",
    oracle="""
    SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
           CAST(len(e.embedding) AS INTEGER) AS emb_dim,
           sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[]))) AS emb_l2
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def q_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One typed struct column per sample bundling text + embedding +
    metadata (the multimodal record layout), scalars projected back out
    for the oracle. Nested-struct projection is free in parquet — only
    the accessed leaves are read."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    bundled = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.struct(
            F.col("text"),
            F.struct(
                F.col("lang"), F.col("source"), F.col("n_chars")
            ).alias("meta"),
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.col("label"),
        ).alias("sample"),
    )
    dot = (
        "aggregate(zip_with(sample.embedding, sample.embedding, "
        "(x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return bundled.select(
        "doc_id",
        F.col("sample.meta.lang").alias("lang"),
        F.col("sample.meta.source").alias("source"),
        F.col("sample.meta.n_chars").alias("n_chars"),
        F.col("sample.label").alias("label"),
        F.size("sample.embedding").alias("emb_dim"),
        F.sqrt(F.expr(dot)).alias("emb_l2"),
    )


# ---------------------------------------------------------------------------
# Binary media plumbing (deterministic fake codec, real Arrow path)
# ---------------------------------------------------------------------------

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_max", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def with_fake_media(df: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + metadata struct to each
    document: payload = md5(text) bytes repeated 4x (64 bytes), header =
    (width, height) derived from doc_id. Stands in for image bytes so
    the binary-column pipeline is fully testable without codecs."""
    payload = F.unhex(
        F.concat(F.md5("text"), F.md5("text"), F.md5("text"), F.md5("text"))
    )
    return df.select(
        "doc_id",
        payload.alias("media"),
        F.struct(
            (64 + (F.col("doc_id") % 512)).cast("int").alias("width"),
            (64 + ((F.col("doc_id") * 7) % 512)).cast("int").alias("height"),
            F.lit("fake/raw").alias("mime"),
        ).alias("media_meta"),
    )


def extract_media_features(batches: Iterator, _unused=None) -> Iterator:
    """mapInPandas worker: per Arrow batch, compute byte-level features
    of the binary column. Real decode would replace the histogram with
    codec output; the batch interface is identical."""
    import pandas as pd

    for pdf in batches:
        media = pdf["media"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": media.map(len).astype("int32"),
                "byte_sum": media.map(lambda b: sum(b)).astype("int64"),
                "byte_max": media.map(lambda b: max(b)).astype("int32"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def decode_image(data: bytes):
    """Decode image bytes to a pixel array. STUB: the container ships no
    image codecs; dispatches to PIL if present, else raises."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(data))
    except ImportError as exc:  # pragma: no cover - codec not installed
        raise NotImplementedError(
            "image decode requires PIL; install pillow on the cluster "
            "or swap in your codec here"
        ) from exc


@_q("q_multimodal_media")  # binary + pandas path — rows-only check
def q_multimodal_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline end-to-end: attach payload+metadata, then a
    vectorized Arrow ``mapInPandas`` feature-extraction pass. Map-side
    only — media bytes never shuffle."""
    d = load_table(spark, sf_dir, "documents")
    media = with_fake_media(d).select(
        "doc_id", "media", F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
    return media.mapInPandas(extract_media_features, MEDIA_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize / frame-sample plumbing (video-shaped binary, deterministic fake)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_sum", T.LongType()),
    ]
)


def sample_frames(batches: Iterator, frame_bytes: int = 16, stride: int = 2) -> Iterator:
    """mapInPandas UDTF-shape: split each binary payload into fixed-size
    "frames" and emit every ``stride``-th one — the frame-sampling
    pattern for video columns (one input row -> many output rows). Real
    decoders swap in here; the Arrow batch interface and the 1->N row
    fan-out are the production shape."""
    import pandas as pd

    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame": [], "frame_sum": []}
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            n = len(blob) // frame_bytes
            for i in range(0, n, stride):
                fr = bytes(blob[i * frame_bytes:(i + 1) * frame_bytes])
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame"].append(fr)
                out["frame_sum"].append(sum(fr))
        yield pd.DataFrame(out)


def resize_image(data: bytes, width: int, height: int):
    """Resize stub: dispatches to PIL when available, else raises —
    clearly-marked placeholder for the codec-dependent step."""
    img = decode_image(data)  # raises NotImplementedError without PIL
    return img.resize((width, height))  # pragma: no cover


@_q("q_multimodal_frames")  # binary fan-out — rows-only check
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-shaped binary columns: 64-byte payload
    -> four 16-byte frames -> every 2nd kept (2 rows per doc). Map-side
    1->N fan-out; frames never shuffle."""
    d = load_table(spark, sf_dir, "documents")
    media = with_fake_media(d).select("doc_id", "media")
    return media.mapInPandas(sample_frames, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Audio-shaped binary: windowed energy features
# ---------------------------------------------------------------------------

AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def decode_audio(data: bytes, sample_rate: int = 16000):
    """Decode compressed audio bytes to PCM. STUB: the container ships
    no audio codecs; dispatches to soundfile/librosa if present, else
    raises. The windowing below consumes raw PCM directly, so only
    compressed formats need this hook."""
    try:  # pragma: no cover - codec not in container
        import soundfile  # noqa: F401

        raise NotImplementedError("wire soundfile.read here on a real cluster")
    except ImportError:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa; install on the "
            "cluster image. Raw-PCM inputs skip this hook entirely."
        )


def window_audio(
    batches: Iterator, window: int = 32, hop: int = 16
) -> Iterator:
    """Interpret each binary payload as 16-bit little-endian PCM and
    emit overlapping analysis windows (``window`` samples every ``hop``)
    with integer energy (Σx²) and peak |x| per window — the framing +
    feature pass of every audio pipeline (VAD, loudness filtering,
    silence trimming), expressed as a map-side 1->N fan-out: windows
    are derived and reduced inside the scan stage and never shuffle.

    Integer features keep the op deterministic without codec floats;
    a real feature extractor swaps the energy line for an FFT and the
    schema for an array<float> column — the plumbing (Arrow batches,
    fan-out, schema) is exactly this."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = {
            "doc_id": [],
            "window_idx": [],
            "n_samples": [],
            "energy": [],
            "peak": [],
        }
        for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
            pcm = np.frombuffer(
                bytes(blob)[: (len(blob) // 2) * 2], dtype="<i2"
            ).astype(np.int64)
            idx = 0
            for start in range(0, max(len(pcm) - window + 1, 1), hop):
                w = pcm[start : start + window]
                if len(w) == 0:
                    continue
                out["doc_id"].append(doc_id)
                out["window_idx"].append(idx)
                out["n_samples"].append(int(len(w)))
                out["energy"].append(int((w * w).sum()))
                out["peak"].append(int(np.abs(w).max()))
                idx += 1
        yield pd.DataFrame(out)


@_q("q_multimodal_audio")  # binary fan-out — rows-only check
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed energy features over audio-shaped binary columns: the
    document's UTF-8 bytes stand in for a PCM payload (the container
    has no audio codecs — see decode_audio for the gated decode hook);
    every 32-sample window at hop 16 yields integer Σx² and peak.
    Map-side fan-out; windows never shuffle."""
    d = load_table(spark, sf_dir, "documents")
    audio = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("audio")
    )
    return audio.mapInPandas(window_audio, AUDIO_WINDOW_SCHEMA)
