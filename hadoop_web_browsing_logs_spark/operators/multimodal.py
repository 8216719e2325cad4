"""Multimodal columns — opaque ``binary`` payloads + typed metadata, with
decode/feature-extract/resize/frame-sample as Arrow-batched ``mapInPandas``
operators (SURVEY north-star: LLM-data-pipeline surface).

The container ships no image/audio codecs, so the codec call itself is
STUBBED: :func:`decode_media` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested. Everything around it — the schema,
the binary column handling, the Arrow batch shapes, the partition sizing —
is real and tested; swapping in Pillow/librosa later only changes the inner
function body.

Scale notes: payloads ride in parquet binary columns; feature extraction is
``mapInPandas`` (one Arrow batch in → one out, no Python-per-row overhead);
``spark.sql.files.maxPartitionBytes`` bounds per-task memory since binary
rows are fat. Metadata predicates (media_type, width, dur) prune at the scan
before any Python runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ._util import t

FEATURE_DIM = 4

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, payload BINARY, "
    "meta_width INT, meta_height INT, meta_duration_s DOUBLE"
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: the UTF-8 text
    bytes stand in for an encoded payload; metadata derives from n_chars.
    (The fixtures carry no real media — this is the documented stand-in.)"""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 640 + 16).cast("int").alias("meta_width"),
        (F.col("n_chars") % 480 + 16).cast("int").alias("meta_height"),
        (F.col("n_chars") / 100.0).alias("meta_duration_s"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> bytes:
    """Codec boundary. Real decoders (Pillow / soundfile / pyav) are not in
    this container — STUB; ``fake=True`` gives a deterministic byte-reversal
    'decode' so the downstream plumbing is exercisable end-to-end."""
    if not fake:
        raise NotImplementedError(
            f"no {media_type} codec in this environment — install Pillow/soundfile/pyav "
            "and replace this stub"
        )
    return payload[::-1]


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic FEATURE_DIM-dim 'embedding': MD5 bytes scaled to [0,1] —
    portable (MD5 is MD5 everywhere), so the oracle can recompute it."""
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: the canonical
    multimodal operator shape (decode → featurize per batch)."""
    out_schema = (
        "doc_id BIGINT, media_type STRING, n_bytes INT, checksum STRING, features ARRAY<DOUBLE>"
    )

    # NULL payloads are undecodable; drop them before any Python runs (a
    # metadata predicate, pruned at the scan). The round-7 adversarial
    # fixture's NULL-text doc otherwise crashed the Arrow batch on
    # bytes(None); exclusion is mirrored in the oracle's text IS NOT NULL.
    media = media.filter(F.col("payload").isNotNull())

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(lambda p: decode_media(bytes(p), "any", fake=True))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "checksum": pdf["payload"].map(lambda p: hashlib.md5(bytes(p)).hexdigest()),
                    "features": decoded.map(lambda p: _fake_features(bytes(p)[::-1])),
                }
            )

    return media.mapInPandas(featurize, schema=out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize operator: metadata updates JVM-side; pixel work is the stubbed
    codec call (NotImplementedError without a real decoder)."""
    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf["payload"].map(lambda p: decode_media(bytes(p), "image"))  # raises: stub
            yield pdf

    return (
        media.filter(F.col("media_type") == "image")
        .withColumn("meta_width", F.lit(width))
        .withColumn("meta_height", F.lit(height))
        .mapInPandas(do_resize, schema=MEDIA_SCHEMA)
    )


def sample_frames(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp — the
    row-explosion is computed JVM-side from metadata (sequence over the
    duration); frame decode is the stubbed codec call."""
    n_frames = F.greatest(F.floor(F.col("meta_duration_s") / every_s).cast("int"), F.lit(1))
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_s", F.col("frame_idx") * every_s)
    )


@query(
    "q_multimodal_features",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END                       AS media_type,
           octet_length(encode(text))                  AS n_bytes,
           md5(text)                                   AS checksum,
           array_to_string(list_transform(range(1, {FEATURE_DIM + 1}),
               i -> (strpos('0123456789abcdef', substr(md5(text), 2*i-1, 1)) - 1) * 16
                    + strpos('0123456789abcdef', substr(md5(text), 2*i, 1)) - 1), ',') AS features_str
    FROM documents
    WHERE doc_id % 4 = 0 AND text IS NOT NULL
    """,
    category="multimodal",
    description="Multimodal feature extraction: binary payload → mapInPandas (Arrow batches) → checksum + deterministic MD5-derived features; oracle recomputes the same bytes in SQL.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    feats = extract_features(synth_media(docs))
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "checksum",
        # features are digest_byte/255 doubles; serialize as the exact byte
        # ints so the oracle compares integers, not printf'd floats
        F.array_join(
            F.transform("features", lambda x: F.round(x * 255).cast("int")), ","
        ).alias("features_str"),
    )


@query(
    "q_multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(n_chars % 640 + 16 AS INTEGER)  AS meta_width,
           frame_idx,
           frame_idx * CAST(0.5 AS DOUBLE)      AS frame_ts_s  -- bare 0.5 is DECIMAL in DuckDB
    FROM documents,
         UNNEST(range(0, GREATEST(CAST(FLOOR((n_chars / 100.0) / 0.5) AS INTEGER), 1))) AS u(frame_idx)
    WHERE doc_id % 3 = 2
    """,
    category="multimodal",
    description="Video frame sampling: metadata-driven row explosion (sequence over duration) ahead of the stubbed per-frame decode.",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(t(spark, sf_dir, "documents"))
    return sample_frames(media, every_s=0.5).select(
        "doc_id", "meta_width", "frame_idx", "frame_ts_s"
    )
