"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schema, partitioning, UDF signature, Arrow
batch shape) is real and tested; the codec step is STUBBED because this
container ships no image/audio libraries — ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic content-hash-derived feature vector so the distributed
pipeline is exercisable end-to-end.

Reference analog: the reference lifts figures/tables out of documents
into typed ``ref_entries`` with captions
(/root/reference/src/parse_latex_tralics.py:322-415) — the same
"opaque payload + structured metadata travels with the row" pattern.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, conv_id string, kind string, payload binary, "
    "mime string, width int, height int, duration_ms int"
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id string, conv_id string, kind string, n_bytes long, "
    "sha1 string, features array<float>"
)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """STUB: real decode needs PIL/libvips (not in this container).

    ``fake=True`` → deterministic pseudo-features from the payload hash
    (stable across runs/partitions, so tests can assert exact values).
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Distributed feature extraction over binary payloads.

    ``mapInPandas``: one Arrow batch in, one out — payload bytes never
    round-trip through Python row objects. Partitioning is preserved
    (narrow transform), so a repartition("conv_id") upstream co-locates
    features with their conversations for the downstream join.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "conv_id": pdf["conv_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "sha1": payloads.map(
                        lambda b: hashlib.sha1(b or b"").hexdigest()
                    ),
                    "features": payloads.map(
                        lambda b: decode_image(b or b"", fake=fake)
                    ),
                }
            )

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


def gunzip_payloads(media: DataFrame, col: str = "payload") -> DataFrame:
    """S2 gz-member scan analog: decode gzip-compressed binary payloads
    in place (stdlib ``gzip`` — a real codec, NOT a stub) via
    Arrow-batched ``mapInPandas``. Narrow transform: no shuffle, bytes
    never round-trip through Python row objects, malformed/NULL members
    decode to NULL (reference skips unreadable members rather than
    failing the archive).

    Reference analog: per-member ``gzip.open`` inside the TAR scan
    (/root/reference/src/prepare.py — .gz members hold the LaTeX
    sources); here the member is a binary column.
    """
    import gzip as _gzip

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def gunzip(b):
            if b is None:
                return None
            try:
                return _gzip.decompress(bytes(b))
            except (OSError, EOFError):
                return None  # unreadable member → NULL, not a crash

        for pdf in batches:
            pdf = pdf.copy()
            pdf[col] = pdf[col].map(gunzip)
            yield pdf

    return media.mapInPandas(decode, schema=media.schema)


def synth_media(spark, transcripts: DataFrame, per_conv: int = 1) -> DataFrame:
    """Deterministic fake media table keyed to conversations: payload =
    utf-8 of a seeded string (stands in for real image bytes)."""
    convs = transcripts.select("conv_id").distinct()
    return convs.select(
        F.concat(F.col("conv_id"), F.lit("-m0")).alias("media_id"),
        "conv_id",
        F.lit("image").alias("kind"),
        F.encode(F.concat(F.lit("payload|"), F.col("conv_id")), "utf-8").alias(
            "payload"
        ),
        F.lit("image/fake").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def media_stats_by_kind(features: DataFrame) -> DataFrame:
    """Reporting over extracted features (bytes histogram per kind)."""
    return features.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("sha1").alias("n_distinct_payloads"),
    )
