"""Multimodal columns: opaque binary payloads + typed metadata.

Design (SURVEY.md §1.2 / north star): media assets are `BinaryType` payload
columns with a nested `StructType` metadata column — never parsed driver-side,
moved only inside Arrow batches. Decode / feature-extraction runs as
`mapInPandas` (per-partition Arrow batch iterator), the engine's only
sanctioned Python surface.

The actual image/audio codecs are NOT in this container, so `decode_media`
raises NotImplementedError unless mode="fake"; the fake decoder is
deterministic (derived from payload bytes) so the Spark-side plumbing —
schema, batch shape, partitioning — is real and oracle-testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id bigint, payload binary, meta struct<mime:string,n_bytes:bigint,source:string>"


def as_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a text corpus as a media table: payload = utf-8 bytes, metadata
    struct alongside. Stand-in for real image/audio ingestion; the schema and
    partitioning are exactly what a binary corpus uses."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str, mode: str = "strict") -> list[float]:
    """Decode one payload to a feature vector.

    Real codecs (PIL/librosa/av) are unavailable in this environment — the
    strict path is an explicit stub. mode="fake" produces a deterministic
    4-dim feature from the bytes (length, first/last byte, checksum mod 997)
    so pipelines are testable end-to-end.
    """
    if mode != "fake":
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment; use mode='fake' "
            "or install a codec and extend decode_media"
        )
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        float(len(payload)),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
    ]


def extract_features(media: DataFrame, mode: str = "fake") -> DataFrame:
    """mapInPandas feature extraction: (doc_id, n_bytes, feat array<double>).

    Arrow-batched; each batch is decoded in vectorized Python. At 100 TB this
    is the shape of every media-processing stage: narrow schema in, bounded
    feature vector out, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(bytes(p), m["mime"], mode=mode)
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feat": feats,
                }
            )

    return media.mapInPandas(batches, schema="doc_id bigint, n_bytes bigint, feat array<double>")


# registered queries import the helpers above; keep this import last
from sparkfulltextquery_spark.multimodal import queries  # noqa: E402,F401
