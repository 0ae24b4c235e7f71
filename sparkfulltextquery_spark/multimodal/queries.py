"""Registered multimodal queries + DuckDB oracles.

The fake decoder is pure byte arithmetic, so even the mapInPandas feature
path has an exact SQL oracle — proving the Arrow plumbing end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.multimodal import as_media_table, extract_features
from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


@query(
    "multimodal_blob_stats",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text)                  AS content_md5,
           'text/plain'               AS mime
    FROM documents WHERE doc_id < 200
    """,
)
def multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload plumbing: byte length + content hash over BinaryType,
    metadata struct fields projected out."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = as_media_table(d)
    return media.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5(F.decode(F.col("payload"), "utf-8")).alias("content_md5"),
        F.col("meta.mime").alias("mime"),
    )


@query(
    "multimodal_fake_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           array_to_string([octet_length(encode(text))::BIGINT,
            ascii(substr(text, 1, 1)),
            ascii(substr(text, length(text), 1)),
            cast(list_sum(list_transform(range(1, length(text) + 1),
                          i -> ascii(substr(text, i, 1)))) AS bigint) % 997
           ], ',') AS feat_str
    FROM documents WHERE doc_id < 100
    """,
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction with the deterministic fake decoder —
    the full Arrow round-trip (binary + struct in, array<double> out),
    oracle-checked byte-for-byte. NOTE: the oracle's byte arithmetic assumes
    ASCII text (true for the synthetic corpus); the Spark side operates on
    raw bytes and is encoding-correct in general."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    feats = extract_features(as_media_table(d), mode="fake")
    # feature values are integral by construction — project the array to a
    # joined string so the comparison layer is immune to numpy-vs-list
    # rendering; the mapInPandas stage still produces the real array column
    return feats.select(
        "doc_id",
        "n_bytes",
        F.concat_ws(
            ",", F.transform("feat", lambda x: x.cast("bigint").cast("string"))
        ).alias("feat_str"),
    )


@query(
    "multimodal_size_rollup",
    oracle="""
    SELECT meta_source AS source,
           count(*) AS n_assets,
           cast(sum(octet_length(encode(text))) AS bigint) AS total_bytes,
           max(octet_length(encode(text)))      AS max_bytes
    FROM (SELECT source AS meta_source, text FROM documents)
    GROUP BY meta_source
    """,
)
def multimodal_size_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset-size accounting by source — the storage-budget query; groups on
    a metadata struct field."""
    d = load_table(spark, sf_dir, "documents")
    media = as_media_table(d)
    return media.groupBy(F.col("meta.source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


_FRAME_SIZE = 64
_FRAME_EVERY = 3  # keep every 3rd frame

_FRAME_ORACLE = f"""
    WITH frames AS (
      SELECT doc_id,
             unnest(range(0, CAST(ceil(length(text) / {_FRAME_SIZE}.0) AS BIGINT)))
               AS frame_idx,
             text
      FROM documents WHERE doc_id < 150
    )
    SELECT doc_id, frame_idx,
           CAST(length(substr(text, frame_idx * {_FRAME_SIZE} + 1, {_FRAME_SIZE}))
                AS BIGINT) AS frame_len,
           md5(substr(text, frame_idx * {_FRAME_SIZE} + 1, {_FRAME_SIZE})) AS frame_md5
    FROM frames
    WHERE frame_idx % {_FRAME_EVERY} = 0
"""


@query("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media payloads (the video-path plumbing of
    the north-star multimodal column): each payload is cut into fixed-size
    frames, every k-th frame is kept, and per-frame features (here: length
    + content digest; a real pipeline would decode/resize) are computed in
    an Arrow-batched mapInPandas stage. The 1→N frame expansion happens
    INSIDE the Python stage — batch shape (one row per sampled frame) and
    schema are exactly what a GPU feature-extractor consumes.

    Deterministic digest (md5) ⇒ exact DuckDB oracle despite the Python
    boundary. ASCII-synthetic corpus makes char slicing == byte slicing
    (see multimodal_fake_features note)."""
    import hashlib

    import pandas as pd

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150).select(
        "doc_id", "text"
    )

    def frames(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = -(-len(text) // _FRAME_SIZE)
                for i in range(0, n, _FRAME_EVERY):
                    frame = text[i * _FRAME_SIZE : (i + 1) * _FRAME_SIZE]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame.encode()).hexdigest())
            yield pd.DataFrame(out)

    return d.mapInPandas(
        frames,
        schema="doc_id bigint, frame_idx bigint, frame_len bigint, frame_md5 string",
    )


_IMG_W = 32       # fake image width in bytes (rows = len(text) // W)
_IMG_BLOCK = 4    # resize: 4x4 block aggregation

_RESIZE_ORACLE = f"""
    WITH img AS (
      SELECT doc_id, text,
             length(text) // {_IMG_W} AS n_rows
      FROM documents WHERE doc_id < 100 AND length(text) >= {_IMG_W * _IMG_BLOCK}
    ),
    cells AS (
      SELECT doc_id, text,
             unnest(range(0, n_rows // {_IMG_BLOCK})) AS out_r,
             CAST({_IMG_W} / {_IMG_BLOCK} AS BIGINT) AS out_cols
      FROM img
    ),
    expanded AS (
      SELECT doc_id, text, out_r, unnest(range(0, out_cols)) AS out_c FROM cells
    )
    SELECT doc_id, out_r, out_c,
           CAST(list_sum(list_transform(range(0, {_IMG_BLOCK * _IMG_BLOCK}),
             k -> ascii(substr(text,
               CAST((out_r * {_IMG_BLOCK} + k // {_IMG_BLOCK}) * {_IMG_W}
                    + out_c * {_IMG_BLOCK} + (k % {_IMG_BLOCK}) + 1 AS INT),
               1)))) AS BIGINT) AS block_sum
    FROM expanded
"""


@query("multimodal_thumbnail_resize", oracle=_RESIZE_ORACLE)
def multimodal_thumbnail_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (the image path of the multimodal north star): the
    payload is interpreted as a W×H byte grid and downsampled by 4×4 block
    aggregation — one output row per thumbnail cell with the exact block
    sum (a real pipeline divides by block area and writes pixels; the sum
    keeps the oracle integer-exact). Runs in the same Arrow-batched
    mapInPandas stage shape as decode/feature-extract/frame-sample; numpy
    does the grid reshape per batch.

    Scale: per-row work is O(payload); output is (H/b)×(W/b) rows per image
    — the expansion is bounded by the thumbnail size, not the source."""
    import numpy as np
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 100) & (F.length("text") >= _IMG_W * _IMG_BLOCK))
        .select("doc_id", "text")
    )

    def resize(batches):
        b = _IMG_BLOCK
        for pdf in batches:
            out = {"doc_id": [], "out_r": [], "out_c": [], "block_sum": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n_rows = len(text) // _IMG_W
                grid = np.frombuffer(
                    text[: n_rows * _IMG_W].encode("ascii", "replace"), dtype=np.uint8
                ).reshape(n_rows, _IMG_W)
                hb, wb = n_rows // b, _IMG_W // b
                if hb == 0:
                    continue
                block = (
                    grid[: hb * b, : wb * b]
                    .reshape(hb, b, wb, b)
                    .sum(axis=(1, 3), dtype=np.int64)
                )
                for r in range(hb):
                    for c in range(wb):
                        out["doc_id"].append(doc_id)
                        out["out_r"].append(r)
                        out["out_c"].append(c)
                        out["block_sum"].append(int(block[r, c]))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        resize, schema="doc_id bigint, out_r bigint, out_c bigint, block_sum bigint"
    )
