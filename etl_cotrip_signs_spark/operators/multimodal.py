"""Multimodal column plumbing [EXT]: opaque binary payloads + typed metadata.

Images/audio/video are modeled as `binary` columns with a metadata struct —
the schema/partitioning/UDF-batch plumbing is real and tested; the actual
codec work is STUBBED (this container has no image/audio libraries) behind
a deterministic fake decoder, with the real-decoder seam marked.

The `documents.text` bytes stand in for blob payloads so the fixtures
exercise realistic per-row byte volumes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions.xxh64_sql import XXH64_MACROS
from ..io import load_table
from ..registry import query

# Decoded-feature schema produced by the (stubbed) decoder.
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ]
)


def blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct) — the multimodal shape.

    Real deployments swap this for `spark.read.format("binaryFile")` or a
    parquet table with a binary column; metadata travels as a typed struct
    so filters on it (width, codec …) push down without touching payloads.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (64 + F.col("doc_id") % 192).cast("int").alias("width"),
            (64 + (F.col("doc_id") * 7) % 192).cast("int").alias("height"),
            F.lit("fake/rgb8").alias("codec"),
        ).alias("meta"),
    )


def decode_features(blob_df: DataFrame, batch_hint: int = 64) -> DataFrame:
    """'Decode' payloads into fixed-width feature vectors via mapInPandas.

    Arrow-batched, partition-parallel — the exact execution shape a real
    image decode would use. The decode itself is a deterministic fake
    (byte-histogram over 8 buckets); swap `_fake_decode` for a real codec
    (PIL / torchaudio / pyav) in deployments that have one.
    """

    def _fake_decode(payload: bytes) -> np.ndarray:
        # STUB: stands in for image/audio decode. NotImplementedError is the
        # contract marker for real-codec integration.
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr % 8, minlength=8).astype("float64")
        return hist / max(len(arr), 1)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "mean_byte": payloads.map(
                        lambda b: float(np.frombuffer(b, dtype=np.uint8).mean())
                    ),
                    "feat": payloads.map(lambda b: _fake_decode(b).tolist()),
                }
            )

    return blob_df.mapInPandas(decode, DECODE_SCHEMA)


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))        AS n_bytes,
           64 + doc_id % 192                 AS width,
           64 + (doc_id * 7) % 192           AS height,
           (64 + doc_id % 192) * (64 + (doc_id * 7) % 192) AS n_pixels
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only pass over blobs: no payload is ever decoded (the
    column-pruning win that matters when payloads are MBs)."""
    b = blobs(spark, sf_dir)
    return b.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
        (F.col("meta.width").cast("long") * F.col("meta.height").cast("long")).alias(
            "n_pixels"
        ),
    )


@query(
    "multimodal_decode_stub",
    # The fixture payloads are ASCII (byte == codepoint, asserted by this
    # very comparison), so DuckDB can replay the fake decoder's byte
    # histogram with per-character codepoints — hash-checking that the
    # mapInPandas Arrow plumbing preserves every value end-to-end.
    oracle="""
    WITH codes AS (
        SELECT doc_id,
               list_transform(split(text, ''), c -> ascii(c)) AS cs
        FROM documents
    )
    SELECT doc_id,
           CAST(len(cs) AS BIGINT) AS n_bytes,
           round(list_avg(cs), 4) AS mean_byte,
           round(CAST(len(list_filter(cs, c -> c % 8 = 0)) AS DOUBLE)
                 / greatest(len(cs), 1), 6) AS feat0,
           CAST(8 AS BIGINT) AS feat_dim
    FROM codes
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode pipeline: blobs → mapInPandas decode → feature columns."""
    out = decode_features(blobs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_bytes",
        F.round("mean_byte", 4).alias("mean_byte"),
        F.round(F.element_at("feat", 1), 6).alias("feat0"),
        F.size("feat").cast("long").alias("feat_dim"),
    )


@query(
    "multimodal_frame_sample",
    # r5 graduation from rows-only: the frame hash is Spark xxhash64 (seed
    # 42) over each 32-byte payload slice, reproduced exactly by the DuckDB
    # XXH64 macros (functions/xxh64_sql.py). frame_idx is the position in
    # the SAMPLED list (posexplode semantics), not the source frame number.
    oracle=XXH64_MACROS + """
    WITH t AS (
        SELECT doc_id, encode(text) AS payload,
               (octet_length(encode(text)) // 32)::INT AS nf
        FROM documents
    ),
    s AS (
        SELECT doc_id, payload,
               list_filter(range(0, nf), i -> i % 4 = 0) AS keep
        FROM t
    )
    SELECT doc_id,
           CAST(u.j AS INT) AS frame_idx,
           -- DuckDB 1.0 cannot substring a BLOB; slice via hex (2 chars/byte)
           xxh64_signed(from_hex(substring(hex(payload),
                                           (keep[u.j::INT + 1] * 64 + 1)::INT, 64)),
                        42::UBIGINT) AS frame_hash
    FROM s, UNNEST(range(0, len(keep))) AS u(j)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling: slice each payload into fixed-width frames,
    keep every 4th, fingerprint each — pure builtin substring/sequence
    (no Python), demonstrating frame extraction as a generator expression."""
    b = blobs(spark, sf_dir)
    frame_w = 32
    n_frames = F.floor(F.octet_length("payload") / frame_w).cast("int")
    idx = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    sampled = F.filter(idx, lambda i: i % 4 == 0)
    return b.select(
        "doc_id",
        F.posexplode(
            F.transform(
                sampled,
                lambda i: F.xxhash64(
                    F.substring(F.col("payload"), (i * frame_w + 1).cast("int"), frame_w)
                ),
            )
        ).alias("frame_idx", "frame_hash"),
    )


@query(
    "multimodal_patch_grid",
    # ViT-style patchification PLAN (Dosovitskiy et al. 2020 — public
    # paper): pad each image up to multiples of the 16px patch, count the
    # patch grid, and compute the byte offset of the LAST patch's top-left
    # corner in the row-major RGB layout — the gather arithmetic a decode
    # kernel executes, checkable without any codec. All integer ceil-div
    # via (x + 15) div 16.
    oracle="""
    WITH m AS (
        SELECT doc_id,
               64 + doc_id % 192       AS width,
               64 + (doc_id * 7) % 192 AS height
        FROM documents
    )
    SELECT doc_id,
           CAST((width + 15) // 16 AS BIGINT)  AS patches_x,
           CAST((height + 15) // 16 AS BIGINT) AS patches_y,
           CAST(((width + 15) // 16) * ((height + 15) // 16) AS BIGINT)
               AS n_patches,
           CAST(((width + 15) // 16) * ((height + 15) // 16) + 1 AS BIGINT)
               AS seq_len_cls,
           CAST(((width + 15) // 16) * 16 - width AS BIGINT)  AS pad_right,
           CAST(((height + 15) // 16) * 16 - height AS BIGINT) AS pad_bottom,
           CAST(3 * ((((height + 15) // 16) - 1) * 16
                     * (((width + 15) // 16) * 16)
                     + (((width + 15) // 16) - 1) * 16) AS BIGINT)
               AS last_patch_offset
    FROM m
    """,
)
def multimodal_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image patchification plan over blob METADATA only — the Spark-side
    arithmetic of a ViT tokenizer: ceil-div patch grid, CLS-extended
    sequence length, padding amounts, and the row-major RGB byte offset
    of the last patch's top-left corner (3 * (row * padded_width + col)).
    Like multimodal_metadata, no payload is touched — the plan is what a
    decode kernel (stubbed in this container, multimodal_decode_stub)
    consumes per batch; at 100 TB the plan columns ride the metadata
    scan while payload bytes stay in object storage until the gather."""
    b = blobs(spark, sf_dir)
    w = F.col("meta.width").cast("long")
    h = F.col("meta.height").cast("long")
    px = F.expr("(meta.width + 15) div 16").cast("long")
    py = F.expr("(meta.height + 15) div 16").cast("long")
    return b.select(
        "doc_id",
        px.alias("patches_x"),
        py.alias("patches_y"),
        (px * py).alias("n_patches"),
        (px * py + 1).alias("seq_len_cls"),
        (px * 16 - w).alias("pad_right"),
        (py * 16 - h).alias("pad_bottom"),
        (3 * ((py - 1) * 16 * (px * 16) + (px - 1) * 16)).alias(
            "last_patch_offset"
        ),
    )
