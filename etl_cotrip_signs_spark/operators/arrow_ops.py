"""Arrow-native UDF surface [EXT — engine surface breadth]:
``mapInArrow``, the fourth vectorized-Python flavor (after pandas_udf,
mapInPandas, applyInPandas — all exercised elsewhere). mapInArrow hands
the raw Arrow RecordBatch to Python with NO pandas conversion — for
nested/list columns that matters: pandas materializes each list cell as
a Python object (one allocation per row), while the Arrow ListArray is
two flat buffers (values + offsets) that numpy can process zero-copy.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import query


@query(
    "arrow_vector_norms",
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                    * CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
               AS BIGINT) AS ssq_e6,
           CAST(len(embedding) AS INT) AS n_dims
    FROM embeddings
    """,
)
def arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector squared norm via mapInArrow — zero-copy list math.

    The batch's ``embedding`` ListArray is consumed as its two flat
    buffers: ``values`` (all floats of the batch, contiguous) and
    ``offsets`` (row boundaries). The whole computation is three numpy
    vector ops over the flat buffer plus one ``add.reduceat`` on the
    offsets — no per-row Python objects, no pandas boxing; exactly the
    access pattern a 100 TB embedding scan needs from Python when the
    JVM expression path can't express the kernel. (Here it could —
    ``F.aggregate`` over the array — and similarity.py does that
    elsewhere; this operator exists to pin the mapInArrow plumbing
    with an exact oracle.)

    Determinism: float32→float64 widening is exact, one double multiply,
    floor to int64, integer squares/sums — the DuckDB list_transform
    oracle runs the identical arithmetic.
    """
    import numpy as np
    import pyarrow as pa

    def norms(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            emb = batch.column(batch.schema.get_field_index("embedding"))
            # flatten() also drops the (absent here) list-level validity;
            # offsets are int32 positions into the flat values buffer
            flat = emb.flatten().to_numpy(zero_copy_only=False)
            offsets = emb.offsets.to_numpy(zero_copy_only=False)
            q = np.floor(flat.astype(np.float64) * 1000.0).astype(np.int64)
            sq = q * q
            starts = offsets[:-1]
            ssq = np.add.reduceat(sq, starts) if len(sq) else np.array([], np.int64)
            # reduceat with a zero-length segment (empty list) would leak the
            # next segment's value; fixture vectors are fixed 64-dim, assert it
            n_dims = (offsets[1:] - starts).astype(np.int32)
            assert (n_dims > 0).all()
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("vec_id")),
                    pa.array(ssq, pa.int64()),
                    pa.array(n_dims, pa.int32()),
                ],
                ["vec_id", "ssq_e6", "n_dims"],
            )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(norms, "vec_id long, ssq_e6 long, n_dims int")
