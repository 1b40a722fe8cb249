"""Pins for wave 45: tar layout invariants vs Python's tarfile arithmetic
and k-fold partition axioms."""

from __future__ import annotations

import pandas as pd

from etl_cotrip_signs_spark.operators.features import (
    _KFOLD_K,
    feature_kfold_assignment,
)
from etl_cotrip_signs_spark.operators.pipeline_ops import (
    _TAR_BLOCK,
    multimodal_tar_offsets,
)

from .conftest import SF_SMALL


def test_tar_offsets_layout_invariants(spark):
    out = (
        multimodal_tar_offsets(spark, SF_SMALL)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet").sort_values(
        "doc_id"
    )
    assert len(out) == len(docs)
    # entry = header block + data padded to the block size
    pad = (out.data_bytes + _TAR_BLOCK - 1) // _TAR_BLOCK * _TAR_BLOCK
    assert (out.entry_bytes == _TAR_BLOCK + pad).all()
    # members are contiguous: next header starts where this entry ends
    ends = out.header_offset + out.entry_bytes
    assert (out.header_offset.iloc[1:].to_numpy() == ends.iloc[:-1].to_numpy()).all()
    assert out.header_offset.iloc[0] == 0
    # data begins one header block after the header
    assert (out.data_offset == out.header_offset + _TAR_BLOCK).all()
    # everything is block-aligned; archive = members + two zero blocks
    assert (out.header_offset % _TAR_BLOCK == 0).all()
    assert (out.archive_bytes == out.entry_bytes.sum() + 2 * _TAR_BLOCK).all()
    # sizes match the manifest
    assert (out.data_bytes.to_numpy() == docs.n_chars.to_numpy()).all()


def test_kfold_partition_axioms(spark):
    out = feature_kfold_assignment(spark, SF_SMALL).toPandas()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    assert sorted(out.fold) == list(range(_KFOLD_K))
    # folds are exhaustive and disjoint: counts and chars sum to totals
    assert out.n_val_docs.sum() == len(docs)
    assert out.val_chars.sum() == docs.n_chars.sum()
    # complements are consistent per fold
    assert (out.n_train_docs == len(docs) - out.n_val_docs).all()
    assert (out.train_chars == docs.n_chars.sum() - out.val_chars).all()
    # hash folds are roughly balanced (loose: no fold empty or >2x mean)
    mean = len(docs) / _KFOLD_K
    assert (out.n_val_docs > 0).all() and (out.n_val_docs < 2 * mean).all()
