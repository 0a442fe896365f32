"""Text-analysis stages: language ID, quality scoring, token counting,
fingerprinting — the per-document feature layer of a training-data pipeline.

All are stateless Arrow ``map_batches`` (the per-row functions live in
functions/text.py so the same code is unit-tested and DuckDB-parity-checked).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.text import (
    count_bpe_ish_tokens,
    count_tokens,
    detect_lang,
    fingerprint_md5_batch,
    quality_stats,
)


def add_lang_id(ds: ray.data.Dataset, text_col: str = "text", out_col: str = "lang_pred") -> ray.data.Dataset:
    def _f(batch: pa.Table) -> pa.Table:
        langs = [detect_lang(t or "") for t in batch[text_col].to_pylist()]
        return batch.append_column(out_col, pa.array(langs, pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow")


def add_quality(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    def _f(batch: pa.Table) -> pa.Table:
        stats = [quality_stats(t or "") for t in batch[text_col].to_pylist()]
        batch = batch.append_column("n_tokens", pa.array([s["n_tokens"] for s in stats], pa.int64()))
        batch = batch.append_column(
            "mean_token_len", pa.array([s["mean_token_len"] for s in stats], pa.float64())
        )
        batch = batch.append_column(
            "punct_ratio", pa.array([s["punct_ratio"] for s in stats], pa.float64())
        )
        batch = batch.append_column(
            "stopword_ratio", pa.array([s["stopword_ratio"] for s in stats], pa.float64())
        )
        batch = batch.append_column(
            "quality_score", pa.array([s["quality_score"] for s in stats], pa.float64())
        )
        return batch

    return ds.map_batches(_f, batch_format="pyarrow")


def add_token_counts(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    def _f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        batch = batch.append_column(
            "n_tokens", pa.array([count_tokens(t or "") for t in texts], pa.int64())
        )
        batch = batch.append_column(
            "n_bpe_tokens", pa.array([count_bpe_ish_tokens(t or "") for t in texts], pa.int64())
        )
        return batch

    return ds.map_batches(_f, batch_format="pyarrow")


def add_fingerprint(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    def _f(batch: pa.Table) -> pa.Table:
        fps = fingerprint_md5_batch(batch[text_col])
        return batch.append_column("fingerprint", pa.array(fps, pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow")
