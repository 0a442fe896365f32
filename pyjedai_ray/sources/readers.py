"""Schema-validated Parquet readers.

Reference analog: ``Data.__init__`` (src/pyjedai/datamodel.py:77-186) ingests
pandas frames, fills NaNs and casts to str. Here ingestion is
``ray.data.read_parquet`` with column pruning at the read (only requested
columns leave storage) and a lightweight Arrow ``map_batches`` normalizer
instead of a full materialized cast.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

WEBPAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_documents(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """documents table: (doc_id, text, lang, source, n_chars)."""
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def read_embeddings(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """embeddings table: (vec_id, embedding: list<float>, label)."""
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


def read_webpages(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Web-page corpus per input_hint: (url, warc_ts, html, text, lang)."""
    return ray.data.read_parquet(path, columns=columns)


def read_csv_table(path: str, separator: str = ",", **kwargs) -> ray.data.Dataset:
    """CSV ingestion (reference Data reads csvs via pandas, utils.py:1270-1316;
    e.g. the pipe-separated Cora fixture)."""
    from pyarrow import csv as pacsv

    return ray.data.read_csv(
        path, parse_options=pacsv.ParseOptions(delimiter=separator), **kwargs
    )


def read_json_table(path: str, **kwargs) -> ray.data.Dataset:
    """JSON-lines ingestion."""
    return ray.data.read_json(path, **kwargs)


def load_pipeline_config(path: str) -> dict:
    """JSON pipeline-config loader (read_data_from_json analog,
    utils.py:1270-1316): plain dict driving run_workflow/link_datasets."""
    import json

    with open(path) as f:
        return json.load(f)


def _fill_str_nulls(batch: pa.Table) -> pa.Table:
    """fillna("") + cast-to-string for string-typed columns (the reference's
    datamodel.py:126-130 semantics), zero-copy for non-null columns."""
    cols = []
    for name in batch.column_names:
        col = batch[name]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            if col.null_count > 0:
                col = pc.fill_null(col, "")
        cols.append(col)
    return pa.table(dict(zip(batch.column_names, cols)))


def normalize_nulls(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(_fill_str_nulls, batch_format="pyarrow")


def validate_schema(ds: ray.data.Dataset, required: dict[str, object]) -> None:
    """Raise if the dataset is missing required columns (cheap: schema only)."""
    schema = ds.schema()
    names = set(schema.names)
    missing = [c for c in required if c not in names]
    if missing:
        raise ValueError(f"dataset missing required columns {missing}; has {sorted(names)}")
