"""Block cleaning: BlockPurging + BlockFiltering over the edge list.

Reference: src/pyjedai/block_cleaning.py.

* ``block_purging`` (reference :110-207): drop blocks whose comparison count
  exceeds an auto threshold derived from the cumulative cardinality-level
  curve (smoothing factor 1.025). The levels table has one row per DISTINCT
  cardinality level — tiny — so it is aggregated distributed
  (groupby(cardinality) -> Sum) and the descending break-scan runs on the
  driver; the resulting scalar threshold is broadcast into a filter.

* ``block_filtering`` (reference :33-108): keep each entity only in the
  ``round(ratio * n)`` smallest of its blocks (round = java half-up,
  utils.py:204-205), then drop blocks that fall under 2 entities. Block order
  at equal cardinality follows (cardinality, key) lexicographic — an explicit
  total order replacing the reference's dict-insertion order (SURVEY.md §7
  determinism rule). The per-entity cut is a groupby(doc_id) Unique-collect of
  zero-padded "cardinality|key" strings + a vectorized cut — no per-group UDF.

Dirty-ER cardinality of a block of size s is s*(s-1)/2 (datamodel.py:487-498).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum, Unique

from . import blocking as blocking_stage
from .blocking import block_sizes
from .exchange import ensure_context, hash_join, stamp_schema


def _with_cardinality(sizes: ray.data.Dataset) -> ray.data.Dataset:
    def _card(batch: pa.Table) -> pa.Table:
        s = batch["block_size"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": batch["key"],
                "block_size": batch["block_size"],
                "cardinality": pa.array(s * (s - 1) // 2, pa.int64()),
            }
        )

    return sizes.map_batches(_card, batch_format="pyarrow")


def purging_threshold(sized: ray.data.Dataset, smoothing_factor: float = 1.025) -> int:
    """Max comparisons-per-block threshold from the cumulative level curve
    (reference _set_threshold, block_cleaning.py:158-198)."""
    ensure_context()
    levels_ds = sized.groupby("cardinality").aggregate(
        Sum("block_size", alias_name="sizes"), Count(alias_name="nblocks")
    )
    levels_ds = stamp_schema(
        levels_ds,
        pa.schema([("cardinality", pa.int64()), ("sizes", pa.int64()), ("nblocks", pa.int64())]),
    )
    levels = sorted(levels_ds.take_all(), key=lambda r: r["cardinality"])
    if not levels:
        return 0
    cum_bc = cum_cc = 0
    rows = []
    for lv in levels:
        cum_bc += lv["sizes"]
        cum_cc += lv["cardinality"] * lv["nblocks"]
        rows.append((lv["cardinality"], cum_bc, cum_cc))
    cur_size = cur_bc = cur_cc = 0
    prev_size = prev_bc = prev_cc = 0
    for i in range(len(rows) - 1, 0, -1):
        prev_size, prev_bc, prev_cc = cur_size, cur_bc, cur_cc
        cur_size, cur_bc, cur_cc = rows[i]
        if cur_bc * prev_cc < smoothing_factor * cur_cc * prev_bc:
            break
    return int(prev_size)


def block_purging(
    edges: ray.data.Dataset,
    smoothing_factor: float = 1.025,
    num_partitions: int = 32,
) -> tuple[ray.data.Dataset, int]:
    """Edge list -> (purged edge list, threshold). Blocks with cardinality
    above the auto threshold are dropped (all their edge rows filtered out)."""
    eschema = blocking_stage.edges_schema(edges)
    sized = _with_cardinality(block_sizes(edges)).materialize()
    threshold = purging_threshold(sized, smoothing_factor)
    keep = sized.filter(expr=f"cardinality <= {threshold}").select_columns(["key"])
    purged = hash_join(
        edges, keep, on=("key",), num_partitions=num_partitions,
        left_schema=eschema,
        right_schema=pa.schema([("key", eschema.field("key").type)]),
    )
    return purged, threshold


def java_math_round(value: float) -> int:
    """Half-up rounding (reference utils.py:204-205)."""
    return int(value + 0.5)


_PACK_DIGITS = 20  # zero-pad width for cardinality — int64 max is 19 digits


def block_filtering(
    edges: ray.data.Dataset,
    ratio: float = 0.8,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Keep each entity in the round(ratio*n) smallest of its blocks, then
    drop blocks left with < 2 entities. Two groupby shuffles + one join."""
    ensure_context()
    eschema = blocking_stage.edges_schema(edges)
    # materialize the (small, per-distinct-key) size table so its groupby
    # exchange completes before the join exchange starts — concurrent
    # hash-shuffle operators starve each other (joins._with_similarity)
    sized = _with_cardinality(block_sizes(edges)).materialize()
    annotated = hash_join(
        edges,
        sized.select_columns(["key", "cardinality"]),
        on=("key",),
        num_partitions=num_partitions,
        left_schema=eschema,
        right_schema=pa.schema(
            [("key", eschema.field("key").type), ("cardinality", pa.int64())]
        ),
    )

    def _pack(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()), ("packed", pa.string())]).empty_table()
        packed = [
            f"{card:0{_PACK_DIGITS}d}|{key}"
            for card, key in zip(batch["cardinality"].to_pylist(), batch["key"].to_pylist())
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "packed": pa.array(packed, pa.string())}
        )

    per_doc = (
        annotated.map_batches(_pack, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Unique("packed", alias_name="keys"))
    )
    per_doc = stamp_schema(
        per_doc, pa.schema([("doc_id", pa.int64()), ("keys", pa.list_(pa.string()))])
    )

    keep_frac = ratio

    def _cut(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema([("key", pa.string()), ("doc_id", pa.int64())]).empty_table()
        out_keys: list[str] = []
        out_ids: list[int] = []
        for did, keys in zip(batch["doc_id"].to_pylist(), batch["keys"].to_pylist()):
            keys = sorted(keys)  # (cardinality, key) lexicographic via zero-pad
            n_keep = java_math_round(keep_frac * float(len(keys)))
            for packed in keys[:n_keep]:
                out_keys.append(packed[_PACK_DIGITS + 1 :])
                out_ids.append(did)
        return pa.table(
            {"key": pa.array(out_keys, pa.string()), "doc_id": pa.array(out_ids, pa.int64())}
        )

    kept = stamp_schema(
        per_doc.map_batches(_cut, batch_format="pyarrow"),
        pa.schema([("key", pa.string()), ("doc_id", pa.int64())]),
    ).materialize()
    sizes2 = block_sizes(kept).materialize()  # barrier before the join exchange
    keep_keys = sizes2.filter(expr="block_size >= 2").select_columns(["key"])
    return hash_join(
        kept, keep_keys, on=("key",), num_partitions=num_partitions,
        left_schema=pa.schema([("key", pa.string()), ("doc_id", pa.int64())]),
        right_schema=pa.schema([("key", pa.string())]),
    )
