"""Distributed exchange primitives: schema-safe hash join.

``ray.data.Dataset.join`` (Ray 2.49.2) crashes when a hash partition receives
zero rows on either side: the aggregator builds a 0-column table and the Acero
join then fails with "No match ... for key field" (ray/data/_internal/
execution/operators/join.py:104-126). Empty partitions are routine for us —
small probe corpora, zero-duplicate corpora, skewed key spaces — so joins are
implemented here instead:

  1. hash-repartition both sides by the key columns (``repartition(P,
     keys=...)``) — same hash, same P => partition i of both sides holds the
     same key space;
  2. one raw Ray task per partition pair does a local pyarrow join, with both
     schemas passed explicitly so empty partitions join correctly.

This is the sanctioned drop-to-raw-tasks case (the Dataset API cannot express
a cogroup), and it is a scale-friendly plan: two streaming hash shuffles plus
embarrassingly-parallel partition-local joins; the materialize() between them
is the same barrier any hash join implies.

Requires ``DataContext.shuffle_strategy = HASH_SHUFFLE`` (keyed repartition is
only implemented for the hash-shuffle backend) — ``ensure_context()`` sets it.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


def ensure_context(ds: ray.data.Dataset | None = None) -> None:
    """Idempotently switch Ray Data to the hash-shuffle backend (needed for
    keyed repartition; also the right backend for our groupby-heavy plans).

    Datasets capture a DataContext copy at creation, so this must run before
    plan construction — pyjedai_ray.__init__ calls it at import. For datasets
    built before import (e.g. by the caller), pass them here to patch the
    captured context too.
    """
    import os

    from ray.data.context import ShuffleStrategy

    # size the hash-shuffle partition count to the cluster: the Ray default
    # (200) spawns 200 aggregator partitions per groupby, which is pure
    # overhead below ~64 cores. ~2 partitions per core, floor 8, cap 128.
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", os.cpu_count() or 8))
    else:
        cpus = int(os.environ.get("RAY_GRAFT_CPUS", os.cpu_count() or 8))
    parallelism = max(8, min(128, cpus * 2))

    for ctx in filter(None, [ray.data.DataContext.get_current(), ds.context if ds is not None else None]):
        if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        if ctx.default_hash_shuffle_parallelism > parallelism:
            ctx.default_hash_shuffle_parallelism = parallelism
        if ctx.min_parallelism > parallelism * 4:
            ctx.min_parallelism = parallelism * 4


def stamp_schema(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Re-stamp a known schema onto 0-column empty blocks.

    Hash-shuffle aggregate operators emit schema-less empty blocks for empty
    partitions ("Operator produced a RefBundle with a different schema");
    downstream expression filters / UDFs keyed on column names would crash.
    Apply this after a groupby whose output feeds anything column-addressed.
    """

    def _stamp(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return schema.empty_table()
        return batch

    return ds.map_batches(_stamp, batch_format="pyarrow")


@ray.remote
def _partition_join(
    left: pa.Table,
    right: pa.Table,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    keys: list,
    right_keys: list,
    join_type: str,
) -> pa.Table:
    if left.num_columns == 0:
        left = left_schema.empty_table()
    if right.num_columns == 0:
        right = right_schema.empty_table()
    return left.join(
        right, keys=keys, right_keys=right_keys, join_type=join_type
    )


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple[str, ...] | list[str],
    num_partitions: int = 32,
    right_on: tuple[str, ...] | list[str] | None = None,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Schema-safe distributed hash join (see module docstring).

    join_type: any pyarrow join type ("inner", "left outer", "left semi", ...).
    """
    ensure_context(left)
    ensure_context(right)
    on = list(on)
    right_on = list(right_on or on)

    L = left.repartition(num_partitions, keys=on).materialize()
    R = right.repartition(num_partitions, keys=right_on).materialize()
    lsch_w, rsch_w = L.schema(), R.schema()
    if lsch_w is None or rsch_w is None:
        # a side is fully empty with unknown schema (e.g. zero candidate
        # pairs). Inner join => empty result; left-outer with empty right =>
        # left rows unchanged (downstream UDFs must tolerate the missing
        # right-side columns — our stage UDFs guard on column presence).
        if join_type == "inner" or lsch_w is None:
            return ray.data.from_arrow(pa.table({}))
        return L
    lschema = lsch_w.base_schema
    rschema = rsch_w.base_schema
    lrefs = L.to_arrow_refs()
    rrefs = R.to_arrow_refs()
    if len(lrefs) != len(rrefs):
        raise RuntimeError(
            f"partition mismatch: {len(lrefs)} vs {len(rrefs)} (expected {num_partitions})"
        )
    out = [
        _partition_join.remote(l, r, lschema, rschema, on, right_on, join_type)
        for l, r in zip(lrefs, rrefs)
    ]
    return ray.data.from_arrow_refs(out)
