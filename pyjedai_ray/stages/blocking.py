"""Token/q-gram/suffix/LSH-band blocking — candidate generation.

Reference analog: ``AbstractBlockBuilding.build_blocks`` (src/pyjedai/
block_building.py:409-461) builds a single-threaded ``dict[token -> Block]``.
Here the block collection is never a dict: it is the exploded **edge list**
``(key, doc_id)`` (one row per blocking key per doc), and block operations are
``groupby`` shuffles over it (SURVEY.md §1.3).

Pair generation = ONE groupby(key) collecting each block's distinct doc ids
(``Unique`` aggregate) followed by a vectorized per-batch pair-emission UDF —
no join and no per-group UDF calls in the hot path — then a groupby on the
canonical pair for dedup + CBS counting.

Hot keys are handled explicitly: blocks above ``max_block_size`` emit a sorted
consecutive-id **chain** (O(n) edges) instead of O(n^2) pairs. True duplicate
groups collide on many keys, so chains preserve union-find connectivity (and
therefore recall) while a boilerplate key cannot blow up the shuffle; chained
block counts are observable in the emitted ``cbs`` stats rather than silently
dropped (cf. BlockPurging's silent drop, src/pyjedai/block_cleaning.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Unique

from ..functions.tokenize import KEYERS
from .exchange import ensure_context, hash_join, stamp_schema

PAIRS_SCHEMA = pa.schema([("id1", pa.int64()), ("id2", pa.int64())])


def explode_keys(
    ds: ray.data.Dataset,
    keyer: str = "standard",
    text_col: str = "text",
    id_col: str = "doc_id",
    **keyer_kwargs,
) -> ray.data.Dataset:
    """docs -> edge list (key:string, doc_id:int64), one row per distinct key
    per doc. Stateless Arrow map_batches; keys sorted per doc (determinism)."""
    fn = KEYERS[keyer]

    def _explode(batch: pa.Table) -> pa.Table:
        keys: list[str] = []
        ids: list[int] = []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            ks = fn(text or "", **keyer_kwargs)
            keys.extend(ks)
            ids.extend([did] * len(ks))
        return pa.table(
            {"key": pa.array(keys, pa.string()), "doc_id": pa.array(ids, pa.int64())}
        )

    return ds.map_batches(_explode, batch_format="pyarrow")


def block_sizes(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(key, block_size) — groupby count over the edge list."""
    ensure_context()
    key_type = edges.schema().base_schema.field("key").type
    out = edges.groupby("key").aggregate(Count(alias_name="block_size"))
    return stamp_schema(out, pa.schema([("key", key_type), ("block_size", pa.int64())]))


def collect_blocks(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Edge list -> blocks table (key, ids:list<int64>, block_size). One
    groupby; the distributed analog of the reference's token->Block dict."""
    ensure_context()
    key_type = edges.schema().base_schema.field("key").type
    out = edges.groupby("key").aggregate(
        Unique("doc_id", alias_name="ids"), Count(alias_name="block_size")
    )
    return stamp_schema(
        out,
        pa.schema(
            [("key", key_type), ("ids", pa.list_(pa.int64())), ("block_size", pa.int64())]
        ),
    )


def blocks_with_sizes(
    edges: ray.data.Dataset,
    min_size: int = 2,
    max_size: int | None = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Edge list annotated with its key's block size, filtered to
    [min_size, max_size] — drop_single_entity_blocks / max-block-size
    semantics (src/pyjedai/utils.py:85-122)."""
    sizes = block_sizes(edges)
    keep = sizes.filter(expr=f"block_size >= {min_size}")
    if max_size is not None:
        keep = keep.filter(expr=f"block_size <= {max_size}")
    return hash_join(edges, keep, on=("key",), num_partitions=num_partitions)


def _emit_pairs_batch(
    batch: pa.Table, max_block_size: int, chain_oversize: bool
) -> pa.Table:
    if batch.num_columns == 0 or batch.num_rows == 0:
        return PAIRS_SCHEMA.empty_table()
    id1_out: list[np.ndarray] = []
    id2_out: list[np.ndarray] = []
    for ids_val in batch["ids"].to_pylist():
        ids = np.unique(np.asarray(ids_val, dtype=np.int64))
        n = ids.size
        if n < 2:
            continue
        if n <= max_block_size:
            iu, ju = np.triu_indices(n, k=1)
            id1_out.append(ids[iu])
            id2_out.append(ids[ju])
        elif chain_oversize:
            id1_out.append(ids[:-1])
            id2_out.append(ids[1:])
    if not id1_out:
        return PAIRS_SCHEMA.empty_table()
    return pa.table(
        {
            "id1": pa.array(np.concatenate(id1_out), pa.int64()),
            "id2": pa.array(np.concatenate(id2_out), pa.int64()),
        }
    )


def candidate_pairs(
    edges: ray.data.Dataset,
    max_block_size: int = 64,
    num_partitions: int = 32,
    chain_oversize: bool = True,
) -> ray.data.Dataset:
    """Edge list -> candidate pairs (id1, id2, cbs) with id1 < id2.

    cbs = number of shared keys (the CBS weight, src/pyjedai/
    comparison_cleaning.py:210-214; chain edges from oversized blocks also
    count toward it). Plan: groupby(key)+Unique collect -> vectorized pair
    emission -> groupby(pair) count. Two shuffles, zero joins.
    """
    ensure_context()
    blocks = collect_blocks(edges)
    pairs = blocks.map_batches(
        _emit_pairs_batch,
        fn_kwargs={"max_block_size": max_block_size, "chain_oversize": chain_oversize},
        batch_format="pyarrow",
    )
    out = pairs.groupby(["id1", "id2"]).aggregate(Count(alias_name="cbs"))
    return stamp_schema(
        out, pa.schema([("id1", pa.int64()), ("id2", pa.int64()), ("cbs", pa.int64())])
    )


def comparison_propagation(
    edges: ray.data.Dataset, num_partitions: int = 32
) -> ray.data.Dataset:
    """All distinct candidate pairs (dedup of block comparisons) —
    ComparisonPropagation (src/pyjedai/comparison_cleaning.py:310-342)."""
    return candidate_pairs(
        edges, max_block_size=1 << 30, num_partitions=num_partitions
    ).select_columns(["id1", "id2"])
