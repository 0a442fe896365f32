"""Token/q-gram/suffix/LSH-band blocking — candidate generation.

Reference analog: ``AbstractBlockBuilding.build_blocks`` (src/pyjedai/
block_building.py:409-461) builds a single-threaded ``dict[token -> Block]``.
Here the block collection is never a dict: it is the exploded **edge list**
``(key, doc_id)`` (one row per blocking key per doc), and block operations are
``groupby`` shuffles over it (SURVEY.md §1.3).

Pair generation = hash-repartition by key, then per-partition Arrow sort +
vectorized run detection (every sorted run is one block) + triu pair
emission; pair dedup/CBS counting repeats the trick keyed on (id1, id2). No
joins, no groupby machinery, no per-group UDF calls in the hot path — LSH
band keys are millions of mostly-singleton buckets and per-group overhead is
the dominant cost there. ``collect_blocks`` (groupby+Unique) remains for
block-level operators that genuinely need the ids list.

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
from .exchange import effective_partitions, ensure_context, hash_join, stamp_schema

PAIRS_SCHEMA = pa.schema(
    [("id1", pa.int64()), ("id2", pa.int64()), ("arcs", pa.float64())]
)


def explode_keys(
    ds: ray.data.Dataset,
    keyer: str = "standard",
    text_col: str = "text",
    id_col: str = "doc_id",
    **keyer_kwargs,
) -> ray.data.Dataset:
    """docs -> edge list (key:string, doc_id:int64), one row per distinct key
    per doc. Stateless Arrow map_batches.

    The ``standard`` keyer takes a fully-vectorized Arrow path (utf8_lower ->
    split_pattern_regex -> list_flatten -> dictionary-coded per-doc dedupe;
    measured ~1.5-1.8x the Python loop) when the whole batch is ASCII — RE2's
    ``\\W`` is ASCII-only while Python's is Unicode-aware, so non-ASCII
    batches fall back to the per-doc regex for byte-identical key sets.
    Downstream consumers only see the edge list through shuffles/groupbys,
    so within-doc row order is immaterial; the key SET per doc is identical
    on both paths (unit-tested)."""
    import pyarrow.compute as pc

    fn = KEYERS[keyer]

    def _explode_loop(batch: pa.Table) -> pa.Table:
        keys: list[str] = []
        ids: list[int] = []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            ks = fn(text or "", **keyer_kwargs)
            keys.extend(ks)
            ids.extend([did] * len(ks))
        return pa.table(
            {"key": pa.array(keys, pa.string()), "doc_id": pa.array(ids, pa.int64())}
        )

    if keyer != "standard" or keyer_kwargs:
        return ds.map_batches(_explode_loop, batch_format="pyarrow")

    def _explode_standard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"key": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
            )
        col = pc.fill_null(batch[text_col].combine_chunks(), "")
        if not pc.all(pc.string_is_ascii(col)).as_py():
            return _explode_loop(batch)
        toks = pc.split_pattern_regex(pc.utf8_lower(col), "[\\W_]+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        par = parents.filter(mask).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(par) == 0:
            return pa.table(
                {"key": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
            )
        # per-doc distinct: docs are rows, so dedupe is batch-local — unique
        # over (row, token-code) composite keys
        codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        combo = par * (codes.max() + 1) + codes
        _, first_idx = np.unique(combo, return_index=True)
        doc_ids = pc.take(
            pc.cast(batch[id_col].combine_chunks(), pa.int64()), pa.array(par[first_idx])
        )
        # text read from parquet is often large_string; keys must stay
        # pa.string() like the loop path or downstream schema stamps diverge
        keys_arr = pc.cast(flat.take(pa.array(first_idx)), pa.string())
        return pa.table({"key": keys_arr, "doc_id": doc_ids})

    return ds.map_batches(_explode_standard, batch_format="pyarrow")


def edges_schema(edges: ray.data.Dataset) -> pa.Schema:
    """Edge-list schema, robust to Ray's schema-derivation giving up (seen on
    map_batches chains over stamped unions when intermediate results are
    empty/degenerate — Dataset.schema() returns None): fall back to probing
    the first non-empty block, then to the canonical (key:string,
    doc_id:int64) edge shape."""
    sch = edges.schema()
    base = getattr(sch, "base_schema", None) if sch is not None else None
    if base is not None and "key" in base.names:
        return base
    from .exchange import probe_schema

    _, probed = probe_schema(edges)
    if probed is not None and "key" in probed.names:
        return probed
    return pa.schema([("key", pa.string()), ("doc_id", pa.int64())])


def block_sizes(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(key, block_size) — groupby count over the edge list."""
    ensure_context()
    key_type = edges_schema(edges).field("key").type
    out = edges.groupby("key").aggregate(Count(alias_name="block_size"))
    return stamp_schema(out, pa.schema([("key", key_type), ("block_size", pa.int64())]))


def collect_blocks(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Edge list -> blocks table (key, ids:list<int64>, block_size). One
    groupby; the distributed analog of the reference's token->Block dict."""
    ensure_context()
    key_type = edges_schema(edges).field("key").type
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
    from .exchange import barrier

    eschema = edges_schema(edges)
    sizes = barrier(block_sizes(edges))  # barrier before the join exchange
    keep = sizes.filter(expr=f"block_size >= {min_size}")
    if max_size is not None:
        keep = keep.filter(expr=f"block_size <= {max_size}")
    return hash_join(
        edges, keep, on=("key",), num_partitions=num_partitions,
        left_schema=eschema,
        right_schema=pa.schema(
            [("key", eschema.field("key").type), ("block_size", pa.int64())]
        ),
    )


def _emit_pairs_partition(
    batch: pa.Table,
    max_block_size: int,
    chain_oversize: bool,
    dataset_limit: int | None = None,
    salt_oversize: bool = False,
    drop_counter: str | None = None,
    drop_key: str = "oversized_blocks",
) -> pa.Table:
    """One hash partition of the edge list -> intra-block pairs.

    Arrow-native sort by (key, doc_id), then vectorized run detection over
    the sorted key column: every run is one block. No per-group UDF calls —
    this is the hot path of candidate generation (millions of mostly-singleton
    LSH buckets; groupby machinery costs ~10x more here).

    Every block above ``max_block_size`` is a capped path (chained, salted,
    or dropped outright): with ``drop_counter`` set, the number of pairwise
    comparisons the cap discarded (full C(n,2) minus what was emitted) is
    reported under ``drop_key`` — SURVEY §4's no-silent-truncation rule.
    """
    import pyarrow.compute as pc

    if batch.num_rows == 0 or "key" not in batch.column_names:
        return PAIRS_SCHEMA.empty_table()
    idx = pc.sort_indices(
        batch, sort_keys=[("key", "ascending"), ("doc_id", "ascending")]
    )
    sorted_tbl = batch.take(idx)
    keys = sorted_tbl["key"].combine_chunks()
    ids = sorted_tbl["doc_id"].to_numpy(zero_copy_only=False)
    if len(ids) == 0:
        return PAIRS_SCHEMA.empty_table()
    neq = pc.not_equal(keys.slice(1), keys.slice(0, len(keys) - 1))
    boundaries = np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(ids)]])
    id1_out: list[np.ndarray] = []
    id2_out: list[np.ndarray] = []
    arcs_out: list[np.ndarray] = []
    dropped = 0
    oversize_events = 0
    for s, e in zip(starts, ends):
        block = np.unique(ids[s:e])
        n = block.size
        if n < 2:
            continue
        if n <= max_block_size:
            iu, ju = np.triu_indices(n, k=1)
            a, b = block[iu], block[ju]
        elif salt_oversize:
            # salt the hot key: deterministic sub-groups of <= max_block_size
            # get full pairing, plus the consecutive-id chain to preserve
            # connectivity ACROSS sub-groups (SURVEY §4 skew handling). Total
            # cost O(n * max_block_size) instead of O(n^2).
            n_salts = -(-n // max_block_size)
            salts = (block % np.int64(n_salts)).astype(np.int64)
            pa_, pb_ = [block[:-1]], [block[1:]]
            for sv in range(n_salts):
                sub = block[salts == sv]
                if sub.size >= 2:
                    iu, ju = np.triu_indices(sub.size, k=1)
                    pa_.append(sub[iu])
                    pb_.append(sub[ju])
            a = np.concatenate(pa_)
            b = np.concatenate(pb_)
            oversize_events += 1
            dropped += n * (n - 1) // 2 - a.size
        elif chain_oversize:
            a, b = block[:-1], block[1:]
            oversize_events += 1
            dropped += n * (n - 1) // 2 - a.size
        else:
            oversize_events += 1
            dropped += n * (n - 1) // 2
            continue
        if dataset_limit is not None:
            # Clean-Clean ER: keep only cross-dataset comparisons
            # (utils.py:110-122 blocks need both sides; datamodel.py:115
            # id-space split at dataset_limit)
            cross = (a < dataset_limit) != (b < dataset_limit)
            a, b = a[cross], b[cross]
            if a.size == 0:
                continue
        id1_out.append(a)
        id2_out.append(b)
        # ARCS contribution: 1 / block cardinality per shared block
        # (comparison_cleaning.py:379-381 CN-CBS accumulation, clean form)
        card = n * (n - 1) / 2.0
        arcs_out.append(np.full(a.size, 1.0 / card))
    if drop_counter is not None and oversize_events:
        from ..state.metrics import report_drops

        report_drops(drop_counter, drop_key, dropped, oversize_events)
    if not id1_out:
        return PAIRS_SCHEMA.empty_table()
    return pa.table(
        {
            "id1": pa.array(np.concatenate(id1_out), pa.int64()),
            "id2": pa.array(np.concatenate(id2_out), pa.int64()),
            "arcs": pa.array(np.concatenate(arcs_out), pa.float64()),
        }
    )


def _count_pairs_partition(batch: pa.Table) -> pa.Table:
    """One hash partition of raw pairs -> distinct pairs with cbs counts and
    summed ARCS contributions."""
    out_schema = pa.schema(
        [("id1", pa.int64()), ("id2", pa.int64()), ("cbs", pa.int64()), ("arcs", pa.float64())]
    )
    if batch.num_rows == 0 or "id1" not in batch.column_names:
        return out_schema.empty_table()
    a = batch["id1"].to_numpy(zero_copy_only=False)
    b = batch["id2"].to_numpy(zero_copy_only=False)
    w = (
        batch["arcs"].to_numpy(zero_copy_only=False)
        if "arcs" in batch.column_names
        else np.zeros(len(a))
    )
    order = np.lexsort((b, a))
    a, b, w = a[order], b[order], w[order]
    change = np.flatnonzero((a[1:] != a[:-1]) | (b[1:] != b[:-1])) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(a)]])
    counts = ends - starts
    sums = np.add.reduceat(w, starts) if len(a) else np.array([], dtype=np.float64)
    return pa.table(
        {
            "id1": pa.array(a[starts], pa.int64()),
            "id2": pa.array(b[starts], pa.int64()),
            "cbs": pa.array(counts, pa.int64()),
            "arcs": pa.array(sums, pa.float64()),
        }
    )


def candidate_pairs(
    edges: ray.data.Dataset,
    max_block_size: int = 64,
    num_partitions: int = 32,
    chain_oversize: bool = True,
    dataset_limit: int | None = None,
    salt_oversize: bool = False,
    drop_counter: str | None = None,
    drop_key: str = "oversized_blocks",
    input_rows: int | None = None,
) -> ray.data.Dataset:
    """Edge list -> candidate pairs (id1, id2, cbs) with id1 < id2.

    cbs = number of shared keys (the CBS weight, src/pyjedai/
    comparison_cleaning.py:210-214; chain edges from oversized blocks also
    count toward it). Plan: hash-repartition by key -> per-partition sorted
    run detection + vectorized pair emission -> hash-repartition by pair ->
    per-partition count. Two streaming shuffles, zero joins, zero per-group
    UDF calls.

    ``drop_counter`` (a state.metrics counter name) makes every oversized
    block's discarded comparisons a COUNTED metric under ``drop_key``.
    ``input_rows`` (optional) is a cheap edge-count hint that right-sizes
    the exchange for small corpora (exchange.effective_partitions).
    """
    ensure_context(edges)
    num_partitions = effective_partitions(num_partitions, rows=input_rows)
    parts = edges.repartition(num_partitions, keys=["key"])
    pairs = parts.map_batches(
        _emit_pairs_partition,
        fn_kwargs={
            "max_block_size": max_block_size,
            "chain_oversize": chain_oversize,
            "dataset_limit": dataset_limit,
            "salt_oversize": salt_oversize,
            "drop_counter": drop_counter,
            "drop_key": drop_key,
        },
        batch_format="pyarrow",
        batch_size=None,
    )
    pair_parts = pairs.repartition(num_partitions, keys=["id1", "id2"])
    out = pair_parts.map_batches(
        _count_pairs_partition, batch_format="pyarrow", batch_size=None
    )
    return stamp_schema(
        out,
        pa.schema(
            [("id1", pa.int64()), ("id2", pa.int64()), ("cbs", pa.int64()), ("arcs", pa.float64())]
        ),
    )


def comparison_propagation(
    edges: ray.data.Dataset, num_partitions: int = 32
) -> ray.data.Dataset:
    """All distinct candidate pairs (dedup of block comparisons) —
    ComparisonPropagation (src/pyjedai/comparison_cleaning.py:310-342)."""
    return candidate_pairs(
        edges, max_block_size=1 << 30, num_partitions=num_partitions
    ).select_columns(["id1", "id2"])


# ----------------------------------------------------- per-node top-k -------
# Shared machinery for node-centric pruning (CNP/RCNP, comparison_cleaning.py
# :475-568) and per-probe top-k joins (joins.py:381-435): one keyed
# repartition + partition-local Arrow sort + vectorized run ranking. The
# groupby().map_groups alternative is ~10x slower on many small groups and
# its shuffle aggregator crashes when a schema-less empty block reaches the
# finalize sort — both directions of VERDICT r1 finding #1.

TOPK_SCHEMA = pa.schema(
    [("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64())]
)


def directed_pairs(sims: ray.data.Dataset) -> ray.data.Dataset:
    """(id1, id2, weight) -> both directed edges in ONE Arrow map.

    Avoids union + rename_columns: Ray's rename Project skips 0-row blocks,
    so the stale-named empties poison any downstream keyed shuffle."""

    def _both(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id1" not in batch.column_names:
            return TOPK_SCHEMA.empty_table()
        a = batch["id1"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["id2"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "id1": pa.array(np.concatenate([a, b]), pa.int64()),
                "id2": pa.array(np.concatenate([b, a]), pa.int64()),
                "weight": pa.array(np.concatenate([w, w]), pa.float64()),
            }
        )

    return sims.map_batches(_both, batch_format="pyarrow")


def per_center_topk(
    directed: ray.data.Dataset, k: int, num_partitions: int = 32
) -> ray.data.Dataset:
    """Per-id1 top-k rows by (weight desc, id2 asc), deterministic ties.

    Repartition on id1 co-locates each node's full neighborhood; within a
    partition a single multi-key Arrow sort + run detection ranks every
    neighborhood vectorized (rank = position - run start)."""
    import pyarrow.compute as pc

    ensure_context(directed)
    parts = stamp_schema(directed, TOPK_SCHEMA).repartition(
        effective_partitions(num_partitions), keys=["id1"]
    )

    def _topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id1" not in batch.column_names:
            return TOPK_SCHEMA.empty_table()
        idx = pc.sort_indices(
            batch,
            sort_keys=[
                ("id1", "ascending"),
                ("weight", "descending"),
                ("id2", "ascending"),
            ],
        )
        t = batch.take(idx).select(["id1", "id2", "weight"])
        ids = t["id1"].to_numpy(zero_copy_only=False)
        n = len(ids)
        starts = np.concatenate([[0], np.flatnonzero(ids[1:] != ids[:-1]) + 1])
        lengths = np.diff(np.concatenate([starts, [n]]))
        rank = np.arange(n) - np.repeat(starts, lengths)
        return t.filter(pa.array(rank < k))

    out = parts.map_batches(_topk, batch_format="pyarrow", batch_size=None)
    return stamp_schema(out, TOPK_SCHEMA)


def reduce_canonical_pairs(
    kept: ray.data.Dataset, require_both: bool = False, num_partitions: int = 32
) -> ray.data.Dataset:
    """Directed kept edges -> canonical (id1 < id2) pairs, max weight per pair.

    require_both=True keeps only pairs selected from BOTH endpoints'
    neighborhoods (reciprocal pruning, comparison_cleaning.py:511-516).
    Canonicalize pre-shuffle so both directions co-locate, then one keyed
    repartition + per-partition lexsort/reduceat."""
    ensure_context(kept)

    def _canon(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id1" not in batch.column_names:
            return TOPK_SCHEMA.empty_table()
        a = batch["id1"].to_numpy(zero_copy_only=False)
        b = batch["id2"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id1": pa.array(np.minimum(a, b), pa.int64()),
                "id2": pa.array(np.maximum(a, b), pa.int64()),
                "weight": batch["weight"],
            }
        )

    parts = (
        kept.map_batches(_canon, batch_format="pyarrow")
        .repartition(effective_partitions(num_partitions), keys=["id1", "id2"])
    )

    def _reduce(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id1" not in batch.column_names:
            return TOPK_SCHEMA.empty_table()
        a = batch["id1"].to_numpy(zero_copy_only=False)
        b = batch["id2"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, w = a[order], b[order], w[order]
        change = np.flatnonzero((a[1:] != a[:-1]) | (b[1:] != b[:-1])) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(a)]])
        wmax = np.maximum.reduceat(w, starts)
        keep = (ends - starts) >= 2 if require_both else slice(None)
        return pa.table(
            {
                "id1": pa.array(a[starts][keep], pa.int64()),
                "id2": pa.array(b[starts][keep], pa.int64()),
                "weight": pa.array(wmax[keep], pa.float64()),
            }
        )

    out = parts.map_batches(_reduce, batch_format="pyarrow", batch_size=None)
    return stamp_schema(out, TOPK_SCHEMA)
