"""Similarity self/cross joins — the token-partitioned join front door.

Reference: src/pyjedai/joins.py. ``AbstractJoin.fit`` (:106-254) builds an
in-memory token inverted index and probes it entity by entity; similarity is
computed from common-token counts (:209-230):

  cosine  = common / sqrt(|A| * |B|)
  dice    = 2 * common / (|A| + |B|)
  jaccard = common / (|A| + |B| - common)

Here the same math runs as the classic distributed token-partitioned
similarity join (SURVEY.md §2.7): explode distinct tokens -> groupby(token)
pair emission with partial counts -> groupby(pair).sum -> join per-doc token
counts -> vectorized similarity -> threshold filter (``ejoin``) or per-probe
top-k (``topk_join``). Set-token semantics ("standard"/"qgrams" tokenization,
joins.py:183-207); multiset variants are intentionally not reproduced (the
set-based metrics are what the EJoin/TopKJoin defaults use).

Skew note: similarity joins need EXACT common counts, so oversized-block
chaining is off; instead ultra-frequent tokens above ``max_token_freq`` are
dropped from the index (a standard prefix-filter-style approximation — their
contribution to any pair's common count is bounded by the drop count). Pass
``drop_counter`` (a state.metrics counter name) to COUNT the discarded
comparisons under the ``token_freq_cap`` key — no silent truncation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.tokenize import qgram_keys, standard_tokens
from .blocking import directed_pairs, explode_keys, per_center_topk
from .exchange import appended, hash_join

JOIN_METRICS = ("cosine", "dice", "jaccard")


def _token_edges(
    ds: ray.data.Dataset, tokenization: str, qgrams: int, id_col: str, text_col: str
) -> ray.data.Dataset:
    d = ds.select_columns([id_col, text_col]).rename_columns(
        {id_col: "doc_id", text_col: "text"}
    )
    if tokenization == "standard":
        return explode_keys(d, keyer="standard")
    if tokenization == "qgrams":
        return explode_keys(d, keyer="qgrams", q=qgrams)
    if tokenization == "standard_multiset":
        return explode_keys(d, keyer="standard_multiset")
    if tokenization == "qgrams_multiset":
        return explode_keys(d, keyer="qgrams_multiset", q=qgrams)
    raise ValueError(f"unknown tokenization {tokenization}")


def _pair_commons(
    edges: ray.data.Dataset,
    max_token_freq: int,
    num_partitions: int,
    drop_counter: str | None = None,
    input_rows: int | None = None,
) -> ray.data.Dataset:
    """(id1, id2, common) — distinct shared-token counts per pair.

    Reuses the fast candidate machinery (keyed repartition + per-partition
    run detection): tokens above ``max_token_freq`` are the oversized blocks,
    and with chaining off they contribute nothing — exactly the
    ultra-frequent-token drop this join wants. With ``drop_counter`` the
    discarded per-token comparisons are counted under ``token_freq_cap``
    (each dropped comparison lowers one pair's common count by at most 1)."""
    from .blocking import candidate_pairs

    out = candidate_pairs(
        edges,
        max_block_size=max_token_freq,
        num_partitions=num_partitions,
        chain_oversize=False,
        drop_counter=drop_counter,
        drop_key="token_freq_cap",
        input_rows=input_rows,
    )
    return out.select_columns(["id1", "id2", "cbs"]).rename_columns({"cbs": "common"})


def _doc_token_counts_direct(
    ds: ray.data.Dataset,
    tokenization: str,
    qgrams: int,
    id_col: str,
    text_col: str,
) -> ray.data.Dataset:
    """(doc_id, ntok) WITHOUT a shuffle: every keyer emits one edge per
    DISTINCT key per doc, so ``ntok == len(keyer(text))`` is a per-row
    property — an embarrassingly-parallel map over the docs replaces the
    ``edges.groupby(doc_id)`` exchange at every scale."""
    from ..functions.tokenize import (
        qgram_multiset_keys,
        standard_multiset_tokens,
    )

    fn = {
        "standard": standard_tokens,
        "qgrams": lambda t: qgram_keys(t, q=qgrams),
        "standard_multiset": standard_multiset_tokens,
        "qgrams_multiset": lambda t: qgram_multiset_keys(t, q=qgrams),
    }[tokenization]

    def _count(batch: pa.Table) -> pa.Table:
        n = [len(fn(t or "")) for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                "ntok": pa.array(n, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _count, batch_format="pyarrow"
    )


def _sim_fn(metric: str):
    def _sim(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "common" not in batch.column_names:
            return pa.schema(
                [("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64())]
            ).empty_table()
        c = batch["common"].to_numpy(zero_copy_only=False).astype(np.float64)
        n1 = batch["n1"].to_numpy(zero_copy_only=False).astype(np.float64)
        n2 = batch["n2"].to_numpy(zero_copy_only=False).astype(np.float64)
        if metric == "cosine":
            w = c / np.sqrt(n1 * n2)
        elif metric == "dice":
            w = 2.0 * c / (n1 + n2)
        elif metric == "jaccard":
            w = c / (n1 + n2 - c)
        else:
            raise ValueError(f"unknown metric {metric}")
        return pa.table(
            {"id1": batch["id1"], "id2": batch["id2"], "weight": pa.array(w, pa.float64())}
        )

    return _sim


def _with_similarity(
    commons: ray.data.Dataset,
    counts: ray.data.Dataset,
    metric: str,
    num_partitions: int,
    counts_mode: str = "auto",
) -> ray.data.Dataset:
    """Attach per-doc token counts to the pair common-counts and compute the
    similarity. counts_mode:

    "join" — two distributed hash joins; the only option when the corpus is
    too large for any one node's object-store share.
    "broadcast" — the counts side is 16 bytes/doc: build ONE sorted
    (doc_id -> ntok) numpy lookup in the object store (``ray.put`` once via a
    remote build task, zero-copy ``ray.get`` per map task) and resolve n1/n2
    with vectorized ``searchsorted`` — no shuffle, no barrier.
    "auto" — broadcast at/below exchange.SEMI_JOIN_BROADCAST_IDS // 2 docs
    (16 bytes per doc; the verify stage's 1M crossover is for ~100x wider
    signature payloads), else join."""
    from .exchange import barrier

    if counts_mode == "auto":
        # (doc_id, ntok) is 16 bytes/doc — like exchange.semi_join_ids's
        # pure-id sets, it broadcasts far beyond the 1M-doc SIGNATURE
        # crossover (measured there: join-mode fallback shuffled the wide
        # side at 2.56M docs for a 90s -> 19s regression). Half the id-only
        # limit for the doubled payload.
        from .exchange import SEMI_JOIN_BROADCAST_IDS

        counts = counts.materialize()
        counts_mode = (
            "broadcast"
            if counts.count() <= SEMI_JOIN_BROADCAST_IDS // 2
            else "join"
        )

    if counts_mode == "broadcast":
        import ray as _ray

        @_ray.remote
        def _build_lookup(*blocks: pa.Table):
            ids_parts = [
                b["doc_id"].to_numpy(zero_copy_only=False)
                for b in blocks
                if b.num_columns
            ]
            nt_parts = [
                b["ntok"].to_numpy(zero_copy_only=False)
                for b in blocks
                if b.num_columns
            ]
            ids = (
                np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
            )
            nt = np.concatenate(nt_parts) if nt_parts else np.empty(0, np.int64)
            order = np.argsort(ids, kind="stable")
            return ids[order], nt[order]

        mat = counts.materialize()
        ref = _build_lookup.remote(*mat.to_arrow_refs())
        sim = _sim_fn(metric)

        def _attach_and_sim(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "common" not in batch.column_names:
                return sim(batch)
            ids_sorted, nt = _ray.get(ref)  # zero-copy plasma read
            i1 = batch["id1"].to_numpy(zero_copy_only=False)
            i2 = batch["id2"].to_numpy(zero_copy_only=False)
            p1 = np.searchsorted(ids_sorted, i1)
            p2 = np.searchsorted(ids_sorted, i2)
            # searchsorted yields an insertion point even for ABSENT ids —
            # that would be a silently wrong count; fail loudly instead
            if (
                p1.size
                and not (
                    np.all(p1 < ids_sorted.size)
                    and np.all(p2 < ids_sorted.size)
                    and np.array_equal(ids_sorted[p1], i1)
                    and np.array_equal(ids_sorted[p2], i2)
                )
            ):
                raise KeyError(
                    "pair ids missing from the per-doc token-count lookup — "
                    "commons and counts were built from different datasets"
                )
            n1 = nt[p1]
            n2 = nt[p2]
            return sim(
                batch.append_column("n1", pa.array(n1, pa.int64())).append_column(
                    "n2", pa.array(n2, pa.int64())
                )
            )

        return commons.map_batches(_attach_and_sim, batch_format="pyarrow")

    i64 = pa.int64()
    commons_schema = pa.schema([("id1", i64), ("id2", i64), ("common", i64)])
    # BARRIER between shuffle stages: commons is itself two chained
    # shuffles; letting it stream into the join makes 3+ hash-shuffle
    # exchanges run CONCURRENTLY and their aggregator actor pools
    # oversubscribe the CPUs (measured: ejoin 25s -> 102s without the
    # barrier on Ray 2.49). Schemas still passed so the join never probes
    # blocks; exchange.barrier() re-evaluates the tradeoff per Ray version
    # (PYJEDAI_RAY_BARRIER_MODE to override/measure).
    commons = barrier(commons)
    p = barrier(hash_join(
        commons, counts.rename_columns({"doc_id": "id1", "ntok": "n1"}),
        on=("id1",), num_partitions=num_partitions,
        left_schema=commons_schema,
        right_schema=pa.schema([("id1", i64), ("n1", i64)]),
    ))
    p = hash_join(
        p, counts.rename_columns({"doc_id": "id2", "ntok": "n2"}),
        on=("id2",), num_partitions=num_partitions,
        left_schema=appended(commons_schema, [("n1", i64)]),
        right_schema=pa.schema([("id2", i64), ("n2", i64)]),
    )
    return p.map_batches(_sim_fn(metric), batch_format="pyarrow")


def ejoin(
    ds: ray.data.Dataset,
    threshold: float = 0.82,
    metric: str = "cosine",
    tokenization: str = "standard",
    qgrams: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_freq: int = 10_000,
    num_partitions: int = 32,
    drop_counter: str | None = None,
    counts_mode: str = "auto",
) -> ray.data.Dataset:
    """Threshold similarity self-join (EJoin, joins.py:350-379; default
    cosine >= 0.82). Returns (id1, id2, weight) with id1 < id2."""
    edges = _token_edges(ds, tokenization, qgrams, id_col, text_col).materialize()
    commons = _pair_commons(
        edges, max_token_freq, num_partitions, drop_counter,
        input_rows=edges.count(),
    )
    counts = _doc_token_counts_direct(ds, tokenization, qgrams, id_col, text_col)
    sims = _with_similarity(commons, counts, metric, num_partitions, counts_mode)
    return sims.filter(expr=f"weight >= {threshold!r}")


def topk_join(
    ds: ray.data.Dataset,
    k: int = 10,
    metric: str = "cosine",
    tokenization: str = "standard",
    qgrams: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_freq: int = 10_000,
    num_partitions: int = 32,
    drop_counter: str | None = None,
    counts_mode: str = "auto",
) -> ray.data.Dataset:
    """Per-probe-entity top-K join (TopKJoin, joins.py:381-435): for every
    entity keep its K most similar neighbors (both directions considered);
    deterministic tie order (weight desc, neighbor asc). Final stage is the
    keyed-repartition per-center top-k (blocking.per_center_topk), not
    groupby().map_groups."""
    from .exchange import barrier

    edges = _token_edges(ds, tokenization, qgrams, id_col, text_col).materialize()
    commons = _pair_commons(
        edges, max_token_freq, num_partitions, drop_counter,
        input_rows=edges.count(),
    )
    counts = _doc_token_counts_direct(ds, tokenization, qgrams, id_col, text_col)
    sims = _with_similarity(commons, counts, metric, num_partitions, counts_mode)
    # barrier: sims ends in (or streams from) a hash exchange and
    # per_center_topk opens another — see _with_similarity's barrier note
    return per_center_topk(directed_pairs(barrier(sims)), k, num_partitions=num_partitions)


def topk_join_pm(
    ds: ray.data.Dataset,
    budget: int,
    k: int = 10,
    strategy: str = "HB",
    metric: str = "cosine",
    tokenization: str = "standard",
    avg_round: int | None = None,
    num_partitions: int = 32,
    **kwargs,
) -> ray.data.Dataset:
    """TopKJoinPM (reference prioritization.py:1090-1360): the TopKJoin's
    per-probe neighborhoods handed to the DatasetScheduler emission order
    (TOP/DFS/BFS/HB) under a comparison budget, with canonical-pair
    first-occurrence dedup — the join-based progressive matcher."""
    from .encoding import nn_progressive_emit

    kt = topk_join(
        ds, k=k, metric=metric, tokenization=tokenization,
        num_partitions=num_partitions, **kwargs,
    ).rename_columns({"id1": "query_id", "id2": "neighbor_id", "weight": "score"})
    return nn_progressive_emit(
        kt, budget, strategy, num_partitions=num_partitions, avg_round=avg_round
    )


def pe_topk_join(
    ds1: ray.data.Dataset,
    ds2: ray.data.Dataset,
    k: int = 10,
    metric: str = "cosine",
    tokenization: str = "standard",
    qgrams: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_freq: int = 10_000,
    num_partitions: int = 32,
    dataset_limit: int | None = None,
    drop_counter: str | None = None,
) -> ray.data.Dataset:
    """Strict progressive top-K cross-join (PETopKJoin, joins.py:437-551):
    per INDEXED (ds2) entity keep its K best target candidates, then per
    TARGET (ds1) entity keep the K best of the survivors; emission is the
    globally sorted (weight desc, id1, id2) pair list. Tie order matches the
    reference PQ (higher candidate id evicted first => lower ids kept).

    The two id spaces must be disjoint with every ds1 id < every ds2 id
    (the reference's dataset_limit split, datamodel.py:115); pass
    dataset_limit to assert the boundary, else it is inferred.
    """
    if dataset_limit is None:
        dataset_limit = int(ds1.max(id_col)) + 1
    min2 = int(ds2.min(id_col))
    if min2 < dataset_limit:
        raise ValueError(
            f"pe_topk_join requires disjoint ordered id spaces: every ds1 "
            f"{id_col} must be < every ds2 {id_col}, but ds2 min {min2} < "
            f"dataset_limit {dataset_limit} — re-key one side (the reference's "
            f"dataset_limit split, datamodel.py:115)"
        )

    both = ds1.union(ds2)
    edges = _token_edges(both, tokenization, qgrams, id_col, text_col).materialize()

    from .blocking import candidate_pairs

    commons = candidate_pairs(
        edges,
        max_block_size=max_token_freq,
        num_partitions=num_partitions,
        chain_oversize=False,
        dataset_limit=dataset_limit,
        drop_counter=drop_counter,
        drop_key="token_freq_cap",
    ).select_columns(["id1", "id2", "cbs"]).rename_columns({"cbs": "common"})
    counts = _doc_token_counts_direct(both, tokenization, qgrams, id_col, text_col)
    sims = _with_similarity(commons, counts, metric, num_partitions)
    # canonical pairs have id1 < dataset_limit <= id2: id1 = target (ds1),
    # id2 = indexed (ds2). Stage 1: per-indexed top-k (swap so the center is
    # id2); stage 2: per-target top-k over the survivors.

    def _swap(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id1" not in batch.column_names:
            return pa.schema(
                [("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64())]
            ).empty_table()
        return pa.table(
            {"id1": batch["id2"], "id2": batch["id1"], "weight": batch["weight"]}
        )

    by_indexed = per_center_topk(
        sims.map_batches(_swap, batch_format="pyarrow"), k, num_partitions=num_partitions
    )
    survivors = by_indexed.map_batches(_swap, batch_format="pyarrow")
    final = per_center_topk(survivors, k, num_partitions=num_partitions)
    return final.sort(["weight", "id1", "id2"], descending=[True, False, False])
