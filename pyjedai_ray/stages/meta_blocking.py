"""Comparison cleaning (meta-blocking): graph-weight pruning on the pairs
Dataset.

Reference: src/pyjedai/comparison_cleaning.py. The reference walks a
``dict[entity -> blocks]`` serially with per-entity counters; here every
scheme is a closed-form function of per-pair and per-node aggregates:

  cbs          = #common blocks of (i, j)            (groupby pair count)
  bpe[i]       = #blocks containing i                (groupby doc_id count)
  cpe[i]       = #distinct neighbors of i            (degree in pair graph;
                                                      comparison_cleaning.py:270-287)
  num_blocks   = #blocks (size >= 2)
  distinct_comparisons = #distinct pairs

Weight schemes (comparison_cleaning.py:210-249):
  CBS    = cbs
  COSINE = cbs / sqrt(bpe_i * bpe_j)        DICE = 2 cbs / (bpe_i + bpe_j)
  JS     = cbs / (bpe_i + bpe_j - cbs)
  ECBS   = cbs * log10(B/bpe_i) * log10(B/bpe_j)
  EJS    = JS * log10(D/cpe_i) * log10(D/cpe_j)
  X2     = chi-square over the 2x2 block-occurrence table (utils.py:186-202)
  CNC/SNC, CND/SND, CNJ/SNJ = cosine/dice/jaccard normalized by cpe
  (The reference's CN-CBS/SN-CBS counter accumulation at
  comparison_cleaning.py:379-385 double-adds due to an if/else fallthrough;
  we implement the clean 1/cardinality / 1/size definitions instead and
  document the divergence.)

Pruning rules:
  WEP   (":344-424")  keep w >= global mean
  CEP   (":426-473")  global top-K, K = sum(block sizes)/2
  CNP   (":475-546")  per-node top-k, k = max(1, sum sizes/#entities), dedup
  RCNP  (":548-568")  edge in BOTH endpoints' top-k
  WNP   (":570-618")  w >= avg(neighborhood_i) OR avg(neighborhood_j)
  BLAST (":620-645")  w >= (max_i + max_j) / 4
  RWNP  (":647-666")  w >= both neighborhood averages

Top-k ties are broken deterministically by (weight desc, id1 asc, id2 asc) —
the reference's PriorityQueue tie order is insertion-dependent; we pin an
explicit total order (SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Mean

from .blocking import directed_pairs, per_center_topk, reduce_canonical_pairs
from .exchange import appended, ensure_context, hash_join, probe_schema, stamp_schema

WEIGHT_SCHEMES = ("CBS", "ARCS", "COSINE", "DICE", "JS", "ECBS", "EJS", "X2", "CNC", "CND", "CNJ")


def node_degrees(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, cpe) — distinct-neighbor count per node in the pair graph."""
    ensure_context()
    a = pairs.select_columns(["id1"]).rename_columns({"id1": "doc_id"})
    b = pairs.select_columns(["id2"]).rename_columns({"id2": "doc_id"})
    out = a.union(b).groupby("doc_id").aggregate(Count(alias_name="cpe"))
    return stamp_schema(out, pa.schema([("doc_id", pa.int64()), ("cpe", pa.int64())]))


def entity_block_counts(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, bpe) — #blocks per entity over the (cleaned) edge list."""
    ensure_context()
    out = edges.groupby("doc_id").aggregate(Count(alias_name="bpe"))
    return stamp_schema(out, pa.schema([("doc_id", pa.int64()), ("bpe", pa.int64())]))


def weighted_pairs(
    pairs: ray.data.Dataset,
    edges: ray.data.Dataset,
    scheme: str = "CBS",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Attach `weight` (per `scheme`) to a (id1, id2, cbs) pairs Dataset.

    Per-node stats are joined in (two hash joins); global scalars
    (num_blocks, distinct_comparisons) are tiny driver-side aggregates
    broadcast into the vectorized weight UDF.
    """
    scheme = scheme.upper()
    if scheme not in WEIGHT_SCHEMES:
        raise ValueError(f"unknown weighting scheme {scheme}; have {WEIGHT_SCHEMES}")

    # probe the (caller-shaped) pairs schema once; every join in the chain
    # then streams with derived schemas (bpe/cpe schemas are stamped above)
    pairs, pschema = probe_schema(pairs)
    i64 = pa.int64()

    def _attach(p, pschema, stats, src_cols, out_cols):
        for key, (src, dst) in zip(("id1", "id2"), zip(src_cols, out_cols)):
            rhs_schema = pa.schema([(key, i64), (dst, i64)])
            # materialize between joins — concurrent shuffle exchanges
            # starve each other (see joins._with_similarity)
            p = hash_join(
                p, stats.rename_columns({"doc_id": key, src: dst}), on=(key,),
                num_partitions=num_partitions,
                left_schema=pschema, right_schema=rhs_schema,
            ).materialize()
            pschema = appended(pschema, [(dst, i64)]) if pschema else None
        return p, pschema

    bpe = entity_block_counts(edges)
    p, pschema = _attach(pairs, pschema, bpe, ("bpe", "bpe"), ("bpe1", "bpe2"))

    num_blocks = None
    if scheme in ("ECBS", "X2"):
        num_blocks = edges.groupby("key").aggregate(Count(alias_name="n")).count()
    dc = cpe = None
    if scheme in ("EJS", "CNC", "CND", "CNJ"):
        dc = pairs.count()
        cpe = node_degrees(pairs)
        p, pschema = _attach(p, pschema, cpe, ("cpe", "cpe"), ("cpe1", "cpe2"))

    def _weigh(batch: pa.Table) -> pa.Table:
        w = _scheme_weight(batch, scheme, num_blocks, dc)
        keep = [c for c in ("id1", "id2", "cbs", "arcs") if c in batch.column_names]
        out = {c: batch[c] for c in keep}
        out["weight"] = pa.array(w, pa.float64())
        return pa.table(out)

    return p.map_batches(_weigh, batch_format="pyarrow")


def _scheme_weight(batch: pa.Table, scheme: str, num_blocks, dc) -> np.ndarray:
    """One scheme's weight vector from a pairs batch carrying cbs/arcs plus
    joined bpe1/bpe2 (and cpe1/cpe2 where the scheme needs degrees).
    Formulas per comparison_cleaning.py:210-249 (CN-CBS clean form)."""
    cbs = batch["cbs"].to_numpy(zero_copy_only=False).astype(np.float64)
    b1 = batch["bpe1"].to_numpy(zero_copy_only=False).astype(np.float64)
    b2 = batch["bpe2"].to_numpy(zero_copy_only=False).astype(np.float64)
    if scheme == "CBS":
        return cbs
    if scheme == "ARCS":
        # sum over shared blocks of 1/cardinality (CN-CBS clean form,
        # comparison_cleaning.py:379-381) — accumulated during candidate
        # generation (blocking._emit_pairs_partition)
        return batch["arcs"].to_numpy(zero_copy_only=False).astype(np.float64)
    if scheme in ("CNC", "CND", "CNJ"):
        # cpe-normalized cosine/dice/jaccard (comparison_cleaning.py:215-222)
        c1 = batch["cpe1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = batch["cpe2"].to_numpy(zero_copy_only=False).astype(np.float64)
        if scheme == "CNC":
            return cbs / np.sqrt(c1 * c2)
        if scheme == "CND":
            return 2.0 * cbs / (c1 + c2)
        return cbs / (c1 + c2 - cbs)
    if scheme == "COSINE":
        return cbs / np.sqrt(b1 * b2)
    if scheme == "DICE":
        return 2.0 * cbs / (b1 + b2)
    if scheme == "JS":
        return cbs / (b1 + b2 - cbs)
    if scheme == "ECBS":
        return cbs * np.log10(num_blocks / b1) * np.log10(num_blocks / b2)
    if scheme == "EJS":
        c1 = batch["cpe1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = batch["cpe2"].to_numpy(zero_copy_only=False).astype(np.float64)
        js = cbs / (b1 + b2 - cbs)
        return js * np.log10(dc / c1) * np.log10(dc / c2)
    if scheme == "X2":
        # 2x2 observed/expected table per utils.py:186-202 with
        # observed = [cbs, bpe1-cbs], expected-row = [bpe2-cbs, B-(bpe1+bpe2-cbs)]
        o00, o01 = cbs, b1 - cbs
        o10, o11 = b2 - cbs, num_blocks - (b1 + b2 - cbs)
        rs0, rs1 = o00 + o01, o10 + o11
        cs0, cs1 = o00 + o10, o01 + o11
        tot = rs0 + rs1
        w = np.zeros_like(cbs)
        with np.errstate(divide="ignore", invalid="ignore"):
            for (o, r, c) in ((o00, rs0, cs0), (o01, rs0, cs1), (o10, rs1, cs0), (o11, rs1, cs1)):
                e = r * c / tot
                term = np.where(e > 0, (o - e) ** 2 / np.where(e > 0, e, 1.0), 0.0)
                w = w + term
        return w
    raise ValueError(f"unknown weighting scheme {scheme}")


def weighted_pairs_multi(
    pairs: ray.data.Dataset,
    edges: ray.data.Dataset,
    schemes: tuple[str, ...] = WEIGHT_SCHEMES,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """All requested schemes in ONE pass: the bpe/cpe joins and global
    scalars are computed once and every scheme's weight lands as its own
    ``weight_<scheme>`` column (value-identical to per-scheme
    weighted_pairs — same joined inputs, same formulas). 9 schemes cost
    ~1 scheme instead of ~9x the exchanges."""
    schemes = tuple(s.upper() for s in schemes)
    for s in schemes:
        if s not in WEIGHT_SCHEMES:
            raise ValueError(f"unknown weighting scheme {s}; have {WEIGHT_SCHEMES}")

    pairs, pschema = probe_schema(pairs)
    i64 = pa.int64()

    def _attach(p, pschema, stats, src, dsts):
        for key, dst in zip(("id1", "id2"), dsts):
            rhs_schema = pa.schema([(key, i64), (dst, i64)])
            p = hash_join(
                p, stats.rename_columns({"doc_id": key, src: dst}), on=(key,),
                num_partitions=num_partitions,
                left_schema=pschema, right_schema=rhs_schema,
            ).materialize()
            pschema = appended(pschema, [(dst, i64)]) if pschema else None
        return p, pschema

    p, pschema = _attach(pairs, pschema, entity_block_counts(edges), "bpe", ("bpe1", "bpe2"))
    num_blocks = None
    if any(s in ("ECBS", "X2") for s in schemes):
        num_blocks = edges.groupby("key").aggregate(Count(alias_name="n")).count()
    dc = None
    if any(s in ("EJS", "CNC", "CND", "CNJ") for s in schemes):
        dc = pairs.count()
        p, pschema = _attach(p, pschema, node_degrees(pairs), "cpe", ("cpe1", "cpe2"))

    def _weigh_all(batch: pa.Table) -> pa.Table:
        keep = [c for c in ("id1", "id2", "cbs", "arcs") if c in batch.column_names]
        out = {c: batch[c] for c in keep}
        for s in schemes:
            out[f"weight_{s.lower()}"] = pa.array(
                _scheme_weight(batch, s, num_blocks, dc), pa.float64()
            )
        return pa.table(out)

    return p.map_batches(_weigh_all, batch_format="pyarrow")


# ---------------------------------------------------------------- pruning --


def wep(weighted: ray.data.Dataset) -> ray.data.Dataset:
    """Weighted Edge Pruning: keep weight >= global mean (driver scalar)."""
    threshold = weighted.mean("weight")
    return weighted.filter(expr=f"weight >= {threshold!r}")


def cep(weighted: ray.data.Dataset, edges: ray.data.Dataset) -> ray.data.Dataset:
    """Cardinality Edge Pruning: global top-K by weight,
    K = sum(block sizes)/2 (comparison_cleaning.py:458-460); deterministic
    tie-break (weight desc, id1, id2)."""
    total_assignments = edges.count()  # sum of block sizes == edge-list rows
    k = int(total_assignments / 2)
    return weighted.sort(["weight", "id1", "id2"], descending=[True, False, False]).limit(k)


def _per_node_topk(
    weighted: ray.data.Dataset, k: int, require_both: bool = False
) -> ray.data.Dataset:
    """Each node's top-k incident edges (node-centric: both directions),
    reduced to canonical pairs; deterministic tie order (weight desc, id2
    asc). require_both=True = reciprocal (edge in BOTH endpoints' top-k).

    Plan: emit both directions in one Arrow map, keyed repartition on the
    center, partition-local vectorized top-k, then canonical-pair reduce —
    no groupby machinery (see blocking.per_center_topk)."""
    directed = directed_pairs(weighted.select_columns(["id1", "id2", "weight"]))
    kept = per_center_topk(directed, k)
    return reduce_canonical_pairs(kept, require_both=require_both)


def cnp(
    weighted: ray.data.Dataset,
    edges: ray.data.Dataset,
    num_entities: int | None = None,
    k: int | None = None,
) -> ray.data.Dataset:
    """Cardinality Node Pruning: per-node top-k, k = max(1, sum sizes / #entities)."""
    if k is None:
        total_assignments = edges.count()
        if num_entities is None:
            num_entities = edges.groupby("doc_id").aggregate(Count()).count()
        k = max(1, int(total_assignments / num_entities))
    return _per_node_topk(weighted, k)


def rcnp(
    weighted: ray.data.Dataset,
    edges: ray.data.Dataset,
    num_entities: int | None = None,
    k: int | None = None,
) -> ray.data.Dataset:
    """Reciprocal CNP: edge must be in BOTH endpoints' top-k
    (comparison_cleaning.py:548-568) — the canonical-pair reduce keeps pairs
    selected from both directions (count == 2)."""
    if k is None:
        total_assignments = edges.count()
        if num_entities is None:
            num_entities = edges.groupby("doc_id").aggregate(Count()).count()
        k = max(1, int(total_assignments / num_entities))
    return _per_node_topk(weighted, k, require_both=True)


def _node_stat(weighted: ray.data.Dataset, agg: str) -> ray.data.Dataset:
    """Per-node mean/max of incident edge weights (node-centric neighborhood)."""
    fwd = weighted.select_columns(["id1", "weight"]).rename_columns({"id1": "node"})
    rev = weighted.select_columns(["id2", "weight"]).rename_columns({"id2": "node"})
    both = fwd.union(rev)
    if agg == "mean":
        out = both.groupby("node").aggregate(Mean("weight", alias_name="stat"))
    else:
        out = both.groupby("node").aggregate(Max("weight", alias_name="stat"))
    return stamp_schema(out, pa.schema([("node", pa.int64()), ("stat", pa.float64())]))


def _join_node_stats(
    weighted: ray.data.Dataset,
    stats: ray.data.Dataset,
    names: tuple[str, str],
    num_partitions: int,
) -> ray.data.Dataset:
    """Join per-node stats onto both endpoints; one schema probe, joins stream."""
    weighted, wschema = probe_schema(weighted)
    s1, s2 = names
    f64 = pa.float64()
    p = hash_join(
        weighted, stats.rename_columns({"node": "id1", "stat": s1}), on=("id1",),
        num_partitions=num_partitions, left_schema=wschema,
        right_schema=pa.schema([("id1", pa.int64()), (s1, f64)]),
    ).materialize()  # barrier: see joins._with_similarity
    p = hash_join(
        p, stats.rename_columns({"node": "id2", "stat": s2}), on=("id2",),
        num_partitions=num_partitions,
        left_schema=appended(wschema, [(s1, f64)]) if wschema else None,
        right_schema=pa.schema([("id2", pa.int64()), (s2, f64)]),
    )
    return p


def wnp(weighted: ray.data.Dataset, num_partitions: int = 32) -> ray.data.Dataset:
    """Weighted Node Pruning: keep w >= neighborhood-average of EITHER endpoint."""
    stats = _node_stat(weighted, "mean")
    p = _join_node_stats(weighted, stats, ("avg1", "avg2"), num_partitions)
    return p.filter(expr="weight >= avg1 or weight >= avg2").select_columns(
        ["id1", "id2", "cbs", "weight"]
    )


def rwnp(weighted: ray.data.Dataset, num_partitions: int = 32) -> ray.data.Dataset:
    """Reciprocal WNP: w >= BOTH neighborhood averages."""
    stats = _node_stat(weighted, "mean")
    p = _join_node_stats(weighted, stats, ("avg1", "avg2"), num_partitions)
    return p.filter(expr="weight >= avg1 and weight >= avg2").select_columns(
        ["id1", "id2", "cbs", "weight"]
    )


def blast(weighted: ray.data.Dataset, num_partitions: int = 32) -> ray.data.Dataset:
    """BLAST: keep w >= (max_neighborhood(i) + max_neighborhood(j)) / 4."""
    stats = _node_stat(weighted, "max")
    p = _join_node_stats(weighted, stats, ("max1", "max2"), num_partitions)

    # NOTE: not an expr-filter — Ray 2.49's expression parser silently
    # mis-evaluates arithmetic like (max1 + max2) / 4 (returns no rows).
    def _keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "weight" not in batch.column_names:
            return pa.schema(
                [("id1", pa.int64()), ("id2", pa.int64()),
                 ("cbs", pa.int64()), ("weight", pa.float64())]
            ).empty_table()
        w = batch["weight"].to_numpy(zero_copy_only=False)
        m1 = batch["max1"].to_numpy(zero_copy_only=False)
        m2 = batch["max2"].to_numpy(zero_copy_only=False)
        keep = w >= (m1 + m2) / 4.0
        return batch.filter(pa.array(keep)).select(["id1", "id2", "cbs", "weight"])

    return p.map_batches(_keep, batch_format="pyarrow")


def sorted_neighborhood_pairs(
    edges: ray.data.Dataset,
    window: int = 2,
    max_window: int | None = None,
    seed: int = 42,
    chunk_size: int | None = None,
) -> ray.data.Dataset:
    """Progressive Sorted Neighborhood (PSN) candidate generation.

    Reference (comparison_cleaning.py:751-981 + utils.py:215-230): sort blocks
    alphabetically by key, shuffle each block's entities (seeded), concatenate
    into one position list, then compare entities within sliding windows of
    growing size; pair weight = co-occurrence count across window sizes.

    Distributed form, EXACT (no boundary drops): the global sort order
    (key, seeded per-row hash) is realized as a dense global position —
    rows hash-partition by first-byte part (all rows of a part co-locate),
    rank locally, and a tiny per-part count table (<= 257 rows) cumsums to
    per-part offsets on the driver. Windowed pairing then runs over
    position CHUNKS with a max_window-row head-overlap copied to the
    previous chunk, so every (i, i+w) pair is emitted exactly once by the
    chunk that owns position i. Returns (id1, id2, weight=co-occurrence
    count).
    """
    import pyarrow.compute as _pc

    from ..functions.hashing import hash64
    from .exchange import effective_partitions as _ep

    if max_window is None:
        max_window = window

    def _perm(batch: pa.Table) -> pa.Table:
        keys = batch["key"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mix = np.array(
            [hash64(f"{k}|{i}", seed) for k, i in zip(keys, ids)], dtype=np.uint64
        ).view(np.int64)
        part = np.array([ord(k[0]) if k else 0 for k in keys], dtype=np.int64)
        return pa.table(
            {"key": batch["key"], "doc_id": batch["doc_id"],
             "mix": pa.array(mix, pa.int64()),
             "part": pa.array(part, pa.int64())}
        )

    def _rank(batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("part", pa.int64()), ("rank", pa.int64()), ("doc_id", pa.int64())]
        )
        if batch.num_rows == 0 or "key" not in batch.column_names:
            return schema.empty_table()
        idx = _pc.sort_indices(
            batch,
            sort_keys=[("part", "ascending"), ("key", "ascending"), ("mix", "ascending")],
        )
        t = batch.take(idx)
        parts = t["part"].to_numpy(zero_copy_only=False)
        n = len(parts)
        starts = np.concatenate([[0], np.flatnonzero(parts[1:] != parts[:-1]) + 1])
        lengths = np.diff(np.concatenate([starts, [n]]))
        rank = np.arange(n) - np.repeat(starts, lengths)
        return pa.table(
            {"part": t["part"], "rank": pa.array(rank, pa.int64()), "doc_id": t["doc_id"]}
        )

    ranked = (
        edges.map_batches(_perm, batch_format="pyarrow")
        .repartition(_ep(64), keys=["part"])
        .map_batches(_rank, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    # per-part counts -> global offsets: <= 257 distinct first-byte parts,
    # a driver-side cumsum over a tiny table, broadcast into the chunker
    counts = stamp_schema(
        ranked.groupby("part").aggregate(Count(alias_name="n")),
        pa.schema([("part", pa.int64()), ("n", pa.int64())]),
    ).take_all()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["part"]):
        offsets[row["part"]] = acc
        acc += row["n"]
    off_ref = ray.put(offsets)
    if chunk_size is None:
        chunk_size = max(4096, 4 * max_window)
    chunk_size = max(chunk_size, max_window + 1)

    def _chunk(batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("chunk", pa.int64()), ("pos", pa.int64()), ("doc_id", pa.int64())]
        )
        if batch.num_rows == 0 or "part" not in batch.column_names:
            return schema.empty_table()
        offs = ray.get(off_ref)
        parts = batch["part"].to_numpy(zero_copy_only=False)
        rank = batch["rank"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.array([offs[p] for p in parts], dtype=np.int64) + rank
        chunk = pos // chunk_size
        # head-of-chunk rows also serve the PREVIOUS chunk's tail windows
        overlap = (pos % chunk_size < max_window) & (chunk > 0)
        return pa.table(
            {
                "chunk": pa.array(np.concatenate([chunk, chunk[overlap] - 1]), pa.int64()),
                "pos": pa.array(np.concatenate([pos, pos[overlap]]), pa.int64()),
                "doc_id": pa.array(np.concatenate([ids, ids[overlap]]), pa.int64()),
            }
        )

    chunked = ranked.map_batches(_chunk, batch_format="pyarrow").repartition(
        _ep(64), keys=["chunk"]
    )

    def _windows(batch: pa.Table) -> pa.Table:
        schema = pa.schema([("id1", pa.int64()), ("id2", pa.int64())])
        if batch.num_rows == 0 or "chunk" not in batch.column_names:
            return schema.empty_table()
        idx = _pc.sort_indices(
            batch, sort_keys=[("chunk", "ascending"), ("pos", "ascending")]
        )
        t = batch.take(idx)
        chunks = t["chunk"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        starts = np.concatenate(
            [[0], np.flatnonzero(chunks[1:] != chunks[:-1]) + 1, [n]]
        )
        out1, out2 = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            c = chunks[s]
            run_ids, run_pos = ids[s:e], pos[s:e]
            for w in range(1, max_window + 1):
                if e - s <= w:
                    break
                a, b = run_ids[:-w], run_ids[w:]
                # only pairs whose EARLIER position this chunk owns (the
                # overlap copies' own chunk emits the rest)
                keep = (a != b) & (run_pos[:-w] // chunk_size == c)
                out1.append(np.minimum(a, b)[keep])
                out2.append(np.maximum(a, b)[keep])
        if not out1:
            return schema.empty_table()
        return pa.table(
            {"id1": pa.array(np.concatenate(out1), pa.int64()),
             "id2": pa.array(np.concatenate(out2), pa.int64())}
        )

    raw = chunked.map_batches(_windows, batch_format="pyarrow", batch_size=None)
    out = raw.groupby(["id1", "id2"]).aggregate(Count(alias_name="weight"))
    return stamp_schema(
        out, pa.schema([("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.int64())])
    )


def random_pairs(
    weighted: ray.data.Dataset, fraction: float, seed: int = 42
) -> ray.data.Dataset:
    """RandomPM baseline (prioritization.py:952-985): random sample of the
    candidate comparisons (seeded)."""
    return weighted.random_sample(fraction, seed=seed)


def progressive_local_top(
    weighted: ray.data.Dataset,
    edges: ray.data.Dataset,
    budget: int,
    num_entities: int | None = None,
) -> ray.data.Dataset:
    """LocalTopPM (prioritization.py:563-619): per-node top-k neighborhoods,
    then global descending-weight emission under budget."""
    kept = cnp(weighted, edges, num_entities=num_entities)
    return kept.sort(["weight", "id1", "id2"], descending=[True, False, False]).limit(budget)


def progressive_top(weighted: ray.data.Dataset, budget: int) -> ray.data.Dataset:
    """Progressive/budgeted emission: globally best `budget` pairs in
    deterministic order (prioritization.py:142-220's TOP strategy)."""
    return weighted.sort(
        ["weight", "id1", "id2"], descending=[True, False, False]
    ).limit(budget)


def progressive_emit(
    weighted: ray.data.Dataset,
    budget: int,
    strategy: str = "DFS",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """DFS / BFS / HB budgeted emission (DatasetScheduler._emit_pairs,
    src/pyjedai/utils.py:543-595; EntityScheduler heap pops in (weight desc,
    neighbor asc) order, utils.py:336-416).

    The serial scheduler walks per-entity neighborhoods sorted by descending
    average weight: DFS drains each neighborhood fully; BFS round-robins one
    pop per neighborhood; HB takes one pop per neighborhood first, then
    DFS over the rest. All three orders are pure functions of
    (neighborhood avg weight, center id, within-neighborhood position), so
    each edge gets those columns and the order becomes a global sort:

      DFS: (avg desc, id1, pos)      BFS: (pos, avg desc, id1)
      HB:  (pos>0, avg desc, id1, pos)

    A pair seen from both directions emits only at its EARLIER key
    (the scheduler's `_checked_pair` dedup); later occurrences don't consume
    budget. Ties in avg are broken by center id — the reference's tie order
    is dict-insertion-dependent; we pin a total order (SURVEY.md §7).

    Plan: keyed repartition on the center -> per-partition annotate
    (pos/avg from one sorted run scan) -> keyed repartition on the canonical
    pair -> first-occurrence winner -> global sort + limit(budget).
    """
    strategy = strategy.upper()
    if strategy == "TOP":
        return progressive_top(weighted, budget)
    if strategy not in ("DFS", "BFS", "HB"):
        raise ValueError(f"unknown emission strategy {strategy}")

    directed = directed_pairs(weighted.select_columns(["id1", "id2", "weight"]))
    return emit_directed(directed, budget, strategy, num_partitions)


def emit_directed(
    directed: ray.data.Dataset,
    budget: int,
    strategy: str,
    num_partitions: int = 32,
    avg_round: int | None = None,
) -> ray.data.Dataset:
    """Budgeted DFS/BFS/HB emission over DIRECTED neighborhoods (id1=center,
    id2=neighbor, weight). Used by ``progressive_emit`` (symmetrized
    meta-blocking neighborhoods) and ``embeddings_nn_bpm`` (asymmetric kNN
    neighborhoods, prioritization.py:622-842). Within each neighborhood the
    position order is (weight desc, id2 asc) — for kNN inputs this equals the
    rank order. See ``progressive_emit`` for the sort-plan derivation."""
    import pyarrow.compute as _pc

    strategy = strategy.upper()
    if strategy not in ("DFS", "BFS", "HB"):
        raise ValueError(f"unknown emission strategy {strategy}")
    from .exchange import effective_partitions as _ep

    ann_schema = pa.schema(
        [
            ("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64()),
            ("pos", pa.int64()), ("avg", pa.float64()), ("blk", pa.int64()),
            ("lo", pa.int64()), ("hi", pa.int64()),
        ]
    )

    parts = directed.repartition(_ep(num_partitions), keys=["id1"])

    def _annotate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id1" not in batch.column_names:
            return ann_schema.empty_table()
        idx = _pc.sort_indices(
            batch,
            sort_keys=[("id1", "ascending"), ("weight", "descending"), ("id2", "ascending")],
        )
        t = batch.take(idx)
        ids = t["id1"].to_numpy(zero_copy_only=False)
        nbs = t["id2"].to_numpy(zero_copy_only=False)
        w = t["weight"].to_numpy(zero_copy_only=False)
        n = len(ids)
        starts = np.concatenate([[0], np.flatnonzero(ids[1:] != ids[:-1]) + 1])
        lengths = np.diff(np.concatenate([starts, [n]]))
        pos = np.arange(n) - np.repeat(starts, lengths)
        avg = np.repeat(np.add.reduceat(w, starts) / lengths, lengths)
        if avg_round is not None:
            # collapse sub-ulp summation-order noise so emission-order keys
            # are bit-identical with a SQL AVG oracle (float weights only;
            # integer-valued weights need no rounding)
            avg = np.round(avg, avg_round)
        blk = (pos > 0).astype(np.int64) if strategy == "HB" else np.zeros(n, np.int64)
        return pa.table(
            {
                "id1": pa.array(ids, pa.int64()),
                "id2": pa.array(nbs, pa.int64()),
                "weight": pa.array(w, pa.float64()),
                "pos": pa.array(pos, pa.int64()),
                "avg": pa.array(avg, pa.float64()),
                "blk": pa.array(blk, pa.int64()),
                "lo": pa.array(np.minimum(ids, nbs), pa.int64()),
                "hi": pa.array(np.maximum(ids, nbs), pa.int64()),
            }
        )

    annotated = parts.map_batches(_annotate, batch_format="pyarrow", batch_size=None)
    pair_parts = stamp_schema(annotated, ann_schema).repartition(
        _ep(num_partitions), keys=["lo", "hi"]
    )

    def _key_cols(t):
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        avg = t["avg"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        i1 = t["id1"].to_numpy(zero_copy_only=False)
        blk = t["blk"].to_numpy(zero_copy_only=False)
        if strategy == "DFS":
            order = (pos, i1, -avg, hi, lo)
        elif strategy == "BFS":
            order = (i1, -avg, pos, hi, lo)
        else:  # HB
            order = (pos, i1, -avg, blk, hi, lo)
        return np.lexsort(order)

    def _first_occurrence(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64()),
                ("pos", pa.int64()), ("avg", pa.float64()), ("blk", pa.int64()),
            ]
        )
        if batch.num_rows == 0 or "lo" not in batch.column_names:
            return out_schema.empty_table()
        order = _key_cols(batch)
        t = batch.take(pa.array(order))
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        first = np.concatenate(
            [[True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        )
        return t.filter(pa.array(first)).drop_columns(["lo", "hi"])

    winners = pair_parts.map_batches(
        _first_occurrence, batch_format="pyarrow", batch_size=None
    )
    if strategy == "DFS":
        cols, desc = ["avg", "id1", "pos"], [True, False, False]
    elif strategy == "BFS":
        cols, desc = ["pos", "avg", "id1"], [False, True, False]
    else:
        cols, desc = ["blk", "avg", "id1", "pos"], [False, True, False, False]
    return (
        winners.sort(cols, descending=desc)
        .limit(budget)
        .select_columns(["id1", "id2", "weight"])
    )


def global_psnm(
    edges: ray.data.Dataset,
    budget: int,
    window: int = 2,
    max_window: int | None = None,
    seed: int = 42,
) -> ray.data.Dataset:
    """GlobalPSNM (prioritization.py:872-911): PSN windowed co-occurrence
    weights emitted globally by descending weight under budget."""
    pairs = sorted_neighborhood_pairs(edges, window=window, max_window=max_window, seed=seed)
    return progressive_top(pairs, budget)


def local_psnm(
    edges: ray.data.Dataset,
    budget: int,
    window: int = 2,
    max_window: int | None = None,
    seed: int = 42,
    k: int = 1,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """LocalPSNM (prioritization.py:913-951): per-entity best PSN pairs
    first (per-node top-k over the windowed weights), then descending-weight
    emission under budget."""
    pairs = sorted_neighborhood_pairs(edges, window=window, max_window=max_window, seed=seed)
    kept = _per_node_topk(pairs.materialize(), k, require_both=False)
    return kept.sort(["weight", "id1", "id2"], descending=[True, False, False]).limit(budget)


def progressive_entity_scheduling(
    weighted: ray.data.Dataset,
    budget: int,
    method: str = "HB",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """PES / PESM (comparison_cleaning.py:984-1086 + prioritization.py:986-
    1088): per-entity weighted neighborhoods handed to the DatasetScheduler
    emission order. In columnar form that IS ``progressive_emit`` — the
    neighborhoods are the directed pair rows, the scheduler order is the
    deterministic sort plan, dedup is the canonical first-occurrence rule."""
    return progressive_emit(weighted, budget, strategy=method, num_partitions=num_partitions)


def emit_bilateral(
    directed: ray.data.Dataset,
    budget: int,
    strategy: str = "HB",
    num_partitions: int = 32,
    avg_round: int | None = None,
) -> ray.data.Dataset:
    """Bilateral indexing (reference utils.py:700-817 + workflow ``indexing=
    'bilateral'``): the reference runs the whole matcher twice — once with D1
    entities as neighborhood centers ("inorder"), once re-indexed with D2 as
    centers ("reverse") — and keeps the best score per pair. Columnar form:
    union the two orientations of the directed neighborhoods and emit; the
    canonical first-occurrence rule keeps each pair's earlier (best-ordered)
    orientation, no re-run needed."""

    def _swap(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id1" not in batch.column_names:
            return pa.schema(
                [("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64())]
            ).empty_table()
        return pa.table(
            {"id1": batch["id2"], "id2": batch["id1"], "weight": batch["weight"]}
        )

    both = directed.select_columns(["id1", "id2", "weight"]).union(
        directed.map_batches(_swap, batch_format="pyarrow")
    )
    return emit_directed(both, budget, strategy, num_partitions, avg_round=avg_round)
