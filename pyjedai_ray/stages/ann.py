"""Similarity search over an embedding column (list<float>).

Reference analog: ``EmbeddingsNNBlockBuilding`` (src/pyjedai/
vector_based_blocking.py:61-590) encodes entities and runs FAISS top-k NN in
one process. FAISS/torch are not available here; the same roles are covered
with numpy over Ray Data:

* ``knn_brute_force``   — exact top-k cosine: the query matrix is broadcast
  once (``ray.put``), every batch does one matmul against it and emits its
  LOCAL top-k per query (bounding the shuffle to k * Q * num_batches rows),
  then a per-query reduce keeps the global top-k. Deterministic tie order
  (score desc, neighbor id asc).
* ``ivf_knn``           — the scale path: vectors are pre-bucketed by a
  coarse quantizer (here: the dataset's ``label`` column or any bucket
  column; a real deployment plugs k-means centroids into ``bucket_fn``) and
  only the probe's bucket is scanned.
* ``embedding_neardup`` — near-duplicate pairs by cosine >= threshold within
  buckets (the embedding-cosine dedup entry of the training-data suite).

All stages assume fixed-dimension vectors; ragged inputs raise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .exchange import effective_partitions, ensure_context, stamp_schema

KNN_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("score", pa.float64()), ("rank", pa.int32())]
)


def _reduce_global_topk(partials: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """Per-query global top-k over local-top-k partials: keyed repartition on
    query_id + ONE vectorized sort/run-scan per partition (the
    blocking._emit_pairs_partition pattern) — no per-group pandas UDF, which
    collapses when the query count is corpus-sized."""
    import pyarrow.compute as pc

    ensure_context(partials)
    parts = partials.repartition(effective_partitions(32), keys=["query_id"])

    def _topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "query_id" not in batch.column_names:
            return KNN_SCHEMA.empty_table()
        idx = pc.sort_indices(
            batch,
            sort_keys=[
                ("query_id", "ascending"),
                ("score", "descending"),
                ("neighbor_id", "ascending"),
            ],
        )
        t = batch.take(idx)
        q = t["query_id"].to_numpy(zero_copy_only=False)
        n = len(q)
        starts = np.concatenate([[0], np.flatnonzero(q[1:] != q[:-1]) + 1])
        lengths = np.diff(np.concatenate([starts, [n]]))
        pos = np.arange(n) - np.repeat(starts, lengths)
        keep = pos < k
        t = t.select(["query_id", "neighbor_id", "score"]).filter(pa.array(keep))
        return t.append_column("rank", pa.array((pos[keep] + 1).astype(np.int32), pa.int32()))

    return stamp_schema(
        parts.map_batches(_topk, batch_format="pyarrow", batch_size=None), KNN_SCHEMA
    )
PAIR_SCHEMA = pa.schema([("id1", pa.int64()), ("id2", pa.int64()), ("score", pa.float64())])


def _batch_matrix(batch: pa.Table, vec_col: str, dtype=np.float32) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pyarrow.compute as pc

    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(dtype)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if len(set(lens.tolist())) > 1:
        raise ValueError(f"ragged embedding column: lengths {sorted(set(lens.tolist()))[:5]}")
    d = int(lens[0]) if len(lens) else 0
    return flat.reshape(-1, d) if d else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute_force(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    dtype=np.float32,
    score_round: int | None = None,
) -> ray.data.Dataset:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank), rank 1..k.

    dtype=np.float64 + score_round for bit-parity with double-precision
    oracles (scores are rounded BEFORE ranking so ties break identically)."""
    qm = _normalize(np.asarray(queries, dtype=dtype))
    qref = ray.put((qm, np.asarray(query_ids, dtype=np.int64)))

    def _local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or vec_col not in batch.column_names:
            return pa.schema(
                [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("score", pa.float64())]
            ).empty_table()
        q, qids = ray.get(qref)
        m = _normalize(_batch_matrix(batch, vec_col, dtype))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        scores = q @ m.T  # (Q, batch)
        if score_round is not None:
            scores = np.round(scores, score_round)
        if exclude_self:
            mask = qids[:, None] == ids[None, :]
            scores = np.where(mask, -np.inf, scores)
        kk = min(k, scores.shape[1])
        # deterministic local top-k per query: (score desc, id asc)
        order = np.lexsort((ids[None, :].repeat(len(qids), 0), -scores), axis=1)[:, :kk]
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(len(qids)):
            sel = order[qi]
            sel = sel[np.isfinite(scores[qi, sel])]
            rows_q.append(np.full(sel.size, qids[qi], dtype=np.int64))
            rows_n.append(ids[sel])
            rows_s.append(scores[qi, sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q) if rows_q else [], pa.int64()),
                "neighbor_id": pa.array(np.concatenate(rows_n) if rows_n else [], pa.int64()),
                "score": pa.array(np.concatenate(rows_s).astype(np.float64) if rows_s else [], pa.float64()),
            }
        )

    partials = embeddings.map_batches(_local_topk, batch_format="pyarrow")
    return _reduce_global_topk(partials, k)


def embedding_neardup(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = "label",
    max_bucket: int = 100_000,
    dtype=np.float64,
) -> ray.data.Dataset:
    """(id1, id2, score) pairs with cosine >= threshold, id1 < id2.

    Pairs are enumerated WITHIN buckets (coarse-quantizer cells). With
    bucket_col=None the whole dataset is one bucket — exact but O(n^2); at
    scale always bucket (IVF-style). Buckets above ``max_bucket`` raise
    rather than silently exploding.
    """
    ensure_context()

    def _pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2 or vec_col not in group.column_names:
            return PAIR_SCHEMA.empty_table()
        if n > max_bucket:
            raise ValueError(f"bucket of {n} rows exceeds max_bucket={max_bucket}")
        m = _normalize(_batch_matrix(group, vec_col, dtype))
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sims = m @ m.T
        iu, ju = np.triu_indices(n, k=1)
        keep = sims[iu, ju] >= threshold
        iu, ju = iu[keep], ju[keep]
        a, b = ids[iu], ids[ju]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "id1": pa.array(lo, pa.int64()),
                "id2": pa.array(hi, pa.int64()),
                "score": pa.array(sims[iu, ju].astype(np.float64), pa.float64()),
            }
        )

    if bucket_col is None:
        whole = embeddings.repartition(1)
        return stamp_schema(
            whole.map_batches(_pairs, batch_format="pyarrow", batch_size=max_bucket), PAIR_SCHEMA
        )
    out = embeddings.groupby(bucket_col).map_groups(_pairs, batch_format="pyarrow")
    return stamp_schema(out, PAIR_SCHEMA)


def ivf_knn(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    query_buckets: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> ray.data.Dataset:
    """IVF-style top-k: each query only scans its own bucket's vectors.

    ``query_buckets[i]`` is the coarse cell of query i (in a full IVF this is
    argmin distance to centroids, possibly nprobe>1 cells — plug that in by
    repeating queries per probed cell)."""
    qm = _normalize(np.asarray(queries, dtype=np.float32))
    qref = ray.put((qm, np.asarray(query_ids, dtype=np.int64), np.asarray(query_buckets)))

    def _local(batch: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("score", pa.float64())]
        ).empty_table()
        if batch.num_rows == 0 or vec_col not in batch.column_names:
            return empty
        q, qids, qbuckets = ray.get(qref)
        buckets = batch[bucket_col].to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            sel = buckets == qbuckets[qi]
            if not sel.any():
                continue
            sub_ids = ids[sel]
            scores = m[sel] @ q[qi]
            mask = sub_ids != qids[qi]
            sub_ids, scores = sub_ids[mask], scores[mask]
            kk = min(k, scores.size)
            order = np.lexsort((sub_ids, -scores))[:kk]
            out_q.append(np.full(kk, qids[qi], dtype=np.int64))
            out_n.append(sub_ids[order])
            out_s.append(scores[order].astype(np.float64))
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partials = embeddings.map_batches(_local, batch_format="pyarrow")
    return _reduce_global_topk(partials, k)


def lsh_plane_edges(
    embeddings: ray.data.Dataset,
    dim: int,
    planes: int = 32,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Random-hyperplane LSH band keys for vectors -> (key:int64,
    doc_id:int64) edge list, one row per band.

    The vector twin of the MinHash band explode (stages/minhash.py): sign
    bits of `planes` seeded gaussian projections, folded into `bands` chunks
    of planes/bands bits, each namespaced by band index. Two vectors share a
    band key iff every sign bit in that chunk agrees — P(collision) follows
    the angular-similarity S-curve (Charikar's SimHash family). Stateless
    map_batches; the projection matrix is broadcast once via ray.put."""
    if planes % bands != 0:
        raise ValueError(f"planes ({planes}) must divide evenly into bands ({bands})")
    width = planes // bands
    if width > 56:
        raise ValueError("planes/bands must be <= 56 bits (int64 band keys)")
    rng = np.random.default_rng(seed)
    planes_ref = ray.put(rng.standard_normal((planes, dim)).astype(np.float32))

    def _sign(batch: pa.Table) -> pa.Table:
        schema = pa.schema([("key", pa.int64()), ("doc_id", pa.int64())])
        if batch.num_rows == 0 or vec_col not in batch.column_names:
            return schema.empty_table()
        r = ray.get(planes_ref)
        m = _batch_matrix(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bits = (m @ r.T > 0).astype(np.uint64)  # (n, planes)
        n = bits.shape[0]
        chunk = bits.reshape(n, bands, width)
        weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))[None, None, :]
        keys = (chunk * weights).sum(axis=2)  # (n, bands)
        keys |= np.arange(bands, dtype=np.uint64)[None, :] << np.uint64(56)
        return pa.table(
            {
                "key": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
            }
        )

    return embeddings.map_batches(_sign, batch_format="pyarrow")


def lsh_neardup(
    embeddings: ray.data.Dataset,
    dim: int,
    threshold: float = 0.9,
    planes: int = 32,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_size: int = 10_000,
    num_partitions: int = 32,
    score_round: int | None = 6,
    drop_counter: str | None = None,
) -> ray.data.Dataset:
    """LSH-bucketed embedding near-dup: the scale path that needs NO trained
    quantizer (the alternative to the IVF/k-means route in encoding.py).

    hyperplane band keys -> band-key shuffle -> candidate pairs (hot keys
    capped/chained by the shared machinery) -> EXACT cosine verification at
    `threshold` — precision is exact; recall follows the band S-curve
    (identical vectors collide in every band, so exact duplicates are always
    recovered). Returns (id1, id2, weight)."""
    from .blocking import candidate_pairs
    from .matching import verify_pairs_vectors

    edges = lsh_plane_edges(
        embeddings, dim, planes=planes, bands=bands, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    cands = candidate_pairs(
        edges, max_block_size=max_block_size, num_partitions=num_partitions,
        drop_counter=drop_counter, drop_key="lsh_plane_cap",
    ).select_columns(["id1", "id2"])
    out = verify_pairs_vectors(
        cands, embeddings, threshold=threshold, id_col=id_col, vec_col=vec_col,
        num_partitions=num_partitions,
    )
    if score_round is not None:
        def _r(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "weight" not in batch.column_names:
                return batch
            v = np.round(
                batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64),
                score_round,
            )
            i = batch.column_names.index("weight")
            return batch.set_column(i, "weight", pa.array(v, pa.float64()))

        out = out.map_batches(_r, batch_format="pyarrow")
    return out
