"""Embedding encoder + learned coarse quantizer — the missing front half of
the vector pipeline (EmbeddingsNNBlockBuilding).

Reference: src/pyjedai/vector_based_blocking.py:312-425 encodes entities with
a sentence-transformer (model loaded once, batched inference) and :427-465
builds the FAISS coarse index. Neither torch nor FAISS exist in this
container, so the ENCODER KERNEL is stubbed behind the real actor-pool
plumbing (mirroring multimodal.MediaFeatureExtractor): with use_stub=True a
deterministic feature-hashing bag-of-tokens embedding (signed hashing trick,
L2-normalized float32[dim]); with use_stub=False this is where the model
would be constructed ONCE per actor.

The coarse quantizer is distributed spherical k-means (Lloyd's):
  fit:    deterministic hash-mod sample -> seeded k-means++ init on the
          driver -> per iteration: broadcast centroids (ray.put once), each
          batch emits k partial (sum-vector, count) rows, driver reduces
          (k x dim doubles — tiny) and renormalizes.
  assign: one broadcast matmul per batch (argmax cosine), streaming.
No stage materializes the corpus; the only driver-side state is k x dim.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import hash64
from ..functions.tokenize import token_sequence
from .exchange import ensure_context

EMB_SCHEMA_F32 = pa.list_(pa.float32())


class TextEncoder:
    """Actor-pool encoder stage: (doc_id, text) -> (doc_id, embedding).

    Real deployment loads the model in ``__init__`` (once per actor) and runs
    batched inference in ``__call__``. The stub kernel is the signed
    feature-hashing embedding; the per-actor token->(slot, sign) cache is the
    stateful part that justifies the actor pool even for the stub.
    """

    def __init__(
        self,
        dim: int = 64,
        seed: int = 42,
        use_stub: bool = True,
        model: str = "stub-encoder",
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        if not use_stub:
            raise NotImplementedError(
                f"real text encoding requires a sentence-transformer runtime — "
                f"not available in this environment; construct model "
                f"{model!r} here (loaded once per actor, on the device the "
                f"actor's num_gpus grant implies — the "
                f"vector_based_blocking.py:174-179 device-pick analog)"
            )
        self.dim = dim
        self.seed = seed
        self.model = model
        self.id_col = id_col
        self.text_col = text_col
        self._slot_cache: dict[str, tuple[int, float]] = {}

    def _token_slot(self, token: str) -> tuple[int, float]:
        hit = self._slot_cache.get(token)
        if hit is None:
            h = hash64(f"{self.seed}:{token}")
            hit = (int(h % self.dim), 1.0 if (h >> 32) & 1 else -1.0)
            self._slot_cache[token] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("embedding", EMB_SCHEMA_F32)]
        )
        if batch.num_rows == 0 or self.text_col not in batch.column_names:
            return out_schema.empty_table()
        n = batch.num_rows
        vecs = np.zeros((n, self.dim), dtype=np.float32)
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            for tok in token_sequence(text or ""):
                slot, sign = self._token_slot(tok)
                vecs[i, slot] += sign
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs /= norms
        return pa.table(
            {
                "doc_id": batch[self.id_col].cast(pa.int64()),
                "embedding": pa.array(vecs.tolist(), EMB_SCHEMA_F32),
            }
        )


def encode_texts(
    docs: ray.data.Dataset,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 1024,
    concurrency: int = 4,
    num_cpus: float = 1.0,
    num_gpus: float = 0.0,
    model: str = "stub-encoder",
    use_stub: bool = True,
) -> ray.data.Dataset:
    """docs -> (doc_id, embedding) via the per-actor encoder pool.

    Real-model deployment knobs (vector_based_blocking.py:128,174-193
    analog): ``model`` names the sentence-transformer checkpoint each actor
    loads once in ``__init__``; ``num_gpus`` reserves accelerator slots per
    actor (e.g. num_gpus=1, concurrency=#GPUs, use_stub=False) — Ray places
    the actors on GPU nodes and sets CUDA_VISIBLE_DEVICES; ``batch_size``
    bounds per-forward memory. With use_stub=True (this container has no
    torch) the kernel is the deterministic feature-hashing embedding and the
    same plumbing is exercised end-to-end."""
    return docs.map_batches(
        TextEncoder,
        fn_constructor_kwargs={
            "dim": dim, "seed": seed, "id_col": id_col, "text_col": text_col,
            "model": model, "use_stub": use_stub,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        **({"num_gpus": num_gpus} if num_gpus else {}),
    )


def _matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    from .ann import _batch_matrix, _normalize

    return _normalize(_batch_matrix(batch, vec_col, np.float32))


def kmeans_fit(
    embeddings: ray.data.Dataset,
    n_clusters: int = 8,
    iters: int = 8,
    sample_size: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Distributed spherical k-means -> (n_clusters, dim) unit centroids.

    Init: k-means++ on a deterministic hash-mod sample (never `limit()` —
    the first blocks are not a uniform sample of a partitioned corpus).
    Each Lloyd iteration is ONE streaming pass: batches emit per-cluster
    partial sums; the driver reduces k x dim doubles.
    """
    import pyarrow.compute as pc

    ensure_context(embeddings)
    n_total = embeddings.count()
    stride = max(1, n_total // max(1, sample_size))

    def _sample(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_col not in batch.column_names:
            return batch
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # multiplicative hash keeps the mod deterministic but id-order-free
        keep = ((ids * np.int64(0x9E3779B97F4A7C15)) % stride) == 0 if stride > 1 else np.ones(len(ids), bool)
        return batch.filter(pa.array(keep))

    sampled = embeddings.map_batches(_sample, batch_format="pyarrow").limit(
        sample_size * 2
    )
    mats = [
        _matrix(b, vec_col)
        for b in sampled.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    sample = np.concatenate(mats) if mats else np.zeros((0, 0), np.float32)
    if sample.shape[0] == 0:
        raise ValueError("kmeans_fit: empty embedding dataset")
    k = min(n_clusters, sample.shape[0])

    rng = np.random.default_rng(seed)
    # k-means++ seeding on the sample (cosine distance = 1 - dot)
    centroids = [sample[rng.integers(sample.shape[0])]]
    for _ in range(1, k):
        d = 1.0 - np.max(sample @ np.stack(centroids).T, axis=1)
        d = np.clip(d, 0.0, None)
        probs = d / d.sum() if d.sum() > 0 else np.full(len(d), 1.0 / len(d))
        centroids.append(sample[rng.choice(len(sample), p=probs)])
    centroids = np.stack(centroids).astype(np.float32)

    dim = centroids.shape[1]
    sums_schema = pa.schema(
        [("cluster", pa.int64()), ("vsum", pa.binary()), ("count", pa.int64())]
    )

    for _ in range(iters):
        cref = ray.put(centroids)

        def _partials(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or vec_col not in batch.column_names:
                return sums_schema.empty_table()
            c = ray.get(cref)
            m = _matrix(batch, vec_col)
            assign = np.argmax(m @ c.T, axis=1)
            rows_c, rows_s, rows_n = [], [], []
            for ci in np.unique(assign):
                sel = assign == ci
                rows_c.append(int(ci))
                rows_s.append(m[sel].sum(axis=0).astype(np.float64).tobytes())
                rows_n.append(int(sel.sum()))
            return pa.table(
                {
                    "cluster": pa.array(rows_c, pa.int64()),
                    "vsum": pa.array(rows_s, pa.binary()),
                    "count": pa.array(rows_n, pa.int64()),
                }
            )

        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for b in embeddings.map_batches(
            _partials, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            if b.num_rows == 0 or "cluster" not in b.column_names:
                continue
            for ci, vs, cnt in zip(
                b["cluster"].to_pylist(), b["vsum"].to_pylist(), b["count"].to_pylist()
            ):
                sums[ci] += np.frombuffer(vs, dtype=np.float64)
                counts[ci] += cnt
        nonempty = counts > 0
        new = centroids.astype(np.float64).copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        centroids = (new / norms).astype(np.float32)

    return centroids


def assign_buckets(
    embeddings: ray.data.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "bucket",
    n_probe: int = 1,
) -> ray.data.Dataset:
    """Append the nearest-centroid (argmax cosine) cell id — streaming, one
    broadcast matmul per batch.

    n_probe > 1 turns on multi-probe IVF (standard recall fix for cell-
    boundary misses): each vector EXPLODES into its ``n_probe`` closest
    cells with a ``primary`` flag marking the rank-0 cell. Membership
    semantics downstream: a vector is INDEXED only in its primary cell and
    QUERIES every probed cell, so each (query, candidate) pair is scored in
    exactly the candidate's primary cell — no duplicate pairs by
    construction."""
    cref = ray.put(np.asarray(centroids, dtype=np.float32))

    def _assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or vec_col not in batch.column_names:
            return batch
        c = ray.get(cref)
        m = _matrix(batch, vec_col)
        sims = m @ c.T
        if n_probe <= 1:
            assign = np.argmax(sims, axis=1).astype(np.int64)
            return batch.append_column(out_col, pa.array(assign, pa.int64()))
        p = min(n_probe, sims.shape[1])
        # top-p cells per vector, best first (argsort of negated sims)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :p].astype(np.int64)
        n = batch.num_rows
        idx = np.repeat(np.arange(n), p)
        exploded = batch.take(pa.array(idx))
        exploded = exploded.append_column(out_col, pa.array(order.ravel(), pa.int64()))
        primary = np.zeros(n * p, dtype=bool)
        primary[::p] = True
        return exploded.append_column("primary", pa.array(primary))

    return embeddings.map_batches(_assign, batch_format="pyarrow")


def embeddings_nn_blocking(
    docs: ray.data.Dataset,
    query_ids: np.ndarray | None = None,
    k: int = 5,
    dim: int = 64,
    n_clusters: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 100_000,
    oversize_mode: str = "raise",
    n_probe: int = 1,
    drop_counter: str | None = None,
) -> ray.data.Dataset:
    """End-to-end EmbeddingsNNBlockBuilding: encode -> k-means quantize ->
    IVF top-k — no pre-existing label/bucket column required
    (vector_based_blocking.py:312-465).

    query_ids=None probes EVERY document (self-join blocking, the reference
    default) — distributed: repartition by coarse cell, per-partition
    bucket-local matmul + vectorized top-k; nothing corpus-sized touches the
    driver. A small explicit probe set goes through ann.ivf_knn (broadcast
    queries).

    A coarse cell above ``max_bucket`` rows is the vector path's hot LSH key
    (same guard as ann.embedding_neardup): oversize_mode="raise" (default)
    refuses the O(b^2) matmul; oversize_mode="split" instead sub-divides the
    cell deterministically by doc-id hash into <= max_bucket sub-cells and
    runs kNN within each — bounded cost, with the recall caveat that
    cross-sub-cell neighbors inside the hot cell are not scored (the IVF
    twin of LSH bucket salting, SURVEY.md §4 skew handling). With
    ``drop_counter`` set, those unscored cross-sub-cell comparisons are a
    COUNTED metric (state.metrics key ``ivf_split_cells``: C(n,2) minus the
    sum of within-sub-cell C(n_i,2) per hot cell) so a production run can
    quantify the recall trade instead of reading this caveat.

    n_probe > 1 enables multi-probe IVF on the self-join path: every doc
    queries its n_probe closest cells (indexed only in its primary cell —
    see assign_buckets), recovering neighbors that straddle a cell boundary
    at ~n_probe x the matmul cost; the per-query results from different
    cells merge through one global top-k reduce.
    """
    if oversize_mode not in ("raise", "split"):
        raise ValueError(f"unknown oversize_mode {oversize_mode!r}")
    from . import ann
    from .exchange import effective_partitions, stamp_schema

    emb = encode_texts(
        docs, dim=dim, seed=seed, id_col=id_col, text_col=text_col
    ).materialize()
    centroids = kmeans_fit(
        emb, n_clusters=n_clusters, id_col="doc_id", vec_col="embedding", seed=seed
    )
    bucketed = assign_buckets(emb, centroids).materialize()

    if query_ids is not None:
        qset = set(int(q) for q in np.asarray(query_ids).tolist())

        def _only(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array([int(i) in qset for i in ids]))

        rows = sorted(
            bucketed.map_batches(_only, batch_format="pyarrow").take_all(),
            key=lambda r: r["doc_id"],
        )
        qids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
        qvecs = np.array([r["embedding"] for r in rows], dtype=np.float32)
        qbuckets = np.array([r["bucket"] for r in rows], dtype=np.int64)
        return ann.ivf_knn(
            bucketed, qvecs, qids, qbuckets, k=k,
            id_col="doc_id", vec_col="embedding", bucket_col="bucket",
        )

    multi_probe = n_probe > 1
    if multi_probe:
        bucketed = assign_buckets(emb, centroids, n_probe=n_probe).materialize()

    parts = bucketed.repartition(
        effective_partitions(32), keys=["bucket"]
    )

    def _bucket_knn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "bucket" not in batch.column_names:
            return ann.KNN_SCHEMA.empty_table()
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            batch, sort_keys=[("bucket", "ascending"), ("doc_id", "ascending")]
        )
        t = batch.take(idx)
        buckets = t["bucket"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        prim = (
            t["primary"].to_numpy(zero_copy_only=False)
            if "primary" in t.column_names
            else np.ones(len(ids), dtype=bool)
        )
        m = _matrix(t, "embedding")
        starts = np.concatenate(
            [[0], np.flatnonzero(buckets[1:] != buckets[:-1]) + 1, [len(ids)]]
        )
        out_q, out_n, out_s, out_r = [], [], [], []
        cells: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        split_dropped = 0
        split_events = 0
        for s, e in zip(starts[:-1], starts[1:]):
            sub_ids, sub, sub_p = ids[s:e], m[s:e], prim[s:e]
            n = sub_ids.size
            if n < 2:
                continue
            if n > max_bucket:
                if oversize_mode == "raise":
                    raise ValueError(
                        f"coarse cell of {n} rows exceeds max_bucket="
                        f"{max_bucket} (pass oversize_mode='split' to "
                        f"sub-divide hot cells)"
                    )
                n_sub = -(-n // max_bucket)
                salts = (sub_ids % np.int64(n_sub)).astype(np.int64)
                kept_pairs = 0
                for sv in range(n_sub):
                    sel = salts == sv
                    nsel = int(np.count_nonzero(sel))
                    kept_pairs += nsel * (nsel - 1) // 2
                    if nsel >= 2:
                        cells.append((sub_ids[sel], sub[sel], sub_p[sel]))
                split_events += 1
                split_dropped += n * (n - 1) // 2 - kept_pairs
                continue
            cells.append((sub_ids, sub, sub_p))
        if drop_counter is not None and split_events:
            from ..state.metrics import report_drops

            report_drops(drop_counter, "ivf_split_cells", split_dropped, split_events)
        for sub_ids, sub, sub_p in cells:
            n = sub_ids.size
            if sub_p.all():
                # single-probe fast path: full self-join in the cell
                scores = sub @ sub.T
                np.fill_diagonal(scores, -np.inf)
                kk = min(k, n - 1)
                order = np.lexsort(
                    (sub_ids[None, :].repeat(n, 0), -scores), axis=1
                )[:, :kk]
                out_q.append(np.repeat(sub_ids, kk))
                out_n.append(sub_ids[order].ravel())
                out_s.append(np.take_along_axis(scores, order, axis=1).ravel())
                out_r.append(np.tile(np.arange(1, kk + 1, dtype=np.int32), n))
                continue
            # multi-probe: every row queries; only PRIMARY rows are indexed
            cand_ids, cand = sub_ids[sub_p], sub[sub_p]
            if cand_ids.size == 0:
                continue
            scores = sub @ cand.T
            scores[sub_ids[:, None] == cand_ids[None, :]] = -np.inf
            kk = min(k, cand_ids.size)
            order = np.lexsort(
                (cand_ids[None, :].repeat(n, 0), -scores), axis=1
            )[:, :kk]
            top = np.take_along_axis(scores, order, axis=1)
            keep = np.isfinite(top.ravel())
            out_q.append(np.repeat(sub_ids, kk)[keep])
            out_n.append(cand_ids[order].ravel()[keep])
            out_s.append(top.ravel()[keep])
            out_r.append(
                np.tile(np.arange(1, kk + 1, dtype=np.int32), n)[keep]
            )
        if not out_q:
            return ann.KNN_SCHEMA.empty_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "score": pa.array(
                    np.concatenate(out_s).astype(np.float64), pa.float64()
                ),
                "rank": pa.array(np.concatenate(out_r), pa.int32()),
            }
        )

    out = parts.map_batches(_bucket_knn, batch_format="pyarrow", batch_size=None)
    if multi_probe:
        # a query's neighbors now come from up to n_probe cells: merge via
        # the per-query global top-k reduce (fresh ranks)
        return ann._reduce_global_topk(out, k)
    return stamp_schema(out, ann.KNN_SCHEMA)


def nn_progressive_emit(
    knn: ray.data.Dataset,
    budget: int,
    strategy: str = "HB",
    num_partitions: int = 32,
    avg_round: int | None = None,
) -> ray.data.Dataset:
    """Budgeted emission over kNN neighborhoods (query_id, neighbor_id,
    score[, rank]) — the EmbeddingsNNBPM ordering layer (reference
    prioritization.py:659-746): neighborhoods sorted by average similarity
    (reference sorts by ascending average DISTANCE — same order), TOP /
    DFS / BFS / HB emission, canonical-pair dedup, budget cut."""
    from ray.data.aggregate import Max as _Max

    from .exchange import stamp_schema as _stamp
    from .meta_blocking import emit_directed

    directed = knn.select_columns(
        ["query_id", "neighbor_id", "score"]
    ).rename_columns({"query_id": "id1", "neighbor_id": "id2", "score": "weight"})
    strategy = strategy.upper()
    if strategy == "TOP":
        # global descending-score emission; a pair seen from both
        # neighborhoods emits once (canonical order, max score)
        def _canon(batch: pa.Table) -> pa.Table:
            schema = pa.schema(
                [("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64())]
            )
            if batch.num_rows == 0 or "id1" not in batch.column_names:
                return schema.empty_table()
            a = batch["id1"].to_numpy(zero_copy_only=False)
            b = batch["id2"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "id1": pa.array(np.minimum(a, b), pa.int64()),
                    "id2": pa.array(np.maximum(a, b), pa.int64()),
                    "weight": batch["weight"],
                }
            )

        dd = _stamp(
            directed.map_batches(_canon, batch_format="pyarrow")
            .groupby(["id1", "id2"])
            .aggregate(_Max("weight", alias_name="weight")),
            pa.schema(
                [("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64())]
            ),
        )
        return dd.sort(
            ["weight", "id1", "id2"], descending=[True, False, False]
        ).limit(budget)
    return emit_directed(directed, budget, strategy, num_partitions, avg_round=avg_round)


def embeddings_nn_bpm(
    docs: ray.data.Dataset,
    budget: int,
    strategy: str = "HB",
    k: int = 5,
    dim: int = 64,
    n_clusters: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """EmbeddingsNNBPM (prioritization.py:622-842): encode entities (actor
    pool), build kNN neighborhoods (k-means coarse quantize + bucket-local
    top-k), then budgeted TOP/DFS/BFS/HB emission -> (id1, id2, weight)."""
    knn = embeddings_nn_blocking(
        docs, k=k, dim=dim, n_clusters=n_clusters, seed=seed,
        id_col=id_col, text_col=text_col,
    )
    return nn_progressive_emit(knn, budget, strategy, num_partitions)
