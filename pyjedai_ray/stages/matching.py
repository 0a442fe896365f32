"""Pairwise verification (entity matching) over the candidate-pairs Dataset.

Reference analog: ``EntityMatching.predict`` (src/pyjedai/matching.py:398-462)
loops candidate pairs serially computing a string similarity per pair. Here
the pair ids are hash-joined back to the signature (or text) columns and a
vectorized ``map_batches`` UDF computes the similarity per row; the >threshold
filter yields the similarity graph as a (id1, id2, weight) Dataset — no
networkx (SURVEY.md §1.3).

Two verification modes:
* ``verify_pairs``        — exact Jaccard on 64-bit shingle-hash sets (the
  MinHash ground truth; string_matchers.py:39-157 Jaccard semantics) plus
  SimHash Hamming distance. Uses only signature columns — texts never enter
  the shuffle.
* ``verify_pairs_text``   — set/edit metrics over raw text columns
  (matching.py:493-537 ``_similarity``), for parity with the reference's
  tokenizer/metric matrix on small corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import similarity as sim
from ..functions.hashing import hamming64
from ..functions.tokenize import qgram_keys, standard_tokens
from .exchange import hash_join


def join_signatures(
    pairs: ray.data.Dataset,
    sigs: ray.data.Dataset,
    columns: tuple[str, ...] = ("shingles", "simhash"),
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """pairs (id1,id2,...) + sigs (doc_id,...) -> pairs with per-side columns
    suffixed _1/_2 (two hash joins on doc_id)."""
    s = sigs.select_columns(["doc_id", *columns])
    left = s.rename_columns({"doc_id": "id1", **{c: f"{c}_1" for c in columns}})
    right = s.rename_columns({"doc_id": "id2", **{c: f"{c}_2" for c in columns}})
    out = hash_join(pairs, left, on=("id1",), num_partitions=num_partitions)
    return hash_join(out, right, on=("id2",), num_partitions=num_partitions)


_VERIFIED_SCHEMA = pa.schema(
    [("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64()), ("hamming", pa.int32())]
)


def _jaccard_rows(sh1: list, sh2: list) -> np.ndarray:
    w = np.empty(len(sh1), dtype=np.float64)
    for i in range(len(sh1)):
        a = np.frombuffer(sh1[i], dtype=np.uint64)
        b = np.frombuffer(sh2[i], dtype=np.uint64)
        if a.size == 0 and b.size == 0:
            w[i] = 1.0
        elif a.size == 0 or b.size == 0:
            w[i] = 0.0
        else:
            inter = np.intersect1d(a, b, assume_unique=True).size
            w[i] = inter / (a.size + b.size - inter)
    return w


def verify_pairs(
    pairs: ray.data.Dataset,
    sigs: ray.data.Dataset,
    threshold: float = 0.8,
    num_partitions: int = 32,
    keep_below: bool = False,
    mode: str = "join",
) -> ray.data.Dataset:
    """Exact-Jaccard verification on shingle-hash sets -> (id1, id2, weight,
    hamming). ``weight`` is Jaccard over the uint64 shingle arrays.

    mode="join": two distributed hash joins attach per-side signatures — the
    scale path (nothing is held in one node's memory).
    mode="broadcast": ``ray.put`` the signature lookup ONCE and read it in
    every verify task — the small-side pattern (SURVEY.md §4) for corpora
    whose signatures fit the object store; zero shuffles.
    """
    if mode == "broadcast":
        import ray as _ray

        @_ray.remote
        def _shard(block: pa.Table) -> dict:
            if block.num_columns == 0:
                return {}
            return {
                d: (sh, sim_h)
                for d, sh, sim_h in zip(
                    block["doc_id"].to_pylist(),
                    block["shingles"].to_pylist(),
                    block["simhash"].to_pylist(),
                )
            }

        # build lookup shards IN PARALLEL from the materialized signature
        # blocks; the driver only holds refs (no serial dict build — that was
        # a linear Amdahl term in the scaling profile)
        mat = sigs.select_columns(["doc_id", "shingles", "simhash"]).materialize()
        shard_refs = [_shard.remote(ref) for ref in mat.to_arrow_refs()]

        class _VerifyBcast:
            """Actor: merges the shard dicts ONCE per actor (parallel across
            the pool), then verifies batches against the merged lookup."""

            def __init__(self, refs):
                self.lookup = {}
                for d in _ray.get(refs):
                    self.lookup.update(d)

            def __call__(self, batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0 or "id1" not in batch.column_names:
                    return _VERIFIED_SCHEMA.empty_table()
                lk = self.lookup
                i1 = batch["id1"].to_pylist()
                i2 = batch["id2"].to_pylist()
                sh1 = [lk[d][0] for d in i1]
                sh2 = [lk[d][0] for d in i2]
                w = _jaccard_rows(sh1, sh2)
                ham = hamming64(
                    np.array([lk[d][1] for d in i1], dtype=np.int64),
                    np.array([lk[d][1] for d in i2], dtype=np.int64),
                )
                return pa.table(
                    {
                        "id1": pa.array(i1, pa.int64()),
                        "id2": pa.array(i2, pa.int64()),
                        "weight": pa.array(w, pa.float64()),
                        "hamming": pa.array(ham, pa.int32()),
                    }
                )

        import ray as _r

        pool = max(2, int(_r.cluster_resources().get("CPU", 4)) // 4)
        out = pairs.map_batches(
            _VerifyBcast,
            fn_constructor_kwargs={"refs": shard_refs},
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=pool,
        )
    else:
        joined = join_signatures(pairs, sigs, ("shingles", "simhash"), num_partitions)

        def _verify(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "shingles_1" not in batch.column_names:
                return _VERIFIED_SCHEMA.empty_table()
            w = _jaccard_rows(batch["shingles_1"].to_pylist(), batch["shingles_2"].to_pylist())
            ham = hamming64(
                batch["simhash_1"].to_numpy(zero_copy_only=False),
                batch["simhash_2"].to_numpy(zero_copy_only=False),
            )
            return pa.table(
                {
                    "id1": batch["id1"],
                    "id2": batch["id2"],
                    "weight": pa.array(w, pa.float64()),
                    "hamming": pa.array(ham, pa.int32()),
                }
            )

        out = joined.map_batches(_verify, batch_format="pyarrow")
    if not keep_below:
        out = out.filter(expr=f"weight >= {threshold!r}")
    return out


_TOKENIZERS = {
    "word": standard_tokens,
    "qgram": qgram_keys,
}


def verify_pairs_text(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    metric: str = "jaccard",
    tokenizer: str = "word",
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Text-level verification with the reference's set/edit metric families."""
    d = docs.select_columns([id_col, text_col])
    left = d.rename_columns({id_col: "id1", text_col: "text_1"})
    right = d.rename_columns({id_col: "id2", text_col: "text_2"})
    joined = hash_join(pairs, left, on=("id1",), num_partitions=num_partitions)
    joined = hash_join(joined, right, on=("id2",), num_partitions=num_partitions)
    tok = _TOKENIZERS[tokenizer]
    if metric in sim.SET_METRICS:
        metric_fn = sim.SET_METRICS[metric]

        def _row_sim(t1: str, t2: str) -> float:
            return metric_fn(set(tok(t1 or "")), set(tok(t2 or "")))

    elif metric in sim.STRING_METRICS:
        sfn = sim.STRING_METRICS[metric]

        def _row_sim(t1: str, t2: str) -> float:
            return sfn(t1 or "", t2 or "")

    elif metric == "generalized_jaccard":

        def _row_sim(t1: str, t2: str) -> float:
            return sim.generalized_jaccard(tok(t1 or ""), tok(t2 or ""))

    else:
        raise ValueError(f"unknown metric {metric}")

    def _verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "text_1" not in batch.column_names:
            return pa.schema(
                [("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64())]
            ).empty_table()
        w = [
            _row_sim(a, b)
            for a, b in zip(batch["text_1"].to_pylist(), batch["text_2"].to_pylist())
        ]
        cols = {"id1": batch["id1"], "id2": batch["id2"], "weight": pa.array(w, pa.float64())}
        return pa.table(cols)

    return joined.map_batches(_verify, batch_format="pyarrow").filter(
        expr=f"weight >= {threshold!r}"
    )
