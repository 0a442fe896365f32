"""End-to-end deduplication pipelines (the training-data-pipeline surface).

* ``exact_dedup``       — hash-partition on content fingerprint, min-id
  representative per group (the classic exact-dup pass that precedes
  near-dup detection at web scale).
* ``minhash_dedup``     — the FLAGSHIP near-dup pipeline (north rule):
  sign (actor pool) -> explode LSH bands -> groupby(band) candidate pairs
  with hot-key capping -> exact-Jaccard verification on shingle sets ->
  union-find clustering. Every wide step is keyed (band key, canonical pair,
  node) per SURVEY.md §7's shuffle table.
* ``simhash_dedup``     — SimHash Hamming-LSH variant of the same skeleton.
* ``ngram_jaccard_dedup`` — q-gram/shingle blocking + exact Jaccard without
  MinHash (the reference's QGramsBlocking + Jaccard EntityMatching path).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..config import DedupConfig
from ..functions.text import fingerprint_md5_batch
from . import blocking, clustering, matching, minhash
from .exchange import hash_join, stamp_schema


def add_fingerprint(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    def _fp(batch: pa.Table) -> pa.Table:
        fps = fingerprint_md5_batch(batch[text_col])
        return batch.append_column("fingerprint", pa.array(fps, pa.string()))

    return docs.map_batches(_fp, batch_format="pyarrow")


def line_dedup(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    num_partitions: int = 32,
    reassemble: bool = False,
    input_rows: int | None = None,
) -> ray.data.Dataset:
    """C4/RefinedWeb-style repeated-line removal: split every doc on ``sep``
    and keep only the FIRST occurrence (min (doc_id, line_no)) of each
    distinct line across the whole corpus — the standard boilerplate /
    banner / footer strip for web crawls.

    Returns (doc_id, line_no, line) survivors, or with ``reassemble=True``
    the surviving lines re-joined per doc as (doc_id, text) — docs whose
    every line was a repeat are dropped (C4 drops empty docs too).

    Plan: explode lines -> ONE hash exchange keyed on the line's 128-bit
    content fingerprint (lines can be KBs; the key is 16 bytes) ->
    per-partition sorted run detection keeps each run's first
    (doc_id, line_no) -> optional second exchange keyed on doc_id re-joins
    survivors in line order. Nothing corpus-sized touches the driver.

    The explode is Arrow-vectorized (split_pattern + list_flatten /
    list_parent_indices, the signer's fast-path shape): the only Python loop
    hashes the batch's DICTIONARY of distinct lines (two seeded blake2b-64
    halves -> fp1/fp2), which web boilerplate makes a small fraction of the
    occurrences — this was the cascade lines tier's hot loop as a per-line
    md5."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.hashing import hash64_array
    from .exchange import effective_partitions

    def _explode(batch: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("doc_id", pa.int64()), ("line_no", pa.int64()),
             ("line", pa.string()), ("fp1", pa.int64()), ("fp2", pa.int64())]
        ).empty_table()
        n = batch.num_rows
        if n == 0:
            return empty
        col = pc.fill_null(
            batch[text_col].combine_chunks().cast(pa.string()), ""
        )
        lists = pc.split_pattern(col, sep)  # same semantics as str.split(sep)
        flat = pc.list_flatten(lists)
        total = len(flat)
        if total == 0:
            return empty
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        # 1-based position within each doc, fully vectorized
        line_no = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens) + 1
        ids = np.repeat(
            batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        # hash only the batch's DISTINCT lines; gather per occurrence
        dic = flat.dictionary_encode()
        uniq = dic.dictionary.to_pylist()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # int64 bit-reinterpretation: hash/key columns must never be uint64
        # (Ray's shuffle degrades uint64 blocks to pickled python objects)
        u1 = hash64_array(uniq, seed=0x11E5).view(np.int64)
        u2 = hash64_array(uniq, seed=0x7F00 ^ 0x11E5).view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "line_no": pa.array(line_no, pa.int64()),
                "line": flat,
                "fp1": pa.array(u1[codes], pa.int64()),
                "fp2": pa.array(u2[codes], pa.int64()),
            }
        )

    exploded = docs.select_columns([id_col, text_col]).map_batches(
        _explode, batch_format="pyarrow"
    )
    nparts = effective_partitions(num_partitions, rows=input_rows)
    parts = exploded.repartition(nparts, keys=["fp1", "fp2"])

    survivors_schema = pa.schema(
        [("doc_id", pa.int64()), ("line_no", pa.int64()), ("line", pa.string())]
    )

    def _first(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "fp1" not in batch.column_names:
            return survivors_schema.empty_table()
        idx = pc.sort_indices(
            batch,
            sort_keys=[
                ("fp1", "ascending"),
                ("fp2", "ascending"),
                ("doc_id", "ascending"),
                ("line_no", "ascending"),
            ],
        )
        t = batch.take(idx)
        f1 = t["fp1"].to_numpy(zero_copy_only=False)
        f2 = t["fp2"].to_numpy(zero_copy_only=False)
        neq = (f1[1:] != f1[:-1]) | (f2[1:] != f2[:-1])
        starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        kept = t.take(pa.array(starts, pa.int64()))
        return kept.select(["doc_id", "line_no", "line"])

    survivors = parts.map_batches(_first, batch_format="pyarrow", batch_size=None)
    if not reassemble:
        return survivors

    def _join_lines(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return out_schema.empty_table()
        idx = pc.sort_indices(
            batch, sort_keys=[("doc_id", "ascending"), ("line_no", "ascending")]
        )
        t = batch.take(idx)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        lines = t["line"].to_pylist()
        bounds = np.flatnonzero(ids[1:] != ids[:-1]) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(ids)]])
        return pa.table(
            {
                "doc_id": pa.array(ids[starts], pa.int64()),
                "text": pa.array(
                    [sep.join(lines[s:e]) for s, e in zip(starts, ends)],
                    pa.string(),
                ),
            }
        )

    return survivors.repartition(nparts, keys=["doc_id"]).map_batches(
        _join_lines, batch_format="pyarrow", batch_size=None
    )


def url_dedup(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    url_col: str = "url",
    num_partitions: int = 32,
    input_rows: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, curl, cluster_id) — canonical-URL exact dedup, the standard
    Common-Crawl re-crawl / mirror collapse step. ``curl`` is
    functions.text.canonical_url's form (scheme/www/tracking-param/fragment
    stripped); cluster_id = min doc_id per canonical URL. ONE hash exchange
    keyed on the canonical string (URLs are short — no fingerprint
    indirection needed), then the same per-partition sorted-run min
    assignment as exact_dedup."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.text import canonical_url
    from .exchange import effective_partitions

    def _canon(batch: pa.Table) -> pa.Table:
        curls = [canonical_url(u or "") for u in batch[url_col].to_pylist()]
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                "curl": pa.array(curls, pa.string()),
            }
        )

    c = docs.select_columns([id_col, url_col]).map_batches(
        _canon, batch_format="pyarrow"
    )
    parts = c.repartition(
        effective_partitions(num_partitions, rows=input_rows), keys=["curl"]
    )

    def _assign(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("curl", pa.string()), ("cluster_id", pa.int64())]
        )
        if batch.num_rows == 0 or "curl" not in batch.column_names:
            return out_schema.empty_table()
        idx = pc.sort_indices(
            batch, sort_keys=[("curl", "ascending"), ("doc_id", "ascending")]
        )
        t = batch.take(idx)
        curls = t["curl"].combine_chunks()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        neq = pc.not_equal(curls.slice(1), curls.slice(0, len(curls) - 1))
        boundaries = np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1
        starts = np.concatenate([[0], boundaries])
        lens = np.diff(np.concatenate([starts, [len(ids)]]))
        reps = np.repeat(ids[starts], lens)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "curl": curls,
                "cluster_id": pa.array(reps, pa.int64()),
            }
        )

    return parts.map_batches(_assign, batch_format="pyarrow", batch_size=None)


def exact_dedup(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    input_rows: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, cluster_id) where cluster_id = min doc_id among byte-equal
    normalized texts. ONE hash shuffle keyed by the md5 fingerprint (never the
    text itself — fingerprints are 32 bytes, texts are KBs), then a
    per-partition sorted-run min assignment. No groupby machinery, no join.
    ``input_rows`` (doc count, optional) right-sizes the exchange."""
    import numpy as np
    import pyarrow.compute as pc

    from .exchange import effective_partitions

    fp = add_fingerprint(docs.select_columns([id_col, text_col]), text_col).select_columns(
        [id_col, "fingerprint"]
    )
    parts = fp.repartition(
        effective_partitions(num_partitions, rows=input_rows), keys=["fingerprint"]
    )

    def _assign(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
        if batch.num_rows == 0 or "fingerprint" not in batch.column_names:
            return out_schema.empty_table()
        idx = pc.sort_indices(
            batch, sort_keys=[("fingerprint", "ascending"), (id_col, "ascending")]
        )
        t = batch.take(idx)
        fps = t["fingerprint"].combine_chunks()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        neq = pc.not_equal(fps.slice(1), fps.slice(0, len(fps) - 1))
        boundaries = np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1
        starts = np.concatenate([[0], boundaries])
        lens = np.diff(np.concatenate([starts, [len(ids)]]))
        reps = np.repeat(ids[starts], lens)  # first id of each run == min
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "cluster_id": pa.array(reps, pa.int64())}
        )

    return parts.map_batches(_assign, batch_format="pyarrow", batch_size=None)


def minhash_dedup(
    docs: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    signer_batch_size: int = 256,
    signer_concurrency=None,
    cluster_mode: str = "auto",
    verify_mode: str = "auto",
    drop_counter: str | None = None,
) -> dict:
    """Flagship near-dup pipeline. Returns dict of the stage Datasets:
    sigs, candidates (id1,id2,cbs), verified (id1,id2,weight,hamming),
    clusters (doc_id, cluster_id). ``drop_counter`` (state.metrics name)
    counts comparisons discarded by the hot-band cap."""
    cfg = cfg or DedupConfig()
    sigs = minhash.sign(
        docs.select_columns([id_col, text_col]).rename_columns({id_col: "doc_id"}),
        cfg,
        batch_size=signer_batch_size,
        concurrency=signer_concurrency,
    )
    if verify_mode in ("broadcast", "auto"):
        sigs = sigs.materialize()  # consumed twice: band explode + verify
    band_edges = minhash.explode_bands(sigs)
    # edge volume is exactly n_sigs x bands — free hint when materialized
    rows_hint = sigs.count() * cfg.bands if verify_mode in ("broadcast", "auto") else None
    candidates = blocking.candidate_pairs(
        band_edges, max_block_size=cfg.max_block_size, num_partitions=num_partitions,
        drop_counter=drop_counter, drop_key="lsh_band_cap", input_rows=rows_hint,
    )
    verified = matching.verify_pairs(
        candidates, sigs, threshold=cfg.verify_threshold,
        num_partitions=num_partitions, mode=verify_mode,
    )
    clusters = clustering.connected_components(verified, mode=cluster_mode)
    return {
        "sigs": sigs,
        "candidates": candidates,
        "verified": verified,
        "clusters": clusters,
    }


def simhash_dedup(
    docs: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    simhash_bands: int = 4,
    num_partitions: int = 32,
    cluster_mode: str = "auto",
    verify_mode: str = "auto",
    drop_counter: str | None = None,
) -> dict:
    """SimHash near-dup: Hamming-LSH chunk keys -> candidates -> Hamming
    verification (keep pairs within cfg.simhash_hamming_max bits).

    verify_mode defaults to "auto" so the pair-id pruned verification path
    (matching.verify_pairs) applies: candidates almost always name far fewer
    docs than the corpus, and join mode shuffled every signature row."""
    cfg = cfg or DedupConfig()
    sigs = minhash.sign(
        docs.select_columns([id_col, text_col]).rename_columns({id_col: "doc_id"}), cfg
    )
    if verify_mode in ("broadcast", "auto"):
        sigs = sigs.materialize()  # consumed twice: band explode + verify
    edges = minhash.explode_simhash_bands(sigs, bands=simhash_bands)
    candidates = blocking.candidate_pairs(
        edges, max_block_size=cfg.max_block_size, num_partitions=num_partitions,
        drop_counter=drop_counter, drop_key="simhash_band_cap",
    )
    verified = matching.verify_pairs(
        candidates, sigs, threshold=0.0, num_partitions=num_partitions,
        keep_below=True, mode=verify_mode,
    ).filter(expr=f"hamming <= {cfg.simhash_hamming_max}")
    clusters = clustering.connected_components(verified, mode=cluster_mode)
    return {"sigs": sigs, "candidates": candidates, "verified": verified, "clusters": clusters}


def ngram_jaccard_dedup(
    docs: ray.data.Dataset,
    keyer: str = "shingle",
    threshold: float = 0.8,
    max_block_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    **keyer_kwargs,
) -> dict:
    """Blocking-key near-dup without MinHash: explode keys -> candidates ->
    exact Jaccard on word tokens (text-level verification)."""
    d = docs.select_columns([id_col, text_col]).rename_columns({id_col: "doc_id"})
    edges = blocking.explode_keys(d, keyer=keyer, **keyer_kwargs)
    candidates = blocking.candidate_pairs(
        edges, max_block_size=max_block_size, num_partitions=num_partitions
    )
    verified = matching.verify_pairs_text(
        candidates, d, metric="jaccard", tokenizer="word", threshold=threshold,
        num_partitions=num_partitions,
    )
    clusters = clustering.connected_components(verified)
    return {"candidates": candidates, "verified": verified, "clusters": clusters}


def substring_overlap_dedup(
    docs: ray.data.Dataset,
    ngram_chars: int = 48,
    sample_mod: int = 16,
    containment_threshold: float = 0.5,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    max_block_size: int = 64,
) -> dict:
    """Long-text substring-overlap dedup (the suffix-array-substring analog).

    Content-selected char n-gram hashes (functions/hashing.char_ngram_hashes)
    are the blocking keys AND the verification sets: candidate pairs share a
    selected window; verification keeps pairs whose selected-window
    CONTAINMENT |A∩B| / min(|A|,|B|) >= threshold — the right metric for
    partial copies (a page embedded in a larger page scores ~1.0 where
    Jaccard would dilute).
    """
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import char_ngram_hashes
    from . import blocking as _blocking, clustering as _clustering

    d = docs.select_columns([id_col, text_col]).rename_columns(
        {id_col: "doc_id", text_col: "text"}
    )

    def _sign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sets = [
            char_ngram_hashes(t or "", ngram_chars, sample_mod, seed)
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "wins": pa.array([x.tobytes() for x in sets], pa.binary()),
                "n_wins": pa.array([x.size for x in sets], pa.int32()),
            }
        )

    sigs = d.map_batches(_sign, batch_format="pyarrow").materialize()

    def _edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "wins" not in batch.column_names:
            return pa.schema([("key", pa.int64()), ("doc_id", pa.int64())]).empty_table()
        keys, ids = [], []
        for did, buf in zip(batch["doc_id"].to_pylist(), batch["wins"].to_pylist()):
            arr = np.frombuffer(buf, dtype=np.uint64).view(np.int64)
            keys.append(arr)
            ids.append(np.full(arr.size, did, dtype=np.int64))
        if not keys:
            return pa.schema([("key", pa.int64()), ("doc_id", pa.int64())]).empty_table()
        return pa.table(
            {
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "doc_id": pa.array(np.concatenate(ids), pa.int64()),
            }
        )

    edges = sigs.map_batches(_edges, batch_format="pyarrow")
    cands = _blocking.candidate_pairs(
        edges, max_block_size=max_block_size, num_partitions=num_partitions
    )

    # containment verification over the selected-window sets
    left = sigs.select_columns(["doc_id", "wins"]).rename_columns(
        {"doc_id": "id1", "wins": "w1"}
    )
    right = sigs.select_columns(["doc_id", "wins"]).rename_columns(
        {"doc_id": "id2", "wins": "w2"}
    )
    i64 = pa.int64()
    ids_schema = pa.schema([("id1", i64), ("id2", i64)])
    joined = hash_join(
        cands.select_columns(["id1", "id2"]).materialize(), left, on=("id1",),
        num_partitions=num_partitions, left_schema=ids_schema,
        right_schema=pa.schema([("id1", i64), ("w1", pa.binary())]),
    ).materialize()  # barrier: see joins._with_similarity
    joined = hash_join(
        joined, right, on=("id2",), num_partitions=num_partitions,
        left_schema=pa.schema([("id1", i64), ("id2", i64), ("w1", pa.binary())]),
        right_schema=pa.schema([("id2", i64), ("w2", pa.binary())]),
    )

    def _contain(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("id1", pa.int64()), ("id2", pa.int64()), ("weight", pa.float64())]
        )
        if batch.num_rows == 0 or "w1" not in batch.column_names:
            return out_schema.empty_table()
        w = np.empty(batch.num_rows)
        for i, (b1, b2) in enumerate(zip(batch["w1"].to_pylist(), batch["w2"].to_pylist())):
            a = np.frombuffer(b1, dtype=np.uint64)
            b = np.frombuffer(b2, dtype=np.uint64)
            if a.size == 0 or b.size == 0:
                w[i] = 0.0
                continue
            inter = np.intersect1d(a, b, assume_unique=True).size
            w[i] = inter / min(a.size, b.size)
        return pa.table(
            {"id1": batch["id1"], "id2": batch["id2"], "weight": pa.array(w, pa.float64())}
        )

    verified = joined.map_batches(_contain, batch_format="pyarrow").filter(
        expr=f"weight >= {containment_threshold!r}"
    )
    clusters = _clustering.connected_components(verified)
    return {"sigs": sigs, "candidates": cands, "verified": verified, "clusters": clusters}
