"""Benchmark decontamination: remove (or flag) training documents that
overlap an evaluation/benchmark set — the standard pre-training hygiene pass
(GPT-3 appendix C / PaLM / Llama style n-gram overlap, plus an exact
normalized-text mode).

No reference analog: pyJedAI dedups WITHIN one corpus; decontamination is a
cross-corpus filter where one side (the eval set) is orders of magnitude
smaller than the other (the 100-TB train corpus). That asymmetry is the whole
design:

* the eval side is reduced to a DISTINCT gram-hash set (or normalized-text
  fingerprint set), ``ray.put`` ONCE, and read once per actor — the classic
  broadcast-small-side pattern; the train side STREAMS through one
  ``map_batches`` actor pool with ZERO shuffles and zero joins;
* gram semantics are pinned to the engine's shingle family
  (``functions.tokenize.word_shingles``): lowercase ``[\\W_]+`` word tokens,
  n-token windows joined by a single space, DISTINCT per document, and
  documents shorter than n tokens contribute their whole token sequence as
  one gram (so a short eval answer string still decontaminates);
* the train-side hot path is Arrow-vectorized end to end: one
  ``binary_join_element_wise`` over n shifted slices of the batch's flat
  token stream builds every window gram in C, per-row distinctness is one
  ``np.unique`` over (row, code) keys, and only the batch's DISTINCT gram
  strings are blake2b-hashed (web boilerplate repeats grams across docs —
  the same economy as the line-dedup exploder);
* drops are COUNTED (``state.metrics``), never silent, and the eval-set size
  is capped LOUDLY (``max_eval_grams``) — above the cap a broadcast is the
  wrong shape and the error says to shard the eval set or dedup it first.

Scale: eval sets are 1e3–1e7 docs; at 13-gram granularity that is at most a
few 1e8 distinct int64 hashes — the default cap (2e7) keeps the broadcast
~160 MB. The train corpus never materializes, never shuffles, and the
per-batch membership test is one ``np.searchsorted`` against the sorted
broadcast array.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import hash64_array
from ..functions.tokenize import flat_token_stream
from .exchange import stamp_schema

NGRAM_ANNOTATIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_grams", pa.int64()),
        ("n_overlap", pa.int64()),
        ("contaminated", pa.int64()),
    ]
)

EXACT_ANNOTATIONS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("contaminated", pa.int64())]
)

_DEFAULT_SEED = 0xDEC0


def _batch_row_grams(col, n: int) -> tuple[np.ndarray, pa.Array]:
    """All (row, gram) occurrences of a string column's word n-grams, in
    ``word_shingles`` semantics (module doc). Returns (row_idx int64 array,
    gram strings pa.Array) — grams NOT yet distinct per row."""
    flat, lens = flat_token_stream(col)
    offs = np.concatenate([[0], np.cumsum(lens)])
    total = int(offs[-1])
    rows_parts: list[np.ndarray] = []
    gram_parts: list[pa.Array] = []

    import pyarrow.compute as pc

    if total >= n and (lens >= n).any():
        # every global window of n consecutive tokens, built in ONE C pass
        w = total - n + 1
        joined = pc.binary_join_element_wise(
            *[flat.slice(o, w) for o in range(n)], " "
        )
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)[:w]
        starts = np.arange(w, dtype=np.int64)
        valid = starts + n <= offs[doc_of + 1]  # window stays inside its doc
        if valid.any():
            vmask = pa.array(valid)
            g = joined.filter(vmask)
            gram_parts.append(
                g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
            )
            rows_parts.append(doc_of[valid])

    short = np.flatnonzero((lens > 0) & (lens < n))
    if short.size:
        # whole-token-sequence gram for docs with < n tokens
        so = offs[short]
        sub_offs = np.concatenate(
            [[0], np.cumsum(lens[short])]
        ).astype(np.int32)
        sub_flat = pa.concat_arrays(
            [flat.slice(int(o), int(l)) for o, l in zip(so, lens[short])]
        )
        lists = pa.ListArray.from_arrays(pa.array(sub_offs, pa.int32()), sub_flat)
        g = pc.binary_join(lists, " ")
        gram_parts.append(
            g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        )
        rows_parts.append(short.astype(np.int64))

    if not gram_parts:
        return np.empty(0, dtype=np.int64), pa.array([], pa.string())
    return np.concatenate(rows_parts), pa.concat_arrays(gram_parts)


def _distinct_row_gram_hashes(
    rows: np.ndarray, grams: pa.Array, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (row, gram) pairs -> (row_idx, int64 gram hash); only the
    batch's DISTINCT gram strings are hashed."""
    if len(grams) == 0:
        return rows, np.empty(0, dtype=np.int64)
    dic = grams.dictionary_encode()
    uniq = dic.dictionary.to_pylist()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = len(uniq)
    ukey = np.unique(rows * k + codes)
    rows_d, codes_d = ukey // k, ukey % k
    # int64 bit-reinterpretation (engine rule: key columns never uint64)
    h = hash64_array(uniq, seed=seed).view(np.int64)
    return rows_d, h[codes_d]


def eval_gram_hashes(
    eval_set: ray.data.Dataset,
    text_col: str = "text",
    n: int = 13,
    seed: int = _DEFAULT_SEED,
    max_eval_grams: int = 20_000_000,
) -> np.ndarray:
    """Sorted distinct int64 gram hashes of the eval set (the broadcast
    side). Per-batch distinct happens in tasks; the driver only unions the
    already-deduped batch sets. Raises LOUDLY above ``max_eval_grams`` —
    a too-big broadcast is a design error, not something to truncate."""

    def _h(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or text_col not in batch.column_names:
            return pa.schema([("h", pa.int64())]).empty_table()
        rows, grams = _batch_row_grams(batch[text_col], n)
        if len(grams) == 0:
            return pa.schema([("h", pa.int64())]).empty_table()
        dic = grams.dictionary_encode()
        h = hash64_array(dic.dictionary.to_pylist(), seed=seed).view(np.int64)
        return pa.table({"h": pa.array(np.unique(h), pa.int64())})

    parts = eval_set.select_columns([text_col]).map_batches(
        _h, batch_format="pyarrow"
    )
    arrs = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in parts.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    out = np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
    if out.size > max_eval_grams:
        raise ValueError(
            f"eval_gram_hashes: {out.size} distinct eval grams exceeds "
            f"max_eval_grams={max_eval_grams} (~{8 * out.size >> 20} MB "
            "broadcast). Dedup or shard the eval set, raise the cap "
            "explicitly, or use a distributed semi-join on gram keys instead "
            "of broadcast decontamination."
        )
    return out


def _normalized_join(col) -> tuple[pa.Array, np.ndarray]:
    """Normalized whole-doc token join per row (the exact-dedup fingerprint
    string) + token lengths — vectorized."""
    import pyarrow.compute as pc

    flat, lens = flat_token_stream(col)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat)
    j = pc.binary_join(lists, " ")
    return (j.combine_chunks() if isinstance(j, pa.ChunkedArray) else j), lens


def eval_exact_fingerprints(
    eval_set: ray.data.Dataset,
    text_col: str = "text",
    seed: int = _DEFAULT_SEED,
    max_eval_docs: int = 50_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """(fp1, fp2) 128-bit fingerprints of the eval set's normalized texts,
    lexsorted by (fp1, fp2) — the exact-mode broadcast side."""

    def _fp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or text_col not in batch.column_names:
            return pa.schema(
                [("fp1", pa.int64()), ("fp2", pa.int64())]
            ).empty_table()
        norm, _ = _normalized_join(batch[text_col])
        s = norm.to_pylist()
        f1 = hash64_array(s, seed=seed).view(np.int64)
        f2 = hash64_array(s, seed=seed ^ 0x7F00).view(np.int64)
        return pa.table(
            {"fp1": pa.array(f1, pa.int64()), "fp2": pa.array(f2, pa.int64())}
        )

    parts = eval_set.select_columns([text_col]).map_batches(
        _fp, batch_format="pyarrow"
    )
    f1s, f2s = [], []
    for b in parts.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            f1s.append(b["fp1"].to_numpy(zero_copy_only=False))
            f2s.append(b["fp2"].to_numpy(zero_copy_only=False))
    if not f1s:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    f1 = np.concatenate(f1s)
    f2 = np.concatenate(f2s)
    if f1.size > max_eval_docs:
        raise ValueError(
            f"eval_exact_fingerprints: {f1.size} eval docs exceeds "
            f"max_eval_docs={max_eval_docs}; shard the eval set or use a "
            "distributed anti-join on the fingerprint instead."
        )
    order = np.lexsort((f2, f1))
    return f1[order], f2[order]


def _pair_member(
    x1: np.ndarray, x2: np.ndarray, e1: np.ndarray, e2: np.ndarray
) -> np.ndarray:
    """Membership of (x1, x2) rows in the lexsorted eval pair set: one
    vectorized searchsorted pass on fp1, then a per-hit check on the (tiny)
    fp1-collision windows."""
    out = np.zeros(x1.size, dtype=bool)
    if e1.size == 0 or x1.size == 0:
        return out
    lo = np.searchsorted(e1, x1, "left")
    hi = np.searchsorted(e1, x1, "right")
    for i in np.flatnonzero(hi > lo):
        seg = e2[lo[i] : hi[i]]
        j = np.searchsorted(seg, x2[i])
        out[i] = j < seg.size and seg[j] == x2[i]
    return out


class _NGramAnnotator:
    """Actor: resolves the broadcast eval gram-hash set ONCE per actor, then
    annotates train batches with (n_grams, n_overlap, contaminated)."""

    def __init__(self, eval_ref, n, seed, min_overlap, threshold, id_col, text_col):
        import ray as _ray

        self.eval_hashes = (
            _ray.get(eval_ref) if eval_ref is not None else np.empty(0, np.int64)
        )
        self.n = n
        self.seed = seed
        self.min_overlap = min_overlap
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        if nrows == 0:
            return batch.schema.empty_table().append_column(
                "n_grams", pa.array([], pa.int64())
            ).append_column("n_overlap", pa.array([], pa.int64())).append_column(
                "contaminated", pa.array([], pa.int64())
            )
        rows, grams = _batch_row_grams(batch[self.text_col], self.n)
        rows_d, ghash = _distinct_row_gram_hashes(rows, grams, self.seed)
        n_grams = np.bincount(rows_d, minlength=nrows).astype(np.int64)
        ev = self.eval_hashes
        if ev.size and ghash.size:
            pos = np.searchsorted(ev, ghash)
            pos_c = np.minimum(pos, ev.size - 1)
            hit = (pos < ev.size) & (ev[pos_c] == ghash)
            n_overlap = np.bincount(
                rows_d[hit], minlength=nrows
            ).astype(np.int64)
        else:
            n_overlap = np.zeros(nrows, dtype=np.int64)
        flag = n_overlap >= self.min_overlap
        if self.threshold > 0:
            flag &= n_overlap >= self.threshold * n_grams
        return (
            batch.append_column("n_grams", pa.array(n_grams, pa.int64()))
            .append_column("n_overlap", pa.array(n_overlap, pa.int64()))
            .append_column(
                "contaminated", pa.array(flag.astype(np.int64), pa.int64())
            )
        )


class _ExactAnnotator:
    """Actor: broadcast (fp1, fp2) eval fingerprints, flag exact normalized
    matches."""

    def __init__(self, eval_ref, seed, id_col, text_col):
        import ray as _ray

        self.e1, self.e2 = (
            _ray.get(eval_ref)
            if eval_ref is not None
            else (np.empty(0, np.int64), np.empty(0, np.int64))
        )
        self.seed = seed
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.schema.empty_table().append_column(
                "contaminated", pa.array([], pa.int64())
            )
        norm, _ = _normalized_join(batch[self.text_col])
        s = norm.to_pylist()
        x1 = hash64_array(s, seed=self.seed).view(np.int64)
        x2 = hash64_array(s, seed=self.seed ^ 0x7F00).view(np.int64)
        flag = _pair_member(x1, x2, self.e1, self.e2)
        return batch.append_column(
            "contaminated", pa.array(flag.astype(np.int64), pa.int64())
        )


def decontaminate(
    train: ray.data.Dataset,
    eval_set: ray.data.Dataset,
    mode: str = "ngram",
    n: int = 13,
    min_overlap: int = 1,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    seed: int = _DEFAULT_SEED,
    batch_size: int = 256,
    concurrency: int | None = None,
    max_eval_grams: int = 20_000_000,
    drop_counter: str | None = None,
) -> dict:
    """Flag / remove train docs overlapping the eval set.

    mode "ngram" (default): a train doc is contaminated when >=
    ``min_overlap`` of its distinct word n-grams (and, with ``threshold`` >
    0, at least that fraction of them) appear in the eval set — GPT-3's
    13-gram collision rule at the defaults. mode "exact": contaminated when
    the normalized token join (the exact-dedup fingerprint string) appears
    verbatim in the eval set.

    Returns ``{"annotated": ds, "survivors": ds, "annotations": ds}``:
    ``annotated`` = train columns + (n_grams, n_overlap,) contaminated;
    ``survivors`` = clean train rows (original columns); ``annotations`` =
    the flag columns keyed by ``id_col``. survivors/annotations are views of
    ``annotated`` — materialize it first when consuming both. Contaminated
    drops are counted under ``drop_counter`` key ``contaminated_docs``
    (counted in the survivors filter: executing that view twice without a
    materialize doubles the count, like every per-batch counter here).
    """
    import ray as _ray

    if mode not in ("ngram", "exact"):
        raise ValueError(f"decontaminate: mode must be 'ngram' or 'exact', got {mode!r}")
    ev_text = eval_text_col or text_col
    if concurrency is None:
        concurrency = max(2, int(_ray.cluster_resources().get("CPU", 4)) - 2)

    if mode == "ngram":
        ev = eval_gram_hashes(
            eval_set, text_col=ev_text, n=n, seed=seed, max_eval_grams=max_eval_grams
        )
        eval_ref = _ray.put(ev)
        annotated = train.map_batches(
            _NGramAnnotator,
            fn_constructor_kwargs={
                "eval_ref": eval_ref,
                "n": n,
                "seed": seed,
                "min_overlap": min_overlap,
                "threshold": threshold,
                "id_col": id_col,
                "text_col": text_col,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        ann_cols = [id_col, "n_grams", "n_overlap", "contaminated"]
    else:
        e1, e2 = eval_exact_fingerprints(eval_set, text_col=ev_text, seed=seed)
        eval_ref = _ray.put((e1, e2))
        annotated = train.map_batches(
            _ExactAnnotator,
            fn_constructor_kwargs={
                "eval_ref": eval_ref,
                "seed": seed,
                "id_col": id_col,
                "text_col": text_col,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        ann_cols = [id_col, "contaminated"]

    train_cols = list(train.schema().names)

    def _survive(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "contaminated" not in batch.column_names:
            return batch.select([c for c in train_cols if c in batch.column_names])
        import pyarrow.compute as pc

        mask = pc.equal(batch["contaminated"], 0)
        n_drop = batch.num_rows - pc.sum(pc.cast(mask, pa.int64())).as_py()
        if drop_counter is not None and n_drop:
            from ..state.metrics import report_drops

            report_drops(drop_counter, "contaminated_docs", int(n_drop), 1)
        return batch.filter(mask).select(train_cols)

    survivors = annotated.map_batches(_survive, batch_format="pyarrow")
    annotations = annotated.select_columns(ann_cols)
    return {
        "annotated": annotated,
        "survivors": survivors,
        "annotations": annotations,
    }
