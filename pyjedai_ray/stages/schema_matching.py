"""Schema matching: column-level entity resolution over Ray Data.

The reference's schema package (cited file:line in
/root/reference/src/pyjedai/schema/) treats the COLUMNS of two tables as the
entities to match, three ways:

* delegation to the valentine library's matchers (matching.py:53-152 —
  Coma/Cupid/DistributionBased/JaccardDistance/SimilarityFlooding);
* TF-IDF column summarization: each column is replaced by its top-512
  highest-scoring value tokens and the result feeds the regular ER workflow
  (schema_model.py:33-37 CONTENT mode + utils.py:7-52 vectorFromTFIDF);
* plain schema-name matching (schema_model.py:38 default mode).

valentine (and its sklearn/nltk stack) is not installed in this container,
so the valentine delegation is an env-gated honest stub
(:class:`ValentineMatcherStub`); the two instance-based matchers are rebuilt
Ray-Data-native:

* :func:`jaccard_schema_matching` — the JaccardDistanceMatcher analog:
  similarity of two columns = Jaccard of their distinct value-token sets,
  computed distributively (per-batch partial distinct -> one groupby
  distinct per side -> token-key join -> per-column-pair counts). The
  reference/valentine variant thresholds Levenshtein inside the pair loop;
  set-Jaccard over exact tokens is the deterministic distributed core
  (documented deviation — Levenshtein-relaxed token equality would need an
  all-pairs token join; hook provided via ``token_key``).
* :func:`tfidf_top_tokens` — vectorFromTFIDF's distributed analog: per
  (column, token) score = tf * smooth-idf over the column's cells
  (idf = ln((1+n_cells)/(1+df)) + 1, sklearn's smooth_idf formula), top-k
  tokens per column by (score DESC, token ASC). Deviation from utils.py:
  no per-cell l2 normalization (it needs a second per-cell pass and barely
  moves a rank-only selection) and no Porter stemming / NLTK stopwords (env
  absent); deterministic tie-break replaces np.argsort order.
* :func:`schema_entity_table` — columns-as-entities adapter: (col_id, name,
  text) rows that feed the EXISTING blocking -> matching -> clustering
  stages, which is how the reference consumes its schema model.

Scale notes: profiles shuffle (column_id, token) pairs — bounded by distinct
tokens per column, not cell count, thanks to the per-batch partial distinct;
the final column-pair matrix is tiny (n_cols_1 x n_cols_2) and is assembled
with one small join, never a driver loop over cells.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from .exchange import barrier, ensure_context, hash_join, stamp_schema

PROFILE_SCHEMA = pa.schema(
    [("col", pa.string()), ("token", pa.string()), ("tf", pa.int64())]
)

MATCH_SCHEMA = pa.schema(
    [("col1", pa.string()), ("col2", pa.string()), ("jaccard", pa.float64())]
)


def _tokenize_column(values: pa.ChunkedArray) -> pa.Array:
    """Flat token stream of a string column: lowercase ``[\\W_]+`` split (the
    engine's standard tokenizer, functions/tokenize.py), Arrow-vectorized on
    ASCII batches with the same per-row fallback as the MinHash signer."""
    import pyarrow.compute as pc

    from ..functions.tokenize import token_sequence

    col = pc.fill_null(values.combine_chunks(), "")
    if len(col) and pc.all(pc.string_is_ascii(col)).as_py():
        toks = pc.split_pattern_regex(pc.utf8_lower(col), "[\\W_]+")
        flat = pc.list_flatten(toks)
        return flat.filter(pc.not_equal(flat, ""))
    return pa.array(
        [t for v in col.to_pylist() for t in token_sequence(v or "")], pa.string()
    )


def column_token_profiles(
    ds: ray.data.Dataset,
    columns: list[str] | None = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """(col, token, tf) per distinct value-token of each selected column.

    ``tf`` counts CELLS of the column containing the token at least once
    (i.e. document frequency over cells, each cell being one "document" —
    the quantity both downstream matchers need). Non-string columns are cast
    to string first (schema_model.py:56-57 ``astype(str)``); pass explicit
    ``columns`` to skip float columns whose str() rendering is
    engine-specific.

    Per-batch partial distinct keeps the shuffle bounded by per-batch
    distinct (col, token) pairs; one groupby then sums cell counts."""
    ensure_context(ds)
    if columns is None:
        columns = ds.schema().names

    def _profile(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for c in columns:
            if c not in batch.column_names:
                continue
            col = batch[c]
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            col = col.combine_chunks()
            # per-cell distinct tokens: tokenize the whole column, then count
            # each (cell, token) once — cell ids via list_parent_indices
            if len(col) and pc.all(
                pc.string_is_ascii(pc.fill_null(col, ""))
            ).as_py():
                toks = pc.split_pattern_regex(
                    pc.utf8_lower(pc.fill_null(col, "")), "[\\W_]+"
                )
                flat = pc.list_flatten(toks)
                par = pc.list_parent_indices(toks)
                mask = pc.not_equal(flat, "")
                flat, par = flat.filter(mask), par.filter(mask)
                pairs = pa.table({"cell": par, "token": flat})
            else:
                from ..functions.tokenize import token_sequence

                rows = [
                    (i, t)
                    for i, v in enumerate(col.to_pylist())
                    for t in token_sequence(v or "")
                ]
                pairs = pa.table(
                    {
                        "cell": pa.array([r[0] for r in rows], pa.int64()),
                        "token": pa.array([r[1] for r in rows], pa.string()),
                    }
                )
            if pairs.num_rows == 0:
                continue
            # distinct (cell, token) -> per-token cell counts in this batch
            dedup = pairs.group_by(["cell", "token"]).aggregate([])
            counts = dedup.group_by("token").aggregate([("cell", "count")])
            parts.append(
                pa.table(
                    {
                        "col": pa.array([c] * counts.num_rows, pa.string()),
                        "token": counts["token"],
                        "tf": counts["cell_count"].cast(pa.int64()),
                    }
                )
            )
        if not parts:
            return PROFILE_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    partial = ds.map_batches(_profile, batch_format="pyarrow")
    out = (
        partial.groupby(["col", "token"])
        .aggregate(ray.data.aggregate.Sum("tf", alias_name="tf"))
    )
    return stamp_schema(out, PROFILE_SCHEMA)


def _column_cell_counts(
    ds: ray.data.Dataset, columns: list[str]
) -> dict[str, int]:
    """Non-empty (after str-cast) cell count per column — the ``n`` of the
    idf formula and the universe size of nothing (Jaccard uses token sets).
    Tiny driver-side dict (one value per column)."""

    def _count(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        names, vals = [], []
        for c in columns:
            if c not in batch.column_names:
                continue
            col = batch[c]
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            non_empty = pc.sum(
                pc.cast(
                    pc.not_equal(pc.fill_null(col, ""), ""), pa.int64()
                )
            ).as_py()
            names.append(c)
            vals.append(int(non_empty or 0))
        return pa.table(
            {"col": pa.array(names, pa.string()), "n": pa.array(vals, pa.int64())}
        )

    rows = (
        ds.map_batches(_count, batch_format="pyarrow")
        .groupby("col")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .take_all()
    )
    return {r["col"]: r["n"] for r in rows}


def jaccard_schema_matching(
    ds1: ray.data.Dataset,
    ds2: ray.data.Dataset,
    columns1: list[str] | None = None,
    columns2: list[str] | None = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Column-pair similarity matrix: Jaccard of distinct value-token sets,
    for every (column of ds1) x (column of ds2) pair -> (col1, col2,
    jaccard), zero-overlap pairs included (jaccard = 0.0).

    Distributed shape: two token profiles, one token-key join, one
    column-pair count — the cross matrix itself is n1 x n2 columns and is
    finalized driver-side."""
    ensure_context(ds1)
    if columns1 is None:
        columns1 = ds1.schema().names
    if columns2 is None:
        columns2 = ds2.schema().names
    p1 = barrier(
        column_token_profiles(ds1, columns1, num_partitions).select_columns(
            ["col", "token"]
        )
    )
    def _as_col2(batch: pa.Table) -> pa.Table:
        # block-level rename: Dataset.rename_columns metadata goes stale
        # through union chains (see exchange._block_schema)
        if batch.num_columns == 0:
            return pa.schema(
                [("col2", pa.string()), ("token", pa.string())]
            ).empty_table()
        return pa.table({"col2": batch["col"], "token": batch["token"]})

    p2 = barrier(
        column_token_profiles(ds2, columns2, num_partitions).map_batches(
            _as_col2, batch_format="pyarrow"
        )
    )
    tok_schema = pa.schema([("col", pa.string()), ("token", pa.string())])
    joined = hash_join(
        p1,
        p2,
        on=("token",),
        num_partitions=num_partitions,
        left_schema=tok_schema,
        right_schema=pa.schema([("col2", pa.string()), ("token", pa.string())]),
    )
    common_rows = (
        joined.groupby(["col", "col2"])
        .aggregate(Count(alias_name="common"))
        .take_all()
    )
    common = {(r["col"], r["col2"]): r["common"] for r in common_rows}

    def _set_sizes(p: ray.data.Dataset, key: str) -> dict[str, int]:
        rows = p.groupby(key).aggregate(Count(alias_name="n")).take_all()
        return {r[key]: r["n"] for r in rows}

    n1 = _set_sizes(p1, "col")
    n2 = _set_sizes(p2, "col2")
    out_c1, out_c2, out_j = [], [], []
    for c1 in columns1:
        for c2 in columns2:
            a, b = n1.get(c1, 0), n2.get(c2, 0)
            inter = common.get((c1, c2), 0)
            union = a + b - inter
            out_c1.append(c1)
            out_c2.append(c2)
            out_j.append(0.0 if union == 0 else inter / union)
    return ray.data.from_arrow(
        pa.table(
            {
                "col1": pa.array(out_c1, pa.string()),
                "col2": pa.array(out_c2, pa.string()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )
    )


TOP_TOKENS_SCHEMA = pa.schema(
    [
        ("col", pa.string()),
        ("token", pa.string()),
        ("score", pa.float64()),
        ("rank", pa.int64()),
    ]
)


def tfidf_top_tokens(
    ds: ray.data.Dataset,
    columns: list[str] | None = None,
    top_k: int = 512,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Top-``top_k`` value tokens per column by tf * smooth-idf — the
    distributed analog of vectorFromTFIDF's top-512 column summary
    (utils.py:43-52); see module docstring for the documented deviations.

    score(col, token) = tf * (ln((1 + n_cells(col)) / (1 + tf)) + 1) where
    tf counts cells containing the token (df == tf at cell granularity,
    exactly the quantity the reference's summed-TfidfVectorizer ranks by).
    Scores are rounded to 6dp BEFORE ranking (the engine-wide convention for
    transcendental-function columns, see entry_queries module doc)."""
    if columns is None:
        columns = ds.schema().names
    profiles = barrier(column_token_profiles(ds, columns, num_partitions))
    cells = _column_cell_counts(ds, columns)

    def _score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "col": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        cols = batch["col"].to_pylist()
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = np.array([cells.get(c, 0) for c in cols], dtype=np.float64)
        score = tf * (np.log((1.0 + n) / (1.0 + tf)) + 1.0)
        # half-away-from-zero 6dp (scores are positive): matches DuckDB's
        # round() for oracle bit-parity; np.round's half-even diverges on
        # exact dyadic halves
        score = np.floor(score * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "col": batch["col"],
                "token": batch["token"],
                "score": pa.array(score, pa.float64()),
            }
        )

    scored = profiles.map_batches(_score, batch_format="pyarrow")

    def _local_topk(batch: pa.Table) -> pa.Table:
        # per-column top-k inside each hash partition (columns are the keys,
        # so a column lives in exactly one partition after the repartition)
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "col" not in batch.column_names:
            return TOP_TOKENS_SCHEMA.empty_table()
        idx = pc.sort_indices(
            batch,
            sort_keys=[
                ("col", "ascending"),
                ("score", "descending"),
                ("token", "ascending"),
            ],
        )
        tbl = batch.take(idx)
        cols = tbl["col"].combine_chunks()
        neq = pc.not_equal(cols.slice(1), cols.slice(0, len(cols) - 1))
        bounds = np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cols)]])
        keep = np.zeros(len(cols), dtype=bool)
        rank = np.zeros(len(cols), dtype=np.int64)
        for s, e in zip(starts, ends):
            e2 = min(e, s + top_k)
            keep[s:e2] = True
            rank[s:e2] = np.arange(1, e2 - s + 1)
        out = tbl.append_column("rank", pa.array(rank, pa.int64())).filter(
            pa.array(keep)
        )
        return out.select(["col", "token", "score", "rank"])

    parts = scored.repartition(
        max(2, min(num_partitions, len(columns))), keys=["col"]
    )
    return stamp_schema(
        parts.map_batches(
            _local_topk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ),
        TOP_TOKENS_SCHEMA,
    )


def schema_entity_table(
    ds: ray.data.Dataset,
    columns: list[str] | None = None,
    mode: str = "content",
    top_k: int = 512,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Columns-as-entities adapter (schema_model.py:33-38): one row per
    column -> (doc_id, col, text) ready for the engine's regular blocking /
    matching / clustering stages.

    mode "schema": text = the column name (tokenized downstream);
    mode "content": text = the column's top-``top_k`` TF-IDF value tokens
    joined by spaces (rank order — the reference feeds exactly this token
    list into its ER workflow);
    mode "composite": name + content.

    doc_id is the column's index in ``columns`` (int64), so matched pairs
    stay joinable back to names via this table."""
    if columns is None:
        columns = ds.schema().names
    if mode not in ("schema", "content", "composite"):
        raise ValueError(f"mode must be schema|content|composite, got {mode!r}")
    if mode == "schema":
        texts = {c: c for c in columns}
    else:
        rows = tfidf_top_tokens(ds, columns, top_k, num_partitions).take_all()
        by_col: dict[str, list[tuple[int, str]]] = {c: [] for c in columns}
        for r in rows:
            by_col[r["col"]].append((r["rank"], r["token"]))
        texts = {
            c: " ".join(t for _, t in sorted(v)) for c, v in by_col.items()
        }
        if mode == "composite":
            texts = {c: f"{c} {t}".strip() for c, t in texts.items()}
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(columns)), pa.int64()),
                "col": pa.array(columns, pa.string()),
                "text": pa.array([texts[c] for c in columns], pa.string()),
            }
        )
    )


class ValentineMatcherStub:
    """Env-gated delegation point for valentine's matchers (matching.py:
    101-152 ValentineSchemaMatching): Coma, Cupid, DistributionBased,
    SimilarityFlooding. valentine is not installed in this container, so
    construction raises with instructions; the native distributed analogs
    are jaccard_schema_matching / tfidf_top_tokens above."""

    def __init__(self, matcher: str = "coma", **kwargs) -> None:
        try:
            import valentine  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "ValentineMatcherStub needs the 'valentine' package (not "
                "available in this environment). Install valentine and call "
                "match(df1, df2); native alternatives: "
                "jaccard_schema_matching, tfidf_top_tokens."
            ) from e
        self.matcher = matcher
        self.kwargs = kwargs

    def match(self, df1, df2):  # pragma: no cover - env-limited
        import valentine

        from valentine.algorithms.jaccard_distance.jaccard_distance import (
            JaccardDistanceMatcher,
        )

        matchers = {"jaccard": JaccardDistanceMatcher}
        return valentine.valentine_match(
            df1, df2, matchers[self.matcher](**self.kwargs)
        )
