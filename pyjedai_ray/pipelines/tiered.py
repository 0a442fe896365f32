"""Tiered web-corpus dedup cascade — the production training-data shape.

Real web-corpus pipelines (C4, CCNet, RefinedWeb, Dolma, FineWeb) never run
one dedup pass: they CASCADE tiers from cheapest to most expensive so each
tier shrinks the corpus the next (pricier) tier must touch:

  url      canonical-URL collapse (re-crawls / mirrors; one narrow exchange
           over (doc_id, url) — texts never move)
  exact    byte-identical text collapse (md5-fingerprint exchange — again
           only (doc_id, fingerprint) moves)
  lines    repeated-line removal (C4 boilerplate strip: headers, footers,
           cookie banners; REWRITES surviving docs, drops emptied ones)
  minhash  MinHash-LSH near-dup clustering (the expensive fuzzy tier, run
           on whatever survived the cheap tiers)

Tier ORDER is part of the semantics: ``exact`` must precede ``lines``
(after line-level dedup every surviving line exists in exactly one doc, so
no two docs can have equal texts — an exact pass after ``lines`` is provably
a no-op), and ``minhash`` runs last on the smallest corpus.

Each tier ends in survivors-of-the-input-corpus; the wide doc rows are
filtered via ``exchange.semi_join_ids`` (broadcast sorted-id mask up to
``SEMI_JOIN_BROADCAST_IDS`` = 32M ids, distributed semi/anti join above —
the wide side never shuffles in broadcast mode). With ``out_dir`` every tier checkpoints
through pipelines/checkpoint.py (per-partition lineage manifests whose
``row_count`` chain IS the per-tier survivor record); a re-run resumes after
the last tier whose manifest validates. Capped-path drop totals (the
minhash tier's hot-band cap) ride the usual state.metrics counter.

Reference analog: pyJedAI chains block building -> cleaning -> matching ->
clustering inside one workflow object (src/pyjedai/workflow.py); this module
is the web-scale counterpart where each "stage" is itself a full dedup tier
over a shrinking corpus.
"""

from __future__ import annotations

import hashlib
import os
import time

import pyarrow as pa
import ray.data

from ..config import DedupConfig
from ..stages import dedup
from ..stages.exchange import (
    effective_partitions,
    hash_join,
    probe_schema,
    semi_join_ids,
)
from . import checkpoint as ckpt
from .webdedup import extract_and_project

TIERS = ("url", "exact", "lines", "minhash")
# Opt-in tiers:
# "quality" (C4 filters low-quality docs BEFORE dedup; pass
#   tiers=("quality",) + TIERS): heuristic [0,1] score from length / punct /
#   stopword ratios (functions/text.quality_stats), embarrassingly parallel —
#   no shuffle at all.
# "semantic" (embedding-cosine near-dup, run LAST on the smallest corpus;
#   pass tiers=TIERS + ("semantic",) plus an ``embeddings`` Dataset):
#   hyperplane-LSH band keys -> capped candidates -> exact cosine verify
#   (stages/ann.lsh_neardup, no trained quantizer) -> connected components ->
#   losers removed. Catches paraphrase-level duplicates MinHash can't.
ALL_TIERS = ("quality",) + TIERS + ("semantic",)

# docs sampled to estimate lines-per-doc for the lines tier's exchange hint
_LINES_SAMPLE_DOCS = 256
# exchange-weight normalizer: effective_partitions' ROWS_PER_PARTITION is
# tuned for NARROW rows (ids/hashes); the exploded line rows carry the line
# text itself, so a row "weighs" its payload. 256 B/row means a partition
# targets ~131072 x 256 B ≈ 32 MB of line payload — a corpus of few-line
# WIDE docs (one 2 KB paragraph per doc) then keeps enough partitions even
# though its raw row count is small (measured: the 2.56M single-line bench
# corpus fell from 32 to 20 partitions on a rows-only hint and the lines
# tier doubled).
_LINE_ROW_BYTES = 256


def sampled_lines_hint(
    docs: ray.data.Dataset,
    n: int | None,
    text_col: str = "text",
    sep: str = "\n",
    sample: int = _LINES_SAMPLE_DOCS,
) -> int | None:
    """Exchange-weight row estimate for the lines tier: ``n`` docs times the
    sampled mean lines-per-doc, floored by the sampled text bytes /
    ``_LINE_ROW_BYTES`` (one cheap ``take_batch`` off an already-materialized
    corpus). Only a partition-count HINT — a biased sample under/over-
    partitions, it never changes results."""
    if not n:  # None (unknown) or 0 (empty corpus — take_batch would raise)
        return n
    import pyarrow.compute as pc

    tb = docs.select_columns([text_col]).limit(sample).take_batch(
        sample, batch_format="pyarrow"
    )
    if tb.num_rows == 0:
        return n
    col = pc.fill_null(tb[text_col].combine_chunks().cast(pa.string()), "")
    per_doc = pc.add(pc.count_substring(col, sep), 1)
    avg_lines = pc.mean(per_doc).as_py() or 1.0
    avg_bytes = pc.mean(pc.binary_length(col)).as_py() or 0.0
    est_rows = n * max(1.0, avg_lines)
    return int(max(est_rows, n * avg_bytes / _LINE_ROW_BYTES))


def resolve_removals(
    removals: dict[str, ray.data.Dataset | None],
    tiers: tuple[str, ...],
    num_partitions: int = 32,
) -> ray.data.Dataset | None:
    """Trace every removed doc to its FINAL surviving representative.

    ``removals[tier]`` maps doc -> representative AT REMOVAL TIME; a
    representative can itself be removed by a LATER tier (exact maps 22 -> 20,
    then minhash removes 20 into 7). Resolution walks the tiers in cascade
    order, repointing earlier tiers' representatives through each later
    tier's mapping with one narrow hash join per later tier — all int64
    columns, nothing corpus-wide on the driver. Null-representative removals
    (quality / lines) pass through unchanged; a representative that a later
    tier removes WITHOUT a successor (its every line was a repeat) resolves
    the earlier doc's representative to null too — never to a dead doc.
    Returns one (doc_id, final_cluster_id) Dataset over all tiers' removed
    docs, or None when no tier recorded removals.

    Raises ValueError when a tier RAN but its provenance is unavailable
    (``removals[tier] is None`` — e.g. a resumed run whose provenance side
    table failed manifest validation): a silently partial table would both
    omit that tier's removals and leave earlier tiers pointing at docs it
    removed."""
    from ..stages.exchange import hash_join, stamp_schema

    i64 = pa.int64()
    acc_schema = pa.schema([("doc_id", i64), ("cluster_id", i64)])
    acc: ray.data.Dataset | None = None  # docs removed so far, repointed
    for tier in tiers:
        if tier in removals and removals[tier] is None:
            raise ValueError(
                f"resolve_removals: tier {tier!r} ran but its removal "
                "provenance is unavailable (lost on resume?) — resolution "
                "would be silently incomplete. Re-run that tier with "
                "resume=False to rebuild its provenance table."
            )
        m = removals.get(tier)
        if m is None:
            continue
        m = m.select_columns(["doc_id", "cluster_id"])
        if acc is not None:
            # repoint accumulated representatives through THIS tier's map:
            # left-outer join on cluster_id. A MATCH means the rep was
            # removed by this tier — take its successor even when that
            # successor is null (rep dissolved with no representative);
            # coalesce alone can't tell that apart from "unmatched, rep
            # survived", which kept dead reps in the output. The constant
            # hit marker disambiguates.
            def _mark(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "cluster_id": batch["doc_id"],
                        "new_rep": batch["cluster_id"],
                        "new_hit": pa.array(
                            [1] * batch.num_rows, pa.int8()
                        ),
                    }
                )

            joined = hash_join(
                acc,
                m.map_batches(_mark, batch_format="pyarrow"),
                on=("cluster_id",),
                num_partitions=num_partitions,
                join_type="left outer",
                left_schema=acc_schema,
                right_schema=pa.schema(
                    [("cluster_id", i64), ("new_rep", i64), ("new_hit", pa.int8())]
                ),
            )

            def _repoint(batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0 or "doc_id" not in batch.column_names:
                    return acc_schema.empty_table()
                import pyarrow.compute as pc

                if "new_hit" in batch.column_names:
                    hit = pc.fill_null(batch["new_hit"], 0)
                    rep = pc.if_else(
                        pc.equal(hit, 1), batch["new_rep"], batch["cluster_id"]
                    )
                else:
                    rep = batch["cluster_id"]
                return pa.table(
                    {"doc_id": batch["doc_id"], "cluster_id": rep}
                ).cast(acc_schema)

            acc = stamp_schema(
                joined.map_batches(_repoint, batch_format="pyarrow"), acc_schema
            )
        acc = m if acc is None else acc.union(m)
    return acc


def _tiered_hash(
    cfg: DedupConfig,
    tiers: tuple,
    lang_filter,
    use_html,
    quality_threshold,
    semantic_threshold,
    id_col=None,
    emb_vec_col: str = "embedding",
    embedding_dim=None,
    source_id: str | None = None,
) -> str:
    # EVERYTHING that changes the cascade's output must be in this blob —
    # with out_dir/resume a collision silently returns a stale checkpoint as
    # the current result. id_col switches extraction vs pre-projected input;
    # the semantic tier's embeddings identity (vec col, dim, and the caller's
    # source_id, e.g. job.py's --embeddings path) changes its clusters.
    blob = (
        f"{cfg.config_hash()}|{','.join(tiers)}|{lang_filter}|{use_html}"
        f"|id={id_col!r}"
        + (f"|q={quality_threshold!r}" if "quality" in tiers else "")
        + (
            f"|s={semantic_threshold!r}|v={emb_vec_col}|d={embedding_dim!r}"
            f"|src={source_id!r}"
            if "semantic" in tiers
            else ""
        )
    )
    return hashlib.blake2b(blob.encode(), digest_size=8).hexdigest()


def run_tiered_dedup(
    webpages: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    tiers: tuple[str, ...] = TIERS,
    out_dir: str | None = None,
    resume: bool = True,
    num_partitions: int = 32,
    use_html: bool = True,
    id_col: str | None = None,
    lang_filter: str | None = None,
    verify_mode: str = "auto",
    cluster_mode: str = "auto",
    signer_batch_size: int = 256,
    signer_concurrency=None,
    drop_counter: str | None = None,
    quality_threshold: float = 0.5,
    embeddings: ray.data.Dataset | None = None,
    embedding_dim: int | None = None,
    semantic_threshold: float = 0.95,
    emb_vec_col: str = "embedding",
    track_removals: bool = True,
    source_id: str | None = None,
) -> dict:
    """Run the dedup cascade; returns
    ``{"docs", "clusters", "tier_stats", "removals", "lineage",
    "drop_metrics"}``.

    ``docs`` is the surviving corpus (doc_id, url, text[, lang]); ``clusters``
    is the minhash tier's (doc_id, cluster_id) table (None when that tier is
    disabled); ``tier_stats`` maps tier name -> {input, kept, removed, sec,
    resumed}; ``removals`` maps tier name -> a (doc_id, cluster_id)
    provenance table of the docs that tier removed — cluster_id is the doc's
    representative AT REMOVAL TIME for the dedup tiers (checkpointed, so
    resumed runs reload it) and null for quality/lines removals (no
    representative). A representative can itself be removed by a LATER tier
    (exact maps 22 -> 20, then minhash removes 20): tracing a removed doc to
    a doc in the final corpus means following the chain across the tiers'
    tables in order. ``track_removals=False`` skips the quality/lines id
    diffs (one extra narrow pass each) when only docs/tier_stats are needed.
    ``input`` counts and checkpoint manifests make every tier's shrinkage a
    recorded number — the same no-silent-truncation bar as the drop counters.

    ``id_col``: pass when ``webpages`` is already a doc table with stable int
    ids (skips HTML extraction; the ``url`` tier then requires a ``url``
    column to be present too).

    ``source_id``: opaque identity string for out-of-band inputs that change
    the result but can't be hashed from here — pass the embeddings file path
    when the ``semantic`` tier reads one (job.py does) so a re-run against a
    different embeddings file invalidates the checkpoints."""
    from ..state.metrics import read_drops, reset_drops

    cfg = cfg or DedupConfig()
    unknown = [t for t in tiers if t not in ALL_TIERS]
    if unknown:
        raise ValueError(f"unknown tiers {unknown}; pick from {ALL_TIERS}")
    if "exact" in tiers and "lines" in tiers and tiers.index("lines") < tiers.index(
        "exact"
    ):
        raise ValueError(
            "'exact' must run before 'lines': after line-level dedup no two "
            "docs can share equal texts, so the exact pass would be a no-op"
        )
    if "semantic" in tiers and embeddings is None:
        raise ValueError(
            "the 'semantic' tier needs an ``embeddings`` Dataset "
            "(doc_id, embedding) aligned with the corpus doc ids"
        )
    ch = _tiered_hash(
        cfg, tiers, lang_filter, use_html, quality_threshold, semantic_threshold,
        id_col=id_col, emb_vec_col=emb_vec_col, embedding_dim=embedding_dim,
        source_id=source_id,
    )
    if drop_counter is None:
        drop_counter = f"tiered:{ch}"
    reset_drops(drop_counter)

    def _docs():
        if id_col is not None:
            keep = [id_col] + [
                c for c in ("url", "text", "lang") if c in webpages.columns()
            ]
            out = webpages.select_columns(keep)
            return (
                out.rename_columns({id_col: "doc_id"}) if id_col != "doc_id" else out
            )
        return extract_and_project(webpages, use_html=use_html, lang_filter=lang_filter)

    chain = ""
    if out_dir:
        docs, chain = ckpt.load_or_compute(out_dir, "docs", ch, chain, _docs, resume=resume)
    else:
        docs = _docs().materialize()
    if "url" in tiers and "url" not in docs.columns():
        raise ValueError("the 'url' tier needs a 'url' column in the corpus")

    n_in = docs.count()
    stats: dict[str, dict] = {}
    clusters: ray.data.Dataset | None = None
    # per-tier removal PROVENANCE: (doc_id, cluster_id) where cluster_id is
    # the surviving representative the doc deduplicated into, or null when
    # the tier removes without a representative (quality-filtered / emptied
    # by the lines tier). Production dedup needs this mapping — train/holdout
    # splits and contamination checks trace removed docs to their keepers.
    # The dedup tiers' mappings are CHECKPOINTED (tier_{t}_assign /
    # tier_minhash_clusters) so a resumed run reloads them.
    removals: dict[str, ray.data.Dataset | None] = {}

    def _ckpt_narrow(stage: str, build, input_chain: str):
        """Materialize (and, with out_dir, checkpoint) a narrow side table."""
        if out_dir:
            ds_, _ = ckpt.load_or_compute(
                out_dir, stage, ch, input_chain, build, resume=resume
            )
            return ds_
        return build().materialize()

    def _tier_quality(docs_in, n):
        from ..stages.text_stages import add_quality

        kept = add_quality(docs_in).filter(
            expr=f"quality_score >= {quality_threshold!r}"
        )
        # drop the stat columns so every downstream tier sees the same doc
        # schema whether or not this tier ran
        return kept.drop_columns(
            ["n_tokens", "mean_token_len", "punct_ratio", "stopword_ratio",
             "quality_score"]
        )

    def _tier_url(docs_in, n):
        assign = _ckpt_narrow(
            "tier_url_assign",
            lambda: dedup.url_dedup(
                docs_in, num_partitions=num_partitions, input_rows=n
            ).select_columns(["doc_id", "cluster_id"]),
            chain,
        )
        removals["url"] = assign.filter(expr="doc_id != cluster_id")
        keep_ids = assign.filter(expr="doc_id == cluster_id").select_columns(["doc_id"])
        return semi_join_ids(docs_in, keep_ids, num_partitions=num_partitions)

    def _tier_exact(docs_in, n):
        assign = _ckpt_narrow(
            "tier_exact_assign",
            lambda: dedup.exact_dedup(
                docs_in, num_partitions=num_partitions, input_rows=n
            ),
            chain,
        )
        removals["exact"] = assign.filter(expr="doc_id != cluster_id")
        keep_ids = assign.filter(expr="doc_id == cluster_id").select_columns(["doc_id"])
        return semi_join_ids(docs_in, keep_ids, num_partitions=num_partitions)

    def _tier_lines(docs_in, n):
        # rows hint for the line-fingerprint exchange: lines-per-doc is
        # unknown before the explode, so estimate it from a small doc sample
        # (a hard-coded guess under-partitions corpora of very long docs)
        stripped = dedup.line_dedup(
            docs_in, reassemble=True, num_partitions=num_partitions,
            input_rows=sampled_lines_hint(docs_in, n),
        )
        narrow, nschema = probe_schema(docs_in.drop_columns(["text"]))
        if nschema is None or len(nschema.names) <= 1:
            return stripped  # nothing but the id to reattach
        return hash_join(
            stripped,
            narrow,
            on=("doc_id",),
            num_partitions=effective_partitions(num_partitions, rows=n),
            join_type="inner",
            left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
            right_schema=nschema,
        )

    def _tier_minhash(docs_in, n):
        nonlocal clusters
        res = dedup.minhash_dedup(
            docs_in,
            cfg,
            num_partitions=num_partitions,
            signer_batch_size=signer_batch_size,
            signer_concurrency=signer_concurrency,
            cluster_mode=cluster_mode,
            verify_mode=verify_mode,
            drop_counter=drop_counter,
        )
        cl = _ckpt_narrow("tier_minhash_clusters", lambda: res["clusters"], chain)
        clusters = cl
        removals["minhash"] = cl.filter(expr="doc_id != cluster_id")
        losers = removals["minhash"].select_columns(["doc_id"])
        return semi_join_ids(docs_in, losers, keep=False, num_partitions=num_partitions)

    def _tier_semantic(docs_in, n):
        from ..stages import ann, clustering

        # restrict the embedding table to the docs still alive, then LSH
        # near-dup (no trained quantizer) -> exact cosine verify -> CC
        emb = semi_join_ids(
            embeddings,
            docs_in.select_columns(["doc_id"]),
            id_col="doc_id",
            num_partitions=num_partitions,
        )
        dim = embedding_dim
        if dim is None:
            first = emb.take(1)
            if not first:
                return docs_in  # nothing to compare
            dim = len(first[0][emb_vec_col])
        pairs = ann.lsh_neardup(
            emb,
            dim=dim,
            threshold=semantic_threshold,
            id_col="doc_id",
            vec_col=emb_vec_col,
            num_partitions=num_partitions,
            drop_counter=drop_counter,
        )
        cl = _ckpt_narrow(
            "tier_semantic_clusters",
            lambda: clustering.connected_components(pairs, mode=cluster_mode),
            chain,
        )
        removals["semantic"] = cl.filter(expr="doc_id != cluster_id")
        losers = removals["semantic"].select_columns(["doc_id"])
        return semi_join_ids(docs_in, losers, keep=False, num_partitions=num_partitions)

    tier_fns = {
        "quality": _tier_quality,
        "url": _tier_url,
        "exact": _tier_exact,
        "lines": _tier_lines,
        "minhash": _tier_minhash,
        "semantic": _tier_semantic,
    }

    for tier in tiers:
        t0 = time.perf_counter()
        stage = f"tier_{tier}"
        resumed = False
        prev_docs = docs
        chain_before = chain  # the assign/clusters side tables are stamped
        # with the PRE-tier chain; validate against it, not the advanced one
        if out_dir:
            resumed = resume and ckpt.manifest_valid(
                os.path.join(out_dir, stage), ch, chain_before
            )
            docs, chain = ckpt.load_or_compute(
                out_dir, stage, ch, chain,
                lambda d=docs, n=n_in, t=tier: tier_fns[t](d, n),
                resume=resume,
                metrics_fn=(
                    (lambda: {"drop_metrics": read_drops(drop_counter)})
                    if tier in ("minhash", "semantic")
                    else None
                ),
            )
        else:
            docs = tier_fns[tier](docs, n_in).materialize()
        if tier in ("quality", "lines") and track_removals:
            # no surviving representative for these removals: provenance is
            # the id diff, cluster_id = null
            rem_ids = semi_join_ids(
                prev_docs.select_columns(["doc_id"]),
                docs.select_columns(["doc_id"]),
                keep=False,
                num_partitions=num_partitions,
            )
            removals[tier] = rem_ids.map_batches(
                lambda b: b.append_column(
                    "cluster_id", pa.nulls(b.num_rows, pa.int64())
                ),
                batch_format="pyarrow",
            )
        elif resumed and tier in ("url", "exact", "minhash", "semantic"):
            # the tier's compute closure (which records the mapping) was
            # skipped — reload the checkpointed assign/clusters table
            map_dir = os.path.join(
                out_dir,
                {
                    "minhash": "tier_minhash_clusters",
                    "semantic": "tier_semantic_clusters",
                }.get(tier, f"tier_{tier}_assign"),
            )
            # full manifest validation (config hash + input chain + file
            # sizes), not mere existence: a stale table from a different-
            # config run must not be silently returned as provenance
            provenance_lost = False
            if ckpt.manifest_valid(map_dir, ch, chain_before):
                m = ckpt.read_stage(map_dir)
                removals[tier] = m.filter(expr="doc_id != cluster_id")
                if tier == "minhash":
                    clusters = m
            else:
                # the tier's docs checkpoint validated but its provenance
                # side table didn't — the docs result is still correct, but
                # removals[tier] (and clusters for minhash) are unavailable.
                # Record WHY so a null n_clustered in job.py is attributable.
                removals[tier] = None
                provenance_lost = True
                import warnings

                warnings.warn(
                    f"tiered dedup: resumed tier {tier!r} but its provenance "
                    f"table at {map_dir} failed manifest validation — "
                    f"removals[{tier!r}]"
                    + (" and clusters are" if tier == "minhash" else " is")
                    + " None for this run (docs output unaffected)",
                    stacklevel=2,
                )
        kept = docs.count()
        stats[tier] = {
            "input": n_in,
            "kept": kept,
            "removed": n_in - kept,
            "sec": round(time.perf_counter() - t0, 3),
            "resumed": resumed,
        }
        if resumed and tier in ("url", "exact", "minhash", "semantic"):
            stats[tier]["provenance_resumed"] = not provenance_lost
        n_in = kept

    return {
        "docs": docs,
        "clusters": clusters,
        "tier_stats": stats,
        "removals": removals,
        "lineage": chain,
        "drop_metrics": lambda: read_drops(drop_counter),
    }
