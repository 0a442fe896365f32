"""Flagship checkpointed pipeline: Common-Crawl-shaped Parquet -> clusters.

read webpages (url, warc_ts, html, text, lang)
  -> extract_text(html) [stateless map, byte-identical per url invariant]
  -> drop html immediately (wide rows must not enter shuffles)
  -> assign doc_id = stable hash of url
  -> sign (MinHash/SimHash actor pool)
  -> LSH band candidates -> exact-Jaccard verify -> union-find clusters
  -> write clusters + doc->cluster map as partitioned Parquet

Every stage may checkpoint through pipelines/checkpoint.py (per-partition
lineage + metrics; resume skips validated stages).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

from ..config import DedupConfig
from ..functions.hashing import hash64_array
from ..functions.text import extract_text
from ..stages import blocking, clustering, matching, minhash
from . import checkpoint as ckpt

_LANG_CODE_RE = re.compile(r"[A-Za-z0-9_-]+")


def extract_and_project(
    webpages: ray.data.Dataset, use_html: bool = True, lang_filter: str | None = None
) -> ray.data.Dataset:
    """(url, warc_ts, html, text, lang) -> (doc_id, url, text, lang).

    With use_html=True the text column is recomputed from html via the
    deterministic extractor (and must equal the provided text byte-for-byte —
    asserted per batch); doc_id = blake2b-64(url) (stable across runs and
    parallelism; no serial row numbering)."""

    def _extract(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        if use_html and "html" in batch.column_names:
            texts = [extract_text(h or b"") for h in batch["html"].to_pylist()]
            if "text" in batch.column_names:
                given = batch["text"].to_pylist()
                for u, a, b in zip(urls, texts, given):
                    if b is not None and a != b:
                        raise ValueError(f"html->text mismatch for url {u}")
        else:
            texts = batch["text"].to_pylist()
        ids = (hash64_array(urls, seed=0x0D0C) >> np.uint64(1)).astype(np.int64)  # non-negative
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "url": batch["url"],
            "text": pa.array(texts, pa.large_string()),
        }
        if "lang" in batch.column_names:
            cols["lang"] = batch["lang"]
        return pa.table(cols)

    out = webpages.map_batches(_extract, batch_format="pyarrow")
    if lang_filter:
        # the code is interpolated into a filter expression — validate it so a
        # quote (or anything else non-language-tag) can't break out of the
        # string literal (BCP-47-ish codes only: letters, digits, '-', '_')
        if not _LANG_CODE_RE.fullmatch(lang_filter):
            raise ValueError(
                f"lang_filter must be a language code matching "
                f"{_LANG_CODE_RE.pattern!r}, got {lang_filter!r}"
            )
        out = out.filter(expr=f"lang == '{lang_filter}'")
    return out


def run_webdedup(
    webpages: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    out_dir: str | None = None,
    resume: bool = True,
    num_partitions: int = 32,
    signer_batch_size: int = 256,
    signer_concurrency=None,
    verify_mode: str = "auto",
    cluster_mode: str = "auto",
    use_html: bool = True,
    id_col: str | None = None,
    lang_filter: str | None = None,
    drop_counter: str | None = None,
) -> dict:
    """Full web dedup. Returns dict with docs/sigs/candidates/verified/
    clusters Datasets (checkpointed under out_dir when given).
    ``lang_filter`` restricts the corpus to one language code right after
    extraction (predicate on the input_hint ``lang`` column) — the usual
    Common-Crawl per-language dedup shape.

    Capped-path observability is ON by default: comparisons discarded by the
    hot-band cap are counted (state.metrics) under a config-derived counter
    name (override with ``drop_counter``), land in the candidates stage
    manifest as ``drop_metrics`` when checkpointing, and are returned under
    the ``drop_metrics`` key (read AFTER consuming the candidates Dataset —
    counts ride inside the batch tasks)."""
    from ..state.metrics import read_drops, reset_drops

    cfg = cfg or DedupConfig()
    ch = cfg.config_hash()
    if drop_counter is None:
        drop_counter = f"webdedup:{ch}"
    reset_drops(drop_counter)

    def _docs():
        if id_col is not None:
            return webpages.select_columns([id_col, "text"]).rename_columns(
                {id_col: "doc_id"}
            )
        return extract_and_project(
            webpages, use_html=use_html, lang_filter=lang_filter
        )

    chain = ""
    if out_dir:
        docs, chain = ckpt.load_or_compute(out_dir, "docs", ch, chain, _docs, resume=resume)
    else:
        # materialize so HTML extraction runs ONCE: docs is consumed by the
        # signer AND returned for callers to join clusters back onto — a lazy
        # plan here re-extracts per consumer (the checkpointed path reads
        # back Parquet and has the same run-once property)
        docs = _docs().materialize()

    def _sigs():
        return minhash.sign(
            docs.select_columns(["doc_id", "text"]),
            cfg,
            batch_size=signer_batch_size,
            concurrency=signer_concurrency,
        )

    if out_dir:
        sigs, chain = ckpt.load_or_compute(out_dir, "sigs", ch, chain, _sigs, resume=resume)
    else:
        sigs = _sigs().materialize() if verify_mode in ("broadcast", "auto") else _sigs()

    def _candidates():
        # edge volume = n_sigs x bands; counting a materialized/checkpointed
        # sigs is metadata-cheap and right-sizes the exchange (skip the hint
        # when sigs is still a lazy plan — counting would execute it twice)
        rows_hint = (
            sigs.count() * cfg.bands
            if (out_dir or verify_mode in ("broadcast", "auto"))
            else None
        )
        return blocking.candidate_pairs(
            minhash.explode_bands(sigs),
            max_block_size=cfg.max_block_size,
            num_partitions=num_partitions,
            drop_counter=drop_counter,
            drop_key="lsh_band_cap",
            input_rows=rows_hint,
        )

    if out_dir:
        candidates, chain = ckpt.load_or_compute(
            out_dir, "candidates", ch, chain, _candidates, resume=resume,
            metrics_fn=lambda: {"drop_metrics": read_drops(drop_counter)},
        )
    else:
        candidates = _candidates()

    def _verified():
        return matching.verify_pairs(
            candidates, sigs, threshold=cfg.verify_threshold,
            num_partitions=num_partitions, mode=verify_mode,
        )

    if out_dir:
        verified, chain = ckpt.load_or_compute(
            out_dir, "verified", ch, chain, _verified, resume=resume
        )
    else:
        verified = _verified()

    def _clusters():
        return clustering.connected_components(verified, mode=cluster_mode)

    if out_dir:
        clusters, chain = ckpt.load_or_compute(
            out_dir, "clusters", ch, chain, _clusters, resume=resume
        )
    else:
        clusters = _clusters()

    return {
        "docs": docs,
        "sigs": sigs,
        "candidates": candidates,
        "verified": verified,
        "clusters": clusters,
        "lineage": chain,
        # live view: totals accumulate as the candidates Dataset executes
        "drop_metrics": lambda: read_drops(drop_counter),
    }
