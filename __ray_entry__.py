"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown(). Importing pyjedai_ray switches the Ray Data
context to the hash-shuffle backend (required for keyed repartition) — that
must happen before any Dataset is built, which import-time ordering ensures.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship near-dup pipeline on sf0.001: synthesize the Common-Crawl-
    shaped webpages corpus (url, warc_ts, html, text, lang) from the driver
    documents table, extract text from html (byte-identity asserted), MinHash
    LSH -> verify -> union-find, and return every doc with its cluster id."""
    from pyjedai_ray import DedupConfig
    from pyjedai_ray.pipelines.webdedup import run_webdedup
    from pyjedai_ray.sources.webpages import synthesize_webpages
    from pyjedai_ray.stages.clustering import attach_clusters

    wp = synthesize_webpages("/root/testdata/sf0.001").materialize()
    res = run_webdedup(
        wp.drop_columns(["doc_id", "gt_cluster"]),
        DedupConfig(),
        verify_mode="broadcast",
        cluster_mode="driver",
        num_partitions=8,
    )
    docs = res["docs"].select_columns(["doc_id", "url"])
    return attach_clusters(docs, res["clusters"], num_partitions=8)


def queries() -> dict[str, Callable[[str], Any]]:
    from pyjedai_ray.entry_queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from pyjedai_ray.entry_queries import oracle_sql as _o

    return _o()
