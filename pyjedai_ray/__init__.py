"""pyjedai_ray — a Ray-Data-native near-duplicate detection and entity
clustering engine.

Built from scratch against the semantics of AI-team-UoA/pyJedAI (reference
snapshot at /root/reference — see SURVEY.md for the file:line parity map), but
architected Ray-Data-first: every stage is a transform over a
``ray.data.Dataset`` of zero-copy Arrow batches; stateful stages (MinHash
signers, encoders) are actor pools; wide steps are ``groupby`` shuffles keyed
by blocking/band keys with explicit hot-key handling.

Canonical intermediate datasets (SURVEY.md §7):
  docs     (doc_id:int64, url, text, lang, ...signature cols)
  edges    (key:string|uint64, doc_id:int64)       -- exploded blocking keys
  pairs    (id1:int64, id2:int64[, weight:float64]) with id1 < id2
  clusters (doc_id:int64, cluster_id:int64), cluster_id = min(doc_id)
"""

__version__ = "0.1.0"

from .config import DedupConfig  # noqa: F401


def run_webdedup(*args, **kwargs):
    """Flagship single-pass MinHash-LSH web dedup (lazy re-export of
    pipelines.webdedup.run_webdedup)."""
    from .pipelines.webdedup import run_webdedup as _f

    return _f(*args, **kwargs)


def run_tiered_dedup(*args, **kwargs):
    """Production tiered dedup cascade (lazy re-export of
    pipelines.tiered.run_tiered_dedup)."""
    from .pipelines.tiered import run_tiered_dedup as _f

    return _f(*args, **kwargs)


def resolve_removals(*args, **kwargs):
    """Trace the cascade's removed docs to their FINAL surviving
    representatives (lazy re-export of pipelines.tiered.resolve_removals)."""
    from .pipelines.tiered import resolve_removals as _f

    return _f(*args, **kwargs)


def decontaminate(*args, **kwargs):
    """Benchmark decontamination: flag/remove train docs overlapping an eval
    set (lazy re-export of stages.decontaminate.decontaminate)."""
    from .stages.decontaminate import decontaminate as _f

    return _f(*args, **kwargs)


def _set_default_context() -> None:
    # Datasets capture the DataContext at creation; switch the process to the
    # hash-shuffle backend up front so every plan built after importing this
    # package supports keyed repartition (stages/exchange.py). Safe pre-init.
    try:
        from .stages.exchange import ensure_context

        ensure_context()
    except Exception:  # pragma: no cover - e.g. ray missing at docs build
        pass


_set_default_context()
