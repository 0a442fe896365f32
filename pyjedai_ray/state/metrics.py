"""Counted drop metrics for every capped path (SURVEY.md §4: "salting +
logged drop counters — no silent truncation").

Every place the engine bounds work by discarding comparisons — oversized LSH
blocks (chained or salted, blocking._emit_pairs_partition), ultra-frequent
tokens in the similarity joins (joins._pair_commons via chain_oversize=False),
hot IVF coarse cells in split mode (encoding.embeddings_nn_blocking) — can be
handed a named counter; the per-batch kernels report how many pairwise
comparisons the cap discarded, and pipelines surface the totals in their
stage manifests (pipelines/checkpoint.py) so a production run can QUANTIFY
the recall trade instead of reading a docstring caveat.

The counter is a tiny named zero-CPU Ray actor (the one legitimate
shared-mutable-state escape hatch): batch kernels look it up by name (cached
per worker process) and post synchronous adds — one small RPC per batch THAT
DROPPED something, which is the rare path by construction. Caveats, by
design: counts are observability metrics, not data — a retried task (or a
lazy Dataset that is executed twice) counts its batches again, and totals
are only meaningful after the dataset has been consumed (the adds ride
inside the batch tasks).
"""

from __future__ import annotations

import functools

import ray

_NAMESPACE_PREFIX = "pyjedai_drops:"


@ray.remote(num_cpus=0)
class _DropCounterActor:
    """key -> {dropped_comparisons, events} accumulator."""

    def __init__(self) -> None:
        self._totals: dict[str, dict[str, int]] = {}

    def add(self, key: str, dropped_comparisons: int, events: int = 1) -> None:
        t = self._totals.setdefault(key, {"dropped_comparisons": 0, "events": 0})
        t["dropped_comparisons"] += int(dropped_comparisons)
        t["events"] += int(events)

    def totals(self) -> dict[str, dict[str, int]]:
        return {k: dict(v) for k, v in self._totals.items()}

    def reset(self) -> None:
        self._totals.clear()


def get_counter(name: str):
    """Create-or-fetch the named counter actor (same Ray job namespace, so
    driver and map_batches workers resolve the same instance)."""
    return _DropCounterActor.options(
        name=_NAMESPACE_PREFIX + name, get_if_exists=True
    ).remote()


def _session_key() -> str | None:
    """Identity of the current Ray session (the GCS address is unique per
    ``ray.init``), or None when no session exists. Cached handles from a
    PREVIOUS session are dead actors — keying the cache on the session means
    a process that does ``ray.shutdown(); ray.init()`` (notebook pattern)
    gets a fresh counter instead of a RayActorError."""
    if not ray.is_initialized():
        return None
    try:
        return ray.get_runtime_context().gcs_address or None
    except Exception:
        return None


@functools.lru_cache(maxsize=256)
def _session_cached_handle(session: str, name: str):
    return get_counter(name)


def _cached_handle(name: str):
    session = _session_key()
    if session is None:
        # no live session to key on (the actor call below will auto-init
        # one): resolve WITHOUT caching — caching under a placeholder key
        # would hand the same handle to a later, different session
        return get_counter(name)
    return _session_cached_handle(session, name)


def report_drops(name: str, key: str, dropped_comparisons: int, events: int = 1) -> None:
    """Post a drop count from inside a batch kernel (worker-side; handle is
    cached per process). Synchronous so a later ``totals()`` read — which
    always happens after the dataset is consumed — sees the add."""
    if dropped_comparisons <= 0 and events <= 0:
        return
    ray.get(_cached_handle(name).add.remote(key, dropped_comparisons, events))


def read_drops(name: str) -> dict[str, dict[str, int]]:
    """Totals recorded so far under ``name`` (call after consuming the
    dataset(s) the counter was wired into)."""
    return ray.get(_cached_handle(name).totals.remote())


def reset_drops(name: str) -> None:
    ray.get(_cached_handle(name).reset.remote())
