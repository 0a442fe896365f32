"""Checkpoint / resume with per-partition lineage (north-rule requirement).

Reference analog: the embedding ``.npy`` cache (src/pyjedai/
vector_based_blocking.py:229-292) and workflow JSON store (workflow.py:419-448)
— ad-hoc, single-stage. Here every stage can write its output Dataset as
partitioned Parquet under ``<base>/<stage>/`` plus a ``_manifest.json``:

  {stage, config_hash, input_manifest (upstream config hash chain),
   row_count, partitions: [{file, rows, bytes}...], metrics{}}

Resume = ``load_or_compute``: if the stage directory holds a manifest whose
config_hash + input chain match, ``read_parquet`` it back (skipping the
compute); otherwise compute, write, and stamp. The per-partition file list
with row counts IS the lineage record — a failed run resumes from the last
stage whose manifest validates, and partition counts localize corruption.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import pyarrow.parquet as pq
import ray.data

MANIFEST = "_manifest.json"


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST)


def write_stage(
    ds: ray.data.Dataset,
    stage_dir: str,
    stage: str,
    config_hash: str,
    input_manifest: str = "",
    metrics: dict | None = None,
) -> dict:
    """Write a stage's output as Parquet + manifest; returns the manifest."""
    os.makedirs(stage_dir, exist_ok=True)
    # clear stale partials — but ONLY files this module writes (*.parquet +
    # the manifest). A stray subdirectory or user file parked in the stage
    # dir must not be deleted (and a blind os.remove on a directory raises
    # IsADirectoryError mid-write, after the old manifest is invalidated).
    for f in os.listdir(stage_dir):
        if f == MANIFEST or f.endswith(".parquet"):
            os.remove(os.path.join(stage_dir, f))
    ds.write_parquet(stage_dir)
    partitions = []
    total = 0
    for name in sorted(os.listdir(stage_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(stage_dir, name)
        meta = pq.ParquetFile(path).metadata
        partitions.append(
            {"file": name, "rows": meta.num_rows, "bytes": os.path.getsize(path)}
        )
        total += meta.num_rows
    schema = None
    if partitions:
        schema = [
            f.name
            for f in pq.ParquetFile(
                os.path.join(stage_dir, partitions[0]["file"])
            ).schema_arrow
        ]
    manifest = {
        "stage": stage,
        "config_hash": config_hash,
        "input_manifest": input_manifest,
        "row_count": total,
        "partitions": partitions,
        "schema": schema,
        "written_at": __import__("time").time(),
        "metrics": metrics or {},
    }
    with open(_manifest_path(stage_dir), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_stage(stage_dir: str) -> ray.data.Dataset:
    """Read a checkpointed stage back as a Dataset — EXACTLY the manifest's
    partition files, not a directory glob. Stray entries a user parked in the
    stage dir (notes, subdirectories) are ignored on read just as write_stage
    leaves them alone on write; a directory glob would crash on them."""
    import pyarrow as pa

    m = read_manifest(stage_dir)
    if m is not None:
        if not m.get("partitions"):
            # an empty stage (a tier that removed everything) writes no
            # parquet files; a directory glob here would choke on the
            # manifest itself or preserved stray entries
            return ray.data.from_arrow(pa.table({}))
        return ray.data.read_parquet(
            [os.path.join(stage_dir, p["file"]) for p in m["partitions"]]
        )
    return ray.data.read_parquet(stage_dir)


def read_manifest(stage_dir: str) -> dict | None:
    try:
        with open(_manifest_path(stage_dir)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def manifest_valid(stage_dir: str, config_hash: str, input_manifest: str = "") -> bool:
    """A manifest validates iff config + input chain match AND every listed
    partition file is present with the recorded size."""
    m = read_manifest(stage_dir)
    if not m or m.get("config_hash") != config_hash or m.get("input_manifest") != input_manifest:
        return False
    for p in m.get("partitions", []):
        path = os.path.join(stage_dir, p["file"])
        if not os.path.exists(path) or os.path.getsize(path) != p["bytes"]:
            return False
    return True


def chain_hash(config_hash: str, input_manifest: str) -> str:
    """Lineage chain value handed to the next stage."""
    import hashlib

    return hashlib.blake2b(
        f"{input_manifest}->{config_hash}".encode(), digest_size=8
    ).hexdigest()


def load_or_compute(
    base_dir: str,
    stage: str,
    config_hash: str,
    input_manifest: str,
    compute: Callable[[], ray.data.Dataset],
    metrics: dict | None = None,
    resume: bool = True,
    metrics_fn: Callable[[], dict] | None = None,
) -> tuple[ray.data.Dataset, str]:
    """Return (dataset, lineage-chain-hash); reads the checkpoint when its
    manifest validates, else computes + writes it.

    ``metrics_fn`` is evaluated AFTER the stage has executed (the write is
    the execution trigger) and merged into the manifest metrics — the hook
    for counters that only exist once the batch tasks ran, e.g. the
    state.metrics drop totals (SURVEY §4 no-silent-truncation)."""
    import time

    stage_dir = os.path.join(base_dir, stage)
    chain = chain_hash(config_hash, input_manifest)
    if resume and manifest_valid(stage_dir, config_hash, input_manifest):
        return read_stage(stage_dir), chain
    t0 = time.time()
    ds = compute()
    m = dict(metrics or {})
    m.setdefault("compute_plus_write_sec", None)
    write_stage(ds, stage_dir, stage, config_hash, input_manifest, m)
    # stamp the measured wall time after the write completes (the write
    # triggers execution, so this covers compute + sink)
    m["compute_plus_write_sec"] = round(time.time() - t0, 3)
    if metrics_fn is not None:
        m.update(metrics_fn())
    mf = read_manifest(stage_dir)
    if mf is not None:
        mf["metrics"] = m
        with open(_manifest_path(stage_dir), "w") as f:
            json.dump(mf, f, indent=1)
    return read_stage(stage_dir), chain
