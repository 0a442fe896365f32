"""Distributed exchange primitives: schema-safe hash join.

``ray.data.Dataset.join`` (Ray 2.49.2) crashes when a hash partition receives
zero rows on either side: the aggregator builds a 0-column table and the Acero
join then fails with "No match ... for key field" (ray/data/_internal/
execution/operators/join.py:104-126). Empty partitions are routine for us —
small probe corpora, zero-duplicate corpora, skewed key spaces — so joins are
implemented here instead:

  union-cogroup: tag each side, align schemas with typed-null padding, hash-
  repartition the UNION once on the key columns, then split each partition by
  side and join locally with pyarrow. One streaming shuffle; co-location is
  by construction (pairing the partitions of two separate shuffles by block
  order is NOT stable in Ray — we learned that the hard way).

Requires ``DataContext.shuffle_strategy = HASH_SHUFFLE`` (keyed repartition is
only implemented for the hash-shuffle backend) — ``ensure_context()`` sets it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def ensure_context(ds: ray.data.Dataset | None = None) -> None:
    """Idempotently switch Ray Data to the hash-shuffle backend (needed for
    keyed repartition; also the right backend for our groupby-heavy plans).

    Datasets capture a DataContext copy at creation, so this must run before
    plan construction — pyjedai_ray.__init__ calls it at import. For datasets
    built before import (e.g. by the caller), pass them here to patch the
    captured context too.
    """
    import os

    from ray.data.context import ShuffleStrategy

    # size the hash-shuffle partition count to the cluster: the Ray default
    # (200) spawns 200 aggregator partitions per groupby, which is pure
    # overhead below ~64 cores. ~2 partitions per core, floor 8, cap 128.
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", os.cpu_count() or 8))
    else:
        cpus = int(os.environ.get("RAY_GRAFT_CPUS", os.cpu_count() or 8))
    parallelism = max(8, min(128, cpus * 2))

    # cap aggregator ACTORS well below the partition count: Ray spawns up to
    # min(max_hash_shuffle_aggregators, partitions) aggregator processes PER
    # exchange (hash_shuffle.py:986-1020 reserves only ~0.06 cpu each in
    # local mode, so the reservation doesn't limit them) — at 32 partitions
    # that's 32 processes per exchange, and chained/concurrent exchanges
    # oversubscribe the node with actor startup + context switching.
    # Measured (ejoin_500, sf0.1, 32 cpus): default 64 -> 30-43s barriered /
    # 92-125s streamed; capped at cpus/4=8 -> 13-17s in BOTH modes. One
    # aggregator can serve many partitions; fewer, busier actors win.
    max_aggs = max(2, cpus // 4)

    for ctx in filter(None, [ray.data.DataContext.get_current(), ds.context if ds is not None else None]):
        if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        if ctx.default_hash_shuffle_parallelism > parallelism:
            ctx.default_hash_shuffle_parallelism = parallelism
        if ctx.min_parallelism > parallelism * 4:
            ctx.min_parallelism = parallelism * 4
        if ctx.max_hash_shuffle_aggregators > max_aggs:
            ctx.max_hash_shuffle_aggregators = max_aggs


def stamp_schema(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Re-stamp a known schema onto 0-column empty blocks.

    Hash-shuffle aggregate operators emit schema-less empty blocks for empty
    partitions ("Operator produced a RefBundle with a different schema");
    downstream expression filters / UDFs keyed on column names would crash.
    Apply this after a groupby whose output feeds anything column-addressed.
    """

    def _stamp(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return schema.empty_table()
        return batch

    stamped = ds.map_batches(_stamp, batch_format="pyarrow")
    # a zero-row seed block guarantees the dataset always HAS the schema,
    # even when every upstream block was dropped (all-empty aggregations)
    seed = ray.data.from_arrow(schema.empty_table())
    return seed.union(stamped)


def probe_schema(ds: ray.data.Dataset) -> tuple[ray.data.Dataset, pa.Schema | None]:
    """Materialize once and probe the block schema. Use at the HEAD of a join
    chain; downstream joins then take derived schemas (renamed/appended) and
    stream — one barrier for the whole chain instead of one per join."""
    m = ds.materialize()
    return m, _block_schema(m)


def renamed(schema: pa.Schema, mapping: dict[str, str]) -> pa.Schema:
    return pa.schema([(mapping.get(f.name, f.name), f.type) for f in schema])


def appended(schema: pa.Schema, fields: list[tuple[str, pa.DataType]]) -> pa.Schema:
    return pa.schema(list(schema) + [pa.field(n, t) for n, t in fields])


_SIDE = "__jside"


def barrier(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize barrier between consecutive hash-shuffle exchanges.

    On Ray 2.49's hash-shuffle backend, letting several exchanges run
    concurrently in one streaming DAG makes their aggregator actor pools
    oversubscribe the CPUs (measured: ejoin 25s -> 102s fully streamed), so
    chained shuffles are separated by a materialize. This trades pure latency
    for aggregator-pool survival and should be re-measured on every Ray
    upgrade — hence the mode switch:

      PYJEDAI_RAY_BARRIER_MODE = "auto" (default) | "barrier" | "stream"

    "auto" applies the barrier on Ray <= 2.49 and streams on newer releases
    (re-measure and move the version pin when upgrading); "barrier"/"stream"
    force either behavior — "stream" is also the measurement knob:
    `PYJEDAI_RAY_BARRIER_MODE=stream python bench.py` quantifies the cost on
    the current scheduler (numbers recorded in BASELINE.md)."""
    import os

    mode = os.environ.get("PYJEDAI_RAY_BARRIER_MODE", "auto")
    if mode == "stream":
        return ds
    if mode == "auto":
        try:
            major, minor = (int(x) for x in ray.__version__.split(".")[:2])
            if (major, minor) > (2, 49):
                return ds
        except ValueError:
            pass  # unparseable dev version: keep the barrier
    return ds.materialize()


# target rows per hash-shuffle partition when the caller knows the input
# volume: below this, extra partitions only add per-partition exchange
# overhead (measured: 21k-doc LSH candidates 4.6-6.0s at 32 partitions vs
# ~3.0s at 8 on the same host). Web-scale inputs blow straight past the
# caller's requested count, so the hint never shrinks a big job.
ROWS_PER_PARTITION = 131_072


def effective_partitions(requested: int, rows: int | None = None) -> int:
    """Clamp a partition count to the cluster-sized shuffle parallelism.

    Requesting far more hash-shuffle partitions than the cluster has cores
    starves the aggregator actor pool (Ray waits minutes for actors that will
    never fit). Callers pass their ideal partitioning; the clamp adapts it to
    the session. ``rows`` (optional, a cheap row-count hint for the exchange
    input) additionally caps partitions to ~ROWS_PER_PARTITION rows each,
    floor 8 — small corpora stop paying 32-partition fixed overhead."""
    ensure_context()
    if rows is not None:
        requested = min(requested, max(8, rows // ROWS_PER_PARTITION + 1))
    ctx = ray.data.DataContext.get_current()
    return max(2, min(requested, ctx.default_hash_shuffle_parallelism))


# broadcast crossover for pure-int64 id sets: 32M ids = a 256 MB sorted
# array, zero-copy-readable from the object store by every map task. This is
# deliberately far above matching.BROADCAST_DOC_LIMIT (tuned for per-doc
# SIGNATURE payloads, ~100x wider): below it, a semi/anti join by id costs a
# vectorized searchsorted mask and the wide side never shuffles; above it,
# the id set itself is corpus-sized and only a distributed join scales.
SEMI_JOIN_BROADCAST_IDS = 32_000_000


def semi_join_ids(
    left: ray.data.Dataset,
    ids: ray.data.Dataset,
    id_col: str = "doc_id",
    ids_col: str = "doc_id",
    keep: bool = True,
    mode: str = "auto",
    num_partitions: int = 32,
    left_schema: pa.Schema | None = None,
    broadcast_limit: int = SEMI_JOIN_BROADCAST_IDS,
) -> ray.data.Dataset:
    """Filter ``left`` to rows whose ``id_col`` IS (keep=True) / IS NOT
    (keep=False) in ``ids`` (a narrow int64-id Dataset; extra columns and
    duplicate ids are fine — only membership matters).

    ``mode`` must be one of {"auto", "broadcast", "join"} — validated up
    front so a typo ("semi", "Broadcast") fails loudly instead of silently
    taking the broadcast path.

    mode "broadcast": ids are 8 bytes each — materialize the id side once,
    build ONE sorted numpy membership array in the object store (remote build
    task, zero-copy ``ray.get`` per map task), and mask each left batch with
    vectorized ``searchsorted`` — the WIDE left side never shuffles.
    mode "join": distributed ``hash_join`` left semi / left anti — the only
    option when the id set exceeds ``broadcast_limit``.
    mode "auto": broadcast at/below ``broadcast_limit`` ids (measured on the
    tiered cascade @2.56M docs: join-mode exact/lines tiers cost 90/77 s
    because the WIDE text rows shuffled; broadcast masks avoid that
    entirely)."""
    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(
            f"semi_join_ids: mode must be 'auto', 'broadcast' or 'join', "
            f"got {mode!r}"
        )
    ensure_context(left)
    mat = ids.select_columns([ids_col]).materialize()
    if mode == "auto":
        mode = "broadcast" if mat.count() <= broadcast_limit else "join"

    if mode == "join":
        return hash_join(
            left,
            mat if ids_col == id_col else mat.rename_columns({ids_col: id_col}),
            on=(id_col,),
            num_partitions=num_partitions,
            join_type="left semi" if keep else "left anti",
            left_schema=left_schema,
            right_schema=pa.schema([(id_col, pa.int64())]),
        )

    @ray.remote
    def _collect_ids(*blocks: pa.Table):
        parts = [
            b[ids_col].to_numpy(zero_copy_only=False)
            for b in blocks
            if b.num_columns and b.num_rows
        ]
        if not parts:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(parts))  # sorted + deduped

    ref = _collect_ids.remote(*mat.to_arrow_refs())

    def _mask(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return batch  # schema-less empty shuffle blocks only
        if id_col not in batch.column_names:
            # a silent pass-through here would turn a miskeyed semi/anti
            # join into a keep-everything no-op — fail loudly instead
            raise KeyError(
                f"semi_join_ids: column {id_col!r} missing from left batch "
                f"(has {batch.column_names})"
            )
        members = ray.get(ref)  # zero-copy plasma read
        v = batch[id_col].to_numpy(zero_copy_only=False)
        if members.size:
            p = np.searchsorted(members, v)
            inside = (p < members.size) & (
                members[np.minimum(p, members.size - 1)] == v
            )
        else:
            inside = np.zeros(len(v), dtype=bool)
        return batch.filter(pa.array(inside if keep else ~inside))

    return left.map_batches(_mask, batch_format="pyarrow")


def _block_schema(materialized: ray.data.Dataset) -> pa.Schema | None:
    """Schema of the first non-empty block. ``Dataset.schema()`` metadata can
    go stale through union+rename chains (blocks carry the renamed columns
    while the dataset reports pre-rename names), so schemas that drive join
    semantics are always derived from actual block data."""
    fallback = None
    for ref in materialized.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            return t.schema
        if t.num_columns and fallback is None:
            # 0-row blocks can carry STALE names (Ray's rename Project skips
            # empty blocks) — only trust them when no row-bearing block exists
            fallback = t.schema
    return fallback


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple[str, ...] | list[str],
    num_partitions: int = 32,
    right_on: tuple[str, ...] | list[str] | None = None,
    join_type: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Schema-safe distributed hash join (see module docstring).

    Implementation: union-cogroup. Both sides are tagged with a side column,
    schemas are aligned (missing columns padded with typed nulls), the union
    is hash-repartitioned ONCE on the key columns, and each partition splits
    by side and joins locally with pyarrow. Co-location is by construction —
    no reliance on partition ordering across two shuffles — and empty
    partitions/sides join correctly because both schemas are known.

    join_type: any pyarrow join type ("inner", "left outer", "left semi", ...).
    Non-key column names must be disjoint between the two sides.

    left_schema / right_schema: the side's schema when the caller knows it
    statically (every stage knows its output schema). Passing both turns the
    join fully streaming — no materialize-to-probe-blocks barrier. Schemas
    describe the datasets AS PASSED (right-side key fields named per
    ``right_on``; the key rename is applied here).
    """
    ensure_context(left)
    ensure_context(right)
    num_partitions = effective_partitions(num_partitions)
    on = list(on)
    right_on = list(right_on or on)
    if right_on != on:
        mapping = dict(zip(right_on, on))
        right = right.rename_columns(mapping)
        if right_schema is not None:
            right_schema = pa.schema(
                [(mapping.get(f.name, f.name), f.type) for f in right_schema]
            )

    L, R = left, right
    lschema, rschema = left_schema, right_schema
    if lschema is None:
        L = L.materialize()
        lschema = _block_schema(L)
    if rschema is None:
        R = R.materialize()
        rschema = _block_schema(R)
    if lschema is None or rschema is None:
        # a side is fully empty with unknown schema (e.g. zero candidate
        # pairs). Inner join => empty result; left-outer with empty right =>
        # left rows unchanged (downstream UDFs must tolerate the missing
        # right-side columns — our stage UDFs guard on column presence).
        if join_type == "inner" or lschema is None:
            return ray.data.from_arrow(pa.table({}))
        return L
    overlap = (set(lschema.names) & set(rschema.names)) - set(on)
    if overlap:
        raise ValueError(f"non-key columns present on both sides: {sorted(overlap)}")

    combined = pa.schema(
        [(n, lschema.field(n).type) for n in lschema.names]
        + [(n, rschema.field(n).type) for n in rschema.names if n not in lschema.names]
        + [(_SIDE, pa.int8())]
    )

    def _pad(side: int):
        def _f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name in combined.names:
                if name == _SIDE:
                    cols[name] = pa.array(np.full(n, side, dtype=np.int8), pa.int8())
                elif name in batch.column_names:
                    cols[name] = batch[name]
                else:
                    cols[name] = pa.nulls(n, combined.field(name).type)
            return pa.table(cols)

        return _f

    unioned = L.map_batches(_pad(0), batch_format="pyarrow").union(
        R.map_batches(_pad(1), batch_format="pyarrow")
    )
    parts = unioned.repartition(num_partitions, keys=on).materialize()

    lcols = list(lschema.names)
    rcols = list(rschema.names)

    def _local_join(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            lt = lschema.empty_table()
            rt = rschema.empty_table()
        else:
            import pyarrow.compute as pc

            side = batch[_SIDE]
            lt = batch.filter(pc.equal(side, 0)).select(lcols)
            rt = batch.filter(pc.equal(side, 1)).select(rcols)
            # restore exact dtypes (padding may have widened nothing, but
            # cast is cheap metadata when types already match)
            lt = lt.cast(lschema)
            rt = rt.cast(rschema)
        if (
            join_type in ("left semi", "left anti")
            and len(on) == 1
            and pa.types.is_integer(lschema.field(on[0]).type)
        ):
            # membership joins never read payload columns, but Acero rejects
            # the join outright when the LEFT side carries non-primitive
            # payloads (e.g. list<double> embeddings) — mask by key instead.
            # Null keys follow SQL join semantics (never match): excluded by
            # semi, kept by anti — handled INSIDE the mask, because falling
            # back to Table.join for one null row would reintroduce the Acero
            # crash this path exists to avoid. A nullable column would
            # otherwise surface as float64+NaN from to_numpy, so nulls are
            # filled with 0 and overridden by the validity mask. Non-integer
            # keys (no caller today) take the Acero join below.
            import pyarrow.compute as pc

            lcol = lt[on[0]]
            if lcol.null_count:
                valid = pc.is_valid(lcol).to_numpy(zero_copy_only=False)
                lv = pc.fill_null(lcol, 0).to_numpy(zero_copy_only=False)
            else:
                valid = None
                lv = lcol.to_numpy(zero_copy_only=False)
            rv = np.unique(
                pc.drop_null(rt[on[0]]).to_numpy(zero_copy_only=False)
            )
            if rv.size and lv.size:
                p = np.searchsorted(rv, lv)
                inside = (p < rv.size) & (rv[np.minimum(p, rv.size - 1)] == lv)
            else:
                inside = np.zeros(len(lv), dtype=bool)
            if valid is not None:
                inside &= valid  # a null key matches nothing
            return lt.filter(pa.array(inside if join_type == "left semi" else ~inside))
        return lt.join(rt, keys=on, right_keys=on, join_type=join_type)

    return parts.map_batches(
        _local_join, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
