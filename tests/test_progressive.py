"""Progressive emission: bilateral indexing + kNN-neighborhood (NN-BPM)
emission orders over tiny deterministic graphs."""

import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _directed(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "id1": pa.array([r[0] for r in rows], pa.int64()),
                "id2": pa.array([r[1] for r in rows], pa.int64()),
                "weight": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
    )


def test_emit_bilateral_dedups_orientations():
    from pyjedai_ray.stages.meta_blocking import emit_bilateral

    # pair (1,2) present in both orientations must emit ONCE; budget large
    directed = _directed([(1, 2, 0.9), (2, 1, 0.9), (2, 3, 0.8)])
    out = emit_bilateral(directed, budget=10, strategy="HB", num_partitions=2)
    rows = sorted((r["id1"], r["id2"]) for r in out.take_all())
    # canonical-pair dedup: exactly {1-2 (one orientation), 2-3, 3-2 swap}
    pairs = {tuple(sorted(p)) for p in rows}
    assert pairs == {(1, 2), (2, 3)}
    assert len(rows) == 2


def test_nn_progressive_emit_top_vs_hb():
    import ray.data

    from pyjedai_ray.stages.encoding import nn_progressive_emit

    knn = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([1, 1, 2, 2], pa.int64()),
                "neighbor_id": pa.array([2, 3, 1, 3], pa.int64()),
                "score": pa.array([0.9, 0.2, 0.9, 0.8], pa.float64()),
                "rank": pa.array([1, 2, 1, 2], pa.int32()),
            }
        )
    )
    top = nn_progressive_emit(knn, budget=2, strategy="TOP", num_partitions=2)
    tp = {tuple(sorted((r["id1"], r["id2"]))) for r in top.take_all()}
    # TOP: (1,2)@0.9 once (canonical max), then (2,3)@0.8
    assert tp == {(1, 2), (2, 3)}

    hb = nn_progressive_emit(knn, budget=3, strategy="HB", num_partitions=2)
    hp = {tuple(sorted((r["id1"], r["id2"]))) for r in hb.take_all()}
    # neighborhood 2 (avg 0.85) outranks 1 (avg 0.55); first pops (2,1),(1,2)
    # dedup to one pair, then remaining (2,3),(1,3)
    assert (1, 2) in hp and (2, 3) in hp
    assert len(hp) == 3


def test_progressive_recall_curve():
    from pyjedai_ray.stages.evaluate import progressive_recall_curve

    emitted = [(0.9, 1, 2), (0.8, 3, 4), (0.7, 5, 6), (0.6, 8, 7)]
    gt = {(1, 2), (7, 8)}
    curve = progressive_recall_curve(emitted, gt)
    # pair order canonicalizes: (8,7) matches gt (7,8) at emission 4
    assert curve == [(1, 0.5), (2, 0.5), (3, 0.5), (4, 1.0)]


def test_progressive_entity_scheduling_alias():
    from pyjedai_ray.stages.meta_blocking import progressive_entity_scheduling

    w = _directed([(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0)])
    out = progressive_entity_scheduling(w, budget=2, method="DFS", num_partitions=2)
    assert out.count() == 2


def test_pes_order_pinned_vs_serial_scheduler():
    """PES value-proof (VERDICT r3 #3): the columnar emission order equals an
    INDEPENDENT serial simulation of the reference's per-entity best-first
    scheduler (comparison_cleaning.py:984-1086 semantics: entities visited by
    descending neighborhood average — ties pinned by center id — HB = one
    best-neighbor pop per entity first, then drain each neighborhood in
    (weight desc, neighbor asc) order; a pair emits only at its first
    occurrence). Checked at EVERY budget prefix."""
    import ray.data

    from pyjedai_ray.stages.meta_blocking import progressive_entity_scheduling

    # weighted pair graph with ties in weights and in neighborhood averages
    pairs = [
        (0, 1, 0.9), (0, 2, 0.5), (1, 2, 0.7), (2, 3, 0.7),
        (3, 4, 0.9), (4, 5, 0.5), (1, 5, 0.3), (0, 5, 0.3),
    ]
    weighted = ray.data.from_arrow(
        pa.table(
            {
                "id1": pa.array([p[0] for p in pairs], pa.int64()),
                "id2": pa.array([p[1] for p in pairs], pa.int64()),
                "weight": pa.array([p[2] for p in pairs], pa.float64()),
            }
        )
    )

    # serial scheduler simulation (independent of the columnar plan)
    nbhd: dict[int, list[tuple[float, int]]] = {}
    for a, b, w in pairs:
        nbhd.setdefault(a, []).append((w, b))
        nbhd.setdefault(b, []).append((w, a))
    for v in nbhd:
        nbhd[v].sort(key=lambda t: (-t[0], t[1]))
    centers = sorted(nbhd, key=lambda v: (-sum(w for w, _ in nbhd[v]) / len(nbhd[v]), v))
    seen: set[tuple[int, int]] = set()
    expected: list[tuple[int, int, float]] = []
    for v in centers:  # HB phase 1: one best pop per center
        w, u = nbhd[v][0]
        if (min(v, u), max(v, u)) not in seen:
            seen.add((min(v, u), max(v, u)))
            expected.append((v, u, w))
    for v in centers:  # HB phase 2: drain the rest, DFS per center
        for w, u in nbhd[v][1:]:
            if (min(v, u), max(v, u)) not in seen:
                seen.add((min(v, u), max(v, u)))
                expected.append((v, u, w))

    full = [
        (r["id1"], r["id2"], r["weight"])
        for r in progressive_entity_scheduling(
            weighted, budget=100, method="HB", num_partitions=2
        ).take_all()
    ]
    assert full == expected
    for budget in range(1, len(expected) + 1):  # every prefix honors budget
        got = [
            (r["id1"], r["id2"], r["weight"])
            for r in progressive_entity_scheduling(
                weighted, budget=budget, method="HB", num_partitions=2
            ).take_all()
        ]
        assert got == expected[:budget], f"budget={budget}"
