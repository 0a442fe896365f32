"""Serial-greedy + Markov/Kiraly clustering methods (reference
src/pyjedai/clustering.py:477-1341 semantics on small deterministic graphs)."""

import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _wpairs(rows):
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


def _as_map(ds):
    return {r["doc_id"]: r["cluster_id"] for r in ds.take_all()}


def test_markov_clustering_splits_weak_bridge():
    from pyjedai_ray.stages.clustering import markov_clustering

    # two triangles joined by a weak bridge: MCL must cut the bridge
    pairs = _wpairs(
        [(1, 2, 0.9), (1, 3, 0.9), (2, 3, 0.9),
         (4, 5, 0.9), (4, 6, 0.9), (5, 6, 0.9), (3, 4, 0.55)]
    )
    out = _as_map(markov_clustering(pairs, threshold=0.5))
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_markov_clustering_threshold_strict():
    from pyjedai_ray.stages.clustering import markov_clustering

    # edge exactly AT threshold is excluded (reference :1096 strict >)
    pairs = _wpairs([(1, 2, 0.5)])
    assert _as_map(markov_clustering(pairs, threshold=0.5)) == {}


def test_kiraly_strict_stealing():
    from pyjedai_ray.stages.clustering import kiraly_clustering

    # men 2,4 (even) both prefer woman 11; man 4 has strictly higher
    # similarity, so he steals her; man 2 stays unmatched (never re-queued,
    # reference :1246-1262)
    pairs = _wpairs([(2, 11, 0.6), (4, 11, 0.8), (2, 13, 0.5)])
    out = _as_map(kiraly_clustering(pairs, threshold=0.1))
    assert out == {4: 4, 11: 4}


def test_kiraly_tie_keeps_earlier_man():
    from pyjedai_ray.stages.clustering import kiraly_clustering

    # equal similarity: acceptance requires STRICT improvement, so the
    # earlier (smaller-id) man keeps the match
    pairs = _wpairs([(2, 11, 0.7), (4, 11, 0.7)])
    out = _as_map(kiraly_clustering(pairs, threshold=0.1))
    assert out == {2: 2, 11: 2}


def test_correlation_clustering_improves_objective():
    from pyjedai_ray.stages.clustering import correlation_clustering

    # two tight groups seeded as ONE component via a mid-weight bridge
    # (>= initial 0.5 but < similarity 0.8 and > non-similarity 0.2);
    # the local search must keep similar pairs together
    pairs = _wpairs(
        [(1, 2, 0.9), (1, 3, 0.9), (2, 3, 0.9),
         (4, 5, 0.9), (4, 6, 0.9), (5, 6, 0.9), (3, 4, 0.6)]
    )
    out = _as_map(correlation_clustering(pairs, lsi_iterations=200))
    # similar pairs must share a cluster (the search never accepts a move
    # that lowers the objective, and the seed clustering already satisfies it)
    assert out[1] == out[2] == out[3]
    assert out[4] == out[5] == out[6]


def test_correlation_clustering_deterministic():
    from pyjedai_ray.stages.clustering import correlation_clustering

    pairs = _wpairs([(1, 2, 0.9), (3, 4, 0.1), (2, 3, 0.6)])
    a = _as_map(correlation_clustering(pairs, seed=7))
    b = _as_map(correlation_clustering(pairs, seed=7))
    assert a == b


def test_ricochet_sr_basic():
    from pyjedai_ray.stages.clustering import ricochet_sr_clustering

    # two pairs with a weak cross-edge: highest-avg vertex seeds first
    pairs = _wpairs([(1, 2, 0.9), (3, 4, 0.8), (2, 3, 0.55)])
    out = ricochet_sr_clustering(pairs, threshold=0.5)
    rows = out.take_all()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # no node in two clusters
    m = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert m[1] == m[2]  # strongest pair stays together
    assert set(m) == {1, 2, 3, 4}


def test_ricochet_sr_empty_and_threshold():
    from pyjedai_ray.stages.clustering import ricochet_sr_clustering

    assert ricochet_sr_clustering(_wpairs([(1, 2, 0.5)]), threshold=0.5).count() == 0


def test_row_column_matches_best_pairs():
    from pyjedai_ray.stages.clustering import row_column_clustering

    # bipartite: rows {1,3}, cols {10,12}; best assignment pairs 1-10, 3-12
    pairs = _wpairs([(1, 10, 0.9), (1, 12, 0.6), (3, 10, 0.55), (3, 12, 0.8)])
    out = _as_map(row_column_clustering(pairs, threshold=0.5))
    assert out == {1: 1, 10: 1, 3: 3, 12: 3}


def test_row_column_threshold_filters():
    from pyjedai_ray.stages.clustering import row_column_clustering

    pairs = _wpairs([(1, 10, 0.4)])
    assert row_column_clustering(pairs, threshold=0.5).count() == 0


def test_center_clustering_degree_normalized():
    from pyjedai_ray.stages.clustering import center_clustering

    # node 1 has the higher raw weight-SUM (two edges) but node 2 the higher
    # degree-NORMALIZED weight; reference picks centers by sum/degree
    # (clustering.py:619-621), so 2 must be the center of (1,2)
    pairs = _wpairs([(1, 2, 0.9), (1, 3, 0.1), (2, 4, 0.85)])
    out = _as_map(center_clustering(pairs, threshold=0.05))
    # scan order: (1,2,.9) first: norm(1)=(0.9+0.1)/2=0.5 < norm(2)=(0.9+0.85)/2
    # -> 2 center, 1 member; then (2,4): 2 is center -> 4 member; (1,3): 1 is
    # member, 3 free -> skipped
    assert out == {1: 2, 2: 2, 4: 2}


def test_merge_center_transitive_merge():
    from pyjedai_ray.stages.clustering import merge_center_clustering

    # (1,2,.9): 1 center, 2 member. (3,4,.8): 3 center, 4 member.
    # (3,2,.7): 3 is center, 2 already member of 1 -> edge still lands in the
    # output graph (reference :770-776), merging both clusters
    pairs = _wpairs([(1, 2, 0.9), (3, 4, 0.8), (2, 3, 0.7)])
    out = _as_map(merge_center_clustering(pairs, threshold=0.1))
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cut_clustering_splits_weak_bridge():
    from pyjedai_ray.stages.clustering import cut_clustering

    # two unit triangles joined by a 0.6 bridge; alpha=0.5 makes each
    # triangle's sink-cut (bridge + 3*alpha = 2.1) strictly cheaper than
    # any single-node cut, so Gomory-Hu minus the sink yields two clusters
    pairs = _wpairs(
        [(1, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0),
         (4, 5, 1.0), (4, 6, 1.0), (5, 6, 1.0), (3, 4, 0.6)]
    )
    out = _as_map(cut_clustering(pairs, threshold=0.5, alpha=0.5))
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_cut_clustering_threshold_strict():
    from pyjedai_ray.stages.clustering import cut_clustering

    # edge exactly AT threshold excluded (reference clustering.py:1033 strict >)
    pairs = _wpairs([(1, 2, 0.5)])
    assert _as_map(cut_clustering(pairs, threshold=0.5)) == {}


def test_cut_clustering_large_alpha_shatters():
    from pyjedai_ray.stages.clustering import cut_clustering

    # alpha above every edge weight: each node's min cut to the sink is its
    # own sink edge, every Gomory-Hu tree edge is sink-incident, all
    # singletons (Flake-Tarjan degenerate case)
    pairs = _wpairs([(1, 2, 0.8), (2, 3, 0.7)])
    out = _as_map(cut_clustering(pairs, threshold=0.5, alpha=5.0))
    assert out == {1: 1, 2: 2, 3: 3}


def test_cut_clustering_small_alpha_keeps_component():
    from pyjedai_ray.stages.clustering import cut_clustering

    # alpha far below edge weights: the whole trimmed component stays one
    # cluster (sink cut of the full component is cheapest)
    pairs = _wpairs([(1, 2, 0.9), (2, 3, 0.9)])
    out = _as_map(cut_clustering(pairs, threshold=0.5, alpha=0.01))
    assert out == {1: 1, 2: 1, 3: 1}


def test_driver_clusterer_edge_cap_raises():
    from pyjedai_ray.stages.clustering import unique_mapping_clustering, _sorted_edges

    pairs = _wpairs([(i, i + 100, 0.9) for i in range(10)])
    with pytest.raises(ValueError, match="driver-side clusterer cap"):
        _sorted_edges(pairs, threshold=0.5, max_edges=5)
    # below the cap everything still works
    out = unique_mapping_clustering(pairs, threshold=0.5)
    assert out.count() == 10


def test_driver_clusterer_cap_counts_post_filter():
    from pyjedai_ray.stages.clustering import _sorted_edges

    # 10 edges but only 3 above threshold: pre-filter keeps us under the cap
    pairs = _wpairs([(i, i + 100, 0.9 if i < 3 else 0.1) for i in range(10)])
    edges = _sorted_edges(pairs, threshold=0.5, max_edges=5)
    assert len(edges) == 3
