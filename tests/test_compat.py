"""Reference-API facade (pyjedai_ray.compat): port-by-import surface.

Mirrors the reference's chained smoke test style
(/root/reference/tests/test_clustering.py:37-56: blocking -> cleaning ->
comparison cleaning -> matching -> clustering) on small deterministic frames,
but with exact assertions where the small input makes the answer obvious.
"""

import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _ccer_data():
    from pyjedai_ray.compat import Data

    d1 = pd.DataFrame(
        {
            "id": ["a1", "a2", "a3"],
            "name": ["green tea pot", "red wine glass", "blue coffee mug"],
            "brand": ["acme", "acme", "zenith"],
        }
    )
    d2 = pd.DataFrame(
        {
            "id": ["b1", "b2", "b3"],
            "name": ["green tea pot", "red wine glass", "yellow soup bowl"],
            "brand": ["acme", "acme", "zenith"],
        }
    )
    return Data(d1, "id", ["name", "brand"], dataset_2=d2, id_column_name_2="id")


def test_data_profile_and_id_space():
    data = _ccer_data()
    assert data.num_entities == 6
    assert data.dataset_limit == 3
    rows = {r["doc_id"]: r["text"] for r in data.docs.take_all()}
    assert rows[0] == "green tea pot acme"
    assert rows[3] == "green tea pot acme"  # d2 offset by dataset_limit
    assert data.to_original_ids(pd.Series([0, 3, 5])).tolist() == ["a1", "b1", "b3"]


def test_reference_chain_ccer():
    # NOTE: BlockPurging is omitted — with < 3 distinct cardinality levels
    # the reference's threshold loop never breaks and max_comparisons stays 0
    # (block_cleaning.py:189-198), purging EVERY block; our implementation
    # reproduces that degenerate semantic exactly (see test below).
    from pyjedai_ray.compat import (
        BlockFiltering,
        Data,
        EntityMatching,
        StandardBlocking,
        UniqueMappingClustering,
        WeightedEdgePruning,
    )

    data = _ccer_data()
    blocks = StandardBlocking().build_blocks(data)
    blocks = BlockFiltering(ratio=0.9).process(blocks, data)
    pairs = WeightedEdgePruning(weighting_scheme="CBS").process(blocks, data)
    g = EntityMatching(metric="jaccard", similarity_threshold=0.1).predict(pairs, data)
    clusters = UniqueMappingClustering().process(g, data, similarity_threshold=0.1)
    got = {(r["id1"], r["id2"]) for r in clusters.take_all()}
    # exact duplicates across sides must match 0-3 and 1-4
    assert {(0, 3), (1, 4)} <= got


def test_block_purging_degenerate_purges_all():
    from pyjedai_ray.compat import BlockPurging, Data, StandardBlocking

    data = _ccer_data()  # only 2 cardinality levels -> reference purges all
    blocks = StandardBlocking().build_blocks(data)
    assert BlockPurging().process(blocks, data).count() == 0


def test_join_and_export_original_ids():
    from pyjedai_ray.compat import Data, EJoin

    d1 = pd.DataFrame({"id": ["x1", "x2"], "t": ["alpha beta gamma", "delta epsilon zeta"]})
    data = Data(d1, "id", ["t"])
    j = EJoin(similarity_threshold=0.9, tokenization="standard")
    pairs = j.fit(data)
    assert pairs.count() == 0  # nothing similar
    d2 = pd.DataFrame({"id": ["y1", "y2"], "t": ["alpha beta gamma", "alpha beta gamma"]})
    data2 = Data(d2, "id", ["t"])
    pairs2 = EJoin(similarity_threshold=0.9, tokenization="standard").fit(data2)
    df = j.export_to_df(pairs2, data2)
    assert df.values.tolist() == [["y1", "y2"]]


def test_clusterer_facade_and_export():
    import pyarrow as pa
    import ray.data

    from pyjedai_ray.compat import Data, MarkovClustering

    data = Data(
        pd.DataFrame({"id": [f"e{i}" for i in range(4)], "t": ["w"] * 4}), "id", ["t"]
    )
    g = ray.data.from_arrow(
        pa.table(
            {
                "id1": pa.array([0, 2], pa.int64()),
                "id2": pa.array([1, 3], pa.int64()),
                "weight": pa.array([0.9, 0.9], pa.float64()),
            }
        )
    )
    clusters = MarkovClustering().process(g, data)
    df = MarkovClustering().export_to_df(clusters, data)
    assert sorted(map(tuple, df.values.tolist())) == [("e0", "e1"), ("e2", "e3")]


def test_blocking_family_defaults():
    from pyjedai_ray.compat import (
        ExtendedQGramsBlocking,
        ExtendedSuffixArraysBlocking,
        QGramsBlocking,
        SuffixArraysBlocking,
    )

    data = _ccer_data()
    for cls in (
        QGramsBlocking,
        SuffixArraysBlocking,
        ExtendedSuffixArraysBlocking,
        ExtendedQGramsBlocking,
    ):
        blocks = cls().build_blocks(data)
        assert blocks.count() > 0, cls.__name__


def test_meta_blocking_family_runs():
    from pyjedai_ray.compat import (
        BLAST,
        CardinalityEdgePruning,
        CardinalityNodePruning,
        ComparisonPropagation,
        Data,
        ProgressiveCardinalityEdgePruning,
        ReciprocalWeightedNodePruning,
        StandardBlocking,
        WeightedNodePruning,
    )

    # NOTE: one cardinality- and one weight-rule representative suffice here —
    # every _MetaBlocking subclass shares the same facade plumbing and each
    # pruning rule's SEMANTICS are value-exact-proven by its oracle query
    # (wep_cbs/cnp_topk/rcnp_topk/wnp_cbs/rwnp_cbs/blast_cbs)
    _ = (CardinalityEdgePruning, WeightedNodePruning, ReciprocalWeightedNodePruning)
    data = _ccer_data()
    blocks = StandardBlocking().build_blocks(data)
    assert ComparisonPropagation().process(blocks, data).count() > 0
    assert CardinalityNodePruning().process(blocks, data).count() >= 0
    assert BLAST().process(blocks, data).count() >= 0
    assert ProgressiveCardinalityEdgePruning(budget=3).process(blocks, data).count() <= 3


def test_evaluation_report_pr_f1():
    from pyjedai_ray.compat import Data, EJoin, Evaluation

    d1 = pd.DataFrame(
        {
            "id": ["a1", "a2"],
            "t": ["alpha beta gamma delta", "epsilon zeta eta theta"],
        }
    )
    d2 = pd.DataFrame(
        {
            "id": ["b1", "b2"],
            "t": ["alpha beta gamma delta", "iota kappa lambda mu"],
        }
    )
    gt = pd.DataFrame({"d1": ["a1"], "d2": ["b1"]})
    data = Data(d1, "id", ["t"], dataset_2=d2, id_column_name_2="id", ground_truth=gt)
    pairs = EJoin(similarity_threshold=0.9, tokenization="standard").fit(data)
    rep = Evaluation(data).report(pairs)
    assert rep["true_positives"] == 1
    assert rep["recall"] == 1.0
    assert rep["precision"] == 1.0


def test_progressive_matcher_family():
    from pyjedai_ray.compat import (
        Data,
        EmbeddingsNNBPM,
        GlobalPSNM,
        GlobalTopPM,
        LocalTopPM,
        RandomPM,
        StandardBlocking,
        TopKJoinPM,
    )

    # one representative per distinct predict-plumbing shape (LocalTopPM and
    # RandomPM share GlobalTopPM's _ProgressiveMatcher base; their emission
    # semantics are oracle-proven at the stage level)
    _ = (LocalTopPM, RandomPM)
    data = _ccer_data()
    blocks = StandardBlocking().build_blocks(data)
    top = GlobalTopPM(budget=3).predict(blocks, data)
    assert top.count() <= 3
    assert GlobalPSNM(budget=4, window=1).predict(blocks, data).count() <= 4
    assert TopKJoinPM(K=2, budget=4).predict(data).count() <= 4
    assert EmbeddingsNNBPM(budget=4, n_clusters=2, dim=16).predict(data).count() <= 4


def test_blocking_based_workflow_presets():
    from pyjedai_ray.compat import Data, best_blocking_workflow_ccer

    d1 = pd.DataFrame(
        {
            "id": ["a1", "a2", "a3"],
            "name": ["green tea pot", "red wine glass", "blue coffee mug"],
        }
    )
    d2 = pd.DataFrame(
        {
            "id": ["b1", "b2", "b3"],
            "name": ["green tea pot", "red wine glass", "yellow soup bowl"],
        }
    )
    gt = pd.DataFrame({"d1": ["a1", "a2"], "d2": ["b1", "b2"]})
    data = Data(d1, "id", ["name"], dataset_2=d2, id_column_name_2="id", ground_truth=gt)
    wf = best_blocking_workflow_ccer()
    clusters = wf.run(data)
    got = {(r["id1"], r["id2"]) for r in clusters.take_all()}
    assert {(0, 3), (1, 4)} <= got
    rep = wf.results["evaluation"]
    assert rep["recall"] == 1.0


def test_meta_blocking_factory():
    import warnings

    from pyjedai_ray.compat import (
        BLAST,
        ComparisonPropagation,
        GlobalPSNM,
        get_meta_blocking_approach,
    )

    assert isinstance(get_meta_blocking_approach("BLAST", "X2"), BLAST)
    assert isinstance(get_meta_blocking_approach("GPSN", "ACF", budget=5), GlobalPSNM)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        obj = get_meta_blocking_approach("NOPE", "CBS")
    assert isinstance(obj, ComparisonPropagation)
    assert w


def test_driver_export_guard():
    """The facade's DataFrame exports are guarded: a result larger than the
    driver-export cap raises with guidance instead of OOMing the driver."""
    import pyarrow as pa
    import ray.data

    from pyjedai_ray.compat import _guarded_to_pandas

    small = ray.data.from_arrow(
        pa.table({"id1": pa.array([0, 1], pa.int64()), "id2": pa.array([1, 2], pa.int64())})
    )
    df = _guarded_to_pandas(small, "test")
    assert len(df) == 2
    with pytest.raises(ValueError, match="driver-side export cap"):
        _guarded_to_pandas(small, "test", limit=1)
