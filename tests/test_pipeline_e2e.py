"""End-to-end: Ray minhash dedup pipeline vs the in-memory reference oracle
at the identical shingle/signature config (north-rule recall >= 0.99 — here
exact equality by construction)."""

import pytest

from pyjedai_ray.config import DedupConfig

pytestmark = pytest.mark.usefixtures("ray_session")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def webpages(request):
    request.getfixturevalue("ray_session")
    from pyjedai_ray.sources.webpages import synthesize_webpages

    return synthesize_webpages(SF_DIR).materialize()


def test_text_extraction_invariant(webpages):
    """input_hint: byte-identical extracted text per url."""
    from pyjedai_ray.functions.text import extract_text

    for row in webpages.take(50):
        assert extract_text(row["html"]) == row["text"]


def test_minhash_pipeline_matches_oracle(webpages):
    from pyjedai_ray.oracle import oracle_minhash_clusters, oracle_pair_recall
    from pyjedai_ray.stages.dedup import minhash_dedup

    cfg = DedupConfig()
    res = minhash_dedup(webpages, cfg, cluster_mode="driver", num_partitions=4)
    predicted = {
        r["doc_id"]: r["cluster_id"] for r in res["clusters"].take_all()
    }

    docs = [
        (r["doc_id"], r["text"])
        for r in webpages.select_columns(["doc_id", "text"]).take_all()
    ]
    oracle = oracle_minhash_clusters(docs, cfg)
    # drop singleton components for comparison (Ray side only emits clustered)
    oracle_multi = {d: c for d, c in oracle.items()}

    recall, tp, total = oracle_pair_recall(oracle_multi, predicted)
    assert total > 0, "oracle found no duplicate pairs — fixture broken"
    assert recall >= 0.99, f"recall {recall} ({tp}/{total})"
    precision, _, _ = oracle_pair_recall(predicted, oracle_multi)
    assert precision >= 0.99, f"pipeline emitted pairs the oracle did not: {precision}"


def test_exact_dedup_finds_injected_exact_dups(webpages):
    from pyjedai_ray.stages.dedup import exact_dedup

    clusters = exact_dedup(webpages, num_partitions=4).take_all()
    multi = {}
    for r in clusters:
        multi.setdefault(r["cluster_id"], []).append(r["doc_id"])
    from pyjedai_ray.sources.webpages import DUP_ID_OFFSET

    dup_groups = [v for v in multi.values() if len(v) > 1]
    # every 20th base doc (25 of 500) has an injected exact duplicate; low-rate
    # near-dup mutations may add more zero-substitution groups
    assert len(dup_groups) >= 25
    pairs = {tuple(sorted(v)[:2]) for v in dup_groups}
    for base in range(0, 500, 20):
        assert (base, base + DUP_ID_OFFSET) in pairs
    for grp in dup_groups:
        assert min(grp) < DUP_ID_OFFSET  # representative is the base doc


def test_simhash_pipeline_runs(webpages):
    from pyjedai_ray.stages.dedup import simhash_dedup

    res = simhash_dedup(webpages, DedupConfig(), cluster_mode="driver", num_partitions=4)
    clusters = res["clusters"].take_all()
    # exact duplicates have identical simhash -> must be clustered
    assert len(clusters) >= 50


def test_simhash_pipeline_matches_oracle(webpages):
    """SimHash distributed pipeline vs in-memory same-semantics oracle —
    exact cluster-pair equality at the pinned seed/band config (the
    north-rule recall criterion for the SimHash path)."""
    from pyjedai_ray.oracle import oracle_pair_recall, oracle_simhash_clusters
    from pyjedai_ray.stages.dedup import simhash_dedup

    cfg = DedupConfig()
    res = simhash_dedup(webpages, cfg, cluster_mode="driver", num_partitions=4)
    predicted = {r["doc_id"]: r["cluster_id"] for r in res["clusters"].take_all()}

    docs = [
        (r["doc_id"], r["text"])
        for r in webpages.select_columns(["doc_id", "text"]).take_all()
    ]
    oracle = oracle_simhash_clusters(docs, cfg)

    recall, tp, total = oracle_pair_recall(oracle, predicted)
    assert total > 0, "oracle found no simhash dup pairs — fixture broken"
    assert recall >= 0.99, f"recall {recall} ({tp}/{total})"
    precision, _, _ = oracle_pair_recall(predicted, oracle)
    assert precision >= 0.99, f"pipeline emitted pairs the oracle did not: {precision}"
