"""TF-IDF / vector / LLM-stub verification + evaluation joins."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _pairs(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "id1": pa.array([r[0] for r in rows], pa.int64()),
                "id2": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def test_evaluate_pairs():
    from pyjedai_ray.stages.evaluate import evaluate_pairs

    pred = _pairs([(1, 2), (3, 4), (5, 6)])
    gt = _pairs([(1, 2), (4, 3), (7, 8)])  # (4,3) canonicalizes to (3,4)
    m = evaluate_pairs(pred, gt, num_partitions=4)
    assert m["true_positives"] == 2
    assert abs(m["precision"] - 2 / 3) < 1e-12
    assert abs(m["recall"] - 2 / 3) < 1e-12


def test_clusters_to_pairs():
    import ray.data

    from pyjedai_ray.stages.evaluate import clusters_to_pairs

    cl = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 9], pa.int64()),
                "cluster_id": pa.array([1, 1, 1, 9], pa.int64()),
            }
        )
    )
    got = sorted((r["id1"], r["id2"]) for r in clusters_to_pairs(cl, 4).take_all())
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_tfidf_verification_orders_by_rarity():
    import ray.data

    from pyjedai_ray.stages.matching import verify_pairs_tfidf

    # "rare" appears in 2 docs, "common" in all 4 -> the rare-sharing pair
    # must score higher than the common-sharing pair
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    "common rare alpha",
                    "common rare beta",
                    "common gamma delta",
                    "common epsilon zeta",
                ],
            }
        )
    )
    pairs = _pairs([(1, 2), (3, 4)])
    got = {(r["id1"], r["id2"]): r["weight"] for r in verify_pairs_tfidf(pairs, docs, num_partitions=4).take_all()}
    assert got[(1, 2)] > got[(3, 4)]


def test_vector_verification():
    import ray.data

    from pyjedai_ray.stages.matching import verify_pairs_vectors

    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float32())
                ),
            }
        )
    )
    pairs = _pairs([(1, 2), (1, 3)])
    got = {
        (r["id1"], r["id2"]): r["weight"]
        for r in verify_pairs_vectors(pairs, emb, threshold=-1.0, num_partitions=4).take_all()
    }
    assert abs(got[(1, 2)] - 1.0) < 1e-9
    assert abs(got[(1, 3)] - 0.0) < 1e-9


def test_llm_stub_deterministic():
    import ray.data

    from pyjedai_ray.stages.matching import llm_verify_stub

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["hello world", "hello there"],
            }
        )
    )
    pairs = _pairs([(1, 2)])
    a = llm_verify_stub(pairs, docs, num_partitions=2).take_all()
    b = llm_verify_stub(pairs, docs, num_partitions=2).take_all()
    assert a == b and 0.0 <= a[0]["weight"] < 1.0


def test_tf_and_boolean_vectorizers_hand_computed():
    import math

    import pyarrow as pa
    import ray.data

    from pyjedai_ray.stages.matching import verify_pairs_tfidf

    # doc0: a a b ; doc1: a b b  -> tf vectors (2,1) / (1,2); boolean (1,1)/(1,1)
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a a b", "a b b"], pa.string()),
            }
        )
    )
    pairs = ray.data.from_arrow(
        pa.table({"id1": pa.array([0], pa.int64()), "id2": pa.array([1], pa.int64())})
    )
    tf = verify_pairs_tfidf(pairs, docs, vectorizer="tf", num_partitions=2).take_all()
    assert len(tf) == 1
    # cos((2,1),(1,2)) = (2+2)/5 = 0.8
    assert math.isclose(tf[0]["weight"], 0.8, abs_tol=1e-12)
    bo = verify_pairs_tfidf(pairs, docs, vectorizer="boolean", num_partitions=2).take_all()
    assert math.isclose(bo[0]["weight"], 1.0, abs_tol=1e-12)


def test_verify_pairs_mode_parity_with_prune():
    """auto (pair-id pruned broadcast), join and broadcast must agree exactly.

    The auto path semi-filters the signature side to the pairs' distinct ids
    before broadcasting (matching.verify_pairs docstring) — this pins that
    the prune changes the cost, never the values. Includes sig rows that NO
    pair references (the rows the prune exists to drop)."""
    import ray.data

    from pyjedai_ray import DedupConfig
    from pyjedai_ray.stages import minhash
    from pyjedai_ray.stages.matching import verify_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox leaps over the lazy dog again and again",
        "completely unrelated content about distributed shuffle engines",
        "another document no candidate pair ever references at all",
        "yet more filler text that only exists to be pruned away",
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    sigs = minhash.sign(docs, DedupConfig()).materialize()
    pairs = _pairs([(0, 1), (0, 2), (1, 2), (0, 3)])

    def rows(mode):
        out = verify_pairs(pairs, sigs, threshold=0.0, num_partitions=4, mode=mode)
        return sorted(
            (r["id1"], r["id2"], round(r["weight"], 12), r["hamming"])
            for r in out.take_all()
        )

    got = {m: rows(m) for m in ("auto", "join", "broadcast")}
    assert got["auto"] == got["join"] == got["broadcast"]
    assert len(got["auto"]) == 4
    exact = [r for r in got["auto"] if r[0] == 0 and r[1] == 1]
    assert exact[0][2] == 1.0 and exact[0][3] == 0
