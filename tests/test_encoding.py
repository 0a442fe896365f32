"""Encoder actor pool + distributed k-means + end-to-end vector blocking."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_encoder_deterministic_unit_norm(ray_session):
    from pyjedai_ray.stages.encoding import encode_texts

    docs = _docs([(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "")])
    a = {r["doc_id"]: r["embedding"] for r in encode_texts(docs, dim=16).take_all()}
    b = {r["doc_id"]: r["embedding"] for r in encode_texts(docs, dim=16).take_all()}
    assert set(a) == {1, 2, 3}
    for k in a:
        assert np.allclose(a[k], b[k])
    for k in (1, 2):
        assert abs(np.linalg.norm(a[k]) - 1.0) < 1e-5
    assert np.allclose(a[3], 0.0)  # empty text -> zero vector


def test_kmeans_separates_clusters(ray_session):
    import ray.data

    from pyjedai_ray.stages.encoding import assign_buckets, kmeans_fit

    rng = np.random.default_rng(7)
    dim = 8
    c0 = np.zeros(dim); c0[0] = 1.0
    c1 = np.zeros(dim); c1[4] = 1.0
    vecs, labels = [], []
    for i in range(60):
        base = c0 if i % 2 == 0 else c1
        vecs.append((base + rng.normal(0, 0.05, dim)).astype(np.float32))
        labels.append(i % 2)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(60), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    cents = kmeans_fit(ds, n_clusters=2, id_col="vec_id", sample_size=60)
    assert cents.shape == (2, dim)
    out = assign_buckets(ds, cents).take_all()
    by_label = {0: set(), 1: set()}
    for r, lab in zip(sorted(out, key=lambda r: r["vec_id"]), labels):
        by_label[lab].add(r["bucket"])
    # each true cluster maps to exactly one learned cell, and they differ
    assert len(by_label[0]) == 1 and len(by_label[1]) == 1
    assert by_label[0] != by_label[1]


def test_embeddings_nn_blocking_finds_duplicates(ray_session):
    from pyjedai_ray.stages.encoding import embeddings_nn_blocking

    dup = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(
        [
            (1, dup),
            (2, dup),
            (3, "completely different subject matter about astronomy stars"),
            (4, "completely different subject matter about astronomy planets"),
        ]
    )
    out = embeddings_nn_blocking(docs, k=2, dim=32, n_clusters=2)
    rows = out.take_all()
    top = {
        r["query_id"]: (r["neighbor_id"], r["score"])
        for r in rows
        if r["rank"] == 1
    }
    assert top[1][0] == 2 and top[2][0] == 1
    assert top[1][1] > 0.999


def test_embeddings_nn_blocking_probe_subset(ray_session):
    from pyjedai_ray.stages.encoding import embeddings_nn_blocking

    docs = _docs([(i, f"shared prefix words document number {i}") for i in range(8)])
    out = embeddings_nn_blocking(docs, query_ids=np.array([0, 1]), k=3, dim=32, n_clusters=2)
    qids = {r["query_id"] for r in out.take_all()}
    assert qids <= {0, 1}


def test_embeddings_nn_blocking_hot_cell_raises(ray_session):
    import pytest

    from pyjedai_ray.stages.encoding import embeddings_nn_blocking

    # one k-means cell (n_clusters=1) holding all 8 docs blows the cap
    docs = _docs([(i, f"shared prefix words document number {i}") for i in range(8)])
    with pytest.raises(Exception, match="max_bucket"):
        embeddings_nn_blocking(
            docs, k=2, dim=32, n_clusters=1, max_bucket=4
        ).materialize()


def test_encoder_model_config_plumbing(ray_session):
    import pytest

    from pyjedai_ray.stages.encoding import TextEncoder, encode_texts

    # the real-model path raises with the configured checkpoint name (no
    # torch in this container) — the knob is threaded, not swallowed
    with pytest.raises(NotImplementedError, match="my-model"):
        TextEncoder(use_stub=False, model="my-model")
    # stub path threads model/num_gpus through map_batches without error
    docs = _docs([(i, f"document {i}") for i in range(4)])
    out = encode_texts(
        docs, dim=16, model="stub-encoder", num_gpus=0.0, concurrency=2
    )
    assert out.count() == 4


def test_embeddings_nn_blocking_split_mode_bounds_cells(ray_session):
    from pyjedai_ray.stages.encoding import embeddings_nn_blocking

    docs = _docs([(i, f"shared prefix words document number {i}") for i in range(8)])
    out = embeddings_nn_blocking(
        docs, k=2, dim=32, n_clusters=1, max_bucket=4, oversize_mode="split"
    ).materialize()
    # every doc still gets neighbors within its sub-cell; no O(n^2) blowup
    assert out.count() > 0
    rows = out.take_all()
    for r in rows:
        # sub-cells are doc_id % n_sub groups: neighbors share parity (n=8,
        # max_bucket=4 -> 2 sub-cells)
        assert r["query_id"] % 2 == r["neighbor_id"] % 2


def test_multi_probe_recovers_boundary_neighbors(ray_session):
    """n_probe=2 must find at least every neighbor pair n_probe=1 finds
    (multi-probe only ADDS cross-cell candidates), with identical scores on
    the shared pairs."""
    from pyjedai_ray.stages.encoding import embeddings_nn_blocking

    docs = _docs(
        [(i, f"document number {i} with some shared words plus token{i % 5}") for i in range(24)]
    )
    base = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in embeddings_nn_blocking(docs, k=3, dim=16, n_clusters=4).take_all()
    }
    probed = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in embeddings_nn_blocking(
            docs, k=3, dim=16, n_clusters=4, n_probe=2
        ).take_all()
    }
    # every query keeps a full neighborhood and scores agree on shared pairs
    assert set(q for q, _ in probed) >= set(q for q, _ in base)
    for pair, score in probed.items():
        if pair in base:
            assert abs(base[pair] - score) < 1e-6
    # multi-probe neighborhoods are at least as good: per-query min kept
    # score can only rise (never worse than single-probe)
    import collections

    worst_b = collections.defaultdict(lambda: float("inf"))
    worst_p = collections.defaultdict(lambda: float("inf"))
    cnt_b = collections.Counter()
    cnt_p = collections.Counter()
    for (q, _), s in base.items():
        worst_b[q] = min(worst_b[q], s)
        cnt_b[q] += 1
    for (q, _), s in probed.items():
        worst_p[q] = min(worst_p[q], s)
        cnt_p[q] += 1
    for q in worst_b:
        if cnt_p[q] == cnt_b[q]:
            assert worst_p[q] >= worst_b[q] - 1e-9


def test_lsh_neardup_recovers_exact_duplicates(ray_session):
    import pyarrow as pa
    import ray.data

    from pyjedai_ray.stages.ann import lsh_neardup

    rng = np.random.default_rng(7)
    base = rng.standard_normal((10, 16)).astype(np.float32)
    # vecs 10..14 duplicate vecs 0..4 exactly
    vecs = np.vstack([base, base[:5]])
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(15)), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            }
        )
    )
    out = lsh_neardup(emb, dim=16, threshold=0.99, planes=32, bands=8, num_partitions=4)
    got = {(r["id1"], r["id2"]) for r in out.take_all()}
    # identical vectors collide in every band -> all 5 dup pairs recovered
    assert {(i, i + 10) for i in range(5)} <= got
    # exact verification: no sub-threshold pair survives
    for r in out.take_all():
        assert r["weight"] >= 0.99


def test_lsh_plane_edges_band_shape(ray_session):
    import pyarrow as pa
    import ray.data

    from pyjedai_ray.stages.ann import lsh_plane_edges

    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array(
                    np.eye(2, 8, dtype=np.float32).tolist(), pa.list_(pa.float32())
                ),
            }
        )
    )
    rows = lsh_plane_edges(emb, dim=8, planes=16, bands=4).take_all()
    assert len(rows) == 2 * 4  # one row per vector per band
    # band namespace bits keep bands from colliding across indices
    bands_seen = {(r["doc_id"], (r["key"] >> 56) & 0xFF) for r in rows}
    assert len(bands_seen) == 8
