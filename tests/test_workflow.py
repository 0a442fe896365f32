"""Declarative workflow runner + Clean-Clean ER linkage."""

import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _products(request):
    import ray.data

    # two product catalogs with obvious matches (Abt-Buy style, FIXTURES.md F3)
    d1 = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(4)), pa.int64()),
                "text": [
                    "apple iphone 12 smartphone black 64gb",
                    "samsung galaxy s21 phone silver",
                    "sony wh1000xm4 wireless headphones",
                    "dell xps 13 laptop intel i7",
                ],
            }
        )
    )
    d2 = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(4)), pa.int64()),
                "text": [
                    "iphone 12 black smartphone 64gb apple",
                    "galaxy s21 silver phone by samsung",
                    "bose quietcomfort 45 headphones",
                    "hp spectre x360 laptop",
                ],
            }
        )
    )
    return d1, d2


def test_run_workflow_standard_chain(request):
    request.getfixturevalue("ray_session")
    import ray.data

    from pyjedai_ray.pipelines.workflow import run_workflow

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(6)), pa.int64()),
                "text": [
                    "red green blue yellow",
                    "red green blue yellow",
                    "red green blue purple",
                    "cat dog mouse bird",
                    "cat dog mouse bird",
                    "completely unrelated words here",
                ],
            }
        )
    )
    cfg = {
        "blocking": {"keyer": "standard"},
        "comparison": {"scheme": "CBS", "pruning": "none"},
        "matching": {"metric": "jaccard", "tokenizer": "word", "threshold": 0.7},
        "clustering": {"method": "connected_components"},
    }
    out = run_workflow(docs, cfg, num_partitions=4)
    clusters = {}
    for r in out["clusters"].take_all():
        clusters.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    groups = sorted(frozenset(v) for v in clusters.values() if len(v) > 1)
    # 0-1 identical (J=1); 0-2 share 3 of 5 distinct tokens (J=0.6 < 0.7)
    assert frozenset({0, 1}) in groups
    assert frozenset({3, 4}) in groups


def test_link_datasets_unique_mapping(request):
    request.getfixturevalue("ray_session")
    from pyjedai_ray.pipelines.workflow import link_datasets

    d1, d2 = _products(request)
    out = link_datasets(d1, d2, num_partitions=4)
    n1 = out["dataset_limit"]
    matches = {(r["id1"], r["id2"] - n1) for r in out["clusters"].take_all()}
    assert (0, 0) in matches  # iphone matches iphone
    assert (1, 1) in matches  # galaxy matches galaxy
    # all matches are cross-dataset 1-1
    assert len({a for a, _ in matches}) == len(matches)
    assert len({b for _, b in matches}) == len(matches)


def test_psn_pairs(request):
    request.getfixturevalue("ray_session")
    import ray.data

    from pyjedai_ray.stages.blocking import explode_keys
    from pyjedai_ray.stages.meta_blocking import sorted_neighborhood_pairs

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(4)), pa.int64()),
                "text": ["alpha beta", "alpha gamma", "beta delta", "zeta eta"],
            }
        )
    )
    edges = explode_keys(docs, keyer="standard").materialize()
    pairs = sorted_neighborhood_pairs(edges, window=1, max_window=2).take_all()
    got = {(r["id1"], r["id2"]) for r in pairs}
    # docs 0,1 share key "alpha"; 0,2 share "beta" -> adjacent in sorted order
    assert (0, 1) in got and (0, 2) in got


def test_run_workflow_cut_clustering_dispatch(request):
    request.getfixturevalue("ray_session")
    import ray.data

    from pyjedai_ray.pipelines.workflow import run_workflow

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(6)), pa.int64()),
                "text": [
                    "red green blue yellow",
                    "red green blue yellow",
                    "red green blue purple",
                    "cat dog mouse bird",
                    "cat dog mouse bird",
                    "completely unrelated words here",
                ],
            }
        )
    )
    cfg = {
        "blocking": {"keyer": "standard"},
        "comparison": {"scheme": "CBS", "pruning": "none"},
        "matching": {"metric": "jaccard", "tokenizer": "word", "threshold": 0.7},
        "clustering": {"method": "cut", "threshold": 0.5, "alpha": 0.2},
    }
    out = run_workflow(docs, cfg, num_partitions=4)
    clusters = {}
    for r in out["clusters"].take_all():
        clusters.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    groups = sorted(frozenset(v) for v in clusters.values() if len(v) > 1)
    assert frozenset({0, 1}) in groups
    assert frozenset({3, 4}) in groups
