"""Flagship checkpointed pipeline: resume semantics + recall on injected dups."""

import collections

import pytest

from pyjedai_ray.config import DedupConfig

pytestmark = pytest.mark.usefixtures("ray_session")

SF_DIR = "/root/testdata/sf0.001"


def test_webdedup_checkpoint_resume(tmp_path, request):
    request.getfixturevalue("ray_session")
    from pyjedai_ray.pipelines.webdedup import run_webdedup
    from pyjedai_ray.sources.webpages import synthesize_webpages

    wp = synthesize_webpages(SF_DIR).materialize()
    inp = wp.drop_columns(["doc_id", "gt_cluster"])
    cfg = DedupConfig()

    out_dir = str(tmp_path / "run1")
    res1 = run_webdedup(inp, cfg, out_dir=out_dir, num_partitions=4)
    clusters1 = sorted(
        (r["doc_id"], r["cluster_id"]) for r in res1["clusters"].take_all()
    )
    assert clusters1, "no clusters found"

    # resume: all stage manifests validate -> instant reload, same results
    res2 = run_webdedup(inp, cfg, out_dir=out_dir, num_partitions=4)
    clusters2 = sorted(
        (r["doc_id"], r["cluster_id"]) for r in res2["clusters"].take_all()
    )
    assert clusters1 == clusters2
    assert res1["lineage"] == res2["lineage"]

    # manifests carry per-partition lineage
    from pyjedai_ray.pipelines import checkpoint as ckpt

    for stage in ("docs", "sigs", "candidates", "verified", "clusters"):
        m = ckpt.read_manifest(f"{out_dir}/{stage}")
        assert m is not None and m["config_hash"] == cfg.config_hash()
        assert sum(p["rows"] for p in m["partitions"]) == m["row_count"]

    # config change invalidates the chain
    cfg2 = DedupConfig(verify_threshold=0.9)
    res3 = run_webdedup(inp, cfg2, out_dir=out_dir, num_partitions=4)
    assert res3["lineage"] != res1["lineage"]


def test_webdedup_recall_on_injected_dups(request):
    """Exact + high-similarity injected duplicates must be recovered."""
    request.getfixturevalue("ray_session")
    from pyjedai_ray.pipelines.webdedup import run_webdedup
    from pyjedai_ray.sources.webpages import DUP_ID_OFFSET, synthesize_webpages

    wp = synthesize_webpages(SF_DIR).materialize()
    res = run_webdedup(
        wp, DedupConfig(), id_col="doc_id", verify_mode="broadcast",
        cluster_mode="driver", num_partitions=4,
    )
    pred = {r["doc_id"]: r["cluster_id"] for r in res["clusters"].take_all()}

    gt = collections.defaultdict(set)
    for r in wp.select_columns(["doc_id", "gt_cluster"]).take_all():
        gt[r["gt_cluster"]].add(r["doc_id"])

    # pairs whose ACTUAL shingle Jaccard is >= 0.9 must cluster together
    # (banding miss probability at J=0.9 is ~1e-4 and the seed is pinned; a
    # short doc with one mutated token can fall far below the threshold, so
    # similarity is computed, not assumed from the injection mode)
    from pyjedai_ray.functions.tokenize import word_shingles

    texts = {
        r["doc_id"]: r["text"] for r in wp.select_columns(["doc_id", "text"]).take_all()
    }

    def jac(a: int, b: int) -> float:
        sa, sb = set(word_shingles(texts[a], 5)), set(word_shingles(texts[b], 5))
        if not sa and not sb:
            return 1.0
        return len(sa & sb) / len(sa | sb)

    missed = []
    n_checked = 0
    for base, members in gt.items():
        if len(members) < 2:
            continue
        a, b = sorted(members)[:2]
        if jac(a, b) >= 0.9:
            n_checked += 1
            if pred.get(a) != pred.get(b) or pred.get(a) is None:
                missed.append((a, b))
    assert n_checked >= 25, "fixture lost its high-similarity dup pairs"
    assert not missed, f"missed high-similarity dup pairs: {missed[:5]}"

    # sub-threshold distractors (mode 4) must NOT merge with their base
    wrong = []
    for base, members in gt.items():
        if base % 20 == 4 and base < DUP_ID_OFFSET:
            distractor = base + DUP_ID_OFFSET
            if pred.get(base) is not None and pred.get(base) == pred.get(distractor):
                wrong.append(base)
    assert not wrong, f"distractors merged: {wrong[:5]}"


def test_webdedup_lang_filter(ray_session):
    from pyjedai_ray import DedupConfig
    from pyjedai_ray.pipelines.webdedup import run_webdedup
    from pyjedai_ray.sources.webpages import synthesize_webpages

    wp = synthesize_webpages("/root/testdata/sf0.001").materialize()
    langs = {r["lang"] for r in wp.take_all()}
    assert len(langs) > 1  # the fixture mixes languages
    pick = sorted(langs)[0]
    res = run_webdedup(
        wp.drop_columns(["doc_id", "gt_cluster"]), DedupConfig(),
        cluster_mode="driver", num_partitions=4, lang_filter=pick,
    )
    docs = res["docs"]
    assert docs.count() > 0
    assert {r["lang"] for r in docs.take_all()} == {pick}


def test_lang_filter_rejects_expression_injection(ray_session):
    """lang_filter is interpolated into a filter expression: anything that
    isn't a plain language code (quotes especially) must raise, not break
    out of the string literal."""
    from pyjedai_ray.pipelines.webdedup import extract_and_project
    from pyjedai_ray.sources.webpages import synthesize_webpages

    wp = synthesize_webpages("/root/testdata/sf0.001")
    for bad in ("en' or lang != 'en", 'en"', "en;--", "e n"):
        with pytest.raises(ValueError, match="lang_filter"):
            extract_and_project(wp, lang_filter=bad)
    # plain codes (incl. region subtags) still pass
    assert extract_and_project(wp, use_html=False, lang_filter="pt-BR") is not None


def test_webdedup_docs_materialized_on_uncheckpointed_path(ray_session):
    """Without out_dir, ``docs`` must be a MaterializedDataset so HTML
    extraction runs once per pipeline, not once per consumer (VERDICT r4 #5:
    the signer AND the caller's cluster re-attach both consume docs)."""
    from ray.data.dataset import MaterializedDataset

    from pyjedai_ray.pipelines.webdedup import run_webdedup
    from pyjedai_ray.sources.webpages import synthesize_webpages

    wp = synthesize_webpages("/root/testdata/sf0.001").materialize()
    res = run_webdedup(
        wp.drop_columns(["doc_id", "gt_cluster"]),
        DedupConfig(),
        num_partitions=4,
        cluster_mode="driver",
        verify_mode="broadcast",
    )
    assert isinstance(res["docs"], MaterializedDataset)
    assert res["docs"].count() > 0
