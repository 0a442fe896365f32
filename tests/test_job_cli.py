"""ray-job-submit driver (pyjedai_ray.job): CLI arg plumbing + end-to-end
run + resume, inside the session-scoped Ray fixture (the module's init guard
skips ray.init when a session exists — exactly the job-runtime shape)."""

import json

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_job_cli_end_to_end_and_resume(tmp_path, capsys, ray_session):
    from pyjedai_ray.job import main
    from pyjedai_ray.pipelines import checkpoint as ckpt
    from pyjedai_ray.sources.webpages import synthesize_webpages

    inp = str(tmp_path / "webpages")
    out = str(tmp_path / "dedup")
    synthesize_webpages("/root/testdata/sf0.001").drop_columns(
        ["doc_id", "gt_cluster"]
    ).write_parquet(inp)

    summary = main(["--input", inp, "--out", out, "--num-partitions", "4",
                    "--cluster-mode", "driver", "--verify-mode", "broadcast"])
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    assert json.loads(line) == summary
    assert summary["n_docs"] > 0
    assert summary["n_clustered"] > 0
    assert "lsh_band_cap" in summary["drop_metrics"] or summary["drop_metrics"] == {}

    # the candidates manifest carries the counted drops
    m = ckpt.read_manifest(f"{out}/candidates")
    assert "drop_metrics" in m["metrics"]

    # resubmission resumes: same lineage, same counts
    again = main(["--input", inp, "--out", out, "--num-partitions", "4",
                  "--cluster-mode", "driver", "--verify-mode", "broadcast"])
    assert again["lineage"] == summary["lineage"]
    assert again["n_clustered"] == summary["n_clustered"]


def test_job_cli_tiered_cascade(tmp_path, capsys, ray_session):
    from pyjedai_ray.job import main

    inp = str(tmp_path / "webpages")
    out = str(tmp_path / "tiered")
    synthesize_webpages = __import__(
        "pyjedai_ray.sources.webpages", fromlist=["synthesize_webpages"]
    ).synthesize_webpages
    synthesize_webpages("/root/testdata/sf0.001").drop_columns(
        ["doc_id", "gt_cluster"]
    ).write_parquet(inp)

    summary = main([
        "--input", inp, "--out", out, "--num-partitions", "4",
        "--tiers", "url,exact,lines,minhash",
        "--cluster-mode", "driver", "--verify-mode", "broadcast",
    ])
    assert summary["metric"] == "tiered_dedup_job"
    s = summary["tier_stats"]
    assert list(s) == ["url", "exact", "lines", "minhash"]
    # the synthesized corpus carries exact + near dups: both tiers must fire
    assert s["exact"]["removed"] > 0 and s["minhash"]["removed"] > 0
    assert summary["n_docs"] == s["minhash"]["kept"]
    assert summary["n_clustered"] > 0

    # resubmission resumes every tier from its manifest
    again = main([
        "--input", inp, "--out", out, "--num-partitions", "4",
        "--tiers", "url,exact,lines,minhash",
        "--cluster-mode", "driver", "--verify-mode", "broadcast",
    ])
    assert again["n_docs"] == summary["n_docs"]
    assert all(v["resumed"] for v in again["tier_stats"].values())


def test_job_cli_config_knobs(tmp_path, ray_session):
    from pyjedai_ray.job import build_parser

    a = build_parser().parse_args(
        ["--input", "x", "--out", "y", "--bands", "8", "--rows", "16", "--lang", "en"]
    )
    assert (a.bands, a.rows, a.lang) == (8, 16, "en")


def test_job_cli_empty_tiers_rejected(tmp_path, ray_session):
    """A --tiers value that parses to zero tiers must error, not silently
    emit an un-deduplicated corpus as a completed cascade."""
    import ray.data

    from pyjedai_ray.job import main

    inp = str(tmp_path / "in")
    ray.data.range(1).write_parquet(inp)  # never reached past the guard
    with pytest.raises(SystemExit, match="zero tiers"):
        main(["--input", inp, "--out", str(tmp_path / "out"), "--tiers", " , "])


def test_job_cli_removals_out(tmp_path, ray_session):
    """--removals-out writes the RESOLVED provenance (doc -> FINAL surviving
    representative): every removed doc appears once, no representative points
    at another removed doc, and n_removed reconciles with tier_stats."""
    import ray.data

    from pyjedai_ray.job import main
    from pyjedai_ray.sources.webpages import synthesize_webpages

    inp = str(tmp_path / "webpages")
    out = str(tmp_path / "tiered")
    rem_out = str(tmp_path / "removals")
    synthesize_webpages("/root/testdata/sf0.001").drop_columns(
        ["doc_id", "gt_cluster"]
    ).write_parquet(inp)

    summary = main([
        "--input", inp, "--out", out, "--num-partitions", "4",
        "--tiers", "url,exact,lines,minhash",
        "--cluster-mode", "driver", "--verify-mode", "broadcast",
        "--removals-out", rem_out,
    ])
    total_removed = sum(v["removed"] for v in summary["tier_stats"].values())
    assert summary["n_removed"] == total_removed > 0
    assert summary["removals_out"] == rem_out

    resolved = ray.data.read_parquet(rem_out)
    rows = resolved.take_all()
    assert len(rows) == total_removed
    assert len({r["doc_id"] for r in rows}) == total_removed  # once each
    survivors = {
        r["doc_id"]
        for r in ray.data.read_parquet(f"{out}/tier_minhash").take_all()
    }
    for r in rows:
        assert r["doc_id"] not in survivors
        if r["cluster_id"] is not None:
            assert r["cluster_id"] in survivors, r


def test_job_cli_eval_set_decontamination(tmp_path, ray_session):
    """--eval-set runs the post-dedup decontamination pass: overlapping docs
    are dropped from <out>/decontaminated, counts land in the summary, and
    the contaminated drops surface under decon_* drop metrics."""
    import ray.data

    from pyjedai_ray.job import main
    from pyjedai_ray.pipelines import checkpoint as ckpt
    from pyjedai_ray.sources.webpages import synthesize_webpages

    inp = str(tmp_path / "webpages")
    out = str(tmp_path / "dedup")
    ev = str(tmp_path / "evalset")
    wp = synthesize_webpages("/root/testdata/sf0.001").drop_columns(
        ["doc_id", "gt_cluster"]
    )
    wp.write_parquet(inp)
    # eval set = every 17th page's text -> its exact copies (and itself)
    # n-gram-collide with the surviving corpus by construction
    wp.limit(30).select_columns(["text"]).write_parquet(ev)

    summary = main([
        "--input", inp, "--out", out, "--num-partitions", "4",
        "--tiers", "url,exact,lines,minhash",
        "--cluster-mode", "driver", "--verify-mode", "broadcast",
        "--eval-set", ev,
    ])
    assert summary["eval_set"] == ev
    assert summary["decon_mode"] == "ngram"
    assert summary["n_decontaminated"] > 0
    assert summary["n_docs_final"] == summary["n_docs"] - summary["n_decontaminated"]
    dm = summary["drop_metrics"]
    assert dm.get("decon_contaminated_docs", {}).get("dropped_comparisons") == (
        summary["n_decontaminated"]
    )
    survivors = ray.data.read_parquet(f"{out}/decontaminated")
    assert survivors.count() == summary["n_docs_final"]
    m = ckpt.read_manifest(f"{out}/decontaminated")
    assert m["row_count"] == summary["n_docs_final"]
