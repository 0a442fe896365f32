"""Tiered dedup cascade (pipelines/tiered.py): closed-form per-tier counts,
semi_join_ids broadcast/join parity, checkpoint resume."""

import pyarrow as pa
import pytest

from pyjedai_ray.config import DedupConfig

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus():
    """25 docs with a known removal at every tier.

    - urls: docs pair up (i, i+1) on canonical ``site.com/a/{i//2}`` -> url
      tier keeps the even ids (12 of 24); doc 24's url is unique.
    - texts: even survivors pair up on equal text by k//2 -> exact tier keeps
      ids {0,4,8,12,16,20} plus doc 24's unique boilerplate-only text.
    - lines: ``shared head``/``shared tail`` survive only in doc 0; doc 24,
      made ONLY of those two lines, is emptied and dropped.
    - minhash: contents[4] (doc 16) and contents[5] (doc 20) differ by one
      trailing word -> near-dup pair, doc 20 removed.
    """
    def words(c):
        # per-class vocabulary: classes share no filler words, so only the
        # deliberately-crafted pair (contents[4], contents[5]) is a near-dup
        return " ".join(f"c{c}w{j}" for j in range(60))

    contents = [f"content {c} {words(c)}" for c in range(5)]
    contents.append(f"content 4 {words(4)} extra")  # near-dup of contents[4]
    rows = []
    for i in range(24):
        k = i // 2
        url = (
            f"https://www.site.com/a/{k}"
            if i % 2 == 0
            else f"http://site.com/a/{k}/?utm_source=z"
        )
        text = f"shared head\n{contents[k // 2]}\nshared tail"
        rows.append((i, url, text))
    rows.append((24, "https://unique.example.org/x", "shared head\nshared tail"))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "url": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _run(out_dir=None, resume=True):
    import ray.data

    from pyjedai_ray.pipelines.tiered import run_tiered_dedup

    docs = ray.data.from_arrow(_corpus())
    return run_tiered_dedup(
        docs,
        DedupConfig(),
        id_col="doc_id",
        num_partitions=4,
        verify_mode="broadcast",
        cluster_mode="driver",
        out_dir=out_dir,
        resume=resume,
    )


def test_tiered_cascade_closed_form():
    res = _run()
    s = res["tier_stats"]
    assert s["url"] == {
        "input": 25, "kept": 13, "removed": 12, "sec": s["url"]["sec"], "resumed": False,
    }
    assert (s["exact"]["input"], s["exact"]["kept"], s["exact"]["removed"]) == (13, 7, 6)
    assert (s["lines"]["input"], s["lines"]["kept"], s["lines"]["removed"]) == (7, 6, 1)
    assert (s["minhash"]["input"], s["minhash"]["kept"], s["minhash"]["removed"]) == (6, 5, 1)

    rows = {r["doc_id"]: r for r in res["docs"].take_all()}
    assert sorted(rows) == [0, 4, 8, 12, 16]
    # doc 0 keeps all three lines; doc 4 keeps only its (first-seen) content
    assert rows[0]["text"].startswith("shared head\ncontent 0 ")
    assert rows[0]["text"].endswith("\nshared tail")
    assert rows[4]["text"].startswith("content 1 ") and "\n" not in rows[4]["text"]
    # url column survived the lines-tier reattach
    assert rows[16]["url"] == "https://www.site.com/a/8"
    # minhash clusters recorded the 16<-20 merge
    cl = {r["doc_id"]: r["cluster_id"] for r in res["clusters"].take_all()}
    assert cl[16] == 16 and cl[20] == 16

    # removal provenance: every removed doc maps to its surviving
    # representative (dedup tiers) or null (lines tier)
    rem = res["removals"]
    url_map = {r["doc_id"]: r["cluster_id"] for r in rem["url"].take_all()}
    assert len(url_map) == 12 and url_map[1] == 0 and url_map[23] == 22
    exact_map = {r["doc_id"]: r["cluster_id"] for r in rem["exact"].take_all()}
    assert exact_map == {2: 0, 6: 4, 10: 8, 14: 12, 18: 16, 22: 20}
    lines_map = {r["doc_id"]: r["cluster_id"] for r in rem["lines"].take_all()}
    assert lines_map == {24: None}
    mh_map = {r["doc_id"]: r["cluster_id"] for r in rem["minhash"].take_all()}
    assert mh_map == {20: 16}


def test_tiered_quality_tier():
    """Opt-in quality tier: doc 24 (4 tokens, score 0.5) falls to the quality
    filter instead of the lines tier; everything downstream is unchanged."""
    import ray.data

    from pyjedai_ray.pipelines.tiered import TIERS, run_tiered_dedup

    docs = ray.data.from_arrow(_corpus())
    res = run_tiered_dedup(
        docs,
        DedupConfig(),
        tiers=("quality",) + TIERS,
        quality_threshold=0.6,
        id_col="doc_id",
        num_partitions=4,
        verify_mode="broadcast",
        cluster_mode="driver",
    )
    s = res["tier_stats"]
    assert (s["quality"]["input"], s["quality"]["kept"]) == (25, 24)
    assert s["lines"]["removed"] == 0  # doc 24 already gone
    assert sorted(r["doc_id"] for r in res["docs"].take_all()) == [0, 4, 8, 12, 16]
    # stat columns were dropped: downstream schema matches the default run
    assert sorted(res["docs"].schema().names) == ["doc_id", "text", "url"]


def test_tiered_semantic_tier():
    """Embedding near-dup tier runs LAST: doc 12's vector duplicates doc 8's
    direction, so after the text tiers keep {0,4,8,12,16} the semantic tier
    removes 12 with representative 8."""
    import numpy as np
    import ray.data

    from pyjedai_ray.pipelines.tiered import TIERS, run_tiered_dedup

    docs = ray.data.from_arrow(_corpus())
    dim = 8
    basis = {0: 2, 4: 3, 8: 1, 12: 1, 16: 4}  # 12 shares 8's axis
    vecs = []
    for i in range(25):
        v = np.zeros(dim)
        v[basis.get(i, (i % 3) + 5)] = 1.0
        vecs.append(v.tolist())
    emb = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(25), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float64())),
            }
        )
    )
    res = run_tiered_dedup(
        docs,
        DedupConfig(),
        tiers=TIERS + ("semantic",),
        embeddings=emb,
        id_col="doc_id",
        num_partitions=4,
        verify_mode="broadcast",
        cluster_mode="driver",
    )
    assert sorted(r["doc_id"] for r in res["docs"].take_all()) == [0, 4, 8, 16]
    s = res["tier_stats"]["semantic"]
    assert (s["input"], s["kept"], s["removed"]) == (5, 4, 1)
    sem = {r["doc_id"]: r["cluster_id"] for r in res["removals"]["semantic"].take_all()}
    assert sem == {12: 8}
    # missing embeddings for a semantic run is a hard error
    with pytest.raises(ValueError, match="semantic.*embeddings"):
        run_tiered_dedup(docs, id_col="doc_id", tiers=("semantic",))


def test_tiered_order_guard():
    import ray.data

    from pyjedai_ray.pipelines.tiered import run_tiered_dedup

    docs = ray.data.from_arrow(_corpus())
    with pytest.raises(ValueError, match="exact.*before.*lines"):
        run_tiered_dedup(docs, id_col="doc_id", tiers=("lines", "exact"))
    with pytest.raises(ValueError, match="unknown tiers"):
        run_tiered_dedup(docs, id_col="doc_id", tiers=("urls",))


def test_tiered_checkpoint_resume(tmp_path):
    out = str(tmp_path / "tiered")
    res1 = _run(out_dir=out)
    ids1 = sorted(r["doc_id"] for r in res1["docs"].take_all())
    assert ids1 == [0, 4, 8, 12, 16]
    assert not any(v["resumed"] for v in res1["tier_stats"].values())

    res2 = _run(out_dir=out)
    ids2 = sorted(r["doc_id"] for r in res2["docs"].take_all())
    assert ids2 == ids1
    assert all(v["resumed"] for v in res2["tier_stats"].values())
    assert res2["lineage"] == res1["lineage"]
    # clusters reload from the checkpoint even though the tier was skipped
    cl = {r["doc_id"]: r["cluster_id"] for r in res2["clusters"].take_all()}
    assert cl[20] == 16
    # removal provenance survives resume: dedup-tier mappings reload from
    # their checkpointed assign/clusters tables, diff tiers recompute
    rem2 = res2["removals"]
    assert {r["doc_id"]: r["cluster_id"] for r in rem2["exact"].take_all()} == {
        2: 0, 6: 4, 10: 8, 14: 12, 18: 16, 22: 20
    }
    assert {r["doc_id"]: r["cluster_id"] for r in rem2["minhash"].take_all()} == {20: 16}
    assert {r["doc_id"]: r["cluster_id"] for r in rem2["lines"].take_all()} == {24: None}

    # manifests chain row counts: each tier's row_count is the next's input
    from pyjedai_ray.pipelines import checkpoint as ckpt

    counts = [
        ckpt.read_manifest(f"{out}/tier_{t}")["row_count"]
        for t in ("url", "exact", "lines", "minhash")
    ]
    assert counts == [13, 7, 6, 5]


def test_tiered_recall_on_injected_dups():
    """The cascade must remove every injected high-similarity duplicate
    (leaving one representative per ground-truth group) and must NOT remove
    sub-threshold distractors."""
    import collections

    import ray.data  # noqa: F401

    from pyjedai_ray.functions.tokenize import word_shingles
    from pyjedai_ray.pipelines.tiered import run_tiered_dedup
    from pyjedai_ray.sources.webpages import DUP_ID_OFFSET, synthesize_webpages

    wp = synthesize_webpages("/root/testdata/sf0.001").materialize()
    res = run_tiered_dedup(
        wp, DedupConfig(), id_col="doc_id", verify_mode="broadcast",
        cluster_mode="driver", num_partitions=4,
    )
    survivors = {r["doc_id"] for r in res["docs"].take_all()}

    gt = collections.defaultdict(set)
    for r in wp.select_columns(["doc_id", "gt_cluster"]).take_all():
        gt[r["gt_cluster"]].add(r["doc_id"])
    texts = {
        r["doc_id"]: r["text"] for r in wp.select_columns(["doc_id", "text"]).take_all()
    }

    def jac(a: int, b: int) -> float:
        sa, sb = set(word_shingles(texts[a], 5)), set(word_shingles(texts[b], 5))
        if not sa and not sb:
            return 1.0
        return len(sa & sb) / len(sa | sb)

    n_checked, both_alive = 0, []
    for base, members in gt.items():
        if len(members) < 2:
            continue
        a, b = sorted(members)[:2]
        if jac(a, b) >= 0.9:
            n_checked += 1
            if a in survivors and b in survivors:
                both_alive.append((a, b))
    assert n_checked >= 25, "fixture lost its high-similarity dup pairs"
    assert not both_alive, f"dup pairs survived the cascade: {both_alive[:5]}"

    # sub-threshold distractors must survive alongside their base
    eaten = []
    for base in gt:
        if base % 20 == 4 and base < DUP_ID_OFFSET:
            distractor = base + DUP_ID_OFFSET
            if base in survivors and distractor in texts and distractor not in survivors:
                eaten.append(base)
    assert not eaten, f"distractors wrongly removed: {eaten[:5]}"


def test_semi_join_modes_property():
    """Broadcast mask and distributed semi/anti join agree on random id
    multisets (duplicates on both sides included)."""
    import ray.data
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyjedai_ray.stages.exchange import semi_join_ids

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(st.integers(0, 50), max_size=25),
        st.lists(st.integers(0, 50), max_size=12),
    )
    def _check(left_ids, member_ids):
        left = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(left_ids, pa.int64())})
        )
        ids = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(member_ids, pa.int64())})
        )
        members = set(member_ids)
        want_semi = sorted(i for i in left_ids if i in members)
        want_anti = sorted(i for i in left_ids if i not in members)
        for mode in ("broadcast", "join"):
            got_semi = sorted(
                r["doc_id"]
                for r in semi_join_ids(left, ids, mode=mode, num_partitions=2).take_all()
            )
            got_anti = sorted(
                r["doc_id"]
                for r in semi_join_ids(
                    left, ids, keep=False, mode=mode, num_partitions=2
                ).take_all()
            )
            assert got_semi == want_semi, (mode, left_ids, member_ids)
            assert got_anti == want_anti, (mode, left_ids, member_ids)

    _check()


def test_tiered_degenerate_corpora():
    """Empty corpus and single-doc corpus flow through every tier."""
    import ray.data

    from pyjedai_ray.pipelines.tiered import run_tiered_dedup

    empty = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    res = run_tiered_dedup(
        empty, DedupConfig(), id_col="doc_id", num_partitions=2,
        verify_mode="broadcast", cluster_mode="driver",
    )
    assert res["docs"].count() == 0
    assert all(v["removed"] == 0 for v in res["tier_stats"].values())

    one = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "url": pa.array(["https://x.example/only"], pa.string()),
                "text": pa.array(["just one lonely document here"], pa.string()),
            }
        )
    )
    res1 = run_tiered_dedup(
        one, DedupConfig(), id_col="doc_id", num_partitions=2,
        verify_mode="broadcast", cluster_mode="driver",
    )
    assert [r["doc_id"] for r in res1["docs"].take_all()] == [7]


def test_semi_join_ids_modes():
    import ray.data

    from pyjedai_ray.stages.exchange import semi_join_ids

    left = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(20), pa.int64()),
                "val": pa.array([f"v{i}" for i in range(20)], pa.string()),
            }
        )
    )
    ids = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([3, 5, 5, 11, 40], pa.int64())})
    )
    for mode in ("broadcast", "join"):
        kept = sorted(
            r["doc_id"] for r in semi_join_ids(left, ids, mode=mode, num_partitions=4).take_all()
        )
        assert kept == [3, 5, 11], mode
        anti = sorted(
            r["doc_id"]
            for r in semi_join_ids(left, ids, keep=False, mode=mode, num_partitions=4).take_all()
        )
        assert anti == [i for i in range(20) if i not in (3, 5, 11)], mode
    # empty id side: semi keeps nothing, anti keeps everything
    empty = ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    assert semi_join_ids(left, empty, mode="broadcast").count() == 0
    assert semi_join_ids(left, empty, keep=False, mode="broadcast").count() == 20
    # auto mode respects the id-count crossover: broadcast_limit=1 forces the
    # distributed join path; results are identical either way
    forced = sorted(
        r["doc_id"]
        for r in semi_join_ids(
            left, ids, mode="auto", broadcast_limit=1, num_partitions=4
        ).take_all()
    )
    assert forced == [3, 5, 11]

    # join mode must survive non-primitive payload columns (Acero rejects
    # list<double> non-key fields; the semi/anti path masks by key instead) —
    # this is the semantic tier's >32M-id fallback regime
    emb_left = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "embedding": pa.array(
                    [[float(i), 1.0] for i in range(6)], pa.list_(pa.float64())
                ),
            }
        )
    )
    emb_ids = ray.data.from_arrow(pa.table({"doc_id": pa.array([1, 4], pa.int64())}))
    got = sorted(
        r["doc_id"]
        for r in semi_join_ids(emb_left, emb_ids, mode="join", num_partitions=2).take_all()
    )
    assert got == [1, 4]

    # a miskeyed left side must raise, not silently keep everything
    import pytest as _pytest

    bad = ray.data.from_arrow(pa.table({"vec_id": pa.array([1, 2], pa.int64())}))
    with _pytest.raises(Exception, match="doc_id"):
        semi_join_ids(bad, ids, mode="broadcast").take_all()


def test_semi_join_ids_rejects_bad_mode():
    import ray.data

    from pyjedai_ray.stages.exchange import semi_join_ids

    left = ray.data.from_arrow(pa.table({"doc_id": pa.array([1, 2], pa.int64())}))
    ids = ray.data.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64())}))
    for bad in ("semi", "Broadcast", "JOIN", ""):
        with pytest.raises(ValueError, match="mode"):
            semi_join_ids(left, ids, mode=bad)


def test_sampled_lines_hint_two_corpora():
    """The lines-tier exchange hint must land within 2x of the actual
    exploded row count on both a 3-line and a 1,000-line corpus (VERDICT r4
    #7 — the old hard-coded x16 guess under-partitioned long-doc corpora)."""
    import ray.data

    from pyjedai_ray.pipelines.tiered import sampled_lines_hint

    three = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": pa.array([f"h\nbody {i}\nt" for i in range(40)], pa.string()),
            }
        )
    )
    actual3 = 40 * 3
    h3 = sampled_lines_hint(three, 40)
    assert actual3 / 2 <= h3 <= actual3 * 2, (h3, actual3)

    long_doc = "\n".join(f"line {j}" for j in range(1000))
    thousand = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(12), pa.int64()),
                "text": pa.array([long_doc] * 12, pa.string()),
            }
        )
    )
    actual1000 = 12 * 1000
    h1000 = sampled_lines_hint(thousand, 12)
    assert actual1000 / 2 <= h1000 <= actual1000 * 2, (h1000, actual1000)
    assert sampled_lines_hint(three, None) is None


def test_resolve_removals_chain():
    """Tracing a removed doc to its FINAL representative follows the tiers in
    order: exact removed 22 into 20, minhash then removed 20 into 7 — 22 must
    resolve to 7, not to the dead 20. Null-rep removals (lines) pass through."""
    import ray.data

    from pyjedai_ray.pipelines.tiered import resolve_removals

    removals = {
        "exact": ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([22], pa.int64()),
                    "cluster_id": pa.array([20], pa.int64()),
                }
            )
        ),
        "lines": ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([30], pa.int64()),
                    "cluster_id": pa.nulls(1, pa.int64()),
                }
            )
        ),
        "minhash": ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([20, 15], pa.int64()),
                    "cluster_id": pa.array([7, 7], pa.int64()),
                }
            )
        ),
    }
    out = resolve_removals(removals, ("url", "exact", "lines", "minhash"), num_partitions=4)
    got = {(r["doc_id"], r["cluster_id"]) for r in out.take_all()}
    assert got == {(22, 7), (20, 7), (15, 7), (30, None)}

    # no removals at all -> None; a tier whose key is ABSENT just skips
    assert resolve_removals({}, ("url",)) is None

    # a tier that ran but LOST its provenance (key present, value None) must
    # raise — a partial table would silently omit its removals
    with pytest.raises(ValueError, match="provenance"):
        resolve_removals({**removals, "minhash": None}, ("exact", "minhash"))


def test_resolve_removals_rep_dissolved_without_successor():
    """A representative removed by a LATER tier with NO successor (every
    line was a repeat) must resolve the earlier doc to null — never to the
    dead representative's id (code-review r5 finding, reproduced)."""
    import ray.data

    from pyjedai_ray.pipelines.tiered import resolve_removals

    removals = {
        "exact": ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([22], pa.int64()),
                    "cluster_id": pa.array([20], pa.int64()),
                }
            )
        ),
        "lines": ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([20], pa.int64()),
                    "cluster_id": pa.nulls(1, pa.int64()),
                }
            )
        ),
    }
    out = resolve_removals(removals, ("exact", "lines"), num_partitions=4)
    got = {(r["doc_id"], r["cluster_id"]) for r in out.take_all()}
    assert got == {(22, None), (20, None)}, got


def test_resolve_removals_on_real_cascade():
    """End-to-end: every resolved final representative must be alive in the
    cascade's surviving corpus (no doc resolves to a removed doc)."""
    from pyjedai_ray.pipelines.tiered import TIERS, resolve_removals

    res = _run()
    resolved = resolve_removals(res["removals"], TIERS, num_partitions=4)
    assert resolved is not None
    survivors = {r["doc_id"] for r in res["docs"].select_columns(["doc_id"]).take_all()}
    rows = resolved.take_all()
    removed_ids = {r["doc_id"] for r in rows}
    assert removed_ids.isdisjoint(survivors)
    for r in rows:
        if r["cluster_id"] is not None:
            assert r["cluster_id"] in survivors, r


def test_tiered_hash_covers_identity():
    """ADVICE r4: id_col and the semantic tier's embeddings identity must be
    part of the cascade's config hash, or stale checkpoints from a different
    invocation shape validate silently."""
    from pyjedai_ray.pipelines.tiered import TIERS, _tiered_hash

    cfg = DedupConfig()
    base = _tiered_hash(cfg, TIERS, None, True, 0.5, 0.95, id_col=None)
    assert _tiered_hash(cfg, TIERS, None, True, 0.5, 0.95, id_col="doc_id") != base

    sem = TIERS + ("semantic",)
    a = _tiered_hash(cfg, sem, None, True, 0.5, 0.95, emb_vec_col="embedding",
                     embedding_dim=16, source_id="/a.parquet")
    for kw in (
        {"emb_vec_col": "vec"},
        {"embedding_dim": 32},
        {"source_id": "/b.parquet"},
    ):
        kwargs = {"emb_vec_col": "embedding", "embedding_dim": 16,
                  "source_id": "/a.parquet", **kw}
        assert _tiered_hash(cfg, sem, None, True, 0.5, 0.95, **kwargs) != a
    # outside the semantic tier the embeddings identity is inert (no spurious
    # invalidation of url/exact/lines checkpoints)
    assert _tiered_hash(cfg, TIERS, None, True, 0.5, 0.95, source_id="/a.parquet") == base


def test_tiered_resume_with_lost_provenance_warns(tmp_path):
    """A resumed tier whose provenance side table fails manifest validation
    must warn and flag it in tier_stats — not silently hand back
    removals[tier] = None (ADVICE r4)."""
    import json
    import warnings

    out = str(tmp_path / "tiered")
    _run(out_dir=out)
    # corrupt the minhash provenance manifest (docs checkpoint stays valid)
    mpath = f"{out}/tier_minhash_clusters/_manifest.json"
    with open(mpath) as f:
        m = json.load(f)
    m["config_hash"] = "deadbeef"
    with open(mpath, "w") as f:
        json.dump(m, f)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = _run(out_dir=out)
    assert res["tier_stats"]["minhash"]["resumed"]
    assert res["tier_stats"]["minhash"]["provenance_resumed"] is False
    assert res["removals"]["minhash"] is None
    assert res["clusters"] is None
    assert any("provenance" in str(w.message) for w in caught), [
        str(w.message) for w in caught
    ]
    # docs output is unaffected by the lost side table
    assert sorted(r["doc_id"] for r in res["docs"].take_all()) == [0, 4, 8, 12, 16]
