"""Stage-level tests: blocking, cleaning, clustering, joins, ANN, checkpoint."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _edges(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.string()),
                "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def test_candidate_pairs_counts():
    from pyjedai_ray.stages.blocking import candidate_pairs

    e = _edges([("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2), ("c", 9)])
    got = sorted(
        (r["id1"], r["id2"], r["cbs"]) for r in candidate_pairs(e, max_block_size=64).take_all()
    )
    assert got == [(1, 2, 2), (1, 3, 1), (2, 3, 1)]


def test_candidate_pairs_chain_oversize():
    from pyjedai_ray.stages.blocking import candidate_pairs

    e = _edges([("hot", i) for i in range(10)])
    got = sorted((r["id1"], r["id2"]) for r in candidate_pairs(e, max_block_size=5).take_all())
    assert got == [(i, i + 1) for i in range(9)]  # chain, not 45 pairs


def test_block_filtering_tiny():
    from pyjedai_ray.stages.block_cleaning import block_filtering

    # doc 1 in blocks a(3),b(2); doc 2 in a,b; doc 3 in a. ratio=0.5:
    # doc1 keeps round(0.5*2)=1 smallest block -> b (card 1 < card 3)
    e = _edges([("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2)])
    got = sorted((r["key"], r["doc_id"]) for r in block_filtering(e, ratio=0.5).take_all())
    # doc1->b, doc2->b, doc3->a(only block, round(0.5)=1 -> keeps a) but a has 1 entity left -> dropped
    assert got == [("b", 1), ("b", 2)]


def test_block_purging_consistency():
    """Purged set == {blocks with cardinality <= computed threshold}.

    (Exact threshold semantics vs the reference's cumulative-curve scan are
    validated against the DuckDB oracle in entry_queries' block_purging.)"""
    from pyjedai_ray.stages.block_cleaning import block_purging
    from pyjedai_ray.stages.blocking import block_sizes

    rows = []
    for k in range(10):
        rows += [(f"s{k}", 2 * k), (f"s{k}", 2 * k + 1)]
    for k in range(4):
        rows += [(f"m{k}", 3 * k), (f"m{k}", 3 * k + 1), (f"m{k}", 3 * k + 2)]
    rows += [("big", i) for i in range(30)]
    e = _edges(rows)
    purged, thr = block_purging(e)
    kept = {r["key"] for r in purged.take_all()}
    expect = {
        r["key"]
        for r in block_sizes(e).take_all()
        if r["block_size"] * (r["block_size"] - 1) // 2 <= thr
    }
    assert kept == expect


def test_label_propagation_chain():
    import ray.data

    from pyjedai_ray.state.unionfind import label_propagation

    n = 40  # chain 0-1-2-...-39: worst case without pointer jumping
    edges = ray.data.from_arrow(
        pa.table(
            {
                "id1": pa.array(list(range(n - 1)), pa.int64()),
                "id2": pa.array(list(range(1, n)), pa.int64()),
            }
        )
    )
    out = {r["doc_id"]: r["cluster_id"] for r in label_propagation(edges, max_iters=12).take_all()}
    assert out == {i: 0 for i in range(n)}


def test_driver_vs_distributed_cc_equal():
    import ray.data

    from pyjedai_ray.stages.clustering import connected_components

    rng = np.random.default_rng(7)
    a = rng.integers(0, 60, 80)
    b = rng.integers(0, 60, 80)
    edges = ray.data.from_arrow(
        pa.table({"id1": pa.array(np.minimum(a, b), pa.int64()), "id2": pa.array(np.maximum(a, b), pa.int64())})
    )
    d = {r["doc_id"]: r["cluster_id"] for r in connected_components(edges, mode="driver").take_all()}
    x = {r["doc_id"]: r["cluster_id"] for r in connected_components(edges, mode="distributed").take_all()}
    assert d == x


def test_hash_join_left_outer_and_empty():
    import ray.data

    from pyjedai_ray.stages.exchange import hash_join

    left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": ["a", "b", "c"]}))
    right = ray.data.from_arrow(pa.table({"k": pa.array([2], pa.int64()), "w": [20]}))
    got = sorted(
        (r["k"], r["v"], r.get("w")) for r in hash_join(left, right, on=("k",), num_partitions=4, join_type="left outer").take_all()
    )
    assert got == [(1, "a", None), (2, "b", 20), (3, "c", None)]

    empty = right.filter(expr="k > 100")
    inner = hash_join(left, empty, on=("k",), num_partitions=4)
    assert inner.count() == 0


def test_ejoin_identical_docs():
    import ray.data

    from pyjedai_ray.stages.joins import ejoin, topk_join

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["red green blue", "red green blue", "yellow purple cyan"],
            }
        )
    )
    got = [(r["id1"], r["id2"]) for r in ejoin(docs, threshold=0.9, num_partitions=4).take_all()]
    assert got == [(1, 2)]
    tk = topk_join(docs, k=1, num_partitions=4).take_all()
    assert {(r["id1"], r["id2"]) for r in tk} >= {(1, 2), (2, 1)}


def test_knn_brute_force():
    import ray.data

    from pyjedai_ray.stages.ann import knn_brute_force

    vecs = np.eye(4, dtype=np.float32).tolist() + [[0.9, 0.1, 0.0, 0.0]]
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(5)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )
    )
    out = knn_brute_force(emb, np.array([vecs[0]]), np.array([0]), k=2)
    rows = sorted(out.take_all(), key=lambda r: r["rank"])
    assert rows[0]["neighbor_id"] == 4  # closest to e0 is the 0.9 vector
    assert rows[0]["rank"] == 1


def test_multimodal_stub_plumbing():
    from pyjedai_ray.stages.multimodal import extract_media_features, synthesize_media

    media = synthesize_media(n=16)
    out = extract_media_features(media, batch_size=4, concurrency=2).take_all()
    assert len(out) == 16
    assert all(len(r["features"]) == 8 for r in out)
    # deterministic: same payload -> same features
    again = extract_media_features(synthesize_media(n=16), batch_size=8, concurrency=2).take_all()
    a = {r["media_id"]: list(r["features"]) for r in out}
    b = {r["media_id"]: list(r["features"]) for r in again}
    assert a == b


def test_checkpoint_resume(tmp_path):
    import ray.data

    from pyjedai_ray.pipelines import checkpoint as ckpt

    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return ray.data.range(10)

    ds1, chain1 = ckpt.load_or_compute(str(tmp_path), "stage_a", "cfg1", "", compute)
    assert ds1.count() == 10 and calls["n"] == 1
    ds2, chain2 = ckpt.load_or_compute(str(tmp_path), "stage_a", "cfg1", "", compute)
    assert ds2.count() == 10 and calls["n"] == 1  # resumed, not recomputed
    assert chain1 == chain2
    # config change invalidates
    ds3, _ = ckpt.load_or_compute(str(tmp_path), "stage_a", "cfg2", "", compute)
    assert calls["n"] == 2
    m = ckpt.read_manifest(str(tmp_path / "stage_a"))
    assert m["row_count"] == 10 and len(m["partitions"]) >= 1


def test_substring_overlap_dedup_detects_partial_copy():
    import ray.data

    from pyjedai_ray.stages.dedup import substring_overlap_dedup

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 20
    copy_with_wrapper = "unrelated header text here. " + base + " unrelated footer."
    other = "completely different content about databases and query engines " * 20
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [base, copy_with_wrapper, other],
            }
        )
    )
    res = substring_overlap_dedup(docs, num_partitions=4)
    cl = {r["doc_id"]: r["cluster_id"] for r in res["clusters"].take_all()}
    assert cl.get(1) == cl.get(2) and cl.get(1) is not None  # partial copy found
    assert cl.get(3) is None or cl[3] != cl[1]


def test_char_ngram_hashes_shift_invariant():
    from pyjedai_ray.functions.hashing import char_ngram_hashes

    import numpy as np

    core = "a shared long run of text that is certainly longer than the window size used here " * 10
    h1 = char_ngram_hashes("PREFIX " * 30 + core, 48, 16, 7)
    h2 = char_ngram_hashes(core + " SUFFIX" * 30, 48, 16, 7)
    shared = np.intersect1d(h1, h2).size
    assert shared >= 5  # content-defined selection survives the shift


def test_candidate_pairs_salt_oversize():
    from pyjedai_ray.stages.blocking import candidate_pairs

    e = _edges([("hot", i) for i in range(12)])
    got = sorted(
        (r["id1"], r["id2"])
        for r in candidate_pairs(e, max_block_size=5, salt_oversize=True).take_all()
    )
    chain = {(i, i + 1) for i in range(11)}
    assert chain <= set(got)            # connectivity preserved
    assert len(got) > len(chain)        # plus intra-salt-group pairs
    assert len(got) < 66                # far fewer than full 12*11/2


def test_explode_keys_vectorized_matches_loop():
    """The Arrow fast path for the standard keyer must produce the same
    (doc_id, key) edge SET as the per-doc Python regex, including the
    non-ASCII fallback (RE2 \\W is ASCII-only, Python's is Unicode-aware)."""
    import ray.data
    from pyjedai_ray.functions.tokenize import standard_tokens
    from pyjedai_ray.stages.blocking import explode_keys

    texts = [
        "The  quick, quick brown-fox! jumps_over 42 lazy dogs",
        "",
        "dup dup dup DUP",
        "naïve café résumé touché naïve",  # forces the non-ASCII fallback
        "punct.,;:!?only---",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(list(range(len(texts))), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
    )
    got = set()
    for r in explode_keys(ds, "standard").take_all():
        got.add((r["doc_id"], r["key"]))
    want = set()
    for did, text in enumerate(texts):
        for k in standard_tokens(text):
            want.add((did, k))
    assert got == want

    # ASCII-only corpus exercises the vectorized path itself (the mixed
    # batch above falls back to the loop wholesale)
    ascii_texts = [t for t in texts if t.isascii()]
    ds2 = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(list(range(len(ascii_texts))), pa.int64()),
             "text": pa.array(ascii_texts, pa.string())}
        )
    )
    got2 = {(r["doc_id"], r["key"]) for r in explode_keys(ds2, "standard").take_all()}
    want2 = {
        (did, k)
        for did, text in enumerate(ascii_texts)
        for k in standard_tokens(text)
    }
    assert got2 == want2


def test_pe_topk_join_overlapping_ids_raise():
    import pytest
    import ray.data

    from pyjedai_ray.stages.joins import pe_topk_join

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["a b", "b c", "c d"],
        }
    )
    ds = ray.data.from_arrow(t)
    # same id space on both sides: the dataset_limit split is violated
    with pytest.raises(ValueError, match="disjoint ordered id spaces"):
        pe_topk_join(ds, ds, k=1)


def test_checkpoint_manifest_carries_schema_and_timing(tmp_path):
    import ray.data

    from pyjedai_ray.pipelines import checkpoint as ckpt

    ds = ray.data.from_items([{"doc_id": i, "v": i * 2} for i in range(10)])
    out, chain = ckpt.load_or_compute(
        str(tmp_path), "stage_a", "cfg1", "", lambda: ds
    )
    m = ckpt.read_manifest(str(tmp_path / "stage_a"))
    assert m["row_count"] == 10
    assert sorted(m["schema"]) == ["doc_id", "v"]
    assert m["written_at"] > 0
    assert m["metrics"]["compute_plus_write_sec"] >= 0


def test_candidate_pairs_partition_invariance():
    """Distributed-correctness property: the candidate set is identical at
    any partitioning (partition arrival order must never leak into results)."""
    import ray.data

    from pyjedai_ray.stages.blocking import candidate_pairs

    keys = [f"k{i % 7}" for i in range(40)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "doc_id": pa.array([i % 13 for i in range(40)], pa.int64()),
            }
        )
    )
    results = []
    for np_ in (2, 5, 9):
        out = candidate_pairs(edges, max_block_size=64, num_partitions=np_)
        results.append(
            sorted((r["id1"], r["id2"], r["cbs"]) for r in out.take_all())
        )
    assert results[0] == results[1] == results[2]


def test_block_filtering_partition_invariance():
    import ray.data

    from pyjedai_ray.stages.block_cleaning import block_filtering

    keys = [f"t{i % 5}" for i in range(30)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "doc_id": pa.array([i % 11 for i in range(30)], pa.int64()),
            }
        )
    )
    results = []
    for np_ in (2, 7):
        out = block_filtering(edges, ratio=0.6, num_partitions=np_)
        results.append(sorted((r["key"], r["doc_id"]) for r in out.take_all()))
    assert results[0] == results[1]


def test_ejoin_counts_mode_parity():
    """The broadcast counts path (small-corpus default) and the hash-join
    counts path (the 100-TB route) must produce identical similarity sets —
    auto picks per scale, so BOTH must stay exercised. Multiset tokenization
    pins the shuffle-free per-doc counter's bag semantics too."""
    import ray.data

    from pyjedai_ray.stages.joins import ejoin

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    "red green blue red",
                    "red green blue",
                    "yellow purple cyan yellow",
                    "red blue green",
                ],
            }
        )
    )
    for tok in ("standard", "standard_multiset"):
        res = {}
        for mode in ("broadcast", "join"):
            rows = ejoin(
                docs, threshold=0.5, tokenization=tok,
                num_partitions=4, counts_mode=mode,
            ).take_all()
            res[mode] = sorted(
                (r["id1"], r["id2"], round(r["weight"], 12)) for r in rows
            )
        assert res["broadcast"] == res["join"], tok
        assert len(res["join"]) > 0, tok


def test_line_dedup_boilerplate_strip():
    """First occurrence of every distinct line survives; docs that lose all
    lines disappear; reassembly preserves within-doc line order."""
    import ray.data

    from pyjedai_ray.stages.dedup import line_dedup

    rows = [
        {"doc_id": 1, "text": "banner\nunique one\nfooter"},
        {"doc_id": 2, "text": "banner\nunique two\nfooter"},
        {"doc_id": 3, "text": "banner\nfooter"},  # all lines repeated -> dropped
    ]
    ds = ray.data.from_items(rows)
    surv = sorted(
        (r["doc_id"], r["line_no"], r["line"])
        for r in line_dedup(ds, num_partitions=4).take_all()
    )
    assert surv == [
        (1, 1, "banner"),
        (1, 2, "unique one"),
        (1, 3, "footer"),
        (2, 2, "unique two"),
    ]
    re = sorted(
        (r["doc_id"], r["text"])
        for r in line_dedup(ds, num_partitions=4, reassemble=True).take_all()
    )
    assert re == [(1, "banner\nunique one\nfooter"), (2, "unique two")]


def test_effective_partitions_rows_hint(ray_session):
    from pyjedai_ray.stages.exchange import ROWS_PER_PARTITION, effective_partitions

    # small inputs floor at 8; the hint never RAISES the request
    assert effective_partitions(32, rows=1000) == 8
    assert effective_partitions(4, rows=10 * ROWS_PER_PARTITION) == 4
    # web-scale rows blow past the cap -> caller's count wins (clamped to ctx)
    big = effective_partitions(32, rows=10**9)
    assert big == effective_partitions(32)
    # no hint -> unchanged behavior
    assert effective_partitions(8) >= 2


def test_write_stage_leaves_stray_entries_alone(tmp_path):
    """write_stage must clear only its own artifacts (*.parquet + manifest):
    a subdirectory or user file parked in the stage dir previously raised
    IsADirectoryError mid-write, after the old manifest was invalidated."""
    import os

    import ray.data

    from pyjedai_ray.pipelines import checkpoint as ckpt

    stage_dir = tmp_path / "stage_x"
    stage_dir.mkdir()
    (stage_dir / "user_notes.txt").write_text("keep me")
    (stage_dir / "scratch_dir").mkdir()
    (stage_dir / "scratch_dir" / "inner.txt").write_text("nested")
    (stage_dir / "stale.parquet").write_bytes(b"not really parquet")

    m = ckpt.write_stage(ray.data.range(5), str(stage_dir), "stage_x", "cfg")
    assert m["row_count"] == 5
    # stray non-parquet entries survive; the stale parquet was cleared
    assert (stage_dir / "user_notes.txt").read_text() == "keep me"
    assert (stage_dir / "scratch_dir" / "inner.txt").exists()
    assert not (stage_dir / "stale.parquet").exists()
    # manifest lists only the real partitions
    assert all(p["file"].endswith(".parquet") for p in m["partitions"])
    assert ckpt.manifest_valid(str(stage_dir), "cfg")
    # and a resume reads back cleanly despite the strays
    ds, _ = ckpt.load_or_compute(
        str(tmp_path), "stage_x", "cfg", "", lambda: (_ for _ in ()).throw(AssertionError)
    )
    assert ds.count() == 5


def test_hash_join_semi_anti_string_and_nullable_keys():
    """The semi/anti searchsorted fast path is gated to non-null integer
    keys (ADVICE r4): string keys and nullable int keys must fall back to the
    Acero join, where nulls are non-matching."""
    import ray.data

    from pyjedai_ray.stages.exchange import hash_join

    i64, s = pa.int64(), pa.string()
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(["a", "b", None, "c"], s),
                  "v": pa.array([1, 2, 3, 4], i64)})
    )
    right = ray.data.from_arrow(pa.table({"k": pa.array(["b", "c", None], s)}))
    lschema = pa.schema([("k", s), ("v", i64)])
    rschema = pa.schema([("k", s)])
    semi = hash_join(left, right, on=("k",), num_partitions=2,
                     join_type="left semi", left_schema=lschema, right_schema=rschema)
    assert sorted(r["v"] for r in semi.take_all()) == [2, 4]
    anti = hash_join(left, right, on=("k",), num_partitions=2,
                     join_type="left anti", left_schema=lschema, right_schema=rschema)
    assert sorted(r["v"] for r in anti.take_all()) == [1, 3]

    # nullable INT key: same fallback (the mask path would see NaN floats)
    left_i = ray.data.from_arrow(
        pa.table({"k": pa.array([10, None, 30], i64),
                  "v": pa.array([1, 2, 3], i64)})
    )
    right_i = ray.data.from_arrow(pa.table({"k": pa.array([10, None], i64)}))
    li = pa.schema([("k", i64), ("v", i64)])
    ri = pa.schema([("k", i64)])
    semi_i = hash_join(left_i, right_i, on=("k",), num_partitions=2,
                       join_type="left semi", left_schema=li, right_schema=ri)
    assert sorted(r["v"] for r in semi_i.take_all()) == [1]


def test_hash_join_semi_anti_nullable_int_key_with_list_payload():
    """The crash case the key-mask exists for, PLUS a null key: a nullable
    int key must stay on the mask path (null = matches nothing: semi drops
    it, anti keeps it) — falling back to Acero would reject the list<double>
    payload outright (code-review r5 finding)."""
    import ray.data

    from pyjedai_ray.stages.exchange import hash_join

    i64 = pa.int64()
    lschema = pa.schema([("k", i64), ("emb", pa.list_(pa.float64()))])
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([10, None, 30, 40], i64),
                "emb": pa.array(
                    [[1.0], [2.0], [3.0], [4.0]], pa.list_(pa.float64())
                ),
            }
        )
    )
    right = ray.data.from_arrow(pa.table({"k": pa.array([10, None], i64)}))
    rschema = pa.schema([("k", i64)])
    semi = hash_join(left, right, on=("k",), num_partitions=2,
                     join_type="left semi", left_schema=lschema, right_schema=rschema)
    assert sorted(r["emb"][0] for r in semi.take_all()) == [1.0]
    anti = hash_join(left, right, on=("k",), num_partitions=2,
                     join_type="left anti", left_schema=lschema, right_schema=rschema)
    assert sorted(r["emb"][0] for r in anti.take_all()) == [2.0, 3.0, 4.0]


def test_read_stage_empty_dataset_and_strays(tmp_path):
    """A stage whose output is EMPTY (a tier that removed everything) must
    read back as an empty dataset even when the stage dir holds only the
    manifest plus preserved stray entries (code-review r5 finding)."""
    import ray.data

    from pyjedai_ray.pipelines import checkpoint as ckpt

    stage_dir = tmp_path / "empty_stage"
    empty = ray.data.from_arrow(
        pa.schema([("doc_id", pa.int64())]).empty_table()
    )
    m = ckpt.write_stage(empty, str(stage_dir), "empty_stage", "cfg")
    assert m["row_count"] == 0
    (stage_dir / "user_note.txt").write_text("stray")
    assert ckpt.manifest_valid(str(stage_dir), "cfg")
    ds = ckpt.read_stage(str(stage_dir))
    assert ds.count() == 0
