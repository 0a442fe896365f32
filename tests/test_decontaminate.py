"""Benchmark decontamination (stages/decontaminate.py).

Closed-form corpus: eval = "the quick brown fox jumps over the lazy dog"
(9 tokens -> five 5-grams); train docs cover full-overlap, zero-overlap,
single-gram, empty, and shorter-than-n cases.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyjedai_ray.functions.tokenize import word_shingles
from pyjedai_ray.stages.decontaminate import (
    _batch_row_grams,
    decontaminate,
    eval_gram_hashes,
)

EVAL_TEXT = "the quick brown fox jumps over the lazy dog"
TRAIN_TEXTS = [
    # 14 tokens -> ten 5-grams, five of them from the eval text
    "the quick brown fox jumps over the lazy dog and keeps running far away",
    "completely unrelated text about ray data pipelines and arrow batches here",
    "the quick brown fox jumps",  # exactly the one overlapping 5-gram
    "",  # no tokens -> no grams
    "tiny doc",  # < n tokens -> one whole-sequence gram, not in eval
    EVAL_TEXT,  # byte-identical -> exact-mode positive too
]


def _train():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(TRAIN_TEXTS) + 1), pa.int64()),
                "text": pa.array(TRAIN_TEXTS, pa.string()),
                "lang": pa.array(["en"] * len(TRAIN_TEXTS), pa.string()),
            }
        )
    )


def _eval():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100], pa.int64()),
                "text": pa.array([EVAL_TEXT], pa.string()),
            }
        )
    )


def test_batch_row_grams_matches_word_shingles(ray_session):
    texts = TRAIN_TEXTS + ["x Y z x y Z", "a b c d e"]
    col = pa.array(texts, pa.string())
    for n in (3, 5, 13):
        rows, grams = _batch_row_grams(col, n)
        got: dict[int, set] = {}
        for r, g in zip(rows.tolist(), grams.to_pylist()):
            got.setdefault(r, set()).add(g)
        for i, t in enumerate(texts):
            assert got.get(i, set()) == set(word_shingles(t, n)), (n, i)


def test_ngram_mode_counts_and_survivors(ray_session):
    res = decontaminate(_train(), _eval(), mode="ngram", n=5, concurrency=2)
    ann = (
        res["annotations"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert ann.n_grams.tolist() == [10, 7, 1, 0, 1, 5]
    assert ann.n_overlap.tolist() == [5, 0, 1, 0, 0, 5]
    assert ann.contaminated.tolist() == [1, 0, 1, 0, 0, 1]
    surv = res["survivors"].to_pandas().sort_values("doc_id")
    assert surv.doc_id.tolist() == [2, 4, 5]
    # survivors carry the ORIGINAL train columns only
    assert sorted(surv.columns) == ["doc_id", "lang", "text"]


def test_ngram_threshold_fraction(ray_session):
    # doc 1 overlaps 5/10 grams: threshold 0.6 clears it, 0.4 flags it
    hi = decontaminate(_train(), _eval(), mode="ngram", n=5, threshold=0.6, concurrency=2)
    lo = decontaminate(_train(), _eval(), mode="ngram", n=5, threshold=0.4, concurrency=2)
    f_hi = hi["annotations"].to_pandas().set_index("doc_id").contaminated
    f_lo = lo["annotations"].to_pandas().set_index("doc_id").contaminated
    assert f_hi[1] == 0 and f_lo[1] == 1
    # the single-gram doc overlaps 1/1 -> flagged at any threshold <= 1
    assert f_hi[3] == 1


def test_exact_mode(ray_session):
    res = decontaminate(_train(), _eval(), mode="exact", concurrency=2)
    ann = res["annotations"].to_pandas().sort_values("doc_id")
    # only the byte-identical (post-normalization) doc flags
    assert ann.contaminated.tolist() == [0, 0, 0, 0, 0, 1]
    surv = res["survivors"].to_pandas()
    assert sorted(surv.doc_id.tolist()) == [1, 2, 3, 4, 5]


def test_empty_eval_and_empty_train(ray_session):
    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    res = decontaminate(_train(), empty, mode="ngram", n=5, concurrency=2)
    assert res["survivors"].count() == len(TRAIN_TEXTS)
    res2 = decontaminate(empty, _eval(), mode="ngram", n=5, concurrency=2)
    assert res2["survivors"].count() == 0


def test_drop_counter_counts_contaminated(ray_session):
    from pyjedai_ray.state.metrics import read_drops, reset_drops

    reset_drops("decon-test")
    res = decontaminate(
        _train(), _eval(), mode="ngram", n=5, concurrency=2, drop_counter="decon-test"
    )
    assert res["survivors"].count() == 3
    drops = read_drops("decon-test")
    assert drops.get("contaminated_docs", {}).get("dropped_comparisons") == 3


def test_eval_gram_cap_raises(ray_session):
    with pytest.raises(ValueError, match="max_eval_grams"):
        eval_gram_hashes(_eval(), n=5, max_eval_grams=2)


def test_mode_validation(ray_session):
    with pytest.raises(ValueError, match="mode"):
        decontaminate(_train(), _eval(), mode="fuzzy")
