"""Schema matching: distributed column-token profiles, Jaccard column
matrix, TF-IDF top-token summaries, columns-as-entities adapter vs in-memory
oracles (reference: src/pyjedai/schema/{matching,schema_model,utils}.py)."""

import math
import re

import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

_SPLIT = re.compile(r"[\W_]+")

T1 = pa.table(
    {
        "name": ["Alpha Widget", "beta gadget", "Gamma-Widget", None, ""],
        "addr": ["12 Main st", "34 Side Ave", "12 main ST", "99 Other Rd", "5 Main st"],
        "size": [3, 14, 3, 7, 14],
    }
)
T2 = pa.table(
    {
        "title": ["alpha widget!", "delta gizmo", "widget beta"],
        "street": ["12 MAIN st", "77 Elm Ave", ""],
    }
)


def _tokset(tbl, col):
    out = set()
    for v in tbl[col].to_pylist():
        if v is None:
            continue
        out |= {t for t in _SPLIT.split(str(v).lower()) if t}
    return out


def _ds(t):
    import ray.data

    return ray.data.from_arrow(t)


def test_column_token_profiles_counts_cells_once():
    from pyjedai_ray.stages.schema_matching import column_token_profiles

    rows = column_token_profiles(_ds(T1), ["addr"], num_partitions=2).take_all()
    got = {r["token"]: r["tf"] for r in rows}
    # "main" appears in 3 cells (one of them twice-insensitively), "st" in 3,
    # "12" in 2 — cell-level counts, not occurrence counts
    assert got["main"] == 3 and got["st"] == 3 and got["12"] == 2
    assert set(got) == _tokset(T1, "addr")


def test_jaccard_schema_matching_matches_oracle():
    from pyjedai_ray.stages.schema_matching import jaccard_schema_matching

    got = jaccard_schema_matching(
        _ds(T1), _ds(T2), columns1=["name", "addr"], num_partitions=2
    ).take_all()
    gd = {(r["col1"], r["col2"]): r["jaccard"] for r in got}
    assert len(gd) == 4  # full cross matrix, zero-overlap pairs included
    for c1 in ("name", "addr"):
        for c2 in ("title", "street"):
            a, b = _tokset(T1, c1), _tokset(T2, c2)
            u = a | b
            exp = 0.0 if not u else len(a & b) / len(u)
            assert gd[(c1, c2)] == exp


def test_jaccard_handles_integer_columns_via_str_cast():
    from pyjedai_ray.stages.schema_matching import jaccard_schema_matching

    got = jaccard_schema_matching(
        _ds(T1), _ds(T1), columns1=["size"], columns2=["size"], num_partitions=2
    ).take_all()
    assert got[0]["jaccard"] == 1.0


def test_tfidf_top_tokens_scores_and_ranks():
    from pyjedai_ray.stages.schema_matching import tfidf_top_tokens

    rows = tfidf_top_tokens(_ds(T1), ["addr"], top_k=3, num_partitions=2).take_all()
    # oracle: tf * (ln((1+n)/(1+tf)) + 1), n = non-empty cells, rounded 6dp
    tf = {}
    n = 0
    for v in T1["addr"].to_pylist():
        if v is None or str(v) == "":
            continue
        n += 1
        for tok in {t for t in _SPLIT.split(str(v).lower()) if t}:
            tf[tok] = tf.get(tok, 0) + 1
    scores = {
        t: math.floor(c * (math.log((1 + n) / (1 + c)) + 1) * 1e6 + 0.5) / 1e6
        for t, c in tf.items()
    }
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [(r["token"], r["score"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == exp
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]


def test_schema_entity_table_modes():
    from pyjedai_ray.stages.schema_matching import schema_entity_table

    plain = schema_entity_table(_ds(T1), ["name", "addr"], mode="schema").take_all()
    assert [(r["doc_id"], r["text"]) for r in plain] == [(0, "name"), (1, "addr")]

    comp = schema_entity_table(
        _ds(T1), ["addr"], mode="composite", top_k=2
    ).take_all()
    assert comp[0]["text"].startswith("addr ")
    assert len(comp[0]["text"].split()) == 3  # name + 2 top tokens

    with pytest.raises(ValueError, match="mode"):
        schema_entity_table(_ds(T1), ["addr"], mode="CONTENT")


def test_schema_entities_feed_er_workflow():
    """The reference consumes its schema model through the regular ER
    pipeline (schema_model.py feeds Data) — the adapter output must work as
    a documents table for the engine's blocking stage."""
    from pyjedai_ray.stages import blocking
    from pyjedai_ray.stages.schema_matching import schema_entity_table

    ents = schema_entity_table(
        _ds(T1), ["name", "addr"], mode="content", top_k=8
    )
    edges = blocking.explode_keys(ents, keyer="standard")
    assert edges.count() > 0


def test_valentine_stub_is_env_gated():
    from pyjedai_ray.stages.schema_matching import ValentineMatcherStub

    try:
        import valentine  # noqa: F401

        pytest.skip("valentine present — stub not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="valentine"):
        ValentineMatcherStub()


def test_compat_schema_facades():
    import pandas as pd

    from pyjedai_ray.compat import JaccardSchemaMatching, ValentineSchemaMatching

    m = JaccardSchemaMatching()
    df = m.process(T1.to_pandas()[["name", "addr"]], T2.to_pandas())
    assert set(df.columns) == {"col1", "col2", "jaccard"}
    assert len(df) == 4
    gm = m.get_matches()
    assert gm[("name", "title")] > 0

    try:
        import valentine  # noqa: F401

        pytest.skip("valentine present")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="valentine"):
        ValentineSchemaMatching()
