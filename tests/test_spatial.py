"""Spatial join: equigrid filtering + CF/JS_APPROX/MBR weighting + budgeted
top-K + MBR relations vs a brute-force in-memory oracle with the reference's
semantics (src/pyjedai/spatial/{filtering,initialization}.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _boxes(n, seed):
    r = np.random.RandomState(seed)
    minx = r.randint(0, 200, n).astype(float)
    miny = r.randint(0, 200, n).astype(float)
    w = r.randint(1, 9, n).astype(float)
    h = r.randint(1, 9, n).astype(float)
    return {
        "gid": np.arange(n, dtype=np.int64),
        "minx": minx,
        "miny": miny,
        "maxx": minx + w,
        "maxy": miny + h,
    }


def _ds(b):
    import ray.data

    return ray.data.from_arrow(pa.table({k: pa.array(v) for k, v in b.items()}))


def _oracle(S, T):
    """Brute-force reference semantics: mean-extent thetas over SOURCE,
    cell ranges [floor(min/theta), ceil(max/theta)), candidates = shared
    cell + envelope intersection, closed-form weights."""
    tx = float(np.mean(S["maxx"] - S["minx"]))
    ty = float(np.mean(S["maxy"] - S["miny"]))

    def crange(b, i):
        return (
            math.floor(b["minx"][i] / tx),
            math.ceil(b["maxx"][i] / tx),
            math.floor(b["miny"][i] / ty),
            math.ceil(b["maxy"][i] / ty),
        )

    out = {}
    for i in range(len(S["gid"])):
        a = crange(S, i)
        for j in range(len(T["gid"])):
            b = crange(T, j)
            cx = min(a[1], b[1]) - max(a[0], b[0])
            cy = min(a[3], b[3]) - max(a[2], b[2])
            if cx <= 0 or cy <= 0:
                continue
            if not (
                S["minx"][i] <= T["maxx"][j]
                and T["minx"][j] <= S["maxx"][i]
                and S["miny"][i] <= T["maxy"][j]
                and T["miny"][j] <= S["maxy"][i]
            ):
                continue
            common = cx * cy
            bs = (a[1] - a[0] + 1) * (a[3] - a[2] + 1)
            bt = (b[1] - b[0] + 1) * (b[3] - b[2] + 1)
            ix = min(S["maxx"][i], T["maxx"][j]) - max(S["minx"][i], T["minx"][j])
            iy = min(S["maxy"][i], T["maxy"][j]) - max(S["miny"][i], T["miny"][j])
            inter = max(ix, 0.0) * max(iy, 0.0)
            den = (
                (S["maxx"][i] - S["minx"][i]) * (S["maxy"][i] - S["miny"][i])
                + (T["maxx"][j] - T["minx"][j]) * (T["maxy"][j] - T["miny"][j])
                - inter
            )
            out[(i, j)] = {
                "CF": float(common),
                "JS_APPROX": common / (bs + bt - common),
                "MBR": 0.0 if den == 0 else inter / den,
            }
    return out


@pytest.mark.parametrize("scheme", ["CF", "JS_APPROX", "MBR"])
def test_grid_candidates_match_oracle(scheme):
    from pyjedai_ray.stages import spatial

    S, T = _boxes(120, 1), _boxes(150, 2)
    exp = _oracle(S, T)
    got = spatial.grid_candidates(
        _ds(S), _ds(T), weight_scheme=scheme, num_partitions=4
    ).take_all()
    gd = {(r["id1"], r["id2"]): r["weight"] for r in got}
    assert set(gd) == set(exp)
    assert all(gd[k] == exp[k][scheme] for k in exp)  # bit-exact


def test_budget_topk_deterministic():
    from pyjedai_ray.stages import spatial

    S, T = _boxes(120, 1), _boxes(150, 2)
    exp = _oracle(S, T)
    top = spatial.spatial_join(
        _ds(S), _ds(T), budget=25, weight_scheme="CF", num_partitions=4
    ).take_all()
    ordered = sorted(
        ((k, v["CF"]) for k, v in exp.items()),
        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
    )[:25]
    assert [(r["id1"], r["id2"]) for r in top] == [k for k, _ in ordered]


def test_explicit_thetas_and_degenerate_boxes():
    from pyjedai_ray.stages import spatial

    # a zero-extent box exactly on a cell boundary spans zero cells and is
    # dropped (reference parity: empty range(minX, maxX) indexes nothing)
    S = {
        "gid": np.array([0, 1], dtype=np.int64),
        "minx": np.array([10.0, 0.0]),
        "miny": np.array([10.0, 0.0]),
        "maxx": np.array([10.0, 4.0]),
        "maxy": np.array([10.0, 4.0]),
    }
    T = {
        "gid": np.array([0], dtype=np.int64),
        "minx": np.array([1.0]),
        "miny": np.array([1.0]),
        "maxx": np.array([3.0]),
        "maxy": np.array([3.0]),
    }
    got = spatial.grid_candidates(
        _ds(S), _ds(T), theta_x=5.0, theta_y=5.0, num_partitions=2
    ).take_all()
    assert [(r["id1"], r["id2"]) for r in got] == [(1, 0)]


def test_mean_extents_empty_and_degenerate_raise():
    import ray.data

    from pyjedai_ray.stages import spatial

    empty = ray.data.from_arrow(
        pa.table(
            {c: pa.array([], pa.float64()) for c in ("minx", "miny", "maxx", "maxy")}
        )
    )
    with pytest.raises(ValueError, match="empty source"):
        spatial.mean_extents(empty)
    degenerate = ray.data.from_arrow(
        pa.table(
            {
                "minx": [1.0],
                "miny": [1.0],
                "maxx": [1.0],
                "maxy": [1.0],
            }
        )
    )
    with pytest.raises(ValueError, match="degenerate grid"):
        spatial.mean_extents(degenerate)


def test_hot_cell_cap_counts_drops():
    import ray

    from pyjedai_ray.stages import spatial
    from pyjedai_ray.state import metrics

    # 30 identical source boxes x 30 identical target boxes in one cell
    n = 30
    S = {
        "gid": np.arange(n, dtype=np.int64),
        "minx": np.full(n, 1.0),
        "miny": np.full(n, 1.0),
        "maxx": np.full(n, 2.0),
        "maxy": np.full(n, 2.0),
    }
    name = "spatial-cap-test"
    got = spatial.grid_candidates(
        _ds(S),
        _ds(S),
        max_cell_pairs=100,
        drop_counter=name,
        num_partitions=2,
    ).take_all()
    assert got == []
    totals = metrics.read_drops(name)
    assert totals["hot_spatial_cells"]["dropped_comparisons"] == n * n


def test_mbr_relations_families():
    import ray.data

    from pyjedai_ray.stages import spatial

    # (box1, box2, expected flags) — each DE-9IM family exercised on boxes
    cases = [
        # identical
        ((0, 0, 2, 2), (0, 0, 2, 2), {"equals", "intersects", "covers", "covered_by", "contains", "within"}),
        # proper containment
        ((0, 0, 10, 10), (2, 2, 4, 4), {"intersects", "covers", "contains"}),
        # containment touching the boundary (covers but NOT contains-strict?
        # DE-9IM contains holds when interiors intersect — it does here)
        ((0, 0, 10, 10), (0, 0, 4, 4), {"intersects", "covers", "contains"}),
        # partial overlap
        ((0, 0, 4, 4), (2, 2, 6, 6), {"intersects", "overlaps"}),
        # edge touch
        ((0, 0, 2, 2), (2, 0, 4, 2), {"intersects", "touches"}),
        # corner touch
        ((0, 0, 2, 2), (2, 2, 4, 4), {"intersects", "touches"}),
        # disjoint
        ((0, 0, 1, 1), (5, 5, 6, 6), {"disjoint"}),
    ]
    rows = {
        "id1": list(range(len(cases))),
        "id2": list(range(len(cases))),
    }
    for k, idx in (("1", 0), ("2", 1)):
        for ci, c in enumerate(("minx", "miny", "maxx", "maxy")):
            rows.setdefault(f"{c}{k}", []).extend(
                float(case[idx][ci]) for case in cases
            )
    ds = ray.data.from_arrow(
        pa.table({k: pa.array(v) for k, v in rows.items()})
    )
    got = sorted(spatial.mbr_relations(ds).take_all(), key=lambda r: r["id1"])
    for i, (_, _, expected) in enumerate(cases):
        flags = {rel for rel in spatial.MBR_RELATIONS if got[i][rel] == 1}
        assert flags == expected, (i, flags, expected)


def test_attach_boxes_roundtrip():
    import ray.data

    from pyjedai_ray.stages import spatial

    S, T = _boxes(40, 3), _boxes(40, 4)
    pairs = spatial.grid_candidates(_ds(S), _ds(T), num_partitions=2)
    withb = spatial.attach_boxes(pairs, _ds(S), _ds(T), num_partitions=2)
    rows = withb.take_all()
    assert rows
    for r in rows[:20]:
        i, j = r["id1"], r["id2"]
        assert r["minx1"] == S["minx"][i] and r["maxy1"] == S["maxy"][i]
        assert r["minx2"] == T["minx"][j] and r["maxy2"] == T["maxy"][j]


def test_de9im_verifier_is_env_gated():
    from pyjedai_ray.stages.spatial import De9imVerifier

    try:
        import shapely  # noqa: F401

        pytest.skip("shapely present — stub not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="shapely"):
        De9imVerifier()


def test_compat_spatial_facade():
    import pandas as pd

    from pyjedai_ray.compat import (
        SpatialData,
        StandardSpatialFiltering,
        StandardSpatialInitialization,
    )

    S, T = _boxes(60, 7), _boxes(60, 8)
    sd = SpatialData(
        pd.DataFrame({c: S[c] for c in ("minx", "miny", "maxx", "maxy")}),
        pd.DataFrame({c: T[c] for c in ("minx", "miny", "maxx", "maxy")}),
    )
    tx, ty = StandardSpatialFiltering().process(sd)
    assert tx == pytest.approx(float(np.mean(S["maxx"] - S["minx"])))
    init = StandardSpatialInitialization(budget=10, wScheme="CF")
    init.process(sd)
    df = init.export_to_df()
    assert len(df) <= 10 and list(df.columns) == ["id1", "id2", "weight"]

    with pytest.raises(ValueError, match="missing envelope"):
        SpatialData(pd.DataFrame({"minx": [0.0]}), pd.DataFrame({"minx": [0.0]}))
