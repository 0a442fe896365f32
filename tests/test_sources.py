"""Source readers: CSV/JSON ingestion, config loader, null normalization,
schema validation (reference Data.__init__ / read_data_from_json analogs,
src/pyjedai/datamodel.py:77-186, utils.py:1270-1316)."""

import json

import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_read_csv_pipe_separated(tmp_path):
    from pyjedai_ray.sources.readers import read_csv_table

    p = tmp_path / "cora.csv"
    p.write_text("Entity Id|title|author\n1|paper one|smith\n2|paper two|jones\n")
    ds = read_csv_table(str(p), separator="|")
    rows = sorted(ds.take_all(), key=lambda r: r["Entity Id"])
    assert [r["title"] for r in rows] == ["paper one", "paper two"]


def test_read_json_lines(tmp_path):
    from pyjedai_ray.sources.readers import read_json_table

    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1, "text": "a"}\n{"doc_id": 2, "text": "b"}\n')
    ds = read_json_table(str(p))
    assert sorted(r["doc_id"] for r in ds.take_all()) == [1, 2]


def test_load_pipeline_config(tmp_path):
    from pyjedai_ray.sources.readers import load_pipeline_config

    cfg = {"blocking": {"keyer": "qgram", "q": 4}, "threshold": 0.8}
    p = tmp_path / "pipeline.json"
    p.write_text(json.dumps(cfg))
    assert load_pipeline_config(str(p)) == cfg


def test_normalize_nulls_fills_string_columns():
    import ray.data

    from pyjedai_ray.sources.readers import normalize_nulls

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["x", None], pa.string()),
        }
    )
    out = sorted(
        normalize_nulls(ray.data.from_arrow(t)).take_all(), key=lambda r: r["doc_id"]
    )
    assert out[1]["text"] == ""


def test_validate_schema_raises_on_missing():
    import ray.data

    from pyjedai_ray.sources.readers import validate_schema

    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64())}))
    validate_schema(ds, {"doc_id": pa.int64()})
    with pytest.raises(ValueError, match="missing required columns"):
        validate_schema(ds, {"doc_id": pa.int64(), "text": pa.string()})
