"""YAML/JSON export shim: reference export.py:77-122 file naming + record
shape (README.md:70-89 list-of-single-key-mappings, nested child headers)."""

import json

import pytest
import yaml

from tableextraction_spark.export import record_rows, save_tables

PAYLOAD = {
    "columns": ["A", "B/C", "B/D"],
    "headers": [
        {"text": "A", "children": []},
        {"text": "B", "children": [
            {"text": "C", "children": []},
            {"text": "D", "children": []},
        ]},
    ],
    "records": [["a1", "c1", "d1"], ["a2", "c2", "d2"]],
}


def test_record_rows_nested_fill():
    rows = record_rows(PAYLOAD)
    assert rows == [
        [{"A": "a1"}, {"B": [{"C": "c1"}, {"D": "d1"}]}],
        [{"A": "a2"}, {"B": [{"C": "c2"}, {"D": "d2"}]}],
    ]


def test_save_yaml_stream_and_naming(tmp_path):
    paths = save_tables("doc-x", [json.dumps(PAYLOAD)] * 2, str(tmp_path))
    assert [p.split("/")[-1] for p in paths] == [
        "doc-x_table_0.yaml", "doc-x_table_1.yaml",
    ]
    # per-record dump-append concatenates into one list, like the reference
    loaded = yaml.safe_load(open(paths[0], encoding="utf-8"))
    assert loaded == [
        {"A": "a1"}, {"B": [{"C": "c1"}, {"D": "d1"}]},
        {"A": "a2"}, {"B": [{"C": "c2"}, {"D": "d2"}]},
    ]


def test_save_json_writes_structure_once(tmp_path):
    (path,) = save_tables("d", [json.dumps(PAYLOAD)], str(tmp_path), "json")
    assert path.endswith("d_table_0.json")
    loaded = json.load(open(path, encoding="utf-8"))
    assert loaded == record_rows(PAYLOAD)  # not duplicated per record


def test_unknown_format_rejected(tmp_path):
    with pytest.raises(ValueError, match="format"):
        save_tables("d", [json.dumps(PAYLOAD)], str(tmp_path), "xml")


def test_export_tables_dataframe_entry(spark, tmp_path):
    from tableextraction_spark.export import export_tables

    df = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "t", "media_ref": "", "offset": 0},
                 {"kind": "table", "text": json.dumps(PAYLOAD),
                  "media_ref": "m", "offset": 1}]),
         ("d2", [{"kind": "text", "text": "t", "media_ref": "", "offset": 0}])],
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>",
    )
    n = export_tables(df, str(tmp_path))
    assert n == 1
    assert (tmp_path / "d1_table_0.yaml").exists()
    assert not (tmp_path / "d2_table_0.yaml").exists()
