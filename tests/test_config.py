"""A19 parity: multi-file deep merge + nested get (yaml_config.py:23-118)."""

import json

import pytest

from rabbit_index_ingest_spark.config import EngineConfig, MergeError


def test_deep_merge_rules():
    c = EngineConfig()
    # dict ∪ dict recursive; scalar overwrite; list extend; list append
    a = {"x": {"y": 1, "keep": "a"}, "l": [1, 2], "s": "old"}
    b = {"x": {"y": 2}, "l": [3], "s": "new"}
    merged = c.data_merge(a, b)
    assert merged["x"] == {"y": 2, "keep": "a"}
    assert merged["l"] == [1, 2, 3]
    assert merged["s"] == "new"
    assert c.data_merge({"l": [1]}, {"l": 4})["l"] == [1, 4]


def test_merge_error_on_nondict_into_dict():
    with pytest.raises(MergeError):
        EngineConfig().data_merge({"a": {"b": 1}}, {"a": "scalar"})
    # reference raises when merging into a dict only; primitives overwrite
    assert EngineConfig().data_merge("scalar", {"a": 1}) == {"a": 1}


def test_read_multi_file_and_get(tmp_path):
    f1 = tmp_path / "base.json"
    f2 = tmp_path / "override.json"
    f1.write_text(json.dumps({"indexer": {"queue": {"name": "q1"}, "level": "INFO"}}))
    f2.write_text(json.dumps({"indexer": {"level": "DEBUG"}, "extra": [1]}))
    c = EngineConfig()
    ok = c.read([str(f1), str(f2), str(tmp_path / "missing.json")])
    assert ok == [str(f1), str(f2)]  # unopenable silently skipped
    assert c.get("indexer", "level") == "DEBUG"
    assert c.get("indexer", "queue", "name") == "q1"
    assert c.get("indexer", "nope", default="d") == "d"
    assert c.get("a", "b", "c") is None


def test_get_requires_loaded_config():
    with pytest.raises(ValueError):
        EngineConfig().get("k")


def test_yaml_files(tmp_path):
    f = tmp_path / "c.yml"
    f.write_text("indexer:\n  path_filter:\n    - /neodc/esacci\n")
    c = EngineConfig()
    c.read([str(f)])
    assert c.get("indexer", "path_filter") == ["/neodc/esacci"]
