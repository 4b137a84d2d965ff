"""Layer A parity tests — golden values copied from the reference's own
test suite (FIXTURES.md §4)."""

import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.operators.dimension import build_dimension, lookup_join
from rabbit_index_ingest_spark.operators.filters import (
    ALLOW_ALL_DENY_LISTED,
    DENY_ALL_ALLOW_LISTED,
    apply_path_filter,
    path_filter_expr,
)
from rabbit_index_ingest_spark.operators.messages import (
    decode_messages,
    route_actions,
)
from rabbit_index_ingest_spark.operators.pathmeta import (
    doc_key_expr,
    path_metadata,
    sha1_id_expr,
)

# ---------- A2: dual-format message decode (queue_handler.py:50-94) ----------


def test_decode_dual_format(spark):
    bodies = [
        # legacy colon-delimited (FIXTURES.md §4)
        ("2021-02-09 11:17:12:/badc/cmip5/data:MKDIR::",),
        # same fields as JSON
        (
            '{"datetime": "2021-02-09 11:17:12", "filepath": "/badc/cmip5/data",'
            ' "action": "MKDIR", "filesize": "", "message": ""}',
        ),
        # legacy with colons inside the trailing message (re-joined, :6+)
        ("2021-02-09 11:17:12:/badc/x:DEPOSIT:123:a:b:c",),
    ]
    df = decode_messages(spark.createDataFrame(bodies, "body string"))
    rows = df.collect()
    for r in rows[:2]:
        assert r["datetime"] == "2021-02-09 11:17:12"
        assert r["filepath"] == "/badc/cmip5/data"
        assert r["action"] == "MKDIR"
    assert rows[2]["message"] == "a:b:c"
    assert rows[2]["filesize"] == "123"


def test_route_actions(spark):
    df = spark.createDataFrame(
        [("DEPOSIT",), ("REMOVE",), ("MKDIR",), ("RMDIR",), ("SYMLINK",), ("00README",)],
        "action string",
    )
    files, dirs = route_actions(df)
    assert {r["action"] for r in files.collect()} == {"DEPOSIT", "REMOVE"}
    assert {r["action"] for r in dirs.collect()} == {
        "MKDIR", "RMDIR", "SYMLINK", "00README",
    }


# ---------- A5: prefix allow/deny (tests/test_path_tools.py:139-197) ----------

P1 = "/neodc/sentinel1b/data/TC_Sentinel_Data_31072014.pdf"
P2 = "/neodc/esacci/biomass/data/agb/maps/v2.0/00README_catalogue_and_licence.txt"


@pytest.mark.parametrize(
    "paths,policy,expected",
    [
        (["/neodc/esacci"], ALLOW_ALL_DENY_LISTED, {P1: True, P2: False}),
        ([], ALLOW_ALL_DENY_LISTED, {P1: True, P2: True}),
        (["/neodc/esacci"], DENY_ALL_ALLOW_LISTED, {P1: False, P2: True}),
        ([], DENY_ALL_ALLOW_LISTED, {P1: False, P2: False}),
    ],
)
def test_path_filter_policies(spark, paths, policy, expected):
    df = spark.createDataFrame([(P1,), (P2,)], "path string")
    got = {
        r["path"]: r["allow"]
        for r in df.select("path", path_filter_expr("path", paths, policy).alias("allow")).collect()
    }
    assert got == expected


def test_path_filter_component_aligned(spark):
    """'/a/bc' must NOT match prefix '/a/b' (trie semantics)."""
    df = spark.createDataFrame([("/a/b",), ("/a/b/c",), ("/a/bc",)], "path string")
    kept = apply_path_filter(df, "path", ["/a/b"], DENY_ALL_ALLOW_LISTED)
    assert {r["path"] for r in kept.collect()} == {"/a/b", "/a/b/c"}


def test_invalid_policy_raises():
    with pytest.raises(ValueError):
        path_filter_expr(F.col("x"), ["/p"], 3)


# ---------- A12: SHA-1 doc id golden (tests/test_path_tools.py:127-134) ----------


def test_sha1_golden(spark):
    df = spark.createDataFrame([("test_tree/badc/cmip5",)], "path string")
    got = df.select(sha1_id_expr("path").alias("id")).collect()[0]["id"]
    assert got == "5174fa172be7d29d15fb0a2a09e7d600375585d9"


def test_doc_key_deterministic(spark):
    df = spark.createDataFrame([("conv-1", 3), ("conv-1", 3)], "conv_id string, turn_idx int")
    keys = [r["k"] for r in df.select(doc_key_expr("conv_id", "turn_idx").alias("k")).collect()]
    assert keys[0] == keys[1]
    import hashlib

    assert keys[0] == hashlib.sha1(b"conv-1#3").hexdigest()


# ---------- A11: path metadata projection (tests/test_path_tools.py:66-90) ----------


def test_path_metadata(spark):
    df = path_metadata(spark.createDataFrame([("/badc/cmip5/data",)], "path string"))
    r = df.collect()[0]
    assert r["depth"] == 3
    assert r["dir"] == "data"
    assert r["archive_path"] == "/badc/cmip5/data"


# ---------- A6/A9: dimension build + broadcast lookup join ----------


def test_dimension_build_and_join(spark):
    raw = spark.createDataFrame(
        [
            ("/badc/cmip5/", "u1", "CMIP5", "published"),
            ("/badc/x", "u2", "X", "working"),  # dropped: working
            (None, "u3", "Y", "published"),  # dropped: null key
            ("/badc/cmip5/", "u4", "CMIP5-dup", "published"),  # deduped
        ],
        "data_path string, uuid string, title string, publicationState string",
    )
    dim = build_dimension(raw)
    rows = dim.collect()
    assert len(rows) == 1
    assert rows[0]["data_path"] == "/badc/cmip5"  # trailing slash stripped
    assert rows[0]["record_type"] == "Dataset"
    assert rows[0]["url"].endswith(rows[0]["url"].split("/")[-1])

    facts = spark.createDataFrame(
        [("/badc/cmip5/",), ("/badc/unknown",)], "path string"
    )
    joined = lookup_join(facts, dim)
    got = {r["path"]: r["title"] for r in joined.collect()}
    assert got["/badc/cmip5/"] is not None
    assert got["/badc/unknown"] is None


def test_fetch_paginated(spark):
    """A7: cursor-following accumulation (path_tools.py:55-84)."""
    from rabbit_index_ingest_spark.operators.dimension import fetch_paginated

    pages = {
        "p1": {"results": [{"k": 1}, {"k": 2}], "next": "p2"},
        "p2": {"results": [{"k": 3}], "next": "p3"},
        "p3": {"results": [], "next": None},
    }
    got = fetch_paginated(lambda u: pages[u], "p1")
    assert got == [{"k": 1}, {"k": 2}, {"k": 3}]


def test_load_dimension_file(spark, tmp_path):
    """A8: JSON mapping load + trailing-slash key normalization
    (path_tools.py:87-101; fixture shape = tests/moles_mapping_file.json)."""
    import json

    from rabbit_index_ingest_spark.operators.dimension import load_dimension_file

    p = tmp_path / "mapping.json"
    p.write_text(
        json.dumps(
            {
                "/badc/cmip5/": {"title": "CMIP5", "url": "u", "record_type": "Dataset"},
                "/neodc/x": {"title": "X", "url": "u2", "record_type": "Dataset"},
            }
        )
    )
    rows = {r["data_path"]: r["title"] for r in load_dimension_file(spark, str(p)).collect()}
    assert rows == {"/badc/cmip5": "CMIP5", "/neodc/x": "X"}


def test_scrub_text_expr(spark):
    """A13: replacement chars + control chars dropped, newlines/tabs kept
    (reference encoding behavior, tests/test_path_tools.py:117-125)."""
    from rabbit_index_ingest_spark.functions.text import scrub_text_expr

    df = spark.createDataFrame(
        [("(51.1445�N, 1.4370�W)\nok\tend\x00\x07",)], "t string"
    )
    got = df.select(scrub_text_expr("t").alias("s")).collect()[0]["s"]
    assert got == "(51.1445N, 1.4370W)\nok\tend"


def test_lookup_join_is_broadcast(spark):
    """The physical plan must contain a BroadcastHashJoin — the 100 TB
    guarantee that the fact side never shuffles for the dimension."""
    raw = spark.createDataFrame(
        [("/a", "u", "t", "published")],
        "data_path string, uuid string, title string, publicationState string",
    )
    facts = spark.createDataFrame([("/a",)], "path string")
    plan = lookup_join(facts, build_dimension(raw))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_path_metadata_full_reference_shape(spark):
    """Full A11 projection vs the reference's golden semantics
    (path_tools.py:125-179): link/type fields, ..-symlink resolution, and
    the dir-only conditional MOLES enrichment."""
    from rabbit_index_ingest_spark.operators.pathmeta import path_metadata_full

    rows = [
        # (path, link_target, is_dir)
        ("/badc/cmip5/data", None, True),          # plain dir, MOLES hit
        ("/badc/cmip5", None, True),               # plain dir, no MOLES title
        ("/neodc/avhrr-3/file.nc", None, False),   # plain file
        ("/badc/link1", "/archive/real", False),   # absolute link
        ("/badc/sub/link2", "../other/x.nc", False),   # 1-hop relative link
        ("/badc/a/b/link3", "../../deep/y.nc", False), # 2-hop relative link
        ("/badc/link4", "/datacentre/internal", False),  # datacentre link
    ]
    df = spark.createDataFrame(rows, "path string, link_target string, is_dir boolean")
    dim = spark.createDataFrame(
        [
            ("/badc/cmip5/data/", "CMIP5 data", "https://catalogue.example/cmip5", "Dataset"),
            ("/badc/cmip5", "", "https://catalogue.example/empty", "Dataset"),
            ("/neodc/avhrr-3", "AVHRR", "https://catalogue.example/avhrr", "Dataset Collection"),
        ],
        "data_path string, title string, url string, record_type string",
    )
    got = {
        r["path"]: r.asDict()
        for r in path_metadata_full(
            df, link_target_col="link_target", is_dir_col="is_dir", moles_dim=dim
        ).collect()
    }
    d = got["/badc/cmip5/data"]
    assert (d["depth"], d["dir"], d["type"], d["link"]) == (3, "data", "dir", False)
    assert d["archive_path"] == "/badc/cmip5/data"
    assert (d["title"], d["record_type"]) == ("CMIP5 data", "Dataset")
    # empty title → no enrichment (reference: `if record and record["title"]`)
    assert got["/badc/cmip5"]["title"] is None
    # file path matching a MOLES key is NOT enriched (dir-only branch)
    f = got["/neodc/avhrr-3/file.nc"]
    assert f["type"] == "file" and f["title"] is None
    # symlink resolution
    assert got["/badc/link1"]["archive_path"] == "/archive/real"
    assert got["/badc/link1"]["link"] is True
    assert got["/badc/sub/link2"]["archive_path"] == "/badc/other/x.nc"
    assert got["/badc/a/b/link3"]["archive_path"] == "/badc/deep/y.nc"
    # /datacentre links keep the original path
    assert got["/badc/link4"]["archive_path"] == "/badc/link4"
    assert got["/badc/link4"]["link"] is True
