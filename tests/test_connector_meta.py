"""GDrive connector routing (google_drive_connector.py:40-536):
MIME tables, LlamaParse whitelist, access levels, extension
selection, splitext semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.sources import connector_meta as cm


def test_file_extension_matches_splitext(spark):
    names = [
        "doc.pdf", "archive.tar.gz", "noext", "trailing.", ".hidden",
        "a.b.c.GDOC",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r["name"]: r["e"]
        for r in df.select(
            "name", cm.file_extension(F.col("name")).alias("e")
        ).collect()
    }
    for n in names:
        assert got[n] == os.path.splitext(n)[1], n


def test_routing_columns(spark):
    df = spark.createDataFrame(
        [
            ("a.gdoc", "application/vnd.google-apps.document"),
            ("b.pdf", "application/pdf"),
            ("c.xlsx",
             "application/vnd.openxmlformats-officedocument."
             "spreadsheetml.sheet"),
            ("d.bin", "application/octet-stream"),
            ("e.md", "text/markdown"),
        ],
        "name string, mime_type string",
    )
    got = {r["name"]: r.asDict() for r in cm.annotate_routing(df).collect()}
    g = got["a.gdoc"]
    assert g["supported"] and g["dest_ext"] == ".gdoc"
    assert g["export_format"] == "text/plain"
    assert not g["send_to_llamaparse"] and not g["text_decodable"]
    p = got["b.pdf"]
    assert p["supported"] and p["send_to_llamaparse"]
    assert p["export_format"] is None
    # xlsx: NOT in SUPPORTED_MIME_TYPES but IS on the LlamaParse
    # whitelist — faithful inconsistency between the two tables
    x = got["c.xlsx"]
    assert not x["supported"] and x["send_to_llamaparse"]
    assert not got["d.bin"]["supported"]
    m = got["e.md"]
    assert m["text_decodable"] and not m["send_to_llamaparse"]


def test_access_levels(spark):
    df = spark.createDataFrame(
        [("public",), ("management",), ("mystery",), (None,)],
        "s string",
    )
    got = [
        r["l"]
        for r in df.select(cm.access_level(F.col("s")).alias("l")).collect()
    ]
    assert got == [1, 5, 4, 4]  # unknown AND null default to employee


def test_file_type_selection_pseudo_extensions(spark):
    df = spark.createDataFrame(
        [
            (".gdoc", "application/vnd.google-apps.document"),
            ("", "application/vnd.google-apps.document"),  # exported name
            (".pdf", "application/pdf"),
            (".txt", "text/plain"),
        ],
        "ext string, mime string",
    )
    sel = cm.file_type_selected(
        F.col("ext"), F.col("mime"), [".pdf", ".gdoc"]
    )
    got = [r["s"] for r in df.select(sel.alias("s")).collect()]
    # google-native docs select by MIME even when the name lacks the
    # pseudo-extension (:533-535)
    assert got == [True, True, True, False]
