"""Chunk split/merge editing (api/chunks.py:352-513): renumbering,
position bookkeeping, batch-edit equivalence to sequential API calls."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators.chunk_edit import (
    merge_chunks,
    split_chunks,
)

SCHEMA = (
    "document_id long, chunk_id string, chunk_number long, "
    "chunk_text string, start_position long, end_position long"
)


def _chunks(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _collect(df):
    return {
        r["chunk_id"]: r.asDict()
        for r in df.collect()
    }


def test_split_basic(spark):
    c = _chunks(
        spark,
        [
            (1, "a", 0, "0123456789", 0, 10),
            (1, "b", 1, "abcdefghij", 10, 20),
            (1, "c", 2, "KLMNOPQRST", 20, 30),
        ],
    )
    sp = spark.createDataFrame([("b", 4)], "chunk_id string, split_position int")
    out = _collect(split_chunks(c, sp))
    assert len(out) == 4
    # first part keeps id/number, end = start + pos (api/chunks.py:376-378)
    assert out["b"]["chunk_text"] == "abcd"
    assert out["b"]["chunk_number"] == 1
    assert out["b"]["end_position"] == 14
    # later chunks renumber +1 (:387-388)
    assert out["c"]["chunk_number"] == 3
    assert out["a"]["chunk_number"] == 0
    # sibling at number+1 spans the remainder (:390-398)
    sib = [v for v in out.values() if v["split_from"] == "b"]
    assert len(sib) == 1
    s = sib[0]
    assert s["chunk_text"] == "efghij"
    assert s["chunk_number"] == 2
    assert (s["start_position"], s["end_position"]) == (14, 20)


def test_split_invalid_positions_ignored(spark):
    c = _chunks(spark, [(1, "a", 0, "abc", 0, 3)])
    sp = spark.createDataFrame(
        [("a", 0), ("a", 3), ("a", 99)],
        "chunk_id string, split_position int",
    )
    out = split_chunks(c, sp.filter("split_position = 99"))
    assert _collect(out)["a"]["chunk_text"] == "abc"
    assert out.count() == 1


def test_split_batch_matches_sequential(spark):
    # two splits in one doc: batch shift = sequential application
    c = _chunks(
        spark,
        [
            (1, "a", 0, "aaaa", 0, 4),
            (1, "b", 1, "bbbb", 4, 8),
            (1, "c", 2, "cccc", 8, 12),
        ],
    )
    sp = spark.createDataFrame(
        [("a", 2), ("c", 2)], "chunk_id string, split_position int"
    )
    out = split_chunks(c, sp)
    nums = {
        r["chunk_id"]: r["chunk_number"] for r in out.collect()
    }
    # sequential: split a → a=0, sib=1, b=2, c=3; split c → c=3, sib=4
    sibs = {r["split_from"]: r["chunk_number"] for r in out.collect() if r["split_from"]}
    assert nums["a"] == 0 and sibs["a"] == 1
    assert nums["b"] == 2
    assert nums["c"] == 3 and sibs["c"] == 4
    assert out.count() == 5


def test_merge_basic_and_renumber(spark):
    c = _chunks(
        spark,
        [
            (1, "a", 0, "alpha", 0, 5),
            (1, "b", 1, "beta", 5, 9),
            (1, "c", 2, "gamma", 9, 14),
            (1, "d", 3, "delta", 14, 19),
        ],
    )
    g = spark.createDataFrame(
        [("b", "g1"), ("c", "g1")], "chunk_id string, group_id string"
    )
    out = _collect(merge_chunks(c, g))
    assert len(out) == 3
    # first keeps id/number, text joined by ' ', end = last.end (:460-472)
    assert out["b"]["chunk_text"] == "beta gamma"
    assert out["b"]["chunk_number"] == 1
    assert out["b"]["end_position"] == 14
    assert out["b"]["merged_from"] == ["c"]
    # chunks past the last renumber -(k-1) (:479-486)
    assert out["d"]["chunk_number"] == 2
    assert out["a"]["chunk_number"] == 0
    assert out["a"]["merged_from"] == []


def test_merge_non_contiguous_selection(spark):
    # the API sorts the id list by chunk_number and only renumbers
    # PAST the last selected — an unselected chunk between keeps its
    # number (faithful hole)
    c = _chunks(
        spark,
        [
            (1, "a", 0, "A", 0, 1),
            (1, "b", 1, "B", 1, 2),
            (1, "c", 2, "C", 2, 3),
            (1, "d", 3, "D", 3, 4),
        ],
    )
    g = spark.createDataFrame(
        [("a", "g"), ("c", "g")], "chunk_id string, group_id string"
    )
    out = _collect(merge_chunks(c, g))
    assert out["a"]["chunk_text"] == "A C"
    assert out["a"]["chunk_number"] == 0
    assert "c" not in out
    assert out["b"]["chunk_number"] == 1  # between first and last: kept
    assert out["d"]["chunk_number"] == 2  # past last: -1


def test_merge_two_groups_one_doc(spark):
    c = _chunks(
        spark,
        [(1, k, i, k.upper(), i, i + 1) for i, k in enumerate("abcdef")],
    )
    g = spark.createDataFrame(
        [("a", "g1"), ("b", "g1"), ("d", "g2"), ("e", "g2")],
        "chunk_id string, group_id string",
    )
    out = _collect(merge_chunks(c, g))
    # sequential: merge(a,b) → a=0 'A B', c=1, d=2, e=3, f=4;
    # merge(d,e) → d=2 'D E', f=3
    assert out["a"]["chunk_number"] == 0 and out["a"]["chunk_text"] == "A B"
    assert out["c"]["chunk_number"] == 1
    assert out["d"]["chunk_number"] == 2 and out["d"]["chunk_text"] == "D E"
    assert out["f"]["chunk_number"] == 3
    assert set(out) == {"a", "c", "d", "f"}
