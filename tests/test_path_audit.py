"""Path/filename safety audit (utils/path_validator.py:14-149):
first-failing-check precedence, basename semantics, boundaries."""

from __future__ import annotations

from cocoindex_data_ingestion_spark.operators.expectations import (
    path_safety_audit,
)


def _audit(spark, paths):
    df = spark.createDataFrame([(p,) for p in paths], "source_path string")
    out = path_safety_audit(df)
    return {
        r["source_path"]: (r["filename"], r["violation"], r["is_safe"])
        for r in out.collect()
    }


def test_violation_precedence_and_branches(spark):
    got = _audit(
        spark,
        [
            "/data/ok/file.txt",
            "/data/.hidden",
            "/proc/.hidden",          # suspicious beats hidden
            "/etc/passwd",
            "/data/../x/file.txt",    # raw-string traversal
            "/data/CON.txt",
            "/data/COM0.txt",         # only COM1-9 are reserved
            "/data/COM9.txt",
            "/data/a|b.txt",
            "/data/back\\slash",
            "/data/" + "y" * 256,
            "",
        ],
    )
    assert got["/data/ok/file.txt"] == ("file.txt", "ok", True)
    assert got["/data/.hidden"][1] == "hidden"
    assert got["/proc/.hidden"][1] == "suspicious:/proc/"
    assert got["/etc/passwd"][1] == "suspicious:/etc/passwd"
    assert got["/data/../x/file.txt"][1] == "suspicious:/../"
    assert got["/data/CON.txt"][1] == "reserved"
    assert got["/data/COM0.txt"][1] == "ok"
    assert got["/data/COM9.txt"][1] == "reserved"
    assert got["/data/a|b.txt"][1] == "forbidden:|"
    assert got["/data/back\\slash"][1] == "forbidden:\\"
    assert got["/data/" + "y" * 256][1] == "too_long"
    assert got[""][1] == "empty"


def test_forbidden_char_list_order(spark):
    # ':' precedes '|' in the reference's forbidden list (:123) —
    # the first match in LIST order wins, not string order
    got = _audit(spark, ["/data/a|b:c"])
    assert got["/data/a|b:c"][1] == "forbidden::"


def test_nul_byte(spark):
    got = _audit(spark, ["/data/a\x00b"])
    # suspicious-pattern check sees the NUL before filename checks
    assert got["/data/a\x00b"][1] == "suspicious:<nul>"


def test_windows_system_dir_lowercased(spark):
    got = _audit(spark, ["C:\\Windows\\System32\\cmd.exe"])
    assert got["C:\\Windows\\System32\\cmd.exe"][1] == (
        "suspicious:c:\\windows\\system32"
    )
