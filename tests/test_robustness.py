"""Adversarial/robustness ports (reference: filesql_test.go tier 4 —
reserved-word filenames :1892-2273, unicode :1736, malformed CSV :1425,
BOM :1465, all-format matrix :2523)."""

from __future__ import annotations

import pytest

import filesql_spark as fs


def test_reserved_word_filename(spark, tmp_path):
    # a table literally named "select" must work via quoting
    (tmp_path / "select.csv").write_text("id,value\n1,10\n2,20\n")
    eng = fs.open(str(tmp_path / "select.csv"), spark=spark)
    try:
        assert eng.table_names() == ["select"]
        rows = eng.query('SELECT "value" FROM "select" ORDER BY id').collect()
        assert [r.value for r in rows] == [10, 20]
    finally:
        eng.close()


def test_unicode_filename_and_content(spark, tmp_path):
    (tmp_path / "日本語.csv").write_text("名前,年齢\n太郎,30\n花子,25\n")
    eng = fs.open(str(tmp_path / "日本語.csv"), spark=spark)
    try:
        assert eng.table_names() == ["日本語"]
        rows = eng.query('SELECT "名前" FROM "日本語" WHERE "年齢" > 27').collect()
        assert [r[0] for r in rows] == ["太郎"]
    finally:
        eng.close()


def test_utf8_bom_header(spark, tmp_path):
    (tmp_path / "bom.csv").write_bytes(b"\xef\xbb\xbfid,name\n1,x\n")
    eng = fs.open(str(tmp_path / "bom.csv"), spark=spark)
    try:
        df = eng.table("bom")
        assert df.columns == ["id", "name"]  # BOM stripped from header
        assert df.count() == 1
    finally:
        eng.close()


def test_ragged_rows_tolerated(spark, tmp_path):
    # PERMISSIVE mode: short rows pad with NULL, long rows drop extras
    (tmp_path / "ragged.csv").write_text("a,b,c\n1,2,3\n4,5\n6,7,8,9\n")
    eng = fs.open(str(tmp_path / "ragged.csv"), spark=spark)
    try:
        rows = eng.query("SELECT * FROM ragged ORDER BY a").collect()
        assert len(rows) == 3
        assert rows[1].c is None
    finally:
        eng.close()


def test_whitespace_only_file_rejected(spark, tmp_path):
    (tmp_path / "blank.csv").write_text("   \n  \n")
    with pytest.raises(fs.EmptyFileError):
        fs.open(str(tmp_path / "blank.csv"), spark=spark)


def test_all_format_matrix(spark, tmp_path):
    """One engine over every uncompressed format at once."""
    import pandas as pd

    (tmp_path / "c.csv").write_text("id,v\n1,2\n")
    (tmp_path / "t.tsv").write_text("id\tv\n3\t4\n")
    (tmp_path / "l.ltsv").write_text("id:5\tv:6\n")
    pd.DataFrame({"id": [7], "v": [8]}).to_parquet(tmp_path / "p.parquet")
    eng = fs.open(str(tmp_path), spark=spark)
    try:
        assert eng.table_names() == ["c", "l", "p", "t"]
        (row,) = eng.query(
            """
            SELECT SUM(id) AS ids FROM (
                SELECT id FROM c UNION ALL SELECT id FROM t
                UNION ALL SELECT id FROM l UNION ALL SELECT id FROM p
            )
            """
        ).collect()
        assert row.ids == 16
    finally:
        eng.close()


def test_sql_injectionish_table_name(spark, tmp_path):
    # filesql_test.go:1666: weird-but-legal file stems must not break DDL
    (tmp_path / "users; drop.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "users; drop.csv"), spark=spark)
    try:
        assert eng.table_names() == ["users; drop"]
        (row,) = eng.query('SELECT COUNT(*) AS n FROM "users; drop"').collect()
        assert row.n == 1
    finally:
        eng.close()


def test_crlf_line_endings(spark, tmp_path):
    (tmp_path / "win.csv").write_bytes(b"id,name\r\n1,a\r\n2,b\r\n")
    eng = fs.open(str(tmp_path / "win.csv"), spark=spark)
    try:
        assert eng.query("SELECT COUNT(*) AS n FROM win").collect()[0].n == 2
        assert eng.table("win").columns == ["id", "name"]
    finally:
        eng.close()


def test_quoted_fields_with_commas_and_newlines(spark, tmp_path):
    (tmp_path / "q.csv").write_text('id,note\n1,"a, b"\n2,"line1\nline2"\n')
    eng = fs.open(str(tmp_path / "q.csv"), spark=spark)
    try:
        rows = {r.id: r.note for r in eng.query("SELECT * FROM q").collect()}
        assert rows[1] == "a, b"
        assert rows[2] == "line1\nline2"
    finally:
        eng.close()


def test_quoted_header_with_embedded_newline(spark, tmp_path):
    """A quoted header field containing a newline must parse as ONE record
    (csv.reader over the buffer), matching the multiLine=True data read —
    splitlines()[0] would truncate it (ADVICE r1)."""
    (tmp_path / "h.csv").write_text('id,"note\nfield"\n1,a\n2,b\n')
    eng = fs.open(str(tmp_path / "h.csv"), spark=spark)
    try:
        df = eng.query("SELECT * FROM h")
        assert "note\nfield" in df.columns
        assert df.count() == 2
    finally:
        eng.close()
