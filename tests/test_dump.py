"""Export layer: single-file dumps, codecs, round-trips, auto-save hooks."""

from __future__ import annotations

import gzip
import lzma
import os

import pytest

import filesql_spark as fs
from filesql_spark.errors import FilesqlError

CSV = "id,name,score\n1,alice,9.5\n2,bob,8.25\n3,carol,\n"


@pytest.fixture
def eng(spark, tmp_path):
    (tmp_path / "people.csv").write_text(CSV)
    e = fs.open(str(tmp_path / "people.csv"), spark=spark)
    yield e
    e.close()


def test_dump_csv_single_file(eng, tmp_path):
    out = tmp_path / "out"
    written = eng.dump(str(out), format="csv")
    assert written == [str(out / "people.csv")]
    text = (out / "people.csv").read_text()
    lines = text.strip().split("\n")
    assert lines[0] == "id,name,score"
    assert "1,alice,9.5" in lines
    # NULL → empty string (filesql.go:370-375)
    assert any(line.startswith("3,carol,") for line in lines)


def test_dump_tsv_gz_roundtrip(eng, spark, tmp_path):
    out = tmp_path / "out"
    eng.dump(str(out), format="tsv", compression="gz")
    p = out / "people.tsv.gz"
    assert p.exists()
    with gzip.open(p, "rt") as f:
        assert f.readline().strip() == "id\tname\tscore"
    # round-trip through the reader
    e2 = fs.open(str(p), spark=spark)
    try:
        assert e2.query("SELECT COUNT(*) AS n FROM people").collect()[0].n == 3
    finally:
        e2.close()


def test_dump_ltsv(eng, tmp_path):
    out = tmp_path / "out"
    eng.dump(str(out), format="ltsv")
    lines = (out / "people.ltsv").read_text().strip().split("\n")
    assert "id:1\tname:alice\tscore:9.5" in lines
    assert "id:3\tname:carol\tscore:" in lines  # NULL → ""


def test_dump_parquet_typed_roundtrip(eng, spark, tmp_path):
    out = tmp_path / "out"
    eng.dump(str(out), format="parquet")
    df = spark.read.parquet(str(out / "people.parquet"))
    assert df.count() == 3
    assert dict(df.dtypes)["id"] == "bigint"


def test_dump_xlsx_roundtrip(eng, spark, tmp_path):
    out = tmp_path / "out"
    eng.dump(str(out), format="xlsx")
    e2 = fs.open(str(out / "people.xlsx"), spark=spark)
    try:
        assert "people_people" in e2.table_names()
        assert e2.query('SELECT COUNT(*) AS n FROM "people_people"').collect()[0].n == 3
    finally:
        e2.close()


def test_dump_xz(eng, tmp_path):
    out = tmp_path / "out"
    eng.dump(str(out), format="csv", compression="xz")
    with lzma.open(out / "people.csv.xz", "rt") as f:
        assert f.readline().strip() == "id,name,score"


def test_dump_bz2_write_rejected(eng, tmp_path):
    with pytest.raises(FilesqlError):
        eng.dump(str(tmp_path / "o"), format="csv", compression="bz2")


def test_dump_parquet_external_codec_rejected(eng, tmp_path):
    # parity: filesql.go:716-719
    with pytest.raises(FilesqlError):
        eng.dump(str(tmp_path / "o"), format="parquet", compression="gz")


def test_auto_save_on_close(spark, tmp_path):
    (tmp_path / "t.csv").write_text("id,v\n1,2\n")
    out = tmp_path / "saved"
    eng = (
        fs.Builder()
        .add_path(str(tmp_path / "t.csv"))
        .enable_auto_save(str(out), format="csv")
        .open(spark=spark)
    )
    eng.execute("INSERT INTO t VALUES (2, 3)")
    eng.close()
    assert (out / "t.csv").exists()
    assert len((out / "t.csv").read_text().strip().split("\n")) == 3  # header + 2


def test_auto_save_on_commit(spark, tmp_path):
    (tmp_path / "t.csv").write_text("id,v\n1,2\n")
    out = tmp_path / "saved"
    eng = (
        fs.Builder()
        .add_path(str(tmp_path / "t.csv"))
        .enable_auto_save(str(out), format="csv", on="commit")
        .open(spark=spark)
    )
    eng.begin()
    eng.execute("UPDATE t SET v = 99 WHERE id = 1")
    eng.commit()
    assert "1,99" in (out / "t.csv").read_text()
    eng.close()


def test_auto_save_overwrite_original(spark, tmp_path):
    # empty output_dir → overwrite input files in place (save.go:386-399)
    src = tmp_path / "t.csv"
    src.write_text("id,v\n1,2\n")
    eng = (
        fs.Builder()
        .add_path(str(src))
        .enable_auto_save("", on="close")
        .open(spark=spark)
    )
    eng.execute("DELETE FROM t WHERE id = 1")
    eng.close()
    content = src.read_text().strip().split("\n")
    assert content[0] == "id,v" and len(content) == 1


def test_csv_rfc4180_quote_roundtrip(spark, tmp_path):
    """Embedded quotes/commas must round-trip as RFC-4180 doubled quotes
    (the reference's encoding/csv convention), not backslash escapes."""
    import filesql_spark as fs

    (tmp_path / "t.csv").write_text('id,txt\n1,"say ""hi"", ok"\n')
    with fs.open(str(tmp_path / "t.csv"), spark=spark) as eng:
        assert eng.query("SELECT txt FROM t").collect()[0].txt == 'say "hi", ok'
        out = tmp_path / "out"
        eng.dump(str(out))
        assert '"say ""hi"", ok"' in (out / "t.csv").read_text()
    with fs.open(str(out / "t.csv"), spark=spark) as eng2:
        assert eng2.query("SELECT txt FROM t").collect()[0].txt == 'say "hi", ok'


# ------------------------------------------------------------ JSONL (r8)


def test_dump_jsonl_roundtrip(spark, tmp_path):
    import filesql_spark
    from filesql_spark.sources.loader import load_file

    src = tmp_path / "in"
    src.mkdir()
    (src / "t.csv").write_text("id,name,score\n1,ann,9.5\n2,bo,\n")
    eng = filesql_spark.open(str(src))
    out = tmp_path / "out"
    paths = eng.dump(str(out), format="jsonl")
    assert paths == [str(out / "t.jsonl")]
    (_, df), = load_file(spark, paths[0]).tables
    rows = {r.id: r for r in df.orderBy("id").collect()}
    assert rows[1].name == "ann" and rows[1].score == 9.5
    # NULLs are written explicitly (ignoreNullFields=false) and re-read as NULL
    assert rows[2].score is None


def test_dump_jsonl_gz(spark, tmp_path):
    import gzip as _gzip
    import json

    import filesql_spark

    src = tmp_path / "in"
    src.mkdir()
    (src / "t.csv").write_text("id,v\n1,a\n")
    eng = filesql_spark.open(str(src))
    out = tmp_path / "out"
    (p,) = eng.dump(str(out), format="jsonl", compression="gz")
    assert p.endswith("t.jsonl.gz")
    with _gzip.open(p, "rt") as f:
        assert json.loads(f.readline()) == {"id": 1, "v": "a"}


def test_dump_orc_roundtrip(spark, tmp_path):
    import filesql_spark
    from filesql_spark.errors import FilesqlError
    from filesql_spark.sources.loader import load_file

    src = tmp_path / "in"
    src.mkdir()
    (src / "t.csv").write_text("id,name\n1,ann\n2,bo\n")
    eng = filesql_spark.open(str(src))
    out = tmp_path / "out"
    paths = eng.dump(str(out), format="orc")
    assert paths == [str(out / "t.orc")]
    (_, df), = load_file(spark, paths[0]).tables
    assert dict(df.dtypes)["id"] == "bigint"  # typed round-trip
    assert {(r.id, r.name) for r in df.collect()} == {(1, "ann"), (2, "bo")}
    import pytest as _pytest

    with _pytest.raises(FilesqlError):
        eng.dump(str(out), format="orc", compression="gz")


def test_dump_jsonl_all_null_column(spark, tmp_path):
    """An all-NULL column keeps its name through a JSONL round trip
    (ignoreNullFields=false — ADVICE r8)."""
    import filesql_spark
    from filesql_spark.sources.loader import load_file

    src = tmp_path / "in"
    src.mkdir()
    (src / "t.csv").write_text("id,gone\n1,\n2,\n")
    eng = filesql_spark.open(str(src))
    out = tmp_path / "out"
    (p,) = eng.dump(str(out), format="jsonl")
    (_, df), = load_file(spark, p).tables
    assert "gone" in df.columns
    assert all(r.gone is None for r in df.collect())


def test_dump_xz_multifile(eng, tmp_path):
    """single_file=False with xz recompresses each part in the .d dir
    instead of crashing on the missing single-file path (ADVICE r8)."""
    import glob as _glob

    out = tmp_path / "outm"
    (p,) = eng.dump(str(out), format="csv", compression="xz", single_file=False)
    assert not os.path.exists(p)  # multi-file: data lives in p + ".d"
    parts = sorted(_glob.glob(os.path.join(p + ".d", "part-*.xz")))
    assert parts, "expected xz-tagged part files"
    text = "".join(
        lzma.open(part, "rt").read() for part in parts
    )
    assert "alice" in text and text.startswith("id,name,score")
