"""Engine API: open/query/DML/transactions/auto-save/catalog compat.

Ports the observable behaviors of the reference's integration tests
(filesql_test.go:116-180 TestSQLQueries; builder_test.go:609-958 auto-save).
"""

from __future__ import annotations

import pytest

import filesql_spark as fs
from filesql_spark.engine import Engine
from filesql_spark.errors import DuplicateTableError, FilesqlError, TransactionError

SAMPLE = "id,name,age,email\n1,John Doe,30,john@example.com\n2,Jane Smith,25,jane@example.com\n3,Bob Johnson,35,bob@example.com\n"


@pytest.fixture
def eng(spark, tmp_path):
    (tmp_path / "sample.csv").write_text(SAMPLE)
    e = fs.open(str(tmp_path / "sample.csv"), spark=spark)
    yield e
    e.close()


def test_open_and_query(eng):
    # TestSQLQueries' three assertions (filesql_test.go:116-180)
    assert eng.query("SELECT COUNT(*) AS n FROM sample").collect()[0].n == 3
    assert eng.query("SELECT name FROM sample WHERE id = 1").collect()[0].name == "John Doe"
    assert eng.query("SELECT COUNT(*) AS n FROM sample WHERE age > 30").collect()[0].n == 1


def test_quoted_identifiers(eng):
    assert eng.query('SELECT "name" FROM "sample" WHERE "id" = 2').collect()[0].name == "Jane Smith"


def test_sqlite_master(eng):
    rows = eng.query("SELECT name FROM sqlite_master WHERE type='table'").collect()
    assert [r.name for r in rows] == ["sample"]
    sql = eng.query("SELECT sql FROM sqlite_master").collect()[0].sql
    assert 'CREATE TABLE "sample"' in sql and '"age" INTEGER' in sql


def test_pragma_table_info(eng):
    rows = eng.query("PRAGMA table_info(sample)").collect()
    assert [(r.name, r.type) for r in rows] == [
        ("id", "INTEGER"),
        ("name", "TEXT"),
        ("age", "INTEGER"),
        ("email", "TEXT"),
    ]


def test_pragma_index_list_and_database_list(eng):
    import pytest as _pytest

    from filesql_spark.errors import FilesqlError

    assert eng.query("PRAGMA index_list(sample)").collect() == []
    with _pytest.raises(FilesqlError):
        eng.query("PRAGMA index_list(nonexistent)")
    rows = eng.query("PRAGMA database_list").collect()
    assert [(r.seq, r.name) for r in rows] == [(0, "main")]


def test_insert_values(eng):
    n = eng.execute("INSERT INTO sample VALUES (4, 'Ann Lee', 41, 'ann@example.com')")
    assert n == 1
    assert eng.query("SELECT COUNT(*) AS n FROM sample").collect()[0].n == 4
    assert eng.query("SELECT age FROM sample WHERE id = 4").collect()[0].age == 41


def test_insert_with_columns(eng):
    n = eng.execute("INSERT INTO sample (id, name) VALUES (5, 'NoAge'), (6, 'Also')")
    assert n == 2
    row = eng.query("SELECT * FROM sample WHERE id = 5").collect()[0]
    assert row.age is None and row.name == "NoAge"


def test_insert_select(eng):
    n = eng.execute(
        "INSERT INTO sample SELECT id + 100, name, age, email FROM sample WHERE age >= 30"
    )
    assert n == 2
    assert eng.query("SELECT COUNT(*) AS n FROM sample").collect()[0].n == 5


def test_update(eng):
    n = eng.execute("UPDATE sample SET age = age + 1 WHERE id = 1")
    assert n == 1
    assert eng.query("SELECT age FROM sample WHERE id = 1").collect()[0].age == 31
    # unmatched rows untouched
    assert eng.query("SELECT age FROM sample WHERE id = 2").collect()[0].age == 25


def test_update_all_rows(eng):
    assert eng.execute("UPDATE sample SET email = 'x@y.z'") == 3


def test_delete(eng):
    n = eng.execute("DELETE FROM sample WHERE age > 30")
    assert n == 1
    assert eng.query("SELECT COUNT(*) AS n FROM sample").collect()[0].n == 2


def test_transaction_rollback(eng):
    eng.begin()
    eng.execute("DELETE FROM sample")
    assert eng.query("SELECT COUNT(*) AS n FROM sample").collect()[0].n == 0
    eng.rollback()
    assert eng.query("SELECT COUNT(*) AS n FROM sample").collect()[0].n == 3


def test_transaction_commit(eng):
    eng.begin()
    eng.execute("INSERT INTO sample VALUES (9, 'T', 1, 'e')")
    eng.commit()
    assert eng.query("SELECT COUNT(*) AS n FROM sample").collect()[0].n == 4
    with pytest.raises(TransactionError):
        eng.commit()


def test_create_table_and_view(eng):
    eng.execute("CREATE TABLE extra (k INTEGER, v TEXT)")
    assert eng.query("SELECT COUNT(*) AS n FROM extra").collect()[0].n == 0
    eng.execute("INSERT INTO extra VALUES (1, 'a')")
    eng.execute("CREATE VIEW adults AS SELECT * FROM sample WHERE age >= 30")
    assert eng.query("SELECT COUNT(*) AS n FROM adults").collect()[0].n == 2
    kinds = {
        (r.type, r.name)
        for r in eng.query("SELECT type, name FROM sqlite_master").collect()
    }
    assert ("table", "extra") in kinds and ("view", "adults") in kinds
    eng.execute("DROP TABLE extra")
    assert "extra" not in eng.table_names()


def test_create_index_noop_and_trigger_error(eng):
    assert eng.execute("CREATE INDEX idx ON sample(id)") == 0
    with pytest.raises(FilesqlError):
        eng.execute("CREATE TRIGGER tr AFTER INSERT ON sample BEGIN SELECT 1; END")


def test_duplicate_table_error(spark, tmp_path):
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir()
    d2.mkdir()
    (d1 / "users.csv").write_text("id\n1\n")
    (d2 / "users.csv").write_text("id\n2\n")
    with pytest.raises(DuplicateTableError):
        fs.open(str(d1 / "users.csv"), str(d2 / "users.csv"), spark=spark)


def test_builder_reader(spark):
    eng = (
        fs.Builder()
        .add_reader(b"id,v\n1,10\n2,20\n", "inline", "csv")
        .open(spark=spark)
    )
    try:
        assert eng.query("SELECT SUM(v) AS s FROM inline").collect()[0].s == 30
    finally:
        eng.close()


def test_dialect_through_engine(eng):
    # strftime through the shim on a datetime-typed string column
    (row,) = eng.query(
        "SELECT strftime('%Y', '2024-03-05') AS y"
    ).collect()
    assert row.y == "2024"


def test_rollback_drops_views_created_in_txn(eng):
    """A rolled-back CREATE TABLE/VIEW must vanish from spark.sql too, not
    just from the engine catalog (ADVICE r1: temp view leak)."""
    eng.begin()
    eng.execute("CREATE TABLE txn_tmp (k INTEGER)")
    assert eng.query("SELECT COUNT(*) AS n FROM txn_tmp").collect()[0].n == 0
    eng.rollback()
    assert "txn_tmp" not in eng.table_names()
    with pytest.raises(Exception):
        eng.query("SELECT * FROM txn_tmp").collect()


def test_create_existing_table_raises(eng):
    """SQLite: CREATE TABLE over an existing name is an error; silently
    replacing would drop user data (ADVICE r1)."""
    eng.execute("CREATE TABLE dup_t (k INTEGER)")
    with pytest.raises(DuplicateTableError):
        eng.execute("CREATE TABLE dup_t (k INTEGER)")
    assert eng.execute("CREATE TABLE IF NOT EXISTS dup_t (k INTEGER)") == 0
    eng.execute("DROP TABLE dup_t")


def test_execute_script_multi_statement(eng):
    """database/sql-style script execution (reference example_test.go:295
    feeds semicolon-separated DDL+DML scripts verbatim)."""
    n = eng.execute_script(
        """
        CREATE TABLE scratch (id INTEGER, tag TEXT);
        INSERT INTO scratch VALUES (1, 'a; not a split'), (2, 'b');
        UPDATE scratch SET tag = 'z' WHERE id = 2;
        -- trailing comment statement
        """
    )
    assert n == 3  # 2 inserted + 1 updated (CREATE contributes 0)
    rows = eng.query("SELECT id, tag FROM scratch ORDER BY id").collect()
    assert [(r.id, r.tag) for r in rows] == [(1, "a; not a split"), (2, "z")]


def test_execute_script_savepoint_rejected(eng):
    with pytest.raises(TransactionError, match="SAVEPOINT"):
        eng.execute_script("SAVEPOINT sp1; INSERT INTO sample VALUES (9,'x',1,'e')")


def test_nested_begin_mentions_savepoints(eng):
    eng.begin()
    with pytest.raises(TransactionError, match="SAVEPOINT"):
        eng.begin()
    eng.rollback()


def test_insert_or_replace_clean_error(eng):
    with pytest.raises(FilesqlError, match="not supported"):
        eng.execute("INSERT OR REPLACE INTO sample VALUES (1,'x',1,'e')")
    with pytest.raises(FilesqlError, match="not supported"):
        eng.execute(
            "INSERT INTO sample VALUES (9,'x',1,'e') ON CONFLICT (id) DO NOTHING"
        )


def test_insert_returning(eng):
    """SQLite 3.35+ RETURNING on INSERT: the inserted rows come back as a
    result set (query()); execute() applies the insert and reports count."""
    df = eng.query(
        "INSERT INTO sample (id, name, age) VALUES (9, 'Zed', 41), (10, 'Yan', 17) "
        "RETURNING id, name"
    )
    assert [(r.id, r.name) for r in df.collect()] == [(9, "Zed"), (10, "Yan")]
    assert eng.query("SELECT COUNT(*) AS n FROM sample").collect()[0].n == 5
    df2 = eng.query("INSERT INTO sample (id, name) VALUES (11, 'Quo') RETURNING *")
    row = df2.collect()[0]
    assert (row.id, row.name, row.age, row.email) == (11, "Quo", None, None)


def test_insert_without_returning_via_query_raises(eng):
    with pytest.raises(FilesqlError, match="RETURNING"):
        eng.query("INSERT INTO sample VALUES (9, 'x', 1, 'e')")


def test_update_delete_returning_clean_error(eng):
    with pytest.raises(FilesqlError, match="RETURNING is only supported"):
        eng.execute("UPDATE sample SET age = 1 WHERE id = 1 RETURNING id")
    with pytest.raises(FilesqlError, match="RETURNING is only supported"):
        eng.execute("DELETE FROM sample WHERE id = 1 RETURNING *")


def test_returning_in_string_literal_not_detected(eng):
    # the word 'returning' inside inserted data must not trigger the parser
    n = eng.execute("INSERT INTO sample (id, name) VALUES (12, 'returning home')")
    assert n == 1
    assert eng.query("SELECT name FROM sample WHERE id = 12").collect()[0].name \
        == "returning home"


def test_insert_with_on_conflict_text_in_values(eng):
    # ADVICE r4: a literal containing 'on conflict' must not trip the
    # upsert guard (it scans literal-blanked text only)
    n = eng.execute("INSERT INTO sample (id, name) VALUES (13, 'we are ON CONFLICT here')")
    assert n == 1


def test_execute_script_comment_aware(eng):
    """ADVICE r4: semicolons and apostrophes inside -- and /* */ comments
    must not split statements or open phantom string tokens."""
    n = eng.execute_script(
        """
        -- don't split; here
        CREATE TABLE notes (id INTEGER, t TEXT);
        /* a block; with 'quotes' and ; semicolons */
        INSERT INTO notes VALUES (1, 'a'); -- tail comment; with semicolon
        INSERT INTO notes VALUES (2, 'b');
        """
    )
    assert n == 2
    assert eng.query("SELECT COUNT(*) AS n FROM notes").collect()[0].n == 2


def test_explain_query_plan(eng):
    """SQLite's EXPLAIN QUERY PLAN surface: one text row per plan line of
    the underlying Spark physical plan."""
    rows = eng.query("EXPLAIN QUERY PLAN SELECT name FROM sample WHERE id = 1").collect()
    text = "\n".join(r.detail for r in rows)
    assert "Filter" in text and len(rows) > 3
    rows2 = eng.query("EXPLAIN SELECT COUNT(*) FROM sample").collect()
    assert any("Aggregate" in r.detail for r in rows2)


def test_dml_with_comments(eng):
    n = eng.execute("-- add a row; carefully\nINSERT INTO sample (id, name) VALUES (20, 'Cmt')")
    assert n == 1
    n = eng.execute("/* block 'comment' */ DELETE FROM sample WHERE id = 20")
    assert n == 1
