"""CREATE TRIGGER subset (triggers.py) — closes the last advertised
reference capability gap (reference README.md:333-334, doc.go:74 inherit
SQLite triggers; VERDICT r8 #3)."""

from __future__ import annotations

import pytest

import filesql_spark as fs
from filesql_spark.errors import FilesqlError


@pytest.fixture
def eng(spark, tmp_path):
    (tmp_path / "customers.csv").write_text(
        "name,address\nalice,1 Oak St\nbob,2 Elm St\n"
    )
    (tmp_path / "orders.csv").write_text(
        "order_id,customer_name,address\n"
        "1,alice,1 Oak St\n2,alice,1 Oak St\n3,bob,2 Elm St\n"
    )
    e = fs.open(str(tmp_path), spark=spark)
    e.execute("CREATE TABLE audit (who TEXT, what TEXT)")
    yield e
    e.close()


def test_sqlite_docs_cascade_example(eng):
    """The UPDATE OF cascade from SQLite's lang_createtrigger.html,
    verbatim: customer address changes propagate to their orders."""
    eng.execute(
        """
        CREATE TRIGGER update_customer_address UPDATE OF address ON customers
          BEGIN
            UPDATE orders SET address = new.address
             WHERE customer_name = old.name;
          END
        """
    )
    eng.execute("UPDATE customers SET address = '9 Pine Ave' WHERE name = 'alice'")
    rows = {
        r.order_id: r.address
        for r in eng.query("SELECT * FROM orders").collect()
    }
    assert rows == {1: "9 Pine Ave", 2: "9 Pine Ave", 3: "2 Elm St"}


def test_update_of_skips_other_columns(eng):
    eng.execute(
        """
        CREATE TRIGGER t UPDATE OF address ON customers BEGIN
          INSERT INTO audit VALUES (old.name, 'addr');
        END
        """
    )
    eng.execute("UPDATE customers SET name = 'al' WHERE name = 'alice'")
    assert eng.query("SELECT COUNT(*) AS n FROM audit").collect()[0].n == 0
    eng.execute("UPDATE customers SET address = 'x' WHERE name = 'al'")
    assert eng.query("SELECT COUNT(*) AS n FROM audit").collect()[0].n == 1


def test_after_insert_audit_with_when(eng):
    eng.execute(
        """
        CREATE TRIGGER log_ins AFTER INSERT ON customers
          WHEN new.name != 'system'
          BEGIN INSERT INTO audit VALUES (new.name, 'inserted'); END
        """
    )
    eng.execute(
        "INSERT INTO customers VALUES ('carol', 'x'), ('system', 'y'), ('dave', 'z')"
    )
    got = sorted(r.who for r in eng.query("SELECT who FROM audit").collect())
    assert got == ["carol", "dave"]  # WHEN filtered 'system'; one row per insert


def test_after_delete_old_values(eng):
    eng.execute(
        "CREATE TRIGGER d AFTER DELETE ON customers BEGIN "
        "INSERT INTO audit VALUES (old.name, old.address); END"
    )
    eng.execute("DELETE FROM customers WHERE name = 'bob'")
    assert [tuple(r) for r in eng.query("SELECT * FROM audit").collect()] == [
        ("bob", "2 Elm St")
    ]


def test_cascading_triggers_and_depth_cap(eng):
    eng.execute("CREATE TABLE l2 (v TEXT)")
    eng.execute(
        "CREATE TRIGGER a AFTER INSERT ON customers BEGIN "
        "INSERT INTO audit VALUES (new.name, 'l1'); END"
    )
    eng.execute(
        "CREATE TRIGGER b AFTER INSERT ON audit BEGIN "
        "INSERT INTO l2 VALUES (new.who); END"
    )
    eng.execute("INSERT INTO customers VALUES ('zed', 'q')")
    assert eng.query("SELECT v FROM l2").collect()[0].v == "zed"
    # self-recursive trigger must hit the depth cap, not loop forever
    eng.execute(
        "CREATE TRIGGER loop AFTER INSERT ON l2 BEGIN "
        "INSERT INTO l2 VALUES (new.v); END"
    )
    with pytest.raises(FilesqlError, match="depth"):
        eng.execute("INSERT INTO l2 VALUES ('boom')")


def test_body_update_multi_match_raises(eng):
    # both incoming rows correlate to the same order row → ambiguous
    eng.execute(
        "CREATE TRIGGER m AFTER INSERT ON customers BEGIN "
        "UPDATE orders SET address = new.address WHERE order_id = 1; END"
    )
    with pytest.raises(FilesqlError, match="multiple transition rows"):
        eng.execute("INSERT INTO customers VALUES ('x', '1'), ('y', '2')")


def test_trigger_body_delete_correlated(eng):
    eng.execute(
        "CREATE TRIGGER gc AFTER DELETE ON customers BEGIN "
        "DELETE FROM orders WHERE customer_name = old.name; END"
    )
    eng.execute("DELETE FROM customers WHERE name = 'alice'")
    assert [
        r.order_id for r in eng.query("SELECT order_id FROM orders").collect()
    ] == [3]


def test_sqlite_master_and_drop(eng):
    eng.execute(
        "CREATE TRIGGER tr AFTER INSERT ON customers BEGIN "
        "INSERT INTO audit VALUES (new.name, 'i'); END"
    )
    row = eng.query(
        "SELECT type, name, tbl_name FROM sqlite_master WHERE type = 'trigger'"
    ).collect()
    assert [tuple(r) for r in row] == [("trigger", "tr", "customers")]
    eng.execute("DROP TRIGGER tr")
    assert (
        eng.query(
            "SELECT COUNT(*) AS n FROM sqlite_master WHERE type = 'trigger'"
        ).collect()[0].n
        == 0
    )
    with pytest.raises(FilesqlError, match="no such trigger"):
        eng.execute("DROP TRIGGER tr")
    eng.execute("DROP TRIGGER IF EXISTS tr")  # no-op


def test_create_trigger_transactional(eng):
    eng.begin()
    eng.execute(
        "CREATE TRIGGER tx AFTER INSERT ON customers BEGIN "
        "INSERT INTO audit VALUES (new.name, 'i'); END"
    )
    eng.rollback()
    eng.execute("INSERT INTO customers VALUES ('erin', 'e')")
    assert eng.query("SELECT COUNT(*) AS n FROM audit").collect()[0].n == 0


def test_drop_table_drops_its_triggers(eng):
    eng.execute("CREATE TABLE scratch (v TEXT)")
    eng.execute(
        "CREATE TRIGGER s AFTER INSERT ON scratch BEGIN "
        "INSERT INTO audit VALUES (new.v, 'i'); END"
    )
    eng.execute("DROP TABLE scratch")
    assert (
        eng.query(
            "SELECT COUNT(*) AS n FROM sqlite_master WHERE type = 'trigger'"
        ).collect()[0].n
        == 0
    )


def test_unsupported_trigger_forms(eng):
    with pytest.raises(FilesqlError, match="INSTEAD OF"):
        eng.execute(
            "CREATE TRIGGER v INSTEAD OF INSERT ON customers BEGIN "
            "INSERT INTO audit VALUES ('x', 'y'); END"
        )
    with pytest.raises(FilesqlError, match="unsupported statement"):
        eng.execute(
            "CREATE TRIGGER r AFTER INSERT ON customers BEGIN "
            "SELECT RAISE(ABORT, 'no'); END"
        )
    with pytest.raises(FilesqlError, match="no such table"):
        eng.execute(
            "CREATE TRIGGER g AFTER INSERT ON ghost BEGIN "
            "INSERT INTO audit VALUES ('x', 'y'); END"
        )


def test_if_not_exists_and_duplicate(eng):
    stmt = (
        "CREATE TRIGGER one AFTER INSERT ON customers BEGIN "
        "INSERT INTO audit VALUES (new.name, 'i'); END"
    )
    eng.execute(stmt)
    with pytest.raises(FilesqlError, match="already exists"):
        eng.execute(stmt)
    eng.execute(stmt.replace("CREATE TRIGGER one", "CREATE TRIGGER IF NOT EXISTS one"))
    # still exactly one firing per insert
    eng.execute("INSERT INTO customers VALUES ('solo', 's')")
    assert eng.query("SELECT COUNT(*) AS n FROM audit").collect()[0].n == 1


def test_trigger_on_view_rejected(eng):
    eng.execute("CREATE VIEW v AS SELECT * FROM customers")
    with pytest.raises(FilesqlError, match="cannot create trigger on view"):
        eng.execute(
            "CREATE TRIGGER tv AFTER INSERT ON v BEGIN "
            "INSERT INTO audit VALUES ('x', 'y'); END"
        )
