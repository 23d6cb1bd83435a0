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
    # INSTEAD OF and SELECT-with-RAISE are supported since r11; the
    # remaining hard rejections:
    with pytest.raises(FilesqlError, match="cannot create INSTEAD OF trigger on table"):
        eng.execute(
            "CREATE TRIGGER v INSTEAD OF INSERT ON customers BEGIN "
            "INSERT INTO audit VALUES ('x', 'y'); END"
        )
    with pytest.raises(FilesqlError, match="RAISE\\(\\) is only supported inside"):
        eng.execute(
            "CREATE TRIGGER r AFTER INSERT ON customers BEGIN "
            "INSERT INTO audit VALUES (RAISE(ABORT, 'no'), 'y'); END"
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
    # SQLite's exact wording: BEFORE/AFTER triggers are for tables only
    with pytest.raises(FilesqlError, match="cannot create AFTER trigger on view: v"):
        eng.execute(
            "CREATE TRIGGER tv AFTER INSERT ON v BEGIN "
            "INSERT INTO audit VALUES ('x', 'y'); END"
        )


# ------------------------------------------- INSTEAD OF + RAISE() (r11)
# Every expectation below was pinned against stdlib sqlite3 first
# (wordings, table effects, changes() counts).


@pytest.fixture
def veng(spark, tmp_path):
    (tmp_path / "base.csv").write_text("id,n\n9,999\n")
    e = fs.open(str(tmp_path / "base.csv"), spark=spark)
    e.execute("DELETE FROM base")
    e.execute("CREATE VIEW v AS SELECT id, n * 2 AS dbl FROM base")
    yield e
    e.close()


def test_instead_of_registration_errors(veng):
    with pytest.raises(FilesqlError, match=r"^cannot create INSTEAD OF trigger on table: base$"):
        veng.execute(
            "CREATE TRIGGER b1 INSTEAD OF INSERT ON base "
            "BEGIN SELECT RAISE(ABORT, 'x'); END"
        )
    with pytest.raises(FilesqlError, match=r"^cannot create BEFORE trigger on view: v$"):
        veng.execute(
            "CREATE TRIGGER b2 BEFORE INSERT ON v "
            "BEGIN SELECT RAISE(ABORT, 'x'); END"
        )
    with pytest.raises(FilesqlError, match=r"^cannot modify v because it is a view$"):
        veng.execute("INSERT INTO v VALUES (1, 2)")


def test_instead_of_insert_updatable_view(veng):
    """SQLite's updatable-view pattern: the trigger body writes the base
    table; the view (dynamic since r11) reflects it; changes() is 0."""
    veng.execute(
        "CREATE TRIGGER vi INSTEAD OF INSERT ON v BEGIN "
        "INSERT INTO base VALUES (NEW.id, NEW.dbl / 2); END"
    )
    n = veng.execute("INSERT INTO v VALUES (1, 20), (2, 40)")
    assert n == 0  # sqlite3: changes() == 0 for INSTEAD OF DML
    base = [(r.id, r.n) for r in veng.query("SELECT * FROM base ORDER BY id").collect()]
    assert base == [(1, 10), (2, 20)]
    view = [(r.id, r.dbl) for r in veng.query("SELECT * FROM v ORDER BY id").collect()]
    assert view == [(1, 20), (2, 40)]


def test_instead_of_update_and_delete(veng):
    veng.execute(
        "CREATE TRIGGER vi INSTEAD OF INSERT ON v BEGIN "
        "INSERT INTO base VALUES (NEW.id, NEW.dbl / 2); END"
    )
    veng.execute(
        "CREATE TRIGGER vu INSTEAD OF UPDATE ON v BEGIN "
        "UPDATE base SET n = NEW.dbl / 2 WHERE id = OLD.id; END"
    )
    veng.execute(
        "CREATE TRIGGER vd INSTEAD OF DELETE ON v BEGIN "
        "DELETE FROM base WHERE id = OLD.id; END"
    )
    veng.execute("INSERT INTO v VALUES (1, 20), (2, 40)")
    veng.execute("UPDATE v SET dbl = 100 WHERE id = 1")
    base = [(r.id, r.n) for r in veng.query("SELECT * FROM base ORDER BY id").collect()]
    assert base == [(1, 50), (2, 20)]
    veng.execute("DELETE FROM v WHERE dbl = 100")
    base = [(r.id, r.n) for r in veng.query("SELECT * FROM base ORDER BY id").collect()]
    assert base == [(2, 20)]


def test_raise_abort_undoes_statement(eng):
    eng.execute(
        "CREATE TRIGGER guard BEFORE INSERT ON audit BEGIN "
        "SELECT RAISE(ABORT, 'custom msg') WHERE NEW.who = 'bad'; END"
    )
    with pytest.raises(FilesqlError, match=r"^custom msg$"):
        eng.execute("INSERT INTO audit VALUES ('bad', 'x'), ('ok', 'y')")
    # sqlite3: ABORT undoes the whole statement, good rows included
    assert eng.query("SELECT count(*) AS n FROM audit").collect()[0].n == 0


def test_raise_case_form(eng):
    eng.execute(
        "CREATE TRIGGER guard BEFORE INSERT ON audit BEGIN "
        "SELECT CASE WHEN length(NEW.who) > 5 THEN "
        "RAISE(ABORT, 'too long') END; END"
    )
    with pytest.raises(FilesqlError, match=r"^too long$"):
        eng.execute("INSERT INTO audit VALUES ('toolongname', 'x')")
    eng.execute("INSERT INTO audit VALUES ('ok', 'y')")
    assert eng.query("SELECT count(*) AS n FROM audit").collect()[0].n == 1


def test_raise_rollback_cancels_transaction(eng):
    from filesql_spark.errors import TransactionError

    eng.execute(
        "CREATE TRIGGER guard BEFORE INSERT ON audit BEGIN "
        "SELECT RAISE(ROLLBACK, 'rb') WHERE NEW.who = 'bad'; END"
    )
    eng.execute("BEGIN")
    eng.execute("INSERT INTO audit VALUES ('ok', 'x')")
    with pytest.raises(FilesqlError, match=r"^rb$"):
        eng.execute("INSERT INTO audit VALUES ('bad', 'y')")
    # whole transaction gone AND ended (sqlite3: COMMIT then errors)
    assert eng.query("SELECT count(*) AS n FROM audit").collect()[0].n == 0
    with pytest.raises(TransactionError):
        eng.execute("COMMIT")


def test_raise_fail_keeps_effects(eng):
    eng.execute(
        "CREATE TRIGGER guard AFTER INSERT ON audit BEGIN "
        "SELECT RAISE(FAIL, 'fl') WHERE NEW.who = 'bad'; END"
    )
    with pytest.raises(FilesqlError, match=r"^fl$"):
        eng.execute("INSERT INTO audit VALUES ('bad', 'x')")
    # sqlite3 (AFTER + FAIL): the row stays
    assert eng.query("SELECT count(*) AS n FROM audit").collect()[0].n == 1


def test_raise_existence_check_with_from(eng):
    """The dup-check pattern: the body SELECT has its own FROM and
    correlates it with NEW — evaluated as one cross join, set-based."""
    eng.execute(
        "CREATE TRIGGER no_dup BEFORE INSERT ON audit BEGIN "
        "SELECT RAISE(ABORT, 'duplicate who') FROM customers "
        "WHERE customers.name = NEW.who; END"
    )
    with pytest.raises(FilesqlError, match=r"^duplicate who$"):
        eng.execute("INSERT INTO audit VALUES ('alice', 'x')")
    eng.execute("INSERT INTO audit VALUES ('nobody', 'x')")
    assert eng.query("SELECT count(*) AS n FROM audit").collect()[0].n == 1


def test_raise_ignore_unsupported(eng):
    with pytest.raises(FilesqlError, match="RAISE\\(IGNORE\\) is not supported"):
        eng.execute(
            "CREATE TRIGGER g BEFORE INSERT ON audit BEGIN "
            "SELECT RAISE(IGNORE) WHERE NEW.who = 'bad'; END"
        )


def test_raise_outside_trigger_wording(eng):
    with pytest.raises(
        FilesqlError, match=r"^RAISE\(\) may only be used within a trigger-program$"
    ):
        eng.query("SELECT RAISE(ABORT, 'x')")


def test_plain_select_body_still_rejected(eng):
    with pytest.raises(FilesqlError, match="only supported when it contains RAISE"):
        eng.execute(
            "CREATE TRIGGER g BEFORE INSERT ON audit BEGIN SELECT 1; END"
        )


def test_views_are_dynamic(veng):
    """SQLite views see base-table changes (r11 fix: they were frozen at
    CREATE VIEW time)."""
    veng.execute("INSERT INTO base VALUES (1, 10)")
    assert [(r.id, r.dbl) for r in veng.query("SELECT * FROM v").collect()] == [(1, 20)]
    veng.execute("UPDATE base SET n = 50 WHERE id = 1")
    assert [(r.id, r.dbl) for r in veng.query("SELECT * FROM v").collect()] == [(1, 100)]
    veng.execute("BEGIN")
    veng.execute("DELETE FROM base")
    assert veng.query("SELECT count(*) AS c FROM v").collect()[0].c == 0
    veng.execute("ROLLBACK")
    assert veng.query("SELECT count(*) AS c FROM v").collect()[0].c == 1


def test_upsert_paths_fire_triggers_like_sqlite(spark, tmp_path):
    """Upsert trigger firing, pinned against sqlite3 (recursive_triggers
    OFF, the default): OR REPLACE fires INSERT for landed rows (never
    DELETE for the implicit replace), OR IGNORE/DO NOTHING only for
    actually-inserted rows, DO UPDATE fires UPDATE on hits and INSERT
    on misses."""
    import sqlite3

    def sqlite_log(stmts):
        con = sqlite3.connect(":memory:")
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
        con.execute("CREATE TABLE log (ev TEXT, id INTEGER)")
        for ev, img in (("ins", "NEW"), ("upd", "NEW"), ("del", "OLD")):
            verb = {"ins": "INSERT", "upd": "UPDATE", "del": "DELETE"}[ev]
            con.execute(
                f"CREATE TRIGGER t{ev} AFTER {verb} ON t BEGIN "
                f"INSERT INTO log VALUES ('{ev}', {img}.id); END"
            )
        con.execute("INSERT INTO t VALUES (1, 'a')")
        con.execute("DELETE FROM log")
        for s in stmts:
            con.execute(s)
        out = sorted(con.execute("SELECT * FROM log").fetchall())
        con.close()
        return out

    (tmp_path / "seed.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "seed.csv"), spark=spark)
    eng.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    eng.execute("CREATE TABLE log (ev TEXT, id INTEGER)")
    for ev, img in (("ins", "NEW"), ("upd", "NEW"), ("del", "OLD")):
        verb = {"ins": "INSERT", "upd": "UPDATE", "del": "DELETE"}[ev]
        eng.execute(
            f"CREATE TRIGGER t{ev} AFTER {verb} ON t BEGIN "
            f"INSERT INTO log VALUES ('{ev}', {img}.id); END"
        )
    eng.execute("INSERT INTO t VALUES (1, 'a')")
    eng.execute("DELETE FROM log")

    cases = [
        ["INSERT OR REPLACE INTO t VALUES (1, 'b')"],
        ["INSERT OR REPLACE INTO t VALUES (2, 'c')"],
        ["INSERT OR IGNORE INTO t VALUES (1, 'z')"],
        ["INSERT OR IGNORE INTO t VALUES (3, 'd')"],
        ["INSERT INTO t VALUES (1, 'e') "
         "ON CONFLICT(id) DO UPDATE SET v = excluded.v"],
        ["INSERT INTO t VALUES (4, 'f') "
         "ON CONFLICT(id) DO UPDATE SET v = excluded.v"],
        ["INSERT INTO t VALUES (1, 'g') ON CONFLICT(id) DO NOTHING"],
    ]
    for stmts in cases:
        expected = sqlite_log(stmts)
        eng.execute("DELETE FROM log")
        # the DELETE fires tdel into log — clear again without triggers
        # interfering (log has no triggers, t does)
        eng.execute("DELETE FROM log")
        for s in stmts:
            eng.execute(s)
        got = sorted(
            (r.ev, r.id) for r in eng.query("SELECT * FROM log").collect()
        )
        assert got == expected, (stmts, got, expected)
    eng.close()


def test_last_insert_rowid_under_triggers(spark, tmp_path):
    """r12 ADVICE: the counter across trigger fires and RAISE unwinds —
    every expectation pinned against stdlib sqlite3 side by side.
    sqlite3_last_insert_rowid(): body INSERTs revert when the trigger
    program ends; an AFTER-trigger RAISE keeps the aborted row's rowid
    (the row landed, then was undone); a BEFORE-trigger RAISE leaves the
    counter untouched (no row ever landed)."""
    import sqlite3

    def scenario(exe, q):
        out = []
        exe("CREATE TABLE k (pk INTEGER PRIMARY KEY, v TEXT)")
        exe("CREATE TABLE log (pk INTEGER PRIMARY KEY, note TEXT)")
        exe("INSERT INTO k VALUES (10, 'seed')")
        out.append(q())                                   # 10
        # body INSERT reverts once the trigger ends
        exe("CREATE TRIGGER tlog AFTER INSERT ON k WHEN new.v <> 'bad' "
            "BEGIN INSERT INTO log VALUES (900 + new.pk, 'l'); END")
        exe("INSERT INTO k VALUES (20, 'ok')")
        out.append(q())                                   # 20, not 920
        # AFTER RAISE(ABORT): row undone, counter keeps the undone rowid
        exe("CREATE TRIGGER tabort AFTER INSERT ON k WHEN new.v = 'bad' "
            "BEGIN SELECT RAISE(ABORT, 'no'); END")
        try:
            exe("INSERT INTO k VALUES (30, 'bad')")
        except Exception:
            pass
        out.append(q())                                   # 30
        # BEFORE RAISE(ABORT): counter untouched
        exe("CREATE TABLE j (pk INTEGER PRIMARY KEY, v TEXT)")
        exe("CREATE TRIGGER jabort BEFORE INSERT ON j WHEN new.v = 'bad' "
            "BEGIN SELECT RAISE(ABORT, 'no'); END")
        exe("INSERT INTO j VALUES (40, 'ok')")
        out.append(q())                                   # 40
        try:
            exe("INSERT INTO j VALUES (50, 'bad')")
        except Exception:
            pass
        out.append(q())                                   # still 40
        return out

    con = sqlite3.connect(":memory:")
    expected = scenario(
        con.execute,
        lambda: con.execute("SELECT last_insert_rowid()").fetchone()[0],
    )
    con.close()
    assert expected == [10, 20, 30, 40, 40]  # pins stay honest

    (tmp_path / "seedfile.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "seedfile.csv"), spark=spark)
    try:
        got = scenario(
            eng.execute,
            lambda: eng.query(
                "SELECT last_insert_rowid() AS r"
            ).collect()[0].r,
        )
    finally:
        eng.close()
    assert got == expected, (got, expected)


def test_rowid_hwm_reuse_after_abort(spark, tmp_path):
    """An aborted INSERT's implicit rowids are reused by the next INSERT
    (SQLite's max rowid reverts with the undone rows) — pinned against
    stdlib sqlite3 on an implicit-rowid table."""
    import sqlite3

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE s (a INTEGER, b TEXT)")
    con.executemany("INSERT INTO s VALUES (?,?)", [(1, "x"), (2, "y")])
    con.execute("CREATE TRIGGER tr AFTER INSERT ON s WHEN new.b = 'bad' "
                "BEGIN SELECT RAISE(ABORT, 'no'); END")
    try:
        con.execute("INSERT INTO s VALUES (3, 'bad')")
    except sqlite3.Error:
        pass
    con.execute("INSERT INTO s VALUES (4, 'ok')")
    expected = con.execute("SELECT last_insert_rowid()").fetchone()[0]
    con.close()
    assert expected == 3  # the aborted row's rowid was reused

    (tmp_path / "s.csv").write_text("a,b\n1,x\n2,y\n")
    eng = fs.open(str(tmp_path / "s.csv"), spark=spark)
    try:
        eng.execute("CREATE TRIGGER tr AFTER INSERT ON s WHEN new.b = 'bad' "
                    "BEGIN SELECT RAISE(ABORT, 'no'); END")
        with pytest.raises(FilesqlError):
            eng.execute("INSERT INTO s VALUES (3, 'bad')")
        eng.execute("INSERT INTO s VALUES (4, 'ok')")
        got = eng.query("SELECT last_insert_rowid() AS r").collect()[0].r
    finally:
        eng.close()
    assert got == expected, (got, expected)
