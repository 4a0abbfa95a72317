"""Branches + write-audit-publish: writable refs forked from any
snapshot, isolated commits, fast-forward publish, cherry-pick, and
expiry pinning. The reference's single catalog pointer swap
(pg_catalog.cpp:315-325) generalizes here to one pointer per ref —
main stays the pointer file, branches live in the refs file."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_lakehouse_spark.lakehouse import LakeCatalog, LakehouseError


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


@pytest.fixture()
def orders_df(spark, sf_dir):
    from pg_lakehouse_spark.tables import table

    return table(spark, sf_dir, "orders")


def test_branch_commits_isolated_from_main(catalog, orders_df):
    tbl = catalog.create_table_as("db", "t", orders_df.limit(100))
    main_rows = tbl.read().count()
    tbl.create_branch("audit")
    wap = tbl.for_branch("audit")
    wap.append(orders_df.limit(400).subtract(orders_df.limit(100)))

    # main unmoved; branch sees the extra rows; branch readable by name
    assert tbl.read().count() == main_rows
    assert wap.read().count() > main_rows
    assert tbl.read(snapshot="audit").count() == wap.read().count()
    # the branch commit is stamped with its ref name
    assert wap.snapshot().summary["branch"] == "audit"


def test_fast_forward_publishes_branch(catalog, orders_df):
    tbl = catalog.create_table_as("db", "t", orders_df.limit(50))
    tbl.create_branch("wap")
    wap = tbl.for_branch("wap")
    wap.append(orders_df.limit(80).subtract(orders_df.limit(50)))
    wap.append(orders_df.limit(90).subtract(orders_df.limit(80)))
    branch_rows = wap.read().count()

    head = tbl.fast_forward("wap")
    assert tbl.current_version() == head
    assert tbl.read().count() == branch_rows == 90


def test_fast_forward_rejects_diverged_main(catalog, orders_df):
    tbl = catalog.create_table_as("db", "t", orders_df.limit(50))
    tbl.create_branch("wap")
    wap = tbl.for_branch("wap")
    wap.append(orders_df.limit(60).subtract(orders_df.limit(50)))
    # main diverges after the fork
    tbl.append(orders_df.limit(70).subtract(orders_df.limit(60)))
    with pytest.raises(LakehouseError, match="not an .*ancestor|ancestor"):
        tbl.fast_forward("wap")


def test_cherry_pick_append_across_refs(catalog, orders_df):
    tbl = catalog.create_table_as("db", "t", orders_df.limit(50))
    tbl.create_branch("b")
    wap = tbl.for_branch("b")
    delta = orders_df.limit(60).subtract(orders_df.limit(50))
    picked = wap.append(delta)
    # main diverges, so fast-forward is off the table — cherry-pick the
    # branch append onto main instead
    tbl.append(orders_df.limit(75).subtract(orders_df.limit(60)))
    before = tbl.read().count()
    snap = tbl.cherry_pick(picked.version)
    assert snap.summary["cherry_picked_from"] == picked.version
    assert tbl.read().count() == before + delta.count()
    # data files are shared, not copied: picked entries exist once
    paths = [f["path"] for f in tbl.snapshot().files]
    assert len(paths) == len(set(paths))


def test_cherry_pick_rejects_dml_snapshots(catalog, orders_df):
    tbl = catalog.create_table_as("db", "t", orders_df.limit(50))
    tbl.delete(F.col("o_orderkey") <= 5)
    with pytest.raises(LakehouseError, match="append"):
        tbl.cherry_pick(tbl.current_version())


def test_dml_on_branch_leaves_main_untouched(catalog, orders_df):
    tbl = catalog.create_table_as("db", "t", orders_df.limit(100))
    main_rows = tbl.read().count()
    cutoff = tbl.read().selectExpr("percentile(o_orderkey, 0.5)").first()[0]
    doomed = tbl.read().filter(F.col("o_orderkey") <= cutoff).count()
    survivor_key = (
        tbl.read().filter(F.col("o_orderkey") > cutoff).first()["o_orderkey"]
    )
    tbl.create_branch("fix")
    wap = tbl.for_branch("fix")
    wap.delete(F.col("o_orderkey") <= cutoff)
    wap.update(
        condition=F.col("o_orderkey") == survivor_key,
        assignments={"o_orderpriority": F.lit("0-PATCHED")},
    )
    assert tbl.read().count() == main_rows
    assert wap.read().count() == main_rows - doomed
    patched = wap.read().filter(F.col("o_orderkey") == survivor_key).collect()
    assert patched and patched[0]["o_orderpriority"] == "0-PATCHED"
    # publish and verify main converges to the branch state
    tbl.fast_forward("fix")
    assert tbl.read().count() == main_rows - doomed


def test_branch_ref_crud_and_guards(catalog, orders_df):
    tbl = catalog.create_table_as("db", "t", orders_df.limit(10))
    tbl.create_branch("b1")
    assert tbl.branches() == {"b1": tbl.current_version()}
    with pytest.raises(LakehouseError, match="already exists"):
        tbl.create_branch("b1")
    tbl.tag("pin1")
    with pytest.raises(LakehouseError, match="already exists"):
        tbl.create_branch("pin1")  # tags and branches share a namespace
    with pytest.raises(LakehouseError, match="no such branch"):
        tbl.for_branch("nope")
    tbl.drop_branch("b1")
    assert tbl.branches() == {}
    with pytest.raises(LakehouseError, match="no such branch"):
        tbl.drop_branch("b1")
    # tags survive branch CRUD (shared refs file, format v2)
    assert "pin1" in tbl.tags()


def test_expire_keeps_branch_heads(catalog, orders_df):
    tbl = catalog.create_table_as("db", "t", orders_df.limit(20))
    tbl.create_branch("keepme")
    wap = tbl.for_branch("keepme")
    wap.append(orders_df.limit(30).subtract(orders_df.limit(20)))
    branch_head = wap.current_version()
    for i in (40, 50, 60):
        tbl.append(
            orders_df.limit(i).subtract(orders_df.limit(i - 10))
        )
    expired = tbl.expire_snapshots(keep_last=1)
    assert branch_head not in expired
    assert wap.read().count() == 30  # branch still fully readable


def test_branch_fork_point_at_older_snapshot(catalog, orders_df):
    tbl = catalog.create_table_as("db", "t", orders_df.limit(10))
    v1 = tbl.current_version()
    tbl.append(orders_df.limit(20).subtract(orders_df.limit(10)))
    tbl.create_branch("old", at=v1)
    assert tbl.for_branch("old").read().count() == 10


def test_sql_update_merge_on_branch(spark, tmp_path, orders_df):
    from pg_lakehouse_spark.sql import LakeSQL

    cat = LakeCatalog(spark, str(tmp_path / "wh_sqlb"))
    lsql = LakeSQL(spark, cat)
    lsql.sql("CREATE TABLE db.t (k BIGINT, v DOUBLE)")
    lsql.sql("INSERT INTO db.t VALUES (1, 10.0), (2, 20.0)")
    lsql.sql("ALTER TABLE db.t CREATE BRANCH fix")
    lsql.sql("UPDATE db.t@fix SET v = v + 1.0 WHERE k = 1")
    spark.createDataFrame([(2, 99.0), (3, 30.0)], "k long, v double") \
        .createOrReplaceTempView("src_b")
    lsql.sql(
        "MERGE INTO db.t@fix AS t USING src_b AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    # main untouched
    assert {tuple(r) for r in lsql.sql("SELECT * FROM db.t").collect()} == {
        (1, 10.0), (2, 20.0)
    }
    assert {
        tuple(r) for r in lsql.sql("SELECT * FROM db.t@fix").collect()
    } == {(1, 11.0), (2, 99.0), (3, 30.0)}


def test_refs_df_lists_all_refs(catalog, orders_df):
    tbl = catalog.create_table_as("db", "t", orders_df.limit(10))
    tbl.tag("v1")
    tbl.create_branch("b1")
    rows = {(r["name"], r["type"], r["version"]) for r in tbl.refs_df().collect()}
    v = tbl.current_version()
    assert rows == {("main", "BRANCH", v), ("v1", "TAG", v), ("b1", "BRANCH", v)}


def test_expire_older_than_protects_recent(catalog, orders_df):
    import time as _time

    tbl = catalog.create_table_as("db", "t", orders_df.limit(10))
    tbl.append(orders_df.limit(20).subtract(orders_df.limit(10)))
    cutoff = int(_time.time() * 1000) + 60_000  # everything is "recent"... not
    # with a future cutoff nothing is protected by age; with 0 everything is
    expired = tbl.expire_snapshots(keep_last=1, older_than_ms=0)
    assert expired == []  # age 0 protects every snapshot
    tbl.append(orders_df.limit(25).subtract(orders_df.limit(20)))
    expired = tbl.expire_snapshots(keep_last=1, older_than_ms=cutoff)
    assert expired  # future cutoff protects nothing beyond keep_last


def test_timestamp_travel_ignores_branch_snapshots(catalog, orders_df):
    """A later branch commit must not hijack main's TIMESTAMP AS OF."""
    import time as _time

    tbl = catalog.create_table_as("db", "t", orders_df.limit(10))
    _time.sleep(0.01)
    tbl.create_branch("b")
    tbl.for_branch("b").append(orders_df.limit(30).subtract(orders_df.limit(10)))
    now_ms = int(_time.time() * 1000) + 1000
    v = tbl.version_as_of_timestamp(now_ms)
    assert v == tbl.current_version()  # main head, not the branch head
    assert tbl.read_as_of(now_ms).count() == 10
    # the branch handle's own timestamp travel sees its commit
    assert tbl.for_branch("b").read_as_of(now_ms).count() == 30
    # history is lineage-scoped per ref
    main_versions = {r["version"] for r in tbl.history_df().collect()}
    branch_head = tbl.for_branch("b").current_version()
    assert branch_head not in main_versions
