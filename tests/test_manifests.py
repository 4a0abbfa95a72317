"""Manifest segmentation: past a threshold the file list leaves the
snapshot JSON and splits into immutable, shared-by-reference segment
files (Iceberg manifest-file analog) — commit cost O(delta), not
O(table). These tests pin: behavioral equivalence with the inline
path, segment REUSE across commits (the scale property), DML breaking
only the touched segments, bounded segment counts, and GC (expiry +
transaction abort) never touching a segment a live snapshot needs."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

import pg_lakehouse_spark.lakehouse as lh
from pg_lakehouse_spark.lakehouse import LakeCatalog, LakeTransaction


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


@pytest.fixture()
def orders_df(spark, sf_dir):
    from pg_lakehouse_spark.tables import table

    return table(spark, sf_dir, "orders")


SEG_PROPS = {"manifest.inline_max": "0"}  # always segment


def _chunks(orders_df, n=4, rows=200):
    out = []
    for i in range(n):
        out.append(
            orders_df.orderBy("o_orderkey")
            .limit((i + 1) * rows)
            .subtract(orders_df.orderBy("o_orderkey").limit(i * rows))
        )
    return out


def _seg_paths(tbl, version=None):
    return [m["path"] for m in tbl.snapshot(version).manifests]


def _seg_files_on_disk(tbl):
    return sorted(
        os.path.relpath(p, tbl.meta_dir)
        for p in glob.glob(
            os.path.join(tbl.meta_dir, lh._MANIFEST_DIR, "*.json")
        )
    )


def test_segmented_matches_inline_end_to_end(catalog, orders_df):
    """Same op sequence on an inline table and a segmented table must
    be indistinguishable to every reader (current, time-travel)."""
    base = orders_df.limit(600).cache()
    a = catalog.create_table_as("db", "inline_t", base)
    b = catalog.create_table_as("db", "seg_t", base, properties=SEG_PROPS)
    for t in (a, b):
        t.append(base.withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000))
        t.delete(F.col("o_orderstatus") == "F")
        t.update(
            F.col("o_totalprice") > 100_000,
            {"o_orderpriority": F.lit("0-BIG")},
        )
    rows_a = sorted(a.read().collect())
    rows_b = sorted(b.read().collect())
    assert rows_a == rows_b
    # the segmented head actually IS segmented and its JSON is small
    head = b.snapshot()
    assert head.manifests, "expected a segmented head"
    with open(b._meta_path(head.version)) as f:
        on_disk = json.load(f)
    assert on_disk["files"] == []
    # time travel to the post-append snapshot agrees
    va = [s.version for s in a.snapshots() if s.operation == "append"][-1]
    vb = [s.version for s in b.snapshots() if s.operation == "append"][-1]
    assert sorted(a.read(snapshot=va).collect()) == sorted(
        b.read(snapshot=vb).collect()
    )


def test_append_reuses_parent_segments(catalog, orders_df):
    """The scale property: appending writes ONE new segment and carries
    every parent segment by reference (same descriptor path)."""
    chunks = _chunks(orders_df, n=3)
    t = catalog.create_table("db", "t", chunks[0].schema, properties=SEG_PROPS)
    t.append(chunks[0])
    segs1 = _seg_paths(t)
    assert len(segs1) == 1
    t.append(chunks[1])
    segs2 = _seg_paths(t)
    assert segs2[: len(segs1)] == segs1  # parent segments shared
    assert len(segs2) == 2
    t.append(chunks[2])
    segs3 = _seg_paths(t)
    assert segs3[:2] == segs2
    assert len(segs3) == 3
    assert t.read().count() == sum(c.count() for c in chunks)


def test_dml_breaks_only_touched_segments(catalog, orders_df):
    """A delete whose victims all live in segment A's files must reuse
    segment B untouched (B's descriptor path survives in the head)."""
    lo = orders_df.filter(F.col("o_orderkey") <= 1000)
    hi = orders_df.filter(
        (F.col("o_orderkey") > 5_000) & (F.col("o_orderkey") <= 7_000)
    )
    t = catalog.create_table("db", "t2", lo.schema, properties=SEG_PROPS)
    t.append(lo)
    seg_lo = _seg_paths(t)[0]
    t.append(hi)
    seg_hi = [p for p in _seg_paths(t) if p != seg_lo][0]
    n_hi = hi.count()
    t.delete(F.col("o_orderkey") <= 1000)  # victims only in seg_lo files
    head_segs = _seg_paths(t)
    assert seg_hi in head_segs, "untouched segment must be reused"
    assert seg_lo not in head_segs, "touched segment must be replaced"
    assert t.read().count() == n_hi


def test_inline_threshold_crossing(catalog, orders_df):
    """Below the threshold the file list stays inline (zero
    indirection); crossing it flips to segments and stays there."""
    chunk = orders_df.limit(100)
    t = catalog.create_table(
        "db", "t3", chunk.schema, properties={"manifest.inline_max": "3"}
    )
    t.append(chunk.repartition(2))  # 2 files <= 3 → inline
    assert not t.snapshot().manifests
    assert t.snapshot().files
    t.append(chunk.repartition(2))  # 4 files > 3 → segmented
    head = t.snapshot()
    assert head.manifests
    with open(t._meta_path(head.version)) as f:
        assert json.load(f)["files"] == []
    assert t.read().count() == 200


def test_segment_count_stays_bounded(catalog, orders_df, monkeypatch):
    """Past the cap, the smallest segments fold into the delta — the
    manifest-merge that keeps metadata O(bounded) over any commit
    history."""
    monkeypatch.setattr(lh, "_MANIFEST_MAX_SEGMENTS", 4)
    chunk = orders_df.limit(50)
    t = catalog.create_table("db", "t4", chunk.schema, properties=SEG_PROPS)
    for i in range(8):
        t.append(chunk.withColumn("o_orderkey", F.col("o_orderkey") + i * 100))
    assert len(t.snapshot().manifests) <= 4
    assert t.read().count() == 8 * 50


def test_expire_gc_removes_only_unreferenced_segments(catalog, orders_df):
    chunks = _chunks(orders_df, n=3, rows=100)
    t = catalog.create_table("db", "t5", chunks[0].schema, properties=SEG_PROPS)
    for c in chunks:
        t.append(c)
    t.delete(F.col("o_orderkey") <= 100)
    expected_rows = t.read().count()
    t.expire_snapshots(keep_last=1)
    live = set(_seg_paths(t))
    on_disk = set(_seg_files_on_disk(t))
    assert live <= on_disk
    assert on_disk == live, f"orphan segments survived GC: {on_disk - live}"
    assert t.read().count() == expected_rows


def test_txn_abort_cleans_chain_segments(catalog, orders_df):
    base = orders_df.limit(300)
    t = catalog.create_table_as("db", "t6", base, properties=SEG_PROPS)
    before = _seg_files_on_disk(t)
    rows_before = t.read().count()
    tx = LakeTransaction()
    tx.append(t, base.withColumn("o_orderkey", F.col("o_orderkey") + 9_000_000))
    tx.abort()
    assert _seg_files_on_disk(t) == before
    assert t.read().count() == rows_before


def test_branch_wap_on_segmented_table(catalog, orders_df):
    base = orders_df.limit(400)
    extra = orders_df.limit(500).subtract(base)
    t = catalog.create_table_as("db", "t7", base, properties=SEG_PROPS)
    t.create_branch("audit")
    b = t.for_branch("audit")
    b.append(extra)
    assert t.read().count() == base.count()  # main isolated
    assert b.read().count() == base.count() + extra.count()
    t.fast_forward("audit")
    assert t.read().count() == base.count() + extra.count()


def test_schema_evolution_on_segmented_table(catalog, orders_df):
    base = orders_df.limit(200)
    t = catalog.create_table_as("db", "t8", base, properties=SEG_PROPS)
    t.add_column("flag", "string")
    t.append(
        base.withColumn("o_orderkey", F.col("o_orderkey") + 7_000_000)
        .withColumn("flag", F.lit("new"))
    )
    got = t.read()
    assert got.count() == 400
    assert got.filter(F.col("flag").isNull()).count() == 200


def test_segment_cache_shares_entry_objects(catalog, orders_df):
    """Hydrating two snapshots that share a segment must not re-parse:
    the entry dicts are the SAME objects (this is what makes reading
    head N+1 after N O(delta))."""
    chunk = orders_df.limit(100)
    t = catalog.create_table("db", "t9", chunk.schema, properties=SEG_PROPS)
    t.append(chunk)
    v1 = t.current_version()
    t.append(chunk.withColumn("o_orderkey", F.col("o_orderkey") + 500_000))
    s_old, s_new = t.snapshot(v1), t.snapshot()
    old_ids = {id(e) for e in s_old.files}
    shared = [e for e in s_new.files if id(e) in old_ids]
    assert len(shared) == len(s_old.files)


def test_manifests_metadata_table_sql(catalog, orders_df, spark):
    from pg_lakehouse_spark.sql import LakeSQL

    t = catalog.create_table_as(
        "db", "t10", orders_df.limit(200), properties=SEG_PROPS
    )
    t.append(orders_df.limit(100))
    sql = LakeSQL(spark, catalog)
    rows = sql.sql(
        "SELECT path, file_count, row_count FROM db.t10$manifests"
    ).collect()
    assert len(rows) == len(t.snapshot().manifests)
    assert sum(r["row_count"] for r in rows) == 300
    catalog.create_table_as("db", "t11", orders_df.limit(50))
    rows = sql.sql("SELECT * FROM db.t11$manifests").collect()
    assert len(rows) == 1 and rows[0]["path"] == "(inline)"


def test_segment_level_pruning_skips_unloaded_segments(catalog, orders_df):
    """A point lookup must not even PARSE segments whose descriptor
    bounds exclude it — observable through the segment cache: after a
    cold pruned read, only the overlapping segment(s) are cached."""
    t = catalog.create_table(
        "db", "sp", orders_df.schema, properties=SEG_PROPS
    )
    # three disjoint key ranges → three segments with disjoint bounds
    for lo, hi in ((0, 2000), (5_000, 7_000), (10_000, 12_000)):
        t.append(
            orders_df.filter(
                (F.col("o_orderkey") > lo) & (F.col("o_orderkey") <= hi)
            ).coalesce(1)
        )
    segs = t.snapshot().manifests
    assert len(segs) == 3
    assert all(m.get("bounds", {}).get("o_orderkey") for m in segs)
    overlapping = {
        m["path"]
        for m in segs
        if m["bounds"]["o_orderkey"][0] <= 6_010
        and m["bounds"]["o_orderkey"][1] >= 6_000
    }
    assert len(overlapping) == 1
    # the selection itself parses ONLY the overlapping segment
    lh._SEG_CACHE.clear()
    _s, selected = t.pruned_entries({"o_orderkey": (6_000, 6_010)})
    cached = {
        os.path.relpath(p, t.meta_dir) for p in lh._SEG_CACHE.keys()
    }
    assert cached & {m["path"] for m in segs} == overlapping
    assert selected and all(
        "o_orderkey" in (e.get("ranges") or {}) for e in selected
    )
    # and the full read returns exactly the matching rows
    got = t.read_pruned({"o_orderkey": (6_000, 6_010)})
    n = got.count()
    want = orders_df.filter(
        F.col("o_orderkey").between(6_000, 6_010)
    ).count()
    assert n == want and n > 0


def test_segment_pruning_correct_across_schema_epochs(catalog, orders_df):
    """Bounds are epoch-qualified: after a column rename, old segments'
    stats keys resolve by field id — a pruned read still returns
    exactly the matching rows."""
    base = orders_df.filter(F.col("o_orderkey") <= 3000)
    t = catalog.create_table_as("db", "se", base, properties=SEG_PROPS)
    t.rename_column("o_orderkey", "okey")
    t.append(
        orders_df.filter(
            (F.col("o_orderkey") > 5_000) & (F.col("o_orderkey") <= 8_000)
        ).withColumnRenamed("o_orderkey", "okey")
    )
    got = t.read_pruned({"okey": (5_500, 5_600)})
    want = orders_df.filter(
        F.col("o_orderkey").between(5_500, 5_600)
    ).count()
    assert got.count() == want
    # and the pre-rename slice still reachable
    got2 = t.read_pruned({"okey": (None, 3000)})
    assert got2.count() == base.count()


def test_segmented_equals_inline_under_random_dml(catalog, orders_df):
    """Differential property: a seeded random sequence of DELETE /
    UPDATE / APPEND / MERGE (+ forced compaction and snapshot expiry
    mid-sequence) applied to an inline twin and a segmented twin must
    converge to identical states at every step — segmentation is a
    metadata layout, never a semantics change."""
    import random

    rng = random.Random(20260815)
    base = orders_df.limit(400)
    a = catalog.create_table_as("db", "rt_inline", base)
    b = catalog.create_table_as("db", "rt_seg", base, properties=SEG_PROPS)
    twins = (a, b)

    def states_equal():
        assert sorted(map(tuple, a.read().collect())) == sorted(
            map(tuple, b.read().collect())
        )

    for step in range(10):
        op = rng.choice(["delete", "update", "append", "merge", "compact"])
        if step == 6:
            op = "expire"
        lo = rng.randrange(0, 350)
        hi = lo + rng.randrange(5, 60)
        cond = F.col("o_orderkey").between(lo, hi)
        if op == "delete":
            for t_ in twins:
                t_.delete(cond)
        elif op == "update":
            assign = {"o_totalprice": F.col("o_totalprice") + float(step)}
            for t_ in twins:
                t_.update(cond, assign)
        elif op == "append":
            extra = orders_df.filter(cond).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000 * (step + 1)
            )
            for t_ in twins:
                t_.append(extra)
        elif op == "merge":
            src = orders_df.filter(cond).withColumn(
                "o_totalprice", F.col("o_totalprice") * 1.5
            )
            kwargs = dict(
                on=["o_orderkey"],
                when_matched_update={
                    "o_totalprice": F.col("__src.o_totalprice")
                },
                when_not_matched_insert=True,
            )
            for t_ in twins:
                t_.merge(src, **kwargs)
        elif op == "compact":
            for t_ in twins:
                t_.compact(small_file_bytes=1 << 62, min_files=1)
        elif op == "expire":
            for t_ in twins:
                t_.expire_snapshots(keep_last=2)
        states_equal()
    assert b.snapshot().manifests  # the segmented twin stayed segmented


def test_concurrent_appends_on_segmented_table(catalog, orders_df):
    """Four writers racing appends on a segmented table: every commit
    lands (optimistic retry), the final state is the union, no
    segment is orphaned, and the head's reused-segment chain is
    consistent (hydration == sum of parts)."""
    import threading

    base = orders_df.limit(100)
    t = catalog.create_table_as("db", "cc_seg", base, properties=SEG_PROPS)
    errs: list[BaseException] = []

    def worker(i: int) -> None:
        try:
            handle = lh.LakeTable(t.spark, t.location)
            for j in range(3):
                handle.append(
                    base.withColumn(
                        "o_orderkey",
                        F.col("o_orderkey") + (i * 10 + j + 1) * 1_000,
                    )
                )
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    snap = t.snapshot()
    assert t.read().count() == 100 * 13  # base + 12 appends
    assert sum(m["row_count"] for m in snap.manifests) == 100 * 13
    assert len(snap.files) == sum(m["file_count"] for m in snap.manifests)
    live = set(_seg_paths(t))
    # every referenced segment exists on disk
    assert live <= set(_seg_files_on_disk(t))


def test_vacuum_sweeps_crash_orphaned_segments(catalog, orders_df):
    """A segment file left by a crashed commit (written, never
    referenced) is swept by vacuum; live segments survive."""
    t = catalog.create_table_as(
        "db", "vseg", orders_df.limit(200), properties=SEG_PROPS
    )
    orphan = os.path.join(t.meta_dir, lh._MANIFEST_DIR, "m-999-dead.json")
    with open(orphan, "w") as f:
        f.write("[]")
    # nothing expires (keep everything): the dedicated sweep owns it
    out = t.vacuum(keep_last=100)
    assert "manifests/m-999-dead.json" in out["removed_segments"]
    assert not os.path.exists(orphan)
    # and with expiry in play the orphan also never survives
    with open(orphan, "w") as f:
        f.write("[]")
    t.append(orders_df.limit(50))
    t.vacuum(keep_last=1)
    assert not os.path.exists(orphan)
    assert set(_seg_paths(t)) <= set(_seg_files_on_disk(t))
    assert t.read().count() == 250


def test_segment_bloom_pruning_on_unsorted_key(catalog, orders_df):
    """r7: a point lookup on an INTERLEAVED key — where every
    segment's min/max bounds span the full range, so bounds can never
    prune — must still skip whole segments via the descriptor's
    unioned per-file blooms, without parsing them."""
    t = catalog.create_table(
        "db", "sb", orders_df.schema,
        properties=dict(SEG_PROPS, bloom_filter_columns="o_orderkey"),
    )
    # three appends with keys striped modulo-3 across the full range:
    # all three segments share (nearly) identical bounds
    base = orders_df.filter(F.col("o_orderkey") <= 12_000)
    for i in range(3):
        t.append(base.filter(F.col("o_orderkey") % 3 == i).coalesce(1))
    segs = t.snapshot().manifests
    assert len(segs) == 3
    assert all(m.get("blooms", {}).get("o_orderkey") for m in segs)
    # bounds overlap each other — range pruning alone keeps them all
    bs = [m["bounds"]["o_orderkey"] for m in segs]
    assert max(b[0] for b in bs) < min(b[1] for b in bs)
    probe = int(
        base.filter(F.col("o_orderkey") % 3 == 1)
        .agg(F.min("o_orderkey")).collect()[0][0]
    )
    lh._SEG_CACHE.clear()
    _s, selected = t.pruned_entries({"o_orderkey": (probe, probe)})
    cached = {
        os.path.relpath(p, t.meta_dir) for p in lh._SEG_CACHE.keys()
    }
    parsed = cached & {m["path"] for m in segs}
    assert len(parsed) == 1, "bloom must skip the two foreign segments"
    assert selected, "the probe's own file must survive"
    # the surviving entries really contain the probe key's file
    got = t.read_pruned({"o_orderkey": (probe, probe)}).count()
    assert got >= 1
