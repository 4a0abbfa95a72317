"""Incremental rollup (continuous aggregate) tests.

Core invariant: incremental refresh (merge of delta partials) must
equal a full recompute over the source at every step — exact, because
the sum metric runs on the cent-grid integer scale and count/min/max
are order-insensitive.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_lakehouse_spark.lakehouse import LakeCatalog, LakehouseError
from pg_lakehouse_spark.rollup import (
    BUCKET_COL,
    create_rollup,
    refresh_rollup,
    time_bucket,
)
from pg_lakehouse_spark.tables import table


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


@pytest.fixture()
def events_df(spark, sf_dir):
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .withColumn("value_e2", F.round(F.col("value") * 100).cast("long"))
    )


METRICS = {
    "n_events": ("count", "*"),
    "value_sum_e2": ("sum", "value_e2"),
    "value_min": ("min", "value"),
    "value_max": ("max", "value"),
}


def _expected(df):
    return (
        df.groupBy(
            time_bucket("ts", "1 hour").alias(BUCKET_COL), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_e2").alias("value_sum_e2"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
        )
    )


def _assert_same(actual, expected):
    a = sorted(map(tuple, actual.collect()))
    e = sorted(map(tuple, expected.collect()))
    assert a == e


def test_rollup_incremental_equals_full_recompute(catalog, events_df):
    src = catalog.create_table_as(
        "db", "ev", events_df.filter(F.col("event_id") % 3 == 0)
    )
    roll = create_rollup(
        catalog, "db", "ev_hourly", src, "ts", "1 hour", ["event_type"],
        METRICS,
    )
    _assert_same(roll.read(), _expected(src.read()))

    src.append(events_df.filter(F.col("event_id") % 3 == 1))
    snap = refresh_rollup(src, roll)
    assert snap.operation == "merge"  # incremental path, not recompute
    assert snap.summary["rollup_source_version"] == src.current_version()
    _assert_same(roll.read(), _expected(src.read()))

    src.append(events_df.filter(F.col("event_id") % 3 == 2))
    refresh_rollup(src, roll)
    _assert_same(roll.read(), _expected(src.read()))
    _assert_same(roll.read(), _expected(events_df))


def test_rollup_refresh_noop_without_new_data(catalog, events_df):
    src = catalog.create_table_as("db", "ev2", events_df.limit(500))
    roll = create_rollup(
        catalog, "db", "ev2_hourly", src, "ts", "1 hour", ["event_type"],
        METRICS,
    )
    v = roll.current_version()
    snap = refresh_rollup(src, roll)
    assert snap.version == v  # watermark current → no new commit


def test_rollup_full_recompute_after_source_dml(catalog, events_df):
    src = catalog.create_table_as("db", "ev3", events_df.limit(2000))
    roll = create_rollup(
        catalog, "db", "ev3_hourly", src, "ts", "1 hour", ["event_type"],
        METRICS,
    )
    src.delete(F.col("event_type") == "click")
    snap = refresh_rollup(src, roll)
    assert snap.operation == "overwrite"  # invalidation → recompute
    _assert_same(roll.read(), _expected(src.read()))


def test_rollup_crash_retry_no_double_count(catalog, events_df):
    # a refresh that "crashed" (never committed) leaves the watermark
    # at the old source version; retrying merges the same delta once
    src = catalog.create_table_as(
        "db", "ev4", events_df.filter(F.col("event_id") % 2 == 0)
    )
    roll = create_rollup(
        catalog, "db", "ev4_hourly", src, "ts", "1 hour", ["event_type"],
        METRICS,
    )
    src.append(events_df.filter(F.col("event_id") % 2 == 1))
    refresh_rollup(src, roll)
    again = refresh_rollup(src, roll)  # idempotent: watermark advanced
    assert again.summary["rollup_source_version"] == src.current_version()
    _assert_same(roll.read(), _expected(events_df))


def test_time_bucket_grid_and_guards(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:59:59",), ("2024-01-01 11:00:00",)], ["s"]
    ).select(F.col("s").cast("timestamp").alias("ts"))
    got = [
        r[0].strftime("%H:%M")
        for r in df.select(time_bucket("ts", "30 minutes")).collect()
    ]
    assert got == ["10:30", "11:00"]
    with pytest.raises(LakehouseError):
        time_bucket("ts", "3 fortnights")
    with pytest.raises(LakehouseError):
        time_bucket("ts", "0 hours")


def test_rollup_rejects_unmergeable_metric(catalog, events_df):
    src = catalog.create_table_as("db", "ev5", events_df.limit(100))
    with pytest.raises(LakehouseError, match="unsupported metric"):
        create_rollup(
            catalog, "db", "bad", src, "ts", "1 hour", ["event_type"],
            {"d": ("avg", "value")},
        )


def test_streaming_ingest_then_rollup_refresh(spark, sf_dir, tmp_path):
    """End-to-end continuous aggregate: stream → lakehouse sink (one
    snapshot per micro-batch, pure appends) → refresh_rollup consumes
    only the streamed snapshots. Final state equals a batch GROUP BY
    over everything ingested."""
    from pg_lakehouse_spark.streaming.sink import write_stream_to_lake
    from pg_lakehouse_spark.streaming.windows import stream_events

    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .withColumn("value_e2", F.round(F.col("value") * 100).cast("long"))
    )
    # seed the source with a small batch, build the rollup on it
    src = cat.create_table_as("db", "ev_live", ev.filter(F.col("event_id") < 100))
    roll = create_rollup(
        cat, "db", "ev_live_hourly", src, "ts", "1 hour", ["event_type"],
        {"n_events": ("count", "*"), "value_sum_e2": ("sum", "value_e2")},
    )
    # stream the full corpus into the SAME lakehouse table
    stream = stream_events(spark, sf_dir).select(
        "event_id", "ts", "event_type", "value"
    ).withColumn("value_e2", F.round(F.col("value") * 100).cast("long"))
    q = write_stream_to_lake(stream, src, str(tmp_path / "ckpt"), trigger_once=True)
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    snap = refresh_rollup(src, roll)
    assert snap.operation == "merge"  # streamed snapshots are appends
    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["value_sum_e2"])
        for r in roll.read().collect()
    }
    expected = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["value_sum_e2"])
        for r in src.read()
        .groupBy(time_bucket("ts", "1 hour").alias("bucket_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_e2").alias("value_sum_e2"),
        )
        .collect()
    }
    assert got == expected


def test_rollup_approx_distinct_hll(catalog, spark, sf_dir):
    """approx_distinct metric: HLL sketch state merges losslessly, so
    incremental refresh equals full recompute EXACTLY (same estimates),
    and the estimate tracks exact distinct within HLL error."""
    from pg_lakehouse_spark.rollup import read_rollup

    events_df = table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id"
    )
    src = catalog.create_table_as(
        "db", "ev_hll_src", events_df.filter(F.col("event_id") % 3 == 0)
    )
    roll = create_rollup(
        catalog, "db", "ev_hll", src,
        time_col="ts", bucket="1 day", group_by=["event_type"],
        metrics={
            "n_events": ("count", "*"),
            "n_users": ("approx_distinct", "user_id"),
        },
    )
    # sketch state column is binary
    assert dict(roll.read().dtypes)["n_users"] == "binary"
    for m in (1, 2):
        src.append(events_df.filter(F.col("event_id") % 3 == m))
        refresh_rollup(src, roll)

    got = {
        (r[BUCKET_COL], r["event_type"]): (r["n_events"], r["n_users"])
        for r in read_rollup(roll).collect()
    }
    # full recompute over the complete source: estimates must be equal
    full = (
        events_df.groupBy(
            time_bucket("ts", "1 day").alias(BUCKET_COL), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id")
            ).alias("n_users"),
        )
    )
    expected = {
        (r[BUCKET_COL], r["event_type"]): (r["n_events"], r["n_users"])
        for r in full.collect()
    }
    assert got == expected
    # and the estimates track exact distinct within HLL error (<5%)
    exact = {
        (r[BUCKET_COL], r["event_type"]): r["d"]
        for r in events_df.groupBy(
            time_bucket("ts", "1 day").alias(BUCKET_COL), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for k, (_, est) in got.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k])


def test_refresh_stays_incremental_despite_branch_dml(spark, sf_dir, tmp_path):
    """A DML snapshot on a BRANCH of the source (its version lands
    inside the numeric window) must not force the rollup into a full
    recompute — window classification follows main's ancestry."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.rollup import create_rollup, refresh_rollup
    from pg_lakehouse_spark.tables import table

    ev = table(spark, sf_dir, "events").limit(500)
    cat = LakeCatalog(spark, str(tmp_path / "wh_rb"))
    src = cat.create_table_as("db", "ev", ev)
    mv = create_rollup(
        cat, "db", "ev_roll", src, "ts", "1 hour", [],
        {"n": ("count", "*")},
    )
    # branch DML between watermark and the next main append
    src.create_branch("side")
    src.for_branch("side").delete(F.lit(True))
    src.append(ev.limit(50))
    snap = refresh_rollup(src, mv)
    assert snap.operation == "merge", (
        "branch snapshot in the numeric window forced a full recompute"
    )


def test_rollup_approx_topk_mergeable(spark, sf_dir, tmp_path):
    """Heavy-hitter rollup metric: map<item,count> candidate summaries
    merge across incremental refreshes; with capacity >= cardinality
    the incremental result is EXACTLY the full-recompute counts."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.rollup import (
        create_rollup,
        read_rollup,
        refresh_rollup,
    )
    from pg_lakehouse_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id"
    )
    cat = LakeCatalog(spark, str(tmp_path / "wh_topk"))
    src = cat.create_table_as(
        "db", "ev_src", ev.filter(F.col("event_id") % 2 == 0)
    )
    roll = create_rollup(
        cat, "db", "ev_daily_topk", src,
        time_col="ts", bucket="1 day", group_by=[],
        metrics={
            "n": ("count", "*"),
            "top_types": ("approx_topk", "event_type", 3),
        },
    )
    src.append(ev.filter(F.col("event_id") % 2 == 1))
    refresh_rollup(src, roll)
    got = {
        r.bucket_start: [(s.item, s.cnt) for s in r.top_types]
        for r in read_rollup(roll).collect()
    }
    # oracle: exact per-day top-3 event types (5 types, cap=12 >= 5 ->
    # the candidate summary is exact)
    exact = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"), "event_type")
        .count()
        .collect()
    )
    from collections import defaultdict

    per_day = defaultdict(list)
    for r in exact:
        per_day[r.d].append((r["count"], r.event_type))
    for day, pairs in per_day.items():
        want = [
            (t, c)
            for c, t in sorted(pairs, key=lambda p: (-p[0], p[1]))[:3]
        ]
        have = got[day]
        assert {t: c for t, c in have} == {t: c for t, c in want}, day


def test_rollup_approx_topk_truncation_keeps_heavy_hitter(spark, tmp_path):
    """Under-capacity summaries: with cardinality far above the cap, a
    genuinely dominant item still surfaces as #1 after merges and its
    count is never overestimated."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.rollup import (
        create_rollup,
        read_rollup,
        refresh_rollup,
    )

    # 1 dominant item (300 rows) + 200 singletons, split over 2 loads
    def mk(lo, hi, tag):
        rows = [(i, "2024-03-01 10:00:00", "HEAVY") for i in range(lo, hi)]
        rows += [
            (10_000 + tag * 1000 + j, "2024-03-01 11:00:00", f"rare_{tag}_{j}")
            for j in range(100)
        ]
        return spark.createDataFrame(
            rows, "id long, ts string, item string"
        ).withColumn("ts", F.to_timestamp("ts"))

    cat = LakeCatalog(spark, str(tmp_path / "wh_topk2"))
    src = cat.create_table_as("db", "s2", mk(0, 150, 0))
    roll = create_rollup(
        cat, "db", "r2", src,
        time_col="ts", bucket="1 day", group_by=[],
        metrics={"top_items": ("approx_topk", "item", 2)},
    )
    src.append(mk(150, 300, 1))
    refresh_rollup(src, roll)
    (row,) = read_rollup(roll).collect()
    top = row.top_items
    assert top[0].item == "HEAVY"
    assert top[0].cnt <= 300  # never overestimates
    assert top[0].cnt >= 150  # survives both loads' truncation


def test_rollup_retraction_ivm(spark, tmp_path):
    """Incremental view maintenance with retractions: DML on the
    source (delete + update) refreshes the rollup via ±1-weighted
    change-feed deltas — no recompute — and the result equals the
    direct GROUP BY; a fully-deleted group disappears from the user
    face."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.rollup import (
        create_rollup,
        read_rollup,
        refresh_rollup,
    )

    rows = [
        (i, "2024-05-01 10:00:00" if i % 2 else "2024-05-02 10:00:00",
         "g1" if i < 30 else "g2", float(i))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "id long, ts string, grp string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    cat = LakeCatalog(spark, str(tmp_path / "wh_ivm"))
    src = cat.create_table_as(
        "db", "facts", df,
        properties={"change_data_feed": "on", "row_key": "id",
                    "write_delete_mode": "merge-on-read"},
    )
    roll = create_rollup(
        cat, "db", "facts_daily", src,
        time_col="ts", bucket="1 day", group_by=["grp"],
        metrics={"n": ("count", "*"), "v_sum": ("sum", "v")},
    )
    # DML window: delete some of g1, update values in g2, append more,
    # and fully retract g2's odd-day bucket
    src.delete((F.col("grp") == "g1") & (F.col("id") < 10))
    src.update(F.col("grp") == "g2", {"v": F.col("v") + 100.0})
    src.append(
        spark.createDataFrame(
            [(100, "2024-05-03 09:00:00", "g3", 7.0)],
            "id long, ts string, grp string, v double",
        ).withColumn("ts", F.to_timestamp("ts"))
    )
    src.delete((F.col("grp") == "g2") & (F.col("id") % 2 == 1))
    snap = refresh_rollup(src, roll)
    assert snap.summary.get("rollup_refresh") == "retraction"
    got = {
        (r.bucket_start.day, r.grp): (r.n, r.v_sum)
        for r in read_rollup(roll).collect()
    }
    want = {
        (r.d.day, r.grp): (r.n, r.s)
        for r in src.read()
        .groupBy(F.date_trunc("day", "ts").alias("d"), "grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want
    # g2's odd-ts (day 1) bucket fully retracted -> hidden
    assert (1, "g2") not in got
    # a min metric forces the full-recompute path (not retractable)
    roll2 = create_rollup(
        cat, "db", "facts_daily_min", src,
        time_col="ts", bucket="1 day", group_by=["grp"],
        metrics={"n": ("count", "*"), "v_min": ("min", "v")},
    )
    src.delete(F.col("id") == 20)
    snap2 = refresh_rollup(src, roll2)
    # min can't retract — but with a change feed the refresh upgrades
    # to partial invalidation (touched buckets only), not a recompute
    assert snap2.summary.get("rollup_refresh") == "partial-invalidation"
    got2 = {
        (r.bucket_start.day, r.grp): (r.n, r.v_min)
        for r in read_rollup(roll2).collect()
    }
    want2 = {
        (r.d.day, r.grp): (r.n, r.mn)
        for r in src.read()
        .groupBy(F.date_trunc("day", "ts").alias("d"), "grp")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("mn"))
        .collect()
    }
    assert got2 == want2


def test_rollup_partial_invalidation_minmax(spark, tmp_path):
    """min/max rollups can't retract, but a DML window with a change
    feed recomputes ONLY the touched buckets (partial invalidation):
    result equals full recompute, untouched-bucket state rows carry
    over, and a fully-emptied bucket disappears."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.rollup import (
        create_rollup,
        read_rollup,
        refresh_rollup,
    )

    rows = [
        (i, f"2024-07-{1 + (i % 3):02d} 10:00:00", float(i)) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, ts string, v double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    cat = LakeCatalog(spark, str(tmp_path / "wh_pi"))
    src = cat.create_table_as(
        "db", "facts_pi", df,
        properties={"change_data_feed": "on", "row_key": "id",
                    "write_delete_mode": "merge-on-read"},
    )
    roll = create_rollup(
        cat, "db", "pi_daily", src,
        time_col="ts", bucket="1 day", group_by=[],
        metrics={"n": ("count", "*"), "v_min": ("min", "v"),
                 "v_max": ("max", "v")},
    )
    # DML touches day 1 (delete the small values) and empties day 3
    src.delete((F.col("id") % 3 == 0) & (F.col("v") < 30))
    src.delete(F.col("id") % 3 == 2)
    snap = refresh_rollup(src, roll)
    assert snap.summary.get("rollup_refresh") == "partial-invalidation"
    assert snap.summary.get("rollup_affected_buckets") == 2
    got = {
        r.bucket_start.day: (r.n, r.v_min, r.v_max)
        for r in read_rollup(roll).collect()
    }
    want = {
        r.d.day: (r.n, r.mn, r.mx)
        for r in src.read()
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want
    assert 3 not in got  # emptied bucket gone
    # idempotent when current
    v = roll.current_version()
    refresh_rollup(src, roll)
    assert roll.current_version() == v


def test_hierarchical_rollups_compose(spark, sf_dir, tmp_path):
    """Rollups stack: a DAILY rollup sources the HOURLY rollup table
    (sum-of-counts re-aggregation), and refreshing the chain after new
    facts equals the direct daily GROUP BY — each tier's refresh cost
    stays ∝ its own delta."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.rollup import (
        create_rollup,
        read_rollup,
        refresh_rollup,
    )
    from pg_lakehouse_spark.tables import table

    ev = table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    cat = LakeCatalog(spark, str(tmp_path / "wh_hier"))
    src = cat.create_table_as(
        "db", "facts_h", ev.filter(F.col("event_id") % 2 == 0)
    )
    hourly = create_rollup(
        cat, "db", "hourly", src,
        time_col="ts", bucket="1 hour", group_by=["event_type"],
        metrics={"n": ("count", "*")},
    )
    daily = create_rollup(
        cat, "db", "daily", hourly,
        time_col="bucket_start", bucket="1 day", group_by=["event_type"],
        metrics={"n": ("sum", "n")},  # partial counts re-aggregate by SUM
    )
    src.append(ev.filter(F.col("event_id") % 2 == 1))
    refresh_rollup(src, hourly)
    refresh_rollup(hourly, daily)
    got = {
        (r.bucket_start.day, r.event_type): r.n
        for r in read_rollup(daily).collect()
    }
    want = {
        (r.d.day, r.event_type): r.n
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("d"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_rollup_approx_topk_retraction_budget(spark, tmp_path):
    """r3 verdict item 7: approx_topk with a declared ERROR BUDGET
    (4th spec element) refreshes through DML windows via signed
    candidate-map deltas — no recompute. Retractions the truncated map
    covers subtract exactly; uncertain mass (items truncated away
    earlier) accrues in the ``__retr`` companion, and exceeding
    budget × count(*) sweeps the affected buckets with a scoped
    recompute that resets the counter."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.rollup import (
        create_rollup,
        read_rollup,
        refresh_rollup,
    )

    rows = [(i, "2024-06-01 10:00:00", "g1", "h1") for i in range(50)]
    nid = 50
    for j in range(12):  # 12 distinct tail items x2 — beyond cap 8
        for _ in range(2):
            rows.append((nid, "2024-06-01 11:00:00", "g1", f"x{j:02d}"))
            nid += 1
    df = spark.createDataFrame(
        rows, "id long, ts string, grp string, item string"
    ).withColumn("ts", F.to_timestamp("ts"))
    cat = LakeCatalog(spark, str(tmp_path / "wh_tkb"))
    src = cat.create_table_as(
        "db", "clicks", df, properties={"change_data_feed": "on"}
    )
    roll = create_rollup(
        cat, "db", "clicks_daily", src,
        time_col="ts", bucket="1 day", group_by=["grp"],
        metrics={
            "n": ("count", "*"),
            "top": ("approx_topk", "item", 2, 0.05),
        },
    )
    # companion exists in state, hidden from the user face
    assert "top__retr" in roll.read().columns
    assert "top__retr" not in read_rollup(roll).columns

    # exact retraction: the deleted item is IN the candidate map
    src.delete((F.col("item") == "h1") & (F.col("id") < 5))
    snap = refresh_rollup(src, roll)
    assert snap.summary.get("rollup_refresh") == "retraction"
    face = read_rollup(roll).collect()[0]
    assert face.n == 69
    assert face.top[0].asDict() == {"item": "h1", "cnt": 45}
    assert roll.read().collect()[0].top__retr == 0

    # uncertain retraction past the budget: delete rows of items the
    # cap-8 map truncated away (ranked h1,x00..x06 kept; x07+ dropped)
    src.delete(F.col("item").isin("x09", "x10", "x11"))
    snap = refresh_rollup(src, roll)
    assert snap.summary.get("rollup_refresh") == "retraction+budget-sweep"
    assert snap.summary.get("rollup_swept_buckets") == 1
    # swept state equals a from-scratch recompute, counter reset
    st = roll.read().collect()[0]
    assert st.top__retr == 0
    face = read_rollup(roll).collect()[0]
    assert face.n == 63
    assert face.top[0].asDict() == {"item": "h1", "cnt": 45}
    assert face.top[1].asDict() == {"item": "x00", "cnt": 2}


def test_rollup_partial_invalidation_semijoin_past_cap(
    spark, tmp_path, monkeypatch
):
    """Past _BUCKET_ISIN_CAP the affected-bucket scope must switch
    from a literal IN-list (a driver-side bomb at millions of
    buckets) to a broadcast semi-join + coarse range pushdown — and
    stay exactly equal to a full recompute, including vanished
    buckets (range-scoped by-source delete + untouched-row
    self-update) and out-of-range buckets carrying over."""
    import pg_lakehouse_spark.rollup as rollup_mod
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.rollup import (
        create_rollup,
        read_rollup,
        refresh_rollup,
    )

    monkeypatch.setattr(rollup_mod, "_BUCKET_ISIN_CAP", 8)

    # 40 hourly buckets; ids spread so DML touches 30+ distinct buckets
    rows = [
        (i, f"2024-07-01 {i % 24:02d}:30:00" if i % 2 == 0
         else f"2024-07-02 {i % 16:02d}:30:00", float(i))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "id long, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    cat = LakeCatalog(spark, str(tmp_path / "wh_sj"))
    src = cat.create_table_as(
        "db", "facts_sj", df,
        properties={"change_data_feed": "on", "row_key": "id",
                    "write_delete_mode": "merge-on-read"},
    )
    roll = create_rollup(
        cat, "db", "sj_hourly", src,
        time_col="ts", bucket="1 hour", group_by=[],
        metrics={"n": ("count", "*"), "v_min": ("min", "v"),
                 "v_max": ("max", "v")},
    )
    # touch >8 buckets: delete every third id (hits most hours), and
    # fully empty one bucket (2024-07-02 15:xx has only odd ids 15, 31
    # ... with i%16==15 → ids 15,31,47,... delete them all)
    src.delete(F.col("id") % 3 == 0)
    src.delete((F.col("id") % 2 == 1) & (F.col("id") % 16 == 15))
    snap = refresh_rollup(src, roll)
    assert snap.summary.get("rollup_refresh") == "partial-invalidation"
    assert int(snap.summary.get("rollup_affected_buckets")) > 8
    got = {
        r.bucket_start: (r.n, r.v_min, r.v_max)
        for r in read_rollup(roll).collect()
    }
    want = {
        r.d: (r.n, r.mn, r.mx)
        for r in src.read()
        .groupBy(F.date_trunc("hour", "ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_bucket_scope_plan_semijoin_and_pushdown(
    spark, tmp_path, monkeypatch
):
    """Plan gate for the over-cap scope: the source slice must be a
    broadcast LEFT SEMI join (no giant IN-list in the plan) with the
    coarse time-range comparison pushed to the parquet scan."""
    import pg_lakehouse_spark.rollup as rollup_mod
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.rollup import _bucket_scope

    monkeypatch.setattr(rollup_mod, "_BUCKET_ISIN_CAP", 4)
    rows = [(i, f"2024-07-01 {i % 24:02d}:30:00", float(i)) for i in range(200)]
    df = spark.createDataFrame(
        rows, "id long, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    cat = LakeCatalog(spark, str(tmp_path / "wh_ps"))
    src = cat.create_table_as("db", "facts_ps", df)
    spec = {"time_col": "ts", "bucket": "1 hour"}
    aff = (
        src.read()
        .select(
            rollup_mod.time_bucket("ts", "1 hour").alias("__b")
        )
        .distinct()
    )
    scope = _bucket_scope(src, src, spec, aff)
    assert scope is not None
    slice_df, by_source_cond, _extend, n = scope
    assert n > 4
    plan = slice_df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "Broadcast" in plan, plan
    # coarse range comparison reaches the scan (pushed filter on ts)
    assert "PushedFilters" in plan and "ts" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], plan
    # the by-source condition is a range, not a 20-element IN list
    assert " IN " not in str(by_source_cond._jc), str(by_source_cond._jc)


def test_realtime_read_pure_append(catalog, events_df):
    """read_rollup_realtime before a refresh equals the refreshed
    rollup read: state + append delta merge at read time, nothing
    committed."""
    from pg_lakehouse_spark.rollup import read_rollup, read_rollup_realtime

    half = events_df.filter(F.col("event_id") % 2 == 0)
    rest = events_df.subtract(half)
    cat = catalog
    src = cat.create_table_as("db", "ev_rt", half)
    ru = create_rollup(
        cat, "db", "ru_rt", src, "ts", "1 hour", ["event_type"], METRICS
    )
    v_before = ru.current_version()
    src.append(rest)
    rt = read_rollup_realtime(src, ru)
    _assert_same(rt, _expected(events_df))
    assert ru.current_version() == v_before  # read-only
    # watermark-current: realtime == plain read
    refresh_rollup(src, ru)
    rt2 = read_rollup_realtime(src, ru)
    _assert_same(rt2, read_rollup(ru))


def test_realtime_read_with_dml_tail(catalog, events_df):
    """A tail containing row-level DML falls back to aggregating the
    source directly — still exact."""
    from pg_lakehouse_spark.rollup import read_rollup_realtime

    src = catalog.create_table_as("db", "ev_rt2", events_df)
    ru = create_rollup(
        catalog, "db", "ru_rt2", src, "ts", "1 hour", ["event_type"],
        METRICS,
    )
    src.delete(F.col("value_e2") % 7 == 0)
    src.append(
        events_df.filter(F.col("value_e2") % 7 == 0).withColumn(
            "value_e2", F.col("value_e2") + 1
        )
    )
    rt = read_rollup_realtime(src, ru)
    _assert_same(rt, _expected(src.read()))


def test_realtime_sql_surface(spark, catalog, events_df):
    """SELECT ... FROM ns.mv$realtime sees post-watermark appends;
    the plain mv read does not until REFRESH."""
    from pg_lakehouse_spark.sql import LakeSQL

    lsql = LakeSQL(spark, catalog)
    half = events_df.filter(F.col("event_id") % 2 == 0)
    src = catalog.create_table_as("db", "ev_rt3", half)
    lsql.sql(
        "CREATE MATERIALIZED VIEW db.mv_rt AS "
        "SELECT time_bucket('1 hour', ts) AS bucket_start, event_type, "
        "count(*) AS n FROM db.ev_rt3 GROUP BY bucket_start, event_type"
    )
    src.append(events_df.subtract(half))
    stale = lsql.sql(
        "SELECT sum(n) AS total FROM db.mv_rt"
    ).collect()[0].total
    live = lsql.sql(
        "SELECT sum(n) AS total FROM db.mv_rt$realtime"
    ).collect()[0].total
    assert stale == half.count()
    assert live == events_df.count()
