"""Semantics-level unit tests for the round-7-authored round8q queries —
crafted fixtures pinning the behaviors the sf-differential can't isolate
(age/acceptance arithmetic, cohort offsets, window membership, vocab-cut
ties, Gini formula, width-sweep monotonicity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_mini_projects_spark.functions.hashing import h64_py
from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.plans.round8q import (
    AGE_CAP,
    DAY_US,
    FRESH_BUCKETS,
    MULTIGRAIN_KS,
    VOCAB_K,
    WEEK_US,
    _es_cov,
)
from big_data_analytics_mini_projects_spark.sources.tables import load_table


def test_doc_freshness_age_and_acceptance_match_pure_python(spark, sf_dir):
    """Recompute the whole query row set in pure Python (h64_py + integer
    arithmetic) from the raw parquet and compare exactly."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts_us").collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()

    last_seen: dict[int, int] = {}
    gmax = 0
    for r in ev:
        b = h64_py(r["event_id"], "fb") % FRESH_BUCKETS
        last_seen[b] = max(last_seen.get(b, 0), r["ts_us"])
        gmax = max(gmax, r["ts_us"])

    expected: dict[tuple, list[int]] = {}
    for r in docs:
        b = h64_py(r["doc_id"], "fb") % FRESH_BUCKETS
        if b in last_seen:
            age = min((gmax - last_seen[b]) // DAY_US, AGE_CAP)
        else:
            age = AGE_CAP
        n_tok = len([t for t in r["text"].lower().split(" ") if t])
        kept = 1 if h64_py(r["doc_id"], "fr8") % (1 << age) == 0 else 0
        cell = expected.setdefault((r["source"], age), [0, 0, 0])
        cell[0] += 1
        cell[1] += kept
        cell[2] += n_tok * kept
    got = {
        (r["source"], r["age"]): [r["n_docs"], r["n_kept"], r["kept_tokens"]]
        for r in QUERIES["doc_freshness_by_event_time"].build(spark, sf_dir).collect()
    }
    assert got == expected


def test_retention_cohorts_fixture(spark):
    """3 users: u1 starts week 0 active weeks 0,1,3; u2 starts week 1 active
    1,1; u3 starts week 0 active 0 only."""
    rows = [
        (1, 0), (1, 1 * WEEK_US), (1, 3 * WEEK_US),
        (2, 1 * WEEK_US), (2, 1 * WEEK_US + 5),
        (3, 6),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long")
    e = df.select("user_id", (F.col("ts_us") / F.lit(WEEK_US)).cast("long").alias("week"))
    c = e.groupBy("user_id").agg(F.min("week").alias("cohort"))
    out = (
        e.join(c, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_week"),
            (F.col("week") - F.col("cohort")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"),
             F.count(F.lit(1)).alias("n_events"))
    )
    got = {(r["cohort_week"], r["week_offset"]): (r["n_users"], r["n_events"])
           for r in out.collect()}
    assert got == {
        (0, 0): (2, 2),   # u1 w0, u3 w0
        (0, 1): (1, 1),   # u1 w1
        (0, 3): (1, 1),   # u1 w3
        (1, 0): (1, 2),   # u2 twice in w1
    }


def test_sliding_window_every_event_in_exactly_two_windows(spark, sf_dir):
    out = QUERIES["sliding_window_event_rate"].build(spark, sf_dir)
    n_windowed = out.agg(F.sum("n")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    assert n_windowed == 2 * n_events
    # window starts align to the 30-min grid
    bad = out.where(F.col("win_start_us") % 1_800_000_000 != 0).count()
    assert bad == 0


def test_event_transitions_fixture(spark):
    rows = [
        (1, 100, 1, "a"), (1, 200, 2, "b"), (1, 300, 3, "a"),
        (2, 100, 4, "b"), (2, 150, 5, "b"),
        (3, 50, 6, "a"),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, event_id long, event_type string")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    o = df.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in o.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}


def test_oov_rate_vocab_cut_is_deterministic(spark, sf_dir):
    """The rank-VOCAB_K cut must use the (count desc, token asc) total order:
    re-running gives the identical oov set, and oov_tokens + in-vocab tokens
    == total."""
    a = QUERIES["oov_rate_by_source"].build(spark, sf_dir).collect()
    b = QUERIES["oov_rate_by_source"].build(spark, sf_dir).collect()
    ka = sorted((r["source"], r["total_tokens"], r["oov_tokens"]) for r in a)
    kb = sorted((r["source"], r["total_tokens"], r["oov_tokens"]) for r in b)
    assert ka == kb
    for r in a:
        assert 0 <= r["oov_tokens"] <= r["total_tokens"]
        assert abs(r["oov_rate"] - round(r["oov_tokens"] / r["total_tokens"], 6)) < 1e-9


def test_gini_known_values(spark):
    """Equal masses -> 0; [1,0,0,...] concentration -> (n-1)/n."""
    from big_data_analytics_mini_projects_spark.functions.text import round_stable
    from pyspark.sql import Window

    def gini_of(masses):
        df = spark.createDataFrame(
            [(f"s{i}", m) for i, m in enumerate(masses)], "source string, toks long"
        )
        r = df.select(
            "toks",
            F.row_number().over(Window.orderBy(F.asc("toks"), F.asc("source"))).alias("i"),
        )
        return r.agg(
            round_stable(
                (2 * F.sum(F.col("i") * F.col("toks"))
                 - (F.count(F.lit(1)) + 1) * F.sum("toks")).cast("double")
                / (F.count(F.lit(1)) * F.sum("toks")),
                6,
            ).alias("g")
        ).collect()[0]["g"]

    assert gini_of([7, 7, 7, 7]) == 0.0
    assert gini_of([10, 0, 0, 0]) == 0.75  # (n-1)/n with n=4
    assert gini_of([1, 2, 3, 4]) == 0.25


def test_multigrain_widths_monotone_dup_mass(spark, sf_dir):
    """Longer required match length can only shrink (or hold) the duplicated
    set: dup_tokens and n_docs must be non-increasing in K, because every
    K+d-token duplicated span contains a K-token duplicated span with the
    same cross-document support."""
    out = {r["width"]: r for r in
           QUERIES["dedup_substring_multigrain"].build(spark, sf_dir).collect()}
    assert set(out) == set(MULTIGRAIN_KS)
    ks = sorted(MULTIGRAIN_KS)
    for a, b in zip(ks, ks[1:]):
        assert out[a]["dup_tokens"] >= out[b]["dup_tokens"], (a, b)
        assert out[a]["n_docs"] >= out[b]["n_docs"], (a, b)


def test_multigrain_crafted_cross_doc_dup(spark):
    """Two docs sharing a 12-token run: K=8 and K=12 see it, K=16 doesn't."""
    shared = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(0, shared + " xxa xxb"), (1, "yya " + shared), (2, "zz " * 20)],
        "doc_id long, text string",
    )
    out = {}
    for k in MULTIGRAIN_KS:
        row = _es_cov(docs, k).collect()[0]
        out[k] = (row["n_docs"], row["dup_tokens"])
    assert out[8] == (2, 24)    # both docs fully cover the 12-token run
    assert out[12] == (2, 24)
    assert out[16] == (0, None) or out[16][0] == 0


def test_event_time_timeout_boundary_semantics_pin(spark, tmp_path):
    """PINS the Spark behaviors stream_sessions_closed's oracle arithmetic
    relies on: (a) availableNow runs a final no-data batch that fires
    event-time timeouts; (b) a timeout fires iff timeout_ms is STRICTLY
    below the watermark; (c) event-time micros are FLOORED to ms for the
    watermark. Keys: A timeout == watermark (must NOT fire), B watermark-1
    (must fire), C above watermark (must not). The max event carries .999 ms
    of sub-ms micros, so a round/ceil watermark would flip A."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = str(tmp_path / "probe_src")
    df1 = spark.createDataFrame(
        [("A", 1_000_000_000), ("B", 1_000_000_000)], "k string, tus long"
    )
    df2 = spark.createDataFrame([("C", 2_000_000_999)], "k string, tus long")
    df1.coalesce(1).write.parquet(src + "/f1")
    df2.coalesce(1).write.parquet(src + "/f2")
    sdf = (
        spark.readStream.schema("k string, tus long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
        .withColumn("ts", F.timestamp_micros(F.col("tus")))
        .withWatermark("ts", "0 seconds")
    )
    timeouts = {"A": 2_000_000, "B": 1_999_999, "C": 3_000_000}

    def update(key, pdfs, state):
        k = key[0]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"k": [k], "fired": [1]})
            return
        for _ in pdfs:
            pass
        state.update((1,))
        state.setTimeoutTimestamp(timeouts[k])
        yield pd.DataFrame({"k": [k], "fired": [0]})

    out = sdf.groupBy("k").applyInPandasWithState(
        update, "k string, fired int", "n int", "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    import uuid

    name = f"pin_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    fired = {r["k"] for r in spark.table(name).collect() if r["fired"] == 1}
    assert fired == {"B"}, fired


def test_stream_sessions_closed_fixture(spark, tmp_path):
    """Crafted single-file stream: u1 has two sessions split by a >=10min
    gap (first closed by event; second old enough that the watermark evicts
    it); u2's only session ends at the global max ts (never evicted); u3's
    session ends exactly gap-before-gmax at ms resolution (boundary: NOT
    evicted, because (last+gap)//1000 == gmax//1000 is not strictly less)."""
    from big_data_analytics_mini_projects_spark.streaming.stream_stats import (
        SESSIONS_GAP_US,
        stream_sessions_closed,
        run_available_now,
    )

    G = SESSIONS_GAP_US
    gmax = 10_000_000_000  # u2's last event
    rows = [
        (1, 1_000, 1, 1.0),
        (1, 2_000, 2, 2.0),            # same session (gap < G)
        (1, 2_000 + G, 3, 3.0),       # exactly G later -> closes session 1
        (2, gmax, 4, 4.0),            # global max; open forever
        (3, gmax - G, 5, 5.555),      # (last+G)//1000 == gmax//1000 -> kept
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long, value double"
    )
    src = str(tmp_path / "sess_src")
    df.coalesce(1).write.parquet(src)
    sdf = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    out = run_available_now(stream_sessions_closed(sdf), output_mode="append")
    got = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"],
         r["n_events"], r["total_cents"], r["closed_by"])
        for r in out.collect()
    )
    assert got == [
        (1, 1_000, 2_000 + G, 2, 300, "event"),       # 1.0+2.0 -> 300 cents
        (1, 2_000 + G, 2_000 + 2 * G, 1, 300, "timeout"),
    ], got
