"""Structured Streaming tests: run each job for real (availableNow
trigger + memory sink) and compare against its batch twin."""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
from accounts_receivable_data_pipeline_api_spark.streaming import (
    dedup_invoice_stream,
    events_windowed_counts,
    invoice_csv_stream,
    sessionize_events,
)

pytestmark = pytest.mark.filterwarnings("ignore::FutureWarning")


def _run_available_now(stream_df, name: str):
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return query


def _events_stream(spark, sf_dir, out_dir):
    """Re-stage events as a file-source stream (one parquet per batch)."""
    events = load_table(spark, sf_dir, "events")
    path = os.path.join(out_dir, "events_stream")
    events.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(events.schema).parquet(path), events


def _stage_ordered_batches(src, batch_dfs):
    """Write each DataFrame as one single-file parquet dir under src
    with strictly increasing mtimes — the parquet file source orders
    files by MODIFICATION TIME, so with maxFilesPerTrigger=1 the stream
    replays exactly one input DataFrame per microbatch, in list order.
    This mtime trick is load-bearing for every ordered-replay test in
    this module; keep it in one place. Returns the shared schema."""
    os.makedirs(src, exist_ok=True)
    now = 2_000_000_000
    for i, df in enumerate(batch_dfs):
        d = f"{src}/b{i}"
        df.coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            os.utime(f"{d}/{f}", (now + i * 60, now + i * 60))
    return batch_dfs[0].schema


def _ordered_stream(spark, src, schema):
    """readStream over _stage_ordered_batches output: one file (= one
    staged DataFrame) per microbatch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )


def test_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    stream_src, events_batch = _events_stream(spark, sf_dir, str(tmp_path))
    out = events_windowed_counts(stream_src, window="1 hour", watermark="2 hours")
    # Both twins emit the canonical TIMESTAMP_NTZ event time (round-3
    # ADVICE): collected keys are naive wall-clock datetimes on BOTH
    # sides, so the dict comparison below is host-timezone-independent.
    assert dict(out.dtypes)["window_start"] == "timestamp_ntz"
    assert dict(events_batch.dtypes)["ts"] == "timestamp_ntz"
    _run_available_now(out, "win_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            events_batch.groupBy(
                F.date_trunc("hour", "ts").alias("window_start"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_value"),
            )
            .collect()
        )
    }
    # availableNow + watermark: windows at the tail may be withheld until
    # the watermark passes; every emitted window must match batch exactly.
    assert len(got) > 0
    for key, val in got.items():
        assert expected[key] == val, key
    assert len(got) >= len(expected) - 3  # at most the tail windows withheld


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    """Watermark semantics, shown concretely. Spark's guarantee is
    eviction-based, not arrival-time-based: a straggler merges into its
    window as long as the window's STATE is still alive, and is dropped
    only once the watermark has evicted that state (verified empirically
    — a 2-batch version of this test shows the late row merging). Three
    microbatches (maxFilesPerTrigger=1, mtime-ordered files):
      b1: 10:10+10:40 (window W10) and 15:30  -> watermark becomes 14:30
      b2: fresh 16:30 row -> W10 (end 11:00 < 14:30) is evicted and
          EMITTED with exactly b1's two rows; watermark becomes 15:30
      b3: 10:30 straggler -> older than watermark, state gone: dropped,
          and crucially W10 is NOT re-emitted (append mode would
          otherwise produce a duplicate, corrupting downstream sinks)."""
    import datetime as dt
    import os

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    cols = ["event_id", "ts", "event_type", "value"]
    batches = [
        [(1, t(10, 10), "click", 1.0), (2, t(10, 40), "click", 2.0), (3, t(15, 30), "click", 4.0)],
        [(5, t(16, 30), "click", 16.0)],
        [(4, t(10, 30), "click", 8.0)],
    ]
    schema = _stage_ordered_batches(src, [spark.createDataFrame(r, cols) for r in batches])
    stream = _ordered_stream(spark, src, schema)
    out = events_windowed_counts(stream, window="1 hour", watermark="1 hour")
    _run_available_now(out, "late_drop")
    emitted = [
        (r["window_start"], r["n"], float(r["sum_value"]))
        for r in spark.sql("select * from late_drop").collect()
        if r["window_start"] == t(10, 0)
    ]
    # exactly ONE emission of the 10:00 window, with only b1's rows
    assert emitted == [(t(10, 0), 2, 3.0)], emitted


def test_invoice_stream_dedup(spark, tmp_path):
    src = tmp_path / "csv_in"
    src.mkdir()
    header = "CustomerName,InvoiceNumber,InvoiceDate,CustomerPoNumber,BillTotal,Applied,Status,Currency,ContactName,ContactPhone,ContactEmail,CustomerTerms,DueDate"
    (src / "batch1.csv").write_text(
        f"{header}\nAcme,INV-1,1/5/24,PO-1,100,0,Pending,USD,,,,Net 30,\n"
        f"Acme,INV-2,1/6/24,PO-2,200,0,Pending,USD,,,,Net 30,\n"
        f"Acme,INV-1,1/7/24,PO-3,300,0,Pending,USD,,,,Net 30,\n"
    )
    parsed = invoice_csv_stream(spark, str(src))
    deduped = dedup_invoice_stream(parsed)
    _run_available_now(deduped, "inv_dedup")
    rows = spark.sql("select invoice_number, bill_total from inv_dedup").collect()
    by_key = {r["invoice_number"]: r["bill_total"] for r in rows}
    assert set(by_key) == {"INV-1", "INV-2"}  # duplicate INV-1 dropped


def test_sessionize_events(spark, sf_dir, tmp_path):
    stream_src, events_batch = _events_stream(spark, sf_dir, str(tmp_path))
    sessions = sessionize_events(stream_src.filter(F.col("user_id") < 20))
    _run_available_now(sessions, "sessions")
    rows = spark.sql("select * from sessions").collect()
    # Sessions only emit when a >30min gap CLOSES them within the fed
    # data; with a month of synthetic events per user there must be many.
    assert len(rows) > 0
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
    # batch cross-check for one user: number of >30min gaps == closed sessions
    uid = rows[0]["user_id"]
    ts = [
        r["ts"]
        for r in events_batch.filter(F.col("user_id") == uid).orderBy("ts").collect()
    ]
    gaps = sum(
        1 for a, b in zip(ts, ts[1:]) if (b - a).total_seconds() > 1800
    )
    n_sessions_for_uid = sum(1 for r in rows if r["user_id"] == uid)
    assert n_sessions_for_uid == gaps  # last (open) session not emitted


def test_stream_upsert_merges_batches(spark, tmp_path):
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        read_snapshot_table,
        stream_upsert_invoices,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [("INV-1", 100.0, "open"), ("INV-2", 200.0, "open")],
        ["invoice_number", "bill_total", "status"],
    )
    b2 = spark.createDataFrame(
        [("INV-2", 250.0, "closed"), ("INV-3", 300.0, "open")],
        ["invoice_number", "bill_total", "status"],
    )
    schema = _stage_ordered_batches(src, [b1, b2])
    stream = _ordered_stream(spark, src, schema)
    target = str(tmp_path / "table")
    os.makedirs(target)
    q = stream_upsert_invoices(stream, target, str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)

    final = read_snapshot_table(spark, target)
    rows = {r.invoice_number: (r.bill_total, r.status) for r in final.collect()}
    assert rows == {
        "INV-1": (100.0, "open"),
        "INV-2": (250.0, "closed"),  # batch 2 overrides batch 1
        "INV-3": (300.0, "open"),
    }


def test_stream_static_enrichment_matches_batch_join(spark, sf_dir, tmp_path):
    """Stream-static broadcast enrichment must produce exactly the rows
    of the equivalent batch join, and must pick up a dim REFRESH between
    microbatches (the static side re-scans per batch)."""
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        enrich_events_with_dim,
    )

    stream, events = _events_stream(spark, sf_dir, str(tmp_path))
    dim = (
        events.select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 3).cast("int"))
    )
    dim_path = str(tmp_path / "user_dim")
    dim.write.mode("overwrite").parquet(dim_path)
    static_dim = spark.read.parquet(dim_path)

    out = enrich_events_with_dim(
        stream.select("event_id", "user_id"), static_dim, on="user_id"
    )
    _run_available_now(out, "enriched")
    got = {
        (r["event_id"], r["segment"])
        for r in spark.sql("select * from enriched").collect()
    }
    expected = {
        (r["event_id"], r["segment"])
        for r in events.select("event_id", "user_id")
        .join(F.broadcast(dim), "user_id", "left")
        .collect()
    }
    assert got == expected


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream purchase<->signup join (watermarked, time-bounded
    both sides) must produce exactly the batch join's row set."""
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        join_purchases_to_signups_stream,
    )

    stream, events = _events_stream(spark, sf_dir, str(tmp_path))
    out = join_purchases_to_signups_stream(stream, watermark="30 days", within="1 hour")
    _run_available_now(out, "ss_join")
    got = {
        (r["user_id"], r["purchase_event_id"], r["signup_event_id"])
        for r in spark.sql("select * from ss_join").collect()
    }
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("se"), F.col("ts").alias("sts")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pe"), F.col("ts").alias("pts")
    )
    expected = {
        (r["user_id"], r["pe"], r["se"])
        for r in p.join(
            s,
            (p.user_id == s.u)
            & (p.pts >= s.sts)
            & (p.pts <= s.sts + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    # availableNow may withhold tail rows not yet past the watermark;
    # with a 30-day watermark nothing is withheld on this dataset.
    assert got == expected


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: an unmatched signup must emit
    exactly once, with NULL purchase columns, and only after the
    watermark proves no purchase can still match (passes
    signup_ts + within). Three mtime-ordered microbatches:
      b1: u1 signup 10:00 + purchase 10:30 (matches, emits inner row);
          u2 signup 10:00 with no purchase (buffered)
      b2: u99 signup 20:00 -> watermark advances to 19:00 > 11:00
      b3: unrelated u98 purchase -> trigger fires, u2's evicted signup
          emits with NULL purchase columns; u99 (still inside the
          watermark horizon) stays withheld."""
    import datetime as dt

    from accounts_receivable_data_pipeline_api_spark.streaming import (
        join_purchases_to_signups_stream,
    )

    src = str(tmp_path / "ssj_lo_src")
    os.makedirs(src)
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    cols = ["event_id", "ts", "user_id", "event_type"]
    batches = [
        [
            (1, t(10, 0), 1, "signup"),
            (2, t(10, 30), 1, "purchase"),
            (3, t(10, 0), 2, "signup"),
        ],
        [(4, t(20, 0), 99, "signup")],
        [(5, t(21, 0), 98, "purchase")],
    ]
    schema = _stage_ordered_batches(src, [spark.createDataFrame(r, cols) for r in batches])
    stream = _ordered_stream(spark, src, schema)
    out = join_purchases_to_signups_stream(
        stream, watermark="1 hour", within="1 hour", how="left_outer"
    )
    _run_available_now(out, "ssj_lo")
    got = {
        (r["user_id"], r["signup_event_id"], r["purchase_event_id"])
        for r in spark.sql("select * from ssj_lo").collect()
    }
    assert got == {(1, 1, 2), (2, 3, None)}, got


def _state_rows_per_batch(query) -> list[int]:
    """Total state-store rows after each microbatch, from the query's
    progress telemetry."""
    import json

    out = []
    for p in query.recentProgress:
        prog = json.loads(p.json) if hasattr(p, "json") else p
        ops = prog.get("stateOperators") or []
        if ops:
            out.append(sum(op["numRowsTotal"] for op in ops))
    return out


def test_sessionize_state_plateaus_across_many_microbatches(spark, tmp_path):
    """The claim streaming/pipeline.py makes but never measured (round-3
    VERDICT #6): sessionize state is O(active users), NOT O(events).
    Drive 8 microbatches of ever-new events for a fixed user set and
    assert stateOperators.numRowsTotal plateaus at the user count — one
    open-session row per user — while input keeps growing."""
    import datetime as dt

    n_batches, n_users = 8, 4
    src = str(tmp_path / "sess_state_src")
    os.makedirs(src)
    cols = ["event_id", "user_id", "ts", "event_type", "value"]
    base = dt.datetime(2024, 1, 1, 0, 0)
    eid = 0
    batch_dfs = []
    for b in range(n_batches):
        rows = []
        for u in range(n_users):
            eid += 1
            # 1 hour apart > 30 min gap: each batch closes the previous
            # session and opens a new one — sessions EMIT continuously
            # while state stays at one open session per user
            rows.append((eid, u, base + dt.timedelta(hours=b), "click", 1.0))
        batch_dfs.append(spark.createDataFrame(rows, cols))
    schema = _stage_ordered_batches(src, batch_dfs)
    stream = _ordered_stream(spark, src, schema)
    query = _run_available_now(sessionize_events(stream), "sess_state")
    states = _state_rows_per_batch(query)
    assert len(states) >= n_batches - 1, states
    # plateau: bounded by the user count at EVERY batch, never the
    # event count (n_batches * n_users = 32 here)
    assert max(states) <= n_users, states
    assert states[-1] <= n_users, states
    # and the operator actually emitted the closed sessions
    emitted = spark.sql("select * from sess_state").count()
    assert emitted >= n_users * (n_batches - 2)


def test_stream_stream_join_state_plateaus_with_watermark(spark, tmp_path):
    """Stream-stream join state must be O(watermark horizon), not
    O(stream): with event time advancing one hour per microbatch and a
    1-hour watermark, buffered rows older than watermark+within are
    evicted, so numRowsTotal plateaus while total input grows linearly.
    This is the measured form of the eviction argument in
    join_purchases_to_signups_stream's docstring."""
    import datetime as dt

    from accounts_receivable_data_pipeline_api_spark.streaming import (
        join_purchases_to_signups_stream,
    )

    n_batches, n_users = 10, 3
    src = str(tmp_path / "ssj_state_src")
    os.makedirs(src)
    cols = ["event_id", "user_id", "ts", "event_type", "value"]
    base = dt.datetime(2024, 1, 1, 0, 0)
    eid = 0
    batch_dfs = []
    for b in range(n_batches):
        rows = []
        t0 = base + dt.timedelta(hours=b)
        for u in range(n_users):
            eid += 1
            rows.append((eid, u, t0, "signup", 0.0))
            eid += 1
            rows.append((eid, u, t0 + dt.timedelta(minutes=10), "purchase", 5.0))
        batch_dfs.append(spark.createDataFrame(rows, cols))
    schema = _stage_ordered_batches(src, batch_dfs)
    stream = (
        _ordered_stream(spark, src, schema)
    )
    out = join_purchases_to_signups_stream(
        stream, watermark="1 hour", within="30 minutes"
    )
    query = _run_available_now(out, "ssj_state")
    states = _state_rows_per_batch(query)
    assert len(states) >= n_batches - 1, states
    total_rows = 2 * n_users * n_batches
    # plateau: once the watermark starts evicting (a few batches in),
    # state stops growing — the tail must not exceed the early maximum,
    # and nothing ever approaches unbounded buffering of the stream
    ramp, tail = states[: n_batches // 2], states[n_batches // 2 :]
    assert max(tail) <= max(ramp), states
    assert max(states) < total_rows, states
    # every in-window purchase matched its signup
    matched = spark.sql("select * from ssj_state").count()
    assert matched >= n_users * (n_batches - 2)


def test_sliding_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    """Sliding (overlapping) windows: every emitted (window, type) row
    must equal its batch twin, and only windows whose end is still
    inside the watermark horizon may be withheld by availableNow."""
    import datetime as dt

    stream_src, events_batch = _events_stream(spark, sf_dir, str(tmp_path))
    out = events_windowed_counts(
        stream_src, window="1 hour", watermark="2 hours", slide="30 minutes"
    )
    _run_available_now(out, "slide_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("select * from slide_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            events_batch.groupBy(
                F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_value"),
            )
            .select(F.col("win.start").alias("window_start"), "event_type", "n", "sum_value")
            .collect()
        )
    }
    assert set(got) <= set(expected)
    assert all(got[k] == expected[k] for k in got)
    # withheld => window end (start + 1h) > watermark (max_ts - 2h)
    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - dt.timedelta(hours=3)
    withheld = set(expected) - set(got)
    assert all(ws > horizon for (ws, _et) in withheld), sorted(withheld)[:5]


def test_stream_decontaminate_matches_batch(spark, sf_dir, tmp_path):
    """Documents fed as multiple microbatches through the streaming
    decontamination sink must produce the exact batch-operator result:
    per-doc contamination is batch-local (grams never span rows), so
    streaming == batch row-for-row."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        decontaminate,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from accounts_receivable_data_pipeline_api_spark.streaming.pipeline import (
        decontaminate_doc_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    train = docs.filter(F.col("doc_id") % 37 != 0)

    src_dir = str(tmp_path / "docs_in")
    # three chunks -> three microbatches (maxFilesPerTrigger=1)
    for i in range(3):
        train.filter(F.col("doc_id") % 3 == i).write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out_dir = str(tmp_path / "decon_out")
    q = decontaminate_doc_stream(
        stream, bench, out_dir, str(tmp_path / "ckpt"), n=5
    ).start()
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.n_grams, r.n_hits, r.contaminated)
        for r in spark.read.parquet(out_dir).collect()
    }
    expected = {
        r.doc_id: (r.n_grams, r.n_hits, r.contaminated)
        for r in decontaminate(train, bench, n=5).collect()
    }
    assert got == expected
    batches = {r.batch_id for r in spark.read.parquet(out_dir).collect()}
    assert len(batches) >= 2  # genuinely ran as multiple microbatches


def test_incremental_dedup_stream_catches_cross_batch_dups(spark, tmp_path):
    """Three microbatches through the streaming incremental dedup: a
    duplicate WITHIN a batch is dup_in_new (min-id wins), a duplicate
    of ANY earlier batch is dup_of_old (caught via the persisted
    fingerprint table, arbitrarily far apart in time), and the
    fingerprint table ends holding exactly the kept hashes."""
    import os

    from accounts_receivable_data_pipeline_api_spark.streaming import (
        incremental_dedup_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        [(1, "alpha content"), (2, "beta content"), (3, "ALPHA   content")],
        [(10, "alpha content"), (11, "gamma content")],
        [(20, "gamma content"), (21, "delta content"), (22, "delta content")],
    ]
    schema = "doc_id long, text string"
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])
    stream = _ordered_stream(spark, src, schema)
    fp_dir = str(tmp_path / "fingerprints")
    out_dir = str(tmp_path / "verdicts")
    q = incremental_dedup_stream(
        stream, fp_dir, out_dir, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.status, r.batch_id)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        1: ("kept", 0),
        2: ("kept", 0),
        3: ("dup_in_new", 0),  # normalization: ALPHA   content == alpha content
        10: ("dup_of_old", 1),  # caught against batch 0's fingerprints
        11: ("kept", 1),
        20: ("dup_of_old", 2),  # caught against batch 1's fingerprints
        21: ("kept", 2),
        22: ("dup_in_new", 2),
    }
    fps = spark.read.parquet(fp_dir)
    assert fps.count() == 4  # alpha, beta, gamma, delta — kept hashes only
    assert fps.select("content_hash").distinct().count() == 4


def test_incremental_dedup_stream_replay_is_idempotent(spark, tmp_path):
    """Replay simulation: process one batch, wipe the streaming
    checkpoint (so the same files re-run as the same batch_id 0), and
    re-run. The replayed batch must overwrite its own partitions — not
    append a second copy of the verdicts — and must NOT see its own
    first-attempt fingerprints as 'old' (which would flip its kept
    docs to dup_of_old)."""
    import os
    import shutil

    from accounts_receivable_data_pipeline_api_spark.streaming import (
        incremental_dedup_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "alpha content"), (2, "beta content"), (3, "alpha content")], schema
    ).coalesce(1).write.parquet(f"{src}/b0")

    fp_dir = str(tmp_path / "fingerprints")
    out_dir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(schema).parquet(f"{src}/*")
        q = incremental_dedup_stream(stream, fp_dir, out_dir, ckpt).start()
        q.awaitTermination(120)

    run()
    first = sorted(
        (r.doc_id, r.status, r.batch_id)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert [s for _, s, _ in first] == ["kept", "kept", "dup_in_new"]
    shutil.rmtree(ckpt)  # lose the commit log -> batch 0 replays
    run()
    again = sorted(
        (r.doc_id, r.status, r.batch_id)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert again == first  # no duplicate rows, no status flips
    fps = spark.read.parquet(fp_dir)
    assert fps.count() == 2  # alpha, beta — still exactly the kept set


def test_token_frequency_sketch_stream_matches_batch(spark, tmp_path):
    """Streaming CMS: per-batch partials sum to EXACTLY the batch
    sketch of the whole corpus (additivity), and a replayed batch
    overwrites its own partial instead of double-counting."""
    import os
    import shutil

    import numpy as np

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        cms_build,
        cms_query,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        read_sketch,
        token_frequency_sketch_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    batches = [
        [(1, "spark spark shuffle"), (2, "spark join")],
        [(10, "shuffle shuffle partition")],
    ]
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])

    sk_dir = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = _ordered_stream(spark, src, schema)
        q = token_frequency_sketch_stream(stream, sk_dir, ckpt).start()
        q.awaitTermination(120)

    run()
    lifetime = read_sketch(spark, sk_dir)
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    tokens = all_docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    assert np.array_equal(lifetime, cms_build(tokens, "token"))
    est = cms_query(lifetime, ["spark", "shuffle", "partition", "absent"])
    assert est["spark"] == 3 and est["shuffle"] == 3 and est["partition"] == 1
    assert est["absent"] == 0

    # replay: wipe checkpoint, rerun -> partials rewritten, sums equal
    shutil.rmtree(ckpt)
    run()
    assert np.array_equal(read_sketch(spark, sk_dir), lifetime)


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path):
    """Streaming funnel twin: chronological multi-batch replay must
    reproduce the batch operator's per-step user counts exactly, and
    every per-user transition sequence must be strictly increasing in
    both ts and stage."""
    from accounts_receivable_data_pipeline_api_spark.operators import events as ev_ops
    from accounts_receivable_data_pipeline_api_spark.streaming import funnel_events_stream

    steps = ["view", "click", "purchase"]
    events_batch = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    src = str(tmp_path / "funnel_src")
    os.makedirs(src)
    # three chronological batches (the synthetic events span Jan 2024)
    lo, hi = "2024-01-10", "2024-01-20"
    parts = [
        events_batch.filter(F.col("ts") < F.lit(lo).cast("timestamp_ntz")),
        events_batch.filter(
            (F.col("ts") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(hi).cast("timestamp_ntz"))
        ),
        events_batch.filter(F.col("ts") >= F.lit(hi).cast("timestamp_ntz")),
    ]
    schema = _stage_ordered_batches(src, parts)
    stream = _ordered_stream(spark, src, schema)
    out = funnel_events_stream(stream, steps)
    _run_available_now(out, "funnel_stream")
    rows = spark.sql("select * from funnel_stream").collect()
    assert rows

    # per-step user counts == batch operator
    batch_counts = {
        r["step_name"]: r["n_users"]
        for r in ev_ops.funnel(events_batch, steps).collect()
    }
    # seed every step: the batch operator emits an n_users=0 row for an
    # unreached step, the stream emits nothing for it
    stream_counts: dict = {s: 0 for s in steps}
    for r in rows:
        stream_counts[r["step_name"]] += 1
    assert stream_counts == batch_counts

    # per-user: stages emitted at most once each, in order, ts strictly
    # increasing
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["step"], r["ts"]))
    for u, trans in by_user.items():
        trans.sort()
        assert [s for s, _ in trans] == list(range(len(trans)))
        ts_seq = [t for _, t in trans]
        assert all(a < b for a, b in zip(ts_seq, ts_seq[1:]))


def test_funnel_kernel_drops_null_ts():
    """The stateful funnel kernel must skip NULL timestamps exactly like
    the batch twin's min() does (round-5 ADVICE: NaT.value is int64-min,
    so a dirty stage-0 row either advanced the state machine with a
    garbage threshold or raised OutOfBoundsDatetime in the worker)."""
    import pandas as pd

    from accounts_receivable_data_pipeline_api_spark.streaming.pipeline import (
        make_funnel_fn,
    )

    class _FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    steps = ["view", "click"]
    dirty = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "ts": pd.to_datetime(
                [None, "2024-01-02 00:00:00", None, "2024-01-03 00:00:00"]
            ),
            "event_type": ["view", "view", "click", "click"],
        }
    )
    clean = dirty[dirty["ts"].notna()].reset_index(drop=True)

    out_dirty, out_clean = [], []
    for pdf, sink in ((dirty, out_dirty), (clean, out_clean)):
        state = _FakeState()
        for chunk in make_funnel_fn(steps)((1,), [pdf], state):
            sink.append(chunk)
        assert state.get[0] == 2  # both steps reached on the clean rows
    got_d = pd.concat(out_dirty).reset_index(drop=True)
    got_c = pd.concat(out_clean).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_d, got_c)
    # and the NULL-ts 'click' row did not satisfy stage 1: the emitted
    # click threshold is the real 2024-01-03 event
    assert str(got_d.loc[got_d["step_name"] == "click", "ts"].iloc[0]) == (
        "2024-01-03 00:00:00"
    )


def test_streaming_funnel_replay_after_restart(spark, sf_dir, tmp_path):
    """Replay-safety contract (same as the CMS / incremental-dedup
    streams): process three chronological microbatches through a
    parquet sink with a checkpoint, then simulate a crash between the
    sink commit and the checkpoint commit by deleting the LAST batch's
    commit marker and restarting. The replayed batch re-runs against
    the state version it originally read, the file sink's metadata log
    skips the already-committed output, and the per-step transitions
    are byte-identical — no double emissions, no state corruption."""
    from accounts_receivable_data_pipeline_api_spark.operators import events as ev_ops
    from accounts_receivable_data_pipeline_api_spark.streaming import funnel_events_stream

    steps = ["view", "click", "purchase"]
    events_batch = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    src = str(tmp_path / "funnel_replay_src")
    out = str(tmp_path / "funnel_replay_out")
    ckpt = str(tmp_path / "funnel_replay_ckpt")
    lo, hi = "2024-01-10", "2024-01-20"
    parts = [
        events_batch.filter(F.col("ts") < F.lit(lo).cast("timestamp_ntz")),
        events_batch.filter(
            (F.col("ts") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(hi).cast("timestamp_ntz"))
        ),
        events_batch.filter(F.col("ts") >= F.lit(hi).cast("timestamp_ntz")),
    ]
    schema = _stage_ordered_batches(src, parts)

    def run():
        stream = _ordered_stream(spark, src, schema)
        q = (
            funnel_events_stream(stream, steps)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        # the checkpoint-dir concurrency guard deregisters the query a
        # beat after awaitTermination returns; the restart below must
        # not race it
        deadline = time.time() + 30
        while any(a.id == q.id for a in spark.streams.active):
            assert time.time() < deadline, "query did not deregister"
            time.sleep(0.2)

    run()
    first = sorted(
        (r.user_id, r.step, r.step_name, r.ts)
        for r in spark.read.parquet(out).collect()
    )
    assert first

    # crash window: batch 2's sink output is committed (_spark_metadata/2
    # exists) but its checkpoint commit never landed -> batch 2 replays
    # on restart. The sibling Hadoop checksum file must go with it — a
    # stale .2.crc makes the re-created commit fail verification, which
    # Spark surfaces as a bogus "multiple streaming queries" error.
    os.remove(f"{ckpt}/commits/2")
    crc = f"{ckpt}/commits/.2.crc"
    if os.path.exists(crc):
        os.remove(crc)
    run()
    again = sorted(
        (r.user_id, r.step, r.step_name, r.ts)
        for r in spark.read.parquet(out).collect()
    )
    assert again == first

    # and the surviving counts still equal the batch twin's funnel
    batch_counts = {
        r["step_name"]: r["n_users"]
        for r in ev_ops.funnel(events_batch, steps).collect()
    }
    stream_counts: dict = {s: 0 for s in steps}
    for _, _, name, _ in again:
        stream_counts[name] += 1
    assert stream_counts == batch_counts


def test_distinct_sketch_stream_matches_batch(spark, tmp_path):
    """Streaming portable HLL: the groupBy-max fold of per-batch
    register partials equals the batch register table over the whole
    corpus (max merges exactly), the estimate over the fold equals the
    batch estimate, and a replayed run leaves the fold unchanged
    (replay-idempotence via the batch_id partition contract AND max's
    idempotence)."""
    import os
    import shutil

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        distinct_sketch_stream,
        read_registers,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    batches = [
        [(i, f"user{i % 7}") for i in range(1, 6)],
        [(i, f"user{i % 11}") for i in range(6, 14)],
    ]
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])

    reg_dir = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = _ordered_stream(spark, src, schema)
        q = distinct_sketch_stream(stream, reg_dir, ckpt, item_col="text").start()
        q.awaitTermination(120)

    run()
    folded = read_registers(spark, reg_dir)
    all_rows = spark.createDataFrame([r for b in batches for r in b], schema)
    batch_reg = hll_registers(all_rows, "text")
    assert folded.exceptAll(batch_reg).count() == 0
    assert batch_reg.exceptAll(folded).count() == 0
    est = hll_estimate(folded).collect()[0]
    batch_est = hll_estimate(batch_reg).collect()[0]
    assert est["estimate"] == batch_est["estimate"]
    assert est["sum_scaled"] == batch_est["sum_scaled"]
    # linear-counting regime at 11 distinct items: estimate is close
    exact = all_rows.select("text").distinct().count()
    assert abs(est["estimate"] - exact) / exact < 0.2, (est["estimate"], exact)

    # replay: wipe checkpoint, rerun -> partials rewritten, fold equal
    shutil.rmtree(ckpt)
    run()
    refolded = read_registers(spark, reg_dir)
    assert refolded.exceptAll(batch_reg).count() == 0
    assert batch_reg.exceptAll(refolded).count() == 0


def test_timegrain_continuous_aggregate_matches_batch_rollup(spark, tmp_path):
    """The time-grain continuous aggregate (round-11 VERDICT #5): the
    streaming feed persists per-(day, hour) register partials; the
    read_daily_distinct view max-merges them to day grain and prices
    them with the SAME composition as the batch rollup
    (plans/raw_ops.py:op_hll_rollup), so over the same closed rows the
    view equals the batch rollup bit-for-bit (registers AND estimates);
    compaction (distributed-merge generation) leaves both the hourly
    state and the daily view exactly unchanged; a checkpoint-wiped
    replay is idempotent (partition contract + max idempotence)."""
    import datetime as dt
    import os
    import shutil

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hll_estimate,
        hll_merge_registers,
        hll_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_timegrain_registers,
        compaction_watermark,
        compacted_generation_id,
        read_daily_distinct,
        read_hourly_registers,
        timegrain_sketch_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "user_id long, ts timestamp"
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    # 3 microbatches spanning 2 days x several hours, with cross-batch
    # and cross-hour repeat users so the rollup actually deduplicates
    batches = [
        [(i % 17, base + dt.timedelta(hours=i % 5, minutes=i)) for i in range(40)],
        [(i % 23, base + dt.timedelta(hours=3 + i % 7, minutes=i)) for i in range(40)],
        # next MONTH, not just next day (March 1 + 31d = April 1), and
        # TWO distinct April days (31/45 by parity) so the month fold
        # actually crosses a day boundary — with only month-start days
        # trunc(day, 'month') == day and a broken truncation would pass
        # (fourth-pass round-13 review)
        [
            (
                i % 13,
                base + dt.timedelta(days=31 + 14 * (i % 2), hours=i % 4, minutes=i),
            )
            for i in range(40)
        ],
    ]
    _stage_ordered_batches(src, [spark.createDataFrame(b, schema) for b in batches])
    reg_dir = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = _ordered_stream(spark, src, schema)
        q = timegrain_sketch_stream(stream, reg_dir, ckpt).start()
        assert q.awaitTermination(120), "stream did not terminate in 120s"

    run()

    # the batch rollup twin over ALL rows — op_hll_rollup's exact body
    all_rows = spark.createDataFrame([r for b in batches for r in b], schema)
    ev = all_rows.select(
        "user_id", F.to_date("ts").alias("day"), F.hour("ts").alias("hr")
    )
    hr_reg = hll_registers(ev, "user_id", group_cols=("day", "hr"))
    day_est = hll_estimate(
        hll_merge_registers(hr_reg, group_cols=("day",)), group_cols=("day",)
    )
    want_hourly = {tuple(r) for r in hr_reg.collect()}
    want_daily = sorted(tuple(r) for r in day_est.collect())
    assert len(want_daily) == 3  # Mar 1, Apr 1, Apr 15

    got_hourly = {tuple(r) for r in read_hourly_registers(spark, reg_dir).collect()}
    assert got_hourly == want_hourly
    got_daily = sorted(tuple(r) for r in read_daily_distinct(spark, reg_dir).collect())
    assert got_daily == want_daily
    # the MONTH grain (round 13) derives from the SAME persisted hourly
    # state through the same law — bit-for-bit vs the batch composition
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        read_monthly_distinct,
    )

    month_est = hll_estimate(
        hll_merge_registers(
            hr_reg.withColumn("month", F.trunc(F.col("day"), "month")),
            group_cols=("month",),
        ),
        group_cols=("month",),
    )
    want_monthly = sorted(tuple(r) for r in month_est.collect())
    assert len(want_monthly) == 2  # two months in the fixture
    assert (
        sorted(tuple(r) for r in read_monthly_distinct(spark, reg_dir).collect())
        == want_monthly
    )
    # and the estimates are sane: close to exact per-day distincts
    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for row in read_daily_distinct(spark, reg_dir).collect():
        assert abs(row["estimate"] - exact[row["day"]]) / exact[row["day"]] < 0.2

    # compaction: distributed-merge generation; view and state invariant
    assert compact_timegrain_registers(spark, reg_dir) == 1
    assert compaction_watermark(spark, reg_dir) == 1
    part_ids = {
        r["batch_id"]
        for r in spark.read.parquet(reg_dir).select("batch_id").distinct().collect()
    }
    assert part_ids == {compacted_generation_id(1), 2}, part_ids
    assert {
        tuple(r) for r in read_hourly_registers(spark, reg_dir).collect()
    } == want_hourly
    assert (
        sorted(tuple(r) for r in read_daily_distinct(spark, reg_dir).collect())
        == want_daily
    )
    assert (
        sorted(tuple(r) for r in read_monthly_distinct(spark, reg_dir).collect())
        == want_monthly
    )

    # replay: wipe the checkpoint, rerun the whole stream — partials
    # rewrite into their own partitions (including ones below the
    # watermark, which reads exclude), the view never moves
    shutil.rmtree(ckpt)
    run()
    assert (
        sorted(tuple(r) for r in read_daily_distinct(spark, reg_dir).collect())
        == want_daily
    )


def test_timegrain_quantile_continuous_aggregate(spark, tmp_path):
    """The HDR (sum-merge) time-grain continuous aggregate — the
    quantile twin of the HLL test above: the streaming daily view
    equals the batch rollup composition bit-for-bit over the same
    closed rows (integer bucket law + integer rank math: no float
    contract to blur the compare); compaction (distributed-merge
    generation) leaves hourly state and daily view exactly unchanged;
    checkpoint-wiped replay is idempotent via the partition contract
    (SUM is not idempotent — the contract, not the math, is what
    protects replays)."""
    import datetime as dt
    import os
    import shutil

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hdr_merge_registers,
        hdr_quantiles,
        hdr_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_timegrain_hdr,
        compaction_watermark,
        compacted_generation_id,
        read_daily_quantiles,
        read_hourly_hdr,
        timegrain_quantile_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "amount long, ts timestamp"
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    # positive integers spanning several HDR buckets, 2 days x hours
    batches = [
        [((i * 37) % 997 + 1, base + dt.timedelta(hours=i % 5, minutes=i)) for i in range(60)],
        [((i * 61) % 4999 + 1, base + dt.timedelta(hours=2 + i % 6, minutes=i)) for i in range(60)],
        # next MONTH (March 1 + 31d = April 1), spanning TWO April days
        # (31/45 by parity) so the month fold crosses a day boundary —
        # month-start-only days would make trunc vacuous (fourth-pass
        # round-13 review)
        [
            (
                (i * 13) % 299 + 1,
                base + dt.timedelta(days=31 + 14 * (i % 2), hours=i % 4, minutes=i),
            )
            for i in range(60)
        ],
    ]
    _stage_ordered_batches(src, [spark.createDataFrame(b, schema) for b in batches])
    reg_dir = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = _ordered_stream(spark, src, schema)
        q = timegrain_quantile_stream(stream, reg_dir, ckpt, value_col="amount").start()
        assert q.awaitTermination(120), "stream did not terminate in 120s"

    run()

    # batch rollup twin over ALL rows
    all_rows = spark.createDataFrame([r for b in batches for r in b], schema)
    ev = all_rows.select(
        "amount", F.to_date("ts").alias("day"), F.hour("ts").alias("hr")
    )
    hr_reg = hdr_registers(ev, "amount", group_cols=["day", "hr"])
    want_hourly = {tuple(r) for r in hr_reg.collect()}
    day_q = hdr_quantiles(
        hdr_merge_registers(hr_reg, group_cols=("day",)), ["day"]
    )
    want_daily = sorted(tuple(r) for r in day_q.collect())
    assert len(want_daily) == 9  # 3 days x 3 quantiles

    assert {tuple(r) for r in read_hourly_hdr(spark, reg_dir).collect()} == want_hourly
    assert (
        sorted(tuple(r) for r in read_daily_quantiles(spark, reg_dir).collect())
        == want_daily
    )
    # the MONTH grain (round 13): same persisted state, same law
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        read_monthly_quantiles,
    )

    month_q = hdr_quantiles(
        hdr_merge_registers(
            hr_reg.withColumn("month", F.trunc(F.col("day"), "month")),
            group_cols=("month",),
        ),
        ["month"],
    )
    want_monthly = sorted(tuple(r) for r in month_q.collect())
    assert len(want_monthly) == 6  # 2 months x 3 quantiles
    assert (
        sorted(tuple(r) for r in read_monthly_quantiles(spark, reg_dir).collect())
        == want_monthly
    )
    # the sketch invariant: the exact rank-r value lies within [q_lb, q_ub]
    exact = {
        (r["day"], r["q"]): r
        for r in read_daily_quantiles(spark, reg_dir).collect()
    }
    vals = sorted(
        (r["day"], r["amount"]) for r in ev.select("day", "amount").collect()
    )
    import collections

    per_day = collections.defaultdict(list)
    for d, v in vals:
        per_day[d].append(v)
    for (d, q), row in exact.items():
        xs = sorted(per_day[d])
        true_val = xs[row["rank"] - 1]
        assert row["q_lb"] <= true_val <= row["q_ub"], (d, q, true_val, row)

    # compaction: view and state invariant; watermark advances
    assert compact_timegrain_hdr(spark, reg_dir) == 1
    assert compact_timegrain_hdr(spark, reg_dir, upto_batch_id=2) == 2
    assert compaction_watermark(spark, reg_dir) == 2
    part_ids = {
        r["batch_id"]
        for r in spark.read.parquet(reg_dir).select("batch_id").distinct().collect()
    }
    assert part_ids == {compacted_generation_id(2)}, part_ids
    assert {tuple(r) for r in read_hourly_hdr(spark, reg_dir).collect()} == want_hourly
    assert (
        sorted(tuple(r) for r in read_daily_quantiles(spark, reg_dir).collect())
        == want_daily
    )
    assert (
        sorted(tuple(r) for r in read_monthly_quantiles(spark, reg_dir).collect())
        == want_monthly
    )

    # replay after compaction: resurrected partitions sit at/below the
    # watermark and are EXCLUDED by the read — under SUM-merge this
    # exclusion (not idempotence) is what keeps the view unchanged
    shutil.rmtree(ckpt)
    run()
    assert (
        sorted(tuple(r) for r in read_daily_quantiles(spark, reg_dir).collect())
        == want_daily
    )


def test_ann_delta_stream_serves_fresh_vectors(spark, sf_dir, tmp_path):
    """Streaming ANN ingest (round 12): newly-arriving vectors are
    quantized per microbatch against the BASE index's centroids and
    appended as a delta segment; a probe over base + delta equals a
    probe over a serving table built on the full corpus in one shot
    (same centroids -> same clusters/codes, so the split is purely
    physical); the delta read equals the batch builder over the same
    rows; compaction (distributed-merge generation) and a
    checkpoint-wiped replay leave the segment exactly unchanged."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_build,
        ivf_sq8_serving_table,
        ivf_sq8_topk,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        ann_delta_stream,
        compact_ann_delta,
        compaction_watermark,
        read_ann_delta,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    cents = ivf_build(base, k=16, iters=2)
    base_serving = ivf_sq8_serving_table(base, cents)

    src = str(tmp_path / "src")
    os.makedirs(src)
    deltas = [
        emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450)),
        emb.filter(F.col("vec_id") >= 450),
    ]
    schema = _stage_ordered_batches(src, deltas)
    delta_dir = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = _ordered_stream(spark, src, schema)
        q = ann_delta_stream(stream, delta_dir, ckpt, cents).start()
        # a still-running query + rmtree(ckpt) + rerun = concurrent
        # writers on one delta dir (seventh-pass round-12 review)
        assert q.awaitTermination(120), "stream did not terminate in 120s"

    run()

    # the delta read equals the batch builder over the same rows
    # (collected-set compare: the segment is test-bounded at 100 rows,
    # and exceptAll over the mapInPandas-derived builder plan trips a
    # Catalyst attribute-binding internal error in this Spark build)
    def seg(df):
        return {
            (r["match_id"], r["cluster"], r["q_scale"], tuple(r["qvec"]))
            for r in df.collect()
        }

    delta_rows = emb.filter(F.col("vec_id") >= 400)
    assert seg(read_ann_delta(spark, delta_dir)) == seg(
        ivf_sq8_serving_table(delta_rows, cents)
    )

    # probe over base + delta == probe over a one-shot full serving
    # table (the physical split is invisible to search)
    queries = emb.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731

    def probe(serving):
        df = ivf_sq8_topk(queries, emb, cents, k=10, nprobe=8, serving=serving)
        return [tuple(r) for r in sorted(df.collect(), key=key)]

    split = probe(base_serving.unionByName(read_ann_delta(spark, delta_dir)))
    oneshot = probe(ivf_sq8_serving_table(emb, cents))
    assert split == oneshot
    # and the delta actually surfaces: some neighbor comes from the
    # streamed segment (500 vectors, 100 of them fresh — the top-10s
    # over 5 queries are empirically never all-base; if this ever
    # flakes the fixture changed, not the operator)
    assert any(m >= 400 for _, m, _, _ in split), split

    # probe-time delta pruning (round-12 third-pass review): the
    # probe's serving IN-filter cannot reach below the reader's dedup
    # aggregate, so the cluster list is pushed through the reader's
    # clusters= argument instead — PushedFilters on the delta parquet
    # scan, and pre-dedup filtering is exact (one cluster per match_id)
    import re as _re

    all_clusters = sorted(
        r["cluster"]
        for r in read_ann_delta(spark, delta_dir).select("cluster").distinct().collect()
    )
    some = all_clusters[: max(1, len(all_clusters) // 2)]
    pruned_read = read_ann_delta(spark, delta_dir, clusters=some)
    plan = pruned_read._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert _re.search(r"PushedFilters: \[[^\]]*In\(cluster", plan), plan
    assert seg(pruned_read) == {
        t for t in seg(read_ann_delta(spark, delta_dir)) if t[1] in set(some)
    }

    # compaction: fold to one generation, segment unchanged
    before = seg(read_ann_delta(spark, delta_dir))
    assert compact_ann_delta(spark, delta_dir) == 0  # folds batch 0 only
    assert compact_ann_delta(spark, delta_dir, upto_batch_id=1) == 1
    assert compaction_watermark(spark, delta_dir) == 1
    assert seg(read_ann_delta(spark, delta_dir)) == before

    # replay: wipe the checkpoint and rerun — partials rewrite
    # byte-identically (deterministic encoding), the read's dedup keeps
    # the segment exact even though batch partitions resurrect below
    # the watermark
    shutil.rmtree(ckpt)
    run()
    assert seg(read_ann_delta(spark, delta_dir)) == before


def test_pq_delta_stream_serves_fresh_vectors(spark, sf_dir, tmp_path):
    """The PQ-tier delta ingest (round 12) — the deepest-compression
    serving table gets the same freshness split as SQ8: microbatches
    are PQ-encoded against the base index's pinned centroids AND
    codebooks (the doubled consistency contract), a probe over
    base + delta equals a one-shot full PQ index, the clusters= prune
    is value-exact, and compaction + checkpoint-wiped replay leave the
    segment unchanged (the full COVERAGE claim, mirrored from the SQ8
    twin — sixth-pass round-12 review caught the PQ test advertising
    replay coverage it didn't run)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_build,
        ivf_pq_topk,
        pq_build,
        pq_serving_table,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_pq_delta,
        compaction_watermark,
        pq_delta_stream,
        read_pq_delta,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    cents = ivf_build(base, k=16, iters=2)
    books = pq_build(base, m=8, ksub=16, iters=2)
    base_serving = pq_serving_table(base, cents, books)

    src = str(tmp_path / "src")
    os.makedirs(src)
    deltas = [
        emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450)),
        emb.filter(F.col("vec_id") >= 450),
    ]
    schema = _stage_ordered_batches(src, deltas)
    delta_dir = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = _ordered_stream(spark, src, schema)
        q = pq_delta_stream(stream, delta_dir, ckpt, cents, books).start()
        assert q.awaitTermination(120), "stream did not terminate in 120s"

    run()

    def seg(df):
        return {
            (r["match_id"], r["cluster"], tuple(r["codes"]))
            for r in df.collect()
        }

    # delta read == batch builder over the same rows (collected-set
    # compare — the exceptAll Catalyst trap, as in the SQ8 test)
    assert seg(read_pq_delta(spark, delta_dir)) == seg(
        pq_serving_table(emb.filter(F.col("vec_id") >= 400), cents, books)
    )

    # probe over base + delta == one-shot full PQ index
    queries = emb.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731

    def probe(serving):
        df = ivf_pq_topk(
            queries, emb, cents, books, k=10, nprobe=8, m_rerank=100,
            serving=serving,
        )
        return [tuple(r) for r in sorted(df.collect(), key=key)]

    split = probe(base_serving.unionByName(read_pq_delta(spark, delta_dir)))
    assert split == probe(pq_serving_table(emb, cents, books))
    assert any(m >= 400 for _, m, _, _ in split), split

    # clusters= prune is value-exact (shared _read_delta_segment)
    some = sorted(
        r["cluster"]
        for r in read_pq_delta(spark, delta_dir).select("cluster").distinct().collect()
    )[:2]
    assert seg(read_pq_delta(spark, delta_dir, clusters=some)) == {
        t for t in seg(read_pq_delta(spark, delta_dir)) if t[1] in set(some)
    }

    # compaction invariance (shared delta protocol)
    before = seg(read_pq_delta(spark, delta_dir))
    assert compact_pq_delta(spark, delta_dir, upto_batch_id=1) == 1
    assert compaction_watermark(spark, delta_dir) == 1
    assert seg(read_pq_delta(spark, delta_dir)) == before

    # checkpoint-wiped replay: deterministic encoding rewrites
    # byte-identical partitions; the read's dedup keeps the segment
    # exact even with resurrected partitions below the watermark
    shutil.rmtree(ckpt)
    run()
    assert seg(read_pq_delta(spark, delta_dir)) == before


def _sq8_rebuild_corpus(spark, sf_dir):
    """Shared SQ8 rebuild-test corpus (fourth-pass round-13 review —
    the lifecycle and debris tests each re-derived it): base = vec_id <
    400, centroids pinned from the base, plus the two standard delta
    batches ([400, 450), [450, ...)). Returns (emb, cents, base_serving,
    batches)."""
    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_build,
        ivf_sq8_serving_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base_rows = emb.filter(F.col("vec_id") < 400)
    cents = ivf_build(base_rows, k=16, iters=2)
    batches = [
        emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450)),
        emb.filter(F.col("vec_id") >= 450),
    ]
    return emb, cents, ivf_sq8_serving_table(base_rows, cents), batches


def test_ann_rebuild_base_lifecycle(spark, sf_dir, tmp_path):
    """The rebuild half of the serving split (round-12 VERDICT #1): fold
    base + delta into a fresh bucketed base cache, reset the consumed
    delta.  Pins, in order: (1) probe(new base, post-reset empty delta)
    == probe(old base, delta) == one-shot full index, row-for-row, for
    an append-only history that includes a compacted GENERATION among
    the consumed partitions; (2) the reset leaves the delta readable as
    EMPTY (schema pinned, no inference failure) and the metadata
    carries n + the consumed watermark; (3) a crash re-run (same
    published loc) converges — it skips the build and re-applies the
    PUBLISHED watermark's deletions; (4) the default upto (all but the
    highest live batch, compaction's mid-write safety rule) leaves the
    highest batch in the delta and probe(new base + remaining delta)
    stays complete."""
    from pyspark.sql import functions as F

    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_sq8_serving_table,
        ivf_sq8_topk,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_ann_delta,
        read_ann_delta,
        rebuild_ann_base,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming.pipeline import (
        _write_batch_partial,
    )

    emb, cents, base_serving, batches = _sq8_rebuild_corpus(spark, sf_dir)

    # the stream's on-disk layout via its own partial writer: two
    # closed batches of appends (the stream wrapper itself is covered
    # by test_ann_delta_stream_serves_fresh_vectors)
    delta_dir = str(tmp_path / "delta")
    for i, b in enumerate(batches):
        _write_batch_partial(ivf_sq8_serving_table(b, cents), delta_dir, i)
    # fold batch 0 into a generation so the rebuild consumes a MIX of
    # generation (negative batch_id) and live partitions
    assert compact_ann_delta(spark, delta_dir, upto_batch_id=0) == 0

    queries = emb.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731

    def probe(serving, candidates):
        df = ivf_sq8_topk(
            queries, candidates, cents, k=10, nprobe=8, serving=serving
        )
        return [tuple(r) for r in sorted(df.collect(), key=key)]

    oneshot = probe(ivf_sq8_serving_table(emb, cents), emb)
    old_split = probe(
        base_serving.unionByName(read_ann_delta(spark, delta_dir)), emb
    )
    assert old_split == oneshot

    new_loc = str(tmp_path / "base_gen2")
    serving2, meta = rebuild_ann_base(
        spark, base_serving, cents, delta_dir, new_loc,
        "sq8_rebuild_test_gen2", upto_batch_id=1, reset_delta=True,
    )
    # (1) probe continuity across the cutover, with the delta now empty
    empty_delta = read_ann_delta(spark, delta_dir)
    assert empty_delta.count() == 0
    assert empty_delta.columns == ["match_id", "cluster", "q_scale", "qvec"]
    assert probe(serving2.unionByName(empty_delta), emb) == oneshot
    # (2) metadata: n = collapsed corpus, watermark = consumed upto
    assert meta["n"] == emb.count()
    assert meta["rebuilt_upto"] == 1
    assert meta["centroids"] == cents

    # (3) crash re-run against the already-published loc: skips the
    # build (content identical) and re-applies the published
    # watermark's deletions — convergent, no error
    serving2b, meta_b = rebuild_ann_base(
        spark, base_serving, cents, delta_dir, new_loc,
        "sq8_rebuild_test_gen2", upto_batch_id=1, reset_delta=True,
    )
    assert meta_b == meta
    assert serving2b.count() == meta["n"]

    # (4) default upto consumes all but the HIGHEST live batch: fresh
    # delta with two live batches, default rebuild leaves batch 1
    delta2 = str(tmp_path / "delta2")
    for i, b in enumerate(batches):
        _write_batch_partial(ivf_sq8_serving_table(b, cents), delta2, i)
    serving3, meta3 = rebuild_ann_base(
        spark, base_serving, cents, delta2, str(tmp_path / "base_gen3"),
        "sq8_rebuild_test_gen3", reset_delta=True,
    )
    assert meta3["rebuilt_upto"] == 0
    remaining = read_ann_delta(spark, delta2)
    assert {r["match_id"] for r in remaining.select("match_id").collect()} == {
        r["vec_id"] for r in batches[1].select("vec_id").collect()
    }
    assert probe(serving3.unionByName(remaining), emb) == oneshot

    # (5) stale-reuse guards: an EXPLICIT upto beyond the published
    # watermark must fail loudly (base caches are immutable — a silent
    # return of the old generation would leave batch 1 unfolded
    # forever), while the crash-rerun in (3) above — nothing new
    # demanded — succeeds; and reusing a TABLE name against a fresh
    # location must fail at the name/location binding check
    with pytest.raises(RuntimeError, match="prior rebuild generation"):
        rebuild_ann_base(
            spark, base_serving, cents, delta2, str(tmp_path / "base_gen3"),
            "sq8_rebuild_test_gen3", upto_batch_id=1,
        )
    with pytest.raises(RuntimeError, match="bind to one location"):
        rebuild_ann_base(
            spark, base_serving, cents, delta2, str(tmp_path / "base_gen4"),
            "sq8_rebuild_test_gen3", upto_batch_id=1,
        )


def test_ann_rebuild_ignores_midwrite_debris(spark, sf_dir, tmp_path):
    """The rebuild's consumption snapshot applies the READER's
    file-visibility rule (_visible_batch_ids): a batch dir with no
    visible file — a crashed or mid-write writer's debris — is invisible
    to the snapshot, so it neither raises the default-upto watermark
    (which would consume a batch the stream is still writing) nor
    enters the collapse; the probe over (new base + remaining delta)
    stays complete, and the debris dir is left for the writer/compactor
    to finish or sweep (the rebuild is read-only over live state)."""
    import os

    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_sq8_serving_table,
        ivf_sq8_topk,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        read_ann_delta,
        rebuild_ann_base,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming.pipeline import (
        _write_batch_partial,
    )

    emb, cents, base_serving, batches = _sq8_rebuild_corpus(spark, sf_dir)

    delta_dir = str(tmp_path / "delta")
    for i, b in enumerate(batches):
        _write_batch_partial(ivf_sq8_serving_table(b, cents), delta_dir, i)
    # a mid-write/crashed writer's dir: exists, no visible file
    os.makedirs(os.path.join(delta_dir, "batch_id=2"))

    serving2, meta = rebuild_ann_base(
        spark, base_serving, cents, delta_dir,
        str(tmp_path / "base_gen2"), "sq8_rebuild_debris_gen2",
        reset_delta=True,
    )
    # default upto = all-but-highest over VISIBLE batches {0,1} -> 0;
    # the invisible dir neither raised it to 1 nor got deleted
    assert meta["rebuilt_upto"] == 0
    assert os.path.isdir(os.path.join(delta_dir, "batch_id=2"))

    queries = emb.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731

    def probe(serving):
        df = ivf_sq8_topk(queries, emb, cents, k=10, nprobe=8, serving=serving)
        return [tuple(r) for r in sorted(df.collect(), key=key)]

    assert probe(
        serving2.unionByName(read_ann_delta(spark, delta_dir))
    ) == probe(ivf_sq8_serving_table(emb, cents))


def test_ann_serving_manifest_atomic_cutover(spark, sf_dir, tmp_path):
    """The serving manifest closes the rebuild's manual cutover window
    (round-13 VERDICT #1): (base table, delta dir, consumed floor) are
    published as ONE atomic snapshot, so a `resolve_serving` probe is
    complete and duplicate-free at EVERY point of the lifecycle —
    bootstrap, live delta, post-publish/pre-reset (the old window that
    could lose rows or double-count), post-reset, and the one-call
    rebuild(manifest_dir=..., reset_delta=True) path. Floors: a view
    resolved BEFORE a repoint keeps working until the reset deletes
    its files (old base + full delta — complete); a view resolved
    AFTER excludes consumed batches via the floor filter even while
    they still exist on disk (new base + remaining delta — never
    double-counted)."""
    import json
    import os

    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_sq8_serving_table,
        ivf_sq8_topk,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        publish_ann_serving,
        read_ann_delta,
        rebuild_ann_base,
        reset_consumed_delta,
        resolve_serving,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming.pipeline import (
        _write_batch_partial,
    )

    emb, cents, base_serving, batches = _sq8_rebuild_corpus(spark, sf_dir)
    base_rows = emb.filter(F.col("vec_id") < 400)
    delta_dir = str(tmp_path / "delta")
    man = str(tmp_path / "manifest")
    queries = emb.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731

    def probe(serving, candidates):
        df = ivf_sq8_topk(
            queries, candidates, cents, k=10, nprobe=8, serving=serving
        )
        return [tuple(r) for r in sorted(df.collect(), key=key)]

    def assert_complete(view, corpus):
        # complete AND duplicate-free: one serving row per corpus id
        got = view.serving.groupBy("match_id").count()
        assert got.filter(F.col("count") > 1).count() == 0
        assert got.count() == corpus.count()
        assert probe(view.serving, corpus) == probe(
            ivf_sq8_serving_table(corpus, cents), corpus
        )

    # bootstrap: gen-1 bucketed base over an (as yet nonexistent)
    # delta dir — rebuild over an empty delta is the cache build
    loc1 = str(tmp_path / "base_gen1")
    _s1, meta1 = rebuild_ann_base(
        spark, base_serving, cents, delta_dir, loc1, "sq8_manifest_gen1"
    )
    assert meta1["rebuilt_upto"] == -1  # nothing consumed
    publish_ann_serving(
        man, tier="sq8", table="sq8_manifest_gen1", loc=loc1,
        delta_dir=delta_dir, floor=-1,
    )
    v1 = resolve_serving(spark, man)
    assert v1.tier == "sq8" and v1.floor == -1
    assert v1.meta["centroids"] == cents  # the pinned encoding contract
    assert_complete(v1, base_rows)

    # live delta: two ingested batches become visible with NO repoint
    for i, b in enumerate(batches):
        _write_batch_partial(ivf_sq8_serving_table(b, cents), delta_dir, i)
    v2 = resolve_serving(spark, man)
    assert_complete(v2, emb)

    # publish->repoint (reset deferred): the during-window both halves
    # of the old hazard are closed in — the pre-rebuild view still
    # reads (old base, full delta) with nothing deleted, the
    # re-resolved view reads (new base, floor-filtered delta) with the
    # consumed partitions still ON DISK but excluded
    loc2 = str(tmp_path / "base_gen2")
    _s2, meta2 = rebuild_ann_base(
        spark, base_serving, cents, delta_dir, loc2, "sq8_manifest_gen2",
        upto_batch_id=1, manifest_dir=man,  # reset_delta defaults False
    )
    assert meta2["rebuilt_upto"] == 1
    assert read_ann_delta(spark, delta_dir).count() > 0  # not reset
    assert_complete(v2, emb)  # old view: unchanged, still complete
    v3 = resolve_serving(spark, man)
    assert v3.floor == 1 and v3.snapshot["loc"] == loc2
    assert_complete(v3, emb)  # new view: no double count pre-reset
    # the floor filter also applies through the reader surface
    assert read_ann_delta(spark, delta_dir, floor=1).count() == 0

    # the deferred reset: keyed to the manifest floor, idempotent;
    # the post-repoint view is byte-unchanged by it
    assert reset_consumed_delta(spark, delta_dir, v3.floor) == 2
    assert reset_consumed_delta(spark, delta_dir, v3.floor) == 0
    assert_complete(resolve_serving(spark, man), emb)

    # one-call mechanized path: new batch, then rebuild(manifest_dir,
    # reset_delta=True) does publish -> repoint -> reset in order
    b2 = ivf_sq8_serving_table(batches[0], cents).withColumn(
        "match_id", F.col("match_id") + 10000
    )
    _write_batch_partial(b2, delta_dir, 2)
    corpus3 = emb.unionByName(
        batches[0].withColumn("vec_id", F.col("vec_id") + 10000)
    )
    assert_complete(resolve_serving(spark, man), corpus3)
    loc3 = str(tmp_path / "base_gen3")
    _s3, meta3 = rebuild_ann_base(
        spark, _s2, cents, delta_dir, loc3, "sq8_manifest_gen3",
        upto_batch_id=2, manifest_dir=man, reset_delta=True,
    )
    assert meta3["rebuilt_upto"] == 2
    v4 = resolve_serving(spark, man)
    assert v4.snapshot["loc"] == loc3 and v4.floor == 2
    assert read_ann_delta(spark, delta_dir).count() == 0  # reset ran
    assert_complete(v4, corpus3)

    # snapshots are immutable files; the pointer names exactly one
    with open(os.path.join(man, "_MANIFEST")) as fh:
        snap_name = fh.read().strip()
    with open(os.path.join(man, snap_name)) as fh:
        assert json.load(fh) == v4.snapshot

    # MONOTONICITY (second-pass round-14 review): the floor only moves
    # forward — an older generation can neither publish directly nor
    # repoint through a delayed rebuild re-run (whose cache-hit would
    # otherwise resurrect the old watermark after a newer generation's
    # reset already deleted its complement — silently lost rows); a
    # different tier/lineage cannot take the manifest over; the
    # idempotent re-publish of the CURRENT snapshot still succeeds
    # (the legitimate crash re-run).
    with pytest.raises(RuntimeError, match="rollback"):
        publish_ann_serving(
            man, tier="sq8", table="sq8_manifest_gen2", loc=loc2,
            delta_dir=delta_dir, floor=1,
        )
    with pytest.raises(RuntimeError, match="one manifest per"):
        publish_ann_serving(
            man, tier="pq", table="sq8_manifest_gen3", loc=loc3,
            delta_dir=delta_dir, floor=5,
        )
    publish_ann_serving(
        man, tier="sq8", table="sq8_manifest_gen3", loc=loc3,
        delta_dir=delta_dir, floor=2,
    )
    # ...while a delayed crash re-run of the OLD generation's rebuild
    # command converges to a NO-OP: the published artifact is returned
    # and the repoint is SKIPPED (its watermark does not raise the
    # floor), so live serving never rolls back (third-pass round-14
    # review — the rebuild's repoint is conditional, matching the
    # cache's own crash-re-run semantics)
    _old_again, old_meta = rebuild_ann_base(
        spark, base_serving, cents, delta_dir, loc2,
        "sq8_manifest_gen2", upto_batch_id=1, manifest_dir=man,
    )
    assert old_meta["rebuilt_upto"] == 1
    assert resolve_serving(spark, man).snapshot == v4.snapshot  # unmoved

    # a rebuild that consumes NOTHING (one live batch, default upto)
    # publishes watermark -1 — the manifest must not move for it
    # either (third-pass round-14 review: floor=-1 says nothing about
    # what the INPUT base had folded; repointing would re-admit
    # already-consumed rows the floor currently excludes)
    b3 = ivf_sq8_serving_table(batches[1], cents).withColumn(
        "match_id", F.col("match_id") + 20000
    )
    _write_batch_partial(b3, delta_dir, 3)
    corpus4 = corpus3.unionByName(
        batches[1].withColumn("vec_id", F.col("vec_id") + 20000)
    )
    _s4, meta4 = rebuild_ann_base(
        spark, _s3, cents, delta_dir, str(tmp_path / "base_gen4"),
        "sq8_manifest_gen4", manifest_dir=man,
    )
    assert meta4["rebuilt_upto"] == -1  # nothing consumable below max(live)
    v5 = resolve_serving(spark, man)
    assert v5.snapshot == v4.snapshot  # unmoved — and still complete:
    assert_complete(v5, corpus4)

    # a manifest must refuse to resolve an unpublished base
    man2 = str(tmp_path / "manifest2")
    publish_ann_serving(
        man2, tier="sq8", table="sq8_manifest_missing",
        loc=str(tmp_path / "nowhere"), delta_dir=delta_dir, floor=-1,
    )
    with pytest.raises(RuntimeError, match="unpublished base cache"):
        resolve_serving(spark, man2)


def test_compaction_respects_serving_floor(spark, sf_dir, tmp_path):
    """Floor-aware compaction (second-pass round-14 review): a
    compaction running in the publish-to-reset window whose upto
    reaches past the published floor would fold consumed AND
    unconsumed batches into one generation — a generation the floor
    filter must keep whole, double-counting the consumed rows against
    the new base. Passing the manifest's floor makes that straddle
    structurally impossible: the consumed partitions are RESET first
    (safe — the published floor proves the base covers them), so the
    generation holds only unconsumed rows and the manifest-routed
    probe stays complete and duplicate-free through the fold."""
    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_sq8_serving_table,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_ann_delta,
        publish_ann_serving,
        rebuild_ann_base,
        resolve_serving,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming.pipeline import (
        _write_batch_partial,
    )

    emb, cents, base_serving, batches = _sq8_rebuild_corpus(spark, sf_dir)
    delta_dir = str(tmp_path / "delta")
    for i, b in enumerate(batches):
        _write_batch_partial(ivf_sq8_serving_table(b, cents), delta_dir, i)

    # gen2 consumes batch 0 only; manifest repointed, reset DEFERRED —
    # the during-window with a consumed batch still on disk
    man = str(tmp_path / "manifest")
    rebuild_ann_base(
        spark, base_serving, cents, delta_dir, str(tmp_path / "base_gen2"),
        "sq8_floor_gen2", upto_batch_id=0, manifest_dir=man,
    )
    import os

    assert os.path.isdir(os.path.join(delta_dir, "batch_id=0"))

    def counts():
        serving = resolve_serving(spark, man).serving
        per_id = serving.groupBy("match_id").count()
        return (
            per_id.count(),
            per_id.filter(F.col("count") > 1).count(),
        )

    assert counts() == (emb.count(), 0)
    # the cron's fold, manifest-aware: the floor is read at FOLD time
    # (third-pass round-14 review — a caller-read floor can go stale
    # against a racing publish); upto=1 reaches past floor=0, so the
    # consumed batch is reset before the fold — the new generation
    # (mark=1 > floor) holds ONLY batch 1's rows
    assert (
        compact_ann_delta(spark, delta_dir, upto_batch_id=1, manifest_dir=man)
        == 1
    )
    assert not os.path.isdir(os.path.join(delta_dir, "batch_id=0"))
    assert counts() == (emb.count(), 0)  # complete, still no double count

    # LINEAGE GUARD (fourth-pass round-14 review): a manifest serving
    # a DIFFERENT delta must be refused by both destructive readers —
    # adopting a foreign floor would delete unconsumed partitions
    man_other = str(tmp_path / "manifest_other")
    publish_ann_serving(
        man_other, tier="sq8", table="other_tbl", loc=str(tmp_path / "o"),
        delta_dir=str(tmp_path / "other_delta"), floor=7,
    )
    with pytest.raises(RuntimeError, match="delta lineage"):
        compact_ann_delta(spark, delta_dir, manifest_dir=man_other)
    with pytest.raises(RuntimeError, match="delta lineage"):
        rebuild_ann_base(
            spark, base_serving, cents, delta_dir,
            str(tmp_path / "base_gen3"), "sq8_floor_gen3",
            manifest_dir=man_other,
        )


def test_ann_rebuild_advisor_metadata_only(spark, sf_dir, tmp_path):
    """The rebuild trigger policy (round-13 VERDICT #2): delta share
    from the base cache's pinned n + the delta's visible row count —
    listing and parquet footers only, never a vector scan — with the
    fold recommendation crossing at target_share, floor-aware through
    the serving manifest (consumed batches stop counting the moment
    the manifest repoints, before any reset)."""
    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_sq8_serving_table,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        ann_rebuild_advisor,
        publish_ann_serving,
        rebuild_ann_base,
        rebuild_from_manifest,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming.pipeline import (
        _write_batch_partial,
    )

    emb, cents, base_serving, batches = _sq8_rebuild_corpus(spark, sf_dir)
    n_base = 400
    n_b0 = batches[0].count()
    n_b1 = batches[1].count()
    delta_dir = str(tmp_path / "delta")
    man = str(tmp_path / "manifest")

    loc1 = str(tmp_path / "base_gen1")
    rebuild_ann_base(spark, base_serving, cents, delta_dir, loc1, "sq8_adv_gen1")
    publish_ann_serving(
        man, tier="sq8", table="sq8_adv_gen1", loc=loc1,
        delta_dir=delta_dir, floor=-1,
    )

    # empty delta: share 0, no recommendation
    adv = ann_rebuild_advisor(spark, man)
    assert adv == {
        **adv, "base_n": n_base, "delta_rows": 0, "delta_batches": 0,
        "delta_share": 0.0, "recommend_rebuild": False,
    }

    # one batch: exact visible-row count, share = b0/(base+b0); the
    # recommendation is purely the threshold comparison
    _write_batch_partial(ivf_sq8_serving_table(batches[0], cents), delta_dir, 0)
    share0 = n_b0 / (n_base + n_b0)
    adv = ann_rebuild_advisor(spark, man)
    assert adv["delta_rows"] == n_b0 and adv["delta_batches"] == 1
    assert abs(adv["delta_share"] - share0) < 1e-6
    assert adv["recommend_rebuild"] is (share0 >= 0.20)
    # ONE pending batch: the share may cross the threshold, but the
    # default consumption window cannot advance the floor, and a cron
    # acting on the recommendation would call a fold that no-ops —
    # recommend_rebuild is gated on satisfiability (seventh-pass
    # round-14 review), with the at-rest escape hatch in the reason
    unsat = ann_rebuild_advisor(spark, man, target_share=0.01)
    assert unsat["recommend_rebuild"] is False
    assert "upto_batch_id" in unsat["reason"]
    assert ann_rebuild_advisor(spark, man, target_share=0.99)[
        "recommend_rebuild"
    ] is False

    # both batches, then an advisor-triggered fold through the
    # manifest: the repoint alone (reset deferred) returns the delta
    # share to 0 — consumed batches are excluded by the floor even
    # while still on disk
    _write_batch_partial(ivf_sq8_serving_table(batches[1], cents), delta_dir, 1)
    adv = ann_rebuild_advisor(spark, man)
    assert adv["delta_rows"] == n_b0 + n_b1 and adv["delta_batches"] == 2
    assert adv["recommend_rebuild"] is True  # 100/500 = 20% >= 20%
    # the advisor loop closes with NO operator-held state (round 14):
    # the one-call fold reads base/centroids/delta/tier from the
    # manifest the probes already use; reset deferred here so the
    # share-via-floor assertion below exercises the floor semantics
    rebuild_from_manifest(
        spark, man, str(tmp_path / "base_gen2"), "sq8_adv_gen2",
        upto_batch_id=1, reset_delta=False,
    )
    adv = ann_rebuild_advisor(spark, man)
    assert adv == {
        **adv, "base_n": n_base + n_b0 + n_b1, "delta_rows": 0,
        "floor": 1, "recommend_rebuild": False,
    }

    # explicit base_loc/delta_dir path (no manifest): floor=None counts
    # everything visible
    adv = ann_rebuild_advisor(
        spark, base_loc=loc1, delta_dir=delta_dir, tier="sq8"
    )
    assert adv["base_n"] == n_base and adv["delta_rows"] == n_b0 + n_b1

    # the cheaper-maintenance arm: below the share threshold but at or
    # above compact_at_batches fold units -> recommend COMPACTION (the
    # per-probe listing/file-open tax, not row share); rebuild subsumes
    # it, so the two recommendations are mutually exclusive
    adv = ann_rebuild_advisor(
        spark, base_loc=loc1, delta_dir=delta_dir, tier="sq8",
        target_share=0.9, compact_at_batches=2,
    )
    assert adv["recommend_rebuild"] is False
    assert adv["recommend_compaction"] is True and adv["delta_batches"] == 2
    adv = ann_rebuild_advisor(
        spark, base_loc=loc1, delta_dir=delta_dir, tier="sq8",
        target_share=0.05, compact_at_batches=2,
    )
    assert adv["recommend_rebuild"] is True
    assert adv["recommend_compaction"] is False  # subsumed by the fold

    # {generation, highest live} counts 2 units but NOTHING a
    # compaction's default window could fold — the advisor must not
    # spin a cron on an unsatisfiable recommendation (round-14 review)
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_ann_delta,
    )

    assert compact_ann_delta(spark, delta_dir, upto_batch_id=0) == 0
    adv = ann_rebuild_advisor(
        spark, base_loc=loc1, delta_dir=delta_dir, tier="sq8",
        target_share=0.9, compact_at_batches=2,
    )
    assert adv["delta_batches"] == 2
    assert adv["recommend_compaction"] is False  # no foldable live batch


def test_rebuild_from_manifest_pq_tier(spark, sf_dir, tmp_path):
    """The one-call maintenance fold on the PQ tier: bootstrap a
    manifest over a PQ base, ingest delta batches, and fold with
    `rebuild_from_manifest` — base frame, pinned centroids AND both
    codebook tiers, delta dir, and tier all come from the manifest
    itself (a cron holds only the manifest_dir), the default
    reset_delta=True is safe because the repoint precedes the reset,
    and the folded table equals the one-shot serving table row for
    row with the codebooks re-pinned through the cutover."""
    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_build,
        pq_build,
        pq_serving_table,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        publish_ann_serving,
        read_pq_delta,
        rebuild_from_manifest,
        rebuild_pq_base,
        resolve_serving,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming.pipeline import (
        _write_batch_partial,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base_rows = emb.filter(F.col("vec_id") < 400)
    cents = ivf_build(base_rows, k=16, iters=2)
    books = pq_build(base_rows, m=8, ksub=16, iters=2)
    delta_dir = str(tmp_path / "delta")
    man = str(tmp_path / "manifest")

    loc1 = str(tmp_path / "base_gen1")
    rebuild_pq_base(
        spark, pq_serving_table(base_rows, cents, books), cents, books,
        delta_dir, loc1, "pq_mfm_gen1",
    )
    publish_ann_serving(
        man, tier="pq", table="pq_mfm_gen1", loc=loc1,
        delta_dir=delta_dir, floor=-1,
    )
    _write_batch_partial(
        pq_serving_table(emb.filter(F.col("vec_id") >= 400), cents, books),
        delta_dir, 0,
    )

    rebuild_from_manifest(
        spark, man, str(tmp_path / "base_gen2"), "pq_mfm_gen2",
        upto_batch_id=0,
    )
    view = resolve_serving(spark, man)
    assert view.tier == "pq" and view.floor == 0
    assert view.meta["codebooks"] == books  # re-pinned via the manifest
    assert read_pq_delta(spark, delta_dir).count() == 0  # default reset ran
    got = {
        (r["match_id"], r["cluster"], tuple(r["codes"]))
        for r in view.serving.collect()
    }
    want = {
        (r["match_id"], r["cluster"], tuple(r["codes"]))
        for r in pq_serving_table(emb, cents, books).collect()
    }
    assert got == want

    # one pending batch: the default consumption window (all-but-
    # highest, mid-write safety) holds nothing above the floor — the
    # cron call is a NO-OP returning None, never a full orphaned fold
    # nor an equal-floor raise (fifth-pass round-14 review); an
    # at-rest caller folds it by passing upto_batch_id explicitly
    _write_batch_partial(
        pq_serving_table(emb.filter(F.col("vec_id") < 50), cents, books)
        .withColumn("match_id", F.col("match_id") + 30000),
        delta_dir, 1,
    )
    assert (
        rebuild_from_manifest(
            spark, man, str(tmp_path / "base_noop"), "pq_mfm_noop"
        )
        is None
    )
    assert resolve_serving(spark, man).snapshot == view.snapshot  # unmoved


def test_ann_stream_manifest_lifecycle_end_to_end(spark, sf_dir, tmp_path):
    """The production arc in ONE test, with the REAL stream as the
    writer: bootstrap a manifest over a bucketed base; `ann_delta_stream`
    ingests a microbatch; a manifest-routed probe sees the fresh
    vectors with NO repoint; the one-call fold cuts over at-rest
    (publish -> repoint -> reset); the SAME stream (same checkpoint)
    keeps appending into the reset delta afterwards, and the next
    resolve serves the post-fold arrivals — no re-bootstrap, no
    re-encode, no operator-held state beyond the manifest_dir."""
    import os

    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_build,
        ivf_sq8_serving_table,
        ivf_sq8_topk,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        ann_delta_stream,
        ann_rebuild_advisor,
        publish_ann_serving,
        read_ann_delta,
        rebuild_ann_base,
        rebuild_from_manifest,
        resolve_serving,
    )

    emb, cents, base_serving, batches = _sq8_rebuild_corpus(spark, sf_dir)
    base_rows = emb.filter(F.col("vec_id") < 400)
    delta_dir = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")
    man = str(tmp_path / "manifest")
    src = str(tmp_path / "src")
    os.makedirs(src)

    def stage_one(df, i):
        d = f"{src}/b{i}"
        df.coalesce(1).write.parquet(d)
        t = 2_000_000_000 + i * 60
        for f in os.listdir(d):
            os.utime(f"{d}/{f}", (t, t))
        return df.schema

    def drain(schema):
        q = ann_delta_stream(
            _ordered_stream(spark, src, schema), delta_dir, ckpt, cents
        ).start()
        assert q.awaitTermination(120), "stream did not terminate in 120s"

    def probe(serving, corpus):
        df = ivf_sq8_topk(
            emb.filter(F.col("vec_id") < 5), corpus, cents, k=10, nprobe=8,
            serving=serving,
        )
        return [tuple(r) for r in sorted(df.collect(), key=lambda r: (r[0], r[3]))]

    # bootstrap: gen-1 bucketed base + manifest at floor -1
    loc1 = str(tmp_path / "base_gen1")
    rebuild_ann_base(spark, base_serving, cents, delta_dir, loc1, "sq8_e2e_gen1")
    publish_ann_serving(
        man, tier="sq8", table="sq8_e2e_gen1", loc=loc1,
        delta_dir=delta_dir, floor=-1,
    )

    # microbatch 0 lands via the REAL stream; a manifest-routed probe
    # sees the fresh vectors with no repoint
    schema = stage_one(batches[0], 0)
    drain(schema)
    corpus1 = base_rows.unionByName(batches[0])
    assert probe(resolve_serving(spark, man).serving, corpus1) == probe(
        ivf_sq8_serving_table(corpus1, cents), corpus1
    )

    # the at-rest fold: ONE pending batch means the cron's default
    # window is a no-op; the at-rest caller folds it explicitly
    assert (
        rebuild_from_manifest(spark, man, str(tmp_path / "noop"), "sq8_e2e_noop")
        is None
    )
    rebuild_from_manifest(
        spark, man, str(tmp_path / "base_gen2"), "sq8_e2e_gen2",
        upto_batch_id=0,
    )
    v2 = resolve_serving(spark, man)
    assert v2.floor == 0 and v2.snapshot["table"] == "sq8_e2e_gen2"
    assert read_ann_delta(spark, delta_dir).count() == 0  # reset ran
    assert probe(v2.serving, corpus1) == probe(
        ivf_sq8_serving_table(corpus1, cents), corpus1
    )

    # the SAME stream (same checkpoint) continues into the reset delta:
    # its next microbatch gets batch_id=1 > floor=0, so the resolve
    # serves post-fold arrivals immediately
    stage_one(batches[1], 1)
    drain(schema)
    assert probe(resolve_serving(spark, man).serving, emb) == probe(
        ivf_sq8_serving_table(emb, cents), emb
    )
    adv = ann_rebuild_advisor(spark, man)
    assert adv["delta_rows"] == batches[1].count() and adv["floor"] == 0


def test_pq_rebuild_collapses_updated_ids(spark, sf_dir, tmp_path):
    """The PQ-tier rebuild twin, pinned on the UPDATED-id case (the
    append-only-contract violation the delta read tolerates only until
    a rebuild): ids 0 and 1 are re-ingested in the last delta batch
    with changed vectors; the rebuilt table must equal the one-shot
    serving table over the LATEST corpus as an exact row set (latest
    batch wins, one row per id), and a probe against it must equal the
    one-shot probe. Also pins that compaction REFUSES to fold the
    conflicting segment (round-12 ADVICE — the any-pick fold would
    silently lose the ordering the rebuild needs)."""
    from pyspark.sql import functions as F

    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        ivf_build,
        ivf_pq_topk,
        pq_build,
        pq_serving_table,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_pq_delta,
        read_pq_delta,
        rebuild_pq_base,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming.pipeline import (
        _write_batch_partial,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base_rows = emb.filter(F.col("vec_id") < 400)
    cents = ivf_build(base_rows, k=16, iters=2)
    books = pq_build(base_rows, m=8, ksub=16, iters=2)
    base_serving = pq_serving_table(base_rows, cents, books)

    # batch 0: appends [400, 450); batch 1: appends [450, ...) plus
    # UPDATED vectors for ids 0,1 (conflict vs the BASE — resolved only
    # by the rebuild) and for id 400 (conflict WITHIN the delta —
    # batch 1 re-ingests batch 0's id, which compaction must refuse)
    updated = emb.filter(
        F.col("vec_id").isin([0, 1, 400])
    ).withColumn("embedding", F.reverse(F.col("embedding")))
    b0 = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    b1 = emb.filter(F.col("vec_id") >= 450).unionByName(updated)
    delta_dir = str(tmp_path / "delta")
    for i, b in enumerate([b0, b1]):
        _write_batch_partial(pq_serving_table(b, cents, books), delta_dir, i)

    # compaction refuses the conflicting segment (id 400 now carries
    # two distinct code rows across batches 0 and 1) — the violation
    # fails LOUDLY instead of silently perturbing probe results
    with pytest.raises(Exception, match="append-only contract"):
        compact_pq_delta(spark, delta_dir, upto_batch_id=1)

    serving2, meta = rebuild_pq_base(
        spark, base_serving, cents, books, delta_dir,
        str(tmp_path / "base_gen2"), "pq_rebuild_test_gen2", upto_batch_id=1,
        reset_delta=True,
    )

    # latest corpus: original vectors except ids 0,1,400 which carry
    # the updated ones — the rebuilt table equals its one-shot serving
    # table as an exact row set (one row per id, latest batch wins)
    latest = emb.filter(~F.col("vec_id").isin([0, 1, 400])).unionByName(updated)
    want = {
        (r["match_id"], r["cluster"], tuple(r["codes"]))
        for r in pq_serving_table(latest, cents, books).collect()
    }
    got = {
        (r["match_id"], r["cluster"], tuple(r["codes"]))
        for r in serving2.collect()
    }
    assert got == want
    assert meta["n"] == len(want)
    assert meta["codebooks"] == books

    # delta fully reset; probe over the rebuilt base (empty delta)
    # equals the one-shot probe over the latest corpus
    assert read_pq_delta(spark, delta_dir).count() == 0
    queries = latest.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731

    def probe(serving):
        df = ivf_pq_topk(
            queries, latest, cents, books, k=10, nprobe=8, m_rerank=100,
            serving=serving,
        )
        return [tuple(r) for r in sorted(df.collect(), key=key)]

    assert probe(
        serving2.unionByName(read_pq_delta(spark, delta_dir))
    ) == probe(pq_serving_table(latest, cents, books))


def test_compact_registers_estimate_invariant_and_replay_safe(spark, tmp_path):
    """Register compaction lifecycle (round-7 VERDICT #5): folding
    closed-batch partials into a fresh generation partition
    (1) leaves the folded register table and the estimate EXACTLY
    unchanged, (2) stamps and advances the watermark, (3) physically
    shrinks state to <= m rows + the open batch, and (4) is immune to
    a replayed old batch resurrecting its partition after compaction —
    the resurrected partial's registers are <= the compacted maxima,
    so the fold and the estimate never move."""
    import os

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_registers,
        compacted_generation_id,
        compaction_watermark,
        distinct_sketch_stream,
        read_registers,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    batches = [
        [(i, f"user{i % 7}") for i in range(1, 6)],
        [(i, f"user{i % 11}") for i in range(6, 14)],
        [(i, f"user{i % 13}") for i in range(14, 20)],
    ]
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])
    reg_dir = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")
    stream = _ordered_stream(spark, src, schema)
    q = distinct_sketch_stream(stream, reg_dir, ckpt, item_col="text").start()
    q.awaitTermination(120)

    assert compaction_watermark(spark, reg_dir) is None
    before = {
        (r["bucket"], r["max_rank"], r["hll_m"])
        for r in read_registers(spark, reg_dir).collect()
    }
    est_before = hll_estimate(read_registers(spark, reg_dir)).collect()[0]

    # default scope: fold all but the highest live batch (2)
    assert compact_registers(spark, reg_dir) == 1
    assert compaction_watermark(spark, reg_dir) == 1
    part_ids = {
        r["batch_id"]
        for r in spark.read.parquet(reg_dir).select("batch_id").distinct().collect()
    }
    assert part_ids == {compacted_generation_id(1), 2}, part_ids
    after = {
        (r["bucket"], r["max_rank"], r["hll_m"])
        for r in read_registers(spark, reg_dir).collect()
    }
    assert after == before
    est_after = hll_estimate(read_registers(spark, reg_dir)).collect()[0]
    assert est_after["estimate"] == est_before["estimate"]
    assert est_after["sum_scaled"] == est_before["sum_scaled"]

    # resurrection: a replayed batch 0 re-creates its partition after
    # compaction (crash-between-write-and-commit twin). The fold and
    # the estimate must not move.
    replayed = spark.createDataFrame(batches[0], schema)
    (
        hll_registers(replayed, "text")
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(reg_dir)
    )
    resurrected = {
        (r["bucket"], r["max_rank"], r["hll_m"])
        for r in read_registers(spark, reg_dir).collect()
    }
    assert resurrected == before
    # second compaction sweeps the resurrected partition; watermark
    # never regresses below its high-water mark
    assert compact_registers(spark, reg_dir, upto_batch_id=2) == 2
    assert compaction_watermark(spark, reg_dir) == 2
    part_ids = {
        r["batch_id"]
        for r in spark.read.parquet(reg_dir).select("batch_id").distinct().collect()
    }
    assert part_ids == {compacted_generation_id(2)}, part_ids
    final = {
        (r["bucket"], r["max_rank"], r["hll_m"])
        for r in read_registers(spark, reg_dir).collect()
    }
    assert final == before
    # compacting an already-compacted table is a no-op that keeps the
    # watermark (nothing left to fold)
    assert compact_registers(spark, reg_dir) == 2


def test_quantile_sketch_stream_matches_batch_and_compacts(spark, tmp_path):
    """Streaming HDR quantile partials: the SUM-fold of per-batch
    register partials equals the batch register table over the whole
    corpus; a replayed run leaves the fold unchanged (partition
    overwrite — SUM is NOT idempotent, so this is the contract doing
    the work, not the merge math); compaction folds closed batches
    into a FRESH GENERATION partition at batch_id =
    compacted_generation_id(mark) = -(mark+2), with the watermark
    encoded in the partition NAME (the generation protocol — one
    coalesced file appears atomically, readers take newest generation
    + batches > mark in one snapshot, no in-place overwrite), and a
    resurrected pre-watermark partition is EXCLUDED by the read rather
    than double-counted."""
    import os
    import shutil

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hdr_quantiles,
        hdr_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_hdr_registers,
        compacted_generation_id,
        quantile_sketch_stream,
        read_hdr_registers,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "doc_id long, v long"
    batches = [
        [(i, 100 + 17 * i) for i in range(1, 40)],
        [(i, 5000 + 13 * i) for i in range(40, 90)],
        [(i, 9 + i % 7) for i in range(90, 120)],
    ]
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])
    reg_dir = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = _ordered_stream(spark, src, schema)
        q = quantile_sketch_stream(stream, reg_dir, ckpt, value_col="v").start()
        q.awaitTermination(120)

    run()
    all_rows = spark.createDataFrame([r for b in batches for r in b], schema)
    batch_reg = hdr_registers(all_rows, "v", group_cols=[])

    def folded_set():
        return {
            (r["exp"], r["sub"], r["lb"], r["ub"], r["cnt"], r["hdr_sub_bits"])
            for r in read_hdr_registers(spark, reg_dir).collect()
        }

    expected = {
        (r["exp"], r["sub"], r["lb"], r["ub"], r["cnt"], r["hdr_sub_bits"])
        for r in batch_reg.collect()
    }
    assert folded_set() == expected

    # replay: wipe checkpoint, rerun -> partials REWRITTEN not appended
    shutil.rmtree(ckpt)
    run()
    assert folded_set() == expected

    # compact batches 0..1; estimates identical before/after
    est_before = {
        (r["q"], r["q_lb"], r["q_ub"])
        for r in hdr_quantiles(read_hdr_registers(spark, reg_dir), []).collect()
    }
    assert compact_hdr_registers(spark, reg_dir) == 1
    assert folded_set() == expected
    part_ids = {
        r["batch_id"]
        for r in spark.read.parquet(reg_dir).select("batch_id").distinct().collect()
    }
    assert part_ids == {compacted_generation_id(1), 2}, part_ids
    est_after = {
        (r["q"], r["q_lb"], r["q_ub"])
        for r in hdr_quantiles(read_hdr_registers(spark, reg_dir), []).collect()
    }
    assert est_after == est_before

    # resurrection: batch 0's partial reappears post-compaction (crash
    # twin). With SUM-merge this WOULD double-count — the read must
    # exclude it via the watermark decoded from the newest generation
    # partition's NAME.
    (
        hdr_registers(spark.createDataFrame(batches[0], schema), "v", group_cols=[])
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(reg_dir)
    )
    assert folded_set() == expected
    # sweeping compaction: the resurrected pre-watermark partition is
    # never re-folded (reads exclude it) AND its dead files are
    # reclaimed; state converges to exactly the compacted partition
    assert compact_hdr_registers(spark, reg_dir, upto_batch_id=2) == 2
    assert folded_set() == expected
    part_ids = {
        r["batch_id"]
        for r in spark.read.parquet(reg_dir).select("batch_id").distinct().collect()
    }
    assert part_ids == {compacted_generation_id(2)}, part_ids


def test_compact_sketch_sum_invariant_and_resurrection_excluded(spark, tmp_path):
    """CMS partial compaction lifecycle — the count-min twin of the
    HDR contract: folding closed batches into a fresh generation
    partition (batch_id = compacted_generation_id(mark), watermark in
    the partition NAME) leaves the lifetime sketch bitwise unchanged,
    the fold and watermark commit atomically via the generation
    partition's single-file appearance, a resurrected pre-watermark
    partition is excluded (SUM would double-count) and reclaimed by
    the next pass, and state converges to one generation + open batch."""
    import os

    import numpy as np

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import cms_build
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_sketch,
        compacted_generation_id,
        read_sketch,
        token_frequency_sketch_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    batches = [
        [(1, "spark spark shuffle"), (2, "spark join")],
        [(10, "shuffle shuffle partition")],
        [(20, "join broadcast join")],
    ]
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])
    sk_dir = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    stream = _ordered_stream(spark, src, schema)
    q = token_frequency_sketch_stream(stream, sk_dir, ckpt).start()
    q.awaitTermination(120)

    before = read_sketch(spark, sk_dir)
    assert compact_sketch(spark, sk_dir) == 1  # folds 0..1, keeps open 2
    assert np.array_equal(read_sketch(spark, sk_dir), before)
    part_ids = {
        r["batch_id"]
        for r in spark.read.parquet(sk_dir).select("batch_id").distinct().collect()
    }
    assert part_ids == {compacted_generation_id(1), 2}, part_ids

    # resurrection: batch 0's partial reappears after compaction; the
    # read must exclude it (elementwise SUM is not idempotent)
    tokens0 = spark.createDataFrame(batches[0], schema).select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    )
    block0 = cms_build(tokens0, "token")
    (
        spark.createDataFrame([(bytes(block0.tobytes()),)], "block binary")
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(sk_dir)
    )
    assert np.array_equal(read_sketch(spark, sk_dir), before)
    assert compact_sketch(spark, sk_dir, upto_batch_id=2) == 2
    assert np.array_equal(read_sketch(spark, sk_dir), before)
    part_ids = {
        r["batch_id"]
        for r in spark.read.parquet(sk_dir).select("batch_id").distinct().collect()
    }
    assert part_ids == {compacted_generation_id(2)}, part_ids
    # idempotent no-op on an already-compacted table
    assert compact_sketch(spark, sk_dir) == 2


def test_overlap_sketch_stream_matches_batch_and_compacts(spark, tmp_path):
    """Streaming KMV sample lifecycle: (1) the re-selection fold of
    per-batch k-min partials equals the batch kmv_sample over the
    whole corpus (min-k merges exactly) and kmv_estimate over the
    fold equals the batch estimate; (2) compaction leaves sample and
    estimate EXACTLY unchanged while shrinking state and advancing
    the watermark; (3) a replayed run and a post-compaction
    resurrected partial never move the fold (min-k of distinct is
    idempotent — and the snapshot read excludes folded batches
    anyway)."""
    import os
    import shutil

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        kmv_estimate,
        kmv_sample,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_kmv_sample,
        compaction_watermark,
        overlap_sketch_stream,
        read_kmv_sample,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    batches = [
        [(i, f"user{i % 9}") for i in range(1, 7)],
        [(i, f"user{i % 13}") for i in range(7, 16)],
        [(i, f"user{i % 5}") for i in range(16, 20)],
    ]
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])

    smp_dir = str(tmp_path / "samples")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = _ordered_stream(spark, src, schema)
        q = overlap_sketch_stream(stream, smp_dir, ckpt, item_col="text", k=8).start()
        q.awaitTermination(120)

    run()
    all_rows = spark.createDataFrame([r for b in batches for r in b], schema)
    batch_sample = kmv_sample(all_rows, "text", k=8)
    folded = read_kmv_sample(spark, smp_dir)
    assert sorted((r["pos"], r["hv"]) for r in folded.collect()) == sorted(
        (r["pos"], r["hv"]) for r in batch_sample.collect()
    )
    est = kmv_estimate(folded, k=8).collect()[0]
    batch_est = kmv_estimate(batch_sample, k=8).collect()[0]
    assert est["estimate"] == batch_est["estimate"]

    # compaction: fold all but the open batch; sample + estimate move not
    mark = compact_kmv_sample(spark, smp_dir)
    assert mark == 1
    assert compaction_watermark(spark, smp_dir) == 1
    compacted = read_kmv_sample(spark, smp_dir)
    assert sorted((r["pos"], r["hv"]) for r in compacted.collect()) == sorted(
        (r["pos"], r["hv"]) for r in batch_sample.collect()
    )
    parts = [p for p in os.listdir(smp_dir) if p.startswith("batch_id=")]
    assert "batch_id=-3" in parts and "batch_id=0" not in parts, parts

    # resurrection: a replayed old batch rewrites its partition after
    # compaction — the snapshot read excludes it, fold unchanged
    shutil.rmtree(ckpt)
    run()
    refolded = read_kmv_sample(spark, smp_dir)
    assert sorted((r["pos"], r["hv"]) for r in refolded.collect()) == sorted(
        (r["pos"], r["hv"]) for r in batch_sample.collect()
    )


def test_term_count_stream_matches_batch_and_compacts_distributed(spark, tmp_path):
    """Streaming EXACT term counts (round 10 — the text twin of the
    sketch partials): the SUM-fold of per-batch (term, cnt) partials
    equals the batch token counts over the whole corpus; a replayed
    run leaves the fold unchanged (partition overwrite — SUM is not
    idempotent); compaction goes through the DISTRIBUTED-merge
    generation path (hidden tmp dir + atomic directory rename — no
    driver collect, vocabulary-sized state) and leaves the counts,
    the watermark, and top-k reads invariant; a resurrected
    pre-watermark partition is excluded and reclaimed."""
    import os
    import shutil

    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        tokens_expr,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_term_counts,
        compacted_generation_id,
        read_term_counts,
        term_count_stream,
    )

    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    batches = [
        [(1, "spark joins Spark  SHUFFLES"), (2, "window agg window")],
        [(3, "spark shuffles spill"), (4, "agg agg window")],
        [(5, "joins and spills and spark")],
    ]
    _stage_ordered_batches(
        src, [spark.createDataFrame(r, schema) for r in batches]
    )
    cnt_dir = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = _ordered_stream(spark, src, schema)
        q = term_count_stream(stream, cnt_dir, ckpt).start()
        q.awaitTermination(120)

    run()
    all_rows = spark.createDataFrame([r for b in batches for r in b], schema)
    expected = {
        (r["term"], r["cnt"])
        for r in all_rows.select(F.explode(tokens_expr("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }

    def folded():
        return {
            (r["term"], r["cnt"])
            for r in read_term_counts(spark, cnt_dir).collect()
        }

    assert folded() == expected
    # normalization parity spot-check: "Spark"/"SHUFFLES" lowercased,
    # multi-space collapsed — 4 sparks, 3 aggs, 3 windows
    as_map = dict(folded())
    assert as_map["spark"] == 4 and as_map["agg"] == 3 and as_map["window"] == 3

    # replay: wipe checkpoint, rerun -> partials rewritten, not added
    shutil.rmtree(ckpt)
    run()
    assert folded() == expected

    # compact batches 0..1 through the distributed-merge path
    assert compact_term_counts(spark, cnt_dir, upto_batch_id=1) == 1
    assert folded() == expected
    parts = {
        r["batch_id"]
        for r in spark.read.parquet(cnt_dir).select("batch_id").distinct().collect()
    }
    assert parts == {compacted_generation_id(1), 2}, parts
    # the atomic-publish tmp dir never survives a successful pass
    assert not [d for d in os.listdir(cnt_dir) if d.startswith(".gen_tmp_")]

    # resurrection: batch 0's partial reappears post-compaction; with
    # SUM-merge this WOULD double-count — the generation-name watermark
    # excludes it, and the next pass reclaims it and converges
    (
        spark.createDataFrame(batches[0], schema)
        .select(F.explode(tokens_expr("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(cnt_dir)
    )
    assert folded() == expected
    assert compact_term_counts(spark, cnt_dir, upto_batch_id=2) == 2
    assert folded() == expected
    parts = {
        r["batch_id"]
        for r in spark.read.parquet(cnt_dir).select("batch_id").distinct().collect()
    }
    assert parts == {compacted_generation_id(2)}, parts
    # compacting an already-compacted table keeps the watermark
    assert compact_term_counts(spark, cnt_dir) == 2


def test_compaction_sweeps_crashed_debris(spark, tmp_path):
    """Crash-debris handling in the generation protocol (round 10):
    (1) a distributed-merge pass that crashed between write and rename
    leaves a hidden .gen_tmp_* dir — invisible to readers
    (dot-prefix), swept at the top of the NEXT pass, fold unaffected;
    (2) a write that crashed after creating a generation PARTITION DIR
    but before any file landed leaves an EMPTY batch_id=-N dir —
    invisible to readers (file-based listing), but a naive
    directory-based discovery would decode a SPOOFED watermark from
    its name and reclaim live batches that were never folded (silent
    data loss — caught by this test's first version); compaction must
    treat it as debris: delete it, keep the true watermark, lose
    nothing. compaction_watermark must ignore it too."""
    import os

    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_term_counts,
        compacted_generation_id,
        compaction_watermark,
        read_term_counts,
    )

    cnt_dir = str(tmp_path / "counts")
    for b, rows in enumerate([[("spark", 2)], [("spark", 1), ("agg", 3)]]):
        (
            spark.createDataFrame(rows, "term string, cnt long")
            .withColumn("batch_id", F.lit(b))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(cnt_dir)
        )
    # crashed-pass debris: hidden tmp dir with junk parquet
    junk = os.path.join(cnt_dir, ".gen_tmp_deadbeef")
    spark.createDataFrame([("junk", 99)], "term string, cnt long").write.parquet(junk)
    before = {
        (r["term"], r["cnt"]) for r in read_term_counts(spark, cnt_dir).collect()
    }
    assert before == {("spark", 3), ("agg", 3)}  # junk invisible
    assert compact_term_counts(spark, cnt_dir, upto_batch_id=0) == 0
    assert not os.path.isdir(junk)  # swept
    assert {
        (r["term"], r["cnt"]) for r in read_term_counts(spark, cnt_dir).collect()
    } == before
    # crashed-write debris: EMPTY generation dir claiming watermark 3
    spoof = os.path.join(cnt_dir, f"batch_id={compacted_generation_id(3)}")
    os.makedirs(spoof)
    assert compaction_watermark(spark, cnt_dir) == 0  # name ignored
    assert {
        (r["term"], r["cnt"]) for r in read_term_counts(spark, cnt_dir).collect()
    } == before
    # the next pass deletes the spoof, folds batch 1 under the TRUE
    # watermark, and loses nothing
    assert compact_term_counts(spark, cnt_dir, upto_batch_id=1) == 1
    assert not os.path.isdir(spoof)
    assert {
        (r["term"], r["cnt"]) for r in read_term_counts(spark, cnt_dir).collect()
    } == before
    parts = {
        r["batch_id"]
        for r in spark.read.parquet(cnt_dir).select("batch_id").distinct().collect()
    }
    assert parts == {compacted_generation_id(1)}, parts


def test_collocation_consumer_matches_batch_and_survives_compaction(
    spark, tmp_path
):
    """The heavy-hitters consumer over the exact term-count state
    (round-10 VERDICT #4): read_collocations over the unigram + bigram
    state dirs equals text.collocation_topk over the same closed
    batches BIT-FOR-BIT (shared collocations_from_counts formula —
    integer counts through one fixed float expression), read_top_terms
    equals the batch top-k, and compacting EITHER state dir leaves
    both views unchanged (folds preserve exact counts). The bigram
    feed's "w1 w2" term encoding round-trips through split_part."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        collocation_topk,
        tokens_expr,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        bigram_count_stream,
        compact_term_counts,
        read_collocations,
        read_top_terms,
        term_count_stream,
    )

    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    batches = [
        [(1, "hash join beats sort join"), (2, "hash join wins again")],
        [(3, "sort merge join and hash join"), (4, "window agg window agg")],
        [(5, "hash join hash join window agg")],
    ]
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])
    uni_dir, bi_dir = str(tmp_path / "uni"), str(tmp_path / "bi")

    stream = _ordered_stream(spark, src, schema)
    q = term_count_stream(stream, uni_dir, str(tmp_path / "ck_u")).start()
    q.awaitTermination(120)
    stream = _ordered_stream(spark, src, schema)
    q = bigram_count_stream(stream, bi_dir, str(tmp_path / "ck_b")).start()
    q.awaitTermination(120)

    all_rows = spark.createDataFrame([r for b in batches for r in b], schema)
    expect_coll = [
        tuple(r)
        for r in collocation_topk(all_rows, min_count=2, topk=10)
        .orderBy("rank")
        .collect()
    ]
    assert expect_coll, "fixture must produce collocations"
    assert any(r[0] == "hash" and r[1] == "join" for r in expect_coll)

    def views():
        coll = [
            tuple(r)
            for r in read_collocations(
                spark, uni_dir, bi_dir, min_count=2, topk=10
            )
            .orderBy("rank")
            .collect()
        ]
        top = [
            tuple(r)
            for r in read_top_terms(spark, uni_dir, k=3).orderBy("rank").collect()
        ]
        return coll, top

    from pyspark.sql import Window

    expect_top = [
        tuple(r)
        for r in all_rows.select(F.explode(tokens_expr("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "term")
        .limit(3)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), "term"))
            .cast("bigint"),
        )
        .collect()
    ]

    coll, top = views()
    assert coll == expect_coll
    assert top == expect_top

    # compact the unigram dir (default: newest batch stays open ->
    # watermark 1), then the bigram dir fully closed (upto 2): each
    # fold must leave both consumer views unchanged
    assert compact_term_counts(spark, uni_dir) == 1
    coll, top = views()
    assert coll == expect_coll and top == expect_top
    assert compact_term_counts(spark, bi_dir, upto_batch_id=2) == 2
    coll, top = views()
    assert coll == expect_coll and top == expect_top


def test_mg_summary_stream_guarantees_replay_and_compaction(spark, tmp_path):
    """Streaming Misra-Gries heavy hitters (round 11 — the O(k)-state
    twin of term_count_stream): each microbatch stores its MG fixed
    point (at most k counter rows + the NULL-term decrement row), so
    state stays bounded even when the VOCABULARY would not. The
    SUM-folded view must satisfy the four batch-operator guarantees
    against exact whole-corpus counts; a replayed run reproduces the
    view exactly (partition overwrite); compaction through the shared
    (term, cnt) generation protocol leaves the view IDENTICAL (folds
    preserve counter and decrement sums — the NULL-term rows merge
    into the generation's own budget row); a resurrected
    pre-watermark partial is excluded, not double-counted."""
    import shutil

    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        tokens_expr,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_term_counts,
        compacted_generation_id,
        mg_summary_stream,
        read_mg_summary,
    )

    schema = "doc_id long, text string"
    batches = [
        [(1, "the the the spark joins the spark the"), (2, "agg window agg the the")],
        [(3, "the spark the spill shuffle spill the the"), (4, "agg the window")],
        [(5, "the joins the spark the agg the")],
    ]
    src = str(tmp_path / "src")
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])
    state = str(tmp_path / "mg")
    ckpt = str(tmp_path / "ckpt")
    k = 4

    def run():
        q = mg_summary_stream(
            _ordered_stream(spark, src, schema), state, ckpt, k=k
        ).start()
        q.awaitTermination(120)

    run()
    all_rows = spark.createDataFrame([r for b in batches for r in b], schema)
    exact = {
        r["w"]: r["c"]
        for r in all_rows.select(F.explode(tokens_expr("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }
    n = sum(exact.values())

    def view():
        return sorted(
            (r["item"], r["est"], r["err_budget"])
            for r in read_mg_summary(spark, state).collect()
        )

    first = view()
    assert first, "skewed stream must leave a non-empty summary"
    eb = first[0][2]
    assert all(b == eb for _, _, b in first)
    assert eb * (k + 1) <= n
    for item, est, _ in first:
        assert est <= exact[item], (item, est)
        assert exact[item] - est <= eb, (item, est, eb)
    missing = [w for w, c in exact.items() if c > eb and w not in {i for i, _, _ in first}]
    assert not missing, missing
    # the hot term is genuinely tracked with a meaningful estimate
    assert dict((i, e) for i, e, _ in first)["the"] > 0

    # per-batch state is bounded: <= k counters + 1 decrement row
    per_batch = (
        spark.read.parquet(state)
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    assert per_batch and all(r["rows"] <= k + 1 for r in per_batch), per_batch

    # replay: wipe the checkpoint, rerun -> partials rewritten in place
    shutil.rmtree(ckpt)
    run()
    assert view() == first

    # compaction: fold batches 0..1, view identical, then resurrect a
    # pre-watermark partial — excluded by the generation watermark
    assert compact_term_counts(spark, state, upto_batch_id=1) == 1
    assert view() == first
    parts = {
        r["batch_id"]
        for r in spark.read.parquet(state).select("batch_id").distinct().collect()
    }
    assert parts == {compacted_generation_id(1), 2}, parts
    (
        spark.createDataFrame([("the", 999), (None, 1)], "term string, cnt long")
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(state)
    )
    assert view() == first
    assert compact_term_counts(spark, state, upto_batch_id=2) == 2
    assert view() == first


def test_priority_sample_stream_equals_batch_and_compacts(spark, tmp_path):
    """Streaming weighted sampling (round 11): the distinct-candidate
    fold of per-batch top-(k+1) priority partials, finalized through
    the shared priority_finalize algebra, equals the BATCH operator
    over the whole corpus bit-for-bit — rank, tau, weights, and
    subset-sum estimates included (the merge law, now across
    microbatches). The fold is IDEMPOTENT (re-selection over
    distinct), so replay, compaction, and a resurrected pre-watermark
    partition all leave the sample identical."""
    import shutil

    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        priority_sample,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_priority_sample,
        compacted_generation_id,
        priority_sample_stream,
        read_priority_sample,
    )

    schema = "doc_id long, n_chars long"
    batches = [
        [(i, (i * 37) % 211 + 1) for i in range(0, 40)],
        [(i, (i * 37) % 211 + 1) for i in range(40, 80)],
        [(i, (i * 37) % 211 + 1) for i in range(80, 120)],
    ]
    src = str(tmp_path / "src")
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])
    state = str(tmp_path / "ps")
    ckpt = str(tmp_path / "ckpt")
    k = 15

    def run():
        q = priority_sample_stream(
            _ordered_stream(spark, src, schema), state, ckpt,
            weight_col="n_chars", key_col="doc_id", k=k,
        ).start()
        q.awaitTermination(120)

    run()
    all_rows = spark.createDataFrame([r for b in batches for r in b], schema)
    expected = sorted(
        (r["doc_id"], r["sample_rank"], r["ps_weight"], r["ps_priority"],
         r["ps_tau"], r["ps_est"])
        for r in priority_sample(all_rows, "n_chars", k, "doc_id").collect()
    )

    def view():
        return sorted(
            (int(r["key"]), r["sample_rank"], r["ps_weight"], r["ps_priority"],
             r["ps_tau"], r["ps_est"])
            for r in read_priority_sample(spark, state, k).collect()
        )

    assert view() == expected
    # per-batch state is bounded at k+1 candidate rows
    per_batch = (
        spark.read.parquet(state)
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    assert per_batch and all(r["rows"] <= k + 1 for r in per_batch)

    # replay: partials rewritten in place, sample unchanged
    shutil.rmtree(ckpt)
    run()
    assert view() == expected

    # reading above the stream's stamped k raises in-plan (the
    # partials only retained top-(k+1)); k < 1 raises loudly too
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with _pytest.raises((SparkRuntimeException, Py4JJavaError), match="ps_k"):
        read_priority_sample(spark, state, k + 1).collect()
    with _pytest.raises(ValueError, match="requires k >= 1"):
        read_priority_sample(spark, state, 0)

    # compaction + resurrection: idempotent fold, sample invariant,
    # and the generation RE-TRUNCATES to the stamped bound (O(k)
    # state however many batches fold)
    assert compact_priority_sample(spark, state, upto_batch_id=1) == 1
    assert view() == expected
    parts = {
        r["batch_id"]
        for r in spark.read.parquet(state).select("batch_id").distinct().collect()
    }
    assert parts == {compacted_generation_id(1), 2}, parts
    gen_rows = (
        spark.read.parquet(state)
        .filter(F.col("batch_id") == compacted_generation_id(1))
        .collect()
    )
    assert len(gen_rows) <= k + 1
    assert all(r["ps_k"] == k for r in gen_rows)
    (
        spark.createDataFrame(batches[0], schema)
        .selectExpr("cast(doc_id as string) AS key",
                    "cast(n_chars as double) AS ps_weight",
                    "cast(n_chars as double) AS ps_priority",
                    f"cast({k} as int) AS ps_k")
        .limit(k + 1)
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(state)
    )
    assert view() == expected  # pre-watermark garbage is excluded
    assert compact_priority_sample(spark, state, upto_batch_id=2) == 2
    assert view() == expected  # ...and reclaimed, never re-folded


def test_compact_mg_summary_retruncates_and_keeps_guarantees(spark, tmp_path):
    """The bounded-state MG compactor (round 11): folding closed
    batches re-truncates to k counters — one more MG merge step, the
    distributed twin of sketch.mg_truncate — so the generation stays
    O(k) however many batches fold, while all four read-time
    guarantees survive (est <= exact, undercount within the budget,
    budget within N/(k+1), completeness above the budget). The view is
    GUARANTEE-invariant, not value-invariant: the budget may grow by
    the re-truncation decrement, never shrink."""
    import shutil  # noqa: F401  (parity with sibling lifecycle tests)

    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        tokens_expr,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_mg_summary,
        compacted_generation_id,
        mg_summary_stream,
        read_mg_summary,
    )

    schema = "doc_id long, text string"
    batches = [
        [(1, "the the the spark joins the spark the"), (2, "agg window agg the the")],
        [(3, "the spark the spill shuffle spill the the"), (4, "agg the window")],
        [(5, "the joins the spark the agg the")],
    ]
    src = str(tmp_path / "src")
    _stage_ordered_batches(src, [spark.createDataFrame(r, schema) for r in batches])
    state = str(tmp_path / "mg")
    k = 4
    q = mg_summary_stream(
        _ordered_stream(spark, src, schema), state, str(tmp_path / "ckpt"), k=k
    ).start()
    q.awaitTermination(120)

    all_rows = spark.createDataFrame([r for b in batches for r in b], schema)
    exact = {
        r["w"]: r["c"]
        for r in all_rows.select(F.explode(tokens_expr("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }
    n = sum(exact.values())
    budget_before = read_mg_summary(spark, state).collect()[0]["err_budget"]

    assert compact_mg_summary(spark, state, k=k, upto_batch_id=1) == 1
    gen_rows = (
        spark.read.parquet(state)
        .filter(F.col("batch_id") == compacted_generation_id(1))
        .collect()
    )
    assert len(gen_rows) <= k + 1  # k counters + the decrement row

    rows = read_mg_summary(spark, state).collect()
    assert rows
    eb = rows[0]["err_budget"]
    assert eb >= budget_before  # re-truncation can only grow the budget
    assert eb * (k + 1) <= n
    tracked = {r["item"]: r["est"] for r in rows if r["item"] is not None}
    for item, est in tracked.items():
        assert est <= exact[item], (item, est)
        assert exact[item] - est <= eb, (item, est, eb)
    missing = [w for w, c in exact.items() if c > eb and w not in tracked]
    assert not missing, missing
    # fold the last closed batch too, then re-compaction is a no-op
    assert compact_mg_summary(spark, state, k=k, upto_batch_id=2) == 2
    assert compact_mg_summary(spark, state, k=k, upto_batch_id=2) == 2
    rows2 = read_mg_summary(spark, state).collect()
    eb2 = rows2[0]["err_budget"]
    assert eb2 >= eb and eb2 * (k + 1) <= n
    tracked2 = {r["item"]: r["est"] for r in rows2 if r["item"] is not None}
    for item, est in tracked2.items():
        assert est <= exact[item] and exact[item] - est <= eb2
    assert not [w for w, c in exact.items() if c > eb2 and w not in tracked2]


def test_compact_mg_summary_merge_matches_mg_truncate(spark):
    """The distributed fold IS sketch.mg_truncate's algebra: over the
    same merged counts, the kept counter set, the kept values, and the
    decrement are identical (one definition, two execution forms —
    the drift rule applied to the compactor)."""
    import pandas as pd

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        mg_truncate,
    )
    from accounts_receivable_data_pipeline_api_spark.streaming import (
        compact_mg_summary,
        compacted_generation_id,
    )

    counts = {"a": 50, "b": 30, "c": 30, "d": 7, "e": 7, "f": 7, "g": 2}
    k = 4
    kept, d = mg_truncate(pd.Series(counts), k)
    expected = {i: int(c) for i, c in kept.items()}

    state_dir = str(spark._sc._temp_dir) + "/mgfold"
    rows = [(i, c) for i, c in counts.items()] + [(None, 3)]
    (
        spark.createDataFrame(rows, "term string, cnt long")
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(state_dir)
    )
    assert compact_mg_summary(spark, state_dir, k=k, upto_batch_id=0) == 0
    folded = spark.read.parquet(state_dir).filter(
        F.col("batch_id") == compacted_generation_id(0)
    ).collect()
    got = {r["term"]: r["cnt"] for r in folded if r["term"] is not None}
    dec = [r["cnt"] for r in folded if r["term"] is None]
    assert got == expected
    assert dec == [3 + d]
