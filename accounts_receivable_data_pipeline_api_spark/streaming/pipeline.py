"""Structured Streaming jobs ([EXT] §2.9 — the reference is batch-only).

Three streaming shapes, each the incremental twin of a batch operator
already pinned by the oracle corpus:

  invoice_csv_stream + dedup_invoice_stream
      streaming analogue of the S5 upsert: file-source CSV batches,
      watermarked dropDuplicates on invoice_number.
  events_windowed_counts
      tumbling-window aggregation over the events table — same
      semantics as the batch corpus query ``events_hourly_windows``
      (plans/relational.py), which is how correctness is oracled.
  sessionize_events
      custom stateful operator via applyInPandasWithState: groups a
      user's events into sessions split by >30min gaps.
  enrich_events_with_dim
      stream-static broadcast join: per-microbatch dimension stamping
      with no stream-side shuffle or state (the J1 broadcast-dim join,
      incrementally).

All jobs parameterize source/sink so tests can run them with
memory/file sinks and ``availableNow`` triggers.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ..functions.cleaning import money, nullif_blank, parse_mdy_date, terms_days_expr

RAW_INVOICE_SCHEMA = StructType(
    [
        StructField(name, StringType())
        for name in (
            "CustomerName",
            "InvoiceNumber",
            "InvoiceDate",
            "CustomerPoNumber",
            "BillTotal",
            "Applied",
            "Status",
            "Currency",
            "ContactName",
            "ContactPhone",
            "ContactEmail",
            "CustomerTerms",
            "DueDate",
        )
    ]
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def invoice_csv_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source streaming ingest of invoice CSV batches with the same
    typed parsing as the batch path (ar/ingest.py) plus an ingest-time
    timestamp for watermarking."""
    raw = spark.readStream.schema(RAW_INVOICE_SCHEMA).option("header", True).csv(input_dir)
    return (
        raw.withColumn("invoice_number", F.trim(F.col("InvoiceNumber")))
        .withColumn("invoice_date", parse_mdy_date(F.col("InvoiceDate")))
        .withColumn("bill_total", money(F.col("BillTotal")))
        .withColumn("applied", money(F.col("Applied")))
        .withColumn("status", nullif_blank(F.col("Status")))
        .withColumn("currency", nullif_blank(F.col("Currency")))
        .withColumn("terms_days", terms_days_expr(F.col("CustomerTerms")))
        .withColumn("ingest_ts", F.current_timestamp())
        .select(
            "invoice_number",
            "invoice_date",
            "bill_total",
            "applied",
            "status",
            "currency",
            "terms_days",
            "ingest_ts",
        )
    )


def dedup_invoice_stream(parsed: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming S5: keep the first arrival of each invoice_number
    within the watermark horizon (state expires after it).

    Batch last-wins (Q11) vs streaming first-wins: a stream has no "end
    of batch", so first-arrival-wins is the only bounded-state option —
    documented deviation, mirrored in the oracle corpus only via the
    batch path.
    """
    return parsed.withWatermark("ingest_ts", watermark).dropDuplicates(
        ["invoice_number"]
    )


def events_windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked windowed aggregation (the incremental twin of the
    oracled batch query ``events_hourly_windows``).

    ``slide=None`` gives tumbling windows; a ``slide`` shorter than
    ``window`` gives overlapping (sliding) windows — each row lands in
    window/slide window instances, so state and output scale by that
    factor. The fan-out compiles to an Expand BEFORE the partial
    aggregate (map-side, pre-shuffle), so shuffle bytes grow with the
    number of live (window, key) groups, not raw rows × instances. A
    window's state is evicted (and the row emitted in append mode) once
    the watermark passes its end, same as tumbling.
    """
    # withWatermark genuinely REQUIRES an instant-typed TIMESTAMP in
    # Spark 4.1 (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ — verified;
    # batch F.window accepts NTZ, the streaming watermark does not). So:
    # cast the canonical NTZ event time up to TIMESTAMP for the
    # watermark/window ops, then cast the emitted window bound BACK to
    # NTZ so the streaming output is type-identical to the oracled batch
    # twin events_hourly_windows and collects host-tz-independently.
    # With the session TZ pinned to UTC (session.py) both casts preserve
    # the wall clock.
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def join_purchases_to_signups_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    within: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-STREAM join: purchases matched to the same user's signup
    events that happened at most ``within`` before them.

    Both sides carry a watermark and the join condition bounds event
    time on BOTH streams (p.ts between s.ts and s.ts + within), which
    is what lets Spark evict join state: a buffered signup can be
    dropped once the watermark passes signup_ts + within, so state is
    O(watermark window), not O(stream). An unbounded-time stream-stream
    join would grow state forever — the condition IS the scale design.

    ``how="left_outer"`` makes signups the preserved side: a signup
    with no purchase within the window emits once — with NULL purchase
    columns — only when the watermark proves no future purchase can
    match (passes signup_ts + within). Until then it is withheld, so
    outer results are delayed by up to watermark + within; that delay
    is the price of exactly-once null emission in append mode.
    Batch twin of the same shape: join_range_followups
    (plans/temporal.py).
    """
    # Watermark requires TIMESTAMP (see events_windowed_counts); output
    # event times are cast back to canonical NTZ in the final select.
    ts = F.col("ts").cast("timestamp")
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user_id"),
            F.col("event_id").alias("signup_event_id"),
            ts.alias("signup_ts"),
        )
        .withWatermark("signup_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_event_id"), ts.alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (purchases.user_id == signups.s_user_id)
        & (purchases.purchase_ts >= signups.signup_ts)
        & (purchases.purchase_ts <= signups.signup_ts + F.expr(f"INTERVAL {within}"))
    )
    if how == "left_outer":
        # Signups preserved; purchase side nullable, so user_id must
        # come from the signup side.
        return signups.join(purchases, cond, "left_outer").select(
            F.col("s_user_id").alias("user_id"),
            "purchase_event_id",
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
            "signup_event_id",
            F.col("signup_ts").cast("timestamp_ntz").alias("signup_ts"),
        )
    return purchases.join(signups, cond, how).select(
        "user_id",
        "purchase_event_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "signup_event_id",
        F.col("signup_ts").cast("timestamp_ntz").alias("signup_ts"),
    )


def enrich_events_with_dim(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    live event stream. The static side is re-scanned per microbatch (so
    a refreshed dim parquet is picked up without restarting the query)
    and explicitly broadcast — each microbatch is a map-side hash join,
    no stream-side shuffle and no state store. This is the standard
    training-pipeline shape for stamping metadata (user segment, doc
    license, source tier) onto an event/document stream; for dims too
    large to broadcast, pre-bucket both sides on the key instead
    (sources/bucketed.py) and let the join co-locate."""
    return events.join(F.broadcast(dim), on, "left")


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        # NTZ: type-identical to the oracled batch twin window_sessionize
        # (min/max over the canonical NTZ event time)
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
        StructField("n_events", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
    ]
)

SESSION_GAP = dt.timedelta(minutes=30)


def _sessionize_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    """Stateful kernel: emit a session row whenever a >30min gap closes
    one. State = (session_start, last_event, count) in epoch micros."""
    gap_us = int(SESSION_GAP.total_seconds() * 1_000_000)
    if state.hasTimedOut:
        (start_us, last_us, n) = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            }
        )
        return

    ts_list: list[int] = []
    for pdf in pdfs:
        ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_list.sort()
    if not ts_list:
        return

    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = ts_list[0], ts_list[0], 0

    closed = []
    for t in ts_list:
        if t - last_us > gap_us:
            closed.append((start_us, last_us, n))
            start_us, n = t, 0
        last_us = max(last_us, t)
        n += 1
    state.update((start_us, last_us, n))
    state.setTimeoutDuration(int(gap_us // 1000))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_events(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with
    a 30-minute inactivity gap, via applyInPandasWithState (Arrow-batch
    state machine; state size O(active users))."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming MERGE sink (S5, incremental form)
# ---------------------------------------------------------------------------

MANIFEST = "_MANIFEST"


def read_snapshot_table(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """Read the current snapshot of a snapshot-versioned parquet table
    (None if no snapshot committed yet)."""
    import os

    manifest = os.path.join(target_dir, MANIFEST)
    if not os.path.exists(manifest):
        return None
    with open(manifest) as fh:
        snap = fh.read().strip()
    return spark.read.parquet(os.path.join(target_dir, snap))


def stream_upsert_invoices(
    parsed: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key: str = "invoice_number",
):
    """Streaming S5: every micro-batch MERGEs into a parquet table via
    foreachBatch — the production shape for continuous upsert ingest.

    The table is snapshot-versioned (a poor-man's table format): batch N
    writes a full new snapshot computed as merge(previous snapshot,
    batch), then atomically repoints the manifest file. Readers always
    see a complete snapshot; a crashed batch leaves the manifest (and
    thus the table) untouched, and foreachBatch re-runs it. Last-wins
    semantics across batches come from batch order (later batch
    overrides); within a batch, ties on the key break by the greatest
    full-row struct — deterministic under replays, unlike arrival order.
    At 100 TB one swaps this for Delta/Iceberg MERGE INTO, which is this
    exact pattern plus file-level pruning and compaction.
    """
    import os

    from pyspark.sql import Window as W

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        data_cols = [c for c in batch_df.columns]
        struct_all = F.struct(*[F.col(c) for c in data_cols])
        by_key = W.partitionBy(key).orderBy(F.col("__pri").desc(), F.col("__tie").desc())

        batch_ranked = batch_df.withColumn("__pri", F.lit(1)).withColumn("__tie", struct_all)
        prev = read_snapshot_table(spark, target_dir)
        if prev is not None:
            prev_ranked = prev.select(*data_cols).withColumn(
                "__pri", F.lit(0)
            ).withColumn("__tie", F.struct(*[F.col(c) for c in data_cols]))
            merged = batch_ranked.unionByName(prev_ranked)
        else:
            merged = batch_ranked
        final = (
            merged.withColumn("__rn", F.row_number().over(by_key))
            .filter(F.col("__rn") == 1)
            .select(*data_cols)
        )
        snap = f"snap_{batch_id:010d}"
        final.write.mode("overwrite").parquet(os.path.join(target_dir, snap))
        tmp = os.path.join(target_dir, MANIFEST + ".tmp")
        with open(tmp, "w") as fh:
            fh.write(snap)
        os.replace(tmp, os.path.join(target_dir, MANIFEST))  # atomic repoint

    return (
        parsed.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def decontaminate_doc_stream(
    docs_stream: DataFrame,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 5,
):
    """Streaming benchmark decontamination: documents arrive
    continuously (the incremental-crawl ingest shape) and each
    microbatch is flagged against the STATIC benchmark gram set before
    it ever reaches the training corpus sink.

    foreachBatch rather than a direct streaming aggregation, on
    purpose: the per-document hit count groups the exploded grams by
    doc_id, and a document's grams never span microbatches (explode
    happens inside the batch), so cross-batch state would buy nothing —
    running the BATCH operator (operators/text.py:decontaminate, scan ->
    explode -> broadcast join -> map-side-combinable agg) per microbatch
    keeps the exact oracle-checked plan, zero state store, and an
    IDEMPOTENT sink: output partitions by the checkpointed batch_id
    with dynamic partition overwrite, so a crash between the write and
    the streaming commit replays the batch into its own partition
    instead of appending a second copy (plain append would be
    at-least-once). The
    benchmark side re-scans per batch, so a refreshed benchmark parquet
    is picked up without restarting the query — same property as
    enrich_events_with_dim.
    """
    from ..operators.text import decontaminate

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_partial(
            decontaminate(batch_df, benchmark, n=n),
            out_dir,
            batch_id,
        )

    return (
        docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def incremental_dedup_stream(
    docs_stream: DataFrame,
    fingerprints_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming incremental dedup: the continuous-crawl twin of
    operators/dedup.py:incremental_exact. Each microbatch classifies
    its documents against the PERSISTED fingerprint table (every
    content hash ever accepted), appends the verdicts to ``out_dir``,
    and writes the batch's NOVEL fingerprints back to
    ``fingerprints_dir`` — so a duplicate arriving in a later batch is
    caught no matter how far apart in time the copies land.

    foreachBatch, not a stateful streaming agg, on purpose: the dedup
    state is the full corpus-lifetime hash set, which belongs in a
    persisted, bucketable table (at 100 TB: bucketed BY content_hash so
    the per-batch probe join is co-located), not in one query's state
    store (state-store contents are checkpoint-coupled, per-query, and
    rebuilt on topology change; the fingerprint TABLE is shared by
    every consumer, compactable, and survives pipeline rewrites — the
    same reasoning as stream_upsert_invoices' snapshot table). Within a
    batch, lower-id wins (dup_in_new), exactly like the batch operator;
    across batches, earlier batches win (dup_of_old).

    Replay safety (a crash can land between this function's writes and
    the streaming commit, so batch N may run twice): (a) BOTH sinks
    partition by the checkpointed batch_id and use dynamic partition
    overwrite — a replay rewrites its own partitions, never appends a
    second copy; (b) the fingerprint read EXCLUDES the current
    batch_id's partition, so a replayed batch never sees its own
    first-attempt hashes as "old" (which would flip its kept docs to
    dup_of_old); (c) only the missing-table error is treated as
    "first batch" — any other read failure (storage blip, permission)
    raises and lets the engine retry the batch, instead of silently
    deduping against an empty corpus and poisoning the hash set with
    duplicates classified as kept.
    """
    from ..operators.dedup import normalized

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        try:
            old = (
                spark.read.parquet(fingerprints_dir)
                # replay safety (b): never dedup against our own
                # first attempt's partition
                .filter(F.col("batch_id") != batch_id)
                .select("content_hash")
                .distinct()
            )
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e):
                raise
            # genuinely the first batch: the table does not exist yet
            old = spark.createDataFrame([], "content_hash string")
        hashed = batch_df.select(
            F.col("doc_id"), F.md5(normalized("text")).alias("content_hash")
        )
        w = Window.partitionBy("content_hash")
        verdicts = (
            hashed.join(old.withColumn("_in_old", F.lit(1)), "content_hash", "left")
            .withColumn("_min_new", F.min("doc_id").over(w))
            .select(
                "doc_id",
                "content_hash",
                F.when(F.col("_in_old").isNotNull(), "dup_of_old")
                .when(F.col("doc_id") > F.col("_min_new"), "dup_in_new")
                .otherwise("kept")
                .alias("status"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        (
            verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        (
            verdicts.filter(F.col("status") == "kept")
            .select("content_hash", "batch_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(fingerprints_dir)
        )

    return (
        docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def token_frequency_sketch_stream(
    docs_stream: DataFrame,
    sketch_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 2048,
):
    """Streaming corpus-lifetime token frequencies in bounded memory:
    each microbatch builds a count-min sketch PARTIAL over its tokens
    and writes it to ``sketch_dir`` partitioned by the checkpointed
    batch_id (dynamic partition overwrite — a replayed batch rewrites
    its own partial, so retries never double-count). The lifetime
    sketch is the elementwise SUM of the partials (CMS additivity makes
    the merge exact), read back with ``read_sketch``.

    This is the state-as-a-table pattern again (incremental_dedup_
    stream, stream_upsert_invoices): the accumulating state is depth x
    width counters per batch — bounded, compactable (sum old partials
    into one), shared by any consumer — rather than a query-private
    state store. Per-batch cost: one Arrow kernel over the batch's
    tokens; nothing corpus-proportional anywhere.
    """
    from ..operators.sketch import cms_build

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tokens = batch_df.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
        ).filter(F.col("token") != "")
        block = cms_build(tokens, "token", depth=depth, width=width)
        _write_batch_partial(
            spark.createDataFrame(
                [(bytes(block.tobytes()),)], "block binary"
            ),
            sketch_dir,
            batch_id,
        )

    return (
        docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_sketch(spark: SparkSession, sketch_dir: str, depth: int = 4, width: int = 2048):
    """Sum the per-batch CMS partials into the lifetime sketch. Batch
    partitions at or below the compacted watermark are EXCLUDED —
    their counts already live in the compacted block, and summing a
    resurrected replayed partition twice would inflate every estimate
    (the non-idempotent-merge read rule; see _read_excluding_folded
    for the reader-vs-compactor race contract)."""
    import numpy as np

    df = _read_excluding_folded(spark, sketch_dir)
    out = np.zeros((depth, width), dtype=np.int64)
    for row in df.select("block").collect():
        out += np.frombuffer(row["block"], dtype=np.int64).reshape(depth, width)
    return out


def compact_sketch(
    spark: SparkSession, sketch_dir: str, upto_batch_id: int | None = None
) -> int | None:
    """Fold closed CMS batch partials into a compacted
    generation — the count-min instance of the shared compaction
    protocol (_compact_partials): fold + watermark commit atomically
    (the watermark is the generation partition's NAME), reads exclude
    folded partitions, resurrected pre-watermark partitions are
    reclaimed.
    State converges to ONE depth x width block + open batches
    regardless of stream lifetime."""
    import numpy as np

    def merge(df: DataFrame) -> list[tuple]:
        merged = None
        for row in df.select("block").collect():
            block = np.frombuffer(row["block"], dtype=np.int64)
            merged = block.copy() if merged is None else merged + block
        return [] if merged is None else [(bytes(merged.tobytes()),)]

    return _compact_partials(
        spark, sketch_dir, upto_batch_id, merge, "block binary"
    )


def distinct_sketch_stream(
    items_stream: DataFrame,
    registers_dir: str,
    checkpoint_dir: str,
    item_col: str = "text",
    m: int = 1024,
):
    """Streaming corpus-lifetime DISTINCT count in bounded memory — the
    HLL sibling of token_frequency_sketch_stream: each microbatch
    builds a portable-HLL register PARTIAL (operators/sketch.py:
    hll_registers, <= m rows) and writes it to ``registers_dir``
    partitioned by the checkpointed batch_id (dynamic partition
    overwrite — a replayed batch rewrites ITS OWN partial, so retries
    never perturb the merge; max() would mask double-writes anyway,
    but the partition contract keeps the state table canonical).

    The lifetime register table is the groupBy-max merge of all
    partials (HLL registers merge EXACTLY — max is associative,
    commutative, idempotent, which also makes this sketch immune to
    at-least-once duplication end to end). read_registers folds the
    partials; operators/sketch.py:hll_estimate turns the fold into
    the count. Per-batch cost: one hash agg over the batch; state is
    n_batches x m rows, compactable to m by one merge."""
    from ..operators.sketch import hll_registers

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_partial(
            hll_registers(batch_df, item_col, m=m),
            registers_dir,
            batch_id,
        )

    return (
        items_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def compacted_generation_id(mark: int) -> int:
    """Partition id of the compacted GENERATION whose watermark is
    ``mark``: -(mark + 2), so the watermark is encoded in the partition
    NAME — committed atomically with the partition's own existence
    (streaming batch ids are non-negative, so generations can never
    collide with live batches; -1 is skipped so a legacy reserved
    partition can never read as mark=-1)."""
    return -(mark + 2)


def _registers_fs(spark: SparkSession, registers_dir: str):
    """Hadoop FileSystem handle + Path for the register table — works
    on any configured FS (local in tests, HDFS/object store at scale),
    which is why this uses the JVM FS API and not os/pathlib."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(registers_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path, jvm


def _dir_has_visible_file(fs, status) -> bool:
    """True if the partition directory contains at least one
    non-hidden file — the same visibility rule Spark's file index
    applies. A batch_id dir WITHOUT visible files is invisible to
    every reader (file-based listing) but WOULD be seen by a naive
    directory-based discovery; classifying such a dir as a real
    generation lets a crashed write (dir created, file never moved)
    SPOOF the watermark and reclaim unfolded live batches (round-10
    review/test catch), so generation discovery must apply the
    file-visibility rule too."""
    for child in fs.listStatus(status.getPath()):
        n = child.getPath().getName()
        if not n.startswith(".") and not n.startswith("_"):
            return True
    return False


def _gens_watermark(gens: list[int]) -> int | None:
    """Decode a generation-id list to the folded watermark (the NAME
    encoding: gid = -(mark+2), newest = most negative) — the ONE copy
    of the decode, shared by compaction_watermark and the rebuild
    (round-13 second-pass review: three inline copies had appeared)."""
    return None if not gens else -min(gens) - 2


def compaction_watermark(spark: SparkSession, registers_dir: str) -> int | None:
    """Highest batch_id folded into a compacted generation, or None if
    no compaction has run — decoded from the newest (most negative)
    generation partition's NAME, never from file contents or a stamp
    file, so there is no partially-written state to misread. Empty
    generation dirs (a crashed write's debris — invisible to readers)
    are ignored: discovery is the shared reader-view listing
    (`_visible_batch_ids`)."""
    return _gens_watermark(_visible_batch_ids(spark, registers_dir)[1])


def compact_registers(
    spark: SparkSession, registers_dir: str, upto_batch_id: int | None = None
) -> int | None:
    """Fold closed per-batch HLL partials into ONE lifetime partial
    (round-7 VERDICT #5): the state table written by
    distinct_sketch_stream grows n_batches x m rows; this folds every
    batch partition with batch_id <= ``upto_batch_id`` (default: all
    but the highest live batch, which may still be un-committed in the
    stream's checkpoint) into a compacted GENERATION partition and
    deletes the folded partitions, returning the new watermark.
    Protocol, crash-windows, and generation mechanics live in the
    shared _compact_partials; only the merge — groupBy-max per
    (bucket, hll_m), exact by register-max idempotence — is
    HLL-specific. The fold's result is collected through the driver on
    purpose: it is bounded at m rows per distinct hll_m stamp (the
    sketch size — state, not data)."""

    def merge(df: DataFrame) -> list:
        return (
            df.groupBy("bucket", "hll_m")
            .agg(F.max("max_rank").alias("max_rank"))
            .select("bucket", "max_rank", "hll_m")
            .collect()
        )

    return _compact_partials(
        spark,
        registers_dir,
        upto_batch_id,
        merge,
        "bucket bigint, max_rank int, hll_m int",
    )


def read_registers(spark: SparkSession, registers_dir: str) -> DataFrame:
    """Fold the per-batch HLL partials into the lifetime register
    table (bucket, max_rank, hll_m). Reads through
    _read_excluding_folded like every compactable state table — for
    HLL the max-merge would tolerate double-folding a resurrected
    partition anyway, but the shared read also protects against the
    subtler hazard of MISSING state mid-compaction (generation
    visibility, see _read_excluding_folded). Grouping includes the
    stamped hll_m on purpose: partials written under different m
    values are incompatible, and folding them apart (duplicate
    buckets) lets hll_estimate's in-plan guard raise instead of
    silently merging."""
    return (
        _read_excluding_folded(spark, registers_dir)
        .groupBy("bucket", "hll_m")
        .agg(F.max("max_rank").alias("max_rank"))
        .select("bucket", "max_rank", "hll_m")  # hll_registers' layout
    )


# ---------------------------------------------------------------------------
# Time-grain continuous aggregate (streaming twin of the batch rollup,
# plans/raw_ops.py:op_hll_rollup — round-11 VERDICT #5: the feed
# (register partials) and the batch rollup both existed; this composes
# them into the hypertable continuous-aggregate view)
# ---------------------------------------------------------------------------


def _timegrain_projection(batch_df: DataFrame, col: str, ts_col: str) -> DataFrame:
    """THE grain projection of the time-grain continuous aggregates —
    (col, day, hr) from the event timestamp — shared by the HLL and
    HDR feeds (fourth-pass round-12 review: a verbatim copy per stream
    would let a grain change desynchronize the two views' keys)."""
    return batch_df.select(
        F.col(col),
        F.to_date(ts_col).alias("day"),
        F.hour(ts_col).alias("hr"),
    )


def timegrain_sketch_stream(
    events_stream: DataFrame,
    registers_dir: str,
    checkpoint_dir: str,
    item_col: str = "user_id",
    ts_col: str = "ts",
    m: int = 1024,
):
    """Streaming feed of the time-grain HLL rollup: each microbatch
    builds per-(day, hour) register PARTIALS (operators/sketch.py:
    hll_registers with group_cols — the exact projection+agg the batch
    rollup runs on raw events) and writes them to ``registers_dir``
    partitioned by the checkpointed batch_id, the
    distinct_sketch_stream state contract with the grain keys riding
    alongside. State is bounded at n_batches x grains x m rows,
    compactable to grains x m by one merge; max-merge idempotence +
    the partition-overwrite replay contract make the feed immune to
    at-least-once duplication end to end."""
    from ..operators.sketch import hll_registers

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        ev = _timegrain_projection(batch_df, item_col, ts_col)
        _write_batch_partial(
            hll_registers(ev, item_col, m=m, group_cols=("day", "hr")),
            registers_dir,
            batch_id,
        )

    return (
        events_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_hourly_registers(spark: SparkSession, registers_dir: str) -> DataFrame:
    """Lifetime hourly register table (day, hr, bucket, max_rank,
    hll_m): the groupBy-max fold of the per-batch grain partials —
    hll_merge_registers IS the fold, so the merge law cannot drift
    from the batch rollup's. Reads through _read_excluding_folded like
    every compactable state table."""
    from ..operators.sketch import hll_merge_registers

    return hll_merge_registers(
        _read_excluding_folded(spark, registers_dir), group_cols=("day", "hr")
    )


def read_daily_distinct(
    spark: SparkSession, registers_dir: str, m: int = 1024
) -> DataFrame:
    """The continuous-aggregate VIEW (round-11 VERDICT #5): per-day
    distinct estimates derived from the streaming hourly register
    state by exactly the batch rollup's composition —
    hll_merge_registers to day grain, hll_estimate to price it
    (plans/raw_ops.py:op_hll_rollup) — so over the same closed rows
    the streaming view equals the batch rollup bit-for-bit: identical
    registers in (max-merge exactness), one shared integer-exact
    estimator out. Compaction leaves it invariant (generation folds
    preserve register maxima per grain). This is the hypertable
    pattern end to end: the stream persists the finest grain, every
    coarser grain is one map-side-combinable groupBy over
    register-bounded state, and the raw events are never re-scanned.
    Implementation is the shared `_distinct_grain_view` — ONE copy of
    the view law for every grain (fourth-pass round-13 review)."""
    return _distinct_grain_view(spark, registers_dir, "day", m=m)


def read_monthly_distinct(
    spark: SparkSession, registers_dir: str, m: int = 1024
) -> DataFrame:
    """The month grain of the SAME continuous aggregate (round 13):
    month = trunc(day, 'month') derived from the stored day key
    in-plan, then the identical law (`_distinct_grain_view`) — which is
    the whole hypertable claim: EVERY coarser grain is one
    map-side-combinable groupBy over the finest persisted grain, and
    the raw events are never re-scanned whether the caller wants
    hours, days, or months."""
    return _distinct_grain_view(
        spark, registers_dir, "month", key_expr=F.trunc(F.col("day"), "month"), m=m
    )


def _distinct_grain_view(
    spark: SparkSession,
    registers_dir: str,
    key: str,
    key_expr=None,
    m: int = 1024,
) -> DataFrame:
    """THE distinct-count grain view, one implementation for every
    grain (day, month, anything derivable from the stored keys via
    ``key_expr``): max-merge the persisted per-batch partials straight
    to the requested grain and price with the shared integer-exact
    estimator. Merging directly from the partials (not via the hourly
    view) is exact — max-merge is associative, so partials->grain
    equals partials->hourly->grain — and saves the intermediate
    (day, hr) shuffle a stacked composition would pay."""
    from ..operators.sketch import hll_estimate, hll_merge_registers

    regs = _read_excluding_folded(spark, registers_dir)
    if key_expr is not None:
        regs = regs.withColumn(key, key_expr)
    return hll_estimate(
        hll_merge_registers(regs, group_cols=(key,)), m=m, group_cols=(key,)
    )


def compact_timegrain_registers(
    spark: SparkSession,
    registers_dir: str,
    upto_batch_id: int | None = None,
) -> int | None:
    """Fold closed time-grain partials into a fresh generation via the
    shared protocol's distributed-merge path: grains x m rows is
    register-bounded per grain but NOT driver-bounded across a long
    retention window (years of days x 24 x m), so the merge stays a
    Spark job and the generation publishes by atomic directory rename
    (the compact_term_counts path), never a driver collect. The merge
    is hll_merge_registers — the same law as the readers'."""
    from ..operators.sketch import hll_merge_registers

    def merge(df: DataFrame) -> DataFrame:
        return hll_merge_registers(df, group_cols=("day", "hr"))

    return _compact_partials(
        spark,
        registers_dir,
        upto_batch_id,
        merge,
        "day date, hr int, bucket bigint, max_rank int, hll_m int",
        distributed_merge=True,
    )


def timegrain_quantile_stream(
    events_stream: DataFrame,
    registers_dir: str,
    checkpoint_dir: str,
    value_col: str,
    ts_col: str = "ts",
    sub_bits: int = 5,
):
    """The HDR (sum-merge) twin of timegrain_sketch_stream — the
    continuous aggregate for QUANTILES over time grains: each
    microbatch builds per-(day, hour) HDR register partials
    (operators/sketch.py:hdr_registers with group_cols, the batch
    rollup's own projection) under the per-batch partition contract.
    SUM merges are NOT idempotent (unlike HLL max), so replay safety
    rides entirely on the partition-overwrite contract and
    post-compaction resurrection on the read's exclusion — the same
    split of responsibilities as quantile_sketch_stream, with the
    grain keys riding alongside."""
    from ..operators.sketch import hdr_registers

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        ev = _timegrain_projection(batch_df, value_col, ts_col)
        _write_batch_partial(
            hdr_registers(ev, value_col, group_cols=["day", "hr"], sub_bits=sub_bits),
            registers_dir,
            batch_id,
        )

    return (
        events_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_hourly_hdr(spark: SparkSession, registers_dir: str) -> DataFrame:
    """Lifetime hourly HDR register table (day, hr, exp, sub, lb, ub,
    cnt, hdr_sub_bits): the sum-fold of the per-batch grain partials —
    hdr_merge_registers IS the fold, so the merge law cannot drift
    from the batch rollup's."""
    from ..operators.sketch import hdr_merge_registers

    return hdr_merge_registers(
        _read_excluding_folded(spark, registers_dir), group_cols=("day", "hr")
    )


def read_daily_quantiles(
    spark: SparkSession,
    registers_dir: str,
    qs: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """The quantile continuous-aggregate VIEW: per-day quantile bounds
    derived from the streaming hourly HDR state by exactly the batch
    rollup's composition — hdr_merge_registers to day grain,
    hdr_quantiles to price it — so over the same closed rows the
    streaming view equals the batch rollup bit-for-bit (integer bucket
    law, integer rank arithmetic: no float contract anywhere).
    Compaction leaves it invariant (generation folds preserve per-grain
    counts exactly). ``qs=None`` defers to hdr_quantiles' own default
    (fourth-pass round-12 review: a re-declared default here could
    silently drift from the batch operator's). Implementation is the
    shared `_quantile_grain_view` — one copy of the view law."""
    return _quantile_grain_view(spark, registers_dir, "day", qs=qs)


def read_monthly_quantiles(
    spark: SparkSession,
    registers_dir: str,
    qs: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """The month grain of the quantile continuous aggregate — the HDR
    (sum-merge) twin of read_monthly_distinct: month derived from the
    stored day key in-plan, then the shared `_quantile_grain_view`
    (integer bucket law + integer rank arithmetic — bit-exact
    cross-view, no float contract)."""
    return _quantile_grain_view(
        spark, registers_dir, "month", key_expr=F.trunc(F.col("day"), "month"), qs=qs
    )


def _quantile_grain_view(
    spark: SparkSession,
    registers_dir: str,
    key: str,
    key_expr=None,
    qs: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """THE quantile grain view, one implementation for every grain:
    sum-merge the persisted per-batch partials straight to the
    requested grain (associative, so partials->grain equals
    partials->hourly->grain, minus the intermediate shuffle) and price
    with the batch operator's own hdr_quantiles. ``qs=None`` defers to
    hdr_quantiles' own default so a re-declared default here can never
    drift from the batch operator's."""
    from ..operators.sketch import hdr_merge_registers, hdr_quantiles

    regs = _read_excluding_folded(spark, registers_dir)
    if key_expr is not None:
        regs = regs.withColumn(key, key_expr)
    grain_reg = hdr_merge_registers(regs, group_cols=(key,))
    if qs is None:
        return hdr_quantiles(grain_reg, [key])
    return hdr_quantiles(grain_reg, [key], qs=list(qs))


def compact_timegrain_hdr(
    spark: SparkSession,
    registers_dir: str,
    upto_batch_id: int | None = None,
) -> int | None:
    """Fold closed time-grain HDR partials into a fresh generation via
    the distributed-merge path (grains x buckets state is
    register-bounded per grain but not driver-bounded over a retention
    window); the merge is hdr_merge_registers — the readers' own fold.
    Resurrected partitions after a fold would DOUBLE-COUNT under sum
    (unlike HLL max), which is exactly why every read goes through
    _read_excluding_folded's exclusion."""
    from ..operators.sketch import hdr_merge_registers

    def merge(df: DataFrame) -> DataFrame:
        return hdr_merge_registers(df, group_cols=("day", "hr"))

    return _compact_partials(
        spark,
        registers_dir,
        upto_batch_id,
        merge,
        "day date, hr int, exp int, sub int, lb bigint, ub bigint, "
        "cnt bigint, hdr_sub_bits int",
        distributed_merge=True,
    )


# ---------------------------------------------------------------------------
# Streaming ANN ingest (round 12): a DELTA feed for the persisted IVF-SQ8
# serving table, so newly-arriving vectors become searchable without an
# index rebuild — the freshness half of the serving story
# ---------------------------------------------------------------------------


def ann_delta_stream(
    vectors_stream: DataFrame,
    delta_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming ingest into the quantized ANN serving tier: each
    microbatch of NEW vectors is cluster-assigned and SQ-8 encoded
    against the ``centroids`` the BASE serving table was built with
    (operators/similarity.py:ivf_sq8_serving_table — the same batch
    builder, per microbatch) and appended to ``delta_dir`` under the
    per-batch partition contract. Probes then search base + delta
    (``read_ann_delta`` unioned onto the bucketed base table) so fresh
    vectors are visible within one microbatch while the expensive
    compacted layout stays immutable — the standard serving split
    (immutable bucketed segment + small append log), with the periodic
    full rebuild being a new base cache build.

    Centroids MUST be the published base cache's (raw_ops.py:
    _sq8_serving_cached metadata): encoding against privately
    recomputed centroids would assign probes inconsistently with the
    stored cluster column — the cache's cross-process-consistency
    contract, restated here because the stream is the one writer that
    runs outside the cache build. Rows are deterministic given
    (vector, centroids), so a replayed batch rewrites ITS OWN partition
    with identical content (the dynamic-overwrite replay contract).
    Append-only by contract: ingest NEW ids — updating an existing id
    leaves both rows searchable until the next base rebuild."""
    from ..operators.similarity import ivf_sq8_serving_table

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_partial(
            ivf_sq8_serving_table(
                batch_df, centroids, id_col=id_col, vec_col=vec_col
            ),
            delta_dir,
            batch_id,
        )

    return (
        vectors_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def pq_delta_stream(
    vectors_stream: DataFrame,
    delta_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The PQ-tier twin of ann_delta_stream — freshness for the
    deepest-compression serving table: each microbatch is
    cluster-assigned against the base cache's pinned ``centroids`` AND
    PQ-encoded against its pinned ``codebooks``
    (operators/similarity.py:pq_serving_table, the batch builder per
    microbatch), appended as a (match_id, cluster, codes) delta that
    read_pq_delta unions onto the bucketed base for ivf_pq_topk's
    ``serving=``. The cross-process-consistency contract is DOUBLED
    here, exactly like the PQ cache's: codes encoded against privately
    recomputed codebooks would be scored by a mismatched query-side
    lookup table — silently costing recall, never erroring — so BOTH
    tiers of the codebook metadata must come from the published base
    cache. Same determinism/replay/append-only contract as the SQ8
    delta."""
    from ..operators.similarity import pq_serving_table

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_partial(
            pq_serving_table(
                batch_df, centroids, codebooks, id_col=id_col, vec_col=vec_col
            ),
            delta_dir,
            batch_id,
        )

    return (
        vectors_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


# The two delta-segment row schemas, pinned once: the read path's
# empty-segment frames, the compaction protocol's published-generation
# schema, and the rebuild's collapse/cast all derive from these.
_ANN_DELTA_SCHEMA = "match_id bigint, cluster int, q_scale double, qvec array<tinyint>"
_PQ_DELTA_SCHEMA = "match_id bigint, cluster int, codes array<tinyint>"


def _schema_cols(schema: str) -> tuple[str, ...]:
    """Column names of a FLAT DDL schema string (no struct/map fields —
    true of both delta schemas above), split driver-side so the
    per-probe read path never builds a throwaway empty DataFrame just
    to recover constant names (round-13 review)."""
    return tuple(part.strip().split()[0] for part in schema.split(","))


def _visible_batch_ids(
    spark: SparkSession, state_dir: str
) -> tuple[list[int], list[int]]:
    """(live, generations) batch ids with at least one visible file —
    the READER's view of a batch-partitioned state dir, shared by the
    delta emptiness probe and the rebuild's consumption snapshot.
    Deliberately NOT _compact_partials' listing: that one is the
    MAINTENANCE view — it sweeps crashed-write debris (destructive) and
    counts visible-file-less live dirs toward its default upto, neither
    of which a read-only consumer should do; a rebuild's default-upto
    over this listing is strictly more conservative, which is the safe
    direction (it consumes less, never more)."""
    fs, root, _ = _registers_fs(spark, state_dir)
    live: list[int] = []
    gens: list[int] = []
    if not fs.exists(root):
        return live, gens
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("batch_id="):
            continue
        if not _dir_has_visible_file(fs, status):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        (gens if b < 0 else live).append(b)
    return live, gens


def _delta_has_batches(spark: SparkSession, delta_dir: str) -> bool:
    """True iff the delta dir holds at least one batch partition with a
    visible file — the emptiness probe behind the empty-segment read
    path (a fresh deployment before its first microbatch, or a segment
    just reset by a base rebuild: spark.read.parquet on a missing or
    file-less dir raises instead of returning the correct empty
    answer)."""
    live, gens = _visible_batch_ids(spark, delta_dir)
    return bool(live or gens)


def _consumed_floor_keep(floor: int):
    """Column predicate selecting delta rows NOT consumed by a base
    rebuild whose published watermark is ``floor``: live batches above
    the floor, and compacted generations whose name-encoded watermark
    (gid = -(mark+2)) is above it. A generation straddling the floor
    cannot arise under the protocol discipline (a rebuild always
    consumes the newest generation whole, so at publish time every
    generation's mark <= floor; compaction must not fold batches at or
    below a published-but-unreset floor — see resolve_serving)."""
    b = F.col("batch_id")
    return ((b >= 0) & (b > F.lit(int(floor)))) | (
        (b < 0) & ((-b - 2) > F.lit(int(floor)))
    )


def _cluster_keep(clusters: list[int]):
    """Column predicate for a probe's cluster IN-list (an EMPTY probe
    list keeps nothing) — one copy for the delta reader and the
    manifest's base-side prune (round-14 review: the expression had
    been duplicated inline and could drift)."""
    return (
        F.col("cluster").isin(sorted({int(c) for c in clusters}))
        if clusters
        else F.lit(False)
    )


def _read_delta_segment(
    spark: SparkSession,
    delta_dir: str,
    schema: str,
    clusters: list[int] | None,
    floor: int | None = None,
) -> DataFrame:
    """Shared delta-segment read (SQ8 and PQ tiers — one protocol, two
    column sets): generation-aware read, optional pre-dedup cluster
    prune (exact: a match_id has ONE cluster across duplicates),
    match_id dedup, column projection. A segment with no batches (fresh
    deployment, or just reset by a base rebuild) reads as EMPTY under
    the pinned ``schema`` rather than failing schema inference.
    ``floor``: exclude batches consumed by a base rebuild published at
    that watermark (`_consumed_floor_keep`) — the filter that lets a
    reader union a REBUILT base with a not-yet-reset delta without
    double-counting (the manifest cutover's during-window)."""
    columns = _schema_cols(schema)
    if not _delta_has_batches(spark, delta_dir):
        df = spark.createDataFrame([], schema + ", batch_id long")
    else:
        df = _read_excluding_folded(spark, delta_dir)
    if floor is not None:
        df = df.filter(_consumed_floor_keep(floor))
    if clusters is not None:
        df = df.filter(_cluster_keep(clusters))
    return df.dropDuplicates(["match_id"]).select(*columns)


def _compact_delta_segment(
    spark: SparkSession,
    delta_dir: str,
    upto_batch_id: int | None,
    schema: str,
    floor: int | None = None,
    manifest_dir: str | None = None,
    tier: str | None = None,
) -> int | None:
    """Shared delta compaction (distributed-merge generation; the
    merge is the readers' own match_id dedup — fold-then-read equals
    read, and deterministic encoding makes resurrected rows
    byte-identical to folded content).

    ``floor``/``manifest_dir``: the serving-split guard (second- and
    third-pass round-14 review). A compaction running between a base
    publish and its deferred reset would otherwise fold
    already-consumed batches into a generation whose name-encoded
    watermark sits ABOVE the floor — a generation the floor filter
    must keep whole, double-counting the consumed rows against the
    new base. With the floor known, the consumed partitions are first
    RESET here (`reset_consumed_delta` — safe: the published floor
    proves the base covers them; idempotent), so the fold sees only
    unconsumed batches. Prefer ``manifest_dir``: the floor is then
    read at FOLD time rather than by the caller earlier (a
    caller-read floor can go stale if a rebuild publishes in
    between). The residual exclusion is operational, not structural:
    compaction and rebuild are both maintenance FOLDS over the same
    state dir — run one maintenance writer at a time, the same rule
    the generation protocol already assumes for concurrent
    compactions.

    The merge also ENFORCES the append-only contract the any-pick dedup
    relies on (round-12 ADVICE): a match_id whose duplicate rows carry
    conflicting payloads — a caller re-ingested an existing id with a
    changed vector — makes pruned vs unpruned reads disagree and makes
    this fold a silent arbitrary pick, so it raises IN-PLAN
    (raise_error, the substring-search guard idiom) naming the id; the
    resolution is a base rebuild (`rebuild_ann_base`/`rebuild_pq_base`,
    which collapse to the LATEST batch by construction), not a fold.
    Under the contract the grouped max equals the old any-pick dedup
    row-for-row (all duplicates byte-identical)."""
    payload_cols = [c for c in _schema_cols(schema) if c != "match_id"]

    def merge(df: DataFrame) -> DataFrame:
        payload = F.struct(*[F.col(c) for c in payload_cols])
        return (
            df.groupBy("match_id")
            .agg(
                F.max(payload).alias("__p"),
                F.count_distinct(payload).alias("__v"),
            )
            .select(
                F.when(
                    F.col("__v") > 1,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "delta compaction: conflicting encoded rows "
                                "for match_id "
                            ),
                            F.col("match_id").cast("string"),
                            F.lit(
                                " — re-ingesting an existing id violates the "
                                "delta's append-only contract; resolve with a "
                                "base rebuild (latest batch wins there), "
                                "not a fold"
                            ),
                        )
                    ).cast("bigint"),
                )
                .otherwise(F.col("match_id"))
                .alias("match_id"),
                *[F.col(f"__p.{c}").alias(c) for c in payload_cols],
            )
        )

    if manifest_dir is not None:
        snap = _read_serving_snapshot(manifest_dir)
        if snap is not None:
            # adopt the floor ONLY from the manifest that serves THIS
            # delta — a foreign floor would delete unconsumed batches
            # (fourth-pass round-14 review)
            _require_manifest_lineage(snap, manifest_dir, delta_dir, tier)
            floor = int(snap["floor"]) if floor is None else max(
                int(floor), int(snap["floor"])
            )
    if floor is not None:
        reset_consumed_delta(spark, delta_dir, floor)
    return _compact_partials(
        spark, delta_dir, upto_batch_id, merge, schema, distributed_merge=True
    )


def read_pq_delta(
    spark: SparkSession,
    delta_dir: str,
    clusters: list[int] | None = None,
    floor: int | None = None,
) -> DataFrame:
    """The live PQ delta segment (match_id, cluster, codes) — union
    onto the bucketed PQ base table for ivf_pq_topk's ``serving=``;
    the ``clusters`` prune, ``floor`` exclusion, and dedup semantics
    are read_ann_delta's (shared `_read_delta_segment`)."""
    return _read_delta_segment(spark, delta_dir, _PQ_DELTA_SCHEMA, clusters, floor)


def compact_pq_delta(
    spark: SparkSession,
    delta_dir: str,
    upto_batch_id: int | None = None,
    floor: int | None = None,
    manifest_dir: str | None = None,
) -> int | None:
    """Fold closed PQ delta batches (shared `_compact_delta_segment`;
    ``floor``/``manifest_dir`` as compact_ann_delta's)."""
    return _compact_delta_segment(
        spark, delta_dir, upto_batch_id, _PQ_DELTA_SCHEMA, floor,
        manifest_dir, "pq",
    )


def read_ann_delta(
    spark: SparkSession,
    delta_dir: str,
    clusters: list[int] | None = None,
    floor: int | None = None,
) -> DataFrame:
    """The live delta segment: (match_id, cluster, q_scale, qvec) —
    union it onto the bucketed base serving table and pass the result
    as ``serving=`` to ivf_sq8_topk. Reads under the generation
    protocol and dedups by match_id: a resurrected partition after
    compaction re-introduces rows byte-identical to the folded ones
    (deterministic encoding), so any-pick dedup is exact, and duplicate
    candidates would otherwise be scored twice per query — harmless for
    scores but able to eject a true neighbor from a top-m window.

    ``clusters``: pass the probe's cluster list (the same one the
    literal-probe path pushes into the base table) to prune the delta
    scan HERE, before the dedup — the probe's own serving filter stops
    at the dedup's aggregate boundary and cannot reach this reader's
    parquet scan (round-12 third-pass review verified the optimized
    plan keeps the IN-filter above the dedup), so a probe over a large
    un-compacted delta would otherwise scan and shuffle the whole
    segment per request. Filtering before the dedup is exact: a
    match_id has ONE cluster value across all its duplicate rows
    (deterministic encoding against pinned centroids), so pre- and
    post-dedup filtering select the same match_ids.

    ``floor``: exclude batches a base rebuild published at that
    watermark already folded (`_consumed_floor_keep`) — pass the
    serving manifest's floor when unioning onto a REBUILT base whose
    consumed delta partitions have not been reset yet (the
    publish-then-reset two-step; `resolve_serving` does this
    automatically)."""
    return _read_delta_segment(spark, delta_dir, _ANN_DELTA_SCHEMA, clusters, floor)


def compact_ann_delta(
    spark: SparkSession,
    delta_dir: str,
    upto_batch_id: int | None = None,
    floor: int | None = None,
    manifest_dir: str | None = None,
) -> int | None:
    """Fold closed delta batches into one generation via the shared
    protocol's distributed-merge path (vector state is corpus-sized,
    never driver-bounded) — see `_compact_delta_segment`: the merge is
    the reader's own match_id-dedup, so fold-then-read equals read.
    When this delta serves through a manifest, pass ``manifest_dir``
    (preferred — the floor is read at fold time) or the floor itself:
    consumed partitions are reset before the fold so the generation
    cannot straddle the serving floor."""
    return _compact_delta_segment(
        spark, delta_dir, upto_batch_id, _ANN_DELTA_SCHEMA, floor,
        manifest_dir, "sq8",
    )


def _consumption_window(
    live: list[int], gens: list[int], upto_batch_id: int | None
) -> tuple[list[int], int | None, int | None]:
    """THE rebuild consumption rule, in one place (sixth-pass round-14
    review — `rebuild_from_manifest`'s skip guard must agree with the
    fold it guards, so both derive from this): default upto is
    all-but-the-highest live batch (compaction's mid-write safety);
    consumed = live batches in (generation watermark, upto]; the
    effective watermark is the max of consumed and the generation
    mark. Returns (consumed, upto_eff, mark)."""
    mark = _gens_watermark(gens)
    if upto_batch_id is None:
        upto_batch_id = max(live) - 1 if live else None
    consumed = sorted(
        b
        for b in live
        if upto_batch_id is not None
        and b <= upto_batch_id
        and (mark is None or b > mark)
    )
    upto_eff = max(
        ([consumed[-1]] if consumed else []) + ([mark] if mark is not None else []),
        default=None,
    )
    return consumed, upto_eff, mark


def _rebuild_base_segment(
    spark: SparkSession,
    base_serving: DataFrame,
    delta_dir: str,
    schema: str,
    pinned_meta: dict,
    meta_name: str,
    table: str,
    loc: str,
    upto_batch_id: int | None,
    reset_delta: bool,
    tier: str,
    manifest_dir: str | None,
):
    """The rebuild half of the serving split (round-12 VERDICT #1 — the
    delta's documented 'periodic full rebuild', implemented): fold the
    immutable base segment plus the delta's consumed batches into a
    FRESH bucketed base cache and reset the consumed delta partitions.
    Shared by both quantized tiers; public contracts on
    `rebuild_ann_base` / `rebuild_pq_base`.

    Collapse semantics — LATEST VECTOR WINS: rows are grouped by
    match_id and the maximum of (is_delta, batch_id, payload) is kept,
    so any delta row beats the base row for the same id (the delta is
    by definition newer than the base it was ingested against), a
    higher live batch beats a lower one, and a compacted generation
    (negative batch_id) loses to every live batch — exactly the fold
    order of ingest time. Under the append-only contract duplicates are
    byte-identical and the collapse is the readers' own dedup; for an
    UPDATED id (the contract violation compaction now rejects loudly)
    the latest distinguishable row wins deterministically — the payload
    tie-break makes even a violated same-batch pick stable. Note the
    compaction caveat: a fold that already any-picked conflicting rows
    has lost their ordering, which is WHY `_compact_delta_segment`
    refuses to fold conflicts — run the rebuild to resolve updates.

    Consumption mirrors compaction's visibility rules: the newest
    generation plus live batches in (watermark, ``upto_batch_id``];
    ``upto_batch_id`` defaults to all-but-the-highest live batch (the
    highest may be mid-write by a running stream) — pass it explicitly
    for an at-rest pipeline. Unconsumed batches stay in the delta, so a
    probe over (new base + remaining delta) is complete at every point.

    Publication is the atomic bucketed-cache protocol
    (plans/raw_ops.py:_bucketed_serving_table / _publish_cache_dir):
    ``loc``/``table`` must be FRESH per rebuild generation — base
    caches are immutable artifacts. A loc holding a NON-rebuild
    artifact is rejected via the rebuilt_upto marker; a loc holding a
    PRIOR rebuild generation is rejected when the delta has consumable
    batches beyond its published watermark (after completing that
    generation's reset, so an interrupted reset still converges); a
    re-run with nothing new to consume is the legitimate crash-rerun
    case and returns the published artifact. The consumed watermark
    is recorded IN the published metadata (``rebuilt_upto``), so the
    delta reset always deletes per the PUBLISHED artifact, never this
    process's snapshot: a crash between publish and reset, or a lost
    publication race, re-runs to the winner's exact deletions
    (convergent). Cutover discipline: a probe router must switch to
    (new base, remaining delta) BEFORE the reset deletes the consumed
    partitions; a reader still unioning the OLD base with the reset
    delta loses the consumed rows, and one unioning the NEW base with
    an un-reset delta would score consumed candidates twice (in-flight
    reads over deleted files fail loudly, the protocol's stated
    behavior). ``reset_delta`` therefore defaults to FALSE — the
    destructive step is the explicit opt-in (round-13 ADVICE):
    publish, cut the routers over, then `reset_consumed_delta`. With
    ``manifest_dir`` the whole discipline is mechanized (round-13
    VERDICT #1): the serving manifest is atomically repointed to
    (new base, floor=published watermark) BETWEEN publish and reset,
    so `resolve_serving` readers switch base and delta in one repoint
    and ``reset_delta=True`` is safe for them — the floor filter
    already excludes the partitions the reset will delete."""
    from ..plans.raw_ops import _bucketed_serving_table

    st = spark.createDataFrame([], schema).schema
    data_cols = [f.name for f in st.fields]
    payload_cols = [c for c in data_cols if c != "match_id"]

    live, gens = _visible_batch_ids(spark, delta_dir)
    explicit_upto = upto_batch_id is not None
    consumed, upto_eff, mark = _consumption_window(live, gens, upto_batch_id)

    def delta_frame() -> DataFrame:
        if mark is None and not consumed:
            return spark.createDataFrame([], schema + ", batch_id long")
        df = _read_excluding_folded(spark, delta_dir)
        keep = F.col("batch_id") < 0 if mark is not None else F.lit(False)
        if consumed:
            keep = keep | F.col("batch_id").isin(consumed)
        return df.filter(keep)

    def collapsed() -> DataFrame:
        b = base_serving.select(*data_cols).select(
            "*", F.lit(0).alias("__d"), F.lit(0).cast("long").alias("__b")
        )
        d = delta_frame().select(
            *data_cols,
            F.lit(1).alias("__d"),
            F.col("batch_id").cast("long").alias("__b"),
        )
        payload = [F.col(c) for c in payload_cols]
        return (
            b.unionByName(d)
            .groupBy("match_id")
            .agg(F.max(F.struct(F.col("__d"), F.col("__b"), *payload)).alias("__p"))
            .select(
                "match_id", *[F.col(f"__p.{c}").alias(c) for c in payload_cols]
            )
            .select(*[F.col(f.name).cast(f.dataType) for f in st.fields])
        )

    # ONE collapse execution for the two consumers (round-13 review:
    # build_meta's count and build_df's bucketed write each ran the
    # full union + corpus-wide groupBy shuffle — the rebuild's dominant
    # cost, paid twice), materialized LAZILY inside the build closures:
    # even constructing the collapse PLAN runs a small Spark job (the
    # delta read's generation discovery collects distinct batch ids),
    # so a cache hit in _bucketed_serving_table — which never invokes
    # the closures — must not touch it (second-pass round-13 review).
    holder: dict[str, DataFrame] = {}

    def cached_collapsed() -> DataFrame:
        if "df" not in holder:
            holder["df"] = collapsed().persist()
        return holder["df"]

    def build_meta() -> dict:
        # n rides in the metadata like the base caches' (downstream
        # re-rank budgets never re-count the table); rebuilt_upto is
        # the consumed-watermark record the reset below reads back
        return dict(
            pinned_meta,
            n=cached_collapsed().count(),
            rebuilt_upto=-1 if upto_eff is None else int(upto_eff),
        )

    try:
        serving, meta = _bucketed_serving_table(
            spark,
            table,
            loc,
            schema,  # the pinned schema string is valid column DDL
            lambda _meta: cached_collapsed(),
            build_meta,
            meta_name,
        )
    finally:
        if "df" in holder:
            holder["df"].unpersist()
    if "rebuilt_upto" not in meta:
        raise RuntimeError(
            f"rebuild target {loc} already holds a non-rebuild artifact "
            f"({meta_name} carries no rebuilt_upto watermark) — pass a "
            "fresh location per rebuild generation"
        )
    published = int(meta["rebuilt_upto"])
    # Stale-reuse guard (round-13 review: rebuilding into a loc that
    # already holds a PRIOR rebuild generation silently returned the
    # old artifact). Raised only for an EXPLICIT upto_batch_id beyond
    # the published watermark — the caller demanded folding through a
    # batch this artifact predates, which needs a fresh location. A
    # default-upto re-run returns the published artifact instead
    # (second-pass review: the documented publish-then-reset two-step
    # would otherwise raise spuriously when the stream appended batches
    # between the steps) — that is still CORRECT serving state: the
    # published base covers batches <= its watermark and everything
    # newer stays in the delta, complete though unfolded.
    eff = -1 if upto_eff is None else int(upto_eff)
    stale = explicit_upto and eff > published
    if manifest_dir is not None and not stale:
        # CUTOVER BEFORE DELETIONS: repoint the serving manifest to
        # (new base, remaining delta above the published floor) before
        # any consumed partition is deleted — a manifest-routed reader
        # (resolve_serving) therefore never unions the old base with a
        # reset delta (lost rows) nor the new base with an un-reset
        # one (the floor filter excludes consumed batches). This is
        # the atomic form of the docstring's manual cutover discipline
        # (round-13 VERDICT #1). Ordered AFTER the stale check so a
        # call that is about to fail never mutates serving state.
        # Repointed ONLY when this artifact strictly RAISES the floor
        # (third-pass round-14 review): a delayed crash re-run of an
        # OLDER generation, or a rebuild that consumed nothing (its
        # watermark -1 says nothing about what the INPUT base had
        # already folded), must leave the manifest exactly where it is
        # — the current snapshot already serves every row correctly,
        # and rolling it back could pair an old base with a delta
        # whose complement a newer reset deleted. Convergent no-op,
        # matching the cache's own crash-re-run semantics; a DIRECT
        # publish_ann_serving misuse still raises loudly there.
        cur = _read_serving_snapshot(manifest_dir)
        if cur is not None:
            # the skip path must apply the same lineage guard the
            # publish path does — a wrong-manifest rebuild would
            # otherwise skip silently and then reset partitions the
            # delta's REAL manifest still serves (fourth-pass review)
            _require_manifest_lineage(cur, manifest_dir, delta_dir, tier)
        if cur is None or published > int(cur["floor"]):
            publish_ann_serving(
                manifest_dir,
                tier=tier,
                table=table,
                loc=loc,
                delta_dir=delta_dir,
                floor=published,
            )
        elif published == int(cur["floor"]) and (
            cur["table"],
            cur["loc"],
        ) != (table, loc):
            # two DIFFERENT artifacts claiming one floor is ambiguous
            # serving state, not a crash re-run — fail loudly (the
            # pre-skip publish behavior; fourth-pass review: an
            # operator replacing a bad base at the same watermark must
            # hear that the manifest did NOT move, not get a success
            # that leaves readers on the bad base)
            raise RuntimeError(
                f"manifest {manifest_dir} already serves a DIFFERENT "
                f"base ({cur['loc']}) at floor {published} — equal-"
                "floor repoints are ambiguous; rebuild with a higher "
                "upto_batch_id (or repoint manually) to replace it"
            )
    if reset_delta and not (stale and manifest_dir is not None):
        # In the NON-manifest stale path the reset still runs before
        # the raise so an interrupted old-generation reset completes
        # (deletions are keyed to the PUBLISHED watermark either way);
        # in the manifest flow a stale call mutates nothing.
        reset_consumed_delta(spark, delta_dir, published)
    if stale:
        raise RuntimeError(
            f"rebuild target {loc} holds a prior rebuild generation "
            f"(consumed up to batch {published}) but upto_batch_id asks "
            f"to fold through batch {eff} — base caches are immutable: "
            "pass a fresh location/table per rebuild generation to fold "
            "the newer batches"
        )
    return serving, meta


def rebuild_ann_base(
    spark: SparkSession,
    base_serving: DataFrame,
    centroids: list[list[float]],
    delta_dir: str,
    loc: str,
    table: str,
    upto_batch_id: int | None = None,
    reset_delta: bool = False,
    manifest_dir: str | None = None,
):
    """Fold the SQ8 base segment + delta into a fresh bucketed base
    cache and reset the consumed delta — the steady-state answer
    `ann_delta_stream` documents (full semantics, crash convergence,
    and the router-cutover discipline on `_rebuild_base_segment`).
    ``centroids`` are RE-PINNED, not re-trained: every row (base and
    delta alike) was encoded against them, so the fold is a pure
    physical re-layout — probe(new base, empty delta) equals
    probe(old base, delta) row-for-row for append-only histories, and
    an updated id collapses to its latest vector's row. Re-training
    instead is a re-ENCODE of the corpus, i.e. a plain
    `_sq8_serving_cached`-style build over the collapsed vectors — a
    different (heavier) operation this fold deliberately is not.
    Returns (serving DataFrame, metadata) — the metadata is
    shape-compatible with the base cache's centroids.json (centroids +
    n), so downstream consumers need no rebuild awareness.
    ``manifest_dir``/``reset_delta``: the atomic cutover protocol —
    see `_rebuild_base_segment` (publish -> manifest repoint -> reset,
    in that order) and `resolve_serving`."""
    return _rebuild_base_segment(
        spark,
        base_serving,
        delta_dir,
        _ANN_DELTA_SCHEMA,
        {"centroids": centroids},
        "centroids.json",
        table,
        loc,
        upto_batch_id,
        reset_delta,
        "sq8",
        manifest_dir,
    )


def rebuild_pq_base(
    spark: SparkSession,
    base_serving: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    delta_dir: str,
    loc: str,
    table: str,
    upto_batch_id: int | None = None,
    reset_delta: bool = False,
    manifest_dir: str | None = None,
):
    """The PQ-tier rebuild twin (shared `_rebuild_base_segment`): both
    codebook tiers are RE-PINNED into the new cache's codebooks.json —
    the doubled cross-process-consistency contract rides the cutover
    unchanged, so probes and query-side LUTs against the rebuilt table
    keep scoring exactly the codes they were built for.
    ``manifest_dir``/``reset_delta``: the atomic cutover protocol —
    see `_rebuild_base_segment` and `resolve_serving`."""
    return _rebuild_base_segment(
        spark,
        base_serving,
        delta_dir,
        _PQ_DELTA_SCHEMA,
        {"centroids": centroids, "codebooks": codebooks},
        "codebooks.json",
        table,
        loc,
        upto_batch_id,
        reset_delta,
        "pq",
        manifest_dir,
    )


# ---------------------------------------------------------------------------
# ANN serving manifest: atomic (base, delta, floor) cutover + advisor
# ---------------------------------------------------------------------------

# tier -> (row schema, base-cache metadata file) — the two quantized
# serving tiers' pinned contracts, dispatched by the manifest
_SERVING_TIERS: dict[str, tuple[str, str]] = {
    "sq8": (_ANN_DELTA_SCHEMA, "centroids.json"),
    "pq": (_PQ_DELTA_SCHEMA, "codebooks.json"),
}


def reset_consumed_delta(spark: SparkSession, delta_dir: str, upto: int) -> int:
    """Delete delta partitions a published base rebuild already folded:
    live batches <= ``upto`` and generations whose name-encoded
    watermark is <= ``upto`` — the destructive half of the rebuild,
    factored out so the publish-then-reset two-step is a first-class
    protocol (round-13 ADVICE: the reset is now the explicit opt-in).
    ``upto`` MUST be the PUBLISHED artifact's ``rebuilt_upto`` (or the
    manifest's ``floor``), never a process-local snapshot — keyed to
    the winner, a crash re-run converges to the same deletions.
    Idempotent; returns the number of partitions deleted."""
    fs, _root, jvm = _registers_fs(spark, delta_dir)
    live, gens = _visible_batch_ids(spark, delta_dir)
    deleted = 0
    for b in live:
        if b <= upto:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{delta_dir}/batch_id={b}"), True)
            deleted += 1
    for g in gens:
        # a generation is consumed iff its encoded watermark is
        # (shared decode — the generation subsumes batches <= it)
        if _gens_watermark([g]) <= upto:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{delta_dir}/batch_id={g}"), True)
            deleted += 1
    return deleted


def _require_manifest_lineage(
    snap: dict, manifest_dir: str, delta_dir: str, tier: str
) -> None:
    """Refuse to act on a manifest that does not serve this (tier,
    delta lineage) — the guard `publish_ann_serving` applies on write,
    hoisted so every path that READS a floor to make destructive or
    skip decisions applies it too (fourth-pass round-14 review: a
    wrong manifest_dir handed to a compactor or rebuild would
    otherwise adopt a foreign floor and delete unconsumed
    partitions)."""
    if snap.get("tier") != tier or snap.get("delta_dir") != delta_dir:
        raise RuntimeError(
            f"manifest {manifest_dir} serves tier={snap.get('tier')} over "
            f"{snap.get('delta_dir')}, not tier={tier} over {delta_dir} — "
            "one manifest per (tier, delta lineage); pass the manifest "
            "that serves THIS delta"
        )


def _read_serving_snapshot(manifest_dir: str) -> dict | None:
    """The manifest's current snapshot dict, or None when no manifest
    exists yet — the ONE copy of the pointer-then-snapshot read
    (publish's monotonicity check, resolve_serving, and the advisor
    all go through it)."""
    import json as _json
    import os

    manifest = os.path.join(manifest_dir, MANIFEST)
    if not os.path.exists(manifest):
        return None
    with open(manifest) as fh:
        name = fh.read().strip()
    with open(os.path.join(manifest_dir, name)) as fh:
        return _json.load(fh)


def _require_serving_snapshot(manifest_dir: str) -> dict:
    """`_read_serving_snapshot` that RAISES on a missing manifest and
    validates the snapshot's tier — one copy of the error path
    (sixth-pass round-14 review: two inline raises had appeared, and
    the tier check applied to one reader but not the other)."""
    snap = _read_serving_snapshot(manifest_dir)
    if snap is None:
        raise FileNotFoundError(
            f"no serving manifest at {manifest_dir} — publish one with "
            "publish_ann_serving or rebuild_*_base(manifest_dir=...)"
        )
    if snap.get("tier") not in _SERVING_TIERS:
        raise ValueError(
            f"manifest {manifest_dir} names unknown serving tier "
            f"{snap.get('tier')!r} (expected sq8|pq)"
        )
    return snap


def publish_ann_serving(
    manifest_dir: str,
    *,
    tier: str,
    table: str,
    loc: str,
    delta_dir: str,
    floor: int,
) -> str:
    """Atomically repoint the ANN serving manifest to the pair
    (bucketed base cache at ``table``/``loc``, delta at ``delta_dir``
    above ``floor``) — the `stream_upsert_invoices` snapshot-manifest
    pattern applied to the serving split (round-13 VERDICT #1): the
    snapshot is an immutable JSON file, and `_MANIFEST` is repointed
    with one os.replace, so `resolve_serving` readers switch base AND
    delta floor in a single atomic step — never old-base/new-floor or
    new-base/old-floor. ``floor`` is the base's consumed watermark
    (``rebuilt_upto`` for a rebuilt cache; -1 for a bootstrap publish
    whose base consumed nothing). Returns the snapshot file name.
    At 100 TB the manifest lives beside the caches on the shared
    store; on an object store without atomic rename, swap the
    os.replace for a pointer object put — the snapshot files
    themselves are already immutable.

    MONOTONIC: a publish that would move the floor BACKWARDS — or
    sideways, to a different base at the same floor, or to a different
    tier/delta lineage entirely — is REFUSED (second-pass round-14
    review). Without this, a delayed crash re-run of an OLDER rebuild
    generation (whose cache-hit returns the old artifact with its old
    watermark) would repoint live serving back to a base whose
    consumed-batch complement a newer generation's reset has already
    deleted — rows silently vanish. A byte-identical re-publish (the
    legitimate crash re-run of the CURRENT generation) is idempotent
    and succeeds."""
    import json as _json
    import os
    import uuid

    if tier not in _SERVING_TIERS:
        raise ValueError(f"unknown serving tier {tier!r} (expected sq8|pq)")
    os.makedirs(manifest_dir, exist_ok=True)
    snap = {
        "tier": tier,
        "table": table,
        "loc": loc,
        "delta_dir": delta_dir,
        "floor": int(floor),
    }
    cur = _read_serving_snapshot(manifest_dir)
    if cur is not None and cur != snap:
        if cur["tier"] != tier or cur["delta_dir"] != delta_dir:
            raise RuntimeError(
                f"serving manifest {manifest_dir} already serves "
                f"tier={cur['tier']} over {cur['delta_dir']} — one "
                "manifest per (tier, delta lineage); use a fresh "
                "manifest_dir"
            )
        if int(floor) <= int(cur["floor"]):
            raise RuntimeError(
                f"refusing manifest rollback: current floor "
                f"{cur['floor']} (base {cur['loc']}), attempted floor "
                f"{floor} (base {loc}) — an older rebuild generation "
                "must not repoint live serving (its consumed-batch "
                "complement may already be reset); only a publish with "
                "a strictly higher floor can move the manifest"
            )
    name = f"serving_{uuid.uuid4().hex}.json"
    with open(os.path.join(manifest_dir, name), "w") as fh:
        _json.dump(snap, fh)
    tmp = os.path.join(manifest_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(name)
    os.replace(tmp, os.path.join(manifest_dir, MANIFEST))  # atomic repoint
    return name


@dataclass
class ServingView:
    """One consistent resolution of the ANN serving manifest: pass
    ``serving`` as the probe's ``serving=``; ``meta`` carries the base
    cache's pinned centroids/codebooks (and n) — the ONLY codebooks a
    probe may encode against (the cross-process-consistency
    contract)."""

    tier: str
    serving: DataFrame  # base ∪ floor-filtered delta
    base: DataFrame
    meta: dict
    floor: int
    snapshot: dict


def _resolve_serving_base(spark: SparkSession, snap: dict, manifest_dir: str):
    """The BASE half of a manifest resolution — (bucketed table, pinned
    metadata) for the snapshot's artifact, with refuse-builders (a
    manifest only ever names already-published caches). Shared by
    `resolve_serving` and `rebuild_from_manifest` so the maintenance
    path never pays the delta-side resolution it does not use
    (fifth-pass round-14 review). ``manifest_dir`` is for the error
    message only — an operator triaging a cron log across several
    deployments needs to know WHICH manifest is broken."""
    from ..plans.raw_ops import _bucketed_serving_table

    schema, meta_name = _SERVING_TIERS[snap["tier"]]

    def _refuse(*_a):
        raise RuntimeError(
            f"serving manifest {manifest_dir} points at an unpublished "
            f"base cache ({snap['loc']}) — manifests only ever name "
            "already-published artifacts"
        )

    return _bucketed_serving_table(
        spark, snap["table"], snap["loc"], schema, _refuse, _refuse, meta_name
    )


def resolve_serving(
    spark: SparkSession,
    manifest_dir: str,
    clusters: list[int] | None = None,
) -> ServingView:
    """Resolve the ANN serving manifest to a consistent
    (base, delta) union — the router entry of the cutover protocol
    (round-13 VERDICT #1). The base is the bucketed external table the
    snapshot names (registered on first touch, name/location binding
    verified — `plans.raw_ops._bucketed_serving_table` with builders
    that REFUSE to build: a manifest must only ever point at an
    already-published cache); the delta is read with the snapshot's
    ``floor`` excluding every batch the base already folded, so the
    union is complete and duplicate-free at EVERY point of a
    publish -> repoint -> reset sequence: before the repoint readers
    get (old base, full delta); after it, (new base, remaining delta)
    — whether or not the reset has run yet. ``clusters``: the probe's
    cluster IN-list, pushed into BOTH sides' scans (bucket pruning on
    the base, partition-file prune on the delta before its dedup).

    Protocol constraint, enforced at the compactor (second/third-pass
    round-14 review): a compaction folding batches at or below a
    published-but-unreset floor would create a generation straddling
    it, and the floor filter cannot split a generation's rows
    (`_consumed_floor_keep`) — so a serving deployment's compaction
    cron passes ``manifest_dir`` to `compact_*_delta`, which reads the
    floor at fold time and resets the consumed partitions BEFORE
    folding (safe by the published floor, idempotent). One maintenance
    writer at a time remains the operational rule — compaction and
    rebuild are both folds over the same state dir. The
    `rebuild_*_base(manifest_dir=..., reset_delta=True)` path leaves
    no window at all."""
    snap = _require_serving_snapshot(manifest_dir)
    tier = snap["tier"]
    schema, _meta_name = _SERVING_TIERS[tier]
    base, meta = _resolve_serving_base(spark, snap, manifest_dir)
    floor = int(snap["floor"])
    delta = _read_delta_segment(
        spark, snap["delta_dir"], schema, clusters, floor=floor
    )
    serving = base
    if clusters is not None:
        serving = serving.filter(_cluster_keep(clusters))
    return ServingView(
        tier=tier,
        serving=serving.unionByName(delta),
        base=base,
        meta=meta,
        floor=floor,
        snapshot=snap,
    )


def rebuild_from_manifest(
    spark: SparkSession,
    manifest_dir: str,
    loc: str,
    table: str,
    upto_batch_id: int | None = None,
    reset_delta: bool = True,
):
    """One-call maintenance fold for a manifest-routed deployment —
    the missing arc of the advisor loop (round 14): the advisor said
    "fold"; this reads EVERYTHING else from the manifest itself — the
    current base table, its pinned centroids/codebooks, the delta dir,
    the tier — rebuilds into the fresh (``loc``, ``table``), repoints,
    and resets, so a maintenance cron holds NO deployment state beyond
    the manifest_dir the probes already use:

        if ann_rebuild_advisor(spark, man)["recommend_rebuild"]:
            rebuild_from_manifest(spark, man, fresh_loc, fresh_table)

    ``reset_delta`` defaults True HERE (unlike the raw rebuilds): the
    manifest repoint precedes the reset inside the shared protocol, so
    manifest-routed readers — the only readers a manifest deployment
    has — are cut over before any deletion. All rebuild semantics
    (latest-vector-wins collapse, re-pinned codebooks, crash
    convergence, floor monotonicity, lineage guard) are the shared
    `_rebuild_base_segment` contract.

    Returns None — WITHOUT building anything — when the default
    consumption window holds nothing above the manifest floor
    (fifth-pass round-14 review): with exactly ONE pending batch, the
    shared default upto (all-but-highest, compaction's mid-write
    safety) excludes it, and blindly rebuilding would pay the full
    corpus fold only to publish an artifact that cannot advance the
    floor. A cron therefore never wedges and never orphans an
    artifact; an AT-REST caller who wants the newest batch folded
    passes ``upto_batch_id`` explicitly (the same rule as the raw
    rebuilds). Leftover consumed partitions from a crash between a
    previous repoint and its reset are cleaned here (keyed to the
    manifest floor) even when the fold itself is skipped."""
    snap = _require_serving_snapshot(manifest_dir)
    tier = snap["tier"]
    delta_dir = snap["delta_dir"]
    floor = int(snap["floor"])
    if upto_batch_id is None:
        # this listing + _rebuild_base_segment's own re-listing = two
        # delta-dir RPC listings per maintenance call — bounded,
        # per-cron (never per-probe), and the price of keeping the
        # guard and the fold on ONE consumption rule
        live, gens = _visible_batch_ids(spark, delta_dir)
        _consumed, upto_eff, _mark = _consumption_window(live, gens, None)
        if upto_eff is None or upto_eff <= floor:
            # the fold could not advance the floor — skip it entirely
            if reset_delta:
                # crash-recovery sweep: consumed-but-unreset leftovers
                # below the floor are safe to delete at any time
                reset_consumed_delta(spark, delta_dir, floor)
            return None
    base, meta = _resolve_serving_base(spark, snap, manifest_dir)
    if tier == "sq8":
        return rebuild_ann_base(
            spark,
            base,
            meta["centroids"],
            delta_dir,
            loc,
            table,
            upto_batch_id,
            reset_delta,
            manifest_dir,
        )
    return rebuild_pq_base(
        spark,
        base,
        meta["centroids"],
        meta["codebooks"],
        delta_dir,
        loc,
        table,
        upto_batch_id,
        reset_delta,
        manifest_dir,
    )


def ann_rebuild_advisor(
    spark: SparkSession,
    manifest_dir: str | None = None,
    *,
    base_loc: str | None = None,
    delta_dir: str | None = None,
    tier: str = "sq8",
    floor: int | None = None,
    target_share: float = 0.20,
    compact_at_batches: int = 8,
) -> dict:
    """Metadata-only rebuild trigger policy (round-13 VERDICT #2): read
    the base cache's pinned ``n`` and the delta's visible row count,
    compute the delta share of the serving corpus, and recommend a
    fold when it crosses ``target_share``. NOTHING here scans vector
    data: the base n comes from the published metadata JSON, and the
    delta count projects ONLY the batch_id partition column, so the
    parquet scan reads footers/row-group counts, not pages — listing +
    metadata, exactly what an operator cron can afford to run per
    minute. The default threshold is where the measured freshness
    curve starts to bite: the scale probe put the probe overhead at
    +12–35% once the delta share reaches ~20–25% (BASELINE.md r13), so
    folding at 20% keeps serving at-or-below that band.

    Inputs come from the serving manifest when ``manifest_dir`` is
    given (the operable path — base loc, delta dir, tier, and floor in
    one consistent snapshot), else from ``base_loc``/``delta_dir``
    explicitly. The delta count is the pre-dedup visible row count
    (duplicates from resurrected partitions inflate it slightly) — an
    upper bound is the right direction for a trigger.

    Also advises the CHEAPER maintenance op: ``recommend_compaction``
    fires when the unconsumed delta spans ``compact_at_batches`` or
    more fold units (live batches above the floor + the newest
    generation) — many small batch partitions tax every probe's delta
    listing and file-open cost even at a tiny row share, and the fold
    that fixes it is one generation write, far cheaper than a base
    rebuild. A cron applies whichever fires (rebuild subsumes
    compaction). Returns a dict: base_n, delta_rows, delta_batches,
    floor, delta_share, target_share, recommend_rebuild,
    recommend_compaction, compact_at_batches, reason."""
    import json as _json
    import os

    if manifest_dir is not None:
        snap = _require_serving_snapshot(manifest_dir)
        tier = snap["tier"]
        base_loc = snap["loc"]
        delta_dir = snap["delta_dir"]
        floor = int(snap["floor"]) if floor is None else floor
    if base_loc is None or delta_dir is None:
        raise ValueError("pass manifest_dir, or base_loc AND delta_dir")
    _schema, meta_name = _SERVING_TIERS[tier]
    with open(os.path.join(base_loc, meta_name)) as fh:
        base_n = int(_json.load(fh)["n"])

    live, gens = _visible_batch_ids(spark, delta_dir)
    mark = _gens_watermark(gens)
    n_batches = len([b for b in live if floor is None or b > floor])
    if mark is not None and (floor is None or mark > floor):
        n_batches += 1  # the newest generation counts as one fold unit
    # BOTH recommendations must be satisfiable by the default-window
    # maintenance op they trigger, or a cron spins forever on advice
    # the op then no-ops (sixth/seventh-pass round-14 review) — derive
    # from the ONE consumption rule both folds use: a compaction can
    # reduce units only if the default window holds a live batch above
    # mark and floor; a default rebuild advances the manifest only if
    # the effective watermark would exceed the floor
    consumed_dflt, upto_eff_dflt, _mark2 = _consumption_window(live, gens, None)
    n_foldable = sum(1 for b in consumed_dflt if floor is None or b > floor)
    rebuild_satisfiable = upto_eff_dflt is not None and (
        floor is None or upto_eff_dflt > floor
    )
    if not (live or gens):
        delta_rows = 0
    else:
        df = _read_excluding_folded(spark, delta_dir)
        if floor is not None:
            df = df.filter(_consumed_floor_keep(floor))
        # batch_id-only projection: partition column, footer-only scan
        delta_rows = df.select("batch_id").count()
    share = delta_rows / (base_n + delta_rows) if (base_n + delta_rows) else 0.0
    over_share = share >= target_share
    recommend = over_share and rebuild_satisfiable
    recommend_compact = (
        not recommend and n_batches >= compact_at_batches and n_foldable >= 1
    )
    if recommend:
        reason = (
            f"delta share {share:.1%} >= target {target_share:.0%}: fold "
            "the delta into a fresh base (rebuild_from_manifest) to "
            "reclaim the probe overhead"
        )
    elif over_share:
        reason = (
            f"delta share {share:.1%} >= target {target_share:.0%} but the "
            "default consumption window (all-but-highest, mid-write "
            "safety) cannot advance the floor — an AT-REST caller can "
            "fold the newest batch by passing upto_batch_id explicitly"
        )
    elif recommend_compact:
        reason = (
            f"{n_batches} fold units >= {compact_at_batches}: compact the "
            "delta (compact_*_delta) — per-probe listing/file-open cost, "
            "not row share, is the tax here"
        )
    else:
        reason = (
            f"delta share {share:.1%} < target {target_share:.0%} and "
            f"{n_batches} fold units < {compact_at_batches}: serving "
            "overhead within the measured band, no maintenance needed"
        )
    return {
        "base_n": base_n,
        "delta_rows": int(delta_rows),
        "delta_batches": n_batches,
        "floor": floor,
        "delta_share": round(share, 6),
        "target_share": target_share,
        "recommend_rebuild": recommend,
        "recommend_compaction": recommend_compact,
        "compact_at_batches": compact_at_batches,
        "reason": reason,
    }


# ---------------------------------------------------------------------------
# Streaming funnel (stateful twin of operators/events.py:funnel)
# ---------------------------------------------------------------------------

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("step", IntegerType()),
        StructField("step_name", StringType()),
        # NTZ: type-identical to the batch twin's threshold timestamps
        # (the canonical NTZ event time, sources/star.py)
        StructField("ts", TimestampNTZType()),
    ]
)

# (next stage index to reach, threshold ts of the last reached stage
# in epoch micros; meaningless until stage >= 1 — stage 0 has no
# previous threshold, so the kernel never consults thr_us there: an
# in-band "-1 means unset" sentinel would silently reject pre-1970
# timestamps the batch twin accepts)
_FUNNEL_STATE_SCHEMA = StructType(
    [StructField("stage", IntegerType()), StructField("thr_us", LongType())]
)


def make_funnel_fn(steps: list[str]):
    """Stateful kernel factory for the streaming funnel. State per user
    = (next stage to reach, threshold timestamp); each microbatch
    replays its rows in timestamp order and advances the state machine
    exactly as the batch operator's min-after-threshold recurrence —
    walking events in ascending ts, the FIRST step-i event strictly
    after the stage-(i-1) threshold IS min(ts > thr), so under
    in-order delivery (timestamp-ordered microbatches, the same
    contract as the other streaming twins here) the emitted
    transitions equal the batch funnel's thresholds row for row.
    Cross-batch late data cannot revise an already-advanced stage —
    that finality is the streaming trade, stated rather than hidden.
    """

    def _fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        rows = []
        for pdf in pdfs:
            # drop NULL timestamps up front: NaT.value is int64-min, so a
            # dirty stage-0 row would otherwise advance the state machine
            # with a garbage threshold (or raise OutOfBoundsDatetime) —
            # the batch twin skips NULL ts via min()'s null handling, and
            # the twins must agree on dirty data
            ts = pd.to_datetime(pdf["ts"])
            ok = ts.notna()
            for t, typ in zip(ts[ok], pdf["event_type"][ok]):
                rows.append((int(t.value // 1000), typ))
        if not rows:
            return
        # sort by ts only: a (ts, type) tuple sort would try to order a
        # NULL event_type against a string on timestamp ties (TypeError
        # in the worker), and the type can never break a tie anyway —
        # equal timestamps cannot advance the state machine under the
        # strict > rule
        rows.sort(key=lambda r: r[0])
        if state.exists:
            stage, thr_us = state.get
        else:
            stage, thr_us = 0, 0
        hits = []
        for ts_us, typ in rows:
            if stage >= len(steps):
                break
            if typ == steps[stage] and (stage == 0 or ts_us > thr_us):
                hits.append((stage, steps[stage], ts_us))
                thr_us = ts_us
                stage += 1
        state.update((stage, thr_us))
        if hits:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(hits),
                    "step": [h[0] for h in hits],
                    "step_name": [h[1] for h in hits],
                    "ts": [pd.Timestamp(h[2], unit="us") for h in hits],
                }
            )

    return _fn


def funnel_events_stream(events: DataFrame, steps: list[str]) -> DataFrame:
    """Custom stateful streaming operator #2: per-user funnel stage
    transitions as they happen, via applyInPandasWithState. Emits one
    row per (user, newly reached stage) with the stage's threshold
    timestamp; counting rows per step downstream reproduces the batch
    funnel's n_users. State size is O(active users) x 12 bytes — the
    stage index and one timestamp, no event buffering.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    return events.groupBy("user_id").applyInPandasWithState(
        make_funnel_fn(list(steps)),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quantile_sketch_stream(
    items_stream: DataFrame,
    registers_dir: str,
    checkpoint_dir: str,
    value_col: str,
    sub_bits: int = 5,
):
    """Streaming corpus-lifetime quantile telemetry in bounded memory —
    the HDR sibling of distinct_sketch_stream: each microbatch builds
    an hdr_registers PARTIAL (bounded at 64 * 2^sub_bits rows) over
    ``value_col`` (positive integers by hdr_registers' in-plan guard)
    and writes it under the checkpointed batch_id with dynamic
    partition overwrite. Unlike HLL registers, HDR partials merge by
    SUM — NOT idempotent — so correctness leans entirely on the
    partition contract: a replayed batch REPLACES its own partial,
    never adds a second copy, and read_hdr_registers excludes
    partitions already folded by compact_hdr_registers."""
    from ..operators.sketch import hdr_registers

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_partial(
            hdr_registers(batch_df, value_col, group_cols=[], sub_bits=sub_bits),
            registers_dir,
            batch_id,
        )

    return (
        items_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def _read_excluding_folded(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read a batch-partitioned state table under the GENERATION
    protocol: keep the newest compacted generation (most negative
    batch_id — its name encodes the highest watermark) plus the live
    batches above that watermark; exclude older generations (their
    contents are subsumed by the newest) and folded/resurrected
    batches (their contents live in a generation — for SUM merges,
    including them would double-count).

    Race contract (round-9 reviews #2 and #3): generation and data
    come from ONE spark.read, so both derive from the same resolved
    file-index snapshot, and a generation is a SINGLE file written to
    a FRESH partition id — it appears atomically and nothing existing
    is ever overwritten in place, so there is no delete-then-rename
    window in which prior folded history is invisible (the hazard of
    a fixed compacted-partition id under dynamic overwrite). A
    snapshot taken before a new generation lands still sees the old
    generation AND the yet-undeleted fold sources — complete either
    way; files deleted after the snapshot fail the read LOUDLY
    (retry) instead of silently dropping counts."""
    df = spark.read.parquet(state_dir)
    gens = [
        r[0]
        for r in df.select("batch_id")
        .filter(F.col("batch_id") < 0)
        .distinct()
        .collect()
    ]
    if not gens:
        return df
    newest = min(gens)
    mark = -newest - 2
    return df.filter(
        (F.col("batch_id") == newest) | (F.col("batch_id") > mark)
    )


def _compact_partials(
    spark: SparkSession,
    state_dir: str,
    upto_batch_id: int | None,
    merge,
    schema: str,
    distributed_merge: bool = False,
) -> int | None:
    """Shared compaction protocol for batch-partitioned sketch state
    tables (HLL max-merge, HDR/CMS sum-merge) — one implementation so
    a protocol fix can never land in one sketch family and miss
    another (round-9 review #5). ``merge`` folds a DataFrame of
    partials (newest generation + fold-eligible batches) to a bounded
    list of row tuples matching ``schema`` (WITHOUT batch_id — the
    protocol assigns the generation partition).

    Generations (round-9 review #3): each fold is written as ONE file
    into a FRESH partition batch_id = compacted_generation_id(mark) =
    -(mark+2). Nothing is ever overwritten in place, so readers never
    hit the delete-then-rename visibility window of a fixed compacted
    partition; the watermark rides in the partition NAME, atomic with
    the data. Steps, each crash-safe:

      1. reclaim resurrected batches at or below the current watermark
         (reads already exclude them);
      2. pick folds: live batches in (watermark, upto_batch_id];
         ``upto_batch_id`` must not exceed the stream's last COMMITTED
         batch (default: all but the highest live partition — correct
         for at-rest availableNow pipelines);
      3. write merge(newest generation + folds) into the NEW
         generation partition (coalesce(1): single file => atomic
         appearance);
      4. delete the folded batches, then the superseded generations —
         a crash mid-way leaves partitions every read already ignores,
         reclaimed by the next pass.

    Zero-readable-row folds (a crashed writer's empty partition dir)
    delete their dirs without writing a generation. Single concurrent
    compactor assumed, as with any table-maintenance job.

    ``distributed_merge=True`` (round 10): for state whose merged form
    is NOT driver-bounded (exact term counts — vocabulary-sized, vs
    the register tables' fixed m rows), ``merge`` returns a DataFrame
    instead of a row list, and the generation is published by writing
    the FULL distributed result to a dot-prefixed tmp dir inside
    ``state_dir`` (hidden from parquet readers) and then renaming the
    directory onto the generation partition path — POSIX/HDFS
    directory rename, atomic like the single-file appearance the
    driver-bounded path relies on, with no file-count limit. A crash
    before the rename leaves only a hidden tmp dir (swept by the next
    pass); a crash after it is the committed state.
    """
    fs, root, jvm = _registers_fs(spark, state_dir)
    if not fs.exists(root):
        return None
    live, gens = [], []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(".gen_tmp_"):
            # a crashed distributed-merge pass's unpublished tmp dir:
            # hidden from readers, safe to sweep (single compactor)
            fs.delete(st.getPath(), True)
            continue
        if name.startswith("batch_id="):
            try:
                b = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if b < 0 and not _dir_has_visible_file(fs, st):
                # a generation dir with NO visible file is a crashed
                # write's debris: readers (file-based listing) never
                # saw it, but counting it here would spoof the
                # watermark from its NAME and reclaim live batches
                # that were never folded — delete it instead
                # (round-10 review/test catch). Live (b >= 0) dirs
                # are left alone: the highest may be mid-write by the
                # stream, and an empty live dir contributes no rows.
                fs.delete(st.getPath(), True)
                continue
            (gens if b < 0 else live).append(b)
    mark = _gens_watermark(gens)
    newest_gen = min(gens) if gens else None
    if upto_batch_id is None:
        upto_batch_id = max(live) - 1 if live else None
    for b in (b for b in live if mark is not None and b <= mark):
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/batch_id={b}"), True)
    folds = sorted(
        b
        for b in live
        if upto_batch_id is not None
        and b <= upto_batch_id
        and (mark is None or b > mark)
    )
    if not folds:
        # still sweep superseded generations a crashed pass left behind
        for g in (g for g in gens if g != newest_gen):
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{state_dir}/batch_id={g}"), True
            )
        return mark
    new_mark = folds[-1] if mark is None else max(folds[-1], mark)
    src_ids = folds if newest_gen is None else [newest_gen] + folds
    src = spark.read.parquet(state_dir).filter(F.col("batch_id").isin(src_ids))
    if distributed_merge:
        # merge returns a DataFrame (vocabulary-sized state): publish
        # via hidden tmp dir + atomic DIRECTORY rename — any file
        # count, same all-or-nothing appearance as the single file.
        # Emptiness is tested on the SOURCE (limit-1 scan), not on the
        # merged aggregate — isEmpty() on the merge would run the full
        # vocabulary shuffle once and the write would rerun it (review
        # catch); a fold-style merge of non-empty partials is
        # non-empty by construction.
        import uuid as _uuid

        merged_rows = not src.isEmpty()
        if merged_rows:
            gid = compacted_generation_id(new_mark)
            dest = jvm.org.apache.hadoop.fs.Path(f"{state_dir}/batch_id={gid}")
            # rename onto an EXISTING directory would nest the tmp dir
            # inside it and return true (silent data loss — readers
            # filter dot-dirs, the generation looks empty, folds get
            # deleted); under the protocol a same-gid generation can
            # never exist (folds are all > mark, so new_mark > mark),
            # so an existing dest is a protocol violation — raise
            # BEFORE any write (review catch)
            if fs.exists(dest):
                raise RuntimeError(
                    f"compaction: generation {dest} already exists — "
                    "concurrent compactor or protocol violation"
                )
            # pin the published schema: select exactly the declared
            # columns (order + types) so a merge that leaks batch_id
            # (or drifts a type) can never publish a corrupt
            # generation; the protocol owns the partition column
            st = spark.createDataFrame([], schema).schema
            merged_df = merge(src).select(
                *[F.col(f.name).cast(f.dataType) for f in st.fields]
            )
            tmp = f"{state_dir}/.gen_tmp_{_uuid.uuid4().hex}"
            merged_df.write.mode("overwrite").parquet(tmp)
            if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dest):
                fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
                raise RuntimeError(
                    f"compaction: atomic publish rename to {dest} failed"
                )
    elif merged_rows := merge(src):
        (
            spark.createDataFrame(merged_rows, schema)
            .coalesce(1)
            .withColumn("batch_id", F.lit(compacted_generation_id(new_mark)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )
    if not merged_rows:
        # no readable rows anywhere: nothing to fold, watermark stays
        new_mark = mark
    for b in folds:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/batch_id={b}"), True)
    for g in gens:
        if merged_rows and g != compacted_generation_id(new_mark):
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{state_dir}/batch_id={g}"), True
            )
    return new_mark


def read_hdr_registers(spark: SparkSession, registers_dir: str) -> DataFrame:
    """Fold the per-batch HDR partials into the lifetime register
    table (exp, sub, lb, ub, cnt, hdr_sub_bits). Batch partitions at
    or below the compacted watermark are EXCLUDED — their counts
    already live in the compacted partial, and (SUM not being
    idempotent) folding a resurrected replayed partition twice would
    inflate counts; see _read_excluding_folded for the snapshot
    contract. Grouping includes hdr_sub_bits on purpose, the
    hll_m-guard pattern: partials under different sub_bits fold apart
    instead of silently merging."""
    return (
        _read_excluding_folded(spark, registers_dir)
        .groupBy("exp", "sub", "lb", "ub", "hdr_sub_bits")
        .agg(F.sum("cnt").alias("cnt"))
        .select("exp", "sub", "lb", "ub", "cnt", "hdr_sub_bits")
    )


def compact_hdr_registers(
    spark: SparkSession, registers_dir: str, upto_batch_id: int | None = None
) -> int | None:
    """Fold closed HDR batch partials into a compacted generation.
    SUM merge is NOT idempotent, so correctness rides entirely on the
    generation protocol (_compact_partials): the fold is a fresh
    single-file partition whose NAME is the watermark, reads take the
    newest generation + batches above it, folded/resurrected batches
    are excluded and reclaimed. Only the merge — the
    hdr_sub_bits-grouped SUM — is HDR-specific."""

    def merge(df: DataFrame) -> list:
        return (
            df.groupBy("exp", "sub", "lb", "ub", "hdr_sub_bits")
            .agg(F.sum("cnt").alias("cnt"))
            .select("exp", "sub", "lb", "ub", "cnt", "hdr_sub_bits")
            .collect()
        )

    return _compact_partials(
        spark,
        registers_dir,
        upto_batch_id,
        merge,
        "exp int, sub int, lb bigint, ub bigint, cnt bigint, hdr_sub_bits int",
    )


# ---------------------------------------------------------------------------
# Streaming KMV sample partials: the set-operation sketch joins the
# streaming state-table family (CMS counts, HLL distincts, HDR
# quantiles). Like the HLL registers — and unlike the SUM-merged HDR/
# CMS — the merge (k smallest distinct hash values of a union) is
# idempotent and order-free, so replayed or double-folded partials can
# never move the sample; the generation protocol is still shared so
# readers keep the same snapshot guarantees.
# ---------------------------------------------------------------------------


def overlap_sketch_stream(
    items_stream: DataFrame,
    samples_dir: str,
    checkpoint_dir: str,
    item_col: str = "text",
    k: int = 256,
):
    """Streaming corpus-lifetime KMV sample in bounded memory: each
    microbatch writes its own k-min sample partial
    (operators/sketch.py:kmv_sample, <= k rows) into ``samples_dir``
    partitioned by the checkpointed batch_id (dynamic partition
    overwrite — the replay contract every sketch state table here
    uses). The lifetime sample is the re-selection over all partials
    (read_kmv_sample); feed it to kmv_estimate for the running
    distinct count, or union two streams' folded samples into
    kmv_overlap for cross-corpus audience overlap — the question that
    motivates persisting SAMPLES instead of registers."""
    from ..operators.sketch import kmv_sample

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_partial(
            kmv_sample(batch_df, item_col, k=k),
            samples_dir,
            batch_id,
        )

    return (
        items_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def _kmv_reselect(df: DataFrame) -> DataFrame:
    """Fold KMV partials by union + re-selection: the k smallest
    DISTINCT hv per kmv_k stamp, re-ranked. Grouping by the stamped
    kmv_k is the hll_m-guard pattern — partials written under
    different k fold apart, and kmv_estimate's in-plan guard raises
    on the mismatch instead of a silent re-scale."""
    from pyspark.sql import Window

    w = Window.partitionBy("kmv_k").orderBy("hv")
    return (
        df.select("hv", "kmv_k")
        .distinct()
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= F.col("kmv_k"))
        .select("pos", "hv", "kmv_k")
    )


def read_kmv_sample(spark: SparkSession, samples_dir: str) -> DataFrame:
    """The lifetime KMV sample: re-selection over the newest
    generation + unfolded batch partials (_read_excluding_folded
    snapshot contract). Min-k-of-distinct is idempotent, so even a
    double-visible resurrected partition could not move the result —
    the shared read path is used for the same reason as the HLL's:
    one snapshot semantics for every state table."""
    return _kmv_reselect(_read_excluding_folded(spark, samples_dir))


def compact_kmv_sample(
    spark: SparkSession, samples_dir: str, upto_batch_id: int | None = None
) -> int | None:
    """Fold closed per-batch KMV partials into one generation partial
    (bounded at k rows per kmv_k stamp — state, not data). Protocol,
    crash windows, and generation mechanics in _compact_partials;
    only the merge (union + re-selection, exact by min-k idempotence)
    is KMV-specific."""

    def merge(df: DataFrame) -> list:
        return _kmv_reselect(df).collect()

    return _compact_partials(
        spark,
        samples_dir,
        upto_batch_id,
        merge,
        "pos int, hv bigint, kmv_k int",
    )


def term_count_stream(
    docs_stream: DataFrame,
    counts_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Streaming corpus-lifetime EXACT term counts — the text twin of
    the sketch partials, and the feed for running collocation / top-k
    term telemetry: each microbatch tokenizes JVM-side
    (text.tokens_expr — the same normalization the batch collocation
    and LM operators pin against DuckDB) and writes an exact
    (term, cnt) partial under the checkpointed batch_id with dynamic
    partition overwrite. Counts merge by SUM — NOT idempotent — so
    replay safety leans on the partition contract (a replayed batch
    REPLACES its own partial) exactly like the HDR/CMS partials.

    Unlike the register tables, the merged state here is
    VOCABULARY-sized, not fixed-size: compaction goes through the
    distributed-merge generation path (tmp dir + atomic directory
    rename), never a driver-side collect."""
    from ..operators.text import tokens_expr

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_count_partial(
            batch_df.select(F.explode(tokens_expr(text_col)).alias("term")),
            counts_dir,
            batch_id,
        )

    return (
        docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def _write_batch_partial(partial: DataFrame, state_dir: str, batch_id: int) -> None:
    """THE per-batch partial-write contract, in one place (round-12
    third-pass review: ten verbatim copies of this block had
    accumulated across the stream families, and the contract is
    load-bearing for replay safety): stamp the checkpointed batch_id
    and dynamic-partition-overwrite ONLY that partition, so a replayed
    batch rewrites ITS OWN partial and retries can never perturb a
    merge — every compactable state table (counts, registers, samples,
    MG summaries, ANN deltas) writes through this. (The incremental-
    dedup stream keeps its own two-sink variant: it writes verdicts AND
    a fingerprint table per batch, a different contract.)"""
    (
        partial.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(state_dir)
    )


def _write_count_partial(terms: DataFrame, counts_dir: str, batch_id: int) -> None:
    """One (term, cnt) partial under the checkpointed batch_id —
    dynamic partition overwrite, the replay contract shared by the
    unigram and bigram count streams."""
    _write_batch_partial(
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt")),
        counts_dir,
        batch_id,
    )


def bigram_count_stream(
    docs_stream: DataFrame,
    counts_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Streaming exact ADJACENT-BIGRAM counts — the second feed the
    collocation consumer needs (round-10 VERDICT #4). Each bigram is
    stored as the single string ``"w1 w2"``: tokens_expr tokens are
    whitespace-free by construction, so the one-space join is
    INJECTIVE, and the partials reuse the (term, cnt) state contract
    verbatim — read_term_counts, compact_term_counts, and the
    generation/debris protocol all work unchanged on the bigram dir.
    Counts stay UNFILTERED here (no min_count): a batch-local
    threshold would drop pairs that only clear it after merging —
    thresholds belong to the reader (collocations_from_counts).
    The pairing pass IS the batch operator's
    (text.adjacent_bigrams — one shared definition, round-11
    review)."""
    from ..operators.text import adjacent_bigrams

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        terms = adjacent_bigrams(batch_df, text_col).select(
            F.concat(F.col("w1"), F.lit(" "), F.col("w2")).alias("term")
        )
        _write_count_partial(terms, counts_dir, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_top_terms(spark: SparkSession, counts_dir: str, k: int = 10) -> DataFrame:
    """Heavy-hitters view over the exact term-count state: top-``k``
    terms by lifetime count, (cnt desc, term asc) total tie-break so
    the selected set is unique. TakeOrdered over the vocabulary-bounded
    folded counts; compaction-invariant because the folds preserve
    exact counts."""
    from pyspark.sql import Window

    top = (
        read_term_counts(spark, counts_dir)
        .orderBy(F.col("cnt").desc(), "term")
        .limit(k)
    )
    w = Window.orderBy(F.col("cnt").desc(), "term")
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def read_collocations(
    spark: SparkSession,
    unigram_dir: str,
    bigram_dir: str,
    min_count: int = 5,
    topk: int = 50,
) -> DataFrame:
    """The collocation consumer over the exact term-count state
    (round-10 VERDICT #4 — round 10 built the feed, this is the
    reader): lift-ranked collocation top-k computed from the unigram
    and bigram state tables through the SAME scoring formula as the
    batch operator (operators/text.py:collocations_from_counts), so
    over identical closed batches the streaming view equals
    text.collocation_topk bit-for-bit — integer counts in, one fixed
    float expression out — and compaction leaves it invariant (folds
    preserve exact counts). min_count applies here, at read time, on
    the MERGED counts."""
    from ..operators.text import collocations_from_counts

    uni = read_term_counts(spark, unigram_dir).select(
        F.col("term").alias("w"), F.col("cnt").alias("n_w")
    )
    bi = read_term_counts(spark, bigram_dir).select(
        F.split_part(F.col("term"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("term"), F.lit(" "), F.lit(2)).alias("w2"),
        F.col("cnt").alias("n_ab"),
    )
    return collocations_from_counts(uni, bi, min_count=min_count, topk=topk)


def read_term_counts(spark: SparkSession, counts_dir: str) -> DataFrame:
    """The lifetime term-count table: SUM over the newest generation +
    unfolded batch partials (one-snapshot _read_excluding_folded
    contract — SUM merges double-count resurrected partitions, so the
    exclusion is load-bearing, as with HDR/CMS)."""
    return (
        _read_excluding_folded(spark, counts_dir)
        .groupBy("term")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def compact_term_counts(
    spark: SparkSession,
    counts_dir: str,
    upto_batch_id: int | None = None,
) -> int | None:
    """Fold closed term-count partials into a fresh generation via the
    shared protocol's distributed-merge path: the merged vocabulary is
    written as a full Spark job to a hidden tmp dir and published by
    one atomic directory rename — no driver-side collect, no file-count
    limit, state converges to one generation + open batches."""

    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy("term").agg(F.sum("cnt").cast("long").alias("cnt"))

    return _compact_partials(
        spark,
        counts_dir,
        upto_batch_id,
        merge,
        "term string, cnt long",
        distributed_merge=True,
    )


def mg_summary_stream(
    docs_stream: DataFrame,
    summary_dir: str,
    checkpoint_dir: str,
    k: int = 30,
    text_col: str = "text",
):
    """Streaming corpus-lifetime heavy hitters in O(k) state — the
    bounded-memory twin of term_count_stream for corpora whose
    VOCABULARY is itself too big to keep exactly: each microbatch
    reduces its token stream to a Misra-Gries summary partial of at
    most k counter rows plus ONE NULL-term row carrying the batch's
    decrement total (its certified error contribution), stored under
    the checkpointed batch_id with dynamic partition overwrite.

    The partial is the batch's MG FIXED POINT: the per-Arrow-batch
    kernel summaries (operators/sketch.py:mg_partials) merge by
    counter sum, then re-truncate through the SAME algebra the kernel
    uses (sketch.mg_truncate — one shared definition, round-11
    review): the Agarwal et al. merge, so per-batch state is O(k) no
    matter how large the microbatch. The bounded merged frame
    (<= (k+1) rows per Arrow batch) folds driver-side like the CMS
    block partials — bounded sketch state, never corpus rows.

    Counts merge by SUM — NOT idempotent — so replay safety rides the
    batch_id partition-overwrite contract, and the state dir speaks
    the (term, cnt) protocol VERBATIM: compact_term_counts folds it
    (the NULL-term decrement rows sum into one NULL row per
    generation, exactly the budget algebra), read_mg_summary below
    reads it, and the generation/debris/watermark rules all apply
    unchanged.

    Guarantees at read time (summing partials keeps each one's):
    est <= true, true - est <= err_budget = sum of all decrements
    <= N/(k+1), and every term with true count > err_budget is
    present in the summary.
    """
    from ..operators.sketch import mg_partials, mg_truncate
    from ..operators.text import tokens_expr

    if k < 1:
        raise ValueError(f"mg_summary_stream requires k >= 1, got {k}")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        import pandas as pd

        spark = batch_df.sparkSession
        toks = batch_df.select(F.explode(tokens_expr(text_col)).alias("w"))
        merged = (
            mg_partials(toks, "w", k)
            .groupBy("item")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
        dec = sum(r["cnt"] for r in merged if r["item"] is None)
        counts = pd.Series(
            {r["item"]: r["cnt"] for r in merged if r["item"] is not None},
            dtype="int64",
        )
        kept, d2 = mg_truncate(counts, k)
        dec += d2
        rows = [(i, int(c)) for i, c in kept.items()] + [(None, dec)]
        _write_batch_partial(
            spark.createDataFrame(rows, "term string, cnt long"),
            summary_dir,
            batch_id,
        )

    return (
        docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_mg_summary(spark: SparkSession, summary_dir: str) -> DataFrame:
    """The lifetime Misra-Gries view: ``(item, est, err_budget)`` with
    the batch-operator guarantees (see mg_summary_stream). Rides
    read_term_counts' one-snapshot merge (the NULL-term group IS the
    summed decrement budget) and the SAME finalize split as the batch
    operator (operators/sketch.py:mg_finalize), so the streaming and
    batch decrement bookkeeping cannot drift. Compaction-invariant:
    folds preserve the exact counter and decrement sums."""
    from ..operators.sketch import mg_finalize

    return mg_finalize(
        read_term_counts(spark, summary_dir).select(
            F.col("term").alias("item"), "cnt"
        )
    )


def priority_sample_stream(
    rows_stream: DataFrame,
    samples_dir: str,
    checkpoint_dir: str,
    weight_col: str,
    key_col: str,
    k: int = 256,
    salt: str = "",
):
    """Streaming corpus-lifetime WEIGHTED sample in O(k) state: each
    microbatch stores its top-(k+1) priority rows
    (operators/curation.py:priority_sample — the DLT scheme whose
    priorities are row-local, so the union of per-batch top-(k+1)
    partials reproduces the whole-corpus sample EXACTLY; the merge
    law is proven in test_operators) as ``(key, ps_weight,
    ps_priority, ps_k)`` under the checkpointed batch_id. ``ps_k``
    stamps the stream's k into every row — the kmv_k / hll_m guard
    pattern: the reader raises on a k it cannot serve and the
    compactor re-truncates to the stamped bound, instead of either
    silently degrading (round-11 review). ``salt`` forwards to the
    batch operator so a release-salted batch draw is reproducible
    from the stream.

    Like the KMV sample — and unlike every SUM-merged state table —
    the fold is IDEMPOTENT: re-selection over distinct candidate rows,
    so a replayed batch, a double-visible resurrected partition, or a
    re-compaction can never move the sample. Keys must be unique
    corpus-wide (they are the identity the distinct dedups on — a key
    re-seen with a different weight is two corpus versions, which a
    sample cannot reconcile; re-sample per release instead).

    Consumers call ``read_priority_sample`` for the live sample with
    rank / tau / unbiased subset-sum estimates, joining payload
    columns back by key — the state table carries only the O(k)
    sampling identity, not document payloads.
    """
    from ..operators.curation import priority_sample

    if k < 1:
        raise ValueError(f"priority_sample_stream requires k >= 1, got {k}")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_partial(
            priority_sample(batch_df, weight_col, k + 1, key_col, salt=salt)
            .select(
                F.col(key_col).cast("string").alias("key"),
                "ps_weight",
                "ps_priority",
                F.lit(k).cast("int").alias("ps_k"),
            ),
            samples_dir,
            batch_id,
        )

    return (
        rows_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_priority_sample(spark: SparkSession, samples_dir: str, k: int) -> DataFrame:
    """The lifetime weighted sample: distinct candidate rows from the
    newest generation + unfolded batches (one-snapshot
    _read_excluding_folded contract), finalized through the SAME
    rank/tau/estimator algebra as the batch operator
    (operators/curation.py:priority_finalize — one definition, no
    drift), so over the same rows this equals priority_sample on the
    whole corpus bit-for-bit. ``k`` must be at most the stream's k:
    the partials only retain top-(k_stream+1) candidates. One honest
    edge: the state stores keys as STRINGS, so an EXACT priority tie
    (md5-prefix collision AND equal w/u ratio) would tie-break in
    string order where the batch operator uses the key's native
    order — selection-identical whenever priorities are distinct,
    which the md5-uniform makes overwhelming.

    ``k`` above any partial's stamped ps_k raises IN-PLAN (the
    kmv_estimate mismatch rule): those partials only retained their
    top-(ps_k+1), so a bigger selection would be silently wrong —
    missing candidates, a spoofed tau, biased estimates."""
    from ..operators.curation import priority_finalize

    if k < 1:
        raise ValueError(f"read_priority_sample requires k >= 1, got {k}")
    guarded = F.when(F.col("ps_k") >= k, F.col("ps_priority")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"read_priority_sample(k={k}) over partials that only "
                    "retained top-(ps_k+1) candidates, ps_k="
                ),
                F.col("ps_k").cast("string"),
            )
        ).cast("double")
    )
    cand = (
        _read_excluding_folded(spark, samples_dir)
        .select("key", "ps_weight", guarded.alias("ps_priority"))
        .distinct()
    )
    return priority_finalize(cand, k, "key")


def compact_priority_sample(
    spark: SparkSession,
    samples_dir: str,
    upto_batch_id: int | None = None,
) -> int | None:
    """Fold closed sample partials into a fresh generation via the
    shared protocol, RE-TRUNCATED to the stamped bound: the merge
    keeps the top-(K+1) distinct candidates where K = min(ps_k) over
    the fold (the binding constraint — reads above any partial's ps_k
    raise anyway), stamped back as the generation's ps_k. The
    generation therefore stays O(k) no matter how many batches fold
    (round-11 review: without the stamp the fold grew k+1 rows per
    batch forever), and truncation is exact by the merge law —
    finalize at any legal read-time k selects identically from the
    kept superset. Idempotent, so re-compaction and resurrected
    partitions cannot move the sample. The min(ps_k) is ONE bounded
    driver-side value read inside the compaction pass, the same
    budget class as the protocol's own partition listing."""

    def merge(df: DataFrame) -> DataFrame:
        row = df.agg(F.min("ps_k").alias("mn")).first()
        k_min = row["mn"] if row is not None else None
        if k_min is None:
            return df.select("key", "ps_weight", "ps_priority", "ps_k").limit(0)
        return (
            df.select("key", "ps_weight", "ps_priority")
            .distinct()
            .orderBy(F.desc("ps_priority"), F.col("key").asc())
            .limit(int(k_min) + 1)
            .withColumn("ps_k", F.lit(int(k_min)).cast("int"))
        )

    return _compact_partials(
        spark,
        samples_dir,
        upto_batch_id,
        merge,
        "key string, ps_weight double, ps_priority double, ps_k int",
        distributed_merge=True,
    )


def compact_mg_summary(
    spark: SparkSession,
    summary_dir: str,
    k: int,
    upto_batch_id: int | None = None,
) -> int | None:
    """Fold closed Misra-Gries partials into a fresh generation,
    RE-TRUNCATED to k counters — the bounded-state compactor for the
    mg_summary_stream dir (round-11 review: compact_term_counts folds
    the same dir exactly but by plain SUM, so its generation grows up
    to k+1 rows per folded batch; under topic drift that re-creates
    the vocabulary-scale state this sketch exists to avoid).

    The fold is one more MG merge step (the distributed form of
    sketch.mg_truncate — same algebra, pinned equivalent in tests):
    sum counters by term, d2 = the (k+1)-th largest merged counter
    (0 when <= k survive), keep count - d2 where positive, and add d2
    to the summed decrement budget. Agarwal et al.'s re-truncation
    law: this loosens only the SIZE bound, never the error — est may
    drop by d2 and err_budget grow by d2, but all four read-time
    guarantees survive, so the view is GUARANTEE-invariant rather
    than value-invariant. Choose per deployment: compact_term_counts
    when exact view stability matters, this when bounded state does.

    d2 derives from a TakeOrdered top-(k+1) frame (bounded driver
    traffic); the summed frame is lazily checkpointed so the fold's
    one vocabulary pass is not re-derived per consumer branch.
    """
    if k < 1:
        raise ValueError(f"compact_mg_summary requires k >= 1, got {k}")

    def merge(df: DataFrame) -> DataFrame:
        summed = (
            df.groupBy("term")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .localCheckpoint(eager=False)
        )
        nonnull = summed.filter(F.col("term").isNotNull())
        dec = summed.filter(F.col("term").isNull()).agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("d")
        )
        top = nonnull.orderBy(F.desc("cnt"), F.col("term").asc()).limit(k + 1)
        d2f = top.agg(
            F.when(F.count(F.lit(1)) == k + 1, F.min("cnt"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("d2")
        )
        kept = (
            nonnull.crossJoin(F.broadcast(d2f))
            .filter(F.col("cnt") > F.col("d2"))
            .select("term", (F.col("cnt") - F.col("d2")).cast("long").alias("cnt"))
        )
        dec_row = dec.crossJoin(F.broadcast(d2f)).select(
            F.lit(None).cast("string").alias("term"),
            (F.col("d") + F.col("d2")).cast("long").alias("cnt"),
        )
        return kept.unionByName(dec_row)

    return _compact_partials(
        spark,
        summary_dir,
        upto_batch_id,
        merge,
        "term string, cnt long",
        distributed_merge=True,
    )
