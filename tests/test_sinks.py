"""Sink tests (S3/S4/S5 write paths): partitioned fact write, overwrite
rebuild, partition pruning on read-back, keyset pagination."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from accounts_receivable_data_pipeline_api_spark.ar.ingest import DEFAULT_CSV, ingest, write_tables
from accounts_receivable_data_pipeline_api_spark.ar import queries as q


def test_write_tables_partitioned_and_pruned(spark, tmp_path):
    result = ingest(spark, DEFAULT_CSV)
    out = str(tmp_path / "warehouse")
    write_tables(result, out)

    # dim overwrite rebuild: second write replaces cleanly
    write_tables(result, out)

    customers = spark.read.parquet(f"{out}/customers")
    invoices = spark.read.parquet(f"{out}/invoices")
    assert customers.count() == 135
    assert invoices.count() == result.invoices.count()

    # month filter must prune to one hive partition
    pruned = invoices.filter(F.col("invoice_month") == "2024-11")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 143
    # partition pruning shows as a partition filter on the scan, and only
    # one of the ~20 month partitions is read
    n_files = pruned.select(F.input_file_name()).distinct().count()
    all_files = invoices.select(F.input_file_name()).distinct().count()
    assert n_files < all_files


def test_keyset_pagination_matches_offset(spark):
    result = ingest(spark, DEFAULT_CSV)
    as_of = date(2025, 3, 1)
    offset_page = q.past_due(
        result.invoices, result.customers, as_of, limit=10, offset=10
    ).items.collect()
    first_page = q.past_due(result.invoices, result.customers, as_of, limit=10).items.collect()
    last = first_page[-1]
    keyset_page = q.past_due_keyset(
        result.invoices,
        result.customers,
        as_of,
        after=(last["due_date"], last["invoice_number"]),
        limit=10,
    ).collect()
    assert [(r["invoice_number"], r["due_date"]) for r in keyset_page] == [
        (r["invoice_number"], r["due_date"]) for r in offset_page
    ]


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    from accounts_receivable_data_pipeline_api_spark.sources.bucketed import (
        colocated_join,
        write_bucketed,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    write_bucketed(orders, "b_orders", "o_custkey", num_buckets=8)
    write_bucketed(customer, "b_customer", "c_custkey", num_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ so the test exercises the bucketed (non-broadcast) path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(spark, "b_orders", "b_customer", "o_custkey", "c_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        plain = load_table(spark, sf_dir, "orders").join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


# ---------------------------------------------------------------------------
# Round-5 corpus I/O: JSONL source + WebDataset-style tar shards
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    from accounts_receivable_data_pipeline_api_spark.sources.corpus_io import (
        DOCUMENTS_JSONL_SCHEMA,
        read_jsonl,
        write_jsonl,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, DOCUMENTS_JSONL_SCHEMA).collect()
    # (collected first: Spark disallows queries referencing ONLY the
    # corrupt-record column, so corrupt accounting happens driver-side)
    assert sum(1 for r in back if r._corrupt_record is not None) == 0
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r)[:-1] for r in back}
    assert a == b  # lossless round-trip, text bytes included


def test_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    import os

    from accounts_receivable_data_pipeline_api_spark.sources.corpus_io import (
        DOCUMENTS_JSONL_SCHEMA,
        read_jsonl,
    )

    p = str(tmp_path / "mixed")
    os.makedirs(p)
    with open(f"{p}/part-0.json", "w") as f:
        f.write('{"doc_id": 1, "text": "good line", "lang": "en", "source": "web", "n_chars": 9}\n')
        f.write("this is not json\n")
        f.write('{"doc_id": 2, "text": "also good", "lang": "en", "source": "web", "n_chars": 9}\n')
    back = read_jsonl(spark, p, DOCUMENTS_JSONL_SCHEMA).collect()
    assert len(back) == 3
    assert sum(1 for r in back if r._corrupt_record is not None) == 1
    good = [r for r in back if r._corrupt_record is None]
    assert {r.doc_id for r in good} == {1, 2}


def test_tar_shards_roundtrip_in_training_order(spark, sf_dir, tmp_path):
    """shard_order -> write_tar_shards -> read_tar_shards: every doc
    comes back byte-identical, member order inside each tar IS the
    stamped training order, and shard bytes are reproducible."""
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        shard_order,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.corpus_io import (
        read_tar_shards,
        write_tar_shards,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sharded = shard_order(docs, "doc_id", n_shards=4, seed="io")
    out = str(tmp_path / "shards")
    manifest = {r.shard: r for r in write_tar_shards(sharded, out).collect()}
    assert set(manifest) == {0, 1, 2, 3}
    n_docs = docs.count()
    assert sum(m.n_members for m in manifest.values()) == n_docs

    back = read_tar_shards(spark, out).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(back) == n_docs
    for r in back:
        doc_id = int(r.member.split(".")[0])
        assert r.payload.decode("utf-8") == texts[doc_id], doc_id

    # member order within each tar == stamped training order
    import io as _io
    import tarfile as _tarfile

    order = {
        (r.shard, r.doc_id): r.shard_pos for r in sharded.collect()
    }
    for shard, m in manifest.items():
        with _tarfile.open(m.path) as tar:
            names = [int(n.split(".")[0]) for n in tar.getnames()]
        poss = [order[(shard, d)] for d in names]
        assert poss == sorted(poss), shard

    # reproducibility: a second write yields byte-identical shards
    out2 = str(tmp_path / "shards2")
    write_tar_shards(sharded, out2).collect()
    for shard, m in manifest.items():
        with open(m.path, "rb") as f1, open(
            m.path.replace(str(out), str(out2)), "rb"
        ) as f2:
            assert f1.read() == f2.read(), shard


def test_bucketed_point_lookup_prunes_to_one_bucket(spark, sf_dir):
    """The bucketed layout serves index-like point lookups: an equality
    filter on the bucket key must prune the scan to a single bucket
    (SelectedBucketsCount in the executed plan), the engine's answer to
    the reference's UNIQUE index at scale."""
    import re

    from accounts_receivable_data_pipeline_api_spark.sources.bucketed import (
        point_lookup,
        write_bucketed,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(customer, "pl_customer", "c_custkey", num_buckets=8)
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        df = point_lookup(spark, "pl_customer", "c_custkey", 7)
        # the lookup pins its pruned plan then restores the session conf
        # — no read-path side effect on other queries' plans
        assert (
            spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
            == prev
        )
        rows = df.collect()
        assert len(rows) == 1 and rows[0]["c_custkey"] == 7
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, plan
        assert m.group(1) == "1" and m.group(2) == "8"
    finally:
        spark.sql("DROP TABLE IF EXISTS pl_customer")


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC roundtrip preserves values exactly, and the re-read scan
    pushes filters + prunes columns into the stripe reader (the same
    plan properties the parquet scans are gated on)."""
    import re

    from accounts_receivable_data_pipeline_api_spark.sources.corpus_io import (
        read_orc,
        write_orc,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    a = sorted(docs.select("doc_id", "n_chars").collect())
    b = sorted(back.select("doc_id", "n_chars").collect())
    assert a == b

    pruned = back.filter(back.doc_id < 10).select("doc_id", "lang")
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert re.search(r"PushedFilters: \[[^\]]*doc_id", plan), plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and set(c.split(":")[0] for c in schemas[0].split(",")) == {
        "doc_id",
        "lang",
    }, plan
