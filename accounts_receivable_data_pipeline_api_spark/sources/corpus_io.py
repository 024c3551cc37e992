"""Training-corpus I/O: JSONL documents and WebDataset-style tar
shards — the interchange formats an LLM data pipeline actually speaks
on its edges (crawl deltas arrive as JSONL; data loaders consume tar
shards of ordered samples).

Schema discipline: every reader takes an EXPLICIT schema. Schema
inference on a JSON source is a full extra pass over the data before
the real scan (at 100 TB that doubles ingest cost), and worse, the
inferred types drift with the sample (a batch whose `doc_id`s happen to
fit in int32 infers a narrower column than yesterday's) — explicit
schemas make ingest deterministic and single-pass.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a corpus as line-delimited JSON (one doc per line), the
    crawl-interchange format. Plain ``df.write.json`` — each task
    writes its partition's part file, no driver involvement, and the
    text payload round-trips exactly (Spark's JSON writer escapes
    control characters and non-BMP codepoints losslessly)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read line-delimited JSON with an EXPLICIT schema (see module
    docstring for why inference is banned). ``columnNameOfCorruptRecord``
    quarantines malformed lines into ``_corrupt_record`` instead of
    silently nulling whole rows — the same quarantine-not-drop policy
    as the CSV ingest (ar/ingest.py)."""
    full = StructType(
        schema.fields + [StructField("_corrupt_record", StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


TAR_MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("path", StringType()),
        StructField("n_members", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

TAR_MEMBER_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("member", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize a sharded corpus as WebDataset-style tar files: one
    ``shard-NNNNN.tar`` per shard, members ordered by ``pos_col`` (the
    training order curation.shard_order stamped) and named
    ``{key}.txt``. Returns the manifest (shard, path, n_members,
    n_bytes) — an ACTION has already run when this returns; the files
    exist.

    Plan shape at 100 TB: one shuffle on the shard key, then each task
    writes ONE shard's members through a tarfile writer; no two tasks
    touch the same file. Task MEMORY IS O(SHARD): applyInPandas
    materializes the whole group as one pandas frame before the tar
    loop runs, so the shard-size dial (n_shards in shard_order) must
    keep shards inside an executor's memory budget — the same "a shard
    is the streaming unit" contract WebDataset loaders assume on the
    read side. (A constant-memory writer needs an iterator-based group
    API; Spark's applyInPandas is not one.) ``out_dir`` must be shared
    storage in a real deployment (object store / DFS); tar timestamps
    are pinned to 0 so shard bytes are bit-reproducible run over run.

    stdlib tarfile only — no codec or formats libraries — matching the
    container constraint and the multimodal decoder's dependency-free
    policy.
    """
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def _write_shard(key, pdf):
        (shard,) = key
        pdf = pdf.sort_values(pos_col)
        path = os.path.join(out_dir, f"shard-{int(shard):05d}.tar")
        n_bytes = 0
        with tarfile.open(path, "w") as tar:
            for _, row in pdf.iterrows():
                payload = str(row[text_col]).encode("utf-8")
                info = tarfile.TarInfo(name=f"{row[key_col]}.txt")
                info.size = len(payload)
                info.mtime = 0
                tar.addfile(info, io.BytesIO(payload))
                n_bytes += len(payload)
        return pd.DataFrame(
            {
                "shard": [int(shard)],
                "path": [path],
                "n_members": [len(pdf)],
                "n_bytes": [n_bytes],
            }
        )

    manifest = (
        df.select(shard_col, pos_col, key_col, text_col)
        .groupBy(shard_col)
        .applyInPandas(_write_shard, schema=TAR_MANIFEST_SCHEMA)
    )
    # Materialize: the write happens inside the action.
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(rows, TAR_MANIFEST_SCHEMA)


def read_tar_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read tar shards back as (shard, member, payload) rows: the
    binaryFile source ships each tar to one task, and an Arrow kernel
    expands members. Scale note: binaryFile loads a whole file per row,
    so shard SIZE (the writer's dial) bounds task memory — the same
    contract WebDataset loaders assume (a shard is the streaming unit).
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(out_dir, "shard-*.tar")
    )

    def _expand(batches):
        for pdf in batches:
            out = {"shard": [], "member": [], "payload": []}
            for _, row in pdf.iterrows():
                name = os.path.basename(row["path"])
                shard = int(name.split("-")[1].split(".")[0])
                with tarfile.open(fileobj=io.BytesIO(row["content"])) as tar:
                    for m in tar.getmembers():
                        out["shard"].append(shard)
                        out["member"].append(m.name)
                        out["payload"].append(tar.extractfile(m).read())
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(
        _expand, schema=TAR_MEMBER_SCHEMA
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a corpus table as ORC — the columnar interchange format of
    Hive-lineage warehouses (parquet's sibling; some upstream lakes
    deliver ORC and some downstream engines prefer ingesting it).
    Spark's native writer: per-task part files, zlib-by-default striping,
    min/max stripe statistics for predicate pushdown on re-read."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC with Spark's native vectorized reader. Unlike JSON, ORC
    is self-describing (schema travels in the file footer), so no
    explicit schema is required and there is no inference pass; filters
    and column pruning push into the stripe reader exactly as with
    parquet (gated in tests/test_sinks.py)."""
    return spark.read.orc(path)
