"""Cached synthetic media payloads, per (sf_dir, codec).

Payload synthesis (operators/multimodal.py:synthesize_*) is the FIXTURE
step — a real deployment reads payloads from the object store, so the
synthesizers stand in for that read and their cost does not belong to
the decode operators being measured or verified. Round-7 VERDICT #6:
the multimodal corpus entry re-ran six synthesis legs on every
verification pass (cold + warm + oracle compare), compounding to ~24 s;
this module content-addresses each codec's synthesized payloads into a
write-once parquet cache so synthesis runs AT MOST ONCE per
(sf_dir, codec) per machine, across processes.

Cache contract:
- Synthesis is fully deterministic from the documents table, so a
  cache hit is value-identical to a fresh synthesis (the corpus entry
  stays hash-checkable).
- The path is versioned (``v4`` — v3 pre-dated the 8-file
  repartition, and a stale v3 dir would silently keep the slow
  ~32-tiny-file layout) the way the round-7 media cache tag
  was: payload-shape changes bump the version, never reuse a stale dir.
- Writes go to a process-unique temp dir then ``os.rename`` into
  place — atomic on POSIX, so concurrent bench child processes race
  benignly (first rename wins, losers discard), and a crashed writer
  can never leave a half-written dir at the published path.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from .star import load_table

_CACHE_VERSION = "v4"
_PUBLISHED: dict[tuple[str, str], str] = {}

#: codec -> synthesizer attribute on operators.multimodal
_SYNTH_ATTR = {
    "bmp": "synthesize_bmp",
    "png": "synthesize_png",
    "jpeg": "synthesize_jpeg",
    "jpeg420": "synthesize_jpeg420",
    "wav": "synthesize_wav",
    "avi": "synthesize_avi",
}


def media_payloads(spark: SparkSession, sf_dir: str, codec: str) -> DataFrame:
    """Synthesized payloads for ``codec`` over ``sf_dir``'s documents
    table, from the write-once parquet cache (synthesizing on miss)."""
    return spark.read.parquet(_ensure_cached(spark, sf_dir, codec))


def media_payloads_union(
    spark: SparkSession, sf_dir: str, codecs: tuple[str, ...]
) -> DataFrame:
    """All listed codecs' payloads as ONE single-directory scan,
    materialized once from the per-codec caches. Two rejected
    alternatives, both measured at sf0.1 (7 MB, 5 codecs, warm
    op_media_decode): a unionByName of per-codec reads pays driver/job
    setup per scan subtree per executed leg (2.5 s vs the 1.4 s
    anchor), and a multi-path spark.read.parquet(p1..p5) still plans
    per-path file groups (2.0 s). The single written dir restores the
    anchor's scan shape exactly — one bin-packed file source — and is
    content-addressed by the codec tuple, so a different codec mix
    gets its own union dir."""
    paths = [_ensure_cached(spark, sf_dir, c) for c in codecs]
    union_path = f"{os.path.dirname(paths[0])}/__union_{'_'.join(codecs)}"
    if not os.path.isdir(union_path):
        tmp = f"{union_path}.tmp-{uuid.uuid4().hex}"
        spark.read.parquet(*paths).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, union_path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(union_path)


def _ensure_cached(spark: SparkSession, sf_dir: str, codec: str) -> str:
    if codec not in _SYNTH_ATTR:
        raise ValueError(f"unknown media codec {codec!r}")
    key = (sf_dir, codec)
    path = _PUBLISHED.get(key)
    if path is None:
        tag = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/spark_graft_media_{_CACHE_VERSION}_{tag}/{codec}"
        if not os.path.isdir(path):
            from ..operators import multimodal

            docs = load_table(spark, sf_dir, "documents")
            synth = getattr(multimodal, _SYNTH_ATTR[codec])
            tmp = f"{path}.tmp-{uuid.uuid4().hex}"
            # repartition AFTER synthesis (synth runs at full scan
            # parallelism, then one cheap payload shuffle): without it
            # each codec dir lands ~32 small files and the 6-codec
            # union scans ~120 tiny tasks whose per-task Python-worker
            # overhead measurably slowed every decode pass (2.5 s vs
            # 1.4 s warm at sf0.1)
            synth(docs).repartition(8).write.mode("overwrite").parquet(tmp)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            try:
                os.rename(tmp, path)
            except OSError:
                # a concurrent process published first; ours is identical
                shutil.rmtree(tmp, ignore_errors=True)
        _PUBLISHED[key] = path
    return path
