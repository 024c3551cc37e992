"""Synthesize a larger scale factor by key-shifted replication of an
existing testdata directory — so the scale probe can measure the data
path beyond the largest driver-provided SF (sf0.1) without fabricating
new distributions.

Replication rules (FK-consistent by construction):
- Fact tables are replicated N times with their PRIMARY key shifted by
  copy * OFFSET: lineitem/orders share the same l_orderkey/o_orderkey
  shift so their join lines up; events shifts event_id; documents
  shifts doc_id and suffixes the text with a copy marker so content
  stats/dedup see distinct documents rather than 10x exact clones.
- Foreign keys into dimensions (o_custkey, user_id, nationkey...) are
  left unchanged, and dimension tables (customer, supplier, part,
  nation, region, embeddings) are copied verbatim — the realistic shape
  of growth: facts accumulate, dims don't.

Usage: python scripts/make_scaled_data.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1, factor 10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from accounts_receivable_data_pipeline_api_spark.session import get_spark  # noqa: E402

KEY_OFFSET = 1 << 40  # far above any real key, keeps bigints comfortable

COPY_VERBATIM = ("region", "nation", "customer", "supplier", "part")
SHIFT_COLS = {
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    # embeddings also get a per-copy deterministic perturbation (below):
    # verbatim copies would make every vector a 10-way exact duplicate,
    # collapsing LSH buckets into degenerate all-pairs blocks.
    "embeddings": ("vec_id",),
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("make-scaled-data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    for table in COPY_VERBATIM:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        df.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        print(f"{table}: copied {df.count()} rows")

    for table, keys in SHIFT_COLS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        copies = []
        for i in range(factor):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
            if table == "documents" and i > 0:
                # Per-copy Caesar rotation of the letters: preserves
                # length, token structure, and per-doc statistics, but
                # DECORRELATES shingle sets across copies — without it,
                # copies are jaccard~0.99 near-dups of each other and
                # every pair-generating operator's OUTPUT grows
                # quadratically with the copy factor (measuring result
                # size, not engine scaling) — the text analogue of the
                # embedding sign flips below.
                # Seeded per-copy alphabet PERMUTATION (26! space), not a
                # rotation: rot = i % 25 + 1 has only 25 distinct values,
                # so at factor > 25 copies i and i+25 would share a
                # substitution and become jaccard~1 cross-copy near-dups,
                # silently reintroducing the quadratic artifact.
                import hashlib

                src_a = "abcdefghijklmnopqrstuvwxyz"
                perm = "".join(
                    sorted(
                        src_a,
                        key=lambda ch: hashlib.md5(
                            f"caesar:{i}:{ch}".encode()
                        ).digest(),
                    )
                )
                c = c.withColumn(
                    "text",
                    F.translate(
                        F.translate(F.col("text"), src_a, perm),
                        src_a.upper(),
                        perm.upper(),
                    ),
                )
            if table == "embeddings" and i > 0:
                # Deterministic per-copy SIGN FLIPS (a diagonal +/-1
                # rotation): cosine WITHIN a copy is unchanged (signs
                # cancel), cosine ACROSS copies is decorrelated to ~0 —
                # so a 10x corpus behaves like 10 independent corpora
                # (realistic growth), not 10x-denser near-dup clusters
                # (which would grow pair OUTPUT quadratically and
                # measure output size, not engine scaling).
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, j: x
                        * (F.pmod(F.hash(j.cast("int"), F.lit(i)), F.lit(2)) * 2 - 1).cast(
                            "double"
                        ),
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        print(f"{table}: {df.count()} x {factor} rows")

    spark.stop()


if __name__ == "__main__":
    main()
