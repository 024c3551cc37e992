"""Count-min sketch: bounded-memory frequency estimation over
unbounded token/key streams — the third member of the sketch family
(HLL++ distinct counts in plans/temporal.py, Bloom membership in
operators/text.py), covering the "how often" question the other two
don't: hot-token / hot-domain monitoring while assembling a corpus,
without materializing a full frequency table.

Guarantees (Cormode & Muthukrishnan 2005): estimates are ONE-SIDED
(estimate >= true count, always) and over-estimate by at most
eps * N with probability 1 - delta, for width = ceil(e / eps) and
depth = ceil(ln(1 / delta)); N = total items counted. Sketches are
ADDITIVE: cms(A) + cms(B) = cms(A ++ B) elementwise, which is what
makes both the partition-parallel build and the streaming per-batch
partials exact merges, not approximations of approximations.

Hashing is the engine-portable md5 idiom (row-salted md5 first-8-hex
mod width), so a sketch is a pure function of the multiset of items —
layout- and engine-independent, same policy as every operator here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_positions(item: Column, depth: int, width: int) -> Column:
    """The ``depth`` counter positions of an item: md5(d:item) mod
    width per row d — identical idiom to text._bloom_positions, so a
    SQL oracle can recompute any estimate exactly."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{d}:"), item)), 1, 8), 16, 10
            ).cast("long")
            % width
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 2048,
):
    """Build a count-min sketch over a column of items. Returns a
    numpy int64 array of shape (depth, width).

    Plan shape at 100 TB: positions are a JVM projection; each
    partition reduces its items to ONE (depth x width) counter block
    inside an Arrow kernel (map-side combine in the Python stage), and
    the driver sums the per-partition blocks — numPartitions * depth *
    width * 8 bytes of driver traffic (64 KiB per partition at the
    defaults), never item-proportional. The sketch itself is the whole
    point: memory is depth*width counters no matter how many distinct
    items the stream carries.
    """
    import numpy as np
    import pandas as pd

    d, w = depth, width

    def _partial(batches):
        block = np.zeros((d, w), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf):
                seen = True
                pos = np.stack(pdf["positions"].to_numpy())  # B x depth
                for r in range(d):
                    np.add.at(block[r], pos[:, r], 1)
        if seen:
            yield pd.DataFrame({"block": [block.tobytes()]})

    parts = (
        # NULL items carry no countable identity and would null-propagate
        # through the md5 position expr, landing None inside the numpy
        # kernel — quarantine them here rather than fail the task
        df.filter(F.col(item_col).isNotNull())
        .select(
            _cms_positions(F.col(item_col).cast("string"), d, w).alias("positions")
        )
        .mapInPandas(_partial, schema="block binary")
        .collect()
    )
    out = np.zeros((d, w), dtype=np.int64)
    for row in parts:
        out += np.frombuffer(row["block"], dtype=np.int64).reshape(d, w)
    return out


def cms_query(sketch, items: list[str], depth: int = 4, width: int = 2048) -> dict[str, int]:
    """Point-estimate counts for a list of items: min over the depth
    rows (driver-side; the items are the bounded watch-list — hot
    tokens, monitored domains — not the corpus)."""
    import hashlib

    out = {}
    for it in items:
        est = None
        for d in range(depth):
            h = hashlib.md5(f"{d}:{it}".encode("utf-8")).hexdigest()
            p = int(h[:8], 16) % width
            v = int(sketch[d][p])
            est = v if est is None else min(est, v)
        out[it] = est
    return out


def cms_merge(*sketches):
    """Elementwise sum — exact, by CMS additivity."""
    import numpy as np

    out = np.zeros_like(sketches[0])
    for s in sketches:
        out += s
    return out
