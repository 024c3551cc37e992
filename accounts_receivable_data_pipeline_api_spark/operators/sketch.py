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


# ---------------------------------------------------------------------------
# Engine-PORTABLE HyperLogLog (Flajolet et al. 2007). Spark's built-in
# approx_count_distinct is HLL++ whose sketch bytes are engine-private;
# this variant's REGISTER TABLE is a pure function of the item set
# under the md5 idiom, so a SQL oracle reproduces every register and
# the estimate bit-for-bit — the distinct-count sketch joins the CMS /
# Bloom family with full cross-engine value checks, and the register
# table doubles as the mergeable partial (union = groupBy max).
#
# Portability inventory (registry determinism rules):
#   bucket   = md5-bucket idiom (conv/substr first-8-hex, exact integers)
#   w        = 48-BIT rank hash (md5 first-12-hex -> exact BIGINT in
#              both engines). 48 bits, not 32: a 32-bit w collides past
#              n ~ 2^32/30 ~ 1.4e8 distincts per group, compressing the
#              register profile and biasing the estimate LOW — the
#              classical HLL32 ceiling, unacceptable at the 100 TB
#              design point (round-7 VERDICT #1). 48 bits pushes the
#              ceiling to ~2^48/30 ~ 9.4e12, and the large-range
#              correction branch below covers the approach to it.
#   rank     = 49 - length(bin(w)) — string length of the unpadded
#              binary expansion, exact in both engines (w = 0 -> 49)
#   sum      = integer-scaled SUM(1 << (49 - rank)) — EXACT BIGINT
#              arithmetic, order-free (2^-rank scaled by 2^49; max
#              m * 2^49 = 2^59 at m=1024, well inside BIGINT)
#   estimate = literals-and-division arithmetic on identical doubles,
#              ln() only under round(..., 6) (the tfidf/LM recipe),
#              in BOTH the linear-counting and large-range branches
# ---------------------------------------------------------------------------

#: Rank-hash width in bits; rank = (HLL_HASH_BITS + 1) - length(bin(w)).
HLL_HASH_BITS = 48
_RANK_BASE = HLL_HASH_BITS + 1  # 49
_SCALE_POW = 1 << _RANK_BASE  # 2^49, the integer scale for register sums
_HASH_SPACE = float(1 << HLL_HASH_BITS)  # 2^48, the w value space


def hll_alpha(m: int) -> float:
    """Bias-correction constant for m >= 128 registers (Flajolet's
    alpha_m = 0.7213 / (1 + 1.079 / m)); a plain-Python float so the
    SQL oracle can embed the identical literal via repr()."""
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    item_col: str,
    m: int = 1024,
    group_cols: tuple[str, ...] = (),
    salt: str = "hll",
) -> DataFrame:
    """HLL register table: per group, (bucket BIGINT, max_rank INT)
    for every OBSERVED bucket (absent buckets are rank-0 empties the
    estimator accounts for arithmetically).

    max() is multiset-invariant, so registers over the raw rows equal
    registers over distinct items — no dedup pass needed. Plan shape
    at 100 TB: one JVM projection + one hash agg on (group, bucket),
    map-side combinable; output is bounded by groups * m rows no
    matter the corpus size. Register tables MERGE by groupBy max —
    the same frame is the partition partial, the shard sketch, and
    the cross-day union."""
    item = F.col(item_col).cast("string")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"b{salt}:"), item)), 1, 8), 16, 10)
        .cast("long")
        % m
    )
    # 12 hex chars = 48-bit w: exact BIGINT in Spark AND DuckDB, and wide
    # enough that rank-hash collisions stay negligible to ~10^12 distincts
    # per group (the 8-hex/32-bit form silently under-counted past ~1.4e8)
    w = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"r{salt}:"), item)), 1, 12), 16, 10
    ).cast("long")
    rank = F.when(w == 0, F.lit(_RANK_BASE)).otherwise(
        F.lit(_RANK_BASE) - F.length(F.bin(w))
    )
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rank.cast("int").alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("max_rank"))
        # the sketch parameter travels WITH the table: a register table
        # is meaningless without its m, and hll_estimate guards on it
        # (round-7 review: a persisted partial read back under a
        # different default silently mis-estimated)
        .withColumn("hll_m", F.lit(m).cast("int"))
    )


def hll_merge_registers(
    registers: DataFrame, group_cols: tuple[str, ...]
) -> DataFrame:
    """MAX-merge a register table to coarser groups — THE rollup fold,
    in one place (shards, days->months, cross-corpus unions all use
    the same law). Groups by ``hll_m`` alongside the caller's keys so
    partials built under DIFFERENT m fold APART instead of silently
    merging incompatible registers: a mixed-m input then surfaces as
    either hll_estimate's m-mismatch guard or its duplicate-bucket
    guard, both in-plan raises (the round-7 persisted-partial
    incident rule; round-11 review caught an inline max('hll_m')
    re-implementation that would have laundered the mismatch)."""
    return (
        registers.groupBy(*group_cols, "hll_m", "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
        .select(*group_cols, "bucket", "max_rank", "hll_m")
    )


def hll_estimate(
    registers: DataFrame,
    m: int = 1024,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct-count estimate from a register table: per group,
    (hll_m, n_observed, sum_scaled, estimate).

    sum_scaled = sum over ALL m registers of 2^(49 - rank), scaled
    integer-exact (empty registers contribute 2^49 each); the raw
    estimate alpha_m * m^2 * 2^49 / sum_scaled takes three branches:

    * linear counting m * ln(m / V) when raw <= 2.5m and V = empty
      registers > 0 — the standard small-range correction;
    * large-range correction -2^48 * ln(1 - raw / 2^48) when raw
      exceeds 2^48 / 30 — the classical Flajolet correction for
      rank-hash collisions as the estimate approaches the 48-bit hash
      space (round-7 VERDICT #1; past ~9.4e12 distincts per group the
      uncorrected raw biases LOW);
    * raw otherwise.

    Both ln branches follow the house round-6 recipe; every operand is
    deterministic across engines, and all three branches round to 6 dp.
    If raw reaches the hash space itself (>= 0.99 * 2^48 — the sketch
    is saturated and NO correction recovers it) the plan raises instead
    of returning a confidently wrong number.

    Two in-plan input guards (both raise at execution, never silently
    mis-estimate):

    * m-mismatch: the register table carries its build-time m
      (hll_registers stamps hll_m); a mismatch with THIS call's m
      (e.g. a persisted streaming partial read back under a different
      default) would pad the wrong number of empty registers.
    * duplicate buckets: the input must be a FOLDED register table
      (unique bucket per group — hll_registers output, or a union of
      partials re-folded by groupBy-max as streaming read_registers
      does). Raw unioned partials passed directly would drive
      n_observed past the distinct-bucket count, under-pad the empty
      registers, and bias the estimate (round-7 ADVICE)."""
    alpha = hll_alpha(m)
    msq_scaled = float(m) * float(m) * float(_SCALE_POW)
    large_thresh = _HASH_SPACE / 30.0
    checked = registers.withColumn(
        "_rank_ok",
        F.when(F.col("hll_m") == F.lit(m), F.col("max_rank")).otherwise(
            F.raise_error(
                F.lit(
                    f"hll_estimate(m={m}) over a register table built with a "
                    "different m (see the table's hll_m column)"
                )
            ).cast("int")
        ),
    )
    agg = checked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_n_rows"),
        F.countDistinct("bucket").cast("long").alias("_n_buckets"),
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RANK_BASE} - _rank_ok)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(_SCALE_POW)
        )
        .cast("long")
        .alias("sum_scaled"),
    )
    guarded = agg.withColumn(
        "n_observed",
        F.when(F.col("_n_rows") == F.col("_n_buckets"), F.col("_n_rows")).otherwise(
            F.raise_error(
                F.lit(
                    "hll_estimate over an UNFOLDED register table (duplicate "
                    "buckets per group) — fold partials first with "
                    "groupBy(bucket).max(max_rank), as read_registers does"
                )
            ).cast("long")
        ),
    )
    raw = F.lit(alpha) * (F.lit(msq_scaled) / F.col("sum_scaled").cast("double"))
    v = F.lit(m) - F.col("n_observed")
    est = (
        F.when(
            (raw <= F.lit(2.5 * m)) & (v > 0),
            F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")), 6),
        )
        .when(
            raw >= F.lit(0.99 * _HASH_SPACE),
            F.raise_error(
                F.lit(
                    f"hll_estimate: raw estimate saturates the {HLL_HASH_BITS}-bit "
                    "hash space — the sketch cannot represent this cardinality"
                )
            ).cast("double"),
        )
        .when(
            raw > F.lit(large_thresh),
            F.round(
                F.lit(-_HASH_SPACE) * F.log(F.lit(1.0) - raw / F.lit(_HASH_SPACE)), 6
            ),
        )
        .otherwise(F.round(raw, 6))
    )
    return guarded.select(
        *group_cols,
        F.lit(m).cast("int").alias("hll_m"),
        "n_observed",
        "sum_scaled",
        est.alias("estimate"),
    )


# ---------------------------------------------------------------------------
# HDR-style quantile sketch: the fourth sketch family — "how is it
# distributed" next to CMS ("how often"), HLL ("how many distinct"),
# Bloom ("have I seen it").
# ---------------------------------------------------------------------------


def hdr_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    sub_bits: int = 5,
) -> DataFrame:
    """Mergeable quantile sketch over POSITIVE integers, HdrHistogram-
    style (Gil Tene's High Dynamic Range histogram; same bucket law as
    DDSketch but with INTEGER bucket math): a value v lands in bucket

        exp   = floor(log2(v))          = length(bin(v)) - 1
        shift = max(exp - sub_bits, 0)
        sub   = (v >> shift) - (1 << min(exp, sub_bits))

    i.e. the exponent plus the next ``sub_bits`` mantissa bits. Every
    step is integer/bit arithmetic on BIGINT — bin()/shift behave
    identically in Spark and DuckDB (the proven HLL rank idiom), so
    the WHOLE sketch hash-checks cross-engine, unlike log-gamma
    bucketing (DDSketch's ceil(log_gamma(v)) is a float-boundary trap).

    Returns one row per (group, exp, sub): cnt plus the bucket's value
    range [lb, ub] (lb = (2^min(exp,sub_bits) + sub) << shift,
    ub = lb + 2^shift - 1; buckets tile the positive integers, widths
    relative to lb bounded by 2^-sub_bits once exp >= sub_bits, exact
    below). The register table is the mergeable partial: union of
    sketches = groupBy-SUM of cnt (map-side combinable, associative,
    commutative), bounded at groups * 64 * 2^sub_bits rows at ANY
    corpus size — percentiles of doc lengths / token counts / prices
    over 100 TB without a global sort.

    NOT at-least-once-safe (cnt sums, unlike HLL's max-merge) — the
    streaming twin must use the batch_id partition-overwrite contract.
    Non-positive values raise IN-PLAN (raise_error, the m-guard
    template): silently bucketing v <= 0 would corrupt quantiles.
    """
    v = F.col(value_col)
    # NULL must raise too, not slip through when()'s not-true branch:
    # a NULL value would bin to a phantom (exp=NULL) bucket that counts
    # toward n and silently shifts every quantile — and diverges
    # cross-engine on NULL ordering (round-9 review). Callers filter
    # NULLs explicitly if "ignore missing" is the intended semantics.
    guarded = df.withColumn(
        value_col,
        F.when(
            v.isNull() | (v <= 0),
            F.raise_error(
                F.lit(
                    "hdr_registers: values must be non-NULL positive "
                    f"integers (got NULL/non-positive in {value_col!r}); "
                    "filter or shift the domain at the call site"
                )
            ).cast("long"),
        ).otherwise(v.cast("long")),
    )
    exp = (F.length(F.bin(F.col(value_col))) - 1).cast("int")
    b = guarded.withColumn("exp", exp).withColumn(
        "shift", F.greatest(F.col("exp") - F.lit(sub_bits), F.lit(0)).cast("int")
    )
    width = F.expr("shiftleft(CAST(1 AS BIGINT), shift)")
    sub = (
        F.expr(f"shiftright({value_col}, shift)")
        - F.expr(f"shiftleft(CAST(1 AS BIGINT), least(exp, {sub_bits}))")
    ).cast("int")
    lb = F.expr(
        f"shiftleft(shiftleft(CAST(1 AS BIGINT), least(exp, {sub_bits})) + sub, shift)"
    )
    return (
        b.withColumn("sub", sub)
        .withColumn("lb", lb)
        .withColumn("ub", F.col("lb") + width - 1)
        .groupBy(*group_cols, "exp", "sub", "lb", "ub")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("hdr_sub_bits", F.lit(sub_bits).cast("int"))
    )


def hdr_merge_registers(
    registers: DataFrame, group_cols: tuple[str, ...]
) -> DataFrame:
    """SUM-merge an HDR register table to coarser groups — the
    quantile family's rollup fold in one place (hll_merge_registers'
    twin): counts add by HDR additivity; (lb, ub) are bucket-law
    constants per (exp, sub), so min() just carries them; the
    hdr_sub_bits stamp rides the group key so partials built under
    different bucket laws fold APART and hdr_quantiles' guard raises
    instead of a silent mis-merge (the hll_m rule)."""
    return (
        registers.groupBy(*group_cols, "hdr_sub_bits", "exp", "sub")
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.min("lb").alias("lb"),
            F.min("ub").alias("ub"),
        )
        .select(*group_cols, "exp", "sub", "lb", "ub", "cnt", "hdr_sub_bits")
    )


def hdr_quantiles(
    reg: DataFrame,
    group_cols: list[str],
    qs: list[tuple[str, int, int]] = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)),
) -> DataFrame:
    """Quantile estimates from an hdr_registers table: for q = num/den
    the DISC rank is r = ceil(q * n) = (num*n + den - 1) div den (pure
    integer — never float-multiply a rank), and the estimate is the
    bucket containing rank r in (exp, sub) order. Because lb and ub
    are both strictly increasing along that order, "the first bucket
    with cumulative count >= r" is simply min(lb)/min(ub) over the
    qualifying buckets — no argmin struct tricks, and the exact
    rank-r value provably lies in [q_lb, q_ub] (the sketch invariant
    the oracle pins). Output: one row per (group, q).

    Mixed-sub_bits input RAISES in-plan (the hll_m-guard pattern):
    partials stamped with different hdr_sub_bits are two incompatible
    bucket systems — interleaving them in one (exp, sub) walk doubles
    n and silently corrupts every quantile, exactly the failure class
    read_hdr_registers folds apart by grouping on the stamp."""
    from pyspark.sql import Window

    wg = Window.partitionBy(*group_cols)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("exp", "sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_guarded = F.when(
        F.min("hdr_sub_bits").over(wg) != F.max("hdr_sub_bits").over(wg),
        F.raise_error(
            F.lit(
                "hdr_quantiles: register table mixes hdr_sub_bits stamps "
                "— incompatible bucket systems cannot fold in one walk"
            )
        ).cast("long"),
    ).otherwise(F.sum("cnt").over(wg))
    cum = reg.withColumn("cum", F.sum("cnt").over(w)).withColumn("n", n_guarded)
    q_lit = F.array(
        *[
            F.struct(
                F.lit(label).alias("q"),
                F.lit(num).cast("long").alias("q_num"),
                F.lit(den).cast("long").alias("q_den"),
            )
            for label, num, den in qs
        ]
    )
    exploded = cum.withColumn("qq", F.explode(q_lit)).select(
        *group_cols,
        "lb",
        "ub",
        "cum",
        "n",
        F.col("qq.q").alias("q"),
        # ceil(num*n/den) in INTEGER division — `/` would be a float
        # quotient whose truncation can miss the floor by 1 ulp
        F.expr("(qq.q_num * n + qq.q_den - 1) DIV qq.q_den").alias("r"),
    )
    return (
        exploded.filter(F.col("cum") >= F.col("r"))
        .groupBy(*group_cols, "q")
        .agg(
            F.min("lb").alias("q_lb"),
            F.min("ub").alias("q_ub"),
            F.min("r").alias("rank"),
            F.min("n").alias("n"),
        )
    )


def cms_counters(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """All-DataFrame count-min counter table: one row per (d, pos) hash
    cell with its collision-summed count — the distributed twin of
    cms_build's numpy block, for when the sketch should live as a
    TABLE (driver-checkable, joinable, mergeable by groupBy-SUM like
    hdr_registers) instead of a driver-side array. One
    map-side-combinable shuffle on the (d, pos) cell key; output
    bounded at depth * width rows at ANY input size. Positions use the
    engine-portable salted-md5 idiom, so a SQL oracle recomputes every
    cell. NULL items quarantine (no countable identity), matching
    cms_build."""
    items = df.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).cast("string").alias("_it")
    )
    return (
        items.select(
            F.posexplode(_cms_positions(F.col("_it"), depth, width)).alias("d", "pos")
        )
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    counters: DataFrame, watch: DataFrame, item_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Point estimates for a bounded watch-list of items against a
    cms_counters table: est = min over the depth cells — the classic
    one-sided CMS read (est >= true count always; over by <= eps*N
    w.h.p.). A cell ABSENT from the counter table is a zero count, so
    the probe side left-joins and coalesces — an inner join would
    silently DROP a never-seen watch item (monitored domain with zero
    traffic) instead of estimating 0, and would over-estimate items
    with only some cells populated (round-9 review). The counter table
    is bounded at depth * width rows by construction, so IT broadcasts
    (not the watch side — the bounded side is the provably small one
    at any corpus size); cost is one broadcast equi-join on (d, pos)
    + a depth-row min per item.

    A NULL watch item raises IN-PLAN (the hdr_registers loud-guard
    idiom): md5(NULL) yields a NULL position array and posexplode
    would emit no rows, so without the guard a NULL probe silently
    VANISHES from the output — neither an estimate nor a quarantine
    row. Build-side NULLs are data (no countable identity —
    cms_counters quarantines them); a NULL in a bounded watch list is
    a caller bug and must be loud (round-9 ADVICE)."""
    probes = watch.select(
        F.when(
            F.col(item_col).isNull(),
            F.raise_error(
                F.lit(
                    "cms_lookup: NULL watch item would silently vanish "
                    "(md5(NULL) -> no hash cells); drop NULLs from the "
                    "watch list before probing"
                )
            ).cast("string"),
        )
        .otherwise(F.col(item_col).cast("string"))
        .alias("item")
    ).select(
        "item",
        F.posexplode(_cms_positions(F.col("item"), depth, width)).alias("d", "pos"),
    )
    return (
        probes.join(F.broadcast(counters), ["d", "pos"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / theta-style) sketch: the fifth sketch family —
# "how much do these sets OVERLAP" next to HLL ("how many distinct"),
# CMS ("how often"), HDR ("how distributed"), Bloom ("have I seen it").
# An HLL register table estimates each group's cardinality but cannot
# intersect two groups; the KMV sample CAN, because it keeps an actual
# uniform sample of the distinct-value hash space: the k smallest
# 48-bit fingerprints per group. Union/intersection/Jaccard between
# any two groups then come from the samples alone — the theta-sketch
# set-operation story (Dasgupta et al., "Theta sketch framework"), and
# the Beyer et al. (SIGMOD'07) distinct-value estimator.
#
# Portability inventory (registry determinism rules): the sample is
# EXACT integer selection — hv = md5-first-12-hex (48-bit BIGINT, the
# HLL rank-hash idiom), per-group k smallest DISTINCT hv, positions by
# integer ordering. No float enters until the final estimates:
#   estimate      = (k-1) * 2^48 / hv_k   (one IEEE division of exact
#                   doubles — hv < 2^48 and (k-1)*2^48 are both exact)
#   jaccard       = c / k'                (exact small integers)
#   intersection  = jaccard * union_est   (one multiply)
# so every row of the sample AND every estimate hash-checks
# cross-engine with no rounding contract at all.
# ---------------------------------------------------------------------------

#: Sample-hash width; shared with the HLL rank hash (12 hex = 48 bits).
KMV_HASH_BITS = 48
_KMV_SPACE = float(1 << KMV_HASH_BITS)  # 2^48 as an exact double


def kmv_sample(
    df: DataFrame,
    item_col: str,
    k: int = 256,
    group_cols: tuple[str, ...] = (),
    salt: str = "kmv",
    shards: int = 32,
) -> DataFrame:
    """KMV sample: per group, the ``k`` smallest distinct 48-bit item
    fingerprints as (group..., pos 1..k, hv BIGINT, kmv_k).

    The sample IS the sketch: a uniform order-statistics sample of the
    hashed distinct-value space. It merges by union + re-selection —
    kmv_sample over a union of inputs equals the k smallest of the
    unioned samples (min-k is multiset-invariant and composable), so
    the same frame serves as partition partial, shard sketch, and
    cross-day rollup, like the HLL register table.

    Plan shape at 100 TB: one map-side-combinable distinct on
    (group, hv), then a TWO-LEVEL bottom-k — a window per
    (group, hv % shards) keeps each sort shard-local (never the
    classic one-task-per-group window trap when groups are few), and
    the final per-group window sorts at most shards * k survivor
    rows. Output identical to a single per-group window (selection
    commutes with sharding); the SQL oracle uses the naive
    single-window form, so the cross-engine check also proves the
    shard tree exact. NULL items quarantine, matching cms_build."""
    item = F.col(item_col).cast("string")
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), item)), 1, 12), 16, 10
    ).cast("long")
    from pyspark.sql import Window

    base = (
        df.filter(F.col(item_col).isNotNull())
        .select(*group_cols, hv.alias("hv"))
        .distinct()
    )
    w1 = Window.partitionBy(*group_cols, F.col("hv") % shards).orderBy("hv")
    lvl1 = (
        base.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        lvl1.withColumn("pos", F.row_number().over(w2))
        .filter(F.col("pos") <= k)
        .select(*group_cols, F.col("pos").cast("int").alias("pos"), "hv")
        # the sketch parameter travels WITH the sample (the hll_m
        # policy): estimates are meaningless without the k the sample
        # was built under, and kmv_estimate guards on it in-plan
        .withColumn("kmv_k", F.lit(k).cast("int"))
    )


def kmv_estimate(
    sample: DataFrame,
    k: int = 256,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct-count estimate from a KMV sample: per group,
    (kmv_k, n_observed, hv_k, estimate).

    * n_observed < k — the group has fewer than k distinct hashes, so
      the sample is the COMPLETE distinct-hash set and the estimate is
      exactly n_observed (the theta = 1 branch of a theta sketch);
    * otherwise the Beyer et al. unbiased estimator
      (k - 1) * 2^48 / hv_k, where hv_k (the largest sampled hv) is
      the k-th order statistic of the hashed space. One IEEE division
      of exactly-representable doubles — deterministic cross-engine
      with no rounding recipe needed.

    In-plan k-mismatch guard (the hll_estimate policy): a persisted
    sample read back under a different k would silently re-scale the
    estimator, so a kmv_k != k raises at execution."""
    checked = sample.withColumn(
        "_hv_ok",
        F.when(F.col("kmv_k") == F.lit(k), F.col("hv")).otherwise(
            F.raise_error(
                F.lit(
                    f"kmv_estimate(k={k}) over a sample built with a "
                    "different k (see the sample's kmv_k column)"
                )
            ).cast("long")
        ),
    )
    agg = checked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_observed"),
        F.max("_hv_ok").cast("long").alias("hv_k"),
    )
    numer = float(k - 1) * _KMV_SPACE  # exact double: small int * 2^48
    est = F.when(
        F.col("n_observed") < k, F.col("n_observed").cast("double")
    ).otherwise(F.lit(numer) / F.col("hv_k").cast("double"))
    return agg.select(
        *group_cols,
        F.lit(k).cast("int").alias("kmv_k"),
        "n_observed",
        "hv_k",
        est.alias("estimate"),
    )


def kmv_overlap(
    sample: DataFrame,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Set-operation estimates for every unordered PAIR of groups in a
    KMV sample table: (group_a, group_b, kmv_k, n_union_obs, n_common,
    n_a_only, n_b_only, hv_k, jaccard, union_est, intersect_est,
    a_only_est, b_only_est), group_a < group_b.

    a_only_est / b_only_est (round 10) are the theta-framework
    A-NOT-B estimates (set difference — "in status a but not b"):
    within the union's k-min sample every retained hash's membership
    on EACH side is decidable (the same soundness argument as the
    intersection), so the sample partitions exactly into a-only /
    b-only / common integer counts, and each estimate is its sample
    fraction times union_est — the inclusion-consistent family:
    n_a_only + n_b_only + n_common = n_union_obs EXACTLY (integers),
    so the three estimates partition union_est up to one float
    rounding per product. Exact mode: when n_union_obs < k the union
    sample is the complete hash set, and ALL THREE partition
    estimates (intersection and both differences) are emitted as the
    integer counts DIRECTLY (cast to double), not as
    fraction * union_est — (a/n)*n is off by one ulp for ~30% of
    integer pairs (7/25*25 = 7.000000000000001), and the branch makes
    the exactness claim literally true instead of approximately
    (round-10 review catches, second and third pass).

    Accuracy honesty (standard theta-framework caveat): the error of
    EVERY derived set-operation estimate scales with the UNION's
    sampling error, not with the result's size — a small difference
    between two heavily-overlapping large sets has large RELATIVE
    error at any fixed k (the corpus entry's fixture shows estimates
    off 2-3x on differences that are ~3% of the union, all inside the
    0.3 * union additive bound). Size k to the union you query, or
    use exact anti-joins when the difference itself is the product.

    The union sketch of two groups is the k smallest of their combined
    samples (selection composes); its threshold theta_U is <= BOTH
    groups' own thresholds (the union k-min is a subset of the merged
    k-mins), so for every hv in the union sample, membership of the
    underlying item in set A is decidable FROM SAMPLE A alone — the
    soundness condition of the Beyer et al. intersection estimator.
    Then with k' = min(k, |union distinct|):

      jaccard       = n_common / k'          (exact integers)
      union_est     = KMV estimate of the union sample
      intersect_est = jaccard * union_est    (one multiply)

    Everything before the two final float ops is exact integer
    selection, so the whole output hash-checks cross-engine. Cost:
    the sample table is bounded at groups * k rows, so every join
    here is over bounded frames — pair enumeration never touches the
    corpus.

    In-plan k-mismatch guard (the kmv_estimate/hll_m policy): a
    persisted sample read back under a different k would truncate
    every group at the OLD k and silently drive the exact-mode branch
    (n_union_obs < k) with a tiny fraction of the real union, so a
    kmv_k != k raises at execution."""
    from pyspark.sql import Window

    s = sample.select(
        F.col(group_col).alias("g"),
        F.when(F.col("kmv_k") == F.lit(k), F.col("hv"))
        .otherwise(
            F.raise_error(
                F.lit(
                    f"kmv_overlap(k={k}) over a sample built with a "
                    "different k (see the sample's kmv_k column)"
                )
            ).cast("long")
        )
        .alias("hv"),
    )
    groups = s.select("g").distinct()
    prs = (
        groups.select(F.col("g").alias("g_a"))
        .crossJoin(groups.select(F.col("g").alias("g_b")))
        .filter(F.col("g_a") < F.col("g_b"))
    )
    # one equi-join per side (an OR join would not hash-partition)
    in_a = prs.join(s.select(F.col("g").alias("g_a"), "hv"), "g_a").select(
        "g_a", "g_b", "hv", F.lit(1).alias("a"), F.lit(0).alias("b")
    )
    in_b = prs.join(s.select(F.col("g").alias("g_b"), "hv"), "g_b").select(
        "g_a", "g_b", "hv", F.lit(0).alias("a"), F.lit(1).alias("b")
    )
    merged = (
        in_a.unionByName(in_b)
        .groupBy("g_a", "g_b", "hv")
        .agg(F.max("a").alias("in_a"), F.max("b").alias("in_b"))
    )
    w = Window.partitionBy("g_a", "g_b").orderBy("hv")
    topk = merged.withColumn("pos", F.row_number().over(w)).filter(F.col("pos") <= k)
    agg = topk.groupBy("g_a", "g_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_union_obs"),
        F.max("hv").cast("long").alias("hv_k"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("n_common"),
        F.sum((F.col("in_a") * (1 - F.col("in_b"))).cast("long")).alias(
            "n_a_only"
        ),
        F.sum(((1 - F.col("in_a")) * F.col("in_b")).cast("long")).alias(
            "n_b_only"
        ),
    )
    numer = float(k - 1) * _KMV_SPACE
    union_est = F.when(
        F.col("n_union_obs") < k, F.col("n_union_obs").cast("double")
    ).otherwise(F.lit(numer) / F.col("hv_k").cast("double"))
    jac = F.col("n_common").cast("double") / F.col("n_union_obs").cast("double")
    exact_mode = F.col("n_union_obs") < k
    intersect = F.when(exact_mode, F.col("n_common").cast("double")).otherwise(
        jac * union_est
    )
    a_only = F.when(exact_mode, F.col("n_a_only").cast("double")).otherwise(
        F.col("n_a_only").cast("double")
        / F.col("n_union_obs").cast("double")
        * union_est
    )
    b_only = F.when(exact_mode, F.col("n_b_only").cast("double")).otherwise(
        F.col("n_b_only").cast("double")
        / F.col("n_union_obs").cast("double")
        * union_est
    )
    return agg.select(
        F.col("g_a"),
        F.col("g_b"),
        F.lit(k).cast("int").alias("kmv_k"),
        "n_union_obs",
        "n_common",
        "n_a_only",
        "n_b_only",
        "hv_k",
        jac.alias("jaccard"),
        union_est.alias("union_est"),
        intersect.alias("intersect_est"),
        a_only.alias("a_only_est"),
        b_only.alias("b_only_est"),
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries 1982; mergeability per
# Agarwal et al., "Mergeable Summaries", PODS 2012): the DETERMINISTIC
# counter-based frequency summary — k counters, no hashing, no
# probability. Complements the CMS above: CMS answers point queries
# over an unbounded watch list (one-sided OVER-estimate), MG tracks the
# top of the distribution with an UNDER-estimate and a certified error
# budget, and — unlike CMS — guarantees every item with true count
# > N/(k+1) is PRESENT in the summary, which is what a "top domains /
# top tokens while crawling" monitor actually needs.
#
# Guarantees carried through the distributed build below:
#   est(x) <= true(x)                                (never over)
#   true(x) - est(x) <= err_budget = sum of batch decrements
#   err_budget <= N / (k + 1)                        (certified bound)
#   true(x) > err_budget  =>  x is in the summary    (completeness)
# ---------------------------------------------------------------------------


def mg_truncate(counts, k: int):
    """THE Misra-Gries truncation algebra, in one place: exact counts
    (a pandas Series of count by item, any tie order) -> (kept
    counters, decrement d). d = the (k+1)-th largest count (0 when
    <= k distinct), kept = count - d where positive — the MG fixed
    point of that count multiset. The kept SET and d are independent
    of tie ordering among equal counts (ties at d truncate to zero).
    Shared by the per-Arrow-batch kernel below and the streaming
    per-microbatch re-truncation (streaming/pipeline.py:
    mg_summary_stream) so a tie-handling or budget-accounting change
    can never drift between the two paths (round-11 review)."""
    if len(counts) <= k:
        return counts, 0
    counts = counts.sort_values(ascending=False)
    d = int(counts.iloc[k])
    kept = counts.iloc[:k] - d
    return kept[kept > 0], d


def mg_partials(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-Arrow-batch Misra-Gries summaries of a column of items.

    Output: ``(item STRING, cnt BIGINT)`` where rows with item = NULL
    carry the batch's DECREMENT total d (its contribution to the error
    budget) and every other row an under-estimate counter. Each input
    batch emits at most k counter rows + 1 decrement row, so the
    Python stage's output — and its memory — is bounded by k per
    batch no matter how many distinct items the corpus holds: this is
    the sketch to reach for when even the vocabulary is too big for
    the exact term-count table (groupBy count's hash map is
    per-partition-vocabulary-sized; MG state is k).

    Per batch the summary is the Misra-Gries FIXED POINT computed
    directly from the batch's exact counts: d = the (k+1)-th largest
    count (0 if the batch has <= k distinct items), counters =
    count - d where positive. That satisfies est <= true and
    true - est <= d with (k+1) * d <= n_batch, and summing summaries
    across batches keeps both (Agarwal et al. Sec. 3.2: MG summaries
    merge by counter addition followed by an optional re-truncation —
    omitting the re-truncation only loosens the size bound, never the
    error, and here the merged frame is groupBy-compacted anyway).

    Plan shape at 100 TB: one JVM projection (cast to string), ONE
    Arrow crossing, and a map-side-combinable groupBy(item).sum over
    <= (k+1) * n_batches tiny rows. NULL items are quarantined (they
    carry no countable identity) like cms_build.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"mg_partials requires k >= 1, got {k}")

    def _partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            kept, d = mg_truncate(pdf["item"].value_counts(), k)
            out = pd.DataFrame({"item": kept.index, "cnt": kept.to_numpy()})
            if d:
                out = pd.concat(
                    [out, pd.DataFrame({"item": [None], "cnt": [d]})],
                    ignore_index=True,
                )
            yield out

    return (
        df.filter(F.col(item_col).isNotNull())
        .select(F.col(item_col).cast("string").alias("item"))
        .mapInPandas(_partial, schema="item string, cnt long")
    )


def mg_heavy_hitters(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Merged Misra-Gries summary: ``(item, est, err_budget)`` with at
    most k * n_batches rows before compaction and the guarantees in
    the family header — est is an under-estimate within ``err_budget``
    of the true count, err_budget <= N/(k+1), and every item whose
    true count exceeds err_budget is present. est values depend on the
    batch layout (any MG's do); the GUARANTEES are layout-invariant,
    which is exactly what the oracle row group and the
    partition-invariance tests pin.

    Plan shape: mg_partials (bounded Arrow stage) -> ONE map-side-
    combinable shuffle summing counters by item, with the NULL-item
    decrement rows riding the same aggregate as their own group. The
    summary and the 1-row budget frame both consume that aggregate;
    a LAZY localCheckpoint pins the compacted (tracked-items + 1)-row
    result so the corpus pass and the kernel run ONCE (Catalyst pushes
    the is[Not]Null split below the aggregate, making the two branches'
    exchanges physically different — ReusedExchange cannot dedup them;
    the minhash_lsh_pairs lesson applies: checkpoint the small frame,
    not the big lineage). Gated in test_plans: one MapInPandas, zero
    collect()s.
    """
    merged = (
        mg_partials(df, item_col, k)
        .groupBy("item")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return mg_finalize(merged)


def mg_finalize(merged: DataFrame) -> DataFrame:
    """Split a merged ``(item NULLABLE, cnt)`` Misra-Gries frame into
    the consumer view ``(item, est, err_budget)``: the NULL-item group
    is the accumulated decrement budget, everything else a counter.
    Shared by the batch operator above and the streaming summary
    reader (streaming/pipeline.py:read_mg_summary) so the decrement
    bookkeeping cannot drift between the two. A LAZY localCheckpoint
    pins the compacted (tracked-items + 1)-row frame so its one
    upstream pass runs once (Catalyst pushes the is[Not]Null split
    below the aggregate, making the two branches' exchanges physically
    different — ReusedExchange cannot dedup them; the
    minhash_lsh_pairs lesson: checkpoint the small frame, not the big
    lineage). Gated in test_plans: one MapInPandas, zero collect()s.

    When NOTHING is tracked (every counter truncated away — a stream
    of near-all-distinct items, exactly the vocabulary-too-big regime
    this sketch targets), the view is ONE row with item/est NULL
    carrying the budget: the certified error bound must stay
    observable, and an empty frame would be indistinguishable from
    'no input' (round-11 review). The sentinel rides a 1-row anti
    join (budget survives iff the summary is empty), so only 1-row
    frames are ever broadcast — the summary itself stays the probe
    side, never shipped.
    """
    merged = merged.select(
        "item", F.col("cnt").cast("bigint").alias("est")
    ).localCheckpoint(eager=False)
    summary = merged.filter(F.col("item").isNotNull())
    budget = merged.filter(F.col("item").isNull()).agg(
        F.coalesce(F.sum("est"), F.lit(0)).cast("bigint").alias("err_budget")
    )
    tracked = summary.crossJoin(F.broadcast(budget))
    sentinel = budget.join(
        F.broadcast(summary.limit(1)), F.lit(True), "left_anti"
    ).select(
        F.lit(None).cast("string").alias("item"),
        F.lit(None).cast("bigint").alias("est"),
        "err_budget",
    )
    return tracked.select("item", "est", "err_budget").unionByName(sentinel)
