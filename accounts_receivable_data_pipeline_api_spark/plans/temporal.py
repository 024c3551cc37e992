"""Temporal join corpus ([EXT]): as-of join, range join, approx
aggregates — operators Spark lacks as primitives, built as compositions
of DataFrame ops (SURVEY 'custom operators' guidance, option (a)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.star import load_table
from .registry import register


@register(
    "join_asof_purchase_signup",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, ts AS purchase_ts FROM events
      WHERE event_type = 'purchase'
    ),
    signups AS (
      SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup'
    )
    SELECT p.user_id, p.event_id, p.purchase_ts, s.signup_ts
    FROM purchases p ASOF LEFT JOIN signups s
      ON p.user_id = s.user_id AND p.purchase_ts >= s.signup_ts
    """,
    tags=("EXT", "TEMPORAL"),
    doc="As-of join: latest signup at-or-before each purchase, per user. "
    "Spark has no ASOF primitive; implemented as the union+last-non-null "
    "window composition — one shuffle on (user), no per-row subqueries, "
    "scales as a sort within user partitions.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts"), F.lit(0).alias("kind"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.lit(1).alias("kind"), "event_id"
    )
    unioned = signups.unionByName(purchases)
    # At equal ts the signup row (kind 0) sorts first => 'at-or-before'
    # is inclusive, matching DuckDB ASOF's >= semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof_ts = F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w)
    return (
        unioned.withColumn("signup_ts", asof_ts)
        .filter(F.col("kind") == 1)
        .select("user_id", "event_id", F.col("ts").alias("purchase_ts"), "signup_ts")
    )


@register(
    "join_range_followups",
    oracle="""
    SELECT s.user_id, s.event_id, COUNT(e.event_id) AS followups_5min
    FROM events s
    LEFT JOIN events e
      ON e.user_id = s.user_id
     AND e.ts > s.ts
     AND e.ts <= s.ts + INTERVAL 5 MINUTE
    WHERE s.event_type = 'signup' AND s.user_id < 40
    GROUP BY s.user_id, s.event_id
    """,
    tags=("EXT", "TEMPORAL"),
    doc="Range (interval) join: events within 5 minutes after each "
    "signup. Equi-join on user + range predicate => Spark executes as a "
    "hash join on user_id with the range as residual filter — the "
    "scalable shape (never a broadcast-nested-loop over the full fact).",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    signups = events.filter((F.col("event_type") == "signup") & (F.col("user_id") < 40)).select(
        "user_id", "event_id", "ts"
    )
    others = events.select(
        F.col("user_id").alias("e_user_id"),
        F.col("event_id").alias("e_event_id"),
        F.col("ts").alias("e_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("e_ts") > F.col("ts"))
        & (F.col("e_ts") <= F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        signups.join(others, cond, "left")
        .groupBy("user_id", "event_id")
        .agg(F.count("e_event_id").alias("followups_5min"))
    )


def _hll_oracle() -> str:
    from ..operators.sketch import HLL_HASH_BITS, hll_alpha

    alpha = hll_alpha(1024)
    rank_base = HLL_HASH_BITS + 1  # 49
    scale_pow = 1 << rank_base  # 2^49: per-register integer scale
    hash_space = float(1 << HLL_HASH_BITS)  # 2^48
    msq_scaled = float(1024) * float(1024) * float(scale_pow)
    large_thresh = hash_space / 30.0
    # KMV: (k-1) * 2^48 as ONE exact double literal, embedded via
    # repr() on both engines (the Beyer et al. estimator numerator)
    kmv_numer = float(256 - 1) * hash_space

    def hll_chain(prefix: str, src: str, key: str, label: str) -> str:
        """The register->estimate CTE chain (reg/regagg/est/est2), in
        one place — three instantiations (status, day grain, month
        grain) of the intricate estimator law, one copy (round-14
        review; the _hdr_bucket_ctes pattern). ``src`` must expose
        (key, bucket, w)."""
        return f"""
    {prefix}reg AS (
      SELECT {key}, bucket,
             MAX(CASE WHEN w = 0 THEN {rank_base}
                      ELSE CAST({rank_base} - length(bin(w)) AS INT) END)
               AS max_rank
      FROM {src} GROUP BY {key}, bucket
    ),
    {prefix}regagg AS (
      SELECT {key},
             CAST(COUNT(*) AS BIGINT) AS n_observed,
             CAST(SUM(CAST(1 AS BIGINT) << ({rank_base} - max_rank))
                  + (1024 - COUNT(*)) * {scale_pow} AS BIGINT) AS sum_scaled
      FROM {prefix}reg GROUP BY {key}
    ),
    {prefix}est AS (
      SELECT {key}, n_observed, sum_scaled,
             {alpha!r} * ({msq_scaled!r} / CAST(sum_scaled AS DOUBLE)) AS raw,
             1024 - n_observed AS v
      FROM {prefix}regagg
    ),
    {prefix}est2 AS (
      SELECT {key}, n_observed, sum_scaled,
             CASE WHEN raw <= 2560.0 AND v > 0
                  THEN round(1024.0 * ln(1024.0 / CAST(v AS DOUBLE)), 6)
                  -- saturation guard mirrors the Spark side's in-plan
                  -- raise (sketch.py:hll_estimate): past 0.99 * 2^48 no
                  -- correction recovers the count, so the oracle errors
                  -- loudly too instead of feeding ln() a non-positive
                  -- argument (unreachable at test scale by design)
                  WHEN raw >= {0.99 * hash_space!r}
                  THEN CAST(error('{label}: raw estimate saturates the '
                                  '48-bit hash space') AS DOUBLE)
                  WHEN raw > {large_thresh!r}
                  THEN round(-{hash_space!r} * ln(1.0 - raw / {hash_space!r}), 6)
                  ELSE round(raw, 6) END AS estimate
      FROM {prefix}est
    )"""

    return f"""
    WITH items AS (
      SELECT o_orderstatus, CAST(o_custkey AS VARCHAR) AS item
      FROM orders
    ),
    hashed AS (
      SELECT DISTINCT o_orderstatus,
             CAST('0x' || substr(md5('bhll:' || item), 1, 8) AS BIGINT) % 1024
               AS bucket,
             CAST('0x' || substr(md5('rhll:' || item), 1, 12) AS BIGINT) AS w
      FROM items
    ),
    {hll_chain('', 'hashed', 'o_orderstatus', 'hll oracle')},
    ex AS (
      SELECT o_orderstatus,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_orderstatus
    ),
    -- hll_rollup row groups (round 11): per-DAY registers over events
    -- users, computed DIRECTLY here — the Spark side derives them by
    -- MAX-merging per-(day, hour) registers, so the hash check proves
    -- the time-grain rollup law (max-merge associativity) cross-engine
    evitems AS (
      -- NULL users carry no countable identity: mirror of the Spark
      -- side's isNotNull quarantine in hll_registers (round-11 review:
      -- the testdata happens to have none, but events.user_id carries
      -- no non-null contract the way TPC-H o_custkey does)
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(user_id AS VARCHAR) AS item
      FROM events WHERE user_id IS NOT NULL
    ),
    evhashed AS (
      SELECT DISTINCT day,
             CAST('0x' || substr(md5('bhll:' || item), 1, 8) AS BIGINT) % 1024
               AS bucket,
             CAST('0x' || substr(md5('rhll:' || item), 1, 12) AS BIGINT) AS w
      FROM evitems
    ),
    {hll_chain('ev', 'evhashed', 'day', 'hll rollup oracle')},
    evex AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    -- hll_rollup_month row groups (round 14): per-MONTH registers
    -- computed DIRECTLY from the raw rows — the Spark side derives
    -- them by MAX-merging the per-(day, hour) partials straight to
    -- the month grain (the streaming grain-view law), so the hash
    -- check proves hourly->month == direct month cross-engine
    evmhashed AS (
      SELECT DISTINCT substr(day, 1, 7) AS mon, bucket, w FROM evhashed
    ),
    {hll_chain('evm', 'evmhashed', 'mon', 'hll month rollup oracle')},
    evmex AS (
      SELECT substr(CAST(CAST(ts AS DATE) AS VARCHAR), 1, 7) AS mon,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    -- count-min sketch over o_custkey (global): salted-md5 cells,
    -- exact mirror of operators/sketch.py:_cms_positions
    cpos AS (
      SELECT CAST(d.d AS INT) AS d,
             CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':'
                                     || CAST(o_custkey AS VARCHAR)), 1, 8)
                  AS BIGINT) % 512 AS pos
      FROM orders CROSS JOIN (SELECT unnest(range(0, 4)) AS d) d
    ),
    ccnt AS (
      SELECT d, pos, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cpos GROUP BY d, pos
    ),
    ckexact AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY o_custkey
    ),
    watch AS (
      SELECT CAST(o_custkey AS VARCHAR) AS item, cnt AS exact_cnt
      FROM ckexact ORDER BY cnt DESC, o_custkey ASC LIMIT 5
    ),
    wpos AS (
      SELECT w.item, w.exact_cnt, CAST(d.d AS INT) AS d,
             CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' || w.item),
                                 1, 8) AS BIGINT) % 512 AS pos
      FROM watch w CROSS JOIN (SELECT unnest(range(0, 4)) AS d) d
    ),
    -- left join + coalesce mirrors cms_lookup: an absent cell is a
    -- zero count (unreachable here — watch items come from the data —
    -- but the estimate definitions must match exactly)
    west AS (
      SELECT p.item, p.exact_cnt,
             CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est
      FROM wpos p LEFT JOIN ccnt c ON c.d = p.d AND c.pos = p.pos
      GROUP BY p.item, p.exact_cnt
    ),
    ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
    -- KMV sample: the NAIVE single-window formulation (the Spark side
    -- runs a two-level shard tree with identical output, so this
    -- comparison also proves the shard tree exact)
    kitems AS (
      SELECT DISTINCT o_orderstatus,
             CAST('0x' || substr(md5('kmv:' || CAST(o_custkey AS VARCHAR)),
                                 1, 12) AS BIGINT) AS hv
      FROM orders
    ),
    ksamp AS (
      SELECT o_orderstatus, hv, pos FROM (
        SELECT o_orderstatus, hv,
               CAST(row_number() OVER (PARTITION BY o_orderstatus
                                       ORDER BY hv) AS INT) AS pos
        FROM kitems
      ) WHERE pos <= 256
    ),
    kest AS (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(MAX(hv) AS BIGINT) AS hv_k,
             CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE {kmv_numer!r} / CAST(MAX(hv) AS DOUBLE) END AS estimate
      FROM ksamp GROUP BY o_orderstatus
    ),
    kg AS (SELECT DISTINCT o_orderstatus AS g FROM orders),
    kpr AS (SELECT a.g AS g_a, b.g AS g_b FROM kg a JOIN kg b ON a.g < b.g),
    kmerged AS (
      SELECT p.g_a, p.g_b, s.hv,
             MAX(CASE WHEN s.o_orderstatus = p.g_a THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN s.o_orderstatus = p.g_b THEN 1 ELSE 0 END) AS in_b
      FROM kpr p JOIN ksamp s ON s.o_orderstatus IN (p.g_a, p.g_b)
      GROUP BY p.g_a, p.g_b, s.hv
    ),
    ktop AS (
      SELECT g_a, g_b, hv, in_a, in_b FROM (
        SELECT g_a, g_b, hv, in_a, in_b,
               row_number() OVER (PARTITION BY g_a, g_b ORDER BY hv) AS pos
        FROM kmerged
      ) WHERE pos <= 256
    ),
    kov AS (
      SELECT g_a, g_b,
             CAST(COUNT(*) AS BIGINT) AS n_union_obs,
             CAST(MAX(hv) AS BIGINT) AS hv_k,
             CAST(SUM(in_a * in_b) AS BIGINT) AS n_common,
             CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS n_a_only,
             CAST(SUM((1 - in_a) * in_b) AS BIGINT) AS n_b_only
      FROM ktop GROUP BY g_a, g_b
    ),
    kov2 AS (
      SELECT g_a, g_b, n_union_obs, hv_k,
             CAST(n_common AS DOUBLE) / CAST(n_union_obs AS DOUBLE) AS jaccard,
             -- exact mode emits the integer counts directly: (a/n)*n
             -- is off by one ulp for ~30 percent of integer pairs, and
             -- the operator's exactness claim is literal (r10 review)
             CASE WHEN n_union_obs < 256 THEN CAST(n_a_only AS DOUBLE)
                  ELSE CAST(n_a_only AS DOUBLE) / CAST(n_union_obs AS DOUBLE)
                       * ({kmv_numer!r} / CAST(hv_k AS DOUBLE)) END AS a_only_est,
             CASE WHEN n_union_obs < 256 THEN CAST(n_b_only AS DOUBLE)
                  ELSE CAST(n_b_only AS DOUBLE) / CAST(n_union_obs AS DOUBLE)
                       * ({kmv_numer!r} / CAST(hv_k AS DOUBLE)) END AS b_only_est,
             CASE WHEN n_union_obs < 256 THEN CAST(n_common AS DOUBLE)
                  ELSE (CAST(n_common AS DOUBLE) / CAST(n_union_obs AS DOUBLE))
                       * ({kmv_numer!r} / CAST(hv_k AS DOUBLE)) END
               AS intersect_est,
             CASE WHEN n_union_obs < 256 THEN CAST(n_union_obs AS DOUBLE)
                  ELSE {kmv_numer!r} / CAST(hv_k AS DOUBLE) END AS union_est
      FROM kov
    ),
    kcu AS (SELECT DISTINCT o_orderstatus AS g, o_custkey AS c FROM orders),
    kisect AS (
      SELECT p.g_a, p.g_b, CAST(COUNT(*) AS BIGINT) AS exact_isect
      FROM kpr p
        JOIN kcu a ON a.g = p.g_a
        JOIN kcu b ON b.g = p.g_b AND b.c = a.c
      GROUP BY p.g_a, p.g_b
    ),
    kuni AS (
      SELECT p.g_a, p.g_b, CAST(COUNT(DISTINCT s.c) AS BIGINT) AS exact_uni
      FROM kpr p JOIN kcu s ON s.g IN (p.g_a, p.g_b)
      GROUP BY p.g_a, p.g_b
    )
    SELECT 'spark_hllpp' AS kind, o_orderstatus, exact_customers, n_orders,
           TRUE AS within_bound,
           CAST(NULL AS BIGINT) AS hll_bucket, CAST(NULL AS INT) AS hll_rank,
           CAST(NULL AS INT) AS hll_m, CAST(NULL AS BIGINT) AS hll_observed,
           CAST(NULL AS BIGINT) AS hll_sum_scaled,
           CAST(NULL AS DOUBLE) AS hll_estimate,
           CAST(NULL AS INT) AS cms_d, CAST(NULL AS BIGINT) AS cms_pos,
           CAST(NULL AS BIGINT) AS cms_cnt, CAST(NULL AS VARCHAR) AS cms_item,
           CAST(NULL AS BIGINT) AS cms_est, CAST(NULL AS BIGINT) AS cms_exact,
           CAST(NULL AS INT) AS kmv_pos, CAST(NULL AS BIGINT) AS kmv_hv,
           CAST(NULL AS DOUBLE) AS kmv_est, CAST(NULL AS DOUBLE) AS kmv_jaccard,
           CAST(NULL AS DOUBLE) AS kmv_union
    FROM ex
    UNION ALL
    SELECT 'hll_register', o_orderstatus, NULL, NULL, NULL,
           bucket, max_rank, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL
    FROM reg
    UNION ALL
    SELECT 'hll_estimate', e.o_orderstatus, x.exact_customers, NULL,
           abs(e.estimate - CAST(x.exact_customers AS DOUBLE))
             / CAST(x.exact_customers AS DOUBLE) <= 0.15,
           NULL, NULL, CAST(1024 AS INT), e.n_observed, e.sum_scaled,
           e.estimate,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL
    FROM est2 e JOIN ex x USING (o_orderstatus)
    UNION ALL
    SELECT 'hll_rollup_register', day, NULL, NULL, NULL,
           bucket, max_rank, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL
    FROM evreg
    UNION ALL
    SELECT 'hll_rollup_estimate', e.day, x.exact_users, x.n_events,
           abs(e.estimate - CAST(x.exact_users AS DOUBLE))
             / CAST(x.exact_users AS DOUBLE) <= 0.15,
           NULL, NULL, CAST(1024 AS INT), e.n_observed, e.sum_scaled,
           e.estimate,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL
    FROM evest2 e JOIN evex x USING (day)
    UNION ALL
    SELECT 'hll_rollup_month_register', mon, NULL, NULL, NULL,
           bucket, max_rank, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL
    FROM evmreg
    UNION ALL
    SELECT 'hll_rollup_month_estimate', e.mon, x.exact_users, x.n_events,
           abs(e.estimate - CAST(x.exact_users AS DOUBLE))
             / CAST(x.exact_users AS DOUBLE) <= 0.15,
           NULL, NULL, CAST(1024 AS INT), e.n_observed, e.sum_scaled,
           e.estimate,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL
    FROM evmest2 e JOIN evmex x USING (mon)
    UNION ALL
    SELECT 'cms_counter', CAST(NULL AS VARCHAR), NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL, NULL,
           d, pos, cnt, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL
    FROM ccnt
    UNION ALL
    SELECT 'cms_estimate', CAST(NULL AS VARCHAR), NULL, ntot.n,
           w.est >= w.exact_cnt
             AND (w.est - w.exact_cnt) * 512 <= 3 * ntot.n,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, w.item, w.est, w.exact_cnt,
           NULL, NULL, NULL, NULL, NULL
    FROM west w CROSS JOIN ntot
    UNION ALL
    SELECT 'kmv_sample', o_orderstatus, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL, NULL,
           pos, hv, NULL, NULL, NULL
    FROM ksamp
    UNION ALL
    SELECT 'kmv_estimate', e.o_orderstatus, x.exact_customers, NULL,
           abs(e.estimate - CAST(x.exact_customers AS DOUBLE))
             / CAST(x.exact_customers AS DOUBLE) <= 0.2,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, e.hv_k, e.estimate, NULL, NULL
    FROM kest e JOIN ex x USING (o_orderstatus)
    UNION ALL
    SELECT 'kmv_overlap', o.g_a || '|' || o.g_b,
           COALESCE(i.exact_isect, 0), u.exact_uni,
           abs(o.union_est - CAST(u.exact_uni AS DOUBLE))
             / CAST(u.exact_uni AS DOUBLE) <= 0.2
           AND abs(o.intersect_est
                   - CAST(COALESCE(i.exact_isect, 0) AS DOUBLE))
             <= 0.3 * CAST(u.exact_uni AS DOUBLE),
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, o.hv_k, o.intersect_est, o.jaccard, o.union_est
    FROM kov2 o
      JOIN kuni u ON u.g_a = o.g_a AND u.g_b = o.g_b
      LEFT JOIN kisect i ON i.g_a = o.g_a AND i.g_b = o.g_b
    UNION ALL
    -- A-NOT-B (set difference) estimates, round 10: exact
    -- |A\\B| = |A u B| - |B|, |B\\A| = |A u B| - |A|; slots
    -- kmv_est = a_only_est, kmv_jaccard = b_only_est,
    -- kmv_union = union_est (the partition identity rides along)
    SELECT 'kmv_difference', o.g_a || '|' || o.g_b,
           u.exact_uni - xb.exact_customers,
           u.exact_uni - xa.exact_customers,
           abs(o.a_only_est
               - CAST(u.exact_uni - xb.exact_customers AS DOUBLE))
             <= 0.3 * CAST(u.exact_uni AS DOUBLE)
           AND abs(o.b_only_est
                   - CAST(u.exact_uni - xa.exact_customers AS DOUBLE))
             <= 0.3 * CAST(u.exact_uni AS DOUBLE),
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, o.hv_k, o.a_only_est, o.b_only_est,
           o.union_est
    FROM kov2 o
      JOIN kuni u ON u.g_a = o.g_a AND u.g_b = o.g_b
      JOIN ex xa ON xa.o_orderstatus = o.g_a
      JOIN ex xb ON xb.o_orderstatus = o.g_b
    """


@register(
    "agg_approx_distinct",
    oracle=_hll_oracle(),
    tags=("EXT", "A"),
    doc="Distinct-count sketch gauntlet per order status, one row group "
    "per kind (round-7 consolidation). kind='spark_hllpp': the built-in "
    "approx_count_distinct (HLL++, rsd=0.01) invariant — its sketch "
    "bytes are engine-private, so the oracle pins within_bound = "
    "|approx - exact| / exact <= 3*rsd TRUE (measured max 0.7%) with "
    "exact_customers / n_orders as real cross-engine values. "
    "kind='hll_register' + 'hll_estimate': the engine-PORTABLE "
    "HyperLogLog (operators/sketch.py:hll_registers/hll_estimate) whose "
    "EVERY register (md5-bucket, 48-bit rank hash, rank = 49 - "
    "length(bin(w))) and whose estimate (integer-scaled register sum, "
    "alpha_m bias correction, linear-counting small-range + large-range "
    "correction branches under round-6 ln) the DuckDB oracle recomputes "
    "value-for-value — a fully hash-checked HLL, not just a bound. The register table is the mergeable partial: union "
    "of sketches = groupBy max over buckets, map-side combinable, "
    "bounded at groups * m rows at any corpus size. "
    "kind='hll_rollup_register' + 'hll_rollup_estimate' (round 11): "
    "the hypertable-style TIME-GRAIN rollup — per-(day, hour) "
    "register partials over events users MAX-merged up to per-day "
    "registers; the oracle computes day registers DIRECTLY from the "
    "raw rows, so the hash check proves hourly->daily == direct "
    "daily (merge-law associativity along time, the continuous-"
    "aggregate pattern: persist the finest grain, derive coarser "
    "grains by one map-side-combinable groupBy max, never re-scan "
    "raw events); the estimate arm prices the rolled-up registers "
    "with exact per-day distincts as fixtures. "
    "kind='hll_rollup_month_register' + 'hll_rollup_month_estimate' "
    "(round 14): the MONTH grain joins the scoreboard — hourly "
    "partials MAX-merged DIRECTLY to month (the streaming grain-view "
    "law, streaming/pipeline.py:read_monthly_distinct) against an "
    "oracle that computes month registers straight from the raw rows, "
    "proving hourly->month == direct month cross-engine. "
    "kind='cms_counter' + 'cms_estimate' (round 9): the count-min "
    "sketch joins the scoreboard — every (d, pos) counter cell of a "
    "4x512 CMS over o_custkey (operators/sketch.py:cms_counters, one "
    "map-side-combinable shuffle, SUM-mergeable) plus point estimates "
    "for the 5 hottest keys (cms_lookup: min over depth cells, watch "
    "list broadcast). within_bound pins the CMS contract: one-sided "
    "(est >= exact) AND (est - exact) * width <= 3 * N (the eps*N "
    "overcount bound in pure integer arithmetic). At 100 TB only the "
    "sketch paths run — exact COUNT(DISTINCT) / per-key exact counts "
    "are the verification fixtures. "
    "kind='kmv_sample' + 'kmv_estimate' + 'kmv_overlap' (round 9): the "
    "KMV / theta-style set-OPERATION sketch "
    "(operators/sketch.py:kmv_sample/kmv_estimate/kmv_overlap) — the "
    "k=256 smallest distinct 48-bit custkey fingerprints per status "
    "(EXACT integer selection, every sample row hash-checked; Spark "
    "runs a two-level shard-tree bottom-k, the oracle the naive "
    "single window, so the check also proves the tree exact), the "
    "Beyer et al. (k-1)*2^48/hv_k distinct estimate (one IEEE "
    "division, no rounding contract at all), and pairwise "
    "union/intersection/Jaccard estimates between statuses — the "
    "set-operation question an HLL register table cannot answer. "
    "within_bound pins union_est within 20% of the exact union and "
    "intersect_est within 0.3*union additively; exact pair overlaps "
    "are fixtures like the exact distinct counts. "
    "kind='kmv_difference' (round 10): the theta A-NOT-B estimates "
    "from the SAME union sample — the union's k-min partitions "
    "exactly into a-only/b-only/common counts, each estimate is its "
    "sample fraction times union_est (inclusion-consistent: the three "
    "partition union_est), exact fixtures via |A\\\\B| = |AuB| - |B|; "
    "slot reuse documented in-line (kmv_est = a_only_est, "
    "kmv_jaccard = b_only_est, kmv_union = union_est); error scales "
    "with the UNION per the theta framework — pinned additively at "
    "0.3*union like the intersection.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import (
        cms_counters,
        cms_lookup,
        hll_estimate,
        hll_merge_registers,
        hll_registers,
        kmv_estimate,
        kmv_overlap,
        kmv_sample,
    )

    orders = load_table(spark, sf_dir, "orders")
    group = ("o_orderstatus",)
    kmv_nulls = [
        F.lit(None).cast("int").alias("kmv_pos"),
        F.lit(None).cast("bigint").alias("kmv_hv"),
        F.lit(None).cast("double").alias("kmv_est"),
        F.lit(None).cast("double").alias("kmv_jaccard"),
        F.lit(None).cast("double").alias("kmv_union"),
    ]
    cms_nulls = [
        F.lit(None).cast("int").alias("cms_d"),
        F.lit(None).cast("bigint").alias("cms_pos"),
        F.lit(None).cast("bigint").alias("cms_cnt"),
        F.lit(None).cast("string").alias("cms_item"),
        F.lit(None).cast("bigint").alias("cms_est"),
        F.lit(None).cast("bigint").alias("cms_exact"),
    ]
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_customers"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers"),
    )
    hll_nulls = [
        F.lit(None).cast("bigint").alias("hll_bucket"),
        F.lit(None).cast("int").alias("hll_rank"),
        F.lit(None).cast("int").alias("hll_m"),
        F.lit(None).cast("bigint").alias("hll_observed"),
        F.lit(None).cast("bigint").alias("hll_sum_scaled"),
        F.lit(None).cast("double").alias("hll_estimate"),
    ]
    spark_arm = exact.select(
        F.lit("spark_hllpp").alias("kind"),
        "o_orderstatus",
        "exact_customers",
        "n_orders",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            / F.col("exact_customers")
            <= F.lit(0.03)
        ).alias("within_bound"),
        *hll_nulls,
        *cms_nulls,
        *kmv_nulls,
    )
    reg = hll_registers(orders, "o_custkey", m=1024, group_cols=group)
    reg_arm = reg.select(
        F.lit("hll_register").alias("kind"),
        "o_orderstatus",
        F.lit(None).cast("bigint").alias("exact_customers"),
        F.lit(None).cast("bigint").alias("n_orders"),
        F.lit(None).cast("boolean").alias("within_bound"),
        F.col("bucket").alias("hll_bucket"),
        F.col("max_rank").alias("hll_rank"),
        F.lit(None).cast("int").alias("hll_m"),
        F.lit(None).cast("bigint").alias("hll_observed"),
        F.lit(None).cast("bigint").alias("hll_sum_scaled"),
        F.lit(None).cast("double").alias("hll_estimate"),
        *cms_nulls,
        *kmv_nulls,
    )
    est_arm = (
        hll_estimate(reg, m=1024, group_cols=group)
        .join(exact.select("o_orderstatus", "exact_customers"), "o_orderstatus")
        .select(
            F.lit("hll_estimate").alias("kind"),
            "o_orderstatus",
            "exact_customers",
            F.lit(None).cast("bigint").alias("n_orders"),
            (
                F.abs(F.col("estimate") - F.col("exact_customers").cast("double"))
                / F.col("exact_customers").cast("double")
                <= F.lit(0.15)
            ).alias("within_bound"),
            F.lit(None).cast("bigint").alias("hll_bucket"),
            F.lit(None).cast("int").alias("hll_rank"),
            F.col("hll_m"),
            F.col("n_observed").alias("hll_observed"),
            F.col("sum_scaled").alias("hll_sum_scaled"),
            F.col("estimate").alias("hll_estimate"),
            *cms_nulls,
            *kmv_nulls,
        )
    )
    hll_null_all = [
        F.lit(None).cast("bigint").alias("hll_bucket"),
        F.lit(None).cast("int").alias("hll_rank"),
        F.lit(None).cast("int").alias("hll_m"),
        F.lit(None).cast("bigint").alias("hll_observed"),
        F.lit(None).cast("bigint").alias("hll_sum_scaled"),
        F.lit(None).cast("double").alias("hll_estimate"),
    ]
    # hll_rollup row groups (round 11): the hypertable-style TIME-GRAIN
    # rollup — per-(day, hour) register partials over events users,
    # MAX-merged up to per-day registers (the mergeable-partial law
    # applied along time instead of shards). The oracle computes the
    # day registers DIRECTLY from the raw rows, so the hash check
    # proves hourly->daily rollup == direct daily, cross-engine; the
    # estimate arm then prices the rolled-up registers with exact
    # per-day distinct users as fixtures. At 100 TB only register
    # partials persist per grain cell (bounded at cells * m rows) and
    # coarser grains are one map-side-combinable groupBy max away —
    # never a re-scan of the raw events.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hr"),
    )
    hr_reg = hll_registers(ev, "user_id", m=1024, group_cols=("day", "hr"))

    def rollup_arms(grain_reg, key, kind_prefix):
        """One grain's (register, estimate) arm pair — shared by the
        day and month grains (round-14 review: the arm builders were
        the Python-side copy of the oracle's CTE-chain duplication).
        ``grain_reg``: a merged register frame keyed by ``key``;
        ``kind_prefix``: the row-group kind stem. The estimate arm
        joins exact per-grain distincts computed from the SAME ev
        frame, so fixtures and sketch always cover identical rows."""
        reg_a = grain_reg.select(
            F.lit(f"{kind_prefix}_register").alias("kind"),
            F.col(key).cast("string").alias("o_orderstatus"),
            F.lit(None).cast("bigint").alias("exact_customers"),
            F.lit(None).cast("bigint").alias("n_orders"),
            F.lit(None).cast("boolean").alias("within_bound"),
            F.col("bucket").alias("hll_bucket"),
            F.col("max_rank").alias("hll_rank"),
            F.lit(None).cast("int").alias("hll_m"),
            F.lit(None).cast("bigint").alias("hll_observed"),
            F.lit(None).cast("bigint").alias("hll_sum_scaled"),
            F.lit(None).cast("double").alias("hll_estimate"),
            *cms_nulls,
            *kmv_nulls,
        )
        grain_col = (
            F.col("day") if key == "day" else F.date_format("day", "yyyy-MM")
        )
        exact_grain = ev.groupBy(grain_col.alias(key)).agg(
            F.countDistinct("user_id").cast("bigint").alias("exact_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        est_a = (
            hll_estimate(grain_reg, m=1024, group_cols=(key,))
            .join(exact_grain, key)
            .select(
                F.lit(f"{kind_prefix}_estimate").alias("kind"),
                F.col(key).cast("string").alias("o_orderstatus"),
                F.col("exact_users").alias("exact_customers"),
                F.col("n_events").alias("n_orders"),
                (
                    F.abs(
                        F.col("estimate") - F.col("exact_users").cast("double")
                    )
                    / F.col("exact_users").cast("double")
                    <= F.lit(0.15)
                ).alias("within_bound"),
                F.lit(None).cast("bigint").alias("hll_bucket"),
                F.lit(None).cast("int").alias("hll_rank"),
                F.col("hll_m"),
                F.col("n_observed").alias("hll_observed"),
                F.col("sum_scaled").alias("hll_sum_scaled"),
                F.col("estimate").alias("hll_estimate"),
                *cms_nulls,
                *kmv_nulls,
            )
        )
        return reg_a, est_a

    roll_reg_arm, roll_est_arm = rollup_arms(
        hll_merge_registers(hr_reg, group_cols=("day",)), "day", "hll_rollup"
    )
    # hll_rollup_month row groups (round 14, the VERDICT #3 ask): the
    # month grain joins the scoreboard with the SAME shape the
    # streaming grain views use (streaming/pipeline.py:
    # read_monthly_distinct) — hourly partials MAX-merged to month
    # DIRECTLY, skipping the day grain (exact by merge associativity).
    # The oracle computes month registers DIRECTLY from raw rows, so
    # the hash check proves hourly->month == direct month cross-engine
    # — the treatment the day grain got in round 11, one step deeper.
    roll_mon_reg_arm, roll_mon_est_arm = rollup_arms(
        hll_merge_registers(
            hr_reg.withColumn("month", F.date_format("day", "yyyy-MM")),
            group_cols=("month",),
        ),
        "month",
        "hll_rollup_month",
    )
    counters = cms_counters(orders, "o_custkey", depth=4, width=512)
    counter_arm = counters.select(
        F.lit("cms_counter").alias("kind"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("bigint").alias("exact_customers"),
        F.lit(None).cast("bigint").alias("n_orders"),
        F.lit(None).cast("boolean").alias("within_bound"),
        *hll_null_all,
        F.col("d").cast("int").alias("cms_d"),
        F.col("pos").cast("bigint").alias("cms_pos"),
        F.col("cnt").cast("bigint").alias("cms_cnt"),
        F.lit(None).cast("string").alias("cms_item"),
        F.lit(None).cast("bigint").alias("cms_est"),
        F.lit(None).cast("bigint").alias("cms_exact"),
        *kmv_nulls,
    )
    # watch-list: 5 hottest custkeys, ties broken by key — deterministic
    watch = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("o_custkey"))
        .limit(5)
    )
    n_total = orders.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    est_rows = (
        cms_lookup(counters, watch, "o_custkey", depth=4, width=512)
        .join(watch.select(F.col("o_custkey").cast("string").alias("item"), "exact_cnt"), "item")
        .crossJoin(F.broadcast(n_total))
    )
    cms_est_arm = est_rows.select(
        F.lit("cms_estimate").alias("kind"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("bigint").alias("exact_customers"),
        F.col("n_total").alias("n_orders"),
        (
            (F.col("cms_est") >= F.col("exact_cnt"))
            & ((F.col("cms_est") - F.col("exact_cnt")) * 512 <= 3 * F.col("n_total"))
        ).alias("within_bound"),
        *hll_null_all,
        F.lit(None).cast("int").alias("cms_d"),
        F.lit(None).cast("bigint").alias("cms_pos"),
        F.lit(None).cast("bigint").alias("cms_cnt"),
        F.col("item").alias("cms_item"),
        F.col("cms_est"),
        F.col("exact_cnt").alias("cms_exact"),
        *kmv_nulls,
    )
    # Column objects are reusable across selects — the KMV arms reuse
    # the same cms_nulls list the earlier arms use (one definition)
    cms_null_all = cms_nulls
    # --- KMV arms (round 9): the set-OPERATION sketch the HLL cannot
    # be — per-status k-min samples, their distinct estimates, and
    # pairwise union/intersection/Jaccard estimates between statuses,
    # every row exact integer selection until the final IEEE division
    # (operators/sketch.py:kmv_sample/kmv_estimate/kmv_overlap).
    ksample = kmv_sample(orders, "o_custkey", k=256, group_cols=group)
    ksample_arm = ksample.select(
        F.lit("kmv_sample").alias("kind"),
        "o_orderstatus",
        F.lit(None).cast("bigint").alias("exact_customers"),
        F.lit(None).cast("bigint").alias("n_orders"),
        F.lit(None).cast("boolean").alias("within_bound"),
        *hll_null_all,
        *cms_null_all,
        F.col("pos").alias("kmv_pos"),
        F.col("hv").alias("kmv_hv"),
        F.lit(None).cast("double").alias("kmv_est"),
        F.lit(None).cast("double").alias("kmv_jaccard"),
        F.lit(None).cast("double").alias("kmv_union"),
    )
    kest_arm = (
        kmv_estimate(ksample, k=256, group_cols=group)
        .join(exact.select("o_orderstatus", "exact_customers"), "o_orderstatus")
        .select(
            F.lit("kmv_estimate").alias("kind"),
            "o_orderstatus",
            "exact_customers",
            F.lit(None).cast("bigint").alias("n_orders"),
            (
                F.abs(F.col("estimate") - F.col("exact_customers").cast("double"))
                / F.col("exact_customers").cast("double")
                <= F.lit(0.2)
            ).alias("within_bound"),
            *hll_null_all,
            *cms_null_all,
            F.lit(None).cast("int").alias("kmv_pos"),
            F.col("hv_k").alias("kmv_hv"),
            F.col("estimate").alias("kmv_est"),
            F.lit(None).cast("double").alias("kmv_jaccard"),
            F.lit(None).cast("double").alias("kmv_union"),
        )
    )
    # exact pairwise fixtures (verification only — never the scale
    # path, like the exact COUNT DISTINCT next to the HLL arms)
    cu = orders.select("o_orderstatus", "o_custkey").distinct()
    ia = cu.select(F.col("o_orderstatus").alias("g_a"), F.col("o_custkey").alias("c"))
    ib = cu.select(F.col("o_orderstatus").alias("g_b"), F.col("o_custkey").alias("c"))
    exact_i = (
        ia.join(ib, "c")
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_isect"))
    )
    statuses = cu.select(F.col("o_orderstatus").alias("g")).distinct()
    prs = (
        statuses.select(F.col("g").alias("g_a"))
        .crossJoin(statuses.select(F.col("g").alias("g_b")))
        .filter(F.col("g_a") < F.col("g_b"))
    )
    exact_u = (
        prs.join(ia, "g_a")
        .select("g_a", "g_b", "c")
        .unionByName(prs.join(ib, "g_b").select("g_a", "g_b", "c"))
        .groupBy("g_a", "g_b")
        .agg(F.countDistinct("c").cast("bigint").alias("exact_uni"))
    )
    # left join + coalesce: a pair with ZERO shared customers must
    # still surface with exact_isect = 0, not vanish (round-9 review
    # class: inner joins silently dropping zero-traffic rows)
    # ONE joined frame feeds both pairwise arms (overlap + difference)
    # so they cannot drift semantically; physically each union arm
    # still re-derives the lineage, and Spark dedups it only if the
    # exchanges come out identical (ReusedExchange is best-effort —
    # the differing downstream joins can defeat it). Left as-is: the
    # frame is status-pairs-bounded (a handful of rows at any SF), so
    # a checkpoint would cost more than the possible double-build
    # (round-10 ADVICE — don't overclaim subtree sharing).
    kovx = kmv_overlap(ksample, "o_orderstatus", k=256).join(
        exact_u, ["g_a", "g_b"]
    )
    kov_arm = (
        kovx
        .join(exact_i, ["g_a", "g_b"], "left")
        .select(
            F.lit("kmv_overlap").alias("kind"),
            F.concat(F.col("g_a"), F.lit("|"), F.col("g_b")).alias("o_orderstatus"),
            F.coalesce(F.col("exact_isect"), F.lit(0)).cast("bigint").alias("exact_customers"),
            F.col("exact_uni").alias("n_orders"),
            (
                (
                    F.abs(F.col("union_est") - F.col("exact_uni").cast("double"))
                    / F.col("exact_uni").cast("double")
                    <= F.lit(0.2)
                )
                & (
                    F.abs(
                        F.col("intersect_est")
                        - F.coalesce(F.col("exact_isect"), F.lit(0)).cast("double")
                    )
                    <= F.lit(0.3) * F.col("exact_uni").cast("double")
                )
            ).alias("within_bound"),
            *hll_null_all,
            *cms_null_all,
            F.lit(None).cast("int").alias("kmv_pos"),
            F.col("hv_k").alias("kmv_hv"),
            F.col("intersect_est").alias("kmv_est"),
            F.col("jaccard").alias("kmv_jaccard"),
            F.col("union_est").alias("kmv_union"),
        )
    )
    # --- A-NOT-B (set difference) arm, round 10: the third theta-style
    # set operation from the SAME union sample — exact |A\B| fixtures
    # via the identity |A\B| = |A u B| - |B|; slots kmv_est/kmv_jaccard
    # carry a_only_est/b_only_est (documented slot reuse), kmv_union
    # carries union_est so the partition identity rides along.
    exact_a = exact.select(
        F.col("o_orderstatus").alias("g_a"),
        F.col("exact_customers").alias("_exact_a"),
    )
    exact_b = exact.select(
        F.col("o_orderstatus").alias("g_b"),
        F.col("exact_customers").alias("_exact_b"),
    )
    kdiff_arm = (
        kovx.join(exact_a, "g_a")
        .join(exact_b, "g_b")
        .select(
            F.lit("kmv_difference").alias("kind"),
            F.concat(F.col("g_a"), F.lit("|"), F.col("g_b")).alias("o_orderstatus"),
            (F.col("exact_uni") - F.col("_exact_b")).cast("bigint").alias(
                "exact_customers"
            ),
            (F.col("exact_uni") - F.col("_exact_a")).cast("bigint").alias(
                "n_orders"
            ),
            (
                (
                    F.abs(
                        F.col("a_only_est")
                        - (F.col("exact_uni") - F.col("_exact_b")).cast("double")
                    )
                    <= F.lit(0.3) * F.col("exact_uni").cast("double")
                )
                & (
                    F.abs(
                        F.col("b_only_est")
                        - (F.col("exact_uni") - F.col("_exact_a")).cast("double")
                    )
                    <= F.lit(0.3) * F.col("exact_uni").cast("double")
                )
            ).alias("within_bound"),
            *hll_null_all,
            *cms_null_all,
            F.lit(None).cast("int").alias("kmv_pos"),
            F.col("hv_k").alias("kmv_hv"),
            F.col("a_only_est").alias("kmv_est"),
            F.col("b_only_est").alias("kmv_jaccard"),
            F.col("union_est").alias("kmv_union"),
        )
    )
    return (
        spark_arm.unionByName(reg_arm)
        .unionByName(est_arm)
        .unionByName(roll_reg_arm)
        .unionByName(roll_est_arm)
        .unionByName(roll_mon_reg_arm)
        .unionByName(roll_mon_est_arm)
        .unionByName(counter_arm)
        .unionByName(cms_est_arm)
        .unionByName(ksample_arm)
        .unionByName(kest_arm)
        .unionByName(kov_arm)
        .unionByName(kdiff_arm)
    )


@register(
    "window_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("EXT", "TEMPORAL", "STREAM"),
    doc="Batch sessionization (30-min inactivity gap) as lag + running "
    "sum + groupBy — the oracle-checked twin of the streaming "
    "applyInPandasWithState sessionizer (streaming/pipeline.py), "
    "pinning the same session semantics in SQL.",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # Exact-microsecond gap (unix_micros), matching both the oracle's
    # `> INTERVAL 30 MINUTE` comparison and the streaming sessionizer's
    # kernel — a whole-second cast would misclassify gaps within ~1s of
    # the 1800s boundary (round-2 ADVICE.md fix). The parquet column is
    # TIMESTAMP_NTZ (no tz annotation); unix_micros requires TIMESTAMP,
    # and with the session TZ pinned to UTC the cast is a pure
    # reinterpretation (gap differences are TZ-invariant regardless).
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    marked = events.withColumn(
        "new_session",
        F.when(
            micros - F.lag(micros).over(w) > 1_800_000_000,
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn("session_id", F.sum("new_session").over(wrun).cast("bigint"))
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "window_frames",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS moving_sum3,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS frame_n
    FROM events
    """,
    tags=("EXT", "TEMPORAL", "W"),
    doc="All three window-frame shapes in ONE pass over the event "
    "stream (merged from the former window_lag_gap / window_running_sum "
    "/ window_sliding_frame entries): lag() sequence gap in exact "
    "microseconds, running total (ROWS UNBOUNDED PRECEDING), and a "
    "3-event sliding frame (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). "
    "Every frame spec shares the same (user_id)/(ts, event_id) window, "
    "so Spark evaluates all four columns after a single shuffle+sort — "
    "the cheapest plan that hash-pins lag, unbounded, and bounded "
    "frames together. Decimal-exact sums, full tie-break.",
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wslide = w.rowsBetween(-2, Window.currentRow)
    # NTZ-safe micros: see window_sessionize (UTC session => no shift).
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    money = F.col("value").cast("decimal(18,2)")
    return events.select(
        "user_id",
        "event_id",
        (micros - F.lag(micros).over(w)).alias("gap_us"),
        F.sum(money).over(wrun).cast("double").alias("running_total"),
        F.sum(money).over(wslide).cast("double").alias("moving_sum3"),
        F.count(F.lit(1)).over(wslide).cast("bigint").alias("frame_n"),
    )
