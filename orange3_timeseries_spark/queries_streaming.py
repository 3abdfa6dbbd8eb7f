"""Driver-contract query for the Structured Streaming tier (SURVEY §2.4
streaming face): the same event-time windowed aggregation the batch tier
runs, executed through ``readStream`` -> windowed ``groupBy`` ->
``writeStream`` with ``trigger(availableNow=True)`` batch replay, so the
streaming path gets a hard DuckDB value-hash correctness signal instead
of a rows-only check.

Tumbling 1-hour windows are epoch-aligned in Spark (``F.window``) and in
DuckDB (``date_trunc('hour', ...)``), so the oracle replays the window
assignment exactly.  At scale the identical plan runs continuously: the
watermark bounds in-flight window state per (user, window) key across
executors.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from orange3_timeseries_spark.queries import query, r6
from orange3_timeseries_spark.sources import read_table, read_table_stream
from orange3_timeseries_spark.streaming.ops import (
    run_to_memory,
    run_to_memory_isolated,
    stream_asof_join,
    stream_difference,
    stream_interval_join,
    stream_session_window,
    stream_time_slice,
    stream_window_aggregation,
)


def _state_width(spark, sf_dir, name="events"):
    """State-store instance count for a replay of one table: proportional
    to the table's bytes (``scaled_width``), full parallelism at real
    volume — 32 state-store setups for kilobytes of state cost more than
    the aggregation itself (measured 8.8 s -> 2.2 s at sf0.1)."""
    from orange3_timeseries_spark.operators.partitioning import scaled_width
    return scaled_width(read_table(spark, sf_dir, name),
                        bytes_per_task=256 << 10)


@query("streaming_hourly_window", """
SELECT user_id,
       date_trunc('hour', ts) AS win_start,
       count(*) AS n,
       round(avg(value), 6) AS mean_v,
       round(sum(value), 6) AS sum_v
FROM events
GROUP BY 1, 2
""")
def q_streaming_hourly_window(spark, sf_dir):
    """Per-user tumbling 1-hour window mean/sum over the events STREAM
    (file-source parquet stream, availableNow replay, complete output to
    the memory sink) — value-hash-checked against the equivalent batch
    GROUP BY in DuckDB."""
    def build(s):
        sdf = read_table_stream(s, sf_dir, "events")
        agg = stream_window_aggregation(
            sdf, "ts", [("value", "mean"), ("value", "sum")], "1 hour",
            series_cols=["user_id"], watermark="1 hour")
        return agg.select(
            "user_id",
            F.col("window.start").alias("win_start"),
            F.col("Instance count").alias("n"),
            r6(F.col("`value (mean)`"), "mean_v"),
            r6(F.col("`value (sum)`"), "sum_v"))

    name = "stream_hourly_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="complete",
                           state_partitions=_state_width(spark, sf_dir))
    return spark.table(name)


@query("streaming_time_slice", """
SELECT user_id, event_id, ts, round(value, 6) AS value
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
""")
def q_streaming_time_slice(spark, sf_dir):
    """Half-open time slice over the events STREAM (stateless filter —
    the streaming face of ``operators.timeslice``).  Output is a pure
    row filter, so it is replay-order independent and the batch SQL is
    an exact oracle; exercises NTZ literal handling + predicate pushdown
    on the streaming scan."""
    import datetime as dt

    sdf = read_table_stream(spark, sf_dir, "events")
    out = stream_time_slice(sdf, "ts", dt.datetime(2024, 1, 5),
                            dt.datetime(2024, 1, 20))
    out = out.select("user_id", "event_id", "ts",
                     r6(F.col("value"), "value"))
    name = "stream_slice_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name, output_mode="append")
    return spark.table(name)


@query("streaming_interval_join", """
SELECT l.event_id, l.user_id, r.event_id AS r_event_id,
       round(epoch(l.ts) - epoch(r.ts), 6) AS dt_seconds,
       round(r.value, 6) AS r_value
FROM events l
JOIN events r
  ON l.user_id = r.user_id
 AND r.event_type = 'purchase'
 AND abs(epoch(l.ts) - epoch(r.ts)) <= 1800.0
 AND l.event_id <> r.event_id
""")
def q_streaming_interval_join(spark, sf_dir):
    """STREAM-STREAM interval join: the events stream joined against the
    purchases stream (same-user, ±30 min) with watermark-bounded buffer
    state on both sides.  Under availableNow replay nothing is late, so
    the emitted pair set equals the batch interval join exactly — the
    oracle is the identical inequality join the batch
    ``interval_join_purchases`` uses."""
    def build(s):
        sdf = read_table_stream(s, sf_dir, "events")
        left = sdf.select("user_id", "ts", "event_id")
        right = sdf.where(F.col("event_type") == "purchase") \
            .select("user_id", "ts", "event_id", "value")
        out = stream_interval_join(left, right, "ts", ["user_id"], 1800.0,
                                   watermark="1 hour",
                                   right_cols=["event_id", "value"])
        return (out.where(F.col("event_id") != F.col("r_event_id"))
                .select("event_id", "user_id", "r_event_id",
                        r6(F.col("dt_seconds"), "dt_seconds"),
                        r6(F.col("r_value"), "r_value")))

    name = "stream_ij_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="append",
                           state_partitions=_state_width(spark, sf_dir))
    return spark.table(name)


@query("streaming_asof_join", """
SELECT l.user_id, l.event_id, round(l.value, 6) AS value,
       r.ts AS asof_ts, round(r.value, 6) AS asof_value
FROM events l
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""")
def q_streaming_asof_join(spark, sf_dir):
    """Streaming AS-OF join: each event in the stream enriched with the
    user's most recent at-or-before purchase, carried as O(1) per-key
    state across micro-batches (union + applyInPandasWithState — the
    streaming face of operators/asof.py).  Under availableNow replay the
    result equals the batch as-of join, so the oracle is the same native
    DuckDB ASOF LEFT JOIN the batch query uses."""
    def build(s):
        sdf = read_table_stream(s, sf_dir, "events")
        left = sdf.select("user_id", "ts", "event_id", "value")
        right = sdf.where(F.col("event_type") == "purchase") \
            .select("user_id", "ts", "value")
        out = stream_asof_join(left, right, "ts", ["user_id"],
                               ["event_id", "value"], "value")
        return out.select("user_id", "event_id",
                          r6(F.col("value"), "value"),
                          F.col("asof_ts"), r6(F.col("asof_value"),
                                               "asof_value"))

    name = "stream_asof_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="append",
                           state_partitions=_state_width(spark, sf_dir))
    return spark.table(name)


@query("streaming_stateful_diff", """
SELECT user_id, ts,
       round(value, 6) AS value,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts),
             6) AS delta
FROM events
QUALIFY lag(value) OVER (PARTITION BY user_id ORDER BY ts) IS NOT NULL
""")
def q_streaming_stateful_diff(spark, sf_dir):
    """Per-user stateful first difference over the events STREAM
    (``applyInPandasWithState`` carrying the trailing value per series
    across micro-batches) — oracle = the batch lag window.  (user_id, ts)
    is unique in the data contract, so within-batch event-time ordering
    makes the replay deterministic; rows with no predecessor (NaN delta)
    are filtered on both sides."""
    def build(s):
        sdf = read_table_stream(s, sf_dir, "events")
        diff = stream_difference(sdf, "ts", ["user_id"], "value", shift=1)
        # the state step emits NaN for rows with no predecessor; Arrow
        # serialization surfaces those as SQL NULL — filter matches the
        # oracle's QUALIFY (events.value itself is never null by contract)
        return diff.select("user_id", "ts",
                           r6(F.col("value"), "value"),
                           r6(F.col("delta"), "delta")) \
            .where(F.col("delta").isNotNull())

    name = "stream_diff_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="append",
                           state_partitions=_state_width(spark, sf_dir))
    return spark.table(name)


@query("streaming_session_window", """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 3600.0
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM g
),
t AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL 1 HOUR AS session_end,
         count(*) AS n, round(sum(value), 6) AS sum_v
  FROM s GROUP BY user_id, sid
)
SELECT * FROM t
WHERE session_end <= (SELECT max(ts) FROM events)
""")
def q_streaming_session_window(spark, sf_dir):
    """Native session windows (gap 1h) over the events STREAM in append
    mode: a session emits once the watermark passes its close
    (last event + gap), so the oracle replays exactly the emitted set —
    batch sessionization restricted to sessions closed before the global
    max event time.  Emission semantics empirically pinned in
    tests/test_streaming.py; window ``end`` is last-event + gap (Spark
    session-window contract)."""
    def build(s):
        sdf = read_table_stream(s, sf_dir, "events")
        agg = stream_session_window(
            sdf, "ts", "1 hour", [("value", "sum")],
            series_cols=["user_id"], watermark="0 seconds")
        return agg.select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col("Instance count").alias("n"),
            r6(F.col("`value (sum)`"), "sum_v"))

    name = "stream_sess_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="append",
                           state_partitions=_state_width(spark, sf_dir))
    return spark.table(name)


_BLOOM_POS_VALUES = ", ".join(
    f"(((('0x' || substr(md5((key || '#{i}')), 1, 15))::BIGINT) % 2048))"
    for i in range(4))


@query("streaming_bloom_gate", f"""
WITH ref AS (SELECT DISTINCT user_id::VARCHAR AS key FROM events
             WHERE ts < TIMESTAMP '2024-01-01 02:00:00'),
rpos AS (SELECT u.p FROM ref,
         LATERAL (SELECT * FROM (VALUES {_BLOOM_POS_VALUES}) AS v(p)) u),
lanes AS (SELECT p >> 5 AS lane, bit_or(1::BIGINT << (p & 31)) AS bits
          FROM rpos GROUP BY 1),
ev AS (SELECT event_id, user_id, ts, user_id::VARCHAR AS key FROM events),
epos AS (SELECT event_id, user_id, ts, u.p FROM ev,
         LATERAL (SELECT * FROM (VALUES {_BLOOM_POS_VALUES}) AS v(p)) u),
hits AS (SELECT event_id, any_value(user_id) AS user_id,
                any_value(ts) AS ts,
                bool_and(coalesce(
                    (l.bits & (1::BIGINT << (p & 31)))
                        = (1::BIGINT << (p & 31)), false)) AS ok
         FROM epos LEFT JOIN lanes l ON (p >> 5) = l.lane
         GROUP BY event_id)
SELECT event_id, user_id, ts FROM hits WHERE ok
""")
def q_streaming_bloom_gate(spark, sf_dir):
    """Known-key gate at STREAM ingest: a Bloom filter built in batch
    over the first 2 hours' user set rides the stream as a pure
    expression (dense lanes embedded as an array literal — stateless
    map, append-mode safe, no per-batch join); events from users not in
    the reference window are dropped with zero false negatives.  The
    oracle replays build + probe bit-for-bit."""
    import datetime as dt

    from orange3_timeseries_spark.operators import bloom as B
    from orange3_timeseries_spark.sources import read_table

    ref = (read_table(spark, sf_dir, "events")
           .where(F.col("ts") < F.lit(dt.datetime(2024, 1, 1, 2)))
           .select(F.col("user_id").cast("string").alias("key"))
           .distinct())
    lanes = B.dense_lanes(B.bloom_build(ref, "key", 2048, 4), 2048)
    sdf = read_table_stream(spark, sf_dir, "events")
    gated = sdf.where(
        B.bloom_probe_expr(F.col("user_id"), lanes, 2048, 4))
    out = gated.select("event_id", "user_id", "ts")
    name = "stream_bloom_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name, output_mode="append")
    return spark.table(name)


@query("streaming_distinct_sketch", f"""
WITH e AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  (('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT)
                      AS h
           FROM events),
b AS (SELECT day, (h % 256)::INT AS reg,
             CASE WHEN (h >> 8) = 0 THEN 53
                  ELSE bit_count(((h >> 8) & -(h >> 8)) - 1) + 1
             END AS rho
      FROM e),
r AS (SELECT day, reg, max(rho) AS max_rho FROM b GROUP BY 1, 2),
a AS (SELECT day, sum(1.0 / (1::BIGINT << max_rho)) AS s,
             (256 - count(*))::DOUBLE AS zeros
      FROM r GROUP BY 1)
SELECT day,
       round(CASE WHEN (47072.71267120224 / (s + zeros)) <= 640.0
                       AND zeros > 0
                  THEN 256.0 * ln(256.0 / zeros)
                  ELSE 47072.71267120224 / (s + zeros)
             END, 6) AS approx_users
FROM a
""")
def q_streaming_distinct_sketch(spark, sf_dir):
    """Per-day distinct-user HLL over the event STREAM: the register
    max-aggregation runs as the streaming stateful operator (bounded
    state — ≤256 registers per day regardless of traffic), the memory
    sink holds the registers, and the estimate folds in batch on read —
    the standard sketch-in-stream / finalize-on-query split.  Oracle =
    the batch HLL replay, so streaming register state is value-checked
    end to end."""
    from orange3_timeseries_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    def build(s):
        sdf = read_table_stream(s, sf_dir, "events")
        sdf = sdf.withColumn("day", F.date_trunc("day", F.col("ts")))
        return hll_registers(sdf, "user_id", p=8, group_cols=("day",))

    name = "stream_hll_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="complete",
                           state_partitions=_state_width(spark, sf_dir))
    return hll_estimate(spark.table(name), p=8, group_cols=("day",),
                        out_col="approx_users").select("day",
                                                       "approx_users")


@query("streaming_heavy_hitters", f"""
WITH e AS (SELECT event_type AS t FROM events),
pos AS (SELECT t, u.r, u.p FROM e, LATERAL (SELECT * FROM (VALUES
    (0, (('0x' || substr(md5((t || '#0')), 1, 15))::BIGINT) % 512),
    (1, (('0x' || substr(md5((t || '#1')), 1, 15))::BIGINT) % 512),
    (2, (('0x' || substr(md5((t || '#2')), 1, 15))::BIGINT) % 512))
  AS v(r, p)) u),
tab AS (SELECT r, p, count(*) AS cnt FROM pos GROUP BY 1, 2),
keys AS (SELECT DISTINCT event_type AS t FROM events),
pe AS (SELECT t, u.r, u.p FROM keys, LATERAL (SELECT * FROM (VALUES
    (0, (('0x' || substr(md5((t || '#0')), 1, 15))::BIGINT) % 512),
    (1, (('0x' || substr(md5((t || '#1')), 1, 15))::BIGINT) % 512),
    (2, (('0x' || substr(md5((t || '#2')), 1, 15))::BIGINT) % 512))
  AS v(r, p)) u)
SELECT pe.t AS event_type,
       min(coalesce(tab.cnt, 0)) AS cms_count
FROM pe LEFT JOIN tab USING (r, p)
GROUP BY 1
""")
def q_streaming_heavy_hitters(spark, sf_dir):
    """Count-min counters maintained as STREAM state (one sum-agg per
    (row, pos) — bounded at depth·width rows regardless of traffic),
    memory sink holds the counters, point queries fold in batch on
    read — the streaming face of ``heavy_hitters_cms``, value-checked
    against the batch CMS replay."""
    from orange3_timeseries_spark.operators.hashing import phash_seeded

    def build(s):
        sdf = read_table_stream(s, sf_dir, "events")
        key = F.col("event_type").cast("string")
        pos = F.posexplode(F.array(*[
            (phash_seeded(key, i) % F.lit(512)).cast("int")
            for i in range(3)]))
        entries = sdf.select(pos.alias("row", "pos"))
        return entries.groupBy("row", "pos").agg(F.count("*").alias("cnt"))

    name = "stream_cms_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="complete",
                           state_partitions=_state_width(spark, sf_dir))
    from orange3_timeseries_spark.operators.sketch import cms_estimate

    keys = (read_table(spark, sf_dir, "events")
            .select(F.col("event_type")).distinct())
    return cms_estimate(spark.table(name), keys, "event_type",
                        width=512, depth=3)


@query("streaming_enrich_join", """
SELECT e.event_id, e.user_id, e.ts, round(e.value, 6) AS value,
       c.c_mktsegment AS segment, n.n_name AS nation
FROM events e
LEFT JOIN customer c ON c.c_custkey = e.user_id
LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
""")
def q_streaming_enrich_join(spark, sf_dir):
    """STREAM-STATIC enrichment: the events stream gains customer
    market segment and nation name through two broadcast dim joins —
    stateless, no watermark, the stream side never shuffles.  The
    oracle is the identical batch join."""
    from orange3_timeseries_spark.streaming.ops import stream_enrich

    def build(s):
        sdf = read_table_stream(s, sf_dir, "events")
        cust = read_table(s, sf_dir, "customer").select(
            F.col("c_custkey"), F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey"))
        nat = read_table(s, sf_dir, "nation").select(
            F.col("n_nationkey"), F.col("n_name").alias("nation"))
        dim = (cust.join(nat, cust.c_nationkey == nat.n_nationkey,
                         "left")
               .select("c_custkey", "segment", "nation"))
        out = stream_enrich(sdf, dim,
                            sdf.user_id == dim.c_custkey, "left")
        return out.select("event_id", "user_id", "ts",
                          r6(F.col("value"), "value"),
                          "segment", "nation")

    name = "stream_enrich_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="append")
    return spark.table(name)


@query("streaming_drift_psi", """
WITH bounds AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid,
         max(epoch_us(ts)) AS mx
  FROM events),
r AS (SELECT value::DOUBLE AS v FROM events, bounds
      WHERE epoch_us(ts) <= mid AND value IS NOT NULL),
e AS (SELECT [quantile_cont(v, 0.1), quantile_cont(v, 0.2),
              quantile_cont(v, 0.3), quantile_cont(v, 0.4),
              quantile_cont(v, 0.5), quantile_cont(v, 0.6),
              quantile_cont(v, 0.7), quantile_cont(v, 0.8),
              quantile_cont(v, 0.9)] AS edges FROM r),
pref AS (
  SELECT b.bucket,
         coalesce(rb.cnt::DOUBLE / (SELECT sum(cnt) FROM (
             SELECT 1 + len(list_filter(e.edges, x -> v > x)) AS bucket,
                    count(*) AS cnt FROM r, e GROUP BY 1) t), 0.0)
             AS p_ref
  FROM (SELECT unnest(generate_series(1, 10))::INT AS bucket) b
  LEFT JOIN (SELECT 1 + len(list_filter(e.edges, x -> v > x)) AS bucket,
                    count(*) AS cnt FROM r, e GROUP BY 1) rb
    ON rb.bucket = b.bucket),
wc AS (  -- emitted tumbling 3-day windows: end <= max event time
  SELECT (epoch_us(ts) // 259200000000) * 259200000000 AS ws,
         1 + len(list_filter(e.edges, x -> value::DOUBLE > x)) AS bucket,
         count(*) AS cnt
  FROM events, e, bounds
  WHERE value IS NOT NULL
    AND (epoch_us(ts) // 259200000000) * 259200000000
        + 259200000000 <= mx
  GROUP BY 1, 2),
wins AS (SELECT DISTINCT ws FROM wc),
grid AS (
  SELECT w.ws, b.bucket, coalesce(wc.cnt, 0) AS cnt
  FROM wins w
  CROSS JOIN (SELECT unnest(generate_series(1, 10))::INT AS bucket) b
  LEFT JOIN wc ON wc.ws = w.ws AND wc.bucket = b.bucket),
shares AS (
  SELECT ws, bucket,
         cnt::DOUBLE / sum(cnt) OVER (PARTITION BY ws) AS p_cur
  FROM grid),
terms AS (
  SELECT s.ws, s.bucket, p.p_ref, s.p_cur,
         (greatest(p.p_ref, 1e-4) - greatest(s.p_cur, 1e-4))
             * ln(greatest(p.p_ref, 1e-4) / greatest(s.p_cur, 1e-4))
             AS contrib
  FROM shares s JOIN pref p USING (bucket))
SELECT make_timestamp(ws) AS window_start,
       make_timestamp(ws + 259200000000) AS window_end,
       bucket, round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
       round(contrib, 6) AS contrib,
       round(sum(contrib) OVER (PARTITION BY ws), 6) AS psi
FROM terms
""")
def q_streaming_drift_psi(spark, sf_dir):
    """STREAMING drift monitor: the events stream is histogrammed per
    3-day tumbling window against static reference-decile edges (first
    time half of the corpus, broadcast in-plan), append mode emits each
    window's counts when the watermark passes, and the drained counts
    become per-window PSI against the reference shares — the continuous
    version of ``drift_psi_events``.  Bounded state: one row per
    (window, bucket).  The oracle replays edges, window assignment
    (epoch-aligned 3-day floors), emission semantics, and the PSI
    decomposition."""
    from pyspark.sql import Window

    def build(s):
        ev = read_table(s, sf_dir, "events")
        us = F.unix_micros(F.col("ts"))
        bounds = ev.agg(((F.min(us) + F.max(us)) / F.lit(2))
                        .cast("long").alias("__mid__"))
        ref = (ev.crossJoin(F.broadcast(bounds))
               .where(us <= F.col("__mid__")))
        edges = ref.agg(F.percentile(
            F.col("value").cast("double"),
            F.array(*[F.lit(k / 10) for k in range(1, 10)]))
            .alias("__edges__"))
        from orange3_timeseries_spark.streaming.ops import (
            stream_bucket_counts,
        )
        sdf = read_table_stream(s, sf_dir, "events")
        out = stream_bucket_counts(sdf, "ts", "value", edges, "3 days")
        return out.select(F.col("window.start").alias("window_start"),
                          F.col("window.end").alias("window_end"),
                          "bucket", "cnt")

    name = "stream_psi_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="append",
                           state_partitions=_state_width(spark, sf_dir))
    # localCheckpoint: the drained sink is tiny and is self-joined
    # below (distinct windows x counts) — pin it and break lineage
    counts = spark.table(name).localCheckpoint()

    # batch-side gate over the drained counts: fill the 10-bucket grid,
    # shares per window, PSI vs the reference shares
    ev = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(((F.min(us) + F.max(us)) / F.lit(2))
                    .cast("long").alias("__mid__"))
    ref = ev.crossJoin(F.broadcast(bounds)).where(us <= F.col("__mid__"))
    edges = ref.agg(F.percentile(
        F.col("value").cast("double"),
        F.array(*[F.lit(k / 10) for k in range(1, 10)]))
        .alias("__edges__"))
    v = F.col("value").cast("double")
    rb = (ref.where(v.isNotNull()).crossJoin(F.broadcast(edges))
          .groupBy((F.size(F.filter(F.col("__edges__"),
                                    lambda e: v > e)) + 1)
                   .alias("bucket"))
          .agg(F.count(F.lit(1)).alias("__c__")))
    rtot = rb.agg(F.sum("__c__").alias("__t__"))
    pref = (spark.range(1, 11)
            .select(F.col("id").cast("int").alias("bucket"))
            .join(rb, "bucket", "left")
            .crossJoin(F.broadcast(rtot))
            .select("bucket",
                    F.coalesce(F.col("__c__") / F.col("__t__"),
                               F.lit(0.0)).alias("p_ref")))
    wins = counts.select("window_start", "window_end").distinct()
    grid = (wins.crossJoin(
                spark.range(1, 11).select(
                    F.col("id").cast("int").alias("bucket")))
            .join(counts, ["window_start", "window_end", "bucket"],
                  "left")
            .select("window_start", "window_end", "bucket",
                    F.coalesce("cnt", F.lit(0)).alias("cnt")))
    wtot = Window.partitionBy("window_start")
    shares = grid.withColumn(
        "p_cur", F.col("cnt") / F.sum("cnt").over(wtot))
    p = F.greatest(F.col("p_ref"), F.lit(1e-4))
    q_ = F.greatest(F.col("p_cur"), F.lit(1e-4))
    terms = (shares.join(F.broadcast(pref), "bucket")
             .withColumn("contrib", (p - q_) * F.log(p / q_)))
    return terms.select(
        "window_start", "window_end", "bucket",
        r6(F.col("p_ref"), "p_ref"), r6(F.col("p_cur"), "p_cur"),
        r6(F.col("contrib"), "contrib"),
        r6(F.sum("contrib").over(wtot), "psi"))


@query("streaming_cusum", """
WITH RECURSIVE s AS (
  SELECT user_id, ts, value,
         avg(value) OVER (PARTITION BY user_id) AS mu,
         stddev_pop(value) OVER (PARTITION BY user_id) AS sd
  FROM events),
z AS (SELECT user_id, ts, round((value - mu) / sd, 6) AS z,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM s WHERE sd > 0 AND value IS NOT NULL),
rec(user_id, rn, ts, z, su, sdn) AS (
  SELECT user_id, rn, ts, z,
         greatest(0.0, 0.0 + (z - 0.5)),
         greatest(0.0, 0.0 + (-z - 0.5))
  FROM z WHERE rn = 1
  UNION ALL
  SELECT z.user_id, z.rn, z.ts, z.z,
         greatest(0.0, rec.su + (z.z - 0.5)),
         greatest(0.0, rec.sdn + (-z.z - 0.5))
  FROM rec JOIN z ON z.user_id = rec.user_id AND z.rn = rec.rn + 1)
SELECT user_id, ts, z, round(su, 6) AS s_up, round(sdn, 6) AS s_dn,
       round(su, 6) > 4.0 AS alarm_up, round(sdn, 6) > 4.0 AS alarm_dn
FROM rec
""")
def q_streaming_cusum(spark, sf_dir):
    """Continuous CUSUM drift monitor over the events STREAM: per-user
    (s⁺, s⁻) state across micro-batches, standardized against the
    static per-user reference stats (stream-static broadcast join — the
    train/serve split).  The oracle replays the exact recursion as a
    recursive CTE over the same 6-dp-rounded z, so the carried state is
    reproduced bit-for-bit (both sides compute
    ``max(0, s + (z − k))`` with identical association)."""
    import uuid as _uuid

    from orange3_timeseries_spark.streaming.ops import stream_cusum

    def build(s):
        ev = read_table(s, sf_dir, "events")
        stats = ev.groupBy("user_id").agg(
            F.avg("value").alias("mu"),
            F.stddev_pop("value").alias("sd"))
        sdf = read_table_stream(s, sf_dir, "events")
        return stream_cusum(sdf, "ts", ["user_id"], "value", stats,
                            k=0.5, h=4.0)

    name = "stream_cusum_" + _uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="append",
                           state_partitions=_state_width(spark, sf_dir))
    return spark.table(name)


@query("streaming_dedup", """
SELECT event_id, user_id, ts, round(value, 6) AS value
FROM events
""")
def q_streaming_dedup(spark, sf_dir):
    """Exactly-once streaming dedup: the events stream UNIONED WITH
    ITSELF (every record delivered twice — the at-least-once ingestion
    model) flows through ``dropDuplicatesWithinWatermark(event_id)``
    and must emit each event exactly once; the oracle is the original
    table.  Duplicate copies are bit-identical rows, so which copy
    survives is immaterial to the value hash — the check verifies the
    COUNT halves and nothing else changes.  State per key is one
    timestamp, evicted at the watermark (bounded by keys-per-horizon,
    not stream length)."""
    from orange3_timeseries_spark.streaming.ops import stream_dedup

    def build(s):
        once = read_table_stream(s, sf_dir, "events")
        twice = once.union(read_table_stream(s, sf_dir, "events"))
        out = stream_dedup(twice, "ts", ["event_id"],
                           watermark="1 hour")
        return out.select("event_id", "user_id", "ts",
                          r6(F.col("value"), "value"))

    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(spark, build, name, output_mode="append",
                           state_partitions=_state_width(spark, sf_dir))
    return spark.table(name)


# the gate reuses the batch probe's oracle — registered by
# queries_pipeline's decorators, so that module MUST be imported
# before the ORACLE_SQL lookup (a bare lookup worked only through
# __spark_entry__'s lucky import order)
from orange3_timeseries_spark import queries_pipeline as _QP  # noqa: E402
from orange3_timeseries_spark.queries import ORACLE_SQL as _OS_STREAM  # noqa: E402


@query("streaming_lsh_gate", _OS_STREAM["dedup_lsh_registry_probe"])
def q_streaming_lsh_gate(spark, sf_dir):
    """The dedup-at-ingest gate as a STREAM, under the SAME full
    replay oracle as the batch ``dedup_lsh_registry_probe``: the LSH
    index persists over deciles 0-8 of the corpus (build + two
    incremental merges, exactly the batch query's state), and decile 9
    arrives as a document stream whose band entries stream-static-join
    the loaded index (streaming/ops.py:stream_lsh_probe — stateless
    joins, one bounded candidate-pair dedup).  Hash-equal to the batch
    replay proves the streaming gate admits and scores EXACTLY the
    pairs the batch probe finds."""
    from orange3_timeseries_spark.operators import dedup as D
    from orange3_timeseries_spark.streaming.ops import stream_lsh_probe

    d = read_table(spark, sf_dir, "documents")
    dec = F.col("doc_id") % 10
    idx = D.lsh_build_index(d.where(dec <= 6))
    idx = D.lsh_merge_index(idx, d.where(dec == 7))
    idx = D.lsh_merge_index(idx, d.where(dec == 8))
    path = _QP._fresh_state_path("lshs", sf_dir)
    D.write_lsh_index(idx, path)

    def build(s):
        loaded = D.read_lsh_index(s, path)
        sdocs = read_table_stream(s, sf_dir, "documents") \
            .where(F.col("doc_id") % 10 == 9)
        out = stream_lsh_probe(sdocs, loaded, threshold=0.2)
        return out.select("id_new", "id_index", r6(F.col("jaccard"),
                                                   "jaccard"))

    # the candidate-pair dedup is stateful: size its state stores to
    # the data (the 32-store default costs ~4x on kilobytes of state;
    # run_to_memory's measured 8.8s -> 2.2s) — same rule as every
    # other stateful query in this file
    name = "stream_lshgate_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(
        spark, build, name, output_mode="append",
        state_partitions=_state_width(spark, sf_dir, name="documents"))
    return spark.table(name)


@query("streaming_bm25_gate", _OS_STREAM["bm25_decontam_retrieval"])
def q_streaming_bm25_gate(spark, sf_dir):
    """Decontamination-by-retrieval at STREAM ingest, under the SAME
    full replay oracle as the batch ``bm25_decontam_retrieval``: the
    BM25 inverted index persists over the training corpus (build →
    versioned write → read — the ``bm25_registry_topk`` state), and
    the 'src0' eval slice arrives as a document stream; every arriving
    doc retrieves its top-3 training neighbors through the persisted
    index's serve kernel (streaming/ops.py:stream_bm25_gate via
    ``foreachBatch`` — per-query top-k needs a rank window, not
    plannable on an unbounded stream, and a query doc's result depends
    only on its own tokens + the static index, so per-micro-batch
    evaluation is exact).  Hash-equal to the batch decontam query
    proves the streaming gate flags EXACTLY the overlaps the batch
    retrieval finds — the BM25 sibling of ``streaming_lsh_gate``."""
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_build_index,
        read_bm25_index,
        write_bm25_index,
    )
    from orange3_timeseries_spark.streaming.ops import (
        run_foreachbatch_to_memory,
        stream_bm25_gate,
    )

    d = read_table(spark, sf_dir, "documents")
    path = _QP._fresh_state_path("bm25s", sf_dir)
    write_bm25_index(bm25_build_index(d.where(F.col("source") != "src0")),
                     path)

    def build(s):
        sdocs = read_table_stream(s, sf_dir, "documents") \
            .where(F.col("source") == "src0")
        return sdocs.select(F.col("doc_id").alias("query_id"), "text")

    def transform(batch):
        loaded = read_bm25_index(batch.sparkSession, path)
        return stream_bm25_gate(batch, loaded, top_k=3)

    # view name uuid-fresh per call (temp-view collision safety), but
    # the SPOOL keys on (pid, sf) so process-lifetime re-runs overwrite
    name = "stream_bm25gate_" + uuid.uuid4().hex[:8]
    run_foreachbatch_to_memory(
        spark, build, transform, name,
        state_partitions=_state_width(spark, sf_dir, name="documents"),
        spool_path=_QP._fresh_state_path("bm25s_spool", sf_dir))
    return spark.table(name)


@query("streaming_lsh_gate_watermarked",
       _OS_STREAM["dedup_lsh_registry_probe"])
def q_streaming_lsh_gate_watermarked(spark, sf_dir):
    """The dedup-at-ingest stream gate in its BOUNDED-STATE mode — the
    only mode a long-lived 100 TB ingest can run — under the SAME full
    replay oracle as the batch ``dedup_lsh_registry_probe``: identical
    index (deciles 0-8) and probe stream (decile 9) as
    ``streaming_lsh_gate``, but the candidate-pair dedup runs
    ``dropDuplicatesWithinWatermark`` keyed on a synthesized
    event-time column (documents carry no native one: arrival_ts =
    epoch + doc_id % 3600 s, a one-hour ingest spread), with a 2-hour
    watermark horizon (streaming/ops.py:stream_lsh_probe
    ``event_time_col=``).  Pair state is EVICTED once the watermark
    passes — memory bounded by candidate pairs per horizon instead of
    per corpus lifetime.  Within-horizon arrivals emit the identical
    pair set to the unbounded mode (a pair's duplicates land within
    the horizon of its first arrival here), so hash-equal to the batch
    replay proves the bounded-state gate admits and scores EXACTLY the
    pairs the batch probe finds."""
    from orange3_timeseries_spark.operators import dedup as D
    from orange3_timeseries_spark.streaming.ops import stream_lsh_probe

    d = read_table(spark, sf_dir, "documents")
    dec = F.col("doc_id") % 10
    idx = D.lsh_build_index(d.where(dec <= 6))
    idx = D.lsh_merge_index(idx, d.where(dec == 7))
    idx = D.lsh_merge_index(idx, d.where(dec == 8))
    path = _QP._fresh_state_path("lshsw", sf_dir)
    D.write_lsh_index(idx, path)

    def build(s):
        loaded = D.read_lsh_index(s, path)
        sdocs = (read_table_stream(s, sf_dir, "documents")
                 .where(F.col("doc_id") % 10 == 9)
                 .withColumn("arrival_ts", F.timestamp_seconds(
                     F.lit(1700000000) + F.col("doc_id") % 3600)))
        out = stream_lsh_probe(sdocs, loaded, threshold=0.2,
                               event_time_col="arrival_ts",
                               watermark="2 hours")
        return out.select("id_new", "id_index", r6(F.col("jaccard"),
                                                   "jaccard"))

    name = "stream_lshgatew_" + uuid.uuid4().hex[:8]
    run_to_memory_isolated(
        spark, build, name, output_mode="append",
        state_partitions=_state_width(spark, sf_dir, name="documents"))
    return spark.table(name)
