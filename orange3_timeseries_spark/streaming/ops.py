"""Streaming operator implementations.

Scale notes: event-time windowed aggregation is Spark's native streaming
shuffle (hash on (series, window)); the watermark bounds state so a
1000-executor job holds only in-flight windows.  The stateful difference
keeps O(k) state per series key — at 10^8 series that is still
per-executor-bounded because state is partitioned by the grouping key.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from orange3_timeseries_spark.operators.aggregate import (
    AGG_OPTIONS,
    Ctx,
    ident,
    null_norm,
)
from orange3_timeseries_spark.timeutil import ntz_to_session_ts, time_literal

Specs = Iterable[Tuple[str, str]]


def stream_window_aggregation(sdf: DataFrame, time_col: str, specs: Specs,
                              duration: str, slide: Optional[str] = None,
                              series_cols: Sequence[str] = (),
                              watermark: Optional[str] = None) -> DataFrame:
    """Tumbling (``slide=None``) or sliding event-time window aggregation —
    the streaming analog of period blocks / moving transform (SURVEY §2.4),
    reusing the same registry expression builders in block form.

    Output columns: series keys, ``window`` struct (start/end), ``Instance
    count`` (the period-aggregation convention,
    ``owmovingtransform.py:514-515``), and one ``"{var} ({agg})"`` per spec.
    """
    bad = [a for _, a in specs if not AGG_OPTIONS[a].has_block]
    if bad:
        raise ValueError(
            f"aggregations not applicable to windows: {sorted(set(bad))}")
    sdf = ntz_to_session_ts(sdf)  # watermarks reject TIMESTAMP_NTZ
    if watermark:
        sdf = sdf.withWatermark(time_col, watermark)
    win = F.window(F.col(time_col), duration, slide) if slide \
        else F.window(F.col(time_col), duration)
    aggs = [F.count(F.lit(1)).alias("Instance count")]
    for var, agg in specs:
        desc = AGG_OPTIONS[agg]
        c = null_norm(F.col(var))
        aggs.append(desc.builder(c, ident, Ctx()).alias(f"{var} ({agg})"))
    keys = [F.col(k) for k in series_cols] + [win.alias("window")]
    return sdf.groupBy(*keys).agg(*aggs)


def stream_time_slice(sdf: DataFrame, time_col: str, lo, hi) -> DataFrame:
    """Continuous Time Slice: the half-open interval filter
    (``owtimeslice.py:313-319``) applied to a stream — rows outside
    [lo, hi) never enter downstream state."""
    t = F.col(time_col)
    dtype = dict(sdf.dtypes).get(time_col, "")
    return sdf.where((t >= time_literal(lo, dtype))
                     & (t < time_literal(hi, dtype)))


def stream_interval_join(left: DataFrame, right: DataFrame,
                         time_col: str, keys: Sequence[str],
                         tolerance_seconds: float,
                         watermark: str = "1 hour",
                         right_cols: Sequence[str] = ()) -> DataFrame:
    """STREAM-STREAM interval join: each left event paired with every
    same-key right event within ``±tolerance_seconds`` — the streaming
    face of ``operators.intervaljoin`` (two live firehoses, e.g. clicks
    x purchases, joined on-line).

    Uses Spark's native stream-stream inner join: both sides carry an
    event-time watermark and the join condition bounds right's event
    time to a window around left's, so each side's buffered state is
    dropped once the watermark passes the window (state per key ~
    tolerance x arrival rate, not history).  Under an ``availableNow``
    replay nothing is ever late, so the emitted set equals the batch
    interval join exactly — which is what the driver oracle replays.

    Output: left columns + ``r_<col>`` for ``right_cols`` +
    ``dt_seconds`` (left time - right time).
    """
    lt, rt = f"__lt_{time_col}__", f"__rt_{time_col}__"
    l = ntz_to_session_ts(left).withColumnRenamed(time_col, lt) \
        .withWatermark(lt, watermark)
    prefixed = [F.col(c).alias(f"r_{c}") for c in right_cols]
    r = ntz_to_session_ts(right).select(
        *[F.col(k) for k in keys], F.col(time_col).alias(rt), *prefixed) \
        .withWatermark(rt, watermark)
    tol = float(tolerance_seconds)
    cond = [l[k] == r[k] for k in keys] + [
        F.col(rt) >= F.col(lt) - F.expr(f"INTERVAL {tol} SECONDS"),
        F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {tol} SECONDS")]
    out = l.join(r, cond, "inner")
    # drop right's duplicate key columns, restore left's time name
    for k in keys:
        out = out.drop(r[k])
    return (out.withColumn(
                "dt_seconds",
                F.col(lt).cast("double") - F.col(rt).cast("double"))
            .withColumnRenamed(lt, time_col).drop(rt))


def stream_difference(sdf: DataFrame, time_col: str,
                      series_cols: Sequence[str], col: str,
                      shift: int = 1) -> DataFrame:
    """Stateful first-order difference ``x_t - x_{t-shift}`` per series —
    the streaming analog of the lag family (``owdifference.py:169-172``).

    State per series = the trailing ``shift`` values, carried across
    micro-batches with ``applyInPandasWithState``.  Rows are processed in
    event-time order *within* a batch; late rows across batches follow
    arrival order (a watermark + sort upstream tightens this — same
    trade-off as any streaming lag).
    """
    if not series_cols:
        raise ValueError("stateful difference needs at least one series key")
    key_fields = [sdf.schema[c] for c in series_cols]
    out_schema = T.StructType(key_fields + [
        sdf.schema[time_col],
        T.StructField("value", T.DoubleType()),
        T.StructField("delta", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("tail", T.ArrayType(T.DoubleType())),
    ])
    n_keys = len(series_cols)

    def step(key, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        (tail,) = state.get if state.exists else ([],)
        tail = list(tail)
        frames = [p for p in pdfs]
        pdf = pd.concat(frames).sort_values(time_col)
        vals = pdf[col].astype(float).tolist()
        deltas = []
        for v in vals:
            deltas.append(v - tail[-shift] if len(tail) >= shift
                          else float("nan"))
            tail.append(v)
        state.update((tail[-shift:],))
        out = pd.DataFrame({
            time_col: pdf[time_col].values,
            "value": vals,
            "delta": deltas,
        })
        for i, k in enumerate(series_cols):
            out.insert(i, k, key[i])
        yield out[[f.name for f in out_schema.fields]]

    return (sdf.groupBy(*series_cols)
            .applyInPandasWithState(step, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def stream_asof_join(left: DataFrame, right: DataFrame, time_col: str,
                     by: Sequence[str], left_cols: Sequence[str],
                     right_col: str, prefix: str = "asof_") -> DataFrame:
    """Streaming AS-OF join: every left event gains the most recent
    at-or-before right value per key — the streaming face of
    ``operators.asof`` (e.g. enrich a click stream with the user's last
    purchase as both arrive live).

    Plan mirrors the batch operator's union + carry-forward, adapted to
    state: both streams are tagged and unioned (no join node), then one
    ``applyInPandasWithState`` per key sorts each micro-batch by
    ``(time, src)`` (right-before-left at equal timestamps — the same
    inclusive backward semantics as DuckDB ``ASOF JOIN``) and carries
    ``(last right time, last right value)`` across batches as O(1)
    state.  Under an ``availableNow`` single replay the result equals
    the batch as-of join exactly, which is what the oracle replays;
    continuously, cross-batch late rows follow arrival order (same
    trade-off as :func:`stream_difference`).
    """
    by = list(by)
    left_cols = list(left_cols)
    l = ntz_to_session_ts(left).select(
        *by, time_col, *left_cols,
        F.lit(1).alias("__src__"),
        F.lit(None).cast("double").alias("__rv__"))
    r = ntz_to_session_ts(right).select(
        *by, time_col,
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left_cols],
        F.lit(0).alias("__src__"),
        F.col(right_col).cast("double").alias("__rv__"))
    u = l.unionByName(r)

    key_fields = [u.schema[c] for c in by]
    out_schema = T.StructType(key_fields + [
        u.schema[time_col],
        *[u.schema[c] for c in left_cols],
        T.StructField(prefix + time_col, T.TimestampType()),
        T.StructField(prefix + right_col, T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("ats", T.LongType()),   # matched right epoch-micros
        T.StructField("aval", T.DoubleType()),
    ])

    def step(key, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        ats, aval = state.get if state.exists else (None, None)
        pdf = pd.concat(list(pdfs)).sort_values(
            [time_col, "__src__"], kind="mergesort")
        # itertuples mangles underscore-prefixed names into positional
        # fields — expose the tags under safe names first
        pdf = pdf.rename(columns={"__src__": "srctag", "__rv__": "rvtag"})
        rows = []
        for t in pdf.itertuples(index=False):
            d = t._asdict()
            if d["srctag"] == 0:
                ats = int(pd.Timestamp(d[time_col]).value // 1000)
                aval = d["rvtag"]
            else:
                rows.append(
                    list(key) + [d[time_col]]
                    + [d[c] for c in left_cols]
                    + [pd.Timestamp(ats * 1000)
                       if ats is not None else pd.NaT,
                       aval])
        state.update((ats, aval))
        yield pd.DataFrame(rows,
                           columns=[f.name for f in out_schema.fields])

    return (u.groupBy(*by)
            .applyInPandasWithState(step, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append",
                  state_partitions: Optional[int] = None):
    """Drain all available input into an in-memory table ``name`` and stop
    — the test/batch-replay harness (``trigger(availableNow=True)``).

    ``state_partitions`` sizes the stateful-operator shuffle (= the number
    of state-store instances, fixed at stream start for the checkpoint's
    lifetime).  Spark defaults it to ``spark.sql.shuffle.partitions``,
    which for a small replay means paying e.g. 32 state-store setups for
    kilobytes of state — measured 8.8 s -> 2.2 s at sf0.1 going 32 -> 8.
    A production deployment sizes this to key cardinality / throughput
    explicitly; callers here derive it from the estimated input bytes
    (``operators.partitioning.scaled_width``), so a real volume still
    gets every core.  The session conf is restored after start (the
    running query keeps the value it was started with).

    .. warning:: single-threaded-harness-only.  The shuffle-partitions
       pin briefly mutates SESSION-GLOBAL conf around ``start()``; any
       query planned concurrently on the same session would observe the
       temporary value.  Concurrency-safe callers should use
       :func:`run_to_memory_isolated`, which pins the conf on a cloned
       ``spark.newSession()`` instead, or pass
       ``state_partitions=None`` (no mutation at all)."""
    spark = df.sparkSession
    key = "spark.sql.shuffle.partitions"
    prev = None
    if state_partitions is not None:
        prev = spark.conf.get(key)
        spark.conf.set(key, str(int(state_partitions)))
    try:
        q = (df.writeStream.format("memory").queryName(name)
             .outputMode(output_mode)
             .trigger(availableNow=True).start())
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
    q.awaitTermination()
    return q


def run_to_memory_isolated(spark, build, name: str,
                           output_mode: str = "append",
                           state_partitions: Optional[int] = None):
    """Concurrency-safe :func:`run_to_memory`: the stream is BUILT and
    RUN on a cloned ``spark.newSession()`` with
    ``spark.sql.shuffle.partitions`` pinned on the clone only, so a
    batch query planned concurrently on the caller's session never
    observes the temporary value (the conf race :func:`run_to_memory`
    documents).

    ``build`` is a callable ``SparkSession -> streaming DataFrame`` —
    the source must be constructed on the session it runs on, which is
    why this takes a builder instead of a DataFrame (a DataFrame is
    bound to the session that planned it).

    The memory sink registers its result as a temp view on the CLONE;
    after the availableNow drain finishes, the sink relation is
    re-exposed to the caller ZERO-COPY through a global temp view (the
    one catalog namespace shared across sessions of a SparkContext) and
    aliased back to a local temp view named ``name``, so
    ``spark.table(name)`` works exactly as with :func:`run_to_memory`
    without re-materializing the result."""
    clone = spark.newSession()
    if state_partitions is not None:
        clone.conf.set("spark.sql.shuffle.partitions",
                       str(int(state_partitions)))
    sdf = build(clone)
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    clone.table(name).createOrReplaceGlobalTempView(name)
    spark.table(f"global_temp.{name}").createOrReplaceTempView(name)
    return q


def run_foreachbatch_to_memory(spark, build, transform, name: str,
                               state_partitions: Optional[int] = None,
                               spool_path: Optional[str] = None):
    """Drain a stream through ``foreachBatch``, applying a BATCH
    transform to every micro-batch and exposing the accumulated results
    as temp view ``name`` — the harness for streaming gates whose
    per-record logic needs batch-only operators (rank windows,
    driver-bounded collects for partition pruning).

    ``foreachBatch`` is Structured Streaming's canonical escape hatch
    for exactly this: inside the sink callback the micro-batch is a
    plain batch DataFrame, so e.g. a per-query top-k rank window (not
    plannable on an unbounded stream) runs unchanged.  The composition
    is EXACT whenever the transform is row-local over the stream side —
    each arriving record's output depends only on that record plus
    static state — so evaluating it per micro-batch equals evaluating
    it over the union of batches regardless of how the input is split
    (asserted by the ``streaming_bm25_gate`` oracle).

    Same session-isolation contract as :func:`run_to_memory_isolated`
    (the stream is built and run on a cloned session).  Results are
    accumulated by appending each batch's transform output to a
    parquet spool and re-read on the caller's session — a production
    deployment points the sink at its real warehouse table instead.
    ``spool_path`` names the spool location explicitly (CLEARED before
    the run — callers key it so re-runs overwrite, e.g. by (pid, sf));
    the default is keyed by (pid, ``name``) and likewise cleared, plus
    registered for best-effort removal at interpreter exit, so
    repeated gates in one process do not grow /tmp unboundedly.
    At-least-once on retry (a batch retried after a sink failure
    re-appends) — acceptable for gate/audit outputs, switch the body
    to an idempotent MERGE keyed on ``batch_id`` when exactly-once
    matters."""
    import atexit
    import os
    import shutil
    import tempfile

    clone = spark.newSession()
    if state_partitions is not None:
        clone.conf.set("spark.sql.shuffle.partitions",
                       str(int(state_partitions)))
    sdf = build(clone)
    base = spool_path or os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_febatch_{os.getpid()}_{name}")
    spool, ckpt = base + "_out", base + "_ckpt"
    shutil.rmtree(spool, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    if spool_path is None:
        # the view reads the spool lazily, so removal must outlive the
        # caller's use of it — interpreter exit is the safe point
        atexit.register(shutil.rmtree, spool, ignore_errors=True)

    # the output schema is captured from the FIRST batch's transform:
    # when every batch's output is empty, Spark writes no schema-bearing
    # part files into the spool (only _SUCCESS), so the final read
    # cannot infer a schema — an all-empty gate result is a legitimate
    # outcome (nothing flagged) and must surface as an EMPTY view, not
    # an opaque inference error
    out_schema = []

    def sink(batch_df, batch_id):
        out = transform(batch_df)
        if not out_schema:
            out_schema.append(out.schema)
        out.write.mode("append").parquet(spool)

    q = (sdf.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    if not out_schema:
        # an availableNow source with no input files fires ZERO
        # micro-batches — a legitimate nothing-arrived run, not an
        # error.  Recover the output schema by applying the batch
        # transform to an empty static frame with the stream's schema
        # (the transform is batch code by construction here) and
        # expose an EMPTY view.
        out_schema.append(
            transform(spark.createDataFrame([], sdf.schema)).schema)
    import glob as _glob
    if _glob.glob(os.path.join(spool, "**", "*.parquet"),
                  recursive=True):
        out = spark.read.parquet(spool)
    else:
        out = spark.createDataFrame([], out_schema[0])
    out.createOrReplaceTempView(name)
    return q


def stream_bm25_gate(batch_df: DataFrame, index, *,
                     query_text_col: str = "text",
                     query_id_col: str = "query_id",
                     top_k: int = 3, k1: float = 1.2, b: float = 0.75
                     ) -> DataFrame:
    """Decontamination-by-retrieval at STREAM ingest: score one
    micro-batch of arriving documents against a persisted BM25 index
    (operators/retrieval.py:Bm25Index) and emit each arrival's top-k
    training-corpus neighbors — the retrieval sibling of
    :func:`stream_lsh_probe`, flagging incoming eval/benchmark docs
    that overlap the indexed training data (paraphrase-level overlap
    the exact n-gram gate misses).

    This is the per-batch TRANSFORM for
    :func:`run_foreachbatch_to_memory`: BM25 top-k needs a rank window
    partitioned by query (not plannable on an unbounded stream), and
    the serve path's bucket prune needs a driver-side collect of the
    batch's query-token buckets — both batch-only constructs, both
    EXACT per micro-batch because a query document's top-k depends
    only on its own tokens plus the static index.  Routes through the
    very same ``bm25_topk_from_index`` serve kernel as the batch
    query, so stream and batch scores are bit-identical."""
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_topk_from_index,
    )

    return bm25_topk_from_index(index, batch_df,
                                query_text_col=query_text_col,
                                query_id_col=query_id_col,
                                k1=k1, b=b, top_k=top_k)


def stream_enrich(sdf: DataFrame, dim: DataFrame, on,
                  how: str = "left") -> DataFrame:
    """STREAM-STATIC dimension enrichment: every streaming row gains the
    matching dim-table attributes via a broadcast join — the standard
    ingest-time enrichment (events x user/customer/geo dims).

    Stateless: Spark replans the static side per micro-batch, the
    broadcast ships the (small) dim to every task, and no watermark or
    state store is involved — at 100 TB/day the stream side never
    shuffles for the join.  For dims too big to broadcast, drop the
    hint and let AQE pick a shuffled join per micro-batch."""
    return ntz_to_session_ts(sdf).join(F.broadcast(dim), on, how)


def stream_exact_dedup(sdf: DataFrame, text_col: str, time_col: str,
                       watermark: str = "1 hour") -> DataFrame:
    """Continuous exact deduplication: keep the first arrival of each
    content digest (md5), with state bounded by the watermark — the
    streaming face of :func:`operators.dedup.exact_dedup`.  At 100 TB/day
    the digest state is 16 bytes/doc within the watermark horizon,
    partitioned by digest across executors."""
    return (ntz_to_session_ts(sdf)
            .withColumn("digest", F.md5(F.col(text_col)))
            .withWatermark(time_col, watermark)
            .dropDuplicates(["digest"]))


def stream_session_window(sdf: DataFrame, time_col: str, gap: str,
                          specs: Specs, series_cols: Sequence[str] = (),
                          watermark: str = "0 seconds") -> DataFrame:
    """Continuous gap-based sessionization via native
    ``F.session_window`` — the streaming face of
    ``operators.sessionize``: windows merge while events arrive within
    ``gap`` of the session end, and a session EMITS (append mode) once
    the watermark passes its close (last event + gap), so state per
    (series, open-session) is bounded by the watermark horizon.

    The window's ``end`` is last-event-time + gap (Spark session-window
    contract) — an emitted session is exactly one whose ``end`` <=
    watermark, which is what makes the batch SQL oracle able to replay
    the emitted set: closed sessions == sessions with
    ``max(ts) + gap <= global max(ts) - delay``."""
    bad = [a for _, a in specs if not AGG_OPTIONS[a].has_block]
    if bad:
        raise ValueError(
            f"aggregations not applicable to windows: {sorted(set(bad))}")
    sdf = ntz_to_session_ts(sdf).withWatermark(time_col, watermark)
    win = F.session_window(F.col(time_col), gap)
    aggs = [F.count(F.lit(1)).alias("Instance count")]
    for var, agg in specs:
        desc = AGG_OPTIONS[agg]
        c = null_norm(F.col(var))
        aggs.append(desc.builder(c, ident, Ctx()).alias(f"{var} ({agg})"))
    keys = [F.col(k) for k in series_cols] + [win.alias("session_window")]
    return sdf.groupBy(*keys).agg(*aggs)


def stream_bucket_counts(sdf: DataFrame, time_col: str, value_col: str,
                         edges_df: DataFrame, window: str,
                         watermark: str = "0 seconds") -> DataFrame:
    """Windowed histogram of a streaming value column against STATIC
    reference bucket edges — the streaming half of a drift monitor:
    the (1-row) edges DataFrame broadcasts to every task, bucket
    assignment is a higher-order-function count over the edge array,
    and the windowed groupBy keeps one state row per (window, bucket)
    — bounded state regardless of stream volume.  Append mode emits a
    window's counts once the watermark passes its end; a downstream
    batch step (or foreachBatch) turns counts into shares and the PSI
    against the reference distribution."""
    v = F.col(value_col).cast("double")
    bucket = (F.size(F.filter(F.col("__edges__"), lambda e: v > e))
              + 1).alias("bucket")
    return (ntz_to_session_ts(sdf)
            .where(v.isNotNull())
            .crossJoin(F.broadcast(edges_df))
            .withWatermark(time_col, watermark)
            .groupBy(F.window(F.col(time_col), window), bucket)
            .agg(F.count(F.lit(1)).alias("cnt")))


def stream_cusum(sdf: DataFrame, time_col: str,
                 series_cols: Sequence[str], col: str,
                 stats: DataFrame, k: float = 0.5,
                 h: float = 4.0) -> DataFrame:
    """Continuous two-sided CUSUM drift monitor — the streaming face of
    ``operators.anomaly.cusum``: per-series state ``(s⁺, s⁻)`` carried
    across micro-batches with ``applyInPandasWithState``, standardized
    against a STATIC reference-stats table (the train/serve split a
    production monitor actually runs: μ/σ come from the training
    window, the stream is only scored).

    ``stats`` must hold ``series_cols + (mu, sd)``; it joins broadcast
    (stream-static, stateless) and rows with ``sd <= 0`` or no match
    are dropped.  The standardized ``z`` is rounded 6 dp as a CATALYST
    column before the state step, and the recursion is plain
    left-to-right ``max(0, s + (z − k))`` float arithmetic — so an
    engine-independent replay (a recursive CTE carrying raw ``s`` over
    the same rounded ``z``) reproduces the state bit-for-bit.

    Scale: state is two doubles per series, partitioned by the series
    key; the static side broadcasts per micro-batch; rows are processed
    in event-time order within a batch (the data contract makes
    (series, time) unique), arrival order across batches."""
    if not series_cols:
        raise ValueError("stream_cusum needs at least one series key")
    series_cols = list(series_cols)
    # NULL values must drop BEFORE the state step, like the batch
    # operator: a NaN z would silently reset the carried state to 0
    # (max(0, s + nan) == 0.0) and swallow a real alarm
    enriched = (ntz_to_session_ts(sdf)
                .where(F.col(col).isNotNull())
                .join(F.broadcast(stats), series_cols, "inner")
                .where(F.col("sd") > 0)
                .withColumn("__z__", F.round(
                    (F.col(col).cast("double") - F.col("mu"))
                    / F.col("sd"), 6)))
    key_fields = [sdf.schema[c] for c in series_cols]
    out_schema = T.StructType(key_fields + [
        sdf.schema[time_col],
        T.StructField("z", T.DoubleType()),
        T.StructField("s_up", T.DoubleType()),
        T.StructField("s_dn", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("s_up", T.DoubleType()),
        T.StructField("s_dn", T.DoubleType()),
    ])
    kk = float(k)

    def step(key, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        su, sd_ = state.get if state.exists else (0.0, 0.0)
        pdf = pd.concat(list(pdfs)).sort_values(time_col)
        zs = pdf["__z__"].astype(float).tolist()
        ups, dns = [], []
        for z in zs:
            su = max(0.0, su + (z - kk))
            sd_ = max(0.0, sd_ + (-z - kk))
            ups.append(su)
            dns.append(sd_)
        state.update((su, sd_))
        out = pd.DataFrame({
            time_col: pdf[time_col].values,
            "z": zs, "s_up": ups, "s_dn": dns,
        })
        for i, c in enumerate(series_cols):
            out.insert(i, c, key[i])
        yield out[[f.name for f in out_schema.fields]]

    stepped = (enriched.groupBy(*series_cols)
               .applyInPandasWithState(step, out_schema, state_schema,
                                       "append",
                                       GroupStateTimeout.NoTimeout))
    hh = F.lit(float(h))
    s_up6 = F.round(F.col("s_up"), 6)
    s_dn6 = F.round(F.col("s_dn"), 6)
    return stepped.select(*series_cols, time_col, "z",
                          s_up6.alias("s_up"), s_dn6.alias("s_dn"),
                          (s_up6 > hh).alias("alarm_up"),
                          (s_dn6 > hh).alias("alarm_dn"))


def stream_dedup(sdf: DataFrame, time_col: str, key_cols: Sequence[str],
                 watermark: str = "1 hour") -> DataFrame:
    """Exactly-once streaming deduplication by key within the watermark
    horizon — ``dropDuplicatesWithinWatermark``: the first row per key
    is emitted, later copies arriving within ``watermark`` of it are
    dropped, and the key's state is evicted once the watermark passes
    (bounded state, unlike a plain streaming ``dropDuplicates`` whose
    key set grows forever).  THE ingestion front-door op: at-least-once
    sources (Kafka redeliveries, retried file commits) become
    effectively-once before any stateful aggregation sees the rows.

    State per key = one timestamp; eviction is watermark-driven, so
    memory is bounded by keys-per-horizon, not stream length."""
    return (sdf.withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(list(key_cols)))


def stream_lsh_probe(sdf: DataFrame, index, threshold: float = 0.2,
                     event_time_col: Optional[str] = None,
                     watermark: str = "1 hour") -> DataFrame:
    """Near-duplicate gate at STREAM ingest against a persisted LSH
    index (operators/dedup.py:LshIndex) — the production shape of
    dedup-at-ingest: every arriving document is signed (stateless
    expressions), its band entries stream-static-join the LOADED
    entries table, and colliding candidates verify with exact Jaccard
    against the LOADED indexed text.  Emits ``(id_new, id_index,
    jaccard)`` — the same contract as the batch
    ``lsh_probe_index``.

    Streaming semantics: the band join and the verify join are
    stream-STATIC inner joins (stateless, append-safe); the only
    stateful operator is the candidate-pair ``dropDuplicates`` (a pair
    colliding in two bands must score once), whose state is bounded by
    the number of DISTINCT near-duplicate candidate pairs seen — the
    quantity a dedup gate exists to keep small.  The stream's text
    rides the band entries to the verify (a stream cannot re-join
    itself without watermarked state; bytes-per-band is the price of
    statelessness).  No bucket prune: a stream cannot collect its
    bucket set up front — the static entries scan is pruned by the
    join itself instead.

    State lifetime: by default the pair-dedup state has NO TTL — it
    grows with every distinct candidate pair ever seen, which is
    bounded per corpus snapshot but unbounded over a long-lived ingest
    stream.  Pass ``event_time_col`` (an event-time timestamp on
    ``sdf``) to switch to ``dropDuplicatesWithinWatermark``: pair state
    is then evicted once the watermark passes, so memory is bounded by
    candidate pairs per ``watermark`` horizon.  The trade-off is the
    standard watermark contract — a delta document colliding with the
    SAME indexed doc again more than ``watermark`` after its first
    arrival re-emits the pair (a document arrives once per ingest, so
    in practice re-emission needs a source replay).  Without an
    event-time column, plan an operational restart/compaction cadence
    for the query (state is rebuilt empty on restart with a fresh
    checkpoint; the persisted index itself carries no streaming
    state)."""
    from orange3_timeseries_spark.operators.dedup import (
        jaccard_expr,
        minhash_signature_expr,
        shingles_expr,
    )

    id_col, text_col = index.id_col, index.text_col
    k, bands = index.k, index.bands
    rpb = k // bands
    if event_time_col is not None:
        sdf = sdf.withWatermark(event_time_col, watermark)
    sh = shingles_expr(F.col(text_col), index.n)
    # two-step select: the signature materializes ONCE per row behind
    # a named alias; inlining it into the band array would re-evaluate
    # the whole shingle+minhash tree per band (the batch path's
    # measured 70x trap, operators/dedup.py:_band_entries)
    time_cols = [event_time_col] if event_time_col is not None else []
    base = sdf.select(F.col(id_col),
                      F.col(text_col).alias("__t_n__"), *time_cols,
                      minhash_signature_expr(sh, k, index.hash_family)
                      .alias("sig"))
    ent = base.select(
        id_col, "__t_n__", *time_cols,
        F.posexplode(F.array(*[
            F.xxhash64(*[F.col("sig")[b * rpb + r]
                         for r in range(rpb)])
            for b in range(bands)])).alias("band", "band_key"))
    a = index.entries.alias("a")
    cand = (ent.alias("b")
            .join(a, [F.col("a.band") == F.col("b.band"),
                      F.col("a.band_key") == F.col("b.band_key")])
            .select(F.col(f"b.{id_col}").alias("id_new"),
                    F.col("__t_n__"),
                    *[F.col(f"b.{c}") for c in time_cols],
                    F.col(f"a.{id_col}").alias("id_index")))
    if event_time_col is not None:
        cand = cand.dropDuplicatesWithinWatermark(["id_new", "id_index"]) \
            .drop(event_time_col)
    else:
        cand = cand.dropDuplicates(["id_new", "id_index"])
    ti = index.docs.select(F.col(id_col).alias("id_index"),
                           F.col(text_col).alias("__t_i__"))
    # bind the shingle arrays behind aliases BEFORE jaccard references
    # them (intersection + union + two sizes = ~3 references each;
    # inlined, the interpreted HOF tokenizer would re-run per
    # reference — the batch path's measured 70-100x trap)
    ver = (cand.join(ti, "id_index")
           .withColumn("__sh_n__", shingles_expr(F.col("__t_n__"),
                                                 index.n))
           .withColumn("__sh_i__", shingles_expr(F.col("__t_i__"),
                                                 index.n))
           .withColumn("__j__", jaccard_expr(F.col("__sh_n__"),
                                             F.col("__sh_i__"))))
    return (ver.where(F.col("__j__") >= threshold)
            .select("id_new", "id_index", F.col("__j__").alias("jaccard")))
