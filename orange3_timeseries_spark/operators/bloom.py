"""Bloom-filter membership for cross-corpus deduplication.

The standard tool for "have we seen this document before?" against a
reference corpus too large to equi-join per batch: build the filter ONCE
over the reference corpus (one aggregation, output ≤ m/32 skinny rows),
then probe any number of candidate corpora against it with no access to
the reference data itself.  Guarantees no false negatives; false-positive
rate is governed by ``bloom_params``.

Scale design (100 TB):

- **Build** is a map-side-combinable ``bit_or`` aggregation over
  ``(lane, mask)`` rows — one shuffle of at most m/32 rows regardless of
  corpus size.  For n = 10^9 reference docs at 1 % fp, m ≈ 9.6·10^9 bits
  → the materialized filter is ~300 M sparse lane rows (~5 GB), written
  once and reused across every probe run.
- **Probe** explodes k skinny ``(id, lane, mask)`` rows per candidate and
  equi-joins on ``lane`` — broadcast when the filter fits (m ≤ 2^27 bits
  by default), plain shuffled equi-join (never a nested loop) otherwise.
- All hashing is the portable md5-based ``phash`` (operators/hashing.py),
  so a DuckDB oracle replays build AND probe bit-for-bit.

Lanes hold 32 bits each (in a 64-bit column): masks stay positive in
signed arithmetic, so Spark LongType and DuckDB BIGINT agree exactly.

Reference scope: the reference engine has no cross-corpus membership
operator; this extends the dedup tier for training-data pipelines
(brief: deduplication at 100 TB).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.hashing import phash_seeded

#: bits per lane — 32 keeps every mask positive in a signed 64-bit value
LANE_BITS = 32
#: filters at or under this many bits are broadcast on the probe side
BROADCAST_MAX_BITS = 1 << 27


def bloom_params(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n_items`` keys at ``fp_rate``:
    m = -n·ln p / (ln 2)², k = (m/n)·ln 2, m rounded up to whole lanes."""
    n = max(1, n_items)
    m = int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2)))
    m += (-m) % LANE_BITS
    m = max(m, LANE_BITS)
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _lane_mask(pos: Column) -> tuple[Column, Column]:
    # lane = pos // 32, mask = 1 << (pos % 32); shift/AND forms are exact
    # on longs (no float division) and mirror DuckDB's (>> 5) / (& 31)
    lane = F.call_function("shiftright", pos, F.lit(5))
    mask = F.call_function("shiftleft", F.lit(1).cast("long"),
                           pos.bitwiseAND(F.lit(31)).cast("int"))
    return lane, mask


def _positions(key: Column, m_bits: int, k: int) -> Column:
    return F.array(*[phash_seeded(key, i) % F.lit(m_bits) for i in range(k)])


def bloom_build(df: DataFrame, key_col: str, m_bits: int,
                k: int) -> DataFrame:
    """Build the filter over ``df[key_col]``: returns sparse
    ``(lane: long, bits: long)`` rows — lanes with no bit set are absent.

    One ``bit_or`` aggregation; partial aggregation makes the shuffle
    carry at most (set lanes) × (upstream partitions) rows, bounded by
    m/32 per partition however large the input corpus is."""
    pos = F.explode(_positions(F.col(key_col).cast("string"), m_bits, k))
    entries = df.select(pos.alias("pos"))
    lane, mask = _lane_mask(F.col("pos"))
    return (entries.select(lane.alias("lane"), mask.alias("mask"))
            .groupBy("lane").agg(F.bit_or("mask").alias("bits")))


def bloom_probe(df: DataFrame, id_col: str, key_col: str,
                lanes: DataFrame, m_bits: int, k: int,
                out_col: str = "maybe_member") -> DataFrame:
    """Probe every row of ``df`` against a built filter: returns
    ``(id_col, out_col)`` with ``out_col`` true iff all k bits are set
    (possible member — false positives only, never false negatives).

    The probe is k skinny rows per input row equi-joined on ``lane``; a
    missing lane (null bits) is an immediate miss."""
    pos = F.posexplode(_positions(F.col(key_col).cast("string"), m_bits, k))
    entries = df.select(F.col(id_col), pos.alias("i", "pos"))
    lane, mask = _lane_mask(F.col("pos"))
    entries = entries.select(id_col, lane.alias("lane"), mask.alias("mask"))
    if m_bits <= BROADCAST_MAX_BITS:
        lanes = F.broadcast(lanes)
    hit = (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
    probed = (entries.join(lanes, "lane", "left")
              .select(id_col,
                      F.coalesce(hit, F.lit(False)).alias("__hit__")))
    return (probed.groupBy(id_col)
            .agg(F.min("__hit__").alias(out_col)))


def bloom_membership(df: DataFrame, id_col: str, key_col: str,
                     reference: DataFrame, ref_key_col: str,
                     m_bits: int, k: int,
                     out_col: str = "maybe_member") -> DataFrame:
    """Build over ``reference`` and probe ``df`` in one call."""
    lanes = bloom_build(reference, ref_key_col, m_bits, k)
    return bloom_probe(df, id_col, key_col, lanes, m_bits, k, out_col)


def dense_lanes(lanes: DataFrame, m_bits: int):
    """Collect sparse (lane, bits) rows into a dense Python list of
    m/32 lane values — bounded driver step (m ≤ 2^27 → ≤ 32 MB), the
    model-rides-the-closure split for stateless probing."""
    vals = [0] * (m_bits // LANE_BITS)
    for r in lanes.collect():
        vals[int(r["lane"])] = int(r["bits"])
    return vals


def bloom_probe_expr(key: Column, lane_values, m_bits: int,
                     k: int) -> Column:
    """Pure-expression membership check against an embedded dense
    filter: an AND chain of k bit tests with the lane table as an array
    literal — no join, no state, usable in a STREAMING filter (stateless
    map, append-mode safe) or any batch predicate.  For filters too big
    to embed (> ~2^24 bits), use :func:`bloom_probe`'s lane join
    instead."""
    arr = F.array(*[F.lit(int(v)).cast("long") for v in lane_values])
    checks = []
    for i in range(k):
        pos = phash_seeded(key.cast("string"), i) % F.lit(m_bits)
        lane, mask = _lane_mask(pos)
        bits = F.element_at(arr, (lane + 1).cast("int"))
        checks.append(bits.bitwiseAND(mask) == mask)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
