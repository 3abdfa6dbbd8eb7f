"""Pipeline contract audits: the join-coverage report and the shared
disjoint-id merge guard (:func:`check_disjoint_ids`) every
persisted-index family (BM25 / LSH / IVF / PQ) enforces its append
contract with.

Join coverage is the reusable check for the silent-row-drop bug
class found in round 9: the sf0.1 ``embeddings`` table covers only
2000/5000 documents, so ANY ``documents ⋈ embeddings`` inner join
silently discarded 60% of the corpus while every downstream number kept
looking plausible (``pipeline_curate_semantic``).  Run this BEFORE
joining two modalities: it reports, per side, how many rows and keys
actually find a partner.

Spark-first plan: one map-side-combined ``groupBy(key)`` per side (the
shuffle carries distinct keys, not rows), a key-level full-outer join,
and a single-row final aggregate — no raw-table join ever happens, so
the audit costs a fraction of the join it protects.  NULL keys never
match an equi-join, and the audit scores them the same way: they count
into ``n_rows`` / ``null_key_rows`` but never into matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["coverage_audit"]


def _as_list(v) -> list[str]:
    return [v] if isinstance(v, str) else list(v)


def coverage_audit(left: DataFrame, right: DataFrame,
                   left_on: str | Sequence[str],
                   right_on: str | Sequence[str] | None = None,
                   labels: tuple[str, str] = ("left", "right")
                   ) -> DataFrame:
    """Per-side match/miss accounting for an intended equi-join.

    Returns exactly two rows (one per side, in ``labels`` order) with:

    - ``side`` — the label,
    - ``n_rows`` — total rows on that side (NULL-key rows included),
    - ``null_key_rows`` — rows whose join key is (partly) NULL, which an
      equi-join can never match,
    - ``n_keys`` — distinct non-NULL key values,
    - ``matched_rows`` / ``matched_keys`` — rows / distinct keys with at
      least one partner on the other side,
    - ``row_share`` / ``key_share`` — the matched fractions, emitted as
      one exact-integer division each (bit-identical on any engine; a
      6dp re-round of an int/int rational would sit exactly on
      cross-engine tie boundaries).

    An inner join keeps exactly ``matched_rows_left × partners`` — so
    ``row_share < 1`` on either side is the signal that the join is
    about to silently drop data (the round-9 curate bug fired at
    ``row_share = 0.4``).

    Scale: the only shuffles are the two per-key count aggregates
    (map-side combined — distinct keys cross the wire, not rows) and
    the key-level join; the final aggregate is one row.  Skewed keys
    are already collapsed to one row per key before the join, so key
    skew cannot concentrate a partition."""
    lkeys = _as_list(left_on)
    rkeys = _as_list(right_on) if right_on is not None else lkeys
    if len(lkeys) != len(rkeys):
        raise ValueError("left_on and right_on must have equal length")
    names = [f"__k{i}__" for i in range(len(lkeys))]

    def keyed(df: DataFrame, keys: list[str], cnt: str, nul: str):
        sel = [F.col(k).alias(n) for k, n in zip(keys, names)]
        isnull = None
        for n in names:
            c = F.col(n).isNull()
            isnull = c if isnull is None else (isnull | c)
        return (df.select(*sel)
                .groupBy(*names)
                .agg(F.count(F.lit(1)).alias(cnt))
                .withColumn(nul, isnull))

    la = keyed(left, lkeys, "__nl__", "__lnul__")
    ra = keyed(right, rkeys, "__nr__", "__rnul__")
    j = la.join(ra, on=names, how="full_outer")

    nl, nr = F.col("__nl__"), F.col("__nr__")
    lnul = F.coalesce(F.col("__lnul__"), F.lit(False))
    rnul = F.coalesce(F.col("__rnul__"), F.lit(False))
    lmatch = nl.isNotNull() & ~lnul & nr.isNotNull()
    rmatch = nr.isNotNull() & ~rnul & nl.isNotNull()
    z = F.lit(0).cast("long")
    row = j.agg(
        F.coalesce(F.sum(nl), z).alias("lr"),
        F.coalesce(F.sum(F.when(lnul, nl)), z).alias("lnull"),
        F.count(F.when(nl.isNotNull() & ~lnul, True)).alias("lk"),
        F.coalesce(F.sum(F.when(lmatch, nl)), z).alias("lmr"),
        F.count(F.when(lmatch, True)).alias("lmk"),
        F.coalesce(F.sum(nr), z).alias("rr"),
        F.coalesce(F.sum(F.when(rnul, nr)), z).alias("rnull"),
        F.count(F.when(nr.isNotNull() & ~rnul, True)).alias("rk"),
        F.coalesce(F.sum(F.when(rmatch, nr)), z).alias("rmr"),
        F.count(F.when(rmatch, True)).alias("rmk"))

    def side(label: str, r, nul, k, mr, mk):
        # one struct per side off the SAME single-row aggregate — the
        # two output rows explode from one pass, not a union that would
        # re-run the whole audit plan twice
        return F.struct(
            F.lit(label).alias("side"),
            F.col(r).cast("long").alias("n_rows"),
            F.col(nul).cast("long").alias("null_key_rows"),
            F.col(k).cast("long").alias("n_keys"),
            F.col(mr).cast("long").alias("matched_rows"),
            F.col(mk).cast("long").alias("matched_keys"),
            F.when(F.col(r) > 0,
                   F.col(mr).cast("double") / F.col(r))
            .otherwise(F.lit(None).cast("double")).alias("row_share"),
            F.when(F.col(k) > 0,
                   F.col(mk).cast("double") / F.col(k))
            .otherwise(F.lit(None).cast("double")).alias("key_share"))

    return (row.select(F.explode(F.array(
                side(labels[0], "lr", "lnull", "lk", "lmr", "lmk"),
                side(labels[1], "rr", "rnull", "rk", "rmr", "rmk")))
            .alias("__s__")).select("__s__.*"))


def check_disjoint_ids(indexed_ids: DataFrame, new_rows: DataFrame,
                       id_col: str, fn: str, consequence: str) -> None:
    """The shared fail-loud guard every persisted-index merge uses
    (BM25 / LSH / IVF / PQ): one early-exit semi-join of the ingest ids
    into the indexed ids; raises ``ValueError`` naming the colliding id
    and the merge-specific consequence.  ``indexed_ids`` may carry the
    id under any column name — pass ``.select(F.col(...).alias(id_col))``
    if needed."""
    dup = (indexed_ids.select(id_col)
           .join(new_rows.select(id_col).distinct(), id_col,
                 "left_semi")
           .limit(1).collect())
    if dup:
        raise ValueError(
            f"{fn}: {id_col}={dup[0][0]!r} is already indexed — "
            f"merging would {consequence}. Dedup the ingest (or pass "
            "check_disjoint=False if disjointness is proven "
            "upstream).")


__all__.append("check_disjoint_ids")


def check_covers_ids(indexed_ids: DataFrame, vectors: DataFrame,
                     id_col: str, fn: str) -> None:
    """The fail-loud guard for retrain-style operators that RE-DERIVE
    per-id state by joining indexed rows back to a caller-supplied
    source table (`pq_retrain_subspaces` / `ivfpq_retrain_subspaces`):
    the source must cover every indexed id EXACTLY ONCE.

    - a MISSING id means the inner join silently drops that row from
      the new generation (an index that shrinks on retrain);
    - a DUPLICATED id means the join fans out and the row appears
      twice (an index that grows, serves duplicate neighbors, and
      inflates every count the monitors report).

    Both are the silent-corruption class; both raise naming offending
    ids.  Cost: one anti-join + one grouped dup scan over the source
    ids — the same bounded-collect early-exit shape as
    :func:`check_disjoint_ids`."""
    ids = vectors.select(id_col)
    missing = (indexed_ids
               .join(ids.distinct(), id_col, "left_anti")
               .limit(5).collect())
    if missing:
        vals = [r[id_col] for r in missing]
        raise ValueError(
            f"{fn}: the vectors argument does not cover every indexed "
            f"id (first missing: {vals}) — re-encoding would silently "
            "drop those rows from the new generation. Pass the full "
            "current corpus (indexed base + every appended batch), or "
            "rebuild the index from scratch.")
    dups = (ids.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__n__"))
            .where(F.col("__n__") > 1)
            .limit(5).collect())
    if dups:
        vals = [r[id_col] for r in dups]
        raise ValueError(
            f"{fn}: the vectors argument carries duplicate ids "
            f"(first: {vals}) — the re-encode join would fan out and "
            "the new generation would hold those rows TWICE (duplicate "
            "neighbors at serve time, inflated monitor counts). "
            "Deduplicate the source (e.g. dropDuplicates on the id) "
            "and re-run.")


__all__.append("check_covers_ids")
