"""Persisted SimHash dedup index: build → write → read → probe /
merge / append / compact (operators/dedup.py:SimHashIndex) — the
Hamming-distance sibling of the LSH dedup registry."""

import pytest

from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.dedup import (
    compact_simhash_index,
    read_simhash_index,
    simhash_append_index,
    simhash_build_index,
    simhash_merge_index,
    simhash_pairs,
    simhash_probe_index,
    write_simhash_index,
)
from orange3_timeseries_spark.operators.index_store import (
    current_version,
)

_BASE = ("the quick brown fox jumps over the lazy dog while the cat "
         "watches from the warm windowsill nearby every single day "
         "and the sun sets slowly behind the tall green hills")
_ALT = ("completely different content about distributed query engines "
        "columnar storage vectorized execution shuffle planning and "
        "adaptive runtime statistics for large analytical workloads")

CORPUS = [(1, _BASE),
          (2, _BASE.replace("lazy", "sleepy")),
          (3, _ALT),
          (4, _ALT.replace("shuffle", "exchange")),
          (5, "short unrelated note about nothing in particular"),
          (6, _BASE.replace("dog", "wolf"))]
PROBE = [(101, _BASE.replace("warm", "cold")),
         (102, "nothing like anything indexed here at all whatsoever"),
         (103, _ALT.replace("adaptive", "dynamic"))]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_cross_pairs(spark, max_distance=3):
    """Ground truth from the LIVE all-pairs operator over the union:
    probe ids are all > corpus ids, so every cross pair lands as
    (id_a=indexed, id_b=probe)."""
    both = _docs(spark, CORPUS + PROBE)
    pairs = simhash_pairs(both, "text", "doc_id", bits=48,
                          max_distance=max_distance, band_bits=12)
    cross = pairs.where((F.col("id_a") <= 100) & (F.col("id_b") >= 101))
    return sorted(map(tuple,
                      cross.select(F.col("id_b").alias("id_new"),
                                   F.col("id_a").alias("id_index"),
                                   "hamming").collect()))


class TestSimHashRegistry:
    def test_probe_matches_live_pairs(self, spark, tmp_path):
        idx = simhash_build_index(_docs(spark, CORPUS), n_buckets=8)
        root = str(tmp_path / "simhash")
        write_simhash_index(idx, root)
        out = simhash_probe_index(read_simhash_index(spark, root),
                                  _docs(spark, PROBE))
        got = sorted(map(tuple, out.collect()))
        exp = _expected_cross_pairs(spark)
        assert got == exp
        assert len(got) > 0                     # planted near-dups hit
        assert (101, 1) in {(a, b) for a, b, _ in got}
        # the clean probe doc matches nothing
        assert all(a != 102 for a, _, _ in got)

    def test_merge_equals_rebuild_and_guard(self, spark, tmp_path):
        d = _docs(spark, CORPUS)
        base = simhash_build_index(d.where(F.col("doc_id") <= 3),
                                   n_buckets=8)
        merged = simhash_merge_index(base, d.where(F.col("doc_id") > 3))
        rebuilt = simhash_build_index(d, n_buckets=8)
        assert sorted(map(tuple, merged.entries.collect())) == \
            sorted(map(tuple, rebuilt.entries.collect()))
        with pytest.raises(ValueError, match="simhash_merge_index"):
            simhash_merge_index(base, d.where(F.col("doc_id") == 3))

    def test_append_compact_lifecycle(self, spark, tmp_path):
        d = _docs(spark, CORPUS)
        root = str(tmp_path / "simhash_lc")
        write_simhash_index(
            simhash_build_index(d.where(F.col("doc_id") <= 2),
                                n_buckets=8), root)
        simhash_append_index(spark, root, d.where(F.col("doc_id") == 3))
        simhash_append_index(spark, root, d.where(F.col("doc_id") > 3))
        assert current_version(root) == 1
        out = simhash_probe_index(read_simhash_index(spark, root),
                                  _docs(spark, PROBE))
        exp = _expected_cross_pairs(spark)
        assert sorted(map(tuple, out.collect())) == exp
        with pytest.raises(ValueError, match="simhash_append_index"):
            simhash_append_index(spark, root,
                                 d.where(F.col("doc_id") == 5))
        compact_simhash_index(spark, root)
        assert current_version(root) == 2
        again = simhash_probe_index(read_simhash_index(spark, root),
                                    _docs(spark, PROBE))
        assert sorted(map(tuple, again.collect())) == exp
