"""Persisted MinHash-LSH dedup index: build → write → read → probe /
merge (operators/dedup.py:LshIndex) — the dedup-at-ingest serving
sibling of the BM25/IVF index registries."""

import pytest

from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.dedup import (
    lsh_build_index,
    lsh_merge_index,
    lsh_probe_index,
    minhash_lsh_pairs_between,
    read_lsh_index,
    write_lsh_index,
)

_BASE = ("the quick brown fox jumps over the lazy dog while the cat "
         "watches from the warm windowsill nearby every single day")
_ALT = ("completely different content about distributed query engines "
        "columnar storage vectorized execution and shuffle planning")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [(1, _BASE),
          (2, _BASE.replace("lazy", "sleepy")),
          (3, _ALT),
          (4, _ALT + " with adaptive runtime replanning added"),
          (5, "short unrelated note"),
          (6, _BASE.replace("dog", "wolf").replace("cat", "kitten"))]
PROBE = [(101, _BASE.replace("warm", "cold")),          # near-dup of 1/2/6
         (102, "nothing like anything indexed here at all whatsoever"),
         (103, _ALT.replace("shuffle", "exchange"))]    # near-dup of 3/4


class TestLshIndexRegistry:
    def _index(self, spark, tmp_path):
        idx = lsh_build_index(_docs(spark, CORPUS), n_buckets=8)
        path = str(tmp_path / "lsh_index")
        write_lsh_index(idx, path)
        return read_lsh_index(spark, path)

    def test_probe_matches_live_between(self, spark, tmp_path):
        probe = _docs(spark, PROBE)
        served = lsh_probe_index(self._index(spark, tmp_path), probe,
                                 threshold=0.2)
        live = minhash_lsh_pairs_between(probe, _docs(spark, CORPUS),
                                         "text", "doc_id",
                                         threshold=0.2)
        key = lambda r: (r[0], r[1])  # noqa: E731
        srows = sorted(map(tuple, served.collect()), key=key)
        lrows = sorted(map(tuple, live.collect()), key=key)
        assert len(srows) > 0
        # EXACT equality, jaccard double included
        assert srows == lrows
        # (101, 1) is a planted near-dup whose bands collide under the
        # fixed hash constants (103's single-word edit happens not to
        # survive banding at k=16/b=4 — the live path misses it too,
        # and the equality above asserts exactly that agreement)
        assert (101, 1) in {(n, i) for n, i, _ in srows}

    def test_params_round_trip(self, spark, tmp_path):
        idx = lsh_build_index(_docs(spark, CORPUS), k=8, bands=2, n=2,
                              n_buckets=4, hash_family="xxhash64")
        path = str(tmp_path / "lsh_params")
        write_lsh_index(idx, path)
        got = read_lsh_index(spark, path)
        assert (got.k, got.bands, got.n, got.n_buckets,
                got.hash_family, got.id_col, got.text_col) == \
            (8, 2, 2, 4, "xxhash64", "doc_id", "text")

    def test_prune_changes_nothing(self, spark, tmp_path):
        idx = self._index(spark, tmp_path)
        probe = _docs(spark, PROBE)
        a = lsh_probe_index(idx, probe, prune_buckets=True)
        b = lsh_probe_index(idx, probe, prune_buckets=False)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect()))

    def test_probe_plan_prunes_partitions_no_resignature(
            self, spark, tmp_path):
        import re

        idx = self._index(spark, tmp_path)
        # the candidate stage (pinned eagerly at probe time) prunes the
        # ENTRIES scan by band-key bucket — assert on its own plan
        probe = _docs(spark, PROBE)
        from orange3_timeseries_spark.operators.dedup import (
            _band_entries,
        )
        eb = _band_entries(probe, "text", "doc_id", idx.k, idx.bands,
                           idx.n, idx.hash_family)
        bks = [r[0] for r in
               eb.select(F.pmod(F.col("band_key"),
                                F.lit(idx.n_buckets)).cast("int")
                         .alias("b")).distinct().collect()]
        cand_plan = (idx.entries.where(F.col("bucket").isin(bks))
                     ._jdf.queryExecution().executedPlan().toString())
        assert re.search(r"PartitionFilters: \[[^\]]*bucket#\d+ (=|IN)",
                         cand_plan), cand_plan[:2000]
        # the VERIFY stage (the final plan, after the eager candidate
        # checkpoint) scans ONLY the docs state table, pruned to the
        # candidates' id-hash buckets — the indexed corpus text is
        # never fully re-read, and nothing is re-shingled corpus-side
        served = lsh_probe_index(idx, probe)
        plan = served._jdf.queryExecution().executedPlan().toString()
        assert re.search(
            r"PartitionFilters: \[[^\]]*dbucket#\d+ (=|IN)",
            plan), plan[:2000]
        assert plan.count("FileScan parquet") == 1, plan[:2000]

    def test_merge_equals_rebuild(self, spark, tmp_path):
        half_a = [r for r in CORPUS if r[0] % 2 == 0]
        half_b = [r for r in CORPUS if r[0] % 2 == 1]
        merged = lsh_merge_index(lsh_build_index(_docs(spark, half_a)),
                                 _docs(spark, half_b))
        rebuilt = lsh_build_index(_docs(spark, CORPUS))
        cols = ["doc_id", "band", "band_key", "bucket"]
        assert sorted(map(tuple, merged.entries.select(cols).collect())) \
            == sorted(map(tuple,
                          rebuilt.entries.select(cols).collect()))
        assert merged.docs.count() == len(CORPUS)
        # probing the merged index == probing the rebuilt one
        probe = _docs(spark, PROBE)
        a = lsh_probe_index(merged, probe)
        b = lsh_probe_index(rebuilt, probe)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect()))

    def test_merge_rejects_duplicate_ids(self, spark):
        idx = lsh_build_index(_docs(spark, CORPUS))
        with pytest.raises(ValueError, match="already indexed"):
            lsh_merge_index(idx, _docs(spark, [(1, "re-ingested doc")]))

    def test_probe_empty_when_nothing_collides(self, spark, tmp_path):
        probe = _docs(spark, [(201, "zxqv wrtp lkjh mnbv poiu ytre")])
        out = lsh_probe_index(self._index(spark, tmp_path), probe)
        assert out.count() == 0


class TestLshIndexEdges:
    def test_xxhash_family_round_trip_probe(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.dedup import (
            lsh_build_index, lsh_probe_index,
            minhash_lsh_pairs_between, read_lsh_index,
            write_lsh_index,
        )

        idx = lsh_build_index(_docs(spark, CORPUS),
                              hash_family="xxhash64", n_buckets=8)
        path = str(tmp_path / "lsh_xx")
        write_lsh_index(idx, path)
        loaded = read_lsh_index(spark, path)
        assert loaded.hash_family == "xxhash64"
        probe = _docs(spark, PROBE)
        served = sorted(map(tuple,
                            lsh_probe_index(loaded, probe).collect()))
        # full live parity is covered for md5; here assert the loaded
        # index probes under its PERSISTED family and finds the
        # planted near-dup (a family mismatch would find nothing:
        # xxhash64 and md5 band keys never collide)
        assert (101, 1) in {(a, b) for a, b, _ in served}

    def test_probe_empty_delta(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.dedup import (
            lsh_build_index, lsh_probe_index, read_lsh_index,
            write_lsh_index,
        )

        idx = lsh_build_index(_docs(spark, CORPUS), n_buckets=8)
        path = str(tmp_path / "lsh_empty")
        write_lsh_index(idx, path)
        out = lsh_probe_index(read_lsh_index(spark, path),
                              _docs(spark, []))
        assert out.count() == 0
