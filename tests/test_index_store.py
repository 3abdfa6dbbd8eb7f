"""Versioned index storage (operators/index_store.py): the
write/pointer-swap lifecycle shared by the BM25/IVF/PQ/LSH persisted
index families — generation allocation, atomic pointer commit,
crash-mid-write safety (stale pointer keeps serving the old
generation), read→merge→write on ONE logical path, bare-layout
fallback, and vacuum retention."""

import os

import pytest

from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.index_store import (
    begin_version,
    commit_version,
    current_version,
    list_versions,
    resolve_index_path,
    vacuum_index,
)

DOCS = [(i, f"token{i} alpha beta gamma delta common words here {i}")
        for i in range(1, 13)]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(1, "alpha beta token3"), (2, "gamma token7 delta")],
        "query_id long, text string")


class TestPointerPrimitives:
    def test_fresh_root_allocates_v1(self, tmp_path):
        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        assert v1.endswith("v=1")
        assert list_versions(root) == [1]
        # uncommitted: readers still see nothing versioned
        assert current_version(root) is None
        assert resolve_index_path(root) == root

    def test_commit_swaps_pointer(self, tmp_path):
        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        commit_version(root, v1)
        assert current_version(root) == 1
        assert resolve_index_path(root) == os.path.join(root, "v=1")
        v2 = begin_version(root)
        assert v2.endswith("v=2")
        # not committed yet -> still serving v=1
        assert resolve_index_path(root).endswith("v=1")
        commit_version(root, v2)
        assert resolve_index_path(root).endswith("v=2")

    def test_commit_rejects_nonexistent_generation(self, tmp_path):
        root = str(tmp_path / "idx")
        begin_version(root)
        with pytest.raises(ValueError, match="does not exist"):
            commit_version(root, os.path.join(root, "v=9"))
        with pytest.raises(ValueError, match="v=<n>"):
            commit_version(root, os.path.join(root, "postings"))

    def test_corrupt_pointer_raises(self, tmp_path):
        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        commit_version(root, v1)
        with open(os.path.join(root, "_CURRENT"), "w") as f:
            f.write("garbage\n")
        with pytest.raises(ValueError, match="corrupt pointer"):
            current_version(root)

    def test_pointer_to_missing_dir_raises(self, tmp_path):
        import shutil

        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        commit_version(root, v1)
        shutil.rmtree(v1)
        with pytest.raises(ValueError, match="damaged"):
            resolve_index_path(root)

    def test_vacuum_keeps_current_and_inflight(self, tmp_path):
        root = str(tmp_path / "idx")
        for _ in range(3):
            commit_version(root, begin_version(root))
        begin_version(root)                     # v=4, in-flight
        removed = vacuum_index(root, keep_last=1)
        assert removed == [1, 2]
        assert list_versions(root) == [3, 4]    # current + uncommitted
        assert resolve_index_path(root).endswith("v=3")

    def test_vacuum_keep_last_two(self, tmp_path):
        root = str(tmp_path / "idx")
        for _ in range(3):
            commit_version(root, begin_version(root))
        assert vacuum_index(root, keep_last=2) == [1]
        assert list_versions(root) == [2, 3]

    def test_vacuum_torn_generation_never_counts_as_rollback(
            self, tmp_path):
        # v=1 committed; v=2 TORN (write crashed before commit); v=3
        # committed.  keep_last=2 must retain the COMPLETE rollback
        # target v=1 and delete the torn v=2 — counting torn dirs
        # toward retention would vacuum the only good generation while
        # keeping garbage
        root = str(tmp_path / "idx")
        commit_version(root, begin_version(root))
        begin_version(root)                     # v=2, never committed
        commit_version(root, begin_version(root))  # v=3
        assert vacuum_index(root, keep_last=2) == [2]
        assert list_versions(root) == [1, 3]
        assert resolve_index_path(root).endswith("v=3")

    def test_vacuum_noop_without_pointer(self, tmp_path):
        assert vacuum_index(str(tmp_path / "nothing")) == []

    def test_remote_schemes_rejected_loudly(self, tmp_path):
        # os-level pointer ops on a remote scheme would create a literal
        # ./hdfs:/... dir while Spark writes remotely — readers would
        # silently fall back to stale bare tables; fail loud instead
        for p in ("hdfs://nn/idx", "s3a://bucket/idx", "abfss://c@a/idx"):
            with pytest.raises(ValueError, match="non-local"):
                begin_version(p)
            with pytest.raises(ValueError, match="non-local"):
                resolve_index_path(p)
        # file: scheme and plain paths still work
        v1 = begin_version("file://" + str(tmp_path / "idx"))
        assert v1.endswith("v=1")


class TestBm25Lifecycle:
    def test_same_path_merge_rewrite_and_crash_safety(self, spark,
                                                      tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index,
            bm25_merge_index,
            bm25_topk,
            bm25_topk_from_index,
            read_bm25_index,
            write_bm25_index,
        )

        root = str(tmp_path / "bm25")
        d = _docs(spark)
        half = d.where(F.col("doc_id") <= 6)
        write_bm25_index(bm25_build_index(half, n_buckets=8), root)
        assert current_version(root) == 1

        # read → merge → write on the SAME logical path (the supported
        # lifecycle): the merged write streams from v=1 into v=2
        base = read_bm25_index(spark, root)
        merged = bm25_merge_index(base, d.where(F.col("doc_id") > 6))
        write_bm25_index(merged, root)
        assert current_version(root) == 2

        served = bm25_topk_from_index(read_bm25_index(spark, root),
                                      _queries(spark), top_k=3)
        live = bm25_topk(d, _queries(spark), top_k=3)
        assert sorted(map(tuple, served.collect())) == \
            sorted(map(tuple, live.collect()))

        # crash mid-write: a partial, uncommitted v=3 must be invisible
        v3 = begin_version(root)
        merged.postings.limit(1).write.parquet(
            os.path.join(v3, "postings"))       # torn state, no commit
        again = bm25_topk_from_index(read_bm25_index(spark, root),
                                     _queries(spark), top_k=3)
        assert sorted(map(tuple, again.collect())) == \
            sorted(map(tuple, live.collect()))
        assert current_version(root) == 2

        # vacuum drops v=1 only; the serve keeps working
        assert vacuum_index(root) == [1]
        still = bm25_topk_from_index(read_bm25_index(spark, root),
                                     _queries(spark), top_k=3)
        assert sorted(map(tuple, still.collect())) == \
            sorted(map(tuple, live.collect()))

    def test_bare_legacy_layout_still_reads(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index,
            bm25_topk,
            bm25_topk_from_index,
            read_bm25_index,
        )

        root = str(tmp_path / "bm25_bare")
        idx = bm25_build_index(_docs(spark), n_buckets=8)
        # simulate a pre-versioning write: tables directly under root
        idx.postings.write.partitionBy("bucket").parquet(
            os.path.join(root, "postings"))
        idx.token_df.write.partitionBy("bucket").parquet(
            os.path.join(root, "token_df"))
        idx.stats.write.parquet(os.path.join(root, "stats"))
        spark.createDataFrame([("doc_id", 8)],
                              "id_col string, n_buckets int") \
            .write.parquet(os.path.join(root, "params"))
        served = bm25_topk_from_index(read_bm25_index(spark, root),
                                      _queries(spark), top_k=3)
        live = bm25_topk(_docs(spark), _queries(spark), top_k=3)
        assert sorted(map(tuple, served.collect())) == \
            sorted(map(tuple, live.collect()))

    def test_legacy_pre_params_recovers_n_buckets_from_stats(
            self, spark, tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index,
            read_bm25_index,
        )

        root = str(tmp_path / "bm25_noparams")
        idx = bm25_build_index(_docs(spark), n_buckets=8)
        idx.postings.write.partitionBy("bucket").parquet(
            os.path.join(root, "postings"))
        idx.token_df.write.partitionBy("bucket").parquet(
            os.path.join(root, "token_df"))
        idx.stats.write.parquet(os.path.join(root, "stats"))
        loaded = read_bm25_index(spark, root)
        assert loaded.id_col == "doc_id"
        assert loaded.n_buckets == 8            # from stats, NOT the 64 default

    def test_corrupt_params_raises_instead_of_fallback(self, spark,
                                                       tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index,
            read_bm25_index,
            write_bm25_index,
        )

        root = str(tmp_path / "bm25_corrupt")
        write_bm25_index(bm25_build_index(_docs(spark), n_buckets=8),
                         root)
        vdir = resolve_index_path(root)
        pq = [os.path.join(vdir, "params", f)
              for f in os.listdir(os.path.join(vdir, "params"))
              if f.endswith(".parquet")]
        assert pq
        with open(pq[0], "wb") as f:
            f.write(b"not parquet at all")
        with pytest.raises(Exception) as e:
            read_bm25_index(spark, root)
        # a REAL I/O error must surface, not the doc_id/64 fallback
        assert "AnalysisException" not in type(e.value).__name__

    def test_write_guards_untrusted_stats_mismatch(self, spark,
                                                   tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            Bm25Index,
            bm25_build_index,
            write_bm25_index,
        )

        idx = bm25_build_index(_docs(spark), n_buckets=8)
        # a "legacy pre-sentinel" base: stats claim one more doc than
        # the postings cover (the token-less-doc undercount class)
        bad_stats = idx.stats.select(
            (F.col("n_docs") + 1).alias("n_docs"), "sum_dl", "n_buckets")
        bad = Bm25Index(idx.postings, idx.token_df, bad_stats,
                        idx.id_col, idx.n_buckets, stats_trusted=False)
        with pytest.raises(ValueError, match="disagree"):
            write_bm25_index(bad, str(tmp_path / "bm25_bad"))


class TestOtherFamiliesLifecycle:
    def test_ivf_same_path_rewrite(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        rows = [(i, [float((i * 7 + j) % 5) for j in range(8)])
                for i in range(20)]
        e = spark.createDataFrame(rows,
                                  "vec_id long, embedding array<double>")
        cents = [r[1] for r in rows[:4]]
        root = str(tmp_path / "ivf")
        S.write_ivf_index(
            S.ivf_build_index(e.where(F.col("vec_id") % 2 == 0),
                              centroids=cents), root)
        base = S.read_ivf_index(spark, root)
        merged = S.ivf_merge_index(base, e.where(F.col("vec_id") % 2 != 0))
        S.write_ivf_index(merged, root)
        assert current_version(root) == 2
        q = spark.createDataFrame([(0, rows[3][1])],
                                  "query_id long, embedding array<double>")
        served = S.ivf_topk_from_index(S.read_ivf_index(spark, root), q,
                                       k=3, nprobe=2)
        S.write_ivf_index(S.ivf_build_index(e, centroids=cents),
                          str(tmp_path / "ivf_full"))
        rebuilt = S.ivf_topk_from_index(
            S.read_ivf_index(spark, str(tmp_path / "ivf_full")), q,
            k=3, nprobe=2)
        assert sorted(map(tuple, served.collect())) == \
            sorted(map(tuple, rebuilt.collect()))

    def test_pq_same_path_rewrite(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        rows = [(i, [float((i * 3 + j) % 7) for j in range(8)])
                for i in range(16)]
        e = spark.createDataFrame(rows,
                                  "vec_id long, embedding array<double>")
        books = [[[r[1][m * 2], r[1][m * 2 + 1]] for r in rows[:4]]
                 for m in range(4)]
        root = str(tmp_path / "pq")
        S.write_pq_index(
            S.pq_build_index(e.where(F.col("vec_id") % 2 == 0),
                             codebooks=books, n_subspaces=4), root)
        base = S.read_pq_index(spark, root)
        merged = S.pq_merge_index(base, e.where(F.col("vec_id") % 2 != 0))
        S.write_pq_index(merged, root)
        assert current_version(root) == 2
        q = spark.createDataFrame([(0, rows[5][1])],
                                  "query_id long, embedding array<double>")
        served = S.pq_topk_from_index(S.read_pq_index(spark, root), q, k=3)
        live = S.pq_topk_from_index(
            S.pq_build_index(e, codebooks=books, n_subspaces=4), q, k=3)
        assert sorted(map(tuple, served.collect())) == \
            sorted(map(tuple, live.collect()))

    def test_lsh_same_path_rewrite_and_stale_serve(self, spark,
                                                   tmp_path):
        from orange3_timeseries_spark.operators.dedup import (
            lsh_build_index,
            lsh_merge_index,
            lsh_probe_index,
            read_lsh_index,
            write_lsh_index,
        )

        base_txt = ("the quick brown fox jumps over the lazy dog while "
                    "the cat watches from the warm windowsill nearby")
        corpus = [(1, base_txt), (2, base_txt.replace("lazy", "sleepy")),
                  (3, "entirely different text about query engines"),
                  (4, base_txt.replace("dog", "wolf"))]
        probe = [(101, base_txt.replace("warm", "cold"))]
        d = spark.createDataFrame(corpus, "doc_id long, text string")
        root = str(tmp_path / "lsh")
        write_lsh_index(lsh_build_index(d.where(F.col("doc_id") <= 2),
                                        n_buckets=8), root)
        base = read_lsh_index(spark, root)
        merged = lsh_merge_index(base, d.where(F.col("doc_id") > 2))
        write_lsh_index(merged, root)
        assert current_version(root) == 2
        out = lsh_probe_index(
            read_lsh_index(spark, root),
            spark.createDataFrame(probe, "doc_id long, text string"),
            threshold=0.2)
        full = lsh_probe_index(
            lsh_build_index(d, n_buckets=8),
            spark.createDataFrame(probe, "doc_id long, text string"),
            threshold=0.2)
        assert sorted(map(tuple, out.collect())) == \
            sorted(map(tuple, full.collect()))
