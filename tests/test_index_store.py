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

    def test_unconfigured_remote_scheme_fails_loudly(self, spark,
                                                     tmp_path):
        # a scheme with no Hadoop FileSystem impl must raise, not
        # silently create a literal ./nosuchfs:/... dir while Spark
        # writes elsewhere (metadata/state split = stale serves)
        with pytest.raises(ValueError, match="no Hadoop FileSystem"):
            begin_version("nosuchfs://bucket/idx")
        # file: scheme and plain paths still route to the os backend
        v1 = begin_version("file://" + str(tmp_path / "idx"))
        assert v1.endswith("v=1")
        assert os.path.isdir(str(tmp_path / "idx" / "v=1"))

    def test_pointer_missing_falls_back_to_newest_committed(
            self, tmp_path):
        # the remote backend's delete+rename pointer swap has a brief
        # no-pointer window; readers must bridge it via the newest
        # _COMMITTED generation (which at that instant IS the one
        # being published), never fall back to stale bare tables
        root = str(tmp_path / "idx")
        commit_version(root, begin_version(root))
        commit_version(root, begin_version(root))
        begin_version(root)                     # v=3 torn, no marker
        os.unlink(os.path.join(root, "_CURRENT"))
        assert current_version(root) is None
        assert resolve_index_path(root).endswith("v=2")


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


class TestJournaledDeltas:
    """begin_delta/commit_delta: crash-atomic fast-ingest appends —
    tables land in ``v=<n>/delta=<k>``, the per-delta ``_COMMITTED``
    marker is the atomic commit point, readers union committed deltas
    only."""

    def test_torn_delta_is_invisible_until_committed(self, spark,
                                                     tmp_path):
        from orange3_timeseries_spark.operators.index_store import (
            base_table_path,
            begin_delta,
            commit_delta,
            committed_delta_dirs,
            delta_table_path,
            read_index_table,
        )

        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        spark.range(5).selectExpr(
            "id", "cast(id % 2 as int) as bucket") \
            .write.partitionBy("bucket") \
            .parquet(base_table_path(v1, "t"))
        commit_version(root, v1)

        d1 = begin_delta(root)
        assert d1 == os.path.join(v1, "delta=1")
        # data lands INSIDE the table dir as a delta partition
        assert delta_table_path(d1, "t") == \
            os.path.join(v1, "t", "delta=1")
        spark.range(5, 8).selectExpr(
            "id", "cast(id % 2 as int) as bucket") \
            .write.partitionBy("bucket") \
            .parquet(delta_table_path(d1, "t"))
        # NOT committed: the torn append must be invisible
        vp = resolve_index_path(root)
        assert committed_delta_dirs(vp) == []
        got = sorted(r.id for r in
                     read_index_table(spark, vp, "t").collect())
        assert got == [0, 1, 2, 3, 4]

        commit_delta(d1)
        assert committed_delta_dirs(vp) == [d1]
        out = read_index_table(spark, vp, "t")
        # the delta partition column never leaks to the caller
        assert set(out.columns) == {"id", "bucket"}
        assert sorted(r.id for r in out.collect()) == list(range(8))

    def test_deltas_read_in_one_scan_and_die_with_generation(
            self, spark, tmp_path):
        from orange3_timeseries_spark.operators.index_store import (
            base_table_path,
            begin_delta,
            commit_delta,
            committed_delta_dirs,
            delta_table_path,
            read_index_table,
        )

        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        spark.range(2).selectExpr("id").write.parquet(
            base_table_path(v1, "t"))
        commit_version(root, v1)
        dirs = []
        for lo in (2, 4, 6):
            d = begin_delta(root)
            spark.range(lo, lo + 2).selectExpr("id").write.parquet(
                delta_table_path(d, "t"))
            commit_delta(d)
            dirs.append(d)
        vp = resolve_index_path(root)
        assert committed_delta_dirs(vp) == dirs
        df = read_index_table(spark, vp, "t")
        assert sorted(r.id for r in df.collect()) == list(range(8))
        # ONE scan node regardless of delta count — plan size must not
        # grow with ingest count (the whole point of the partition
        # layout over a per-delta union)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 1
        # a fresh generation starts with zero deltas; vacuum removes
        # the old generation WITH its journal
        v2 = begin_version(root)
        spark.range(9).selectExpr("id").write.parquet(
            base_table_path(v2, "t"))
        commit_version(root, v2)
        assert committed_delta_dirs(resolve_index_path(root)) == []
        assert vacuum_index(root) == [1]
        assert not os.path.exists(dirs[0])

    def test_append_on_prejournal_generation_fails_loudly(
            self, spark, tmp_path):
        from orange3_timeseries_spark.operators.index_store import (
            begin_delta,
            delta_table_path,
            require_journaled_layout,
        )

        root = str(tmp_path / "idx_legacy")
        v1 = begin_version(root)
        # r11-style base: table directly under the generation, no
        # delta=0 level
        spark.range(3).selectExpr("id").write.parquet(
            os.path.join(v1, "t"))
        commit_version(root, v1)
        # the PRECHECK appends run before begin_delta — nothing is
        # allocated, so no orphan leased delta dir accumulates
        with pytest.raises(ValueError, match="predates the journaled"):
            require_journaled_layout(resolve_index_path(root), ("t",))
        assert not os.path.exists(os.path.join(v1, "delta=1"))
        # the path helper keeps the same guard as a backstop
        d = begin_delta(root)
        with pytest.raises(ValueError, match="predates the journaled"):
            delta_table_path(d, "t")

    def test_family_append_on_r11_layout_fails_before_allocating(
            self, spark, tmp_path):
        # a REAL r11-written bm25 generation (tables directly under
        # v=1): the append must raise the compact-first recipe without
        # leaving an orphan delta dir, and the index must still read
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_append_index,
            bm25_build_index,
            bm25_topk_from_index,
            read_bm25_index,
        )

        root = str(tmp_path / "bm25_r11")
        v1 = begin_version(root)
        idx = bm25_build_index(_docs(spark), n_buckets=8)
        idx.postings.write.partitionBy("bucket").parquet(
            os.path.join(v1, "postings"))
        idx.token_df.write.partitionBy("bucket").parquet(
            os.path.join(v1, "token_df"))
        idx.stats.write.parquet(os.path.join(v1, "stats"))
        spark.createDataFrame([("doc_id", 8)],
                              "id_col string, n_buckets int") \
            .write.parquet(os.path.join(v1, "params"))
        commit_version(root, v1)
        with pytest.raises(ValueError, match="predates the journaled"):
            bm25_append_index(
                spark, root,
                spark.createDataFrame([(99, "alpha beta")],
                                      "doc_id long, text string"))
        assert not os.path.exists(os.path.join(v1, "delta=1"))
        # pre-journal generations keep serving
        assert bm25_topk_from_index(read_bm25_index(spark, root),
                                    _queries(spark),
                                    top_k=3).count() > 0

    def test_commit_delta_validates_directory(self, tmp_path):
        from orange3_timeseries_spark.operators.index_store import (
            commit_delta,
        )

        root = str(tmp_path / "idx")
        commit_version(root, begin_version(root))
        with pytest.raises(ValueError, match="delta=<k>"):
            commit_delta(os.path.join(root, "v=1"))
        with pytest.raises(ValueError, match="does not exist"):
            commit_delta(os.path.join(root, "v=1", "delta=9"))


class TestWriterLease:
    """Two concurrent writers racing one root must fail LOUDLY, never
    interleave one generation (index_store._WRITER lease)."""

    def test_same_generation_double_mkdir_raises(self, tmp_path):
        # the local backend catches the same-v=<n> race at mkdir time
        import orange3_timeseries_spark.operators.index_store as ist

        root = str(tmp_path / "idx")
        begin_version(root)
        with pytest.raises(FileExistsError):
            ist._LocalFs().mkdirs(os.path.join(root, "v=1"),
                                  exist_ok=False)

    def test_foreign_lease_detected_at_commit(self, tmp_path):
        # writer B overwrites A's lease (the remote-backend mkdir-p
        # shape, simulated): A's commit must raise and leave the
        # committed store serveable
        root = str(tmp_path / "idx")
        commit_version(root, begin_version(root))    # v=1 good
        v2 = begin_version(root)
        with open(os.path.join(v2, "_WRITER"), "w") as f:
            f.write("somebody-else\n")
        with pytest.raises(ValueError, match="lease mismatch"):
            commit_version(root, v2)
        # loser failed loudly; the store still serves v=1
        assert current_version(root) == 1
        assert resolve_index_path(root).endswith("v=1")

    def test_commit_of_generation_begun_elsewhere_raises(self, tmp_path):
        # a generation whose lease this PROCESS did not create (other
        # writer's in-flight dir) cannot be committed from here
        import orange3_timeseries_spark.operators.index_store as ist

        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        ist._LEASES.clear()                     # simulate another process
        with pytest.raises(ValueError, match="did not create"):
            commit_version(root, v1)

    def test_vanished_lease_detected(self, tmp_path):
        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        os.unlink(os.path.join(v1, "_WRITER"))
        with pytest.raises(ValueError, match="vanished"):
            commit_version(root, v1)


class TestRemoteSchemeLifecycle:
    """The Hadoop FileSystem backend, exercised through a REAL
    non-``file:`` scheme: ``viewfs://`` with a mount table pointing at
    local disk (the Hadoop-local harness the design review asked for).
    Spark writes the state tables and the store manages pointer/
    marker/lease metadata through the SAME viewfs FileSystem — the
    metadata/state-split failure mode cannot occur."""

    @pytest.fixture()
    def viewfs_root(self, spark, tmp_path):
        # unique authority per test: FileSystem caches viewfs mount
        # tables per (scheme, authority), so reusing one would pin the
        # first test's tmp dir
        auth = "t" + os.path.basename(str(tmp_path)).replace("_", "")
        spark.sparkContext._jsc.hadoopConfiguration().set(
            f"fs.viewfs.mounttable.{auth}.link./idx",
            "file://" + str(tmp_path))
        return f"viewfs://{auth}/idx"

    def test_pointer_lifecycle_on_viewfs(self, spark, viewfs_root):
        from orange3_timeseries_spark.operators.index_store import (
            base_table_path,
            begin_delta,
            commit_delta,
            delta_table_path,
            read_index_table,
        )

        root = viewfs_root + "/plain"
        v1 = begin_version(root)
        assert v1.startswith("viewfs://")
        spark.range(4).selectExpr("id").write.parquet(
            base_table_path(v1, "t"))
        commit_version(root, v1)
        assert current_version(root) == 1
        assert resolve_index_path(root) == root + "/v=1"
        # journaled delta over viewfs
        d1 = begin_delta(root)
        spark.range(4, 6).selectExpr("id").write.parquet(
            delta_table_path(d1, "t"))
        commit_delta(d1)
        got = sorted(r.id for r in read_index_table(
            spark, resolve_index_path(root), "t").collect())
        assert got == list(range(6))
        # second generation + vacuum through the remote backend
        v2 = begin_version(root)
        spark.range(9).selectExpr("id").write.parquet(
            base_table_path(v2, "t"))
        commit_version(root, v2)
        assert vacuum_index(root) == [1]
        assert resolve_index_path(root) == root + "/v=2"

    def test_bm25_full_lifecycle_on_viewfs(self, spark, viewfs_root):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_append_index,
            bm25_build_index,
            bm25_merge_index,
            bm25_topk,
            bm25_topk_from_index,
            compact_bm25_index,
            read_bm25_index,
            write_bm25_index,
        )

        root = viewfs_root + "/bm25"
        d = _docs(spark)
        third = F.col("doc_id") % 3
        write_bm25_index(bm25_build_index(d.where(third == 0),
                                          n_buckets=8), root)
        merged = bm25_merge_index(read_bm25_index(spark, root),
                                  d.where(third == 1))
        write_bm25_index(merged, root)          # same logical path: v=2
        bm25_append_index(spark, root, d.where(third == 2))
        compact_bm25_index(spark, root)         # v=3
        assert current_version(root) == 3
        served = bm25_topk_from_index(read_bm25_index(spark, root),
                                      _queries(spark), top_k=3)
        live = bm25_topk(d, _queries(spark), top_k=3)
        assert sorted(map(tuple, served.collect())) == \
            sorted(map(tuple, live.collect()))

    def test_ivf_and_pq_lifecycle_on_viewfs(self, spark, viewfs_root):
        import orange3_timeseries_spark.operators.similarity as S

        rows = [(i, [float((i * 7 + j) % 5) for j in range(8)])
                for i in range(24)]
        e = spark.createDataFrame(rows,
                                  "vec_id long, embedding array<double>")
        cents = [r[1] for r in rows[:4]]
        q = spark.createDataFrame([(0, rows[3][1])],
                                  "query_id long, embedding array<double>")
        third = F.col("vec_id") % 3

        root = viewfs_root + "/ivf"
        S.write_ivf_index(S.ivf_build_index(e.where(third == 0),
                                            centroids=cents), root)
        merged = S.ivf_merge_index(S.read_ivf_index(spark, root),
                                   e.where(third == 1))
        S.write_ivf_index(merged, root)
        S.ivf_append_index(spark, root, e.where(third == 2))
        S.compact_ivf_index(spark, root)
        served = S.ivf_topk_from_index(S.read_ivf_index(spark, root),
                                       q, k=3, nprobe=2)
        rebuilt = S.ivf_topk_from_index(
            S.ivf_build_index(e, centroids=cents), q, k=3, nprobe=2)
        assert sorted(map(tuple, served.collect())) == \
            sorted(map(tuple, rebuilt.collect()))

        books = [[[r[1][m * 2], r[1][m * 2 + 1]] for r in rows[:4]]
                 for m in range(4)]
        rootp = viewfs_root + "/pq"
        S.write_pq_index(S.pq_build_index(e.where(third == 0),
                                          codebooks=books,
                                          n_subspaces=4), rootp)
        mergedp = S.pq_merge_index(S.read_pq_index(spark, rootp),
                                   e.where(third == 1))
        S.write_pq_index(mergedp, rootp)
        S.pq_append_index(spark, rootp, e.where(third == 2))
        S.compact_pq_index(spark, rootp)
        servedp = S.pq_topk_from_index(S.read_pq_index(spark, rootp),
                                       q, k=3)
        livep = S.pq_topk_from_index(
            S.pq_build_index(e, codebooks=books, n_subspaces=4), q, k=3)
        assert sorted(map(tuple, servedp.collect())) == \
            sorted(map(tuple, livep.collect()))

    def test_lsh_lifecycle_on_viewfs(self, spark, viewfs_root):
        from orange3_timeseries_spark.operators.dedup import (
            lsh_append_index,
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
                  (4, base_txt.replace("dog", "wolf")),
                  (5, base_txt.replace("quick", "swift")),
                  (6, "another unrelated note on distributed joins")]
        probe = [(101, base_txt.replace("warm", "cold"))]
        d = spark.createDataFrame(corpus, "doc_id long, text string")
        pr = spark.createDataFrame(probe, "doc_id long, text string")
        root = viewfs_root + "/lsh"
        write_lsh_index(lsh_build_index(d.where(F.col("doc_id") <= 2),
                                        n_buckets=8), root)
        merged = lsh_merge_index(read_lsh_index(spark, root),
                                 d.where((F.col("doc_id") > 2)
                                         & (F.col("doc_id") <= 4)))
        write_lsh_index(merged, root)
        lsh_append_index(spark, root, d.where(F.col("doc_id") > 4))
        out = lsh_probe_index(read_lsh_index(spark, root), pr,
                              threshold=0.2)
        full = lsh_probe_index(lsh_build_index(d, n_buckets=8), pr,
                               threshold=0.2)
        assert sorted(map(tuple, out.collect())) == \
            sorted(map(tuple, full.collect()))


class TestIndexInfo:
    def test_snapshot_reflects_journal_state(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.index_store import (
            base_table_path,
            begin_delta,
            commit_delta,
            delta_table_path,
            index_info,
        )

        root = str(tmp_path / "idx")
        assert index_info(root)["layout"] == "bare"
        v1 = begin_version(root)
        spark.range(3).selectExpr("id").write.parquet(
            base_table_path(v1, "t"))
        commit_version(root, v1)
        d1 = begin_delta(root)
        spark.range(3, 5).selectExpr("id").write.parquet(
            delta_table_path(d1, "t"))
        commit_delta(d1)
        begin_delta(root)                       # torn, never committed
        info = index_info(root)
        assert info["current"] == 1
        assert info["versions"] == [(1, True)]
        assert info["committed_deltas"] == [1]
        assert info["uncommitted_deltas"] == [2]
        assert info["layout"] == "journaled"

    def test_pre_journal_layout_reported(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.index_store import (
            index_info,
        )

        root = str(tmp_path / "idx_legacy")
        v1 = begin_version(root)
        spark.range(3).selectExpr("id").write.parquet(
            os.path.join(v1, "t"))
        commit_version(root, v1)
        info = index_info(root)
        assert info["layout"] == "pre-journal"
        assert info["versions"] == [(1, True)]

    def test_inflight_only_root_reports_bare(self, spark, tmp_path):
        # a crash between begin_version and commit leaves only an
        # in-flight generation: readers serve nothing versioned, so
        # the snapshot must say 'bare', not mislabel the root's empty
        # journal as a pre-journal index
        from orange3_timeseries_spark.operators.index_store import (
            base_table_path,
            index_info,
        )

        root = str(tmp_path / "idx_inflight")
        v1 = begin_version(root)
        spark.range(3).selectExpr("id").write.parquet(
            base_table_path(v1, "t"))            # written, never committed
        info = index_info(root)
        assert info["current"] is None
        assert info["versions"] == [(1, False)]
        assert info["layout"] == "bare"
        assert info["committed_deltas"] == []


class TestCasCommit:
    """Optimistic-concurrency pointer commits: commit_version publishes
    with compare-and-set against the pointer content observed at
    begin_version — of two racing publishers exactly one wins, and the
    loser fails LOUDLY with its generation rolled back to uncommitted
    garbage (the winner's state keeps serving)."""

    def test_racing_publishers_loser_fails_loudly(self, tmp_path):
        from orange3_timeseries_spark.operators.index_store import (
            index_info,
        )

        root = str(tmp_path / "idx")
        commit_version(root, begin_version(root))        # v=1 serving
        va = begin_version(root)                         # writer A: v=2
        vb = begin_version(root)                         # writer B: v=3
        commit_version(root, va)                         # A wins
        assert current_version(root) == 2
        with pytest.raises(ValueError, match="CAS failed"):
            commit_version(root, vb)                     # B must lose
        # the loser's generation is NOT committed (no marker), the
        # winner keeps serving, and no in-process records leak
        import orange3_timeseries_spark.operators.index_store as ist

        assert current_version(root) == 2
        assert resolve_index_path(root).endswith("v=2")
        assert not os.path.isfile(os.path.join(root, "v=3",
                                               "_COMMITTED"))
        assert (3, False) in index_info(root)["versions"]
        assert vb not in ist._LEASES and vb not in ist._BEGIN_PTR

    def test_fresh_root_cas_expects_absent_pointer(self, tmp_path):
        # expected=None (no pointer at begin) must publish fine on a
        # fresh root — and fail if someone else published first
        root = str(tmp_path / "idx")
        va = begin_version(root)                         # observed: None
        vb = begin_version(root)                         # observed: None
        commit_version(root, vb)                         # B wins v=2
        with pytest.raises(ValueError, match="CAS failed"):
            commit_version(root, va)
        assert current_version(root) == 2

    def test_cas_false_forces_legacy_swap(self, tmp_path):
        # an operator on a filesystem with unreliable flock can force
        # the single-writer swap: last writer wins, nobody raises
        root = str(tmp_path / "idx")
        commit_version(root, begin_version(root))
        va = begin_version(root)
        vb = begin_version(root)
        commit_version(root, va, cas=False)
        commit_version(root, vb, cas=False)              # overwrites, no CAS
        assert current_version(root) == 3

    def test_cas_true_requires_begin_observation(self, tmp_path):
        # a handmade generation (not allocated through begin_version in
        # this process) has no observation to compare against
        root = str(tmp_path / "idx")
        os.makedirs(os.path.join(root, "v=1"))
        with pytest.raises(ValueError, match="begin_version"):
            commit_version(root, os.path.join(root, "v=1"), cas=True)
        # default mode degrades to the legacy swap instead
        commit_version(root, os.path.join(root, "v=1"))
        assert current_version(root) == 1

    def test_lifecycle_still_green_under_default_cas(self, spark,
                                                     tmp_path):
        # the ordinary single-writer lifecycle (write -> merge-write ->
        # append -> compact) runs every commit through the CAS path now
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index,
            bm25_merge_index,
            bm25_topk_from_index,
            compact_bm25_index,
            read_bm25_index,
            write_bm25_index,
        )

        root = str(tmp_path / "bm25")
        docs = _docs(spark)
        write_bm25_index(
            bm25_build_index(docs.where(F.col("doc_id") <= 8)), root)
        merged = bm25_merge_index(
            read_bm25_index(spark, root),
            docs.where(F.col("doc_id").isin(9, 10)))
        write_bm25_index(merged, root)
        compact_bm25_index(spark, root)
        assert current_version(root) == 3
        out = bm25_topk_from_index(read_bm25_index(spark, root),
                                   _queries(spark), top_k=3)
        assert out.count() > 0


class TestCasHookRemote:
    """Remote CAS via register_pointer_cas: a hook-injected backend
    (the S3 conditional-PUT shape) upgrades viewfs commits from the
    delete+rename swap to loser-fails-loudly CAS."""

    @pytest.fixture()
    def viewfs_root(self, spark, tmp_path):
        auth = "c" + os.path.basename(str(tmp_path)).replace("_", "")
        spark.sparkContext._jsc.hadoopConfiguration().set(
            f"fs.viewfs.mounttable.{auth}.link./idx",
            "file://" + str(tmp_path))
        return f"viewfs://{auth}/idx"

    @pytest.fixture()
    def cas_hook(self):
        # a conditional-PUT stand-in: atomically (single-process here)
        # read-compare-publish through the store's own backend — the
        # contract a real S3 If-Match/If-None-Match PUT provides
        import threading

        import orange3_timeseries_spark.operators.index_store as ist

        calls = []
        lock = threading.Lock()

        def hook(pointer_path, content, expected):
            with lock:
                fs, p = ist._fs_for(pointer_path)
                current = (fs.read_text(p).strip()
                           if fs.isfile(p) else None)
                calls.append((expected, current))
                if current != expected:
                    return False
                fs.publish_pointer(p, content)
                return True

        ist.register_pointer_cas("viewfs", hook)
        try:
            yield calls
        finally:
            ist.unregister_pointer_cas("viewfs")

    def test_hooked_commits_and_losing_race(self, spark, viewfs_root,
                                            cas_hook):
        root = viewfs_root + "/casidx"
        v1 = begin_version(root)
        commit_version(root, v1)                 # CAS None -> v=1
        assert len(cas_hook) == 1 and current_version(root) == 1
        va = begin_version(root)
        vb = begin_version(root)
        commit_version(root, va)                 # CAS v=1 -> v=2
        with pytest.raises(ValueError, match="CAS failed"):
            commit_version(root, vb)             # expected v=1, sees v=2
        assert current_version(root) == 2
        assert resolve_index_path(root).endswith("v=2")
        assert len(cas_hook) == 3

    def test_without_hook_viewfs_keeps_legacy_swap(self, spark,
                                                   viewfs_root):
        root = viewfs_root + "/legacyidx"
        v1 = begin_version(root)
        commit_version(root, v1)                 # no hook: legacy swap
        assert current_version(root) == 1
        with pytest.raises(ValueError, match="register_pointer_cas"):
            commit_version(root, begin_version(root), cas=True)


class TestExclusiveLeaseAllocation:
    """begin_* allocates via EXCLUSIVE lease-file creation — the
    second allocator of one generation/delta fails at begin time on
    both backends (ADVICE r12: mkdirs exist_ok=False was a non-atomic
    exists-then-mkdirs on the remote backend)."""

    def test_local_create_exclusive_raises_on_existing(self, tmp_path):
        import orange3_timeseries_spark.operators.index_store as ist

        fs = ist._LocalFs()
        p = str(tmp_path / "_WRITER")
        fs.create_exclusive(p, "tok1\n")
        with pytest.raises(FileExistsError):
            fs.create_exclusive(p, "tok2\n")
        with open(p) as f:                       # loser never overwrote
            assert f.read() == "tok1\n"

    def test_second_allocator_of_same_dir_fails_at_begin(self,
                                                         tmp_path):
        # simulate losing the mkdirs race (remote mkdir-p shape): the
        # directory exists with another writer's lease — _acquire must
        # fail loudly instead of overwriting the token
        import orange3_timeseries_spark.operators.index_store as ist

        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        ist._LEASES.clear()                      # "another process"
        with pytest.raises(ValueError, match="another writer"):
            ist._acquire(ist._LocalFs(), v1)

    def test_viewfs_create_exclusive(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.index_store as ist

        auth = "x" + os.path.basename(str(tmp_path)).replace("_", "")
        spark.sparkContext._jsc.hadoopConfiguration().set(
            f"fs.viewfs.mounttable.{auth}.link./idx",
            "file://" + str(tmp_path))
        fs, root = ist._fs_for(f"viewfs://{auth}/idx")
        fs.mkdirs(root + "/d")
        fs.create_exclusive(root + "/d/_WRITER", "tok1\n")
        with pytest.raises(FileExistsError):
            fs.create_exclusive(root + "/d/_WRITER", "tok2\n")
        assert fs.read_text(root + "/d/_WRITER") == "tok1\n"


class TestAborts:
    """abort_version / abort_delta: explicit cleanup for
    begun-but-never-committed allocations — drops the in-process
    records (the ADVICE r12 _LEASES leak) and the on-disk garbage,
    refuses to touch committed state."""

    def test_abort_version_cleans_up(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.index_store as ist
        from orange3_timeseries_spark.operators.index_store import (
            abort_version,
            base_table_path,
        )

        root = str(tmp_path / "idx")
        commit_version(root, begin_version(root))        # v=1 serving
        v2 = begin_version(root)
        spark.range(5).write.parquet(base_table_path(v2, "t"))
        assert v2 in ist._LEASES and v2 in ist._BEGIN_PTR
        abort_version(root, v2)
        assert not os.path.isdir(v2)
        assert v2 not in ist._LEASES and v2 not in ist._BEGIN_PTR
        assert current_version(root) == 1                # untouched
        # the next begin reuses the freed number
        assert begin_version(root).endswith("v=2")

    def test_abort_version_refuses_committed(self, tmp_path):
        from orange3_timeseries_spark.operators.index_store import (
            abort_version,
        )

        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        commit_version(root, v1)
        with pytest.raises(ValueError, match="COMMITTED"):
            abort_version(root, v1)

    def test_abort_delta_removes_metadata_and_table_data(self, spark,
                                                         tmp_path):
        import orange3_timeseries_spark.operators.index_store as ist
        from orange3_timeseries_spark.operators.index_store import (
            abort_delta,
            base_table_path,
            begin_delta,
            commit_delta,
            delta_table_path,
            index_info,
            read_index_table,
        )

        root = str(tmp_path / "idx")
        v1 = begin_version(root)
        spark.range(3).write.parquet(base_table_path(v1, "t"))
        commit_version(root, v1)
        d1 = begin_delta(root)
        spark.range(3, 5).write.parquet(delta_table_path(d1, "t"))
        commit_delta(d1)
        d2 = begin_delta(root)                   # torn append
        spark.range(5, 9).write.parquet(delta_table_path(d2, "t"))
        assert index_info(root)["uncommitted_deltas"] == [2]
        abort_delta(d2)
        assert d2 not in ist._LEASES
        assert index_info(root)["uncommitted_deltas"] == []
        assert not os.path.isdir(d2)
        assert not os.path.isdir(
            os.path.join(os.path.dirname(d2), "t", "delta=2"))
        # committed state intact: base + delta 1 read as before
        assert read_index_table(spark, resolve_index_path(root),
                                "t").count() == 5
        with pytest.raises(ValueError, match="committed delta"):
            abort_delta(d1)

class TestCasErrorPaths:
    def test_erroring_hook_rolls_marker_back(self, spark, tmp_path):
        # a CAS attempt that ERRORS (transport failure, not a lost
        # race) must not leave a committed-but-never-published
        # generation: the marker rolls back, the real cause surfaces
        import orange3_timeseries_spark.operators.index_store as ist

        def bad_hook(pointer_path, content, expected):
            raise RuntimeError("simulated transport failure")

        auth = "e" + os.path.basename(str(tmp_path)).replace("_", "")
        spark.sparkContext._jsc.hadoopConfiguration().set(
            f"fs.viewfs.mounttable.{auth}.link./idx",
            "file://" + str(tmp_path))
        root = f"viewfs://{auth}/idx/erridx"
        v1 = begin_version(root)
        commit_version(root, v1, cas=False)      # v=1 via legacy swap
        ist.register_pointer_cas("viewfs", bad_hook)
        try:
            v2 = begin_version(root)
            with pytest.raises(RuntimeError, match="transport"):
                commit_version(root, v2)
        finally:
            ist.unregister_pointer_cas("viewfs")
        assert current_version(root) == 1        # still serving v=1
        assert resolve_index_path(root).endswith("v=1")
        assert not os.path.isfile(
            os.path.join(str(tmp_path), "erridx", "v=2", "_COMMITTED"))
