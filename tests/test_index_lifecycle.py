"""Append + compact lifecycle for the persisted index families
(build → write → append* → compact → serve): appended state serves
hash-identically to a rebuild, the disjoint-id guard stays loud on the
append path, and compaction collapses the per-ingest delta files while
leaving served results identical."""

import glob
import os

import pytest

from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.index_store import (
    current_version,
    resolve_index_path,
)

DOCS = [(i, f"token{i} alpha beta gamma delta common words here {i}")
        for i in range(1, 16)]


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [r for r in DOCS if lo <= r[0] <= hi], "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(1, "alpha beta token3"), (2, "gamma token11 delta")],
        "query_id long, text string")


def _nfiles(vpath, table):
    """Parquet file count for one state table across the generation's
    base dir AND its journaled append deltas (``delta=<k>/<table>``) —
    the fragmentation a serve actually pays."""
    base = glob.glob(os.path.join(vpath, table, "**", "*.parquet"),
                     recursive=True)
    deltas = glob.glob(os.path.join(vpath, "delta=*", table, "**",
                                    "*.parquet"), recursive=True)
    return len(base) + len(deltas)


def _ndeltas(vpath):
    return len(glob.glob(os.path.join(vpath, "delta=*", "_COMMITTED")))


def _rows(df):
    return sorted(map(tuple, df.collect()))


class TestBm25AppendCompact:
    def test_append_serves_like_rebuild_then_compacts(self, spark,
                                                      tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_append_index,
            bm25_build_index,
            bm25_topk,
            bm25_topk_from_index,
            compact_bm25_index,
            read_bm25_index,
            write_bm25_index,
        )

        root = str(tmp_path / "bm25")
        write_bm25_index(bm25_build_index(_docs(spark, 1, 5),
                                          n_buckets=8), root)
        bm25_append_index(spark, root, _docs(spark, 6, 10))
        bm25_append_index(spark, root, _docs(spark, 11, 15))
        assert current_version(root) == 1      # appends stay in-place

        live = bm25_topk(_docs(spark, 1, 15), _queries(spark), top_k=3)
        served = bm25_topk_from_index(read_bm25_index(spark, root),
                                      _queries(spark), top_k=3)
        assert _rows(served) == _rows(live)

        v1 = resolve_index_path(root)
        frag = _nfiles(v1, "postings")
        # each append journals one committed delta with its own stats
        # row; the reader unions base + deltas to 3 rows
        assert _ndeltas(v1) == 2
        from orange3_timeseries_spark.operators.index_store import (
            read_index_table,
        )
        assert len(read_index_table(spark, v1, "stats").collect()) == 3

        compact_bm25_index(spark, root)
        assert current_version(root) == 2
        v2 = resolve_index_path(root)
        assert _nfiles(v2, "postings") < frag
        assert _ndeltas(v2) == 0               # journal folded away
        assert len(spark.read.parquet(
            os.path.join(v2, "stats")).collect()) == 1
        again = bm25_topk_from_index(read_bm25_index(spark, root),
                                     _queries(spark), top_k=3)
        assert _rows(again) == _rows(live)

    def test_torn_append_serves_preappend_state_and_retries(
            self, spark, tmp_path, monkeypatch):
        """Crash between the delta table writes and the _COMMITTED
        marker: the unmarked delta is invisible — serves return the
        PRE-append state — and retrying the same batch succeeds (the
        disjoint guard sees only committed ids)."""
        import orange3_timeseries_spark.operators.index_store as ist
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_append_index,
            bm25_build_index,
            bm25_topk,
            bm25_topk_from_index,
            read_bm25_index,
            write_bm25_index,
        )

        root = str(tmp_path / "bm25_torn")
        write_bm25_index(bm25_build_index(_docs(spark, 1, 5),
                                          n_buckets=8), root)
        live_pre = bm25_topk(_docs(spark, 1, 5), _queries(spark),
                             top_k=3)

        real_commit = ist.commit_delta

        def crash(dpath):
            raise RuntimeError("simulated crash before delta commit")

        monkeypatch.setattr(ist, "commit_delta", crash)
        with pytest.raises(RuntimeError, match="simulated crash"):
            bm25_append_index(spark, root, _docs(spark, 6, 10))
        # the torn delta's tables are on disk but unmarked — invisible
        # (data lives under <table>/delta=<k>; the sibling delta=<k>
        # dir holds only journal metadata and has no marker)
        v1 = resolve_index_path(root)
        assert glob.glob(os.path.join(v1, "postings", "delta=1", "*"))
        assert _ndeltas(v1) == 0
        served = bm25_topk_from_index(read_bm25_index(spark, root),
                                      _queries(spark), top_k=3)
        assert _rows(served) == _rows(live_pre)

        # retry lands as delta=2 and the full corpus serves
        monkeypatch.setattr(ist, "commit_delta", real_commit)
        bm25_append_index(spark, root, _docs(spark, 6, 10))
        assert _ndeltas(v1) == 1
        live = bm25_topk(_docs(spark, 1, 10), _queries(spark), top_k=3)
        again = bm25_topk_from_index(read_bm25_index(spark, root),
                                     _queries(spark), top_k=3)
        assert _rows(again) == _rows(live)

    def test_append_guard_rejects_reingested_id(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_append_index,
            bm25_build_index,
            write_bm25_index,
        )

        root = str(tmp_path / "bm25_guard")
        write_bm25_index(bm25_build_index(_docs(spark, 1, 5),
                                          n_buckets=8), root)
        with pytest.raises(ValueError, match="bm25_append_index"):
            bm25_append_index(spark, root, _docs(spark, 5, 8))


class TestAnnAppendCompact:
    def _vecs(self, spark, lo, hi):
        rows = [(i, [float((i * 7 + j) % 5) for j in range(8)])
                for i in range(lo, hi + 1)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    def test_ivf_append_compact(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        e = self._vecs(spark, 0, 19)
        cents = [r["embedding"] for r in
                 e.where(F.col("vec_id") < 4).orderBy("vec_id").collect()]
        root = str(tmp_path / "ivf")
        S.write_ivf_index(
            S.ivf_build_index(e.where(F.col("vec_id") < 10),
                              centroids=cents), root)
        S.ivf_append_index(spark, root,
                           e.where(F.col("vec_id") >= 10))
        q = spark.createDataFrame(
            [(0, cents[1])], "query_id long, embedding array<double>")
        served = S.ivf_topk_from_index(S.read_ivf_index(spark, root), q,
                                       k=3, nprobe=2)
        live = S.ivf_topk(e, q, k=3, nprobe=2, centroids=cents)
        assert _rows(served) == _rows(live)

        v1 = resolve_index_path(root)
        frag = _nfiles(v1, "lists")
        S.compact_ivf_index(spark, root)
        assert current_version(root) == 2
        assert _nfiles(resolve_index_path(root), "lists") < frag
        again = S.ivf_topk_from_index(S.read_ivf_index(spark, root), q,
                                      k=3, nprobe=2)
        assert _rows(again) == _rows(live)

    def test_pq_append_compact(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        e = self._vecs(spark, 0, 15)
        seed = [r["embedding"] for r in
                e.where(F.col("vec_id") < 4).orderBy("vec_id").collect()]
        books = [[v[m * 2:(m + 1) * 2] for v in seed] for m in range(4)]
        root = str(tmp_path / "pq")
        S.write_pq_index(
            S.pq_build_index(e.where(F.col("vec_id") < 8),
                             codebooks=books, n_subspaces=4), root)
        S.pq_append_index(spark, root, e.where(F.col("vec_id") >= 8))
        q = spark.createDataFrame(
            [(0, seed[2])], "query_id long, embedding array<double>")
        served = S.pq_topk_from_index(S.read_pq_index(spark, root), q,
                                      k=3)
        live = S.pq_topk_from_index(
            S.pq_build_index(e, codebooks=books, n_subspaces=4), q, k=3)
        assert _rows(served) == _rows(live)

        frag = _nfiles(resolve_index_path(root), "codes")
        S.compact_pq_index(spark, root)
        assert current_version(root) == 2
        assert _nfiles(resolve_index_path(root), "codes") < frag
        again = S.pq_topk_from_index(S.read_pq_index(spark, root), q,
                                     k=3)
        assert _rows(again) == _rows(live)


class TestLshAppendCompact:
    BASE = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill nearby every single day")

    def test_lsh_append_compact(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.dedup import (
            compact_lsh_index,
            lsh_append_index,
            lsh_build_index,
            lsh_probe_index,
            read_lsh_index,
            write_lsh_index,
        )

        corpus = [(1, self.BASE),
                  (2, self.BASE.replace("lazy", "sleepy")),
                  (3, "entirely different text about query engines"),
                  (4, self.BASE.replace("dog", "wolf")),
                  (5, self.BASE.replace("cat", "kitten"))]
        d = spark.createDataFrame(corpus, "doc_id long, text string")
        probe = spark.createDataFrame(
            [(101, self.BASE.replace("warm", "cold"))],
            "doc_id long, text string")

        root = str(tmp_path / "lsh")
        write_lsh_index(lsh_build_index(d.where(F.col("doc_id") <= 2),
                                        n_buckets=8), root)
        lsh_append_index(spark, root, d.where(F.col("doc_id") == 3))
        lsh_append_index(spark, root, d.where(F.col("doc_id") >= 4))

        full = lsh_probe_index(lsh_build_index(d, n_buckets=8), probe,
                               threshold=0.2)
        served = lsh_probe_index(read_lsh_index(spark, root), probe,
                                 threshold=0.2)
        assert _rows(served) == _rows(full)
        assert len(_rows(served)) > 0

        frag = _nfiles(resolve_index_path(root), "entries")
        compact_lsh_index(spark, root)
        assert current_version(root) == 2
        assert _nfiles(resolve_index_path(root), "entries") < frag
        again = lsh_probe_index(read_lsh_index(spark, root), probe,
                                threshold=0.2)
        assert _rows(again) == _rows(full)


class TestIvfDriftStats:
    def test_drift_detects_worse_fit_and_abandoned_cells(self, spark,
                                                         tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        # two well-separated centroids; indexed vectors sit ON them,
        # the ingest batch sits off-axis near centroid 0 only
        c0 = [1.0, 0.0, 0.0, 0.0]
        c1 = [0.0, 1.0, 0.0, 0.0]
        idx_rows = [(0, c0), (1, c1), (2, c0), (3, c1)]
        new_rows = [(10, [1.0, 0.0, 1.0, 0.0]),   # cos to c0 = 0.707107
                    (11, [1.0, 0.0, 0.0, 1.0])]   # cos to c0 = 0.707107
        e = spark.createDataFrame(idx_rows,
                                  "vec_id long, embedding array<double>")
        root = str(tmp_path / "ivf_drift")
        S.write_ivf_index(S.ivf_build_index(e, centroids=[c0, c1]),
                          root)
        out = {r["centroid_id"]: r for r in S.ivf_drift_stats(
            S.read_ivf_index(spark, root),
            spark.createDataFrame(new_rows,
                                  "vec_id long, embedding array<double>")
        ).collect()}
        assert set(out) == {0, 1}
        r0 = out[0]
        assert (r0["n_index"], r0["n_new"]) == (2, 2)
        assert r0["new_share"] == 1.0
        assert r0["mean_cos_index"] == 1.0
        assert abs(r0["mean_cos_new"] - 0.707107) < 1e-9
        assert r0["cos_drift"] < -0.29            # fits worse: retrain
        r1 = out[1]                                # abandoned cell
        assert (r1["n_index"], r1["n_new"]) == (2, 0)
        assert r1["new_share"] == 0.0
        assert r1["mean_cos_new"] is None and r1["cos_drift"] is None


class TestIvfRetrainCells:
    """ivf_retrain_cells: the remedy ivf_drift_stats signals — local
    Lloyd over the flagged cells only, centroid ids stable, cold cells
    bit-untouched, and recall over the drifted region RECOVERS."""

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    def test_recall_recovers_and_cold_cells_untouched(self, spark,
                                                      tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                 [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
        # indexed population sits ON cells 0/1; cell 2 holds a small
        # COLD population that must survive the retrain bit-identically
        idx_rows = ([(i, [1.0, 0.01 * i, 0.0, 0.0]) for i in range(5)]
                    + [(10 + i, [0.01 * i, 1.0, 0.0, 0.0])
                       for i in range(5)]
                    + [(20 + i, [0.0, 0.0, 1.0, 0.02 * i])
                       for i in range(3)])
        # the drifted ingest: a NEW cluster between e1 and e2, split by
        # the frozen centroids across cells 0 and 1 — single-probe
        # serves miss half of it
        drift_rows = ([(100 + i, [0.72, 0.68, 0.001 * i, 0.0])
                       for i in range(5)]
                      + [(110 + i, [0.68, 0.72, 0.001 * i, 0.0])
                         for i in range(5)])
        e = self._df(spark, idx_rows)
        root = str(tmp_path / "ivf_rt")
        S.write_ivf_index(S.ivf_build_index(e, centroids=cents), root)
        S.ivf_append_index(spark, root, self._df(spark, drift_rows))

        q = self._df(spark, [(0, [0.7, 0.7, 0.0, 0.0])]) \
            .withColumnRenamed("vec_id", "query_id")
        exact = {r.nn_id for r in S.brute_force_topk(
            self._df(spark, idx_rows + drift_rows), q, k=5).collect()}

        def recall():
            got = {r.nn_id for r in S.ivf_topk_from_index(
                S.read_ivf_index(spark, root), q, k=5,
                nprobe=1).collect()}
            return len(got & exact) / len(exact)

        before = recall()
        assert before <= 0.6          # frozen centroids split the drift

        # the monitor flags exactly the cells the drift hit
        drift = {r["centroid_id"]: r for r in S.ivf_drift_stats(
            S.read_ivf_index(spark, root),
            self._df(spark, drift_rows)).collect()}
        flagged = [c for c, r in sorted(drift.items())
                   if r["cos_drift"] is not None
                   and r["cos_drift"] < -0.01]
        assert flagged == [0, 1]

        cold_before = _rows(S.read_ivf_index(spark, root).lists
                            .where(F.col("centroid_id") >= 2)
                            .select("centroid_id", "nn_id"))
        S.ivf_retrain_cells(spark, root, flagged)
        assert current_version(root) == 2

        after = recall()
        assert after > before
        assert after == 1.0           # the drifted cluster got its cell
        # cold cells: same rows, same ids, same count
        cold_after = _rows(S.read_ivf_index(spark, root).lists
                           .where(F.col("centroid_id") >= 2)
                           .select("centroid_id", "nn_id"))
        assert cold_after == cold_before
        # centroid ids stay the contiguous range the serve requires
        ids = [r["centroid_id"] for r in
               S.read_ivf_index(spark, root).centroids
               .orderBy("centroid_id").collect()]
        assert ids == [0, 1, 2, 3]

    def test_validates_cell_ids(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        cents = [[1.0, 0.0], [0.0, 1.0]]
        e = self._df(spark, [(0, [1.0, 0.1]), (1, [0.1, 1.0])])
        root = str(tmp_path / "ivf_rt_bad")
        S.write_ivf_index(S.ivf_build_index(e, centroids=cents), root)
        with pytest.raises(ValueError, match="not in the persisted"):
            S.ivf_retrain_cells(spark, root, [7])
        with pytest.raises(ValueError, match="empty cell_ids"):
            S.ivf_retrain_cells(spark, root, [])

    def test_all_empty_flag_set_raises_informatively(self, spark,
                                                     tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        cents = [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]]
        # cell 2 never receives a vector
        e = self._df(spark, [(0, [1.0, 0.1]), (1, [0.1, 1.0])])
        root = str(tmp_path / "ivf_rt_empty")
        S.write_ivf_index(S.ivf_build_index(e, centroids=cents), root)
        with pytest.raises(ValueError, match="hold no vectors"):
            S.ivf_retrain_cells(spark, root, [2])


class TestPqDriftBySubspace:
    def test_usage_shift_and_qerr(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        # 4-dim vectors, M=2 subspaces of ds=2, K=2 codewords each.
        # Codebook m: codewords [0,0] (j=0) and [1,1] (j=1).
        books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]
        # indexed: every vector encodes to j=0 in both subspaces
        idx_rows = [(i, [0.0, 0.0, 0.0, 0.0]) for i in range(4)]
        # batch: subspace 0 flips to j=1 EXACTLY on the codeword (zero
        # error); subspace 1 stays j=0 but sits 0.1 away per dim
        new_rows = [(10 + i, [1.0, 1.0, 0.1, 0.1]) for i in range(2)]
        e = spark.createDataFrame(idx_rows,
                                  "vec_id long, embedding array<double>")
        root = str(tmp_path / "pq_drift")
        S.write_pq_index(S.pq_build_index(e, codebooks=books,
                                          n_subspaces=2), root)
        out = {r["m"]: r for r in S.pq_drift_by_subspace(
            S.read_pq_index(spark, root),
            spark.createDataFrame(new_rows,
                                  "vec_id long, embedding array<double>")
        ).collect()}
        assert set(out) == {0, 1}
        r0 = out[0]
        assert (r0["n_index"], r0["n_new"]) == (4, 2)
        # total usage flip: index all on j=0, batch all on j=1 -> L1=2
        assert abs(r0["usage_l1"] - 2.0) < 1e-9
        assert r0["mean_qerr_new"] == 0.0     # lands ON the codeword
        r1 = out[1]
        assert abs(r1["usage_l1"] - 0.0) < 1e-9   # same codeword usage
        # qerr = 0.1^2 + 0.1^2 = 0.02 per vector
        assert abs(r1["mean_qerr_new"] - 0.02) < 1e-9


class TestHardNegativeTopk:
    def test_positives_excluded_before_ranking(self, spark):
        import orange3_timeseries_spark.operators.similarity as S

        # corpus along two directions; query points at e1.  Nearest is
        # a POSITIVE (same label) — excluding it must promote the next
        # e1-ish vector into rank 1, not truncate the list.
        rows = [(1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "b"),
                (3, [0.8, 0.2], "b"), (4, [0.0, 1.0], "b")]
        e = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label string")
        q = spark.createDataFrame([(0, [1.0, 0.0])],
                                  "query_id long, embedding array<double>")
        pos = spark.createDataFrame([(0, 1)], "query_id long, vec_id long")
        got = [(r.nn_id, r.rank) for r in
               S.hard_negative_topk(e, q, pos, k=2)
               .orderBy("rank").collect()]
        assert got == [(2, 1), (3, 2)]
        # without exclusion the positive tops the list
        base = [(r.nn_id, r.rank) for r in
                S.brute_force_topk(e, q, k=2).orderBy("rank").collect()]
        assert base[0][0] == 1


class TestIvfPqLifecycle:
    def test_full_lifecycle_matches_live(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        rows = [(i, [float((i * 7 + j) % 5) for j in range(8)])
                for i in range(24)]
        e = spark.createDataFrame(rows,
                                  "vec_id long, embedding array<double>")
        cents = [r[1] for r in rows[:4]]
        books = [[[r[1][m * 2], r[1][m * 2 + 1]] for r in rows[:4]]
                 for m in range(4)]
        q = spark.createDataFrame([(0, rows[5][1])],
                                  "query_id long, embedding array<double>")
        third = F.col("vec_id") % 3

        root = str(tmp_path / "ivfpq")
        S.write_ivfpq_index(
            S.ivfpq_build_index(e.where(third == 0), cents, books),
            root)
        merged = S.ivfpq_merge_index(S.read_ivfpq_index(spark, root),
                                     e.where(third == 1))
        S.write_ivfpq_index(merged, root)
        S.ivfpq_append_index(spark, root, e.where(third == 2))
        assert current_version(root) == 2
        assert _ndeltas(resolve_index_path(root)) == 1
        S.compact_ivfpq_index(spark, root)
        assert current_version(root) == 3

        served = S.ivfpq_topk_from_index(
            S.read_ivfpq_index(spark, root), q, k=3, nprobe=2)
        live = S.ivfpq_topk(e, q, books, k=3, n_centroids=4, nprobe=2,
                            centroids=cents)
        assert _rows(served) == _rows(live)
        # id_col recovered from the params table
        assert S.read_ivfpq_index(spark, root).id_col == "vec_id"

    def test_merge_guard_rejects_reingested_id(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        rows = [(i, [float(i + j) for j in range(4)]) for i in range(8)]
        e = spark.createDataFrame(rows,
                                  "vec_id long, embedding array<double>")
        cents = [r[1] for r in rows[:2]]
        books = [[[r[1][m * 2], r[1][m * 2 + 1]] for r in rows[:2]]
                 for m in range(2)]
        idx = S.ivfpq_build_index(e.where(F.col("vec_id") < 5), cents,
                                  books)
        with pytest.raises(ValueError, match="ivfpq_merge_index"):
            S.ivfpq_merge_index(idx, e.where(F.col("vec_id") >= 4))

    def test_empty_batch_yields_null_metrics_not_nan(self, spark,
                                                     tmp_path):
        import math

        import orange3_timeseries_spark.operators.similarity as S

        books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]
        e = spark.createDataFrame([(0, [0.0, 0.0, 0.0, 0.0])],
                                  "vec_id long, embedding array<double>")
        root = str(tmp_path / "pq_drift_empty")
        S.write_pq_index(S.pq_build_index(e, codebooks=books,
                                          n_subspaces=2), root)
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>")
        rows = S.pq_drift_by_subspace(S.read_pq_index(spark, root),
                                      empty).collect()
        assert len(rows) == 2
        for r in rows:
            # NULL, never NaN — NaN compares False and silently
            # disarms a threshold-based retrain signal
            assert r["n_new"] == 0
            assert r["usage_l1"] is None or \
                not math.isnan(r["usage_l1"])
            assert r["mean_qerr_new"] is None


class TestPqRetrainSubspaces:
    """pq_retrain_subspaces: the remedy pq_drift_by_subspace signals —
    per-subspace Lloyd re-fit + flagged-slot re-encode, cold subspaces
    (codebooks AND code slots) bit-untouched, and the batch's
    quantization error RECOVERS."""

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    def _setup(self, spark, tmp_path, name="pq_rt"):
        import orange3_timeseries_spark.operators.similarity as S

        # M=2 subspaces of ds=2, K=2 codewords each; indexed data sits
        # ON the codewords (zero error), the batch drifts subspace 0 to
        # [0.5, 0.5] — equidistant from both codewords (qerr 0.5)
        books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]
        idx_rows = ([(i, [0.0, 0.0, 0.0, 0.0]) for i in range(4)]
                    + [(4 + i, [1.0, 1.0, 1.0, 1.0]) for i in range(4)])
        new_rows = [(10 + i, [0.5, 0.5, 0.0, 0.0]) for i in range(6)]
        root = str(tmp_path / name)
        S.write_pq_index(
            S.pq_build_index(self._df(spark, idx_rows), codebooks=books,
                             n_subspaces=2), root)
        return S, root, idx_rows, new_rows

    def test_qerr_recovers_and_cold_subspace_untouched(self, spark,
                                                       tmp_path):
        S, root, idx_rows, new_rows = self._setup(spark, tmp_path)
        batch = self._df(spark, new_rows)

        def drift():
            return {r["m"]: r for r in S.pq_drift_by_subspace(
                S.read_pq_index(spark, root), batch).collect()}

        before = drift()
        assert abs(before[0]["mean_qerr_new"] - 0.5) < 1e-9
        assert before[1]["mean_qerr_new"] == 0.0
        flagged = [m for m, r in sorted(before.items())
                   if r["mean_qerr_new"] > 0.1]
        assert flagged == [0]

        S.pq_append_index(spark, root, batch)
        base = S.read_pq_index(spark, root)
        cold_books = base.codebooks[1]
        cold_codes = sorted(
            (r["nn_id"], r["pq_code"][1])
            for r in base.codes.collect())

        all_vecs = self._df(spark, idx_rows + new_rows)
        S.pq_retrain_subspaces(spark, root, flagged, all_vecs)
        assert current_version(root) == 2

        after = drift()
        # the retrained codebook has a codeword near the drifted
        # cluster: qerr drops from 0.5 to well under it
        assert after[0]["mean_qerr_new"] < 0.1
        # cold subspace: codebook AND every code slot bit-identical
        new_index = S.read_pq_index(spark, root)
        assert new_index.codebooks[1] == cold_books
        assert sorted((r["nn_id"], r["pq_code"][1])
                      for r in new_index.codes.collect()) == cold_codes
        # retrain subsumed compaction: deltas folded into delta=0
        assert _ndeltas(resolve_index_path(root)) == 0
        # serve still runs from the new generation
        q = spark.createDataFrame([(0, [0.5, 0.5, 0.0, 0.0])],
                                  "query_id long, embedding array<double>")
        assert S.pq_topk_from_index(new_index, q, k=3).count() == 3

    def test_coverage_guard_fails_loudly(self, spark, tmp_path):
        S, root, idx_rows, new_rows = self._setup(spark, tmp_path,
                                                  "pq_rt_cov")
        S.pq_append_index(spark, root, self._df(spark, new_rows))
        # vectors missing the appended batch: refuse, never shrink
        with pytest.raises(ValueError, match="does not cover"):
            S.pq_retrain_subspaces(spark, root, [0],
                                   self._df(spark, idx_rows))

    def test_validates_subspaces(self, spark, tmp_path):
        S, root, idx_rows, _ = self._setup(spark, tmp_path, "pq_rt_bad")
        vecs = self._df(spark, idx_rows)
        with pytest.raises(ValueError, match="outside the persisted"):
            S.pq_retrain_subspaces(spark, root, [9], vecs)
        with pytest.raises(ValueError, match="empty subspaces"):
            S.pq_retrain_subspaces(spark, root, [], vecs)
        with pytest.raises(ValueError, match="wrong corpus"):
            S.pq_retrain_subspaces(
                spark, root, [0],
                self._df(spark, [(0, [1.0, 2.0])]))


class TestIvfPqRetrainSubspaces:
    def test_fine_retrain_keeps_coarse_side_bit_identical(self, spark,
                                                          tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        cents = [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]]
        books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]
        idx_rows = ([(i, [0.0, 0.0, 0.0, 0.0]) for i in range(4)]
                    + [(4 + i, [1.0, 1.0, 1.0, 1.0]) for i in range(4)])
        new_rows = [(10 + i, [0.5, 0.5, 0.0, 0.0]) for i in range(6)]

        def df(rows):
            return spark.createDataFrame(
                rows, "vec_id long, embedding array<double>")

        root = str(tmp_path / "ivfpq_rt")
        S.write_ivfpq_index(
            S.ivfpq_build_index(df(idx_rows), cents, books), root)
        S.ivfpq_append_index(spark, root, df(new_rows))
        base = S.read_ivfpq_index(spark, root)
        coarse_before = sorted(
            (r["nn_id"], r["centroid_id"])
            for r in base.entries.collect())
        cold_codes = sorted((r["nn_id"], r["pq_code"][1])
                            for r in base.entries.collect())

        S.ivfpq_retrain_subspaces(spark, root, [0],
                                  df(idx_rows + new_rows))
        after = S.read_ivfpq_index(spark, root)
        # the coarse side is NOT this operator's territory: every
        # entry keeps its cell, and the centroid table is unchanged
        assert sorted((r["nn_id"], r["centroid_id"])
                      for r in after.entries.collect()) == coarse_before
        assert ([r["centroid"] for r in
                 after.centroids.orderBy("centroid_id").collect()]
                == cents)
        # cold code slots bit-identical; flagged subspace recovered
        assert sorted((r["nn_id"], r["pq_code"][1])
                      for r in after.entries.collect()) == cold_codes
        assert any(abs(c[0] - 0.3) < 1e-6
                   for c in after.codebooks[0])   # Lloyd found ~[0.3,0.3]
        q = spark.createDataFrame([(0, [0.5, 0.5, 0.0, 0.0])],
                                  "query_id long, embedding array<double>")
        assert S.ivfpq_topk_from_index(after, q, k=3,
                                       nprobe=2).count() == 3

    def test_coverage_guard(self, spark, tmp_path):
        import orange3_timeseries_spark.operators.similarity as S

        cents = [[0.0, 0.0], [1.0, 1.0]]
        books = [[[0.0], [1.0]], [[0.0], [1.0]]]
        rows = [(i, [float(i % 2), float(i % 2)]) for i in range(6)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
        root = str(tmp_path / "ivfpq_rt_cov")
        S.write_ivfpq_index(S.ivfpq_build_index(df, cents, books), root)
        with pytest.raises(ValueError, match="does not cover"):
            S.ivfpq_retrain_subspaces(
                spark, root, [0], df.where(F.col("vec_id") < 3))

    def test_duplicate_id_guard(self, spark, tmp_path):
        # the growth direction of the silent-corruption class: a
        # source with a duplicated id would fan the re-encode join out
        import orange3_timeseries_spark.operators.similarity as S

        cents = [[0.0, 0.0], [1.0, 1.0]]
        books = [[[0.0], [1.0]], [[0.0], [1.0]]]
        rows = [(i, [float(i % 2), float(i % 2)]) for i in range(6)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
        root = str(tmp_path / "ivfpq_rt_dup")
        S.write_ivfpq_index(S.ivfpq_build_index(df, cents, books), root)
        with pytest.raises(ValueError, match="duplicate ids"):
            S.ivfpq_retrain_subspaces(
                spark, root, [0], df.unionByName(
                    df.where(F.col("vec_id") == 2)))
