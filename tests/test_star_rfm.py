"""TPC-H Q3/Q5-flavored star joins and RFM segmentation (sf0.001)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _pd(table):
    return pd.read_parquet(f"{SF}/{table}.parquet")


def _rev_units(df):
    pu = (df.l_extendedprice * 100.0).round().astype("int64")
    du = (df.l_discount * 100.0).round().astype("int64")
    return pu * (100 - du)


class TestQ3:
    @pytest.fixture(scope="class")
    def out(self, spark):
        from orange3_timeseries_spark.queries import QUERIES
        return QUERIES["tpch_q3_top_orders"](spark, SF).toPandas()

    def test_top10_sorted_desc(self, out):
        assert len(out) <= 10
        assert list(out.revenue) == sorted(out.revenue, reverse=True)

    def test_revenue_matches_pandas(self, out):
        cust = _pd("customer")
        orders = _pd("orders")
        li = _pd("lineitem")
        keep_c = set(cust[cust.c_mktsegment == "BUILDING"].c_custkey)
        orders = orders[(orders.o_orderdate < "1998-03-15")
                        & orders.o_custkey.isin(keep_c)]
        li = li[li.l_shipdate > "1998-03-15"]
        j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        j["ru"] = _rev_units(j)
        ref = j.groupby("l_orderkey").ru.sum().sort_values(
            ascending=False)
        for _, row in out.iterrows():
            assert row.revenue == pytest.approx(
                ref.loc[row.o_orderkey] / 10000.0)
        # the returned set IS the top-|out| revenue set
        assert set(out.o_orderkey) == set(ref.head(len(out)).index)


class TestQ5:
    def test_matches_pandas(self, spark):
        from orange3_timeseries_spark.queries import QUERIES
        out = QUERIES["tpch_q5_nation_revenue"](spark, SF).toPandas()
        region = _pd("region")
        nation = _pd("nation")
        sup = _pd("supplier")
        cust = _pd("customer")
        orders = _pd("orders")
        li = _pd("lineitem")
        asia = nation.merge(region[region.r_name == "ASIA"],
                            left_on="n_regionkey", right_on="r_regionkey")
        j = (orders[(orders.o_orderdate >= "1996-01-01")
                    & (orders.o_orderdate < "1997-01-01")]
             .merge(cust, left_on="o_custkey", right_on="c_custkey")
             .merge(li, left_on="o_orderkey", right_on="l_orderkey")
             .merge(sup, left_on="l_suppkey", right_on="s_suppkey"))
        j = j[j.c_nationkey == j.s_nationkey]
        j = j.merge(asia, left_on="s_nationkey", right_on="n_nationkey")
        j["ru"] = _rev_units(j)
        ref = j.groupby("n_name").ru.sum() / 10000.0
        got = dict(zip(out.n_name, out.revenue))
        assert set(got) == set(ref.index)
        for name, rev in ref.items():
            assert got[name] == pytest.approx(rev)


class TestRFM:
    @pytest.fixture(scope="class")
    def out(self, spark):
        from orange3_timeseries_spark.queries import QUERIES
        return QUERIES["rfm_segments"](spark, SF).toPandas()

    def test_one_row_per_customer_with_orders(self, out):
        orders = _pd("orders")
        assert len(out) == orders.o_custkey.nunique()

    def test_scores_balanced_quintiles(self, out):
        for col in ["r_score", "f_score", "m_score"]:
            counts = out[col].value_counts()
            assert set(counts.index) == {1, 2, 3, 4, 5}
            assert counts.max() - counts.min() <= 1

    def test_monetary_and_frequency_match(self, out):
        orders = _pd("orders")
        ref_m = (orders.o_totalprice * 100).round().astype(
            "int64").groupby(orders.o_custkey).sum() / 100.0
        ref_f = orders.groupby("o_custkey").size()
        got = out.set_index("c_custkey")
        for ck in list(ref_m.index)[:50]:
            assert got.loc[ck, "monetary"] == pytest.approx(ref_m[ck])
            assert got.loc[ck, "frequency"] == ref_f[ck]

    def test_segment_rules(self, out):
        champ = out[out.segment == "champion"]
        assert (champ.r_score >= 4).all() and (champ.f_score >= 4).all()
        hib = out[out.segment == "hibernating"]
        assert (hib.r_score <= 2).all() and (hib.m_score <= 2).all()

    def test_higher_frequency_never_lower_f_score(self, out):
        s = out.sort_values(["frequency", "c_custkey"])
        assert s.f_score.is_monotonic_increasing
