"""Source connectors: Orange 3-row-header CSV dialect and the finance
connector (with an injected fetcher — no network)."""

import os

import pandas as pd
import pytest

from orange3_timeseries_spark.sources import (
    finance_data,
    quandl_data,
    read_orange_csv,
)

HERE = os.path.dirname(__file__)


class TestOrangeCsv:
    def test_airpassengers(self, spark):
        df, roles, time_col = read_orange_csv(
            spark, os.path.join(HERE, "data", "airpassengers.csv"))
        assert time_col == "Month"
        assert roles.get("Air passengers") == "target"
        rows = df.orderBy("Month").collect()
        assert len(rows) == 144
        assert rows[0]["Air passengers"] == 112.0
        assert rows[0]["Month"].year == 1949
        assert str(df.schema["Month"].dataType) == "TimestampType()"
        assert str(df.schema["Air passengers"].dataType) == "DoubleType()"


def _fake_yahoo(symbol, since, until):
    idx = pd.date_range("2024-01-02", periods=5, freq="D")
    return pd.DataFrame({
        "Open": [1.0, 2, 3, 4, 5],
        "High": [2.0, 3, 4, 5, 6],
        "Low": [0.5, 1, 2, 3, 4],
        "Close": [1.5, 2.5, 3.5, 4.5, 5.5],
        "Adj Close": [1.4, 2.4, 3.4, 4.4, 5.4],
        "Volume": [100, 200, 300, 400, 500],
    }, index=pd.Index(idx, name="Date"))


class TestFinance:
    def test_finance_data_role_move(self, spark):
        tsf = finance_data(spark, "TEST", fetcher=_fake_yahoo)
        assert tsf.time_col == "Date"
        # Adjusted Close renamed to the symbol and marked target
        assert "TEST" in tsf.df.columns
        assert "Adj Close" not in tsf.df.columns
        assert tsf.roles["TEST"] == "target"
        rows = tsf.df.orderBy("Date").collect()
        assert len(rows) == 5
        assert rows[0]["TEST"] == pytest.approx(1.4)
        assert rows[0]["Close"] == pytest.approx(1.5)

    def test_quandl_stub(self, spark):
        with pytest.raises(NotImplementedError, match="Quandl"):
            quandl_data(spark, "WIKI/AAPL")
