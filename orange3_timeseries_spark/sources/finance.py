"""Market-data connectors (cf. ``datasources.py`` in the reference).

``finance_data`` mirrors the reference's Yahoo Finance OHLCV download
(``datasources.py:51-84``): driver-side fetch of a small frame →
``spark.createDataFrame`` → Date becomes the time column and **Adjusted
Close is renamed to the symbol and becomes the target role** — that
role move is the API contract downstream models key on.

The actual network client (``yfinance``) is not in this container, so the
fetch is injectable: pass ``fetcher`` (a callable returning a pandas
DataFrame with Date index / OHLCV columns) for tests or alternative
backends; without one, the import of ``yfinance`` is attempted and a
clear ImportError raised if absent.

``quandl_data`` (``datasources.py:14-48``) is preserved as a stub for API
parity — the upstream service is dead; the reference itself labels it
low-priority.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import TimeSeriesFrame


def _default_fetcher(symbol: str, since: Optional[str],
                     until: Optional[str]):
    try:
        import yfinance  # noqa: WPS433
    except ImportError as exc:
        raise ImportError(
            "finance_data needs the 'yfinance' package (not bundled in "
            "this environment) — or pass fetcher=... explicitly") from exc
    return yfinance.download(symbol, start=since, end=until,
                             auto_adjust=False)


def finance_data(spark: SparkSession, symbol: str,
                 since: Optional[str] = None, until: Optional[str] = None,
                 *, fetcher: Optional[Callable] = None) -> TimeSeriesFrame:
    """Fetch OHLCV history for ``symbol`` and return a
    :class:`TimeSeriesFrame` with Date as time column and the adjusted
    close renamed to the symbol as the target column
    (``datasources.py:70-82``)."""
    pdf = (fetcher or _default_fetcher)(symbol, since, until)
    pdf = pdf.reset_index()
    # yfinance >=0.2 returns MultiIndex columns for single symbols too
    pdf.columns = [c[0] if isinstance(c, tuple) else c for c in pdf.columns]
    df = spark.createDataFrame(pdf)
    adj = "Adj Close" if "Adj Close" in df.columns else "Close"
    df = (df.withColumnRenamed(adj, symbol)
          .withColumn("Date", F.col("Date").cast("timestamp")))
    value_cols = [c for c in df.columns if c not in ("Date",)]
    ordered = df.select("Date", symbol,
                        *[c for c in value_cols if c != symbol])
    return TimeSeriesFrame(ordered, time_col="Date",
                           roles={symbol: "target"})


def quandl_data(spark: SparkSession, symbol: str,
                since: Optional[str] = None, until: Optional[str] = None,
                *, collapse: str = "daily", api_key: str = "",
                fetcher: Optional[Callable] = None) -> TimeSeriesFrame:
    """Quandl datasets fetch (``datasources.py:14-48``): builds the same
    ``datasets/WIKI/{symbol}/data.csv`` request (asc order, rdiff
    transform, the reference's defaults since=1900-01-01 /
    until=today) and parses the CSV into a Date-indexed
    :class:`TimeSeriesFrame`, exactly as the reference's
    ``Timeseries.from_url`` did.

    The upstream service was shut down in 2018, so the DEFAULT path
    raises with guidance; pass ``fetcher`` (url -> CSV text) to replay
    archived exports or a compatible mirror — the request construction,
    CSV parsing, and frame contract are all live and tested."""
    import datetime as _dt
    import io

    if since is None:
        since = _dt.date(1900, 1, 1).isoformat()
    if until is None:
        until = _dt.date.today().isoformat()
    url = ("https://www.quandl.com/api/v3/datasets/WIKI/{S}/data.csv?"
           "start_date={A}&end_date={B}&order=asc&collapse={C}"
           "&transform=rdiff&api_key={K}").format(
               S=symbol, A=since, B=until, C=collapse, K=api_key)
    if fetcher is None:
        raise NotImplementedError(
            "the Quandl service no longer exists; pass fetcher=... to "
            "replay an archived export, or use finance_data / "
            "sources.read_orange_csv")
    import pandas as pd

    pdf = pd.read_csv(io.StringIO(fetcher(url)))
    date_col = pdf.columns[0]
    df = (spark.createDataFrame(pdf)
          .withColumn(date_col, F.col(date_col).cast("timestamp")))
    return TimeSeriesFrame(df, time_col=date_col)
