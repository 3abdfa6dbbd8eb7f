"""Sources & sinks: parquet/CSV readers (incl. Orange's 3-row-header CSV
dialect), in-memory constructors, and writers."""

from orange3_timeseries_spark.sources.finance import finance_data, quandl_data
from orange3_timeseries_spark.sources.readers import (
    read_orange_csv,
    read_orange_csv_url,
    read_orange_file,
    read_orange_tab,
    read_parquet,
    read_parquet_stream,
    read_table,
    read_table_stream,
)
from orange3_timeseries_spark.sources.writers import write_partitioned

__all__ = ["read_parquet", "read_orange_csv", "read_orange_csv_url", "read_table",
           "read_orange_file", "read_orange_tab",
           "read_parquet_stream", "read_table_stream",
           "finance_data", "quandl_data", "write_partitioned"]
