import math

import pytest

from orange3_timeseries_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4",
                              "spark.driver.memory": "4g"})
    yield s


def approx_rows(rows, expected, tol=1e-9):
    """Compare a list of per-row values (floats/None) against expected,
    treating None ≈ NaN."""
    assert len(rows) == len(expected), f"{rows} vs {expected}"
    for got, exp in zip(rows, expected):
        if exp is None or (isinstance(exp, float) and math.isnan(exp)):
            assert got is None or (isinstance(got, float) and math.isnan(got)), \
                f"expected missing, got {got!r} (all: {rows} vs {expected})"
        else:
            assert got is not None and got == pytest.approx(exp, abs=tol), \
                f"{got!r} != {exp!r} (all: {rows} vs {expected})"
