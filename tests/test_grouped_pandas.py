"""Grouped-map applyInPandas: per-group OLS in pandas must agree with the
JVM regr_slope/regr_intercept aggregates — completing the UDF API matrix
(pandas_udf scalar ✓, mapInPandas ✓, applyInPandasWithState ✓, grouped map)."""

from __future__ import annotations

import pandas as pd
import pytest


def test_applyinpandas_ols_matches_builtin(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = pdf["l_quantity"], pdf["l_extendedprice"]
        mx, my = x.mean(), y.mean()
        cov = ((x - mx) * (y - my)).sum()
        var = ((x - mx) ** 2).sum()
        slope = cov / var
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "slope": [slope],
                "intercept": [my - slope * mx],
            }
        )

    got = {
        r["l_returnflag"]: (r["slope"], r["intercept"])
        for r in li.groupBy("l_returnflag")
        .applyInPandas(ols, schema="l_returnflag string, slope double, intercept double")
        .collect()
    }
    from wordcount_spark.operators.queries_relational import agg_regression

    want = {
        r["l_returnflag"]: (r["slope"], r["intercept"])
        for r in agg_regression(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0], abs=1e-3)
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-1)
