"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, sort columns by name and rows by value, compare EXACTLY
(the driver value-hashes, so even last-ulp float drift fails)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_CORRECT

QUERY_NAMES = sorted(entry_mod.queries().keys())


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif not pd.api.types.is_object_dtype(dt) and not isinstance(
            dt, pd.CategoricalDtype
        ):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql().get(name)
    spark_df = q(spark, SF_CORRECT).toPandas()
    if oracle is None:
        assert len(spark_df) >= 0  # rows-only check, mirrors the driver
        return
    duck_df = duck[SF_CORRECT].execute(oracle).fetchdf()
    s, d = _normalize(spark_df), _normalize(duck_df)
    assert list(s.columns) == list(d.columns), f"{name}: column mismatch"
    assert len(s) == len(d), f"{name}: row count {len(s)} != {len(d)}"
    for c in s.columns:
        if pd.api.types.is_float_dtype(s[c].dtype):
            sv, dv = s[c].to_numpy(), d[c].to_numpy()
            both_nan = np.isnan(sv) & np.isnan(dv)
            assert bool(np.all(both_nan | (sv == dv))), (
                f"{name}.{c}: float values differ\n"
                f"{sv[~(both_nan | (sv == dv))][:5]} vs "
                f"{dv[~(both_nan | (sv == dv))][:5]}"
            )
        else:
            assert s[c].equals(d[c]), f"{name}.{c}: values differ"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) >= 1
