"""Differential-test comparison helpers (Spark result vs DuckDB oracle)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, canonical dtypes — order-insensitive
    comparison like the driver's harness."""
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            col = df[c]
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # int/long width-insensitive
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def assert_frames_match(actual: pd.DataFrame, expected: pd.DataFrame, rtol: float = 1e-6) -> None:
    a, e = normalize(actual), normalize(expected)
    assert list(a.columns) == list(e.columns), f"columns differ: {list(a.columns)} vs {list(e.columns)}"
    assert len(a) == len(e), f"row count differs: {len(a)} vs {len(e)}"
    for c in a.columns:
        av, ev = a[c].to_numpy(), e[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(e[c]):
            both_nan = pd.isna(av) & pd.isna(ev)
            close = np.isclose(av.astype(float), ev.astype(float), rtol=rtol, equal_nan=False)
            bad = ~(both_nan | close)
        else:
            bad = np.array([x != y and not (_isnan(x) and _isnan(y)) for x, y in zip(av, ev)])
        if bad.any():
            idx = int(np.argmax(bad))
            raise AssertionError(
                f"column {c!r}: {int(bad.sum())}/{len(a)} mismatches; "
                f"first at row {idx}: actual={av[idx]!r} expected={ev[idx]!r}"
            )


def _isnan(x) -> bool:
    if x is None:
        return True
    try:
        return bool(pd.isna(x))  # covers float nan AND NaT
    except (TypeError, ValueError):
        return False
