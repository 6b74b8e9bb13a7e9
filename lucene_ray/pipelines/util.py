"""Shared pipeline helpers.

Ray 2.49.2 drops ALL columns from the result of a ``groupby().aggregate()``
(and of a ``map_batches`` chain) when the input dataset is empty, so a
downstream ``df["col"]`` raises ``KeyError`` on a 0-row table.  Every
pipeline that converts such a result to pandas must restore the expected
schema instead of re-discovering this one call site at a time.
"""

from __future__ import annotations

import pandas as pd


def ensure_cols(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Return ``df`` unchanged when it already carries ``cols``; otherwise
    (the empty-input column-drop case) return an empty frame WITH them."""
    if all(c in df.columns for c in cols):
        return df
    if len(df) != 0:                      # non-empty but missing a column
        raise KeyError([c for c in cols if c not in df.columns])
    return pd.DataFrame({c: [] for c in cols})


def typed_table(ds_or_df, schema) -> "object":
    """Materialize a bounded result as a pa.Table with the DECLARED
    schema, surviving Ray's empty-input column drop (an empty pipeline
    otherwise yields a schemaless 0×0 frame, which breaks the driver's
    schema comparison)."""
    import pyarrow as pa

    df = ds_or_df.to_pandas() if hasattr(ds_or_df, "to_pandas") \
        else ds_or_df
    df = ensure_cols(df, [f.name for f in schema])
    arrays = [pa.array(df[f.name], type=f.type) for f in schema]
    return pa.table(dict(zip([f.name for f in schema], arrays)))
