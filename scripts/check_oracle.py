"""Local differential harness: run every queries() entry against its
oracle_sql() twin (DuckDB) and report row-count / schema / value matches —
a faster, chattier stand-in for the driver's CORRECTNESS gate.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from lakota_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class used for the pre-normalization schema check.

    The driver's correctness gate hashes rendered values, so an int64 column
    on one side vs float64 on the other (e.g. DuckDB HUGEINT window-sum fed
    through `//`) hash-mismatches even when numerically equal.  normalize()
    below coerces both to a common dtype, which HID that class of bug in
    round 4 (pack_sequences_demo).  Fail loudly on kind divergence instead.
    """
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def schema_mismatches(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    out = []
    for c in sorted(set(spark_pdf.columns) & set(duck_pdf.columns)):
        ka, kb = dtype_kind(spark_pdf[c]), dtype_kind(duck_pdf[c])
        # Arrow->pandas may give object for strings/decimals on either side;
        # only flag the numeric-class divergences the driver hash detects.
        if ka != kb and {ka, kb} <= {"int", "float", "bool"}:
            out.append(f"{c}: spark={spark_pdf[c].dtype} vs oracle={duck_pdf[c].dtype}")
    return out


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    attempted = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        attempted += 1
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        strict = schema_mismatches(spark_pdf, duck_pdf)
        if strict:
            failures.append(name)
            print(f"FAIL  {name}: dtype kind mismatch (driver would hash-fail): {strict}")
            continue
        a, b = normalize(spark_pdf), normalize(duck_pdf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        diffs = []
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                eq = np.isclose(
                    a[c].to_numpy(), b[c].to_numpy(), rtol=0, atol=0, equal_nan=True
                )
            else:
                eq = (a[c].to_numpy() == b[c].to_numpy()) | (
                    a[c].isna().to_numpy() & b[c].isna().to_numpy()
                )
            if not eq.all():
                idx = int(np.argmin(eq))
                diffs.append(f"{c} (e.g. row {idx}: {a[c].iloc[idx]!r} vs {b[c].iloc[idx]!r})")
        if diffs:
            failures.append(name)
            print(f"FAIL  {name}: value mismatch in {diffs}")
        else:
            print(f"ok    {name}: {len(a)} rows, exact match")
    print(f"\n{attempted - len(failures)}/{attempted} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
