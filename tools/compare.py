#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, sorts columns by name, and compares row counts,
schemas (loosely), and exact values (floats: exact bitwise after
float64 cast; tiny tolerance report if not).
"""
import decimal
import json
import sys

import duckdb
import pandas as pd


def _is_decimal_series(s) -> bool:
    """Pandas materializes parquet decimal128 / DuckDB DECIMAL as dtype
    object holding decimal.Decimal values."""
    if s.dtype.kind != "O":
        return False
    v = s.dropna()
    return len(v) > 0 and isinstance(v.iloc[0], decimal.Decimal)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; Spark-written corpora
        # (tools.ScaleUp probes) are directories of part files
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            oracle_df = con.execute(sql).fetchdf()
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        oracle_df = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
        spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
        if list(oracle_df.columns) != list(spark_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs oracle {list(oracle_df.columns)}")
            n_fail += 1
            continue
        if len(oracle_df) != len(spark_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs oracle {len(oracle_df)}")
            n_fail += 1
            continue
        bad = []
        for c in oracle_df.columns:
            a, b = spark_df[c], oracle_df[c]
            try:
                # Decimal anywhere is a hard failure, same class as the
                # int-vs-float rule below: the driver's value-hash is
                # dtype/representation sensitive and Spark decimal128
                # parquet vs a DuckDB DECIMAL hash-differ even on equal
                # values (round-8 q188). The local gate silently passed
                # it because object-Decimal slid through the str/float
                # paths here. DecimalType is banned from declared
                # outputs (PropertiesSpec) — cast to BIGINT or DOUBLE.
                if _is_decimal_series(a) or _is_decimal_series(b):
                    bad.append((c, f"decimal dtype (spark {a.dtype}/oracle {b.dtype}): driver hash would differ — cast to BIGINT/DOUBLE"))
                    continue
                # The driver's value-hash distinguishes int64 from float64:
                # DuckDB SUM(integer) -> HUGEINT -> pandas float64 while the
                # Spark parquet holds int64. A silent float64 cast here hid
                # exactly that class of mismatch in round 1 (q09/q12/q17/
                # q23/q45), so int-vs-float dtype is now a hard failure.
                if (a.dtype.kind in "iu") != (b.dtype.kind in "iu") and (
                    a.dtype.kind in "iufc" and b.dtype.kind in "iufc"
                ):
                    bad.append((c, f"dtype mismatch: spark {a.dtype} vs oracle {b.dtype} (driver hash would differ)"))
                    continue
                if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                    a = a.astype("float64")
                    b = b.astype("float64")
                    eq = (a == b) | (a.isna() & b.isna())
                else:
                    a = a.astype(str)
                    b = b.astype(str)
                    eq = a == b
            except Exception as e:
                bad.append((c, f"compare error {e}"))
                continue
            if not eq.all():
                i = (~eq).idxmax()
                bad.append((c, f"{(~eq).sum()} diffs, first at row {i}: spark={spark_df[c][i]!r} oracle={oracle_df[c][i]!r}"))
        if bad:
            print(f"FAIL {name}: " + "; ".join(f"[{c}] {m}" for c, m in bad))
            n_fail += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    import os
    missing = [n for n in oracle if not os.path.exists(f"{out_dir}/{n}")]
    if missing:
        print("missing spark outputs:", missing)
    print(f"\n{len(oracle) - n_fail}/{len(oracle)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
