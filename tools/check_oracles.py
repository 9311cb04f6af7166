"""Local replica of the driver's correctness gate: run each queries()
entry under Ray and its oracle_sql() under DuckDB on the same parquet
dir; compare row count, schema (column names) and an order-insensitive
value hash. Usage: python tools/check_oracles.py [sf_dir] [names...]
"""

import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(
        normalize(df).astype(str), index=False).sum())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            res = pd.DataFrame(res)
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(res)} rows, "
                  f"cols {sorted(res.columns)})")
            n_pass += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: sql error {e}")
            n_fail += 1
            continue
        problems = []
        if len(res) != len(exp):
            problems.append(f"rows {len(res)} != {len(exp)}")
        if sorted(res.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(res.columns)} != {sorted(exp.columns)}")
        if not problems and value_hash(res) != value_hash(exp):
            a, b = normalize(res), normalize(exp)
            diff = (a.astype(str) != b.astype(str)).any(axis=1)
            problems.append(f"values differ in {int(diff.sum())} rows; "
                            f"first:\n{a[diff].head(3)}\nvs\n{b[diff].head(3)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(res)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
