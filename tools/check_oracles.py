"""Local replica of the driver's correctness gate: run every
``queries()`` entry through Ray AND its ``oracle_sql()`` through DuckDB
on the same sf dir, compare row count + column set + order-insensitive
values.  Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import ray

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bool):
        return repr(v)
    return repr(v)


def _normalize(df):
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=int(__import__("os").environ.get("CHECK_CPUS", "8")), include_dashboard=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    ok = fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas") and not hasattr(res, "columns"):
                df = res.to_pandas()
            elif hasattr(res, "to_pandas"):
                df = res.to_pandas()
            else:
                df = res
        except Exception as ex:
            print(f"✗ {name}: RAY ERROR {type(ex).__name__}: {ex}")
            fail += 1
            continue
        if name not in oracles:
            print(f"• {name}: rows-only ({len(df)} rows, cols {sorted(df.columns)})")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"✗ {name}: SQL ERROR {type(ex).__name__}: {ex}")
            fail += 1
            continue
        problems = []
        if len(df) != len(odf):
            problems.append(f"rows {len(df)} vs {len(odf)}")
        if sorted(df.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(df.columns)} vs {sorted(odf.columns)}")
        if not problems:
            a, b = _normalize(df), _normalize(odf)
            if a != b:
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                sample = [(a[i], b[i]) for i in diff]
                problems.append(f"values differ, first diffs: {sample}")
        if problems:
            print(f"✗ {name}: {'; '.join(problems)}")
            fail += 1
        else:
            print(f"✓ {name}: {len(df)} rows match")
            ok += 1
    print(f"\n{ok} matched, {fail} failed")
    ray.shutdown()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
