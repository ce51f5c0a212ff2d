"""Driver-gate rehearsal: run queries() vs oracle_sql() at a given sf.

Mimics the driver's compare: row count, schema (column names sorted), and an
order-insensitive value hash over columns sorted by name. Usage:

    python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x01".join(r).encode("utf-8"))
    return h.hexdigest()


def main() -> int:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-dependent frozen-VALUES pins (bpe_*, pq_quantize, ...) recompute
    # at the rehearsal scale instead of the driver-gate default sf0.01
    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_df(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows  {name}: {len(got)} rows, {len(got.columns)} cols [{dt:.1f}s] (no SQL oracle)")
            continue
        want = con.execute(sqls[name]).df()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        print(
            f"{status} {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} [{dt:.1f}s]"
        )
        if not (ok_rows and ok_cols and ok_hash):
            failures += 1
            print("   got cols:", sorted(got.columns), "want:", sorted(want.columns))
            if ok_cols and ok_rows:
                merged = got[sorted(got.columns)].round(6) if len(got) < 50 else None
                if merged is not None:
                    print("   got:", merged.head(10).to_dict("records"))
                    print("   want:", want[sorted(want.columns)].head(10).to_dict("records"))
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
