"""RDBMS sink — the RdbmPipeline analog (SP/pipelines/pipelines_rdbm.py).

The reference buckets items per table and appends them to MySQL through
sqlalchemy ``to_sql``, adding operational columns (keyid, bizdate, ctime,
spider) and, when a batch insert fails, retrying row-at-a-time and
DROPPING poison rows (pipelines_rdbm.py:90-105). This container has no
MySQL/sqlalchemy, so the analog targets stdlib sqlite3 with the same
behavioral contract:

- every row gains keyid / bizdate / ctime / spider; business values are
  stored as TEXT (the reference types everything VARCHAR);
- batch ``executemany`` first, then row-at-a-time on failure, dropped
  rows counted instead of silently lost;
- ONE deliberate upgrade, documented: the reference's keyid is a random
  uuid1 (rowkey, SP/utils/base.py:43-46), so re-running a load duplicates
  every row. Ours is the md5 of the row's business values + table name,
  and the insert is ``INSERT OR REPLACE`` on that PRIMARY KEY — the sink
  is idempotent, matching the repo's idempotent part-rewrite discipline
  (stages/parse_sink.py write_part).

Scale note: an external RDBMS is a single-endpoint sink; the Ray-native
store is the Lance/parquet table dir (SURVEY.md §2.7). This sink streams
``iter_batches`` block-by-block (never materializes the Dataset) and
exists for reference-pipeline parity / downstream-tool export; at
cluster scale you shard endpoints per partition (Dataset.write_sql's
connection-factory model) rather than funnel 100 TB through one DB.
"""

from __future__ import annotations

import hashlib
import sqlite3
import time

import pyarrow as pa

_META_COLS = ("keyid", "bizdate", "ctime", "spider")


def _keyid(bizdate: str, tablename: str, vals: tuple) -> str:
    h = hashlib.md5(
        "\x01".join([tablename, *map(str, vals)]).encode("utf-8")
    ).hexdigest().upper()
    return f"{bizdate}_{h}"


def write_table_rdbms(
    ds,
    db_path: str,
    tablename: str,
    spider: str = "zhifang_sim",
    bizdate: str | None = None,
) -> dict:
    """Stream a Dataset (or pa.Table) into sqlite with RdbmPipeline
    semantics. Returns {rows_written, rows_dropped, table}."""
    bizdate = bizdate or time.strftime("%Y-%m-%d", time.localtime())
    if isinstance(ds, pa.Table):
        names = ds.column_names
        batches = [ds]
    else:
        names = ds.schema().names
        batches = ds.iter_batches(batch_format="pyarrow", batch_size=2048)

    con = sqlite3.connect(db_path)
    written = dropped = 0
    # create the table from the schema BEFORE consuming batches: a 0-row
    # input must still leave a queryable table behind (empty crawl tables
    # are a supported case, see monitor._crawl_table_ds)
    cols = [c for c in names if c not in _META_COLS]
    col_defs = ", ".join(f'"{c}" TEXT' for c in cols)
    con.execute(
        f'CREATE TABLE IF NOT EXISTS "{tablename}" ('
        f"keyid TEXT PRIMARY KEY, {col_defs}, "
        f"bizdate TEXT, ctime TEXT, spider TEXT)"
    )
    con.commit()
    try:
        for batch in batches:
            if isinstance(batch, pa.RecordBatch):
                batch = pa.Table.from_batches([batch])
            ctime = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())
            data = [batch[c].to_pylist() for c in cols]
            rows = [
                (
                    _keyid(bizdate, tablename, vals),
                    *(str(v) for v in vals),
                    bizdate,
                    ctime,
                    spider,
                )
                for vals in zip(*data)
            ]
            ph = ", ".join("?" * (len(cols) + 4))
            sql = f'INSERT OR REPLACE INTO "{tablename}" VALUES ({ph})'
            try:
                con.executemany(sql, rows)
                written += len(rows)
            except sqlite3.Error:
                # reference fallback: re-insert row-at-a-time, drop poison
                # rows instead of failing the load (pipelines_rdbm.py:96-103)
                for r in rows:
                    try:
                        con.execute(sql, r)
                        written += 1
                    except sqlite3.Error:
                        dropped += 1
            con.commit()
    finally:
        con.close()
    return {"rows_written": written, "rows_dropped": dropped, "table": tablename}


def read_table_rdbms(db_path: str, tablename: str) -> pa.Table:
    """Read a sink table back as Arrow (column order as stored)."""
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f'SELECT * FROM "{tablename}"')
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    return pa.table({n: pa.array(list(c), type=pa.string()) for n, c in zip(names, cols)})
