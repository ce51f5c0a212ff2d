"""Reference sink-pipeline analogs over local, cluster-shardable layouts.

The reference ships five external row stores beyond the RDBMS pipeline,
all built on ONE pattern (per-table buckets -> flush at BUCKETSIZE ->
add keyid/bizdate/ctime/spider -> bulk write -> on failure degrade to
row-at-a-time and drop poison rows):

- HBase       SP/pipelines/pipelines_hbase.py:16-124  (cells keyed by
              (rowkey, 'cf:'+col), auto-create with one 'cf' family)
- MongoDB     SP/pipelines/pipelines_mongodb.py:16-96 (insert_many docs,
              _id = rowkey())
- ES          SP/pipelines/pipelines_elasticsearch.py:16-96
              (helpers.bulk, index=tablename — i.e. an inverted index
              over the stored docs)
- HDFS+Hive   SP/pipelines/pipelines_hdfs.py:17-127 + utils/ctrl_hive.py
              ('\\x01'-delimited text under {dir}/{table}/, values
              stripped of delimiter+newline, optional
              `create table if not exists` DDL)
- Doris       SP/pipelines/pipelines_doris.py:17-115 (streamload;
              auto-create `DISTRIBUTED BY HASH(keyid) BUCKETS 2`)
- Kafka       SP/pipelines/pipelines_kafka.py:17-44 (keyed topic:
              key=tablename, value=JSON item+ctime, partitioned sends;
              consumer analog: kafka_mon.py:17-29)

None of those servers exist in this container, so each analog targets
the same LOGICAL layout on local files, preserving the behavioral
contract (stringly-typed values, keyid/bizdate/ctime/spider meta
columns, per-table directory) while being Ray-Data-native:

- Writes are DISTRIBUTED: every input block writes its own
  content-keyed part file (tmp+rename, the stages/parse_sink.write_part
  discipline), driven by one `map_batches(...).sum()` pass — no driver
  funnel, no append contention. A Ray task retry rewrites the same
  bytes to the same name (idempotent), which is this design's analog of
  the reference's batch->row-at-a-time degradation: partial failure
  leaves no torn file, just a missing part that the retry completes.
- keyid: the reference's rowkey() is a RANDOM uuid1 (SP/utils/base.py:
  43-46), so re-running a load duplicates every row. Ours is the md5 of
  (tablename + business values) prefixed by bizdate — the same
  documented idempotency upgrade the RDBMS analog made
  (sources/rdbms.py). Loads are re-runnable; readers treat keyid as the
  primary key.
- Scale: one part per block, table dir per table; at 100 TB each sink
  dir is a partitioned dataset that downstream `read_parquet`/
  `read_text` consumes in parallel. The single-file `data.txt` append
  of the reference HDFS sink is deliberately NOT reproduced (a
  single-writer append is the one part of that design that cannot
  scale; Hive reads the whole dir anyway).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from spiderman_ray.functions.hashing import hash64, md5_hex
from spiderman_ray.sources.rdbms import _keyid

__all__ = [
    "write_table_hbase",
    "read_table_hbase",
    "write_table_mongo",
    "read_table_mongo",
    "write_index_es",
    "search_index_es",
    "write_table_hdfs",
    "read_table_hdfs",
    "write_table_doris",
    "read_table_doris",
    "write_topic_kafka",
    "read_topic_kafka",
]

_META = ("bizdate", "ctime", "spider")


def _as_batches(ds, batch_size: int = 4096):
    """Yield pa.Table batches from a Dataset or a pa.Table (tests)."""
    if isinstance(ds, pa.Table):
        yield ds
        return
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=batch_size):
        if isinstance(b, pa.RecordBatch):
            b = pa.Table.from_batches([b])
        yield b


def _drive(ds, part_fn) -> int:
    """Run ``part_fn(pa.Table) -> rows_written`` over every block.

    Dataset inputs go through map_batches with batch_size=None — one
    batch per BLOCK, so the sink writes one part per block (block size
    is already bounded by DataContext.target_max_block_size); pa.Table
    inputs run inline. part_fn must be idempotent (content-keyed
    tmp+rename) because Ray may retry a task."""
    if isinstance(ds, pa.Table):
        return sum(part_fn(b) for b in _as_batches(ds))

    def write_block(batch: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([part_fn(batch)], type=pa.int64())})

    out = ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)
    return int(out.sum("n") or 0)


def _fresh_dir(path: str) -> str:
    """Wipe-and-recreate a sink table dir (loads are whole-table: the
    reference auto-creates then appends forever; our re-runnable load
    replaces). Called on the DRIVER before the distributed write."""
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _stringify_columns(batch: pa.Table, cols: list[str]) -> list[list[str]]:
    """Python-str() every business value, per the reference's universal
    `str(value)` coercion (pipelines_hbase.py:99 etc.)."""
    return [[str(v) for v in batch[c].to_pylist()] for c in cols]


def _keyids(tablename: str, bizdate: str, cols_vals: list[list[str]]) -> list[str]:
    return [
        _keyid(bizdate, tablename, vals) for vals in zip(*cols_vals)
    ]


# ---------------------------------------------------------------------------
# HBase: sorted (rowkey, 'cf:'+qualifier, value) cells
# ---------------------------------------------------------------------------


def write_table_hbase(
    ds,
    root: str,
    tablename: str,
    spider: str = "zhifang_sim",
    bizdate: str = "2026-01-01",
    ctime: str = "2026-01-01 00:00:00",
) -> dict:
    """HbasePipeline analog: each row becomes one cell per column under
    the single 'cf' family (pipelines_hbase.py:96-105), plus the
    cf:bizdate/cf:ctime/cf:spider meta cells. Layout: parquet parts of
    (keyid, qualifier, value) sorted by (keyid, qualifier) within the
    part — the HFile sorted-KV shape."""
    tdir = _fresh_dir(os.path.join(root, tablename))

    def write_part(batch: pa.Table) -> int:
        business = [c for c in batch.column_names if c not in _META]
        cols_vals = _stringify_columns(batch, business)
        keyids = _keyids(tablename, bizdate, cols_vals)
        quals = ["cf:" + c for c in business] + ["cf:" + m for m in _META]
        k_out, q_out, v_out = [], [], []
        for i, kid in enumerate(keyids):
            vals = [cv[i] for cv in cols_vals] + [bizdate, ctime, spider]
            for q, v in sorted(zip(quals, vals)):
                k_out.append(kid)
                q_out.append(q)
                v_out.append(v)
        cells = pa.table(
            {
                "keyid": pa.array(k_out, type=pa.string()),
                "qualifier": pa.array(q_out, type=pa.string()),
                "value": pa.array(v_out, type=pa.string()),
            }
        ).sort_by([("keyid", "ascending"), ("qualifier", "ascending")])
        key = md5_hex(",".join(sorted(set(keyids))))[:16]
        path = os.path.join(tdir, f"cells-{key}.parquet")
        tmp = path + ".tmp"
        pq.write_table(cells, tmp)
        os.replace(tmp, path)
        return len(keyids)

    n = _drive(ds, write_part)
    return {"rows_written": n, "table": tablename, "dir": tdir}


def read_table_hbase(root: str, tablename: str) -> pa.Table:
    """Scan all cells back, globally sorted by (keyid, qualifier)."""
    tdir = os.path.join(root, tablename)
    parts = sorted(
        os.path.join(tdir, f) for f in os.listdir(tdir) if f.endswith(".parquet")
    )
    if not parts:
        return pa.table(
            {
                "keyid": pa.array([], type=pa.string()),
                "qualifier": pa.array([], type=pa.string()),
                "value": pa.array([], type=pa.string()),
            }
        )
    t = pa.concat_tables([pq.read_table(p) for p in parts])
    return t.sort_by([("keyid", "ascending"), ("qualifier", "ascending")])


# ---------------------------------------------------------------------------
# MongoDB: JSONL documents, _id primary key
# ---------------------------------------------------------------------------


def write_table_mongo(
    ds,
    root: str,
    tablename: str,
    spider: str = "zhifang_sim",
    bizdate: str = "2026-01-01",
    ctime: str = "2026-01-01 00:00:00",
) -> dict:
    """MongodbPipeline analog: one JSON document per row, ``_id`` first,
    business values str()'d, bizdate/ctime/spider appended
    (pipelines_mongodb.py:72-82). Documents land in JSONL parts; a
    duplicate ``_id`` inside a part is dropped first-wins — the analog
    of insert_many raising DuplicateKeyError and the row-at-a-time
    retry discarding the poison row."""
    tdir = _fresh_dir(os.path.join(root, tablename))

    def write_part(batch: pa.Table) -> int:
        business = [c for c in batch.column_names if c not in _META]
        cols_vals = _stringify_columns(batch, business)
        keyids = _keyids(tablename, bizdate, cols_vals)
        lines, seen = [], set()
        for i, kid in enumerate(keyids):
            if kid in seen:  # poison: duplicate primary key
                continue
            seen.add(kid)
            doc = {"_id": kid}
            for j, c in enumerate(business):
                doc[c] = cols_vals[j][i]
            doc["bizdate"], doc["ctime"], doc["spider"] = bizdate, ctime, spider
            lines.append(json.dumps(doc, sort_keys=False, ensure_ascii=False))
        key = md5_hex(",".join(sorted(seen)))[:16]
        _atomic_write(
            os.path.join(tdir, f"docs-{key}.jsonl"),
            ("\n".join(lines) + "\n").encode("utf-8"),
        )
        return len(lines)

    n = _drive(ds, write_part)
    return {"rows_written": n, "table": tablename, "dir": tdir}


def read_table_mongo(root: str, tablename: str) -> pa.Table:
    """Read documents back, first-wins on _id across parts (file-name
    order — parts are content-keyed so the winner is deterministic),
    sorted by _id."""
    tdir = os.path.join(root, tablename)
    docs, seen = [], set()
    for fn in sorted(os.listdir(tdir)):
        if not fn.endswith(".jsonl"):
            continue
        with open(os.path.join(tdir, fn), encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    d = json.loads(line)
                    if d["_id"] not in seen:
                        seen.add(d["_id"])
                        docs.append(d)
    docs.sort(key=lambda d: d["_id"])
    if not docs:
        return pa.table({"_id": pa.array([], type=pa.string())})
    names = list(docs[0].keys())
    return pa.table(
        {n: pa.array([d.get(n) for d in docs], type=pa.string()) for n in names}
    )


# ---------------------------------------------------------------------------
# Elasticsearch: docs store + term-sharded inverted index
# ---------------------------------------------------------------------------


def write_index_es(
    docs_ds,
    root: str,
    index: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
) -> dict:
    """ElasticSearchPipeline analog: `helpers.bulk` into index=tablename
    is, logically, (a) store the source docs and (b) maintain an
    inverted index over them. The analog makes (b) explicit and
    distributed: tokenize per batch (whitespace tokens, empties dropped
    — the repo's shared top_tokens/token_stats convention), emit exact
    per-doc (term, doc_id, tf) rows (a doc never spans rows, so tf is
    exact with NO exchange), then ONE bounded groupby over
    hash64(term)%n_shards co-locates each term's postings in a single
    sorted segment file — the segment-merge shape. Search reads only
    the shards its query terms hash to."""
    idir = _fresh_dir(os.path.join(root, index))
    ddir = os.path.join(idir, "docs")
    sdir = os.path.join(idir, "postings")
    os.makedirs(ddir, exist_ok=True)
    os.makedirs(sdir, exist_ok=True)

    def doc_part(batch: pa.Table) -> pa.Table:
        ids = [str(v) for v in batch[id_col].to_pylist()]
        key = md5_hex(",".join(ids))[:16]
        path = os.path.join(ddir, f"docs-{key}.parquet")
        tmp = path + ".tmp"
        pq.write_table(batch, tmp)
        os.replace(tmp, path)
        texts = batch[text_col].to_pylist()
        term_l, id_l, tf_l = [], [], []
        for did, text in zip(ids, texts):
            counts: dict[str, int] = {}
            for tok in str(text).split(" "):
                if tok:
                    counts[tok] = counts.get(tok, 0) + 1
            for tok, tf in counts.items():
                term_l.append(tok)
                id_l.append(did)
                tf_l.append(tf)
        shard = (
            (hash64(term_l).view(np.uint64) % np.uint64(n_shards)).astype(np.int64)
            if term_l
            else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                "term": pa.array(term_l, type=pa.string()),
                "doc_id": pa.array(id_l, type=pa.string()),
                "tf": pa.array(tf_l, type=pa.int64()),
                "_shard": pa.array(shard),
            }
        )

    def segment(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:  # zero-row split guard (ray.data can hand one over)
            return pd.DataFrame({"shard": [], "n": []})
        g = g.sort_values(["term", "doc_id"]).reset_index(drop=True)
        sh = int(g["_shard"].iloc[0])
        seg = pa.table(
            {
                "term": pa.array(g["term"].tolist(), type=pa.string()),
                "doc_id": pa.array(g["doc_id"].tolist(), type=pa.string()),
                "tf": pa.array(g["tf"].to_numpy(np.int64)),
            }
        )
        path = os.path.join(sdir, f"seg-{sh:02d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(seg, tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"shard": [sh], "n": [len(g)]})

    stats = (
        docs_ds.map_batches(doc_part, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(segment, batch_format="pandas")
    )
    n_postings = int(stats.sum("n") or 0)
    return {"postings": n_postings, "index": index, "dir": idir}


def search_index_es(
    root: str, index: str, terms: list[str], k: int = 50, n_shards: int = 64
):
    """AND-of-terms search, fully distributed: read ONLY the posting
    segments the query terms hash to (shard pruning), drop non-query
    terms at the scan, re-shard the surviving postings by
    hash64(doc_id)%64 (a doc's postings for ALL query terms meet in one
    group — dispatch stays O(parallelism)), AND + score inside the
    group, then a tiny global (score desc, doc_id) top-k. The exchange
    is bounded by the rarest term's posting count, never corpus-sized;
    nothing is materialized on the driver. Returns a ray.data.Dataset
    of (doc_id, score)."""
    import ray.data as rd

    sdir = os.path.join(root, index, "postings")
    want = sorted(set(terms))
    shards = sorted(
        {int(h % np.uint64(n_shards)) for h in hash64(want).view(np.uint64)}
    )
    parts = [
        os.path.join(sdir, f"seg-{s:02d}.parquet")
        for s in shards
        if os.path.exists(os.path.join(sdir, f"seg-{s:02d}.parquet"))
    ]
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "score": pa.array([], type=pa.int64()),
        }
    )
    if not parts:
        return rd.from_arrow(empty)

    def keep_and_shard(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hit = batch.filter(pc.is_in(batch["term"], value_set=pa.array(want)))
        ids = hit["doc_id"].to_pylist()
        sh = (
            (hash64(ids).view(np.uint64) % np.uint64(64)).astype(np.int64)
            if ids
            else np.array([], dtype=np.int64)
        )
        return hit.append_column("_dshard", pa.array(sh))

    def and_score(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=object), "score": pd.Series([], dtype="int64")}
            )
        per = g.groupby("doc_id").agg(score=("tf", "sum"), nt=("term", "nunique"))
        hits = per[per["nt"] == len(want)].reset_index()
        return pd.DataFrame(
            {
                "doc_id": hits["doc_id"].astype(str),
                "score": hits["score"].astype("int64"),
            }
        )

    return (
        rd.read_parquet(parts)
        .map_batches(keep_and_shard, batch_format="pyarrow")
        .groupby("_dshard")
        .map_groups(and_score, batch_format="pandas")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# HDFS + Hive: '\x01'-delimited text parts + CREATE TABLE DDL
# ---------------------------------------------------------------------------


def write_table_hdfs(
    ds,
    root: str,
    tablename: str,
    spider: str = "zhifang_sim",
    bizdate: str = "2026-01-01",
    ctime: str = "2026-01-01 00:00:00",
    delimiter: str = "\x01",
) -> dict:
    """HdfsPipeline analog: line = delimiter.join(keyid, *values,
    bizdate, ctime, spider) with the delimiter and newlines STRIPPED
    from every value (pipelines_hdfs.py:99), one dir per table; the
    Hive `create table if not exists t(c string, ...)` DDL the
    reference issues through impyla (ctrl_hive.py:11-27, HIVE_AUTO_
    CREATE) is emitted as {table}/_ddl.sql. Upgrade over the
    reference's single data.txt append: one part file per block."""
    tdir = _fresh_dir(os.path.join(root, tablename))

    def write_part(batch: pa.Table) -> int:
        business = [c for c in batch.column_names if c not in _META]
        cols_vals = _stringify_columns(batch, business)
        keyids = _keyids(tablename, bizdate, cols_vals)
        clean = [
            [v.replace(delimiter, "").replace("\n", "") for v in col]
            for col in cols_vals
        ]
        lines = [
            delimiter.join([kid, *(c[i] for c in clean), bizdate, ctime, spider])
            for i, kid in enumerate(keyids)
        ]
        key = md5_hex(",".join(sorted(keyids)))[:16]
        _atomic_write(
            os.path.join(tdir, f"part-{key}.txt"),
            ("\n".join(lines) + "\n").encode("utf-8"),
        )
        return len(lines)

    n = _drive(ds, write_part)
    # Hive DDL (driver-side, after the schema is known): every column is
    # `string`, exactly like checktable's generated SQL.
    names = None
    if isinstance(ds, pa.Table):
        names = [c for c in ds.column_names if c not in _META]
    else:
        names = [c for c in ds.schema().names if c not in _META]
    ddl_cols = ["keyid", *names, *(m for m in _META)]
    ddl = (
        f"create table if not exists {tablename}"
        f"({' string,'.join(ddl_cols)} string)"
    )
    _atomic_write(os.path.join(tdir, "_ddl.sql"), ddl.encode("utf-8"))
    return {"rows_written": n, "table": tablename, "dir": tdir, "ddl": ddl}


def read_table_hdfs(root: str, tablename: str, delimiter: str = "\x01") -> pa.Table:
    """Parse the text parts back into (keyid, c1..cn, bizdate, ctime,
    spider) using the column order recorded in _ddl.sql."""
    tdir = os.path.join(root, tablename)
    ddl = open(os.path.join(tdir, "_ddl.sql"), encoding="utf-8").read()
    inner = ddl[ddl.index("(") + 1 : ddl.rindex(")")]
    names = [c.strip().split(" ")[0] for c in inner.split(",")]
    rows = []
    for fn in sorted(os.listdir(tdir)):
        if fn.endswith(".txt"):
            with open(os.path.join(tdir, fn), encoding="utf-8") as f:
                rows.extend(
                    line.rstrip("\n").split(delimiter) for line in f if line.strip()
                )
    rows.sort(key=lambda r: r[0])
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    return pa.table(
        {n: pa.array(list(c), type=pa.string()) for n, c in zip(names, cols)}
    )


# ---------------------------------------------------------------------------
# Doris: hash(keyid)-bucketed parquet + DISTRIBUTED BY DDL
# ---------------------------------------------------------------------------


def doris_bucket_of(keyids: list[str], buckets: int) -> np.ndarray:
    """Doris's DISTRIBUTED BY HASH(keyid) analog: first-8-hex-of-md5 of
    the keyid string, mod buckets — vectorized as hash64 (first 16 hex)
    >> 32. SQL-expressible on purpose
    (CAST('0x'||substr(md5(keyid),1,8) AS UBIGINT) % buckets) so the
    placement is oracle-verifiable."""
    if not keyids:
        return np.array([], dtype=np.int64)
    h = hash64(list(keyids)).view(np.uint64) >> np.uint64(32)
    return (h % np.uint64(buckets)).astype(np.int64)


def write_table_doris(
    ds,
    root: str,
    tablename: str,
    buckets: int = 2,
    spider: str = "zhifang_sim",
    bizdate: str = "2026-01-01",
    ctime: str = "2026-01-01 00:00:00",
) -> dict:
    """DorisPipeline analog: streamload rows into a table auto-created
    `DISTRIBUTED BY HASH(keyid) BUCKETS n` (pipelines_doris.py:72-75 —
    the reference itself hash-distributes by key, the precedent SURVEY
    cites for this repo's partitioning). Rows land in
    {table}/bucket=<b>/ parquet parts placed by doris_bucket_of."""
    tdir = _fresh_dir(os.path.join(root, tablename))
    for b in range(buckets):
        os.makedirs(os.path.join(tdir, f"bucket={b}"), exist_ok=True)

    def write_part(batch: pa.Table) -> int:
        business = [c for c in batch.column_names if c not in _META]
        cols_vals = _stringify_columns(batch, business)
        keyids = _keyids(tablename, bizdate, cols_vals)
        bk = doris_bucket_of(keyids, buckets)
        tbl = pa.table(
            {
                "keyid": pa.array(keyids, type=pa.string()),
                **{
                    c: pa.array(cols_vals[j], type=pa.string())
                    for j, c in enumerate(business)
                },
                "bizdate": pa.array([bizdate] * len(keyids), type=pa.string()),
                "ctime": pa.array([ctime] * len(keyids), type=pa.string()),
                "spider": pa.array([spider] * len(keyids), type=pa.string()),
            }
        )
        for b in sorted(set(bk.tolist())):
            sub = tbl.filter(pa.array(bk == b))
            key = md5_hex(",".join(sorted(sub["keyid"].to_pylist())))[:16]
            path = os.path.join(tdir, f"bucket={b}", f"part-{key}.parquet")
            tmp = path + ".tmp"
            pq.write_table(sub, tmp)
            os.replace(tmp, path)
        return len(keyids)

    n = _drive(ds, write_part)
    names = (
        [c for c in ds.column_names if c not in _META]
        if isinstance(ds, pa.Table)
        else [c for c in ds.schema().names if c not in _META]
    )
    cols = [*names, *_META]
    ddl = (
        f"create table if not exists {tablename}(`keyid` varchar(50), "
        + " string,".join(f"`{c}`" for c in cols)
        + " string) DISTRIBUTED BY HASH(`keyid`) BUCKETS "
        + f"{buckets};"
    )
    _atomic_write(os.path.join(tdir, "_ddl.sql"), ddl.encode("utf-8"))
    return {"rows_written": n, "table": tablename, "dir": tdir, "ddl": ddl}


def read_table_doris(root: str, tablename: str, bucket: int | None = None) -> pa.Table:
    """Read one bucket (or all) back, sorted by keyid."""
    tdir = os.path.join(root, tablename)
    bdirs = (
        [os.path.join(tdir, f"bucket={bucket}")]
        if bucket is not None
        else sorted(
            os.path.join(tdir, d) for d in os.listdir(tdir) if d.startswith("bucket=")
        )
    )
    parts = []
    for bd in bdirs:
        b = int(os.path.basename(bd).split("=")[1])
        for fn in sorted(os.listdir(bd)):
            if fn.endswith(".parquet"):
                t = pq.read_table(os.path.join(bd, fn))
                parts.append(
                    t.append_column("bucket", pa.array([b] * len(t), type=pa.int64()))
                )
    if not parts:
        return pa.table({"keyid": pa.array([], type=pa.string())})
    return pa.concat_tables(parts).sort_by([("keyid", "ascending")])


# ---------------------------------------------------------------------------
# Kafka: keyed topic of JSON messages, deterministic hash partitions
# ---------------------------------------------------------------------------


def write_topic_kafka(
    ds,
    root: str,
    topic: str,
    tablename: str | None = None,
    partitions: int = 4,
    spider: str = "zhifang_sim",
    bizdate: str = "2026-01-01",
    ctime: str = "2026-01-01 00:00:00",
) -> dict:
    """KafkaPipeline analog (SP/pipelines/pipelines_kafka.py:17-44): every
    row becomes one message on topic = spider name dir, key = tablename,
    value = the item's fields as JSON + ctime. Messages land in
    {topic}/partition=<p>/part-*.jsonl, one part per input block per
    partition (the house distributed-sink discipline: content-keyed
    tmp+rename parts, no driver funnel, idempotent under task retry).

    Deviations, both documented house upgrades shared with the other five
    analogs: the reference picks a RANDOM partition per send
    (random.choice(partitions)) and has no stable message id — here the
    partition is the deterministic doris_bucket_of hash of the content
    keyid (SQL-expressible, so placement is oracle-verifiable) and the
    value carries the md5 content keyid, making loads re-runnable instead
    of duplicating every row. Business values go through the reference's
    universal str() coercion; a _schema.<key>.json sidecar records the
    value field order for the reader.

    A topic carries MANY tables (the reference funnels every table of a
    spider through one topic, dispatched by message key), so a load wipes
    only THIS key's parts — each part name is prefixed by the key's hash
    — and other keys' messages survive."""
    if tablename is None:
        tablename = topic
    tdir = os.path.join(root, topic)
    kh = md5_hex(tablename)[:8]
    for p in range(partitions):
        pdir = os.path.join(tdir, f"partition={p}")
        os.makedirs(pdir, exist_ok=True)
        for fn in os.listdir(pdir):  # whole-TABLE load: replace this key only
            if fn.startswith(f"part-{kh}-"):
                os.remove(os.path.join(pdir, fn))
    names = (
        [c for c in ds.column_names if c not in _META]
        if isinstance(ds, pa.Table)
        else [c for c in ds.schema().names if c not in _META]
    )

    def write_part(batch: pa.Table) -> int:
        business = [c for c in batch.column_names if c not in _META]
        cols_vals = _stringify_columns(batch, business)
        keyids = _keyids(tablename, bizdate, cols_vals)
        pk = doris_bucket_of(keyids, partitions)
        lines = []
        for i, kid in enumerate(keyids):
            value = {"keyid": kid}
            for j, c in enumerate(business):
                value[c] = cols_vals[j][i]
            value.update(bizdate=bizdate, ctime=ctime, spider=spider)
            lines.append(json.dumps({"key": tablename, "value": value}))
        for p in sorted(set(pk.tolist())):
            sel = [lines[i] for i in np.nonzero(pk == p)[0]]
            part_key = md5_hex("\n".join(sel))[:16]
            path = os.path.join(
                tdir, f"partition={p}", f"part-{kh}-{part_key}.jsonl"
            )
            _atomic_write(path, ("\n".join(sel) + "\n").encode("utf-8"))
        return len(keyids)

    n = _drive(ds, write_part)
    _atomic_write(
        os.path.join(tdir, f"_schema.{tablename}.json"),
        json.dumps(
            {"topic": topic, "key": tablename, "partitions": partitions,
             "fields": ["keyid", *names, *_META]}
        ).encode("utf-8"),
    )
    return {"rows_written": n, "topic": topic, "dir": tdir,
            "partitions": partitions, "key": tablename}


def read_topic_kafka(
    root: str, topic: str, key: str | None = None
) -> pa.Table:
    """Consume a written topic back (kafka_mon.py:17-29 consumer analog):
    parse every partition's JSONL messages, filter by message key (the
    consumer's `msg.key == tablename` dispatch — required when the topic
    carries several tables), unpack values into columns using the key's
    sidecar field order, sorted by keyid. Output: (part_id, msg_key,
    keyid, <business cols>, bizdate, ctime, spider) — all value columns
    as strings, per the str() write coercion."""
    tdir = os.path.join(root, topic)
    metas = {}
    for fn in os.listdir(tdir):
        if fn.startswith("_schema.") and fn.endswith(".json"):
            m = json.loads(open(os.path.join(tdir, fn), encoding="utf-8").read())
            metas[m["key"]] = m
    if key is None:
        if len(metas) != 1:
            raise ValueError(
                f"topic {topic!r} carries keys {sorted(metas)}; pass key="
            )
        key = next(iter(metas))
    fields = metas[key]["fields"]
    rows = []
    for pdir in sorted(os.listdir(tdir)):
        if not pdir.startswith("partition="):
            continue
        p = int(pdir.split("=")[1])
        for fn in sorted(os.listdir(os.path.join(tdir, pdir))):
            if not fn.endswith(".jsonl"):
                continue
            with open(os.path.join(tdir, pdir, fn), encoding="utf-8") as f:
                for line in f:
                    if not line.strip():
                        continue
                    msg = json.loads(line)
                    if key is not None and msg["key"] != key:
                        continue
                    rows.append((p, msg["key"], [msg["value"].get(c) for c in fields]))
    rows.sort(key=lambda r: r[2][0])  # keyid is fields[0]
    return pa.table(
        {
            "part_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "msg_key": pa.array([r[1] for r in rows], type=pa.string()),
            **{
                c: pa.array([r[2][j] for r in rows], type=pa.string())
                for j, c in enumerate(fields)
            },
        }
    )
