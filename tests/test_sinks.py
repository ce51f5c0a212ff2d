"""External-store sink analogs (sources/sinks.py): HBase cells, Mongo
documents, ES inverted index, HDFS '\\x01' text + Hive DDL, Doris hash
buckets — reference semantics (pipelines_hbase/mongodb/elasticsearch/
hdfs/doris.py) over local layouts, written distributed."""

import os

import numpy as np
import pyarrow as pa
import pytest

from spiderman_ray.sources import sinks

PIN = dict(spider="t_spider", bizdate="2026-08-18", ctime="2026-08-18 00:00:00")


def _tbl():
    return pa.table({"pkey": ["a", "b", "c"], "price": [10, 20, 30]})


def test_hbase_cells_layout_and_idempotent_reload(tmp_path):
    root = str(tmp_path)
    res = sinks.write_table_hbase(_tbl(), root, "t", **PIN)
    assert res["rows_written"] == 3
    cells = sinks.read_table_hbase(root, "t")
    # 3 rows x (2 business + 3 meta) cells, sorted by (keyid, qualifier)
    assert cells.num_rows == 15
    quals = set(cells["qualifier"].to_pylist())
    assert quals == {"cf:pkey", "cf:price", "cf:bizdate", "cf:ctime", "cf:spider"}
    keys = cells["keyid"].to_pylist()
    assert keys == sorted(keys)
    assert all(k.startswith("2026-08-18_") for k in keys)
    # values are str()'d (the universal sink coercion)
    prices = cells.filter(
        pa.compute.equal(cells["qualifier"], "cf:price")
    )["value"].to_pylist()
    assert sorted(prices) == ["10", "20", "30"]
    # reload replaces (wipe-and-rewrite), never duplicates
    sinks.write_table_hbase(_tbl(), root, "t", **PIN)
    assert sinks.read_table_hbase(root, "t").num_rows == 15


def test_mongo_docs_poison_duplicate_id_dropped(tmp_path):
    root = str(tmp_path)
    # two identical business rows -> identical _id -> the duplicate is
    # poison (insert_many DuplicateKeyError analog) and dropped
    dup = pa.table({"pkey": ["a", "a", "b"], "price": [1, 1, 2]})
    res = sinks.write_table_mongo(dup, root, "t", **PIN)
    assert res["rows_written"] == 2
    back = sinks.read_table_mongo(root, "t")
    assert back.num_rows == 2
    assert back.column_names == [
        "_id", "pkey", "price", "bizdate", "ctime", "spider"
    ]
    assert back["_id"].to_pylist() == sorted(back["_id"].to_pylist())
    assert set(back["price"].to_pylist()) == {"1", "2"}


def test_hdfs_lines_strip_and_ddl(tmp_path):
    root = str(tmp_path)
    # values containing the delimiter and newlines are stripped
    # (pipelines_hdfs.py:99); the keyid hashes the UNSTRIPPED values
    tbl = pa.table({"pkey": ["x\x01y", "line\nbreak"], "price": [1, 2]})
    res = sinks.write_table_hdfs(tbl, root, "t", **PIN)
    assert res["rows_written"] == 2
    assert res["ddl"] == (
        "create table if not exists t"
        "(keyid string,pkey string,price string,"
        "bizdate string,ctime string,spider string)"
    )
    back = sinks.read_table_hdfs(root, "t")
    assert back.num_rows == 2
    assert set(back["pkey"].to_pylist()) == {"xy", "linebreak"}
    assert back.column_names == [
        "keyid", "pkey", "price", "bizdate", "ctime", "spider"
    ]
    # the raw file really is \x01-delimited, one dir per table
    txts = [f for f in os.listdir(os.path.join(root, "t")) if f.endswith(".txt")]
    raw = open(os.path.join(root, "t", txts[0])).read()
    assert "\x01" in raw


def test_doris_buckets_placement_and_ddl(tmp_path):
    root = str(tmp_path)
    tbl = pa.table({"pkey": [f"k{i}" for i in range(40)], "price": list(range(40))})
    res = sinks.write_table_doris(tbl, root, "t", buckets=2, **PIN)
    assert res["rows_written"] == 40
    assert "DISTRIBUTED BY HASH(`keyid`) BUCKETS 2" in res["ddl"]
    back = sinks.read_table_doris(root, "t")
    assert back.num_rows == 40
    # every row sits in the bucket its keyid hashes to
    keyids = back["keyid"].to_pylist()
    want = sinks.doris_bucket_of(keyids, 2)
    assert back["bucket"].to_pylist() == want.tolist()
    assert len(set(want.tolist())) == 2  # both buckets populated
    # single-bucket read prunes to that bucket only
    b0 = sinks.read_table_doris(root, "t", bucket=0)
    assert set(b0["bucket"].to_pylist()) == {0}
    assert b0.num_rows == int((want == 0).sum())


def test_doris_bucket_hash_matches_md5_prefix():
    # doris_bucket_of is pinned to int(md5(keyid)[:8], 16) % buckets —
    # the SQL-expressible contract the driver oracle relies on
    import hashlib

    keys = [f"2026-08-18_{i:032X}" for i in range(20)]
    got = sinks.doris_bucket_of(keys, 4)
    want = [int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % 4 for k in keys]
    assert got.tolist() == want


def test_es_index_build_and_search(ray_session, tmp_path):
    import ray.data as rd

    root = str(tmp_path)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "fast join slow join",
                    "slow scan",
                    "join slow slow slow",
                    "",
                ],
            }
        )
    )
    res = sinks.write_index_es(docs, root, "idx")
    assert res["postings"] > 0
    # AND semantics: only docs containing BOTH terms; score = sum tf
    hits = sinks.search_index_es(root, "idx", ["join", "slow"]).to_pandas()
    assert hits["doc_id"].tolist() == ["3", "1"]  # scores 4 then 3
    assert hits["score"].tolist() == [4, 3]
    # unknown term -> empty result (shard exists but term absent)
    none = sinks.search_index_es(root, "idx", ["join", "zzz_absent"]).to_pandas()
    assert len(none) == 0
    # docs store is readable parquet with the source schema
    ddir = os.path.join(root, "idx", "docs")
    import pyarrow.parquet as pq

    parts = [f for f in os.listdir(ddir) if f.endswith(".parquet")]
    t = pa.concat_tables(
        [pq.read_table(os.path.join(ddir, p)) for p in parts]
    )
    assert sorted(t["doc_id"].to_pylist()) == [1, 2, 3, 4]


def test_sinks_distributed_dataset_write(ray_session, tmp_path):
    """Dataset inputs write one part per block via map_batches (no
    driver funnel); the read-back equals the pa.Table inline path."""
    import ray.data as rd

    tbl = pa.table({"pkey": [f"k{i}" for i in range(100)], "price": list(range(100))})
    ds = rd.from_arrow(tbl).repartition(4)
    root_ds, root_tb = str(tmp_path / "ds"), str(tmp_path / "tb")
    n = sinks.write_table_hbase(ds, root_ds, "t", **PIN)["rows_written"]
    assert n == 100
    sinks.write_table_hbase(tbl, root_tb, "t", **PIN)
    a = sinks.read_table_hbase(root_ds, "t")
    b = sinks.read_table_hbase(root_tb, "t")
    assert a.equals(b)
    # multiple parts really were written (one per block)
    parts = [
        f for f in os.listdir(os.path.join(root_ds, "t")) if f.endswith(".parquet")
    ]
    assert len(parts) > 1


def test_cli_export_to_sink_analogs(tmp_path, ray_session):
    """`cli export --fmt hbase|es` pushes a crawl store's table through the
    sink analogs exactly like the reference's pipeline toggles; es validates
    --id-col/--text-col against the schema up-front."""
    import json
    import subprocess
    import sys

    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.simweb import SimParams

    out = str(tmp_path / "run")
    eng = CrawlEngine(SimParams.for_scale("t1"), out_dir=out)
    eng.run()
    eng._pool.shutdown()

    def run_cli(*extra):
        return subprocess.run(
            [sys.executable, "-m", "spiderman_ray.cli", "export",
             "--out", out, "--table", "pages", *extra],
            capture_output=True, text=True,
        )

    hdir = str(tmp_path / "hb")
    r = run_cli("--fmt", "hbase", "--dest", hdir)
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["rows_written"] == 20
    cells = sinks.read_table_hbase(hdir, "pages")
    quals = {q.split(":", 1)[1] for q in set(cells["qualifier"].to_pylist())}
    assert quals >= {"title", "price", "pkey"}

    edir = str(tmp_path / "es")
    r = run_cli("--fmt", "es", "--dest", edir,
                "--id-col", "pkey", "--text-col", "title")
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["postings"] > 0 and info["index"] == "pages"

    # up-front validation: default --id-col url is not a pages column
    r = run_cli("--fmt", "es", "--dest", str(tmp_path / "es2"),
                "--text-col", "title")
    assert r.returncode == 2
    err = json.loads(r.stdout.strip().splitlines()[-1])
    assert "id-col" in err["error"] and "pkey" in err["columns"]


def test_kafka_topic_keyed_layout_and_consumer_dispatch(tmp_path):
    """Kafka analog: one topic carries MANY tables dispatched by message
    key (pipelines_kafka.py key=item.tablename); a reload replaces only
    its own key's messages; partition placement is the deterministic
    doris_bucket_of hash of the content keyid."""
    root = str(tmp_path)
    res = sinks.write_topic_kafka(_tbl(), root, "t_spider", "pages",
                                  partitions=4, **PIN)
    assert res["rows_written"] == 3 and res["partitions"] == 4
    other = pa.table({"ikey": ["x", "y"], "url": ["u1", "u2"]})
    sinks.write_topic_kafka(other, root, "t_spider", "images",
                            partitions=4, **PIN)

    pages = sinks.read_topic_kafka(root, "t_spider", key="pages")
    assert pages.num_rows == 3
    assert pages.column_names == [
        "part_id", "msg_key", "keyid", "pkey", "price",
        "bizdate", "ctime", "spider",
    ]
    assert set(pages["msg_key"].to_pylist()) == {"pages"}
    assert pages["price"].to_pylist() == sorted(
        ["10", "20", "30"],
        key=lambda v: pages["price"].to_pylist().index(v),
    )  # str()'d values
    keyids = pages["keyid"].to_pylist()
    assert keyids == sorted(keyids) and all(
        k.startswith("2026-08-18_") for k in keyids
    )
    # placement matches the SQL-expressible hash
    want_part = sinks.doris_bucket_of(keyids, 4)
    assert pages["part_id"].to_pylist() == list(want_part)

    imgs = sinks.read_topic_kafka(root, "t_spider", key="images")
    assert imgs.num_rows == 2 and imgs.column_names[3] == "ikey"

    # ambiguous read without a key names both
    with pytest.raises(ValueError, match="images.*pages|pages.*images"):
        sinks.read_topic_kafka(root, "t_spider")

    # reload of pages replaces pages only; images messages survive
    sinks.write_topic_kafka(_tbl(), root, "t_spider", "pages",
                            partitions=4, **PIN)
    assert sinks.read_topic_kafka(root, "t_spider", key="pages").num_rows == 3
    assert sinks.read_topic_kafka(root, "t_spider", key="images").num_rows == 2
