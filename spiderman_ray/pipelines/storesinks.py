"""Driver-gate queries for the external-store sink analogs.

Each query loads a TPC-H-ish table from sf_dir, pushes it through one of
the reference sink analogs (sources/sinks.py — HBase cells, Mongo
documents, ES inverted index, HDFS '\\x01' text, Doris hash buckets)
into a throwaway /tmp store, then reads the store BACK and returns what
a downstream consumer of that store would see. The SQL oracles
reconstruct the same view straight from the source table (md5 keyids,
str() coercions, cell unpivots, bucket hashes are all SQL-expressible
by construction), so the driver hash-verifies the full
write->layout->read path, not just the write call.

bizdate/ctime are wall-clock in the reference (SP/utils/base.py,
pipelines_*.py); here they are PINNED parameters so the gate is
deterministic."""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from spiderman_ray.functions.hashing import md5_hex
from spiderman_ray.sources import sinks

#: pinned operational values (the reference stamps wall-clock)
BIZDATE = "2026-01-01"
CTIME = "2026-01-01 00:00:00"
SPIDER = "zhifang_sim"

#: the ES demo query: AND of three mid-frequency corpus terms
ES_TERMS = ["join", "slow", "vector"]
ES_TOPK = 50


def _root(sf_dir: str) -> str:
    """Per-sf throwaway store root; table dirs inside are wiped by each
    write (loads are whole-table, see sinks._fresh_dir)."""
    return os.path.join("/tmp", f"spiderman_sinks_{md5_hex(sf_dir)[:8]}")


def hbase_cells(sf_dir: str) -> pa.Table:
    """Customer rows through the HBase analog: one (keyid, 'cf:'+col,
    value) cell per column + the three meta cells, read back sorted."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
    )
    root = _root(sf_dir)
    sinks.write_table_hbase(
        ds, root, "customer_sink", spider=SPIDER, bizdate=BIZDATE, ctime=CTIME
    )
    return sinks.read_table_hbase(root, "customer_sink")


def mongo_docs(sf_dir: str) -> pa.Table:
    """Orders rows through the Mongo analog: _id = content keyid,
    business values str()'d (timestamps included — the coercion is part
    of the contract), read back sorted by _id."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    root = _root(sf_dir)
    sinks.write_table_mongo(
        ds, root, "orders_sink", spider=SPIDER, bizdate=BIZDATE, ctime=CTIME
    )
    return sinks.read_table_mongo(root, "orders_sink")


def hdfs_lines(sf_dir: str) -> pa.Table:
    """Nation rows through the HDFS+Hive analog: '\\x01'-delimited text
    parts + generated DDL, parsed back via the DDL's column order."""
    ds = rd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    root = _root(sf_dir)
    sinks.write_table_hdfs(
        ds, root, "nation_sink", spider=SPIDER, bizdate=BIZDATE, ctime=CTIME
    )
    return sinks.read_table_hdfs(root, "nation_sink")


def doris_buckets(sf_dir: str) -> pa.Table:
    """Orders rows through the Doris analog (DISTRIBUTED BY HASH(keyid)
    BUCKETS 4): per-bucket row counts read from the bucket dirs'
    parquet footers — verifies the PLACEMENT, not just the rows."""
    import pyarrow.parquet as pq

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )
    root = _root(sf_dir)
    res = sinks.write_table_doris(
        ds, root, "orders_doris", buckets=4, spider=SPIDER, bizdate=BIZDATE, ctime=CTIME
    )
    counts = []
    for b in range(4):
        bdir = os.path.join(res["dir"], f"bucket={b}")
        n = sum(
            pq.read_metadata(os.path.join(bdir, f)).num_rows
            for f in os.listdir(bdir)
            if f.endswith(".parquet")
        )
        counts.append(n)
    return pa.table(
        {
            "bucket": pa.array(range(4), type=pa.int64()),
            "n": pa.array(counts, type=pa.int64()),
        }
    )


def es_search(sf_dir: str) -> rd.Dataset:
    """Documents through the ES analog: build the term-sharded inverted
    index, then run the AND-of-terms search (shard-pruned read, doc-
    sharded AND+score, global top-k). Returns (doc_id, score)."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    root = _root(sf_dir)
    sinks.write_index_es(docs, root, "documents_idx")
    return sinks.search_index_es(root, "documents_idx", ES_TERMS, k=ES_TOPK)


#: the Kafka demo topic: partition count for the deterministic placement
KAFKA_PARTITIONS = 4


def kafka_topic(sf_dir: str) -> pa.Table:
    """Supplier rows through the Kafka analog: one keyed JSON message per
    row on topic 'zhifang_sim' (key = tablename, value = str()'d fields +
    keyid + meta), hash-partitioned by keyid into 4 partitions, consumed
    back key-filtered and sorted by keyid. Verifies write -> keyed topic
    layout -> consumer parse end-to-end; placement (part_id) uses the
    SQL-expressible doris_bucket_of hash so the oracle checks WHERE each
    message landed, not just its contents."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    root = _root(sf_dir)
    sinks.write_topic_kafka(
        ds, root, SPIDER, tablename="supplier_kafka",
        partitions=KAFKA_PARTITIONS, spider=SPIDER, bizdate=BIZDATE, ctime=CTIME,
    )
    return sinks.read_topic_kafka(root, SPIDER, key="supplier_kafka")
