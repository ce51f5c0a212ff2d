"""Streaming row monitor — the Kafka consumer analog (kafka_mon.py:17-29).

The reference tails the item stream from Kafka and applies a per-message
predicate (price regex < 8000). Here the monitor is a vectorized filter
stage over a crawled table (streaming through blocks, not materialized):
the same predicate surface, minus the broker.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from spiderman_ray.sources.table_io import read_dataset


def price_monitor(pages_uri: str, threshold: int = 5000) -> rd.Dataset:
    """Pages whose numeric price is below ``threshold`` — the
    kafka_mon predicate (price < 8000, kafka_mon.py:22-29) as a streaming
    filter over the pages table."""

    def flt(batch: pa.Table) -> pa.Table:
        price = pc.cast(batch["price"], pa.int64())
        keep = pc.less(price, pa.scalar(threshold))
        return batch.filter(keep).select(["pkey", "title", "price", "pagenum"])

    return read_dataset(pages_uri).map_batches(flt, batch_format="pyarrow")
