"""Fixed Arrow schemas for every engine table.

The reference declares schemas dynamically per item class
(SP/items/zhifang_items.py:10-49) and stringly-types all sink columns
(SP/pipelines/pipelines_rdbm.py:84); we declare fixed pyarrow schemas up
front (SURVEY.md §1.2). The images table matches BASELINE.json input_hint
exactly: (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64).
"""

from __future__ import annotations

import pyarrow as pa

#: THE input/output table (BASELINE.json input_hint).
IMAGES = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

#: Frontier request rows — the ScheduledRequest equivalent
#: (SP/utils/base.py:18-25) plus explicit ordering/partitioning columns.
#: ``seq`` is the FIFO order anchor: children get
#: ``parent_seq * 2**20 + child_idx`` so lexicographic (generation, seq)
#: equals the reference's single-process FIFO order (SURVEY.md §4 Ordering).
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("method", pa.string()),
        ("callback", pa.string()),
        ("body", pa.string()),  # JSON string ('' for GET)
        ("fkey", pa.string()),
        ("pagenum", pa.int32()),
        ("px", pa.int32()),  # image ordinal within its detail page (0 otherwise)
        ("caption", pa.string()),  # carried from the detail page for image requests

        ("priority", pa.int32()),  # higher first within a generation
        ("generation", pa.int32()),
        ("seq", pa.int64()),
        ("host", pa.string()),
        ("fp", pa.string()),  # md5-upper fingerprint of canonical url
    ]
)

#: {spider}_list equivalent (SP/items/zhifang_items.py:10-24).
PAGES = pa.schema(
    [
        ("title", pa.string()),
        ("desc", pa.string()),
        ("location", pa.string()),
        ("price", pa.string()),
        ("detail_full_url", pa.string()),
        ("pkey", pa.string()),
        ("pagenum", pa.int32()),
        ("generation", pa.int32()),
        ("seq", pa.int64()),
    ]
)

#: {spider}_detail equivalent (SP/items/zhifang_items.py:26-43).
DETAILS = pa.schema(
    [
        ("type1", pa.string()),
        ("type2", pa.string()),
        ("type3", pa.string()),
        ("plot_name", pa.string()),
        ("area", pa.string()),
        ("look_time", pa.string()),
        ("source_id", pa.string()),
        ("fkey", pa.string()),
        ("pagenum", pa.int32()),
        ("generation", pa.int32()),
        ("seq", pa.int64()),
    ]
)

#: Image rows carry lineage beyond the input_hint columns; the reference's
#: status strings ('未下载'/'下载成功'/'下载失败', SP/items/items.py:17-27)
#: become dead-letter rows + lineage instead.
IMAGES_FULL = pa.schema(
    list(IMAGES)
    + [
        ("fkey", pa.string()),
        ("pagenum", pa.int32()),
        ("px", pa.int32()),
        ("url", pa.string()),
        ("generation", pa.int32()),
        ("seq", pa.int64()),
    ]
)

#: Quarantine for failed fetches / robots denials (no silent drops — the
#: reference drops poison rows, SP/pipelines/pipelines_rdbm.py:94-103).
DEAD_LETTERS = pa.schema(
    [
        ("url", pa.string()),
        ("reason", pa.string()),  # 'http_error' | 'robots' | 'dirty_url' | 'min_size'
        ("status_code", pa.int32()),
        ("attempts", pa.int32()),
        ("generation", pa.int32()),
        ("seq", pa.int64()),
        ("host", pa.string()),
        ("fp", pa.string()),
    ]
)

#: Simulated-web page table (FIXTURES.md §2).
SITE_GRAPH = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("kind", pa.string()),  # 'list' | 'detail'
        ("links", pa.list_(pa.string())),
        ("image_urls", pa.list_(pa.string())),
        ("fields", pa.string()),  # JSON payload
        ("status_code", pa.int32()),
        ("fail_attempts", pa.int32()),
        ("body_size", pa.int32()),
    ]
)

#: Seed table (FIXTURES.md §3).
SEEDS = pa.schema(
    [
        ("url", pa.string()),
        ("method", pa.string()),
        ("callback", pa.string()),
        ("body", pa.string()),
        ("meta_pagenum", pa.int32()),
        ("seq", pa.int64()),
    ]
)

#: Per-host politeness config (FIXTURES.md §4).
POLITENESS = pa.schema(
    [
        ("host", pa.string()),
        ("crawl_delay_ms", pa.int64()),
        ("robots_disallow", pa.list_(pa.string())),
        ("max_concurrency", pa.int32()),
    ]
)


def empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
