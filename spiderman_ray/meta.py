"""Crawler metadata table — easy_meta.py parity.

The reference introspects item classes and spider-file docblocks into a
``meta`` table with columns (spider, spider_comment, tb, tb_comment, col_px,
col, col_comment, author, addtime, insertime; easy_meta.py:23-34,59-104,
README.md:267-281). Ours derives the same rows from the declared Arrow
schemas — schema-as-code instead of reflection. ``insertime`` (a wall-clock
insert stamp in the reference) is kept as a column but emitted empty so the
table stays deterministic; a sink wrapper can stamp it at write time.
"""

from __future__ import annotations

import pyarrow as pa

from spiderman_ray import schemas

META = pa.schema(
    [
        ("spider", pa.string()),
        ("spider_comment", pa.string()),
        ("tb", pa.string()),
        ("tb_comment", pa.string()),
        ("col_px", pa.int32()),
        ("col", pa.string()),
        ("col_comment", pa.string()),
        ("col_type", pa.string()),
        ("author", pa.string()),
        ("addtime", pa.string()),
        ("insertime", pa.string()),
    ]
)

_TABLES = {
    "images": (schemas.IMAGES_FULL, "image rows (input_hint shape + lineage)"),
    "pages": (schemas.PAGES, "list-page rows ({spider}_list equivalent)"),
    "details": (schemas.DETAILS, "detail rows ({spider}_detail equivalent)"),
    "dead_letters": (schemas.DEAD_LETTERS, "failed/denied fetches (no silent drops)"),
    "frontier": (schemas.FRONTIER, "scheduled requests"),
}

#: per-column comments (the reference reads these from item-field ``comment``
#: kwargs, zhifang_items.py; ours live beside the schemas)
_COL_COMMENTS = {
    "image_id": "md5-upper pkey of the canonical image url",
    "bytes": "encoded image payload",
    "w": "width px",
    "h": "height px",
    "fmt": "jpeg|png",
    "caption": "caption bound to the image identity",
    "phash": "64-bit perceptual hash",
    "fkey": "foreign key to the parent detail row",
    "pagenum": "source list page number",
    "px": "ordinal within the parent page",
    "url": "fetched url",
    "generation": "BFS wave the row was produced in",
    "seq": "FIFO order anchor within the generation",
    "title": "listing title",
    "desc": "listing description",
    "location": "listing district",
    "price": "listing price (string, reference keeps it stringly)",
    "detail_full_url": "absolute detail url",
    "pkey": "md5-upper row key",
    "type1": "detail attribute 1",
    "type2": "detail attribute 2",
    "type3": "detail attribute 3",
    "plot_name": "plot display name",
    "area": "area with unit suffix",
    "look_time": "listing date",
    "source_id": "source system id",
    "reason": "http_error|robots|dirty_url|min_size",
    "status_code": "last http status",
    "attempts": "fetch attempts consumed",
    "host": "canonical host (politeness partition key)",
    "fp": "md5-upper fingerprint of canonical url+body",
    "method": "GET|POST",
    "callback": "parser name",
    "body": "POST body json ('' for GET)",
    "priority": "scrapy-redis priority (higher first)",
}


def meta_table(
    spider: str = "zhifang_sim",
    spider_comment: str = "simulated zhifang crawl (list->detail->image)",
    author: str = "spiderman_ray",
    addtime: str = "2026-08-17",
) -> pa.Table:
    rows = []
    for tb, (schema, comment) in _TABLES.items():
        for px, f in enumerate(schema, 1):
            rows.append(
                {
                    "spider": spider,
                    "spider_comment": spider_comment,
                    "tb": tb,
                    "tb_comment": comment,
                    "col_px": px,
                    "col": f.name,
                    "col_comment": _COL_COMMENTS.get(f.name, ""),
                    "col_type": str(f.type),
                    "author": author,
                    "addtime": addtime,
                    "insertime": "",
                }
            )
    return pa.Table.from_pylist(rows, schema=META)
