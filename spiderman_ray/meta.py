"""Crawler metadata table — easy_meta.py parity.

The reference introspects item classes into a ``meta`` table
(spider, tb, tb_comment, col_px, col, col_comment, author, ...;
easy_meta.py:23-34,59-104, README.md:267-281). Ours derives the same rows
from the declared Arrow schemas — schema-as-code instead of reflection.
"""

from __future__ import annotations

import pyarrow as pa

from spiderman_ray import schemas

META = pa.schema(
    [
        ("spider", pa.string()),
        ("tb", pa.string()),
        ("tb_comment", pa.string()),
        ("col_px", pa.int32()),
        ("col", pa.string()),
        ("col_type", pa.string()),
    ]
)

_TABLES = {
    "images": (schemas.IMAGES_FULL, "image rows (input_hint shape + lineage)"),
    "pages": (schemas.PAGES, "list-page rows ({spider}_list equivalent)"),
    "details": (schemas.DETAILS, "detail rows ({spider}_detail equivalent)"),
    "dead_letters": (schemas.DEAD_LETTERS, "failed/denied fetches (no silent drops)"),
    "frontier": (schemas.FRONTIER, "scheduled requests"),
}


def meta_table(spider: str = "zhifang_sim") -> pa.Table:
    rows = []
    for tb, (schema, comment) in _TABLES.items():
        for px, f in enumerate(schema, 1):
            rows.append(
                {
                    "spider": spider,
                    "tb": tb,
                    "tb_comment": comment,
                    "col_px": px,
                    "col": f.name,
                    "col_type": str(f.type),
                }
            )
    return pa.Table.from_pylist(rows, schema=META)
