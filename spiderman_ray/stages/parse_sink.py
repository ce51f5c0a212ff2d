"""Parse + sink stage: wire batches -> table part files + next frontier.

One single-pass consumer per generation: each batch of fetch output is
dispatched through the parser registry (spiderman_ray.parsers — the same
functions the oracle runs), rows are appended to the per-generation table
partitions, and ONLY the child requests flow onward as the next frontier.
This avoids materializing image bytes dataset-wide: bytes stream
fetch -> parse -> parquet part and leave the pipeline.

Sink layout (resumable output):
    {out}/tables/{pages|details|images|dead_letters|crawl_order|hostmeta}/gen={g}/
Each part file is named by a content key (md5 of the row seqs), written
tmp+rename — a retried task overwrites its own part idempotently instead of
duplicating rows (the reference's bucket sink instead degrades to
row-at-a-time and DROPS poison rows, SP/pipelines/pipelines_rdbm.py:90-105;
we never drop).

ParseSink carries no per-worker state beyond the output dir, so it runs as
STATELESS TASKS (``make_parse_sink`` closure) — an actor pool here would
pay multi-second pool startup per generation for no amortization benefit
(measured: ~2-4s x generations of fixed cost). The actor-pool pattern
belongs to genuinely stateful stages (seen-set shards, decode_validate).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from spiderman_ray import schemas
from spiderman_ray.functions.hashing import md5_hex
from spiderman_ray.parsers import PARSERS, make_image_row
from spiderman_ray.simweb import SimResponse

HOSTMETA = pa.schema(
    [
        ("host", pa.string()),
        ("n_meta", pa.int64()),
        ("vts_ms", pa.float64()),
        ("generation", pa.int32()),
        ("fetch_key", pa.string()),
    ]
)

CRAWL_ORDER = pa.schema(
    [
        ("url", pa.string()),
        ("generation", pa.int32()),
        ("host", pa.string()),
        ("seq", pa.int64()),
        ("attempts", pa.int32()),
        ("vts_ms", pa.float64()),
        ("ua_idx", pa.int32()),
        ("cookie_idx", pa.int32()),  # CookiesPool pick (SPMiddleWare.py:88-103)
        ("proxy_idx", pa.int32()),  # rotating-proxy pick (SPMiddleWare.py:66-85)
        ("fp", pa.string()),  # enables exact patch anti-joins (POST bodies
        # are not reconstructible from the URL alone)
    ]
)


def write_part(
    rows: list[dict],
    schema: pa.Schema,
    table_dir: str,
    gen: int,
    key_fields: tuple[str, ...] = ("seq",),
) -> int:
    """Idempotent part write: content-keyed filename, tmp+rename. The key
    fields must uniquely identify the row set within (table, gen) — ``seq``
    for row tables; hostmeta rows need (url=fetch_key, n_meta) because all
    their seqs are 0."""
    if not rows:
        return 0
    os.makedirs(table_dir, exist_ok=True)
    key = md5_hex(
        ",".join("|".join(str(r.get(f, "")) for f in key_fields) for r in rows)
    )[:16]
    path = os.path.join(table_dir, f"part-g{gen}-{key}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
    os.replace(tmp, path)
    return len(rows)


def make_parse_sink(out_dir: str, parsers: dict | None = None,
                    dirty_words: tuple | None = None,
                    splash: dict | None = None):
    """Stateless map_batches fn: wire batch in, next-frontier batch out."""
    sink = ParseSink(out_dir, parsers, dirty_words, splash)

    def parse_sink(batch: pa.Table) -> pa.Table:
        return sink(batch)

    return parse_sink


class ParseSink:
    """Wire batch in, next-frontier batch out (see make_parse_sink)."""

    def __init__(self, out_dir: str, parsers: dict | None = None,
                 dirty_words: tuple | None = None,
                 splash: dict | None = None):
        self.out = out_dir
        self.parsers = parsers or PARSERS
        self.dirty_words = dirty_words
        # splash 'images: 0' (reference default): rendered pages do NOT
        # schedule image sub-requests (SPRedisSpider.py:49)
        self._splash_cbs = tuple(splash.get("callbacks", ())) if splash else ()
        self._suppress_images = bool(splash) and not splash.get("images", 0)
        if dirty_words:
            from spiderman_ray.functions.urls import DIRTY_WORDS

            self._blocklist = tuple(DIRTY_WORDS) + tuple(dirty_words)
        else:
            self._blocklist = ()

    def _dir(self, table: str, gen: int) -> str:
        return os.path.join(self.out, "tables", table, f"gen={gen}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        pages: list[dict] = []
        details: list[dict] = []
        images: list[dict] = []
        dead: list[dict] = []
        order: list[dict] = []
        meta: list[dict] = []
        children: list[dict] = []
        gen = 0
        for row in batch.to_pylist():
            kind = row["kind"]
            gen = row["generation"]
            if kind == "hostmeta":
                meta.append(
                    {
                        "host": row["host"],
                        "n_meta": row["n_meta"],
                        "vts_ms": row["vts_ms"],
                        "generation": row["generation"],
                        "fetch_key": row["url"],  # FetchGroup stamps the group key here
                    }
                )
                continue
            if kind == "dead":
                dead.append(
                    {
                        "url": row["url"],
                        "reason": row["reason"],
                        "status_code": row["status_code"],
                        "attempts": row["attempts"],
                        "generation": row["generation"],
                        "seq": row["seq"],
                        "host": row["host"],
                        "fp": row["fp"],
                    }
                )
                continue
            order.append(
                {
                    "url": row["url"],
                    "generation": row["generation"],
                    "host": row["host"],
                    "seq": row["seq"],
                    "attempts": row["attempts"],
                    "vts_ms": row["vts_ms"],
                    "ua_idx": row["ua_idx"],
                    "cookie_idx": row["cookie_idx"],
                    "proxy_idx": row["proxy_idx"],
                    "fp": row["fp"],
                }
            )
            cb = row["callback"]
            if cb == "image":
                images.append(make_image_row(row, row["body"]))
                continue
            resp = SimResponse(
                url=row["url"],
                kind=cb,
                links=list(row["links"] or []),
                rows=json.loads(row["rows_json"]) if row["rows_json"] else [],
                fields=json.loads(row["fields_json"]) if row["fields_json"] else {},
                image_urls=list(row["image_urls"] or []),
                captions=list(row["captions"] or []),
            )
            rows_out, reqs = self.parsers[cb](resp, row)
            if self._suppress_images and cb in self._splash_cbs:
                reqs = [r for r in reqs if r["callback"] != "image"]
            if cb in ("list", "search"):
                pages.extend(rows_out)
            else:
                details.extend(rows_out)
            if self.dirty_words:
                block = self._blocklist
                for r in reqs:
                    if not any(w in r["url"] for w in block):
                        children.append(r)
                    else:
                        dead.append(
                            {
                                "url": r["url"], "reason": "dirty_url",
                                "status_code": 0, "attempts": 0,
                                "generation": r["generation"], "seq": r["seq"],
                                "host": r["host"], "fp": r["fp"],
                            }
                        )
            else:
                children.extend(reqs)

        write_part(pages, schemas.PAGES, self._dir("pages", gen), gen)
        write_part(details, schemas.DETAILS, self._dir("details", gen), gen)
        write_part(images, schemas.IMAGES_FULL, self._dir("images", gen), gen)
        write_part(
            dead, schemas.DEAD_LETTERS, self._dir("dead_letters", gen), gen,
            key_fields=("seq", "fp", "reason"),  # seq alone collides across
            # request/child namespaces (dirty_url deads carry child seqs)
        )
        write_part(order, CRAWL_ORDER, self._dir("crawl_order", gen), gen)
        write_part(
            meta, HOSTMETA, self._dir("hostmeta", gen), gen,
            key_fields=("fetch_key", "host", "n_meta"),
        )
        return pa.Table.from_pylist(children, schema=schemas.FRONTIER)
