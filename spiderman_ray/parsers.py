"""Parser registry: callback tag -> row/request builders.

The single source of truth for parse semantics, shared by BOTH the oracle
simulator and the engine's parse stage — parity by construction. Mirrors the
reference's callback registry (``get_callback``,
SP/spiders/SPRedisSpider.py:17-22 / zhifang.py:55-61) and its two parsers:

- ``parse_list``  (zhifang.py:63-96): emit one list row per link row AND a
  detail request per link, keyed ``pkey = md5(detail_full_url)`` uppercase.
- ``parse_detail`` (zhifang.py:98-132): emit one detail row + one image
  request per <li>, ``px`` ordinal from DOM position (enumerate from 1),
  ``fkey`` carried from the request meta.

Ordering contract: a child's ``seq`` is ``parent_seq * 2**20 + child_idx`` so
that lexicographic (generation, seq) equals the reference's single-process
FIFO crawl order (children are appended to the Redis list tail in parse
order, SP/spiders/zhifang.py:96). 2**20 children per page × depth 3
(list->detail->image) fits int64; deeper graphs trigger the per-generation
dense re-rank (RERANK_THRESHOLD below; engine._maybe_rerank and the
oracle's wave renumbering apply the same rule).
"""

from __future__ import annotations

from spiderman_ray.functions.hashing import md5_upper
from spiderman_ray.functions.urls import canonical_host, canonicalize, get_file_type
from spiderman_ray.simweb import SimResponse

SEQ_SHIFT = 20
_MAX_CHILDREN = 1 << SEQ_SHIFT

#: When a generation's max seq reaches this, the frontier is densely
#: re-ranked (0..n-1 in seq order) before parsing — engine and oracle apply
#: the SAME deterministic rule, so deep crawl graphs never overflow the
#: parent_seq<<20|idx encoding. Re-ranking is order-preserving (monotonic),
#: so (generation, seq) comparisons are unaffected.
RERANK_THRESHOLD = 1 << 43  # == the child_seq parent bound: re-rank
# exactly when parsing this frontier would otherwise overflow


def child_seq(parent_seq: int, idx: int) -> int:
    if idx >= _MAX_CHILDREN or parent_seq >= RERANK_THRESHOLD:
        raise OverflowError("seq encoding exceeded: re-rank generation (see docstring)")
    return (parent_seq << SEQ_SHIFT) | idx


def make_request(url: str, callback: str, *, generation: int, seq: int,
                 fkey: str = "", pagenum: int = 0, px: int = 0, caption: str = "",
                 method: str = "GET", body: str = "", priority: int = 0) -> dict:
    # fingerprint covers the body for POST requests: two POSTs to the same
    # URL with different payloads are distinct work (scrapy's fingerprint
    # hashes method+url+body; GET requests keep the pure-URL md5 scheme)
    fp_src = canonicalize(url) + (f"|{body}" if body else "")
    return {
        "url": url,
        "method": method,
        "callback": callback,
        "body": body,
        "fkey": fkey,
        "pagenum": pagenum,
        "px": px,
        "caption": caption,
        "priority": priority,
        "generation": generation,
        "seq": seq,
        "host": canonical_host(url),
        "fp": md5_upper(fp_src),
    }


def parse_list(resp: SimResponse, req: dict) -> tuple[list[dict], list[dict]]:
    """-> (page rows, detail requests), both in DOM order."""
    rows, reqs = [], []
    gen, seq, pagenum = req["generation"], req["seq"], req["pagenum"]
    for i, (durl, rf) in enumerate(zip(resp.links, resp.rows)):
        pkey = md5_upper(durl)
        rows.append(
            {
                "title": rf["title"],
                "desc": rf["desc"],
                "location": rf["location"],
                "price": rf["price"],
                "detail_full_url": durl,
                "pkey": pkey,
                "pagenum": pagenum,
                "generation": gen,
                "seq": child_seq(seq, i),
            }
        )
        reqs.append(
            make_request(
                durl, "detail", generation=gen + 1, seq=child_seq(seq, i),
                fkey=pkey, pagenum=pagenum,
            )
        )
    return rows, reqs


def parse_detail(resp: SimResponse, req: dict) -> tuple[list[dict], list[dict]]:
    """-> ([detail row], image requests). A SHELL response (JS-rendered
    page fetched without the render path) has no fields: the parse yields
    nothing, like scrapy extracting from shell HTML."""
    f = resp.fields
    if not f:
        return [], []
    gen, seq = req["generation"], req["seq"]
    row = {
        "type1": f["type1"],
        "type2": f["type2"],
        "type3": f["type3"],
        "plot_name": f["plot_name"],
        "area": f["area"],
        "look_time": f["look_time"],
        "source_id": f["source_id"],
        "fkey": req["fkey"],
        "pagenum": req["pagenum"],
        "generation": gen,
        "seq": seq,
    }
    reqs = []
    for px, (iurl, caption) in enumerate(zip(resp.image_urls, resp.captions), 1):
        reqs.append(
            make_request(
                iurl, "image", generation=gen + 1, seq=child_seq(seq, px - 1),
                fkey=req["fkey"], pagenum=req["pagenum"], px=px, caption=caption,
            )
        )
    return [row], reqs


def make_image_row(req: dict, body: bytes) -> dict:
    """Decode fetched bytes -> the input_hint image row (+ lineage columns).
    ``image_id`` is md5-upper of the canonical image URL — the pkey scheme
    of SP/utils/base.py:38-40; ``fmt`` via the reference's extension
    whitelist (get_file_type(file_url, 'jpg'), zhifang.py:126)."""
    from spiderman_ray.functions.imaging import decode_image, phash64

    ext = get_file_type(req["url"], "jpg")
    fmt = "jpeg" if ext in ("jpg", "jpeg") else ext
    pixels = decode_image(body)
    h, w = pixels.shape[:2]
    return {
        "image_id": req["fp"],
        "bytes": body,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": req["caption"],
        "phash": phash64(pixels),
        "fkey": req["fkey"],
        "pagenum": req["pagenum"],
        "px": req["px"],
        "url": req["url"],
        "generation": req["generation"],
        "seq": req["seq"],
    }


def parse_search(resp: SimResponse, req: dict) -> tuple[list[dict], list[dict]]:
    """POST-search results: emit page rows + detail requests (list-shaped;
    FormRequest path, SP/spiders/SPRedisSpider.py:55-59)."""
    return parse_list(resp, req)


#: callback tag -> parser (the get_callback registry equivalent).
PARSERS = {"list": parse_list, "detail": parse_detail, "search": parse_search}
