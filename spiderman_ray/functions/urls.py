"""URL canonicalization, joining, checking and file-type extraction.

Reference behavior reproduced:
- ``url_check`` dirty-word filter (SP/utils/tool.py:116-134)
- ``get_file_type`` extension whitelist incl. data-URLs (SP/utils/tool.py:88-113)
- ``response.urljoin`` relative-link resolution (SP/spiders/zhifang.py:76,125)

Added (the reference keys everything by full-URL md5 and never needs a host;
our partitioner does): ``canonical_host`` / ``canonicalize``.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin as _urljoin, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: SP/utils/tool.py:122-126 — default dirty words.
DIRTY_WORDS = (
    "baidu.com", "javascript", "mailto:", "sougou.com",
    "@qq.com", "@gmail.com", "@163.com", "@yahoo.com", "@msn.com",
    "@hotmail.com", "@aol.com", "@ask.com",
    "@live.com", "@0355.net", "@163.net", "@263.net", "@3721.net", "@yeah",
)

#: SP/utils/tool.py:93-99 — allowed file extensions.
FILE_TYPES = frozenset([
    "pdf", "ppt", "xls", "xlsx", "doc", "docx", "txt", "wps",
    "bmp", "gif", "jpg", "jpeg", "png", "tif", "swf",
    "rar", "zip", "arj", "gz", "tar", "tar.gz", "7z",
    "rmvb", "mp4", "rm", "mpg", "mpeg", "avi", "mov", "wmv",
    "mid", "mp3", "wma", "wav",
])

_DATA_URL_RE = re.compile(r"data:image/(.*);")


def url_check(url: str, dirty_words=None) -> bool:
    """True iff the URL contains no dirty word (SP/utils/tool.py:116-134)."""
    words = list(DIRTY_WORDS)
    if dirty_words:
        words += [dirty_words] if isinstance(dirty_words, str) else list(dirty_words)
    return not any(w in url for w in words)


def url_check_mask(urls: pa.Array | list, dirty_words=None) -> pa.Array:
    """Vectorized ``url_check`` over an Arrow string column."""
    arr = urls if isinstance(urls, (pa.Array, pa.ChunkedArray)) else pa.array(urls)
    words = list(DIRTY_WORDS)
    if dirty_words:
        words += [dirty_words] if isinstance(dirty_words, str) else list(dirty_words)
    ok = pa.array(np.ones(len(arr), dtype=bool))
    for w in words:
        ok = pc.and_(ok, pc.invert(pc.match_substring(arr, w)))
    return ok


def get_file_type(*args: str) -> str:
    """File extension from URL or data-URL, whitelist-filtered
    (SP/utils/tool.py:88-113)."""
    for lt in args:
        file_type = lt.split(".")[-1]
        if "&" in file_type:
            file_type = file_type.split("&")[0]
        if "?" in file_type:
            file_type = file_type.split("?")[0]
        if file_type.strip().lower() in FILE_TYPES:
            return file_type
        m = _DATA_URL_RE.findall(lt)
        if m and m[0].strip().lower() in FILE_TYPES:
            return m[0]
    return ""


def urljoin(base: str, url: str) -> str:
    """Relative-link resolution, same as scrapy's ``response.urljoin``
    (both delegate to urllib; SP/spiders/zhifang.py:76)."""
    return _urljoin(base, url)


def canonicalize(url: str) -> str:
    """Canonical URL: lowercase scheme+host, drop default port and fragment,
    '/' path default. The fingerprint (md5-upper) is taken over this form."""
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if (scheme == "http" and netloc.endswith(":80")) or (
        scheme == "https" and netloc.endswith(":443")
    ):
        netloc = netloc.rsplit(":", 1)[0]
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def canonical_host(url: str) -> str:
    """Lowercased host without port — the politeness/partitioning key."""
    netloc = urlsplit(url).netloc.lower()
    return netloc.rsplit(":", 1)[0] if ":" in netloc else netloc


def hosts_of(urls) -> np.ndarray:
    """Vectorized canonical_host over a column of URLs."""
    return np.array([canonical_host(u) for u in urls], dtype=object)
