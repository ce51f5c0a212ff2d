"""Field cleaning / scalar text helpers (vectorized where hot).

Reference behavior reproduced:
- ``clean``: drop \\001 \\xa0 \\n \\t \\r, then strip (SP/utils/tool.py:17-27;
  applied per-field by SP/pipelines/pipelines_clean.py:14-29)
- ``coalesce`` (SP/utils/tool.py:30-43)
- base64 helpers (SP/utils/tool.py:56-73)
- ``deal_time_stamp`` epoch->date string (SP/utils/tool.py:76-85) — ours is
  UTC-pinned (the reference uses server localtime, which is not reproducible).
"""

from __future__ import annotations

import base64
import datetime as _dt

import pyarrow as pa
import pyarrow.compute as pc

#: SP/utils/tool.py:25 cleaning rule.
_CLEAN_CHARS = "\001\xa0\n\t\x0d"  # \x0d == \r ; \x0a == \n already listed
_CLEAN_TABLE = dict.fromkeys(ord(c) for c in "\001\xa0\n\t\x0d\x0a")


def clean(value) -> str:
    """Scalar clean, identical to the reference rule."""
    if value is None:
        return ""
    return str(value).translate(_CLEAN_TABLE).strip()


def clean_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized clean over an Arrow string column: remove each dirty char,
    then trim whitespace. Nulls become ''."""
    out = pc.fill_null(arr, "")
    for ch in "\001\xa0\n\t\r":
        out = pc.replace_substring(out, ch, "")
    return pc.utf8_trim_whitespace(out)


def clean_table(tbl: pa.Table, columns=None) -> pa.Table:
    """Apply ``clean_column`` to every (or the named) string column of a batch
    — the CleanPipeline equivalent as one map_batches-able projection."""
    names = columns or [
        f.name for f in tbl.schema if pa.types.is_string(f.type) or pa.types.is_large_string(f.type)
    ]
    for name in names:
        idx = tbl.schema.get_field_index(name)
        tbl = tbl.set_column(idx, name, clean_column(tbl.column(name)))
    return tbl


def coalesce(lts):
    """First non-empty value of a str/list (SP/utils/tool.py:30-43)."""
    lts = [lts] if not isinstance(lts, list) else lts
    for lt in lts:
        if lt:
            return lt[0] if isinstance(lt, list) else lt
    return ""


def encode_base64(st: str) -> str:
    return base64.b64encode(st.encode("utf-8")).decode("utf-8")


def decode_base64(st: str) -> str:
    return base64.b64decode(st.encode("utf-8")).decode("utf-8")


def deal_time_stamp(time_stamp, unit: str = "ms", format: str = "%Y-%m-%d") -> str:
    """Epoch (s/ms) -> formatted date string, UTC."""
    ts = int(int(time_stamp) / 1000) if unit == "ms" else int(time_stamp)
    return _dt.datetime.fromtimestamp(ts, _dt.timezone.utc).strftime(format)


def str2dict(block: str) -> dict:
    """'Header: value' text block -> dict (dev probe tool,
    test_html.py:15-24 equivalent)."""
    out = {}
    for line in block.strip().splitlines():
        if ":" in line:
            k, _, v = line.partition(":")
            out[k.strip()] = v.strip()
    return out
