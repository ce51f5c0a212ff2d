"""Regenerate tools/meta_oracle_pin.sql — the frozen driver-gate pin for the
``meta_table`` query.

meta_table() is deterministic pure Python (schema-as-code, meta.py), so its
independent oracle is a FROZEN snapshot: the pin only changes when a human
reruns this script after a deliberate meta change. Accidental drift (schema
edit without updating the pin) fails the driver's rows/schema/hash compare.

    python tools/freeze_meta_oracle.py
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = (
    "-- Frozen snapshot pin of spiderman_ray.meta.meta_table() (easy_meta.py parity).\n"
    "-- Regenerate with tools/freeze_meta_oracle.py after any DELIBERATE meta change;\n"
    "-- an accidental schema/comment drift fails the driver hash gate.\n"
)

TYPES = {
    "spider": "VARCHAR", "spider_comment": "VARCHAR", "tb": "VARCHAR",
    "tb_comment": "VARCHAR", "col_px": "BIGINT", "col": "VARCHAR",
    "col_comment": "VARCHAR", "col_type": "VARCHAR", "author": "VARCHAR",
    "addtime": "VARCHAR", "insertime": "VARCHAR",
}


def main() -> None:
    from spiderman_ray.meta import meta_table

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sql = m._values_sql(meta_table().to_pylist(), TYPES)
    out = os.path.join(os.path.dirname(__file__), "meta_oracle_pin.sql")
    with open(out, "w") as f:
        f.write(HEADER + sql + "\n")
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
