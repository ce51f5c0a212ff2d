"""Small-file compaction for the partitioned crawl store.

At 10^10-URL scale every generation writes one content-keyed part per
parse-sink task (stages/parse_sink.py:write_part) — a long crawl leaves
thousands of small parquet files per ``tables/{table}/gen={g}``
partition, and small files are the classic death of a distributed scan
(per-file open + footer read dominates). ``compact_table`` rewrites each
multi-part partition into ONE content-keyed part:

- **partition-parallel, no shuffle**: the partition list is a Dataset and
  each Ray task compacts one ``gen=`` directory by streaming its parts'
  row groups through a single ParquetWriter (never more than one row
  group in memory — partitions may be much larger than a worker heap);
- **idempotent**: the output name is keyed by the sorted input part
  names, and single-part partitions are skipped, so re-running is a
  no-op;
- **atomic with crash repair**: the new part lands in ``gen={g}.compact``,
  then ``gen={g}`` -> ``gen={g}.old`` -> swap -> delete. A crash between
  the renames leaves a state ``repair_partitions`` rolls forward (swap
  dir present) or back (only ``.old`` present) — rows are never lost or
  doubled, mirroring the seen-snapshot checkpoint discipline
  (engine.py). ``compact_table`` always repairs before compacting.
- **verified**: the compacted row count must equal the sum of the input
  parts' counts (parquet metadata, no data read) or the partition is
  left untouched.

The resume/patch readers glob ``gen=*`` directories (engine.py:
read_table_all_gens) and manifests pin row COUNTS, not file names, so a
compacted store stays resumable and lineage-consistent.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from spiderman_ray.functions.hashing import md5_hex


def _parts(d: str) -> list[str]:
    return sorted(
        f for f in os.listdir(d)
        if f.endswith(".parquet") and not f.endswith(".tmp")
    ) if os.path.isdir(d) else []


def repair_partitions(table_dir: str) -> list[str]:
    """Roll interrupted compactions forward/back. Returns repaired dirs."""
    repaired = []
    if not os.path.isdir(table_dir):
        return repaired
    for name in sorted(os.listdir(table_dir)):
        base = os.path.join(table_dir, name)
        if not os.path.isdir(base):  # an earlier branch already resolved it
            continue
        if name.endswith(".compact"):
            live = base[: -len(".compact")]
            old = live + ".old"
            if _parts(base) and not os.path.isdir(live):
                os.replace(base, live)  # stage complete, live moved aside:
                # roll the swap forward
            elif os.path.isdir(base):
                shutil.rmtree(base)  # live dir intact (or stage empty):
                # the live/backup copy is authoritative
            if os.path.isdir(old):
                if os.path.isdir(live):
                    shutil.rmtree(old)
                else:
                    os.replace(old, live)  # stage was unusable: roll back
            repaired.append(name)
        elif name.endswith(".old"):
            live = base[: -len(".old")]
            if os.path.isdir(live):
                shutil.rmtree(base)  # swap completed; drop the backup
            else:
                os.replace(base, live)  # crashed after moving live aside
            repaired.append(name)
    return repaired


def compact_partition(gen_dir: str, row_group_rows: int = 64 * 1024) -> dict:
    """Compact one ``gen=`` directory to a single content-keyed part.
    Returns {dir, parts_in, rows, action}."""
    parts = _parts(gen_dir)
    if len(parts) <= 1:
        return {"dir": gen_dir, "parts_in": len(parts), "rows": -1,
                "action": "skip"}
    want_rows = sum(
        pq.read_metadata(os.path.join(gen_dir, f)).num_rows for f in parts
    )
    key = md5_hex(",".join(parts))[:16]
    gen_tag = os.path.basename(gen_dir).split("=")[1]
    stage = gen_dir + ".compact"
    if os.path.isdir(stage):
        shutil.rmtree(stage)
    os.makedirs(stage)
    out = os.path.join(stage, f"part-g{gen_tag}-compact-{key}.parquet")
    tmp = out + ".tmp"
    schema = pq.read_schema(os.path.join(gen_dir, parts[0]))
    n = 0
    with pq.ParquetWriter(tmp, schema) as w:
        for f in parts:
            pf = pq.ParquetFile(os.path.join(gen_dir, f))
            for rg in range(pf.num_row_groups):
                t = pf.read_row_group(rg).cast(schema)
                w.write_table(t, row_group_size=row_group_rows)
                n += t.num_rows
    os.replace(tmp, out)
    if n != want_rows:  # verification failed: leave the live dir alone
        shutil.rmtree(stage)
        return {"dir": gen_dir, "parts_in": len(parts), "rows": n,
                "action": "abort_count_mismatch"}
    old = gen_dir + ".old"
    os.replace(gen_dir, old)
    os.replace(stage, gen_dir)
    shutil.rmtree(old)
    return {"dir": gen_dir, "parts_in": len(parts), "rows": n,
            "action": "compacted"}


def gc_seen_snapshots(out_dir: str, keep: int = 1) -> dict:
    """Manifest-aware GC of per-generation seen-set snapshots.

    A long crawl leaves one ``seen/gen-{g}/`` snapshot (num_shards npz
    files) per generation, but resume only ever restores the LAST complete
    generation's snapshot (engine.run: ``pool.restore(seen/gen-{start_gen
    - 1})``) — everything older is dead weight: O(generations x shards)
    files holding O(generations) copies of the seen set. Keeps the
    newest ``keep`` complete generations' snapshots (and the pipelined
    mode's ``final``), deletes the rest.

    Crash-safe: a doomed snapshot is renamed to ``.gc-tmp`` FIRST (atomic
    — the resume/patch walks match ``gen-{g}`` exactly, so a half-deleted
    dir can never be restored from), then removed; stale ``.gc-tmp`` dirs
    from an interrupted run are swept on the next call.

    Trade (documented): cuckoo-mode ``patch`` of a generation OLDER than
    the kept snapshots can no longer rebuild that generation's exact
    filter bits — it falls back to its empty-pool path, which re-offers
    residuals with identical accept/reject semantics (patch.py:112-131).
    Kill-resume is unaffected: the resume point's snapshot is always kept
    (tests/test_compact.py)."""
    seen_dir = os.path.join(out_dir, "seen")
    if not os.path.isdir(seen_dir):
        return {"deleted": [], "kept": []}
    # last complete generation, from the manifests (the engine's rule)
    import json

    g_last = -1
    mdir = os.path.join(out_dir, "manifests")
    for g in range(0, 10_000):
        p = os.path.join(mdir, f"gen-{g}.json")
        if not os.path.exists(p):
            break
        with open(p) as f:
            if json.load(f).get("complete"):
                g_last = g
            else:
                break
    keep_names = {f"gen-{g}" for g in range(max(0, g_last - keep + 1), g_last + 1)}
    keep_names.add("final")
    deleted, kept = [], []
    # pass 1: finish any interrupted earlier GC (stale .gc-tmp dirs), so
    # pass 2's renames never collide with leftovers
    for name in sorted(os.listdir(seen_dir)):
        if name.endswith(".gc-tmp"):
            shutil.rmtree(os.path.join(seen_dir, name))
            deleted.append(name)
    for name in sorted(os.listdir(seen_dir)):
        path = os.path.join(seen_dir, name)
        if name in keep_names or not name.startswith("gen-"):
            kept.append(name)
            continue
        try:
            g = int(name.split("-", 1)[1])
        except ValueError:
            kept.append(name)
            continue
        if g > g_last:
            kept.append(name)  # partial later generation: cleanup's job
            continue
        tmp = path + ".gc-tmp"
        os.replace(path, tmp)
        shutil.rmtree(tmp)
        deleted.append(name)
    return {"deleted": deleted, "kept": kept, "last_complete": g_last}


def compact_table(out_dir: str, table: str) -> list[dict]:
    """Repair, then compact every multi-part partition of a table —
    partition-parallel Ray tasks over the partition list (each task
    touches only its own directory; no shuffle, no driver data)."""
    import ray.data as rd

    table_dir = os.path.join(out_dir, "tables", table)
    repair_partitions(table_dir)
    gens = sorted(
        os.path.join(table_dir, d)
        for d in os.listdir(table_dir)
        if d.startswith("gen=") and os.path.isdir(os.path.join(table_dir, d))
    ) if os.path.isdir(table_dir) else []
    if not gens:
        return []
    res = rd.from_items([{"dir": d} for d in gens]).map(
        lambda row: compact_partition(row["dir"])
    )
    return sorted(res.take_all(), key=lambda r: r["dir"])  # O(#partitions)
