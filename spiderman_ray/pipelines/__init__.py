"""Data-processing pipelines over the TPC-H-ish testdata tables.

Each public function here backs one ``queries()`` entry in ``__ray_entry__``
(driver correctness gate): it takes ``sf_dir`` and returns a Ray Dataset /
Arrow table whose columns match the paired ``oracle_sql()`` statement.
These re-express the reference's query/data-processing surface (SURVEY.md
§2.5-2.6: anti-join patch jobs, grouped distinct, dedup, cleaning, keying)
plus the training-data operators (dedup families, similarity search, text
analysis) over generic tables.
"""

from __future__ import annotations


def pool_size(requested: int) -> int:
    """Cap an actor-pool size at cluster CPUs - 1: a pool that reserves every
    CPU starves the upstream read tasks and the pipeline deadlocks
    (observed: concurrency=4 on a num_cpus=4 session never completes)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, min(requested, cpus - 1))
