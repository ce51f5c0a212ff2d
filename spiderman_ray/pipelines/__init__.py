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


#: SPIDERMAN_SHUFFLE values -> ray.data ShuffleStrategy names. The repo's
#: wide exchanges default to Ray's SORT_SHUFFLE_PULL_BASED: the round-3
#: HASH_SHUFFLE experiment HUNG single-node (aggregator actors deadlock
#: against map tasks under a tight CPU quota — BASELINE.md "Hash-shuffle
#: experiment"). On a real multi-node cluster hash shuffle's aggregator
#: model may win; flip it there with the env knob, no code edits.
_SHUFFLE_NAMES = {
    "sort": "sort_shuffle_pull_based",
    "sort_push": "sort_shuffle_push_based",
    "hash": "hash_shuffle",
}


def configure_shuffle(choice: str | None = None) -> str:
    """Pin the session's Ray Data shuffle strategy. ``choice`` (or the
    SPIDERMAN_SHUFFLE env var) is one of 'sort' (default), 'sort_push',
    'hash'. Called by the session OWNERS (bench.py, the CLI, tests) —
    library code never mutates the context itself. Returns the applied
    strategy name."""
    import os

    from ray.data.context import DataContext, ShuffleStrategy

    choice = choice or os.environ.get("SPIDERMAN_SHUFFLE", "sort")
    if choice not in _SHUFFLE_NAMES:
        raise ValueError(
            f"SPIDERMAN_SHUFFLE={choice!r}: expected one of {sorted(_SHUFFLE_NAMES)}"
        )
    strategy = ShuffleStrategy(_SHUFFLE_NAMES[choice])
    DataContext.get_current().shuffle_strategy = strategy
    return strategy.value


#: SPIDERMAN_JOIN mirror of the shuffle knob (round-4 verdict ask #7):
#: 'bucketed' (default) keeps the hand-rolled union-mark-merge / fp-shard
#: exchanges that are safe under a tight single-node CPU quota (the
#: BASELINE.md hash-shuffle/native-join deadlock experiments); 'native'
#: switches the join SITES (text.anti_join_ids, vectors.
#: knn_label_agreement) to ray.data Dataset.join so a real multi-node
#: cluster can A/B the aggregator-actor model without code edits.
_JOIN_CHOICES = ("bucketed", "native")


def join_strategy(choice: str | None = None) -> str:
    """Resolve the join-path knob: ``choice`` (or the SPIDERMAN_JOIN env
    var) is 'bucketed' (default) or 'native'. Read at CALL TIME by the
    join sites — pure code-path selection, no DataContext mutation, so
    library code may call it freely."""
    import os

    choice = choice or os.environ.get("SPIDERMAN_JOIN", "bucketed")
    if choice not in _JOIN_CHOICES:
        raise ValueError(
            f"SPIDERMAN_JOIN={choice!r}: expected one of {sorted(_JOIN_CHOICES)}"
        )
    return choice
