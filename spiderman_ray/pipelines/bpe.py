"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) over the
``documents`` corpus — the capability a training-data user runs right
before tokenizing: learn the merge table itself.

The scale shape is the standard one: the corpus collapses ONCE into a
word-frequency vocabulary (one exchange; 100 TB of text becomes a
few-million-row word table), and every merge round then operates on the
word vocabulary only — no further corpus passes. Rounds run on BSP actor
shards (the graph.py machinery): each shard holds its hash-shard of the
word-freq table as symbol sequences, emits its local (pair -> count)
map, the driver folds the k maps (PAIR-vocabulary-sized — bounded by the
current symbol vocab squared and empirically tiny, never corpus-sized)
and broadcasts the argmax pair; shards apply the merge in place.

Determinism: ties on count break by lexicographically smallest
(left, right) — the same contract as the single-process reference
implementation in the tests. Word-frequency aggregation is integer and
the per-round argmax is a pure fold, so the merge sequence is identical
for any sharding or cluster size.

Output: one row per learned merge, (rank, left, right, pair_count) —
rows-only under the driver gate (iterative argmax is not
SQL-expressible), pinned by the reference implementation in pytest.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from spiderman_ray.pipelines.text import _read_docs

#: End-of-word sentinel (Sennrich): merges cannot cross word boundaries
#: and word-final units stay distinct from word-internal ones.
EOW = "</w>"


class _BPEShard:
    """One shard of the word-frequency vocabulary, held as mutable symbol
    sequences. ``pair_counts`` returns the shard-local pair map;
    ``apply_merge`` rewrites its words for the chosen pair."""

    def __init__(self):
        self.words: list[list[str]] = []
        self.freqs: np.ndarray | None = None

    def load(self, *tables) -> int:
        tabs = [tb for tb in tables if tb.num_rows]
        if not tabs:  # a shard can legally receive zero words at high k
            self.words, self.freqs = [], np.array([], dtype=np.int64)
            return 0
        t = pa.concat_tables(tabs)
        self.words = [list(w) + [EOW] for w in t["word"].to_pylist()]
        self.freqs = t["freq"].to_numpy().astype(np.int64)
        return len(self.words)

    def pair_counts(self) -> dict:
        c: Counter = Counter()
        for syms, f in zip(self.words, self.freqs):
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += int(f)
        return dict(c)

    def apply_merge(self, left: str, right: str) -> int:
        new = left + right
        n_applied = 0
        for syms in self.words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i : i + 2] = [new]
                    n_applied += 1
                else:
                    i += 1
        return n_applied


def bpe_reference(word_freqs: dict[str, int], n_merges: int) -> list[tuple]:
    """Single-process reference BPE (the pytest oracle): returns
    [(rank, left, right, pair_count)] with the identical tie-break."""
    words = {w: list(w) + [EOW] for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        c: Counter = Counter()
        for w, syms in words.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += f
        if not c:
            break
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        new = left + right
        for syms in words.values():
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i : i + 2] = [new]
                else:
                    i += 1
    return merges


def bpe_train(sf_dir: str, n_merges: int = 20, k: int | None = None) -> rd.Dataset:
    """Learn ``n_merges`` BPE merges over the corpus. One corpus exchange
    (word-frequency aggregation, word-shard grouped sum), then BSP merge
    rounds over the vocabulary shards."""
    import pandas as pd
    import ray

    from spiderman_ray.functions.hashing import hash64
    from spiderman_ray.pipelines import pool_size

    k = k or pool_size(8)

    def word_counts(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pylist())
        toks = s.str.split(" ").explode()
        toks = toks[toks != ""].dropna()
        tc = toks.groupby(toks, sort=False).size()
        words = tc.index.to_numpy(dtype=object)
        sh = (hash64([str(w) for w in words]).view(np.uint64) % np.uint64(k)).astype(np.int64)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "freq": pa.array(tc.to_numpy().astype(np.int64)),
                "_bshard": pa.array(sh),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("word", sort=False)["freq"].sum().reset_index()
        agg["_bshard"] = g["_bshard"].iloc[0]
        return agg

    vocab = (
        _read_docs(sf_dir)
        .map_batches(word_counts, batch_format="pyarrow")
        .groupby("_bshard")
        .map_groups(fold, batch_format="pandas")
        .sort("_bshard")
        .materialize()
    )
    counts = {r["_bshard"]: r["count()"] for r in vocab.groupby("_bshard").count().take_all()}
    cuts = np.cumsum([counts.get(j, 0) for j in range(k)])[:-1].tolist()
    splits = vocab.split_at_indices(cuts)

    Shard = ray.remote(_BPEShard)
    actors = [Shard.remote() for _ in range(k)]
    ray.get([
        a.load.remote(*splits[i].to_arrow_refs()) for i, a in enumerate(actors)
    ])

    merges = []
    for rank in range(n_merges):
        maps = ray.get([a.pair_counts.remote() for a in actors])
        total: Counter = Counter()
        for m in maps:  # pair-vocab-sized fold, never corpus-sized
            total.update(m)
        if not total:
            break
        (left, right), cnt = min(total.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, int(cnt)))
        ray.get([a.apply_merge.remote(left, right) for a in actors])

    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array([m[0] for m in merges], pa.int64()),
                "left": pa.array([m[1] for m in merges], pa.string()),
                "right": pa.array([m[2] for m in merges], pa.string()),
                "pair_count": pa.array([m[3] for m in merges], pa.int64()),
            }
        )
    )


def bpe_encode_word(word: str, ranks: dict) -> list[str]:
    """Encode one word with a learned merge table (standard BPE encode:
    repeatedly merge the lowest-rank adjacent pair). Shared by the
    distributed stage and the pytest reference — parity is structural."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best, at = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, at = r, i
        if best is None:
            break
        syms[at : at + 2] = [syms[at] + syms[at + 1]]
    return syms


class _BPEEncode:
    """Actor-pool stage: the merge table (the 'model') binds once per
    actor; per batch, words tokenize through a per-actor cache (corpus
    word frequency is Zipfian — the cache hit rate is the win)."""

    def __init__(self, merges: list[tuple]):
        self.ranks = {(l, r): rank for rank, l, r, _ in merges}
        self.cache: dict[str, list[str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from spiderman_ray.functions.hashing import hash64

        ids, n_toks, sums = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                enc = self.cache.get(w)
                if enc is None:
                    enc = bpe_encode_word(w, self.ranks)
                    self.cache[w] = enc
                toks.extend(enc)
            ids.append(did)
            n_toks.append(len(toks))
            # order-insensitive integer checksum of the token multiset
            s = int(hash64(toks).view(np.uint64).sum() % np.uint64(2**63)) if toks else 0
            sums.append(s)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bpe_tokens": pa.array(n_toks, pa.int64()),
                "token_checksum": pa.array(sums, pa.int64()),
            }
        )


def bpe_encode(sf_dir: str, n_merges: int = 20) -> rd.Dataset:
    """Tokenize the corpus with merges learned by ``bpe_train``: the
    merge table is tiny (O(n_merges)) and broadcast into each actor's
    constructor — the classic small-side broadcast, never a join."""
    from spiderman_ray.pipelines import pool_size

    merges = [
        (int(r["rank"]), r["left"], r["right"], int(r["pair_count"]))
        for r in bpe_train(sf_dir, n_merges).take_all()  # O(n_merges) rows
    ]
    return _read_docs(sf_dir).map_batches(
        _BPEEncode,
        fn_constructor_args=(merges,),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=pool_size(4),
        num_cpus=1,
    )
