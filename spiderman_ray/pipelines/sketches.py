"""Mergeable sketches — the constant-memory aggregate family a 100-TB
pipeline needs where exact answers are shuffle-bound.

HyperLogLog distinct counting: every block folds its rows into a fixed
2^p-byte register array (one vectorized numpy pass, no per-row Python), the
driver merges the per-block arrays by elementwise max (sketch merge is
associative + commutative, so ANY reduction topology — driver fold here,
tree-reduce on a real cluster — yields the identical registers), and the
standard HLL estimator with linear-counting small-range correction reads
the answer off 4 KiB of state. The hash is the repo's deterministic
``hash64`` (md5-derived), so the estimate is bit-reproducible across runs,
block layouts and cluster sizes — unlike sampling-based estimators.

Exactness contract: the ESTIMATE is approximate (sigma ~ 1.04/sqrt(2^p));
the REGISTERS are deterministic. tests/test_pipelines.py asserts the
estimate lands within the 3-sigma band of the exact distinct count and
that repeated runs are identical.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from spiderman_ray.functions.hashing import hash64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_register_blocks(ds: rd.Dataset, column: str, p: int = 12) -> rd.Dataset:
    """Fold each block into one row holding the 2^p HLL registers
    (list<uint8>). Constant output size per block regardless of row count —
    this is what crosses the wire, never the values themselves."""
    m = 1 << p
    rest_bits = 64 - p

    def regs(batch: pa.Table) -> pa.Table:
        h = hash64([str(v) for v in batch[column].to_pylist()]).view(np.uint64)
        idx = (h >> np.uint64(rest_bits)).astype(np.int64)
        rest = h & np.uint64((1 << rest_bits) - 1)
        # rank = leading-zero count of the low (64-p) bits + 1; rest < 2^52
        # converts to float64 exactly, so log2 is precise
        rank = np.full(len(h), rest_bits + 1, dtype=np.uint8)
        nz = rest > 0
        rank[nz] = (rest_bits - np.floor(np.log2(rest[nz].astype(np.float64)))).astype(np.uint8)
        reg = np.zeros(m, dtype=np.uint8)
        np.maximum.at(reg, idx, rank)
        return pa.table({"reg": pa.array([reg.tolist()], type=pa.list_(pa.uint8()))})

    return ds.map_batches(regs, batch_format="pyarrow", batch_size=65536)


def hll_estimate(register_rows: list[dict], p: int = 12) -> int:
    """Merge per-block register arrays (elementwise max) and estimate.

    The harmonic denominator sum(2^-r) is computed EXACTLY as the integer
    S = sum(2^(rmax - r)) (Python bignum — ranks are <= 65-p, so S fits
    ~2^(rmax+p)), then one double division: this makes the estimate a
    deterministic pure function of the registers that a SQL engine
    reproduces bit-for-bit in HUGEINT + one DOUBLE division (the
    ``approx_distinct_users`` oracle), instead of a float fold whose
    last-ulp depends on summation order."""
    import math

    m = 1 << p
    rmax = 64 - p + 1  # the rest==0 sentinel rank
    reg = np.zeros(m, dtype=np.uint8)
    for r in register_rows:
        reg = np.maximum(reg, np.asarray(r["reg"], dtype=np.uint8))
    s_exact = sum(1 << (rmax - int(v)) for v in reg)  # == 2^rmax * sum(2^-r)
    est = _alpha(m) * m * m * float(1 << rmax) / float(s_exact)
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting, small-range correction
    return int(math.floor(est + 0.5))


def hll_registers(sf_dir: str, table: str = "events", column: str = "user_id",
                  p: int = 12) -> pa.Table:
    """The merged HLL register STATE as (reg_idx, reg_rank) rows — the
    deterministic integer core of ``approx_distinct`` exposed for exact
    SQL verification: reg_idx = hash64(v) >> (64-p), reg_rank = MAX over
    the registered values of (64-p) - floor(log2(low bits)) (+1), which is
    ``(64-p+1) - bit_length(rest)`` in pure integer arithmetic — the same
    ``length(bin(x))`` contract DuckDB runs (see unigram_quality). Only
    non-zero registers are emitted (= the GROUP BY result of the SQL)."""
    ds = rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=[column])
    rows = hll_register_blocks(ds, column, p=p).take_all()
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    for r in rows:
        reg = np.maximum(reg, np.asarray(r["reg"], dtype=np.uint8))
    nz = np.nonzero(reg)[0]
    return pa.table({
        "reg_idx": pa.array(nz.astype(np.int64)),
        "reg_rank": pa.array(reg[nz].astype(np.int64)),
    })


def approx_distinct(sf_dir: str, table: str = "events", column: str = "user_id",
                    p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT column) via HyperLogLog (p=12 -> 4096
    registers, ~1.6% relative error). The full pipeline moves only one
    4 KiB row per input block."""
    ds = rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=[column])
    rows = hll_register_blocks(ds, column, p=p).take_all()
    return pa.table({"n_distinct_est": pa.array([hll_estimate(rows, p=p)], type=pa.int64())})


# ---------------------------------------------------------------------------
# Count-Min sketch (approximate frequencies)
# ---------------------------------------------------------------------------

_CMS_SALTS = ("cms0|", "cms1|", "cms2|", "cms3|")


def _cms_rows(tokens: np.ndarray, counts: np.ndarray, width: int) -> np.ndarray:
    """(d, width) int64 count table for a (token, count) batch — one
    deterministic hash64 per (salt, token), vectorized adds."""
    table = np.zeros((len(_CMS_SALTS), width), dtype=np.int64)
    toks = [str(t) for t in tokens]
    for r, salt in enumerate(_CMS_SALTS):
        idx = hash64([salt + t for t in toks]).view(np.uint64) % np.uint64(width)
        np.add.at(table[r], idx.astype(np.int64), counts)
    return table


def cms_token_counts(sf_dir: str, width: int = 4096) -> rd.Dataset:
    """Per-block Count-Min tables over whitespace token OCCURRENCES in
    ``documents``: each block pre-aggregates its token counts (pandas
    value_counts) and folds them into a fixed (4 x width) table — constant
    bytes per block across the wire, merged downstream by elementwise SUM
    (CMS merge is addition, so any reduction topology is valid)."""
    import pandas as pd

    def fold(batch: pa.Table) -> pa.Table:
        toks = pd.Series(batch["text"].to_pylist()).str.split(" ").explode()
        toks = toks[toks != ""]
        vc = toks.value_counts()
        table = _cms_rows(vc.index.to_numpy(dtype=object),
                          vc.to_numpy().astype(np.int64), width)
        return pa.table({"cms": pa.array([table.ravel().tolist()],
                                         type=pa.list_(pa.int64()))})

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"]).map_batches(fold, batch_format="pyarrow")


def cms_merge(rows: list[dict], width: int = 4096) -> np.ndarray:
    table = np.zeros((len(_CMS_SALTS), width), dtype=np.int64)
    for r in rows:
        table += np.asarray(r["cms"], dtype=np.int64).reshape(len(_CMS_SALTS), width)
    return table


def cms_table(sf_dir: str, width: int = 4096) -> pa.Table:
    """The merged Count-Min table as (row_idx, col_idx, cnt) rows for
    non-zero cells — the deterministic integer state behind
    ``approx_token_counts`` exposed for exact SQL verification: for salt
    row r, col = hash64('cms{r}|' + token) % width and cnt = total
    occurrences hashed there (CMS merge = elementwise SUM, so the value is
    layout/topology invariant). DuckDB reproduces it with the md5-prefix
    hash64 idiom + GROUP BY."""
    merged = cms_merge(cms_token_counts(sf_dir, width=width).take_all(), width=width)
    r, c = np.nonzero(merged)
    return pa.table({
        "row_idx": pa.array(r.astype(np.int64)),
        "col_idx": pa.array(c.astype(np.int64)),
        "cnt": pa.array(merged[r, c].astype(np.int64)),
    })


def cms_estimate(table: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point-query estimates: min over the d rows (classic CMS upper-bias
    guarantee: est >= true, est <= true + eps*N w.h.p., eps = e/width)."""
    width = table.shape[1]
    ests = np.empty((len(_CMS_SALTS), len(tokens)), dtype=np.int64)
    for r, salt in enumerate(_CMS_SALTS):
        idx = hash64([salt + t for t in tokens]).view(np.uint64) % np.uint64(width)
        ests[r] = table[r][idx.astype(np.int64)]
    return ests.min(axis=0)


def approx_token_counts(sf_dir: str, k: int = 20, width: int = 4096) -> pa.Table:
    """Approximate frequencies of the exact top-k tokens via a merged
    Count-Min sketch — the estimate-side twin of the exact ``top_tokens``
    heavy hitter (which supplies the token list). Deterministic hashes ->
    bit-reproducible estimates; accuracy is pytest-bounded, so this stays
    a rows-only driver query like the HLL sketch."""
    from spiderman_ray.pipelines.text import top_tokens

    top = top_tokens(sf_dir, k=k).to_pandas()
    table = cms_merge(cms_token_counts(sf_dir, width=width).take_all(), width=width)
    est = cms_estimate(table, list(top["token"]))
    return pa.table(
        {
            "token": pa.array(list(top["token"]), type=pa.string()),
            "n_est": pa.array(est.astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# deterministic log-bucket quantile sketch
# ---------------------------------------------------------------------------

#: mantissa bits kept per bucket: relative error <= 2^-_QK (1.5625%)
_QK = 6


def _log_buckets(c: np.ndarray) -> np.ndarray:
    """Integer-exact log-spaced bucket ids for positive int64 values
    < 2^53: values below 2^(_QK+1) are their own bucket; above, the top
    _QK+1 mantissa bits plus the scaled exponent. Monotone in the value,
    identical integer arithmetic in DuckDB (length(bin(c)), >>)."""
    c = c.astype(np.int64)
    # bit_length via frexp — float64 conversion is exact below 2^53
    _, exp = np.frexp(c.astype(np.float64))
    s = exp.astype(np.int64) - (_QK + 1)
    small = c < (1 << (_QK + 1))
    return np.where(small, c, (c >> np.maximum(s, 0)) + (1 << _QK) * s)


def _bucket_upper(bucket: int) -> int:
    """Exact upper bound of a bucket (the sketch's quantile answer)."""
    if bucket < (1 << (_QK + 1)):
        return int(bucket)
    s = bucket // (1 << _QK) - 1
    base = bucket - (1 << _QK) * s
    return ((base + 1) << s) - 1


def approx_price_quantiles(
    sf_dir: str, pcts: tuple = (25, 50, 75, 90)
) -> pa.Table:
    """One-pass mergeable quantile sketch over part prices (cents) — the
    approximate sibling of the exact two-pass ``price_quantiles``: every
    batch folds into (bucket, count) partials (the combiner), one tiny
    grouped SUM merges them (constant state however large the corpus),
    and the driver reads each percentile's bucket upper bound off O(64
    x width) rows. Deterministic integer bucketing means the DuckDB
    oracle reproduces the EXACT same answers (hash-verified), while the
    answer-vs-truth error is bounded by one bucket: value in
    (ub/(1+2^-6), ub]. Rank contract ceil(p*n/100), as price_quantiles."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = np.floor(
            batch["p_retailprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        b, n = np.unique(_log_buckets(cents), return_counts=True)
        return pa.table({"bucket": pa.array(b), "n": pa.array(n.astype(np.int64))})

    hist = (
        rd.read_parquet(os.path.join(sf_dir, "part.parquet"), columns=["p_retailprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    buckets = hist["bucket"].to_numpy()
    rows = []
    for p in pcts:
        rank = (p * total + 99) // 100
        b = buckets[np.searchsorted(cum, rank)]
        rows.append((int(p), _bucket_upper(int(b))))
    return pa.table(
        {
            "pct": pa.array([r[0] for r in rows], type=pa.int64()),
            "value_cents_ub": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )


def source_distinct_shingles(sf_dir: str, p: int = 12) -> rd.Dataset:
    """Per-source approximate distinct 3-word-shingle count — the
    GROUPED HyperLogLog (one mergeable constant-size sketch per group):
    the diversity dashboard a crawl-budget loop reads next to
    ``source_novelty`` (a source whose distinct-shingle estimate stops
    growing has saturated). Scale shape: each batch folds its shingles
    into one 2^p-register array PER SOURCE it touches (O(sources)
    constant-size rows per block — the hll_register_blocks pattern,
    grouped), one tiny groupby(source) merges by elementwise max and
    runs the exact-integer estimator head (``hll_estimate``: HUGEINT
    harmonic sum, ONE double division, linear-counting branch — the
    ``approx_distinct_users`` bit-parity contract, here GROUP BY
    source). Shingle identity is hash64 of the SHINGLE STRING (md5
    16-hex) — value-sensitive, so it must match the SQL '0x'||md5
    idiom, not the mix-hash used by the set-semantics shingle ops.
    Output: (source, n_shingles_est)."""
    import pandas as pd

    from spiderman_ray.pipelines.text import _pq

    m = 1 << p
    rest_bits = 64 - p

    def regs(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        texts = batch["text"].to_pylist()
        per: dict[str, set] = {}
        for src, t in zip(srcs, texts):
            ws = t.split(" ")
            if len(ws) < 3:
                sh = {t}
            else:
                sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
            per.setdefault(src, set()).update(sh)
        out_src, out_reg = [], []
        for src, shset in per.items():
            h = hash64(sorted(shset)).view(np.uint64)
            idx = (h >> np.uint64(rest_bits)).astype(np.int64)
            rest = h & np.uint64((1 << rest_bits) - 1)
            rank = np.full(len(h), rest_bits + 1, dtype=np.uint8)
            nz = rest > 0
            rank[nz] = (
                rest_bits - np.floor(np.log2(rest[nz].astype(np.float64)))
            ).astype(np.uint8)
            reg = np.zeros(m, dtype=np.uint8)
            np.maximum.at(reg, idx, rank)
            out_src.append(src)
            out_reg.append(reg.tolist())
        return pa.table(
            {
                "source": pa.array(out_src, pa.string()),
                "reg": pa.array(out_reg, pa.list_(pa.uint8())),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        est = hll_estimate([{"reg": r} for r in g["reg"]], p=p)
        return pd.DataFrame(
            {"source": [g["source"].iloc[0]],
             "n_shingles_est": np.array([est], dtype=np.int64)}
        )

    return (
        rd.read_parquet(_pq(sf_dir), columns=["source", "text"])
        .map_batches(regs, batch_format="pyarrow")
        .groupby("source")  # O(sources) groups — bounded small
        .map_groups(merge, batch_format="pandas")
    )
