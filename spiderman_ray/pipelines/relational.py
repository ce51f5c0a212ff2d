"""Relational operators: anti-joins, grouped aggregates, sorts, set ops.

These are the Ray-Data expressions of the reference's SQL surface:
- the patch jobs' completeness queries (left anti join / distinct set
  difference, SP_JOBS/zhifang_job_patch.py:28-76)
- row keying via uppercase md5 (SP/utils/base.py:38-40)
- epoch/date formatting (SP/utils/tool.py:76-85)
- bucket/limit/top-k knobs (SP/settings.py:31, job CLI caps)

Scale notes: the anti-joins broadcast the (distinct) key side — at testdata
scale the key set is tiny; at 100 TB the same operator swaps the broadcast
set for a bloom filter of keys (state/bloom.py) or a bucketed hash join
(add ``bucket = hash64(key) % B`` to both sides, groupby bucket, join per
group). Aggregates pre-combine per batch before the small groupby shuffle
where the key cardinality allows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from spiderman_ray.functions.hashing import fingerprints


def _pq(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def missing_pages(sf_dir: str) -> rd.Dataset:
    """Orders with no lineitem — the 'missing pages' completeness anti-join
    (zhifang_job_patch.make_list_job, SP_JOBS/zhifang_job_patch.py:28-51).
    Broadcast the distinct fact keys, filter the dimension side."""
    import pyarrow.parquet as pq

    have = pc.unique(
        pq.read_table(_pq(sf_dir, "lineitem"), columns=["l_orderkey"])["l_orderkey"]
    )
    have_set = pa.array(have.to_pylist(), type=pa.int64())

    def anti(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch["o_orderkey"], value_set=have_set))
        return batch.filter(mask)

    return (
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderstatus"])
        .map_batches(anti, batch_format="pyarrow")
    )


def missing_details(sf_dir: str) -> rd.Dataset:
    """Customers with no URGENT order — left anti join on pkey/fkey against a
    filtered fact side (zhifang_job_patch.make_detail_job,
    SP_JOBS/zhifang_job_patch.py:53-76; the filter mirrors its
    ``WHERE b.keyid IS NULL`` narrowing)."""
    import pyarrow.parquet as pq

    otab = pq.read_table(_pq(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"])
    urgent = otab.filter(pc.equal(otab["o_orderpriority"], "1-URGENT"))
    have = pc.unique(urgent["o_custkey"])
    have_set = pa.array(have.to_pylist(), type=pa.int64())

    def anti(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch["c_custkey"], value_set=have_set)))

    return rd.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_name"]
    ).map_batches(anti, batch_format="pyarrow")


def grouped_returns(sf_dir: str) -> rd.Dataset:
    """TPC-H-Q1-shaped grouped aggregate (the engine's groupby surface;
    pre-aggregation happens inside Ray's aggregate implementation)."""
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        # integer cents via floor(x*100 + 0.5): identical IEEE float ops on
        # the Ray and DuckDB sides, so grouped SUMs hash-match exactly
        # (float SUM order differs between engines; integer SUM does not)
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        rev_c = pc.cast(pc.floor(pc.add(pc.multiply(rev, pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        qty_c = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["l_quantity"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_x100": qty_c,
                "rev_cents": rev_c,
            }
        )

    return (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_x100", alias_name="sum_qty_x100"),
            Sum("rev_cents", alias_name="sum_rev_cents"),
            Count(alias_name="n_rows"),
        )
    )


def returns_rollup(sf_dir: str) -> rd.Dataset:
    """Multi-level (ROLLUP) aggregate: leaf groups, per-flag subtotals and
    the grand total in ONE shuffle. The distributed pass is exactly
    grouped_returns' pre-combined groupby; the subtotal/total expansion then
    runs over the LEAF RESULT only — O(distinct flag x distinct status)
    rows, driver-size by definition — so no second exchange and no
    per-input-row rollup fan-out (which would triple the shuffled volume).
    Subtotal keys use the 'ALL' sentinel (COALESCE in the SQL oracle)
    rather than NULL so value hashing is representation-proof."""

    def expand(batch: pa.Table) -> pa.Table:
        import pandas as pd

        leaf = batch.to_pandas()
        per_flag = (
            leaf.groupby("l_returnflag", as_index=False)[
                ["sum_qty_x100", "sum_rev_cents", "n_rows"]
            ]
            .sum()
            .assign(l_linestatus="ALL")
        )
        total = leaf[["sum_qty_x100", "sum_rev_cents", "n_rows"]].sum().to_frame().T
        total["l_returnflag"] = "ALL"
        total["l_linestatus"] = "ALL"
        cols = ["l_returnflag", "l_linestatus", "sum_qty_x100", "sum_rev_cents", "n_rows"]
        out = pd.concat([leaf[cols], per_flag[cols], total[cols]], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    return grouped_returns(sf_dir).repartition(1).map_batches(
        expand, batch_format="pyarrow", batch_size=None
    )


def md5_keys(sf_dir: str) -> rd.Dataset:
    """Row keying: pkey = uppercase md5 (SP/utils/base.py:38-40) over a
    business column, vectorized per batch."""

    def key(batch: pa.Table) -> pa.Table:
        fps = fingerprints(batch["c_name"].to_pylist())
        return pa.table(
            {"c_custkey": batch["c_custkey"], "pkey": pa.array(fps, type=pa.string())}
        )

    return rd.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_name"]
    ).map_batches(key, batch_format="pyarrow")


def event_days(sf_dir: str) -> rd.Dataset:
    """deal_time_stamp equivalent: timestamp -> '%Y-%m-%d' string
    (SP/utils/tool.py:76-85), vectorized with pc.strftime."""

    def fmt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "day": pc.strftime(batch["ts"], format="%Y-%m-%d"),
            }
        )

    return rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts"]).map_batches(
        fmt, batch_format="pyarrow"
    )


def top_orders(sf_dir: str) -> rd.Dataset:
    """Top-25 orders by totalprice — sort + limit (deterministic tie-break
    by orderkey). Sort is a shuffle; limit pushes down."""
    return (
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(25)
    )


def windowed_events(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per event_type — the streaming-window analog
    (SURVEY.md §2.8): event-time bucketing then grouped aggregate."""
    from ray.data.aggregate import Count, Sum

    def bucket(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["value"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pc.strftime(hour, format="%Y-%m-%d %H:00:00"),
                "value_cents": cents,
            }
        )

    return (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts", "value"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents"))
    )


def trending_events(sf_dir: str, hours: int = 6, k: int = 3) -> rd.Dataset:
    """Trending event types: top-``k`` event types per tumbling ``hours``
    window — the windowed-aggregate x group-wise-top-k COMPOSITION a
    monitoring pipeline runs (SURVEY §2.8 + §2.6). Shape: per-batch
    partial (window, event_type, count) combine (rows bounded by
    windows x types per batch, not events), ONE exchange on a hash shard
    of the window id, in-shard grouped total + vectorized rank. Window id
    = epoch_us // (hours*3600e6), integer on both sides (DuckDB
    ``epoch_us(ts) // N`` — no timezone/origin ambiguity).
    Output: (w, event_type, n, rk), rank by (n DESC, event_type ASC)."""
    import pandas as pd

    div = np.int64(hours * 3600 * 1_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        w = us // div
        df = pd.DataFrame({"w": w, "event_type": batch["event_type"].to_pylist()})
        t = df.groupby(["w", "event_type"], sort=False).size().reset_index(name="n")
        t["_wshard"] = (t["w"].to_numpy() % 64).astype(np.int64)
        return pa.Table.from_pandas(t, preserve_index=False)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["w", "event_type"], sort=False)["n"].sum().reset_index()
        t = t.sort_values(["w", "n", "event_type"], ascending=[True, False, True],
                          kind="mergesort")
        t["rk"] = t.groupby("w", sort=False).cumcount() + 1
        t = t[t["rk"] <= k]
        return t[["w", "event_type", "n", "rk"]].astype(
            {"w": "int64", "n": "int64", "rk": "int64"}
        )

    return (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_wshard")
        .map_groups(topk, batch_format="pandas")
    )


def _add_key_shard(col: str, n: int = 64):
    """Append ``_kshard = hash64(str(key)) % n`` — groupby keys must be
    O(parallelism), never the raw high-cardinality key (CLAUDE.md
    invariant; the dedup_exact pattern)."""
    from spiderman_ray.functions.hashing import hash64

    def add(batch: pa.Table) -> pa.Table:
        sh = hash64([str(v) for v in batch[col].to_pylist()]).view(np.uint64) % np.uint64(n)
        return batch.append_column("_kshard", pa.array(sh.astype(np.int64)))

    return add


def sessionized_events(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per user (30-min inactivity gap) — the
    streaming-session operator (SURVEY.md §2.8 guidance). Grouping is by a
    HASH SHARD of user_id (64 groups — O(parallelism) dispatch however many
    users exist); one vectorized pandas pass inside the shard sorts by
    (user_id, ts, event_id) and closes sessions at user boundaries or gaps
    over the threshold. Output: one row per session with count and span."""
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts = g["ts"].astype("datetime64[us]").astype("int64")  # us since epoch
        new_user = g["user_id"].ne(g["user_id"].shift())
        new_session = ((ts.diff().fillna(gap_us + 1) > gap_us) | new_user).cumsum()
        out = (
            g.assign(_s=new_session, _ts=ts)
            .groupby("_s", sort=False)
            .agg(
                user_id=("user_id", "first"),
                session_start=("_ts", "min"),
                n_events=("event_id", "count"),
                span_s=("_ts", lambda x: (x.max() - x.min()) // 1_000_000),
            )
            .reset_index(drop=True)
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["span_s"] = out["span_s"].astype("int64")
        return out

    return (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
        .map_batches(_add_key_shard("user_id"), batch_format="pyarrow")
        .groupby("_kshard")
        .map_groups(sessions, batch_format="pandas")
    )


def running_order_totals(sf_dir: str) -> rd.Dataset:
    """Running per-customer order total — the window-function analog.
    Groups by a hash shard of o_custkey (64 groups, O(parallelism)
    dispatch); inside, one sort + grouped cumsum covers every customer in
    the shard. Integer cents for stable hashing."""
    import pandas as pd

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        cents = pd.Series(
            np.floor(g["o_totalprice"].to_numpy() * 100.0 + 0.5).astype("int64")
        )
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "o_custkey": g["o_custkey"].to_numpy(),
                "running_cents": cents.groupby(g["o_custkey"].to_numpy()).cumsum().to_numpy(),
            }
        )

    return (
        rd.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(_add_key_shard("o_custkey"), batch_format="pyarrow")
        .groupby("_kshard")
        .map_groups(running, batch_format="pandas")
    )


def asof_last_signup(sf_dir: str) -> rd.Dataset:
    """As-of lookup within a stream: for every purchase event, the most
    recent STRICTLY PRIOR signup of the same user (-1 if none) — the
    merge_asof / stateful-stream operator over (user_id, ts) partitions."""
    import pandas as pd

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over the whole user_id-hash shard: sort by
        # (user, ts, event_id); prev signup = per-user shift(1)+ffill of
        # signup timestamps (strictly prior by the shift)
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts_us = g["ts"].astype("datetime64[us]").astype("int64")
        sig = ts_us.where(g["event_type"] == "signup")
        users = g["user_id"]
        prev = sig.groupby(users.to_numpy(), sort=False).shift(1)
        prev = prev.groupby(users.to_numpy(), sort=False).ffill()
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": users.to_numpy(),
                "prev_signup_us": prev.fillna(-1).astype("int64").to_numpy(),
            }
        )
        return out[(g["event_type"] == "purchase").to_numpy()]

    return (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"])
        .map_batches(_add_key_shard("user_id"), batch_format="pyarrow")
        .groupby("_kshard")
        .map_groups(asof, batch_format="pandas")
    )


def customers_per_region(sf_dir: str) -> rd.Dataset:
    """Broadcast dimension join chain customer->nation->region + grouped
    count (small sides shipped once, no shuffle join)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count

    nation = pq.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(_pq(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    lookup = {nk: r2name[rk] for nk, rk in n2r.items()}

    def enrich(batch: pa.Table) -> pa.Table:
        names = [lookup[nk] for nk in batch["c_nationkey"].to_pylist()]
        return pa.table({"r_name": pa.array(names, type=pa.string())})

    return (
        rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_nationkey"])
        .map_batches(enrich, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"))
    )


def revenue_by_segment(sf_dir: str) -> rd.Dataset:
    """Large-side hash join (Ray ``Dataset.join``, hash-partitioned on the
    key) orders ⋈ customer, then grouped revenue per market segment —
    complements the broadcast-dimension join in customers_per_region.
    Revenue in integer cents for stable hashing (see grouped_returns)."""
    from ray.data.aggregate import Count, Sum

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["o_totalprice"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return pa.table({"o_custkey": batch["o_custkey"], "price_cents": c})

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(cents, batch_format="pyarrow")
    cust = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust, join_type="inner", num_partitions=16, on=("o_custkey",), right_on=("c_custkey",)
    )
    return (
        joined.groupby("c_mktsegment")
        .aggregate(Sum("price_cents", alias_name="revenue_cents"), Count(alias_name="n_orders"))
    )


def range_join_shipments(sf_dir: str, window_days: int = 7) -> rd.Dataset:
    """Range (interval) join: for every order, the number of lineitems (any
    order) with ``l_shipdate`` in ``[o_orderdate, o_orderdate + window)`` —
    the date-window join the Dataset API lacks (build brief: "range join"),
    expressed as bucket-overlap co-partitioning:

    - point side pre-aggregates to (day, count) per batch (combiner before
      the exchange — at 100 TB the day cardinality, not the row count, is
      what crosses the shuffle) and REPLICATES each day to buckets d//w and
      d//w - 1: bucket width == window length means every interval starting
      in bucket b reads only days in [b*w, (b+2)*w), all present in b,
    - each interval goes to exactly ONE bucket (its start's), so the join
      answers completely in a single groupby — no second exchange to
      re-aggregate split intervals,
    - inside a bucket, a sorted day array + prefix-sum + ``np.searchsorted``
      answers every interval in O((P+I) log P) vectorized.
    """
    day_us = 86_400_000_000
    w = window_days

    def points(batch: pa.Table) -> pa.Table:
        days = batch["l_shipdate"].cast(pa.int64()).to_numpy() // day_us
        uniq, cnt = np.unique(days, return_counts=True)
        b0 = uniq // w
        bucket = np.concatenate([b0, b0 - 1])  # replicate: readers span 2 buckets
        day2 = np.concatenate([uniq, uniq])
        cnt2 = np.concatenate([cnt, cnt])
        return pa.table(
            {
                "_bshard": (bucket % 64).astype(np.int64),
                "bucket": bucket.astype(np.int64),
                "kind": np.zeros(len(bucket), dtype=np.int64),
                "k1": day2.astype(np.int64),
                "k2": cnt2.astype(np.int64),
            }
        )

    def intervals(batch: pa.Table) -> pa.Table:
        start = batch["o_orderdate"].cast(pa.int64()).to_numpy() // day_us
        bucket = start // w
        return pa.table(
            {
                "_bshard": (bucket % 64).astype(np.int64),
                "bucket": bucket.astype(np.int64),
                "kind": np.ones(len(bucket), dtype=np.int64),
                "k1": batch["o_orderkey"].to_numpy().astype(np.int64),
                "k2": start.astype(np.int64),
            }
        )

    import pandas as pd

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, bg in g.groupby("bucket", sort=False):
            iv = bg[bg["kind"] == 1]
            if not len(iv):
                continue
            pt = bg[bg["kind"] == 0]
            start = iv["k2"].to_numpy()
            if len(pt):
                day_counts = pt.groupby("k1", sort=True)["k2"].sum()
                days = day_counts.index.to_numpy()
                cum = np.concatenate([[0], np.cumsum(day_counts.to_numpy())])
                n = cum[np.searchsorted(days, start + w)] - cum[np.searchsorted(days, start)]
            else:
                n = np.zeros(len(iv), dtype=np.int64)
            outs.append(pd.DataFrame({"o_orderkey": iv["k1"].to_numpy(), "n_ship": n}))
        if not outs:
            return pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                 "n_ship": pd.Series(dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        out["n_ship"] = out["n_ship"].astype("int64")
        return out

    pts = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_shipdate"]).map_batches(
        points, batch_format="pyarrow"
    )
    ivs = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"]
    ).map_batches(intervals, batch_format="pyarrow")
    return (
        pts.union(ivs)
        .groupby("_bshard")
        .map_groups(join_bucket, batch_format="pandas")
    )


def _target_bucket_value_hist(
    read, need: list[int], shift: np.uint64
) -> "pd.DataFrame":
    """Pass 2 of ``price_quantiles``: the (value, count) HISTOGRAM of rows
    falling in the target coarse buckets — a second refinement histogram,
    not the rows themselves (round-2 verdict fix: this used to ``take_all``
    the bucket members, O(n/buckets) driver rows; now the driver receives
    at most len(need) * 2^shift (value, n) rows however large the table —
    O(buckets), corpus-independent)."""
    from ray.data.aggregate import Sum

    need_arr = pa.array([int(b) for b in need], type=pa.int64())

    def vhist(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["l_extendedprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        cents = cents[
            pc.is_in(pa.array(cents >> shift), value_set=need_arr).to_numpy(
                zero_copy_only=False
            )
        ]
        uniq, cnt = np.unique(cents, return_counts=True)
        return pa.table({"value": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))})

    return (
        read()
        .map_batches(vhist, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )


def price_quantiles(sf_dir: str, pcts: tuple[int, ...] = (25, 50, 75, 90, 99)) -> pa.Table:
    """Exact distributed quantiles of l_extendedprice (integer cents) with
    NO full sort and NO row collection: pass 1 builds a coarse value-bucket
    histogram (bucket = cents >> 14, a few hundred buckets — only (bucket,
    count) rows cross the exchange); the driver locates each target rank's
    bucket from the tiny cumulative histogram; pass 2 builds the refinement
    histogram of EXACT VALUES within only the <= len(pcts) target buckets
    (``_target_bucket_value_hist`` — a grouped SUM whose result is bounded
    by len(pcts) * 2^14 rows, never by n) and the driver reads each rank
    straight off its cumulative counts. Rank contract (shared with the SQL
    oracle, integer arithmetic so no float-ceil ambiguity): value of rank
    ``(pct*n + 99) // 100`` (1-indexed) in the sorted column — DuckDB's
    quantile_disc == ceil(q*n) semantics.

    Scale note: both driver collections are O(buckets); a hot bucket adds
    histogram rows, not data rows, so value skew cannot blow the driver.
    """
    from ray.data.aggregate import Sum

    shift = np.uint64(14)

    def hist(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        uniq, cnt = np.unique(cents >> shift, return_counts=True)
        return pa.table({"bucket": uniq.astype(np.int64), "n": cnt.astype(np.int64)})

    read = lambda: rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_extendedprice"])  # noqa: E731
    h = (
        read()
        .map_batches(hist, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    h.sort(key=lambda r: r["bucket"])
    buckets = np.array([r["bucket"] for r in h], dtype=np.int64)
    counts = np.array([r["n"] for r in h], dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    ranks = {p: (p * n + 99) // 100 for p in pcts}
    # bucket index holding each target rank + rank offset within the bucket
    locs = {p: int(np.searchsorted(cum, r)) for p, r in ranks.items()}
    need = sorted({buckets[i] for i in locs.values()})

    vh = _target_bucket_value_hist(read, need, shift).sort_values("value")
    vals = vh["value"].to_numpy(dtype=np.int64)
    vcum = np.cumsum(vh["n"].to_numpy(dtype=np.int64))
    vbuckets = vals >> shift
    out_pct, out_val = [], []
    for p in pcts:
        i = locs[p]
        before = int(cum[i - 1]) if i > 0 else 0  # rows in buckets below target
        # rank within the union of target buckets: counts of other target
        # buckets BELOW this one also precede it in the value histogram
        below = int(vcum[np.searchsorted(vbuckets, buckets[i]) - 1]) if (
            np.searchsorted(vbuckets, buckets[i]) > 0
        ) else 0
        j = int(np.searchsorted(vcum, below + (ranks[p] - before)))
        out_pct.append(p)
        out_val.append(int(vals[j]))
    return pa.table(
        {"pct": pa.array(out_pct, type=pa.int64()), "value_cents": pa.array(out_val, type=pa.int64())}
    )


def brand_price_quantiles(
    sf_dir: str, pcts: tuple[int, ...] = (25, 50, 75, 90)
) -> rd.Dataset:
    """Per-GROUP exact quantiles (p_retailprice cents per p_brand) — the
    grouped companion to ``price_quantiles``. One shuffle: rows are
    dispatched by a hash shard of the brand (64 groups, O(parallelism)
    however many brands exist, per the groupby-key invariant); inside a
    shard ONE vectorized pass sorts (brand, cents) and gathers every
    brand's target ranks with numpy indexing — no per-key Python loop.
    Rank contract shared with the SQL oracle: value of 1-indexed rank
    ``(pct*n + 99) // 100`` in the group's sorted column (ceil(q*n),
    DuckDB quantile_disc semantics, integer arithmetic only).

    Scale note: a shard holds its brands' full row sets; if one group
    outgrew worker memory the two-pass histogram of ``price_quantiles``
    applies per group — not needed at testdata scale (documented limit)."""
    import pandas as pd

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_brand", "cents"], kind="mergesort")
        v = g["cents"].to_numpy()
        brands, starts, counts = np.unique(
            g["p_brand"].to_numpy(), return_index=True, return_counts=True
        )
        ps = np.array(pcts, dtype=np.int64)
        # (n_brands, n_pcts) rank matrix -> flat gather, no Python loop
        idx = starts[:, None] + (ps[None, :] * counts[:, None] + 99) // 100 - 1
        return pd.DataFrame(
            {
                "p_brand": np.repeat(brands, len(ps)),
                "pct": np.tile(ps, len(brands)),
                "value_cents": v[idx.ravel()].astype("int64"),
            }
        )

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["p_retailprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"p_brand": batch["p_brand"], "cents": pa.array(cents)})

    return (
        rd.read_parquet(_pq(sf_dir, "part"), columns=["p_brand", "p_retailprice"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_key_shard("p_brand"), batch_format="pyarrow")
        .groupby("_kshard")
        .map_groups(quantiles, batch_format="pandas")
    )


def priority_union(sf_dir: str) -> rd.Dataset:
    """ds.union of two filtered branches + grouped count (the reference's
    union-typed item stream split, SP/pipelines/pipelines_rdbm.py:40-57)."""
    from ray.data.aggregate import Count

    base = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderpriority"])
    urgent = base.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")), batch_format="pyarrow"
    )
    high = base.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "2-HIGH")), batch_format="pyarrow"
    )
    return urgent.union(high).groupby("o_orderpriority").aggregate(Count(alias_name="n"))


def distinct_brands(sf_dir: str) -> pa.Table:
    """ds.unique — grouped distinct (GROUP BY pagenum completeness check,
    SP_JOBS/zhifang_job_patch.py:31-34)."""
    vals = rd.read_parquet(_pq(sf_dir, "part"), columns=["p_brand"]).unique("p_brand")
    return pa.table({"p_brand": pa.array(sorted(vals), type=pa.string())})


def _edit_le1(a: str, b: str) -> bool:
    """Exact Levenshtein <= 1 check (the in-bucket verifier of
    ``name_edit_dups``; hypothesis-tested against a full DP)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution
        return sum(x != y for x, y in zip(a, b)) <= 1
    s, t = (a, b) if la < lb else (b, a)  # t is one char longer
    i = 0
    while i < len(s) and s[i] == t[i]:
        i += 1
    return s[i:] == t[i + 1 :]


def name_edit_dups(sf_dir: str) -> rd.Dataset:
    """String-similarity join: distinct part-name pairs within Levenshtein
    distance 1, via DELETION-NEIGHBORHOOD keys (the FastSS construction):
    every name emits itself plus each single-character deletion as a
    candidate key; two names at edit distance <= 1 ALWAYS share a key
    (substitution -> same-position deletions match; indel -> the longer
    side's deletion equals the shorter side), so bucketing by key is a
    complete candidate generator — no all-pairs pass. Three bounded
    exchanges: name-shard distinct, key-shard in-bucket verify, pair-shard
    distinct (a pair can co-occur in several buckets). The in-bucket
    verify is an exact <=1 edit check, so false candidates die where the
    key lives. Output (a, b) with a < b."""
    import pandas as pd

    from spiderman_ray.functions.hashing import hash64

    def distinct_names(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["p_name"])[["p_name"]]

    def emit_keys(batch: pa.Table) -> pa.Table:
        names, keys = [], []
        for nm in batch["p_name"].to_pylist():
            variants = [nm] + [nm[:i] + nm[i + 1 :] for i in range(len(nm))]
            for v in variants:
                names.append(nm)
                keys.append(v)
        sh = hash64(keys).view(np.uint64) % np.uint64(64)
        return pa.table(
            {
                "p_name": pa.array(names, pa.string()),
                "k": pa.array(keys, pa.string()),
                "_bshard": pa.array(sh.astype(np.int64)),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("k", sort=False):
            nms = sorted(set(grp["p_name"]))
            for i in range(len(nms)):
                for j in range(i + 1, len(nms)):
                    if _edit_le1(nms[i], nms[j]):
                        out_a.append(nms[i])
                        out_b.append(nms[j])
        sh = (
            hash64([x + "|" + y for x, y in zip(out_a, out_b)]).view(np.uint64)
            % np.uint64(64)
        ) if out_a else np.array([], dtype=np.uint64)
        return pd.DataFrame(
            {"a": out_a, "b": out_b, "_pshard": sh.astype(np.int64)}
        )

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    return (
        rd.read_parquet(_pq(sf_dir, "part"), columns=["p_name"])
        .map_batches(_add_key_shard("p_name"), batch_format="pyarrow")
        .groupby("_kshard")
        .map_groups(distinct_names, batch_format="pandas")
        .map_batches(emit_keys, batch_format="pyarrow")
        .groupby("_bshard")
        .map_groups(verify, batch_format="pandas")
        .groupby("_pshard")
        .map_groups(distinct_pairs, batch_format="pandas")
    )


def table_diff(sf_dir: str) -> rd.Dataset:
    """Snapshot diff between two versions of a table — the ops tool a
    recrawl/compaction pipeline validates with — via a native FULL OUTER
    hash join (Dataset.join): rows only in the old version are
    ``removed``, only in the new are ``added``, present in both with a
    different payload are ``changed``; unchanged rows drop. The 'new'
    version is a deterministic perturbation of ``orders`` (the
    inject-then-verify pattern): every 13th key dropped, every 7th
    repriced +1 cent, every 11th spawns a fresh key offset by 10^7.
    Null-bearing sides COALESCE to -1 BEFORE leaving the join (int64
    stability — the anti_join_ids zero-padding rule). Output:
    (okey, status, old_cents, new_cents)."""

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["o_totalprice"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return pa.table({"okey": pc.cast(batch["o_orderkey"], pa.int64()), "cents": c})

    old = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    ).map_batches(cents, batch_format="pyarrow")

    def perturb(batch: pa.Table) -> pa.Table:
        k = batch["okey"].to_numpy().astype(np.int64)
        c = batch["cents"].to_numpy().astype(np.int64)
        keep = k % 13 != 0
        k2, c2 = k[keep], c[keep].copy()
        c2[k2 % 7 == 0] += 1
        spawn = k[k % 11 == 0]
        nk = np.concatenate([k2, spawn + 10_000_000])
        nc = np.concatenate([c2, c[k % 11 == 0] + 5])
        return pa.table({"okey2": pa.array(nk), "cents2": pa.array(nc)})

    new = old.map_batches(perturb, batch_format="pyarrow")
    joined = old.join(
        new, join_type="full_outer", num_partitions=16,
        on=("okey",), right_on=("okey2",),
    )

    def classify(batch: pa.Table) -> pa.Table:
        # the join coalesces the key into ``okey``; null payloads mark
        # which side a row came from
        c_old = batch["cents"].to_pandas()
        c_new = batch["cents2"].to_pandas()
        status = np.where(
            c_old.isna(), "added", np.where(c_new.isna(), "removed", "changed")
        )
        oldc = c_old.fillna(-1).astype(np.int64).to_numpy()
        newc = c_new.fillna(-1).astype(np.int64).to_numpy()
        keep = (status != "changed") | (oldc != newc)
        return pa.table(
            {
                "okey": pa.array(
                    batch["okey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
                ),
                "status": pa.array(status[keep], pa.string()),
                "old_cents": pa.array(oldc[keep]),
                "new_cents": pa.array(newc[keep]),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")
