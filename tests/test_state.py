import numpy as np
import pyarrow as pa
import pytest

from spiderman_ray.functions.hashing import md5_upper
from spiderman_ray.state.bloom import ExactSet, NumpyBloom
from spiderman_ray.state.politeness import HostLedger, RobotsCache


def test_numpy_bloom_offer_semantics():
    bf = NumpyBloom(mem_mb=1, k=7)
    vals = [md5_upper(f"u{i}") for i in range(50)]
    acc = bf.offer_batch(vals)
    assert acc.all()
    # second offer: all already present
    assert not bf.offer_batch(vals).any()
    # intra-batch duplicates: only first occurrence accepted
    batch = [md5_upper("new1"), md5_upper("new1"), md5_upper("new2"), md5_upper("u0")]
    acc = bf.offer_batch(batch)
    assert acc.tolist() == [True, False, True, False]


def test_numpy_bloom_matches_sequential_reference_decisions():
    """Vectorized offer == one-at-a-time check-then-add (the reference's
    sequential semantics, SP/bloom_dupefilter.py:77-83)."""
    bf_vec = NumpyBloom(mem_mb=1, k=7)
    bf_seq = NumpyBloom(mem_mb=1, k=7)
    rng = np.random.default_rng(7)
    pool = [md5_upper(f"url{i}") for i in range(100)]
    batch = [pool[i] for i in rng.integers(0, 100, size=300)]
    vec = bf_vec.offer_batch(batch)
    seq = []
    for v in batch:
        exists = bf_seq.contains_batch([v])[0]
        if not exists:
            bf_seq.add_batch([v])
        seq.append(not exists)
    assert vec.tolist() == seq
    assert (bf_vec.bits == bf_seq.bits).all()  # identical final bitmap


def test_bloom_snapshot_roundtrip():
    bf = NumpyBloom(mem_mb=1, k=3)
    bf.add_batch([md5_upper(f"v{i}") for i in range(10)])
    bf2 = NumpyBloom.from_state(bf.state())
    assert (bf2.bits == bf.bits).all() and bf2.k == 3 and bf2.n_added == 10


def test_exact_set():
    es = ExactSet()
    assert es.offer_batch(["a", "b", "a"]).tolist() == [True, True, False]
    assert es.contains_batch(["a", "c"]).tolist() == [True, False]
    es2 = ExactSet.from_state(es.state())
    assert es2.fps == {"a", "b"}


def test_robots_cache():
    rc = RobotsCache({"h1.example": ["/private/", "/admin"]})
    assert rc.allowed("h1.example", "/detail/1")
    assert not rc.allowed("h1.example", "/private/x")
    assert not rc.allowed("h1.example", "/admin")
    assert rc.allowed("h2.example", "/private/x")  # no rules for h2
    rc.allowed("h1.example", "/y")
    assert rc.fetch_count == 2  # one simulated robots fetch per host


def test_host_ledger_virtual_clock():
    hl = HostLedger({"a": 100, "b": 0}, clock="virtual")
    assert [hl.acquire("a") for _ in range(3)] == [0.0, 100.0, 200.0]
    assert [hl.acquire("b") for _ in range(3)] == [0.0, 0.0, 0.0]


def test_host_ledger_wall_clock_enforces_gap():
    import time

    hl = HostLedger({"a": 30}, clock="wall")
    t0 = time.monotonic()
    stamps = [hl.acquire("a") for _ in range(4)]
    elapsed = (time.monotonic() - t0) * 1000
    gaps = np.diff(stamps)
    assert (gaps >= 29.0).all(), gaps  # >= crawl delay (tolerance for timer res)
    assert elapsed >= 85.0


@pytest.mark.usefixtures("ray_session")
class TestShardedSeen:
    def test_offer_contains_sharded(self):
        from spiderman_ray.state.seen import ShardedSeenSet

        pool = ShardedSeenSet(num_shards=3, mode="exact")
        fps = np.array([md5_upper(f"u{i}") for i in range(200)], dtype=object)
        acc = pool.offer(fps)
        assert acc.all()
        assert not pool.offer(fps).any()
        assert pool.contains(fps).all()
        assert pool.count() == 200
        pool.shutdown()

    def test_bloom_mode_and_snapshot(self, tmp_path):
        from spiderman_ray.state.seen import ShardedSeenSet

        pool = ShardedSeenSet(num_shards=2, mode="bloom", bloom_mem_mb=1)
        fps = np.array([md5_upper(f"x{i}") for i in range(100)], dtype=object)
        assert pool.offer(fps).all()
        paths = pool.snapshot(str(tmp_path / "seen"))
        assert len(paths) == 2

        pool2 = ShardedSeenSet(num_shards=2, mode="bloom", bloom_mem_mb=1)
        pool2.restore(str(tmp_path / "seen"))
        assert pool2.contains(fps).all()
        assert not pool2.offer(fps).any()  # everything already seen post-restore
        pool.shutdown()
        pool2.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_table_io_roundtrip(tmp_path):
    import ray.data as rd

    from spiderman_ray.sources.table_io import (
        append_part,
        read_arrow,
        read_dataset,
        write_dataset,
        write_table,
    )

    tbl = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    uri = str(tmp_path / "t1")
    write_table(tbl, uri)
    assert read_arrow(uri).equals(tbl)

    ds = rd.from_arrow(tbl)
    uri2 = str(tmp_path / "t2")
    write_dataset(ds, uri2)
    assert read_dataset(uri2).count() == 3
    assert read_arrow(uri2, columns=["a"]).column_names == ["a"]

    uri3 = str(tmp_path / "t3")
    append_part(tbl, uri3, tag="g0")
    append_part(tbl, uri3, tag="g0")
    assert read_arrow(uri3).num_rows == 6


@pytest.mark.usefixtures("ray_session")
def test_offer_token_idempotent_replay():
    """Ray-task-retry safety: re-offering with the same token returns the
    prior accepts; a different offerer still gets False."""
    from spiderman_ray.state.seen import ShardedSeenSet

    pool = ShardedSeenSet(num_shards=2, mode="exact")
    fps = np.array([md5_upper(f"r{i}") for i in range(40)], dtype=object)
    first = pool.offer(fps, token="g1|hostA#0")
    assert first.all()
    # simulated task retry: same token -> same accepts (NOT all-False)
    replay = pool.offer(fps, token="g1|hostA#0")
    assert replay.all()
    # a different group offering the same fps is still rejected
    other = pool.offer(fps, token="g1|hostB#0")
    assert not other.any()
    # tokens cleared at the generation barrier: replays stop winning
    pool.clear_tokens()
    assert not pool.offer(fps, token="g1|hostA#0").any()
    pool.shutdown()


def test_write_part_idempotent_rewrite(tmp_path):
    """A retried sink task rewrites the SAME part file (content-keyed name)
    instead of duplicating rows."""
    import os

    import pyarrow as pa

    from spiderman_ray.stages.parse_sink import write_part

    schema = pa.schema([("seq", pa.int64()), ("v", pa.string())])
    rows = [{"seq": 1, "v": "a"}, {"seq": 2, "v": "b"}]
    d = str(tmp_path / "t")
    write_part(rows, schema, d, 0)
    write_part(rows, schema, d, 0)  # simulated task retry
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) == 1
    import pyarrow.parquet as pq

    assert pq.read_table(os.path.join(d, files[0])).num_rows == 2


def test_cuckoo_filter_offer_contains_delete():
    from spiderman_ray.state.cuckoo import CuckooFilter

    f = CuckooFilter(mem_mb=1)
    fps = [f"FP{i:04d}ABCDEF" for i in range(500)]
    acc = f.offer_batch(fps)
    assert acc.all()
    assert not f.offer_batch(fps).any()  # second offer rejected
    assert f.contains_batch(fps).all()
    assert f.n_added == 500

    # deletion: un-see half, re-offer accepts exactly those
    half = fps[:250]
    assert f.delete_batch(half).all()
    assert not f.contains_batch(half).any()
    assert f.contains_batch(fps[250:]).all()
    acc2 = f.offer_batch(fps)
    assert acc2[:250].all() and not acc2[250:].any()


def test_cuckoo_snapshot_roundtrip(tmp_path):
    import numpy as np

    from spiderman_ray.state.cuckoo import CuckooFilter

    f = CuckooFilter(mem_mb=1)
    fps = [f"K{i}" for i in range(300)]
    f.offer_batch(fps)
    np.savez_compressed(str(tmp_path / "s"), **f.state())
    st = np.load(str(tmp_path / "s.npz"), allow_pickle=True)
    g = CuckooFilter.from_state(st)
    assert (g.table == f.table).all()
    assert g.contains_batch(fps).all()
    assert g.n_added == f.n_added


def test_cuckoo_capacity_error():
    import pytest

    from spiderman_ray.state.cuckoo import CuckooFilter

    f = CuckooFilter(mem_mb=0)  # floor: 64 buckets x 4 slots = 256 slots
    with pytest.raises(RuntimeError, match="capacity"):
        f.offer_batch([f"X{i}" for i in range(400)])


def test_sharded_seen_cuckoo_mode_and_delete():
    import numpy as np

    from spiderman_ray.state.seen import ShardedSeenSet

    pool = ShardedSeenSet(num_shards=3, mode="cuckoo", bloom_mem_mb=1)
    fps = np.array([f"F{i}" for i in range(200)], dtype=object)
    assert pool.offer(fps).all()
    assert not pool.offer(fps).any()
    assert pool.count() == 200
    assert pool.delete(fps[:50]).all()
    assert pool.count() == 150
    assert pool.offer(fps[:50]).all()  # re-offer after delete accepted
    pool.shutdown()


def test_frontier_shard_push_idempotent_and_pop_wave(ray_session):
    """FrontierShard contract (state/frontier.py): token-idempotent push
    (a Ray task retry cannot double-enqueue), per-(host, gen) buffering,
    soft-cap pop with remaining-row accounting."""
    import ray

    from spiderman_ray import schemas
    from spiderman_ray.state.frontier import FrontierShard, shard_of

    def tbl(urls, host, gen):
        rows = [
            {
                "url": u, "method": "GET", "callback": "list", "body": "",
                "fkey": "", "pagenum": 0, "px": 0, "caption": "",
                "priority": 0, "generation": gen, "seq": i,
                "host": host, "fp": f"fp{u}",
            }
            for i, u in enumerate(urls)
        ]
        return pa.Table.from_pylist(rows, schema=schemas.FRONTIER)

    shard = FrontierShard.remote()
    acc = ray.get(shard.push.remote("w1", tbl(["a", "b", "c"], "h0", 1)))
    assert acc == [("h0", 1, 3)]
    # replayed token: ignored, buffers unchanged
    assert ray.get(shard.push.remote("w1", tbl(["a", "b", "c"], "h0", 1))) == []
    ray.get(shard.push.remote("w2", tbl(["d"], "h1", 1)))
    assert ray.get(shard.counts.remote()) == {("h0", 1): 3, ("h1", 1): 1}

    out, meta = ray.get(shard.pop_wave.remote("h0", 1, None))
    assert meta == {"n": 3, "left": 0}
    assert out["url"].to_pylist() == ["a", "b", "c"]
    # popped key is cleared; the other key is untouched
    assert ray.get(shard.counts.remote()) == {("h1", 1): 1}
    # soft cap: whole buffered tables pop until >= cap rows
    ray.get(shard.push.remote("w3", tbl(["x"], "h1", 1)))
    out, meta = ray.get(shard.pop_wave.remote("h1", 1, 1))
    assert meta["n"] == 1 and meta["left"] == 1
    assert ray.get(shard.clear_tokens.remote()) == 3
    # same host always routes to the same shard
    assert shard_of("h0", 8) == shard_of("h0", 8)
    assert 0 <= shard_of("h0", 8) < 8
