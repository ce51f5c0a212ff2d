"""Standalone dedup_frontier operator (engine fuses this; the module remains
the standalone frontier-dedup op)."""

import pyarrow as pa
import pytest
import ray.data as rd

from spiderman_ray import schemas
from spiderman_ray.parsers import make_request
from spiderman_ray.policy import CrawlPolicy

pytestmark = pytest.mark.usefixtures("ray_session")


def test_dedup_frontier_first_wins_and_seen():
    from spiderman_ray.stages.dedup import dedup_frontier
    from spiderman_ray.state.seen import ShardedSeenSet

    reqs = [
        make_request("https://h0.example/a", "list", generation=0, seq=0, pagenum=1),
        make_request("https://h0.example/b", "list", generation=0, seq=1, pagenum=2),
        make_request("https://h0.example/a", "list", generation=0, seq=2, pagenum=3),  # dup
    ]
    frontier = rd.from_arrow(pa.Table.from_pylist(reqs, schema=schemas.FRONTIER))
    pool = ShardedSeenSet(num_shards=2, mode="exact")
    out = dedup_frontier(frontier, pool, CrawlPolicy()).to_pandas()
    assert sorted(out["url"]) == ["https://h0.example/a", "https://h0.example/b"]
    # first-wins: the surviving /a row is the seq=0 one (pagenum 1)
    assert out[out["url"].str.endswith("/a")]["pagenum"].tolist() == [1]

    # second generation: everything already seen
    out2 = dedup_frontier(frontier, pool, CrawlPolicy()).to_pandas()
    assert len(out2) == 0

    # dedup disabled for 'list': all three pass, nothing recorded
    pool2 = ShardedSeenSet(num_shards=2, mode="exact")
    out3 = dedup_frontier(
        frontier, pool2, CrawlPolicy(dedup_overrides={"list": False})
    ).to_pandas()
    assert len(out3) == 3
    assert pool2.count() == 0
    pool.shutdown()
    pool2.shutdown()
