"""Behavioral tests for the published-recipe pack (pipelines/recipes.py)
on planted corpora — rule bits, line synthesis, banner dedup, LM-score
ordering, importance-weight ordering. Hash parity vs DuckDB is covered by
the gate rehearsal (tools/check_queries.py); these tests pin the SEMANTICS
on inputs where the right answer is hand-derivable."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(d, rows):
    d.mkdir(exist_ok=True)
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    cols["doc_id"] = pa.array(cols["doc_id"], pa.int64())
    pq.write_table(pa.table(cols), str(d / "documents.parquet"))
    return str(d)


def test_gopher_rules_planted_bits(tmp_path):
    from spiderman_ray.pipelines.recipes import gopher_rules

    # 2 stopwords + 38 distinct 4-letter words: passes every rule
    good = "the and " + " ".join(f"wd{i:02d}" for i in range(38))
    rows = [
        {"doc_id": 0, "text": good},
        # too short (bit 1 off)
        {"doc_id": 1, "text": "the and " + " ".join(f"wd{i:02d}" for i in range(8))},
        # one degenerate 30-char token (bit 16 off; mean shifts too)
        {"doc_id": 2, "text": good + " " + "z" * 30},
        # one word repeated 50x: distinct ratio 2% (bit 8 off), 1 stopword
        # (bit 4 off), mean 300 (bit 2 off)
        {"doc_id": 3, "text": " ".join(["the"] * 50)},
    ]
    sf = _write_docs(tmp_path / "g", rows)
    out = gopher_rules(sf).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "rule_mask"] == 31 and out.loc[0, "passes"] == 1
    assert out.loc[1, "rule_mask"] & 1 == 0
    assert out.loc[2, "rule_mask"] & 16 == 0
    assert out.loc[3, "rule_mask"] & (2 | 4 | 8) == 0
    assert out.loc[0, "n_words"] == 40
    # mean_wlen_x100 = 100*(3+3+38*4)//40 = 395
    assert out.loc[0, "mean_wlen_x100"] == 395


def test_c4_line_filter_synthetic_lines(tmp_path):
    from spiderman_ray.pipelines.recipes import c4_line_filter

    # doc 0: L=5, dot iff t%3==0. 45 words -> 9 windows, dots at t=3,6,9
    # -> 3 kept (each 5 words) -> doc kept. Banner has no '.': never kept.
    rows = [
        {"doc_id": 0, "source": "srcA",
         "text": " ".join(f"w{i:02d}" for i in range(45))},
        # doc 4: L=5, dot iff (t+4)%3==0 -> t in {2,5,...}; 12 words ->
        # 3 windows (5,5,2), dotted t=2 has 5 words -> 1 kept -> dropped
        {"doc_id": 4, "source": "srcA",
         "text": " ".join(f"v{i:02d}" for i in range(12))},
    ]
    sf = _write_docs(tmp_path / "c", rows)
    out = c4_line_filter(sf).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_lines"] == 10 and out.loc[0, "n_kept"] == 3
    assert out.loc[0, "kept_words"] == 15 and out.loc[0, "doc_kept"] == 1
    assert out.loc[4, "n_lines"] == 4 and out.loc[4, "n_kept"] == 1
    assert out.loc[4, "doc_kept"] == 0


def test_paragraph_dedup_banner_and_cross_doc(tmp_path):
    from spiderman_ray.pipelines.recipes import paragraph_dedup

    # doc 0 and doc 12 share L=5 and the same dot phase and the SAME words
    # -> every line of doc 12 (banner included, same source) is a dup of
    # doc 0's. doc 3 is unique content on another source.
    words = " ".join(f"w{i:02d}" for i in range(20))
    rows = [
        {"doc_id": 0, "source": "srcA", "text": words},
        {"doc_id": 12, "source": "srcA", "text": words},
        {"doc_id": 3, "source": "srcB",
         "text": " ".join(f"u{i:02d}" for i in range(20))},
    ]
    sf = _write_docs(tmp_path / "p", rows)
    out = paragraph_dedup(sf).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_dropped"] == 0
    assert out.loc[12, "n_kept"] == 0
    assert out.loc[12, "n_dropped"] == out.loc[12, "n_lines"]
    assert out.loc[3, "n_dropped"] == 0


def test_ccnet_ppl_ordering_and_bucket_rule(tmp_path):
    from spiderman_ray.pipelines.recipes import (
        _CCNET_HEAD_MAX,
        _CCNET_MIDDLE_MAX,
        _md5_pct_keep,
        ccnet_ppl_buckets,
    )

    ids = list(range(40))
    keep = _md5_pct_keep(ids, 20)
    assert keep.any() and (~keep).any()
    invocab = "alpha beta gamma delta epsilon"
    rows = [{"doc_id": i, "text": invocab if k else
             ("alpha beta gamma delta epsilon" if i % 2 == 0
              else "zzz qqq xxx yyy www")}
            for i, k in zip(ids, keep)]
    sf = _write_docs(tmp_path / "m", rows)
    out = ccnet_ppl_buckets(sf).to_pandas().set_index("doc_id").sort_index()
    raw_in = [i for i, k in zip(ids, keep) if not k and i % 2 == 0]
    raw_oov = [i for i, k in zip(ids, keep) if not k and i % 2 == 1]
    assert out.loc[raw_in, "nll_avg"].max() < out.loc[raw_oov, "nll_avg"].min()
    # bucket column follows the fixed cutoffs exactly
    for _id, r in out.iterrows():
        want = ("head" if r["nll_avg"] < _CCNET_HEAD_MAX
                else "middle" if r["nll_avg"] < _CCNET_MIDDLE_MAX else "tail")
        assert r["bucket"] == want


def test_dsir_select_prefers_target_like(tmp_path):
    from spiderman_ray.pipelines.recipes import _md5_pct_keep, dsir_select

    ids = list(range(60))
    keep = _md5_pct_keep(ids, 20)
    assert keep.any()
    target_text = "alpha beta gamma delta alpha beta gamma delta"
    rows = [{"doc_id": i, "text": target_text if (k or i % 2 == 0)
             else "junk noise zzz qqq random filler xxx"}
            for i, k in zip(ids, keep)]
    sf = _write_docs(tmp_path / "d", rows)
    out = dsir_select(sf, k=100).to_pandas()
    # raw pool only
    tgt = {i for i, k in zip(ids, keep) if k}
    assert not (set(out["doc_id"]) & tgt)
    byid = out.set_index("doc_id")["weight"]
    raw_in = [i for i, k in zip(ids, keep) if not k and i % 2 == 0]
    raw_junk = [i for i, k in zip(ids, keep) if not k and i % 2 == 1]
    assert byid[raw_in].min() > byid[raw_junk].max()
    # sorted by weight desc with doc_id tiebreak
    w = list(out["weight"])
    assert w == sorted(w, reverse=True)


def test_bm25_ranking_planted(tmp_path):
    from spiderman_ray.pipelines.retrieval import bm25_search

    # equal doc lengths so tf alone orders q0 ("join slow") scores:
    # doc 0 has join x5, doc 1 join x1, doc 2 join+slow, rest no terms
    pad = lambda ws: " ".join(ws + [f"f{i:02d}" for i in range(10 - len(ws))])
    rows = [
        {"doc_id": 0, "text": pad(["join"] * 5)},
        {"doc_id": 1, "text": pad(["join"])},
        {"doc_id": 2, "text": pad(["join", "slow"])},
    ] + [{"doc_id": i, "text": pad([])} for i in range(3, 30)]
    sf = _write_docs(tmp_path / "b", rows)
    out = bm25_search(sf).to_pandas()
    q0 = out[out["query"] == "q0"].set_index("doc_id")
    # only the 3 term-bearing docs score
    assert set(q0.index) == {0, 1, 2}
    # two matched terms beat one; higher tf beats lower tf
    assert q0.loc[2, "score"] > q0.loc[1, "score"]
    assert q0.loc[0, "score"] > q0.loc[1, "score"]
    # ranks are 1..n by (score desc, doc_id asc)
    r = q0.sort_values("rank")
    assert list(r["rank"]) == list(range(1, len(r) + 1))
    assert list(r["score"]) == sorted(r["score"], reverse=True)


def test_split_leakage_planted_cross_split_dup(tmp_path):
    import numpy as np

    from spiderman_ray.pipelines.text import _md5_priority, split_leakage

    t_train, t_val = (80 << 32) // 100, (90 << 32) // 100
    pri = _md5_priority(list(range(200)))
    split = np.where(pri < t_train, "train", np.where(pri < t_val, "val", "test"))
    trains = [i for i in range(200) if split[i] == "train"]
    tests = [i for i in range(200) if split[i] == "test"]
    assert trains and tests
    dup = "the exact same duplicated body of shared text content here"
    cross = (trains[0], tests[0])      # leaks
    same = (trains[1], trains[2])      # dup but same split: must NOT leak
    rows = []
    for i in range(60):
        if i in cross:
            rows.append({"doc_id": i, "text": dup})
        elif i in same:
            rows.append({"doc_id": i, "text": dup + " extra"})
        else:
            rows.append({"doc_id": i,
                         "text": f"unique doc {i} tokens {i*7} {i*13} {i*29}"})
    sf = _write_docs(tmp_path / "l", rows)
    out = split_leakage(sf).to_pandas()
    got = set(zip(out["a"], out["b"]))
    lo, hi = min(cross), max(cross)
    assert (lo, hi) in got
    assert (min(same), max(same)) not in got
    row = out[(out["a"] == lo) & (out["b"] == hi)].iloc[0]
    assert {row["split_a"], row["split_b"]} == {"train", "test"}


def test_hard_negative_mining_skips_same_label(tmp_path):
    import numpy as np

    from spiderman_ray.pipelines.vectors import hard_negative_mining

    # v1 is v0's nearest neighbor but shares its label; v2 (different
    # label, farther) must be picked as the hard negative instead
    vecs = {
        0: ([1.0, 0.0], 0),
        1: ([0.99, 0.141], 0),
        2: ([0.9, 0.436], 1),
        3: ([-1.0, 0.0], 1),
    }
    d = tmp_path / "e"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(vecs), pa.int64()),
                "embedding": pa.array(
                    [np.asarray(v, dtype=np.float32) for v, _ in vecs.values()],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([l for _, l in vecs.values()], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    out = hard_negative_mining(str(d)).to_pandas().set_index("vec_id").sort_index()
    assert out.loc[0, "neg_id"] == 2          # not same-label v1
    assert out.loc[1, "neg_id"] == 2
    assert out.loc[2, "neg_id"] == 1          # v2's closest other-label
    assert out.loc[3, "neg_id"] in (0, 1)
    assert len(out) == 4                      # every vector has a negative


@pytest.mark.slow
def test_recipe_curate_is_component_intersection():
    """The composed flagship's survivor set must equal the intersection
    of its four component predicates computed independently (catches
    union-tag / pivot-merge bugs; SQL-hash parity is the gate's job)."""
    from spiderman_ray.pipelines.recipes import (
        c4_line_filter,
        ccnet_ppl_buckets,
        gopher_rules,
        paragraph_dedup,
        recipe_curate,
    )

    sf = "/root/testdata/sf0.001"
    g = gopher_rules(sf).to_pandas().set_index("doc_id")
    c = c4_line_filter(sf).to_pandas().set_index("doc_id")
    p = paragraph_dedup(sf).to_pandas().set_index("doc_id")
    m = ccnet_ppl_buckets(sf).to_pandas().set_index("doc_id")
    want = {
        i for i in g.index
        if g.loc[i, "passes"] == 1 and c.loc[i, "doc_kept"] == 1
        and p.loc[i, "n_dropped"] * 5 <= p.loc[i, "n_lines"]
        and m.loc[i, "bucket"] != "tail"
    }
    out = recipe_curate(sf).to_pandas()
    assert set(out["doc_id"]) == want
    assert len(out) == len(want) and len(want) > 0
    # carried columns agree with the components
    row = out.iloc[0]
    assert row["n_words"] == g.loc[row["doc_id"], "n_words"]
    assert row["nll_avg"] == m.loc[row["doc_id"], "nll_avg"]


def test_ann_query_indexed_equals_ivf(tmp_path):
    """The persisted-index search must equal the on-the-fly IVF search
    row-for-row at a PRUNING nprobe (only probed partitions are read),
    and the index must be rebuildable into an explicit dest."""
    from spiderman_ray.pipelines.vectors import (
        ann_ivf_topk,
        ann_query_indexed,
        build_ann_index,
    )

    sf = "/root/testdata/sf0.001"
    meta = build_ann_index(sf, str(tmp_path / "idx"))
    assert meta["n_centroids"] == 16 and meta["n_vectors"] > 0
    a = ann_ivf_topk(sf, nprobe=4).to_pandas()
    b = ann_query_indexed(sf, index_dir=str(tmp_path / "idx"), nprobe=4).to_pandas()
    assert a.equals(b)


@pytest.mark.slow
def test_training_shards_store_layout_and_totals(tmp_path):
    import glob
    import os

    from spiderman_ray.pipelines.bpe import (
        bpe_encode,
        training_shards,
        write_training_shards,
    )

    sf = "/root/testdata/sf0.001"
    dest = str(tmp_path / "shards")
    meta = write_training_shards(sf, dest)
    # one hive partition per shard, each with parquet parts (resumable)
    dirs = sorted(glob.glob(os.path.join(dest, "shard=*")))
    assert len(dirs) == meta["n_shards"] > 1
    out = training_shards(sf, dest=dest).to_pandas().sort_values("shard_id")
    assert list(out["shard_id"]) == list(range(len(out)))
    # totals equal the per-doc encode contract
    enc = bpe_encode(sf).to_pandas()
    assert out["n_tokens"].sum() == enc["n_bpe_tokens"].sum() == meta["n_tokens"]
    assert out["n_docs"].sum() == len(enc) == meta["n_docs"]
    # doc-granularity packing: every shard but the last holds >= the
    # 4096-token budget minus one doc's worth of slack, i.e. its FIRST
    # doc started inside the shard's token range
    assert (out["n_tokens"] > 0).all()


@pytest.mark.slow
def test_training_shards_resume_skips_finished(tmp_path):
    import glob
    import os
    import shutil

    from spiderman_ray.pipelines.bpe import training_shards, write_training_shards

    sf = "/root/testdata/sf0.001"
    dest = str(tmp_path / "s")
    meta = write_training_shards(sf, dest)
    before = training_shards(sf, dest=dest).to_pandas().sort_values("shard_id")
    # simulate a crash: lose two partitions, then resume
    victims = sorted(glob.glob(os.path.join(dest, "shard=*")))[:2]
    for v in victims:
        shutil.rmtree(v)
    meta2 = write_training_shards(sf, dest)
    assert meta2["n_shards_skipped"] == meta["n_shards"] - 2
    after = training_shards(sf, dest=dest).to_pandas().sort_values("shard_id")
    assert before.reset_index(drop=True).equals(after.reset_index(drop=True))


def test_source_distinct_shingles_accuracy():
    """The grouped-HLL estimate must land within standard HLL error
    (~1.04/sqrt(4096) = 1.6%; assert 5%) of the exact per-source
    distinct-shingle count, for every source."""
    import duckdb

    from spiderman_ray.pipelines.sketches import source_distinct_shingles

    sf = "/root/testdata/sf0.001"
    est = source_distinct_shingles(sf).to_pandas().set_index("source")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    exact = con.execute(
        "WITH d AS (SELECT source, string_split(text,' ') AS ws FROM documents), "
        "sh AS (SELECT source, CASE WHEN len(ws) < 3 THEN [array_to_string(ws,' ')] "
        "ELSE list_distinct(list_transform(range(1, len(ws)-1), "
        "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s FROM d) "
        "SELECT source, COUNT(DISTINCT g) AS n FROM "
        "(SELECT source, unnest(s) AS g FROM sh) GROUP BY source"
    ).df().set_index("source")
    assert set(est.index) == set(exact.index)
    for src in est.index:
        n, e = int(exact.loc[src, "n"]), int(est.loc[src, "n_shingles_est"])
        assert abs(e - n) <= max(0.05 * n, 3), (src, n, e)


@pytest.mark.slow
def test_incremental_image_dedup_properties(tmp_path):
    """On a real t1 crawl image store: every admitted id is NEW by the
    md5 split, admitted content fps are unique and absent from the base
    snapshot, and no admitted image sits in a pHash component that
    holds a base image (the VALUES-pin gate checks exact equality; this
    pins the semantics independently of the pin generator)."""
    import hashlib

    import pyarrow.compute as pc

    from spiderman_ray.pipelines.images import (
        image_dedup_exact,
        image_phash_clusters,
        incremental_image_dedup,
        read_dataset,
    )
    from spiderman_ray.policy import CrawlPolicy
    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.simweb import SimParams

    out = str(tmp_path / "run")
    eng = CrawlEngine(SimParams.for_scale("t1"), CrawlPolicy(), out_dir=out)
    eng.run()
    eng._pool.shutdown()
    uri = f"{out}/tables/images"
    thresh = (50 << 32) // 100
    new = lambda i: int(hashlib.md5(i.encode()).hexdigest()[:8], 16) >= thresh
    adm = set(incremental_image_dedup(uri).to_pandas()["image_id"])
    assert adm and all(new(i) for i in adm)
    fps = image_dedup_exact(uri).to_pandas()
    by_id = fps.set_index("image_id")["content_fp"]
    base_fps = {f for i, f in by_id.items() if not new(i)}
    adm_fps = [by_id[i] for i in adm]
    assert len(set(adm_fps)) == len(adm_fps)
    assert not (set(adm_fps) & base_fps)
    cl = image_phash_clusters(uri).to_pandas()
    comp = cl.groupby("cluster_id")["image_id"].apply(list)
    for ms in comp:
        if any(not new(m) for m in ms):
            assert not (set(ms) & adm) or all(new(m) for m in ms)
        # all-new components admit at most one member
        if all(new(m) for m in ms):
            assert len(set(ms) & adm) <= 1
    # the gated flagship obeys the same invariants plus the caption gate
    from spiderman_ray.pipelines.images import curate_images_incremental

    ci = curate_images_incremental(uri).to_pandas()
    assert len(ci) and all(new(i) for i in ci["image_id"])
    assert (ci["n_caption_tokens"] >= 2).all() and (ci["w"] > 0).all()
    ci_fps = [by_id[i] for i in ci["image_id"]]
    assert len(set(ci_fps)) == len(ci_fps)
    assert not (set(ci_fps) & base_fps)
    for ms in comp:
        got = set(ms) & set(ci["image_id"])
        if any(not new(m) for m in ms):
            assert not got
        else:
            assert len(got) <= 1
    # phash retrieval on the same store: per query, ranks 1..k with
    # nondecreasing hamming and no self-hit
    from spiderman_ray.pipelines.images import phash_search

    ps = phash_search(uri).to_pandas()
    for qid, g in ps.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert list(g["hamming"]) == sorted(g["hamming"])
        assert qid not in set(g["image_id"])


def test_bloom_index_roundtrip_and_mismatch(tmp_path):
    import pytest as _pytest

    from spiderman_ray.pipelines.text import (
        build_bloom_index,
        decontaminate_bloom,
        decontaminate_bloom_indexed,
    )

    sf = "/root/testdata/sf0.001"
    meta = build_bloom_index(sf, str(tmp_path / "b"))
    assert meta["n_set_bits"] > 0
    a = decontaminate_bloom(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (decontaminate_bloom_indexed(sf, index_dir=str(tmp_path / "b"))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    with _pytest.raises(ValueError, match="parameter mismatch"):
        decontaminate_bloom_indexed(sf, index_dir=str(tmp_path / "b"), k=9)


def test_incremental_minhash_indexed_equals_recompute(tmp_path):
    """The stored-band near-dup admission must equal the
    recompute-everything path row-for-row (deterministic MinHasher ->
    identical candidate/verified pair sets -> identical labels)."""
    from spiderman_ray.pipelines.text import (
        build_dedup_index,
        incremental_dedup_minhash,
        incremental_dedup_minhash_indexed,
    )

    sf = "/root/testdata/sf0.001"
    build_dedup_index(sf, str(tmp_path / "ix"))
    a = (incremental_dedup_minhash(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (incremental_dedup_minhash_indexed(sf, index_dir=str(tmp_path / "ix"))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(a) > 0 and a.equals(b)


def test_length_quality_curve_tiles_corpus():
    """Bucket doc counts must tile the corpus and agree with
    length_buckets' histogram; quality follows the integer contract."""
    from spiderman_ray.pipelines.text import length_buckets, length_quality_curve

    sf = "/root/testdata/sf0.001"
    lq = length_quality_curve(sf).to_pandas().set_index("bucket").sort_index()
    lb = length_buckets(sf).to_pandas().set_index("bucket").sort_index()
    assert lq["n_docs"].sum() == 500
    assert list(lq.index) == list(lb.index)
    assert (lq["n_docs"] == lb["n_docs"]).all()
    assert (lq["sum_tokens"] == lb["n_tokens"]).all()
    assert (lq["quality_x1000"]
            == 1000 * lq["sum_logcount2"] // lq["sum_tokens"]).all()
