"""Pipeline-level tests: multimodal stages, ANN recall, near-dup detection
with planted ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def images_table(tmp_path_factory):
    """Small input_hint-shaped table incl. one planted near-duplicate pair
    (same pixels, png vs jpeg encode)."""
    from spiderman_ray.functions.imaging import (
        decode_image,
        encode_image,
        generate_pixels,
        phash64,
    )

    rows = []
    for i in range(12):
        px = generate_pixels(f"imgtab-{i}", 64, 48)
        fmt = "png" if i % 3 == 0 else "jpeg"
        data = encode_image(px, fmt)
        rows.append(
            {
                "image_id": f"ID{i:03d}",
                "bytes": data,
                "w": 64,
                "h": 48,
                "fmt": fmt,
                "caption": f"caption {i}",
                "phash": phash64(decode_image(data)),
            }
        )
    # planted near-dup: re-encode image 0's pixels lossily
    px0 = generate_pixels("imgtab-0", 64, 48)
    data = encode_image(px0, "jpeg")
    rows.append(
        {
            "image_id": "ID999",
            "bytes": data,
            "w": 64,
            "h": 48,
            "fmt": "jpeg",
            "caption": "near dup of 0",
            "phash": phash64(decode_image(data)),
        }
    )
    d = tmp_path_factory.mktemp("imgs")
    pq.write_table(pa.Table.from_pylist(rows), str(d / "part-0.parquet"))
    return str(d)


def test_decode_validate_all_ok(images_table):
    from spiderman_ray.pipelines.images import validate_summary

    out = validate_summary(images_table).to_pydict()
    assert out["n_images"] == [13]
    assert out["n_w_bad"] == [0] and out["n_h_bad"] == [0] and out["n_phash_bad"] == [0]


def test_caption_align_matches_sequential_and_embed_contract(images_table):
    """CLIP-stub alignment: the actor-pool stage equals a single-process
    recompute with the shared scoring function; embeddings are unit-norm
    float32 (or exactly zero for empty captions, scoring floor(0)=0)."""
    import numpy as np

    from spiderman_ray.functions.alignment import (
        align_score_x1e6,
        caption_embed,
        image_embed,
    )
    from spiderman_ray.functions.imaging import decode_image, generate_pixels
    from spiderman_ray.pipelines.multimodal import caption_align

    got = caption_align(images_table).to_pandas().set_index("image_id")["align_x1e6"]
    src = pq.read_table(images_table).to_pylist()
    assert len(got) == len(src)
    for r in src:
        assert got[r["image_id"]] == align_score_x1e6(
            decode_image(r["bytes"]), r["caption"]
        )

    px = generate_pixels("align-unit", 32, 32)
    for v in (image_embed(px), caption_embed("some caption words")):
        assert v.dtype == np.float32 and abs(float(np.dot(v, v)) - 1.0) < 1e-5
    z = caption_embed("")
    assert z.dtype == np.float32 and not z.any()
    assert align_score_x1e6(px, "") == 0


def test_phash_near_dups_finds_planted_pair(images_table):
    from spiderman_ray.pipelines.images import phash_near_dups

    pairs = phash_near_dups(images_table, max_hamming=3).to_pydict()
    assert ("ID000", "ID999") in list(zip(pairs["a"], pairs["b"]))


def test_phash_near_dups_skewed_bucket_matches_brute_force(tmp_path):
    """Vectorized pair enumeration at a scale where ONE band bucket holds
    >1k images (the round-2 verdict's skew scenario): every hash shares
    band-0, so the bucket is 1230 wide; the result must equal an exact
    all-pairs popcount. phash_near_dups reads only (image_id, phash), so
    the fixture needs no pixel payloads."""
    from spiderman_ray.pipelines.images import phash_near_dups

    rng = np.random.default_rng(17)
    n = 1200
    base = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    base = (base & ~np.uint64(0xFFFF)) | np.uint64(0x1234)  # shared band 0
    twins = base[:30].copy()
    for i in range(30):  # flip 1-3 bits in the upper 48
        for b in rng.choice(np.arange(16, 64), size=1 + i % 3, replace=False):
            twins[i] ^= np.uint64(1) << np.uint64(b)
    hashes = np.concatenate([base, twins])
    ids = [f"P{i:05d}" for i in range(len(hashes))]
    d = tmp_path / "phash_skew"
    d.mkdir()
    pq.write_table(
        pa.table({"image_id": ids, "phash": pa.array(hashes.astype(np.int64))}),
        str(d / "part-0.parquet"),
    )

    got = phash_near_dups(str(d), max_hamming=3).to_pydict()
    got_pairs = set(zip(got["a"], got["b"]))

    from spiderman_ray.pipelines.text import _popcount64

    iu0, iu1 = np.triu_indices(len(hashes), 1)
    ham = _popcount64(hashes[iu0] ^ hashes[iu1])
    keep = ham <= 3
    want_pairs = {(ids[i], ids[j]) for i, j in zip(iu0[keep], iu1[keep])}
    assert len(want_pairs) >= 30  # the planted twins are all in range
    assert got_pairs == want_pairs


@pytest.mark.slow
def test_image_dedup_survivors_exact_and_phash(tmp_path):
    """Survivors drop (a) exact byte dups (first image_id wins) and
    (b) pHash-dominated near-dups (component keeps min image_id);
    the cap=0 forced-distributed path (hashed-node CC + distributed
    min-id resolution) returns the identical set."""
    from spiderman_ray.pipelines.images import image_dedup_survivors

    rng = np.random.default_rng(3)
    rows = []
    base_ph = rng.integers(0, 1 << 62, size=20, dtype=np.uint64)
    for i in range(20):
        rows.append({"image_id": f"I{i:03d}", "bytes": f"payload-{i}".encode(),
                     "phash": int(base_ph[i].astype(np.int64))})
    # exact dup of I000 (same bytes AND phash) under a later id
    rows.append({"image_id": "I900", "bytes": b"payload-0",
                 "phash": int(base_ph[0].astype(np.int64))})
    # pHash near-dups: 2 flipped bits off I001; a 2-member cluster off I002
    for new_id, src, nbits in [("I901", 1, 2), ("I902", 2, 1), ("I903", 2, 3)]:
        ph = base_ph[src]
        for b in rng.choice(np.arange(64), size=nbits, replace=False):
            ph = ph ^ (np.uint64(1) << np.uint64(b))
        rows.append({"image_id": new_id, "bytes": f"body-{new_id}".encode(),
                     "phash": int(ph.astype(np.int64))})
    d = tmp_path / "imgsurv"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "part-0.parquet"))

    want = {f"I{i:03d}" for i in range(20)}  # all planted dups drop
    got = set(image_dedup_survivors(str(d)).to_pandas()["image_id"])
    assert got == want
    dist = set(image_dedup_survivors(str(d), driver_pair_cap=0).to_pandas()["image_id"])
    assert dist == want

    # audit view: every image labeled, components keep min image_id
    from spiderman_ray.pipelines.images import image_phash_clusters

    cl = image_phash_clusters(str(d)).to_pandas()
    labels = dict(zip(cl["image_id"], cl["cluster_id"]))
    assert len(labels) == len(rows)
    want_labels = {r["image_id"]: r["image_id"] for r in rows}
    want_labels.update({"I900": "I000", "I901": "I001",
                        "I902": "I002", "I903": "I002"})
    assert labels == want_labels
    cl0 = image_phash_clusters(str(d), driver_pair_cap=0).to_pandas()
    assert dict(zip(cl0["image_id"], cl0["cluster_id"])) == want_labels


def test_curate_images_gates_and_dedup(tmp_path):
    """The multimodal curation flagship drops exactly: validation
    failures (stored dims wrong), short captions, dirty-word captions,
    exact byte dups (first image_id wins) and pHash-dominated near-dups
    (jpeg re-encode of the same pixels)."""
    from spiderman_ray.functions.imaging import (
        decode_image,
        encode_image,
        generate_pixels,
        phash64,
    )
    from spiderman_ray.pipelines.images import curate_images

    def mk(iid, seedtag, caption, fmt="png"):
        px = generate_pixels(seedtag, 64, 48)
        data = encode_image(px, fmt)
        return {"image_id": iid, "bytes": data, "w": 64, "h": 48, "fmt": fmt,
                "caption": caption, "phash": phash64(decode_image(data))}

    rows = [mk(f"C{i:03d}", f"cur-{i}", f"nice caption {i}") for i in range(8)]
    rows.append(mk("C900", "cur-0", "same bytes as zero"))  # exact dup
    rows.append(mk("C901", "cur-1x", "short"))              # 1-token caption
    rows.append(mk("C902", "cur-2x", "please drop me now"))  # dirty word
    bad = mk("C903", "cur-3x", "stored width is wrong")
    bad["w"] = 999                                           # validation gate
    rows.append(bad)
    rows.append(mk("C904", "cur-4", "near dup of four", fmt="jpeg"))  # pHash dup
    d = tmp_path / "curimg"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "part-0.parquet"))

    got = curate_images(str(d)).to_pandas().sort_values("image_id")
    assert got["image_id"].tolist() == [f"C{i:03d}" for i in range(8)]
    assert (got["w"] == 64).all() and (got["h"] == 48).all()
    assert (got["n_caption_tokens"] == 3).all()
    assert got["n_caption_tokens"].dtype == np.int64

    # the LAION-style alignment gate composes in BEFORE dedup and keeps
    # exactly the survivors whose score clears the threshold
    from spiderman_ray.functions.alignment import align_score_x1e6

    scores = {
        r["image_id"]: align_score_x1e6(decode_image(r["bytes"]), r["caption"])
        for r in rows
    }
    thr = sorted(scores[f"C{i:03d}"] for i in range(8))[4]  # keeps 4 of 8
    gated = curate_images(str(d), align_min_x1e6=thr).to_pandas()
    want = sorted(
        iid for iid in (f"C{i:03d}" for i in range(8)) if scores[iid] >= thr
    )
    assert sorted(gated["image_id"]) == want and len(want) == 4


def test_thumbnails(images_table):
    from spiderman_ray.functions.imaging import decode_image
    from spiderman_ray.pipelines.multimodal import thumbnails

    out = thumbnails(images_table, size=16, concurrency=2).to_pandas()
    assert len(out) == 13
    for _, r in out.iterrows():
        px = decode_image(r["bytes"])
        assert px.shape == (16, 16, 3)
        assert r["w"] == 16 and r["h"] == 16


def test_audio_features_fake_and_video_stub():
    import ray.data as rd

    from spiderman_ray.pipelines.multimodal import AudioFeatures, video_frame_sample

    tbl = pa.table(
        {
            "clip_id": ["c1", "c2"],
            "payload": [b"\x01\x02\x03\x04fakebytes", b"other-fake-bytes"],
        }
    )
    fake = {"fn_constructor_kwargs": {"mode": "deterministic_fake"}}
    out = (
        rd.from_arrow(tbl)
        .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=8,
                     concurrency=1, **fake)
        .to_pandas()
    )
    assert list(out.columns) == ["clip_id", "duration_ms", "rms_x1e6", "n_frames"]
    assert (out["n_frames"] == 4).all()
    # deterministic: same payload -> same features
    out2 = (
        rd.from_arrow(tbl)
        .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=8,
                     concurrency=1, **fake)
        .to_pandas()
    )
    pd.testing.assert_frame_equal(out, out2)

    with pytest.raises(NotImplementedError):
        AudioFeatures(mode="real")

    # video fallback: deterministic-fake decoder for opaque non-SPV1 bytes —
    # every 8th frame sampled, frames encoded as PNG binary, schema enforced
    from spiderman_ray.functions.imaging import decode_image
    from spiderman_ray.pipelines.multimodal import VIDEO_FRAMES, VideoFrameSampler

    vids = pa.table(
        {
            "video_id": ["v1", "v2"],
            "payload": [b"\x05\x06videobytes" * 300, b"tiny"],
        }
    )
    frames = (
        rd.from_arrow(vids)
        .map_batches(VideoFrameSampler,
                     fn_constructor_kwargs={"every_nth": 8,
                                            "mode": "deterministic_fake"},
                     batch_format="pyarrow", batch_size=8, concurrency=1)
        .to_pandas()
    )
    assert list(frames.columns) == list(VIDEO_FRAMES.names)
    v1 = frames[frames["video_id"] == "v1"]
    assert len(v1) == (len(b"\x05\x06videobytes" * 300) // 256 + 7) // 8
    assert (v1["frame_idx"] % 8 == 0).all()
    px = decode_image(v1.iloc[0]["frame_bytes"])
    assert px.shape == (16, 16, 3)
    assert len(frames[frames["video_id"] == "v2"]) == 1  # tiny payload: 1 frame
    with pytest.raises(NotImplementedError):
        VideoFrameSampler(mode="real")


def test_audio_wav_real_decode():
    """RIFF/WAVE codec: encode/decode round-trip is bit-exact, the chunk
    walker skips unknown chunks and handles 8-bit + stereo, and the wav-mode
    AudioFeatures stage ≡ the fake-mode features on make_audio clips (same
    sample rule, but arrived at through a real container parse)."""
    import struct

    import ray.data as rd

    from spiderman_ray.functions.audio import decode_wav, encode_wav, make_audio
    from spiderman_ray.pipelines.multimodal import AudioFeatures

    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32768, size=701, dtype=np.int16)
    got, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and (got[:, 0] == mono).all()
    stereo = rng.integers(-32768, 32768, size=(64, 2), dtype=np.int16)
    got2, _ = decode_wav(encode_wav(stereo, 44100))
    assert (got2 == stereo).all()

    # robustness: a LIST chunk between fmt and data must be skipped
    payload = encode_wav(mono, 8000)
    fmt_at = payload.index(b"fmt ")
    fmt_len = struct.unpack_from("<I", payload, fmt_at + 4)[0]
    cut = fmt_at + 8 + fmt_len
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:cut] + extra + payload[cut:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got3, _ = decode_wav(spliced)
    assert (got3[:, 0] == mono).all()

    for bad in (b"RIFFxxxx", b"", b"RIFF" + b"\x00" * 20):
        with pytest.raises(ValueError):
            decode_wav(bad)

    # engine parity: wav-mode features over real containers == fake-mode
    # features over the raw bytes (make_audio implements the same rule)
    datas = [b"wav-clip-one " * 40, b"z", b""]
    clips = pa.table(
        {
            "clip_id": ["a", "b", "c"],
            "payload": [make_audio(d) for d in datas],
        }
    )
    raw = pa.table({"clip_id": ["a", "b", "c"], "payload": datas})
    w = (
        rd.from_arrow(clips)
        .map_batches(AudioFeatures, fn_constructor_kwargs={"mode": "wav"},
                     batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    f = (
        rd.from_arrow(raw)
        .map_batches(AudioFeatures,
                     fn_constructor_kwargs={"mode": "deterministic_fake"},
                     batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    pd.testing.assert_frame_equal(
        w.sort_values("clip_id").reset_index(drop=True),
        f.sort_values("clip_id").reset_index(drop=True),
    )


def test_video_spv1_real_decode():
    """SPV1 container: encode/seek/decode round-trip is bit-exact (PNG
    frames), and the actor-pool sampler's output ≡ a sequential recompute
    that decodes EVERY sampled frame independently."""
    import ray.data as rd

    from spiderman_ray.pipelines.multimodal import (
        decode_video_frame,
        encode_video,
        make_video,
        video_frame_sample,
        video_header,
    )

    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, size=(11, 16, 16, 3), dtype=np.uint8)
    payload = encode_video(src, "png")
    fmt, n, w, h, off = video_header(payload)
    assert (fmt, n, w, h) == ("png", 11, 16, 16)
    for i in (0, 5, 10):  # seek decode is lossless and random-access
        assert (decode_video_frame(payload, i) == src[i]).all()
    with pytest.raises(IndexError):
        decode_video_frame(payload, 11)

    # make_video pixel rule: pixel[i] = data[(f*768 + i) % len] — verify,
    # then run the Ray stage and compare with the sequential recompute
    datas = [b"spv-doc-one " * 97, b"x", b""]  # 4 frames, 1 frame, empty
    vids = pa.table(
        {
            "video_id": ["a", "b", "c"],
            "payload": [make_video(d) for d in datas],
        }
    )
    got = (
        video_frame_sample(rd.from_arrow(vids), every_nth=2, mode="spv1")
        .to_pandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for vid, data in zip(["a", "b", "c"], datas):
        nf = max(1, len(data) // 256)
        for f in range(0, nf, 2):
            if data:
                b = np.frombuffer(data, dtype=np.uint8)
                s = int(b[(f * 768 + np.arange(768)) % len(b)].sum(dtype=np.int64))
            else:
                s = 0
            exp_rows.append((vid, f, 16, 16, s))
    assert (
        list(got[["video_id", "frame_idx", "w", "h", "px_sum"]].itertuples(
            index=False, name=None))
        == exp_rows
    )
    # frame bytes are the stored container stills (decode matches the rule)
    from spiderman_ray.functions.imaging import decode_image as dec

    r0 = got.iloc[0]
    assert int(dec(r0["frame_bytes"]).sum(dtype=np.int64)) == r0["px_sum"]


def test_ann_ivf_recall_vs_exact():
    from spiderman_ray.pipelines.vectors import ann_cosine_topk, ann_ivf_topk

    sf = "/root/testdata/sf0.001"
    exact = ann_cosine_topk(sf, n_queries=8, k=5).to_pandas()
    approx = ann_ivf_topk(sf, n_queries=8, k=5, n_centroids=8, nprobe=4).to_pandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls  # nprobe=4 of 8 centroids


def test_knn_graph_ivf_exhaustive_equals_exact_and_recall_monotone():
    """nprobe == n_centroids probes every candidate cluster, so the IVF
    graph must equal exact knn_graph ROW-FOR-ROW (same quantized sims,
    same ranking) — the driver gate's hash contract; below that, recall
    vs exact grows with nprobe (measured 0.43/0.63/0.85 at 2/4/8)."""
    from spiderman_ray.pipelines.vectors import knn_graph, knn_graph_ivf

    sf = "/root/testdata/sf0.001"
    exact = (
        knn_graph(sf).to_pandas().sort_values(["vec_id", "rank"]).reset_index(drop=True)
    )
    full = (
        knn_graph_ivf(sf, nprobe=16)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    assert exact.equals(full)

    e = set(zip(exact["vec_id"], exact["neighbor_id"]))

    def recall(npr):
        a = knn_graph_ivf(sf, nprobe=npr).to_pandas()
        assert len(a) == len(exact)  # k rows per vector either way
        return len(e & set(zip(a["vec_id"], a["neighbor_id"]))) / len(e)

    r4, r8 = recall(4), recall(8)
    assert r4 >= 0.5, r4
    assert r8 >= r4, (r4, r8)


def test_ann_recall_eval_engine_matches_reference_and_exhaustive_is_perfect():
    """The distributed recall eval must agree with the single-process
    recompute (the frozen-VALUES pin), and at nprobe == n_centroids the
    IVF graph is the exact graph so recall is exactly 1.0."""
    from spiderman_ray.pipelines.vectors import (
        ann_recall_eval,
        ann_recall_eval_reference,
    )

    sf = "/root/testdata/sf0.001"
    eng = ann_recall_eval(sf).to_pandas().iloc[0].to_dict()
    ref = ann_recall_eval_reference(sf)[0]
    assert eng == ref, (eng, ref)
    assert 0 < eng["recall_x1m"] <= 1_000_000

    full = ann_recall_eval(sf, nprobe=16, n_centroids=16).to_pandas().iloc[0]
    assert int(full["recall_x1m"]) == 1_000_000
    assert int(full["hits"]) == int(full["total"])


def test_minhash_eval_engine_matches_reference():
    """The distributed LSH-banding eval must agree with the single-
    process recompute (the frozen-VALUES pin), and its gold total
    (tp + fn) must equal the exact Jaccard pair count."""
    from spiderman_ray.pipelines.text import (
        minhash_eval,
        minhash_eval_reference,
        ngram_jaccard_pairs,
    )

    sf = "/root/testdata/sf0.001"
    eng = minhash_eval(sf).to_pandas().iloc[0].to_dict()
    ref = minhash_eval_reference(sf)[0]
    assert eng == ref, (eng, ref)
    assert eng["tp"] + eng["fn"] == ngram_jaccard_pairs(sf).count()
    assert eng["n_candidates"] == eng["tp"] + eng["fp"]


def test_dup_cluster_sizes_matches_clusters_and_covers_corpus():
    """The histogram must be exactly the size distribution of
    minhash_clusters' labels, and sum(size * n_clusters) = corpus rows."""
    import pyarrow.parquet as pq_

    from spiderman_ray.pipelines.text import dup_cluster_sizes, minhash_clusters

    sf = "/root/testdata/sf0.001"
    hist = dup_cluster_sizes(sf).to_pandas()
    labels = minhash_clusters(sf).to_pandas()
    direct = (
        labels.groupby("cluster_id").size().value_counts().sort_index()
    )
    assert list(hist["size"]) == list(direct.index)
    assert list(hist["n_clusters"]) == list(direct.values)
    n_docs = pq_.read_metadata(f"{sf}/documents.parquet").num_rows
    assert int((hist["size"] * hist["n_clusters"]).sum()) == n_docs


def test_curation_funnel_monotone_and_consistent_with_curate_v2():
    """Funnel counts must be monotone non-increasing stage to stage and
    its final count must equal the curate_v2 manifest's row count."""
    from spiderman_ray.pipelines.text import curate_v2, curation_funnel

    sf = "/root/testdata/sf0.001"
    row = curation_funnel(sf).to_pandas().iloc[0]
    cols = ["n_input", "after_len", "after_dirty", "after_bench",
            "after_zlib", "after_dedup", "after_decon", "after_quota"]
    vals = [int(row[c]) for c in cols]
    assert all(a >= b for a, b in zip(vals, vals[1:])), vals
    assert vals[0] > 0
    assert vals[-1] == curate_v2(sf).count()


def test_minhash_finds_planted_near_dup(tmp_path):
    """Plant a doc that shares ~90% of its shingles with another."""
    base = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    t0 = base.iloc[0]["text"]
    words = t0.split()
    dup = " ".join(words[: int(len(words) * 0.95)]) + " zzz"
    planted = pd.concat(
        [
            base[["doc_id", "text"]],
            pd.DataFrame({"doc_id": [99999], "text": [dup]}),
        ]
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(planted, preserve_index=False), str(d / "documents.parquet")
    )
    from spiderman_ray.pipelines.text import minhash_verified_pairs

    pairs = minhash_verified_pairs(str(tmp_path / "docs"), threshold=0.6)
    assert ((pairs["a"] == 0) & (pairs["b"] == 99999)).any()


def test_ngram_containment_finds_planted_subset(tmp_path):
    """Plant a doc that is a strict 30% SLICE of a longer doc: Jaccard
    stays below 0.6 (the subset is small vs the union) but containment
    of the smaller side is 1.0 — the case the asymmetric detector
    exists for."""
    base = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    long_doc = base.loc[base["text"].str.count(" ").idxmax()]
    words = long_doc["text"].split(" ")
    frac = " ".join(words[: max(5, len(words) * 3 // 10)])
    planted = pd.concat(
        [
            base[["doc_id", "text"]],
            pd.DataFrame({"doc_id": [99999], "text": [frac]}),
        ]
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(planted, preserve_index=False),
        str(d / "documents.parquet"),
    )
    from spiderman_ray.pipelines.text import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    lid = int(long_doc["doc_id"])
    a, b = min(lid, 99999), max(lid, 99999)
    cont = ngram_containment_pairs(str(d.parent / "docs")).to_pandas()
    hit = cont[(cont["a"] == a) & (cont["b"] == b)]
    assert len(hit) == 1 and int(hit["cont_x10k"].iloc[0]) == 10000, cont
    jac = ngram_jaccard_pairs(str(d.parent / "docs")).to_pandas()
    assert not ((jac["a"] == a) & (jac["b"] == b)).any()


def test_source_quality_and_length_buckets_cover_corpus():
    """Both dashboards must tile the corpus exactly: doc and token
    totals agree with each other and with the raw table."""
    import pyarrow.parquet as pq_

    from spiderman_ray.pipelines.text import length_buckets, source_quality_report

    sf = "/root/testdata/sf0.001"
    rep = source_quality_report(sf).to_pandas()
    lb = length_buckets(sf).to_pandas()
    raw = pq_.read_table(f"{sf}/documents.parquet", columns=["text"]).to_pandas()
    n_docs = len(raw)
    n_tokens = int((raw["text"].str.count(" ") + 1).sum())
    assert int(rep["n_docs"].sum()) == n_docs
    assert int(rep["n_tokens"].sum()) == n_tokens
    assert int(lb["n_docs"].sum()) == n_docs
    assert int(lb["n_tokens"].sum()) == n_tokens
    # per-source mean is the exact floor division of the exact sums
    assert (rep["mean_tokens_x100"] == rep["n_tokens"] * 100 // rep["n_docs"]).all()


def test_winnow_overlap_finds_planted_copy(tmp_path):
    """Plant a doc that is a verbatim copy of another with a different
    tail: the shared contiguous prefix keeps most winnow mins, so the
    overlap detector must pair them."""
    base = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    t0 = base.iloc[0]["text"]
    planted = pd.concat(
        [
            base[["doc_id", "text"]],
            pd.DataFrame({"doc_id": [99999], "text": [t0 + " totally new tail"]}),
        ]
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(planted, preserve_index=False),
        str(d / "documents.parquet"),
    )
    from spiderman_ray.pipelines.text import winnow_overlap_pairs

    pairs = winnow_overlap_pairs(str(d)).to_pandas()
    a = int(base.iloc[0]["doc_id"])
    assert ((pairs["a"] == min(a, 99999)) & (pairs["b"] == max(a, 99999))).any()


@pytest.mark.slow
def test_cli_report_composes_dashboard_sections(tmp_path):
    """`cli report` must emit one JSON doc whose sections are exactly the
    registered dashboard queries (every number independently gate-
    verified elsewhere); --dest writes the same doc to a file."""
    import json
    import subprocess
    import sys

    dest = str(tmp_path / "report.json")
    r = subprocess.run(
        [sys.executable, "-m", "spiderman_ray.cli", "report",
         "--sf", "/root/testdata/sf0.001", "--dest", dest],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.load(open(dest))
    from spiderman_ray.cli import _REPORT_SECTIONS

    assert set(rep["sections"]) == set(_REPORT_SECTIONS)
    assert {"source_quality_report", "gopher_summary",
            "source_distinct_shingles"} <= set(rep["sections"])
    assert all(len(v) > 0 for v in rep["sections"].values())
    docs = sum(s["n_docs"] for s in rep["sections"]["source_quality_report"])
    assert docs == 500  # tiles the corpus


def test_bpe_fertility_consistent_with_encode():
    """Fertility partials must tile the corpus: doc total = table rows,
    BPE token total = bpe_encode's total, and fertility >= 1.0 (a word
    encodes to at least one token)."""
    import pyarrow.parquet as pq_

    from spiderman_ray.pipelines.bpe import bpe_encode, bpe_fertility

    sf = "/root/testdata/sf0.001"
    fert = bpe_fertility(sf).to_pandas()
    enc = bpe_encode(sf).to_pandas()
    n_docs = pq_.read_metadata(f"{sf}/documents.parquet").num_rows
    assert int(fert["n_docs"].sum()) == n_docs
    assert int(fert["n_bpe_tokens"].sum()) == int(enc["n_bpe_tokens"].sum())
    assert (fert["fertility_x1m"] >= 1_000_000).all()
    assert (
        fert["fertility_x1m"]
        == fert["n_bpe_tokens"] * 1_000_000 // fert["n_words"].clip(lower=1)
    ).all()


def test_simhash_close_for_similar_docs():
    from spiderman_ray.pipelines.text import SimHasher

    batch = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog near the river bank",
                "the quick brown fox jumps over the lazy dog near the river bend",
                "completely different words about database query optimization engines",
            ],
        }
    )
    out = SimHasher()(batch)
    h = dict(zip(out["doc_id"], out["simhash"]))

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(h[1], h[2]) < ham(h[1], h[3])
    assert ham(h[1], h[2]) <= 12


def test_simhash_near_dups_planted_skew_dedups_distributed(ray_session, tmp_path):
    """Planted skew: 40 identical docs collide in ALL 4 bands, so the raw
    candidate stream carries every pair 4x (pair-scale, 3120 rows). The
    cross-band dedup now runs on the _pair_shard64 exchange BEFORE any
    driver collection; the output must be each pair exactly once — the
    full C(40,2) clique plus nothing from the distinct tail."""
    import pyarrow.parquet as _pq

    from spiderman_ray.pipelines.text import simhash_near_dups

    dup = ["the same exact duplicated text body repeated verbatim"] * 40
    tail = [f"unique filler document number {i} with distinct tokens {i*7} {i*13}"
            for i in range(10)]
    d = tmp_path / "docs"
    d.mkdir()
    _pq.write_table(
        pa.table({"doc_id": pa.array(range(50), type=pa.int64()),
                  "text": pa.array(dup + tail)}),
        str(d / "documents.parquet"),
    )
    out = simhash_near_dups(str(tmp_path / "docs")).to_pandas()
    clique = {(a, b) for a in range(40) for b in range(a + 1, 40)}
    got = set(zip(out["a"], out["b"]))
    assert clique <= got                      # every planted pair survives
    assert len(out) == len(got)               # ...exactly once (deduped)


def test_lang_id_profiles():
    from spiderman_ray.pipelines.text import LangId

    batch = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the cat is on the mat and a dog is in the house",
                "der Hund ist nicht mit der Katze und das ist gut",
                "le chat est sur la table et les chiens sont là",
            ],
        }
    )
    out = LangId()(batch)
    assert out["lang_pred"].tolist() == ["en", "de", "fr"]


def test_winnow_fingerprints_overlap_property(tmp_path):
    """Docs sharing a long prefix share winnowing fingerprints; disjoint
    docs share almost none (checksums differ, counts positive)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    a = "the quick brown fox jumps over the lazy dog " * 8
    b = a + "and then some extra trailing content appears here"
    c = "zzz completely unrelated writing about columnar engines " * 8
    d = tmp_path / "w"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": [1, 2, 3], "text": [a, b, c]}),
        str(d / "documents.parquet"),
    )
    from spiderman_ray.pipelines.text import winnow_fingerprints

    out = winnow_fingerprints(str(tmp_path / "w")).to_pandas().set_index("doc_id").sort_index()
    assert (out["n_fps"] > 0).all()
    # deterministic
    out2 = winnow_fingerprints(str(tmp_path / "w")).to_pandas().set_index("doc_id").sort_index()
    assert out["fps_checksum"].tolist() == out2["fps_checksum"].tolist()
    assert out.loc[1, "fps_checksum"] != out.loc[3, "fps_checksum"]


def test_thumbnails_upsample(images_table):
    """Regression: thumbnail size larger than some sources (upsampling)
    must not crash the summed-area resize."""
    from spiderman_ray.pipelines.multimodal import thumbnails

    out = thumbnails(images_table, size=128, concurrency=2).to_pandas()
    assert len(out) == 13 and (out["w"] == 128).all()


def test_cosine_lsh_recall_vs_exact():
    """Hyperplane-LSH near-dup pairs vs the exact chunk-pair join: at the
    default 32-plane/8-band setting recall is 1.0 on the synthetic
    embeddings and no false pairs survive the in-bucket exact verify."""
    from spiderman_ray.pipelines.vectors import cosine_dup_pairs, cosine_dup_pairs_lsh

    sf = "/root/testdata/sf0.001"
    exact = set(map(tuple, cosine_dup_pairs(sf).to_pandas().values))
    lsh = set(map(tuple, cosine_dup_pairs_lsh(sf).to_pandas().values))
    assert lsh <= exact  # verify step: no false positives, ever
    assert len(exact & lsh) >= 0.8 * len(exact)


@pytest.mark.slow
def test_dedup_minhash_distributed_cc_equals_driver(tmp_path):
    """The distributed local-union-find label propagation must produce the
    same survivors as the driver union-find (forced via driver_pair_cap=0
    on a corpus with planted duplicate chains)."""
    base = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    rows = [base[["doc_id", "text"]]]
    # chain: 90001 ~ doc0 ~ 90002 (transitive component of 3)
    t0 = base.iloc[0]["text"]
    words = t0.split()
    rows.append(pd.DataFrame({
        "doc_id": [90001, 90002, 90003],
        "text": [
            " ".join(words[: int(len(words) * 0.95)]) + " zzz",
            " ".join(words[: int(len(words) * 0.9)]) + " yyy www",
            base.iloc[1]["text"] + " qqq",
        ],
    }))
    d = tmp_path / "cc"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pd.concat(rows), preserve_index=False),
        str(d / "documents.parquet"),
    )
    from spiderman_ray.pipelines.text import dedup_minhash_survivors

    drv = sorted(dedup_minhash_survivors(str(d)).to_pandas()["doc_id"])
    dist = sorted(dedup_minhash_survivors(str(d), driver_pair_cap=0).to_pandas()["doc_id"])
    assert drv == dist
    assert 90001 not in drv and 90002 not in drv  # chained dups lose to doc 0


def test_ngram_jaccard_pairs_equals_bruteforce():
    """The inverted-index join finds EXACTLY the brute-force >= 0.6 pairs
    (integer predicate 100*inter >= 60*union on hashed shingle sets)."""
    import numpy as np

    from spiderman_ray.pipelines.text import _shingle_hashes_batch, ngram_jaccard_pairs

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(sf + "/documents.parquet").to_pandas()
    shs = _shingle_hashes_batch(list(docs["text"]))
    ids = docs["doc_id"].to_numpy()
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = np.intersect1d(shs[i], shs[j], assume_unique=True).size
            union = shs[i].size + shs[j].size - inter
            if 100 * inter >= 60 * union:
                a, b = sorted((int(ids[i]), int(ids[j])))
                want.add((a, b, inter, union))
    got = ngram_jaccard_pairs(sf).to_pandas()
    assert set(map(tuple, got[["a", "b", "inter", "union_sz"]].values)) == want


def test_hash_sample_layout_invariant():
    """Deterministic hash sampling picks the SAME rows regardless of block
    layout (the reproducibility property random_sample lacks)."""
    from spiderman_ray.pipelines.text import hash_sample

    sf = "/root/testdata/sf0.001"
    a = sorted(hash_sample(sf).to_pandas()["doc_id"])
    b = sorted(
        hash_sample(sf)
        .repartition(num_blocks=7)
        .to_pandas()["doc_id"]
    )
    assert a == b and 0 < len(a) < 100


def test_range_join_shipments_equals_bruteforce():
    """Bucket-overlap range join == brute-force per-order window count."""
    from spiderman_ray.pipelines.relational import range_join_shipments

    sf = "/root/testdata/sf0.001"
    day_us = 86_400_000_000
    ship = pq.read_table(sf + "/lineitem.parquet", columns=["l_shipdate"])
    days = np.sort(ship["l_shipdate"].cast(pa.int64()).to_numpy() // day_us)
    orders = pq.read_table(sf + "/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    start = orders["o_orderdate"].cast(pa.int64()).to_numpy() // day_us
    want = dict(
        zip(
            orders["o_orderkey"].to_numpy(),
            np.searchsorted(days, start + 7) - np.searchsorted(days, start),
        )
    )
    got = range_join_shipments(sf).to_pandas()
    assert dict(zip(got["o_orderkey"], got["n_ship"])) == want
    assert len(got) == len(want)  # every order exactly once, incl. zero-count


def test_price_quantiles_exact_ranks():
    """Two-pass histogram quantiles == full-sort rank picks."""
    from spiderman_ray.pipelines.relational import price_quantiles

    sf = "/root/testdata/sf0.001"
    li = pq.read_table(sf + "/lineitem.parquet", columns=["l_extendedprice"])
    cents = np.sort(np.floor(li["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64))
    n = len(cents)
    got = price_quantiles(sf).to_pandas()
    for pct, val in zip(got["pct"], got["value_cents"]):
        assert val == cents[(pct * n + 99) // 100 - 1]


def test_price_quantiles_skewed_bucket_driver_stays_bounded(tmp_path):
    """Value skew: ALL rows land in one coarse bucket. The result must stay
    exact, and pass 2's driver collection must be the (value, n) histogram
    (<= 2^14 rows per target bucket), never the bucket's member rows —
    the round-2 verdict's O(buckets) contract."""
    import ray.data as rd

    from spiderman_ray.pipelines.relational import (
        _target_bucket_value_hist,
        price_quantiles,
    )

    rng = np.random.default_rng(11)
    # 200k rows, every value < 2^14 cents -> one coarse bucket holds ALL
    cents = rng.integers(0, 1 << 14, size=200_000, dtype=np.int64)
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(
        pa.table({"l_extendedprice": pa.array(cents / 100.0, type=pa.float64())}),
        str(d / "lineitem.parquet"),
    )

    got = price_quantiles(str(d)).to_pandas()
    scents = np.sort(np.floor((cents / 100.0) * 100.0 + 0.5).astype(np.int64))
    n = len(scents)
    for pct, val in zip(got["pct"], got["value_cents"]):
        assert val == scents[(pct * n + 99) // 100 - 1]

    read = lambda: rd.read_parquet(str(d / "lineitem.parquet"))  # noqa: E731
    vh = _target_bucket_value_hist(read, [0], np.uint64(14))
    assert len(vh) <= 1 << 14  # histogram rows, not the 200k member rows
    assert int(vh["n"].sum()) == n


def test_top_tokens_equals_bruteforce():
    """Sharded heavy hitters == driver-side Counter top-k with the
    (count desc, token asc) tie-break."""
    from collections import Counter

    from spiderman_ray.pipelines.text import top_tokens

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(sf + "/documents.parquet", columns=["text"])
    c = Counter()
    for t in docs["text"].to_pylist():
        c.update(w for w in t.split(" ") if w)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = top_tokens(sf).to_pandas()
    assert list(zip(got["token"], got["n"])) == want


def test_hll_approx_distinct_bound_and_determinism():
    """HLL estimate lands within 3 sigma (sigma ~ 1.04/sqrt(4096)) of the
    exact distinct count; repeated runs are bit-identical."""
    from spiderman_ray.pipelines.sketches import approx_distinct

    sf = "/root/testdata/sf0.01"
    exact = len(
        set(pq.read_table(sf + "/events.parquet", columns=["user_id"])["user_id"].to_pylist())
    )
    est1 = approx_distinct(sf)["n_distinct_est"][0].as_py()
    est2 = approx_distinct(sf)["n_distinct_est"][0].as_py()
    assert est1 == est2
    assert abs(est1 - exact) / exact < 3 * 1.04 / 64


def test_hll_merge_associativity():
    """Register merge is order-independent: fold over shuffled block rows
    gives the same registers/estimate (any reduction topology is valid)."""
    import ray.data as rd

    from spiderman_ray.pipelines.sketches import hll_estimate, hll_register_blocks

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(sf + "/events.parquet", columns=["user_id"])
    rows = hll_register_blocks(ds, "user_id").take_all()
    assert hll_estimate(rows) == hll_estimate(list(reversed(rows)))


def test_hll_registers_equal_direct_recompute():
    """The exposed register state == a straight per-value recompute with
    hashlib (idx = top 12 bits of the md5-prefix hash64, rank = 53 -
    bit_length(low 52 bits), MAX per register)."""
    import hashlib

    from spiderman_ray.pipelines.sketches import hll_registers

    sf = "/root/testdata/sf0.001"
    want: dict[int, int] = {}
    for v in pq.read_table(sf + "/events.parquet", columns=["user_id"])["user_id"].to_pylist():
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
        idx, rest = h >> 52, h & ((1 << 52) - 1)
        rank = 53 - rest.bit_length() if rest else 53
        want[idx] = max(want.get(idx, 0), rank)
    got = hll_registers(sf).to_pandas()
    assert dict(zip(got["reg_idx"], got["reg_rank"])) == want


def test_cms_table_mass_and_point_query_consistency():
    """Every salt row of the merged CMS table conserves total token mass,
    and the point-query estimate is exactly the min over the table cells
    the token hashes to (the published CMS read)."""
    import hashlib

    from spiderman_ray.pipelines.sketches import cms_table

    sf = "/root/testdata/sf0.001"
    total = sum(
        len([w for w in t.split(" ") if w])
        for t in pq.read_table(sf + "/documents.parquet", columns=["text"])["text"].to_pylist()
    )
    got = cms_table(sf).to_pandas()
    assert (got.groupby("row_idx")["cnt"].sum() == total).all()
    # point query for one known-present token: min over its 4 cells
    tok = "the"
    cells = []
    for r in range(4):
        col = int(hashlib.md5(f"cms{r}|{tok}".encode()).hexdigest()[:16], 16) % 4096
        row = got[(got["row_idx"] == r) & (got["col_idx"] == col)]
        cells.append(int(row["cnt"].iloc[0]) if len(row) else 0)
    from collections import Counter as _C

    exact = sum(
        _C(w for w in t.split(" ") if w)[tok]
        for t in pq.read_table(sf + "/documents.parquet", columns=["text"])["text"].to_pylist()
    )
    assert min(cells) >= exact  # CMS upper-bias guarantee


def test_top_docs_per_lang_equals_window_rank():
    """Sharded group-wise top-k == pandas window rank with the
    (n_chars desc, doc_id asc) tie-break."""
    from spiderman_ray.pipelines.text import top_docs_per_lang

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "lang", "n_chars"]).to_pandas()
    docs = docs.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
    docs["rank"] = docs.groupby("lang", sort=False).cumcount() + 1
    want = docs[docs["rank"] <= 5]
    got = top_docs_per_lang(sf).to_pandas()
    key = ["lang", "doc_id", "n_chars", "rank"]
    assert (
        sorted(map(tuple, got[key].values.tolist()))
        == sorted(map(tuple, want[key].values.tolist()))
    )


@pytest.mark.slow
def test_anti_join_ids_semantics_and_int64_stability():
    """The shared bucketed anti-join: drops exactly the drop-side keys,
    passes payload through, and int64 payloads survive the union+sort
    machinery as int64 (the null-padding float64 regression: a null int64
    transiting a pandas block widens the whole column)."""
    import ray.data as rd

    from spiderman_ray.pipelines.text import anti_join_ids

    left = rd.from_items(
        [{"doc_id": i, "lang": f"l{i % 3}", "n": 10 * i} for i in range(100)]
    )
    drop = rd.from_items([{"doc_id": i} for i in range(0, 100, 7)] +
                         [{"doc_id": 1_000_000}])  # unknown keys are no-ops
    out = anti_join_ids(
        left, drop, "doc_id", payload={"lang": pa.string(), "n": pa.int64()}
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = [i for i in range(100) if i % 7 != 0]
    assert df["doc_id"].tolist() == want
    assert df["n"].dtype == np.int64  # no float64 widening
    assert df["n"].tolist() == [10 * i for i in want]
    assert df["lang"].tolist() == [f"l{i % 3}" for i in want]
    # empty drop side: identity
    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64())}))
    out2 = anti_join_ids(left, empty, "doc_id",
                         payload={"lang": pa.string(), "n": pa.int64()})
    assert sorted(out2.to_pandas()["doc_id"]) == list(range(100))


def test_repeated_ngrams_equals_bruteforce():
    """Engine (doc_id, n_rep_positions, n_rep_grams) == a driver-side
    string-gram recompute over the real table (positions keep multiplicity;
    a gram is 'repeated' iff >= 2 DISTINCT docs contain it)."""
    from collections import Counter, defaultdict

    from spiderman_ray.pipelines.text import repeated_ngrams

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    per_doc: dict[int, Counter] = {}
    doc_count: dict[str, set] = defaultdict(set)
    for r in docs.itertuples():
        ws = r.text.split(" ")
        grams = (
            [" ".join(ws)]
            if len(ws) < 8
            else [" ".join(ws[i : i + 8]) for i in range(len(ws) - 7)]
        )
        per_doc[r.doc_id] = Counter(grams)
        for g in set(grams):
            doc_count[g].add(r.doc_id)
    want = {}
    for did, cnt in per_doc.items():
        rep = {g: n for g, n in cnt.items() if len(doc_count[g]) >= 2}
        if rep:
            want[did] = (sum(rep.values()), len(rep))
    got = repeated_ngrams(sf).to_pandas()
    assert {
        int(r.doc_id): (int(r.n_rep_positions), int(r.n_rep_grams))
        for r in got.itertuples()
    } == want


def test_decontam_bloom_bits_cover_every_bench_gram():
    """State-level no-false-negative proof: every gram of every BENCH doc
    maps to n_hashes positions that are ALL set in the exposed bitmap, and
    the bitmap holds no more bits than 4x the distinct gram count."""
    import hashlib as _hl

    from spiderman_ray.pipelines.text import (
        _bloom_bit_idxs,
        _kgram_hashes_batch,
        decontam_bloom_bits,
    )

    sf = "/root/testdata/sf0.001"
    bits = set(decontam_bloom_bits(sf)["bit_idx"].to_pylist())
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    thresh = (10 << 32) // 100
    bench = docs[
        docs["doc_id"].map(
            lambda d: int(_hl.md5(str(d).encode()).hexdigest()[:8], 16) < thresh
        )
    ]
    assert len(bench)
    grams = np.unique(np.concatenate(_kgram_hashes_batch(bench["text"].tolist())))
    idxs = _bloom_bit_idxs(grams.astype(np.uint64), 1 << 20, 4)
    assert set(idxs.ravel().tolist()) == bits  # exactly the bench bits
    assert len(bits) <= 4 * len(grams)


def test_remove_repeated_spans_equals_bruteforce():
    """Engine clean_text == a driver recompute: token j is dropped iff a
    gram repeated across >= 2 distinct docs starts at i <= j < i+8; short
    docs duplicated elsewhere empty entirely; untouched docs pass through
    byte-identical with n_removed == 0."""
    from collections import defaultdict

    from spiderman_ray.pipelines.text import remove_repeated_spans

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    doc_count: dict[str, set] = defaultdict(set)
    grams_of: dict[int, list] = {}
    for r in docs.itertuples():
        ws = r.text.split(" ")
        grams = (
            [" ".join(ws)]
            if len(ws) < 8
            else [" ".join(ws[i : i + 8]) for i in range(len(ws) - 7)]
        )
        grams_of[r.doc_id] = grams
        for g in set(grams):
            doc_count[g].add(r.doc_id)
    want = {}
    for r in docs.itertuples():
        ws = r.text.split(" ")
        grams = grams_of[r.doc_id]
        cov = [False] * len(ws)
        for i, g in enumerate(grams):
            if len(doc_count[g]) >= 2:
                for j in range(i, min(i + 8, len(ws))):
                    cov[j] = True
        want[r.doc_id] = (
            " ".join(w for w, c in zip(ws, cov) if not c),
            sum(cov),
        )
    got = remove_repeated_spans(sf).to_pandas()
    assert len(got) == len(docs)
    assert {
        int(r.doc_id): (r.clean_text, int(r.n_removed)) for r in got.itertuples()
    } == want
    # sanity: the operator actually fires on the real table
    assert (got["n_removed"] > 0).any()


def test_stratified_sample_rates_and_layout_invariance():
    """Per-stratum keep decisions are the doc's own hash vs its language's
    cut — independent of block layout; realized rates track the targets."""
    from spiderman_ray.pipelines.text import STRATA_RATES, stratified_sample

    sf = "/root/testdata/sf0.01"
    got = stratified_sample(sf).to_pandas()
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    kept = got.groupby("lang")["doc_id"].count()
    total = docs.groupby("lang")["doc_id"].count()
    for lang, pct in STRATA_RATES.items():
        rate = kept.get(lang, 0) / total[lang]
        assert abs(rate - pct / 100) < 0.2, (lang, rate, pct)
    # layout invariance: same rows from a different block layout
    import ray.data as rd  # noqa: F401

    b = stratified_sample(sf).repartition(num_blocks=7).to_pandas()
    assert sorted(b["doc_id"]) == sorted(got["doc_id"])


def test_doc_chunks_cover_every_token():
    """Chunking contract: stride-48 windows of 64 tokens cover all tokens,
    first chunk starts at 0, short docs get exactly one chunk."""
    from spiderman_ray.pipelines.text import doc_chunks

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    n_toks = {r.doc_id: len(r.text.split(" ")) for r in docs.itertuples()}
    got = doc_chunks(sf).to_pandas()
    per_doc = got.groupby("doc_id")
    for did, g in per_doc:
        n = n_toks[did]
        want_chunks = max(1, -((n - 64) // -48) + 1) if n > 64 else 1
        assert len(g) == want_chunks
        assert sorted(g["chunk_idx"]) == list(range(want_chunks))
        # full coverage: last chunk reaches the final token
        last = g["chunk_idx"].max()
        assert last * 48 + g[g["chunk_idx"] == last]["n_tokens"].iloc[0] >= n


def test_tfidf_top_terms_equals_bruteforce():
    """Token-space df + per-doc argmax == driver-side brute force with the
    (tf/df desc, token asc) tie-break."""
    from collections import Counter, defaultdict

    from spiderman_ray.pipelines.text import tfidf_top_terms

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    tf = {}
    df = defaultdict(int)
    for r in docs.itertuples():
        c = Counter(w for w in r.text.split(" ") if w)
        tf[r.doc_id] = c
        for tok in c:
            df[tok] += 1
    want = {}
    for did, c in tf.items():
        best = min(c.items(), key=lambda kv: (-(kv[1] / df[kv[0]]), kv[0]))
        want[did] = (best[0], best[1], df[best[0]])
    got = tfidf_top_terms(sf).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.doc_id] == (r.token, r.tf, r.df), r.doc_id


def test_decontaminate_planted_overlap(tmp_path):
    """A train doc that copies 8+ consecutive tokens from a benchmark doc
    is flagged; disjoint docs are not. Benchmark split = hash_sample rule."""
    import hashlib

    import pyarrow.parquet as _pq

    from spiderman_ray.pipelines.text import decontaminate

    thresh = (10 << 32) // 100

    def is_bench(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) < thresh

    # find one bench id and two train ids under the deterministic split
    ids = list(range(1, 200))
    bench_id = next(d for d in ids if is_bench(d))
    t1, t2 = [d for d in ids if not is_bench(d)][:2]
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tbl = pa.table(
        {
            "doc_id": pa.array([bench_id, t1, t2], type=pa.int64()),
            "text": pa.array(
                [
                    bench_text,
                    "prefix words here " + bench_text,  # contains the 8-grams
                    "totally different content with no overlap at all whatsoever",
                ]
            ),
        }
    )
    d = tmp_path / "deco"
    d.mkdir()
    _pq.write_table(tbl, str(d / "documents.parquet"))
    got = decontaminate(str(d)).to_pandas()
    assert t1 in set(got["doc_id"]) and t2 not in set(got["doc_id"])
    assert bench_id not in set(got["doc_id"])  # bench rows never flagged
    # n_shared counts DISTINCT shared 8-grams: bench doc has 3, all inside t1
    assert int(got.set_index("doc_id").loc[t1, "n_shared"]) == 3


def test_image_stats_integer_means(images_table):
    """Channel means are exact integer floor((sum*1000)//n) of the decoded
    pixels — verified against a direct per-image recompute."""
    from spiderman_ray.functions.imaging import decode_image
    from spiderman_ray.pipelines.images import image_stats

    import glob

    tbl = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(images_table + "/*.parquet"))
    )
    got = image_stats(images_table).to_pandas().set_index("image_id")
    for row in tbl.to_pylist():
        px = decode_image(row["bytes"])
        h, w = px.shape[:2]
        sums = px.reshape(-1, px.shape[2]).astype("int64").sum(axis=0)
        g = got.loc[row["image_id"]]
        assert (g["w"], g["h"]) == (w, h)
        assert g["mean_r_x1000"] == int(sums[0]) * 1000 // (h * w)
        assert g["mean_b_x1000"] == int(sums[2]) * 1000 // (h * w)


def test_cms_bounds_and_merge_invariance():
    """Count-Min guarantees: est >= true for every queried token, total
    over-estimate bounded by d*eps*N with eps = e/width; merging blocks in
    any order gives identical tables."""
    from collections import Counter

    from spiderman_ray.pipelines.sketches import (
        cms_estimate,
        cms_merge,
        cms_token_counts,
    )

    sf = "/root/testdata/sf0.01"
    docs = pq.read_table(sf + "/documents.parquet", columns=["text"])
    true = Counter()
    for t in docs["text"].to_pylist():
        true.update(w for w in t.split(" ") if w)
    total = sum(true.values())

    rows = cms_token_counts(sf).take_all()
    table = cms_merge(rows)
    table2 = cms_merge(list(reversed(rows)))
    assert (table == table2).all()

    toks = [t for t, _ in true.most_common(50)]
    est = cms_estimate(table, toks)
    for tok, e in zip(toks, est):
        assert e >= true[tok], (tok, e, true[tok])
        assert e - true[tok] <= (2.718 / 4096) * total * 4, (tok, e, true[tok])


def test_sq8_reconstruction_and_recall():
    """Quantization properties: per-element reconstruction error <= scale/2,
    and int8-dot ANN top-5 keeps high recall vs exact cosine."""
    from spiderman_ray.pipelines.vectors import _sq8_codes, ann_cosine_topk

    sf = "/root/testdata/sf0.001"
    emb = pq.read_table(sf + "/embeddings.parquet")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"].to_pylist()])
    ids = np.asarray(emb["vec_id"].to_pylist())
    q, scale = _sq8_codes(m)
    rec = q.astype(np.float64) * scale[:, None]
    assert (np.abs(rec - m) <= scale[:, None] / 2 + 1e-12).all()

    # recall of quantized cosine vs exact, first 8 queries, k=5
    exact = ann_cosine_topk(sf, n_queries=8, k=5).to_pandas()
    rn = rec / np.linalg.norm(rec, axis=1, keepdims=True)
    recalls = []
    for qid in exact["query_id"].unique():
        qi = np.nonzero(ids == qid)[0][0]
        sims = rn @ rn[qi]
        sims[qi] = -np.inf
        approx = set(ids[np.argsort(-sims)[:5]])
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        recalls.append(len(e & approx) / len(e))
    assert np.mean(recalls) >= 0.9, recalls


def test_repetition_stats_equals_bruteforce():
    """Vectorized explode/groupby repetition signals == per-doc Counter
    brute force (dup-token, top-token, top-bigram fractions, floored
    x10000)."""
    from collections import Counter

    from spiderman_ray.pipelines.text import repetition_stats

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    got = repetition_stats(sf).to_pandas().set_index("doc_id").sort_index()
    assert len(got) == len(docs)
    for _, row in docs.iterrows():
        ws = row["text"].split(" ")
        n = len(ws)
        tc = Counter(ws)
        bc = Counter(" ".join(p) for p in zip(ws, ws[1:]))
        g = got.loc[row["doc_id"]]
        assert g["n_tokens"] == n
        assert g["dup_frac_x10000"] == (n - len(tc)) * 10000 // n
        assert g["top_tok_frac_x10000"] == max(tc.values()) * 10000 // n
        top_big = max(bc.values()) if bc else 0
        assert g["top_bigram_frac_x10000"] == top_big * 10000 // max(n - 1, 1)


def test_pack_offsets_prefix_sum_and_bins():
    """Two-pass distributed prefix sum == pandas cumsum in doc_id order;
    bins cover [start, start + n - 1] at capacity 512; offsets are
    contiguous (no gaps/overlaps across block boundaries)."""
    from spiderman_ray.pipelines.text import pack_offsets

    sf = "/root/testdata/sf0.001"
    got = pack_offsets(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    n = docs["text"].str.split(" ").str.len().astype("int64")
    want_start = n.cumsum() - n
    assert (got["doc_id"].to_numpy() == docs["doc_id"].to_numpy()).all()
    assert (got["n_tokens"].to_numpy() == n.to_numpy()).all()
    assert (got["start_offset"].to_numpy() == want_start.to_numpy()).all()
    assert (got["first_bin"].to_numpy() == want_start.to_numpy() // 512).all()
    assert (
        got["last_bin"].to_numpy()
        == (want_start.to_numpy() + n.to_numpy() - 1) // 512
    ).all()


def test_returns_rollup_levels_consistent():
    """ROLLUP expansion: leaf rows == grouped_returns, per-flag subtotals ==
    sum of their leaves, grand total == sum of everything — against a
    brute-force pandas recompute over the raw parquet."""
    from spiderman_ray.pipelines.relational import returns_rollup

    sf = "/root/testdata/sf0.001"
    got = returns_rollup(sf).to_pandas()
    li = pq.read_table(
        sf + "/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    ).to_pandas()
    li["qty"] = np.floor(li["l_quantity"] * 100 + 0.5).astype("int64")
    li["rev"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5
    ).astype("int64")

    leaf = got[(got["l_returnflag"] != "ALL") & (got["l_linestatus"] != "ALL")]
    want = li.groupby(["l_returnflag", "l_linestatus"]).agg(
        sum_qty_x100=("qty", "sum"), sum_rev_cents=("rev", "sum"),
        n_rows=("qty", "size"),
    ).reset_index()
    pd.testing.assert_frame_equal(
        leaf.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True),
        want.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True),
        check_dtype=False,
    )
    sub = got[(got["l_returnflag"] != "ALL") & (got["l_linestatus"] == "ALL")]
    for _, r in sub.iterrows():
        mine = leaf[leaf["l_returnflag"] == r["l_returnflag"]]
        assert r["sum_rev_cents"] == mine["sum_rev_cents"].sum()
        assert r["n_rows"] == mine["n_rows"].sum()
    tot = got[(got["l_returnflag"] == "ALL") & (got["l_linestatus"] == "ALL")]
    assert len(tot) == 1 and tot.iloc[0]["n_rows"] == len(li)
    assert tot.iloc[0]["sum_rev_cents"] == li["rev"].sum()
    assert len(got) == len(leaf) + len(sub) + 1


def test_redact_pii_counts_and_text():
    """Operator-level: counts and placeholder substitution over hand-built
    edge cases (multiple hits, none, adjacent kinds, empty string)."""
    import ray.data as rd

    from spiderman_ray.pipelines.text import redact_pii

    tbl = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "write a.b@x.io and c@y.org now",
                "no pii here at all",
                "ip 10.1.2.3 then 255.255.0.1 call +1-555-0007",
                "",
            ],
        }
    )
    out = (
        redact_pii(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_email"].tolist() == [2, 0, 0, 0]
    assert out["n_ip"].tolist() == [0, 0, 2, 0]
    assert out["n_phone"].tolist() == [0, 0, 1, 0]
    assert out["redacted"].tolist() == [
        "write <EMAIL> and <EMAIL> now",
        "no pii here at all",
        "ip <IP> then <IP> call <PHONE>",
        "",
    ]


def test_brand_price_quantiles_equals_bruteforce():
    """Shard-grouped per-key rank gather == per-group numpy sort + explicit
    ceil(q*n) rank pick, for every brand and pct."""
    from spiderman_ray.pipelines.relational import brand_price_quantiles

    sf = "/root/testdata/sf0.001"
    got = (
        brand_price_quantiles(sf)
        .to_pandas()
        .sort_values(["p_brand", "pct"])
        .reset_index(drop=True)
    )
    part = pq.read_table(
        sf + "/part.parquet", columns=["p_brand", "p_retailprice"]
    ).to_pandas()
    part["cents"] = np.floor(part["p_retailprice"] * 100 + 0.5).astype("int64")
    rows = []
    for brand, g in part.groupby("p_brand"):
        v = np.sort(g["cents"].to_numpy())
        for p in (25, 50, 75, 90):
            rows.append((brand, p, int(v[(p * len(v) + 99) // 100 - 1])))
    want = pd.DataFrame(rows, columns=["p_brand", "pct", "value_cents"]).sort_values(
        ["p_brand", "pct"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cdc_chunks_realign_after_insertion():
    """The CDC property fixed-size chunking lacks: after inserting bytes
    near the front of a document, chunk boundaries (and therefore chunk
    fps) re-align — every chunk beyond the edit's neighborhood is
    identical, so chunk-level dedup still matches the shifted content.
    Also checks exact parity with a straightforward Python recompute."""
    import ray.data as rd  # noqa: F401

    from spiderman_ray.pipelines.text import cdc_chunks

    sf = "/root/testdata/sf0.001"
    got = cdc_chunks(sf).to_pandas()

    # independent recompute of one doc (pure-python rolling hash)
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    t0 = docs.iloc[0]["text"]
    W, DIV, BASE, M = 8, 16, 1000003, 1 << 64

    def chunks(text):
        bs = text.encode()
        n = len(bs)
        ends = []
        for s in range(0, n - W + 1):
            h = 0
            for j in range(W):
                h = (h * BASE + bs[s + j]) % M
            if h % DIV == DIV - 1 and s + W < n:
                ends.append(s + W)
        starts, stops = [0] + ends, ends + [n]
        out = []
        for a, b in zip(starts, stops):
            fp = 0
            for c in bs[a:b]:
                fp = (fp * BASE + c) % M
            if fp >= 1 << 63:
                fp -= M
            out.append((a, b - a, fp))
        return out

    mine = got[got["doc_id"] == docs.iloc[0]["doc_id"]].sort_values("chunk_idx")
    assert list(mine[["start_byte", "len_bytes", "fp"]].itertuples(index=False, name=None)) == chunks(t0)

    # shift-robustness on a long synthetic doc: insert 3 bytes at pos 40
    base_text = (t0 + " ") * 8
    edited = base_text[:40] + "XYZ" + base_text[40:]
    a_fps = [c[2] for c in chunks(base_text)]
    b_fps = [c[2] for c in chunks(edited)]
    # suffix chunks re-align: the tail of both fp sequences is identical
    tail = 0
    while (tail < min(len(a_fps), len(b_fps))
           and a_fps[-1 - tail] == b_fps[-1 - tail]):
        tail += 1
    assert tail >= max(1, len(a_fps) - 4), (tail, len(a_fps), len(b_fps))
    # and dedup utility: repeated content shares chunk fps across "docs"
    assert len(set(a_fps)) < len(a_fps)

def test_cdc_dedup_first_wins_groundtruth():
    """Chunk-level dedup marks exactly the first (doc_id, chunk_idx) per
    fp; verified against a pandas recompute over the full chunk set."""
    from spiderman_ray.pipelines.text import cdc_chunks, cdc_dedup

    sf = "/root/testdata/sf0.001"
    got = (
        cdc_dedup(sf)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    chunks = cdc_chunks(sf).to_pandas().sort_values(["doc_id", "chunk_idx"])
    want = chunks.assign(
        is_first=(~chunks.sort_values(["doc_id", "chunk_idx"]) ["fp"].duplicated()).astype("int64")
    )[["doc_id", "chunk_idx", "fp", "is_first"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got.groupby("fp")["is_first"].sum() == 1).all()


def test_mark_chunk_firsts_float_ulp_collision():
    """Regression: two distinct int64 fps closer than one float64 ulp
    (~2^10 at 63-bit magnitude) must NOT collapse to equal — the old
    Series.shift()-based compare coerced to float64 and zeroed a true
    first at sf0.01."""
    from spiderman_ray.pipelines.text import _mark_chunk_firsts

    a = 8616313419613545224          # not float64-representable
    b = a - 200                      # same float64 rounding bucket as a
    assert float(a) == float(b) and a != b
    g = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "chunk_idx": [0, 0, 0],
            "fp": pd.array([b, a, a], dtype="int64"),
        }
    )
    out = _mark_chunk_firsts(g).set_index(["doc_id", "chunk_idx"])
    assert out.loc[(1, 0), "is_first"] == 1   # b is its own first
    assert out.loc[(2, 0), "is_first"] == 1   # a's true first
    assert out.loc[(3, 0), "is_first"] == 0

def test_curate_composition_invariants():
    """The curated manifest is exactly: quality+dirty+bench-gated docs,
    first-wins unique on content md5, minus decontamination hits —
    verified against an independent pandas recompute at sf0.001."""
    import hashlib

    from spiderman_ray.pipelines.text import curate, decontaminate

    sf = "/root/testdata/sf0.001"
    got = curate(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)

    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    thr = (10 << 32) // 100
    docs["n_tokens"] = docs["text"].str.split(" ").str.len()
    docs["fp"] = [hashlib.md5(t.encode()).hexdigest() for t in docs["text"]]
    docs["is_bench"] = [
        int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) < thr for d in docs["doc_id"]
    ]
    keep = (
        (docs["n_tokens"] >= 5)
        & ~docs["text"].str.contains("drop", regex=False)
        & ~docs["text"].str.contains("null", regex=False)
        & ~docs["is_bench"]
    )
    flt = docs[keep].sort_values("doc_id")
    ded = flt[~flt["fp"].duplicated()]
    contam = set(decontaminate(sf).to_pandas()["doc_id"])
    want_ids = [d for d in ded["doc_id"] if d not in contam]

    assert list(got["doc_id"]) == want_ids
    # n_tokens column round-trips; every fp unique among survivors
    m = ded.set_index("doc_id").loc[got["doc_id"]]
    assert list(got["n_tokens"]) == list(m["n_tokens"])
    assert m["fp"].is_unique

def test_knn_graph_multichunk_matches_bruteforce():
    """Force the chunk-pair block join to actually fan out (chunk_rows
    << n) and compare the full k-NN graph to a single-matrix numpy
    brute force with identical quantization + tie rules."""
    from spiderman_ray.pipelines.vectors import knn_graph

    sf = "/root/testdata/sf0.001"
    got = (
        knn_graph(sf, k=3, chunk_rows=128)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )

    tab = pq.read_table(sf + "/embeddings.parquet")
    ids = np.asarray(tab["vec_id"].to_pylist(), dtype=np.int64)
    m = np.stack([np.asarray(v, dtype=np.float64) for v in tab["embedding"].to_pylist()])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = np.floor(m @ m.T * 1e6 + 0.5).astype(np.int64)
    rows = []
    for qi in range(len(ids)):
        order = sorted(
            (j for j in range(len(ids)) if j != qi),
            key=lambda j: (-sim[qi, j], ids[j]),
        )[:3]
        rows.extend(
            (ids[qi], ids[j], sim[qi, j], r) for r, j in enumerate(order, 1)
        )
    want = pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "sim_x1m", "rank"])
    want = want.sort_values(["vec_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

def test_semantic_dedup_component_structure():
    """Exactly one survivor (the min vec_id) per connected component of
    the cosine near-dup graph; non-paired vectors all survive."""
    from spiderman_ray.pipelines.vectors import (
        cosine_dup_pairs,
        semantic_dedup_survivors,
    )

    sf = "/root/testdata/sf0.01"
    surv = set(semantic_dedup_survivors(sf).to_pandas()["vec_id"])
    pairs = cosine_dup_pairs(sf).to_pandas()
    all_ids = set(
        pq.read_table(sf + "/embeddings.parquet", columns=["vec_id"])
        .column("vec_id").to_pylist()
    )

    # union-find groundtruth
    parent = {}
    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in zip(pairs["a"], pairs["b"]):
        union(int(a), int(b))
    comp = {}
    for v in all_ids:
        comp.setdefault(find(v), set()).add(v)
    want = {min(c) for c in comp.values()}
    assert surv == want
    assert len(pairs) > 0  # the threshold actually bites at this sf

def test_pq_codes_determinism_and_distortion():
    """PQ codes are layout-independent (fit reads the parquet directly,
    encode is per-row) and keep >= 0.90 reconstruction cosine per vector
    on the synthetic embeddings; checksums match a local recompute."""
    from spiderman_ray.pipelines.vectors import _pq_encode, _pq_fit, pq_quantize

    sf = "/root/testdata/sf0.01"
    got = pq_quantize(sf).to_pandas().sort_values("vec_id").reset_index(drop=True)

    books = _pq_fit(sf, m=16, k=256, fit_sample_rows=4096)
    tab = pq.read_table(sf + "/embeddings.parquet")
    ids = np.asarray(tab["vec_id"].to_pylist(), dtype=np.int64)
    x = np.stack([np.asarray(v, dtype=np.float64) for v in tab["embedding"].to_pylist()])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    codes = _pq_encode(x, books)
    order = np.argsort(ids)
    assert list(got["vec_id"]) == list(ids[order])
    assert list(got["code_sum"]) == list(codes.astype(np.int64).sum(axis=1)[order])
    assert got["recon_cos_x1e6"].min() >= 900_000
    assert got["recon_cos_x1e6"].mean() >= 940_000


def test_ann_pq_topk_recall_vs_exact():
    """ADC preselection + exact re-rank recovers the exact top-5 on the
    synthetic embeddings (recall measured 1.0; bound left at >= 0.9 for
    headroom against future codebook-seed changes)."""
    from spiderman_ray.pipelines.vectors import ann_cosine_topk, ann_pq_topk

    sf = "/root/testdata/sf0.01"
    exact = ann_cosine_topk(sf).to_pandas()
    approx = ann_pq_topk(sf).to_pandas()
    ex = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    ap = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    assert len(ex & ap) / len(ex) >= 0.9

def test_bpe_token_stats_branches():
    """Pretokenizer counts: words keep leading spaces, punctuation runs
    are separate tokens; the non-word branch actually fires."""
    import ray.data as rd

    from spiderman_ray.pipelines.text import bpe_token_stats

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "hello world"},
            {"doc_id": 2, "text": "a+b=c, user@example.com"},
            {"doc_id": 3, "text": ""},
        ]
    )
    got = bpe_token_stats(docs).to_pandas().set_index("doc_id")
    assert got.loc[1].tolist() == [2, 2, 0]  # "hello", " world"
    # "a", "+", "b", "=", "c", ", user"? -> tokens: a | + | b | = | c | , | " user" | @ | example | . | com
    assert got.loc[2, "n_other_tokens"] >= 4
    assert got.loc[2, "n_tokens_bpe"] == got.loc[2, "n_word_tokens"] + got.loc[2, "n_other_tokens"]
    assert got.loc[3].tolist() == [0, 0, 0]

def test_rdbms_sink_streams_dataset(tmp_path):
    """The sink's Dataset path streams iter_batches without materializing;
    rows match the source."""
    import ray.data as rd

    from spiderman_ray.sources.rdbms import read_table_rdbms, write_table_rdbms

    ds = rd.range(100).map_batches(
        lambda b: {"pkey": [str(i) for i in b["id"]], "v": b["id"]},
        batch_format="numpy",
    )
    db = str(tmp_path / "ds.db")
    res = write_table_rdbms(ds, db, "t", bizdate="2026-08-17")
    assert res["rows_written"] == 100 and res["rows_dropped"] == 0
    back = read_table_rdbms(db, "t")
    assert back.num_rows == 100
    assert set(back["pkey"].to_pylist()) == {str(i) for i in range(100)}

def test_approx_price_quantiles_error_bound_and_upper():
    """Sketch answers are bucket UPPER bounds: >= the exact quantile and
    within one bucket (relative error <= 2^-6) of it; layout-invariant."""
    from spiderman_ray.pipelines.sketches import approx_price_quantiles

    sf = "/root/testdata/sf0.01"
    approx = approx_price_quantiles(sf).to_pandas().set_index("pct")
    cents = np.sort(
        np.floor(
            pq.read_table(sf + "/part.parquet", columns=["p_retailprice"])
            .column("p_retailprice").to_numpy() * 100 + 0.5
        ).astype(np.int64)
    )
    for p in (25, 50, 75, 90):
        ub = approx.loc[p, "value_cents_ub"]
        ex = cents[(p * len(cents) + 99) // 100 - 1]  # exact ceil-rank value
        assert ub >= ex
        assert ub <= ex * (1 + 2**-6) + 1
    # deterministic merge: two runs produce identical buckets/answers
    again = approx_price_quantiles(sf).to_pandas().set_index("pct")
    assert (again["value_cents_ub"] == approx["value_cents_ub"]).all()

def test_crawl_lineage_stats_partitions_crawl(tmp_path):
    """Every crawled URL belongs to exactly one seed's subtree: lineage
    n_urls sums to the crawl_order row count and each seed maps to
    itself at depth >= 0."""
    from spiderman_ray.engine import read_table_all_gens
    from spiderman_ray.pipelines.monitor import crawl_lineage_stats
    from spiderman_ray.simweb import SimParams
    from spiderman_ray.engine import CrawlEngine

    from spiderman_ray.policy import CrawlPolicy

    out = str(tmp_path / "run")
    eng = CrawlEngine(SimParams.for_scale("t1"), CrawlPolicy(), out_dir=out)
    eng.run()
    eng._pool.shutdown()

    got = crawl_lineage_stats(out).to_pandas()
    order = read_table_all_gens(out, "crawl_order").to_pandas()
    assert got["n_urls"].sum() == len(order)
    seeds = set(order.loc[order["generation"] == 0, "url"])
    assert set(got["seed_url"]) == seeds
    assert (got["max_depth"] >= 0).all() and got["max_depth"].max() == order["generation"].max()

def test_lang_centroids_equals_direct_recompute():
    from spiderman_ray.pipelines.vectors import lang_centroids

    sf = "/root/testdata/sf0.001"
    got = lang_centroids(sf).to_pandas().set_index("lang")

    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    embs = pq.read_table(sf + "/embeddings.parquet").to_pandas()
    m = np.stack(embs["embedding"].to_numpy()).astype(np.float64)
    lang_of = docs.set_index("doc_id")["lang"]
    langs = lang_of.reindex(embs["vec_id"]).to_numpy()
    for lang in got.index:
        sel = m[langs == lang]
        want = int(np.floor(np.linalg.norm(sel.mean(axis=0)) * 1e6 + 0.5))
        assert got.loc[lang, "n_docs"] == len(sel)
        assert abs(got.loc[lang, "centroid_norm_x1e6"] - want) <= 1

def test_shuffle_order_is_a_permutation_and_layout_invariant():
    """shuffle_order yields a complete 0..n-1 permutation, identical when
    the input arrives in a different block layout (the reproducible-
    training-order contract random_shuffle cannot give)."""
    import ray.data as rd

    from spiderman_ray.pipelines.text import shuffle_order

    sf = "/root/testdata/sf0.001"
    got = shuffle_order(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    n = len(got)
    assert sorted(got["pos"]) == list(range(n))

    again = (
        shuffle_order(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)

def test_minhash_clusters_consistent_with_survivors():
    """Labels and survivors agree: survivors == distinct cluster_ids, and
    every cluster_id is the min doc_id of its members."""
    from spiderman_ray.pipelines.text import dedup_minhash_survivors, minhash_clusters

    sf = "/root/testdata/sf0.01"
    labels = minhash_clusters(sf).to_pandas()
    surv = set(dedup_minhash_survivors(sf).to_pandas()["doc_id"])
    assert set(labels["cluster_id"].unique()) == surv
    mins = labels.groupby("cluster_id")["doc_id"].min()
    assert (mins.index == mins.values).all()

def test_unigram_quality_equals_direct_recompute():
    """Token-space LM quality: per-doc sum of tf * floor(log2(corpus
    count)) matches a single-process pandas recompute exactly."""
    from collections import Counter

    from spiderman_ray.pipelines.text import unigram_quality

    sf = "/root/testdata/sf0.001"
    got = unigram_quality(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)

    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    corpus = Counter()
    per_doc = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        toks = [w for w in t.split(" ") if w]
        per_doc[d] = Counter(toks)
        corpus.update(toks)
    rows = []
    for d in sorted(per_doc):
        s = sum(tf * (corpus[w].bit_length() - 1) for w, tf in per_doc[d].items())
        n = sum(per_doc[d].values())
        rows.append((d, s, n))
    want = pd.DataFrame(rows, columns=["doc_id", "logcount2_sum", "n_tokens"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

@pytest.mark.slow
def test_pagerank_equals_python_power_iteration():
    """Integer fixed-point PageRank: the distributed supersteps equal a
    single-process power iteration exactly (integer ops are associative,
    so any partitioning gives the identical vector), and the total mass
    stays within floor-loss of 1.0."""
    from spiderman_ray.pipelines.graph import PR_MULT, PR_SCALE, pagerank

    sf = "/root/testdata/sf0.001"
    got = pagerank(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)

    n = len(pq.read_table(sf + "/documents.parquet", columns=["doc_id"]))
    edges: dict[int, list[int]] = {}
    for src in range(n):
        outs = []
        for s in range(1, 2 + src % 4):
            d = (src * PR_MULT + s) % n
            outs.append((d + 1) % n if d == src else d)
        edges[src] = outs
    r = [PR_SCALE // n] * n
    teleport = 15 * (PR_SCALE // n)
    for _ in range(5):
        acc = [0] * n
        for src, outs in edges.items():
            c = r[src] // len(outs)
            for d in outs:
                acc[d] += c
        r = [(teleport + 85 * a) // 100 for a in acc]
    assert got["doc_id"].tolist() == list(range(n))
    assert got["rank_x1e12"].tolist() == r
    assert 0 <= PR_SCALE - got["rank_x1e12"].sum() < 100 * n

    # the actor-held-shard BSP path is bit-identical (associative ints)
    from spiderman_ray.pipelines.graph import pagerank_bsp

    bsp = pagerank_bsp(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert bsp["rank_x1e12"].tolist() == r


def test_crawl_host_authority_matches_sequential_lineage_recompute(tmp_path, ray_session):
    """Host PageRank over the fetch-lineage graph: the distributed
    parent-key self-join equals a sequential edge recompute fed through
    the same power iteration; mass is conserved within floor loss."""
    from collections import Counter

    import ray

    from spiderman_ray.engine import CrawlEngine, read_table_all_gens
    from spiderman_ray.pipelines.monitor import _host_pagerank, crawl_host_authority
    from spiderman_ray.simweb import SimParams

    assert ray.is_initialized()
    out = str(tmp_path / "run")
    eng = CrawlEngine(SimParams.for_scale("t1"), out_dir=out)
    eng.run()
    eng._pool.shutdown()

    got = crawl_host_authority(out).to_pandas()

    co = read_table_all_gens(out, "crawl_order").to_pylist()
    pmap = {(r["generation"], r["seq"]): r["host"] for r in co}
    ec = Counter()
    for r in co:
        if r["generation"] >= 1:
            p = pmap.get((r["generation"] - 1, r["seq"] >> 20))
            if p is not None:
                ec[(p, r["host"])] += 1
    hosts = sorted({r["host"] for r in co})
    pair_df = pd.DataFrame(
        [(s, d, n) for (s, d), n in ec.items()], columns=["src", "dst", "n"]
    )
    want = _host_pagerank(pair_df, hosts, 5).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("host").reset_index(drop=True),
        want.sort_values("host").reset_index(drop=True),
    )
    # dangling hosts (leaf CDNs) LEAK mass by design (no dangling
    # redistribution): total stays below scale but every host keeps at
    # least its teleport floor
    teleport_floor = 15 * ((10**12) // len(hosts)) // 100
    assert got["rank_x1e12"].sum() <= 10**12
    assert (got["rank_x1e12"] >= teleport_floor).all()
    # image CDN hosts are pure sinks fed by every detail host: they must
    # carry MORE than teleport-only mass
    img = got[got["host"].str.contains("cdn")]["rank_x1e12"]
    assert len(img) and (img > teleport_floor).all()


@pytest.mark.slow
def test_table_diff_statuses_partition_the_perturbation():
    """Snapshot diff via FULL OUTER join: removed = keys % 13, added =
    spawned keys (offset 1e7), changed = repriced survivors (% 7 and not
    % 13); unchanged rows never appear."""
    from spiderman_ray.pipelines.relational import table_diff

    sf = "/root/testdata/sf0.001"
    got = table_diff(sf).to_pandas()
    keys = pq.read_table(sf + "/orders.parquet", columns=["o_orderkey"])[
        "o_orderkey"
    ].to_numpy()
    removed = sorted(got.loc[got.status == "removed", "okey"])
    added = sorted(got.loc[got.status == "added", "okey"])
    changed = sorted(got.loc[got.status == "changed", "okey"])
    assert removed == sorted(int(k) for k in keys if k % 13 == 0)
    assert added == sorted(int(k) + 10_000_000 for k in keys if k % 11 == 0)
    assert changed == sorted(
        int(k) for k in keys if k % 13 != 0 and k % 7 == 0
    )
    assert (got.loc[got.status == "removed", "new_cents"] == -1).all()
    assert (got.loc[got.status == "added", "old_cents"] == -1).all()
    ch = got[got.status == "changed"]
    assert (ch["new_cents"] - ch["old_cents"] == 1).all()


def test_name_edit_dups_planted_variants(tmp_path):
    """Deletion-neighborhood similarity join finds exactly the planted
    <=1-edit pairs: substitution, insertion, deletion — and rejects the
    distance-2 decoy and duplicate rows."""
    from spiderman_ray.pipelines.relational import name_edit_dups

    names = [
        "widget",  # base
        "widget",  # duplicate row: must not self-pair
        "widgex",  # substitution (dist 1)
        "widgets",  # insertion (dist 1)
        "widge",  # deletion (dist 1)
        "wadgex",  # dist 2 from widget: only pairs with widgex
        "bolt",  # unrelated
    ]
    pq.write_table(
        pa.table({"p_name": pa.array(names, pa.string())}),
        str(tmp_path / "part.parquet"),
    )
    got = sorted(
        map(tuple, name_edit_dups(str(tmp_path)).to_pandas()[["a", "b"]].values)
    )
    # expected = reference Levenshtein over all distinct pairs
    def lev(a, b):
        import numpy as _np

        d = _np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return int(d[-1])

    uniq = sorted(set(names))
    want = sorted(
        (x, y)
        for i, x in enumerate(uniq)
        for y in uniq[i + 1 :]
        if lev(x, y) <= 1
    )
    assert got == want
    assert ("widget", "widgex") in got and ("wadgex", "widget") not in got


@pytest.mark.slow
def test_connected_components_equals_union_find():
    """Generic min-label CC: the label-propagation fixpoint equals a
    single-process union-find over the same undirected synthetic graph."""
    from spiderman_ray.pipelines.graph import PR_MULT, connected_components

    sf = "/root/testdata/sf0.001"
    got = (
        connected_components(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    n = len(pq.read_table(sf + "/documents.parquet", columns=["doc_id"]))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for src in range(n):
        for s in range(1, 2 + src % 4):
            d = (src * PR_MULT + s) % n
            d = (d + 1) % n if d == src else d
            ra, rb = find(src), find(d)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = [find(v) for v in range(n)]
    assert got["doc_id"].tolist() == list(range(n))
    assert got["component"].tolist() == want

    # the actor-held-shard BSP path is bit-identical (min is associative)
    from spiderman_ray.pipelines.graph import connected_components_bsp

    bsp = (
        connected_components_bsp(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert bsp["component"].tolist() == want


def test_bpe_train_equals_reference():
    """Distributed BPE training learns the identical merge sequence (same
    counts, same lexicographic tie-break) as the single-process Sennrich
    reference, for any sharding."""
    from collections import Counter

    from spiderman_ray.pipelines.bpe import bpe_reference, bpe_train

    sf = "/root/testdata/sf0.001"
    got = [
        (int(r), l, rt, int(c))
        for r, l, rt, c in bpe_train(sf, n_merges=12)
        .to_pandas()[["rank", "left", "right", "pair_count"]]
        .values
    ]

    t = pq.read_table(sf + "/documents.parquet", columns=["text"])
    wf = Counter()
    for s in t["text"].to_pylist():
        wf.update(w for w in s.split(" ") if w)
    want = bpe_reference(dict(wf), 12)
    assert got == want and len(got) == 12
    # counts are corpus-scale positives and ranks are the merge order
    assert [m[0] for m in got] == list(range(12))
    assert all(m[3] > 0 for m in got)


def test_bpe_encode_equals_reference():
    """Corpus tokenization with the learned merges matches a
    single-process encode (token counts + order-insensitive checksums)."""
    from collections import Counter

    from spiderman_ray.functions.hashing import hash64
    from spiderman_ray.pipelines.bpe import (
        bpe_encode,
        bpe_encode_word,
        bpe_reference,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        bpe_encode(sf, n_merges=12)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    t = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    wf = Counter()
    for s in texts.values():
        wf.update(w for w in s.split(" ") if w)
    ranks = {(l, r): rank for rank, l, r, _ in bpe_reference(dict(wf), 12)}
    rows = []
    for did in sorted(texts):
        toks = []
        for w in texts[did].split(" "):
            if w:
                toks.extend(bpe_encode_word(w, ranks))
        s = int(hash64(toks).view(np.uint64).sum() % np.uint64(2**63)) if toks else 0
        rows.append((did, len(toks), s))
    want = pd.DataFrame(rows, columns=["doc_id", "n_bpe_tokens", "token_checksum"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # merges actually compress: fewer BPE tokens than raw characters
    n_chars = sum(len(w) + 1 for s in texts.values() for w in s.split(" ") if w)
    assert got["n_bpe_tokens"].sum() < n_chars


def test_sssp_equals_dijkstra():
    """Distributed Bellman-Ford (min-plus BSP supersteps) equals a
    single-process Dijkstra over the same weighted undirected graph."""
    import heapq

    from spiderman_ray.pipelines.graph import PR_MULT, sssp

    sf = "/root/testdata/sf0.001"
    got = sssp(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)

    n = len(pq.read_table(sf + "/documents.parquet", columns=["doc_id"]))
    adj: dict[int, list] = {}
    for src in range(n):
        for s in range(1, 2 + src % 4):
            d = (src * PR_MULT + s) % n
            d = (d + 1) % n if d == src else d
            w = 1 + (src + d) % 5
            adj.setdefault(src, []).append((d, w))
            adj.setdefault(d, []).append((src, w))
    INF = float("inf")
    dist = [INF] * n
    dist[0] = 0
    pq_ = [(0, 0)]
    while pq_:
        du, u = heapq.heappop(pq_)
        if du > dist[u]:
            continue
        for v, w in adj.get(u, []):
            if du + w < dist[v]:
                dist[v] = du + w
                heapq.heappush(pq_, (dist[v], v))
    want = [int(d) if d < INF else -1 for d in dist]
    assert got["doc_id"].tolist() == list(range(n))
    assert got["dist"].tolist() == want


def test_triangle_counts_equals_bruteforce():
    """Per-vertex triangle participation equals a single-process
    brute-force enumeration over the same canonical undirected graph."""
    from collections import Counter
    from itertools import combinations

    from spiderman_ray.pipelines.graph import PR_MULT, triangle_counts

    sf = "/root/testdata/sf0.001"
    got = (
        triangle_counts(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    n = len(pq.read_table(sf + "/documents.parquet", columns=["doc_id"]))
    ue = set()
    for src in range(n):
        for s in range(1, 2 + src % 4):
            d = (src * PR_MULT + s) % n
            d = (d + 1) % n if d == src else d
            ue.add((min(src, d), max(src, d)))
    adj: dict[int, set] = {}
    for a, b in ue:
        adj.setdefault(a, set()).add(b)
    members = Counter()
    for a, nbrs in adj.items():
        for b, c in combinations(sorted(nbrs), 2):
            if (b, c) in ue:
                members.update((a, b, c))
    want = pd.DataFrame(
        sorted(members.items()), columns=["doc_id", "n_triangles"]
    )
    assert len(want) > 0  # the synthetic graph must actually close triangles
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_nb_classify_equals_direct_recompute():
    """Distributed Naive-Bayes (train from LangId weak labels + apply)
    equals a single-process Counter recompute: same integer scores, same
    alphabetical-tie-break argmax."""
    from collections import Counter, defaultdict

    from spiderman_ray.pipelines.text import _NB_CLASSES, LangId, nb_classify

    sf = "/root/testdata/sf0.001"
    got = nb_classify(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)

    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    labels = LangId()(docs).set_index("doc_id")["lang_pred"]
    ct: dict = defaultdict(Counter)  # token -> class -> count
    per_doc = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        tfs = Counter(w for w in t.split(" ") if w)
        per_doc[d] = tfs
        for w, n in tfs.items():
            ct[w][labels[d]] += n
    rows = []
    for d in sorted(per_doc):
        scores = []
        for c in _NB_CLASSES:
            s = 0
            for w, n in per_doc[d].items():
                cnt = ct[w][c]
                s += n * ((cnt.bit_length() - 1) if cnt > 0 else -1)
            scores.append(s)
        best = max(range(len(_NB_CLASSES)), key=lambda i: (scores[i], -i))
        rows.append((d, _NB_CLASSES[best], scores[best]))
    want = pd.DataFrame(rows, columns=["doc_id", "nb_pred", "best_score"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # no class priors on a majority-class corpus: predictions may all
    # collapse to the majority label; the exactness above is the
    # contract. Scores must still be doc-dependent:
    assert got["best_score"].nunique() > 10


def test_bigram_quality_equals_direct_recompute():
    """Bigram-LM quality: per-doc sum of tf * (floor(log2 c(w1,w2)) -
    floor(log2 C(w1))) matches a single-process Counter recompute, and
    docs with < 2 tokens emit no row."""
    from collections import Counter

    from spiderman_ray.pipelines.text import bigram_quality

    sf = "/root/testdata/sf0.001"
    got = bigram_quality(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)

    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    c12 = Counter()
    c1 = Counter()
    per_doc = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        toks = [w for w in t.split(" ") if w]
        bgs = list(zip(toks[:-1], toks[1:]))
        if bgs:
            per_doc[d] = Counter(bgs)
            c12.update(bgs)
            c1.update(w1 for w1, _ in bgs)
    rows = []
    for d in sorted(per_doc):
        s = sum(
            tf * ((c12[bg].bit_length() - 1) - (c1[bg[0]].bit_length() - 1))
            for bg, tf in per_doc[d].items()
        )
        n = sum(per_doc[d].values())
        rows.append((d, s, n))
    want = pd.DataFrame(rows, columns=["doc_id", "logratio2_sum", "n_bigrams"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

@pytest.mark.slow
def test_curate_full_removes_exactly_the_dominated_near_dups():
    from spiderman_ray.pipelines.text import curate, curate_full, minhash_loser_ids

    sf = "/root/testdata/sf0.001"
    base = set(curate(sf).to_pandas()["doc_id"])
    full = set(curate_full(sf).to_pandas()["doc_id"])
    losers = minhash_loser_ids(sf)
    assert full == base - losers
    assert full < base  # the near-dup stage actually bites on this data

def test_ann_ivfpq_recall_and_exhaustive_exactness():
    """IVFADC composition: exhaustive probe + exact rerank equals the
    exact baseline; the genuinely approximate nprobe=8 path keeps
    recall@5 >= 0.7 (measured 0.775-0.9)."""
    from spiderman_ray.pipelines.vectors import ann_cosine_topk, ann_ivfpq_topk

    sf = "/root/testdata/sf0.01"
    exact = ann_cosine_topk(sf).to_pandas()
    ex = set(map(tuple, exact[["query_id", "neighbor_id"]].values))

    full = ann_ivfpq_topk(sf, nprobe=16).to_pandas()
    assert set(map(tuple, full[["query_id", "neighbor_id"]].values)) == ex

    approx = ann_ivfpq_topk(sf, nprobe=8).to_pandas()
    ap = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    assert len(ex & ap) / len(ex) >= 0.7

def test_hash_embed_checksums_match_direct():
    """Feature-hash embedding checksums equal a direct recompute; empty
    docs yield the all-zero row."""
    import ray.data as rd

    from spiderman_ray.functions.hashing import hash64
    from spiderman_ray.pipelines.text import hash_embed

    sf = "/root/testdata/sf0.001"
    got = hash_embed(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    for _, r in docs.sample(20, random_state=7).iterrows():
        toks = [w for w in r["text"].split(" ") if w]
        b = (hash64(toks).view(np.uint64) % np.uint64(64)).astype(np.int64)
        from collections import Counter
        c = Counter(b.tolist())
        row = got[got["doc_id"] == r["doc_id"]].iloc[0]
        assert row["nnz"] == len(c)
        assert row["bucket_sum"] == sum(c.values()) == len(toks)
        assert row["bucket_sq_sum"] == sum(v * v for v in c.values())

def test_image_dedup_exact_first_wins(tmp_path):
    """Identical payloads under different image_ids: the lexicographically
    first id wins; distinct payloads all survive."""
    from spiderman_ray.pipelines.images import image_dedup_exact

    rows = [
        {"image_id": "B", "bytes": b"same-bytes"},
        {"image_id": "A", "bytes": b"same-bytes"},
        {"image_id": "C", "bytes": b"other"},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "part-0.parquet"))
    got = (
        image_dedup_exact(str(tmp_path))
        .to_pandas()
        .set_index("image_id")["is_first"]
        .to_dict()
    )
    assert got == {"A": 1, "B": 0, "C": 1}

def test_decontaminate_bloom_superset_no_false_negatives():
    """Bloom screen vs exact decontamination: every exact hit is flagged
    with n_flagged >= n_shared (no false negatives); spurious flags stay
    rare at this bloom load."""
    from spiderman_ray.pipelines.text import decontaminate, decontaminate_bloom

    sf = "/root/testdata/sf0.01"
    exact = decontaminate(sf).to_pandas().set_index("doc_id")["n_shared"]
    bloom = decontaminate_bloom(sf).to_pandas().set_index("doc_id")["n_flagged"]
    assert set(exact.index) <= set(bloom.index)
    for d, n in exact.items():
        assert bloom[d] >= n
    # false-positive docs (flagged but not contaminated) bounded
    fp_docs = set(bloom.index) - set(exact.index)
    assert len(fp_docs) <= max(5, len(exact) // 2)

@pytest.mark.slow
def test_minhash_clusters_distributed_path_equal():
    """Forcing driver_pair_cap=0 routes through the distributed label
    propagation + node-sharded attach; labels equal the driver-UF path."""
    from spiderman_ray.pipelines.text import minhash_clusters

    sf = "/root/testdata/sf0.001"
    a = minhash_clusters(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        minhash_clusters(sf, driver_pair_cap=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_semantic_dedup_distributed_path_equal():
    """Same survivors through the size-gated distributed CC path."""
    from spiderman_ray.pipelines.vectors import semantic_dedup_survivors

    sf = "/root/testdata/sf0.01"
    a = set(semantic_dedup_survivors(sf).to_pandas()["vec_id"])
    b = set(semantic_dedup_survivors(sf, driver_pair_cap=0).to_pandas()["vec_id"])
    assert a == b


def test_semantic_dedup_lsh_matches_reference_both_paths():
    """LSH-edged survivors equal the single-process seeded recompute (the
    gate pin's contract) through BOTH the driver-UF fold and the cap=0
    distributed label-propagation path."""
    from spiderman_ray.pipelines.vectors import (
        semantic_dedup_lsh_reference,
        semantic_dedup_lsh_survivors,
    )

    sf = "/root/testdata/sf0.001"
    want = [r["vec_id"] for r in semantic_dedup_lsh_reference(sf)]
    got = sorted(semantic_dedup_lsh_survivors(sf).to_pandas()["vec_id"])
    assert got == want
    got0 = sorted(
        semantic_dedup_lsh_survivors(sf, driver_pair_cap=0).to_pandas()["vec_id"]
    )
    assert got0 == want

def test_quality_buckets_ntile_sizes_and_order():
    """NTILE(3) contract: tile sizes differ by <= 1 with remainder in the
    head, and score ordering is monotone across buckets."""
    from spiderman_ray.pipelines.text import quality_buckets

    sf = "/root/testdata/sf0.01"
    got = quality_buckets(sf).to_pandas()
    n = len(got)
    sizes = got["bucket"].value_counts().sort_index()
    assert list(sizes.index) == [1, 2, 3]
    assert sizes.max() - sizes.min() <= 1
    assert sizes[1] == -(-n // 3)  # remainder goes to the head tile
    assert got[got.bucket == 1]["score_x1000"].min() >= got[got.bucket == 2]["score_x1000"].max() - 0
    assert got[got.bucket == 2]["score_x1000"].min() >= got[got.bucket == 3]["score_x1000"].max() - 0

def test_curate_randomized_table_conformance(tmp_path):
    """curate over a RANDOMIZED table (shapes testdata never exercises:
    heavy exact dups, dirty words everywhere, sub-threshold lengths,
    empty-ish docs) still equals the independent pandas model."""
    import hashlib

    rng = np.random.default_rng(1234)
    words = ["alpha", "beta", "drop", "null", "gamma", "delta", "the", "of"]
    rows = []
    for d in range(160):
        n = int(rng.integers(0, 12))
        text = " ".join(rng.choice(words, size=n)) if n else "x"
        if d % 7 == 0 and d > 0:
            text = rows[d - 1]["text"]  # planted exact dup
        rows.append({"doc_id": d, "text": text, "lang": "en"})
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), sf + "/documents.parquet")

    from spiderman_ray.pipelines.text import curate, decontaminate

    got = list(curate(sf).to_pandas().sort_values("doc_id")["doc_id"])

    thr = (10 << 32) // 100
    df = pd.DataFrame(rows)
    df["n_tokens"] = df["text"].str.split(" ").str.len()
    df["fp"] = [hashlib.md5(t.encode()).hexdigest() for t in df["text"]]
    df["bench"] = [
        int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) < thr
        for d in df["doc_id"]
    ]
    keep = (
        (df["n_tokens"] >= 5)
        & ~df["text"].str.contains("drop", regex=False)
        & ~df["text"].str.contains("null", regex=False)
        & ~df["bench"]
    )
    flt = df[keep].sort_values("doc_id")
    ded = flt[~flt["fp"].duplicated()]
    contam = set(decontaminate(sf).to_pandas()["doc_id"])
    want = [d for d in ded["doc_id"] if d not in contam]
    assert got == want


def test_shuffle_strategy_default_pinned():
    """Regression pin for the round-3 hash-shuffle hang (BASELINE.md): the
    repo's exchanges MUST default to sort shuffle; HASH_SHUFFLE deadlocks
    single-node under a tight CPU quota. The SPIDERMAN_SHUFFLE knob exists
    so a real multi-node cluster can flip strategies without code edits."""
    import pytest as _pytest
    from ray.data.context import DataContext, ShuffleStrategy

    from spiderman_ray.pipelines import configure_shuffle

    ctx = DataContext.get_current()
    prior = ctx.shuffle_strategy
    try:
        assert configure_shuffle() == "sort_shuffle_pull_based"
        assert ctx.shuffle_strategy == ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
        assert configure_shuffle("hash") == "hash_shuffle"
        assert ctx.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
        with _pytest.raises(ValueError):
            configure_shuffle("push_based_nonsense")
    finally:
        ctx.shuffle_strategy = prior
        configure_shuffle()


def test_image_quality_matches_sequential(images_table):
    from spiderman_ray.functions.imaging import decode_image, quality_features_int
    from spiderman_ray.pipelines.images import image_quality

    got = image_quality(images_table).to_pandas().set_index("image_id")
    src = pq.read_table(images_table).to_pylist()
    assert len(got) == len(src)
    for r in src:
        want = quality_features_int(decode_image(r["bytes"]))
        for k, v in want.items():
            assert got.loc[r["image_id"], k] == v, (r["image_id"], k)


@pytest.fixture(scope="module")
def varied_dims_table(tmp_path_factory):
    """Metadata-only images table with varied aspect ratios spread over
    several parquet files, so the bucketed prefix-sum crosses block
    boundaries."""
    dims = [(64, 64), (80, 60), (60, 80), (96, 54), (54, 96), (90, 60), (60, 90),
            (128, 128), (100, 75), (75, 100), (160, 90), (48, 48), (66, 44)]
    d = tmp_path_factory.mktemp("dims")
    rows = [
        {"image_id": f"D{i:03d}", "w": w, "h": h, "bytes": b""}
        for i, (w, h) in enumerate(dims * 3)
    ]
    for p in range(4):
        pq.write_table(pa.Table.from_pylist(rows[p::4]), str(d / f"part-{p}.parquet"))
    return str(d), rows


def test_aspect_buckets_packing(varied_dims_table):
    from spiderman_ray.functions.imaging import ASPECT_LABELS, aspect_bucket_ids
    from spiderman_ray.pipelines.images import aspect_buckets

    path, rows = varied_dims_table
    got = aspect_buckets(path, batch=4).to_pandas().sort_values("image_id")
    assert len(got) == len(rows)
    # expected: bucket via the shared fn, seq = rank of image_id in bucket
    df = pd.DataFrame(rows).drop(columns=["bytes"])
    df["bucket"] = [
        ASPECT_LABELS[i]
        for i in aspect_bucket_ids(df["w"].to_numpy(), df["h"].to_numpy())
    ]
    df = df.sort_values("image_id")
    df["seq"] = df.groupby("bucket").cumcount()
    want = df.set_index("image_id")
    g = got.set_index("image_id")
    assert (g["bucket"] == want["bucket"]).all()
    assert (g["seq"] == want["seq"]).all()
    assert (g["batch_idx"] == want["seq"] // 4).all()
    assert (g["slot"] == want["seq"] % 4).all()
    # every full batch holds exactly `batch` images of ONE bucket
    full = got.groupby(["bucket", "batch_idx"]).size()
    n_per_bucket = got.groupby("bucket").size()
    for (b, bi), n in full.items():
        assert n == 4 or bi == n_per_bucket[b] // 4  # only the tail is short


def test_video_near_dups_planted_and_threshold():
    """Planted frame-sharing videos are found with the right shared-frame
    counts; min_shared gates the pair set; distinct videos produce no
    pairs."""
    import ray.data as rd

    from spiderman_ray.functions.imaging import generate_pixels
    from spiderman_ray.pipelines.multimodal import encode_video, video_near_dups

    f = [generate_pixels(f"vf-{i}", 16, 16) for i in range(6)]
    rows = [
        {"video_id": "A", "payload": encode_video(np.stack([f[0], f[1], f[2]]))},
        # shares frames 0+1 with A (re-cut: same opening, new ending)
        {"video_id": "B", "payload": encode_video(np.stack([f[0], f[1], f[3]]))},
        # shares only frame 2 with A
        {"video_id": "C", "payload": encode_video(np.stack([f[2], f[4]]))},
        # no shared frames with anyone
        {"video_id": "D", "payload": encode_video(np.stack([f[5]]))},
    ]
    ds = rd.from_items(rows)
    got = (
        video_near_dups(ds, every_nth=1, min_shared=1)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 0}
    pairs = {(r.a, r.b): r.n_shared for r in got.itertuples()}
    assert pairs[("A", "B")] == 2 and pairs[("A", "C")] == 1
    assert ("B", "C") not in pairs and "D" not in got["a"].tolist() + got["b"].tolist()
    # threshold: only the 2-shared pair survives min_shared=2
    strict = video_near_dups(ds, every_nth=1, min_shared=2).to_pandas()
    assert [(r.a, r.b, r.n_shared) for r in strict.itertuples()] == [("A", "B", 2)]
    # sampling: every_nth=2 sees frames {0,2} of A, {0,2} of B, {0} of C
    sampled = video_near_dups(ds, every_nth=2, min_shared=1).to_pandas()
    spairs = {(r.a, r.b): r.n_shared for r in sampled.itertuples()}
    assert spairs == {("A", "B"): 1, ("A", "C"): 1}


def test_audio_near_dups_partial_copy_and_threshold():
    """A planted half-copy shares exactly its first-half window
    fingerprints; unrelated clips pair only if their cycled samples
    collide (none here); min_shared gates."""
    import ray.data as rd

    from spiderman_ray.functions.audio import make_audio, wav_fingerprints
    from spiderman_ray.pipelines.multimodal import audio_near_dups, planted_dup_wav

    base = make_audio(b"a distinctive audio payload with enough text to vary")
    dup = planted_dup_wav(base, "k1")
    other = make_audio(b"completely different content here, nothing in common!")
    ds = rd.from_items(
        [{"clip_id": "A", "payload": base},
         {"clip_id": "Ad", "payload": dup},
         {"clip_id": "B", "payload": other}]
    )
    got = audio_near_dups(ds, window=128, min_shared=1).to_pandas()
    pairs = {(r.a, r.b): r.n_shared for r in got.itertuples()}
    want_shared = len(set(wav_fingerprints(base)) & set(wav_fingerprints(dup)))
    assert want_shared >= 1
    assert pairs == {("A", "Ad"): want_shared}
    # a threshold above the overlap empties the result
    strict = audio_near_dups(ds, window=128, min_shared=want_shared + 1).to_pandas()
    assert len(strict) == 0


def test_wav_fingerprints_contract():
    from spiderman_ray.functions.audio import make_audio, wav_fingerprints

    p = make_audio(b"some payload bytes for the fingerprint contract test")
    f = wav_fingerprints(p, window=128)
    assert len(f) == 8  # 1024 samples / 128
    assert f == wav_fingerprints(p, window=128)  # deterministic
    assert all(-(1 << 63) <= v < (1 << 63) for v in f)  # int64 range
    with pytest.raises(ValueError):
        wav_fingerprints(p, window=100)  # not a multiple of 64


def test_curate_images_sharpness_gate(images_table):
    """The blur gate drops exactly the images under the threshold and the
    result is a subset of the ungated curation."""
    from spiderman_ray.functions.imaging import decode_image, quality_features_int
    from spiderman_ray.pipelines.images import curate_images

    base = set(curate_images(images_table).to_pandas()["image_id"])
    src = {r["image_id"]: r["bytes"] for r in pq.read_table(images_table).to_pylist()}
    sharp = {i: quality_features_int(decode_image(b))["sharpness_x100"]
             for i, b in src.items()}
    thresh = sorted(sharp.values())[len(sharp) // 2]  # drops ~half
    gated = set(
        curate_images(images_table, min_sharpness_x100=thresh)
        .to_pandas()["image_id"]
    )
    assert gated <= base
    assert all(sharp[i] >= thresh for i in gated)
    # everything the gate removed really is below threshold OR was shadowed
    # by a dedup winner change; at minimum some removal happened
    assert len(gated) < len(base)


def test_pca_embed_matches_sequential_and_orders_variance():
    """The exact-integer Gram makes the distributed PCA bit-identical to a
    row-at-a-time sequential recompute; component variances come out in
    descending order (power iteration + deflation found the top of the
    spectrum)."""
    from spiderman_ray.pipelines.vectors import pca_embed, pca_embed_reference

    sf = "/root/testdata/sf0.001"
    got = pca_embed(sf, k=4).to_pandas().sort_values("vec_id").reset_index(drop=True)
    want = pd.DataFrame(pca_embed_reference(sf, k=4)).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    v = got[[f"p{c}" for c in range(4)]].to_numpy(dtype=np.float64).var(axis=0)
    assert (np.diff(v) <= v[:-1] * 1e-6).all()  # non-increasing (tolerates ties)


def test_image_dedup_survivors_quality_prefers_sharpest(images_table):
    """Per pHash component the SHARPEST member survives (tie -> min id);
    the planted pair (ID000 png, ID999 jpeg re-encode) keeps exactly one."""
    from spiderman_ray.functions.imaging import decode_image, quality_features_int
    from spiderman_ray.pipelines.images import (
        image_dedup_survivors,
        image_dedup_survivors_quality,
    )

    got = set(image_dedup_survivors_quality(images_table).to_pandas()["image_id"])
    src = {r["image_id"]: r["bytes"] for r in pq.read_table(images_table).to_pylist()}
    sharp = {i: quality_features_int(decode_image(b))["sharpness_x100"]
             for i, b in src.items()}
    # exactly one of the planted near-dup pair survives, and it is the
    # sharpness-preferred member
    pair = ["ID000", "ID999"]
    winner = sorted(pair, key=lambda i: (-sharp[i], i))[0]
    assert (winner in got) and (set(pair) - {winner}).isdisjoint(got)
    # same cardinality as min-id dedup (same components, different winners)
    base = set(image_dedup_survivors(images_table).to_pandas()["image_id"])
    assert len(got) == len(base)


def test_domain_quota_sample_caps_and_priority():
    """Per-source quota: at most cap rows per source, chosen by the
    hash_sample md5 priority (hash asc, doc_id tie) — identical to a
    single-process pandas recompute, so the keep set is layout-free."""
    import hashlib

    from spiderman_ray.pipelines.text import domain_quota_sample

    sf = "/root/testdata/sf0.01"
    cap = 10
    got = domain_quota_sample(sf, cap=cap).to_pandas().sort_values(
        ["source", "rank"]).reset_index(drop=True)
    docs = pq.read_table(
        sf + "/documents.parquet", columns=["doc_id", "source"]).to_pandas()
    docs["_h"] = docs["doc_id"].map(
        lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16))
    docs = docs.sort_values(["source", "_h", "doc_id"])
    docs["rank"] = docs.groupby("source").cumcount() + 1
    want = docs[docs["rank"] <= cap][["source", "doc_id", "rank"]].reset_index(
        drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got.groupby("source")["doc_id"].count() <= cap).all()


def test_kmeans_embed_matches_sequential_reference():
    """Exact-integer Lloyd rounds make the distributed fit bit-identical to
    the row-at-a-time sequential recompute; dist is the exact squared-L2 to
    the assigned (nearest) final centroid."""
    from spiderman_ray.pipelines.vectors import kmeans_embed, kmeans_embed_reference

    sf = "/root/testdata/sf0.001"
    got = kmeans_embed(sf, k=8, iters=6).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    want = pd.DataFrame(kmeans_embed_reference(sf, k=8, iters=6)).sort_values(
        "vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["cluster"].between(0, 7).all()
    assert (got["dist"] >= 0).all()


def test_semantic_dedup_clustered_matches_reference_and_supersets_exact():
    """SemDeDup as published: the within-cluster pair graph gives the
    sequential reference bit-for-bit (integer fit + sorted per-cluster
    matrices); survivors are a SUPERSET of the exact all-pairs variant
    (only cross-cluster pairs can be missed, none invented)."""
    from spiderman_ray.pipelines.vectors import (
        semantic_dedup_clustered,
        semantic_dedup_clustered_reference,
        semantic_dedup_survivors,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(semantic_dedup_clustered(sf).to_pandas()["vec_id"])
    want = [r["vec_id"] for r in semantic_dedup_clustered_reference(sf)]
    assert got == want
    exact = set(semantic_dedup_survivors(sf).to_pandas()["vec_id"])
    assert exact <= set(got)


def test_cluster_quota_sample_caps_and_matches_reference():
    """Cluster-balanced sampling: <= cap rows per k-means cluster, chosen
    by the hash_sample md5 priority — identical to the sequential
    recompute over the same integer fit."""
    from spiderman_ray.pipelines.vectors import (
        cluster_quota_sample,
        cluster_quota_sample_reference,
    )

    sf = "/root/testdata/sf0.001"
    got = cluster_quota_sample(sf, cap=5).to_pandas().sort_values(
        ["cluster", "rank"]).reset_index(drop=True)
    want = pd.DataFrame(cluster_quota_sample_reference(sf, cap=5))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got.groupby("cluster")["vec_id"].count() <= 5).all()


def test_compression_ratio_orders_repetition():
    """zlib ratio: a highly repetitive doc compresses below a diverse one;
    engine equals the sequential recompute."""
    from spiderman_ray.pipelines.text import (
        compression_ratio,
        compression_ratio_reference,
    )

    sf = "/root/testdata/sf0.001"
    got = compression_ratio(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = pd.DataFrame(compression_ratio_reference(sf)).sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["ratio_x10000"].between(1, 20000).all()


def test_curate_v2_band_quota_contracts():
    """v2 flagship: survivors are a subset of curate's manifest, every
    survivor's zlib ratio is inside the band, each source holds <= cap
    rows, and rank follows the md5-priority order."""
    import hashlib
    import zlib

    from spiderman_ray.pipelines.text import curate, curate_v2

    sf = "/root/testdata/sf0.001"
    got = curate_v2(sf).to_pandas()
    base = curate(sf).to_pandas()
    assert set(got["doc_id"]) <= set(base["doc_id"])
    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    raw = {r.doc_id: r.text.encode("utf-8") for r in docs.itertuples()}
    for d in got["doc_id"]:
        ratio = len(zlib.compress(raw[d], 6)) * 10000 // max(1, len(raw[d]))
        assert 4300 <= ratio <= 8400, (d, ratio)
    assert (got.groupby("source")["doc_id"].count() <= 15).all()
    for _, g in got.groupby("source"):
        prio = g["doc_id"].map(
            lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16))
        order = g.assign(_p=prio).sort_values(["_p", "doc_id"])
        assert list(order["rank"]) == list(range(1, len(g) + 1))


def test_incremental_dedup_plants_cross_split_and_within_new_dups(tmp_path):
    """Planted collisions: a new doc duplicating a BASE doc is rejected, a
    pair of new docs sharing text admits only the min doc_id, and unique
    new docs are admitted — on a crafted corpus where the gate data's
    all-unique texts can't exercise the branches."""
    import hashlib

    from spiderman_ray.pipelines.text import incremental_dedup

    def is_new(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) >= (50 << 32) // 100

    base_id = next(d for d in range(1000) if not is_new(d))
    new_ids = [d for d in range(1000) if is_new(d)][:4]
    rows = {
        base_id: "shared with base",
        new_ids[0]: "shared with base",     # cross-split dup -> rejected
        new_ids[1]: "dup inside new",
        new_ids[2]: "dup inside new",       # within-new dup -> min id wins
        new_ids[3]: "genuinely fresh",
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(rows), type=pa.int64()),
            "text": pa.array(list(rows.values()), type=pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = sorted(incremental_dedup(str(tmp_path)).to_pandas()["doc_id"])
    assert got == sorted([min(new_ids[1], new_ids[2]), new_ids[3]])


def test_incremental_dedup_minhash_component_contracts():
    """Near-dup ingest: admitted docs are new, each is the min NEW member
    of its component, and no admitted component contains a base doc —
    checked directly against the minhash_clusters labels."""
    import hashlib

    from spiderman_ray.pipelines.text import (
        incremental_dedup_minhash,
        minhash_clusters,
    )

    sf = "/root/testdata/sf0.001"
    got = incremental_dedup_minhash(sf).to_pandas()
    labels = minhash_clusters(sf).to_pandas()

    def is_new(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) >= (50 << 32) // 100

    labels["is_new"] = labels["doc_id"].map(is_new)
    by_cluster = labels.groupby("cluster_id")
    want = []
    for cid, g in by_cluster:
        if (~g["is_new"]).any():
            continue
        want.append((int(g["doc_id"].min()), int(cid)))
    got_pairs = sorted(zip(got["doc_id"], got["cluster_id"]))
    assert got_pairs == sorted(want)


def test_knn_label_agreement_equals_vote_recompute():
    """Engine == a pandas recompute from knn_graph(k=5) + the label column
    with the same vote rule (count desc, smallest label tie)."""
    from spiderman_ray.pipelines.vectors import knn_graph, knn_label_agreement

    sf = "/root/testdata/sf0.001"
    got = knn_label_agreement(sf).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    nbrs = knn_graph(sf, k=5).to_pandas()
    lab = pq.read_table(sf + "/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
    lmap = dict(zip(lab["vec_id"], lab["label"].astype("int64")))
    nbrs["nbr_label"] = nbrs["neighbor_id"].map(lmap)
    t = nbrs.groupby(["vec_id", "nbr_label"]).size().reset_index(name="c")
    t = t.sort_values(["vec_id", "c", "nbr_label"],
                      ascending=[True, False, True]).drop_duplicates("vec_id")
    want = pd.DataFrame(
        {"vec_id": t["vec_id"].astype("int64"),
         "label": t["vec_id"].map(lmap).astype("int64"),
         "pred": t["nbr_label"].astype("int64")}
    ).sort_values("vec_id").reset_index(drop=True)
    want["agree"] = (want["label"] == want["pred"]).astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cluster_cosine_pairs_fat_cluster_chunked(ray_session, tmp_path):
    """Round-4 verdict fix #1: a k-means partition where ONE cluster holds
    ~all vectors must not pin a cluster-sized matrix in any task — the
    within-cluster pair search is the cosine_pairs_ds chunk-pair block
    join restricted to same-cluster chunk pairs (chunk_rows=32 over a
    240-row blob forces >= 8 blocks, so the fat cluster spans many block
    pairs). Pairs must equal the brute-force same-cluster enumeration
    over the SAME integer fit."""
    from spiderman_ray.pipelines.vectors import (
        _kmeans_assign_int,
        _pca_quantize,
        cluster_cosine_pairs_ds,
        kmeans_fit_int,
    )

    rng = np.random.default_rng(7)
    n, dim = 240, 16
    base = rng.standard_normal(dim)
    X = (base[None, :] + 0.02 * rng.standard_normal((n, dim))).astype(np.float32)
    # vecs 0..2 are far-apart outliers; the min-k seed init makes them
    # (plus one blob member) the initial centroids, so Lloyd leaves the
    # whole blob in ONE fat cluster
    for i in range(3):
        X[i] = 0.0
        X[i, i] = 25.0 * (i + 1)
    d = tmp_path / "fat"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [[float(v) for v in row] for row in X],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    got = (
        cluster_cosine_pairs_ds(str(d), threshold=0.9, k=4, iters=2, chunk_rows=32)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )

    # brute force over the same deterministic integer fit
    Xq = np.array(
        pq.read_table(str(d / "embeddings.parquet"))["embedding"].to_pylist(),
        dtype=np.float32,
    )
    cents = kmeans_fit_int(str(d), 4, 2)
    a, _ = _kmeans_assign_int(_pca_quantize(Xq), cents)
    assert (np.bincount(a, minlength=4).max()) >= n * 0.9  # genuinely fat
    m = Xq.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    want_pairs = sorted(
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if a[i] == a[j] and sims[i, j] > 0.9
    )
    assert want_pairs, "planted blob must produce in-cluster near-dups"
    assert sorted(zip(got["a"], got["b"])) == want_pairs


def test_fp_overlap_pairs_hot_bucket_cap_and_chunking(ray_session):
    """Round-4 verdict fix #2: a degenerate fingerprint (all-black frame /
    silent window) shared by more items than ``hot_fp_cap`` is DROPPED —
    it carries no dedup signal for O(n^2) pair cost — while distinctive
    shared fingerprints still pair up; and sub-cap enumeration sliced at
    a tiny ``pair_chunk`` returns exactly the unchunked result."""
    import ray.data as rd

    from spiderman_ray.pipelines.multimodal import (
        _fp_overlap_pairs,
        _fp_overlap_pairs_reference,
    )

    ids, fs = [], []
    for i in range(20):  # the black frame: fp=0 on every item
        ids.append(f"C{i:02d}")
        fs.append(0)
    ids += ["C01", "C02"]          # distinctive shared frame
    fs += [101, 101]
    ids += ["C03", "C04", "C03", "C04"]  # two shared frames
    fs += [102, 102, 103, 103]
    ds = rd.from_arrow(
        pa.table({"clip_id": pa.array(ids, pa.string()),
                  "fp": pa.array(fs, pa.int64())})
    )

    capped = (
        _fp_overlap_pairs(ds, "clip_id", 1, hot_fp_cap=10, pair_chunk=16)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert list(zip(capped["a"], capped["b"], capped["n_shared"])) == [
        ("C01", "C02", 1), ("C03", "C04", 2),
    ]

    # sub-cap: tiny pair_chunk slices == the plain reference enumeration
    full = (
        _fp_overlap_pairs(ds, "clip_id", 1, hot_fp_cap=4096, pair_chunk=16)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    fps_map: dict[str, set] = {}
    for cid, f in zip(ids, fs):
        fps_map.setdefault(cid, set()).add(f)
    want = _fp_overlap_pairs_reference(fps_map, 1)
    assert [tuple(r.values()) for r in want] == list(
        zip(full["a"], full["b"], full["n_shared"])
    )
    assert len(full) == 20 * 19 // 2  # hot bucket pairs present when uncapped
    # reference mirrors the cap too
    assert _fp_overlap_pairs_reference(fps_map, 1, hot_fp_cap=10) == [
        {"a": "C01", "b": "C02", "n_shared": 1},
        {"a": "C03", "b": "C04", "n_shared": 2},
    ]


@pytest.mark.slow
def test_spiderman_join_native_equals_bucketed(ray_session, monkeypatch, tmp_path):
    """SPIDERMAN_JOIN knob (round-4 verdict ask #7): the native
    Dataset.join paths (anti_join_ids, knn_label_agreement) produce
    exactly the bucketed exchanges' results, so a real cluster can A/B
    the aggregator-actor join model with an env var, no code edits."""
    from spiderman_ray.pipelines import join_strategy
    from spiderman_ray.pipelines.text import anti_join_ids
    from spiderman_ray.pipelines.vectors import knn_label_agreement

    assert join_strategy() == "bucketed"  # default
    with pytest.raises(ValueError, match="SPIDERMAN_JOIN"):
        join_strategy("nope")

    sf = "/root/testdata/sf0.001"
    import ray.data as rd

    left = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "v": pa.array(range(100), pa.int64())})
    )
    drop = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 5, 5, 7, 200], pa.int64())})
    )
    buck_aj = anti_join_ids(left, drop, "doc_id", payload={"v": pa.int64()})\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    buck_knn = knn_label_agreement(sf).to_pandas()\
        .sort_values("vec_id").reset_index(drop=True)

    monkeypatch.setenv("SPIDERMAN_JOIN", "native")
    assert join_strategy() == "native"
    nat_aj = anti_join_ids(left, drop, "doc_id", payload={"v": pa.int64()})\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    nat_knn = knn_label_agreement(sf).to_pandas()\
        .sort_values("vec_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(buck_aj, nat_aj)
    pd.testing.assert_frame_equal(buck_knn, nat_knn)
    assert len(buck_aj) == 97  # dup + missing drop ids handled


@pytest.mark.slow
def test_curate_v2_incremental_composition_invariants(ray_session):
    """Daily-increment flagship: every admitted doc is (a) on the NEW side
    of the md5 split, (b) exact-admitted (a subset of incremental_dedup's
    fp admission), (c) not decontaminated, (d) the unique min-doc_id
    representative of a base-free near-dup cluster, and (e) domain-quota
    ranked. Deterministic across runs. (Exact equality vs the composed
    DuckDB/python pin is the sf0.01 driver gate.)"""
    import hashlib

    from spiderman_ray.pipelines.text import (
        curate_v2_incremental,
        decontaminate,
        incremental_dedup,
        minhash_clusters,
    )

    sf = "/root/testdata/sf0.001"
    got = curate_v2_incremental(sf).to_pandas().sort_values(
        ["source", "rank"]).reset_index(drop=True)
    again = curate_v2_incremental(sf).to_pandas().sort_values(
        ["source", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again)

    split = (50 << 32) // 100
    pri = lambda d: int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16)
    assert all(pri(d) >= split for d in got["doc_id"])  # (a)

    exact_ok = set(incremental_dedup(sf).to_pandas()["doc_id"].astype(int))
    assert set(got["doc_id"].astype(int)) <= exact_ok  # (b)

    contam = set(decontaminate(sf).to_pandas()["doc_id"].astype(int))
    assert not (set(got["doc_id"].astype(int)) & contam)  # (c)

    cl = minhash_clusters(sf).to_pandas()
    cmap = dict(zip(cl["doc_id"].astype(int), cl["cluster_id"].astype(int)))
    base_cl = {c for d, c in cmap.items() if pri(d) < split}
    clusters_seen = [cmap[int(d)] for d in got["doc_id"]]
    assert len(set(clusters_seen)) == len(clusters_seen)  # one rep per cluster
    assert not (set(clusters_seen) & base_cl)  # (d) base-free only
    # the rep is the min admitted doc of its cluster
    for d in got["doc_id"].astype(int):
        mates = [m for m, c in cmap.items() if c == cmap[d] and m in exact_ok
                 and m not in contam and pri(m) >= split]
        assert d == min(mates)

    per_src = got.groupby("source")["rank"].agg(["count", "min", "max"])
    assert (per_src["count"] <= 15).all()
    assert (per_src["min"] == 1).all()
    assert (per_src["max"] == per_src["count"]).all()  # (e)

def test_mixture_weights_matches_direct_recompute():
    """T5 sqrt-mixing weights: per-source token sums and the x1e6
    quantized sqrt-normalized weights match a pandas recompute; weights
    sum to ~1e6 and small sources are upsampled vs proportional."""
    from spiderman_ray.pipelines.text import mixture_weights

    sf = "/root/testdata/sf0.001"
    got = mixture_weights(sf).to_pandas().set_index("source")

    docs = pq.read_table(sf + "/documents.parquet", columns=["source", "text"]).to_pandas()
    docs["t"] = docs["text"].str.split(" ").map(len)
    n = docs.groupby("source")["t"].sum().sort_index()
    assert (got["n_tokens"].sort_index() == n).all()
    w = np.sqrt(n.to_numpy(dtype=np.float64))
    want = np.floor(w / w.sum() * 1e6 + 0.5).astype(np.int64)
    assert (got["weight_x1m"].sort_index().to_numpy() == want).all()
    assert abs(got["weight_x1m"].sum() - 1_000_000) <= len(got)
    # sqrt mixing upsamples the smallest source relative to proportional
    frac = n / n.sum()
    smallest = frac.idxmin()
    assert got.loc[smallest, "weight_x1m"] >= int(frac[smallest] * 1e6)

def test_embedding_outliers_exact_vs_direct_recompute():
    """Per-label distance-to-centroid top-cap: exact int64 lattice
    distances and (d2 desc, vec_id) ranks match a single-process bigint
    recompute bit-for-bit."""
    from spiderman_ray.pipelines.vectors import embedding_outliers

    sf = "/root/testdata/sf0.001"
    cap = 7
    got = (
        embedding_outliers(sf, cap=cap)
        .to_pandas()
        .sort_values(["label", "rank"])
        .reset_index(drop=True)
    )

    embs = pq.read_table(sf + "/embeddings.parquet").to_pandas()
    Q = np.floor(
        np.stack(embs["embedding"].to_numpy()).astype(np.float64) * 65536.0 + 0.5
    ).astype(np.int64)
    labels = embs["label"].to_numpy().astype(np.int64)
    rows = []
    for lb in np.unique(labels):
        m = labels == lb
        # python-bigint centroid, floor-div — the engine/oracle contract
        cent = np.array(
            [int(s) // int(m.sum()) for s in Q[m].astype(object).sum(axis=0)],
            dtype=np.int64,
        )
        diff = Q[m] - cent
        d2 = np.einsum("ij,ij->i", diff, diff)
        sub = pd.DataFrame(
            {"label": lb, "vec_id": embs["vec_id"].to_numpy()[m], "d2": d2}
        ).sort_values(["d2", "vec_id"], ascending=[False, True], kind="mergesort")
        sub = sub.head(cap).reset_index(drop=True)
        sub["rank"] = np.arange(1, len(sub) + 1, dtype=np.int64)
        rows.append(sub)
    want = (
        pd.concat(rows)
        .sort_values(["label", "rank"])
        .reset_index(drop=True)
        .astype({"label": "int64", "vec_id": "int64", "d2": "int64", "rank": "int64"})
    )
    pd.testing.assert_frame_equal(got[["label", "vec_id", "d2", "rank"]], want)

def test_label_centroid_sim_matches_direct_recompute():
    """Centroid-pair cosine: exact bigint dot/norms on the raw lattice
    sums, float only in the final division — matches recompute."""
    import math

    from spiderman_ray.pipelines.vectors import label_centroid_sim

    sf = "/root/testdata/sf0.001"
    got = label_centroid_sim(sf).to_pandas().set_index(["label_a", "label_b"])

    embs = pq.read_table(sf + "/embeddings.parquet").to_pandas()
    Q = np.floor(
        np.stack(embs["embedding"].to_numpy()).astype(np.float64) * 65536.0 + 0.5
    ).astype(np.int64)
    labels = embs["label"].to_numpy().astype(np.int64)
    sums = {
        int(lb): [int(x) for x in Q[labels == lb].astype(object).sum(axis=0)]
        for lb in np.unique(labels)
    }
    ls = sorted(sums)
    assert len(got) == len(ls) * (len(ls) - 1) // 2
    for i, a in enumerate(ls):
        for b in ls[i + 1:]:
            dot = sum(x * y for x, y in zip(sums[a], sums[b]))
            na = sum(x * x for x in sums[a])
            nb = sum(x * x for x in sums[b])
            want = int(math.floor(float(dot) / math.sqrt(float(na) * float(nb)) * 1e6 + 0.5))
            assert got.loc[(a, b), "sim_x1m"] == want

def test_source_overlap_matches_direct_recompute():
    """Pairwise source shingle intersection/union equals a single-process
    string-shingle-set recompute (hashed-set semantics == string sets)."""
    from spiderman_ray.pipelines.text import source_overlap

    sf = "/root/testdata/sf0.001"
    got = source_overlap(sf).to_pandas().set_index(["source_a", "source_b"])

    docs = pq.read_table(sf + "/documents.parquet", columns=["source", "text"]).to_pandas()
    def shingles(t):
        ws = t.split(" ")
        if len(ws) < 3:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
    per_src = {}
    for s, t in zip(docs["source"], docs["text"]):
        per_src.setdefault(s, set()).update(shingles(t))
    srcs = sorted(per_src)
    n_pairs = 0
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(per_src[a] & per_src[b])
            if inter == 0:
                assert (a, b) not in got.index
                continue
            n_pairs += 1
            assert got.loc[(a, b), "inter"] == inter
            assert got.loc[(a, b), "union_sz"] == len(per_src[a] | per_src[b])
    assert len(got) == n_pairs and n_pairs > 0

def test_data_splits_deterministic_and_complete():
    """Split manifest partitions every doc exactly once, token sums match
    a direct recompute, and assignment is layout-invariant (pure f(doc_id))."""
    import hashlib

    from spiderman_ray.pipelines.text import data_splits

    sf = "/root/testdata/sf0.001"
    got = data_splits(sf).to_pandas()

    docs = pq.read_table(sf + "/documents.parquet").to_pandas()
    pri = docs["doc_id"].map(lambda d: int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16))
    t80, t90 = (80 << 32) // 100, (90 << 32) // 100
    docs["split"] = np.where(pri < t80, "train", np.where(pri < t90, "val", "test"))
    docs["t"] = docs["text"].str.count(" ") + 1
    want = docs.groupby(["split", "source"]).agg(
        n_docs=("t", "size"), n_tokens=("t", "sum")).reset_index()
    g = got.sort_values(["split", "source"]).reset_index(drop=True)
    w = want.sort_values(["split", "source"]).reset_index(drop=True).astype(
        {"n_docs": "int64", "n_tokens": "int64"})
    pd.testing.assert_frame_equal(g[["split", "source", "n_docs", "n_tokens"]], w)
    assert got["n_docs"].sum() == len(docs)
    # split fractions are in the md5-priority ballpark (80/10/10)
    frac = got.groupby("split")["n_docs"].sum() / len(docs)
    assert 0.7 < frac["train"] < 0.9

def test_simhash_eval_confusion_counts_consistent():
    """tp+fp == |simhash pairs|, tp+fn == |exact pairs|, and the x1m
    ratios match the integer counts."""
    from spiderman_ray.pipelines.text import (
        ngram_jaccard_pairs, simhash_eval, simhash_near_dups)

    sf = "/root/testdata/sf0.001"
    got = simhash_eval(sf).to_pandas().iloc[0]
    n_sim = len(simhash_near_dups(sf))
    n_ex = len(ngram_jaccard_pairs(sf).to_pandas())
    assert got["tp"] + got["fp"] == n_sim
    assert got["tp"] + got["fn"] == n_ex
    if got["tp"] + got["fp"]:
        assert got["precision_x1m"] == int(
            np.floor(got["tp"] / (got["tp"] + got["fp"]) * 1e6 + 0.5))
    if got["tp"] + got["fn"]:
        assert got["recall_x1m"] == int(
            np.floor(got["tp"] / (got["tp"] + got["fn"]) * 1e6 + 0.5))


def test_pmi_collocations_matches_bruteforce():
    """Top-k PMI lift must equal a single-process brute-force recompute
    (same filtered-adjacency, same integer floor-div arithmetic, same
    tie-break) on sf0.001."""
    from collections import Counter

    from spiderman_ray.pipelines.text import pmi_collocations

    sf = "/root/testdata/sf0.001"
    got = pmi_collocations(sf).to_pandas()

    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
    ab: Counter = Counter()
    for t in texts["text"].to_pylist():
        ws = [w for w in t.split(" ") if w != ""]
        ab.update(zip(ws, ws[1:]))
    n_total = sum(ab.values())
    c1: Counter = Counter()
    c2: Counter = Counter()
    for (a, b), n in ab.items():
        c1[a] += n
        c2[b] += n
    rows = [
        (a, b, n, (100 * n * n_total) // (c1[a] * c2[b]))
        for (a, b), n in ab.items()
        if n >= 3
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = pd.DataFrame(rows[:50], columns=["w1", "w2", "n_ab", "lift100"])
    got = got.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["w1", "w2", "n_ab", "lift100"]].astype(
            {"n_ab": "int64", "lift100": "int64"}
        ),
        want.astype({"n_ab": "int64", "lift100": "int64"}),
    )


def test_vocab_growth_tiles_and_saturates():
    """The growth curve must tile the corpus type space: cum_types ends
    at the total distinct shingle-type count, new_types are positive,
    buckets are sorted, and the curve equals a sequential recompute."""
    from spiderman_ray.pipelines.text import _shingle_hashes_batch, vocab_growth

    sf = "/root/testdata/sf0.001"
    got = vocab_growth(sf)

    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    first: dict[int, int] = {}
    sets = _shingle_hashes_batch(tbl["text"].to_pylist())
    for did, s in zip(tbl["doc_id"].to_pylist(), sets):
        for h in s.tolist():
            if h not in first or did < first[h]:
                first[h] = did
    buckets = pd.Series([d // 100 for d in first.values()]).value_counts().sort_index()
    assert got["bucket"].tolist() == buckets.index.tolist()
    assert got["new_types"].tolist() == buckets.tolist()
    assert got["cum_types"].iloc[-1] == len(first)
    assert (got["new_types"] > 0).all()
    assert got["bucket"].is_monotonic_increasing


def test_ngram_novelty_matches_bruteforce():
    """Per-doc novelty must equal a sequential recompute over the same
    md5 split, shingle hashes and integer floor division."""
    import hashlib

    from spiderman_ray.pipelines.text import _shingle_hashes_batch, ngram_novelty

    sf = "/root/testdata/sf0.001"
    got = ngram_novelty(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)

    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    dids = tbl["doc_id"].to_pylist()
    thresh = (50 << 32) // 100
    hv = [int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) for d in dids]
    sets = _shingle_hashes_batch(tbl["text"].to_pylist())
    base: set = set()
    for h, s in zip(hv, sets):
        if h < thresh:
            base.update(s.tolist())
    rows = [
        (d, len(s), sum(1 for x in s.tolist() if x not in base))
        for d, h, s in zip(dids, hv, sets)
        if h >= thresh
    ]
    want = pd.DataFrame(rows, columns=["doc_id", "n_shingles", "n_novel"])
    want["novelty_x1m"] = (1_000_000 * want["n_novel"]) // want["n_shingles"]
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_source_dup_rates_consistent():
    """Per-source totals must tile the corpus: n_docs sums to the corpus
    size, exact-dup total equals docs minus distinct fingerprints, and
    near-dup total equals the non-representative minhash members."""
    import hashlib

    from spiderman_ray.pipelines.text import minhash_clusters, source_dup_rates

    sf = "/root/testdata/sf0.001"
    got = source_dup_rates(sf).to_pandas()

    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    fps = [hashlib.md5(t.encode()).hexdigest() for t in tbl["text"].to_pylist()]
    assert got["n_docs"].sum() == len(fps)
    assert got["n_exact_dups"].sum() == len(fps) - len(set(fps))
    cl = minhash_clusters(sf).to_pandas()
    assert got["n_near_dups"].sum() == int((cl["cluster_id"] != cl["doc_id"]).sum())
    ge = got[got["n_exact_dups"] > 0]
    assert (ge["exact_x1m"] == (1_000_000 * ge["n_exact_dups"]) // ge["n_docs"]).all()
    assert got["source"].is_monotonic_increasing


def test_minhash_threshold_sweep_matches_reference():
    """The one-pass distributed sweep must equal the sequential
    reference at every threshold, and behave monotonically: gold pairs
    (tp+fn) never grow as the threshold rises, candidate mislabels (fp)
    never shrink."""
    from spiderman_ray.pipelines.text import (
        minhash_sweep_reference,
        minhash_threshold_sweep,
    )

    sf = "/root/testdata/sf0.001"
    got = minhash_threshold_sweep(sf, thresholds=(40, 60, 80)).to_pandas()
    want = pd.DataFrame(minhash_sweep_reference(sf, thresholds=(40, 60, 80)))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), want.astype("int64")
    )
    gold = (got["tp"] + got["fn"]).to_numpy()
    assert (gold[1:] <= gold[:-1]).all()
    assert (got["fp"].to_numpy()[1:] >= got["fp"].to_numpy()[:-1]).all()
    assert ((got["tp"] + got["fp"]).to_numpy() == (got["tp"] + got["fp"]).to_numpy()[0]).all()


def test_round5_ops_on_adversarial_corpus(tmp_path):
    """Degenerate inputs (empty text, 1-word docs, exact clones, unicode,
    a doc that is its own shingle fallback) must flow through the round-5
    corpus-statistics ops without schema breaks and match brute force."""
    import hashlib
    from collections import Counter

    from spiderman_ray.pipelines.text import (
        _shingle_hashes_batch,
        ngram_novelty,
        pmi_collocations,
        source_dup_rates,
        vocab_growth,
    )

    docs = [
        (0, "", "s0"),
        (1, "one", "s0"),
        (2, "a b", "s1"),
        (3, "the same exact clone text here", "s1"),
        (4, "the same exact clone text here", "s1"),
        (5, "ünïcode wörds ünïcode wörds ünïcode", "s2"),
        (6, "x " * 50 + "x", "s2"),  # heavy repetition
        (7, "the same exact clone text here", "s2"),
    ]
    tbl = pa.table(
        {"doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
         "text": pa.array([t for _, t, _ in docs], pa.string()),
         "lang": pa.array(["xx"] * len(docs), pa.string()),
         "source": pa.array([s for _, _, s in docs], pa.string()),
         "n_chars": pa.array([len(t) for _, t, _ in docs], pa.int64())}
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    # pmi vs brute force (same filtered adjacency + integer floor-div)
    got = pmi_collocations(sf, min_count=2, k=10).to_pandas()
    ab: Counter = Counter()
    for _, t, _ in docs:
        ws = [w for w in t.split(" ") if w != ""]
        ab.update(zip(ws, ws[1:]))
    n_total = sum(ab.values())
    c1: Counter = Counter()
    c2: Counter = Counter()
    for (x, y), n in ab.items():
        c1[x] += n
        c2[y] += n
    rows = sorted(
        ((x, y, n, (100 * n * n_total) // (c1[x] * c2[y]))
         for (x, y), n in ab.items() if n >= 2),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:10]
    want = pd.DataFrame(rows, columns=["w1", "w2", "n_ab", "lift100"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n_ab": "int64", "lift100": "int64"}),
        want.astype({"n_ab": "int64", "lift100": "int64"}),
    )

    # vocab growth tiles the type space (bucket_size=4 splits the ids)
    vg = vocab_growth(sf, bucket_size=4)
    first: dict = {}
    sets = _shingle_hashes_batch([t for _, t, _ in docs])
    for (did, _, _), s in zip(docs, sets):
        for h in s.tolist():
            if h not in first or did < first[h]:
                first[h] = did
    assert vg["cum_types"].iloc[-1] == len(first)

    # novelty: base = hash < 50%; brute-force recompute
    nov = ngram_novelty(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    thresh = (50 << 32) // 100
    hv = {d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) for d, _, _ in docs}
    base: set = set()
    for (did, _, _), s in zip(docs, sets):
        if hv[did] < thresh:
            base.update(s.tolist())
    wrows = [
        (did, len(s), sum(1 for x in s.tolist() if x not in base))
        for (did, _, _), s in zip(docs, sets)
        if hv[did] >= thresh
    ]
    wnov = pd.DataFrame(wrows, columns=["doc_id", "n_shingles", "n_novel"])
    wnov["novelty_x1m"] = (1_000_000 * wnov["n_novel"]) // wnov["n_shingles"]
    pd.testing.assert_frame_equal(
        nov.astype("int64"),
        wnov.sort_values("doc_id").reset_index(drop=True).astype("int64"),
    )

    # dup rates: exact side brute-forced (clones 3/4/7 share one fp)
    sd = source_dup_rates(sf).to_pandas().set_index("source")
    assert int(sd["n_docs"].sum()) == len(docs)
    fps = [hashlib.md5(t.encode()).hexdigest() for _, t, _ in docs]
    assert int(sd["n_exact_dups"].sum()) == len(fps) - len(set(fps))
    assert sd.loc["s1", "n_exact_dups"] == 1  # doc 4 (doc 3 is first)
    assert sd.loc["s2", "n_exact_dups"] == 1  # doc 7


def test_source_novelty_consistent_with_per_doc():
    """Per-source means must compose the per-doc op exactly: grouping
    ngram_novelty's output by the documents table's source column gives
    the same (n_new_docs, floor-div mean) rows."""
    from spiderman_ray.pipelines.text import ngram_novelty, source_novelty

    sf = "/root/testdata/sf0.001"
    got = source_novelty(sf).to_pandas().reset_index(drop=True)

    nov = ngram_novelty(sf).to_pandas()
    src = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    m = nov.merge(src, on="doc_id")
    agg = m.groupby("source").agg(
        n_new_docs=("doc_id", "size"), s=("novelty_x1m", "sum")
    ).reset_index().sort_values("source").reset_index(drop=True)
    agg["mean_novelty_x1m"] = agg["s"] // agg["n_new_docs"]
    pd.testing.assert_frame_equal(
        got.astype({"n_new_docs": "int64", "mean_novelty_x1m": "int64"}),
        agg[["source", "n_new_docs", "mean_novelty_x1m"]].astype(
            {"n_new_docs": "int64", "mean_novelty_x1m": "int64"}
        ),
    )


def test_dedup_index_roundtrip(tmp_path):
    """The persisted-index path must reproduce the direct incremental
    dedup exactly (the index is a deterministic function of the base
    split), with base text never read on the incremental side; the band
    table carries 16 rows per base doc."""
    import pyarrow.dataset as pds

    from spiderman_ray.pipelines.text import (
        build_dedup_index,
        incremental_dedup,
        incremental_dedup_indexed,
    )

    sf = "/root/testdata/sf0.001"
    dest = str(tmp_path / "idx")
    info = build_dedup_index(sf, dest)
    assert info["n_band_rows"] == info["n_base_docs"] * 16
    assert set(pds.dataset(f"{dest}/fps").schema.names) == {
        "doc_id", "fp", "_fshard"}

    a = incremental_dedup_indexed(sf, dest).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    b = incremental_dedup(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
