"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline (spiderman_ray engine over the
deterministic simulated web) and returns the image+caption table;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-data operators over the testdata tables; ``oracle_sql()`` gives the
DuckDB-checkable subset.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in spiderman_ray) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import hashlib
import math
import os
from collections.abc import Callable
from typing import Any

_CRAWL_CACHE: dict[str, str] = {}


def _crawl_out(scale: str = "t1") -> str:
    """Run the crawl engine once per process per scale; cached on disk under
    /tmp and resumable, so repeat calls are no-ops."""
    if scale in _CRAWL_CACHE:
        return _CRAWL_CACHE[scale]
    import shutil

    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.policy import CrawlPolicy
    from spiderman_ray.simweb import SimParams
    from spiderman_ray.stages.parse_sink import CRAWL_ORDER

    out = f"/tmp/spiderman_entry_{scale}"
    # a checkpoint written by an older code version may carry a stale table
    # schema — resume only when the schema fingerprint matches
    # v4: float32 pixels/DCT + PNG Up-filter — image bytes changed, so
    # older cached crawls must not resume against new pins
    sig = "v5:" + ",".join(f.name for f in CRAWL_ORDER)
    sig_path = os.path.join(out, "schema.sig")
    resume = os.path.isdir(os.path.join(out, "manifests"))
    if resume:
        old = open(sig_path).read() if os.path.exists(sig_path) else ""
        if old != sig:
            shutil.rmtree(out)
            resume = False
    eng = CrawlEngine(SimParams.for_scale(scale), CrawlPolicy(), out_dir=out)
    eng.run(resume=resume)
    with open(sig_path, "w") as f:
        f.write(sig)
    eng._pool.shutdown()
    _CRAWL_CACHE[scale] = out
    return out


def _crawl_pipelined_out(scale: str = "t1") -> str:
    """Run the PIPELINED (reference-FIFO) mode once per process per scale,
    cached under /tmp. No resume support in this mode — the cache key is
    a completion sig written after a full run; a stale/partial dir reruns
    from scratch."""
    key = f"pl_{scale}"
    if key in _CRAWL_CACHE:
        return _CRAWL_CACHE[key]
    import shutil

    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.policy import CrawlPolicy
    from spiderman_ray.simweb import SimParams
    from spiderman_ray.stages.parse_sink import CRAWL_ORDER

    out = f"/tmp/spiderman_entry_{key}"
    sig = "v5:" + ",".join(f.name for f in CRAWL_ORDER)
    sig_path = os.path.join(out, "schema.sig")
    done = os.path.exists(sig_path) and open(sig_path).read() == sig
    if not done:
        if os.path.isdir(out):
            shutil.rmtree(out)
        eng = CrawlEngine(SimParams.for_scale(scale), CrawlPolicy(), out_dir=out)
        eng.run_pipelined()
        with open(sig_path, "w") as f:
            f.write(sig)
        eng._pool.shutdown()
    _CRAWL_CACHE[key] = out
    return out


def _crawl_throttled_out(scale: str = "t1") -> str:
    """BFS crawl with the AutoThrottle analog enabled, cached under /tmp.
    NO resume: a resumed run restarts adaptive delays at start_delay (the
    documented scrapy-restart behavior), which would diverge from the
    uninterrupted oracle pin — so a partial dir reruns from scratch."""
    key = f"at_{scale}"
    if key in _CRAWL_CACHE:
        return _CRAWL_CACHE[key]
    import shutil

    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.policy import CrawlPolicy
    from spiderman_ray.simweb import SimParams
    from spiderman_ray.stages.parse_sink import CRAWL_ORDER

    out = f"/tmp/spiderman_entry_{key}"
    sig = "v5:" + ",".join(f.name for f in CRAWL_ORDER)
    sig_path = os.path.join(out, "schema.sig")
    done = os.path.exists(sig_path) and open(sig_path).read() == sig
    if not done:
        if os.path.isdir(out):
            shutil.rmtree(out)
        eng = CrawlEngine(
            SimParams.for_scale(scale),
            CrawlPolicy(autothrottle=dict(_THROTTLE_CFG)),
            out_dir=out,
        )
        eng.run()
        with open(sig_path, "w") as f:
            f.write(sig)
        eng._pool.shutdown()
    _CRAWL_CACHE[key] = out
    return out


def entry() -> Any:
    """Flagship: crawl the simulated web (seeds -> dedup -> politeness-aware
    fetch -> parse -> image rows), then validate the output table against
    the sf0.001 testdata presence (smoke read). Returns the image+caption
    table (input_hint schema + lineage columns)."""
    import ray.data as rd

    from spiderman_ray.engine import read_table_all_gens

    # touch the sf0.001 testdata (driver contract: load it)
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["doc_id"])
    assert docs.count() > 0
    out = _crawl_out("t1")
    return read_table_all_gens(out, "images")


def queries() -> dict[str, Callable[[str], Any]]:
    from spiderman_ray.engine import read_table_all_gens
    from spiderman_ray.pipelines import images as I
    from spiderman_ray.pipelines import relational as R
    from spiderman_ray.pipelines import text as T
    from spiderman_ray.pipelines import recipes as RC
    from spiderman_ray.pipelines import vectors as V

    def crawl_images(sf_dir: str) -> Any:
        return read_table_all_gens(_crawl_out("t1"), "images").select(
            ["image_id", "w", "h", "fmt", "caption", "phash", "fkey", "pagenum", "px"]
        )

    def crawl_pipelined_pages(sf_dir: str) -> Any:
        # pages are emitted per parsed SEED page and carry seed lineage, so
        # the pipelined mode's pages table is bit-identical to the BFS
        # oracle even under duplicate links — full-row gate check of the
        # FIFO mode
        return read_table_all_gens(_crawl_pipelined_out("t1"), "pages")

    def crawl_pipelined_images(sf_dir: str) -> Any:
        # content-stable columns only: caption/fkey/pagenum/px/seq carry
        # the dedup WINNER's lineage, which is pop-order-defined in the
        # FIFO mode (the documented reference-racy contract)
        return read_table_all_gens(_crawl_pipelined_out("t1"), "images").select(
            ["image_id", "w", "h", "fmt", "phash", "url"]
        )

    def crawl_throttled_order(sf_dir: str) -> Any:
        # AutoThrottle mode end to end: the ADAPTIVE per-host vts sequence
        # (latency-driven delays via the shared throttle_step) must match
        # the reference loop fetch-for-fetch across generations. vts is
        # integerized to µs on both sides: DuckDB's double parser is 1 ULP
        # off on some shortest-repr literals (measured:
        # 474.68223969548717 parses to the next double up), so raw DOUBLE
        # pins of adaptive timestamps are not hash-stable.
        import numpy as np
        import pyarrow as pa

        t = read_table_all_gens(_crawl_throttled_out("t1"), "crawl_order")
        vts_us = np.floor(
            t["vts_ms"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        t = t.drop_columns(["vts_ms"])
        return t.append_column("vts_us", pa.array(vts_us))

    def crawl_order(sf_dir: str) -> Any:
        return read_table_all_gens(_crawl_out("t1"), "crawl_order")

    def crawl_dead_letters(sf_dir: str) -> Any:
        return read_table_all_gens(_crawl_out("t1"), "dead_letters")

    def crawl_validate(sf_dir: str) -> Any:
        out = _crawl_out("t1")
        return I.validate_summary(os.path.join(out, "tables", "images"))

    def crawl_phash_dups(sf_dir: str) -> Any:
        out = _crawl_out("t1")
        return I.phash_near_dups(os.path.join(out, "tables", "images"))

    def crawl_price_monitor(sf_dir: str) -> Any:
        from spiderman_ray.pipelines.monitor import price_monitor

        out = _crawl_out("t1")
        return price_monitor(os.path.join(out, "tables", "pages"), threshold=5500)

    def crawl_thumbnails(sf_dir: str) -> Any:
        from spiderman_ray.pipelines.multimodal import thumbnails

        out = _crawl_out("t1")
        return thumbnails(os.path.join(out, "tables", "images"), size=16).select_columns(
            ["image_id", "w", "h", "fmt", "phash"]
        )

    def crawl_image_stats(sf_dir: str) -> Any:
        out = _crawl_out("t1")
        return I.image_stats(os.path.join(out, "tables", "images"))

    def crawl_image_quality(sf_dir: str) -> Any:
        return I.image_quality(os.path.join(_crawl_out("t1"), "tables", "images"))

    def crawl_aspect_buckets(sf_dir: str) -> Any:
        return I.aspect_buckets(os.path.join(_crawl_out("t1"), "tables", "images"))

    def crawl_host_stats(sf_dir: str) -> Any:
        from spiderman_ray.pipelines.monitor import crawl_host_stats as chs

        return chs(_crawl_out("t1"))

    def crawl_lineage_stats(sf_dir: str) -> Any:
        from spiderman_ray.pipelines.monitor import crawl_lineage_stats as cls_

        return cls_(_crawl_out("t1"))

    def crawl_host_authority(sf_dir: str) -> Any:
        from spiderman_ray.pipelines.monitor import crawl_host_authority as cha

        return cha(_crawl_out("t1"))

    def crawl_image_dedup(sf_dir: str) -> Any:
        return I.image_dedup_exact(
            os.path.join(_crawl_out("t1"), "tables", "images")
        )

    def crawl_image_survivors(sf_dir: str) -> Any:
        return I.image_dedup_survivors(
            os.path.join(_crawl_out("t1"), "tables", "images")
        )

    def crawl_image_survivors_quality(sf_dir: str) -> Any:
        return I.image_dedup_survivors_quality(
            os.path.join(_crawl_out("t1"), "tables", "images")
        )

    def crawl_incremental_image_dedup(sf_dir: str) -> Any:
        # daily image-ingest admission vs the base snapshot (exact fp +
        # pHash-component representative) — image-axis incremental dedup
        return I.incremental_image_dedup(
            os.path.join(_crawl_out("t1"), "tables", "images")
        )

    def crawl_curate_images_incremental(sf_dir: str) -> Any:
        # the multimodal flagship's daily-increment form: gates on the
        # new side only + incremental exact/pHash admission
        return I.curate_images_incremental(
            os.path.join(_crawl_out("t1"), "tables", "images")
        )

    def crawl_phash_clusters(sf_dir: str) -> Any:
        return I.image_phash_clusters(
            os.path.join(_crawl_out("t1"), "tables", "images")
        )

    def crawl_curate_images(sf_dir: str) -> Any:
        return I.curate_images(
            os.path.join(_crawl_out("t1"), "tables", "images")
        )

    def crawl_caption_align(sf_dir: str) -> Any:
        from spiderman_ray.pipelines.multimodal import caption_align

        return caption_align(os.path.join(_crawl_out("t1"), "tables", "images"))

    def crawl_curate_images_aligned(sf_dir: str) -> Any:
        return I.curate_images(
            os.path.join(_crawl_out("t1"), "tables", "images"),
            align_min_x1e6=100_000,
        )

    def crawl_curate_images_quality(sf_dir: str) -> Any:
        # full gate stack: validate + caption + alignment + blur (the
        # Laplacian-variance sharpness gate) before dedup
        return I.curate_images(
            os.path.join(_crawl_out("t1"), "tables", "images"),
            align_min_x1e6=100_000,
            min_sharpness_x100=450,
        )

    def _pii_docs(sf_dir: str) -> Any:
        """Documents with PII injected deterministically from doc_id (docs
        are word-soup with none): every third doc gains an email, an IPv4
        and a phone number the SQL oracle reconstructs with string
        concatenation. Injection is per-batch Arrow concat; shared input
        for pii_redaction and bpe_token_stats."""
        import pyarrow as pa
        import ray.data as rd

        def inject(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            did = batch["doc_id"]
            suffix = [
                (
                    f" contact user{i}@example.com ip 10.{i % 256}.{i % 7}."
                    f"{i % 13} phone +1-555-{i % 10000:04d}"
                    if i % 3 == 0
                    else ""
                )
                for i in did.to_pylist()
            ]
            text = pc.binary_join_element_wise(
                pc.cast(batch["text"], pa.string()), pa.array(suffix), ""
            )
            return pa.table({"doc_id": did, "text": text})

        return rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        ).map_batches(inject, batch_format="pyarrow")

    def pii_redaction(sf_dir: str) -> Any:
        """redact_pii over the PII-injected documents; the operator itself
        is pure (works on any (doc_id, text) table)."""
        from spiderman_ray.pipelines.text import redact_pii

        return redact_pii(_pii_docs(sf_dir))

    def bpe_token_stats(sf_dir: str) -> Any:
        """BPE-style pretokenizer counts over the PII-injected documents —
        the injected '@'/'.'/'-'/'+' punctuation exercises the non-word
        branch the word-soup corpus lacks."""
        from spiderman_ray.pipelines.text import bpe_token_stats as bts

        return bts(_pii_docs(sf_dir))

    def _docs_as_videos(sf_dir: str) -> Any:
        """Deterministic SPV1 video table synthesized from documents: each
        doc's UTF-8 bytes become cycled RGB frames packed in the seekable
        container (multimodal.make_video). PNG frames are lossless, so the
        decoded pixel sums are exact integers the SQL oracle re-derives."""
        import pyarrow as pa
        import ray.data as rd

        def conv(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from spiderman_ray.pipelines.multimodal import make_video

            ids = pc.cast(batch["doc_id"], pa.string())
            payloads = [make_video(t.encode()) for t in batch["text"].to_pylist()]
            return pa.table(
                {"video_id": ids, "payload": pa.array(payloads, pa.binary())}
            )

        return rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        ).map_batches(conv, batch_format="pyarrow")

    def video_frames(sf_dir: str) -> Any:
        from spiderman_ray.pipelines.multimodal import video_frame_sample

        return video_frame_sample(
            _docs_as_videos(sf_dir), every_nth=8, mode="spv1"
        ).drop_columns(["frame_bytes"])  # binary column: not SQL-comparable

    def _docs_as_videos_dups(sf_dir: str) -> Any:
        """The _docs_as_videos table plus a PLANTED near-duplicate (frame 0
        kept, one distinct frame appended — multimodal.planted_dup_video)
        for every doc_id % 5 == 0: ground truth for video dedup."""
        import pyarrow as pa
        import ray.data as rd

        def conv(batch: pa.Table) -> pa.Table:
            from spiderman_ray.pipelines.multimodal import (
                make_video,
                planted_dup_video,
            )

            ids, payloads = [], []
            for did, text in zip(batch["doc_id"].to_pylist(),
                                 batch["text"].to_pylist()):
                base = make_video(text.encode())
                ids.append(f"V{did}")
                payloads.append(base)
                if did % 5 == 0:
                    ids.append(f"V{did}d")
                    payloads.append(planted_dup_video(base, str(did)))
            return pa.table(
                {"video_id": pa.array(ids, pa.string()),
                 "payload": pa.array(payloads, pa.binary())}
            )

        return rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        ).map_batches(conv, batch_format="pyarrow")

    def video_near_dups(sf_dir: str) -> Any:
        from spiderman_ray.pipelines.multimodal import video_near_dups as vnd

        return vnd(_docs_as_videos_dups(sf_dir), every_nth=4, min_shared=1)

    def _docs_as_wavs_dups(sf_dir: str) -> Any:
        """The _docs_as_wavs table plus a PLANTED partial copy (first half
        kept, key-derived tail — multimodal.planted_dup_wav) for every
        doc_id % 5 == 0: ground truth for audio dedup."""
        import pyarrow as pa
        import ray.data as rd

        def conv(batch: pa.Table) -> pa.Table:
            from spiderman_ray.functions.audio import make_audio
            from spiderman_ray.pipelines.multimodal import planted_dup_wav

            ids, payloads = [], []
            for did, text in zip(batch["doc_id"].to_pylist(),
                                 batch["text"].to_pylist()):
                base = make_audio(text.encode())
                ids.append(f"C{did}")
                payloads.append(base)
                if did % 5 == 0:
                    ids.append(f"C{did}d")
                    payloads.append(planted_dup_wav(base, str(did)))
            return pa.table(
                {"clip_id": pa.array(ids, pa.string()),
                 "payload": pa.array(payloads, pa.binary())}
            )

        return rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        ).map_batches(conv, batch_format="pyarrow")

    def audio_near_dups(sf_dir: str) -> Any:
        from spiderman_ray.pipelines.multimodal import audio_near_dups as and_

        return and_(_docs_as_wavs_dups(sf_dir), window=128, min_shared=1)

    def _docs_as_wavs(sf_dir: str) -> Any:
        """Deterministic RIFF/WAVE table synthesized from documents: each
        doc's UTF-8 bytes become 1024 cycled int16 PCM samples in a real
        WAV container (functions.audio.make_audio); the SQL oracle
        re-derives the identical samples from hex(encode(text))."""
        import pyarrow as pa
        import ray.data as rd

        def conv(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from spiderman_ray.functions.audio import make_audio

            ids = pc.cast(batch["doc_id"], pa.string())
            payloads = [make_audio(t.encode()) for t in batch["text"].to_pylist()]
            return pa.table(
                {"clip_id": ids, "payload": pa.array(payloads, pa.binary())}
            )

        return rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        ).map_batches(conv, batch_format="pyarrow")

    def audio_features(sf_dir: str) -> Any:
        from spiderman_ray.pipelines import pool_size
        from spiderman_ray.pipelines.multimodal import AudioFeatures

        return _docs_as_wavs(sf_dir).map_batches(
            AudioFeatures, fn_constructor_kwargs={"mode": "wav"},
            batch_format="pyarrow", batch_size=64,
            concurrency=pool_size(4), num_cpus=1,
        )

    return {
        # -- crawl engine (pytest-verified vs oracle; rows-only here) ------
        "crawl_images": crawl_images,
        "crawl_pipelined_pages": crawl_pipelined_pages,
        "crawl_pipelined_images": crawl_pipelined_images,
        "crawl_throttled_order": crawl_throttled_order,
        "crawl_order": crawl_order,
        "crawl_dead_letters": crawl_dead_letters,
        "crawl_validate": crawl_validate,
        "crawl_phash_dups": crawl_phash_dups,
        "crawl_thumbnails": crawl_thumbnails,
        "crawl_image_stats": crawl_image_stats,
        "crawl_image_quality": crawl_image_quality,
        "crawl_aspect_buckets": crawl_aspect_buckets,
        "crawl_host_stats": crawl_host_stats,
        # per-seed lineage (closed-form roots from the seq encoding)
        "crawl_lineage_stats": crawl_lineage_stats,
        # host authority: PageRank over the real fetch-lineage host graph
        # (graph family applied to the crawl's own data)
        "crawl_host_authority": crawl_host_authority,
        # byte-level exact content dedup over the image store
        "crawl_image_dedup": crawl_image_dedup,
        # image-axis dedup family: exact + pHash-component survivors
        "crawl_image_survivors": crawl_image_survivors,
        "crawl_image_survivors_quality": crawl_image_survivors_quality,
        # audit view: pHash component label per image (minhash_clusters analog)
        "crawl_phash_clusters": crawl_phash_clusters,
        "crawl_incremental_image_dedup": crawl_incremental_image_dedup,
        "crawl_curate_images_incremental": crawl_curate_images_incremental,
        "crawl_phash_search": lambda sf: I.phash_search(
            os.path.join(_crawl_out("t1"), "tables", "images")
        ),
        # multimodal curation flagship: decode gate + caption gates +
        # exact + perceptual dedup in one streaming manifest
        "crawl_curate_images": crawl_curate_images,
        # CLIP-stub caption<->image alignment scores (actor-pool dual
        # encoder; deterministic feature-hash/grid-mean stub model)
        "crawl_caption_align": crawl_caption_align,
        # the flagship with the LAION-style alignment gate composed in
        # (gate BEFORE dedup: a low-alignment copy must not shadow a
        # well-captioned duplicate)
        "crawl_curate_images_aligned": crawl_curate_images_aligned,
        "crawl_curate_images_quality": crawl_curate_images_quality,
        "crawl_price_monitor": crawl_price_monitor,
        "meta_table": lambda sf: __import__("spiderman_ray.meta", fromlist=["x"]).meta_table(),
        # -- relational / reference query surface (SQL-checked) ------------
        "missing_pages": R.missing_pages,
        "missing_details": R.missing_details,
        "grouped_returns": R.grouped_returns,
        "md5_keys": R.md5_keys,
        "event_days": R.event_days,
        "top_orders": R.top_orders,
        "windowed_events": R.windowed_events,
        # windowed aggregate x group-wise top-k composition (monitoring)
        "trending_events": lambda sf: R.trending_events(sf),
        "sessionized_events": R.sessionized_events,
        "running_order_totals": R.running_order_totals,
        "asof_last_signup": R.asof_last_signup,
        "customers_per_region": R.customers_per_region,
        "revenue_by_segment": R.revenue_by_segment,
        "priority_union": R.priority_union,
        "distinct_brands": R.distinct_brands,
        # ROLLUP: leaf + subtotal + grand-total levels in one shuffle
        "returns_rollup": R.returns_rollup,
        # range (interval) join via bucket-overlap co-partitioning
        "range_join_shipments": R.range_join_shipments,
        # string-similarity join: deletion-neighborhood (FastSS) candidate
        # keys + in-bucket exact <=1-edit verify, pair-shard distinct
        "name_edit_dups": R.name_edit_dups,
        # snapshot diff via native FULL OUTER hash join (added/removed/
        # changed vs a deterministically perturbed copy)
        "table_diff": R.table_diff,
        # exact quantiles, two-pass histogram (no full sort)
        "price_quantiles": R.price_quantiles,
        # per-group exact quantiles, shard-grouped vectorized rank gather
        "brand_price_quantiles": R.brand_price_quantiles,
        # -- text analysis / dedup families --------------------------------
        "doc_fingerprints": T.doc_fingerprints,
        "winnow_fingerprints": T.winnow_fingerprints,
        # MOSS-style overlap pairs over the winnow fp inverted index
        "winnow_overlap_pairs": lambda sf: T.winnow_overlap_pairs(sf),
        "dedup_exact": T.dedup_exact,
        "clean_doc_lengths": T.clean_doc_lengths,
        "dirty_word_filter": T.dirty_word_filter,
        "token_stats": T.token_stats,
        "tokens_by_lang": T.tokens_by_lang,
        "quality_scores": T.quality_scores,
        "lang_id": T.lang_id,
        "minhash_pairs": lambda sf: T.minhash_verified_pairs(sf),
        "dedup_minhash": T.dedup_minhash_survivors,
        # audit view: every doc's near-dup component label
        "minhash_clusters": lambda sf: T.minhash_clusters(sf),
        # duplicate-cluster size histogram (corpus duplication profile)
        "dup_cluster_sizes": lambda sf: T.dup_cluster_sizes(sf),
        # per-source exact + near duplication rates (crawl-budget feedback)
        "source_dup_rates": lambda sf: T.source_dup_rates(sf),
        # LSH banding parameter eval: raw band-collision candidates vs
        # exact Jaccard gold (verify survival rate + banding miss rate)
        "minhash_eval": lambda sf: T.minhash_eval(sf),
        # the banding tuning curve: same candidates scored against exact
        # gold at several thresholds in ONE pair-shard pass
        "minhash_threshold_sweep": lambda sf: T.minhash_threshold_sweep(sf),
        "simhash": T.simhash_table,
        "simhash_near_dups": lambda sf: T.simhash_near_dups(sf),
        # detector-vs-gold eval: simhash pairs scored against exact
        # Jaccard gold (precision/recall of the approximate dedup pass)
        "simhash_eval": lambda sf: T.simhash_eval(sf),
        # exact inverted-index member of the dedup family (no LSH)
        "ngram_jaccard_pairs": lambda sf: T.ngram_jaccard_pairs(sf),
        # asymmetric sibling: containment inter/min(|A|,|B|) — the
        # boilerplate/quote/subset detector Jaccard misses
        "ngram_containment_pairs": lambda sf: T.ngram_containment_pairs(sf),
        # cross-source shingle contamination matrix (pairwise exact
        # intersection/union of per-source distinct shingle sets)
        "source_overlap": lambda sf: T.source_overlap(sf),
        # deterministic hash sampling (reproducible at any cluster size)
        "hash_sample": lambda sf: T.hash_sample(sf),
        # deterministic md5 train/val/test split manifest per source
        "data_splits": lambda sf: T.data_splits(sf),
        # corpus-health dashboard: per-source doc/token/char/alpha totals
        "source_quality_report": lambda sf: T.source_quality_report(sf),
        # sequence-length histogram in power-of-2 token buckets (the
        # pack_offsets context-budget planner input)
        "length_buckets": lambda sf: T.length_buckets(sf),
        # per-length-bucket mean LM quality (the length-vs-quality curve)
        "length_quality_curve": lambda sf: T.length_quality_curve(sf),
        # exact heavy hitters (sharded wordcount + provable per-shard top-k)
        "top_tokens": lambda sf: T.top_tokens(sf),
        # top-k collocations by integer PMI lift (two bucketed exchanges)
        "pmi_collocations": lambda sf: T.pmi_collocations(sf),
        # Heaps-law shingle-type discovery curve (source saturation signal)
        "vocab_growth": lambda sf: T.vocab_growth(sf),
        # per-doc novelty of the new split vs the base snapshot (the
        # per-document member of the saturation family)
        "ngram_novelty": lambda sf: T.ngram_novelty(sf),
        # its per-source mean: the crawl-budget feedback read-out
        "source_novelty": lambda sf: T.source_novelty(sf),
        # group-wise top-k (PARTITION BY ... ROW_NUMBER() <= k)
        "top_docs_per_lang": lambda sf: T.top_docs_per_lang(sf),
        # per-stratum deterministic sampling (corpus rebalancing)
        "stratified_sample": lambda sf: T.stratified_sample(sf),
        # per-domain quota cap (CCNet/RefinedWeb domain balancing)
        "domain_quota_sample": lambda sf: T.domain_quota_sample(sf),
        # zlib ratio quality/repetition signal (Gopher-family filter);
        # DEFLATE is not SQL-expressible -> frozen-VALUES pin
        "compression_ratio": lambda sf: T.compression_ratio(sf),
        # incremental ingest dedup vs a base-corpus snapshot (fp-shard
        # membership; base/new split = the hash_sample md5 rule)
        "incremental_dedup": lambda sf: T.incremental_dedup(sf),
        # the same admission against a PERSISTED fp index (pruned read of
        # the stored fp column; base text never re-read) — the production
        # daily-ingest shape; output contract identical by construction
        "incremental_dedup_indexed": lambda sf: T.incremental_dedup_indexed(sf),
        # near-dup admission against the SAME stored index's band table
        # (base never re-MinHashed; bands prune, verify fetches)
        "incremental_dedup_minhash_indexed":
            lambda sf: T.incremental_dedup_minhash_indexed(sf),
        # token-budget data mixing: keep per-source docs in md5-priority
        # order while the source's token budget is not yet full
        "token_budget_mixture": lambda sf: T.token_budget_mixture(sf),
        # the T5 mixing rule: per-source weights ∝ sqrt(token count)
        "mixture_weights": lambda sf: T.mixture_weights(sf),
        # its MinHash sibling: admit a new doc only if its near-dup
        # component holds no base doc (one admission per component)
        "incremental_dedup_minhash": lambda sf: T.incremental_dedup_minhash(sf),
        # overlapping token-window chunking (LLM indexing/training prep)
        "doc_chunks": lambda sf: T.doc_chunks(sf),
        # content-defined chunking (Rabin/FastCDC family), chunk-level fps
        "cdc_chunks": lambda sf: T.cdc_chunks(sf),
        # first-wins chunk store membership over the CDC fps
        "cdc_dedup": lambda sf: T.cdc_dedup(sf),
        # regex feature counts (cleaning / PII-scan shape)
        "pattern_counts": lambda sf: T.pattern_counts(sf),
        # published-recipe pack (pipelines/recipes.py): Gopher doc-level
        # quality rules as an integer bitmask — stateless per-batch map
        "gopher_rules": lambda sf: RC.gopher_rules(sf),
        # C4 line-level cleaning over the synthetic line structure
        "c4_line_filter": lambda sf: RC.c4_line_filter(sf),
        # RefinedWeb/CCNet paragraph-level exact dedup (global
        # first-occurrence over line fps; two bounded exchanges)
        "paragraph_dedup": lambda sf: RC.paragraph_dedup(sf),
        # CCNet LM-quality buckets: token-sharded add-one unigram LM
        # trained on the md5-split "curated" docs, exact integer NLL
        "ccnet_ppl_buckets": lambda sf: RC.ccnet_ppl_buckets(sf),
        # DSIR importance resampling: 4096-bucket hashed-ngram lattice,
        # O(blocks) driver merge, top-k raw docs by integer weight
        "dsir_select": lambda sf: RC.dsir_select(sf),
        # BM25 ranked retrieval: O(terms) stats partials + per-batch
        # top-k combiner, integer per-term floors (pipelines/retrieval.py)
        "bm25_search": lambda sf: __import__(
            "spiderman_ray.pipelines.retrieval", fromlist=["x"]
        ).bm25_search(sf),
        # near-dup pairs crossing the train/val/test md5 split — the
        # eval-integrity audit; rides the memoized verified pair graph
        "split_leakage": lambda sf: T.split_leakage(sf),
        # contrastive hard-negative mining: per vector, the most-similar
        # DIFFERENT-label vector (knn_graph chunk-pair combiner shape)
        "hard_negative_mining": lambda sf: V.hard_negative_mining(sf),
        # the recipe pack composed into one FineWeb-style flagship:
        # gopher AND c4 AND boilerplate-share AND LM-bucket gates, merged
        # in ONE doc-shard union exchange (no joins)
        "recipe_curate": lambda sf: RC.recipe_curate(sf),
        # rule-mask histogram (the gopher dashboard row in cli report)
        "gopher_summary": lambda sf: RC.gopher_summary(sf),
        # tf-idf-style distinctive terms, token-space df (no vocab broadcast)
        "tfidf_top_terms": lambda sf: T.tfidf_top_terms(sf),
        # Gopher-style repetition quality signals (integerized fractions)
        "repetition_stats": lambda sf: T.repetition_stats(sf),
        # CCNet-shape unigram LM quality (integer log2 corpus counts)
        "unigram_quality": lambda sf: T.unigram_quality(sf),
        # KenLM-shape bigram LM quality (integer pointwise log2 ratios,
        # sharded by conditioning context w1 — no vocabulary broadcast)
        "bigram_quality": lambda sf: T.bigram_quality(sf),
        # Naive-Bayes train+apply: weak labels from LangId, the model IS
        # the token-sharded count table (nothing broadcast), exact
        # integer log2 scores — distributed model training, hash-verified
        "nb_classify": lambda sf: T.nb_classify(sf),
        # iterative link analysis: integer fixed-point PageRank on the
        # actor-held-shard BSP path (edges shard once; supersteps are
        # pre-combined point-to-point messages) — bit-identical to the
        # Dataset-exchange reference path graph.pagerank (tested equal)
        "pagerank": lambda sf: __import__(
            "spiderman_ray.pipelines.graph", fromlist=["x"]
        ).pagerank_bsp(sf),
        # multi-way self-join family: per-vertex triangle participation
        # (wedge enumeration + edge-pair-shard close, 4 bounded exchanges)
        "triangle_counts": lambda sf: __import__(
            "spiderman_ray.pipelines.graph", fromlist=["x"]
        ).triangle_counts(sf),
        # generic min-label connected components on the BSP actor path
        # (bit-equal to the Dataset-exchange reference; O(k) convergence)
        "connected_components": lambda sf: __import__(
            "spiderman_ray.pipelines.graph", fromlist=["x"]
        ).connected_components_bsp(sf),
        # single-source shortest paths: distributed Bellman-Ford (min-plus
        # BSP supersteps) over the weighted undirected synthetic graph
        "sssp": lambda sf: __import__(
            "spiderman_ray.pipelines.graph", fromlist=["x"]
        ).sssp(sf),
        # BPE tokenizer TRAINING: one corpus exchange to word-freqs, then
        # BSP merge rounds over vocabulary shards (iterative argmax is
        # not SQL-expressible -> frozen-VALUES pin from the single-process
        # bpe_reference; hash-verified at the gate)
        "bpe_train": lambda sf: __import__(
            "spiderman_ray.pipelines.bpe", fromlist=["x"]
        ).bpe_train(sf),
        # ...and tokenize the corpus with the learned merges (merge table
        # broadcast into actor constructors; per-actor Zipfian word cache)
        "bpe_encode": lambda sf: __import__(
            "spiderman_ray.pipelines.bpe", fromlist=["x"]
        ).bpe_encode(sf),
        # tokenizer fertility per language (BPE tokens per word, x1m) —
        # the pre-commit tokenizer eval; oracle composes the bpe_encode
        # VALUES pin with the lang-ID SQL
        "bpe_fertility": lambda sf: __import__(
            "spiderman_ray.pipelines.bpe", fromlist=["x"]
        ).bpe_fertility(sf),
        # tokenize -> pack -> WRITE the training-shard artifact, stats
        # read back from the store (the storesinks verify pattern)
        "training_shards": lambda sf: __import__(
            "spiderman_ray.pipelines.bpe", fromlist=["x"]
        ).training_shards(sf),
        # feature-hashed embedding generation (integer checksums)
        "hash_embed": lambda sf: T.hash_embed(sf),
        # CCNet head/middle/tail split: NTILE(3) of the LM-quality rank
        "quality_buckets": lambda sf: T.quality_buckets(sf),
        # PII scrub over documents with deterministically injected PII
        "pii_redaction": pii_redaction,
        # BPE-pretokenizer token counting (RE2 on both sides) over the
        # PII-injected docs so the punctuation branch is exercised
        "bpe_token_stats": bpe_token_stats,
        # sequence-packing token offsets (distributed two-pass prefix sum)
        "pack_offsets": lambda sf: T.pack_offsets(sf),
        # deterministic global corpus shuffle (reproducible training order)
        "shuffle_order": lambda sf: T.shuffle_order(sf),
        # benchmark decontamination: 8-gram overlap vs the hash-sample split
        "decontaminate": lambda sf: T.decontaminate(sf),
        # exact-substring-dedup signal: per-doc repeated 8-gram spans
        "repeated_ngrams": lambda sf: T.repeated_ngrams(sf),
        # ...and the transformation: drop every token covered by a
        # cross-doc-repeated 8-gram, re-emit the cleaned text
        "remove_repeated_spans": lambda sf: T.remove_repeated_spans(sf),
        # constant-memory bloom screen (no false negatives; FP-bounded by
        # pytest vs the exact operator). Hash-verified: the SQL oracle
        # re-derives the bitmap AND probes every training doc's grams
        "decontaminate_bloom": lambda sf: T.decontaminate_bloom(sf),
        # the same screen probing a PERSISTED bitmap (bench corpus never
        # re-hashed; output identical by construction)
        "decontaminate_bloom_indexed":
            lambda sf: T.decontaminate_bloom_indexed(sf),
        # the screen's bloom STATE (set-bit positions) — deterministic
        # integers, hash-verified vs a pure-SQL recomputation of the gram
        # polynomial + double-hash (the sketch-state contract)
        "decontam_bloom_bits": lambda sf: T.decontam_bloom_bits(sf),
        # composed flagship curation: gate -> lang-id -> exact dedup ->
        # decontaminate (Dataset anti-join, no driver id collection)
        "curate": lambda sf: T.curate(sf),
        # full-strength flagship: curate + MinHash near-dup removal
        "curate_full": lambda sf: T.curate_full(sf),
        # round-4 flagship: curate + zlib-band gate + per-domain quota
        # (pin = independent DuckDB-manifest + python zlib/quota recompute)
        "curate_v2": lambda sf: T.curate_v2(sf),
        # the daily-increment flagship: v2 gates on the new md5-split side
        # + exact dedup vs the base snapshot + decontamination + base-free
        # near-dup representative + domain quota over the increment
        "curate_v2_incremental": lambda sf: T.curate_v2_incremental(sf),
        # per-gate attrition report for the curate_v2 flagship (which
        # stage eats the corpus; counts after every gate/dedup/decon/quota)
        "curation_funnel": lambda sf: T.curation_funnel(sf),
        # HyperLogLog distinct sketch. The estimate is approximate VS THE
        # TRUTH but a deterministic pure function of the registers — the
        # SQL oracle re-derives registers + the exact-integer harmonic
        # denominator + the one-division estimator, so it hash-verifies
        "approx_distinct_users": lambda sf: __import__(
            "spiderman_ray.pipelines.sketches", fromlist=["x"]
        ).approx_distinct(sf),
        # GROUPED HLL: one mergeable sketch per source over shingle
        # strings (hash64 value contract) — the diversity dashboard
        "source_distinct_shingles": lambda sf: __import__(
            "spiderman_ray.pipelines.sketches", fromlist=["x"]
        ).source_distinct_shingles(sf),
        # the HLL register STATE (reg_idx, max rank) — deterministic
        # integers, hash-verified vs DuckDB (md5-prefix hash64 + bin-length
        # rank); proves the sketch machinery exactly even though the
        # estimate above stays approximate by design
        "hll_registers": lambda sf: __import__(
            "spiderman_ray.pipelines.sketches", fromlist=["x"]
        ).hll_registers(sf),
        # the merged Count-Min table cells — deterministic integers,
        # hash-verified vs DuckDB (same idiom); the estimate query below
        # stays rows-only
        "cms_table": lambda sf: __import__(
            "spiderman_ray.pipelines.sketches", fromlist=["x"]
        ).cms_table(sf),
        # one-pass mergeable log-bucket quantile sketch (deterministic
        # integer bucketing -> exact SQL parity; error bounded per bucket)
        "approx_price_quantiles": lambda sf: __import__(
            "spiderman_ray.pipelines.sketches", fromlist=["x"]
        ).approx_price_quantiles(sf),
        # Count-Min sketch estimates for the exact top-k tokens (mergeable
        # constant-size tables; pytest bounds the over-estimate vs truth).
        # Estimator head is pure integer MIN over cells -> SQL hash oracle
        "approx_token_counts": lambda sf: __import__(
            "spiderman_ray.pipelines.sketches", fromlist=["x"]
        ).approx_token_counts(sf),
        # -- similarity search ----------------------------------------------
        "ann_cosine_topk": V.ann_cosine_topk,
        # nprobe=n_centroids -> exhaustive probe: exercises the full IVF
        # bucketing machinery while staying equal to the exact-cosine oracle
        # (pytest covers the approximate nprobe<n_centroids recall path)
        "ann_ivf_topk": lambda sf: V.ann_ivf_topk(sf, nprobe=16),
        # the same search against the PERSISTED IVF index (pruned
        # partition read; output == ann_ivf_topk by construction)
        "ann_query_indexed": lambda sf: V.ann_query_indexed(sf, nprobe=16),
        # IVF + PQ-ADC + exact rerank (the FAISS IVFADC shape) run at
        # nprobe=n_centroids: exhaustive probe BYPASSES the ADC preselect
        # (exact dots for every candidate) -> STRUCTURALLY equal to the
        # exact oracle; pytest covers nprobe<n_centroids
        "ann_ivfpq_topk": lambda sf: V.ann_ivfpq_topk(sf, nprobe=16),
        "cosine_dup_pairs": V.cosine_dup_pairs,
        # approximate corpus-scale variant (seeded hyperplanes are not
        # SQL-expressible -> frozen-VALUES pin from the single-process
        # reference recompute; pytest measures recall vs the exact op)
        "cosine_dup_pairs_lsh": lambda sf: V.cosine_dup_pairs_lsh(sf),
        # exact k-NN graph over every vector (SemDeDup building block)
        "knn_graph": lambda sf: V.knn_graph(sf),
        # leave-one-out kNN majority-label eval (the embedding-space
        # quality check; first consumer of the label column)
        "knn_label_agreement": lambda sf: V.knn_label_agreement(sf),
        # IVF-bucketed kNN graph (the sub-O(n^2) graph build) at
        # nprobe=n_centroids: exhaustive probe == exact knn_graph
        # row-for-row, so it shares that hash oracle; pytest covers the
        # approximate nprobe<n_centroids recall path
        "knn_graph_ivf": lambda sf: V.knn_graph_ivf(sf, nprobe=16),
        # measured IVF recall vs the exact graph at nprobe < n_centroids
        # (the "how much does the sub-O(n^2) path give up" eval)
        "ann_recall_eval": lambda sf: V.ann_recall_eval(sf),
        # doc-metadata x vector native join -> per-language centroids
        "lang_centroids": lambda sf: V.lang_centroids(sf),
        # per-label distance-to-centroid outliers (mislabel/noise screen;
        # exact int64 squared-L2 on the 2^16 lattice)
        "embedding_outliers": lambda sf: V.embedding_outliers(sf),
        # pairwise cosine between label centroids (class-confusability
        # diagnostic; exact bigint sums, float only in the last dot/sqrt)
        "label_centroid_sim": lambda sf: V.label_centroid_sim(sf),
        # SemDeDup survivors: min vec_id per cosine near-dup component
        "semantic_dedup": lambda sf: V.semantic_dedup_survivors(sf),
        # same survivors over the LSH-candidate (exact-verified) pair
        # graph — the corpus-scale composition; seeded hyperplanes are
        # not SQL-expressible -> frozen-VALUES pin
        "semantic_dedup_lsh": lambda sf: V.semantic_dedup_lsh_survivors(sf),
        # SemDeDup as published: within-kmeans-cluster pair graph, same
        # survivor resolution; the cluster partition bounds pair compute
        "semantic_dedup_clustered": lambda sf: V.semantic_dedup_clustered(sf),
        # cluster-balanced sampling (embedding-space domain_quota analog)
        "cluster_quota_sample": lambda sf: V.cluster_quota_sample(sf),
        "embedding_norms": V.embedding_norms,
        # int8 scalar quantization (vector compression), checksum-verified
        "sq8_quantize": V.sq8_quantize,
        "pca_embed": lambda sf: V.pca_embed(sf),
        # exact-integer distributed Lloyd k-means (cluster-then-curate);
        # iterative fit is not SQL-expressible -> frozen-VALUES pin
        "kmeans_embed": lambda sf: V.kmeans_embed(sf),
        # product-quantization codes (k-means codebooks are not SQL-
        # expressible -> frozen-VALUES pin from the single-process
        # reference; pytest bounds distortion + determinism)
        "pq_quantize": lambda sf: V.pq_quantize(sf),
        # PQ-ADC + exact-rerank approximate top-k: pytest asserts recall
        # 1.0 vs exact at every sf, and ranks come from exact dots, so
        # the exact top-k SQL is its (loud-on-regression) hash oracle
        "ann_pq_topk": lambda sf: V.ann_pq_topk(sf),
        # -- multimodal plumbing over synthesized binary payloads ----------
        "video_frames": video_frames,
        "video_near_dups": video_near_dups,
        "audio_near_dups": audio_near_dups,
        "audio_features": audio_features,
        # -- external-store sink analogs (HBase/Mongo/ES/HDFS/Doris):
        # write through the sink layout into /tmp, read the STORE back,
        # hash-verify vs SQL reconstructing the layout from the source
        "hbase_cells": lambda sf: __import__(
            "spiderman_ray.pipelines.storesinks", fromlist=["x"]
        ).hbase_cells(sf),
        "mongo_docs": lambda sf: __import__(
            "spiderman_ray.pipelines.storesinks", fromlist=["x"]
        ).mongo_docs(sf),
        "hdfs_lines": lambda sf: __import__(
            "spiderman_ray.pipelines.storesinks", fromlist=["x"]
        ).hdfs_lines(sf),
        "doris_buckets": lambda sf: __import__(
            "spiderman_ray.pipelines.storesinks", fromlist=["x"]
        ).doris_buckets(sf),
        "kafka_topic": lambda sf: __import__(
            "spiderman_ray.pipelines.storesinks", fromlist=["x"]
        ).kafka_topic(sf),
        # ES analog is index BUILD + distributed AND-of-terms search
        "es_search": lambda sf: __import__(
            "spiderman_ray.pipelines.storesinks", fromlist=["x"]
        ).es_search(sf),
    }


def _lang_id_sql() -> str:
    """Stopword-profile scoring, tokenized exactly like pipelines.text.LangId
    (explicit ASCII+CJK class; first 200 matches, then distinct). Tie-break =
    alphabetically-first language among the maxima, 'und' when all zero."""
    profs = {
        "de": "'der','die','das','und','ist','nicht','mit'",
        "en": "'the','and','of','to','a','in','is'",
        "es": "'el','la','los','y','es','una','de'",
        "fr": "'le','la','les','et','est','une','des'",
        "zh": "'的','是','了','在','和','有','我'",
    }
    scores = ", ".join(
        f"len(list_filter(ws, x -> x IN ({words}))) AS s_{lang}"
        for lang, words in profs.items()
    )
    return (
        "WITH w AS (SELECT doc_id, "
        "list_distinct((regexp_extract_all(lower(text), '[0-9a-z_一-鿿]+'))[1:200]) AS ws "
        "FROM documents), "
        f"s AS (SELECT doc_id, {scores} FROM w) "
        "SELECT doc_id, CASE "
        "WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und' "
        "WHEN s_de >= GREATEST(s_en, s_es, s_fr, s_zh) THEN 'de' "
        "WHEN s_en >= GREATEST(s_es, s_fr, s_zh) THEN 'en' "
        "WHEN s_es >= GREATEST(s_fr, s_zh) THEN 'es' "
        "WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS lang_pred FROM s"
    )


def _nb_sql() -> str:
    """Naive-Bayes train+apply: labels = the lang_id CTE, per-(token,
    class) counts by conditional aggregation, per-doc class sums with
    the zero-count -1 convention (CASE c=0 THEN -1 ELSE
    length(bin(c))-1 == numpy frexp bit_length-1 with the explicit zero
    branch), argmax with the alphabetical tie-break."""
    classes = ("de", "en", "es", "fr", "und", "zh")
    cts = ", ".join(
        f"SUM(CASE WHEN l.lang_pred = '{c}' THEN tf.tf ELSE 0 END) AS c_{c}"
        for c in classes
    )
    sums = ", ".join(
        f"CAST(SUM(tf.tf * (CASE WHEN ct.c_{c} = 0 THEN -1 "
        f"ELSE length(bin(ct.c_{c})) - 1 END)) AS BIGINT) AS s_{c}"
        for c in classes
    )
    return (
        f"WITH labels AS ({_lang_id_sql()}), "
        "t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
        "x -> x != '')) AS tok FROM documents), "
        "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok), "
        f"ct AS (SELECT tf.tok, {cts} FROM tf JOIN labels l USING (doc_id) "
        "GROUP BY tf.tok), "
        f"s AS (SELECT tf.doc_id, {sums} FROM tf JOIN ct USING (tok) "
        "GROUP BY tf.doc_id) "
        "SELECT doc_id, CASE "
        "WHEN s_de >= GREATEST(s_en, s_es, s_fr, s_und, s_zh) THEN 'de' "
        "WHEN s_en >= GREATEST(s_es, s_fr, s_und, s_zh) THEN 'en' "
        "WHEN s_es >= GREATEST(s_fr, s_und, s_zh) THEN 'es' "
        "WHEN s_fr >= GREATEST(s_und, s_zh) THEN 'fr' "
        "WHEN s_und >= s_zh THEN 'und' ELSE 'zh' END AS nb_pred, "
        "GREATEST(s_de, s_en, s_es, s_fr, s_und, s_zh) AS best_score FROM s"
    )


#: distinct words -> 64-bit md5 feature -> sign-sum, == pipelines.text.SimHasher
_SIMHASH_CTE = (
    "words AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w "
    "FROM documents), "
    "h AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS hv FROM words), "
    "acc AS (SELECT doc_id, b.bit AS bit, "
    "SUM(CASE WHEN (hv >> CAST(b.bit AS UBIGINT)) & 1 = 1 THEN 1 ELSE -1 END) AS s "
    "FROM h, (SELECT unnest(range(64)) AS bit) b GROUP BY doc_id, b.bit), "
    "sim AS (SELECT doc_id, CAST(CASE WHEN t >= 9223372036854775808 "
    "THEN t - 18446744073709551616 ELSE t END AS BIGINT) AS simhash FROM ("
    "SELECT doc_id, SUM(CASE WHEN s > 0 THEN CAST(POWER(2, bit) AS HUGEINT) "
    "ELSE 0 END) AS t FROM acc GROUP BY doc_id))"
)

def _knn_graph_sql(k: int) -> str:
    """Exact k-NN graph oracle shared by knn_graph (k=3), knn_graph_ivf
    and knn_label_agreement (k=5): rank on int64 sims quantized x1e6
    (double-cast lists so DuckDB computes in float64 like the engine's
    normalized matmul); ties by neighbor_id — mirrors
    pipelines.vectors.knn_graph."""
    return (
        "WITH e AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
        "scored AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, "
        "CAST(FLOOR(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5) "
        "AS BIGINT) AS sim_x1m FROM e a JOIN e b ON a.vec_id != b.vec_id) "
        "SELECT vec_id, neighbor_id, sim_x1m, CAST(rank AS BIGINT) AS rank "
        "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
        "ORDER BY sim_x1m DESC, neighbor_id) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


#: 3-word shingle sets (split-on-space), == pipelines.text._shingle_hashes
_SHINGLES_CTE = (
    "d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')] "
    "ELSE list_distinct(list_transform(range(1, len(ws) - 1), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s FROM d)"
)

def _bm25_query_values() -> str:
    """The fixed BM25 query workload as a SQL VALUES list — one source
    of truth (pipelines.retrieval.BM25_QUERIES) for engine and oracle."""
    from spiderman_ray.pipelines.retrieval import BM25_QUERIES

    return ", ".join(
        f"('{qid}','{t}')" for qid, terms in BM25_QUERIES for t in terms
    )


#: synthetic line structure for the published-recipe pack (C4 line filter /
#: paragraph dedup), == pipelines.recipes._doc_lines: line 0 is the
#: per-source banner; window line t (1-based) = words [(t-1)*L, t*L),
#: L = 5 + doc_id % 4, with a terminal '.' iff (t + doc_id) % 3 == 0
_RECIPE_LINES_CTE = (
    "d AS (SELECT doc_id, source, "
    "list_filter(string_split(text, ' '), x -> x != '') AS ws, "
    "5 + doc_id % 4 AS L FROM documents), "
    "wins AS (SELECT doc_id, unnest(range(1, (len(ws) + L - 1) // L + 1)) "
    "AS t, ws, L FROM d), "
    "wlines AS (SELECT doc_id, t AS line_idx, "
    "array_to_string(ws[(t-1)*L+1 : t*L], ' ') || "
    "CASE WHEN (t + doc_id) % 3 = 0 THEN '.' ELSE '' END AS lt, "
    "len(ws[(t-1)*L+1 : t*L]) AS lnw FROM wins), "
    "lines AS (SELECT doc_id, 0 AS line_idx, "
    "'follow ' || source || ' for more updates' AS lt, 5 AS lnw FROM d "
    "UNION ALL SELECT doc_id, line_idx, lt, lnw FROM wlines)"
)

#: all-pairs exact Jaccard >= 0.6 over the shingle sets (brute force — the
#: engine's LSH is a candidate filter that is exhaustive on this data; the
#: driver hash-compare proves it found every pair)
_JACCARD_PAIRS = (
    "pairs AS (SELECT a, b, j FROM ("
    "SELECT a.doc_id AS a, b.doc_id AS b, "
    "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / "
    "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j "
    "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) WHERE j >= 0.6)"
)


def _winnow_sel_cte(k: int = 8, window: int = 6) -> str:
    """The shared winnowing CTE chain (b -> codes -> hs -> sel): rolling
    polynomial hash (base 1000003, mod 2^64) over UTF-8 BYTES
    (hex(encode(text)) -> byte list), sliding-window minima; ``sel``
    holds each doc's distinct fingerprint mins (docs shorter than one
    k-gram are excluded — ``b`` keeps them for the callers that report
    empties). Mirrors pipelines.text._winnow_set."""
    m = 1 << 64
    ws = [pow(1000003, k - 1 - j, m) for j in range(k)]
    poly = " + ".join(f"cs[i+{j}] * {w}" for j, w in enumerate(ws))
    return (
        "b AS (SELECT doc_id, hex(encode(text)) AS hx, "
        "octet_length(encode(text)) AS n FROM documents), "
        "codes AS (SELECT doc_id, n, list_transform(range(0, n), "
        "i -> CAST(CAST(('0x' || substr(hx, CAST(2*i+1 AS INT), 2)) AS INT) AS HUGEINT)) AS cs "
        f"FROM b WHERE n >= {k}), "
        f"hs AS (SELECT doc_id, list_transform(range(1, n - {k} + 2), "
        f"i -> CAST(({poly}) % {m} AS UBIGINT)) AS h FROM codes), "
        f"sel AS (SELECT doc_id, CASE WHEN len(h) < {window} THEN [list_min(h)] "
        f"ELSE list_distinct(list_transform(range(1, len(h) - {window} + 2), "
        f"i -> list_min(h[i:i+{window - 1}]))) END AS mins FROM hs)"
    )


def _winnow_sql(k: int = 8, window: int = 6) -> str:
    """Winnowing fingerprints (count + xor checksum) — mirrors
    pipelines.text.winnow_fingerprints."""
    return (
        f"WITH {_winnow_sel_cte(k, window)} "
        "SELECT doc_id, CAST(len(mins) AS BIGINT) AS n_fps, "
        "CAST(CASE WHEN list_aggregate(mins, 'bit_xor') >= 9223372036854775808 "
        "THEN CAST(list_aggregate(mins, 'bit_xor') AS HUGEINT) - 18446744073709551616 "
        "ELSE CAST(list_aggregate(mins, 'bit_xor') AS HUGEINT) END AS BIGINT) AS fps_checksum "
        "FROM sel "
        f"UNION ALL SELECT doc_id, 0, 0 FROM b WHERE n < {k}"
    )


def _winnow_pairs_sql(k: int = 8, window: int = 6, overlap_pct: int = 50) -> str:
    """Winnow-overlap pairs: unnest each doc's fingerprint mins, self-join
    on equal fps, count shared fps per (a < b) pair, keep pairs covering
    >= overlap_pct% of the smaller fp set (pure integer predicate) —
    mirrors pipelines.text.winnow_overlap_pairs."""
    return (
        f"WITH {_winnow_sel_cte(k, window)}, "
        "s2 AS (SELECT doc_id, len(mins) AS sz FROM sel), "
        "g AS (SELECT doc_id, unnest(mins) AS fp FROM sel), "
        "p AS (SELECT a.doc_id AS a, b2.doc_id AS b, COUNT(*) AS inter "
        "FROM g a JOIN g b2 ON a.fp = b2.fp AND a.doc_id < b2.doc_id "
        "GROUP BY 1, 2) "
        "SELECT p.a, p.b, CAST(p.inter AS BIGINT) AS n_shared "
        "FROM p JOIN s2 sa ON p.a = sa.doc_id JOIN s2 sb ON p.b = sb.doc_id "
        f"WHERE 100 * p.inter >= {overlap_pct} * LEAST(sa.sz, sb.sz)"
    )


def _cdc_sql(w: int = 8, div: int = 16, base: int = 1000003) -> str:
    """Content-defined chunking oracle: the same windowed rolling hash as
    _winnow_sql marks cut positions (h % div == div-1 after byte end),
    chunks are the slices between cuts, and each chunk's fp is the Horner
    polynomial over its bytes folded with list_reduce in HUGEINT mod 2^64
    — mirrors pipelines.text.cdc_chunks byte for byte."""
    m = 1 << 64
    ws = [pow(base, w - 1 - j, m) for j in range(w)]
    poly = " + ".join(f"cs[s+{j}] * {wgt}" for j, wgt in enumerate(ws))
    return (
        "WITH b AS (SELECT doc_id, hex(encode(text)) AS hx, "
        "octet_length(encode(text)) AS n FROM documents), "
        "codes AS (SELECT doc_id, n, list_transform(range(0, n), "
        "i -> CAST(CAST(('0x' || substr(hx, CAST(2*i+1 AS INT), 2)) AS INT) AS HUGEINT)) AS cs "
        "FROM b WHERE n > 0), "
        f"cuts AS (SELECT doc_id, n, cs, CASE WHEN n >= {w} THEN "
        f"list_filter(list_transform(range(1, n - {w} + 2), "
        f"s -> CASE WHEN ({poly}) % {m} % {div} = {div - 1} "
        f"THEN s + {w} - 1 ELSE -1 END), e -> e >= 0 AND e < n) "
        "ELSE [] END AS ends FROM codes), "
        "ch AS (SELECT doc_id, n, cs, list_prepend(0, ends) AS starts, "
        "list_append(ends, n) AS stops FROM cuts), "
        "idx AS (SELECT doc_id, n, cs, starts, stops, "
        "unnest(range(1, len(starts) + 1)) AS ci FROM ch), "
        "fps AS (SELECT doc_id, ci, starts[ci] AS a, stops[ci] AS b, "
        f"list_reduce(cs[starts[ci] + 1:stops[ci]], "
        f"(acc, x) -> (acc * {base} + x) % {m}) AS fpu FROM idx) "
        "SELECT doc_id, CAST(ci - 1 AS BIGINT) AS chunk_idx, "
        "CAST(a AS BIGINT) AS start_byte, CAST(b - a AS BIGINT) AS len_bytes, "
        f"CAST(CASE WHEN fpu >= {1 << 63} THEN fpu - {1 << 64} ELSE fpu END "
        "AS BIGINT) AS fp FROM fps "
        "UNION ALL SELECT doc_id, 0, 0, 0, 0 FROM b WHERE n = 0"
    )


_ORACLE_T1 = None
_ORACLE_T1_AT = None


def _oracle_t1():
    """The single-process reference-loop oracle at t1 (pure Python, no Ray).
    Cached: oracle_sql() pins several crawl queries against its rows."""
    global _ORACLE_T1
    if _ORACLE_T1 is None:
        from spiderman_ray.oracle import run_oracle
        from spiderman_ray.simweb import SimParams

        _ORACLE_T1 = run_oracle(SimParams.for_scale("t1"))
    return _ORACLE_T1


#: autothrottle config shared by the throttled gate query and its oracle pin
_THROTTLE_CFG = {"start_delay_ms": 50, "max_delay_ms": 800, "target_concurrency": 2.0}


def _oracle_t1_throttled():
    """Reference loop at t1 with the AutoThrottle analog enabled — pins the
    adaptive per-host vts sequence for the throttled gate query."""
    global _ORACLE_T1_AT
    if _ORACLE_T1_AT is None:
        from spiderman_ray.oracle import run_oracle
        from spiderman_ray.policy import CrawlPolicy
        from spiderman_ray.simweb import SimParams

        _ORACLE_T1_AT = run_oracle(
            SimParams.for_scale("t1"), CrawlPolicy(autothrottle=_THROTTLE_CFG)
        )
    return _ORACLE_T1_AT


def _decon_sql() -> str:
    """8-word shingle string sets vs the engine's 64-bit shingle hashes:
    equal up to ~2^-64 collisions (same contract as minhash_pairs);
    benchmark split = the hash_sample md5 rule. Shared by the
    ``decontaminate`` oracle and the ``curate`` composition."""
    return (
        "WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws, "
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) < "
        f"{(10 << 32) // 100} AS is_bench FROM documents), "
        "sh AS (SELECT doc_id, is_bench, CASE WHEN len(ws) < 8 "
        "THEN [array_to_string(ws, ' ')] "
        "ELSE list_distinct(list_transform(range(1, len(ws) - 6), "
        "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || "
        "ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7])) END AS s "
        "FROM d), "
        "bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE is_bench), "
        "tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE NOT is_bench) "
        "SELECT tr.doc_id, COUNT(*) AS n_shared FROM tr "
        "JOIN bench ON tr.g = bench.g GROUP BY tr.doc_id"
    )


def _gram_poly_expr(k: int = 8) -> str:
    """The engine's order-sensitive k-gram polynomial sum(md5prefix64(word)
    * M^(k-1-j)) mod 2^64 (pipelines.text._kgram_hashes_batch) as a DuckDB
    expression over a word-hash list ``h`` and 1-based start ``i``,
    evaluated with the 32-bit-split trick so every intermediate fits
    HUGEINT: hv*W mod 2^64 == (lo(hv)*W mod 2^64 + (hi(hv)*lo(W) mod
    2^32)*2^32) mod 2^64."""
    M = 0x9E3779B97F4A7C15
    P64, P32 = 1 << 64, 1 << 32
    weights = [0] * k
    w = 1
    for j in range(k - 1, -1, -1):
        weights[j] = w
        w = (w * M) % P64
    terms = []
    for j in range(k):
        W, WL = weights[j], weights[j] % P32
        terms.append(
            f"(((h[i+{j}] % {P32}) * {W}) % {P64} "
            f"+ (((h[i+{j}] // {P32}) * {WL}) % {P32}) * {P32})"
        )
    return "(" + " + ".join(terms) + f") % {P64}"


def _bloom_bits_sql(k: int = 8, m_bits: int = 1 << 20, n_hashes: int = 4) -> str:
    """DuckDB recomputation of the decontamination bloom's set bits —
    pipelines.text._bench_gram_bloom in pure integer SQL. Gram hash =
    ``_gram_poly_expr``; bit indices are the double-hash (h1 + i*h2) %
    m_bits with h1/h2 the gram hash's 32-bit halves (h2 |= 1)."""
    P32 = 1 << 32
    gram = _gram_poly_expr(k)
    salts = ", ".join(f"({i})" for i in range(n_hashes))
    return (
        "WITH d AS (SELECT text, string_split(text, ' ') AS ws FROM documents "
        "WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) < "
        f"{(10 << 32) // 100}), "
        "hv AS (SELECT text, ws, list_transform(ws, w -> "
        "CAST(CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS HUGEINT)) AS h "
        "FROM d), "
        f"gsel AS (SELECT CASE WHEN len(ws) < {k} "
        "THEN [CAST(CAST(('0x' || substr(md5(text), 1, 16)) AS UBIGINT) AS HUGEINT)] "
        f"ELSE list_transform(range(1, len(ws) - {k - 2}), i -> {gram}) END AS gs "
        "FROM hv), "
        "grams AS (SELECT DISTINCT unnest(gs) AS g FROM gsel) "
        "SELECT DISTINCT CAST((CAST(g % " + str(P32) + " AS BIGINT) "
        "+ s.i * (CAST(g // " + str(P32) + " AS BIGINT) | 1)) "
        f"% {m_bits} AS BIGINT) AS bit_idx "
        f"FROM grams CROSS JOIN (VALUES {salts}) s(i)"
    )


def _bloom_probe_sql(k: int = 8, m_bits: int = 1 << 20, n_hashes: int = 4) -> str:
    """Full SQL oracle for ``decontaminate_bloom`` — not a pin: DuckDB
    re-derives the bench-gram bloom's bit set (the ``_bloom_bits_sql``
    machinery) AND probes every training doc's distinct grams against it
    (a gram hits iff ALL n_hashes double-hash positions are set — the
    exact membership rule of pipelines.text.decontaminate_bloom).
    n_flagged = COUNT of the doc's distinct grams whose every probe
    position lands in the bit set; docs with zero hits are omitted."""
    P32 = 1 << 32
    gram = _gram_poly_expr(k)
    salts = ", ".join(f"({i})" for i in range(n_hashes))
    bench = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) < "
        f"{(10 << 32) // 100}"
    )
    return (
        f"WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws, "
        f"{bench} AS is_bench FROM documents), "
        "hv AS (SELECT doc_id, is_bench, text, ws, list_transform(ws, w -> "
        "CAST(CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS HUGEINT)) AS h "
        "FROM d), "
        f"gsel AS (SELECT doc_id, is_bench, CASE WHEN len(ws) < {k} "
        "THEN [CAST(CAST(('0x' || substr(md5(text), 1, 16)) AS UBIGINT) AS HUGEINT)] "
        f"ELSE list_transform(range(1, len(ws) - {k - 2}), i -> {gram}) END AS gs "
        "FROM hv), "
        "bbits AS (SELECT DISTINCT CAST((CAST(g % " + str(P32) + " AS BIGINT) "
        "+ s.i * (CAST(g // " + str(P32) + " AS BIGINT) | 1)) "
        f"% {m_bits} AS BIGINT) AS bit_idx "
        "FROM (SELECT unnest(gs) AS g FROM gsel WHERE is_bench) "
        f"CROSS JOIN (VALUES {salts}) s(i)), "
        "tg AS (SELECT DISTINCT doc_id, g FROM ("
        "SELECT doc_id, unnest(gs) AS g FROM gsel WHERE NOT is_bench)), "
        "probe AS (SELECT doc_id, g, CAST((CAST(g % " + str(P32) + " AS BIGINT) "
        "+ s.i * (CAST(g // " + str(P32) + " AS BIGINT) | 1)) "
        f"% {m_bits} AS BIGINT) AS bit_idx "
        f"FROM tg CROSS JOIN (VALUES {salts}) s(i)), "
        "hits AS (SELECT p.doc_id, p.g FROM probe p "
        "LEFT JOIN bbits b USING (bit_idx) GROUP BY p.doc_id, p.g "
        "HAVING SUM(CASE WHEN b.bit_idx IS NULL THEN 1 ELSE 0 END) = 0) "
        "SELECT doc_id, COUNT(*) AS n_flagged FROM hits GROUP BY doc_id"
    )


def _curate_sql() -> str:
    """Composed curation manifest == pipelines.text.curate: the dirty/
    min-token/bench gates, md5 first-wins dedup, lang_id label, then minus
    the decontamination hit set — each stage's SQL is the already-hash-
    verified per-operator oracle. Shared by ``curate`` and
    ``curate_full``."""
    return (
        f"WITH lang AS (SELECT * FROM ({_lang_id_sql()}) t), "
        "flt AS (SELECT doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
        "md5(text) AS fp FROM documents "
        "WHERE text NOT LIKE '%drop%' AND text NOT LIKE '%null%' "
        "AND len(string_split(text, ' ')) >= 5 "
        "AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
        f"AS UBIGINT) >= {(10 << 32) // 100}), "
        "ded AS (SELECT doc_id, n_tokens FROM ("
        "SELECT doc_id, n_tokens, ROW_NUMBER() OVER ("
        "PARTITION BY fp ORDER BY doc_id) AS rn FROM flt) WHERE rn = 1), "
        f"contam AS (SELECT * FROM ({_decon_sql()}) t) "
        "SELECT d.doc_id, l.lang_pred, d.n_tokens "
        "FROM ded d JOIN lang l ON d.doc_id = l.doc_id "
        "WHERE d.doc_id NOT IN (SELECT doc_id FROM contam)"
    )


def _values_sql(rows: list[dict], types: dict[str, str]) -> str:
    """Pin a small expected table as a DuckDB VALUES literal.

    The crawl_* queries run the Ray ENGINE over the simulated web, which the
    DuckDB testdata views cannot see — so their independent oracle is the
    reference-loop simulator (spiderman_ray/oracle.py), whose rows are
    emitted here as constants. The driver's hash compare then checks
    engine ≡ reference-loop, the same invariant the pytest conformance
    suite asserts, but surfaced through the driver gate."""

    def lit(v, t: str) -> str:
        if v is None:
            return f"CAST(NULL AS {t})"
        if t == "VARCHAR":
            return "'" + str(v).replace("'", "''") + "'"
        if t == "DOUBLE":
            return f"CAST({float(v)!r} AS DOUBLE)"
        return f"CAST({int(v)} AS {t})"

    cols = list(types)
    if not rows:
        # quoted identifiers: pin columns may be reserved words (left, rank)
        sel = ", ".join(f'CAST(NULL AS {t}) AS "{c}"' for c, t in types.items())
        return f"SELECT {sel} WHERE FALSE"
    body = ", ".join(
        "(" + ", ".join(lit(r[c], types[c]) for c in cols) + ")" for r in rows
    )
    named = ", ".join(f'"{c}"' for c in cols)
    return f"SELECT * FROM (VALUES {body}) AS t({named})"


def _crawl_oracle_sqls() -> dict[str, str]:
    """VALUES-pinned oracles derived from the reference-loop simulator (plus
    tiny pure-Python recomputations for the derived pipelines). These make
    the crawl rows driver-checkable; the source of truth stays the
    single-process oracle, never the engine."""
    from spiderman_ray.functions.imaging import (
        decode_image,
        phash64,
        quality_features_int,
    )
    from spiderman_ray.pipelines.multimodal import _box_resize

    o = _oracle_t1()
    out: dict[str, str] = {}
    out["crawl_order"] = _values_sql(
        o.crawl_order,
        {
            "url": "VARCHAR", "generation": "BIGINT", "host": "VARCHAR",
            "seq": "BIGINT", "attempts": "BIGINT", "vts_ms": "DOUBLE",
            "ua_idx": "BIGINT", "cookie_idx": "BIGINT", "proxy_idx": "BIGINT",
            "fp": "VARCHAR",
        },
    )
    out["crawl_dead_letters"] = _values_sql(
        o.dead_letters,
        {
            "url": "VARCHAR", "reason": "VARCHAR", "status_code": "BIGINT",
            "attempts": "BIGINT", "generation": "BIGINT", "seq": "BIGINT",
            "host": "VARCHAR", "fp": "VARCHAR",
        },
    )
    out["crawl_images"] = _values_sql(
        o.images,
        {
            "image_id": "VARCHAR", "w": "BIGINT", "h": "BIGINT",
            "fmt": "VARCHAR", "caption": "VARCHAR", "phash": "BIGINT",
            "fkey": "VARCHAR", "pagenum": "BIGINT", "px": "BIGINT",
        },
    )
    import math as _math

    out["crawl_throttled_order"] = _values_sql(
        [
            {
                **{k: r[k] for k in ("url", "generation", "host", "seq",
                                     "attempts", "ua_idx", "cookie_idx",
                                     "proxy_idx", "fp")},
                # integer µs: DuckDB's double parser is 1 ULP off on some
                # shortest-repr literals, so adaptive vts never pins as DOUBLE
                "vts_us": int(_math.floor(r["vts_ms"] * 1000.0 + 0.5)),
            }
            for r in _oracle_t1_throttled().crawl_order
        ],
        {
            "url": "VARCHAR", "generation": "BIGINT", "host": "VARCHAR",
            "seq": "BIGINT", "attempts": "BIGINT", "vts_us": "BIGINT",
            "ua_idx": "BIGINT", "cookie_idx": "BIGINT", "proxy_idx": "BIGINT",
            "fp": "VARCHAR",
        },
    )
    # the PIPELINED mode's gate oracles come from the SAME single-process
    # reference loop: pages are bit-deterministic in any mode; images are
    # compared on content-stable columns (the fetched URL set and bytes are
    # mode-independent; winner lineage is not — the documented FIFO contract)
    out["crawl_pipelined_pages"] = _values_sql(
        o.pages,
        {
            "title": "VARCHAR", "desc": "VARCHAR", "location": "VARCHAR",
            "price": "VARCHAR", "detail_full_url": "VARCHAR",
            "pkey": "VARCHAR", "pagenum": "BIGINT", "generation": "BIGINT",
            "seq": "BIGINT",
        },
    )
    out["crawl_pipelined_images"] = _values_sql(
        [
            {k: r[k] for k in ("image_id", "w", "h", "fmt", "phash", "url")}
            for r in o.images
        ],
        {
            "image_id": "VARCHAR", "w": "BIGINT", "h": "BIGINT",
            "fmt": "VARCHAR", "phash": "BIGINT", "url": "VARCHAR",
        },
    )
    # price_monitor predicate recomputed in plain Python over oracle pages
    monitor_rows = [
        {"pkey": r["pkey"], "title": r["title"], "price": r["price"], "pagenum": r["pagenum"]}
        for r in o.pages
        if int(r["price"]) < 5500
    ]
    out["crawl_price_monitor"] = _values_sql(
        monitor_rows,
        {"pkey": "VARCHAR", "title": "VARCHAR", "price": "VARCHAR", "pagenum": "BIGINT"},
    )
    # thumbnails + validate: sequential recomputation with the shared imaging
    # primitives over the ORACLE's image rows (checks the Ray actor-pool
    # plumbing delivers exactly what a single-process loop would)
    thumb_rows, n_bad = [], [0, 0, 0]
    for r in o.images:
        px = decode_image(r["bytes"])
        h, w = px.shape[:2]
        n_bad[0] += int(w != r["w"])
        n_bad[1] += int(h != r["h"])
        n_bad[2] += int(phash64(px) != r["phash"])
        thumb = _box_resize(px, 16, 16)
        thumb_rows.append(
            {"image_id": r["image_id"], "w": 16, "h": 16, "fmt": r["fmt"],
             "phash": phash64(thumb)}
        )
    out["crawl_thumbnails"] = _values_sql(
        thumb_rows,
        {"image_id": "VARCHAR", "w": "BIGINT", "h": "BIGINT",
         "fmt": "VARCHAR", "phash": "BIGINT"},
    )
    out["crawl_validate"] = _values_sql(
        [{"n_images": len(o.images), "n_w_bad": n_bad[0], "n_h_bad": n_bad[1],
          "n_phash_bad": n_bad[2]}],
        {"n_images": "BIGINT", "n_w_bad": "BIGINT", "n_h_bad": "BIGINT",
         "n_phash_bad": "BIGINT"},
    )
    # image channel stats: sequential integer recompute over the ORACLE's
    # image rows (same independence argument as crawl_thumbnails — checks
    # the distributed actor pool against a single-process loop)
    stat_rows = []
    for r in o.images:  # 1:1 with engine rows, like crawl_thumbnails
        px = decode_image(r["bytes"])
        h, w = px.shape[:2]
        n = h * w
        sums = px.reshape(-1, px.shape[2]).astype("int64").sum(axis=0)
        stat_rows.append(
            {"image_id": r["image_id"], "w": w, "h": h,
             "mean_r_x1000": int(sums[0]) * 1000 // n,
             "mean_g_x1000": int(sums[1]) * 1000 // n,
             "mean_b_x1000": int(sums[2]) * 1000 // n}
        )
    out["crawl_image_stats"] = _values_sql(
        stat_rows,
        {"image_id": "VARCHAR", "w": "BIGINT", "h": "BIGINT",
         "mean_r_x1000": "BIGINT", "mean_g_x1000": "BIGINT",
         "mean_b_x1000": "BIGINT"},
    )
    # caption<->image alignment: sequential recompute with the SHARED
    # CLIP-stub encoders over the ORACLE's image rows (same independence
    # argument as crawl_thumbnails — the distributed actor pool must
    # deliver exactly what a single-process loop over the oracle does)
    from spiderman_ray.functions.alignment import align_score_x1e6

    align_rows = [
        {"image_id": r["image_id"],
         "align_x1e6": align_score_x1e6(decode_image(r["bytes"]), r["caption"])}
        for r in o.images
    ]
    out["crawl_caption_align"] = _values_sql(
        align_rows, {"image_id": "VARCHAR", "align_x1e6": "BIGINT"}
    )
    # phash near-dup pairs, brute force over the oracle's image table
    uniq: dict[str, int] = {}
    for r in o.images:
        uniq.setdefault(r["image_id"], r["phash"])
    ids = sorted(uniq)
    pair_rows = [
        {"a": ids[i], "b": ids[j]}
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        # Python ints are two's-complement-infinite: xor+mask == uint64 xor
        if bin((uniq[ids[i]] ^ uniq[ids[j]]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3
    ]
    out["crawl_phash_dups"] = _values_sql(pair_rows, {"a": "VARCHAR", "b": "VARCHAR"})
    # per-host metrics recomputed sequentially over the oracle's rows
    # (integerized vclock: floor(ms*1000+0.5) microseconds)
    hs: dict[str, list[int]] = {}
    for r in o.crawl_order:
        s = hs.setdefault(r["host"], [0, 0, 0, 0])
        s[0] += 1
        s[1] += int(r["attempts"])
        s[2] = max(s[2], int(math.floor(r["vts_ms"] * 1000.0 + 0.5)))
    for r in o.dead_letters:
        s = hs.setdefault(r["host"], [0, 0, 0, 0])
        s[1] += int(r["attempts"])
        s[3] += 1
    out["crawl_host_stats"] = _values_sql(
        [
            {"host": h, "n_fetched": s[0], "attempts_total": s[1],
             "vts_max_us": s[2], "n_dead": s[3]}
            for h, s in sorted(hs.items())
        ],
        {"host": "VARCHAR", "n_fetched": "BIGINT", "attempts_total": "BIGINT",
         "vts_max_us": "BIGINT", "n_dead": "BIGINT"},
    )
    # per-seed lineage: root recovered in closed form from the seq encoding
    # (child seq = parent_seq * 2^20 + idx), recomputed sequentially
    ls: dict[int, list[int]] = {}
    for r in o.crawl_order:
        root = int(r["seq"]) >> (20 * int(r["generation"]))
        s = ls.setdefault(root, [0, 0])
        s[0] += 1
        s[1] = max(s[1], int(r["generation"]))
    seed_urls = {
        int(r["seq"]): r["url"] for r in o.crawl_order if int(r["generation"]) == 0
    }
    # byte-level content fps of the image store, first-wins by image_id
    seen_fp: dict[str, str] = {}
    idrows = []
    for iid, data in sorted((r["image_id"], r["bytes"]) for r in o.images):
        f = hashlib.md5(data).hexdigest()
        idrows.append(
            {"image_id": iid, "content_fp": f, "is_first": int(f not in seen_fp)}
        )
        seen_fp.setdefault(f, iid)
    out["crawl_image_dedup"] = _values_sql(
        idrows,
        {"image_id": "VARCHAR", "content_fp": "VARCHAR", "is_first": "BIGINT"},
    )
    # exact + perceptual dedup SURVIVORS: drop exact-content losers
    # (is_first == 0 above) and pHash-component-dominated ids (min image_id
    # per hamming<=3 component, the pair_rows graph) — sequential
    # recomputation of pipelines.images.image_dedup_survivors
    from spiderman_ray.pipelines.text import _MinUnionFind

    exact_losers = {r["image_id"] for r in idrows if not r["is_first"]}
    uf = _MinUnionFind()
    for r in pair_rows:
        uf.union(r["a"], r["b"])
    ph_losers = {n for n in uf.parent if uf.find(n) != n}
    out["crawl_image_survivors"] = _values_sql(
        [{"image_id": i} for i in ids if i not in exact_losers and i not in ph_losers],
        {"image_id": "VARCHAR"},
    )
    out["crawl_phash_clusters"] = _values_sql(
        [{"image_id": i, "cluster_id": uf.find(i) if i in uf.parent else i}
         for i in ids],
        {"image_id": "VARCHAR", "cluster_id": "VARCHAR"},
    )
    # incremental image admission (base/new = md5(image_id) prefix split):
    # sequential recompute of pipelines.images.incremental_image_dedup —
    # exact fp admission vs the base snapshot, then one representative
    # (min admitted) per all-new pHash component
    import hashlib as _ihl

    _inc_thresh = (50 << 32) // 100

    def _img_is_new(i: str) -> bool:
        return int(_ihl.md5(i.encode()).hexdigest()[:8], 16) >= _inc_thresh

    base_fps = {r["content_fp"] for r in idrows if not _img_is_new(r["image_id"])}
    adm: set = set()
    seen_new_fp: set = set()
    for r in sorted(idrows, key=lambda r: r["image_id"]):
        i, f = r["image_id"], r["content_fp"]
        if not _img_is_new(i) or f in base_fps or f in seen_new_fp:
            continue
        seen_new_fp.add(f)
        adm.add(i)
    comp: dict = {}
    for n in uf.parent:
        comp.setdefault(uf.find(n), []).append(n)
    inc_drops: set = set()
    for _root, ms in comp.items():
        new = [m for m in ms if _img_is_new(m)]
        if not new:
            continue
        if any(not _img_is_new(m) for m in ms):
            inc_drops.update(new)
            continue
        admn = sorted(m for m in new if m in adm)
        rep = admn[0] if admn else None
        inc_drops.update(m for m in new if m != rep)
    out["crawl_incremental_image_dedup"] = _values_sql(
        [{"image_id": i} for i in sorted(adm - inc_drops)],
        {"image_id": "VARCHAR"},
    )
    # multimodal curation flagship: sequential recompute of
    # pipelines.images.curate_images over the oracle's image rows
    cur_rows, seen_cfp = [], set()
    for r in sorted(o.images, key=lambda r: r["image_id"]):
        px = decode_image(r["bytes"])
        h, w = px.shape[:2]
        if w != r["w"] or h != r["h"] or phash64(px) != r["phash"]:
            continue
        toks = r["caption"].split(" ")
        if len(toks) < 2 or any(d in r["caption"] for d in ("drop", "null")):
            continue
        f = hashlib.md5(r["bytes"]).hexdigest()
        if f in seen_cfp:
            continue
        seen_cfp.add(f)
        if r["image_id"] in ph_losers:
            continue
        cur_rows.append({"image_id": r["image_id"], "w": w, "h": h,
                         "n_caption_tokens": len(toks)})
    out["crawl_curate_images"] = _values_sql(
        cur_rows,
        {"image_id": "VARCHAR", "w": "BIGINT", "h": "BIGINT",
         "n_caption_tokens": "BIGINT"},
    )
    # incremental multimodal flagship: gates on NEW images only, exact fp
    # admission vs ALL base content fps, then the component rule (one min
    # admitted representative per all-new pHash component) — sequential
    # recompute of pipelines.images.curate_images_incremental
    inc_gated: dict = {}
    for r in sorted(o.images, key=lambda r: r["image_id"]):
        if not _img_is_new(r["image_id"]):
            continue
        px = decode_image(r["bytes"])
        h, w = px.shape[:2]
        if w != r["w"] or h != r["h"] or phash64(px) != r["phash"]:
            continue
        toks = r["caption"].split(" ")
        if len(toks) < 2 or any(d in r["caption"] for d in ("drop", "null")):
            continue
        inc_gated[r["image_id"]] = {
            "image_id": r["image_id"], "w": w, "h": h,
            "n_caption_tokens": len(toks),
            "fp": _ihl.md5(r["bytes"]).hexdigest(),
        }
    ci_adm: dict = {}
    seen_ci_fp: set = set()
    for i in sorted(inc_gated):
        f = inc_gated[i]["fp"]
        if f in base_fps or f in seen_ci_fp:
            continue
        seen_ci_fp.add(f)
        ci_adm[i] = inc_gated[i]
    ci_drops: set = set()
    for _root, ms in comp.items():
        new = [m for m in ms if _img_is_new(m)]
        if not new:
            continue
        if any(not _img_is_new(m) for m in ms):
            ci_drops.update(new)
            continue
        admn = sorted(m for m in new if m in ci_adm)
        rep = admn[0] if admn else None
        ci_drops.update(m for m in new if m != rep)
    out["crawl_curate_images_incremental"] = _values_sql(
        [{k: v for k, v in ci_adm[i].items() if k != "fp"}
         for i in sorted(ci_adm) if i not in ci_drops],
        {"image_id": "VARCHAR", "w": "BIGINT", "h": "BIGINT",
         "n_caption_tokens": "BIGINT"},
    )
    # pHash retrieval: exact hamming top-5 for the 4 first image ids —
    # sequential recompute of pipelines.images.phash_search
    ph_by_id = {r["image_id"]: r["phash"] & 0xFFFFFFFFFFFFFFFF for r in o.images}
    ps_rows = []
    for qid in sorted(ph_by_id)[:4]:
        qp = ph_by_id[qid]
        cands = sorted(
            (bin(qp ^ p).count("1"), i)
            for i, p in ph_by_id.items() if i != qid
        )[:5]
        ps_rows.extend(
            {"query_id": qid, "image_id": i, "hamming": hm, "rank": r + 1}
            for r, (hm, i) in enumerate(cands)
        )
    out["crawl_phash_search"] = _values_sql(
        ps_rows,
        {"query_id": "VARCHAR", "image_id": "VARCHAR",
         "hamming": "BIGINT", "rank": "BIGINT"},
    )
    # aligned flagship: identical sequential recompute with the alignment
    # gate inserted between the caption gates and the exact dedup (the
    # engine gates in the candidate stage, so the gate decides which
    # duplicate survives — mirrored here)
    alr_rows, seen_afp = [], set()
    for r in sorted(o.images, key=lambda r: r["image_id"]):
        px = decode_image(r["bytes"])
        h, w = px.shape[:2]
        if w != r["w"] or h != r["h"] or phash64(px) != r["phash"]:
            continue
        toks = r["caption"].split(" ")
        if len(toks) < 2 or any(d in r["caption"] for d in ("drop", "null")):
            continue
        if align_score_x1e6(px, r["caption"]) < 100_000:
            continue
        f = hashlib.md5(r["bytes"]).hexdigest()
        if f in seen_afp:
            continue
        seen_afp.add(f)
        if r["image_id"] in ph_losers:
            continue
        alr_rows.append({"image_id": r["image_id"], "w": w, "h": h,
                         "n_caption_tokens": len(toks)})
    out["crawl_curate_images_aligned"] = _values_sql(
        alr_rows,
        {"image_id": "VARCHAR", "w": "BIGINT", "h": "BIGINT",
         "n_caption_tokens": "BIGINT"},
    )
    # quality flagship: the aligned recompute with the SHARED sharpness
    # gate added before dedup (a blurry copy must not shadow a sharp
    # duplicate — same placement argument as the alignment gate)
    qfr_rows, seen_qfp = [], set()
    for r in sorted(o.images, key=lambda r: r["image_id"]):
        px = decode_image(r["bytes"])
        h, w = px.shape[:2]
        if w != r["w"] or h != r["h"] or phash64(px) != r["phash"]:
            continue
        toks = r["caption"].split(" ")
        if len(toks) < 2 or any(d in r["caption"] for d in ("drop", "null")):
            continue
        if align_score_x1e6(px, r["caption"]) < 100_000:
            continue
        if quality_features_int(px)["sharpness_x100"] < 450:
            continue
        f = hashlib.md5(r["bytes"]).hexdigest()
        if f in seen_qfp:
            continue
        seen_qfp.add(f)
        if r["image_id"] in ph_losers:
            continue
        qfr_rows.append({"image_id": r["image_id"], "w": w, "h": h,
                         "n_caption_tokens": len(toks)})
    out["crawl_curate_images_quality"] = _values_sql(
        qfr_rows,
        {"image_id": "VARCHAR", "w": "BIGINT", "h": "BIGINT",
         "n_caption_tokens": "BIGINT"},
    )
    out["crawl_lineage_stats"] = _values_sql(
        [
            {"seed_url": seed_urls[root], "n_urls": s[0], "max_depth": s[1]}
            for root, s in sorted(ls.items())
        ],
        {"seed_url": "VARCHAR", "n_urls": "BIGINT", "max_depth": "BIGINT"},
    )
    # host authority: sequential edge recompute from the oracle's
    # crawl_order (the same parent-key derivation), fed through the SAME
    # _host_pagerank power iteration the engine uses — parity structural
    from collections import Counter as _Counter

    import pandas as _pd

    from spiderman_ray.pipelines.monitor import _host_pagerank

    pmap = {(r["generation"], r["seq"]): r["host"] for r in o.crawl_order}
    ec: dict = _Counter()
    for r in o.crawl_order:
        if r["generation"] >= 1:
            p = pmap.get((r["generation"] - 1, r["seq"] >> 20))
            if p is not None:
                ec[(p, r["host"])] += 1
    hosts = sorted({r["host"] for r in o.crawl_order})
    pair_df = _pd.DataFrame(
        [(s, d, n) for (s, d), n in ec.items()], columns=["src", "dst", "n"]
    )
    out["crawl_host_authority"] = _values_sql(
        _host_pagerank(pair_df, hosts, 5).to_pylist(),
        {"host": "VARCHAR", "rank_x1e12": "BIGINT"},
    )
    # quality features: sequential all-integer recompute with the SHARED
    # quality_features_int over the oracle's image rows (1:1, the
    # crawl_image_stats independence argument)
    from spiderman_ray.functions.imaging import aspect_bucket_ids
    from spiderman_ray.functions.imaging import ASPECT_LABELS as _ALAB

    qual_rows = [
        {"image_id": r["image_id"], **quality_features_int(decode_image(r["bytes"]))}
        for r in o.images
    ]
    out["crawl_image_quality"] = _values_sql(
        qual_rows,
        {"image_id": "VARCHAR", "sharpness_x100": "BIGINT",
         "contrast_x100": "BIGINT", "brightness_x1000": "BIGINT",
         "n_gray_levels": "BIGINT", "gray_p50": "BIGINT"},
    )
    # quality-priority dedup survivors: per pHash component keep the
    # SHARPEST member (tie -> min image_id); exact losers still first-wins
    sharp_of = {r["image_id"]: r["sharpness_x100"] for r in qual_rows}
    comps: dict[str, list] = {}
    for n in uf.parent:
        comps.setdefault(uf.find(n), []).append(n)
    q_losers = set()
    for ms in comps.values():
        ms = sorted(ms, key=lambda i: (-sharp_of[i], i))
        q_losers.update(ms[1:])
    out["crawl_image_survivors_quality"] = _values_sql(
        [{"image_id": i} for i in ids
         if i not in exact_losers and i not in q_losers],
        {"image_id": "VARCHAR"},
    )
    # aspect-bucketed batch packing: sequential recompute with the SHARED
    # integer bucket argmin; seq = rank of image_id within its bucket
    # (image_id unique per crawl_images pin), batch capacity 8
    import numpy as _np

    dims = {r["image_id"]: (int(r["w"]), int(r["h"])) for r in o.images}
    ab_rows, per_bucket = [], {}
    for iid in ids:  # sorted unique image_ids
        w_, h_ = dims[iid]
        b = _ALAB[int(aspect_bucket_ids(_np.array([w_]), _np.array([h_]))[0])]
        seq = per_bucket.get(b, 0)
        per_bucket[b] = seq + 1
        ab_rows.append({"image_id": iid, "w": w_, "h": h_, "bucket": b,
                        "seq": seq, "batch_idx": seq // 8, "slot": seq % 8})
    out["crawl_aspect_buckets"] = _values_sql(
        ab_rows,
        {"image_id": "VARCHAR", "w": "BIGINT", "h": "BIGINT",
         "bucket": "VARCHAR", "seq": "BIGINT", "batch_idx": "BIGINT",
         "slot": "BIGINT"},
    )
    return out


def _meta_oracle_sql() -> dict[str, str]:
    """meta_table is deterministic pure Python, so its independent oracle is
    a FROZEN snapshot pin (tools/meta_oracle_pin.sql, regenerated only by a
    human via tools/freeze_meta_oracle.py): accidental schema/comment drift
    fails the driver hash gate."""
    pin = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tools", "meta_oracle_pin.sql")
    if not os.path.isfile(pin):
        return {}
    return {"meta_table": open(pin).read()}


def _pin_oracle_sqls() -> dict[str, str]:
    """Frozen-VALUES pins for the ops whose FIT/TRAIN step is not SQL-
    expressible (iterative BPE argmax, k-means codebooks, seeded
    hyperplanes): each pin is a SINGLE-PROCESS recompute — no Ray, the
    crawl_* independence contract — run over the driver-gate testdata.
    The driver compares the distributed engine against these constants,
    which is exactly the engine-equals-sequential-loop invariant the
    pytest reference tests assert, surfaced through the hash gate.

    The pins are data-dependent, so they read the scale the gate runs at:
    /root/testdata/sf0.01 by default, overridable via GRAFT_ORACLE_SF_DIR
    (tools/check_queries.py sets it so rehearsals at other scales stay
    meaningful)."""
    import duckdb

    from spiderman_ray.pipelines.bpe import bpe_encode_reference, bpe_reference
    from spiderman_ray.pipelines.vectors import (
        cosine_dup_pairs_lsh_reference,
        pq_quantize_reference,
        semantic_dedup_lsh_reference,
    )

    sf = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    out: dict[str, str] = {}
    con = duckdb.connect()
    docs_pq = os.path.join(sf, "documents.parquet").replace("'", "''")
    wf = dict(
        con.execute(
            "SELECT tok, COUNT(*) FROM (SELECT unnest(string_split(text, ' ')) "
            f"AS tok FROM '{docs_pq}') WHERE tok <> '' GROUP BY tok"
        ).fetchall()
    )
    merges = bpe_reference(wf, 20)
    out["bpe_train"] = _values_sql(
        [{"rank": r, "left": l, "right": rt, "pair_count": c} for r, l, rt, c in merges],
        {"rank": "BIGINT", "left": "VARCHAR", "right": "VARCHAR", "pair_count": "BIGINT"},
    )
    docs = con.execute(f"SELECT doc_id, text FROM '{docs_pq}' ORDER BY doc_id").fetchall()
    enc_rows = bpe_encode_reference(docs, merges)
    out["bpe_encode"] = _values_sql(
        enc_rows,
        {"doc_id": "BIGINT", "n_bpe_tokens": "BIGINT", "token_checksum": "BIGINT"},
    )
    # bpe_fertility: COMPOSED oracle — the per-doc encode pin joined to
    # the lang-ID SQL and the word counts, grouped per language (floor-
    # division fertility, exact integers throughout)
    enc_vals = _values_sql(
        [{"doc_id": r["doc_id"], "n_bpe_tokens": r["n_bpe_tokens"]} for r in enc_rows],
        {"doc_id": "BIGINT", "n_bpe_tokens": "BIGINT"},
    )
    out["bpe_fertility"] = (
        f"WITH enc AS ({enc_vals}), lang AS ({_lang_id_sql()}), "
        "w AS (SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), "
        "x -> x != '')) AS BIGINT) AS n_words FROM documents) "
        "SELECT l.lang_pred AS lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(w.n_words) AS BIGINT) AS n_words, "
        "CAST(SUM(e.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens, "
        "CAST(SUM(e.n_bpe_tokens) * 1000000 // GREATEST(SUM(w.n_words), 1) "
        "AS BIGINT) AS fertility_x1m "
        "FROM enc e JOIN lang l ON e.doc_id = l.doc_id "
        "JOIN w ON w.doc_id = e.doc_id GROUP BY 1"
    )
    # training_shards: COMPOSED oracle — the per-doc encode pin (counts
    # + order-insensitive token checksums) + a window prefix sum gives
    # each doc's start offset, shard = start // (capacity *
    # blocks_per_shard) = 4096 tokens; shard checksum = HUGEINT sum of
    # the per-doc checksums mod 2^63 (exactly the store readback's
    # modded-partial arithmetic) — pipelines.bpe.training_shards
    enc_full = _values_sql(
        enc_rows,
        {"doc_id": "BIGINT", "n_bpe_tokens": "BIGINT", "token_checksum": "BIGINT"},
    )
    out["training_shards"] = (
        f"WITH enc AS ({enc_full}), "
        "o AS (SELECT doc_id, n_bpe_tokens, token_checksum, "
        "COALESCE(SUM(n_bpe_tokens) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st FROM enc) "
        "SELECT CAST(st // 4096 AS BIGINT) AS shard_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_bpe_tokens) AS BIGINT) AS n_tokens, "
        "CAST(SUM(CAST(token_checksum AS HUGEINT)) % 9223372036854775808 "
        "AS BIGINT) AS checksum "
        "FROM o GROUP BY 1"
    )
    out["pq_quantize"] = _values_sql(
        pq_quantize_reference(sf),
        {"vec_id": "BIGINT", "code_sum": "BIGINT", "recon_cos_x1e6": "BIGINT"},
    )
    out["cosine_dup_pairs_lsh"] = _values_sql(
        cosine_dup_pairs_lsh_reference(sf),
        {"a": "BIGINT", "b": "BIGINT"},
    )
    out["semantic_dedup_lsh"] = _values_sql(
        semantic_dedup_lsh_reference(sf),
        {"vec_id": "BIGINT"},
    )
    from spiderman_ray.pipelines.vectors import (
        cluster_quota_sample_reference,
        kmeans_embed_reference,
        semantic_dedup_clustered_reference,
    )

    # one sequential Lloyd fit shared by the three kmeans-family pins
    kref = kmeans_embed_reference(sf, k=8, iters=6)
    out["semantic_dedup_clustered"] = _values_sql(
        semantic_dedup_clustered_reference(sf, ref=kref),
        {"vec_id": "BIGINT"},
    )
    out["cluster_quota_sample"] = _values_sql(
        cluster_quota_sample_reference(sf, ref=kref),
        {"cluster": "BIGINT", "vec_id": "BIGINT", "rank": "BIGINT"},
    )
    from spiderman_ray.pipelines.vectors import ann_recall_eval_reference

    out["ann_recall_eval"] = _values_sql(
        ann_recall_eval_reference(sf),
        {"hits": "BIGINT", "total": "BIGINT", "recall_x1m": "BIGINT"},
    )
    from spiderman_ray.pipelines.text import compression_ratio_reference

    out["compression_ratio"] = _values_sql(
        compression_ratio_reference(sf),
        {"doc_id": "BIGINT", "ratio_x10000": "BIGINT"},
    )
    from spiderman_ray.pipelines.multimodal import video_near_dups_reference

    out["video_near_dups"] = _values_sql(
        video_near_dups_reference(sf, every_nth=4, min_shared=1),
        {"a": "VARCHAR", "b": "VARCHAR", "n_shared": "BIGINT"},
    )
    from spiderman_ray.pipelines.multimodal import audio_near_dups_reference

    out["audio_near_dups"] = _values_sql(
        audio_near_dups_reference(sf, window=128, min_shared=1),
        {"a": "VARCHAR", "b": "VARCHAR", "n_shared": "BIGINT"},
    )
    from spiderman_ray.pipelines.vectors import pca_embed_reference

    out["pca_embed"] = _values_sql(
        pca_embed_reference(sf, k=4),
        {"vec_id": "BIGINT", "p0": "BIGINT", "p1": "BIGINT",
         "p2": "BIGINT", "p3": "BIGINT"},
    )
    out["kmeans_embed"] = _values_sql(
        kref,
        {"vec_id": "BIGINT", "cluster": "BIGINT", "dist": "BIGINT"},
    )

    # curate_v2: an INDEPENDENT recompute — curate's SQL manifest (each
    # stage the already-hash-verified per-op oracle) run in DuckDB, then
    # the zlib band gate + md5-priority domain quota applied in plain
    # python (DEFLATE is not SQL-expressible; quota arithmetic is the
    # domain_quota_sample contract).
    import hashlib as _hl
    import zlib as _zlib

    import pyarrow.parquet as _pqm

    con.execute(
        f"CREATE VIEW IF NOT EXISTS documents AS SELECT * FROM '{docs_pq}'"
    )
    cur = con.execute(_curate_sql()).df()
    dtab = _pqm.read_table(
        os.path.join(sf, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    raw = {int(i): t.encode("utf-8")
           for i, t in zip(dtab["doc_id"].to_pylist(), dtab["text"].to_pylist())}
    src = {int(i): s
           for i, s in zip(dtab["doc_id"].to_pylist(), dtab["source"].to_pylist())}
    by_src: dict[str, list] = {}
    for r in cur.itertuples(index=False):
        b = raw[int(r.doc_id)]
        ratio = len(_zlib.compress(b, 6)) * 10000 // max(1, len(b))
        if 4300 <= ratio <= 8400:
            hv = int(_hl.md5(str(int(r.doc_id)).encode()).hexdigest()[:8], 16)
            by_src.setdefault(src[int(r.doc_id)], []).append(
                (hv, int(r.doc_id), str(r.lang_pred), int(r.n_tokens))
            )
    pin = []
    for s_key in sorted(by_src):
        ranked = sorted(by_src[s_key])[:15]
        for rank, (_hv, did, lp, nt) in enumerate(ranked, start=1):
            pin.append({"doc_id": did, "lang_pred": lp, "n_tokens": nt,
                        "source": s_key, "rank": rank})
    out["curate_v2"] = _values_sql(
        pin,
        {"doc_id": "BIGINT", "lang_pred": "VARCHAR", "n_tokens": "BIGINT",
         "source": "VARCHAR", "rank": "BIGINT"},
    )

    # curate_v2_incremental: independent recompute in the ENGINE's stage
    # order — the per-op SQL oracles compose the SQL-expressible stages
    # (gates, lang, md5 split, decontamination CTE, exact-Jaccard
    # component labels = the minhash_clusters oracle), the zlib band /
    # base-fp admission / representative pick / quota run in plain
    # python over those intermediates.
    split_thresh = (50 << 32) // 100

    def _pri(d: int) -> int:
        return int(_hl.md5(str(int(d)).encode()).hexdigest()[:8], 16)

    gates = con.execute(
        f"WITH lang AS (SELECT * FROM ({_lang_id_sql()}) t), "
        "flt AS (SELECT doc_id, source, md5(text) AS fp, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
        "FROM documents "
        "WHERE text NOT LIKE '%drop%' AND text NOT LIKE '%null%' "
        "AND len(string_split(text, ' ')) >= 5 "
        "AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
        f"AS UBIGINT) >= {(10 << 32) // 100} "
        "AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
        f"AS UBIGINT) >= {split_thresh}) "
        "SELECT f.doc_id, l.lang_pred, f.n_tokens, f.source, f.fp "
        "FROM flt f JOIN lang l ON f.doc_id = l.doc_id"
    ).df()
    cand = []
    for r in gates.itertuples(index=False):
        b = raw[int(r.doc_id)]
        ratio = len(_zlib.compress(b, 6)) * 10000 // max(1, len(b))
        if 4300 <= ratio <= 8400:
            cand.append((str(r.fp), int(r.doc_id), str(r.lang_pred),
                         int(r.n_tokens), str(r.source)))
    base_fps = {
        _hl.md5(raw[d]).hexdigest() for d in raw if _pri(d) < split_thresh
    }
    admitted, seen_fp = [], set()
    for fp, did, lp, nt, s_key in sorted(cand):  # first-wins by (fp, doc_id)
        if fp in base_fps or fp in seen_fp:
            continue
        seen_fp.add(fp)
        admitted.append((did, lp, nt, s_key))
    contam = {
        int(d) for d in con.execute(_decon_sql()).df()["doc_id"]
    }
    admitted = [t for t in admitted if t[0] not in contam]
    labels = con.execute(
        f"WITH RECURSIVE {_SHINGLES_CTE}, {_JACCARD_PAIRS}, "
        "edges AS (SELECT a AS u, b AS v FROM pairs "
        "UNION SELECT b, a FROM pairs), "
        "cc(node, lbl) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT e.v, cc.lbl FROM cc JOIN edges e ON cc.node = e.u) "
        "SELECT node, MIN(lbl) AS lbl FROM cc GROUP BY node"
    ).df()
    lmap = {int(n): int(l) for n, l in zip(labels["node"], labels["lbl"])}
    base_cl = {lmap[d] for d in lmap if _pri(d) < split_thresh}
    by_cl: dict[int, tuple] = {}
    for t in sorted(admitted):  # min doc_id per base-free component
        c = lmap[t[0]]
        if c not in base_cl:
            by_cl.setdefault(c, t)
    by_src2: dict[str, list] = {}
    for did, lp, nt, s_key in sorted(by_cl.values()):
        by_src2.setdefault(s_key, []).append((_pri(did), did, lp, nt))
    pin2 = []
    for s_key in sorted(by_src2):
        for rank, (_hv, did, lp, nt) in enumerate(
            sorted(by_src2[s_key])[:15], start=1
        ):
            pin2.append({"doc_id": did, "lang_pred": lp, "n_tokens": nt,
                         "source": s_key, "rank": rank})
    out["curate_v2_incremental"] = _values_sql(
        pin2,
        {"doc_id": "BIGINT", "lang_pred": "VARCHAR", "n_tokens": "BIGINT",
         "source": "VARCHAR", "rank": "BIGINT"},
    )

    # curation_funnel: independent recompute — the curate_v2 pin's
    # machinery counted per stage instead of ranked: gates / zlib band /
    # first-wins dedup / quota in plain python over the raw bytes, the
    # decontamination set from the SQL oracle (``contam`` above).
    texts = {int(i): t for i, t in
             zip(dtab["doc_id"].to_pylist(), dtab["text"].to_pylist())}
    s1 = [d for d in sorted(texts) if len(texts[d].split(" ")) >= 5]
    s2 = [d for d in s1 if "drop" not in texts[d] and "null" not in texts[d]]
    s3 = [d for d in s2 if _pri(d) >= (10 << 32) // 100]
    s4 = [
        d for d in s3
        if 4300 <= len(_zlib.compress(raw[d], 6)) * 10000 // max(1, len(raw[d])) <= 8400
    ]
    reps: dict[str, int] = {}
    for d in s4:  # ascending doc_id -> first-wins per content fp
        reps.setdefault(_hl.md5(raw[d]).hexdigest(), d)
    deduped = sorted(reps.values())
    clean_ids = [d for d in deduped if d not in contam]
    per_src: dict[str, int] = {}
    for d in clean_ids:
        per_src[src[d]] = per_src.get(src[d], 0) + 1
    out["curation_funnel"] = _values_sql(
        [{"n_input": len(texts), "after_len": len(s1), "after_dirty": len(s2),
          "after_bench": len(s3), "after_zlib": len(s4),
          "after_dedup": len(deduped), "after_decon": len(clean_ids),
          "after_quota": sum(min(15, n) for n in per_src.values())}],
        {k: "BIGINT" for k in
         ("n_input", "after_len", "after_dirty", "after_bench", "after_zlib",
          "after_dedup", "after_decon", "after_quota")},
    )

    from spiderman_ray.pipelines.text import minhash_eval_reference

    out["minhash_eval"] = _values_sql(
        minhash_eval_reference(sf),
        {"n_candidates": "BIGINT", "tp": "BIGINT", "fp": "BIGINT",
         "fn": "BIGINT", "precision_x1m": "BIGINT", "recall_x1m": "BIGINT"},
    )

    from spiderman_ray.pipelines.text import minhash_sweep_reference

    out["minhash_threshold_sweep"] = _values_sql(
        minhash_sweep_reference(sf),
        {"threshold_pct": "BIGINT", "tp": "BIGINT", "fp": "BIGINT",
         "fn": "BIGINT", "precision_x1m": "BIGINT", "recall_x1m": "BIGINT"},
    )
    return out


def oracle_sql() -> dict[str, str]:
    stop = "'the','and','of','a','to','in','is','on','for','with'"
    sqls = _crawl_oracle_sqls() | _meta_oracle_sql() | _pin_oracle_sqls() | {
        "missing_pages": (
            "SELECT o_orderkey, o_orderstatus FROM orders "
            "WHERE o_orderkey NOT IN (SELECT DISTINCT l_orderkey FROM lineitem)"
        ),
        "missing_details": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT')"
        ),
        "grouped_returns": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_x100, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_rev_cents, "
            "COUNT(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        # per-group quantiles: same 1-indexed ceil(q*n) rank contract as
        # price_quantiles, applied per brand via window rank join
        "brand_price_quantiles": (
            "WITH c AS (SELECT p_brand, "
            "CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT) AS cents FROM part), "
            "r AS (SELECT p_brand, cents, "
            "ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY cents) AS rk, "
            "COUNT(*) OVER (PARTITION BY p_brand) AS n FROM c), "
            "p AS (SELECT * FROM (VALUES (25), (50), (75), (90)) AS t(pct)) "
            "SELECT r.p_brand, CAST(p.pct AS BIGINT) AS pct, "
            "r.cents AS value_cents FROM r JOIN p "
            "ON r.rk = (p.pct * r.n + 99) // 100"
        ),
        # ROLLUP levels with the 'ALL' sentinel (COALESCE) so NULL
        # representation can't skew the value hash
        "returns_rollup": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_x100, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_rev_cents, "
            "COUNT(*) AS n_rows "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        # identical RE2 patterns through DuckDB's RE2: rebuild the injected
        # PII by concatenation, then count-then-replace in the same order
        # (email -> ip -> phone, later counts see earlier placeholders)
        "pii_redaction": (
            "WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN "
            "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.' "
            "|| CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.' || CAST(doc_id % 13 AS VARCHAR) || ' phone +1-555-' "
            "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE text END AS t "
            "FROM documents), "
            "s1 AS (SELECT doc_id, t, "
            "CAST(len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+')) AS BIGINT) AS n_email, "
            "regexp_replace(t, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+', '<EMAIL>', 'g') AS r1 FROM aug), "
            "s2 AS (SELECT doc_id, n_email, "
            "CAST(len(regexp_extract_all(r1, '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}')) AS BIGINT) AS n_ip, "
            "regexp_replace(r1, '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}', '<IP>', 'g') AS r2 FROM s1) "
            "SELECT doc_id, n_email, n_ip, "
            "CAST(len(regexp_extract_all(r2, '\\+1-555-\\d{4}')) AS BIGINT) AS n_phone, "
            "regexp_replace(r2, '\\+1-555-\\d{4}', '<PHONE>', 'g') AS redacted FROM s2"
        ),
        "bpe_token_stats": (
            # identical RE2 strings through DuckDB; same doc_id%3 injection
            # CTE as pii_redaction
            "WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN "
            "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.' "
            "|| CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.' || CAST(doc_id % 13 AS VARCHAR) || ' phone +1-555-' "
            "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE text END AS t "
            "FROM documents) "
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(t, ' ?[0-9A-Za-z_一-鿿]+| ?[^ 0-9A-Za-z_一-鿿]+')) AS BIGINT) AS n_tokens_bpe, "
            "CAST(len(regexp_extract_all(t, ' ?[0-9A-Za-z_一-鿿]+')) AS BIGINT) AS n_word_tokens, "
            "CAST(len(regexp_extract_all(t, ' ?[0-9A-Za-z_一-鿿]+| ?[^ 0-9A-Za-z_一-鿿]+')) "
            "- len(regexp_extract_all(t, ' ?[0-9A-Za-z_一-鿿]+')) AS BIGINT) AS n_other_tokens "
            "FROM aug"
        ),
        "md5_keys": "SELECT c_custkey, UPPER(md5(c_name)) AS pkey FROM customer",
        "event_days": "SELECT event_id, strftime(ts, '%Y-%m-%d') AS day FROM events",
        "top_orders": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"
        ),
        "windowed_events": (
            "SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, "
            "COUNT(*) AS n_events, "
            "CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents "
            "FROM events GROUP BY event_type, hour"
        ),
        "trending_events": (
            "WITH c AS (SELECT epoch_us(ts) // 21600000000 AS w, event_type, "
            "COUNT(*) AS n FROM events GROUP BY w, event_type) "
            "SELECT w, event_type, n, rk FROM ("
            "SELECT w, event_type, n, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY w ORDER BY n DESC, event_type) AS BIGINT) AS rk "
            "FROM c) WHERE rk <= 3"
        ),
        "sessionized_events": (
            "WITH e AS (SELECT user_id, ts, event_id, "
            "CASE WHEN LAG(ts) OVER w IS NULL "
            "OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000 "
            "THEN 1 ELSE 0 END AS new_s FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM e) "
            "SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS session_start, "
            "COUNT(*) AS n_events, "
            "CAST((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS BIGINT) AS span_s "
            "FROM s GROUP BY user_id, sid"
        ),
        "running_order_totals": (
            "SELECT o_orderkey, o_custkey, "
            "CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents "
            "FROM orders"
        ),
        "asof_last_signup": (
            "WITH w AS (SELECT *, MAX(CASE WHEN event_type = 'signup' THEN ts END) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_signup FROM events) "
            "SELECT event_id, user_id, "
            "CAST(COALESCE(epoch_us(prev_signup), -1) AS BIGINT) AS prev_signup_us "
            "FROM w WHERE event_type = 'purchase'"
        ),
        "customers_per_region": (
            "SELECT r_name, COUNT(*) AS n_customers FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        "revenue_by_segment": (
            "SELECT c_mktsegment, "
            "CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents, "
            "COUNT(*) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "priority_union": (
            "SELECT o_orderpriority, COUNT(*) AS n FROM ("
            "SELECT o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT' "
            "UNION ALL "
            "SELECT o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH') "
            "GROUP BY o_orderpriority"
        ),
        "distinct_brands": "SELECT DISTINCT p_brand FROM part",
        "name_edit_dups": (
            # brute-force oracle for the deletion-neighborhood join: any
            # correct edit-distance agrees with the <=1 check
            "SELECT DISTINCT a.p_name AS a, b.p_name AS b FROM part a "
            "JOIN part b ON a.p_name < b.p_name "
            "WHERE levenshtein(a.p_name, b.p_name) <= 1"
        ),
        "table_diff": (
            # the identical perturbation + FULL OUTER JOIN in SQL;
            # COALESCE(-1) mirrors the engine's int64 null padding
            "WITH o AS (SELECT o_orderkey AS okey, "
            "CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents FROM orders), "
            "n AS (SELECT okey, cents + CASE WHEN okey % 7 = 0 THEN 1 ELSE 0 END "
            "AS cents2 FROM o WHERE okey % 13 != 0 "
            "UNION ALL SELECT okey + 10000000, cents + 5 FROM o WHERE okey % 11 = 0), "
            "j AS (SELECT COALESCE(o.okey, n.okey) AS okey, o.cents AS oldc, "
            "n.cents2 AS newc FROM o FULL OUTER JOIN n ON o.okey = n.okey) "
            "SELECT okey, CASE WHEN oldc IS NULL THEN 'added' "
            "WHEN newc IS NULL THEN 'removed' ELSE 'changed' END AS status, "
            "COALESCE(oldc, -1) AS old_cents, COALESCE(newc, -1) AS new_cents "
            "FROM j WHERE oldc IS NULL OR newc IS NULL OR oldc != newc"
        ),
        "range_join_shipments": (
            # pure date-range join: per order, lineitems (any order) shipped
            # within the 7-day window after the order date
            "SELECT o.o_orderkey, COUNT(l.l_shipdate) AS n_ship "
            "FROM orders o LEFT JOIN lineitem l "
            "ON l.l_shipdate >= o.o_orderdate "
            "AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY "
            "GROUP BY o.o_orderkey"
        ),
        "hll_registers": (
            # the HLL register state in pure integer SQL: hash64 = first 16
            # md5 hex chars (the repo-wide idiom), reg_idx = top 12 bits,
            # rank = 53 - bit_length(low 52 bits) with the rest==0 -> 53
            # sentinel; MAX per register == numpy's np.maximum.at fold
            "WITH h AS (SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16)) "
            "AS UBIGINT) AS hv FROM events), "
            "parts AS (SELECT CAST(hv >> 52 AS BIGINT) AS reg_idx, "
            "CAST(hv & ((CAST(1 AS UBIGINT) << 52) - 1) AS BIGINT) AS rest FROM h) "
            "SELECT reg_idx, MAX(CASE WHEN rest = 0 THEN 53 "
            "ELSE 53 - length(bin(rest)) END) AS reg_rank "
            "FROM parts GROUP BY reg_idx"
        ),
        "cms_table": (
            # the merged Count-Min table: col = hash64('cms{r}|' || token)
            # % 4096 per salt row r, cnt = SUM of occurrences (CMS merge is
            # addition -> COUNT(*) over the exploded tokens)
            "WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents), "
            "t AS (SELECT tok FROM toks WHERE tok <> ''), "
            "cells AS (SELECT s.row_idx, "
            "CAST(CAST(('0x' || substr(md5(s.salt || t.tok), 1, 16)) AS UBIGINT) "
            "% 4096 AS BIGINT) AS col_idx "
            "FROM t CROSS JOIN (VALUES (0, 'cms0|'), (1, 'cms1|'), (2, 'cms2|'), "
            "(3, 'cms3|')) s(row_idx, salt)) "
            "SELECT CAST(row_idx AS BIGINT) AS row_idx, col_idx, "
            "COUNT(*) AS cnt FROM cells GROUP BY row_idx, col_idx"
        ),
        "approx_token_counts": (
            # full SQL oracle (not a pin): the merged CMS table is
            # re-derived exactly as in cms_table, the exact top-20 token
            # list exactly as in top_tokens (count desc, token asc), and
            # the estimate is the integer MIN over the 4 salt rows'
            # cells — sketches.cms_estimate is pure integer arithmetic,
            # so the whole sketch (state + estimator head) hash-verifies
            "WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents), "
            "t AS (SELECT tok FROM toks WHERE tok <> ''), "
            "topk AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY tok "
            "ORDER BY n DESC, tok LIMIT 20), "
            "cells AS (SELECT s.row_idx, "
            "CAST(CAST(('0x' || substr(md5(s.salt || t.tok), 1, 16)) AS UBIGINT) "
            "% 4096 AS BIGINT) AS col_idx "
            "FROM t CROSS JOIN (VALUES (0, 'cms0|'), (1, 'cms1|'), (2, 'cms2|'), "
            "(3, 'cms3|')) s(row_idx, salt)), "
            "tab AS (SELECT row_idx, col_idx, COUNT(*) AS cnt FROM cells "
            "GROUP BY row_idx, col_idx), "
            "q AS (SELECT k.tok AS token, s.row_idx, "
            "CAST(CAST(('0x' || substr(md5(s.salt || k.tok), 1, 16)) AS UBIGINT) "
            "% 4096 AS BIGINT) AS col_idx "
            "FROM topk k CROSS JOIN (VALUES (0, 'cms0|'), (1, 'cms1|'), (2, 'cms2|'), "
            "(3, 'cms3|')) s(row_idx, salt)) "
            # inner join is safe: the token itself hashed into each cell,
            # so every probed cell is non-zero and present in tab
            "SELECT q.token, CAST(MIN(tab.cnt) AS BIGINT) AS n_est FROM q "
            "JOIN tab ON q.row_idx = tab.row_idx AND q.col_idx = tab.col_idx "
            "GROUP BY q.token"
        ),
        "approx_distinct_users": (
            # full SQL oracle for the HLL ESTIMATE (the registers were
            # already verified via hll_registers): the harmonic
            # denominator sum(2^-rank) is scaled by 2^53 into the exact
            # HUGEINT S = sum(2^(53-rank)) (zero registers contribute
            # 2^53 each), exactly as sketches.hll_estimate computes it,
            # then ONE double division + the linear-counting branch —
            # every float op is single-IEEE and mirrored in order, so the
            # rounded integer matches bit-for-bit (ln() resolves to the
            # same libm double on both sides; rehearsal-verified)
            "WITH h AS (SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16)) "
            "AS UBIGINT) AS hv FROM events), "
            "parts AS (SELECT CAST(hv >> 52 AS BIGINT) AS reg_idx, "
            "CAST(hv & ((CAST(1 AS UBIGINT) << 52) - 1) AS BIGINT) AS rest FROM h), "
            "regs AS (SELECT reg_idx, MAX(CASE WHEN rest = 0 THEN 53 "
            "ELSE 53 - length(bin(rest)) END) AS r FROM parts GROUP BY reg_idx), "
            "agg AS (SELECT SUM(CAST(POW(2.0, 53 - r) AS HUGEINT)) AS s_nz, "
            "COUNT(*) AS n_nz FROM regs), "
            "st AS (SELECT s_nz + (4096 - n_nz) * CAST(9007199254740992 AS HUGEINT) AS s, "
            "4096 - n_nz AS v FROM agg), "
            "e AS (SELECT 0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096 "
            "* 9007199254740992.0 / CAST(s AS DOUBLE) AS est, v FROM st) "
            "SELECT CAST(FLOOR(CASE WHEN est <= 10240.0 AND v > 0 "
            "THEN 4096 * ln(4096 / v) ELSE est END + 0.5) AS BIGINT) "
            "AS n_distinct_est FROM e"
        ),
        "source_distinct_shingles": (
            # grouped HLL: the approx_distinct_users HUGEINT + one-double-
            # division estimator head, GROUP BY source, over md5-hash64s
            # of the _SHINGLES_CTE shingle strings —
            # pipelines.sketches.source_distinct_shingles
            "WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws "
            "FROM documents), "
            "sh AS (SELECT doc_id, source, CASE WHEN len(ws) < 3 "
            "THEN [array_to_string(ws, ' ')] "
            "ELSE list_distinct(list_transform(range(1, len(ws) - 1), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s FROM d), "
            "e AS (SELECT source, unnest(s) AS g FROM sh), "
            "h AS (SELECT source, CAST(('0x' || substr(md5(g), 1, 16)) "
            "AS UBIGINT) AS hv FROM e), "
            "parts AS (SELECT source, CAST(hv >> 52 AS BIGINT) AS reg_idx, "
            "CAST(hv & ((CAST(1 AS UBIGINT) << 52) - 1) AS BIGINT) AS rest FROM h), "
            "regs AS (SELECT source, reg_idx, MAX(CASE WHEN rest = 0 THEN 53 "
            "ELSE 53 - length(bin(rest)) END) AS r FROM parts "
            "GROUP BY source, reg_idx), "
            "agg AS (SELECT source, SUM(CAST(POW(2.0, 53 - r) AS HUGEINT)) AS s_nz, "
            "COUNT(*) AS n_nz FROM regs GROUP BY source), "
            "st AS (SELECT source, s_nz + (4096 - n_nz) * "
            "CAST(9007199254740992 AS HUGEINT) AS s, 4096 - n_nz AS v FROM agg), "
            "e2 AS (SELECT source, 0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096 "
            "* 9007199254740992.0 / CAST(s AS DOUBLE) AS est, v FROM st) "
            "SELECT source, CAST(FLOOR(CASE WHEN est <= 10240.0 AND v > 0 "
            "THEN 4096 * ln(4096 / v) ELSE est END + 0.5) AS BIGINT) "
            "AS n_shingles_est FROM e2"
        ),
        "decontaminate_bloom": _bloom_probe_sql(),
        # stored-bitmap probe == the in-flight build (deterministic
        # bloom), so it shares the same oracle
        "decontaminate_bloom_indexed": _bloom_probe_sql(),
        "approx_price_quantiles": (
            # identical integer bucketing: length(bin(c)) == bit_length,
            # >> and the 64*s offset mirror sketches._log_buckets exactly
            "WITH v AS (SELECT CAST(FLOOR(p_retailprice*100+0.5) AS BIGINT) AS c FROM part), "
            "b AS (SELECT c, length(bin(c)) AS L FROM v), "
            "k AS (SELECT CASE WHEN c < 128 THEN c "
            "ELSE (c >> (L-7)) + 64*(L-7) END AS bucket FROM b), "
            "h AS (SELECT bucket, COUNT(*) AS n FROM k GROUP BY bucket), "
            "cum AS (SELECT bucket, SUM(n) OVER (ORDER BY bucket) AS cn FROM h), "
            "t AS (SELECT COUNT(*) AS cnt FROM v), "
            "p AS (SELECT unnest([25, 50, 75, 90]) AS pct), "
            "sel AS (SELECT p.pct AS pct, MIN(c2.bucket) AS bucket "
            "FROM p CROSS JOIN t JOIN cum c2 ON c2.cn >= (p.pct*t.cnt+99)//100 "
            "GROUP BY p.pct) "
            "SELECT CAST(pct AS BIGINT) AS pct, "
            "CAST(CASE WHEN bucket < 128 THEN bucket "
            "ELSE (((bucket - 64*(bucket//64 - 1)) + 1) << (bucket//64 - 1)) - 1 "
            "END AS BIGINT) AS value_cents_ub FROM sel"
        ),
        "price_quantiles": (
            # rank contract shared with pipelines.relational.price_quantiles:
            # value of 1-indexed rank (pct*n + 99) // 100 == ceil(q*n), i.e.
            # quantile_disc semantics in exact integer arithmetic
            "WITH c AS (SELECT CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS cents "
            "FROM lineitem), "
            "s AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c), "
            "n AS (SELECT COUNT(*) AS cnt FROM c), "
            "p AS (SELECT CAST(unnest([25,50,75,90,99]) AS BIGINT) AS pct) "
            "SELECT p.pct AS pct, s.cents AS value_cents "
            "FROM p CROSS JOIN n JOIN s ON s.rn = (p.pct * n.cnt + 99) // 100"
        ),
        "doc_fingerprints": "SELECT doc_id, md5(text) AS fp FROM documents",
        "dedup_exact": (
            "SELECT doc_id, fp FROM ("
            "SELECT doc_id, md5(text) AS fp, "
            "ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn "
            "FROM documents) WHERE rn = 1"
        ),
        "clean_doc_lengths": (
            "SELECT doc_id, CAST(length(trim(replace(replace(replace(replace(replace("
            "text, chr(1), ''), chr(160), ''), chr(10), ''), chr(9), ''), chr(13), '')))"
            " AS BIGINT) AS clean_len FROM documents"
        ),
        "dirty_word_filter": (
            "SELECT doc_id FROM documents "
            "WHERE text NOT LIKE '%drop%' AND text NOT LIKE '%null%'"
        ),
        "token_stats": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
            f"CAST(len(list_filter(string_split(text, ' '), x -> x IN ({stop}))) AS BIGINT) AS n_stop "
            "FROM documents"
        ),
        "tokens_by_lang": (
            "SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens, "
            "COUNT(*) AS n_docs FROM documents GROUP BY lang"
        ),
        "quality_scores": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
            "CAST(length(replace(text, ' ', '')) * 100 // "
            "GREATEST(len(string_split(text, ' ')), 1) AS BIGINT) AS mean_tok_len_x100, "
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha "
            "FROM documents"
        ),
        "sq8_quantize": (
            # single-IEEE-op mirror of pipelines.vectors.sq8_quantize
            "WITH e AS (SELECT vec_id, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS xs FROM embeddings), "
            "s AS (SELECT vec_id, xs, "
            "list_max(list_transform(xs, x -> abs(x))) / 127.0 AS sc FROM e), "
            "g AS (SELECT vec_id, sc, CASE WHEN sc = 0 THEN 1.0 ELSE sc END AS safe, "
            "xs FROM s), "
            "q AS (SELECT vec_id, sc, list_transform(xs, x -> GREATEST(-127.0, "
            "LEAST(127.0, FLOOR(x / safe + 0.5)))) AS qs FROM g) "
            "SELECT vec_id, CAST(list_sum(qs) AS BIGINT) AS qsum, "
            "CAST(list_sum(list_transform(qs, v -> v * v)) AS BIGINT) AS qnorm, "
            "CAST(FLOOR(sc * 1e9 + 0.5) AS BIGINT) AS scale_x1e9 FROM q"
        ),
        "embedding_norms": (
            "SELECT vec_id, CAST(ROUND(sqrt(list_sum(list_transform(embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1e6) AS BIGINT) AS norm_x1e6 "
            "FROM embeddings"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 8), scored AS ("
            "SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.embedding, e.embedding) AS sim "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id) "
            "SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM ("
            "SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM scored) "
            "WHERE rank <= 5"
        ),
        "cosine_dup_pairs": (
            "SELECT a.vec_id AS a, b.vec_id AS b FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.45"
        ),
        "lang_centroids": (
            # per-dim sums via a 64-way range join; addition order differs
            # from the engine's batch partials but the x1e6 quantization
            # absorbs the ~1e-13 float noise (same contract as knn_graph)
            "WITH j AS (SELECT d.lang AS lang, list_transform(e.embedding, "
            "x -> CAST(x AS DOUBLE)) AS v FROM documents d "
            "JOIN embeddings e ON e.vec_id = d.doc_id), "
            "s AS (SELECT lang, r.i AS i, SUM(v[r.i + 1]) AS sv, COUNT(*) AS n "
            "FROM j, range(64) r(i) GROUP BY lang, r.i) "
            "SELECT lang, CAST(MIN(n) AS BIGINT) AS n_docs, "
            "CAST(FLOOR(sqrt(SUM((sv / n) * (sv / n))) * 1e6 + 0.5) AS BIGINT) "
            "AS centroid_norm_x1e6 FROM s GROUP BY lang"
        ),
        "embedding_outliers": (
            # exact-integer mirror of pipelines.vectors.embedding_outliers:
            # floor(x*2^16 + 0.5) lattice, per-label HUGEINT component
            # sums, centroid = FLOOR division (trunc-div corrected on
            # negative sums to match Python //), squared-L2 rank desc.
            # No float anywhere, so the hash match is exact by
            # construction, not by quantization headroom.
            "WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label, "
            "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) "
            "* 65536.0 + 0.5) AS BIGINT)) AS q FROM embeddings), "
            "u AS (SELECT vec_id, label, generate_subscripts(q, 1) AS i, "
            "unnest(q) AS qx FROM e), "
            "c AS (SELECT label, i, SUM(qx) AS s, COUNT(*) AS n "
            "FROM u GROUP BY label, i), "
            "cf AS (SELECT label, i, CAST(s // n - CASE WHEN s % n <> 0 "
            "AND s < 0 THEN 1 ELSE 0 END AS BIGINT) AS ci FROM c), "
            "d AS (SELECT u.vec_id, u.label, CAST(SUM((u.qx - cf.ci) * "
            "(u.qx - cf.ci)) AS BIGINT) AS d2 FROM u JOIN cf "
            "ON u.label = cf.label AND u.i = cf.i GROUP BY u.vec_id, u.label) "
            "SELECT label, vec_id, d2, rank FROM (SELECT label, vec_id, d2, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY label "
            "ORDER BY d2 DESC, vec_id) AS BIGINT) AS rank FROM d) "
            "WHERE rank <= 10"
        ),
        "label_centroid_sim": (
            # cosine is scale-invariant: run it on the RAW per-label
            # lattice sums (exact HUGEINT dot/norms — same bigints as the
            # engine driver merge); float enters only in the final
            # dot/sqrt(na*nb), the identical IEEE expression, x1e6
            "WITH e AS (SELECT CAST(label AS BIGINT) AS label, "
            "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) "
            "* 65536.0 + 0.5) AS BIGINT)) AS q FROM embeddings), "
            "u AS (SELECT label, generate_subscripts(q, 1) AS i, "
            "unnest(q) AS qx FROM e), "
            "c AS (SELECT label, i, SUM(qx) AS s FROM u GROUP BY label, i), "
            "p AS (SELECT a.label AS label_a, b.label AS label_b, "
            "SUM(a.s * b.s) AS dot FROM c a JOIN c b ON a.i = b.i "
            "AND a.label < b.label GROUP BY a.label, b.label), "
            "nn AS (SELECT label, SUM(s * s) AS nsq FROM c GROUP BY label) "
            "SELECT p.label_a, p.label_b, CAST(FLOOR(CAST(p.dot AS DOUBLE) "
            "/ SQRT(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE)) "
            "* 1000000 + 0.5) AS BIGINT) AS sim_x1m FROM p "
            "JOIN nn na ON p.label_a = na.label "
            "JOIN nn nb ON p.label_b = nb.label"
        ),
        "semantic_dedup": (
            # survivors = min vec_id per connected component of the exact
            # cosine near-dup graph — same recursive min-label propagation
            # as the dedup_minhash oracle
            "WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
            "pairs AS (SELECT a.vec_id AS a, b.vec_id AS b FROM e a "
            "JOIN e b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.v, b.v) > 0.45), "
            "edges AS (SELECT a AS u, b AS v FROM pairs "
            "UNION SELECT b, a FROM pairs), "
            "cc(node, lbl) AS (SELECT vec_id, vec_id FROM embeddings "
            "UNION SELECT e2.v, cc.lbl FROM cc JOIN edges e2 ON cc.node = e2.u), "
            "m AS (SELECT node, MIN(lbl) AS lbl FROM cc GROUP BY node) "
            "SELECT DISTINCT lbl AS vec_id FROM m"
        ),
        "knn_graph": _knn_graph_sql(3),
        "knn_label_agreement": (
            # majority label among the k=5 exact neighbors vs own label;
            # vote ties: count desc, then smallest label — mirrors
            # pipelines.vectors.knn_label_agreement
            f"WITH nn AS ({_knn_graph_sql(5)}), "
            "lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label "
            "FROM embeddings), "
            "v AS (SELECT nn.vec_id, l.label AS nbr_label, COUNT(*) AS c "
            "FROM nn JOIN lab l ON l.vec_id = nn.neighbor_id GROUP BY 1, 2), "
            "p AS (SELECT vec_id, nbr_label AS pred, ROW_NUMBER() OVER ("
            "PARTITION BY vec_id ORDER BY c DESC, nbr_label) AS rn FROM v) "
            "SELECT p.vec_id, lab.label, p.pred, "
            "CAST(lab.label = p.pred AS BIGINT) AS agree "
            "FROM p JOIN lab ON lab.vec_id = p.vec_id WHERE rn = 1"
        ),
        # -- round-2 oracles for previously no_oracle queries ---------------
        "lang_id": _lang_id_sql(),
        "simhash": f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM sim",
        "simhash_near_dups": (
            # banding with 4 x 16-bit bands is EXACT for hamming <= 3 (pytest
            # proves it), so the engine's banded output equals brute force
            f"WITH {_SIMHASH_CTE} "
            "SELECT a.doc_id AS a, b.doc_id AS b FROM sim a JOIN sim b "
            "ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
        ),
        "simhash_eval": (
            # confusion counts of the simhash detector vs exact Jaccard
            # gold; x1m ratios are one double division, identical IEEE
            # expression both sides — pipelines.text.simhash_eval
            f"WITH {_SHINGLES_CTE}, {_JACCARD_PAIRS}, {_SIMHASH_CTE}, "
            "sp AS (SELECT a.doc_id AS a, b.doc_id AS b FROM sim a "
            "JOIN sim b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3), "
            "ep AS (SELECT a, b FROM pairs), "
            "c AS (SELECT "
            "CAST((SELECT COUNT(*) FROM sp s JOIN ep e "
            "ON s.a = e.a AND s.b = e.b) AS BIGINT) AS tp, "
            "CAST((SELECT COUNT(*) FROM sp s ANTI JOIN ep e "
            "ON s.a = e.a AND s.b = e.b) AS BIGINT) AS fp, "
            "CAST((SELECT COUNT(*) FROM ep e ANTI JOIN sp s "
            "ON s.a = e.a AND s.b = e.b) AS BIGINT) AS fn) "
            "SELECT tp, fp, fn, "
            "CASE WHEN tp + fp = 0 THEN 0 ELSE CAST(FLOOR(CAST(tp AS DOUBLE) "
            "/ (tp + fp) * 1000000 + 0.5) AS BIGINT) END AS precision_x1m, "
            "CASE WHEN tp + fn = 0 THEN 0 ELSE CAST(FLOOR(CAST(tp AS DOUBLE) "
            "/ (tp + fn) * 1000000 + 0.5) AS BIGINT) END AS recall_x1m "
            "FROM c"
        ),
        "source_overlap": (
            # exact per-source distinct shingle sets -> pairwise
            # intersection/union counts, pure integers —
            # pipelines.text.source_overlap
            f"WITH {_SHINGLES_CTE}, "
            "g AS (SELECT DISTINCT doc.source AS source, u.gram AS gram "
            "FROM (SELECT doc_id, unnest(s) AS gram FROM sh) u "
            "JOIN documents doc ON u.doc_id = doc.doc_id), "
            "n AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source), "
            "p AS (SELECT a.source AS source_a, b.source AS source_b, "
            "CAST(COUNT(*) AS BIGINT) AS inter FROM g a JOIN g b "
            "ON a.gram = b.gram AND a.source < b.source GROUP BY 1, 2) "
            "SELECT p.source_a, p.source_b, p.inter, "
            "CAST(na.n + nb.n - p.inter AS BIGINT) AS union_sz FROM p "
            "JOIN n na ON p.source_a = na.source "
            "JOIN n nb ON p.source_b = nb.source"
        ),
        "data_splits": (
            # hash_sample md5-prefix arithmetic, 80/10/10 thresholds —
            # pipelines.text.data_splits
            "WITH t AS (SELECT source, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            "AS UBIGINT) AS pri, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS toks "
            "FROM documents) "
            f"SELECT CASE WHEN pri < {(80 << 32) // 100} THEN 'train' "
            f"WHEN pri < {(90 << 32) // 100} THEN 'val' ELSE 'test' END "
            "AS split, source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(toks) AS BIGINT) AS n_tokens FROM t GROUP BY 1, 2"
        ),
        "minhash_pairs": (
            f"WITH {_SHINGLES_CTE}, {_JACCARD_PAIRS} "
            "SELECT a, b, CAST(FLOOR(j * 10000 + 0.5) AS BIGINT) AS jaccard_x10k "
            "FROM pairs"
        ),
        "dedup_minhash": (
            # survivors = min doc_id per connected component of the verified
            # pair graph — recursive min-label propagation in SQL
            f"WITH RECURSIVE {_SHINGLES_CTE}, {_JACCARD_PAIRS}, "
            "edges AS (SELECT a AS u, b AS v FROM pairs "
            "UNION SELECT b, a FROM pairs), "
            "cc(node, lbl) AS (SELECT doc_id, doc_id FROM documents "
            "UNION SELECT e.v, cc.lbl FROM cc JOIN edges e ON cc.node = e.u), "
            "m AS (SELECT node, MIN(lbl) AS lbl FROM cc GROUP BY node) "
            "SELECT DISTINCT lbl AS doc_id FROM m"
        ),
        "incremental_dedup_minhash": (
            # dedup_minhash's component labels + the hash_sample md5 split:
            # all-new components admit their min node, base-touched none
            f"WITH RECURSIVE {_SHINGLES_CTE}, {_JACCARD_PAIRS}, "
            "edges AS (SELECT a AS u, b AS v FROM pairs "
            "UNION SELECT b, a FROM pairs), "
            "cc(node, lbl) AS (SELECT doc_id, doc_id FROM documents "
            "UNION SELECT e.v, cc.lbl FROM cc JOIN edges e ON cc.node = e.u), "
            "m AS (SELECT node, MIN(lbl) AS lbl FROM cc GROUP BY node), "
            "s AS (SELECT node, lbl, "
            "CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 8)) "
            f"AS UBIGINT) >= {(50 << 32) // 100} AS is_new FROM m), "
            "bc AS (SELECT DISTINCT lbl FROM s WHERE NOT is_new) "
            "SELECT CAST(MIN(node) AS BIGINT) AS doc_id, "
            "CAST(lbl AS BIGINT) AS cluster_id FROM s "
            "WHERE is_new AND lbl NOT IN (SELECT lbl FROM bc) GROUP BY lbl"
        ),
        "minhash_clusters": (
            # same recursive component labels, every node kept
            f"WITH RECURSIVE {_SHINGLES_CTE}, {_JACCARD_PAIRS}, "
            "edges AS (SELECT a AS u, b AS v FROM pairs "
            "UNION SELECT b, a FROM pairs), "
            "cc(node, lbl) AS (SELECT doc_id, doc_id FROM documents "
            "UNION SELECT e.v, cc.lbl FROM cc JOIN edges e ON cc.node = e.u) "
            "SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id "
            "FROM cc GROUP BY node"
        ),
        "ngram_novelty": (
            # per-NEW-doc distinct-shingle novelty vs the base split's
            # shingle-type union; same md5-split arithmetic as
            # hash_sample — pipelines.text.ngram_novelty
            f"WITH {_SHINGLES_CTE}, "
            "t AS (SELECT doc_id, s, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            f"AS UBIGINT) >= {(50 << 32) // 100} AS is_new FROM sh), "
            "e AS (SELECT doc_id, is_new, unnest(s) AS g FROM t), "
            "base AS (SELECT DISTINCT g FROM e WHERE NOT is_new), "
            "nw AS (SELECT e.doc_id, CASE WHEN base.g IS NULL THEN 1 "
            "ELSE 0 END AS nov FROM e LEFT JOIN base ON e.g = base.g "
            "WHERE e.is_new) "
            "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles, "
            "CAST(SUM(nov) AS BIGINT) AS n_novel, "
            "CAST((1000000 * SUM(nov)) // COUNT(*) AS BIGINT) "
            "AS novelty_x1m FROM nw GROUP BY doc_id"
        ),
        "source_novelty": (
            # per-source mean of the per-doc floor-quantized novelty
            # scores (composes the ngram_novelty contract exactly) —
            # pipelines.text.source_novelty
            f"WITH {_SHINGLES_CTE}, "
            "t AS (SELECT doc_id, s, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            f"AS UBIGINT) >= {(50 << 32) // 100} AS is_new FROM sh), "
            "e AS (SELECT doc_id, is_new, unnest(s) AS g FROM t), "
            "base AS (SELECT DISTINCT g FROM e WHERE NOT is_new), "
            "nw AS (SELECT e.doc_id, CASE WHEN base.g IS NULL THEN 1 "
            "ELSE 0 END AS nov FROM e LEFT JOIN base ON e.g = base.g "
            "WHERE e.is_new), "
            "sc AS (SELECT doc_id, (1000000 * SUM(nov)) // COUNT(*) "
            "AS novx FROM nw GROUP BY doc_id) "
            "SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_new_docs, "
            "CAST(SUM(sc.novx) // COUNT(*) AS BIGINT) AS mean_novelty_x1m "
            "FROM sc JOIN documents d USING (doc_id) GROUP BY d.source "
            "ORDER BY d.source"
        ),
        "source_dup_rates": (
            # exact dups = non-first doc of an md5(text) group; near
            # dups = non-min members of the recursive verified-pair
            # components — pipelines.text.source_dup_rates
            f"WITH RECURSIVE {_SHINGLES_CTE}, {_JACCARD_PAIRS}, "
            "edges AS (SELECT a AS u, b AS v FROM pairs "
            "UNION SELECT b, a FROM pairs), "
            "cc(node, lbl) AS (SELECT doc_id, doc_id FROM documents "
            "UNION SELECT e.v, cc.lbl FROM cc JOIN edges e ON cc.node = e.u), "
            "m AS (SELECT node, MIN(lbl) AS lbl FROM cc GROUP BY node), "
            "nd AS (SELECT node AS doc_id FROM m WHERE lbl != node), "
            "ex AS (SELECT doc_id FROM (SELECT doc_id, ROW_NUMBER() OVER "
            "(PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents) "
            "WHERE rn > 1), "
            "agg AS (SELECT d.source, COUNT(*) AS n_docs, "
            "SUM(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS ne, "
            "SUM(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS nn "
            "FROM documents d LEFT JOIN ex ON d.doc_id = ex.doc_id "
            "LEFT JOIN nd ON d.doc_id = nd.doc_id GROUP BY d.source) "
            "SELECT source, CAST(n_docs AS BIGINT) AS n_docs, "
            "CAST(ne AS BIGINT) AS n_exact_dups, "
            "CAST(nn AS BIGINT) AS n_near_dups, "
            "CAST((1000000 * ne) // n_docs AS BIGINT) AS exact_x1m, "
            "CAST((1000000 * nn) // n_docs AS BIGINT) AS near_x1m "
            "FROM agg"
        ),
        "dup_cluster_sizes": (
            # cluster-size histogram over the same recursive component
            # labels — pipelines.text.dup_cluster_sizes
            f"WITH RECURSIVE {_SHINGLES_CTE}, {_JACCARD_PAIRS}, "
            "edges AS (SELECT a AS u, b AS v FROM pairs "
            "UNION SELECT b, a FROM pairs), "
            "cc(node, lbl) AS (SELECT doc_id, doc_id FROM documents "
            "UNION SELECT e.v, cc.lbl FROM cc JOIN edges e ON cc.node = e.u), "
            "m AS (SELECT node, MIN(lbl) AS lbl FROM cc GROUP BY node), "
            "s AS (SELECT lbl, COUNT(*) AS sz FROM m GROUP BY lbl) "
            'SELECT CAST(sz AS BIGINT) AS "size", '
            "CAST(COUNT(*) AS BIGINT) AS n_clusters FROM s GROUP BY sz"
        ),
        "unigram_quality": (
            # floor(log2(count)) = length(bin(c)) - 1: same integer
            # arithmetic as the engine's frexp bit-length
            "WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
            "x -> x != '')) AS tok FROM documents), "
            "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok), "
            "ct AS (SELECT tok, SUM(tf) AS c FROM tf GROUP BY tok) "
            "SELECT tf.doc_id, "
            "CAST(SUM(tf.tf * (length(bin(ct.c)) - 1)) AS BIGINT) AS logcount2_sum, "
            "CAST(SUM(tf.tf) AS BIGINT) AS n_tokens "
            "FROM tf JOIN ct USING (tok) GROUP BY tf.doc_id"
        ),
        "pagerank": __import__(
            "spiderman_ray.pipelines.graph", fromlist=["x"]
        ).pagerank_oracle_sql(),
        "triangle_counts": __import__(
            "spiderman_ray.pipelines.graph", fromlist=["x"]
        ).triangle_counts_oracle_sql(),
        "connected_components": __import__(
            "spiderman_ray.pipelines.graph", fromlist=["x"]
        ).connected_components_oracle_sql(),
        "sssp": __import__(
            "spiderman_ray.pipelines.graph", fromlist=["x"]
        ).sssp_oracle_sql(),
        "nb_classify": _nb_sql(),
        "bigram_quality": (
            # pointwise integer log-ratio floor(log2 c(w1,w2)) -
            # floor(log2 C(w1)); bigrams zipped over the FILTERED token
            # list, so adjacency matches the engine's post-filter shift
            "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x != '') AS toks FROM documents), "
            "p AS (SELECT doc_id, unnest(list_zip(toks[1:length(toks)-1], "
            "toks[2:length(toks)])) AS z FROM t), "
            "bf AS (SELECT doc_id, z[1] AS w1, z[2] AS w2, COUNT(*) AS tf "
            "FROM p GROUP BY ALL), "
            "cw AS (SELECT w1, w2, SUM(tf) AS c12 FROM bf GROUP BY w1, w2), "
            "c1 AS (SELECT w1, SUM(tf) AS c1 FROM bf GROUP BY w1) "
            "SELECT bf.doc_id, "
            "CAST(SUM(bf.tf * ((length(bin(cw.c12)) - 1) - "
            "(length(bin(c1.c1)) - 1))) AS BIGINT) AS logratio2_sum, "
            "CAST(SUM(bf.tf) AS BIGINT) AS n_bigrams "
            "FROM bf JOIN cw USING (w1, w2) JOIN c1 USING (w1) "
            "GROUP BY bf.doc_id"
        ),
        "quality_buckets": (
            # per-token integer score over the unigram_quality CTEs, then
            # NTILE(3) over (score desc, doc_id) — identical rank contract
            "WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
            "x -> x != '')) AS tok FROM documents), "
            "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok), "
            "ct AS (SELECT tok, SUM(tf) AS c FROM tf GROUP BY tok), "
            "s AS (SELECT tf.doc_id, "
            "SUM(tf.tf * (length(bin(ct.c)) - 1)) * 1000 // "
            "GREATEST(SUM(tf.tf), 1) AS score FROM tf "
            "JOIN ct USING (tok) GROUP BY tf.doc_id) "
            "SELECT doc_id, CAST(score AS BIGINT) AS score_x1000, "
            "CAST(NTILE(3) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bucket "
            "FROM s"
        ),
        "hash_embed": (
            # bucket = the hash64 md5-prefix arithmetic mod 64; integer
            # checksums of the per-doc bucket-count vector
            "WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
            "x -> x != '')) AS tok FROM documents), "
            "b AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 16)) "
            "AS UBIGINT) % 64 AS bk FROM t), "
            "c AS (SELECT doc_id, bk, COUNT(*) AS c FROM b GROUP BY doc_id, bk), "
            "a AS (SELECT doc_id, COUNT(*) AS nnz, SUM(c) AS bs, "
            "SUM(c * c) AS bss FROM c GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(COALESCE(a.nnz, 0) AS BIGINT) AS nnz, "
            "CAST(COALESCE(a.bs, 0) AS BIGINT) AS bucket_sum, "
            "CAST(COALESCE(a.bss, 0) AS BIGINT) AS bucket_sq_sum "
            "FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id"
        ),
        "shuffle_order": (
            # same md5-prefix uint64 key as functions.hashing.hash64
            "WITH k AS (SELECT doc_id, CAST(('0x' || "
            "substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS key "
            "FROM documents) "
            "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY key, doc_id) - 1 "
            "AS BIGINT) AS pos FROM k"
        ),
        "incremental_dedup": (
            # same md5-split arithmetic as hash_sample (base = hash < 50%);
            # fp membership + first-wins mirror pipelines.text
            "WITH t AS (SELECT doc_id, md5(text) AS fp, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            f"AS UBIGINT) >= {(50 << 32) // 100} AS is_new FROM documents), "
            "old AS (SELECT DISTINCT fp FROM t WHERE NOT is_new), "
            "nw AS (SELECT doc_id, fp, ROW_NUMBER() OVER "
            "(PARTITION BY fp ORDER BY doc_id) AS rn FROM t "
            "WHERE is_new AND fp NOT IN (SELECT fp FROM old)) "
            "SELECT doc_id, fp FROM nw WHERE rn = 1"
        ),
        "incremental_dedup_indexed": (
            # identical contract: the index is a deterministic function of
            # the base split, so the stored-fp path must reproduce the
            # direct path bit-for-bit — same SQL oracle
            "WITH t AS (SELECT doc_id, md5(text) AS fp, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            f"AS UBIGINT) >= {(50 << 32) // 100} AS is_new FROM documents), "
            "old AS (SELECT DISTINCT fp FROM t WHERE NOT is_new), "
            "nw AS (SELECT doc_id, fp, ROW_NUMBER() OVER "
            "(PARTITION BY fp ORDER BY doc_id) AS rn FROM t "
            "WHERE is_new AND fp NOT IN (SELECT fp FROM old)) "
            "SELECT doc_id, fp FROM nw WHERE rn = 1"
        ),
        "domain_quota_sample": (
            # same md5-prefix priority as hash_sample; cap=10 per source
            "SELECT source, doc_id, rank FROM ("
            "SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source "
            "ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            "AS UBIGINT), doc_id) AS rank FROM documents) WHERE rank <= 10"
        ),
        "token_budget_mixture": (
            # per-source running token sum in md5-priority order; keep a
            # doc while the 600-token budget is not yet full when it
            # arrives (cum - n_tokens < budget; 600 genuinely truncates
            # at gate scale) — pipelines.text
            # .token_budget_mixture contract
            "WITH t AS (SELECT source, doc_id, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            "AS UBIGINT) AS pri FROM documents), "
            "w AS (SELECT source, doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri, doc_id) "
            "AS BIGINT) AS rank FROM t) "
            "SELECT source, doc_id, n_tokens, cum_tokens, rank FROM w "
            "WHERE cum_tokens - n_tokens < 600"
        ),
        "mixture_weights": (
            # T5 mixing rule w_s ∝ sqrt(n_s): exact BIGINT token sums per
            # source, then sqrt + one division (both correctly rounded in
            # IEEE 754 on numpy and DuckDB alike), quantized x1e6 —
            # pipelines.text.mixture_weights contract
            "WITH t AS (SELECT source, "
            "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY source), "
            "w AS (SELECT source, n_tokens, "
            "SQRT(CAST(n_tokens AS DOUBLE)) AS sw FROM t) "
            "SELECT source, n_tokens, "
            "CAST(FLOOR(sw / (SELECT SUM(sw) FROM w) * 1000000 + 0.5) "
            "AS BIGINT) AS weight_x1m FROM w"
        ),
        "hash_sample": (
            # same md5-prefix arithmetic as pipelines.text.hash_sample
            "SELECT doc_id, text FROM documents "
            f"WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            f"AS UBIGINT) < {(10 << 32) // 100}"
        ),
        "ngram_jaccard_pairs": (
            # brute-force reference for the engine's inverted-index join;
            # integer (inter, union) columns — no float rounding contract
            f"WITH {_SHINGLES_CTE}, "
            "p AS (SELECT a.doc_id AS a, b.doc_id AS b, "
            "len(list_intersect(a.s, b.s)) AS inter, "
            "len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS union_sz "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) "
            "SELECT a, b, CAST(inter AS BIGINT) AS inter, "
            "CAST(union_sz AS BIGINT) AS union_sz "
            "FROM p WHERE 100 * inter >= 60 * union_sz"
        ),
        "ngram_containment_pairs": (
            # containment inter/min(|A|,|B|): same brute-force shingle
            # sets, integer predicate and floor-division x10k —
            # pipelines.text.ngram_containment_pairs
            f"WITH {_SHINGLES_CTE}, "
            "p AS (SELECT a.doc_id AS a, b.doc_id AS b, "
            "len(list_intersect(a.s, b.s)) AS inter, "
            "LEAST(len(a.s), len(b.s)) AS mn "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) "
            "SELECT a, b, CAST(inter * 10000 // mn AS BIGINT) AS cont_x10k "
            "FROM p WHERE 100 * inter >= 80 * mn"
        ),
        "source_quality_report": (
            # exact BIGINT sums, mean derived by floor division after the
            # aggregate — pipelines.text.source_quality_report
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens, "
            "CAST(SUM(length(text)) AS BIGINT) AS n_chars, "
            "CAST(SUM(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))) "
            "AS BIGINT) AS n_alpha, "
            "CAST(SUM(len(string_split(text, ' '))) * 100 // COUNT(*) "
            "AS BIGINT) AS mean_tokens_x100 "
            "FROM documents GROUP BY source"
        ),
        "length_buckets": (
            # floor(log2(n_tokens)) = length(bin(n)) - 1, the same integer
            # arithmetic as unigram_quality's log-count —
            # pipelines.text.length_buckets
            "SELECT CAST(length(bin(len(string_split(text, ' ')))) - 1 "
            "AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY 1"
        ),
        "pmi_collocations": (
            # integer exp-PMI lift over the bigram event space; adjacency
            # zipped over the FILTERED token list (bigram_quality
            # convention); `//` = the engine's numpy floor division —
            # pipelines.text.pmi_collocations
            "WITH t AS (SELECT list_filter(string_split(text, ' '), "
            "x -> x != '') AS toks FROM documents), "
            "p AS (SELECT unnest(list_zip(toks[1:length(toks)-1], "
            "toks[2:length(toks)])) AS z FROM t), "
            "bf AS (SELECT z[1] AS w1, z[2] AS w2, COUNT(*) AS n_ab "
            "FROM p GROUP BY ALL), "
            "n AS (SELECT SUM(n_ab) AS npairs FROM bf), "
            "c1 AS (SELECT w1, SUM(n_ab) AS n1 FROM bf GROUP BY w1), "
            "c2 AS (SELECT w2, SUM(n_ab) AS n2 FROM bf GROUP BY w2) "
            "SELECT bf.w1, bf.w2, CAST(n_ab AS BIGINT) AS n_ab, "
            "CAST((100 * n_ab * npairs) // (n1 * n2) AS BIGINT) AS lift100 "
            "FROM bf JOIN c1 USING (w1) JOIN c2 USING (w2), n "
            "WHERE n_ab >= 3 "
            "ORDER BY lift100 DESC, w1, w2 LIMIT 50"
        ),
        "vocab_growth": (
            # shingle-type discovery curve: min first-doc per distinct
            # 3-word shingle STRING (engine: the shared set-hash family),
            # bucketed by first_doc // 100 with a cumulative window —
            # pipelines.text.vocab_growth
            f"WITH {_SHINGLES_CTE}, "
            "e AS (SELECT doc_id, unnest(s) AS g FROM sh), "
            "f AS (SELECT g, MIN(doc_id) AS fd FROM e GROUP BY g), "
            "b AS (SELECT fd // 100 AS bucket, COUNT(*) AS nt FROM f "
            "GROUP BY 1) "
            "SELECT CAST(bucket AS BIGINT) AS bucket, "
            "CAST(nt AS BIGINT) AS new_types, "
            "CAST(SUM(nt) OVER (ORDER BY bucket) AS BIGINT) AS cum_types "
            "FROM b ORDER BY bucket"
        ),
        "winnow_fingerprints": _winnow_sql(),
        "winnow_overlap_pairs": _winnow_pairs_sql(),
        "cdc_chunks": _cdc_sql(),
        # first occurrence per fp in global (doc_id, chunk_idx) order
        "cdc_dedup": (
            f"WITH chunks AS ({_cdc_sql()}) "
            "SELECT doc_id, chunk_idx, fp, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY fp "
            "ORDER BY doc_id, chunk_idx) = 1 AS BIGINT) AS is_first "
            "FROM chunks"
        ),
        "decontaminate": _decon_sql(),
        "decontam_bloom_bits": _bloom_bits_sql(),
        "repeated_ngrams": (
            # cross-doc repeated 8-gram spans: string grams == the engine's
            # 64-bit gram hashes up to ~2^-64 collisions (decon contract);
            # positions keep multiplicity (NO list_distinct)
            "WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws "
            "FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(ws) < 8 "
            "THEN [array_to_string(ws, ' ')] "
            "ELSE list_transform(range(1, len(ws) - 6), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] "
            "|| ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || "
            "ws[i+7]) END AS s FROM d), "
            "pos AS (SELECT doc_id, unnest(s) AS g FROM sh), "
            "df AS (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM pos GROUP BY g) "
            "SELECT pos.doc_id, COUNT(*) AS n_rep_positions, "
            "COUNT(DISTINCT pos.g) AS n_rep_grams "
            "FROM pos JOIN df ON pos.g = df.g WHERE df.nd >= 2 "
            "GROUP BY pos.doc_id"
        ),
        "remove_repeated_spans": (
            # span REMOVAL: token j is covered iff a repeated gram starts
            # at i with i <= j < i+8 (short docs carry one whole-text gram
            # at i=1, k >= doc length -> full coverage); kept tokens
            # re-join in position order. Zipped unnest aligns value/index.
            "WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws "
            "FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(ws) < 8 "
            "THEN [array_to_string(ws, ' ')] "
            "ELSE list_transform(range(1, len(ws) - 6), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] "
            "|| ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || "
            "ws[i+7]) END AS s FROM d), "
            "pos AS (SELECT doc_id, unnest(s) AS g, "
            "unnest(range(1, len(s) + 1)) AS i FROM sh), "
            "rep AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd "
            "FROM pos GROUP BY g) WHERE nd >= 2), "
            "starts AS (SELECT DISTINCT pos.doc_id, pos.i FROM pos "
            "JOIN rep USING (g)), "
            "toks AS (SELECT doc_id, unnest(ws) AS w, "
            "unnest(range(1, len(ws) + 1)) AS j FROM d), "
            "cov AS (SELECT DISTINCT t.doc_id, t.j FROM toks t JOIN starts s "
            "ON t.doc_id = s.doc_id AND t.j >= s.i AND t.j < s.i + 8) "
            "SELECT t.doc_id, "
            "COALESCE(string_agg(CASE WHEN c.j IS NULL THEN t.w END, ' ' "
            "ORDER BY t.j), '') AS clean_text, "
            "COUNT(c.j) AS n_removed "
            "FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.j = c.j "
            "GROUP BY t.doc_id"
        ),
        "curate": _curate_sql(),
        "curate_full": (
            # curate + near-dup removal: dominated nodes (lbl < node) of
            # the MinHash-verified component graph, the dedup_minhash CC
            f"WITH RECURSIVE {_SHINGLES_CTE}, {_JACCARD_PAIRS}, "
            "edges AS (SELECT a AS u, b AS v FROM pairs "
            "UNION SELECT b, a FROM pairs), "
            "cc(node, lbl) AS (SELECT doc_id, doc_id FROM documents "
            "UNION SELECT e.v, cc.lbl FROM cc JOIN edges e ON cc.node = e.u), "
            "dom AS (SELECT node FROM (SELECT node, MIN(lbl) AS lbl FROM cc "
            "GROUP BY node) WHERE lbl < node) "
            f"SELECT * FROM ({_curate_sql()}) c "
            "WHERE c.doc_id NOT IN (SELECT node FROM dom)"
        ),
        "tfidf_top_terms": (
            # ranking ratio tf/df is one IEEE division -> bit-identical in
            # numpy and DuckDB; output columns stay integer
            "WITH t AS (SELECT doc_id, tok, COUNT(*) AS tf FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
            "WHERE tok <> '' GROUP BY doc_id, tok), "
            "d AS (SELECT tok, COUNT(*) AS df FROM t GROUP BY tok), "
            "s AS (SELECT t.doc_id, t.tok, t.tf, d.df, "
            "CAST(t.tf AS DOUBLE) / d.df AS r FROM t JOIN d USING (tok)) "
            "SELECT doc_id, tok AS token, CAST(tf AS BIGINT) AS tf, "
            "CAST(df AS BIGINT) AS df FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY r DESC, tok) AS rn FROM s) WHERE rn = 1"
        ),
        "doc_chunks": (
            # chunk-count contract: max(1, ceil((n-64)/48)+1); slice is
            # 1-based inclusive in DuckDB -> [s*48+1 : s*48+64]
            "WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws, "
            "len(string_split(text, ' ')) AS n FROM documents), "
            "c AS (SELECT doc_id, ws, n, unnest(range(0, CAST(GREATEST(1, "
            "CASE WHEN n > 64 THEN ceil((n - 64) / 48.0) + 1 ELSE 1 END) AS BIGINT))) AS i "
            "FROM d) "
            "SELECT doc_id, i AS chunk_idx, "
            "CAST(len(ws[CAST(i*48+1 AS INT):CAST(i*48+64 AS INT)]) AS BIGINT) AS n_tokens, "
            "md5(array_to_string(ws[CAST(i*48+1 AS INT):CAST(i*48+64 AS INT)], ' ')) AS chunk_md5 "
            "FROM c"
        ),
        "pattern_counts": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers, "
            "CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT) AS n_caps, "
            "CAST(len(regexp_extract_all(text, 'http[^ ]+')) AS BIGINT) AS n_urls "
            "FROM documents"
        ),
        "gopher_rules": (
            # Gopher doc-level quality bitmask — pure integer list-kernel
            # arithmetic (positive // on both sides) —
            # pipelines.recipes.gopher_rules
            "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x != '') AS ws FROM documents), "
            "s AS (SELECT doc_id, len(ws) AS nw, "
            "CASE WHEN len(ws) = 0 THEN 0 ELSE "
            "(100 * list_sum(list_transform(ws, w -> len(w)))) // len(ws) END "
            "AS mean_x100, "
            "len(list_intersect(list_distinct(ws), "
            "['the','and','of','a','in','to','is'])) AS nstop, "
            "CASE WHEN len(ws) = 0 THEN 0 ELSE "
            "(100 * len(list_distinct(ws))) // len(ws) END AS dr, "
            "CASE WHEN len(ws) = 0 THEN 0 ELSE "
            "list_max(list_transform(ws, w -> len(w))) END AS mx FROM d), "
            "m AS (SELECT doc_id, nw, mean_x100, "
            "(CASE WHEN nw >= 30 AND nw <= 100000 THEN 1 ELSE 0 END "
            "+ CASE WHEN mean_x100 >= 380 AND mean_x100 <= 460 THEN 2 ELSE 0 END "
            "+ CASE WHEN nstop >= 2 THEN 4 ELSE 0 END "
            "+ CASE WHEN dr >= 40 THEN 8 ELSE 0 END "
            "+ CASE WHEN mx <= 25 AND nw > 0 THEN 16 ELSE 0 END) AS rule_mask "
            "FROM s) "
            "SELECT doc_id, CAST(nw AS BIGINT) AS n_words, "
            "CAST(mean_x100 AS BIGINT) AS mean_wlen_x100, "
            "CAST(rule_mask AS BIGINT) AS rule_mask, "
            "CAST(CASE WHEN rule_mask = 31 THEN 1 ELSE 0 END AS BIGINT) "
            "AS passes FROM m"
        ),
        "c4_line_filter": (
            # C4 line rules applied to the REAL synthesized line strings
            # (right(lt,1)='.'), not the arithmetic that seeded them —
            # pipelines.recipes.c4_line_filter
            f"WITH {_RECIPE_LINES_CTE}, "
            "k AS (SELECT doc_id, COUNT(*) AS n_lines, "
            "SUM(CASE WHEN right(lt, 1) = '.' AND lnw >= 5 THEN 1 ELSE 0 END) "
            "AS n_kept, "
            "SUM(CASE WHEN right(lt, 1) = '.' AND lnw >= 5 THEN lnw ELSE 0 END) "
            "AS kept_words FROM lines GROUP BY doc_id) "
            "SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, "
            "CAST(n_kept AS BIGINT) AS n_kept, "
            "CAST(kept_words AS BIGINT) AS kept_words, "
            "CAST(CASE WHEN n_kept >= 3 THEN 1 ELSE 0 END AS BIGINT) "
            "AS doc_kept FROM k"
        ),
        "paragraph_dedup": (
            # global first-occurrence (by doc_id, line_idx) of each exact
            # line text == the engine's 64-bit line-fp winner mark —
            # pipelines.recipes.paragraph_dedup
            f"WITH {_RECIPE_LINES_CTE}, "
            "w AS (SELECT doc_id, line_idx, "
            "CASE WHEN ROW_NUMBER() OVER (PARTITION BY lt "
            "ORDER BY doc_id, line_idx) = 1 THEN 1 ELSE 0 END AS kept "
            "FROM lines) "
            "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines, "
            "CAST(SUM(kept) AS BIGINT) AS n_kept, "
            "CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped "
            "FROM w GROUP BY doc_id"
        ),
        "ccnet_ppl_buckets": (
            # add-one unigram LM on the md5-split target docs; per-token
            # cost floor(1e6*ln(denom/(c+1))) is a positive integer formed
            # from ONE double division + libm ln on both sides (the HLL
            # ln-parity precedent) — pipelines.recipes.ccnet_ppl_buckets
            "WITH toks AS (SELECT doc_id, "
            "unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w "
            "FROM documents), "
            "tgt AS (SELECT w, COUNT(*) AS c FROM toks "
            "WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            f"AS UBIGINT) < {(20 << 32) // 100} GROUP BY w), "
            "dn AS (SELECT CAST(SUM(c) + COUNT(*) AS DOUBLE) AS denom FROM tgt), "
            "sc AS (SELECT t.doc_id, "
            "CAST(FLOOR(ln(dn.denom / (COALESCE(g.c, 0) + 1)) * 1000000.0) "
            "AS BIGINT) AS cost "
            "FROM toks t LEFT JOIN tgt g ON t.w = g.w CROSS JOIN dn), "
            "pd AS (SELECT doc_id, COUNT(*) AS n, SUM(cost) AS nll "
            "FROM sc GROUP BY doc_id) "
            "SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, "
            "CAST(nll // n AS BIGINT) AS nll_avg, "
            "CASE WHEN nll // n < 3402000 THEN 'head' "
            "WHEN nll // n < 3410000 THEN 'middle' ELSE 'tail' END AS bucket "
            "FROM pd"
        ),
        "dsir_select": (
            # DSIR lambda table over the full 4096-bucket lattice
            # (zero-count buckets still score); ratio formed as DOUBLE
            # division of exact integer products, floor(ln()*1e6) parity
            # as above — pipelines.recipes.dsir_select
            "WITH d AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x != '') AS ws, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            f"AS UBIGINT) < {(20 << 32) // 100} AS is_t FROM documents), "
            "g AS (SELECT doc_id, is_t, unnest(ws || "
            "CASE WHEN len(ws) < 2 THEN [] ELSE "
            "list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) "
            "END) AS gram FROM d), "
            "f AS (SELECT doc_id, is_t, "
            "CAST(CAST(('0x' || substr(md5(gram), 1, 16)) AS UBIGINT) "
            "% 4096 AS BIGINT) AS b FROM g), "
            "cnt AS (SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct, "
            "SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr FROM f GROUP BY b), "
            "tot AS (SELECT SUM(ct) + 4096 AS dt, SUM(cr) + 4096 AS dr FROM cnt), "
            "lam AS (SELECT r.b, "
            "CAST(FLOOR(ln(CAST((COALESCE(cnt.ct,0)+1) * tot.dr AS DOUBLE) "
            "/ CAST((COALESCE(cnt.cr,0)+1) * tot.dt AS DOUBLE)) * 1000000.0) "
            "AS BIGINT) AS lam "
            "FROM (SELECT unnest(range(4096)) AS b) r "
            "LEFT JOIN cnt ON r.b = cnt.b CROSS JOIN tot), "
            "w AS (SELECT d.doc_id, CAST(COALESCE(SUM(lam.lam), 0) AS BIGINT) "
            "AS weight FROM d LEFT JOIN f ON d.doc_id = f.doc_id "
            "LEFT JOIN lam ON f.b = lam.b "
            "WHERE NOT d.is_t GROUP BY d.doc_id) "
            "SELECT doc_id, weight FROM w ORDER BY weight DESC, doc_id LIMIT 100"
        ),
        "bm25_search": (
            # BM25 with dyadic constants k1=1.25, b=0.75 (exact double
            # literals — immune to the measured DuckDB shortest-repr
            # 1-ULP parse hazard); per-(doc,term) scores floored BEFORE
            # the per-doc sum so accumulation order is hash-invariant;
            # every float op mirrored left-to-right (HLL ln precedent) —
            # pipelines.retrieval.bm25_search
            "WITH d AS (SELECT doc_id, list_filter(string_split(text,' '), "
            "x -> x != '') AS ws FROM documents), "
            "dl AS (SELECT doc_id, len(ws) AS dl, ws FROM d), "
            "c AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) "
            "AS avgdl FROM dl), "
            f"q(query, term) AS (VALUES {_bm25_query_values()}), "
            "terms AS (SELECT DISTINCT term FROM q), "
            "dfc AS (SELECT t.term, (SELECT COUNT(*) FROM dl "
            "WHERE list_contains(dl.ws, t.term)) AS df FROM terms t), "
            "tf AS (SELECT q.query, dl.doc_id, q.term, "
            "len(list_filter(dl.ws, w -> w = q.term)) AS tf, dl.dl "
            "FROM dl CROSS JOIN q), "
            "per AS (SELECT tf.query, tf.doc_id, "
            "CAST(FLOOR(ln((c.n - dfc.df + 0.5) / (dfc.df + 0.5) + 1.0) "
            "* ((tf.tf * 2.25) / (tf.tf + 1.25 * (0.25 + (0.75 * tf.dl) "
            "/ c.avgdl))) * 1000000.0) AS BIGINT) AS s "
            "FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN c "
            "WHERE tf.tf > 0), "
            "sc AS (SELECT query, doc_id, SUM(s) AS score "
            "FROM per GROUP BY query, doc_id) "
            "SELECT query, doc_id, CAST(score AS BIGINT) AS score, "
            "CAST(rank AS BIGINT) AS rank "
            "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query "
            "ORDER BY score DESC, doc_id) AS rank FROM sc) "
            f"WHERE rank <= {20}"
        ),
        "split_leakage": (
            # exact-Jaccard pairs (the LSH-exhaustive precedent) whose
            # endpoints straddle the hash_sample 80/10/10 md5 split —
            # pipelines.text.split_leakage
            f"WITH {_SHINGLES_CTE}, {_JACCARD_PAIRS}, "
            "sp AS (SELECT doc_id, "
            f"CASE WHEN pri < {(80 << 32) // 100} THEN 'train' "
            f"WHEN pri < {(90 << 32) // 100} THEN 'val' ELSE 'test' END AS s "
            "FROM (SELECT doc_id, CAST(('0x' || "
            "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
            "AS pri FROM documents)) "
            "SELECT p.a, p.b, "
            "CAST(FLOOR(p.j * 10000 + 0.5) AS BIGINT) AS jaccard_x10k, "
            "sa.s AS split_a, sb.s AS split_b "
            "FROM pairs p JOIN sp sa ON p.a = sa.doc_id "
            "JOIN sp sb ON p.b = sb.doc_id WHERE sa.s != sb.s"
        ),
        "hard_negative_mining": (
            # exact all-pairs different-label argmax — the ann_cosine_topk
            # quantization contract (x1e6 + 0.5, ties by neg_id) —
            # pipelines.vectors.hard_negative_mining
            "WITH e AS (SELECT vec_id, label, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
            "scored AS (SELECT a.vec_id AS vec_id, b.vec_id AS neg_id, "
            "CAST(FLOOR(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5) "
            "AS BIGINT) AS sim_x1m "
            "FROM e a JOIN e b ON a.vec_id != b.vec_id AND a.label != b.label) "
            "SELECT vec_id, neg_id, sim_x1m "
            "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
            "ORDER BY sim_x1m DESC, neg_id) AS r FROM scored) WHERE r = 1"
        ),
        "repetition_stats": (
            # Gopher-style repetition signals; all fractions floored x10000.
            # split(' ') keeps empties on both sides, so n >= 1 always.
            "WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
            "t AS (SELECT doc_id, unnest(ws) AS tok FROM d), "
            "tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM t GROUP BY doc_id, tok), "
            "tm AS (SELECT doc_id, MAX(cnt) AS top_cnt, SUM(cnt) AS n, "
            "COUNT(*) AS n_distinct FROM tc GROUP BY doc_id), "
            "bg AS (SELECT doc_id, unnest(list_transform(range(len(ws) - 1), "
            "i -> ws[i + 1] || ' ' || ws[i + 2])) AS big FROM d), "
            "bc AS (SELECT doc_id, big, COUNT(*) AS cnt FROM bg GROUP BY doc_id, big), "
            "bm AS (SELECT doc_id, MAX(cnt) AS top_big FROM bc GROUP BY doc_id) "
            "SELECT tm.doc_id, CAST(tm.n AS BIGINT) AS n_tokens, "
            "CAST((tm.n - tm.n_distinct) * 10000 // tm.n AS BIGINT) AS dup_frac_x10000, "
            "CAST(tm.top_cnt * 10000 // tm.n AS BIGINT) AS top_tok_frac_x10000, "
            "CAST(COALESCE(bm.top_big, 0) * 10000 // GREATEST(tm.n - 1, 1) AS BIGINT) "
            "AS top_bigram_frac_x10000 "
            "FROM tm LEFT JOIN bm ON tm.doc_id = bm.doc_id"
        ),
        "pack_offsets": (
            # exclusive prefix sum of token counts in doc_id order; bins of
            # 512 tokens (pipelines.text.pack_offsets capacity default)
            "WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) "
            "AS n_tokens FROM documents), "
            "c AS (SELECT doc_id, n_tokens, COALESCE(SUM(n_tokens) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS so FROM d) "
            "SELECT doc_id, n_tokens, CAST(so AS BIGINT) AS start_offset, "
            "CAST(so // 512 AS BIGINT) AS first_bin, "
            "CAST((so + n_tokens - 1) // 512 AS BIGINT) AS last_bin FROM c"
        ),
        "stratified_sample": (
            # same md5-prefix arithmetic as pipelines.text.stratified_sample
            "SELECT doc_id, lang FROM documents "
            "WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) < "
            "CASE lang "
            f"WHEN 'en' THEN {(25 << 32) // 100} "
            f"WHEN 'de' THEN {(60 << 32) // 100} "
            f"WHEN 'es' THEN {(60 << 32) // 100} "
            f"WHEN 'fr' THEN {(60 << 32) // 100} "
            f"WHEN 'zh' THEN {(60 << 32) // 100} "
            f"ELSE {(50 << 32) // 100} END"
        ),
        "top_docs_per_lang": (
            "SELECT lang, doc_id, n_chars, rank FROM ("
            "SELECT lang, doc_id, n_chars, ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank "
            "FROM documents) WHERE rank <= 5"
        ),
        "top_tokens": (
            # whitespace tokens, empties dropped; tie-break (n desc, token
            # asc) matches pipelines.text.top_tokens
            "SELECT tok AS token, COUNT(*) AS n FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
            "WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok LIMIT 20"
        ),
        # the engine decodes REAL RIFF/WAVE PCM (functions/audio.py chunk
        # walker) whose samples make_audio synthesized as 2*byte - 255
        # cycled to 1024 — exact-integer energy arithmetic, so DuckDB
        # re-derives rms from hex(encode(text)) with no shared code and the
        # driver hash-checks encode -> container parse -> decode -> features
        "audio_features": (
            "WITH b AS (SELECT CAST(doc_id AS VARCHAR) AS clip_id, "
            "hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents), "
            "c AS (SELECT clip_id, n, list_transform(range(0, n), "
            "i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT), 2)) AS INT)) AS codes "
            "FROM b), "
            "d AS (SELECT clip_id, CASE WHEN n = 0 THEN 66585600 "  # 1024 * 255^2
            "ELSE list_sum(list_transform(range(0, 1024), "
            "j -> CAST((2*codes[CAST(j % n AS INT) + 1] - 255) "
            "* (2*codes[CAST(j % n AS INT) + 1] - 255) AS BIGINT))) END AS energy "
            "FROM c) "
            "SELECT clip_id, CAST(64 AS BIGINT) AS duration_ms, "
            "CAST(FLOOR(sqrt(CAST(energy AS DOUBLE)) / 8192.0 * 1000000.0) AS BIGINT) "
            "AS rms_x1e6, 4 AS n_frames FROM d"
        ),
        # real SPV1 decode check: the sampled frames' decoded pixel sums.
        # make_video cycles the doc's UTF-8 bytes into 16x16x3 frames and
        # PNG is lossless, so px_sum(frame f) = sum over j in [0,768) of
        # byte[(f*768 + j) % n] — DuckDB re-derives it from hex(encode(text))
        # with no shared code, hash-checking the container parse + seek +
        # codec decode end-to-end (frame indices/dims stay length arithmetic)
        "video_frames": (
            "WITH b AS (SELECT CAST(doc_id AS VARCHAR) AS video_id, "
            "hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents), "
            "c AS (SELECT video_id, n, GREATEST(n // 256, 1) AS nf, "
            "list_transform(range(0, n), "
            "i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT), 2)) AS INT)) AS codes "
            "FROM b), "
            "f AS (SELECT video_id, n, codes, "
            "CAST(unnest(range(0, nf, 8)) AS BIGINT) AS frame_idx FROM c) "
            "SELECT video_id, frame_idx, 16 AS w, 16 AS h, "
            "CASE WHEN n = 0 THEN CAST(0 AS BIGINT) ELSE "
            "CAST(list_sum(list_transform(range(0, 768), "
            "j -> CAST(codes[CAST((frame_idx*768 + j) % n AS INT) + 1] AS BIGINT))) "
            "AS BIGINT) END AS px_sum FROM f"
        ),
        # nprobe == n_centroids bypasses the ADC preselect (exact dots for
        # every candidate) -> structurally identical to the exact top-k
        # oracle; the approximate nprobe<n_centroids path is pytest-bounded
        "ann_ivfpq_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 8), scored AS ("
            "SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.embedding, e.embedding) AS sim "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id) "
            "SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM ("
            "SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM scored) "
            "WHERE rank <= 5"
        ),
        # ADC preselection (local top-32 per batch) + exact re-rank equals
        # the exhaustive exact top-k whenever every true neighbor survives
        # its own batch's ADC preselect — deterministic and asserted by
        # pytest (test_ann_pq_topk_recall_vs_exact, recall measured 1.0 at
        # every sf); ranks come from exact float64 dots on both sides, the
        # same contract as the green ann_cosine_topk oracle. A recall
        # regression (codebook/seed change) fails this hash row loudly —
        # which is the correct gate behavior for the ADC+R contract.
        "ann_pq_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 8), scored AS ("
            "SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.embedding, e.embedding) AS sim "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id) "
            "SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM ("
            "SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM scored) "
            "WHERE rank <= 5"
        ),
        # nprobe == n_centroids probes every IVF cell -> exhaustive search ->
        # identical to the exact top-k oracle
        "ann_ivf_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 8), scored AS ("
            "SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.embedding, e.embedding) AS sim "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id) "
            "SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM ("
            "SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM scored) "
            "WHERE rank <= 5"
        ),
        # -- external-store sink analogs: the oracles reconstruct each
        # sink's LAYOUT (md5 content keyid, str() coercion, cell unpivot,
        # bucket hash) straight from the source table; the engine rows
        # come from reading the written store back, so a hash match
        # verifies write -> on-disk layout -> read end-to-end.
        # pipelines_hbase.py:96-105 cell shape: (rowkey, 'cf:'+col, str(v))
        "hbase_cells": (
            "WITH k AS (SELECT '2026-01-01_' || upper(md5(concat_ws(chr(1), "
            "'customer_sink', CAST(c_custkey AS VARCHAR), c_name, "
            "CAST(c_nationkey AS VARCHAR), c_mktsegment))) AS keyid, "
            "CAST(c_custkey AS VARCHAR) v1, c_name v2, "
            "CAST(c_nationkey AS VARCHAR) v3, c_mktsegment v4 FROM customer) "
            "SELECT keyid, qualifier, value FROM ("
            "SELECT keyid, 'cf:c_custkey' AS qualifier, v1 AS value FROM k "
            "UNION ALL SELECT keyid, 'cf:c_name', v2 FROM k "
            "UNION ALL SELECT keyid, 'cf:c_nationkey', v3 FROM k "
            "UNION ALL SELECT keyid, 'cf:c_mktsegment', v4 FROM k "
            "UNION ALL SELECT keyid, 'cf:bizdate', '2026-01-01' FROM k "
            "UNION ALL SELECT keyid, 'cf:ctime', '2026-01-01 00:00:00' FROM k "
            "UNION ALL SELECT keyid, 'cf:spider', 'zhifang_sim' FROM k)"
        ),
        # pipelines_mongodb.py:72-82 document shape: _id + str() fields
        "mongo_docs": (
            "SELECT '2026-01-01_' || upper(md5(concat_ws(chr(1), 'orders_sink', "
            "CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), "
            "o_orderstatus, CAST(o_orderdate AS VARCHAR), o_orderpriority))) "
            'AS "_id", '
            "CAST(o_orderkey AS VARCHAR) AS o_orderkey, "
            "CAST(o_custkey AS VARCHAR) AS o_custkey, o_orderstatus, "
            "CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_orderpriority, "
            "'2026-01-01' AS bizdate, '2026-01-01 00:00:00' AS ctime, "
            "'zhifang_sim' AS spider FROM orders"
        ),
        # pipelines_hdfs.py:94-101 line shape: keyid + values stripped of
        # the \x01 delimiter and newlines + meta, '\x01'-joined
        "hdfs_lines": (
            "SELECT '2026-01-01_' || upper(md5(concat_ws(chr(1), 'nation_sink', "
            "CAST(n_nationkey AS VARCHAR), n_name, CAST(n_regionkey AS VARCHAR)))) "
            "AS keyid, "
            "replace(replace(CAST(n_nationkey AS VARCHAR), chr(1), ''), chr(10), '') "
            "AS n_nationkey, "
            "replace(replace(n_name, chr(1), ''), chr(10), '') AS n_name, "
            "replace(replace(CAST(n_regionkey AS VARCHAR), chr(1), ''), chr(10), '') "
            "AS n_regionkey, "
            "'2026-01-01' AS bizdate, '2026-01-01 00:00:00' AS ctime, "
            "'zhifang_sim' AS spider FROM nation"
        ),
        # pipelines_doris.py:72-75 DISTRIBUTED BY HASH(keyid) BUCKETS n:
        # placement hash = first-8-hex-of-md5(keyid) % 4 on both sides
        "doris_buckets": (
            "WITH k AS (SELECT '2026-01-01_' || upper(md5(concat_ws(chr(1), "
            "'orders_doris', CAST(o_orderkey AS VARCHAR), "
            "CAST(o_custkey AS VARCHAR), o_orderstatus, o_orderpriority))) "
            "AS keyid FROM orders) "
            "SELECT CAST(CAST(('0x' || substr(md5(keyid), 1, 8)) AS UBIGINT) % 4 "
            "AS BIGINT) AS bucket, count(*) AS n FROM k GROUP BY 1 ORDER BY 1"
        ),
        # pipelines_kafka.py:17-44 message shape: key=tablename, value=
        # JSON of str()'d fields + content keyid + meta; partition =
        # doris_bucket_of(keyid) % 4 (deterministic analog of the
        # reference's random.choice), reconstructed here so the oracle
        # verifies message PLACEMENT as well as contents
        "kafka_topic": (
            "WITH k AS (SELECT '2026-01-01_' || upper(md5(concat_ws(chr(1), "
            "'supplier_kafka', CAST(s_suppkey AS VARCHAR), s_name, "
            "CAST(s_nationkey AS VARCHAR)))) AS keyid, "
            "CAST(s_suppkey AS VARCHAR) AS s_suppkey, s_name, "
            "CAST(s_nationkey AS VARCHAR) AS s_nationkey FROM supplier) "
            "SELECT CAST(CAST(('0x' || substr(md5(keyid), 1, 8)) AS UBIGINT) % 4 "
            "AS BIGINT) AS part_id, 'supplier_kafka' AS msg_key, keyid, "
            "s_suppkey, s_name, s_nationkey, "
            "'2026-01-01' AS bizdate, '2026-01-01 00:00:00' AS ctime, "
            "'zhifang_sim' AS spider FROM k"
        ),
        # ES inverted index + AND-of-terms search: whitespace tokens
        # (the shared top_tokens convention), tf per (doc, term),
        # docs containing ALL query terms, score = sum tf, top-50 by
        # (score desc, doc_id asc) — tie-break shared with the engine
        "es_search": (
            "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents), "
            "f AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t "
            "WHERE tok IN ('join', 'slow', 'vector') GROUP BY doc_id, tok), "
            "s AS (SELECT doc_id, SUM(tf) AS score FROM f GROUP BY doc_id "
            "HAVING COUNT(DISTINCT tok) = 3) "
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(score AS BIGINT) "
            "AS score FROM s ORDER BY score DESC, CAST(doc_id AS VARCHAR) LIMIT 50"
        ),
    }
    # exhaustive-probe IVF graph == exact knn_graph row-for-row (pytest
    # proves the equality), so it shares the same hash oracle
    sqls["knn_graph_ivf"] = sqls["knn_graph"]
    # indexed IVF search == ann_ivf_topk row-for-row (pytest proves the
    # equality at pruning nprobe too), so it shares the same hash oracle
    sqls["ann_query_indexed"] = sqls["ann_ivf_topk"]
    # stored-band near-dup admission == the recompute path (deterministic
    # MinHasher; bands prune, verify fetches), so it shares the oracle
    sqls["incremental_dedup_minhash_indexed"] = sqls["incremental_dedup_minhash"]
    # length-vs-quality curve: the unigram_quality oracle as a CTE,
    # bucketed by the length_buckets arithmetic —
    # pipelines.text.length_quality_curve
    sqls["length_quality_curve"] = (
        f"WITH u AS ({sqls['unigram_quality']}) "
        "SELECT CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(logcount2_sum) AS BIGINT) AS sum_logcount2, "
        "CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens, "
        "CAST(1000 * SUM(logcount2_sum) // SUM(n_tokens) AS BIGINT) "
        "AS quality_x1000 FROM u GROUP BY 1"
    )
    # rule-mask histogram over the gopher CTE — pipelines.recipes.gopher_summary
    sqls["gopher_summary"] = (
        f"WITH g AS ({sqls['gopher_rules']}) "
        "SELECT rule_mask, CAST(COUNT(*) AS BIGINT) AS n_docs "
        "FROM g GROUP BY rule_mask"
    )
    # composed recipe flagship: the four component oracles nest as CTEs
    # (each is a self-contained SELECT) joined on doc_id with the exact
    # survivor predicate — pipelines.recipes.recipe_curate
    sqls["recipe_curate"] = (
        f"WITH g AS ({sqls['gopher_rules']}), "
        f"c AS ({sqls['c4_line_filter']}), "
        f"p AS ({sqls['paragraph_dedup']}), "
        f"m AS ({sqls['ccnet_ppl_buckets']}) "
        "SELECT g.doc_id, g.n_words, m.nll_avg, m.bucket "
        "FROM g JOIN c ON g.doc_id = c.doc_id "
        "JOIN p ON g.doc_id = p.doc_id JOIN m ON g.doc_id = m.doc_id "
        "WHERE g.passes = 1 AND c.doc_kept = 1 "
        "AND p.n_dropped * 5 <= p.n_lines AND m.bucket != 'tail'"
    )
    return sqls
