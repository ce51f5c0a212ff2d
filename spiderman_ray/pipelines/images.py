"""Image pipelines over the input_hint table (decode/validate, near-dup).

The §7.1 minimum slice: read the image+caption table -> actor-pool decode ->
recompute (w, h, phash) -> validate against stored columns -> write/return.
Multimodal plumbing notes: bytes stay in Arrow binary columns end to end;
``batch_size`` is small because rows are wide; decode state (codec tables)
lives in the actor. Real JPEG decode would slot into
functions/imaging.decode_image behind the Pillow gate — the Ray-side
plumbing here is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from spiderman_ray.functions.imaging import decode_image, phash64
from spiderman_ray.sources.table_io import read_dataset


class DecodeValidate:
    """Actor-pool stage: decode bytes, recompute w/h/phash, check invariants.

    Output per row: image_id, ok flags, recomputed dims/phash, psnr_db_x100
    (-1 for lossless exact matches)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "image_id": [],
            "w_ok": [],
            "h_ok": [],
            "phash_ok": [],
            "w": [],
            "h": [],
            "phash": [],
        }
        for row in batch.to_pylist():
            px = decode_image(row["bytes"])
            h, w = px.shape[:2]
            ph = phash64(px)
            out["image_id"].append(row["image_id"])
            out["w_ok"].append(w == row["w"])
            out["h_ok"].append(h == row["h"])
            out["phash_ok"].append(ph == row["phash"])
            out["w"].append(w)
            out["h"].append(h)
            out["phash"].append(ph)
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], type=pa.string()),
                "w_ok": pa.array(out["w_ok"]),
                "h_ok": pa.array(out["h_ok"]),
                "phash_ok": pa.array(out["phash_ok"]),
                "w": pa.array(out["w"], type=pa.int32()),
                "h": pa.array(out["h"], type=pa.int32()),
                "phash": pa.array(out["phash"], type=pa.int64()),
            }
        )


def decode_validate(images_uri: str, concurrency: int | None = None, batch_size: int = 64) -> rd.Dataset:
    """read images table -> decode/validate actor pool. Small batch_size:
    rows are wide (binary payloads)."""
    from spiderman_ray.pipelines import pool_size

    return read_dataset(images_uri).map_batches(
        DecodeValidate,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency or 10**6),  # None -> all CPUs - 1
        num_cpus=1,
    )


def _enumerate_band_pairs(g: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    # vectorized like text.simhash_near_dups (round-2 verdict fix #2):
    # equal-length bucket runs batch into one (R, L) matrix, candidate
    # pairs come from a single triu gather, and the hamming verify is a
    # SWAR popcount over the whole xor array — no per-bucket / per-pair
    # Python loop, so a skewed pHash band bucket stays O(pairs) numpy.
    # image_ids are STRINGS: pair on positional indices, gather ids last.
    from spiderman_ray.pipelines.text import _popcount64

    empty = pd.DataFrame(
        {"a": pd.Series(dtype=object), "b": pd.Series(dtype=object)}
    )
    g = g.drop_duplicates(["band", "band_val", "image_id"])
    g = g.sort_values(["band", "band_val", "image_id"], kind="mergesort")
    if g.empty:
        return empty
    b_ = g["band"].to_numpy()
    v_ = g["band_val"].to_numpy()
    ids = g["image_id"].to_numpy()
    h_ = g["phash"].to_numpy().astype(np.int64).view(np.uint64)
    new = np.ones(len(ids), dtype=bool)
    new[1:] = (b_[1:] != b_[:-1]) | (v_[1:] != v_[:-1])
    counts = np.bincount(np.cumsum(new) - 1)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    out_a, out_b = [], []
    chunk = 1 << 20  # bound the (R, P) work arrays: a 100k-wide bucket
    # has 5e9 pair slots — stream them in 1M-pair slices (small enough
    # that the allocator reuses warm buffers across slices; fresh large
    # allocations pay first-touch page faults on this host)
    for L in np.unique(counts):
        if L < 2:
            continue
        sel = np.nonzero(counts == L)[0]
        idxmat = starts[sel][:, None] + np.arange(L)[None, :]
        mh = h_[idxmat]
        iu0, iu1 = np.triu_indices(L, 1)
        for s in range(0, len(iu0), chunk):
            i0, i1 = iu0[s : s + chunk], iu1[s : s + chunk]
            keep = _popcount64(mh[:, i0] ^ mh[:, i1]) <= max_hamming
            out_a.append(idxmat[:, i0][keep])
            out_b.append(idxmat[:, i1][keep])
    if not out_a:
        return empty
    ia, ib = np.concatenate(out_a), np.concatenate(out_b)
    # rows sort by image_id within a bucket, so index order == id order
    return pd.DataFrame(
        {"a": pd.Series(ids[ia], dtype=object), "b": pd.Series(ids[ib], dtype=object)}
    )


def phash_near_dups(images_uri: str, max_hamming: int = 3) -> pa.Table:
    """Image near-dup pairs by pHash hamming distance <= t. Bucketing: split
    the 64-bit hash into 4 x 16-bit bands; a pair within hamming 3 cannot
    differ in all 4 bands (pigeonhole), so banding is EXACT through
    hamming 3 — B bands are exact through B-1 -> band groupby -> verify
    hamming exactly. Cross-band duplicate removal runs DISTRIBUTED on a
    pair-shard exchange (the simhash_near_dups shape, text.py): on a
    phash-skewed corpus the raw candidate stream is pair-scale, so only
    the unique pairs (the answer) reach the driver."""
    from spiderman_ray.functions.hashing import hash64

    def add_pshard(b: pa.Table) -> pa.Table:
        a_ = b["a"].to_pylist()
        b_ = b["b"].to_pylist()
        keys = [f"{x}|{y}" for x, y in zip(a_, b_)]
        sh = (
            (hash64(keys).view(np.uint64) % np.uint64(64)).astype(np.int64)
            if keys
            else np.array([], dtype=np.int64)
        )
        return b.append_column("_pshard", pa.array(sh))

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).drop(columns=["_pshard"])

    df = (
        _phash_pairs_ds(images_uri, max_hamming)
        .map_batches(add_pshard, batch_format="pyarrow")
        .groupby("_pshard")
        .map_groups(dedup_pairs, batch_format="pandas")
        .to_pandas()
    )
    if df.empty:  # zero near-dups: keep the (a, b) string schema
        return pa.table({"a": pa.array([], type=pa.string()), "b": pa.array([], type=pa.string())})
    df = df.sort_values(["a", "b"])
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def _phash_pairs_ds(images_uri: str, max_hamming: int = 3) -> rd.Dataset:
    """The banded pHash pair pipeline as a DATASET (the collected
    ``phash_near_dups`` view wraps this). Pairs may repeat across bands
    (the per-shard enumeration cannot see other shards); consumers either
    drop_duplicates (the pin query) or are duplicate-tolerant (union-find
    / label propagation)."""
    ds = read_dataset(images_uri, columns=["image_id", "phash"])

    def bands(batch: pa.Table) -> pa.Table:
        ph = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        out = []
        for b in range(4):
            band_val = ((ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(
                pa.table(
                    {
                        "image_id": batch["image_id"],
                        "phash": batch["phash"],
                        "band": pa.array(np.full(len(ph), b, dtype=np.int64)),
                        "band_val": pa.array(band_val),
                        "_bshard": pa.array((band_val % 64).astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(out)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _enumerate_band_pairs(g, max_hamming)

    return (
        ds.map_batches(bands, batch_format="pyarrow")
        .groupby("_bshard")
        .map_groups(pairs, batch_format="pandas")
    )


def _phash_member_clusters_ds(
    images_uri: str, max_hamming: int = 3, driver_pair_cap: int = 2_000_000
) -> rd.Dataset:
    """(image_id, cluster_id = MIN image_id of its hamming <= t component)
    for every image that appears in at least one near-dup PAIR (singletons
    are implicit — they label themselves downstream). The shared component
    core of ``image_dedup_survivors`` and ``image_phash_clusters``.

    Size-gated like the text family: below ``driver_pair_cap`` PAIRS the
    LSH-bounded pair stream folds into a driver union-find with bailout
    (string ids order lexicographically in _MinUnionFind) and the
    pair-bounded member map becomes a Dataset; above it the shared label
    propagation runs over hash64(image_id) node ids (~2^-64 collision
    contract, the gram-hash argument) and the component MIN image_id
    resolves DISTRIBUTED: labels re-join their image_ids by node-hash
    shard, then a per-component grouped MIN by label shard — nothing
    pair- or corpus-sized on the driver."""
    import ray.data as rdm

    from spiderman_ray.functions.hashing import hash64
    from spiderman_ray.pipelines.text import _cc_labels_distributed, _MinUnionFind

    def _members_ds(rows: list[tuple]) -> rd.Dataset:
        rows = sorted(rows)
        return rdm.from_arrow(
            pa.table(
                {
                    "image_id": pa.array([r[0] for r in rows], type=pa.string()),
                    "cluster_id": pa.array([r[1] for r in rows], type=pa.string()),
                }
            )
        )

    pairs = _phash_pairs_ds(images_uri, max_hamming)
    bailed = driver_pair_cap <= 0
    if not bailed:
        uf = _MinUnionFind()
        n_seen = 0
        for batch in pairs.iter_batches(batch_format="pandas"):
            n_seen += len(batch)
            if n_seen > driver_pair_cap:
                bailed = True
                break
            for a, b in zip(batch["a"], batch["b"]):
                uf.union(str(a), str(b))
    if not bailed:
        return _members_ds([(n, uf.find(n)) for n in uf.parent])

    def edges(batch: pa.Table) -> pa.Table:
        ha = hash64([str(v) for v in batch["a"].to_pylist()])
        hb = hash64([str(v) for v in batch["b"].to_pylist()])
        return pa.table(
            {
                "key": pa.array(np.concatenate([ha, hb]).view(np.int64)),
                "node": pa.array(np.concatenate([hb, ha]).view(np.int64)),
                "lbl": pa.array(np.full(2 * batch.num_rows, -1, dtype=np.int64)),
            }
        )

    e = pairs.map_batches(edges, batch_format="pyarrow").materialize()
    if e.count() == 0:
        return _members_ds([])
    labels = _cc_labels_distributed(e)

    def lbl_rows(batch: pa.Table) -> pa.Table:
        # label rows join the id map below; ids pad with null
        return pa.table(
            {
                "node": pc.cast(batch["node"], pa.int64()),
                "lbl": pc.cast(batch["lbl"], pa.int64()),
                "image_id": pa.nulls(batch.num_rows, type=pa.string()),
            }
        )

    def id_rows(batch: pa.Table) -> pa.Table:
        ha = hash64([str(v) for v in batch["a"].to_pylist()])
        hb = hash64([str(v) for v in batch["b"].to_pylist()])
        ids = pa.concat_arrays(
            [
                pc.cast(batch["a"], pa.string()).combine_chunks(),
                pc.cast(batch["b"], pa.string()).combine_chunks(),
            ]
        )
        return pa.table(
            {
                "node": pa.array(np.concatenate([ha, hb]).view(np.int64)),
                "lbl": pa.array(np.full(2 * batch.num_rows, -1, dtype=np.int64)),
                "image_id": ids,
            }
        )

    def shard_node(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False).view(np.uint64)
        return batch.append_column(
            "_nshard", pa.array((n % np.uint64(64)).astype(np.int64))
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # per node: ONE label row (labels are int64 hashes, possibly
        # negative as int64 — flag label rows by image_id null)
        lblr = g[g["image_id"].isna()]
        idr = g[~g["image_id"].isna()]
        lbl_of = dict(zip(lblr["node"], lblr["lbl"]))
        out = idr.drop_duplicates(["node", "image_id"])
        return pd.DataFrame(
            {
                "lbl": out["node"].map(lbl_of).astype("int64"),
                "image_id": out["image_id"].astype(str),
                "_lshard": (
                    out["node"].map(lbl_of).astype("int64").to_numpy()
                    .view(np.uint64) % np.uint64(64)
                ).astype("int64"),
            }
        )

    def clusters_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["lbl", "image_id"])
        mins = g.groupby("lbl", sort=False)["image_id"].transform("min")
        return pd.DataFrame(
            {"image_id": g["image_id"].astype(str), "cluster_id": mins.astype(str)}
        )

    return (
        labels.map_batches(lbl_rows, batch_format="pyarrow")
        .union(pairs.map_batches(id_rows, batch_format="pyarrow"))
        .map_batches(shard_node, batch_format="pyarrow")
        .groupby("_nshard")
        .map_groups(attach, batch_format="pandas")
        .groupby("_lshard")
        .map_groups(clusters_of, batch_format="pandas")
    )


def image_dedup_survivors(
    images_uri: str, max_hamming: int = 3, driver_pair_cap: int = 2_000_000
) -> rd.Dataset:
    """Images to KEEP after exact + perceptual dedup — the image-axis
    sibling of text ``dedup_minhash_survivors``. Drops:

    (a) exact byte duplicates (md5 content fp, first image_id wins —
        ``image_dedup_exact``'s is_first == 0 rows, already a Dataset);
    (b) pHash near-dups dominated in their hamming <= t connected
        component (each component keeps its MIN image_id —
        ``_phash_member_clusters_ds``, size-gated, see its docstring).

    Survivors anti-join via the string-keyed ``anti_join_ids`` — no
    loser set on the driver on either gate path. Output: (image_id)."""
    from spiderman_ray.pipelines.text import anti_join_ids

    members = _phash_member_clusters_ds(images_uri, max_hamming, driver_pair_cap)

    def dominated(batch: pa.Table) -> pa.Table:
        m = pc.not_equal(batch["image_id"], batch["cluster_id"])
        return pa.table(
            {"image_id": pc.cast(batch.filter(m)["image_id"], pa.string())}
        )

    def exact_losers(batch: pa.Table) -> pa.Table:
        dup = pc.equal(batch["is_first"], 0)
        return pa.table(
            {"image_id": pc.cast(batch.filter(dup)["image_id"], pa.string())}
        )

    drop = image_dedup_exact(images_uri).map_batches(
        exact_losers, batch_format="pyarrow"
    ).union(members.map_batches(dominated, batch_format="pyarrow"))
    imgs = read_dataset(images_uri, columns=["image_id"])
    return anti_join_ids(imgs, drop, "image_id", key_type=pa.string())


def incremental_image_dedup(
    images_uri: str, base_pct: int = 50, max_hamming: int = 3,
    driver_pair_cap: int = 2_000_000,
) -> rd.Dataset:
    """Incremental image admission against a base snapshot — the
    image-axis sibling of ``curate_v2_incremental``'s dedup stages
    (base = hash_sample md5(image_id) prefix < ``base_pct``): a NEW
    image is admitted iff

    (a) its content md5 exists nowhere in the base snapshot and it is
        the FIRST new image with that fp (``incremental_dedup``
        semantics, string fps);
    (b) its pHash hamming <= t near-dup component holds NO base image,
        and it is the MIN exact-ADMITTED member of that component (one
        representative per all-new component —
        ``incremental_dedup_minhash`` semantics; singletons pass).

    Exchanges: one fp-shard (exact admit), one id-shard union attach
    (admitted flags meet cluster members), one cluster-shard pick, and
    the string-keyed ``anti_join_ids`` — all bounded, nothing corpus-
    sized on the driver (the component core is the size-gated
    ``_phash_member_clusters_ds``). Output: (image_id) admitted."""
    import hashlib

    from spiderman_ray.pipelines.text import _shard64_of, anti_join_ids

    thresh = (base_pct << 32) // 100

    def _is_new(ids: list) -> np.ndarray:
        return np.fromiter(
            (int(hashlib.md5(i.encode()).hexdigest()[:8], 16) >= thresh
             for i in ids),
            dtype=bool, count=len(ids),
        )

    def fp_mark(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        fps = [hashlib.md5(b).hexdigest() for b in batch["bytes"].to_pylist()]
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "content_fp": pa.array(fps, pa.string()),
                "is_new": pa.array(_is_new(ids)),
                "_fshard": pa.array(_shard64_of(fps)),
            }
        )

    def exact_admit(g: pd.DataFrame) -> pd.DataFrame:
        base_fps = set(g.loc[~g["is_new"], "content_fp"])
        out = g[g["is_new"] & ~g["content_fp"].isin(base_fps)]
        out = out.sort_values(["content_fp", "image_id"], kind="mergesort")
        keep = out["content_fp"].ne(out["content_fp"].shift())
        return pd.DataFrame({"image_id": out.loc[keep, "image_id"].to_numpy()})

    admitted = (
        read_dataset(images_uri, columns=["image_id", "bytes"])
        .map_batches(fp_mark, batch_format="pyarrow")
        .groupby("_fshard")
        .map_groups(exact_admit, batch_format="pandas")
    ).materialize()  # O(new ids) — consumed twice (attach + final anti-join)

    members = _phash_member_clusters_ds(images_uri, max_hamming, driver_pair_cap)
    drops = _phash_incremental_drops(members, admitted, base_pct)
    return anti_join_ids(admitted, drops, "image_id", key_type=pa.string())


def _phash_incremental_drops(
    members: rd.Dataset, admitted: rd.Dataset, base_pct: int
) -> rd.Dataset:
    """The incremental pHash-component rule shared by
    ``incremental_image_dedup`` and ``curate_images_incremental``:
    given the component member map and the exact-admitted NEW ids,
    emit the ids to DROP — every new member of a component holding a
    base image, and every new member of an all-new component except
    its MIN admitted representative. One id-shard union attach + one
    cluster-shard pick; per-group state is O(component members)."""
    import hashlib

    from spiderman_ray.pipelines.text import _shard64_of

    thresh = (base_pct << 32) // 100

    def _is_new(ids: list) -> np.ndarray:
        return np.fromiter(
            (int(hashlib.md5(i.encode()).hexdigest()[:8], 16) >= thresh
             for i in ids),
            dtype=bool, count=len(ids),
        )

    def mark_member(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "cluster_id": pc.cast(batch["cluster_id"], pa.string()),
                "side": pa.array(np.zeros(len(ids), dtype=np.int64)),
                "_ishard": pa.array(_shard64_of(ids)),
            }
        )

    def mark_admitted(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "cluster_id": pa.array([""] * len(ids), pa.string()),
                "side": pa.array(np.ones(len(ids), dtype=np.int64)),
                "_ishard": pa.array(_shard64_of(ids)),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        adm = set(g.loc[g["side"] == 1, "image_id"])
        mem = g[g["side"] == 0]
        if len(mem) == 0:
            return pd.DataFrame(
                {"image_id": pd.Series(dtype=object),
                 "cluster_id": pd.Series(dtype=object),
                 "is_new": pd.Series(dtype="int64"),
                 "admitted": pd.Series(dtype="int64"),
                 "_cshard": pd.Series(dtype="int64")}
            )
        ids = list(mem["image_id"])
        out = pd.DataFrame(
            {
                "image_id": mem["image_id"].to_numpy(),
                "cluster_id": mem["cluster_id"].to_numpy(),
                "is_new": _is_new(ids).astype("int64"),
                "admitted": np.fromiter(
                    (i in adm for i in ids), dtype=np.int64, count=len(ids)
                ),
            }
        )
        out["_cshard"] = _shard64_of(list(out["cluster_id"]))
        return out

    def cluster_drops(g: pd.DataFrame) -> pd.DataFrame:
        drops: list[str] = []
        for _cid, grp in g.groupby("cluster_id", sort=False):
            new = grp[grp["is_new"] == 1]
            if len(new) == 0:
                continue
            if (grp["is_new"] == 0).any():
                drops.extend(new["image_id"])  # base present: no admission
                continue
            adm = sorted(new.loc[new["admitted"] == 1, "image_id"])
            rep = adm[0] if adm else None
            drops.extend(i for i in new["image_id"] if i != rep)
        return pd.DataFrame({"image_id": pd.array(drops, dtype=object)})

    adm_ids = admitted.select_columns(["image_id"])
    return (
        members.map_batches(mark_member, batch_format="pyarrow")
        .union(adm_ids.map_batches(mark_admitted, batch_format="pyarrow"))
        .groupby("_ishard")
        .map_groups(attach, batch_format="pandas")
        .groupby("_cshard")
        .map_groups(cluster_drops, batch_format="pandas")
    )


def curate_images_incremental(
    images_uri: str, base_pct: int = 50, min_caption_tokens: int = 2,
    max_hamming: int = 3, driver_pair_cap: int = 2_000_000,
) -> rd.Dataset:
    """The multimodal flagship's DAILY-INCREMENT form — ``curate_images``
    restricted to a new batch against a base snapshot (the image-axis
    ``curate_v2_incremental``): decode/validate/caption gates run on the
    NEW side only (the base side contributes just content md5s — no
    decode); a gated new image is admitted iff its fp exists nowhere in
    the base snapshot and it is first among new-gated (fp-shard), then
    the shared ``_phash_incremental_drops`` component rule keeps one
    representative per all-new near-dup component and blocks components
    holding a base image. Output: (image_id, w, h, n_caption_tokens) —
    the increment manifest."""
    import hashlib

    from spiderman_ray.pipelines import pool_size
    from spiderman_ray.pipelines.text import _shard64_of, anti_join_ids

    thresh = (base_pct << 32) // 100

    def _is_new(ids: list) -> np.ndarray:
        return np.fromiter(
            (int(hashlib.md5(i.encode()).hexdigest()[:8], 16) >= thresh
             for i in ids),
            dtype=bool, count=len(ids),
        )

    def keep_new(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(_is_new(batch["image_id"].to_pylist())))

    def base_fps(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        keep = ~_is_new(ids)
        b = batch.filter(pa.array(keep))
        fps = [hashlib.md5(x).hexdigest() for x in b["bytes"].to_pylist()]
        n = len(fps)
        z = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "image_id": pc.cast(b["image_id"], pa.string()),
                "w": pa.array(z), "h": pa.array(z),
                "n_caption_tokens": pa.array(z),
                "fp": pa.array(fps, pa.string()),
                "side": pa.array(z),  # 0 = base fp row
                "_fshard": pa.array(_shard64_of(fps)),
            }
        )

    def mark_gated(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fps = batch["fp"].to_pylist()
        return pa.table(
            {
                "image_id": pc.cast(batch["image_id"], pa.string()),
                "w": pc.cast(batch["w"], pa.int64()),
                "h": pc.cast(batch["h"], pa.int64()),
                "n_caption_tokens": pc.cast(batch["n_caption_tokens"], pa.int64()),
                "fp": pc.cast(batch["fp"], pa.string()),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "_fshard": pa.array(_shard64_of(fps)),
            }
        )

    def exact_admit(g: pd.DataFrame) -> pd.DataFrame:
        base = set(g.loc[g["side"] == 0, "fp"])
        out = g[(g["side"] == 1) & ~g["fp"].isin(base)]
        out = out.sort_values(["fp", "image_id"], kind="mergesort")
        keep = out["fp"].ne(out["fp"].shift())
        return out.loc[keep, ["image_id", "w", "h", "n_caption_tokens"]]

    gated = (
        read_dataset(images_uri)
        .map_batches(keep_new, batch_format="pyarrow")
        .map_batches(
            _CurateImagesStage,
            fn_constructor_args=(min_caption_tokens, None, None),
            batch_format="pyarrow",
            batch_size=64,
            concurrency=pool_size(10**6),
            num_cpus=1,
        )
        .map_batches(mark_gated, batch_format="pyarrow")
    )
    base = read_dataset(images_uri, columns=["image_id", "bytes"]).map_batches(
        base_fps, batch_format="pyarrow"
    )
    admitted = (
        gated.union(base)
        .groupby("_fshard")
        .map_groups(exact_admit, batch_format="pandas")
    ).materialize()  # O(new gated ids) — consumed twice
    members = _phash_member_clusters_ds(images_uri, max_hamming, driver_pair_cap)
    drops = _phash_incremental_drops(members, admitted, base_pct)
    return anti_join_ids(
        admitted, drops, "image_id",
        payload={"w": pa.int64(), "h": pa.int64(),
                 "n_caption_tokens": pa.int64()},
        key_type=pa.string(),
    )


def image_dedup_survivors_quality(
    images_uri: str, max_hamming: int = 3, driver_pair_cap: int = 2_000_000
) -> rd.Dataset:
    """``image_dedup_survivors`` with QUALITY-priority winner selection:
    each pHash near-dup component keeps its SHARPEST member
    (Laplacian-variance sharpness, tie -> min image_id) instead of the min
    image_id — real curation keeps the best copy of a duplicate group, not
    the lexicographically first. Exact byte duplicates still resolve
    first-wins (identical bytes have identical sharpness, so the two rules
    agree there).

    Scale shape: sharpness comes from ONE actor-pool decode pass over the
    table (bytes never shuffle — only (image_id, sharpness) rows enter the
    exchanges); scores attach to the pair-bounded member map on an
    image_id-hash shard, winners resolve per cluster on a cluster_id-hash
    shard, and losers anti-join via the string-keyed ``anti_join_ids``.
    Sentinel columns (sharp=-1 on member rows, cluster='' on score rows)
    keep every int column null-free through the pandas transit — the
    anti_join_ids zero-padding invariant."""
    from spiderman_ray.pipelines.text import _shard64_of, anti_join_ids

    members = _phash_member_clusters_ds(images_uri, max_hamming, driver_pair_cap)
    scores = image_quality(images_uri)

    def m_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": pc.cast(t["image_id"], pa.string()),
                "cluster_id": pc.cast(t["cluster_id"], pa.string()),
                "sharp": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                "_ishard": pa.array(_shard64_of(t["image_id"].to_pylist())),
            }
        )

    def s_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": pc.cast(t["image_id"], pa.string()),
                "cluster_id": pa.array([""] * t.num_rows, type=pa.string()),
                "sharp": pc.cast(t["sharpness_x100"], pa.int64()),
                "_ishard": pa.array(_shard64_of(t["image_id"].to_pylist())),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # per image: one score row (sharp >= 0), member rows carry sharp=-1
        sc = g[g["sharp"] >= 0]
        sharp_of = dict(zip(sc["image_id"], sc["sharp"]))
        m = g[g["sharp"] < 0]
        sharp = m["image_id"].map(sharp_of).astype("int64")
        return pd.DataFrame(
            {
                "image_id": m["image_id"].astype(str),
                "cluster_id": m["cluster_id"].astype(str),
                "sharp": sharp.to_numpy(),
                "_cshard": _shard64_of(list(m["cluster_id"])),
            }
        )

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["image_id", "cluster_id"])
        # winner per cluster: max sharpness, tie -> min image_id
        g = g.sort_values(["cluster_id", "sharp", "image_id"],
                          ascending=[True, False, True], kind="mergesort")
        keep = g["cluster_id"].ne(g["cluster_id"].shift())
        return pd.DataFrame({"image_id": g.loc[~keep, "image_id"].astype(str)})

    ph_losers = (
        members.map_batches(m_rows, batch_format="pyarrow")
        .union(scores.map_batches(s_rows, batch_format="pyarrow"))
        .groupby("_ishard")
        .map_groups(attach, batch_format="pandas")
        .groupby("_cshard")
        .map_groups(losers, batch_format="pandas")
    )

    def exact_losers(batch: pa.Table) -> pa.Table:
        dup = pc.equal(batch["is_first"], 0)
        return pa.table(
            {"image_id": pc.cast(batch.filter(dup)["image_id"], pa.string())}
        )

    drop = image_dedup_exact(images_uri).map_batches(
        exact_losers, batch_format="pyarrow"
    ).union(ph_losers)
    imgs = read_dataset(images_uri, columns=["image_id"])
    return anti_join_ids(imgs, drop, "image_id", key_type=pa.string())


def image_phash_clusters(
    images_uri: str, max_hamming: int = 3, driver_pair_cap: int = 2_000_000
) -> rd.Dataset:
    """Cluster labels for EVERY image: cluster_id = min image_id of its
    pHash hamming <= t component, singletons label themselves — the audit
    view of ``image_dedup_survivors`` (the ``minhash_clusters`` analog on
    the image axis). One string-shard exchange attaches the pair-bounded
    member map to the full image table: union(all images as self-labeled
    rows, member rows), group by a hash shard of image_id, per-image MIN
    label (member labels are <= the own id by construction).
    Output: (image_id, cluster_id)."""

    def self_rows(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["image_id"], pa.string())
        return pa.table({"image_id": ids, "cluster_id": ids})

    def shard(batch: pa.Table) -> pa.Table:
        from spiderman_ray.pipelines.text import _shard64_of

        return batch.append_column(
            "_ishard", pa.array(_shard64_of(batch["image_id"].to_pylist()))
        )

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("image_id", sort=False)["cluster_id"].min().reset_index()
        return pd.DataFrame(
            {"image_id": t["image_id"].astype(str),
             "cluster_id": t["cluster_id"].astype(str)}
        )

    members = _phash_member_clusters_ds(images_uri, max_hamming, driver_pair_cap)
    imgs = read_dataset(images_uri, columns=["image_id"]).map_batches(
        self_rows, batch_format="pyarrow"
    )
    return (
        imgs.union(members)
        .map_batches(shard, batch_format="pyarrow")
        .groupby("_ishard")
        .map_groups(min_label, batch_format="pandas")
    )


def validate_summary(images_uri: str) -> pa.Table:
    """Aggregate of decode_validate: totals + failures (0 expected).
    Distributed: per-batch partial counts reduce through Ray's Sum — the
    validation rows never materialize on the driver."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_images": [len(batch)],
                "n_w_bad": [int((~batch["w_ok"]).sum())],
                "n_h_bad": [int((~batch["h_ok"]).sum())],
                "n_phash_bad": [int((~batch["phash_ok"]).sum())],
            }
        )

    agg = decode_validate(images_uri).map_batches(partial, batch_format="pandas").aggregate(
        Sum("n_images", alias_name="n_images"),
        Sum("n_w_bad", alias_name="n_w_bad"),
        Sum("n_h_bad", alias_name="n_h_bad"),
        Sum("n_phash_bad", alias_name="n_phash_bad"),
    )
    return pa.table({k: pa.array([int(agg[k])], type=pa.int64()) for k in
                     ("n_images", "n_w_bad", "n_h_bad", "n_phash_bad")})


class ImageStats:
    """Actor-pool stage: per-image channel statistics in EXACT integer
    arithmetic (mean_{r,g,b}_x1000 = floor(channel_sum * 1000 / n_px)) so
    the distributed output hash-matches a sequential recomputation over the
    reference-loop oracle's rows — the same independence argument as
    crawl_thumbnails. Real decoded pixels (own codecs), real actor-pool
    plumbing; integer stats avoid any float-summation order contract."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "w": [], "h": [], "mean_r_x1000": [],
               "mean_g_x1000": [], "mean_b_x1000": []}
        for row in batch.to_pylist():
            px = decode_image(row["bytes"])
            h, w = px.shape[:2]
            n = h * w
            sums = px.reshape(-1, px.shape[2]).astype(np.int64).sum(axis=0)
            out["image_id"].append(row["image_id"])
            out["w"].append(w)
            out["h"].append(h)
            out["mean_r_x1000"].append(int(sums[0]) * 1000 // n)
            out["mean_g_x1000"].append(int(sums[1]) * 1000 // n)
            out["mean_b_x1000"].append(int(sums[2]) * 1000 // n)
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], type=pa.string()),
                "w": pa.array(out["w"], type=pa.int64()),
                "h": pa.array(out["h"], type=pa.int64()),
                "mean_r_x1000": pa.array(out["mean_r_x1000"], type=pa.int64()),
                "mean_g_x1000": pa.array(out["mean_g_x1000"], type=pa.int64()),
                "mean_b_x1000": pa.array(out["mean_b_x1000"], type=pa.int64()),
            }
        )


def image_stats(images_uri: str, concurrency: int | None = None,
                batch_size: int = 64) -> rd.Dataset:
    """Per-image channel means over the crawled image table (the feature-
    extraction shape of the multimodal brief, on REAL decoded pixels)."""
    from spiderman_ray.pipelines import pool_size

    return read_dataset(images_uri, columns=["image_id", "bytes"]).map_batches(
        ImageStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency or 10**6),
        num_cpus=1,
    )


class _CurateImagesStage:
    """Actor-pool stage of ``curate_images``: decode, validate stored
    (w, h, phash) against recomputed values, gate captions (min tokens +
    dirty words — the same ``url_check`` word list the text ``curate``
    uses), and fingerprint content — ONE pass over the wide rows, fused
    like text._CurateStage. Emits candidates only."""

    def __init__(self, min_caption_tokens: int = 2,
                 align_min_x1e6: int | None = None,
                 min_sharpness_x100: int | None = None):
        self.min_tokens = min_caption_tokens
        self.dirty = ("drop", "null")
        self.align_min = align_min_x1e6
        self.min_sharpness = min_sharpness_x100
        if align_min_x1e6 is not None:
            # the dual-encoder "model" binds once per actor (a real CLIP
            # gate loads its weights here; functions/alignment.py)
            from spiderman_ray.functions.alignment import align_score_x1e6

            self._align = align_score_x1e6
        if min_sharpness_x100 is not None:
            from spiderman_ray.functions.imaging import quality_features_int

            self._quality = quality_features_int

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        out = {"image_id": [], "w": [], "h": [], "n_caption_tokens": [], "fp": []}
        for row in batch.to_pylist():
            px = decode_image(row["bytes"])
            h, w = px.shape[:2]
            if w != row["w"] or h != row["h"] or phash64(px) != row["phash"]:
                continue  # corrupt / mislabeled rows never enter the corpus
            cap = row["caption"]
            toks = cap.split(" ")
            if len(toks) < self.min_tokens or any(d in cap for d in self.dirty):
                continue
            # LAION-style alignment gate BEFORE dedup: a low-alignment
            # copy must not shadow a well-captioned duplicate
            if self.align_min is not None and self._align(px, cap) < self.align_min:
                continue
            # blur gate BEFORE dedup for the same reason: a blurry copy
            # must not shadow a sharp duplicate (gates are conjunctive, so
            # their relative order never changes the surviving set)
            if (self.min_sharpness is not None
                    and self._quality(px)["sharpness_x100"] < self.min_sharpness):
                continue
            out["image_id"].append(row["image_id"])
            out["w"].append(w)
            out["h"].append(h)
            out["n_caption_tokens"].append(len(toks))
            out["fp"].append(hashlib.md5(row["bytes"]).hexdigest())
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], type=pa.string()),
                "w": pa.array(out["w"], type=pa.int64()),
                "h": pa.array(out["h"], type=pa.int64()),
                "n_caption_tokens": pa.array(out["n_caption_tokens"], type=pa.int64()),
                "fp": pa.array(out["fp"], type=pa.string()),
            }
        )


def curate_images(
    images_uri: str,
    min_caption_tokens: int = 2,
    max_hamming: int = 3,
    driver_pair_cap: int = 2_000_000,
    align_min_x1e6: int | None = None,
    min_sharpness_x100: int | None = None,
) -> rd.Dataset:
    """The multimodal curation FLAGSHIP — the image-axis ``curate``: the
    end-to-end pass a multimodal training-data user runs over a crawled
    image+caption table, as one streaming Dataset:

    1. decode + validate + caption gates + content fingerprint fused in
       ONE actor-pool pass (``_CurateImagesStage`` — wide binary rows are
       read once, small batches);
    2. exact content dedup: first image_id per md5(bytes) wins, fp-shard
       pattern (keys O(parallelism), one exchange);
    3. perceptual near-dup removal: pHash-component-dominated ids
       (``_phash_member_clusters_ds``, size-gated) anti-joined via the
       string-keyed ``anti_join_ids``.

    Output: (image_id, w, h, n_caption_tokens) — the curated-set manifest.
    Nothing corpus-sized ever lands on the driver."""
    from spiderman_ray.pipelines import pool_size
    from spiderman_ray.pipelines.text import _shard64_of, anti_join_ids

    def shard(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_fshard", pa.array(_shard64_of(batch["fp"].to_pylist()))
        )

    def first_per_fp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fp", "image_id"], kind="mergesort")
        keep = g["fp"].ne(g["fp"].shift())  # hex-string fps: exact compare
        return g.loc[keep, ["image_id", "w", "h", "n_caption_tokens"]]

    candidates = (
        read_dataset(images_uri)
        .map_batches(
            _CurateImagesStage,
            fn_constructor_args=(min_caption_tokens, align_min_x1e6,
                                 min_sharpness_x100),
            batch_format="pyarrow",
            batch_size=64,
            concurrency=pool_size(10**6),
            num_cpus=1,
        )
        .map_batches(shard, batch_format="pyarrow")
        .groupby("_fshard")
        .map_groups(first_per_fp, batch_format="pandas")
    )

    members = _phash_member_clusters_ds(images_uri, max_hamming, driver_pair_cap)

    def dominated(batch: pa.Table) -> pa.Table:
        m = pc.not_equal(batch["image_id"], batch["cluster_id"])
        return pa.table(
            {"image_id": pc.cast(batch.filter(m)["image_id"], pa.string())}
        )

    return anti_join_ids(
        candidates,
        members.map_batches(dominated, batch_format="pyarrow"),
        "image_id",
        payload={"w": pa.int64(), "h": pa.int64(), "n_caption_tokens": pa.int64()},
        key_type=pa.string(),
    )


def image_dedup_exact(images_uri: str) -> rd.Dataset:
    """Exact CONTENT dedup over crawled images: md5 of the stored bytes,
    first occurrence per content fp in image_id order wins — the byte-
    level multimodal sibling of text dedup_exact (pHash handles near-dups;
    this catches identical payloads under different URLs). fp-shard
    pattern (hash64(fp) % 64); string fps compare exactly in the sorted
    first-marking pass. Output: (image_id, content_fp, is_first) — also a
    byte-exactness check of the whole image store against the reference-
    loop oracle's VALUES pin."""
    import hashlib

    from spiderman_ray.pipelines.text import _shard64_of

    def fp(batch: pa.Table) -> pa.Table:
        fps = [hashlib.md5(b).hexdigest() for b in batch["bytes"].to_pylist()]
        return pa.table(
            {
                "image_id": batch["image_id"],
                "content_fp": pa.array(fps, type=pa.string()),
                "_fshard": pa.array(_shard64_of(fps)),
            }
        )

    def firsts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["content_fp", "image_id"], kind="mergesort")
        # hex-STRING fps: shift-compare is exact (int64 fps would need
        # text._mark_chunk_firsts — see its float-coercion note)
        first = g["content_fp"].ne(g["content_fp"].shift())
        return pd.DataFrame(
            {
                "image_id": g["image_id"].to_numpy(),
                "content_fp": g["content_fp"].to_numpy(),
                "is_first": first.to_numpy().astype("int64"),
            }
        )

    return (
        read_dataset(images_uri, columns=["image_id", "bytes"])
        .map_batches(fp, batch_format="pyarrow")
        .groupby("_fshard")
        .map_groups(firsts, batch_format="pandas")
    )


class ImageQuality:
    """Actor-pool stage: all-integer curation features (Laplacian-variance
    sharpness, contrast, brightness, gray-level count, median luma) on REAL
    decoded pixels — the blur/exposure/degenerate gates an image training
    corpus filters on. Exact integer arithmetic end to end
    (functions.imaging.quality_features_int), so the distributed output
    hash-matches a sequential recompute over the reference-loop oracle's
    rows — the crawl_image_stats independence argument."""

    _KEYS = ("sharpness_x100", "contrast_x100", "brightness_x1000",
             "n_gray_levels", "gray_p50")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from spiderman_ray.functions.imaging import quality_features_int

        out: dict[str, list] = {"image_id": []}
        for k in self._KEYS:
            out[k] = []
        for row in batch.to_pylist():
            feats = quality_features_int(decode_image(row["bytes"]))
            out["image_id"].append(row["image_id"])
            for k in self._KEYS:
                out[k].append(feats[k])
        cols = {"image_id": pa.array(out["image_id"], type=pa.string())}
        for k in self._KEYS:
            cols[k] = pa.array(out[k], type=pa.int64())
        return pa.table(cols)


def image_quality(images_uri: str, concurrency: int | None = None,
                  batch_size: int = 64) -> rd.Dataset:
    """Per-image quality features over the crawled image table (the
    curation-gate shape of the multimodal brief, on real decoded pixels).
    Small batch_size: rows are wide (binary payloads)."""
    from spiderman_ray.pipelines import pool_size

    return read_dataset(images_uri, columns=["image_id", "bytes"]).map_batches(
        ImageQuality,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency or 10**6),
        num_cpus=1,
    )


def aspect_buckets(images_uri: str, batch: int = 8) -> rd.Dataset:
    """Aspect-ratio bucketed batch packing — the SDXL-style training-loader
    layout: assign each image its nearest aspect bucket (exact integer
    argmin, functions.imaging.aspect_bucket_ids), then give every image its
    position in the image_id-ordered stream OF ITS BUCKET, so batch_idx =
    seq // batch groups same-aspect images into loader batches.

    Distributed shape (the pack_offsets two-pass prefix sum, per bucket):
    sort by (bucket, image_id) — range partitioning makes blocks disjoint
    and ordered — then ONE tiny (bucket, first_id, count) summary row per
    (block, bucket), cumsum per bucket on the driver (O(blocks x ladder),
    never O(images)), then each block adds its per-bucket base to a
    within-block cumcount. The corpus never touches driver memory; there is
    NO per-bucket map_groups (a bucket is corpus-sized at scale)."""
    from spiderman_ray.functions.imaging import ASPECT_LABELS, aspect_bucket_ids

    labels = np.asarray(ASPECT_LABELS, dtype=object)

    def assign_bucket(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy().astype(np.int64)
        h = t["h"].to_numpy().astype(np.int64)
        ids = aspect_bucket_ids(w, h)
        return pa.table(
            {
                "image_id": t["image_id"],
                "w": pa.array(w, type=pa.int64()),
                "h": pa.array(h, type=pa.int64()),
                "bucket": pa.array(labels[ids], type=pa.string()),
            }
        )

    sorted_ds = (
        read_dataset(images_uri, columns=["image_id", "w", "h"])
        .map_batches(assign_bucket, batch_format="pyarrow")
        .sort(["bucket", "image_id"])
        .materialize()
    )

    def summarize(t: pa.Table) -> pa.Table:
        # one row per bucket present in this block: (bucket, first image_id
        # of that bucket here, count) — blocks of a bucket are ordered by
        # that first id (image_id is unique), so the driver cumsum is exact
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], type=pa.string()),
                             "first_id": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        df = t.select(["bucket", "image_id"]).to_pandas()
        g = df.groupby("bucket", sort=True)["image_id"]
        return pa.table(
            {
                "bucket": pa.array(g.min().index.to_numpy(dtype=object), type=pa.string()),
                "first_id": pa.array(g.min().to_numpy(dtype=object), type=pa.string()),
                "n": pa.array(g.size().to_numpy().astype(np.int64)),
            }
        )

    summary = (
        sorted_ds.map_batches(summarize, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # O(blocks x ladder) rows by construction
        .sort_values(["bucket", "first_id"])
    )
    summary["base"] = summary.groupby("bucket")["n"].cumsum() - summary["n"]
    base = dict(zip(zip(summary["bucket"], summary["first_id"]), summary["base"]))

    def assign_seq(t: pa.Table, base=base, cap=batch) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "w": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.int64()),
                             "bucket": pa.array([], type=pa.string()),
                             "seq": pa.array([], type=pa.int64()),
                             "batch_idx": pa.array([], type=pa.int64()),
                             "slot": pa.array([], type=pa.int64())})
        df = t.to_pandas()
        # within-block cumcount per bucket + that bucket's base for THIS
        # block (keyed by its first image_id here — unique per block)
        cum = df.groupby("bucket").cumcount().to_numpy()
        firsts = df.groupby("bucket")["image_id"].transform("min")
        seq = cum + np.fromiter(
            (base[(b, f)] for b, f in zip(df["bucket"], firsts)),
            dtype=np.int64, count=len(df),
        )
        return pa.table(
            {
                "image_id": pa.array(df["image_id"].to_numpy(dtype=object), type=pa.string()),
                "w": pa.array(df["w"].to_numpy().astype(np.int64)),
                "h": pa.array(df["h"].to_numpy().astype(np.int64)),
                "bucket": pa.array(df["bucket"].to_numpy(dtype=object), type=pa.string()),
                "seq": pa.array(seq, type=pa.int64()),
                "batch_idx": pa.array(seq // cap, type=pa.int64()),
                "slot": pa.array(seq % cap, type=pa.int64()),
            }
        )

    return sorted_ds.map_batches(assign_seq, batch_format="pyarrow", batch_size=None)


def phash_search(images_uri: str, n_queries: int = 4, k: int = 5) -> rd.Dataset:
    """Image retrieval by perceptual hash — hamming-distance top-k per
    query image (the image-axis sibling of ``bm25_search``/`
    ``ann_cosine_topk``): queries are the ``n_queries``
    lexicographically-first image_ids (a fixed workload, the ES_TERMS
    convention); every batch XORs its phashes against the tiny
    broadcast query vector and popcounts vectorized (uint8-view
    unpackbits — no per-row Python), keeps a per-batch top-k combiner,
    and one id-shard reduce resolves the global top-k by (hamming asc,
    image_id asc). Output: (query_id, image_id, hamming, rank)."""
    from spiderman_ray.pipelines.text import _shard64_of

    qtab = (
        read_dataset(images_uri, columns=["image_id", "phash"])
        .sort("image_id")
        .limit(n_queries)
        .to_pandas()
    )
    q_ids = list(qtab["image_id"])
    q_ph = qtab["phash"].to_numpy().astype(np.int64).view(np.uint64)

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        ids = np.asarray(batch["image_id"].to_pylist(), dtype=object)
        ph = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        out = {"query_id": [], "image_id": [], "hamming": []}
        for qi, qp in zip(q_ids, q_ph):
            x = ph ^ qp
            ham = np.unpackbits(x.view(np.uint8)).reshape(len(x), 8 * 8).sum(axis=1)
            mask = ids != qi
            cids, chs = ids[mask], ham[mask].astype(np.int64)
            if len(cids) > k:
                order = np.lexsort((cids, chs))[:k]
                cids, chs = cids[order], chs[order]
            out["query_id"].extend([qi] * len(cids))
            out["image_id"].extend(cids)
            out["hamming"].extend(chs.tolist())
        return pd.DataFrame(out)

    def shard(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_qshard", pa.array(_shard64_of(batch["query_id"].to_pylist()))
        )

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["query_id", "hamming", "image_id"], kind="mergesort")
        g["rank"] = g.groupby("query_id", sort=False).cumcount() + 1
        g = g[g["rank"] <= k]
        return g[["query_id", "image_id", "hamming", "rank"]].astype(
            {"hamming": "int64", "rank": "int64"}
        )

    return (
        read_dataset(images_uri, columns=["image_id", "phash"])
        .map_batches(local_topk, batch_format="pyarrow")
        .map_batches(shard, batch_format="pyarrow")
        .groupby("_qshard")
        .map_groups(reduce_topk, batch_format="pandas")
    )
