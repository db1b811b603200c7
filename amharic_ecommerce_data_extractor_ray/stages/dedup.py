"""Deduplication operators over document tables — the large-scale
training-data-pipeline extensions (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine).

All operators follow the same scale shape: vectorized per-batch signature
computation (map_batches, stateless tasks) → shuffle only the *signatures*
(tiny) via groupby → verify candidates inside the group.  (MinHash: Broder,
"On the resemblance and containment of documents", 1997; LSH banding:
Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch.3; SimHash:
Charikar, "Similarity estimation techniques from rounding algorithms",
STOC 2002.)  Raw text/vectors
never take part in an all-to-all exchange except where verification genuinely
needs them (and then only for candidate groups).

Determinism: all hashing is seeded (md5/sha-based, no PYTHONHASHSEED
dependence), so outputs are stable across runs and cluster sizes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- exact dedup

def exact_dedup_groups(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: hash-partition on content hash, keep lowest id per group.

    Returns one row per distinct text: (text_sha256, keep_id, n_dups).
    Only (hash, id) pairs shuffle — the combiner keeps per-batch minima first.
    """

    def partials(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ids = b[id_col].to_pylist()
        acc: dict[str, list[int]] = {}
        for t, i in zip(texts, ids):
            h = hashlib.sha256((t or "").encode("utf-8")).hexdigest()
            a = acc.get(h)
            if a is None:
                acc[h] = [i, 1]
            else:
                a[0] = min(a[0], i)
                a[1] += 1
        keys = sorted(acc)
        return pa.table({
            "text_sha256": keys,
            "keep_id": pa.array([acc[k][0] for k in keys], pa.int64()),
            "n_dups": pa.array([acc[k][1] for k in keys], pa.int64()),
        })

    from ray.data.aggregate import Min, Sum

    # native vectorized merge — no per-group Python (the hash groupby has one
    # group per distinct text, which is nearly every row)
    return (docs_ds.map_batches(partials, batch_format="pyarrow")
            .repartition(16)
            .groupby("text_sha256")
            .aggregate(Min("keep_id", alias_name="keep_id"),
                       Sum("n_dups", alias_name="n_dups")))


# ------------------------------------------------------------- minhash + LSH

def _stable_u64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingles(text: str, k: int) -> set[int]:
    toks = text.split()
    if len(toks) < k:
        return {_stable_u64(" ".join(toks))} if toks else set()
    return {_stable_u64(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)}


def _minhash_sig(sh: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not sh:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    # (a*x + b) mod p, elementwise min over shingles
    prods = (a[None, :] * vals[:, None] + b[None, :]) % _MERSENNE
    return prods.min(axis=0)


def minhash_lsh_pairs(docs_ds, *, text_col="text", id_col="doc_id",
                      num_perm=64, bands=16, shingle_k=3, threshold=0.5,
                      seed=42):
    """Near-duplicate pairs via MinHash + LSH banding.

    map_batches: shingle → minhash signature → explode to
    (band_id, band_hash, doc_id, signature) rows; groupby (band_id, band_hash)
    buckets candidates; pairs verified by estimated Jaccard (signature
    agreement) ≥ threshold.  Output: (id_a, id_b, jaccard_est) with id_a <
    id_b, deduplicated across bands via a final groupby.
    """
    a_par, b_par = _minhash_params(num_perm, seed)
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        out_band, out_bhash, out_id, out_sig = [], [], [], []
        for t, i in zip(texts, ids):
            sig = _minhash_sig(_shingles(t or "", shingle_k), a_par, b_par)
            sig_bytes = sig.tobytes()
            for bidx in range(bands):
                chunk = sig[bidx * rows_per_band:(bidx + 1) * rows_per_band]
                bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_band.append(bidx)
                out_bhash.append(bh)
                out_id.append(i)
                out_sig.append(sig_bytes)
        return pa.table({
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_bhash, pa.string()),
            id_col: pa.array(out_id, pa.int64()),
            "sig": pa.array(out_sig, pa.binary()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "jaccard_est": pd.Series(dtype="float64")})
        rows = sorted(zip(g[id_col].tolist(), g["sig"].tolist()))
        out = []
        for x in range(len(rows)):
            ia, sa = rows[x]
            va = np.frombuffer(sa, dtype=np.uint64)
            for y in range(x + 1, len(rows)):
                ib, sb = rows[y]
                if ia == ib:
                    continue
                vb = np.frombuffer(sb, dtype=np.uint64)
                est = float((va == vb).mean())
                if est >= threshold:
                    out.append({"id_a": ia, "id_b": ib, "jaccard_est": est})
        return pd.DataFrame(out) if out else pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "jaccard_est": pd.Series(dtype="float64")})

    import ray
    from ray.data.aggregate import Count, Max

    # materialize: band_rows feeds TWO consumers (occupancy counts, then the
    # hot-bucket pair search) — without it the shingle+minhash map runs twice;
    # and ending the map plan before the shuffles avoids the operator-
    # reservation starvation documented in stages/scorecard.py.
    band_rows = docs_ds.map_batches(to_bands,
                                    batch_format="pyarrow").materialize()

    # Hot-bucket prefilter: count bucket occupancy with a NATIVE aggregate
    # over (band_id, band_hash) only — at scale almost every bucket is a
    # singleton, and running per-group Python over singletons dominates cost.
    # The collided-bucket set is proportional to the number of near-dup pairs
    # (small), so broadcasting it is sound.
    counts = (band_rows.select_columns(["band_id", "band_hash"])
              .repartition(16)
              .groupby(["band_id", "band_hash"])
              .aggregate(Count(alias_name="n")))
    hot_df = (counts
              .map_batches(lambda b: b.filter(
                  pc.greater_equal(b["n"], 2)),
                  batch_format="pyarrow")
              .to_pandas())
    hot = set(zip(hot_df["band_id"], hot_df["band_hash"]))
    if not hot:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard_est": pa.array([], pa.float64())}))
    hot_ref = ray.put(hot)

    def keep_hot(b: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        mask = [
            (bi, bh) in hs
            for bi, bh in zip(b["band_id"].to_pylist(),
                              b["band_hash"].to_pylist())
        ]
        return b.filter(pa.array(mask))

    pairs = (band_rows.map_batches(keep_hot, batch_format="pyarrow")
             .groupby(["band_id", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pandas"))
    # a pair can collide in several bands — native dedup (est is identical
    # across bands, Max is a no-op merge)
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("jaccard_est", alias_name="jaccard_est"))


# ------------------------------------------------------------------- simhash

def simhash_batch(texts: list[str], nbits: int = 64) -> list[int]:
    out = []
    for t in texts:
        toks = (t or "").split()
        if not toks:
            out.append(0)
            continue
        acc = np.zeros(nbits, dtype=np.int64)
        for tok in toks:
            h = _stable_u64(tok)
            bits = (h >> np.arange(nbits, dtype=np.uint64)) & 1
            acc += np.where(bits.astype(bool), 1, -1)
        sh = 0
        for bit_idx in np.nonzero(acc > 0)[0]:
            sh |= 1 << int(bit_idx)
        out.append(sh)
    return out


def simhash_dedup(docs_ds, *, text_col="text", id_col="doc_id",
                  hamming_threshold=3, prefix_bits=16):
    """SimHash near-dup: 64-bit signature per doc; block on the top
    ``prefix_bits`` bits (cheap LSH for small hamming distance), verify
    hamming ≤ threshold within blocks.  Output (id_a, id_b, hamming)."""

    def sig_batch(b: pa.Table) -> pa.Table:
        sigs = simhash_batch(b[text_col].to_pylist())
        block = [s >> (64 - prefix_bits) for s in sigs]
        return pa.table({
            id_col: b[id_col],
            "simhash": pa.array([s - (1 << 63) for s in sigs], pa.int64()),
            "block": pa.array(block, pa.int64()),
        })

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g[id_col].tolist(), g["simhash"].tolist()))
        out = []
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                ham = bin((rows[x][1] ^ rows[y][1]) & ((1 << 64) - 1)).count("1")
                if ham <= hamming_threshold and rows[x][0] != rows[y][0]:
                    out.append({"id_a": rows[x][0], "id_b": rows[y][0],
                                "hamming": ham})
        return pd.DataFrame(out) if out else pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "hamming": pd.Series(dtype="int64")})

    import ray
    from ray.data.aggregate import Count

    # materialize: sigs feeds two consumers (block counts + pair search) —
    # see minhash_lsh_pairs for the rationale
    sigs = docs_ds.map_batches(sig_batch, batch_format="pyarrow").materialize()
    counts = (sigs.select_columns(["block"]).repartition(16)
              .groupby("block").aggregate(Count(alias_name="n")))
    hot_df = (counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"], 2)),
        batch_format="pyarrow").to_pandas())
    hot = set(hot_df["block"])
    if not hot:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64())}))
    hot_ref = ray.put(hot)

    def keep_hot(b: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        mask = [blk in hs for blk in b["block"].to_pylist()]
        return b.filter(pa.array(mask))

    return (sigs.map_batches(keep_hot, batch_format="pyarrow")
            .groupby("block").map_groups(block_pairs, batch_format="pandas"))


# ------------------------------------------------------------ n-gram jaccard

def ngram_jaccard_pairs(docs_ds, *, text_col="text", id_col="doc_id",
                        block_cols=("lang", "source"), n=3, threshold=0.2):
    """Exact n-gram Jaccard within blocks (partitioning assumption: near-dups
    share the block key; at 100 TB the block is the co-location unit)."""

    def project(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in (id_col, text_col, *block_cols)}
        return pa.table(cols)

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g[id_col].tolist(), g[text_col].tolist()))
        grams = [frozenset(" ".join((t or "").split()[i:i + n])
                           for i in range(max(0, len((t or "").split()) - n + 1)))
                 for _, t in rows]
        out = []
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                gx, gy = grams[x], grams[y]
                if not gx and not gy:
                    continue
                j = len(gx & gy) / len(gx | gy)
                if j >= threshold:
                    out.append({"id_a": rows[x][0], "id_b": rows[y][0],
                                "jaccard": round(j, 6)})
        return pd.DataFrame(out) if out else pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")})

    return (docs_ds.map_batches(project, batch_format="pyarrow")
            .groupby(list(block_cols)).map_groups(block_pairs,
                                                  batch_format="pandas"))


# ---------------------------------------------------- embedding cosine dedup

def embedding_cosine_pairs(emb_ds, *, vec_col="embedding", id_col="vec_id",
                           block_col="label", threshold=0.99):
    """Embedding near-dup: cosine ≥ threshold within blocks (label buckets —
    the IVF-style partitioning assumption).  Vectorized: per-group matmul."""

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cos = unit @ unit.T
        ia, ib = np.nonzero(np.triu(cos >= threshold, k=1))
        return pd.DataFrame({
            "id_a": ids[ia].astype("int64"),
            "id_b": ids[ib].astype("int64"),
            "cosine": np.round(cos[ia, ib], 6),
        })

    return emb_ds.groupby(block_col).map_groups(block_pairs,
                                                batch_format="pandas")
