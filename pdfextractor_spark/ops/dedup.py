"""Corpus-scale deduplication operators for training-data pipelines.

All operators are expressed as native DataFrame plans (shuffle on the dedup
key only; no Python in the hot path) except where hashing semantics require a
vectorized Pandas UDF. At 100 TB the groupBy keys here are hashes/bands, so
the shuffles are uniform by construction (no skew salting needed).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

__all__ = [
    "exact_dedup",
    "exact_dup_stats",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "connected_components",
    "near_dedup",
]

# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy, keep min id per content hash
# ---------------------------------------------------------------------------


def _content_key(text_col: str, normalize: bool):
    if normalize:
        from .cleaning import normalize_for_hash
        return F.md5(normalize_for_hash(text_col))
    return F.md5(F.col(text_col))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                normalize: bool = False) -> DataFrame:
    """Keep one row per exact text (md5 key, lowest id wins). Single shuffle
    on the 128-bit content hash — uniform by construction.

    ``normalize=True`` keys on the CCNet-style normalized form
    (``ops.cleaning.normalize_for_hash``: case/accents/digits/punctuation
    folded) instead of the raw bytes — same plan, the key transform fuses
    into the hash's map stage. The kept row's text is unchanged."""
    w = Window.partitionBy(_content_key(text_col, normalize)) \
        .orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")


def exact_dup_stats(df: DataFrame, text_col: str = "text", group_col: str = "lang",
                    normalize: bool = False) -> DataFrame:
    """Per-group exact-duplicate statistics (map-side partial agg friendly)."""
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.countDistinct(_content_key(text_col, normalize)).alias("distinct_docs"),
        )
        .withColumn("duplicate_docs", F.col("total_docs") - F.col("distinct_docs"))
        .orderBy(group_col)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup: shingle -> minhash -> band -> bucket self-join
# ---------------------------------------------------------------------------

def _minhash_params(num_hashes: int, seed: int = 7):
    """Random odd 64-bit multipliers for multiply-shift universal hashing
    (numpy-vectorizable: uint64 multiply wraps mod 2^64)."""
    import random

    rng = random.Random(seed)
    return [rng.randrange(1, 1 << 64) | 1 for _ in range(num_hashes)]


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_hashes: int = 64, shingle_k: int = 5) -> DataFrame:
    """(id, signature array<long>) via a vectorized Pandas UDF.

    Word-level k-shingles hashed with the stable ``zlib.crc32`` over utf-8,
    min-hashed under ``num_hashes`` multiply-shift draws (fixed seed). The
    per-document min over all shingles x hashes is one numpy uint64
    broadcast-multiply — no Python inner loop."""
    import numpy as np

    params = np.array(_minhash_params(num_hashes), dtype=np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        import zlib

        zeros = [0] * num_hashes
        out = []
        for t in texts:
            if not isinstance(t, str) or not t:
                out.append(zeros)
                continue
            words = t.lower().split()
            shingles = (
                {" ".join(words[i : i + shingle_k]) for i in range(len(words) - shingle_k + 1)}
                if len(words) >= shingle_k
                else {" ".join(words)}
            )
            h = np.fromiter(
                (zlib.crc32(s.encode("utf-8")) for s in shingles),
                dtype=np.uint64, count=len(shingles),
            )
            # (num_hashes, n_shingles) wrap-around multiply, min per row;
            # >>1 keeps the value in the positive signed-long range
            sig = (params[:, None] * h[None, :]).min(axis=1) >> np.uint64(1)
            out.append(sig.astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _sig(F.col(text_col)).alias("signature"))


def minhash_lsh_pairs(signatures: DataFrame, num_bands: int = 16,
                      sig_len: int | None = None, max_bucket: int = 1000,
                      log_dropped: bool = False) -> DataFrame:
    """Candidate near-dup pairs via banding: equal band-hash -> bucket ->
    in-bucket pair expansion.

    Single pass over the (expensive) signature input: ONE shuffle keyed on
    (band, band_hash), pairs generated map-side from the collected bucket.
    The previous self-join formulation evaluated the signature UDF twice
    (once per join side) and shuffled both sides.

    ``sig_len`` skips the probe job when the caller knows ``num_hashes``.
    ``max_bucket`` is an explicit skew guard: a bucket of b ids emits
    b(b-1)/2 pairs, so a degenerate flood (e.g. near-empty boilerplate all
    sharing one band) is dropped rather than exploding quadratically — run
    exact dedup first, which removes identical-text floods.

    ``log_dropped=True`` makes the guard observable instead of silent: the
    bucket aggregate is persisted (so the signature UDF still runs once),
    oversized buckets are counted eagerly, and a warning with the dropped
    bucket count + max size is emitted so callers can detect degraded
    recall (e.g. a boilerplate flood) rather than discovering it later."""
    if sig_len is None:
        sig_len_row = signatures.select(F.size("signature").alias("n")).limit(1).collect()
        sig_len = sig_len_row[0]["n"] if sig_len_row else 0
    rows_per_band = max(1, sig_len // num_bands)
    banded = signatures.select(
        "id",
        F.posexplode(
            F.array(*[
                F.xxhash64(F.lit(b), F.slice("signature", b * rows_per_band + 1, rows_per_band))
                for b in range(num_bands)
            ])
        ).alias("band", "band_hash"),
    )
    buckets_all = banded.groupBy("band", "band_hash").agg(
        F.array_sort(F.collect_set("id")).alias("ids")
    ).where(F.size("ids") >= 2)
    if log_dropped:
        buckets_all = buckets_all.persist()
        over = buckets_all.where(F.size("ids") > max_bucket).agg(
            F.count(F.lit(1)).alias("n"), F.max(F.size("ids")).alias("biggest")
        ).collect()[0]
        if over["n"]:
            import warnings

            warnings.warn(
                f"minhash_lsh_pairs: dropped {over['n']} LSH bucket(s) larger than "
                f"max_bucket={max_bucket} (largest={over['biggest']}); near-dup recall "
                "is degraded for those documents — run exact_dedup first or raise "
                "max_bucket",
                stacklevel=2,
            )
    buckets = buckets_all.where(F.size("ids") <= max_bucket)
    pos = buckets.select(F.posexplode("ids").alias("i", "id_a"), F.col("ids"))
    return (
        pos.select(
            "id_a",
            F.explode(F.slice(F.col("ids"), F.col("i") + F.lit(2),
                              F.greatest(F.size("ids") - F.col("i") - 1, F.lit(0)))).alias("id_b"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) near-dup
# ---------------------------------------------------------------------------


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word features. Bit accumulation is a single numpy
    unpack + weighted sum per document (the naive per-word x per-bit Python
    loop is ~20x slower at corpus scale)."""
    import numpy as np

    bit_idx = np.arange(64, dtype=np.uint64)

    @pandas_udf(LongType())
    def _sim(texts: pd.Series) -> pd.Series:
        import zlib
        from collections import Counter

        out = []
        for t in texts:
            if not isinstance(t, str) or not t:
                out.append(0)
                continue
            counts = Counter(t.lower().split())
            words = list(counts.keys())
            h = np.fromiter(
                (zlib.crc32(w.encode("utf-8"))
                 | (zlib.crc32(w[::-1].encode("utf-8")) << 32) for w in words),
                dtype=np.uint64, count=len(words),
            )
            w8 = np.fromiter(counts.values(), dtype=np.int64, count=len(words))
            bits = ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
            acc = ((2 * bits - 1) * w8[:, None]).sum(axis=0)
            v = int(((acc > 0).astype(np.uint64) << bit_idx).sum())
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _sim(F.col(text_col)).alias("simhash"))


def simhash_dup_pairs(hashes: DataFrame, max_hamming: int = 3, num_blocks: int = 4) -> DataFrame:
    """Hamming-near pairs via block-permuted exact-match buckets: split the
    64-bit hash into ``num_blocks`` blocks; any pair within ``max_hamming``
    (< num_blocks) shares at least one exact block (pigeonhole)."""
    bits_per = 64 // num_blocks
    blocked = hashes.select(
        "id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), b * bits_per).bitwiseAND(F.lit((1 << bits_per) - 1))
            for b in range(num_blocks)
        ])).alias("block", "block_val"),
    )
    # bucket-group + in-bucket expansion: the simhash UDF is evaluated once
    # and shuffled once (the self-join form computed it per join side).
    # array_sort on struct(id, simhash) orders by id, so pairs come out
    # id_a < id_b; max bucket width 2^16 per block value keeps expansion
    # bounded, and hamming filtering happens map-side before the distinct.
    buckets = (
        blocked.groupBy("block", "block_val")
        .agg(F.array_sort(F.collect_set(F.struct("id", "simhash"))).alias("xs"))
        .where(F.size("xs") >= 2)
    )
    pos = buckets.select(F.posexplode("xs").alias("i", "a"), F.col("xs"))
    cand = pos.select(
        F.col("a.id").alias("id_a"), F.col("a.simhash").alias("h_a"),
        F.explode(F.slice(F.col("xs"), F.col("i") + F.lit(2),
                          F.greatest(F.size("xs") - F.col("i") - 1, F.lit(0)))).alias("b"),
    ).select("id_a", "h_a", F.col("b.id").alias("id_b"), F.col("b.simhash").alias("h_b"))
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard (exact, for verification of candidates at small scale)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs (broadcast the pair list
    when verifying an LSH output). Native: split -> transform -> array ops."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "").alias("words"),
    )
    # word n-grams via sequence+transform (no UDF)
    grams = grams.withColumn(
        "grams",
        F.when(
            F.size("words") >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("words") - n),
                    lambda i: F.concat_ws(" ", *[F.element_at("words", (i + k + 1).cast("int")) for k in range(n)]),
                )
            ),
        ).otherwise(F.array(F.concat_ws(" ", "words"))),
    ).select("id", "grams")
    a = grams.alias("a")
    b = grams.alias("b")
    joined = (
        pairs.join(a, pairs["id_a"] == F.col("a.id"))
        .join(b, pairs["id_b"] == F.col("b.id"))
        .select("id_a", "id_b", F.col("a.grams").alias("g_a"), F.col("b.grams").alias("g_b"))
    )
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    return (
        joined.withColumn("jaccard", inter / F.greatest(union, F.lit(1)))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Near-dup clusters: pairs -> connected components -> keep one per cluster
# ---------------------------------------------------------------------------


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(id, component) for every id appearing in ``pairs`` (id_a, id_b).

    Iterative min-label propagation with pointer jumping: each round every
    node takes the minimum label among itself and its neighbors, then labels
    are compressed one hop (``component <- component[component]``), doubling
    the propagation reach per round so a component of diameter d converges
    in O(log d) rounds instead of O(d). Each round is two joins + one
    groupBy (all keyed on uniform ids), with ``localCheckpoint`` truncating
    the growing plan lineage. If ``max_iter`` is exhausted before the fixed
    point (astronomically unlikely at 2^max_iter reach) a warning is raised
    so callers never silently consume split components."""
    edges = pairs.select("id_a", "id_b")
    sym = edges.union(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).distinct()
    labels = (
        sym.select(F.col("id_a").alias("id")).distinct().withColumn("component", F.col("id"))
    ).localCheckpoint()
    n_changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["id_b"] == labels["id"])
            .groupBy(F.col("id_a").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias("component"),
                (F.col("nbr_min").isNotNull() & (F.col("nbr_min") < F.col("component"))).alias("changed"),
            )
        )
        # pointer jump: relabel through the parent's label (component is
        # always an id present in `labels`, so the self-join resolves)
        parent = updated.select(F.col("id").alias("p_id"), F.col("component").alias("p_comp"))
        updated = (
            updated.join(parent, updated["component"] == parent["p_id"], "left")
            .select(
                "id",
                F.coalesce(F.col("p_comp"), F.col("component")).alias("component"),
                "changed",
            )
        ).localCheckpoint()
        n_changed = updated.where("changed").count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    if n_changed != 0:
        import warnings

        warnings.warn(
            f"connected_components: max_iter={max_iter} exhausted before the fixed "
            f"point ({n_changed} labels still changing) — returned components may be "
            "split; raise max_iter",
            stacklevel=2,
        )
    return labels


def near_dedup(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop near-duplicates: for every connected component of the pair graph
    keep only the minimum-id representative. Rows never appearing in a pair
    pass through untouched (left_anti against non-representatives)."""
    comp = connected_components(pairs)
    drop = comp.where(F.col("id") != F.col("component")).select(F.col("id").alias(id_col))
    return df.join(drop, on=id_col, how="left_anti")
