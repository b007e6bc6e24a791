"""Deduplication for web-text corpora: exact, MinHash+LSH, SimHash, n-gram
Jaccard — training-data-pipeline operators (driver prompt requirement;
no reference counterpart).

Scale design:
- exact: hash-groupBy on sha2(text) — one shuffle, keep min(id) per hash.
- n-gram Jaccard: shingle → explode → self-join on shingle with a
  frequency cap (hot shingles are dropped from CANDIDATE GENERATION only,
  standard df-cap trick to bound the join fan-out) → per-pair intersection
  count → exact Jaccard via |A∩B|/(|A|+|B|−|A∩B|). All JVM-side.
- MinHash: k independent min-hashes as k conditional aggregates over the
  exploded shingles (min(xxhash64(shingle, seed_i))); LSH bands hash
  signature slices; candidate pairs from band-bucket self-join; estimated
  Jaccard = fraction of equal signature components.
- SimHash: 64-bit bit-vote over token hashes inside an Arrow-batched
  pandas UDF (numpy bit ops, no per-row Python at the Spark layer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F


def _words(text_col: str) -> Column:
    return F.split(
        F.trim(F.lower(F.regexp_replace(F.col(text_col), r"[^\p{L}\p{N} ]", " "))),
        r" +",
    )


def shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (pure SQL)."""
    w = _words(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content hash: (content_hash, n_dups,
    keep_id). keep_id = min id (deterministic survivor)."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 100,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing a (non-hot)
    shingle. Output: (id_a, id_b, jaccard) with id_a < id_b,
    jaccard ≥ threshold."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("sh")
    ).filter(F.col("sh") != "")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    freq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    # Candidate GENERATION only uses rare shingles (df-cap bounds the join
    # fan-out); the Jaccard itself is then recomputed EXACTLY over the full
    # shingle sets of each candidate pair, so hot shared shingles do not
    # deflate the score — only pairs sharing *no* rare shingle are missed.
    rare = sh.join(F.broadcast(freq.filter(F.col("df") <= max_shingle_freq)), "sh")
    cand = (
        rare.alias("a")
        .join(rare.alias("b"), on="sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = (
        cand.join(sh.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(
            sh.alias("sb"),
            (F.col("id_b") == F.col("sb.id")) & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 64, shingle_n: int = 3
) -> DataFrame:
    """(id, sig: array<bigint>) — k min-hashes as k conditional aggregates."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, shingle_n)).alias("sh")
    ).filter(F.col("sh") != "")
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}") for i in range(n_hashes)
    ]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    est_threshold: float = 0.5,
) -> DataFrame:
    """LSH near-dup candidates: band-bucket join over minhash signatures.

    Output: (id_a, id_b, est_jaccard) — est = fraction of equal signature
    components; pairs surfaced if ANY band matches (standard banding).
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    ) / F.lit(n_hashes)
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= est_threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document via an Arrow-batched pandas UDF."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            tokens = t.lower().split()
            if not tokens:
                continue
            # FNV-1a per token, vectorized bit votes
            hs = np.array([_fnv1a64(tok) for tok in tokens], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in range(64):
                if votes[b] > 0:
                    sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("simhash"))


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ k.

    Candidates come from equality on one of ``max_hamming + 1`` bit-chunks
    of the 64-bit signature — by pigeonhole, any pair with ≤ max_hamming
    differing bits shares at least one whole chunk, so recall is 100% by
    construction (the r1 version hardcoded 4×16-bit chunks, silently
    missing pairs with 4..k diffs spread across all chunks).

    Scale note: chunk width = 64/(k+1) bits; selectivity of the bucket
    join degrades as k grows (width 6 ⇒ 1/64 collision rate). For large k
    on a big corpus prefer a smaller k or MinHash-LSH; the chunk join is
    still bounded (no all-pairs).
    """
    if not 0 <= max_hamming <= 15:
        raise ValueError(
            f"max_hamming={max_hamming}: the chunk-equality guarantee needs "
            "max_hamming+1 <= 16 chunks of >= 4 bits; use MinHash-LSH beyond."
        )
    n_chunks = max(2, max_hamming + 1)
    base, extra = divmod(64, n_chunks)
    widths = [base + (1 if i < extra else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    sig = simhash_signatures(df, id_col, text_col)
    chunks = sig.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright("simhash", offsets[c])
                      .bitwiseAND(F.lit((1 << widths[c]) - 1)).alias("val"))
            for c in range(n_chunks)
        ])).alias("cc"),
    ).select("id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))
    cand = (
        chunks.alias("a").join(chunks.alias("b"), on=["chunk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("s_a"), F.col("b.simhash").alias("s_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")
