"""Deduplication operators for web-scale corpora.

Beyond the reference's keyed compaction (docs/source/cookbook.rst:519-520,
"compacting/deduplicating the data by some key"), these are the dedup
family a 100 TB training-data pipeline needs: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design notes
------------------
- Everything is expression + shuffle based; no Python in the hot path.
- Candidate generation never does an O(n^2) cross join: exact dedup is a
  hash groupBy; Jaccard candidates come from an inverted shingle index
  (equi-join on shingle); MinHash candidates come from LSH band buckets
  (equi-join on band key); SimHash candidates from fingerprint bands.
- All hashes are md5-derived (``hash32``) so the DuckDB oracle reproduces
  results bit-for-bit; swap to ``xxhash64`` for pure speed when oracle
  parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slipstream_async_spark.functions.text import hash32, shingles

# Fixed MinHash permutation constants: perm_i(h) = (A[i]*h + B[i]) mod P.
# A[i] < 2^18 keeps A*h < 2^50 — exact in signed 64-bit in every engine.
MINHASH_A = [3, 7, 13, 31, 61, 127, 251, 509,
             1021, 2039, 4093, 8191, 16381, 32749, 65521, 131071]
MINHASH_B = [10007 * i + 3 for i in range(16)]
MINHASH_P = 4294967311  # smallest prime > 2^32
N_PERMS = 16
BAND_ROWS = 4  # 4 bands x 4 rows


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep the smallest id.

    One shuffle on a 128-bit content hash (never on the full text — at
    100 TB the shuffle must move 16-byte keys, not documents).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingle_sets(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, distinct k-shingle array) per document."""
    return df.select(
        F.col(id_col), shingles(text_col, k).alias("sh")
    )


def _verified_pairs(cand: DataFrame, sets: DataFrame, id_col: str,
                    threshold: float) -> DataFrame:
    """Join candidate (id_a, id_b) pairs back to shingle sets and keep
    pairs with exact Jaccard >= threshold.
    """
    a = sets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_ngram_jaccard(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs by exact k-word-shingle Jaccard, candidates from an
    inverted shingle index (pairs must share >= 1 shingle — implied by any
    threshold > 0). Returns (id_a < id_b, jaccard).

    Scale: the inverted index explodes |doc| shingles per doc and
    self-joins on the 16-byte shingle hash. Hot shingles (boilerplate)
    blow up the join — at scale drop the top-frequency shingles first
    (``max_shingle_freq``), standard practice for web dedup.
    """
    sets = shingle_sets(df, text_col, id_col, k).cache()
    inv = sets.select(
        F.col(id_col), F.explode("sh").alias("s")
    ).withColumn("s", F.md5("s"))
    cand = (
        inv.alias("x")
        .join(inv.alias("y"), "s")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return _verified_pairs(cand, sets, id_col, threshold)


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """(id, sh, sig) with sig = ARRAY<BIGINT> of N_PERMS minhash values.

    Signature is a pure nested higher-order-function expression: for each
    permutation constant pair, min over the doc's shingle hashes — no
    shuffle at all until LSH banding; at 100 TB this stage is
    embarrassingly parallel over the scan.
    """
    ab = F.arrays_zip(
        F.lit(MINHASH_A).alias("a"), F.lit(MINHASH_B).alias("b")
    )
    sets = shingle_sets(df, text_col, id_col, k)
    hashed = sets.withColumn(
        "hs", F.transform("sh", lambda s: hash32(s))
    )
    return hashed.withColumn(
        "sig",
        F.transform(
            ab,
            lambda p: F.array_min(
                F.transform(
                    "hs",
                    lambda h: (p["a"] * h + p["b"]) % F.lit(MINHASH_P),
                )
            ),
        ),
    ).select(F.col(id_col), "sh", "sig")


def dedup_minhash_lsh(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified by exact Jaccard.

    Pipeline: shingle -> 32-bit hash -> 16 minhash perms -> 4 bands of 4
    rows -> band-bucket equi-join for candidates -> exact verify.
    Returns (id_a < id_b, jaccard >= threshold).

    With s = Jaccard, P(candidate) = 1 - (1 - s^4)^4: ~0.97 at s=0.8,
    ~0.22 at s=0.3 — the standard LSH S-curve for this band shape.
    """
    sigs = minhash_signatures(df, text_col, id_col, k).cache()
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_PERMS // BAND_ROWS - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.md5(
                        F.concat_ws(
                            "_", F.transform(
                                F.slice("sig", b * BAND_ROWS + 1, BAND_ROWS),
                                lambda v: v.cast("string"),
                            )
                        )
                    ).alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_key")
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band_id", "band_key"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sets = sigs.select(id_col, "sh")
    return _verified_pairs(cand, sets, id_col, threshold)


def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash) — 32-bit SimHash over distinct tokens (weight 1).

    fingerprint bit b is set iff sum over tokens of (bit b of hash32(tok)
    ? +1 : -1) is > 0. Pure expression: nested fold over 32 bit positions
    x token hashes, no shuffle.
    """
    from slipstream_async_spark.functions.text import tokens

    hashed = df.select(
        F.col(id_col),
        F.transform(
            F.array_distinct(tokens(text_col)), lambda t: hash32(t)
        ).alias("hs"),
    )
    # 2^b as bigint via pow (F.shiftleft needs a literal bit count; b is a
    # Column here). Exact for b <= 31.
    def pow2(b):
        return F.pow(F.lit(2.0), b).cast("bigint")

    return hashed.select(
        F.col(id_col),
        F.aggregate(
            F.sequence(F.lit(0), F.lit(31)),
            F.lit(0).cast("bigint"),
            lambda acc, b: acc
            + F.when(
                F.aggregate(
                    "hs",
                    F.lit(0).cast("bigint"),
                    lambda a, h: a
                    + F.when(h.bitwiseAND(pow2(b)) > 0, F.lit(1)).otherwise(
                        F.lit(-1)
                    ),
                )
                > 0,
                pow2(b),
            ).otherwise(F.lit(0).cast("bigint")),
        ).alias("simhash"),
    )


def dedup_simhash(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Candidates via byte-band blocking (pigeonhole: two fingerprints within
    hamming 3 of each other share at least one of 4 exact 8-bit bands),
    then exact ``bit_count(xor)`` verify — never an O(n^2) cross join.
    """
    fps = simhash_fingerprints(df, text_col, id_col).cache()
    bands = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    # (simhash >> 8b) & 255 with a Column shift: simhash is
                    # a nonnegative 32-bit value, so floor-div by 2^(8b) is
                    # an exact unsigned right shift.
                    (
                        F.floor(
                            F.col("simhash") / F.pow(F.lit(2.0), b * 8)
                        ).cast("bigint")
                        % 256
                    ).alias("band_val"),
                ),
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_id", "band.band_val")
    pairs = (
        bands.alias("x")
        .join(bands.alias("y"), ["band_id", "band_val"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
