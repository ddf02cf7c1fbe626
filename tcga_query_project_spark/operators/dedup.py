"""Deduplication operators (north-star extensions; SURVEY.md §2.10).

Exact and near-duplicate detection over a document corpus. The MinHash
implementation is deliberately *portable-hash* based (md5, available
bit-identically in DuckDB) so every stage is oracle-checkable; swapping
``md5`` for ``xxhash64`` is a one-line change that roughly halves hash
cost at production scale.

Scale design: every stage is explode → groupBy → join on
content-derived keys. Nothing collects; candidate generation is
band-bucket equi-join (LSH), so the quadratic all-pairs comparison is
never materialized — the join only produces pairs sharing a band
bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tcga_query_project_spark.operators.partitioning import fan_out
from tcga_query_project_spark.operators.text import tokens


def normalized_text(text: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via hash-groupBy on normalized text: one row per
    distinct content with the keeper id (min id) and duplicate count.
    Equivalent semantics to ``dropDuplicates`` but keeps the lineage
    (which ids collapsed), which a training-data pipeline needs.
    """
    return (
        df.select(F.col(id_col), normalized_text(F.col(text_col)).alias("_key"))
        .groupBy("_key")
        .agg(
            F.min(id_col).alias("keep_id"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_dups"),
        )
        .select("keep_id", "n_dups")
    )


def shingle_set(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct word k-gram shingles per document (one row per
    (doc, shingle)). Built with array ``transform`` over the token list
    — no Python, no explode-then-window.

    The token array is materialized in its own projection first: the
    lambda below indexes it per shingle, and an inlined tokenizer
    expression would re-run per element (measured 28x slower at sf0.1).

    ``fan_out`` guards against a single-split scan serializing the
    tokenize→shingle→hash stage (measured 5x at sf0.1, where
    documents.parquet arrives as ONE partition); no-op when the scan
    already parallelizes.
    """
    df = fan_out(df, id_col)
    toks_df = df.select(
        F.col(id_col), tokens(normalized_text(F.col(text_col))).alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    # guard: Spark's sequence(1, 0) yields a DESCENDING [1,0], not empty,
    # so short documents need an explicit empty-array branch.
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks_df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


#: modulus for the minhash permutation family — smallest prime > 2^32,
#: so (2·seed+1)·v + seed·1000003 stays within signed-64 range.
MINHASH_PRIME = 4294967311


def shingle_array(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Distinct word k-gram shingles per document as ONE array column —
    the no-explode representation: (doc, ARRAY<shingle>) instead of one
    row per (doc, shingle).

    Documents with fewer than ``k`` tokens get an empty array; callers
    computing signatures must filter those out (they can never be
    near-dup candidates, and an all-null signature would otherwise
    bucket every short doc together).
    """
    df = fan_out(df, id_col)
    toks_df = df.select(
        F.col(id_col), tokens(normalized_text(F.col(text_col))).alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks_df.select(
        F.col(id_col), F.array_distinct(shingles).alias("shingles")
    )


def minhash_signature_arrays(
    sh_arr: DataFrame, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """Wide MinHash signature computed entirely as array expressions —
    a NARROW MAP, no explode and no shuffle: each row hashes its
    shingle array once (md5 → 32-bit int per shingle, materialized in
    its own projection so the per-seed transforms reference it instead
    of re-hashing), then takes ``array_min`` under each of the
    ``num_hashes`` linear permutations.

    This is the 100 TB-preferred form of :func:`minhash_signature`: the
    exploded formulation shuffles one row per (doc, shingle) into a
    grouped min; here signature computation rides the scan and the
    first shuffle in the whole near-dup pipeline is the LSH band join.
    Empty shingle arrays are excluded (see :func:`shingle_array`).
    Output values are identical to :func:`minhash_signature`.
    """
    hashed = sh_arr.filter(F.size("shingles") > 0).select(
        F.col(id_col),
        F.col("shingles"),
        F.transform(
            F.col("shingles"),
            lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
        ).alias("_hv"),
    )
    return hashed.select(
        F.col(id_col),
        *[
            F.array_min(
                F.transform(
                    F.col("_hv"),
                    lambda v: ((2 * i + 1) * v + F.lit(i * 1000003).cast("long"))
                    % F.lit(MINHASH_PRIME),
                )
            ).alias(f"_mh{i}")
            for i in range(1, num_hashes + 1)
        ],
    )


def jaccard_pairs_arrays(
    pairs: DataFrame, sh_arr: DataFrame, id_col: str
) -> DataFrame:
    """Exact Jaccard for candidate pairs from per-document shingle
    ARRAYS: two equi-joins on document id attach both arrays, then
    ``array_intersect``/sizes compute the measure per row — no
    (doc, shingle)-grain shuffle, and the join payload is one array per
    document instead of its exploded rows. Value-identical to
    :func:`jaccard_pairs` (both operate on distinct shingle sets)."""
    a = sh_arr.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("_sa")
    )
    b = sh_arr.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("_sb")
    )
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb"))).cast("double")
    sza = F.size("_sa").cast("double")
    szb = F.size("_sb").cast("double")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / (sza + szb - inter), 6).alias("jaccard"),
        )
    )


def minhash_signature(
    shingles: DataFrame, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """Wide MinHash signature: one row per document with columns
    ``_mh1.._mhN``, via one base hash + a linear permutation family.

    Each shingle is hashed ONCE (md5 → first 32 bits as integer v, a
    parse both engines share bit-for-bit); seed i's permutation is
    ``h_i = ((2i+1)·v + 1000003·i) mod P`` with P prime > 2^32 — the
    classic universal-hash MinHash family. All N mins are computed in a
    SINGLE groupBy over the shingle rows (one ``min`` aggregate per
    seed): no seed fan-out, no N× row explosion — the shuffle carries
    map-side partial mins, N longs per (doc, input-partition).
    """
    base = shingles.select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10)
        .cast("long")
        .alias("_v"),
    )
    v = F.col("_v")
    return base.groupBy(id_col).agg(
        *[
            # offset computed as a Python int and cast to long: an
            # IntegerType `i * lit(1000003)` would wrap past int32 for
            # num_hashes >= 2148 (ANSI mode: throw).
            F.min(
                ((2 * i + 1) * v + F.lit(i * 1000003).cast("long"))
                % F.lit(MINHASH_PRIME)
            ).alias(f"_mh{i}")
            for i in range(1, num_hashes + 1)
        ]
    )


def lsh_candidates(
    signatures: DataFrame, id_col: str, band_size: int = 2
) -> DataFrame:
    """LSH banding: group seeds into bands of ``band_size``; documents
    sharing any band signature become candidate pairs (id_a < id_b).

    The band signature is the concatenation of the band's minhashes in
    seed order; the self-join is an equi-join on (band, signature), so
    only colliding documents pair up.
    """
    seeds = sorted(
        (int(c[3:]) for c in signatures.columns if c.startswith("_mh")),
    )
    if not seeds:
        raise ValueError(
            "lsh_candidates: no _mh<N> signature columns in input "
            f"(got {signatures.columns}); pass the wide output of "
            "minhash_signature()"
        )
    bands = [
        seeds[j : j + band_size] for j in range(0, len(seeds), band_size)
    ]
    # band signature = minhashes joined in seed order (portable:
    # string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) on the oracle
    # side). The wide signature row makes this a narrow per-row
    # expression — the per-(doc, band) inline explode is num_bands
    # structs per document, no shuffle.
    band_sigs = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"_mh{i}").cast("string")
                                    for i in grp
                                ],
                            )
                        ).alias("band_sig"),
                    )
                    for j, grp in enumerate(bands)
                ]
            )
        ).alias("_b"),
    ).select(F.col(id_col), F.col("_b.band"), F.col("_b.band_sig"))
    a = band_sigs.select(
        F.col(id_col).alias("id_a"), F.col("band"), F.col("band_sig")
    )
    b = band_sigs.select(
        F.col(id_col).alias("id_b"), F.col("band"), F.col("band_sig")
    )
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    pairs: DataFrame, shingles: DataFrame, id_col: str
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| via a shingle
    equi-join, |A∪B| = |A|+|B|−|A∩B|. Only candidate pairs are scored —
    the expensive exact measure runs on the LSH-filtered set.
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).cast("double").alias("_sz"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("double").alias("_inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"_inter": 0.0})
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("_sza")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("_szb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter")), 6
            ).alias("jaccard"),
        )
    )


def near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pipeline: shingle → minhash → band →
    candidate join → exact-Jaccard verify → threshold.

    Array-native dataflow (round 2): shingles stay one ARRAY per
    document, signatures are a narrow map over that array
    (:func:`minhash_signature_arrays`), so the FIRST shuffle in the
    pipeline is the LSH band equi-join and the verify stage joins one
    array per doc instead of exploded (doc, shingle) rows. The shingle
    arrays feed three branches (signatures + both verify sides) and are
    persisted (memory, spill-to-disk) so tokenize/shingle runs once; at
    cluster scale the same role is played by a parquet checkpoint.
    Results are value-identical to the exploded formulation (the DuckDB
    oracle replays that one).
    """
    from pyspark import StorageLevel

    sh = shingle_array(df, id_col, text_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sig = minhash_signature_arrays(sh, id_col, num_hashes)
    cand = lsh_candidates(sig, id_col, band_size)
    return jaccard_pairs_arrays(cand, sh, id_col).filter(
        F.col("jaccard") >= threshold
    )


def embedding_near_dup(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs
    whose cosine similarity (rounded to 4 decimals for FP portability)
    reaches ``threshold``.

    Block-nested-loop with a vectorized kernel: the candidate side is
    materialized once as a broadcast numpy matrix (id + L2-normalized
    rows); each Arrow batch of the streamed side does ONE matmul
    against it and emits only the above-threshold pairs. ~100x faster
    than per-pair array expressions (those evaluate interpreted
    per-element lambdas — 4M pairs x 64 dims at sf0.1 took 31 s; this
    runs in under a second).

    Scale path: the broadcast side is fine to ~1e6 x 1e2 floats. Above
    that, either block both sides (cross join of id-ranges, same kernel
    per block pair) or pre-prune candidates with
    :func:`operators.similarity.cosine_topk_lsh`'s bucket join and use
    this exact kernel as the verify stage.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    # the broadcast side collects straight from the scan; only the
    # streamed (mapInPandas) side is fanned out — one Arrow batch per
    # partition does one matmul, and a single-split scan would
    # serialize the whole kernel.
    cols = df.select(F.col(id_col), F.col(vec_col))
    pdf = cols.toPandas()
    src = fan_out(cols, id_col)
    ids = pdf[id_col].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    normed = mat / norms[:, None]
    bc = df.sparkSession.sparkContext.broadcast((ids, normed))

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_normed = bc.value
        for batch in batches:
            b_ids = batch[id_col].to_numpy()
            b_mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
            )
            b_norms = np.linalg.norm(b_mat, axis=1)
            b_norms[b_norms == 0] = 1.0
            cos = np.round((b_mat / b_norms[:, None]) @ all_normed.T, 4)
            rows_i, cols_j = np.where(cos >= threshold)
            keep = b_ids[rows_i] < all_ids[cols_j]
            yield pd.DataFrame(
                {
                    "id_a": b_ids[rows_i][keep],
                    "id_b": all_ids[cols_j][keep],
                    "cosine": cos[rows_i, cols_j][keep],
                }
            )

    return src.mapInPandas(fn, out_schema)


# --- SimHash --------------------------------------------------------------


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over word tokens (portable variant).

    Per token, the first 4 hex chars of md5 give 16 bits; each bit
    contributes ±1 to its position's counter; the sign pattern is the
    fingerprint. Production variant: 64-bit via xxhash64 — same
    dataflow with a wider integer.

    Shape: one row per token (no per-bit explode) — the token hash is
    parsed to a 16-bit integer once, and the 16 per-bit ±1 counters
    collapse into 16 bitwise-AND aggregate columns in a single hash
    aggregation: ``sign_b > 0  ⇔  2·Σ bit_b > n_tokens``. The DuckDB
    oracle keeps the equivalent md5-nibble formulation (identical
    output, engine-portable hex parsing).
    """
    df = fan_out(df, id_col)
    toks = df.select(
        F.col(id_col), F.explode(tokens(normalized_text(F.col(text_col)))).alias("_t")
    )
    # bit b (our numbering: b//4 = hex-char index, 3 - b%4 = bit within
    # nibble) is bit (15 - b) of the integer value of the 4-char prefix.
    hashed = toks.select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("_t")), 1, 4), 16, 10)
        .cast("long")
        .alias("_v"),
    )
    bit_sums = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftright(F.col("_v"), 15 - b).bitwiseAND(F.lit(1))).alias(
                f"_b{b}"
            )
            for b in range(16)
        ],
    )
    simhash = None
    for b in range(16):
        term = F.when(
            F.col(f"_b{b}") * 2 > F.col("_n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        simhash = term if simhash is None else simhash + term
    return bit_sums.select(F.col(id_col), simhash.alias("simhash"))
