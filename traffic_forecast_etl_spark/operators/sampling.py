"""Deterministic sampling operators (engine extension; the reference
has no sampling plane — pandas `.sample` is the closest analogue).

Training-data pipelines need samples that are (a) reproducible across
runs and engines, (b) stable under re-partitioning, and (c) cheap at
100 TB. Spark's `df.sample()` satisfies none of these: it is seeded
per-partition, so the selected rows change whenever the partitioning
does. The operators here hash a KEY instead — selection is a pure
function of the row, independent of physical layout, identical on any
engine that has md5 (which is why the DuckDB oracle reproduces it
bit-for-bit; xxhash64 is the cheaper engine-internal alternative with
the same plan shape).

All map-only: the sample predicate fuses into the parquet scan, and
column pruning means only the key column is read when the caller
projects afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Denominator for the hash bucket: the first 8 hex chars of md5 as an
# integer, mod _BUCKETS, is uniform on [0, _BUCKETS). 1e6 buckets give
# rate granularity of 1e-6 — fine-grained enough for corpus work while
# staying far from the 2^32 ceiling of the 8-hex-char prefix.
_BUCKETS = 1_000_000


def hash_bucket(
    key: Column | str, salt: str = "", buckets: int = _BUCKETS
) -> Column:
    """Uniform deterministic bucket in [0, ``buckets``) from
    md5(salt||key) — the single home of the engine-portable md5
    bucketing idiom (every DuckDB oracle reproduces it bit-for-bit).

    The salt decorrelates independent samples over the same keys
    (e.g. a 1% eval split and a 10% training subsample must not nest).
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.encode(F.concat(F.lit(salt), c.cast("string")), "UTF-8"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by key hash: reproducible across
    runs, engines, and physical layouts; the same key always lands on
    the same side (so a key-correlated table sampled with the same
    salt stays referentially consistent)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(hash_bucket(key_col, salt) < int(rate * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing pass
    (e.g. keep 100% of high-quality sources, 10% of the crawl tail).
    ``rates`` maps stratum value → keep rate; unlisted strata get
    ``default_rate``. Map-only: the per-stratum threshold is a CASE
    expression, not a join, so it fuses into the scan."""
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0,1], got {rate}")
    threshold = F.lit(int(default_rate * _BUCKETS))
    for stratum, rate in sorted(rates.items()):
        threshold = (
            F.when(F.col(strata_col) == stratum, F.lit(int(rate * _BUCKETS)))
            .otherwise(threshold)
        )
    return df.filter(hash_bucket(key_col, salt) < threshold)


def split_train_eval(
    df: DataFrame, key_col: str, eval_rate: float = 0.01, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive train/eval split by key hash — the
    leakage-safe counterpart of a random split: a key can never
    appear on both sides, even across re-runs or backfills."""
    cut = int(eval_rate * _BUCKETS)
    bucket = hash_bucket(key_col, salt)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def source_quota(
    df: DataFrame, key_col: str, source_col: str, max_per_source: int, salt: str = ""
) -> DataFrame:
    """Cap each source (domain, crawl host, feed) at ``max_per_source``
    documents — the anti-domination pass of web-corpus curation: a few
    mega-domains otherwise contribute most of the tokens.

    Selection ranks WITHIN each source by the deterministic key hash
    (layout-independent, engine-reproducible — same properties as
    hash_sample), so re-runs and backfills keep the SAME documents,
    and adding new documents to a source only displaces hash-adjacent
    ones rather than reshuffling the kept set wholesale.

    One hash-partitioned window shuffle keyed by source; Spark plans
    the rank-filter as WindowGroupLimit, so each task retains only
    ``max_per_source`` rows per source during the sort — per-task
    memory is O(quota), not O(source size). Skew note: a mega-source
    still lands on one task; for the pathological case pre-filter
    with hash_sample at rate ≈ quota·3/|source| first (two-pass
    quota), which bounds the window input without changing the kept
    set materially."""
    if max_per_source < 1:
        raise ValueError(f"max_per_source must be >= 1, got {max_per_source}")
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(source_col).orderBy(
            hash_bucket(key_col, salt), F.col(key_col)
        )
    )
    return df.withColumn("__rn", rn).filter(F.col("__rn") <= max_per_source).drop("__rn")


def temperature_mix_rates(
    df: DataFrame, source_col: str, alpha: float = 0.5, target_fraction: float = 0.5
) -> DataFrame:
    """Compute per-source sampling RATES for temperature-based corpus
    mixing: source i with nᵢ docs is kept at rate ∝ nᵢ^(α-1), i.e.
    sampled mass ∝ nᵢ^α — α=1 is natural proportions, α=0 is uniform
    across sources, α≈0.3-0.7 is the standard multilingual/multi-
    source flattening (cf. the exponent-smoothed sampling used by
    multilingual LM training).

    Rates are scaled so the expected kept fraction of the WHOLE corpus
    is ``target_fraction``, then clipped to 1.0 (a source whose raw
    rate exceeds 1 keeps everything; the shortfall is accepted rather
    than redistributed — deterministic and side-effect-free).

    Returns (source, n_docs, rate) — one row per source, computed
    from one count aggregate (shuffle volume O(sources)). Feed the
    result to ``stratified_hash_sample`` (driver-collect of O(sources)
    rows is the documented pattern) for the actual selection."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if not 0.0 < target_fraction <= 1.0:
        raise ValueError(f"target_fraction must be in (0,1], got {target_fraction}")
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # unnormalized per-doc weight n^(α-1); scale k solves
    # Σ nᵢ·min(1, k·wᵢ) ≈ target_fraction·Σ nᵢ — one fixed-point pass
    # is exact when no source clips; with clipping it under-shoots,
    # which is the conservative direction for a size budget.
    w = F.pow(F.col("n_docs").cast("double"), F.lit(alpha - 1.0))
    weighted = counts.withColumn("__w", w)
    # whole-frame totals via an unpartitioned window rather than a
    # 1-row-frame nested-loop join: the window input is the COUNTS
    # frame (O(sources) rows, not the corpus), so the single-partition
    # exchange is bytes, and the plan stays BNLJ-free (plan-shape gate)
    from pyspark.sql import Window

    whole = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        weighted.withColumn("__mass", F.sum(F.col("n_docs") * F.col("__w")).over(whole))
        .withColumn("__n", F.sum("n_docs").over(whole))
        .withColumn(
            "rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(target_fraction) * F.col("__n") / F.col("__mass") * F.col("__w"),
                ),
                6,
            ),
        )
        .select("source", "n_docs", "rate")
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    epoch: int = 0,
    salt: str = "epoch-shuffle",
) -> DataFrame:
    """Deterministic EPOCH-wise training-order assignment: every row
    gets (shard_id, pos_in_shard) derived from md5(salt:epoch:key) —
    a pseudorandom permutation of the corpus that is reproducible
    across runs, engines, and physical layouts, and DIFFERENT (and
    decorrelated) for each ``epoch`` value. The op a training stack
    needs to re-shuffle data order between epochs without a
    stateful shuffle service or a recorded permutation.

    One hash shuffle keyed by shard + an in-shard sort: size
    ``n_shards`` to O(cluster cores) so each sort fits a task (the
    shard is also the natural write unit — feed to export_jsonl
    with one file per shard).

    PRECONDITION: ``key_col`` must be unique per row. Duplicate keys
    hash identically, and the (ordkey, key) sort then cannot order
    them deterministically — pos_in_shard among duplicates would vary
    across runs, defeating the reproducibility this operator exists
    for. With unique keys, ties cannot occur (distinct keys tie on
    the 60-bit hash only with ~2^-60 probability, and the key column
    itself breaks even those).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    c = F.col(key_col)
    h = F.md5(
        F.encode(
            F.concat(F.lit(f"{salt}:{epoch}:"), c.cast("string")), "UTF-8"
        )
    )
    # 15 hex digits = 60 bits: inside BIGINT, non-negative on both
    # engines (same parity trick as hash_bucket / the d7 oracle)
    ordkey = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    shard = F.pmod(ordkey, F.lit(n_shards))
    pos = F.row_number().over(
        Window.partitionBy(shard).orderBy(ordkey, c)
    )
    return df.select(
        "*",
        shard.alias("shard_id"),
        pos.cast("long").alias("pos_in_shard"),
    )


def _grams(text_col: str, n: int = 2) -> Column:
    """Word n-gram array for DSIR features: whitespace tokens
    (unigrams) plus space-joined bigrams when ``n >= 2`` — the hashed
    bag-of-n-grams feature space of Xie et al. 2023. NULL text yields
    an EMPTY array (not NULL), so downstream folds score 0.0 — the
    same value the SQL oracle's COALESCE produces."""
    from .text import tokens

    toks = F.coalesce(tokens(text_col), F.expr("CAST(array() AS array<string>)"))
    if n < 2:
        return toks
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(toks, bigrams)


def _gram_bucket(gram: Column, num_buckets: int) -> Column:
    """Engine-portable hash bucket for a gram: :func:`hash_bucket`
    (the d7/c9 md5 convention — bit-identical in Spark, DuckDB, and
    Python, so the oracle value-verifies the whole weight
    computation) with the DSIR modulus."""
    return hash_bucket(gram, "", num_buckets)


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: DataFrame,
    num_buckets: int = 4096,
    ngram_n: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw-pool
    document by how much more likely its hashed n-gram bag is under
    the TARGET distribution than under the raw pool —
    ``log w(x) = Σ_grams [log p̂(bucket) − log q̂(bucket)]`` with
    Laplace-smoothed multinomials p̂ (target) and q̂ (pool) over
    ``num_buckets`` hashed buckets. The published next step past
    temperature mixing (c5) and binary quality gates (c6/c8): it
    reweights raw data TOWARD a target distribution instead of just
    filtering.

    Scale shape: two corpus-scan aggregates build the bucket count
    tables (shuffle keys are (bucket) — ``num_buckets`` rows, KBs);
    the log-ratio table collects to the driver (≤ ``num_buckets``
    doubles) and rides the scoring pass as a LITERAL array, so
    scoring is one map-only pass over the pool — zero shuffle, zero
    join, fuses into the scan. Nothing document-sized ever moves.

    Returns (id, log_weight) for every pool row, ``log_weight``
    rounded to ``round_to`` (the float-sum rounding every oracle-
    checked float column here uses).
    """
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2: {num_buckets}")
    # md5-per-gram is CPU-dense: a degenerately under-split local scan
    # (one parquet file = one input partition) would serialize both the
    # count pass and the scoring pass onto one core — same gate as the
    # dedup plane's shingle scans; never fires on a production-split
    # table (operators/dedup.spread_small_scan)
    from .dedup import spread_small_scan

    df = spread_small_scan(df)
    target = spread_small_scan(target)
    grams = _grams(text_col, ngram_n)
    bucket = _gram_bucket(F.col("__g"), num_buckets)

    # both bucket-count tables in ONE aggregate: union the two gram
    # streams with a side tag, conditional-count per bucket — one job
    # and one shuffle instead of two (the shuffle key stays the
    # KB-sized bucket id either way)
    tagged = df.select(
        F.explode(grams).alias("__g"), F.lit(0).alias("__t")
    ).unionByName(
        target.select(F.explode(grams).alias("__g"), F.lit(1).alias("__t"))
    )
    rows = (
        tagged.select(bucket.alias("__b"), "__t")
        .groupBy("__b")
        .agg(
            F.count(F.when(F.col("__t") == 0, 1)).alias("__q"),
            F.count(F.when(F.col("__t") == 1, 1)).alias("__tc"),
        )
        .collect()
    )
    import math

    tc = {int(r["__b"]): int(r["__tc"]) for r in rows if r["__tc"]}
    qc = {int(r["__b"]): int(r["__q"]) for r in rows if r["__q"]}
    t_total = sum(tc.values())
    q_total = sum(qc.values())
    ratios = [
        math.log((tc.get(b, 0) + 1.0) / (t_total + num_buckets))
        - math.log((qc.get(b, 0) + 1.0) / (q_total + num_buckets))
        for b in range(num_buckets)
    ]
    ratio_arr = F.lit(ratios)
    score = F.aggregate(
        grams,
        F.lit(0.0),
        lambda acc, g: acc
        + F.element_at(ratio_arr, _gram_bucket(g, num_buckets).cast("int") + 1),
    )
    return df.select(
        F.col(id_col), F.round(score, round_to).alias("log_weight")
    )


def dsir_resample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: DataFrame,
    k: int,
    num_buckets: int = 4096,
    ngram_n: int = 2,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR selection: keep the ``k`` pool documents with the largest
    Gumbel-perturbed importance weights — the Gumbel top-k trick is
    exactly sampling WITHOUT replacement proportional to w(x)
    (Xie et al. 2023 §2.2), made deterministic and engine-portable by
    deriving each document's uniform from the d7 md5 convention:
    ``u = (bucket(salt||id) + 0.5) / 1e6``,
    ``g = log w + (−ln(−ln u))``. Reproducible across runs, engines,
    and physical layouts, like every sampler in this module.

    One map-only scoring pass + a TakeOrdered top-k (no full sort);
    ties broken by id for cross-engine determinism.

    Returns (id, log_weight, gumbel_key) for the selected rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    weights = dsir_weights(
        df, text_col, id_col, target, num_buckets=num_buckets, ngram_n=ngram_n
    )
    u = (hash_bucket(F.col(id_col), salt).cast("double") + 0.5) / _BUCKETS
    g = F.round(
        F.col("log_weight") - F.log(-F.log(u)), 6
    ).alias("gumbel_key")
    return (
        weights.select(id_col, "log_weight", g)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )
