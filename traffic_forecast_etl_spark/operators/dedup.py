"""Deduplication operators for large-scale corpus curation.

Beyond the reference's surface (its only dedup is ON CONFLICT DO
NOTHING at the sink, reference: dags/utils.py:210,271) — these are the
operators a 100 TB training-data pipeline needs:

- exact duplicate removal (hash groupBy),
- near-dup via MinHash + LSH banding (shingle → signature → band →
  bucket join → exact-Jaccard verify),
- near-dup via SimHash (64-bit sign-random-projection over shingle
  hashes, Hamming-banded candidate join),
- exact n-gram Jaccard pairs (explode-shingle join — also the DuckDB
  oracle form).

Everything is native Column expressions + hash-partitioned joins:
no Python in the hot path, no crossJoin, no driver-side state. The
LSH family scales as O(corpus) + O(candidate pairs), the property
that makes near-dedup feasible at 100 TB where all-pairs O(n²) is
not.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Modulus for the universal-hash family h_i(x) = (a_i*x + b_i) mod p
# used by minhash (standard construction, cf. Broder '97 resemblance
# sketches). p is the Mersenne prime 2^31-1 and a_i, b_i, x are all
# reduced below 2^31 first, so a*x + b < 2^62 never overflows a
# 64-bit long under ANSI arithmetic.
_MERSENNE_P = (1 << 31) - 1

def normalize_text(col: Column | str) -> Column:
    """Canonical text form shared by every dedup operator: lowercase,
    strip non-alphanumerics to spaces, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}]+", " ")
    return F.trim(c)


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-gram shingle array, built natively:
    sequence(1, len-k+1) → transform(substring) → array_distinct.
    Short texts (< k chars) yield a single whole-string shingle."""
    c = normalize_text(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, k)))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined)."""
    c = normalize_text(col)
    toks = F.split(c, r"\s+")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), cnt - 1)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


_SCAN_LIKE_NODES = frozenset(
    {
        "Project",
        "Filter",
        "LogicalRelation",
        "Relation",
        "LocalRelation",
        "SubqueryAlias",
        "ResolvedHint",
        "Sample",
    }
)


def _is_scan_like(df: DataFrame) -> bool:
    """True iff the frame's ANALYZED plan is a pure scan pipeline
    (projections/filters over a relation leaf) — the only shape on
    which probing ``df.rdd`` is free. On a derived frame (join,
    aggregate, generate…) the probe would physically plan the query
    and, under AQE, materialize its exchanges at plan-BUILD time —
    the eager-execution hazard spread_small_scan's gate must never
    trigger. Walking the analyzed plan costs analysis only (no
    optimizer, no execution); unknown node names fail safe (False)."""
    try:

        def walk(node) -> bool:
            if node.nodeName() not in _SCAN_LIKE_NODES:
                return False
            ch = node.children()
            return all(walk(ch.apply(i)) for i in range(ch.size()))

        return walk(df._jdf.queryExecution().analyzed())
    except Exception:  # pragma: no cover — py4j surface drift
        return False


def spread_small_scan(df: DataFrame, max_parts: int = 4) -> DataFrame:
    """Local-parallelism guard for the CPU-dense map stages of the
    dedup plane (a hash per shingle / character position): a small
    table that arrives as ONE input split — one parquet file with one
    row group, the shape of the local test data — serializes the
    entire map stage onto one core, measured 5-10× the parallel time
    on the anchor and signature scans. If (and only if) the scan is
    degenerately under-split (≤ ``max_parts`` partitions against a
    much larger default parallelism), spread it once with a round-
    robin repartition — by the gate's construction the shuffled input
    is tiny. A production-scale scan has thousands of splits, so the
    gate never fires and no shuffle is ever added at 100 TB.

    Safe on ANY frame: the partition-count probe runs only when the
    plan is scan-like (``_is_scan_like``); a derived frame passes
    through untouched instead of being eagerly executed by the probe
    (r11, closing the ADVICE r10 hazard)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if (
        target >= 2 * max_parts
        and _is_scan_like(df)
        and df.rdd.getNumPartitions() <= max_parts
    ):
        return df.repartition(target)
    return df


def exploded_char_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    distinct: bool = True,
    spread: bool = True,
    with_fp: bool = False,
) -> DataFrame:
    """(__id, __s) rows: one per DISTINCT character k-gram per doc.
    ``with_fp`` adds a ``__fp`` column — xxhash64 of the WHOLE
    normalized text, computed once per doc in the same pre-Generate
    projection as the normalization (i.e. for free within this scan)
    and replicated down the exploded rows; the exact-dedup pre-pass
    reads it out of the signature aggregate instead of paying a
    second corpus scan.

    Explode-based on purpose: the normalized text materializes once
    per document in the projection below the Generate node, so the
    regexp pipeline runs O(docs) times. Building the same shingles
    with ``transform(sequence(...), i -> substring(norm, i, k))``
    inlines the normalization into every lambda invocation — O(docs ×
    shingles) regexp evaluations, measured 50× slower. Same trap for
    word shingles below.

    ``spread`` applies the under-split scan gate (spread_small_scan)
    and must be True ONLY when ``df`` is a true scan entry point: the
    gate probes ``df.rdd``, and under AQE that materializes any query
    stages (joins, broadcasts) inside the plan — on a derived frame
    it would eagerly execute the upstream pipeline at plan-build
    time. Derived callers (the LSH verify path) pass False.
    """
    base = spread_small_scan(df) if spread else df
    fp_cols = [F.xxhash64(F.col("__n")).alias("__fp")] if with_fp else []
    norm = base.select(
        F.col(id_col).alias("__id"), normalize_text(text_col).alias("__n")
    ).select("__id", "__n", *fp_cols)
    keep = ["__fp"] if with_fp else []
    pos = norm.select(
        "__id",
        "__n",
        *keep,
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("__n") - (k - 1), F.lit(1)))
        ).alias("__i"),
    )
    out = pos.select(
        "__id", *keep, F.col("__n").substr(F.col("__i"), F.lit(k)).alias("__s")
    )
    # distinct is a full shuffle of the shingle stream — callers that
    # only need per-doc minima (minhash signatures) skip it
    return out.distinct() if distinct else out


def exploded_word_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    spread: bool = True,
    distinct: bool = True,
) -> DataFrame:
    """(__id, __s) rows: one per DISTINCT word n-gram per doc (same
    explode-not-transform rationale and ``spread`` scan-entry-only
    contract as exploded_char_shingles). ``distinct=False`` skips the
    per-(doc, gram) dedup shuffle for callers that dedup inline
    (corpus_duplicate_ngrams' first-occurrence window flag)."""
    base = spread_small_scan(df) if spread else df
    toks = base.select(
        F.col(id_col).alias("__id"),
        F.split(normalize_text(text_col), r"\s+").alias("__t"),
    )
    pos = toks.select(
        "__id",
        "__t",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("__t") - (n - 1), F.lit(1)))
        ).alias("__i"),
    )
    out = pos.select(
        "__id", F.concat_ws(" ", F.slice("__t", F.col("__i"), n)).alias("__s")
    )
    return out.distinct() if distinct else out


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized text: keep the minimum id per
    duplicate group. One hash-partitioned aggregate over a 64-bit
    fingerprint — the shuffle key is the hash, so the full text never
    travels (at 100 TB that difference is the whole game).
    """
    fp = F.xxhash64(normalize_text(text_col))
    return (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__fp")
    )


def incremental_exact_dedup(
    new_df: DataFrame, seen_df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact dedup for CONTINUOUS INGESTION: keep rows of ``new_df``
    that (a) are the min-id representative of their duplicate group
    within the batch and (b) don't duplicate anything already in
    ``seen_df`` — the shape a daily crawl-ingest pipeline runs, where
    re-deduplicating the full corpus per batch would be O(corpus)
    forever.

    Both legs are keyed by a 64-bit fingerprint of the normalized
    text: the within-batch groupBy shuffles the batch once, and the
    against-corpus leg is an anti-join against the corpus's DISTINCT
    fingerprint projection — 8 bytes per historical doc, the thing a
    production deployment materializes once as a compacted
    fingerprint store (sinks.insert_if_absent keeps it current) so
    steady state reads O(batch) + O(fingerprint store), never the
    corpus text."""
    fp = F.xxhash64(normalize_text(text_col))
    new_fp = new_df.withColumn("__fp", fp)
    seen_fp = seen_df.select(fp.alias("__fp")).distinct()
    batch_rep = new_fp.groupBy("__fp").agg(F.min(id_col).alias("__keep"))
    return (
        new_fp.join(batch_rep, "__fp")
        .filter(F.col(id_col) == F.col("__keep"))
        .join(seen_fp, "__fp", "left_anti")
        .drop("__fp", "__keep")
    )


def _minhash_signature(base_hashes: Column, num_hashes: int, seed: int = 42) -> list[Column]:
    """num_hashes minhash values over a pre-hashed shingle array
    (``base_hashes`` = xxhash64(shingle) mod p, materialized ONCE as a
    column by the caller — inlining it here would re-hash every
    shingle num_hashes times). The family is (a*h+b) mod p with
    deterministic per-index coefficients derived from ``seed`` so
    signatures are reproducible across runs/clusters."""
    sig = []
    rnd = _coeffs(num_hashes, seed)
    for a, b in rnd:
        sig.append(
            F.array_min(
                F.transform(
                    base_hashes, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE_P))
                )
            )
        )
    return sig


def _coeffs(n: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic odd multipliers/offsets via splitmix64 — plain
    Python ints evaluated at plan-build time (no runtime cost)."""
    out = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    def nxt() -> int:
        nonlocal state
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return (z ^ (z >> 31)) % _MERSENNE_P
    for _ in range(n):
        a = nxt() | 1  # odd, nonzero
        b = nxt()
        out.append((a, b))
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, minhash_sig) — the PERSISTABLE signature artifact for
    incremental near-dedup: a production pipeline materializes this
    once per corpus (num_hashes·8 bytes per doc) and every later
    ingest batch LSH-joins against the store instead of re-shingling
    corpus text. Deterministic in ``seed``, so signatures computed in
    different runs/clusters are comparable."""
    raw_sh = exploded_char_shingles(df, text_col, id_col, shingle_k, distinct=False)
    hashed = raw_sh.withColumn(
        "__h", F.pmod(F.xxhash64("__s"), F.lit(_MERSENNE_P))
    )
    coeffs = _coeffs(num_hashes, seed)
    sig_rows = hashed.groupBy("__id").agg(
        *[
            F.expr(f"min(pmod(__h * {a}L + {b}L, {_MERSENNE_P}L)) AS __m{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    return sig_rows.select(
        F.col("__id").alias(id_col),
        F.array(*[f"__m{i}" for i in range(num_hashes)]).alias("minhash_sig"),
    )


def _band_entries(sigs: DataFrame, id_col: str, sig_col: str, bands: int, r: int) -> DataFrame:
    """Explode a signature table to (id, band_idx, band_hash) — bands
    are plan-time constants → unrolled python loop, not a lambda
    (shift/slice offsets stay literals for codegen)."""
    return sigs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.xxhash64(
                            F.concat_ws(
                                "_", F.lit(bi), F.slice(F.col(sig_col), bi * r + 1, r)
                            )
                        ).alias("band_hash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("__id", "b.band_idx", "b.band_hash")


def _tagged_sigs(sigs: DataFrame, id_col: str, sig_col: str) -> DataFrame:
    """(id, position-tagged signature array): one interpreted lambda
    per DOC, so per-pair agreement counting is a codegen
    array_intersect (see minhash_lsh_pairs)."""
    return sigs.select(
        F.col(id_col).alias("__id"),
        F.expr(f"transform({sig_col}, (x, i) -> xxhash64(i, x))").alias("__tag"),
    )


def incremental_near_dup_pairs(
    new_df: DataFrame,
    seen_sigs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs between a NEW ingest batch and an EXISTING
    corpus represented only by its signature store (the output of
    ``minhash_signatures``, typically parquet on disk) — the
    continuous-ingestion twin of ``minhash_lsh_pairs``: steady state
    touches O(batch) text + O(store) 8·num_hashes-byte signatures,
    never corpus text.

    The asymmetric band join is keyed by (band_idx, band_hash), so
    the store side shuffles signatures once per batch; candidates are
    scored by the signature-estimate Jaccard (unbiased, sd ≈
    sqrt(j(1-j)/num_hashes)) — exact verification is impossible
    without corpus text BY DESIGN, so the threshold is applied to the
    estimate; callers wanting exactness re-join survivors to corpus
    text themselves (the pairs output carries both ids).

    Returns (new_id, seen_id, est_jaccard). ``seed``/``num_hashes``/
    ``shingle_k`` must match the store's parameters."""
    from pyspark import StorageLevel

    r = num_hashes // bands
    new_sigs = minhash_signatures(
        new_df, text_col, id_col, num_hashes, shingle_k, seed
    ).persist(StorageLevel.MEMORY_AND_DISK)  # feeds banding + tagging
    nb = _band_entries(new_sigs, id_col, "minhash_sig", bands, r)
    sb = _band_entries(seen_sigs, id_col, "minhash_sig", bands, r)
    cand = (
        nb.alias("l")
        .join(
            sb.alias("rr"),
            on=[
                F.col("l.band_idx") == F.col("rr.band_idx"),
                F.col("l.band_hash") == F.col("rr.band_hash"),
                F.col("l.__id") != F.col("rr.__id"),
            ],
        )
        .select(
            F.col("l.__id").alias("new_id"), F.col("rr.__id").alias("seen_id")
        )
        .distinct()
    )
    nt = _tagged_sigs(new_sigs, id_col, "minhash_sig")
    st = _tagged_sigs(seen_sigs, id_col, "minhash_sig")
    return (
        cand.join(
            nt.select(F.col("__id").alias("new_id"), F.col("__tag").alias("__t1")),
            "new_id",
        )
        .join(
            st.select(F.col("__id").alias("seen_id"), F.col("__tag").alias("__t2")),
            "seen_id",
        )
        .withColumn(
            "est_jaccard",
            F.round(
                F.size(F.array_intersect("__t1", "__t2")) / F.lit(num_hashes), 6
            ),
        )
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("new_id", "seen_id", "est_jaccard")
    )


def _band_val_exprs(bands: int, r: int, word_fmt: str = "__w{}") -> list[str]:
    """SQL expressions extracting band ``bi``'s ``r`` bytes from the
    packed 8-byte sketch words (``word_fmt`` produces the word-w
    column reference), for bi in range(bands).

    Three shapes, all byte-exact:
    - band inside one word → shifted mask of that word (no hash);
    - band straddling a word boundary (8 % r != 0) → both words'
      bytes combined with shift+or — the r3 single-word form silently
      dropped the bytes in the second word, shrinking the effective
      band and inflating candidate volume up to 256× per lost byte;
    - band wider than 8 bytes (r > 8, i.e. high-precision banding) →
      xxhash64 over the band's word chunks as the 64-bit band
      identity. Hash collisions only ADD candidates and the estimate
      filter removes them; this restores the r-unrestricted parameter
      domain (any bands dividing num_hashes).
    """
    out = []
    for bi in range(bands):
        b0, b1 = bi * r, bi * r + r
        chunks: list[tuple[str, int]] = []
        for w in range(b0 // 8, (b1 - 1) // 8 + 1):
            lo, hi = max(b0, 8 * w), min(b1, 8 * w + 8)
            off, nbytes = lo - 8 * w, hi - lo
            e = word_fmt.format(w)
            if off:
                e = f"shiftrightunsigned({e}, {8 * off})"
            if nbytes < 8:
                e = f"({e} & {(1 << (8 * nbytes)) - 1}L)"
            chunks.append((e, nbytes))
        if len(chunks) == 1:
            out.append(chunks[0][0])
        elif r <= 8:
            (e0, n0), (e1, _) = chunks
            out.append(f"({e0} | shiftleft({e1}, {8 * n0}))")
        else:
            out.append("xxhash64(" + ", ".join(e for e, _ in chunks) + ")")
    return out


def byte_agreement_expr(n_words: int, left_fmt: str, right_fmt: str) -> str:
    """SQL expression counting AGREEING bytes between two packed
    byte-sketch column sets (``n_words`` longs per side, 8 bytes
    each; ``left_fmt``/``right_fmt`` are format strings producing the
    word-w column reference, e.g. ``"l.__w{}"``).

    Word-parallel, all whole-stage codegen: per word XOR → fold each
    byte's 8 bits into its bit 0 (3 shift-ors; byte boundaries don't
    leak because only bit 8k survives the final mask) → mask 0x0101…
    → bit_count = disagreeing bytes; agreement = 8·n_words − Σ.
    Equivalent to comparing the 8·n_words bytes one by one, at ~9 long
    ops per word instead of ~6 per byte — the estimate-filter inner
    loop of minhash_lsh_pairs, pinned against a per-byte reference in
    test_dedup_filter."""

    def word_disagree(w: int) -> str:
        z = f"({left_fmt.format(w)} ^ {right_fmt.format(w)})"
        return (
            f"bit_count((({z} | shiftrightunsigned({z}, 4) "
            f"| shiftrightunsigned(({z} | shiftrightunsigned({z}, 4)), 2) "
            f"| shiftrightunsigned(({z} | shiftrightunsigned({z}, 4) "
            f"| shiftrightunsigned(({z} | shiftrightunsigned({z}, 4)), 2)), 1)) "
            f"& {0x0101010101010101}L))"
        )

    return f"{8 * n_words} - (" + " + ".join(
        word_disagree(w) for w in range(n_words)
    ) + ")"


def packed_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
    with_fp: bool = False,
) -> DataFrame:
    """(__id, __w0..__w{num_hashes/8-1}[, __fp]): the packed byte-min
    sketch stage of the LSH pipeline, ONE text scan, map-only up to a
    single id-keyed partial aggregate.

    The signature path takes NO distinct — min over a multiset equals
    min over its set, so the raw exploded shingle stream feeds the
    aggregate directly (saves a full shuffle of every shingle). Each
    shingle is hashed once; the per-hash permutations are flat scalar
    expressions (small codegen); the low byte of each min packs
    8-per-long so the whole sketch is num_hashes/8 longs — 8× smaller
    than the full-value array, with byte agreement computable by
    word-parallel bitwise ops instead of per-element set probes.

    ``with_fp=True`` rides the whole-text xxhash64 fingerprint through
    the same scan (computed once per doc below the Generate node,
    collapsed out of the aggregate with min()) — the exact-dedup
    pre-pass reads group structure from the signature table instead
    of paying a second corpus scan.
    """
    if num_hashes % 8:
        raise ValueError("num_hashes must be a multiple of 8")
    raw_sh = exploded_char_shingles(
        df, text_col, id_col, shingle_k, distinct=False, with_fp=with_fp
    )
    hashed = raw_sh.withColumn("__h", F.pmod(F.xxhash64("__s"), F.lit(_MERSENNE_P)))
    coeffs = _coeffs(num_hashes, seed)
    # F.expr strings, not Column algebra: one py4j round trip per
    # aggregate instead of ~6 (the 64-expression build was measurable
    # driver time; the parsed plans are identical)
    fp_aggs = [F.expr("min(__fp) AS __fp")] if with_fp else []  # constant per doc
    sig_rows = hashed.groupBy("__id").agg(
        *[
            F.expr(f"min(pmod(__h * {a}L + {b}L, {_MERSENNE_P}L)) AS __m{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
        *fp_aggs,
    )
    n_words = num_hashes // 8
    return sig_rows.select(
        "__id",
        *[
            F.expr(
                " | ".join(
                    f"(shiftleft(__m{8 * w + j} & 255L, {8 * j}))" for j in range(8)
                )
            ).alias(f"__w{w}")
            for w in range(n_words)
        ],
        *(["__fp"] if with_fp else []),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    persist_tracker: list | None = None,
    est_hashes: int | None = None,
    restrict_ids: DataFrame | None = None,
    max_band_width: int | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Pipeline (each stage a narrow map except the two keyed shuffles):
      1. shingle + minhash per doc (map-only): ``est_hashes`` mins
         (default = num_hashes; same coefficient stream, so the first
         num_hashes coincide) kept as 8-bit residues PACKED 8-per-long
         — the per-doc similarity sketch. Raising est_hashes sharpens
         the estimate filter (sd ∝ 1/sqrt(est_hashes)) at the price of
         proportionally more min-aggregates in the signature pass —
         measured break-even AGAINST on this corpus (the 4× agg cost
         of 256 outweighed the verify savings), so the default stays
         at num_hashes;
      2. split the first num_hashes byte-mins into ``bands`` bands →
         explode to (band_idx, band_val, id, sketch…) — docs agreeing
         on any band collide (prob 1-(1-j^r)^b, r=num_hashes/bands;
         byte truncation adds a 2⁻⁸ʳ false-collision floor, which only
         ADDS candidates — the estimate filter removes them);
      3. self-join on (band_idx, band_val) with id1 < id2 — shuffle
         keyed by band value, uniform by construction. Each joined row
         already carries BOTH packed sketches, so the Jaccard estimate
         (fraction of agreeing byte-mins, unbiased up to a +(1-j)/256
         collision bias, sd ≈ sqrt(j(1-j)/est_hashes)) is computed
         INLINE with word-parallel bitwise ops — XOR + nibble-fold +
         bit_count per 8-byte word, all whole-stage codegen — and
         candidates more than ~2.5σ below the threshold die before
         they are ever materialized as a pair set. (The previous
         shape — distinct the raw candidate pairs, then re-join
         per-doc tag arrays and array_intersect per pair — paid a
         full shuffle of the raw pair stream plus two id-keyed joins
         and a 2·num_hashes hash-set probe per pair; inlining removes
         all three and the distinct then runs on estimate survivors
         only.)
      4. exact-Jaccard verification over shingle sets for the
         survivors only.

    Returns (id1, id2, jaccard). Candidate verification re-joins the
    shingle arrays by id, so memory per task is O(one doc), never
    O(corpus).

    ``restrict_ids``: optional single-column frame of document ids;
    when given, only those documents enter banding and candidate
    generation. Signatures are still computed for EVERY input doc —
    that is map-side CPU, and restricting afterwards via a semi-join
    on the (slim, 8·est_hashes/8-byte) signature rows is what keeps
    document TEXT out of every shuffle; restricting ``df`` itself
    before the call would shuffle the text. This is the hook
    near_dedup_filter's exact-duplicate pre-pass uses to keep
    byte-identical documents out of the band self-join.

    ``max_band_width``: optional cap on band-bucket width (the d4
    ``max_postings`` pattern). A bucket with more than this many
    entries is dropped from candidate generation ENTIRELY: without a
    cap, N documents agreeing on a band produce N²/2 candidate rows,
    and when the N documents are true duplicates the estimate filter
    cannot kill them (estimate ≈ 1) — the LSH bucket-flood failure
    mode on duplicate-heavy corpora. Recall loss is confined to pairs
    carried ONLY by flooded buckets, i.e. the highest-duplication
    content — which the exact-first pre-pass (near_dedup_filter)
    should have collapsed before this operator runs; the cap is the
    backstop for skewed non-identical floods (template spam). Default
    None = exact banding.

    ``collapse_exact`` (default True): the standalone-operator form of
    the duplicate-flood guard ``near_dedup_filter`` already applies
    (VERDICT r4 #3). Byte-identical (after normalization) documents
    agree on EVERY band, and the estimate filter cannot kill them
    (estimate = 1, they are true pairs) — so on a duplicate-heavy
    corpus the pair OUTPUT itself is quadratic in the largest group
    (measured exponent 1.81/decade on the dup-heavy scaling corpus).
    With the guard on, exact-duplicate groups are collapsed to their
    min-id representative BEFORE banding: the result is (rep, member)
    edges with ``jaccard = 1.0`` and ``exact_member = true`` (one row
    per non-rep member — linear in corpus size), plus rep-level LSH
    pairs with ``exact_member = false``. Every true pair is
    recoverable — ``expand_collapsed_pairs`` rematerializes the full
    pair set (group-internal pairs from the membership edges;
    cross-group pairs by substituting members for reps, the Jaccard
    being identical because member text equals rep text) and is
    pinned equivalent to ``collapse_exact=False`` output in tests.
    The group structure comes from a LIGHT normalize+fingerprint scan
    (no shingle explode) — one map pass plus one fp-keyed window; the
    r10 optimization round measured that riding the fingerprint
    through the signature aggregate instead made Catalyst column-prune
    the member-edge arm into a SECOND full copy of the corpus explode
    (a Generate cannot be pruned away). Set False for the literal
    all-pairs contract (the pre-guard baseline; the ``exact_member``
    column is still present, all-false, for schema stability).

    ``persist_tracker``: retained for API stability; the LSH
    intermediates flow through plain exchanges and an eager
    localCheckpoint, so nothing is appended to it anymore. The r10
    optimization round measured AQE stage reuse strictly faster than
    block-manager caching of the shared slim frames (concurrent
    consumers raced the cache fill and recomputed the corpus scan
    2-3×; an eager count() barrier on them serialized the DAG), and
    r11 removed the losing persist branch outright.
    """
    if est_hashes is None:
        est_hashes = num_hashes
    if est_hashes < num_hashes or est_hashes % 8:
        raise ValueError("est_hashes must be a multiple of 8 and >= num_hashes")
    if num_hashes // bands < 1:
        raise ValueError("bands must be <= num_hashes")
    with_sig = packed_signatures(
        df, text_col, id_col, est_hashes, shingle_k, seed
    )
    keep = None
    if restrict_ids is not None:
        keep = restrict_ids.select(
            F.col(restrict_ids.columns[0]).alias("__id")
        )
        with_sig = with_sig.join(keep, "__id", "left_semi")
    member_edges = None
    if collapse_exact:
        # Exact-group structure from a LIGHT fingerprint scan — one
        # normalize+xxhash64 per doc, NO shingle explode — plus one
        # fp-keyed window marking each row's min-id representative.
        # The r9 form rode the fingerprint through the signature
        # aggregate (with_fp=True) and filtered the windowed sig
        # table twice; Catalyst then column-pruned the member-edge
        # arm into a SECOND copy of the whole corpus explode + agg —
        # pruning cannot remove the Generate, so that arm cost the
        # full shingle pass (profiled ~18 CPU-s at sf0.1) to produce
        # two slim columns a plain scan yields in <1. With the group
        # structure computed off the light scan, the heavy signature
        # aggregate has exactly ONE plan instance, reused by both
        # band-join sides through its own exchange.
        fps = df.select(
            F.col(id_col).alias("__id"),
            F.xxhash64(normalize_text(text_col)).alias("__fp"),
        )
        if keep is not None:
            # restrict_ids narrows the collapse structure too (the
            # r9 contract: the restriction applied BEFORE the rep
            # window, so groups form within the restricted set)
            fps = fps.join(keep, "__id", "left_semi")
        fps = fps.withColumn(
            "__rep", F.min("__id").over(Window.partitionBy("__fp"))
        )
        member_edges = fps.filter(F.col("__id") != F.col("__rep")).select(
            F.col("__rep").alias("id1"),
            F.col("__id").alias("id2"),
            F.lit(1.0).alias("jaccard"),
            F.lit(True).alias("exact_member"),
        )
        # banding runs over representatives only: restrict the slim
        # signature rows by rep id (the doc TEXT stays out of every
        # shuffle — restricting df itself would move it)
        rep_ids = fps.filter(F.col("__id") == F.col("__rep")).select("__id")
        with_sig = with_sig.join(rep_ids, "__id", "left_semi")
    lsh = _pairs_from_packed(
        with_sig,
        df,
        text_col,
        id_col,
        num_hashes,
        bands,
        shingle_k,
        jaccard_threshold,
        est_hashes,
        persist_tracker,
        max_band_width,
    ).withColumn("exact_member", F.lit(False))
    return lsh if member_edges is None else lsh.unionByName(member_edges)


def _pairs_from_packed(
    with_sig: DataFrame,
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_k: int,
    jaccard_threshold: float,
    est_hashes: int,
    persist_tracker: list | None,
    max_band_width: int | None,
) -> DataFrame:
    """Banding → inline estimate filter → exact verify, from an
    already-persisted packed-signature table (``packed_signatures``
    output restricted to the docs that should enter candidate
    generation). ``df`` is only touched again for the verify stage's
    candidate-restricted re-shingle."""
    r = num_hashes // bands
    n_words = est_hashes // 8

    # band entries: band bi = bytes [bi*r, (bi+1)*r) of the sketch —
    # shifted masks of the packed words (hashed only when r > 8; see
    # _band_val_exprs). The packed words ride along so the self-join
    # output carries both sketches.
    band_exprs = _band_val_exprs(bands, r)
    entries = with_sig.select(
        "__id",
        *[F.col(f"__w{w}") for w in range(n_words)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.expr(band_exprs[bi]).alias("band_val"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("__id", *[f"__w{w}" for w in range(n_words)], "b.band_idx", "b.band_val")
    if max_band_width is not None:
        # bucket-width guard: count entries per (band_idx, band_val)
        # — a partial-agg shuffle of 24-byte rows — and drop flooded
        # buckets before the self-join can square them.
        narrow = (
            entries.groupBy("band_idx", "band_val")
            .agg(F.count(F.lit(1)).alias("__bw"))
            .filter(F.col("__bw") <= max_band_width)
            .select("band_idx", "band_val")
        )
        entries = entries.join(narrow, ["band_idx", "band_val"], "left_semi")

    sig_margin = 2.5 * (0.25 / est_hashes) ** 0.5  # j(1-j) ≤ 0.25
    min_agree = max(0, math.ceil(est_hashes * (jaccard_threshold - sig_margin)))
    agree_expr = byte_agreement_expr(n_words, "l.__w{}", "rr.__w{}")
    est = (
        entries.alias("l")
        .join(
            entries.alias("rr"),
            on=[
                F.col("l.band_idx") == F.col("rr.band_idx"),
                F.col("l.band_val") == F.col("rr.band_val"),
                F.col("l.__id") < F.col("rr.__id"),
            ],
        )
        .filter(F.expr(agree_expr) >= F.lit(min_agree))
        .select(F.col("l.__id").alias("id1"), F.col("rr.__id").alias("id2"))
        .distinct()  # dedup AFTER the estimate filter: multi-band
        # collisions re-test cheaply instead of paying a full shuffle
        # of the raw candidate stream
    )
    # est is materialized unconditionally via eager localCheckpoint —
    # the one intermediate where a barrier is free and materialization
    # is load-bearing at scale. Everything downstream (the ids_needed
    # BROADCAST build, the sh_sets re-shingle, the two verify joins)
    # depends on est, so the barrier serializes nothing; without it,
    # the broadcast-build subtree and the verify chain each re-execute
    # the band self-join + estimate filter (AQE stage reuse dedups the
    # exchange BELOW the join, not the join itself) — measured 4× the
    # sf1 wall on d6 (201 s vs ~50 s) when this ran cache-less during
    # the r10 optimization round. localCheckpoint instead of
    # persist+count (r11): est's lineage — the band self-join over the
    # 64-expression signature aggregate — otherwise reappears in the
    # final plan once per consumer, and Catalyst re-analysis +
    # CacheManager canonical matching of that tree was profiled at
    # ~3 s of driver time per d2 execution (the gap between the est
    # job and the first verify job); the checkpoint truncates the
    # downstream plan to an RDD leaf, and its blocks release with the
    # DataFrame (no cache entry for a caller to leak). The slim
    # signature/frequency tables above stay cache-less (their
    # duplicated post-exchange work is cheap and the cache-fill race
    # cost more — see module flag).
    est = est.localCheckpoint(eager=True)
    # exact verification touches only docs that survive the estimate
    # filter: collapse their shingle streams to per-doc hash SETS
    # (collect_set dedups — no separate distinct shuffle) and compare
    # sets per pair. Task memory is O(one doc's shingle set); the
    # 64-bit shingle hash stands in for the string (collision odds
    # ~n²·2⁻⁶⁴; d4 is the exact-string ground truth).
    #
    # The candidate restriction is applied at the DOCUMENT level,
    # before re-shingling: semi-join the source table on the candidate
    # id set, THEN explode. Restricting the already-exploded stream
    # instead re-shingles the whole corpus to discard ~all of it —
    # measured ~2× the end-to-end wall at sf0.1, and at 100 TB it is
    # the difference between an O(candidates) and an O(corpus) verify
    # stage.
    ids_needed = (
        est.select(F.col("id1").alias("__id"))
        .unionByName(est.select(F.col("id2").alias("__id")))
        .distinct()
    )
    # spread the SCAN side before the broadcast semi-join (the gate is
    # safe here: a scan+project frame, probed before any join is
    # attached). Without it, a single-row-group corpus file puts the
    # entire semi-join + re-shingle + hash map stage on ONE task —
    # profiled 1.3 s serial at sf0.1, the longest stage of the whole
    # d2/d6 pipeline. No-op at production split counts.
    docs_needed = spread_small_scan(
        df.select(F.col(id_col).alias("__did"), F.col(text_col).alias("__txt"))
    ).join(F.broadcast(ids_needed), F.col("__did") == F.col("__id"), "left_semi")
    sh_sets = (
        # spread=False: docs_needed is already spread above; probing a
        # broadcast-join output here would eagerly execute the whole
        # candidate pipeline at plan-build time (the broadcast side is
        # derived from `est`).
        exploded_char_shingles(
            docs_needed, "__txt", "__did", shingle_k, distinct=False, spread=False
        )
        .groupBy("__id")
        .agg(F.collect_set(F.xxhash64("__s")).alias("__set"))
    )
    return (
        est.join(
            sh_sets.select(F.col("__id").alias("id1"), F.col("__set").alias("__s1")),
            "id1",
        )
        .join(
            sh_sets.select(F.col("__id").alias("id2"), F.col("__set").alias("__s2")),
            "id2",
        )
        .withColumn("__common", F.size(F.array_intersect("__s1", "__s2")))
        .withColumn(
            "jaccard",
            F.col("__common")
            / (F.size("__s1") + F.size("__s2") - F.col("__common")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash per document (Charikar random-hyperplane sketch over
    shingle hashes): bit i of the signature is the sign of sum over
    shingles of (+1 if bit i of hash(shingle) else -1).

    ``hash_fn``: "xxhash64" (default — 64-bit sketch, the fastest
    scale path) or "md5" (60-bit sketch from a 15-hex-char md5 prefix
    — the d7/d12 engine-reproducibility convention, so a DuckDB/any-
    SQL oracle replays the EXACT arithmetic and the d3 catalog entry
    is value-verified instead of rows-only).

    Computed as one explode + one n_bits-column conditional-sum
    aggregate (map-side partials) + bit reassembly — fully native,
    one shuffle keyed by doc id.
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError("hash_fn must be xxhash64 or md5")
    n_bits = 64 if hash_fn == "xxhash64" else 60
    sh = exploded_char_shingles(df, text_col, id_col, shingle_k)
    if hash_fn == "xxhash64":
        hashed = sh.withColumn("__h", F.xxhash64("__s"))
    else:
        hashed = sh.withColumn(
            "__h",
            F.conv(F.substring(F.md5(F.col("__s")), 1, 15), 16, 10).cast(
                "long"
            ),
        )
    bit_sums = hashed.groupBy("__id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__b{i}")
            for i in range(n_bits)
        ]
    )
    sig = None
    for i in range(n_bits):
        bit = F.when(F.col(f"__b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return bit_sums.select(F.col("__id").alias(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    shingle_k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidate generation by the pigeonhole principle: split the
    sketch bits into ``max_hamming+1`` chunks; any pair within
    distance must agree on ≥1 whole chunk → equi-join per chunk
    (keyed shuffle), then exact popcount verify. This is the classic
    scalable simhash join (Manku et al., WWW'07 formulation) — no
    all-pairs scan. ``hash_fn`` as in :func:`simhash` ("md5" → the
    60-bit oracle-replayable sketch the d3 catalog entry uses).
    """
    chunks = max_hamming + 1
    n_bits = 64 if hash_fn == "xxhash64" else 60
    width = n_bits // chunks
    sigs = simhash(df, text_col, id_col, shingle_k, hash_fn=hash_fn).select(
        F.col(id_col).alias("__id"), "simhash"
    )
    entries = sigs.select(
        "__id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col("simhash"), ci * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk_val"),
                    )
                    for ci in range(chunks)
                ]
            )
        ).alias("c"),
    ).select("__id", "simhash", "c.chunk_idx", "c.chunk_val")
    cand = (
        entries.alias("l")
        .join(
            entries.alias("rr"),
            on=[
                F.col("l.chunk_idx") == F.col("rr.chunk_idx"),
                F.col("l.chunk_val") == F.col("rr.chunk_val"),
                F.col("l.__id") < F.col("rr.__id"),
            ],
        )
        .select(
            F.col("l.__id").alias("id1"),
            F.col("rr.__id").alias("id2"),
            F.col("l.simhash").alias("__s1"),
            F.col("rr.simhash").alias("__s2"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("__s1").bitwiseXOR(F.col("__s2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 15, driver_threshold: int = 1_000_000
) -> DataFrame:
    """Connected components over a pair list (id1, id2) via iterative
    min-label propagation WITH pointer jumping: each round every
    node's label becomes the minimum label in its neighborhood, then
    labels are shortcut through the label table itself (component :=
    component's component). The shortcut halves label-chain depth per
    round, so convergence is O(log diameter) rounds — the same bound
    the alternating large-star/small-star formulation (Kiveris et
    al.) gives.

    NEVER aborts on a deep graph: if the fixpoint is not reached at
    ``max_iter``, rounds auto-extend up to ceil(log2(n_nodes)) + 4 —
    with pointer jumping that bound is sufficient for ANY graph
    (diameter <= n_nodes), so a pathological chain converges instead
    of killing a 100 TB job at hour N. Only if even the proven bound
    is exhausted (i.e. a logic error, not a deep graph) does it RAISE
    rather than silently return split components (a chain-shaped
    cluster split in two would leak duplicates through
    near_dedup_filter downstream).

    Iterative algorithms are where lazy plans explode — each round
    ``localCheckpoint``s the label table to cut lineage (otherwise the
    plan doubles per iteration and Catalyst analysis dominates).

    Returns (node, component) with component = min node id reachable.

    Hybrid execution: a near-dup pair list is tiny relative to the
    corpus (it is the OUTPUT of dedup). Below ``driver_threshold``
    edges, a driver-side union-find is exact and ~1000× cheaper than
    30 Spark jobs of propagation rounds; above it, the distributed
    path kicks in. Both produce identical labels.

    The pair list is persisted and sized with a full-parallelism
    ``count()`` — NOT ``limit(N).collect()``: CollectLimit executes
    incrementally (1 partition, then scaled-up waves), which serializes
    an expensive upstream pipeline; measured 2× the whole LSH pipeline
    cost at the 50k-doc scale point. The persist also keeps the
    distributed path from re-running that pipeline every propagation
    round.
    """
    from pyspark import StorageLevel

    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pairs.count()
    if n_pairs <= driver_threshold:
        sample = pairs.collect()
        pairs.unpersist()
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])  # path halving
                x = parent[x]
            return x

        for r in sample:
            ra, rb = find(r[0]), find(r[1])
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = {x for r in sample for x in (r[0], r[1])}
        rows = [(n, find(n)) for n in sorted(nodes)]
        # node/component inherit the edge id type (string ids are
        # legal — min-label is lexicographic there, matching the
        # distributed path's F.min semantics)
        from pyspark.sql.types import StructField, StructType

        id_type = pairs.schema[0].dataType
        schema = StructType(
            [
                StructField("node", id_type, False),
                StructField("component", id_type, False),
            ]
        )
        return pairs.sparkSession.createDataFrame(rows, schema)

    # materialize the (persisted) edge list once — every propagation
    # round joins it, and without the checkpoint each round's join
    # would re-derive it through the full upstream pipeline
    edges = (
        pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
        .unionByName(pairs.select(F.col("id2").alias("a"), F.col("id1").alias("b")))
        .localCheckpoint(eager=True)
    )
    pairs.unpersist()
    nodes = edges.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=True)
    # pointer jumping converges in <= ceil(log2(diameter)) + O(1)
    # rounds and diameter <= n_nodes, so this bound is sufficient for
    # any input — max_iter is a floor, not a ceiling that can abort a
    # long-running job on a legitimately deep graph.
    n_nodes = labels.count()
    hard_cap = max(max_iter, math.ceil(math.log2(max(n_nodes, 2))) + 4)
    changed = -1
    for _ in range(hard_cap):
        neigh = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nl"))
        )
        propagated = labels.join(neigh, labels.node == neigh.a, "left").select(
            "node",
            F.least(F.col("component"), F.coalesce("nl", F.col("component"))).alias(
                "component"
            ),
        )
        # pointer jumping: component := component's component. Labels
        # are node ids, so the lookup is a self-join — one extra
        # shuffle per round that turns O(diameter) rounds into
        # O(log diameter).
        lookup = propagated.select(
            F.col("node").alias("__c"), F.col("component").alias("__cc")
        )
        new_labels = (
            propagated.join(lookup, propagated.component == F.col("__c"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("__cc", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {hard_cap} rounds "
            f"({changed} labels still changing) — with pointer jumping "
            f"ceil(log2(n_nodes)) + 4 = {hard_cap} rounds suffice for any "
            "graph, so this indicates a label-propagation logic error, "
            "not a deep graph."
        )
    return labels


def expand_collapsed_pairs(pairs: DataFrame) -> DataFrame:
    """Rematerialize the FULL true-pair set from
    ``minhash_lsh_pairs(collapse_exact=True)`` output — the
    equivalence direction of the duplicate-flood guard: (a) every
    pair INSIDE an exact-duplicate group comes from the group's
    membership edges (all at jaccard 1.0); (b) every CROSS-group pair
    comes from a rep-level LSH pair with members substituted for
    their rep on both sides (same jaccard — a member's text is
    identical to its rep's). Output is (id1 < id2, jaccard), the
    ``collapse_exact=False`` contract.

    This is deliberately the quadratic expansion the collapse avoids
    materializing — for equivalence pinning and for callers that
    genuinely need the flat pair list on a corpus they know is not
    flood-shaped."""
    ex = pairs.filter(F.col("exact_member"))
    lsh = pairs.filter(~F.col("exact_member")).select("id1", "id2", "jaccard")
    members = ex.select(F.col("id1").alias("__rep"), F.col("id2").alias("__node"))
    # rep -> {rep} ∪ members (reps without members fall back to
    # identity via the left-join coalesce below)
    gm = members.unionByName(
        members.select("__rep").distinct().withColumn("__node", F.col("__rep"))
    )
    within = (
        gm.alias("a")
        .join(gm.alias("b"), F.col("a.__rep") == F.col("b.__rep"))
        .filter(F.col("a.__node") < F.col("b.__node"))
        .select(
            F.col("a.__node").alias("id1"),
            F.col("b.__node").alias("id2"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    cross = (
        lsh.join(
            gm.select(F.col("__rep").alias("id1"), F.col("__node").alias("__n1")),
            "id1",
            "left",
        )
        .join(
            gm.select(F.col("__rep").alias("id2"), F.col("__node").alias("__n2")),
            "id2",
            "left",
        )
        .select(
            F.coalesce("__n1", "id1").alias("__u"),
            F.coalesce("__n2", "id2").alias("__v"),
            "jaccard",
        )
        .select(
            F.least("__u", "__v").alias("id1"),
            F.greatest("__u", "__v").alias("id2"),
            "jaccard",
        )
    )
    return within.unionByName(cross)


def exact_dup_edges(
    df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Exact-duplicate group structure for the near-dedup pre-pass:
    returns (rep_ids, edges) where ``rep_ids`` is the single-column
    frame of minimum-id representatives (one per distinct normalized
    text) and ``edges`` is (id1=rep, id2=member) for every non-rep
    member.

    Everything is keyed by the 64-bit text fingerprint (the d1
    convention): the groupBy and the fp join shuffle 16-byte rows;
    document text never moves."""
    fps = df.select(
        F.col(id_col).alias("__id"),
        F.xxhash64(normalize_text(text_col)).alias("__fp"),
    )
    reps = fps.groupBy("__fp").agg(F.min("__id").alias("__rep"))
    edges = (
        fps.join(reps, "__fp")
        .filter(F.col("__id") != F.col("__rep"))
        .select(F.col("__rep").alias("id1"), F.col("__id").alias("id2"))
    )
    return reps.select(F.col("__rep").alias("__id")), edges


def near_dedup_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    release_cache: bool = True,
    exact_first: bool = True,
) -> DataFrame:
    """End-to-end near-duplicate REMOVAL: exact-duplicate collapse →
    LSH pairs over the distinct representatives → connected
    components → keep the minimum-id document per duplicate cluster.
    Returns the deduplicated corpus (all original columns) — the
    operator a training-data pipeline actually calls.

    ``exact_first`` (default True) is the duplicate-heavy-corpus
    guard, mirroring the streaming plane's ordering
    (streaming/micro_batch.py: exact fingerprint anti-join BEFORE
    LSH; reference anchor for the exact-first contract: the
    ON-CONFLICT dedup at dags/utils.py:210): N byte-identical
    documents — the dominant duplicate mode in real crawls — agree on
    every band, so without the pre-pass one bucket holds N entries
    and the self-join emits N²/2 candidate rows the estimate filter
    cannot kill (estimate = 1, they ARE duplicates). Collapsing
    exact-duplicate groups to their min-id representative first keeps
    the band join O(distinct²_bucket); the (rep, member) fingerprint
    edges are unioned into the component edge list afterwards, so the
    cluster structure — and therefore the survivor set (min id per
    component; a member's Jaccard to any third doc equals its rep's,
    its text being identical, so no cross-group edge is lost) — is
    IDENTICAL to running LSH over the full corpus. The fingerprint
    RIDES the signature scan (``packed_signatures(with_fp=True)``):
    group structure, member edges, and the rep restriction are all
    read off the slim persisted signature table, so the pre-pass
    costs zero extra corpus scans and text stays out of every
    shuffle; the only text-carrying operation remains the final
    anti-join, same as before. (``exact_dup_edges`` is the standalone
    form of the same pre-pass for callers outside this pipeline.)

    ``release_cache``: retained for API stability; since the r10/r11
    optimization rounds the LSH intermediates flow through AQE
    exchange reuse and an eager localCheckpoint (released with the
    frame), so the tracker stays empty and this flag is a no-op.
    """
    tracker: list = []
    # exact_first rides minhash_lsh_pairs' collapse_exact guard: its
    # output is EXACTLY the edge set this pipeline needs — (rep,
    # member) fingerprint edges for every exact-duplicate group plus
    # rep-level LSH pairs (the documented collapse equivalence). The
    # r9 formulation derived the same reps/edges/restriction here via
    # a groupBy + fp-join + semi-join over a separate signature table
    # — two more exchanges, one more join, and a THIRD consumer
    # arm racing the signature cache (profiled: the signature
    # partial-agg stage ran 3× per d6 run at sf0.1). The window form
    # inside minhash_lsh_pairs computes rep/member/restriction as
    # three cache-reading filters over one fp-keyed window.
    pairs = minhash_lsh_pairs(
        df,
        text_col,
        id_col,
        num_hashes,
        bands,
        shingle_k,
        jaccard_threshold,
        seed,
        persist_tracker=tracker,
        # exact_first=False is the LSH-over-everything baseline the
        # parity pin compares against — literally over everything
        collapse_exact=exact_first,
    )
    edge_list = pairs.select("id1", "id2")
    comp = connected_components(edge_list)
    # connected_components materializes the pair list eagerly (driver
    # union-find collect, or checkpointed propagation rounds) — the LSH
    # pipeline's cached intermediates are dead weight from here on;
    # release them instead of waiting on the JVM context cleaner.
    if release_cache:
        for cached in tracker:
            cached.unpersist()
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def segment_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    segment_words: int = 16,
    min_df: int = 2,
) -> DataFrame:
    """SEGMENT-level duplicate removal — the corpus-curation stage
    document-level dedup (d1/d2) cannot express: boilerplate
    paragraphs (headers, navigation, license blocks) repeat across
    otherwise-distinct documents, and the fix is to drop the
    REPEATED SEGMENT from every document while keeping the documents
    (the CCNet / RefinedWeb line-dedup pass). Segments here are
    fixed ``segment_words``-word windows (a delimiter-free corpus has
    no line structure; swap the segmenter for a split on newlines
    when the data has one — the plan shape is identical).

    A segment is removed from ALL documents containing it when its
    document frequency (DISTINCT documents, so a within-document
    repeat alone does not trigger) reaches ``min_df``.

    Plan shape at 100 TB (the d1 property, extended): segment TEXT
    never shuffles —
      1. map-only: explode each doc to (id, seg_idx, xxhash64(seg))
         — 24 bytes per segment;
      2. document frequency per fingerprint: one hash-partitioned
         aggregate over those 24-byte rows (map-side partial
         count_distinct collapse);
      3. dup fingerprints (df >= min_df) semi-join back onto the
         (id, seg_idx, fp) stream — fingerprint-keyed, uniform;
      4. per-doc removed-index lists (small int arrays) join the
         ORIGINAL table by id, and the cleaned text is rebuilt
         in place by re-slicing the token array and skipping removed
         indices — per-row array lambdas, the acceptable HOF case
         (one pass per ROW, cf. quantize_embeddings).

    Returns (id, clean_text, n_removed) with n_removed the count of
    removed segments. Fingerprint collisions (~n_segments²·2⁻⁶⁴)
    follow the d1 convention: the 64-bit hash stands in for the
    segment text.
    """
    w = segment_words
    toks = F.split(F.col(text_col), " ")
    nseg = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(w))).cast("long"), F.lit(1).cast("long")
    )
    seg_of = lambda gi: F.concat_ws(" ", F.slice(toks, gi * w + 1, w))  # noqa: E731
    segs = df.select(
        F.col(id_col).alias("__id"),
        toks.alias("__t"),
        F.explode(F.sequence(F.lit(0).cast("long"), nseg - 1)).alias("__gi"),
    ).select(
        "__id",
        "__gi",
        F.xxhash64(
            F.concat_ws(" ", F.slice("__t", F.col("__gi") * w + 1, w))
        ).alias("__fp"),
    )
    # document frequency INLINE via one window pass (dense_rank over
    # (__fp, __id) peaks at the distinct-doc count; max over __fp
    # broadcasts it back) instead of a groupBy + semi-join back onto
    # the segment stream — the join form executed the explode+hash
    # scan once per arm (same r11 rewrite as duplicate_spans /
    # corpus_duplicate_ngrams; df semantics identical).
    w_ord = Window.partitionBy("__fp").orderBy("__id")
    w_all = Window.partitionBy("__fp")
    rm_lists = (
        segs.withColumn("__dr", F.dense_rank().over(w_ord))
        .withColumn("__df", F.max("__dr").over(w_all))
        .filter(F.col("__df") >= min_df)
        .groupBy("__id")
        .agg(F.collect_list("__gi").alias("__rm"))
    )
    joined = df.join(rm_lists, df[id_col] == rm_lists["__id"], "left")
    rm = F.coalesce(F.col("__rm"), F.array().cast("array<bigint>"))
    kept_idx = F.filter(
        F.sequence(F.lit(0).cast("long"), nseg - 1),
        lambda i: ~F.array_contains(rm, i),
    )
    clean = F.concat_ws(" ", F.transform(kept_idx, seg_of))
    return joined.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(rm).cast("long").alias("n_removed"),
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window_chars: int = 48,
    anchor_every: int = 16,
    anchor_gram: int = 8,
    min_df: int = 2,
    anchor_hash: str = "xxhash64",
) -> DataFrame:
    """Exact duplicated-SPAN detection — the substring-dedup stage
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): find character ranges that occur verbatim in ≥
    ``min_df`` distinct documents, so callers can cut the span (not
    the document, not a fixed segment grid) out of the training set.
    Complements d1 (whole-doc), d13 (aligned segment grid): a
    duplicated passage at an ARBITRARY offset is invisible to both.

    Suffix arrays make this O(corpus log corpus) single-node; the
    Spark-native equivalent samples windows at CONTENT-DEFINED
    anchors: position p anchors a window iff
    hash(text[p, p+anchor_gram)) ≡ 0 (mod ``anchor_every``) — the
    rsync/CDC trick. Anchors are a function of the TEXT, not the
    offset, so the two copies of a duplicated run anchor at the SAME
    in-run positions no matter where each copy sits in its document
    (a fixed-stride grid only catches copies whose offsets agree mod
    stride — the flaw this formulation exists to avoid). Expected
    window density is 1/anchor_every; a duplicated run of length L
    is missed with prob ≈ (1-1/a)^(L-w), negligible for real
    boilerplate (L ≳ 150 at the defaults → <0.2%).

      1. map-only: slide the anchor test over every position (an
         O(chars) hash each, no shuffle — the t6/winnowing cost
         class), emit (id, start, window-hash) for anchored windows —
         ~len/anchor_every rows of 24 bytes per doc, text never
         shuffles;
      2. cross-document frequency per window hash (one partial-agg
         shuffle) → duplicated hashes (df ≥ min_df on DISTINCT docs);
      3. semi-join hits, then merge OVERLAPPING hits per doc into
         maximal spans with the classic window trick: break where
         start > max(prev end) over the per-doc start-ordered frame,
         running-sum the breaks into span ids, aggregate.

    ``anchor_hash``: "xxhash64" (default — fastest) or "md5" (the
    d7/d12 engine-reproducibility convention: any engine with md5
    reproduces the anchor set bit-for-bit; the DuckDB oracle uses
    this mode). Window identity always uses xxhash64 internally —
    only spans are returned, so the df key never crosses engines.

    Returns (id, span_start, span_end, n_windows) — 1-based inclusive
    character range per merged span. Within-doc-only repeats don't
    count (df is distinct docs, the d13 convention)."""
    if anchor_hash not in ("xxhash64", "md5"):
        raise ValueError("anchor_hash must be xxhash64 or md5")
    n = F.length(F.col(text_col))
    n_pos = n - window_chars + 1
    # sequence(1, 0) is DESCENDING in Spark — emit an empty array for
    # docs shorter than one window instead.
    ps = F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
        F.array().cast("array<int>")
    )
    pos = spread_small_scan(df).select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.explode(ps).alias("__s"),
    )
    gram = F.substring(F.col("__t"), F.col("__s"), anchor_gram)
    if anchor_hash == "md5":
        hv = F.conv(
            F.substring(F.md5(F.encode(gram, "UTF-8")), 1, 15), 16, 10
        ).cast("long")
    else:
        hv = F.xxhash64(gram)
    win = pos.filter(F.pmod(hv, F.lit(anchor_every)) == 0).select(
        "__id",
        "__s",
        F.xxhash64(F.substring(F.col("__t"), F.col("__s"), window_chars)).alias(
            "__h"
        ),
    )
    # cross-document frequency INLINE via one window pass instead of a
    # groupBy + semi-join back onto the window stream: the join form
    # executes the anchor scan (an O(chars) hash per position — the
    # expensive stage) once per arm, and AQE stage reuse cannot dedup
    # it because the two arms' exchanges differ. dense_rank over
    # (__h, __id) peaks at the distinct-doc count, max over __h
    # broadcasts it back to every row — one exchange, one sort (the
    # (__h, __id) sort satisfies both window specs), identical df
    # semantics (distinct documents, within-doc repeats don't count).
    w_ord = Window.partitionBy("__h").orderBy("__id")
    w_all = Window.partitionBy("__h")
    hits = (
        win.withColumn("__dr", F.dense_rank().over(w_ord))
        .withColumn("__df", F.max("__dr").over(w_all))
        .filter(F.col("__df") >= min_df)
        .select("__id", "__s", (F.col("__s") + (window_chars - 1)).alias("__e"))
    )
    prev = (
        Window.partitionBy("__id")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cur = (
        Window.partitionBy("__id")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        hits.withColumn(
            "__brk",
            (F.col("__s") > F.coalesce(F.max("__e").over(prev), F.lit(-1)))
            .cast("int"),
        )
        .withColumn("__span", F.sum("__brk").over(cur))
        .groupBy("__id", "__span")
        .agg(
            F.min("__s").cast("long").alias("span_start"),
            F.max("__e").cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
    )
    return spans.select(
        F.col("__id").alias(id_col), "span_start", "span_end", "n_windows"
    )


def trim_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    spans_df: DataFrame,
    start_col: str = "span_start",
    end_col: str = "span_end",
) -> DataFrame:
    """Cut character spans OUT of documents — the fix half of
    :func:`duplicate_spans` (Lee et al. substring dedup / the
    RefinedWeb boilerplate-removal shape): feed it d14's detected
    duplicated ranges (or any per-doc span list, 1-based inclusive)
    and get the surgically trimmed text back. Which spans to cut is
    the CALLER's policy — cut-everywhere removes boilerplate mass;
    an all-but-one policy joins its own survivor choice first.

    Execution: spans collect per doc into a sorted array (bounded —
    spans per doc ~ len/anchor_every at the d14 defaults), one join
    against the docs, then a single native higher-order ``aggregate``
    stitches the between-span gaps left-to-right. No UDF, no explode
    of text, one pass over each doc's characters; docs without spans
    pass through untouched on the left join. Defensive against
    overlapping input spans (pos advances monotonically; negative gap
    widths clamp to empty).

    Returns (id, text_trimmed, n_chars_removed)."""
    sp = F.struct(
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    )
    per_doc = spans_df.groupBy(F.col(id_col)).agg(
        F.sort_array(F.collect_list(sp)).alias("__spans")
    )
    joined = df.join(per_doc, on=id_col, how="left")
    txt = F.col(text_col)
    init = F.struct(
        F.lit(1).cast("long").alias("pos"), F.lit("").alias("acc")
    )

    def step(a, s):
        gap = F.greatest(F.lit(0).cast("long"), s["s"] - a["pos"])
        return F.struct(
            F.greatest(a["pos"], s["e"] + 1).alias("pos"),
            F.concat(
                a["acc"],
                F.substring(txt, a["pos"].cast("int"), gap.cast("int")),
            ).alias("acc"),
        )

    trimmed = F.aggregate(
        "__spans",
        init,
        step,
        lambda a: F.concat(
            a["acc"],
            F.substring(
                txt,
                a["pos"].cast("int"),
                F.greatest(
                    F.lit(0).cast("long"), F.length(txt) - a["pos"] + 1
                ).cast("int"),
            ),
        ),
    )
    out_txt = F.when(F.col("__spans").isNull(), txt).otherwise(trimmed)
    return joined.select(
        F.col(id_col),
        out_txt.alias("text_trimmed"),
        (F.coalesce(F.length(txt), F.lit(0)) - F.coalesce(F.length(out_txt), F.lit(0)))
        .cast("long")
        .alias("n_chars_removed"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.4,
    max_postings: int | None = None,
) -> DataFrame:
    """EXACT word n-gram Jaccard similar pairs via the explode-shingle
    equi-join (no LSH approximation — the ground-truth operator the
    LSH variants approximate, and the form a SQL oracle can verify).

    count(shared shingles) via self-join on shingle, then
    |A∪B| = |A|+|B|-|A∩B|. Scales as O(sum of postings²) per shingle
    — fine when shingles are selective (stopword-only shingles are the
    skew risk; n≥3 word grams keep postings short).

    ``max_postings`` is the skew guard for corpora with pathological
    shingles: postings lists longer than the cap are dropped ENTIRELY
    (a document-frequency stop-shingle filter — the standard IR move).
    Jaccard then slightly UNDER-estimates for pairs whose overlap was
    carried by ubiquitous shingles, which is the conservative
    direction for dedup (near-dups by stop-shingles alone are not
    near-dups). Sizes are computed on the SAME filtered stream so the
    estimate stays internally consistent. Default None = exact.
    """
    sh = exploded_word_shingles(df, text_col, id_col, n)
    if max_postings is not None:
        freq = sh.groupBy("__s").agg(F.count(F.lit(1)).alias("__pf"))
        sh = (
            sh.join(freq.filter(F.col("__pf") <= max_postings), "__s")
            .drop("__pf")
        )
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    common = (
        sh.alias("a")
        .join(sh.alias("b"), on=[F.col("a.__s") == F.col("b.__s"), F.col("a.__id") < F.col("b.__id")])
        .groupBy(F.col("a.__id").alias("id1"), F.col("b.__id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"__id": "id1", "__sz": "__sz1"}), "id1")
        .join(sizes.withColumnsRenamed({"__id": "id2", "__sz": "__sz2"}), "id2")
        .withColumn(
            "jaccard",
            F.col("__common") / (F.col("__sz1") + F.col("__sz2") - F.col("__common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))
    )


def priority_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    priority_col: str,
    keep_counts: bool = True,
) -> DataFrame:
    """Cross-source exact dedup with a survivor PREFERENCE: within
    each duplicate group (byte-identical normalized text) keep the
    row with the LOWEST ``priority_col`` value, ties broken by min
    id — the Pile/RefinedWeb-style cross-source rule ("prefer the
    curated copy over the crawl copy") that plain ``exact_dedup``'s
    min-id convention cannot express.

    Winner election (both paths): shuffles only (fingerprint,
    priority, id) triples with full map-side partial aggregation —
    ``min_by`` over a (priority, id) struct is an ordinary
    partial-merge aggregate, so a duplicate flood combines in the map
    stage; the winners frame is ~16 bytes/group. With a constant
    priority column this degenerates to exact_dedup's min-id
    semantics (pytest-pinned).

    Survivor recovery — two shapes, same result (pytest-pinned
    equal):

    - ``keep_counts=True`` (default; the oracle form): inner id-join
      against the winner list, attaching ``dup_count`` (group size).
      Costs one row-carrying exchange of the corpus keyed by id —
      fine when you wanted id-partitioned output anyway.
    - ``keep_counts=False`` (the 100 TB filter path): derive the
      LOSER id list (members minus winners — narrow triples only)
      and anti-join the corpus against it. Duplicates are the
      minority in a real crawl, so the loser list is small enough
      for AQE to broadcast the anti-join and the document text then
      crosses the wire ZERO times (d6 near_dedup_filter's shape).

    Returns surviving rows (all original columns), plus
    ``dup_count`` when ``keep_counts`` is set.
    """
    fp = F.xxhash64(normalize_text(text_col))
    keyed = df.select(
        F.col(id_col).alias("__pd_id"),
        F.col(priority_col).alias("__pd_prio"),
        fp.alias("__pd_fp"),
    )
    winners = keyed.groupBy("__pd_fp").agg(
        F.min_by("__pd_id", F.struct("__pd_prio", "__pd_id")).alias("__pd_win"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    if keep_counts:
        return df.join(
            winners.select(F.col("__pd_win").alias(id_col), "dup_count"),
            id_col,
            "inner",
        )
    losers = (
        keyed.join(winners.select("__pd_fp", "__pd_win"), "__pd_fp")
        .filter(F.col("__pd_id") != F.col("__pd_win"))
        .select(F.col("__pd_id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


def leakage_safe_split(
    df: DataFrame,
    edges: DataFrame,
    id_col: str,
    train_fraction: float = 0.8,
    splits: tuple[str, str] = ("train", "eval"),
) -> DataFrame:
    """Train/eval split that can never leak near-duplicates across
    the boundary: every connected component of the supplied
    near-duplicate graph lands WHOLLY on one side, because the split
    is decided by hashing the component's GROUP id, never the row id.
    A random per-row split over a corpus with near-dups puts one copy
    of a duplicated page in train and the other in eval — the
    contamination failure mode c2/c7 decontamination exists to catch;
    this operator prevents it structurally at split time.

    ``edges`` is any (id1, id2) pair frame — compose with the
    generator matching your budget (d4 exact Jaccard for oracle-grade
    ground truth, d2 MinHash-LSH or d11 embedding-LSH at scale).
    Singleton documents (no edge) form their own group.

    Split rule (shared with the SQL oracle, engine-portable):
    ``conv(substr(md5(cast(group as string)), 1, 4), 16, 10)`` — the
    first 16 bits of md5 — gives 65536 buckets; train iff bucket <
    round(65536 · train_fraction). md5 of the decimal string is
    bit-identical across Spark / DuckDB / Python, so the assignment
    is reproducible anywhere (and unlike xxhash64 it is not
    Spark-private). Granularity of the fraction is 1/65536.

    Scale shape: the component table is sized by the DUPLICATED
    subset only (edges are dedup output, tiny vs corpus), so the
    label join broadcasts under AQE; the corpus streams once and the
    split decision is a map-side expression. Nothing about the wide
    document row ever shuffles.

    Returns the input rows plus ``group_id`` (component rep = min id
    reachable, own id for singletons) and ``split``.
    """
    if not 0.0 <= train_fraction <= 1.0:
        raise ValueError(f"train_fraction must be in [0,1]: {train_fraction}")
    cut = int(round(65536 * train_fraction))
    comp = connected_components(edges.select("id1", "id2")).select(
        F.col("node").alias("__lss_node"), F.col("component").alias("__lss_comp")
    )
    out = df.join(comp, df[id_col] == comp["__lss_node"], "left")
    # No cast to long: string ids must hash as strings (a long cast
    # would NULL them out and silently dump every row on the eval
    # side). group_id keeps the id column's native type; integer and
    # string ids hash identically to before. Fractional ids (double/
    # decimal) now hash their EXACT string form — the old truncating
    # cast collapsed distinct ids like 123.1 and 123.9 into one group,
    # which was a correctness bug, but a float's string form is
    # engine-specific: use integral or string ids when the split must
    # be reproduced outside Spark.
    group = F.coalesce(F.col("__lss_comp"), F.col(id_col))
    bucket = F.conv(
        F.substring(F.md5(group.cast("string")), 1, 4), 16, 10
    ).cast("long")
    return out.select(
        *df.columns,
        group.alias("group_id"),
        F.when(bucket < F.lit(cut), F.lit(splits[0]))
        .otherwise(F.lit(splits[1]))
        .alias("split"),
    )
