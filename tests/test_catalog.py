"""Smoke + semantics tests over the query catalog (the DuckDB oracle
equivalence itself is exercised by tools/check_oracles.py and the
driver; here we pin the non-SQL-checkable semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from __spark_entry__ import entry, oracle_sql, queries


def test_entry_smoke(spark):
    df = entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_query_runs_and_has_stable_schema(spark, sf_dir):
    qs = queries()
    assert len(qs) >= 40
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        # schema must be stable across two plan builds
        assert fn(spark, sf_dir).schema == df.schema, name


def test_oracle_coverage(spark):
    qs, osql = queries(), oracle_sql()
    assert set(osql) <= set(qs)
    # every oracle-less query is one of the documented approximate/
    # heuristic/UDF ops — keep this list in sync deliberately
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        # FFD bin state is order-dependent greedy — not SQL (r7);
        # kernel pinned vs a pure-Python reference in curation tests
        "c13_pack_best_fit",
        "c1_curate_corpus",
        "d2_minhash_lsh",
        "d9_incremental_near_dup",
        "d6_near_dedup_filter",
        # precision 1 vs d5 by construction; LSH bounds recall < 1
        "d11_embedding_neardup_lsh",
        # ε-ball dedup under k-means partitioning; greedy scan order
        "d15_semantic_dedup",
        "s2_lsh_ann",
        "s3_ivf_ann",
        # IVF routing + k-means PQ codebooks (iterative/seeded);
        # recall >= 0.8 vs exact s1 pinned in test_similarity.py
        "s6_ivf_pq_ann",
        # persisted IVF-PQ index (same seeded quantizers) + frozen-
        # model append; recall/append/upsert/time-travel pinned in
        # test_similarity.py
        "s7_persistent_ann",
        "a10_approx_distinct",
        # trained-model scoring (L-BFGS logistic fit not SQL-expressible)
        "c8_quality_classifier",
        # iterative argmax loop (merge list pinned vs a pure-Python
        # reference in test_bpe.py)
        "t19_bpe_train",
    }
    # ... and COVERAGE.md's "Rows-only keys — pin inventory" table
    # must list exactly this set (VERDICT r7 #7): the audit trail of
    # key -> pin test -> bound lives there, one row per key
    import pathlib
    import re

    cov = (pathlib.Path(__file__).parent.parent / "COVERAGE.md").read_text()
    section = cov.split("## Rows-only keys")[1]
    documented = set(re.findall(r"^\| `([a-z0-9_]+)` \|", section, re.M))
    assert documented == rows_only, (
        f"COVERAGE.md pin inventory drifted: "
        f"missing={sorted(rows_only - documented)} "
        f"stale={sorted(documented - rows_only)}"
    )


def test_minhash_agrees_with_exact_jaccard(spark, sf_dir):
    """LSH recall sanity: at threshold 0.5 with 16 bands × 4 rows,
    candidate-prob at j=0.5 is ~0.93 — minhash pairs must be a
    near-superset of exact pairs at a higher threshold and every
    verified pair must be exact-correct (verification IS exact)."""
    from traffic_forecast_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lsh = {
        (r.id1, r.id2): r.jaccard
        for r in minhash_lsh_pairs(docs, "text", "doc_id", jaccard_threshold=0.5).collect()
    }
    # char-5-gram exact pairs as ground truth for the same threshold
    from traffic_forecast_etl_spark.operators import dedup as D

    sh = D.exploded_char_shingles(docs, "text", "doc_id", 5)
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        sh.withColumnsRenamed({"__id": "id1"})
        .join(sh.withColumnsRenamed({"__id": "id2"}), "__s")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = {
        (r.id1, r.id2): r.j
        for r in common.join(sizes.withColumnsRenamed({"__id": "id1", "sz": "sz1"}), "id1")
        .join(sizes.withColumnsRenamed({"__id": "id2", "sz": "sz2"}), "id2")
        .withColumn("j", F.col("c") / (F.col("sz1") + F.col("sz2") - F.col("c")))
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    # verified LSH pairs are exact-correct
    for pair, j in lsh.items():
        assert pair in exact, f"LSH produced non-duplicate pair {pair}"
        assert abs(exact[pair] - j) < 1e-4
    # recall: ≥ 80% of true pairs found (16×4 banding @ j≥0.5)
    if exact:
        assert len(lsh) / len(exact) >= 0.8


def test_lang_id_on_fixture_texts(spark):
    """Heuristic language ID routes clearly-marked texts correctly.
    (The synthetic documents table's `lang` column is random — its
    text is English-ish for every label — so accuracy is asserted on
    crafted fixtures, not that column.)"""
    from traffic_forecast_etl_spark.operators.text import lang_id

    rows = [
        (1, "the cat sat on the mat and it was happy for a while", "en"),
        (2, "le chat est dans la maison et il dort pour la nuit", "fr"),
        (3, "der Hund ist nicht mit der Katze und das ist gut", "de"),
        (4, "el perro es grande y la casa es pequeña por la noche", "es"),
        (5, "今天天气很好我们去公园散步吧", "zh"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, expected string")
    pred = {r.doc_id: r.lang_pred for r in lang_id(df, "text", "doc_id").collect()}
    expected = {i: e for i, _, e in rows}
    assert pred == expected


def test_asof_join_semantics(spark):
    """Pinned example: backward as-of picks the latest right row ≤ ts,
    exact-timestamp matches included, no match → NULL."""
    from traffic_forecast_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 25), (3, "u", 5), (4, "v", 50)],
        "lid int, k string, t int",
    )
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 20, 2.0), ("u", 30, 3.0)], "k string, t int, v double"
    )
    out = {
        r.lid: r.v_right
        for r in asof_join(left, right, on="t", by=["k"], right_cols=["v"]).collect()
    }
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: None}


def test_asof_join_forward_nearest_tolerance(spark):
    """Pinned: forward picks the earliest right ≥ ts; nearest picks
    the closer side with ties breaking backward; tolerance nulls out
    matches farther than the bound (per direction)."""
    from traffic_forecast_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u", 12), (2, "u", 25), (3, "u", 95), (4, "v", 50)],
        "lid int, k string, t int",
    )
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 20, 2.0), ("u", 30, 3.0)], "k string, t int, v double"
    )

    def run(**kw):
        return {
            r.lid: r.v_right
            for r in asof_join(
                left, right, on="t", by=["k"], right_cols=["v"], **kw
            ).collect()
        }

    # forward: 12→20, 25→30, 95→none, v→none
    assert run(direction="forward") == {1: 2.0, 2: 3.0, 3: None, 4: None}
    # nearest: 12→10 (d2 vs d8), 25→20|30 tie → backward, 95→30
    assert run(direction="nearest") == {1: 1.0, 2: 2.0, 3: 3.0, 4: None}
    # tolerance bounds each direction: 95's nearest (30, d=65) nulls
    assert run(direction="nearest", tolerance=10.0) == {1: 1.0, 2: 2.0, 3: None, 4: None}
    assert run(direction="backward", tolerance=1.0) == {1: None, 2: None, 3: None, 4: None}


def test_asof_join_matched_row_null_payload(spark):
    """The matched right row's values travel as one struct: a NULL in
    one payload column of the matched row stays NULL (it must NOT be
    back-filled from an older right row — pandas merge_asof returns
    the matched row verbatim), and with a tolerance bound no value may
    come from a right row outside the bound."""
    from traffic_forecast_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, "u", 30)], "lid int, k string, t int")
    right = spark.createDataFrame(
        [("u", 10, 1.0, 100.0), ("u", 29, None, 200.0)],
        "k string, t int, v double, w double",
    )
    row = asof_join(
        left, right, on="t", by=["k"], right_cols=["v", "w"]
    ).collect()[0]
    # matched row is t=29: its v is legitimately NULL, w=200; v must
    # NOT leak 1.0 from the older t=10 row.
    assert (row.v_right, row.w_right) == (None, 200.0)

    # tolerance=5: t=29 within bound, t=10 outside — same answer, and
    # never (1.0, ...) which would be an out-of-tolerance leak.
    row = asof_join(
        left, right, on="t", by=["k"], right_cols=["v", "w"], tolerance=5.0
    ).collect()[0]
    assert (row.v_right, row.w_right) == (None, 200.0)


def test_resample_interpolate_bins_off_grid(spark):
    """Off-phase observations bin to their floor-to-step slot instead
    of being silently discarded; duplicates within a slot average."""
    from datetime import datetime

    from traffic_forecast_etl_spark.operators.timeseries import resample_interpolate

    df = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 17), 2.0),   # → 00:00 slot
            ("a", datetime(2024, 1, 1, 0, 45), 4.0),   # same slot → avg 3.0
            ("a", datetime(2024, 1, 1, 2, 59), 9.0),   # → 02:00 slot
        ],
        "k string, ts timestamp, v double",
    )
    out = {
        (r.k, r.ts.hour, r.ts.minute): (r.v, r.is_interpolated)
        for r in resample_interpolate(df, "ts", ["k"], "v").collect()
    }
    assert out == {
        ("a", 0, 0): (3.0, False),  # (2+4)/2, binned not dropped
        ("a", 1, 0): (6.0, True),   # midpoint of 3 and 9
        ("a", 2, 0): (9.0, False),
    }


def test_table_diff_null_safe_keys(spark):
    """A NULL-keyed row identical on both sides matches (no phantom
    added+removed pair); a NULL-keyed changed row reports changed."""
    from traffic_forecast_etl_spark.operators.relational import table_diff

    left = spark.createDataFrame(
        [(None, 1.0), (1, 2.0), (2, 5.0)], "k int, v double"
    )
    right = spark.createDataFrame(
        [(None, 1.0), (1, 3.0), (3, 7.0)], "k int, v double"
    )
    out = {(r.k, r.diff_status) for r in table_diff(left, right, ["k"]).collect()}
    assert out == {(1, "changed"), (2, "removed"), (3, "added")}

    # and a NULL-keyed payload change is still visible
    right2 = spark.createDataFrame([(None, 9.0)], "k int, v double")
    left2 = spark.createDataFrame([(None, 1.0)], "k int, v double")
    out2 = {(r.k, r.diff_status) for r in table_diff(left2, right2, ["k"]).collect()}
    assert out2 == {(None, "changed")}


def test_resample_interpolate_semantics(spark):
    """Pinned example: a 2-hour interior gap fills linearly (1/3, 2/3
    fractions), edges extend the nearest observation, observed rows
    pass through untouched, and each series keeps its own grid."""
    from datetime import datetime

    from traffic_forecast_etl_spark.operators.timeseries import resample_interpolate

    def t(h):
        return datetime(2024, 1, 1, h)

    df = spark.createDataFrame(
        [("a", t(0), 3.0), ("a", t(3), 9.0), ("a", t(4), 10.0), ("b", t(2), 5.0)],
        "k string, ts timestamp, v double",
    )
    out = {
        (r.k, r.ts.hour): (r.v, r.is_interpolated)
        for r in resample_interpolate(df, "ts", ["k"], "v").collect()
    }
    assert out == {
        ("a", 0): (3.0, False),
        ("a", 1): (5.0, True),   # 3 + (9-3)*1/3
        ("a", 2): (7.0, True),   # 3 + (9-3)*2/3
        ("a", 3): (9.0, False),
        ("a", 4): (10.0, False),
        ("b", 2): (5.0, False),  # single-point series: grid is itself
    }


def test_temporal_split_is_deterministic_and_disjoint(spark, sf_dir):
    from traffic_forecast_etl_spark.operators.relational import temporal_split

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from traffic_forecast_etl_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    train, test = temporal_split(ev, [F.col("ts").asc(), F.col("event_id").asc()], 500)
    n_train, n_test, n = train.count(), test.count(), ev.count()
    assert n_train == 500 and n_train + n_test == n
    ids = {r.event_id for r in train.select("event_id").collect()}
    ids2 = {r.event_id for r in test.select("event_id").collect()}
    assert not (ids & ids2)


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL++ at rsd=0.02 must land within 3x the requested relative
    error of the exact distinct count on every group."""
    from traffic_forecast_etl_spark.operators.aggregates import (
        approx_distinct,
        distinct_agg,
    )
    from traffic_forecast_etl_spark.sources.tables import load_table

    o = load_table(spark, "orders", sf_dir)
    exact = {r.o_orderpriority: r.nd_o_custkey
             for r in distinct_agg(o, ["o_orderpriority"], "o_custkey").collect()}
    apx = {r.o_orderpriority: r.apx_o_custkey
           for r in approx_distinct(o, ["o_orderpriority"], "o_custkey", rsd=0.02).collect()}
    assert exact.keys() == apx.keys()
    for k, n in exact.items():
        assert abs(apx[k] - n) <= max(3, 0.06 * n), (k, apx[k], n)


def test_resize_stub_bytes(spark):
    """The resize kernel's byte behavior: every k-th byte kept with
    k = in_px // out_px (floored, min 1); binary payload round-trips
    through Arrow intact."""
    from traffic_forecast_etl_spark.operators.multimodal import (
        synthesize_media,
        resize_stub,
    )

    text = "x" * 1000  # w = 1000%640+1 = 361, h = 1000%480+1 = 41
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = resize_stub(synthesize_media(df, "text", "doc_id"), 64, 64).first()
    k = (361 * 41) // (64 * 64)  # = 3
    expected = text.encode()[::k]
    assert out.content == expected and out.out_len == len(expected)
    # small image never upsamples: k floors at 1 -> payload unchanged
    tiny = spark.createDataFrame([(2, "ab")], "doc_id long, text string")
    r = resize_stub(synthesize_media(tiny, "text", "doc_id"), 64, 64).first()
    assert r.content == b"ab"


def test_redact_pii_on_synthetic_fixtures(spark):
    """The corpus is mostly PII-free (t8's oracle proves Java/RE2
    regex agreement on it); this pins the actual redaction semantics
    on planted PII."""
    from traffic_forecast_etl_spark.operators.text import redact_pii

    rows = [
        (1, "contact jane.doe+spam@example.co.uk or call 555-867 5309 x"),
        (2, "server at 192.168.0.1 and 10.0.0.255, phone 020 555 1234"),
        (3, "clean text with version 1.2.3 and year 2024"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(df, "text", "doc_id").collect()}
    assert got[1].n_email == 1 and "<EMAIL>" in got[1].text_clean
    assert "jane" not in got[1].text_clean
    # 555-867 5309: mixed separators still match the phone shape
    assert got[1].n_phone == 1
    assert got[2].n_ipv4 == 2 and got[2].text_clean.count("<IPV4>") == 2
    assert got[2].n_phone == 1  # 020 555 1234
    # version strings and years are NOT IPs/phones
    assert got[3].n_email == got[3].n_phone == got[3].n_ipv4 == 0
    assert got[3].text_clean == rows[2][1]


def test_chunk_documents_overlap_and_coverage(spark):
    """Consecutive chunks share exactly `overlap` tokens and their
    union reconstructs the document with no token lost."""
    from traffic_forecast_etl_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        chunk_documents(df, "text", "doc_id", chunk_tokens=64, overlap=16).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [c.chunk_idx for c in chunks] == [0, 1, 2]
    t0, t1, t2 = (c.chunk_text.split(" ") for c in chunks)
    assert t0[-16:] == t1[:16] and t1[-16:] == t2[:16]  # exact overlap
    merged = t0 + t1[16:] + t2[16:]
    assert merged == text.split(" ")  # full coverage, order preserved
    assert chunks[-1].n_chunk_tokens == 150 - 2 * 48


def test_interval_overlap_join_emits_each_pair_once(spark):
    """A pair overlapping across several shared bins must emit exactly
    once (first-overlap-bin guard, no distinct); touching endpoints
    count (closed intervals); disjoint intervals don't."""
    from pyspark.sql import functions as F

    from traffic_forecast_etl_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [("u", 1, 0.0, 350.0), ("u", 2, 500.0, 600.0)],
        "k string, lid int, s double, e double",
    )
    right = spark.createDataFrame(
        [("u", 10, 100.0, 450.0), ("u", 11, 600.0, 700.0), ("u", 12, 460.0, 490.0)],
        "k string, rid int, s double, e double",
    )
    rows = interval_overlap_join(
        left, right, "lid", "s", "e", "rid", "s", "e", by=["k"], bin_width=100.0
    ).collect()
    got = {(r.lid, r.rid): r.overlap_seconds for r in rows}
    # (1,10) overlaps bins 1-3 — exactly one row; (2,11) touch at 600
    assert got == {(1, 10): 250.0, (2, 11): 0.0}


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_join_matches_brute_force(spark):
    """Completeness of the k-deletion-neighborhood blocking (FastSS):
    on a mixed fixture — insertions, deletions, substitutions at
    every position, transposition (= 2 edits), unicode, empty string,
    heavy duplication — the operator's pair set must EQUAL the
    brute-force nested-loop Levenshtein pair set for k=1 and k=2.
    Duplicated input rows must not duplicate output pairs (the
    distinct-string collapse)."""
    from traffic_forecast_etl_spark.operators.joins import edit_distance_join

    names = [
        "red widget", "red widgets", "rd widget", "red widgit", "redwidget",
        "blue bolt", "blu bolt", "bleu bolt", "blue blot",  # transposition
        "small ring", "small rings", "smallring", "big ring",
        "café", "cafe", "", "x", "xy", "yx",
    ]
    rows = [(n,) for n in names] * 3  # duplication must be collapsed
    df = spark.createDataFrame(rows, "name string")
    import itertools

    for k in (1, 2):
        got = sorted(
            (r.left_val, r.right_val, r.dist)
            for r in edit_distance_join(df, df, "name", "name", max_dist=k)
            .filter(F.col("left_val") < F.col("right_val"))
            .collect()
        )
        expect = sorted(
            (a, b, _py_levenshtein(a, b))
            for a, b in itertools.combinations(sorted(set(names)), 2)
            if _py_levenshtein(a, b) <= k
        )
        assert got == expect, f"k={k}"


def test_edit_distance_join_max_len_guard(spark):
    """Strings beyond max_len raise instead of silently building a
    C(len, <=k)-sized neighborhood."""
    import pytest

    from traffic_forecast_etl_spark.operators.joins import edit_distance_join

    df = spark.createDataFrame([("a" * 100,)], "name string")
    with pytest.raises(ValueError, match="max_len"):
        edit_distance_join(df, df, "name", "name", max_dist=2, max_len=64)


def test_g1_components_partition_and_label_semantics(spark, sf_dir):
    """g1 invariants on real data: every doc appears exactly once,
    component labels are component MINIMA (each label belongs to its
    own component), and the components partition the d4 edge set
    (every edge endpoint pair shares a label; no cross-component
    edges)."""
    from traffic_forecast_etl_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    comp = {
        r.doc_id: r.component
        for r in queries()["g1_connected_components"](spark, sf_dir).collect()
    }
    assert len(comp) == docs.count()
    # label is the minimum member of its component
    import collections

    members = collections.defaultdict(list)
    for d, c in comp.items():
        members[c].append(d)
    for c, ms in members.items():
        assert min(ms) == c
    # every edge is intra-component
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.2).collect()
    assert pairs, "fixture should produce edges"
    for r in pairs:
        assert comp[r.id1] == comp[r.id2]


def test_edit_distance_join_randomized_brute_force(spark):
    """Wider completeness sweep: 60 deterministic pseudo-random short
    strings over a 4-letter alphabet (dense edit-neighborhood space —
    far more ed<=2 pairs than real names produce) must give exactly
    the brute-force pair set at k=2. Catches blocking bugs a curated
    fixture can miss (e.g. boundary deletions, repeated chars)."""
    import itertools
    import random

    from traffic_forecast_etl_spark.operators.joins import edit_distance_join

    rng = random.Random(20260815)
    names = list({
        "".join(rng.choice("abcd") for _ in range(rng.randint(0, 8)))
        for _ in range(60)
    })
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = sorted(
        (r.left_val, r.right_val, r.dist)
        for r in edit_distance_join(df, df, "name", "name", max_dist=2)
        .filter(F.col("left_val") < F.col("right_val"))
        .collect()
    )
    expect = sorted(
        (a, b, _py_levenshtein(a, b))
        for a, b in itertools.combinations(sorted(names), 2)
        if _py_levenshtein(a, b) <= 2
    )
    assert got == expect and len(expect) > 50
