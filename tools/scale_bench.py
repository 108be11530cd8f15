"""Measured scaling slopes for the dedup/ANN/text family.

Times each family query at sf0.01 / sf0.1 (driver testdata) and the
derived sf1 point (tools/make_scale_data.py — run it first), then
reports the per-decade scaling exponent
``log10(t_big / t_small)`` between adjacent points. A linear operator
shows exponent → 1 once past fixed overhead; a quadratic one → 2.
Writes SCALING.json and prints a markdown table for SCALE.md.

Usage:  python tools/scale_bench.py [runs_per_point] [--only=k1,k2,...]

``--only`` re-measures a subset (e.g. keys whose campaign-1 window
overlapped other load); unmeasured keys carry through from the
existing SCALING.json unchanged when the code fingerprint matches.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from traffic_forecast_etl_spark.plans.catalog import QUERIES
from traffic_forecast_etl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = [
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
    ("1", os.path.join(REPO, ".scaledata", "sf1")),
]
# d5 (exact O(n^2) baseline, guarded) is excluded by design; d1/d4 et
# al. cover the family's linear / skew-guarded members.
KEYS = [
    "d1_exact_dedup",
    "d2_minhash_lsh",
    "d4_ngram_jaccard",
    "d6_near_dedup_filter",
    "d11_embedding_neardup_lsh",
    "s2_lsh_ann",
    "s3_ivf_ann",
    "t1_token_stats",
    "t2_quality_score",
    "c2_decontaminate",
    "d13_segment_dedup",
    "d14_duplicate_spans",
    "d15_semantic_dedup",
    # r5 second wave: corpus-level duplicate-n-gram metric (catalog =
    # oracle-checkable string-gram mode) and first-class connected
    # components over the d4 edge set. j11_edit_distance_join is
    # deliberately absent: its domain is the DISTINCT-string set of a
    # bounded name vocabulary (64 names at every sf), so a corpus-size
    # series would measure the scan, not the operator.
    "t16_corpus_dup_ngrams",
    "g1_connected_components",
    # r5 fourth wave: hashed-BoW logistic quality classifier (train on
    # the even-id half + score everything — both passes scale with the
    # corpus; L-BFGS iteration count is fixed). The catalog's
    # c9_leakage_safe_split is deliberately absent IN ITS CATALOG FORM:
    # its edge generator there is d4 exact Jaccard (the by-design
    # quadratic oracle baseline), so the series would measure d4, not
    # the split. The split's 100 TB composition is measured as
    # `c9_lsh_split` below (d2 LSH edges -> CC -> md5 map).
    "c8_quality_classifier",
    # r6: DSIR importance resampling end-to-end (two bucket-count
    # aggregates + literal-ratio map-only scoring + Gumbel TakeOrdered
    # — every stage linear in the corpus; bucket table is fixed-size)
    "c12_dsir_resample",
    # r7: IVF-PQ — train/encode/route/ADC/refine all linear in the
    # corpus (codebooks fixed-size, shortlist k*refine per query)
    "s6_ivf_pq_ann",
    # r7: persistent ANN index — build+upsert-append+search end-to-end
    # (the s6 stages plus snapshot commits; partition-pruned probing
    # keeps the search side O(probed lists) as the corpus grows).
    # tf2_partitioned_table is deliberately absent: it is snapshot-
    # commit metadata end-to-end (measured flat in SCALE.md), so a
    # corpus-size series would time the parquet writer, not pruning.
    "s7_persistent_ann",
    # r7 later session: HTML extraction (map-only regex chain — the
    # scan-rate class) and exact-substring span trim (d14's anchor
    # sampling + df aggregate + per-doc gap-stitch; every stage
    # linear, the span join moves only duplicated hits).
    # tf3/tf4/st9 are deliberately absent per the tf2 rule: snapshot-
    # commit loops end-to-end — their pruning/gating is structural
    # (admitted-file counts, bloom fpp) and measured in SCALE.md.
    "t21_html_extract",
    "d17_trim_duplicate_spans",
]

# duplicate-heavy + Zipf-skewed twin corpora (make_scale_data.py
# derive_dup): near-uniform data is the shape LSH banding likes, so
# the uniform series alone cannot show whether the exact-first
# pre-pass / bucket guards hold the slope on the duplicate-heavy
# corpora near-dedup exists for. Recorded as "<key>_dup".
DUP_POINTS = [
    ("0.1", os.path.join(REPO, ".scaledata", "sf0.1_dup")),
    ("1", os.path.join(REPO, ".scaledata", "sf1_dup")),
]
DUP_KEYS = ["d2_minhash_lsh", "d6_near_dedup_filter"]


def _d2_capped(spark, sf_dir):
    """Standalone pairs operator WITH the max_band_width backstop on
    top of the (since r5, default) collapse_exact guard. collapse
    handles BYTE-IDENTICAL floods exactly (linear factored output);
    the cap additionally bounds candidate volume for NON-identical
    floods (template spam with varied fills), trading recall on
    exactly the flooded content. r4's uncapped-uncollapsed d2 read
    exponent 1.81 on this corpus; collapse alone reads 0.93 (the
    `d2_minhash_lsh_dup` series), collapse+cap 0.47."""
    from traffic_forecast_etl_spark.operators import dedup as D
    from traffic_forecast_etl_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    return D.minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=16,
        jaccard_threshold=0.5, max_band_width=64,
    )


def _c7_lsh(spark, sf_dir):
    """The LSH-bucketed decontamination scale path (method="lsh"):
    same corpus/eval split and threshold as the catalog's c7 (every
    50th id stands in for the benchmark, cosine 0.4 on this isotropic
    corpus), but candidates come from the shared-plane bucket
    equi-join instead of the broadcast cross product — the series
    that shows the path a too-big-to-broadcast eval suite takes."""
    from traffic_forecast_etl_spark.operators import similarity as S
    from traffic_forecast_etl_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    ev = emb.filter(F.col("vec_id") % 50 == 0)
    return S.embedding_decontaminate(
        emb, ev, "embedding", "vec_id", "vec_id",
        threshold=0.4, method="lsh",
    ).select("vec_id", "label")


def _t16_hash(spark, sf_dir):
    """t16's 100 TB path: grams collapse to xxhash64 BEFORE both
    exchanges so the wide document text never shuffles. The catalog
    entry stays in string mode for oracle verifiability; this series
    shows the hash mode's slope (and, against the t16 series, what
    string shuffles cost at each sf)."""
    from traffic_forecast_etl_spark.operators import text as TX
    from traffic_forecast_etl_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    return TX.corpus_duplicate_ngrams(docs, "text", "doc_id", n=8, hash_grams=True)


def _c9_lsh_split(spark, sf_dir):
    """leakage_safe_split in its at-scale composition: near-dup edges
    from d2 MinHash-LSH (collapse_exact default; same params as the
    d2 series) instead of the catalog's oracle-grade-but-quadratic d4
    generator, then the component fixpoint and the md5-bucket split
    map. Expected slope ~ the d2+g1 series combined; the split's own
    marginal work is one broadcast label join + a map expression."""
    from traffic_forecast_etl_spark.operators import dedup as D
    from traffic_forecast_etl_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    edges = D.minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=16, jaccard_threshold=0.5
    ).select("id1", "id2")
    return D.leakage_safe_split(
        docs.select("doc_id"), edges, "doc_id", train_fraction=0.8
    )


def _code_fingerprint() -> str:
    """Hash of every operator/plan module the family queries execute
    through. Prior campaigns' minima are only merged when this
    fingerprint matches — an operator rewrite would otherwise leave
    stale minima from the OLD implementation in SCALING.json, silently
    corrupting the recomputed exponents the 100 TB claims rest on
    (ADVICE r3: the manual delete-the-file convention was the only
    safeguard)."""
    import hashlib

    pkg = os.path.join(REPO, "traffic_forecast_etl_spark")
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(pkg)):
        for name in sorted(files):
            if name.endswith(".py"):
                with open(os.path.join(root, name), "rb") as f:
                    h.update(name.encode())
                    h.update(f.read())
    return h.hexdigest()[:16]


def settle(spark) -> None:
    """Quiesce between measurements: dropping a query's persisted
    intermediates (clearCache) is ASYNC — block removal and context-
    cleaner GC churn otherwise bleed into the NEXT key's timings
    (measured: d4 read 10x its isolated time when run right after
    d2's cache-heavy runs). Force the JVM GC and run a barrier job so
    cleanup completes before the next stopwatch starts."""
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    spark.range(1000).count()


def main() -> None:
    args = sys.argv[1:]
    only: set[str] | None = None
    pos: list[str] = []
    for a in args:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        else:
            pos.append(a)
    runs = int(pos[0]) if pos else 3
    if only is not None:
        # A subset run only makes sense as an extra campaign MERGED
        # into prior minima. If the engine fingerprint changed, the
        # merge branch is skipped and SCALING.json would be rewritten
        # with ONLY the subset — silently discarding every other
        # key's multi-campaign floors (ADVICE r4). Refuse up front.
        path = os.path.join(REPO, "SCALING.json")
        prior_fp = None
        if os.path.exists(path):
            with open(path) as f:
                prior_fp = json.load(f).get("_code_fingerprint")
        if prior_fp != _code_fingerprint():
            sys.exit(
                "--only requires a matching prior code fingerprint: "
                "the engine changed since SCALING.json was written, "
                "so a subset run would drop every non-subset key. "
                "Run a full re-baseline (no --only) instead."
            )
    spark = get_spark("scale-bench")
    pts = [(sf, d) for sf, d in POINTS if os.path.isdir(d)]
    dup_pts = [(sf, d) for sf, d in DUP_POINTS if os.path.isdir(d)]
    plan = (
        [(key, QUERIES[key], pts) for key in KEYS]
        + [(key + "_dup", QUERIES[key], dup_pts) for key in DUP_KEYS]
        + [("d2_minhash_lsh_dup_capped", _d2_capped, dup_pts)]
        + [("c7_lsh_decontaminate", _c7_lsh, pts)]
        + [("t16_hash_grams", _t16_hash, pts)]
        + [("c9_lsh_split", _c9_lsh_split, pts)]
    )
    if only is not None:
        plan = [p for p in plan if p[0] in only]
    key_pts = {name: p for name, _, p in plan}
    out: dict[str, dict] = {}
    for name, qfn, kpts in plan:
        out[name] = {"sec": {}, "exponent": {}}
        for sf, d in kpts:
            qfn(spark, d).collect()  # warm this plan
            settle(spark)
            best = math.inf
            for _ in range(runs):
                t0 = time.time()
                qfn(spark, d).collect()
                best = min(best, time.time() - t0)
                settle(spark)
            out[name]["sec"][sf] = round(best, 3)
            print(f"{name} @ sf{sf}: {best:.3f}s", file=sys.stderr)
    # Wall-clock on this host swings up to 2x run-to-run (co-tenant
    # contention: identical d2 plans measured 37.8-67.6s at sf1 in ONE
    # process). The noise is strictly one-sided — a run can only be
    # slowed, never sped up — so the steady-state estimator is the MIN
    # across measurement campaigns: merge with the existing
    # SCALING.json instead of overwriting, and recompute exponents
    # from the merged floor. Merging is gated on the engine-code
    # fingerprint: minima measured against a different implementation
    # are dropped, not merged.
    path = os.path.join(REPO, "SCALING.json")
    fingerprint = _code_fingerprint()
    campaigns = 1
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        if prior.pop("_code_fingerprint", None) == fingerprint:
            campaigns = prior.pop("_campaigns", 1) + 1
            for key, rec in prior.items():
                if key in out:
                    for sf, sec in rec.get("sec", {}).items():
                        if sf in out[key]["sec"]:
                            out[key]["sec"][sf] = min(out[key]["sec"][sf], sec)
                else:
                    # not re-measured this campaign (--only subset):
                    # carry the prior floor through unchanged
                    out[key] = rec
        else:
            print("code fingerprint changed: re-baselining", file=sys.stderr)
    for key, kpts in key_pts.items():
        for (sf_a, _), (sf_b, _) in zip(kpts, kpts[1:]):
            ta, tb = out[key]["sec"][sf_a], out[key]["sec"][sf_b]
            decades = math.log10(float(sf_b) / float(sf_a))
            out[key]["exponent"][f"{sf_a}->{sf_b}"] = round(
                math.log10(tb / ta) / decades, 2
            )
    out["_campaigns"] = campaigns
    out["_code_fingerprint"] = fingerprint
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    out.pop("_campaigns")
    out.pop("_code_fingerprint")
    print(json.dumps(out))
    # markdown table for SCALE.md
    hdr = [k for k, _ in pts]
    print("\n| query | " + " | ".join(f"sf{h} (s)" for h in hdr) + " | exponents |")
    print("|---|" + "---|" * (len(hdr) + 1))
    for key, rec in out.items():
        cells = " | ".join(
            f"{rec['sec'][h]:.2f}" if h in rec["sec"] else "—" for h in hdr
        )
        exps = ", ".join(f"{k}: {v}" for k, v in rec["exponent"].items())
        print(f"| {key} | {cells} | {exps} |")


if __name__ == "__main__":
    main()
