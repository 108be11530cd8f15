"""Derive a LARGER scale point for the dedup/ANN/text bench family.

The driver testdata tops out at sf0.1 (5k documents / 2k embeddings)
— too small to separate a linear plan from a quadratic one in wall
time. This tool derives an N×-scaled documents/embeddings pair from
sf0.1 **for scaling measurement only** (correctness oracles keep
using the driver-generated parquet untouched):

- documents: N copies, ids remapped to disjoint ranges; every word in
  copy i>0 gets the deterministic suffix ``i``, so shingle sets are
  disjoint ACROSS copies while near-dup structure WITHIN a copy is
  preserved — duplicate rate stays proportional instead of exploding
  (a naive replication makes every copy a near-dup of copy 0 and
  turns the LSH candidate count superlinear, which would corrupt the
  measured slope).
- embeddings: N copies, ids remapped; copy i's vectors are multiplied
  by a deterministic ±1 sign pattern seeded by i. A global sign flip
  per dimension preserves all intra-copy cosines exactly (norms and
  pairwise dot products are invariant within a copy) and decorrelates
  cross-copy pairs, so neighbor structure scales proportionally too.

A **duplicate-heavy + skewed** twin (``*_dup`` dirs) is derived
alongside: 20% of documents have their text replaced by one of 100
fixed templates with a Zipf-shaped rank distribution (log-uniform
rank ⇒ density ∝ 1/rank — template 0 alone is ~4% of the corpus at
10× scale). Near-uniform data is exactly the shape LSH banding
likes; real crawls are duplicate-heavy, which floods band buckets —
the d2/d6 ``*_dup`` scaling series measures that the exact-first
pre-pass / bucket-cap guards actually hold the slope there
(VERDICT r3 #6).

Usage:  python tools/make_scale_data.py [factor] [out_dir]
Default: factor=10 → .scaledata/sf1/{documents,embeddings}.parquet
         plus .scaledata/sf0.1_dup and .scaledata/sf1_dup documents
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from traffic_forecast_etl_spark.session import get_spark
from traffic_forecast_etl_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"


def derive(spark, factor: int, out_dir: str) -> None:
    emb = load_table(spark, "embeddings", SRC)
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = len(emb.select("embedding").first()[0])

    _scaled_docs(spark, factor).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb_parts = []
    for i in range(factor):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_vec))
        if i > 0:
            rng = random.Random(1000 + i)
            signs = F.array(
                *[F.lit(float(rng.choice((-1.0, 1.0)))) for _ in range(dim)]
            )
            c = c.withColumn(
                "embedding",
                F.zip_with("embedding", signs, lambda x, s: (x * s).cast("float")),
            )
        emb_parts.append(c)
    out_emb = emb_parts[0]
    for p in emb_parts[1:]:
        out_emb = out_emb.unionByName(p)
    out_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def _scaled_docs(spark, factor: int):
    docs = load_table(spark, "documents", SRC)
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for i in range(factor):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_doc))
        if i > 0:
            c = c.withColumn(
                "text", F.regexp_replace("text", r"(\w+)", rf"$1{i}")
            ).withColumn("n_chars", F.length("text").cast("long"))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def derive_dup(spark, factor: int, out_dir: str, dup_rate: float = 0.2) -> None:
    """Documents-only duplicate-heavy twin: scale as in ``derive``,
    then replace ``dup_rate`` of all texts with one of 100 fixed
    templates. Template rank is log-uniform (rank = ⌊100^v⌋ for
    uniform v), i.e. density ∝ 1/rank — the Zipf head a crawl shows:
    at 10× scale the top template repeats thousands of times, the
    shape that floods an unguarded LSH band bucket quadratically."""
    templates = [
        "template {t} boilerplate navigation header footer copyright "
        "notice all rights reserved subscribe to the newsletter follow "
        "us on social media terms of service privacy policy cookie "
        "banner accept decline section {t} end".format(t=t)
        for t in range(100)
    ]
    docs = _scaled_docs(spark, factor)
    u = (F.pmod(F.xxhash64("doc_id", F.lit("dup-select")), F.lit(10_000))) / 10_000.0
    v = (F.pmod(F.xxhash64("doc_id", F.lit("dup-rank")), F.lit(10_000))) / 10_000.0
    rank = F.floor(F.pow(F.lit(100.0), v)).cast("int") - 1  # 0..99, p ∝ 1/(r+1)
    tpl = F.element_at(F.array(*[F.lit(t) for t in templates]), rank + 1)
    out = docs.withColumn(
        "text", F.when(u < dup_rate, tpl).otherwise(F.col("text"))
    ).withColumn("n_chars", F.length("text").cast("long"))
    out.repartition(max(4, 4 * factor)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, ".scaledata", f"sf{factor / 10:g}")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make-scale-data")
    derive(spark, factor, out_dir)
    for t in ("documents", "embeddings"):
        n = spark.read.parquet(os.path.join(out_dir, f"{t}.parquet")).count()
        print(f"{t}: {n} rows -> {out_dir}")
    # duplicate-heavy twins at 1× and factor× for the *_dup slope
    for f in sorted({1, factor}):
        dup_dir = os.path.join(repo, ".scaledata", f"sf{f / 10:g}_dup")
        os.makedirs(dup_dir, exist_ok=True)
        derive_dup(spark, f, dup_dir)
        n = spark.read.parquet(os.path.join(dup_dir, "documents.parquet")).count()
        print(f"documents(dup): {n} rows -> {dup_dir}")


if __name__ == "__main__":
    main()
