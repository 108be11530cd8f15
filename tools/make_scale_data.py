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

Usage:  python tools/make_scale_data.py [factor] [out_dir]
Default: factor=10 → .scaledata/sf1/{documents,embeddings}.parquet
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
    docs = load_table(spark, "documents", SRC)
    emb = load_table(spark, "embeddings", SRC)
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = len(emb.select("embedding").first()[0])

    doc_parts = []
    for i in range(factor):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_doc))
        if i > 0:
            c = c.withColumn(
                "text", F.regexp_replace("text", r"(\w+)", rf"$1{i}")
            ).withColumn("n_chars", F.length("text").cast("long"))
        doc_parts.append(c)
    out_docs = doc_parts[0]
    for p in doc_parts[1:]:
        out_docs = out_docs.unionByName(p)
    out_docs.repartition(32).write.mode("overwrite").parquet(
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


if __name__ == "__main__":
    main()
