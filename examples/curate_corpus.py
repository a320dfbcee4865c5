"""Corpus curation end-to-end: the LLM-training-data pipeline this engine
adds on top of the reference's alert-filtering surface.

    documents -> quality filter -> exact dedup -> near-dup clustering
              -> survivor selection -> per-doc stats + TF-IDF summary

Run: python examples/curate_corpus.py [sf_dir]   (default sf0.001)

Every stage is a lazy DataFrame transform; nothing collects until the final
summary. At 100 TB the same plan holds: quality predicates push into the
scan, dedup shuffles on shingle/pair keys, clustering adapts
(driver union-find for the tiny pair graph, distributed propagation past
a threshold), survivors anti-join.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from fink_filters_spark.functions.text import punct_ratio, token_count
    from fink_filters_spark.operators.dedup import (
        connected_components,
        dedup_exact,
        jaccard_pairs,
    )
    from fink_filters_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("curate", cpus=8)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # ---- 1. quality gate (native predicates -> pushed into the scan) -------
    quality = docs.filter(
        (token_count("text") >= 5) & (punct_ratio("text") < 0.3)
    )
    n1 = quality.count()

    # ---- 2. exact dedup (normalize + hash groupBy) -------------------------
    survivors_exact = dedup_exact(quality, "text", "doc_id")
    n2 = survivors_exact.count()

    # ---- 3. near-dup clustering: pairs -> components -> keep cluster min ---
    pairs = jaccard_pairs(quality, "doc_id", "text", n=3, tau=0.5)
    comp = connected_components(pairs)
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    curated = quality.join(drop, "doc_id", "left_anti")
    n3 = curated.count()

    # ---- 4. corpus summary -------------------------------------------------
    stats = curated.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(token_count("text")).alias("tokens"),
        F.round(F.avg("n_chars"), 1).alias("avg_chars"),
    ).first()

    print(f"raw documents:        {n0}")
    print(f"after quality gate:   {n1}")
    print(f"exact-dedup groups:   {n2}")
    print(f"after near-dup dedup: {n3}")
    print(f"curated corpus: {stats['docs']} docs, {stats['tokens']} tokens, "
          f"avg {stats['avg_chars']} chars")
    spark.stop()


if __name__ == "__main__":
    main()
