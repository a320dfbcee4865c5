"""Chunking & layout operators: the properties the gate's hash-match
cannot see — CDC edit stability, Z-order locality, UniMax feasibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fink_filters_spark.operators.chunking import (
    chunk_cdc,
    chunk_fixed,
    unimax_allocation,
    zorder_key,
)


def _chunks(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    return {
        (r.id, r.chunk_md5)
        for r in chunk_cdc(df, "id", "text").collect()
    }


def test_cdc_edit_stability(spark):
    """The CDC property: inserting one token near the front changes only
    the chunk(s) containing the edit — every later chunk keeps its md5
    identity (fixed-size chunking loses all of them)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    edited = "alpha beta NEWTOKEN gamma delta epsilon zeta eta theta iota kappa " + (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 7
    )
    a = _chunks(spark, [(1, base)])
    b = _chunks(spark, [(1, edited)])
    shared = {h for _, h in a} & {h for _, h in b}
    # all chunks after the edited one survive: the two sets differ in at
    # most the edited chunk on each side
    assert len(a - b) <= 1 and len(b - a) <= 1
    assert len(shared) >= len(a) - 1 > 0

    # fixed-size chunking, same edit: downstream identities are destroyed
    df_a = spark.createDataFrame([(1, base)], "id long, text string")
    df_b = spark.createDataFrame([(1, edited)], "id long, text string")
    fa = {r.chunk_md5 for r in chunk_fixed(df_a, "id", "text", 16, 16).collect()}
    fb = {r.chunk_md5 for r in chunk_fixed(df_b, "id", "text", 16, 16).collect()}
    assert len(fa & fb) < len(shared)


def test_cdc_chunks_reassemble_exactly(spark):
    """Chunk spans partition the token stream: start positions chain
    (start_{k+1} = start_k + len_k), cover 0..n, never overlap."""
    text = "one two three four five six seven eight nine ten " * 5
    df = spark.createDataFrame([(7, text)], "id long, text string")
    rows = sorted(
        chunk_cdc(df, "id", "text").collect(), key=lambda r: r.chunk_idx
    )
    pos = 0
    for r in rows:
        assert r.start_pos == pos
        assert r.n_tokens >= 1
        pos += r.n_tokens
    assert pos == len(text.split())


def test_zorder_locality(spark):
    """Morton keys: z(0,0)=0, z(1,0)=1, z(0,1)=2, z(3,3)=15; and a 2x2
    square of neighbors spans a z-range of exactly 4 (perfect pruning
    granularity at even alignments)."""
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key("x", "y", 2).alias("z")).collect()
    }
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1
    assert got[(0, 1)] == 2 and got[(1, 1)] == 3 and got[(3, 3)] == 15
    quad = [got[(x, y)] for x in (2, 3) for y in (0, 1)]
    assert max(quad) - min(quad) == 3  # one contiguous z-run of 4


def test_unimax_water_fill_invariants(spark):
    """Skewed sources, budget below total cap: small sources saturate at
    max_epochs, large ones share one common level, total == budget."""
    per = spark.createDataFrame(
        [("tiny", 10), ("small", 50), ("big", 1000), ("huge", 5000)],
        "source string, n_tok long",
    )
    out = {
        r.source: r
        for r in unimax_allocation(per, "source", "n_tok", 2000, 4).collect()
    }
    assert out["tiny"].alloc_tokens_e6 == 40_000_000
    assert out["tiny"].epochs_e6 == 4_000_000
    assert out["small"].alloc_tokens_e6 == 200_000_000
    assert out["small"].epochs_e6 == 4_000_000
    # remaining 1760 split evenly between big and huge
    assert out["big"].alloc_tokens_e6 == out["huge"].alloc_tokens_e6 == 880_000_000
    assert sum(r.alloc_tokens_e6 for r in out.values()) == 2_000_000_000
    assert all(r.epochs_e6 <= 4_000_000 for r in out.values())


def test_unimax_budget_exceeds_caps(spark):
    """Budget above the total cap: every source saturates (UniMax never
    over-repeats), leftover budget is reported by under-allocation."""
    per = spark.createDataFrame(
        [("a", 10), ("b", 20)], "source string, n_tok long"
    )
    out = {
        r.source: r
        for r in unimax_allocation(per, "source", "n_tok", 10_000, 4).collect()
    }
    assert out["a"].alloc_tokens_e6 == 40_000_000
    assert out["b"].alloc_tokens_e6 == 80_000_000


def test_zorder_feeds_range_partitioning(spark):
    """Layout materialization: repartitionByRange on the z key compiles to
    a single range Exchange (the write-side clustering plan)."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 32).alias("x"), (F.col("id") % 17).alias("y")
    )
    plan = (
        df.repartitionByRange(8, zorder_key("x", "y", 5))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange rangepartitioning" in plan


def test_chunk_dedup_cross_doc(spark, tmp_path):
    """A chunk shared verbatim by two docs is dropped from BOTH; each
    doc's unique chunks survive with an order-preserving signature.
    Within-doc repetition alone (one distinct doc) is NOT a drop."""
    import hashlib

    from fink_filters_spark.queries.layout import q_dedup_chunk_cdc

    # 'merge' char-folds to 0 mod 8 (a CDC boundary), so the shared
    # prefix provably closes at least one complete shared chunk
    shared = "lorem ipsum dolor sit amet merge consectetur adipiscing elit sed do merge "
    df = spark.createDataFrame(
        [
            (1, shared + "unique one content here alpha beta gamma delta"),
            (2, shared + "different tail entirely zeta eta theta iota kappa"),
            (3, "standalone document with its own words only mu nu xi"),
        ],
        "id long, text string",
    )
    ch = chunk_cdc(df, "id", "text")
    dup = (
        ch.groupBy("chunk_md5")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
    )
    kept = ch.join(dup.select("chunk_md5"), "chunk_md5", "left_anti")
    per = {r.id: r.n for r in kept.groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()}
    tot = {r.id: r.n for r in ch.groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()}
    # doc 3 shares nothing: all chunks kept
    assert per[3] == tot[3]
    # docs 1 and 2 lost at least their shared leading chunk(s), kept their tails
    assert 0 < per[1] < tot[1] and 0 < per[2] < tot[2]
    dropped = ch.join(dup.select("chunk_md5"), "chunk_md5").select("id").distinct().count()
    assert dropped == 2

    # drive the actual gate query end-to-end and pin its rewrite_sig
    # contract: md5 over the kept chunk hashes in chunk order
    df.withColumnRenamed("id", "doc_id").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.doc_id: r for r in q_dedup_chunk_cdc(spark, str(tmp_path)).collect()}
    assert out[3].kept_chunks == tot[3]
    kept3 = sorted(
        (r.chunk_idx, r.chunk_md5)
        for r in ch.collect()
        if r.id == 3
    )
    want_sig = hashlib.md5("".join(h for _, h in kept3).encode()).hexdigest()
    assert out[3].rewrite_sig == want_sig
    assert out[1].kept_chunks == per[1] and out[2].kept_chunks == per[2]


def test_cdc_single_token_and_empty_documents(spark):
    """Regression: a single-token or empty/whitespace document has no
    interior boundary positions — sequence(1, 0) must never descend into
    element_at(_, 0). One whole-text chunk comes back; oracle parity is
    the 1-chunk row DuckDB's range(1, 1) (empty) produces."""
    from fink_filters_spark.operators.chunking import chunk_cdc, chunk_fixed

    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "   "), (4, "two tokens")],
        "id long, text string",
    )
    rows = chunk_cdc(df, "id", "text").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0].n_tokens == 1
    assert len(by_id[2]) == 1 and len(by_id[3]) == 1  # [''] token stream
    assert sum(r.n_tokens for r in by_id[4]) == 2
    # fixed chunking on the same degenerate inputs
    assert chunk_fixed(df, "id", "text", 16, 12).count() == 4


def test_shard_balance_near_equal_tokens(spark):
    """Snake dealing bounds imbalance: on heavy-tailed sizes the max/min
    per-shard token totals stay within a few percent, every doc assigned
    exactly once."""
    from fink_filters_spark.queries.layout import q_pipe_shard_balance

    rows = q_pipe_shard_balance(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 16
    assert sum(r.n_docs for r in rows) == 500
    toks = [r.tok_sum for r in rows]
    assert (max(toks) - min(toks)) / min(toks) < 0.05


# ---- Hilbert curve layout ---------------------------------------------------

def _py_hilbert(n: int, x: int, y: int) -> int:
    """Reference xy->d walk (the Wikipedia/Hacker's-Delight iterative form)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_index_matches_reference_walk(spark):
    """Exhaustive 16x16 grid: bit-exact vs the reference implementation,
    bijective, and CONSECUTIVE indices are always grid neighbors — the
    locality property that distinguishes Hilbert from Morton."""
    from fink_filters_spark.operators.chunking import hilbert_index

    bits, n = 4, 16
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.h for r in hilbert_index(df, "x", "y", bits).collect()
    }
    assert got == {(x, y): _py_hilbert(n, x, y) for x in range(n) for y in range(n)}
    assert sorted(got.values()) == list(range(n * n))
    inv = {v: k for k, v in got.items()}
    assert all(
        abs(inv[i][0] - inv[i + 1][0]) + abs(inv[i][1] - inv[i + 1][1]) == 1
        for i in range(n * n - 1)
    )


def test_hilbert_index_input_contracts(spark):
    from fink_filters_spark.operators.chunking import hilbert_index

    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match=r"bits"):
        hilbert_index(df, "x", "y", 0)
    with pytest.raises(ValueError, match=r"bits"):
        hilbert_index(df, "x", "y", 32)
    with pytest.raises(ValueError, match=r"collision"):
        hilbert_index(df.withColumnRenamed("x", "h"), "h", "y")


def test_hilbert_ranges_tighter_than_zorder(spark):
    """The measured layout claim: over ARBITRARY consecutive-key windows
    (range partition boundaries fall anywhere, not on power-of-4
    alignments where Z-order is also perfect), Hilbert windows' mean
    bounding-box semiperimeter is strictly smaller than Z-order's —
    consecutive Hilbert cells are always neighbors, while the Z curve
    jumps across the plane at bit boundaries."""
    from fink_filters_spark.operators.chunking import hilbert_index, zorder_key

    bits, n = 6, 64
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    hmap = {r.h: (r.x, r.y) for r in hilbert_index(grid, "x", "y", bits).collect()}
    zmap = {
        r.z: (r.x, r.y)
        for r in grid.select("x", "y", zorder_key("x", "y", bits).alias("z")).collect()
    }

    def mean_semiperimeter(inv):
        total, cnt, L = 0, 0, 100
        for a in range(0, n * n - L, 37):  # unaligned windows
            pts = [inv[k] for k in range(a, a + L)]
            xs, ys = [p[0] for p in pts], [p[1] for p in pts]
            total += (max(xs) - min(xs)) + (max(ys) - min(ys))
            cnt += 1
        return total / cnt

    hsp, zsp = mean_semiperimeter(hmap), mean_semiperimeter(zmap)
    assert hsp < zsp, (hsp, zsp)


def test_hilbert_feeds_range_partitioning(spark):
    """Same write-side clustering plan as zorder: ONE range Exchange on
    the appended key column."""
    from fink_filters_spark.operators.chunking import hilbert_index

    df = spark.range(0, 1000).select(
        (F.col("id") % 32).alias("x"), (F.col("id") % 17).alias("y")
    )
    plan = (
        hilbert_index(df, "x", "y", 5)
        .repartitionByRange(8, F.col("h"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange rangepartitioning") == 1
