"""Record-linkage operator tests (operators/linkage.py): multi-pass
blocking, banded levenshtein scoring, transitive entity closure,
survivorship — on a hand-built dirty-record fixture with known truth."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fink_filters_spark.operators.linkage import (
    golden_records,
    length_lex_max_key,
    levenshtein_matches,
    multi_pass_candidates,
    oversized_blocks,
)

# Five records, two real-world entities plus a loner:
#   1/2: same person, name typo, share (nat, bal) AND name tail
#   3:   dirty copy of 2 (chains 1-2-3 transitively via 2)
#   4:   different entity that shares ONLY the attrs block with 1 (noise)
#   5:   loner, blocks with nothing
_ROWS = [
    (1, "alice cooper", 10, 500),
    (2, "alice coopr", 10, 500),
    (3, "alic coopr", 11, 777),
    (4, "zebra quagga", 10, 500),
    (5, "solo person", 99, 1),
]


@pytest.fixture(scope="module")
def recs(spark):
    df = spark.createDataFrame(
        pd.DataFrame(_ROWS, columns=["rid", "name", "nat", "bal"])
    )
    return df.withColumn("suf3", F.expr("substr(name, length(name) - 2, 3)"))


_PASSES = {"attrs": ["nat", "bal"], "tail": ["suf3"]}


def test_multi_pass_candidates_union_and_count(spark, recs):
    got = {
        (r.id_a, r.id_b): r.n_passes
        for r in multi_pass_candidates(recs, "rid", _PASSES).collect()
    }
    # attrs pass: {1,2,4} pairwise; tail pass: only (2,3) share "opr"
    assert got == {(1, 2): 1, (1, 4): 1, (2, 4): 1, (2, 3): 1}


def test_multi_pass_block_purge_caps_oversized_blocks(spark, recs):
    """max_block_size purges a too-big block from ITS pass only: with
    cap=2 the attrs block {1,2,4} (size 3) is dropped, so its three
    pairs vanish, while the tail pass's size-2 block still proposes
    (2,3). Records 1/2/4 are NOT removed from the tail pass — purging is
    per-pass, not per-record."""
    got = {
        (r.id_a, r.id_b): r.n_passes
        for r in multi_pass_candidates(
            recs, "rid", _PASSES, max_block_size=2
        ).collect()
    }
    assert got == {(2, 3): 1}
    # cap >= max block size (or None) purges nothing
    for cap in (3, None):
        full = {
            (r.id_a, r.id_b): r.n_passes
            for r in multi_pass_candidates(
                recs, "rid", _PASSES, max_block_size=cap
            ).collect()
        }
        assert full == {(1, 2): 1, (1, 4): 1, (2, 4): 1, (2, 3): 1}


def test_oversized_blocks_reports_purged_keys(spark, recs):
    rows = oversized_blocks(recs, _PASSES, max_block_size=2).collect()
    assert [(r.pass_name, r.block_key, r.block_size) for r in rows] == [
        ("attrs", "10|500", 3)
    ]
    assert oversized_blocks(recs, _PASSES, max_block_size=3).count() == 0


def test_levenshtein_matches_bands_and_filters(spark, recs):
    cand = multi_pass_candidates(recs, "rid", _PASSES)
    m = levenshtein_matches(recs, cand, "rid", "name", max_dist=2)
    got = {(r.id_a, r.id_b): r.name_dist for r in m.collect()}
    # (1,2) dist 1; (2,3) dist 1 (drop "e"); (1,4)/(2,4) exceed the band
    assert got == {(1, 2): 1, (2, 3): 1}


def test_golden_records_transitive_and_survivor(spark, recs):
    cand = multi_pass_candidates(recs, "rid", _PASSES)
    m = levenshtein_matches(recs, cand, "rid", "name", max_dist=2).select(
        "id_a", "id_b"
    )
    gold = {
        r.entity_id: (r.n_members, r.survivor_name, r.sum_bal)
        for r in golden_records(
            recs, m, "rid", "name", sum_cols=["bal"]
        ).collect()
    }
    # 1-2-3 close transitively (1-3 never matched directly); longest name wins
    assert gold == {
        1: (3, "alice cooper", 1777),
        4: (1, "zebra quagga", 500),
        5: (1, "solo person", 1),
    }


def test_length_lex_max_key_orders_by_length_then_lex(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": ["bb", "az", "aaa", "z"]})
    )
    top = df.agg(
        F.substring(F.max(length_lex_max_key("v")), 5, 100).alias("s")
    ).collect()[0].s
    assert top == "aaa"  # longest beats lexicographically-larger "z"/"bb"


def test_length_lex_max_key_null_passes_through(spark):
    """A NULL value must yield a NULL key (max() skips it, SQL semantics),
    NOT trip the >= 10^pad raise_error guard — a single NULL name would
    otherwise abort the whole survivorship job."""
    df = spark.createDataFrame(pd.DataFrame({"v": ["ab", None, "xyz"]}))
    rows = df.select(length_lex_max_key("v").alias("k")).collect()
    assert sorted(r.k for r in rows if r.k is not None) == ["0002ab", "0003xyz"]
    assert sum(1 for r in rows if r.k is None) == 1
    top = df.agg(
        F.substring(F.max(length_lex_max_key("v")), 5, 100).alias("s")
    ).collect()[0].s
    assert top == "xyz"


def test_choose_adaptive_passes_escalates_only_degenerate_pass(spark):
    """A pass whose rung-0 key leaves > max_purged_frac of rows in
    oversized blocks escalates to the next rung; a healthy pass stays at
    rung 0. 60 records: key `dead` is one 60-row block (degenerate),
    `fine` has 60 distinct values, `split` subdivides `dead` into 6."""
    from fink_filters_spark.operators.linkage import choose_adaptive_passes

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "rid": range(60),
                "dead": ["x"] * 60,
                "split": [i % 6 for i in range(60)],
                "fine": range(60),
            }
        )
    )
    passes, audit = choose_adaptive_passes(
        df,
        {"a": [["dead"], ["dead", "split"]], "b": [["fine"], ["fine", "split"]]},
        max_block_size=20,
        max_purged_frac=0.5,
    )
    assert passes == {"a": ["dead", "split"], "b": ["fine"]}
    by = {p: (i, f) for p, i, f in audit}
    assert by["a"] == (1, 0.0)  # escalated once, then nothing purged
    assert by["b"][0] == 0 and by["b"][1] == 0.0


def test_choose_adaptive_passes_accepts_last_rung_even_if_degenerate(spark):
    """The ladder's last rung is accepted regardless of the purged
    fraction (escalation is bounded by the ladder the caller supplied) —
    and the audit reports the honest fraction."""
    from fink_filters_spark.operators.linkage import choose_adaptive_passes

    df = spark.createDataFrame(
        pd.DataFrame({"rid": range(30), "dead": ["x"] * 30})
    )
    passes, audit = choose_adaptive_passes(
        df, {"a": [["dead"]]}, max_block_size=10, max_purged_frac=0.5
    )
    assert passes == {"a": ["dead"]}
    assert audit == [("a", 0, 1.0)]
