"""A7 flatteners + B2/B3 source builders + D5 snapshot-join composition.

Reference parity targets: arg-name->nested-column binding (SURVEY §2.A A1/A7,
``prefilter.py:299-351``), packaged catalog load-once (B2,
``filter_early_kn_candidates/filter.py:70-77``), REST table snapshot replacing
per-row lookups (B3/D5, ``filter_early_tde_candidates/lcs.py:56-99``).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)


def _ztf_nested(spark, n=3):
    from fink_filters_spark.schemas import ZTF_ALERT_SCHEMA

    cand_fields = ZTF_ALERT_SCHEMA["candidate"].dataType.fieldNames()
    rows = []
    for i in range(n):
        cand = {f: None for f in cand_fields}
        cand.update({"jd": 2460000.0 + i, "magpsf": 18.0 + i, "fid": 1 + i % 2,
                     "isdiffpos": "t", "ra": 10.0 * i, "dec": -5.0 * i})
        rows.append({
            "objectId": f"ZTF{i:06d}",
            "candid": i,
            "candidate": cand,
            "prv_candidates": [dict(cand, jd=cand["jd"] - 1.0)],
            "cdsxmatch": "Unknown",
        })
    return spark.createDataFrame(rows, ZTF_ALERT_SCHEMA)


def test_flatten_ztf_surfaces_candidate_leaves(spark):
    from fink_filters_spark.schemas import flatten_ztf

    flat = flatten_ztf(_ztf_nested(spark))
    assert "candidate" not in flat.columns
    assert {"jd", "magpsf", "fid", "objectId", "prv_candidates"} <= set(flat.columns)
    got = {r["objectId"]: r["magpsf"] for r in flat.collect()}
    assert got == {"ZTF000000": 18.0, "ZTF000001": 19.0, "ZTF000002": 20.0}
    # history arrays stay intact for hist_concat downstream
    assert flat.select(F.size("prv_candidates")).first()[0] == 1


def test_flatten_rubin_prefixes_structs(spark):
    from fink_filters_spark.schemas import RUBIN_ALERT_SCHEMA, flatten_rubin

    src_fields = RUBIN_ALERT_SCHEMA["diaSource"].dataType.fieldNames()
    obj_fields = RUBIN_ALERT_SCHEMA["diaObject"].dataType.fieldNames()
    row = {
        "diaSource": dict.fromkeys(src_fields) | {
            "diaSourceId": 42, "band": "g", "psfFlux": 1000.0, "snr": 12.0},
        "diaObject": dict.fromkeys(obj_fields) | {"nDiaSources": 5},
        "prvDiaSources": [],
        "prvDiaForcedSources": [],
        "xm": {"simbad_otype": "Galaxy", "mangrove_lum_dist": None,
               "gaiadr3_DR3Name": None, "gaiadr3_Plx": None,
               "gaiadr3_e_Plx": None, "vsx_Type": None,
               "legacydr8_zphot": 0.2, "tns_type": "SN"},
        "clf": {"snnSnVsOthers_score": 0.9, "cats_class": 11,
                "cats_score": 0.95, "earlySNIa_score": 0.1,
                "elephant_kstest_science": None,
                "elephant_kstest_template": 0.5},
        "pred": {"is_sso": False},
        "misc": {"firstDiaSourceMjdTaiFink": 61041.2},
    }
    flat = flatten_rubin(spark.createDataFrame([row], RUBIN_ALERT_SCHEMA))
    r = flat.first()
    assert r["diaSourceId"] == 42 and r["band"] == "g"
    assert r["xm_simbad_otype"] == "Galaxy" and r["xm_tns_type"] == "SN"
    assert r["clf_cats_class"] == 11
    assert r["is_sso"] is False
    assert r["nDiaSources"] == 5
    assert r["firstDiaSourceMjdTaiFink"] == 61041.2


def test_load_catalog_csv_broadcast(spark, tmp_path):
    from fink_filters_spark.sources import load_catalog

    p = tmp_path / "cat.csv"
    p.write_text("name,cat_ra,cat_dec\nA,10.0,5.0\nB,200.0,-40.0\n")
    cat = load_catalog(spark, str(p), fmt="csv")
    assert cat.count() == 2
    big = spark.range(1000).select(F.col("id"), (F.col("id") % 2).alias("k"))
    joined = big.join(cat, big.k == F.length(cat.name) - 1)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_rest_snapshot_crossmatch_d5(spark):
    """D5: cached TNS snapshot (stub fetch, driver-side once) broadcast-joined
    via the crossmatch operator — no per-row RPC anywhere."""
    from fink_filters_spark.operators.crossmatch import crossmatch
    from fink_filters_spark.sources import rest_snapshot

    calls = {"n": 0}

    def fetch():
        calls["n"] += 1
        return [
            {"tns_name": "SN 2025aaa", "cat_ra": 10.0, "cat_dec": 5.0},
            {"tns_name": "SN 2025bbb", "cat_ra": 200.0, "cat_dec": -40.0},
        ]

    schema = StructType([
        StructField("tns_name", StringType()),
        StructField("cat_ra", DoubleType()),
        StructField("cat_dec", DoubleType()),
    ])
    snap = rest_snapshot(spark, fetch, schema)
    assert calls["n"] == 1  # one driver-side fetch per refresh

    alerts = spark.createDataFrame(
        [(1, 10.0004, 5.0), (2, 200.0, -40.0003), (3, 99.0, 0.0)],
        "id long, ra double, dec double",
    )
    out = crossmatch(alerts, snap, df_id="id", radius_deg=5.0 / 3600.0,
                     how="left")
    got = {r["id"]: r["tns_name"] for r in
           out.select("id", F.coalesce("tns_name", F.lit("Unknown")).alias("tns_name")).collect()}
    assert got == {1: "SN 2025aaa", 2: "SN 2025bbb", 3: "Unknown"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    """JSONL corpus round-trip: explicit schema (no inference pass),
    types preserved, lines splittable (one doc per line)."""
    from fink_filters_spark.sources import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello world", 11), (2, "salut", 5)],
        "doc_id long, text string, n_chars long",
    )
    p = str(tmp_path / "corpus_jsonl")
    write_jsonl(df, p, compression="none")
    back = read_jsonl(spark, p, "doc_id long, text string, n_chars long")
    assert back.schema == df.schema
    assert {(r.doc_id, r.text, r.n_chars) for r in back.collect()} == {
        (1, "hello world", 11),
        (2, "salut", 5),
    }


def test_rest_snapshot_datasource_partitioned_pages(spark):
    """Spark 4 custom Python DataSource: one task per REST page, rows from
    every page present, schema honored, usable as a plain DataFrame."""
    from fink_filters_spark.sources.rest_datasource import register

    register(spark)
    df = spark.read.format("rest_snapshot").option("pages", "3").load()
    assert df.columns == ["obj_id", "ra", "dec", "name", "page"]
    rows = df.collect()
    assert len(rows) == 300
    assert {r.page for r in rows} == {0, 1, 2}
    # partition-per-page: the scan parallelism equals the page count
    assert df.rdd.getNumPartitions() == 3
    # deterministic content (offline fetcher)
    one = {r.obj_id: r.name for r in rows}
    assert one[205] == "OBJ000205"


def test_rest_snapshot_stream_pages_as_microbatches(spark, tmp_path):
    """Streaming flavor of the custom DataSource: page index as offset,
    one page window per micro-batch, stops yielding once caught up."""
    import time

    from fink_filters_spark.sources.rest_datasource import register

    register(spark)
    out: list = []
    q = (
        spark.readStream.format("rest_snapshot")
        .option("maxPages", "2")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck_rest_stream"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(out) < 200:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(out) == 200  # exactly maxPages x 100, no replays
    assert {r.page for r in out} == {0, 1}


def test_compact_partitions_bounds_file_count(spark, tmp_path):
    """Compaction: 20 sliver files per partition collapse to one bounded
    set per partition, data survives byte-identically, and a partition
    filter leaves other partitions untouched in the output."""
    import glob

    import pandas as pd
    from pyspark.sql import functions as F

    from fink_filters_spark.sinks.storage import compact_partitions

    src = str(tmp_path / "slivers")
    # 2 partitions x 20 sliver files each
    for i in range(20):
        pdf = pd.DataFrame(
            {"night": ["n1"] * 5 + ["n2"] * 5, "v": range(i * 10, i * 10 + 10)}
        )
        spark.createDataFrame(pdf).repartition(1).write.mode("append").partitionBy(
            "night"
        ).parquet(src)
    assert len(glob.glob(f"{src}/night=n1/*.parquet")) >= 20

    out = str(tmp_path / "compacted")
    compact_partitions(spark, src, ["night"], out)
    for night in ("n1", "n2"):
        files = glob.glob(f"{out}/night={night}/*.parquet")
        assert 1 <= len(files) <= 2  # bounded, whole-partition tasks
    before = sorted(
        (r.night, r.v) for r in spark.read.parquet(src).collect()
    )
    after = sorted(
        (r.night, r.v) for r in spark.read.parquet(out).collect()
    )
    assert before == after

    # partition-filtered compaction: only n1 lands in the filtered output
    out2 = str(tmp_path / "compacted_n1")
    compact_partitions(spark, src, ["night"], out2, partition_filter=F.col("night") == "n1")
    assert glob.glob(f"{out2}/night=n1/*.parquet")
    assert not glob.glob(f"{out2}/night=n2/*.parquet")
