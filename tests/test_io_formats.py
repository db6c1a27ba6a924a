"""File-format surface: CSV / JSON-lines / ORC round-trips.

The reference's only I/O is Kafka JSON (faust_app/ma_agg.py:40,44); the
engine's batch side must also speak the warehouse interchange formats.
Each round-trip pins (a) value fidelity under an EXPLICIT schema — the
100 TB rule is "never infer schemas in production paths": inference
costs an extra full scan and can silently flip a column's type between
runs — and (b) that the read path benefits from pushdown where the
format supports it (ORC yes, CSV/JSON no pushdown but column pruning
still applies).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.io import load_table
from tests.conftest import SF_DIR

#: columns with exact (non-float) equality semantics for the round-trip
KEY_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


def _fingerprint(df):
    """Order-insensitive content hash over all columns (dates formatted,
    floats rounded so text formats' repr round-trip can't flake)."""
    canon = df.select(
        *KEY_COLS,
        F.round("o_totalprice", 4).alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
    )
    row = canon.agg(
        F.sum(F.xxhash64(*canon.columns).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return row["h"], row["n"]


def test_csv_json_orc_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    want = _fingerprint(orders)
    schema = orders.schema

    csv_dir = str(tmp_path / "orders_csv")
    orders.write.option("header", True).option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss"
    ).csv(csv_dir)
    back_csv = (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(csv_dir)
    )
    assert _fingerprint(back_csv) == want

    json_dir = str(tmp_path / "orders_json")
    orders.write.option("timestampFormat", "yyyy-MM-dd HH:mm:ss").json(json_dir)
    back_json = (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .json(json_dir)
    )
    assert _fingerprint(back_json) == want

    orc_dir = str(tmp_path / "orders_orc")
    orders.write.orc(orc_dir)
    back_orc = spark.read.orc(orc_dir)
    assert _fingerprint(back_orc) == want


def test_orc_filter_pushdown(spark, tmp_path):
    """ORC scans must receive pushed filters like parquet does."""
    orc_dir = str(tmp_path / "orders_orc_pd")
    load_table(spark, SF_DIR, "orders").write.orc(orc_dir)
    q = spark.read.orc(orc_dir).where(F.col("o_orderkey") < 100).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split(
        "PushedFilters", 1
    )[1].split("]")[0], plan
    assert q.count() > 0


def test_binary_file_source_feeds_multimodal_extract(spark, tmp_path):
    """E26 ingestion front door: raw media files land via the binaryFile
    source — pathGlobFilter prunes non-matching files at LISTING time,
    the length metadata column guards oversized payloads before content
    is touched — and the surviving blobs flow straight into the Arrow
    feature extractor with no driver round-trip."""
    import hashlib

    from kafka_stream_faust_deprecated_spark.functions.multimodal import (
        extract_features,
    )
    from kafka_stream_faust_deprecated_spark.io import binary_file_source

    media = tmp_path / "media"
    media.mkdir()
    payloads = {i: bytes([i]) * (10 + i) for i in range(5)}
    for i, raw in payloads.items():
        (media / f"img_{i}.bin").write_bytes(raw)
    (media / "notes.txt").write_bytes(b"not media")          # glob-pruned
    (media / "huge_9.bin").write_bytes(b"x" * 1000)          # length-pruned

    files = binary_file_source(
        spark, str(media), glob="*.bin", max_bytes=100
    )
    table = files.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
    rows = extract_features(table, fake=True).collect()
    assert {r["doc_id"] for r in rows} == set(payloads)
    for r in rows:
        raw = payloads[r["doc_id"]]
        assert r["n_bytes"] == len(raw)
        assert r["content_hash"] == hashlib.md5(raw).hexdigest()
        assert len(r["feature"]) == 4


def test_compact_parquet_preserves_content_and_reduces_files(spark, tmp_path):
    """Fragmented parquet dir (one file per write) -> compact_parquet ->
    same content fingerprint, file count collapsed to the byte-derived
    target, and the audit dict reports the real before/after numbers."""
    import glob

    from kafka_stream_faust_deprecated_spark.io import compact_parquet

    o = load_table(spark, SF_DIR, "orders")
    src = str(tmp_path / "fragmented")
    # simulate micro-batch ingest: 24 tiny files
    o.repartition(24).write.mode("overwrite").parquet(src)
    n_src = len(glob.glob(src + "/*.parquet"))
    assert n_src >= 24

    dst = str(tmp_path / "compacted")
    audit = compact_parquet(spark, src, dst, target_file_mb=128)
    n_dst = len(glob.glob(dst + "/*.parquet"))
    assert audit["files_before"] == n_src
    assert audit["files_target"] == 1  # tiny fixture << 128 MB
    assert n_dst == 1
    assert audit["rows"] == o.count()
    assert _fingerprint(spark.read.parquet(dst)) == _fingerprint(o)


def test_compact_parquet_partitioned_layout(spark, tmp_path):
    """partition_cols compaction rewrites into hive partition dirs with
    per-partition files, content preserved."""
    import glob

    from kafka_stream_faust_deprecated_spark.io import compact_parquet

    o = load_table(spark, SF_DIR, "orders")
    src = str(tmp_path / "frag2")
    o.repartition(12).write.mode("overwrite").parquet(src)
    dst = str(tmp_path / "by_status")
    audit = compact_parquet(
        spark, src, dst, target_file_mb=128, partition_cols=("o_orderstatus",)
    )
    statuses = {r["o_orderstatus"] for r in o.select("o_orderstatus").distinct().collect()}
    dirs = {p.rsplit("=", 1)[-1] for p in glob.glob(dst + "/o_orderstatus=*")}
    assert dirs == statuses
    assert audit["rows"] == o.count()
    assert _fingerprint(spark.read.parquet(dst)) == _fingerprint(o)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema drift across ingest batches (a later batch adds a column)
    reads back as the union schema with nulls for early batches —
    mergeSchema is the engine's documented evolution pattern; without it
    the footer of a single random file wins and the new column silently
    disappears."""
    o = load_table(spark, SF_DIR, "orders")
    root = str(tmp_path / "evolving")
    o.select("o_orderkey", "o_totalprice").write.parquet(root + "/batch=1")
    o.select(
        "o_orderkey", "o_totalprice", F.lit("en").alias("region_code")
    ).write.parquet(root + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "region_code", "batch"}
    n = o.count()
    assert merged.count() == 2 * n
    # early-batch rows surface the new column as null, not as an error
    assert merged.where("batch = 1 AND region_code IS NULL").count() == n
    assert merged.where("batch = 2 AND region_code = 'en'").count() == n
