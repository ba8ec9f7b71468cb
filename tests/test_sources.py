"""Sources/sinks layer tests (SURVEY §2.1 S1-S20) on tmp dirs + sf0.001."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from e_commerce_data_lakehouse_spark import sources as src

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_schema_bound(spark, tmp_path):
    df = spark.read.parquet(f"{SF}/region.parquet")
    out = str(tmp_path / "csv")
    df.write.option("header", "true").csv(out)
    schema = StructType(
        [
            StructField("r_regionkey", LongType()),
            StructField("r_name", StringType()),
            StructField("r_comment", StringType()),
        ]
    )
    back = src.read_csv(spark, out, schema)
    assert back.count() == df.count()
    assert [f.name for f in back.schema.fields] == [
        "r_regionkey", "r_name", "r_comment",
    ]


def test_text_envelope_double_from_json(spark, tmp_path):
    # build kafka-envelope lines: {"json_data": "<payload json>", "kafka_offset": n, ...}
    payloads = [
        {"sensor_id": f"s{i}", "temperature": 20.0 + i, "status": "OK"}
        for i in range(50)
    ]
    lines = [
        json.dumps(
            {
                "json_data": json.dumps(p),
                "kafka_offset": i,
                "kafka_partition": i % 4,
            }
        )
        for i, p in enumerate(payloads)
    ]
    raw = tmp_path / "raw.json"
    raw.write_text("\n".join(lines))

    envelope = StructType(
        [
            StructField("json_data", StringType()),
            StructField("kafka_offset", LongType()),
            StructField("kafka_partition", LongType()),
        ]
    )
    payload = StructType(
        [
            StructField("sensor_id", StringType()),
            StructField("temperature", DoubleType()),
            StructField("status", StringType()),
        ]
    )
    df = src.read_text_envelope(
        spark, str(raw), envelope, "json_data", payload
    )
    rows = df.orderBy("kafka_offset").collect()
    assert len(rows) == 50
    assert rows[0]["sensor_id"] == "s0"
    assert rows[49]["temperature"] == 69.0
    assert "source_file" in df.columns  # S20 lineage


def test_partition_columns_fallback_and_repair(spark):
    df = spark.createDataFrame(
        [("2024-03-05",), (None,)], ["d"]
    ).withColumn("d", F.col("d").cast("date"))
    p = src.with_partition_columns(df, "d")
    rows = {r["year"] for r in p.collect()}
    assert 2024 in rows  # null row falls back to current_date, non-null keeps 2024

    bad = spark.createDataFrame(
        [(2024, 13, 1), (2024, 2, 30), (None, None, None)],
        ["year", "month", "day"],
    )
    fixed = src.repair_partition_columns(bad)
    out = fixed.collect()
    # month=13 dropped; day=30 kept (reference validates day<=31 only);
    # null row repaired from current_date
    assert len(out) == 2
    assert all(r["month"] is not None for r in out)


def test_file_ledger_incremental(spark, tmp_path):
    ledger = src.FileLedger(spark, str(tmp_path / "ledger"))
    files = [f"/data/f{i}.csv" for i in range(10)]
    assert ledger.new_files(files) == sorted(files)
    ledger.mark_processed(files[:7])
    assert ledger.new_files(files) == sorted(files[7:])
    # idempotent re-run: nothing new after marking all
    ledger.mark_processed(files[7:])
    assert ledger.new_files(files) == []


def test_file_ledger_uri_path_reads_existing(spark, tmp_path):
    """A scheme'd (file:/) path must NOT short-circuit on os.path.exists —
    an existing remote-style ledger read as first-run would silently
    reprocess (duplicate-ingest) every file.  ADVICE r5 regression."""
    plain = str(tmp_path / "ledger")
    src.FileLedger(spark, plain).mark_processed(["/data/a.csv"])
    uri = src.FileLedger(spark, "file://" + plain)
    assert uri.new_files(["/data/a.csv", "/data/b.csv"]) == ["/data/b.csv"]
    # and a missing scheme'd ledger still degrades to first-run quietly
    missing = src.FileLedger(spark, "file://" + str(tmp_path / "nope"))
    assert missing.new_files(["/data/a.csv"]) == ["/data/a.csv"]


def test_ingest_new_files_loop(spark, tmp_path):
    ledger = src.FileLedger(spark, str(tmp_path / "ledger"))
    data = tmp_path / "in"
    data.mkdir()
    for i in range(3):
        (data / f"f{i}.txt").write_text(f"line{i}\n")
    discovered = sorted(str(p) for p in data.glob("*.txt"))
    written = []
    n = src.ingest_new_files(
        ledger,
        discovered,
        read_fn=lambda paths: spark.read.text(paths),
        write_fn=lambda df: written.append(df.count()),
    )
    assert n == 3 and written == [3]
    # second run: no new files, write_fn not called
    n2 = src.ingest_new_files(
        ledger, discovered,
        read_fn=lambda p: spark.read.text(p),
        write_fn=lambda df: written.append(df.count()),
    )
    assert n2 == 0 and written == [3]


def test_offset_checkpoint_resume(spark, tmp_path):
    cp = src.OffsetCheckpoint(spark, str(tmp_path), "orders_topic")
    assert cp.next_starting_offsets() == "earliest"
    consumed = spark.createDataFrame(
        [(0, 10), (0, 42), (1, 7)], ["kafka_partition", "kafka_offset"]
    )
    cp.save(consumed)
    resume = json.loads(cp.next_starting_offsets())
    assert resume == {"orders_topic": {"0": 43, "1": 8}}


def test_offset_checkpoint_keeps_idle_partitions(spark, tmp_path):
    """A batch where a partition had no new messages must not lose that
    partition's saved offset (startingOffsets JSON needs every partition)."""
    cp = src.OffsetCheckpoint(spark, str(tmp_path), "t")
    cp.save(
        spark.createDataFrame(
            [(0, 42), (1, 7)], ["kafka_partition", "kafka_offset"]
        )
    )
    # second batch: only partition 0 moved
    cp.save(
        spark.createDataFrame([(0, 50)], ["kafka_partition", "kafka_offset"])
    )
    assert json.loads(cp.next_starting_offsets()) == {
        "t": {"0": 51, "1": 8}
    }
    cp.compact()
    assert json.loads(cp.next_starting_offsets()) == {
        "t": {"0": 51, "1": 8}
    }
    # stale maxima appended later never move offsets backwards
    cp.save(
        spark.createDataFrame([(0, 45)], ["kafka_partition", "kafka_offset"])
    )
    assert json.loads(cp.next_starting_offsets())["t"]["0"] == 51


def test_managed_table_merge_lifecycle(spark, tmp_path):
    t = src.ManagedTable(spark, str(tmp_path / "dim"))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], ["id", "name"]
    )
    t.create(base)
    updates = spark.createDataFrame(
        [(2, "B2"), (3, "c")], ["id", "name"]
    )
    t.merge_scd1(updates, ["id"])
    got = {(r["id"], r["name"]) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c")}

    t.merge_insert_only(
        spark.createDataFrame([(3, "C-IGNORED"), (4, "d")], ["id", "name"]),
        ["id"],
    )
    got = {(r["id"], r["name"]) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}


def test_raw_sinks_partitioned_parallel(spark, tmp_path):
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .withColumn("year", F.year("o_orderdate"))
        .withColumn("month", F.month("o_orderdate"))
        .withColumn("day", F.dayofmonth("o_orderdate"))
        .select("o_orderkey", "o_orderstatus", "year", "month", "day")
    )
    out_csv = str(tmp_path / "raw_csv")
    src.write_raw_csv(df, out_csv)
    back = spark.read.option("header", "true").csv(out_csv)
    assert back.count() == df.count()

    out_json = str(tmp_path / "raw_json")
    src.write_raw_json(df, out_json)
    backj = spark.read.json(out_json)
    assert backj.count() == df.count()


def test_kafka_reader_construction():
    # no broker in the container: only verify the batch/stream readers build
    # without touching the network (load() would need the connector jar).
    import inspect

    sig = inspect.signature(src.read_kafka_batch)
    assert {"starting_offsets", "ending_offsets"} <= set(sig.parameters)


def test_managed_table_time_travel(spark, tmp_path):
    t = src.ManagedTable(spark, str(tmp_path / "tt"))
    t.create(spark.createDataFrame([(1, "a")], ["id", "name"]))          # v0
    t.merge_scd1(spark.createDataFrame([(1, "A2")], ["id", "name"]), ["id"])  # v1
    t.overwrite(spark.createDataFrame([(9, "z")], ["id", "name"]))       # v2
    assert t.history() == [0, 1, 2]
    assert t.read(version_as_of=0).collect()[0]["name"] == "a"
    assert t.read(version_as_of=1).collect()[0]["name"] == "A2"
    assert t.read().collect()[0]["id"] == 9
    t.restore_to_version(1)                                              # v3
    assert t.read().collect()[0]["name"] == "A2"


def test_managed_table_append_is_file_level(spark, tmp_path):
    t = src.ManagedTable(spark, str(tmp_path / "ap"))
    t.create(spark.createDataFrame([(1,)], ["id"]))
    t.append(spark.createDataFrame([(2,)], ["id"]))
    t.append(spark.createDataFrame([(3,)], ["id"]))
    # appends do not mint snapshots; data lands in the current version
    assert t.history() == [0]
    assert {r["id"] for r in t.read().collect()} == {1, 2, 3}


def test_managed_table_compact_and_prune(spark, tmp_path):
    t = src.ManagedTable(spark, str(tmp_path / "cp"), keep_versions=2)
    t.create(spark.range(100).toDF("id"))
    for _ in range(3):
        t.compact(target_partitions=2)
    # keep_versions=2 prunes old snapshots
    assert len(t.history()) <= 2
    assert t.read().count() == 100


def test_json_source_schema_bound(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    path = tmp_path / "j.json"
    path.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    schema = StructType([StructField("a", LongType()), StructField("b", StringType())])
    df = src.read_json(spark, str(path), schema)
    assert df.count() == 2 and df.schema == schema


def test_discover_files(spark, tmp_path):
    (tmp_path / "d1").mkdir()
    (tmp_path / "d1" / "x.csv").write_text("a\n1\n")
    (tmp_path / "d1" / "y.txt").write_text("hi\n")
    found = src.discover_files(spark, str(tmp_path), extensions=(".csv",))
    assert len(found) == 1 and found[0].endswith("x.csv")


def test_decode_kafka_records(spark):
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [(b"v1", b"k1", 0, 7)], ["value", "key", "partition", "offset"]
    ).withColumn("timestamp", F.current_timestamp())
    out = src.decode_kafka_records(raw)
    row = out.collect()[0]
    assert row["message_value"] == "v1" and row["kafka_offset"] == 7
    assert set(out.columns) == {
        "message_value", "message_key", "kafka_timestamp",
        "kafka_partition", "kafka_offset",
    }


def test_salted_join_matches_plain_join(spark):
    from e_commerce_data_lakehouse_spark.operators.joins import salted_join

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(cust, ["o_custkey"]).count()
    salted = salted_join(orders, cust, ["o_custkey"], n_salts=8).count()
    assert plain == salted
    # semantics-breaking modes are rejected (small side is replicated, so
    # right/full outer would emit unmatched small rows once per salt)
    import pytest as _pytest

    for bad in ("right", "full", "outer"):
        with _pytest.raises(ValueError):
            salted_join(orders, cust, ["o_custkey"], how=bad)


def test_range_join_matches_naive(spark):
    from e_commerce_data_lakehouse_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(i, i * 3 % 100) for i in range(200)], ["pid", "p"]
    )
    intervals = spark.createDataFrame(
        [(j, j * 7 % 90, j * 7 % 90 + 12) for j in range(40)],
        ["iid", "lo", "hi"],
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "p", "lo", "hi", 10).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter(F.col("p").between(F.col("lo"), F.col("hi")))
        .collect()
    }
    assert got == naive and len(got) > 0


def test_scd2_merge_close_open_insert_and_idempotence(spark):
    from e_commerce_data_lakehouse_spark.operators import merge as mg

    dim = spark.createDataFrame(
        [
            (1, "gold", "2020-01-01", None, True),
            (1, "bronze", "2019-01-01", "2020-01-01", False),  # history
            (2, "silver", "2020-01-01", None, True),
            (3, "gold", "2020-01-01", None, True),
        ],
        "k long, tier string, valid_from string, valid_to string, is_current boolean",
    ).selectExpr(
        "k", "tier",
        "CAST(valid_from AS DATE) AS valid_from",
        "CAST(valid_to AS DATE) AS valid_to",
        "is_current",
    )
    updates = spark.createDataFrame(
        [(1, "platinum"), (2, "silver"), (4, "new")], "k long, tier string"
    )
    out = mg.scd2_merge(dim, updates, ["k"], ["tier"], "2021-06-01")
    rows = {(r["k"], r["tier"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
            for r in out.collect()}
    assert rows == {
        (1, "bronze", "2019-01-01", "2020-01-01", False),   # history untouched
        (1, "gold", "2020-01-01", "2021-06-01", False),      # closed
        (1, "platinum", "2021-06-01", "None", True),         # opened
        (2, "silver", "2020-01-01", "None", True),           # no-op update
        (3, "gold", "2020-01-01", "None", True),             # not in batch
        (4, "new", "2021-06-01", "None", True),              # new key
    }
    # replaying the same batch must be a no-op (idempotent apply)
    again = mg.scd2_merge(out, updates, ["k"], ["tier"], "2021-07-01")
    rows2 = {(r["k"], r["tier"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
             for r in again.collect()}
    assert rows2 == rows


def test_managed_table_delete_update_where(spark, tmp_path):
    t = src.ManagedTable(spark, str(tmp_path / "dml"))
    t.create(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
            "id long, grp string, v double",
        )
    )
    # UPDATE ... WHERE
    n = t.update_where(F.col("grp") == "a", {"v": F.col("v") * 2})
    assert n == 2
    assert {(r["id"], r["v"]) for r in t.read().collect()} == {
        (1, 20.0), (2, 20.0), (3, 60.0),
    }
    # DELETE ... WHERE (GDPR erasure path), versioned + time-travel reversible
    before = t.history()[-1]
    n = t.delete_where(F.col("id") == 2)
    assert n == 1
    assert {r["id"] for r in t.read().collect()} == {1, 3}
    assert {r["id"] for r in t.read(version_as_of=before).collect()} == {1, 2, 3}
    # no-op predicates commit nothing
    hist = t.history()
    assert t.delete_where(F.col("id") == 999) == 0
    assert t.history() == hist


def test_managed_table_append_once_is_idempotent(spark, tmp_path):
    t = src.ManagedTable(spark, str(tmp_path / "ao"))
    batch = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    assert t.append_once(batch, "batch-0001") is True
    assert t.append_once(batch, "batch-0001") is False  # replay -> no-op
    assert t.read().count() == 2
    assert t.append_once(batch, "batch-0002") is True   # new txn appends
    assert t.read().count() == 4
