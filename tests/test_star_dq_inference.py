"""Star-schema (StarSpec golden: 6 dim rows), DQ plans (unit_price>0
threshold 0.01), and CSV sniffing (ExtractFileMetadataSpec) tests."""

import pytest
from pyspark.sql import functions as F

from featurestore_spark.dq import DQRunner
from featurestore_spark.inference import sniff
from featurestore_spark.inference.sniffer import get_type, read_ebcdic_lines
from featurestore_spark.star import DimSpec, StarConfig, StarLoader


@pytest.fixture()
def sales(spark):
    rows = [
        (i, f"P{i % 6}", f"prio{i % 6}", "east" if i % 2 else "west", 10.0 * (i + 1), 1.0 + i)
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows, ["order_id", "product", "order_priority", "region", "sales", "unit_price"]
    )


def test_star_dim_golden_count_and_fact_fks(spark, sales, tmp_path):
    loader = StarLoader(spark, str(tmp_path))
    cfg = StarConfig(
        dims=[DimSpec("order_priority", ["order_priority"]), DimSpec("region", ["region"])],
        measure_cols=["sales", "unit_price"],
        fact_name="sales",
    )
    fact = loader.dimensionalize(sales, cfg)
    dim = spark.read.parquet(str(tmp_path / "dim_order_priority.parquet"))
    # 6 distinct priorities + unknown row (StarSpec.scala:36-38 analog)
    assert dim.where("id >= 0").count() == 6
    assert dim.where("id = -1").count() == 1
    assert fact.count() == 60
    assert fact.where(F.col("order_priority_id") == -1).count() == 0
    # FK joins back to the right dim member
    joined = fact.join(
        dim.select(F.col("id").alias("order_priority_id"), "order_priority"),
        "order_priority_id",
    )
    assert joined.where(
        (F.col("sales") == 10.0) & (F.col("order_priority") != "prio0")
    ).count() == 0


def test_star_dim_scd2_change(spark, tmp_path):
    loader = StarLoader(spark, str(tmp_path))
    spec = DimSpec("prod", ["product"], ["category"])
    d0 = spark.createDataFrame(
        [("A", "cat1"), ("B", "cat2")], ["product", "category"]
    )
    loader.load_dim(d0, spec, process_time="2024-01-01 00:00:00")
    d1 = spark.createDataFrame(
        [("A", "catX"), ("B", "cat2"), ("C", "cat3")], ["product", "category"]
    )
    dim = loader.load_dim(d1, spec, process_time="2024-02-01 00:00:00")
    a_rows = dim.where("product = 'A'").orderBy("version").collect()
    assert len(a_rows) == 2
    assert a_rows[0]["current"] is False and str(a_rows[0]["end_time"]).startswith("2024-02-01")
    assert a_rows[1]["current"] is True and a_rows[1]["version"] == 2
    # id stable across versions
    assert a_rows[0]["id"] == a_rows[1]["id"]
    # new member got a fresh id beyond the seed
    c = dim.where("product = 'C'").first()
    assert c["version"] == 1 and c["id"] > 0


def test_dq_assertion_and_plan(spark, sales):
    dq = DQRunner(spark)
    bad = sales.withColumn(
        "unit_price", F.when(F.col("order_id") == 3, -5.0).otherwise(F.col("unit_price"))
    )
    res, invalid = dq.run_assertion(bad, "positive_price", "unit_price > 0", 0.01)
    assert not res.passed and res.invalid == 1
    assert invalid.count() == 1 and invalid.first()["order_id"] == 3

    plan = {
        "steps": [
            {
                "type": "view",
                "name": "east_sales",
                "sql": "select * from raw where region = 'east'",
            },
            {
                "type": "assertion",
                "input": "east_sales",
                "assertions": [
                    {"name": "pos_price", "query": "unit_price > 0", "threshold": 0.5},
                    {"name": "sales_cap", "query": "sales <= 1000", "threshold": 0.0},
                ],
            },
            {
                "type": "diff",
                "name": "self_diff",
                "left": "east_sales",
                "right": "east_sales",
                "key_cols": ["order_id"],
                "compare_cols": ["sales"],
            },
        ]
    }
    report = dq.run_plan(plan, {"raw": bad})
    assert report.assertions[0].passed  # threshold tolerates 1 bad row
    assert not report.assertions[1].passed or bad.where("sales > 1000").count() == 0
    assert report.diffs["self_diff"] == 0


def test_dq_diff_detects_mismatches(spark):
    dq = DQRunner(spark)
    l = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["id", "v"])
    r = spark.createDataFrame([(1, 10.0), (2, 99.0), (3, 30.0)], ["id", "v"])
    diff = dq.run_diff(l, r, ["id"], ["v"])
    rows = {row["id"]: row["v_match"] for row in diff.collect()}
    assert rows[1] is True and rows[2] is False and rows[3] is False


def test_sniffer_comma_and_tab(tmp_path):
    csv_data = "Order ID,Order Date,Sales,Active\n1,2012-01-05,100.5,true\n2,2012-02-07,20.25,false\n"
    md = sniff(csv_data)
    assert md.delimiter == "," and md.has_header
    assert md.column_names[0] == "Order ID"
    assert md.column_types == ["bigint", "date", "double", "boolean"]

    tsv = "a\tb\tc\n1\t2.5\tx\n3\t4.5\ty\n"
    md2 = sniff(tsv)
    assert md2.delimiter == "\t" and md2.has_header
    assert md2.column_types == ["bigint", "double", "string"]

    noheader = "1,2.5\n3,4.0\n5,6.25\n"
    md3 = sniff(noheader)
    assert not md3.has_header
    assert md3.spark_read_options()["header"] == "false"


def test_type_detection():
    assert get_type("42") == "bigint"
    assert get_type("-3.14") == "double"
    assert get_type("1e5") == "double"
    assert get_type("2024-01-05") == "date"
    assert get_type("2024-01-05 10:30:00") == "timestamp"
    assert get_type("true") == "boolean"
    assert get_type("hello") == "string"


def test_ebcdic_roundtrip(tmp_path):
    p = tmp_path / "ebcdic.dat"
    text = "10SMSDC HELLO\nSECOND LINE\n"
    p.write_bytes(text.encode("cp500"))
    lines = read_ebcdic_lines(str(p))
    assert lines[0].startswith("10SMSDC") and "SECOND" in lines[1]


def test_star_dim_scheme_qualified_path_and_id_order(spark, tmp_path):
    """SCD2 merge through a scheme-qualified base path (file:/...) —
    os.path.exists is always False on these, so r1 silently re-initialized
    the dim and reassigned ids (ADVICE r1, medium). Also asserts the
    bucketed id assignment reproduces the global hashed_key ranking."""
    loader = StarLoader(spark, f"file:{tmp_path}")
    spec = DimSpec("prod", ["product"], ["category"])
    d0 = spark.createDataFrame(
        [(f"P{i:03d}", f"cat{i % 5}") for i in range(60)], ["product", "category"]
    )
    dim0 = loader.load_dim(d0, spec, process_time="2024-01-01 00:00:00")
    # ids == dense rank over hashed_key (bucketed window, same ordering)
    rows = dim0.where("id > 0").orderBy("hashed_key").collect()
    assert [r["id"] for r in rows] == list(range(1, 61))

    # merge load: one change + one new member — history must SURVIVE
    d1 = spark.createDataFrame(
        [("P000", "catX"), ("P999", "catN")], ["product", "category"]
    )
    dim1 = loader.load_dim(d1, spec, process_time="2024-02-01 00:00:00")
    assert dim1.count() == 60 + 1 + 1 + 1  # 60 v1 + unknown + changed v2 + new
    p0 = dim1.where("product = 'P000'").orderBy("version").collect()
    assert len(p0) == 2 and p0[0]["id"] == p0[1]["id"]  # FK-stable
    new = dim1.where("product = 'P999'").first()
    assert new["id"] == 61  # seeded past previous max


def test_date_parser_36_formats_and_move_to_front():
    """DateParser.scala:11-100 parity: US/EU/compact/month-name/offset
    formats all parse; winning format moves to the front."""
    from featurestore_spark.inference import DateParser

    p = DateParser()
    cases = {
        "2001-07-04T12:08:56.235-0700": "yyyy-MM-dd'T'HH:mm:ss.SSSZ",
        "2001-07-04 12:08:56.235000": "yyyy-MM-dd HH:mm:ss.SSSSSS",
        "20010704 12:08:56": "yyyyMMdd HH:mm:ss",
        "Wed, Jul 4, '01": "EEE, MMM d, ''yy",
        "Wed, Jul 4, 2001": "EEE, MMM d, yyyy",
        "2001.07.04": "yyyy.MM.dd",
        "2001/07/04": "yyyy/MM/dd",
        "04.07.2001": "dd.MM.yyyy",
        "04/07/2001": "dd/MM/yyyy",  # EU day-first wins over US
        "03/APR/15": "dd/MMM/yy",
        "2001-07-04 12:08": "yyyy-MM-dd HH:mm",
        "2001-07-04T12:08:56": "yyyy-MM-dd'T'HH:mm:ss",
    }
    for value, want in cases.items():
        got = DateParser().parse(value)
        assert got is not None and got.pattern == want, value
    # move-to-front: after one US-style hit the format is tried first
    p = DateParser()
    assert p.parse("07-04-2001")  # matches dd-MM-yyyy (day-first priority)
    assert p.formats[0][0] == "dd-MM-yyyy"
    assert p.parse("not a date") is None
    assert p.parse("") is None and p.parse(None) is None


def test_date_parser_conforms_fraction_and_offset_width():
    """strptime %f/%z leniency must not leak into the reported Joda
    pattern: 3-digit millis report .SSS (not the lenient .SSSSSS
    entry), ISO '+01:00'/'Z' offsets report XXX (not RFC822 Z), so
    spark_read_options() round-trips under java.time's strict parser."""
    from featurestore_spark.inference import DateParser

    cases = {
        "2024-01-01 12:00:00.123": "yyyy-MM-dd HH:mm:ss.SSS",
        "2024-01-01T12:00:00.123": "yyyy-MM-dd'T'HH:mm:ss.SSS",
        "2024-01-01 12:00:00.123456": "yyyy-MM-dd HH:mm:ss.SSSSSS",
        "2024-01-01T12:00:00.123+01:00": "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
        "2024-01-01T12:00:00.123-0700": "yyyy-MM-dd'T'HH:mm:ss.SSSZ",
        "2024-01-01T12:00:00.123Z": "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
        "2024-01-01 12:00:00.12": "yyyy-MM-dd HH:mm:ss.SS",
    }
    for value, want in cases.items():
        got = DateParser().parse(value)
        assert got is not None and got.pattern == want, value


def test_sniffed_millis_timestamp_round_trips_through_spark(spark, tmp_path):
    """The ADVICE repro: a .123-millis column sniffed then read back
    with the advertised options must not null out."""
    fp = tmp_path / "millis.csv"
    fp.write_text(
        "id,stamp\n"
        "1,2024-01-01 12:00:00.123\n"
        "2,2024-01-02 01:02:03.456\n"
    )
    from featurestore_spark.inference import sniff_file

    md = sniff_file(str(fp))
    assert md.timestamp_format == "yyyy-MM-dd HH:mm:ss.SSS"
    df = spark.read.options(**md.spark_read_options()).csv(
        str(fp), schema="id bigint, stamp timestamp"
    )
    rows = {r["id"]: r["stamp"] for r in df.collect()}
    assert rows[1] is not None and rows[1].microsecond == 123000
    assert rows[2] is not None and rows[2].microsecond == 456000


def test_sniff_harvests_date_formats(tmp_path):
    fp = tmp_path / "dated.csv"
    fp.write_text(
        "id,when,stamp,note\n"
        "1,04/07/2001,2001-07-04 12:08:56,a\n"
        "2,05/08/2002,2002-08-05 01:02:03,b\n"
        "3,06/09/2003,2003-09-06 23:59:59,c\n"
    )
    from featurestore_spark.inference import sniff_file

    md = sniff_file(str(fp))
    assert md.column_types == ["bigint", "date", "timestamp", "string"]
    assert md.date_format == "dd/MM/yyyy"
    assert md.timestamp_format == "yyyy-MM-dd HH:mm:ss"
    opts = md.spark_read_options()
    assert opts["dateFormat"] == "dd/MM/yyyy"
    assert opts["timestampFormat"] == "yyyy-MM-dd HH:mm:ss"


def test_sniff_demotes_mixed_format_date_column(tmp_path):
    fp = tmp_path / "mixed.csv"
    fp.write_text(
        "a,b\n"
        "2024-01-05,04/07/2001\n"
        "2024/01/06,05/08/2002\n"  # column a mixes two formats
    )
    from featurestore_spark.inference import sniff_file

    md = sniff_file(str(fp))
    assert md.column_types[0] == "string"  # mixed -> demoted, not corrupted
    assert md.column_types[1] == "date" and md.date_format == "dd/MM/yyyy"
