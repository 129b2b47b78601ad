"""Transformation framework tests, mirroring TransformSpec (DAG
ordering + appended columns), StringUtilsSpec (template edge cases),
ExecuteSQLSpec (named SQL with params)."""

import pytest
from pyspark.sql import functions as F

from featurestore_spark.functions.templating import template
from featurestore_spark.store import Feature, FeatureStore
from featurestore_spark.transform import (
    AppendColumnRowTransformation,
    NamedSQLTransformation,
    Pipeline,
    RowTransformationPipeline,
    SQLTableTransformation,
    TableTransformation,
    TableTransformationPipeline,
    TransformationContext,
)
from featurestore_spark.transform.row import ErrorThresholdReachedException


def test_template_edge_cases():
    # StringUtilsSpec.scala:8-19
    assert template("Hello $w", {"w": "World"}) == "Hello World"
    assert template("Hello ${w}", {"w": "World"}) == "Hello World"
    assert template("keep $$w as-is", {"w": "World"}) == "keep $$w as-is"
    assert template("unknown $nope stays", {"w": "x"}) == "unknown $nope stays"
    assert template("quoted '$w' and \"${w}\"", {"w": "V"}) == "quoted 'V' and \"V\""
    assert (
        template("select * from $t where id = '$id'", {"t": "events", "id": "7"})
        == "select * from events where id = '7'"
    )


def test_table_pipeline_dag_order(spark):
    df = spark.range(5).toDF("n")
    order = []

    def mk(name, col_expr):
        def fn(d, ctx):
            order.append(name)
            return d.withColumn(name, col_expr)

        return TableTransformation(name, fn)

    t_c = mk("c", F.col("b") + 1)
    t_a = mk("a", F.col("n") * 2)
    t_b = mk("b", F.col("a") + 10)
    t_b.add_dependencies(t_a)
    t_c.add_dependencies(t_b)

    ctx = TransformationContext()
    pipe = TableTransformationPipeline("p", t_c, t_b, t_a)  # declared out of order
    out = pipe(df, ctx)
    assert order == ["a", "b", "c"]  # toposorted
    row = out.where(F.col("n") == 3).first()
    assert (row["a"], row["b"], row["c"]) == (6, 16, 17)
    assert [s.name for s in ctx["steps"]] == ["a", "b", "c"]
    assert all(s.status == "success" for s in ctx["steps"])


def test_row_pipeline_expr_and_python_paths(spark):
    df = spark.createDataFrame([("5",), ("7",), ("oops",)], ["v"])
    expr_t = AppendColumnRowTransformation(
        "doubled", "doubled", "int", expr=F.col("v").try_cast("int") * 2
    )
    py_t = AppendColumnRowTransformation(
        "parsed", "parsed", "int", fn=lambda row: int(row["v"]) + 1
    )
    pipe = RowTransformationPipeline("rp", expr_t, py_t)
    ctx = TransformationContext({"errorThreshold": 5})
    out = pipe.run_with_error_check(df, ctx)
    got = {r["v"]: (r["doubled"], r["parsed"]) for r in out.collect()}
    assert got["5"] == (10, 6)
    assert got["oops"] == (None, None)  # error captured, row kept
    assert len(ctx["errors"]) == 1 and "ValueError" in ctx["errors"][0]

    strict = TransformationContext({"errorThreshold": 0})
    with pytest.raises(ErrorThresholdReachedException):
        pipe.run_with_error_check(df, strict)


def test_sql_table_transformation_and_pipeline(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], ["id", "k"])
    t = SQLTableTransformation(
        "select k, count(*) as n from $tbl group by k", "ev_tmp"
    )
    ctx = TransformationContext({"sqlparams": {"tbl": "ev_tmp"}})
    out = t(df, ctx)
    got = {r["k"]: r["n"] for r in out.collect()}
    assert got == {"a": 2, "b": 1}

    # full pipeline: source -> transform -> sink
    src_path = str(tmp_path / "in.parquet")
    out_path = str(tmp_path / "out.parquet")
    df.write.parquet(src_path)

    from featurestore_spark.io.sources import ParquetSink, ParquetSource

    pipe = Pipeline("p", t)
    ctx2 = TransformationContext(
        {"path": src_path, "out_path": out_path, "sqlparams": {"tbl": "ev_tmp"}}
    )
    pipe.run(ParquetSource(spark), ParquetSink(), ctx2)
    assert spark.read.parquet(out_path).count() == 2


def test_named_sql_loader(spark, tmp_path):
    props = tmp_path / "sql.properties"
    props.write_text(
        "query1=select 1 as one\n"
        "query3=select event_type, ts from $mytable where user_id = $entityId\n"
    )
    ev = spark.createDataFrame(
        [(1, "click", "2024-01-01")], ["user_id", "event_type", "ts"]
    )
    ev.createOrReplaceTempView("events_named")
    ctx = TransformationContext(
        {"sqlparams": {"mytable": "events_named", "entityId": "1"}}
    )
    out = NamedSQLTransformation(str(props), "query3")(spark, ctx)
    assert out.count() == 1 and out.first()["event_type"] == "click"


def test_feature_store_roundtrip(tmp_path):
    fs = FeatureStore()
    fs.register_feature(Feature("purchase", "Base", "web"))
    fs.register_feature(Feature("score", "Derived", "web", active=False))
    fs.register_feature(Feature("view", "Base", "web"))
    assert fs.attribute_names("web") == ["purchase", "view"]  # active only
    p = str(tmp_path / "features.csv")
    fs.save(p)
    fs2 = FeatureStore.load(p)
    assert fs2.attribute_names("web") == ["purchase", "view"]
    assert len(fs2.features(active_only=False)) == 3


def test_string_utils():
    from featurestore_spark.functions.strings import (
        camelize,
        count_substring,
        is_number,
        underscore,
    )

    assert camelize("order_priority") == "orderPriority"
    assert camelize("order_priority", upper_first=True) == "OrderPriority"
    assert underscore("OrderPriority") == "order_priority"
    assert underscore("Product Sub-Category") == "product_sub_category"
    assert count_substring("a,b,,c", ",") == 3
    assert is_number("3.5") and is_number("-2") and not is_number("3x")


def test_sql_resource_transformation(spark):
    """T8 4th variant: SQL shipped as a package resource
    (sql/SQLResourceTransformation.scala:14-25)."""
    from featurestore_spark.transform import SQLResourceTransformation

    spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b")], ["id", "val"]
    ).createOrReplaceTempView("res_t")
    tf = SQLResourceTransformation(
        "featurestore_spark.queries",
        "sql/top_rows.sql",
        {"table": "res_t", "order_col": "id", "n": "2"},
    )
    rows = tf(spark).collect()
    assert [r["val"] for r in rows] == ["a", "b"]
    # ctx sqlparams fill anything the constructor didn't bind
    tf2 = SQLResourceTransformation(
        "featurestore_spark.queries", "sql/top_rows.sql", {"n": "1"}
    )
    ctx = TransformationContext(
        {"sqlparams": {"table": "res_t", "order_col": "id", "n": "3"}}
    )
    assert tf2(spark, ctx).count() == 1  # constructor params win


def test_audit_repositories_roundtrip(spark, tmp_path):
    """ErrorRepository/JobStepRepository CSV persistence
    (store/ErrorRepository.scala:25-41, JobStepRepository.scala:25-41):
    the context's audit trail survives a save/load cycle, through the
    Hadoop FS path (scheme-qualified) and the plain-local path."""
    from featurestore_spark.store import (
        ErrorRepository,
        JobStepRepository,
        persist_context_audit,
    )
    from featurestore_spark.transform.context import JobStep, TransformationError

    steps = [
        JobStep("load_hub", "success", ""),
        JobStep("load_satellite", "failure", "boom, with ,commas"),
    ]
    errors = [TransformationError("cast_age", "bad int", "row(age='x')")]
    ctx = TransformationContext({"steps": steps, "errors": errors})
    persist_context_audit(
        ctx,
        steps_path=f"file:{tmp_path}/steps.csv",
        errors_path=f"file:{tmp_path}/errors.csv",
        spark=spark,
    )
    got_steps = JobStepRepository(f"file:{tmp_path}/steps.csv", spark).load()
    assert got_steps == steps  # csv quoting preserved the commas
    got_errors = ErrorRepository(f"file:{tmp_path}/errors.csv", spark).load()
    assert got_errors == errors

    local = JobStepRepository(str(tmp_path / "steps_local.csv"))
    local.save(steps)
    assert local.load() == steps
    assert JobStepRepository(str(tmp_path / "missing.csv")).load() == []


def test_csv_sink_and_sql_file_source(spark, tmp_path):
    """S5 + S6: untested r1 constructors get a real write/read path."""
    from featurestore_spark.io.sources import CSVSink, CSVSource, SQLFileSource

    df = spark.createDataFrame(
        [(1, "a b", 2.5), (2, "c,d", -1.0)], ["id", "txt", "x"]
    )
    out = str(tmp_path / "sink_csv")
    CSVSink()(df, {"out_path": out, "header": True})
    back = CSVSource(spark)(
        {"path": out, "header": True, "schema": "id bigint, txt string, x double"}
    )
    assert sorted(back.collect()) == sorted(df.collect())  # commas quoted

    sql_path = tmp_path / "q.sql"
    sql_path.write_text("SELECT count(*) AS n FROM $view WHERE x > $min_x")
    df.createOrReplaceTempView("sink_v")
    res = SQLFileSource(spark, str(sql_path))(
        {"sqlparams": {"view": "sink_v", "min_x": "0"}}
    )
    assert res.first()["n"] == 1


def test_jdbc_source_roundtrip_derby(spark):
    """S9 smoke via the Derby embedded driver that ships in Spark's
    jars (star/io/JdbcReader.scala:9-24): write a table over JDBC,
    read it back through JdbcSource."""
    from featurestore_spark.io.sources import JdbcSource

    url = "jdbc:derby:memory:fs_jdbc;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "val"])
    (
        df.write.format("jdbc")
        .option("driver", driver)
        .option("url", url)
        .option("dbtable", "t_smoke")
        .mode("overwrite")
        .save()
    )
    back = JdbcSource(spark)({"driver": driver, "url": url, "dbtable": "t_smoke"})
    assert sorted((r["id"], r["val"]) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_jsonl_source_sink_roundtrip(spark, tmp_path):
    from featurestore_spark.io.sources import JsonlSink, JsonlSource

    df = spark.createDataFrame(
        [(1, "hello world", ["a", "b"]), (2, 'quote " and \\ slash', None)],
        "doc_id long, text string, tags array<string>",
    )
    out = str(tmp_path / "out.jsonl")
    JsonlSink()(df, {"out_path": out})
    back = JsonlSource(spark)(
        {"path": out, "schema": "doc_id long, text string, tags array<string>"}
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # schema-free read also works (inference pass)
    assert JsonlSource(spark)({"path": out}).count() == 2
