"""Context-driven sources and sinks (diamond/io/Source.scala,
Sink.scala — S1–S7). Each is a callable taking the ctx dict and
returning/writing a DataFrame, so Pipeline.run can compose them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from featurestore_spark.functions.templating import template
from featurestore_spark.transform.sql import SQLLoader


class CSVSource:
    """S1: CSV→DF with optional explicit schema + header option
    (Source.scala:25-53)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __call__(self, ctx) -> DataFrame:
        reader = self.spark.read.option("header", str(ctx.get("header", True)).lower())
        if ctx.get("schema") is not None:
            reader = reader.schema(ctx["schema"])
        else:
            reader = reader.option("inferSchema", "true")
        for k, v in ctx.get("csv_options", {}).items():
            reader = reader.option(k, v)
        return reader.csv(ctx["path"])


class ParquetSource:
    """S2 (Source.scala:55-72)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __call__(self, ctx) -> DataFrame:
        return self.spark.read.parquet(ctx["path"])


class JdbcSource:
    """S9 (star/io/JdbcReader.scala:9-24)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __call__(self, ctx) -> DataFrame:
        return (
            self.spark.read.format("jdbc")
            .option("driver", ctx["driver"])
            .option("url", ctx["url"])
            .option("dbtable", ctx["dbtable"])
            .load()
        )


class SQLSource:
    """S4: inline SQL (Source.scala:101-124)."""

    def __init__(self, spark: SparkSession, sql: str):
        self.spark = spark
        self.sql = sql

    def __call__(self, ctx) -> DataFrame:
        return self.spark.sql(template(self.sql, ctx.get("sqlparams", {})))


class NamedSQLSource:
    """S3: named query from props/XML (Source.scala:74-99)."""

    def __init__(self, spark: SparkSession, path: str, name: str):
        self.spark = spark
        self.path = path
        self.name = name

    def __call__(self, ctx) -> DataFrame:
        sql = SQLLoader.load(self.path)[self.name]
        return self.spark.sql(template(sql, ctx.get("sqlparams", {})))


class SQLFileSource:
    """S5: SQL from a file (Source.scala:126-149)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def __call__(self, ctx) -> DataFrame:
        with open(self.path) as f:
            sql = f.read()
        return self.spark.sql(template(sql, ctx.get("sqlparams", {})))


class JsonlSource:
    """JSON-lines reader (beyond the reference: the lingua franca of
    LLM training-data interchange). Explicit schema recommended at
    scale — inference reads the data twice; `jsonl_options` passes
    through reader options (e.g. multiLine, dropFieldIfAllNull)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __call__(self, ctx) -> DataFrame:
        reader = self.spark.read
        if ctx.get("schema") is not None:
            reader = reader.schema(ctx["schema"])
        for k, v in ctx.get("jsonl_options", {}).items():
            reader = reader.option(k, v)
        return reader.json(ctx["path"])


class JsonlSink:
    """JSON-lines writer (one JSON object per line — the shard format
    most training pipelines ingest). `compression` defaults to gzip;
    pair with `sampling.write_shards` ordering when shard layout
    matters."""

    def __call__(self, df: DataFrame, ctx) -> DataFrame:
        (
            df.write.mode(ctx.get("mode", "overwrite"))
            .option("compression", ctx.get("compression", "gzip"))
            .json(ctx["out_path"])
        )
        return df

    def apply(self, df, ctx):
        return self(df, ctx)


class CSVSink:
    """S6 (Sink.scala:22-46)."""

    def __call__(self, df: DataFrame, ctx) -> DataFrame:
        (
            df.write.mode(ctx.get("mode", "overwrite"))
            .option("header", str(ctx.get("header", True)).lower())
            .csv(ctx["out_path"])
        )
        return df

    def apply(self, df, ctx):
        return self(df, ctx)


class ParquetSink:
    """S7 (Sink.scala:48-63)."""

    def __call__(self, df: DataFrame, ctx) -> DataFrame:
        writer = df.write.mode(ctx.get("mode", "overwrite"))
        if ctx.get("partition_by"):
            writer = writer.partitionBy(ctx["partition_by"])
        writer.parquet(ctx["out_path"])
        return df
