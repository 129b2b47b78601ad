"""SQL transformation surface: inline / named / file-loaded queries
with `$var` templating, delegating wholly to Spark's Catalyst pipeline
(SURVEY.md §3.3 — the framework never touches the SQL AST).

Rebuilds diamond/transform/sql/* and SQLLoader.scala:27-56.
"""

from __future__ import annotations

import configparser
import xml.etree.ElementTree as ET
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from featurestore_spark.functions.templating import template
from featurestore_spark.transform.context import TransformationContext


class SQLLoader:
    """Cached named-query maps from `.properties` / `.xml` files
    (sql/SQLLoader.scala:27-56)."""

    _cache: dict[str, dict[str, str]] = {}

    @classmethod
    def load(cls, path: str) -> dict[str, str]:
        if path in cls._cache:
            return cls._cache[path]
        if path.endswith(".xml"):
            root = ET.parse(path).getroot()
            queries = {
                q.get("name"): (q.text or "").strip()
                for q in root.iter()
                if q.get("name")
            }
        else:  # java .properties style: name=sql (supports line continuations)
            cp = configparser.ConfigParser(interpolation=None)
            with open(path) as f:
                cp.read_string("[q]\n" + f.read())
            queries = dict(cp["q"])
        cls._cache[path] = queries
        return queries

    @classmethod
    def clear_cache(cls):
        cls._cache.clear()


def _params(ctx: TransformationContext | None) -> dict:
    return (ctx or {}).get("sqlparams", {})


class SQLTransformation:
    """Run an inline SQL string with templating
    (sql/SQLTransformation.scala:9-14)."""

    def __init__(self, sql: str):
        self.sql = sql

    def __call__(self, spark: SparkSession, ctx: TransformationContext | None = None) -> DataFrame:
        return spark.sql(template(self.sql, _params(ctx)))


class NamedSQLTransformation:
    """Run a named query from a props/XML file
    (sql/NamedSQLTransformation.scala:13-21)."""

    def __init__(self, path: str, name: str):
        self.path = path
        self.name = name

    def __call__(self, spark: SparkSession, ctx: TransformationContext | None = None) -> DataFrame:
        sql = SQLLoader.load(self.path)[self.name]
        return spark.sql(template(sql, _params(ctx)))


class SQLResourceTransformation:
    """Run SQL loaded from a package resource, with constructor-bound
    params (sql/SQLResourceTransformation.scala:14-25 — the 4th SQL
    runner variant: ships the query inside the library/wheel instead
    of on the filesystem)."""

    def __init__(self, package: str, resource: str, params: dict | None = None):
        self.package = package
        self.resource = resource
        self.params = dict(params or {})

    def __call__(self, spark: SparkSession, ctx: TransformationContext | None = None) -> DataFrame:
        from importlib import resources

        sql = (
            resources.files(self.package).joinpath(self.resource).read_text()
        )
        merged = {**_params(ctx), **self.params}
        return spark.sql(template(sql, merged))


class SQLFileTransformation:
    """Run SQL loaded from a plain file
    (sql/SQLFileTransformation.scala:14-24)."""

    def __init__(self, path: str):
        self.path = path

    def __call__(self, spark: SparkSession, ctx: TransformationContext | None = None) -> DataFrame:
        with open(self.path) as f:
            sql = f.read()
        return spark.sql(template(sql, _params(ctx)))


class SQLTableTransformation:
    """DF→DF via SQL over a registered temp view
    (table/SQLTableTransformation.scala:15-30)."""

    def __init__(self, sql: str, table_name: str, name: str | None = None):
        self.sql = sql
        self.table_name = table_name
        self.name = name or f"sql:{table_name}"
        self.dependencies: list = []

    def __call__(self, df: DataFrame, ctx: TransformationContext | None = None) -> DataFrame:
        df.createOrReplaceTempView(self.table_name)
        return df.sparkSession.sql(template(self.sql, _params(ctx)))


def named_table_transformation(
    path: str, name: str, table_name: str
) -> Callable[[DataFrame, TransformationContext], DataFrame]:
    """NamedSQLTableTransformation (table/NamedSQLTableTransformation.
    scala:17-34): named query applied over the input as a temp view."""

    def fn(df: DataFrame, ctx: TransformationContext | None = None) -> DataFrame:
        sql = SQLLoader.load(path)[name]
        df.createOrReplaceTempView(table_name)
        return df.sparkSession.sql(template(sql, _params(ctx)))

    return fn
