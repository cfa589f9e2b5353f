"""Table-format dispatch for checkpointed stage writes (Iceberg or parquet).

The north-rule target is an Iceberg lakehouse: every medallion stage commits
an atomic table snapshot so a resumed job sees either the whole stage or none
of it, and concurrent readers never observe a half-written directory. This
sandbox ships no Iceberg runtime jar, so the dispatch is configuration-driven:

* When an Iceberg catalog is configured on the session
  (``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog`` —
  detected from the session conf, or forced via
  ``SPARK_GRAFT_ICEBERG_CATALOG``), stage writes go through the
  DataFrameWriterV2 snapshot path: ``df.writeTo(cat.ns.table)
  .using("iceberg").createOrReplace()`` for a fresh stage and
  ``.append()`` for a resume delta. Reads come back via ``spark.table``.
* Otherwise the same layout lands in parquet directories (atomicity
  degraded to the _SUCCESS-marker protocol), which is what every test in
  this repo exercises.

Checkpoint references returned by :func:`write_checkpoint` are ``(kind,
target)`` pairs so callers never re-derive the storage location; pass them
to :func:`read_checkpoint`.

Ref semantics: the reference persists per-chunk JSON state files
(backend/scripts/chunked_mdeq_extraction.js:107-166); an Iceberg snapshot
per stage is the table-native equivalent of its "whole chunk or nothing"
checkpoint contract.
"""

from __future__ import annotations

import os
import re
import warnings

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "iceberg_catalog",
    "table_identifier",
    "checkpoint_format",
    "write_checkpoint",
    "read_checkpoint",
]

_NAMESPACE = "graft"
_SANITIZE = re.compile(r"[^A-Za-z0-9_]+")


def checkpoint_format() -> str:
    """Requested stage-checkpoint format: ``parquet`` (default) or ``iceberg``."""
    return os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet").strip().lower()


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, or None.

    ``SPARK_GRAFT_ICEBERG_CATALOG`` wins when set; otherwise scan the session
    conf (``SET`` covers both spark-submit --conf and runtime-set keys) for
    ``spark.sql.catalog.<name>`` entries whose implementation class mentions
    Iceberg.
    """
    forced = os.environ.get("SPARK_GRAFT_ICEBERG_CATALOG")
    if forced:
        return forced.strip() or None
    try:
        rows = spark.sql("SET").collect()
    except Exception:  # pragma: no cover - SET is always available on 3.x/4.x
        return None
    for row in rows:
        key = row["key"]
        if not key.startswith("spark.sql.catalog."):
            continue
        tail = key[len("spark.sql.catalog."):]
        if "." in tail:  # per-catalog option (…<name>.type etc.), not the impl
            continue
        if "iceberg" in (row["value"] or "").lower():
            return tail
    return None


def table_identifier(catalog: str, path: str) -> str:
    """Deterministic ``catalog.namespace.table`` identifier for a stage path.

    The full path (not just the basename) is folded into the table name so
    two pipelines with distinct output dirs can never collide in the catalog.
    """
    name = _SANITIZE.sub("_", path.strip("/")).strip("_").lower() or "stage"
    return f"{catalog}.{_NAMESPACE}.{name}"


def write_checkpoint(df: DataFrame, path: str, mode: str = "overwrite",
                     fmt: str | None = None) -> tuple[str, str]:
    """Write one stage checkpoint; returns a ``(kind, target)`` reference.

    ``kind`` is ``"table"`` (Iceberg snapshot commit) or ``"path"`` (parquet
    directory). ``mode`` is ``overwrite`` (fresh stage) or ``append``
    (resume delta; on Iceberg this is a second snapshot on the same table,
    so time travel across resume boundaries comes for free).
    """
    fmt = (fmt or checkpoint_format())
    if fmt == "iceberg":
        cat = iceberg_catalog(df.sparkSession)
        if cat is None:
            warnings.warn(
                "SPARK_GRAFT_TABLE_FORMAT=iceberg but no Iceberg catalog is "
                f"configured on the session; writing parquet at {path} instead",
                stacklevel=2,
            )
        else:
            tbl = table_identifier(cat, path)
            try:  # namespaces are cheap to ensure and required by createOrReplace
                df.sparkSession.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.{_NAMESPACE}")
            except Exception:
                pass
            writer = df.writeTo(tbl).using("iceberg")
            if mode == "append":
                try:
                    writer.append()
                except Exception:  # first delta against a not-yet-created table
                    writer.createOrReplace()
            else:
                writer.createOrReplace()
            return ("table", tbl)
    elif fmt != "parquet":
        raise ValueError(f"unknown checkpoint format {fmt!r} (parquet|iceberg)")
    df.write.mode(mode).parquet(path)
    return ("path", path)


def read_checkpoint(spark: SparkSession, ref: tuple[str, str]) -> DataFrame:
    """Load a checkpoint written by :func:`write_checkpoint`."""
    kind, target = ref
    if kind == "table":
        return spark.table(target)
    return spark.read.parquet(target)
