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

import hashlib
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
_WARNED_NO_CATALOG = False


def checkpoint_format() -> str:
    """Requested stage-checkpoint format: ``parquet`` (default) or ``iceberg``."""
    return os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet").strip().lower()


# catalog detection runs a SET scan; one pipeline run writes ~8 checkpoints,
# so cache the result per live session. Weak keys: the entry dies with the
# session object, so a recycled id can never serve a stale answer.
_CATALOG_CACHE: "weakref.WeakKeyDictionary[SparkSession, str | None]" = None  # set below
import weakref  # noqa: E402  (kept next to its single consumer)

_CATALOG_CACHE = weakref.WeakKeyDictionary()


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, or None.

    ``SPARK_GRAFT_ICEBERG_CATALOG`` wins when set; otherwise scan the session
    conf (``SET`` covers both spark-submit --conf and runtime-set keys) for
    ``spark.sql.catalog.<name>`` entries whose implementation class mentions
    Iceberg. The scan result is cached per session object; runtime
    ``spark.conf.set`` changes after the first call are deliberately not
    re-detected mid-run (a half-switched pipeline would checkpoint stages in
    two different backends).
    """
    forced = os.environ.get("SPARK_GRAFT_ICEBERG_CATALOG")
    if forced:
        return forced.strip() or None
    try:
        if spark in _CATALOG_CACHE:
            return _CATALOG_CACHE[spark]
    except TypeError:  # unhashable/unweakrefable session stand-in: skip cache
        spark_key = None
    else:
        spark_key = spark
    found: str | None = None
    try:
        rows = spark.sql("SET").collect()
    except Exception:  # pragma: no cover - SET is always available on 3.x/4.x
        rows = []
    for row in rows:
        conf_key = row["key"]
        if not conf_key.startswith("spark.sql.catalog."):
            continue
        tail = conf_key[len("spark.sql.catalog."):]
        if "." in tail:  # per-catalog option (…<name>.type etc.), not the impl
            continue
        if "iceberg" in (row["value"] or "").lower():
            found = tail
            break
    if spark_key is not None:
        try:
            _CATALOG_CACHE[spark_key] = found
        except TypeError:
            pass
    return found


def table_identifier(catalog: str, path: str) -> str:
    """Deterministic ``catalog.namespace.table`` identifier for a stage path.

    The sanitized full path keeps the name readable; sanitize+lowercase is
    not injective (``run-1`` and ``run_1`` fold together), so a short hash
    of the raw path is appended — distinct output dirs therefore cannot
    collide on one catalog table, and the same path always maps to the
    same identifier (resume-stable).
    """
    name = _SANITIZE.sub("_", path.strip("/")).strip("_").lower() or "stage"
    digest = hashlib.sha1(path.encode("utf-8")).hexdigest()[:8]
    return f"{catalog}.{_NAMESPACE}.{name[:96]}_{digest}"


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
            # one warning per process, not one per checkpoint: a pipeline
            # run writes ~8 checkpoints and the message is identical
            global _WARNED_NO_CATALOG
            if not _WARNED_NO_CATALOG:
                _WARNED_NO_CATALOG = True
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
                # create-if-absent decided by an explicit existence probe:
                # catching the append error instead would turn ANY append
                # failure (schema drift, snapshot conflict) into a
                # createOrReplace that silently discards the prior
                # checkpoint and keeps only the delta
                if df.sparkSession.catalog.tableExists(tbl):
                    writer.append()
                else:
                    writer.create()
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
