"""Skew handling evidence: the salted repartition must spread the 50-100x
document tail so no partition holds a disproportionate byte share — the
property that keeps a 1000-executor stage from stalling on one task."""

import pyspark.sql.functions as F

from pdfextractor_spark.corpus import generate_pages
from pdfextractor_spark.pipeline.bronze import extract_bronze
from pdfextractor_spark.pipeline.lineage import stage_lineage
from pdfextractor_spark.pipeline.schema import PAGES_SCHEMA


def test_salted_repartition_spreads_skew_tail(spark):
    # 808 docs -> 8 skew docs (i % 101 == 7), each 50-100x median size
    pages = spark.createDataFrame(generate_pages(808), schema=PAGES_SCHEMA)
    n_parts = 16
    bronze = extract_bronze(pages, num_partitions=n_parts)
    lin = stage_lineage(bronze, stage="bronze").collect()
    bytes_per = sorted(r["bytes"] for r in lin)
    assert len(bytes_per) == n_parts
    total = sum(bytes_per)
    # skew docs are ~60% of total corpus bytes; with xxhash64(url) salting
    # they spread across partitions: the heaviest partition must stay well
    # under the all-in-one-partition failure mode
    assert max(bytes_per) < 0.35 * total, bytes_per
    # and every partition got a meaningful share of documents
    docs_per = [r["doc_count"] for r in lin]
    assert min(docs_per) >= (808 // n_parts) * 0.5


def test_arrow_batch_autosizes_for_huge_docs(spark):
    """Multi-MB documents must shrink the Arrow batch row count at runtime:
    1024 rows x 10 MB would be a ~10 GB in-flight batch (the executor-OOM
    mode on a mixed 100 TB corpus). The pipeline probes payload size and
    retargets ~64 MB per batch; the job must complete at DEFAULT settings."""
    from pdfextractor_spark.pipeline.fused import extract_fused

    # ~10 MB html payloads: distinct punctuation-free paragraphs (one
    # sentence part per block line so structuring stays linear; distinct so
    # the content extractor's duplicate-block dedupe keeps them all)
    body = "".join(
        f"<p>block {k} " + ("filler words for arrow batch sizing " * 33) + "</p>"
        for k in range(8200)
    )  # ~10.5 MB
    rows = [
        {"url": f"https://example.org/huge-{i}", "warc_ts": None,
         "html": ("<html><body>" + body + "</body></html>").encode(),
         "text": None, "lang": "en"}
        for i in range(6)
    ]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    silver = extract_fused(pages, num_partitions=4)
    out = silver.select("url", "error", "n_chars").collect()
    assert len(out) == 6 and all(r["error"] is None for r in out)
    assert all(r["n_chars"] > 5_000_000 for r in out)
    # the probe must have lowered the batch ceiling far below the default
    chosen = int(spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch"))
    assert chosen <= 16, chosen
    # restore the session default for subsequent tests
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")


def test_arrow_probe_memoized_per_source(spark, tmp_path):
    """The batch-size probe is a per-TABLE tuning decision: two stages over
    the same source must share one probe job (the probe otherwise shows up
    as fixed per-job overhead in repeated-run throughput measurements)."""
    import time

    from pdfextractor_spark.pipeline.arrowtune import _PROBE_CACHE, autosize_arrow_batch

    path = str(tmp_path / "pages.parquet")
    pages = spark.createDataFrame(generate_pages(64), schema=PAGES_SCHEMA)
    pages.write.parquet(path)
    _PROBE_CACHE.clear()
    r1 = autosize_arrow_batch(spark.read.parquet(path), ["html", "text"])
    t0 = time.perf_counter()
    r2 = autosize_arrow_batch(spark.read.parquet(path), ["html", "text"])
    cached_sec = time.perf_counter() - t0
    assert r1 == r2 and len(_PROBE_CACHE) == 1
    assert cached_sec < 0.5  # dict probe, no Spark job
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")


def test_unsalted_input_order_would_clump(spark):
    """Control: partitioning by input order (no salt) leaves the skew tail
    clumped when skewed docs are adjacent — demonstrating why the pipeline
    repartitions by url hash rather than trusting source order."""
    rows = generate_pages(808)
    # adversarial source order: all skew docs first (mirrors a crawl dump
    # where one host's huge pages arrive together)
    rows.sort(key=lambda r: -len(r["html"] or b""))
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    n_parts = 16
    # coalesce-style split over input order
    by_order = pages.rdd.map(lambda r: len(r["html"] or b"")).glom().map(
        lambda p: sum(p)
    ).collect()
    salted = extract_bronze(pages, num_partitions=n_parts)
    lin = stage_lineage(salted, stage="x").collect()
    salted_max_share = max(r["bytes"] for r in lin) / max(sum(r["bytes"] for r in lin), 1)
    order_max_share = max(by_order) / max(sum(by_order), 1)
    # salting must beat input-order partitioning on the adversarial layout
    assert salted_max_share < order_max_share
