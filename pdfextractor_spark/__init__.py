"""pdfextractor_spark — a PySpark-native document-extraction analytics engine.

A brand-new implementation (NOT a port) with the query/data-processing
capabilities of the reference PDF-extraction pipeline (Timbermitch/PDFExtractor,
studied read-only at /root/reference): medallion bronze -> silver -> gold over a
Common-Crawl-style ``pages`` table ``(url, warc_ts, html binary, text, lang)``.

Layout:
- ``extraction/``  pure-Python per-document semantics (runs inside Arrow UDF batches)
- ``sources/``     payload decoders: PDF content-stream text, HTML boilerplate strip
- ``pipeline/``    Spark DataFrame stages: bronze, silver, gold, lineage/resume
- ``ops/``         corpus-scale ops: dedup (exact/minhash/simhash), ANN, text stats
"""

__version__ = "0.1.0"
