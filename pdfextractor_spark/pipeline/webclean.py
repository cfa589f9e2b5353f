"""Training-corpus preparation: the end-to-end composition of the crawl
cleaning operators over a Common-Crawl-style pages table.

Every stage exists as a standalone operator (``ops/urls.py``,
``ops/cleaning.py``, ``ops/textstats.py``); this module fixes the order
a 100 TB preparation run wants and the reasons for it:

 1. canonical-URL dedup       — cheapest removal first: collapsing url
                                spellings shrinks every later stage by
                                the crawl's duplication factor before
                                any document text is even extracted
 2. main-content extraction   — html/pdf bytes -> text (the bronze Arrow
                                UDF; skipped when the table already
                                carries extracted text)
 3. C4 heuristic cleaning     — map-only line filters + page flags,
                                fused by Catalyst into the same stage
 4. Gopher repetition flags   — judged on the page AS CRAWLED, before
                                line-dedup can collapse spam repeats
 5. corpus duplicate-line removal — shared boilerplate lines vanish
                                before they can skew the content hashes
    then token counts + quality score over the text that ships
 6. exact content dedup       — keep the highest-quality copy per
                                normalized fingerprint (one window)
 7. benchmark decontamination — broadcast join against eval 13-grams
 8. PII redaction             — map-only regexp chain
 9. per-host cap              — LAST, ordered by quality score, so the
                                cap keeps each site's best surviving
                                pages (skew-safe two-phase window)

Optional selection/assembly stages (off by default) extend the tail:
learned-BPE token budgets (``bpe_merges``), an NB quality-classifier
gate (``nb_filter``), SemDeDup semantic dedup over a document-embedding
column (``semdedup``), DSIR importance resampling against a trusted
target corpus (``dsir``), and greedy packing into fixed-token training
shards (``shard_budget``) — see ``prepare_training_corpus``.

The frame returned with ``filter_rows=False`` carries every flag plus
the combined ``keep`` column; ``prep_report`` rolls the removal
accounting into ONE aggregation pass over it. With ``filter_rows=True``
(default) only rows with ``keep`` survive — dedup stages (1, 4, 6)
remove rows/lines either way, since duplication is not a judgment call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["prepare_training_corpus", "prep_report"]

# flag columns with_url_quality attaches (dropped after a hard gate)
_URL_QUALITY_COLS = ("url_len", "host_digit_frac", "host_hyphens",
                     "path_depth", "n_query_params", "url_spam_token",
                     "url_quality_ok")


def _row_id(url_col: str, text_col: str, as_string: bool = False):
    """The pipeline's row identity: (url, xxhash64(text)). Row-unique
    whenever no two rows share BOTH url and full text bytes (the stages
    below collapse exact (url, text) copies first). One definition for
    every stage that needs a doc key — the dedup regroup (``_ddid``),
    the semantic-dedup verdict join (``_sdid``, string form: a struct id
    reaches the grouped pandas stage as unsortable dicts), and the
    selection scoring id (``_wcid``)."""
    h = F.xxhash64(F.coalesce(F.col(text_col), F.lit("")))
    if as_string:
        return F.concat_ws("#", F.col(url_col), h.cast("string"))
    return F.struct(F.col(url_col), h)


def _perdoc_stages(pages: DataFrame, *, extract: bool | None, url_col: str,
                   ts_col: str, text_col: str, robots: tuple | None,
                   badwords: list[str] | None, filter_rows: bool,
                   canonical_hint_col: str | None = None,
                   extract_mode: str = "default",
                   unicode_form: str | None = None,
                   url_quality: dict | None = None) -> DataFrame:
    """Stages 1-4: the PER-DOCUMENT prefix of the pipeline (url dedup,
    robots gate, extraction, C4 cleaning, Gopher repetition). Every
    transformation here is keyed by the document row, which is what makes
    the prefix checkpoint-resumable by url anti-join (pipeline.webrunner);
    everything after it is corpus-global."""
    df = pages
    if ts_col and ts_col in df.columns:
        from ..ops.urls import url_dedup
        df = url_dedup(df, url_col=url_col, ts_col=ts_col,
                       hint_col=(canonical_hint_col
                                 if canonical_hint_col in df.columns
                                 else None))
    if url_quality is not None and filter_rows:
        # cheapest gate first: URL spam/trap heuristics need zero page
        # bytes, so a failing page spends neither the robots join nor
        # extraction (hard removal; the flag variant below survives)
        from ..ops.urls import with_url_quality
        df = with_url_quality(df, url_col=url_col, **url_quality) \
            .where("url_quality_ok").drop(*_URL_QUALITY_COLS)
    if robots is not None and filter_rows:
        # politeness gate runs FIRST after url dedup: a disallowed page
        # must not spend extraction/cleaning compute (hard removal here;
        # the flag variant below survives for accounting runs)
        from ..ops.robots import robots_filter
        df = robots_filter(df, robots[0], robots[1], url_col=url_col) \
            .where("robots_allowed").drop("robots_allowed")
    if extract is None:
        extract = "html" in df.columns
    if extract:
        from .bronze import extract_bronze
        df = extract_bronze(df, html_mode=extract_mode) \
            .withColumnRenamed("raw_text", text_col)
    if robots is not None and not filter_rows:
        # flag-only run: compute AFTER extraction (the bronze UDF projects
        # its own schema and would drop the flag) so `keep` can report it
        from ..ops.robots import robots_filter
        df = robots_filter(df, robots[0], robots[1], url_col=url_col)
    if url_quality is not None and not filter_rows:
        from ..ops.urls import with_url_quality
        df = with_url_quality(df, url_col=url_col, **url_quality)
    from ..ops.cleaning import c4_clean
    from ..ops.textstats import with_repetition
    if unicode_form is not None:
        # FIRST among text rewrites: every downstream hash (exact dedup,
        # line/span n-grams, decontamination) must see one spelling per
        # rendered string
        from ..ops.cleaning import normalize_unicode
        df = normalize_unicode(df, text_col=text_col, form=unicode_form)
    df = c4_clean(df, text_col=text_col, badwords=badwords)
    # repetition is a judgment on the page AS CRAWLED — measure it before
    # line-dedup collapses a spam page's repeats into one innocuous line
    return with_repetition(df, text_col)


def prepare_training_corpus(
    pages: DataFrame, *,
    extract: bool | None = None,
    extract_mode: str = "default",
    unicode_form: str | None = None,
    url_col: str = "url", ts_col: str = "warc_ts", text_col: str = "text",
    canonical_hint_col: str | None = None,
    benchmark: DataFrame | None = None,
    robots: tuple | None = None,
    badwords: list[str] | None = None,
    url_quality: dict | None = None,
    host_boilerplate: dict | None = None,
    dup_line_min_count: int | None = 2,
    dedup_span_width: int | None = None,
    quality_floor: float | None = None,
    compression_band: tuple[float, float] | None = None,
    max_docs_per_host: int | None = None,
    redact: bool = True,
    filter_rows: bool = True,
    bpe_merges: list | None = None,
    nb_filter: dict | None = None,
    langid: dict | None = None,
    semdedup: dict | None = None,
    dsir: dict | None = None,
    shard_budget: int | None = None,
) -> DataFrame:
    """pages (url, warc_ts, html, text, lang) -> cleaned training docs.

    ``extract=None`` auto-detects: the bronze extraction UDF runs when an
    ``html`` column is present. ``extract_mode`` picks the boilerplate
    classifier: ``default`` (link-density + length) or ``density``
    (boilerpipe NumWordsRules — context-aware, recall-leaning).
    ``unicode_form`` (e.g. ``"NFC"``) canonicalizes the extracted text
    FIRST among the text rewrites (``ops.cleaning.normalize_unicode``),
    so every downstream hash — exact dedup, line/span dedup n-grams,
    decontamination — sees one spelling per rendered string; ``None``
    (default) skips the stage. ``benchmark`` is a DataFrame with a text
    column (eval suite) for decontamination; ``None`` skips that stage.
    ``robots`` is ``(robots_df, agent)`` — a (host, robots_txt) table +
    the crawler's user-agent; pages the agent may not fetch get
    ``robots_allowed = false`` and fold into ``keep``.

    ``canonical_hint_col`` names a page-declared ``rel=canonical``
    column (``ops.pagemeta.with_page_meta`` extracts one): the url-dedup
    stage then folds same-host declared duplicates under their canonical
    target (``ops.urls.resolve_canonical_hint``) — duplication no
    spelling rule can see, at zero extra shuffles. Ignored when the
    column is absent or ``ts_col`` is missing (no url-dedup stage).

    Optional selection/assembly stages (all default off):

    - ``url_quality``: kwargs for ``ops.urls.with_url_quality`` (``{}``
      for the defaults) — the zero-page-bytes URL spam/trap gate, run
      FIRST (before even the robots join) with ``filter_rows=True``;
      flag-only runs attach the flags after extraction and fold
      ``url_quality_ok`` into ``keep``.
    - ``host_boilerplate``: ``{"min_docs": 2, "min_frac": 0.5}`` —
      per-HOST template-line removal (``ops.cleaning.
      strip_host_boilerplate``, the CCNet/RefinedWeb intra-site pass)
      runs right BEFORE the corpus-global line dedup: site chrome a
      global min_count can't see (a 40-page site's footer) is removed
      host-scoped, and the global pass then covers genuine cross-site
      duplication. Adds ``host_boilerplate_lines_dropped``.
    - ``dedup_span_width``: corpus-level EXACT-SUBSTRING dedup
      (``ops.cleaning.dedup_spans``, Lee et al. 2021) at this token
      width, applied right after line dedup so boilerplate lines are
      already gone and window hashes cover genuine long-form reuse.
    - ``compression_band``: ``(low, high)`` — per-document zlib
      compression-ratio gate (``ops.textstats.with_compression_ratio``,
      the RedPajama-v2/Dolma signal): docs compressing below ``low``
      (templated/machine text) or above ``high`` (high-entropy junk)
      lose their ``keep``. Judged on the text that ships (after line
      dedup), map-only.
    - ``bpe_merges``: a merge list from ``ops.bpe.train_bpe`` — adds a
      real learned ``bpe_tokens`` count next to the ``ws_tokens`` proxy
      (map-only broadcast encode).
    - ``nb_filter``: ``{"model": ..., "priors": ..., "keep_labels":
      {...}, "n": 1, "buckets": 10_000}`` with model/priors from
      ``ops.selection.train_nb`` — scores every doc (adds
      ``pred_label``) and, when ``keep_labels`` is non-empty, folds
      ``pred_label IN keep_labels`` into ``keep``. ``n``/``buckets``
      MUST match the values the model was trained with (bucket ids are
      hashes mod ``buckets``; a mismatch silently floors every lookup).
    - ``langid``: ``{"model": ..., "priors": ..., "keep_langs": {...},
      "ns": (1, 2, 3), "buckets": 4096, "max_chars": 2000}`` with
      model/priors from ``ops.langid.train_langid`` — attaches the
      trained char-n-gram prediction as ``lang_nb`` (the scale path
      next to the stopword-vote ``lang`` column a pages table may
      carry) and, when ``keep_langs`` is non-empty, folds
      ``lang_nb IN keep_langs`` into ``keep`` (null prediction =
      dropped, matching the NB gate's null-safe rule). ``ns``/
      ``buckets``/``max_chars`` MUST match training.
    - ``semdedup``: ``{"vec_col": "embedding", "num_centroids": 16,
      "threshold": 0.95, ...}`` (remaining keys pass through to
      ``ops.semdedup.semdedup``) — SemDeDup semantic dedup over a
      document-embedding column the pages table carries. Runs AFTER the
      exact content dedup (byte-duplicates must not waste clustering
      work) and folds ``semdedup_keep`` into ``keep``; rows with a null
      embedding are never semantically dropped.
    - ``dsir``: ``{"target": DataFrame, "k": int, "n": 2, "buckets":
      10_000}`` — DSIR selection AFTER all cleaning: the source LM is
      trained on the surviving pool itself (the published setup), the
      target LM on the supplied trusted corpus, and the pool is
      Gumbel-top-k resampled down to ``k`` docs.
    - ``shard_budget``: greedy-pack the final docs into training shards
      of ~this many tokens (``bpe_tokens`` when available, else
      ``ws_tokens``), adding ``shard_id``.

    ``dsir`` and ``shard_budget`` are selection/assembly stages that
    physically drop and regroup rows, so they run only with
    ``filter_rows=True``; a ``filter_rows=False`` accounting run returns
    the flagged frame before them.
    """
    df = _perdoc_stages(pages, extract=extract, url_col=url_col,
                        ts_col=ts_col, text_col=text_col, robots=robots,
                        badwords=badwords, filter_rows=filter_rows,
                        canonical_hint_col=canonical_hint_col,
                        extract_mode=extract_mode,
                        unicode_form=unicode_form, url_quality=url_quality)
    df = _flag_stages(df, url_col=url_col, text_col=text_col,
                      benchmark=benchmark, robots_flagged=(
                          robots is not None and not filter_rows),
                      url_flagged=(url_quality is not None
                                   and not filter_rows),
                      host_boilerplate=host_boilerplate,
                      dup_line_min_count=dup_line_min_count,
                      dedup_span_width=dedup_span_width,
                      quality_floor=quality_floor,
                      compression_band=compression_band, redact=redact,
                      bpe_merges=bpe_merges, nb_filter=nb_filter,
                      langid_cfg=langid, semdedup_cfg=semdedup,
                      want_wcid=(nb_filter is not None or dsir is not None
                                 or langid is not None))
    if filter_rows:
        return _select_stages(df, url_col=url_col, text_col=text_col,
                              max_docs_per_host=max_docs_per_host,
                              bpe_merges=bpe_merges, dsir=dsir,
                              shard_budget=shard_budget)
    # flag-only accounting run: keep every row + every flag; the host cap
    # still applies (duplication is not a judgment call), selection and
    # assembly do not (see _select_stages)
    if max_docs_per_host:
        from ..ops.urls import cap_per_host
        df = cap_per_host(df, max_docs_per_host, url_col=url_col,
                          order_col="quality_score")
    return df.drop("_wcid")


def _flag_stages(df: DataFrame, *, url_col: str, text_col: str,
                 benchmark: DataFrame | None, robots_flagged: bool,
                 url_flagged: bool = False,
                 host_boilerplate: dict | None,
                 dup_line_min_count: int | None, dedup_span_width: int | None,
                 quality_floor: float | None,
                 compression_band: tuple[float, float] | None,
                 redact: bool, bpe_merges: list | None, nb_filter: dict | None,
                 semdedup_cfg: dict | None, want_wcid: bool,
                 langid_cfg: dict | None = None) -> DataFrame:
    """Stages 5-11: the CORPUS-GLOBAL cleaning stages (line dedup, quality
    stats, exact content dedup, decontamination, PII, NB gate) ending in
    the combined ``keep`` flag column — rows are NOT dropped here, so the
    output feeds both ``prep_report`` accounting and the selection pass."""
    from ..ops.cleaning import contamination_check, dedup_lines, redact_pii
    from ..ops.textstats import with_quality, with_token_count

    if dup_line_min_count or dedup_span_width or host_boilerplate is not None:
        # ROW-distinct dedup id: urls need not be unique here (ts_col
        # absent skips url_dedup), and keying the per-doc drop-set
        # regroup on a duplicated url would merge drop sets across
        # DISTINCT documents and delete the wrong lines/tokens from
        # both. Computed once, BEFORE any rewrite, so both stages key
        # on the same opaque id.
        df = df.withColumn("_ddid", _row_id(url_col, text_col))
        # ... and the id must then actually BE row-distinct: two
        # byte-identical (url, text) rows sharing one id would
        # SELF-ANNIHILATE under keep='first' — each window of the doc
        # counts twice, the rank-2 occurrence puts every start into the
        # SHARED drop set, and the join-back empties BOTH copies where
        # keep-first promises one survivor. Collapse exact copies here
        # (one row survives with its text intact — the same row the
        # exact content dedup below would keep anyway; dedup stages drop
        # rows even in flag-only runs, duplication is not a judgment
        # call). Costs one exchange of the doc rows, which the dedup
        # stages' own drop-set join-back was already liable to pay.
        df = df.dropDuplicates(["_ddid"])
    if host_boilerplate is not None:
        # per-HOST template chrome first: removing a site's nav/footer
        # host-scoped keeps the corpus-global pass below about genuine
        # cross-site duplication (a small site's footer never clears a
        # realistic global min_count, but is 100% of that site's pages)
        from ..ops.cleaning import strip_host_boilerplate
        df = strip_host_boilerplate(df, doc_id="_ddid", url_col=url_col,
                                    text_col=text_col, **host_boilerplate)
    if dup_line_min_count:
        df = dedup_lines(df, doc_id="_ddid", text_col=text_col,
                         min_count=dup_line_min_count)
    if dedup_span_width:
        # exact-substring dedup AFTER line dedup: boilerplate lines are
        # already gone, so window hashes cover genuine long-form reuse
        from ..ops.cleaning import dedup_spans
        df = dedup_spans(df, doc_id="_ddid", text_col=text_col,
                         width=dedup_span_width)
    if "_ddid" in df.columns:
        df = df.drop("_ddid")
    # token/quality signals describe the text that would actually ship
    df = with_quality(with_token_count(df, text_col), text_col)
    if compression_band is not None:
        from ..ops.textstats import with_compression_ratio
        df = with_compression_ratio(df, text_col,
                                    low=compression_band[0],
                                    high=compression_band[1])
    if bpe_merges is not None:
        from ..ops.bpe import apply_bpe
        df = apply_bpe(df, bpe_merges, text_col=text_col)
    # exact content dedup: best copy per normalized fingerprint. The
    # keep-class is Unicode letters/digits, NOT [a-z0-9]: an ASCII-only
    # class erases every non-Latin script, so distinct CJK/Arabic docs
    # sharing one Latin boilerplate tail would collapse as "copies"
    # (round-5 fix, same class as ops/textstats.with_fingerprint)
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                         r"[^\p{L}\p{Nd} ]", " "), r"\s+", " "))
    w = Window.partitionBy(F.md5(norm)).orderBy(
        F.col("quality_score").desc(), F.col(url_col))
    df = df.withColumn("_rn", F.row_number().over(w)) \
        .where(F.col("_rn") == 1).drop("_rn")
    if semdedup_cfg is not None:
        # semantic dedup AFTER exact content dedup: byte-duplicates are
        # already gone, so clustering work is spent only on distinct
        # documents. The verdict id is (url # text-hash) — row-unique
        # among the exact-dedup survivors and sortable inside the
        # grouped numpy stage (a struct id would reach pandas as dicts).
        from ..ops.semdedup import semdedup as _semdedup
        cfg = dict(semdedup_cfg)
        vec_col = cfg.pop("vec_col", "embedding")
        sid = _row_id(url_col, text_col, as_string=True)
        # a null embedding — or one with a null COMPONENT (a partial
        # upstream join) — is unclusterable: excluded here, kept below
        emb_in = (df.withColumn("_sdid", sid)
                  .where(F.col(vec_col).isNotNull()
                         & ~F.exists(vec_col, lambda x: x.isNull()))
                  .select("_sdid", vec_col)
                  # id+vector only; reused by the quantizer fit, the
                  # assignment pass, and the size census — without this
                  # the whole cleaning lineage above re-executes per use
                  .persist())
        if emb_in.isEmpty():
            # nothing clusterable (KMeans.fit rejects an empty dataset)
            df = df.withColumn("semdedup_keep", F.lit(True))
        else:
            verdicts = _semdedup(emb_in, id_col="_sdid", vec_col=vec_col,
                                 **cfg).select("_sdid", "semdedup_keep")
            df = (df.withColumn("_sdid", sid)
                  .join(verdicts, "_sdid", "left")
                  # null embedding -> never semantically dropped
                  .withColumn("semdedup_keep",
                              F.coalesce(F.col("semdedup_keep"), F.lit(True)))
                  .drop("_sdid"))
    if benchmark is not None:
        df = contamination_check(df, benchmark, doc_id=url_col, text_col=text_col)
    else:
        df = df.withColumn("is_contaminated", F.lit(False))
    if redact:
        df = redact_pii(df, text_col=text_col)
    if want_wcid:
        # ROW-unique scoring id: urls need not be unique here (ts_col
        # absent skips url_dedup), and a duplicate key would let
        # score_nb's per-id groupBy merge features across distinct
        # documents and dsir_resample's semi-join fan back out past k.
        # The content dedup above leaves normalized text globally unique
        # among survivors, so (url, text-hash) is row-unique; it is also
        # deterministic under any partitioning (monotonically_increasing_id
        # is not).
        df = df.withColumn("_wcid", _row_id(url_col, text_col))
    if nb_filter is not None:
        from ..ops.selection import score_nb
        scored = score_nb(
            df, nb_filter["model"], nb_filter["priors"], id_col="_wcid",
            text_col=text_col, n=nb_filter.get("n", 1),
            buckets=nb_filter.get("buckets", 10_000),
        ).select(F.col("id").alias("_wcid"), "pred_label")
        df = df.join(scored, "_wcid", "left")
    if langid_cfg is not None:
        # trained char-n-gram lang-ID (ops/langid.py): same broadcast-
        # model/id-agg shape as the NB gate above, sharing _wcid
        from ..ops.langid import score_langid
        lang_scored = score_langid(
            df, langid_cfg["model"], langid_cfg["priors"], id_col="_wcid",
            text_col=text_col, ns=langid_cfg.get("ns", (1, 2, 3)),
            buckets=langid_cfg.get("buckets", 4096),
            max_chars=langid_cfg.get("max_chars", 2000),
        ).select(F.col("id").alias("_wcid"),
                 F.col("pred_label").alias("lang_nb"))
        df = df.join(lang_scored, "_wcid", "left")
    keep = (F.col("c4_keep") & ~F.col("repetition_flag")
            & ~F.col("is_contaminated")
            & (F.length(F.coalesce(F.col(text_col), F.lit(""))) > 0))
    if semdedup_cfg is not None:
        keep = keep & F.col("semdedup_keep")
    if robots_flagged:
        keep = keep & F.col("robots_allowed")
    if url_flagged:
        keep = keep & F.col("url_quality_ok")
    if nb_filter is not None and nb_filter.get("keep_labels"):
        # null-safe: a featureless doc has pred_label null; isin(null) is
        # null and a null keep would be neither kept nor counted dropped
        keep = keep & F.coalesce(
            F.col("pred_label").isin(list(nb_filter["keep_labels"])),
            F.lit(False))
    if langid_cfg is not None and langid_cfg.get("keep_langs"):
        keep = keep & F.coalesce(
            F.col("lang_nb").isin(list(langid_cfg["keep_langs"])),
            F.lit(False))
    if "error" in df.columns:
        keep = keep & F.col("error").isNull()
    if quality_floor is not None:
        keep = keep & (F.col("quality_score") >= quality_floor)
    if compression_band is not None:
        keep = keep & ~F.col("compression_flag")
    return df.withColumn("keep", keep)


def _select_stages(df: DataFrame, *, url_col: str, text_col: str,
                   max_docs_per_host: int | None, bpe_merges: list | None,
                   dsir: dict | None, shard_budget: int | None) -> DataFrame:
    """Stages 12-14: SELECTION/ASSEMBLY over a flagged frame — drop
    keep=false rows, apply the per-host cap, DSIR-resample against the
    trusted target, pack training shards. These physically drop and
    regroup rows, which contradicts a flag-only accounting run (and
    would train the DSIR source LM on keep=false junk), so the
    accounting path never enters here."""
    from ..ops.urls import cap_per_host

    df = df.where("keep").drop("keep")
    if max_docs_per_host:
        df = cap_per_host(df, max_docs_per_host, url_col=url_col,
                          order_col="quality_score")
    if dsir is not None:
        from ..ops.selection import dsir_resample, dsir_weights, train_hashed_lm
        n = dsir.get("n", 2)
        buckets = dsir.get("buckets", 10_000)
        tgt = train_hashed_lm(dsir["target"], text_col=dsir.get("target_text_col", "text"),
                              n=n, buckets=buckets)
        src = train_hashed_lm(df, text_col=text_col, n=n, buckets=buckets)
        w = dsir_weights(df, tgt, src, id_col="_wcid", text_col=text_col,
                         n=n, buckets=buckets)
        df = dsir_resample(df, w, dsir["k"], id_col="_wcid",
                           seed=dsir.get("seed", 17))
    if "_wcid" in df.columns:
        df = df.drop("_wcid")
    if shard_budget:
        from ..ops.sampling import pack_shards
        tokens_col = "bpe_tokens" if bpe_merges is not None else "ws_tokens"
        df = pack_shards(df, tokens_col, shard_budget, id_col=url_col)
    return df


def prep_report(flagged: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row removal accounting over a ``filter_rows=False`` result —
    a single aggregation pass (reason counts are non-exclusive)."""
    def _n(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    # optional-stage columns: a skipped stage (e.g. dup_line_min_count=None)
    # never added its accounting column — report 0 dropped, not an
    # AnalysisException
    dedup_dropped = (F.col("dedup_lines_dropped")
                     if "dedup_lines_dropped" in flagged.columns
                     else F.lit(0))
    span_dropped = (F.col("dedup_span_tokens_dropped")
                    if "dedup_span_tokens_dropped" in flagged.columns
                    else F.lit(0))
    host_tpl_dropped = (F.col("host_boilerplate_lines_dropped")
                        if "host_boilerplate_lines_dropped" in flagged.columns
                        else F.lit(0))
    pii_total = (F.col("pii_total") if "pii_total" in flagged.columns
                 else F.lit(0))
    sem_dropped = (~F.col("semdedup_keep")
                   if "semdedup_keep" in flagged.columns else F.lit(False))
    comp_dropped = (F.col("compression_flag")
                    if "compression_flag" in flagged.columns else F.lit(False))
    return flagged.agg(
        F.count(F.lit(1)).alias("docs_in"),
        _n(F.col("keep")).alias("docs_kept"),
        _n(~F.col("c4_keep")).alias("dropped_c4"),
        _n(F.col("repetition_flag")).alias("dropped_repetition"),
        _n(F.col("is_contaminated")).alias("dropped_contaminated"),
        _n(sem_dropped).alias("dropped_semantic"),
        _n(comp_dropped).alias("dropped_compression"),
        _n(F.length(F.coalesce(F.col(text_col), F.lit(""))) == 0)
            .alias("dropped_empty"),
        F.sum(F.when(F.col("keep"), F.col("ws_tokens")).otherwise(0))
            .cast("long").alias("tokens_kept"),
        F.sum(dedup_dropped).cast("long").alias("boilerplate_lines_dropped"),
        F.sum(host_tpl_dropped).cast("long").alias("host_template_lines_dropped"),
        F.sum(span_dropped).cast("long").alias("dup_span_tokens_dropped"),
        F.sum(F.when(F.col("keep"), pii_total).otherwise(0))
            .cast("long").alias("pii_redactions_kept_docs"),
    )
