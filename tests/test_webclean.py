"""End-to-end training-corpus preparation (pipeline/webclean.py)."""

import datetime as dt

import pyspark.sql.functions as F

_TS = dt.datetime(2024, 1, 1)
_BOILER = "Subscribe to our newsletter today, please."
_GOOD = ("This page talks about watershed planning in detail. "
         "It has several informative sentences for the reader. "
         "Each one ends with proper punctuation marks. "
         "The content is unique and not repetitive at all. "
         "A fifth sentence keeps the C4 gate satisfied.")
_BENCH13 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike"


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string")


def test_prepare_training_corpus_stages(spark):
    from pdfextractor_spark.pipeline.webclean import (prep_report,
                                                      prepare_training_corpus)

    rows = [
        # two spellings of one url: canonical dedup keeps the later ts
        ("https://www.sitea.com/x", _TS, None, f"{_BOILER}\n{_GOOD}", "en"),
        ("https://sitea.com/x", _TS + dt.timedelta(days=1), None,
         f"{_BOILER}\n{_GOOD}", "en"),
        # shares the boilerplate line -> line dedup strips one copy
        ("https://siteb.org/y", _TS, None, f"{_BOILER}\n{_GOOD} Extra words differ here.", "en"),
        # repetitive page -> Gopher flag
        ("https://sitec.org/z", _TS, None,
         "\n".join(["Buy cheap pills online right now."] * 10), "en"),
        # contains the benchmark 13-gram -> decontaminated
        ("https://sited.org/w", _TS, None,
         f"The {_BENCH13} sequence appears right here. " + _GOOD, "en"),
        # lorem ipsum page -> C4 page flag
        ("https://sitee.org/v", _TS, None,
         "Lorem ipsum dolor sit amet, consectetur adipiscing elit today. " + _GOOD, "en"),
        # clean page with PII -> kept, redacted
        ("https://sitef.org/u", _TS, None,
         f"Contact jane@example.com for all the details. {_GOOD}", "en"),
    ]
    pages = _pages(spark, rows)
    benchmark = spark.createDataFrame([(_BENCH13,)], "text string")

    out = prepare_training_corpus(pages, benchmark=benchmark)
    by_url = {r["url"]: r for r in out.collect()}

    assert set(by_url) == {"https://sitea.com/x", "https://siteb.org/y",
                           "https://sitef.org/u"}
    # canonical dedup kept the later-ts spelling (no www)
    assert "https://www.sitea.com/x" not in by_url
    # the shared boilerplate line survives exactly once corpus-wide
    n_boiler = sum(r["text"].count(_BOILER) for r in by_url.values())
    assert n_boiler == 1
    # PII redacted in the kept doc
    assert "<EMAIL>" in by_url["https://sitef.org/u"]["text"]
    assert "jane@example.com" not in by_url["https://sitef.org/u"]["text"]

    # accounting pass over the flagged (unfiltered) frame
    flagged = prepare_training_corpus(pages, benchmark=benchmark,
                                      filter_rows=False)
    rep = prep_report(flagged).first()
    assert rep["docs_in"] == 6          # 7 rows, 1 canonical-url dup
    assert rep["docs_kept"] == 3
    assert rep["dropped_contaminated"] == 1
    assert rep["dropped_repetition"] == 1
    assert rep["dropped_c4"] >= 1       # the lorem-ipsum page
    # 1 shared boilerplate copy + 9 within-page repeats on the spam doc
    # (corpus line-dedup removes within-document duplicates too)
    assert rep["boilerplate_lines_dropped"] == 10
    assert rep["pii_redactions_kept_docs"] >= 1
    assert rep["tokens_kept"] > 0

    # per-host cap composes on the end of the pipeline
    two_per_host = rows + [
        ("https://sitef.org/u2", _TS, None, f"{_GOOD} Another page on the same host.", "en")]
    capped = prepare_training_corpus(_pages(spark, two_per_host),
                                     benchmark=benchmark, max_docs_per_host=1)
    hosts = [r["url"].split("/")[2].removeprefix("www.")
             for r in capped.collect()]
    assert len(hosts) == len(set(hosts))


def test_prepare_training_corpus_synthetic_smoke(spark):
    """The composed pipeline runs over the synthetic pages corpus (real
    extraction UDF included) and the report's kept count equals the
    filtered row count."""
    from pdfextractor_spark.corpus import PAGES_COLUMNS, generate_pages
    from pdfextractor_spark.pipeline.webclean import (prep_report,
                                                      prepare_training_corpus)

    rows = [tuple(r[c] for c in PAGES_COLUMNS) for r in generate_pages(300)]
    pages = _pages(spark, rows)

    flagged = prepare_training_corpus(pages, filter_rows=False)
    rep = prep_report(flagged).first()
    kept = prepare_training_corpus(pages).count()
    # docs_in = rows surviving the dedup stages (urls are distinct but the
    # synthetic generator emits some identical texts -> content dedup bites)
    assert rep["docs_in"] == flagged.count() and 0 < rep["docs_in"] <= 300
    assert rep["docs_kept"] == kept
    assert 0 <= kept <= 300
    # extraction ran: parser column present and populated on kept rows
    assert "parser" in flagged.columns


def test_prepare_training_corpus_selection_stages(spark):
    """Optional tail stages: BPE token budgets, NB gate, DSIR resample,
    shard packing — defaults off (covered above), here all on."""
    from pdfextractor_spark.ops.bpe import train_bpe
    from pdfextractor_spark.ops.selection import train_nb
    from pdfextractor_spark.pipeline.webclean import prepare_training_corpus

    good_rows = [
        (f"https://site{i}.org/a", _TS, None,
         _GOOD + f" Distinct watershed sentence number {i} closes this page.",
         "en")
        for i in range(8)
    ]
    pages = _pages(spark, good_rows)
    merges = train_bpe(pages, num_merges=32, min_count=2)
    nb_train = spark.createDataFrame(
        [(_GOOD, "good"), ("buy cheap pills online free discount now", "spam"),
         ("watershed planning informative sentences reader content", "good"),
         ("casino bonus click here free spins jackpot", "spam")],
        "text string, label string",
    )
    model, priors = train_nb(nb_train, n=1, buckets=512)
    target = spark.createDataFrame([( _GOOD,)], "text string")

    out = prepare_training_corpus(
        pages,
        bpe_merges=merges,
        nb_filter={"model": model, "priors": priors, "keep_labels": {"good"},
                   "n": 1, "buckets": 512},
        dsir={"target": target, "k": 4, "n": 1, "buckets": 512},
        shard_budget=200,
    )
    rows = out.collect()
    assert len(rows) == 4  # dsir k
    for r in rows:
        assert r["pred_label"] == "good"
        assert r["bpe_tokens"] > 0
        assert r["shard_id"] >= 0
    # deterministic end to end
    again = prepare_training_corpus(
        pages, bpe_merges=merges, nb_filter={"model": model, "priors": priors, "keep_labels": {"good"},
                   "n": 1, "buckets": 512},
        dsir={"target": target, "k": 4, "n": 1, "buckets": 512},
        shard_budget=200,
    ).collect()
    assert sorted(r["url"] for r in again) == sorted(r["url"] for r in rows)
    # a spam-labeled page is gated out by the NB filter
    spam_pages = _pages(spark, good_rows + [
        ("https://spam.biz/p", _TS, None,
         "Buy cheap pills online free discount now. Casino bonus click here free spins. "
         "Win big jackpot now with free spins. Best discount pills shipped free today. "
         "Click here for casino bonus and jackpot.", "en"),
    ])
    gated = prepare_training_corpus(
        spam_pages, nb_filter={"model": model, "priors": priors, "keep_labels": {"good"},
                            "n": 1, "buckets": 512})
    assert "https://spam.biz/p" not in {r["url"] for r in gated.collect()}


def test_prepare_training_corpus_robots_gate(spark):
    from pdfextractor_spark.pipeline.webclean import prepare_training_corpus

    pages = _pages(spark, [
        # distinct texts: content dedup must not interfere with the gate
        ("https://open.org/a", _TS, None, _GOOD + " Open site page.", "en"),
        ("https://closed.org/private/a", _TS, None, _GOOD + " Private page.", "en"),
        ("https://closed.org/public/a", _TS, None, _GOOD + " Public page.", "en"),
    ])
    robots = spark.createDataFrame(
        [("closed.org", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    out = prepare_training_corpus(pages, robots=(robots, "trainingbot"))
    urls = {r["url"] for r in out.collect()}
    assert urls == {"https://open.org/a", "https://closed.org/public/a"}
    # with filter_rows=False the flag is visible instead
    flagged = prepare_training_corpus(
        pages, robots=(robots, "trainingbot"), filter_rows=False)
    got = {r["url"]: (r["robots_allowed"], r["keep"]) for r in flagged.collect()}
    assert got["https://closed.org/private/a"] == (False, False)
    assert got["https://open.org/a"] == (True, True)


def test_flag_only_run_skips_selection_and_assembly(spark):
    """filter_rows=False is the accounting contract: every input page one
    row, flags visible — dsir/shard stages must not drop or regroup."""
    from pdfextractor_spark.pipeline.webclean import prepare_training_corpus

    rows = [
        (f"https://s{i}.org/a", _TS, None,
         _GOOD + f" Unique closing sentence number {i} here.", "en")
        for i in range(6)
    ]
    pages = _pages(spark, rows)
    target = spark.createDataFrame([(_GOOD,)], "text string")
    flagged = prepare_training_corpus(
        pages, filter_rows=False,
        dsir={"target": target, "k": 2, "n": 1, "buckets": 256},
        shard_budget=100,
    )
    assert flagged.count() == len(rows)       # nothing dropped
    assert "keep" in flagged.columns
    assert "shard_id" not in flagged.columns  # assembly skipped
    # the same config WITH filtering applies the selection
    picked = prepare_training_corpus(
        pages, filter_rows=True,
        dsir={"target": target, "k": 2, "n": 1, "buckets": 256},
        shard_budget=100,
    )
    assert picked.count() == 2
    assert "shard_id" in picked.columns


def test_selection_stages_survive_duplicate_urls(spark):
    """Scoring/resampling must key on a ROW-unique id: with ts_col absent
    (url_dedup skipped) the same url can carry distinct documents — the
    NB gate must not merge their features and DSIR must keep exactly k."""
    from pdfextractor_spark.ops.selection import train_nb
    from pdfextractor_spark.pipeline.webclean import prepare_training_corpus

    rows = [
        ("https://dup.org/page", None, None,
         _GOOD + f" Distinct watershed sentence number {i} closes this page.",
         "en")
        for i in range(6)
    ]
    pages = _pages(spark, rows)
    nb_train = spark.createDataFrame(
        [(_GOOD, "good"), ("buy cheap pills online free discount now", "spam")],
        "text string, label string",
    )
    model, priors = train_nb(nb_train, n=1, buckets=512)
    target = spark.createDataFrame([(_GOOD,)], "text string")

    # NB scoring: one output row per input row, no fan-out via the url join
    gated = prepare_training_corpus(
        pages, ts_col=None,
        nb_filter={"model": model, "priors": priors, "keep_labels": {"good"},
                   "n": 1, "buckets": 512},
    ).collect()
    assert len(gated) == 6
    assert all(r["pred_label"] == "good" for r in gated)

    # DSIR: exact k even though every url is identical
    out = prepare_training_corpus(
        pages, ts_col=None,
        dsir={"target": target, "k": 3, "n": 1, "buckets": 512},
    ).collect()
    assert len(out) == 3
    assert "_wcid" not in {c for c in out[0].asDict()}


def test_semdedup_stage_flags_and_accounting(spark):
    """The optional SemDeDup stage drops exactly one of a semantically
    identical pair (distinct BYTES, near-identical embeddings — the case
    no other dedup stage catches), never touches null-embedding rows,
    and prep_report carries the dropped_semantic count."""
    from pdfextractor_spark.pipeline.webclean import (prep_report,
                                                      prepare_training_corpus)

    texts = [
        ("This article describes watershed planning in depth. " * 2
         + "Every sentence here ends with punctuation. "
         + "The writing is unique to this very page. "
         + "A fourth sentence pads the C4 page gate. "
         + "A fifth sentence closes it out."),
        ("This piece covers watershed planning thoroughly. " * 2
         + "All of its sentences terminate with periods. "
         + "The phrasing is specific to this document alone. "
         + "Another sentence pads the C4 page gate. "
         + "One more sentence finishes the page."),
        ("A completely different topic: bridge maintenance schedules. "
         + "Inspections happen every spring without fail. "
         + "Steel fatigue is measured by certified crews. "
         + "Reports are filed with the county office. "
         + "Budgets are approved in the autumn session."),
        ("Entirely unrelated content about library catalogs. "
         + "Card systems gave way to digital indexes. "
         + "Patrons search by title, author, or subject. "
         + "Holdings are synchronized across branches nightly. "
         + "Late fees were abolished two years ago."),
    ]
    # docs 0 and 1 are semantic twins (cos ~ 0.99996), 2 and 3 far away;
    # doc 3 carries NO embedding
    vecs = [[1.0, 0.01, 0.0], [1.0, 0.0, 0.01], [0.0, 1.0, 0.0], None]
    pages = spark.createDataFrame(
        [(f"https://s{i}.org/p", t, "en", v)
         for i, (t, v) in enumerate(zip(texts, vecs))],
        "url string, text string, lang string, embedding array<double>")
    flagged = prepare_training_corpus(
        pages, extract=False, dup_line_min_count=None, redact=False,
        filter_rows=False,
        semdedup={"vec_col": "embedding", "num_centroids": 2,
                  "threshold": 0.999, "seed": 13, "max_iter": 5})
    rows = {r["url"]: r for r in flagged.collect()}
    twins = [rows["https://s0.org/p"], rows["https://s1.org/p"]]
    assert sorted(r["semdedup_keep"] for r in twins) == [False, True]
    assert rows["https://s2.org/p"]["semdedup_keep"]
    assert rows["https://s3.org/p"]["semdedup_keep"]  # null embedding: kept
    dropped_twin = next(r for r in twins if not r["semdedup_keep"])
    assert not dropped_twin["keep"]
    report = prep_report(flagged).collect()[0]
    assert report["dropped_semantic"] == 1
    assert report["docs_in"] == 4

    # filter_rows=True physically drops the semantic duplicate
    kept = prepare_training_corpus(
        pages, extract=False, dup_line_min_count=None, redact=False,
        quality_floor=0.0,
        semdedup={"vec_col": "embedding", "num_centroids": 2,
                  "threshold": 0.999, "seed": 13, "max_iter": 5})
    kept_urls = {r["url"] for r in kept.collect()}
    assert len(kept_urls & {"https://s0.org/p", "https://s1.org/p"}) == 1
    assert {"https://s2.org/p", "https://s3.org/p"} <= kept_urls


def test_byte_identical_rows_do_not_self_annihilate(spark):
    """Two byte-identical (url, text) rows must collapse to ONE surviving
    copy with its text intact — not share a dedup id whose keep='first'
    rank-2 occurrence drags every line/span of BOTH copies into the
    shared drop set (the self-annihilation bug)."""
    from pdfextractor_spark.pipeline.webclean import prepare_training_corpus

    body = ("every sentence in this document is fully unique prose. "
            "the second sentence continues with distinct words. "
            "a third sentence keeps the page gate satisfied here. "
            "the fourth sentence adds more original material. "
            "a fifth sentence closes the page politely.")
    rows = [("https://dup.org/p", body, "en"),
            ("https://dup.org/p", body, "en"),     # exact byte copy
            ("https://other.org/q",
             "unrelated page content with its own five sentences. "
             "none of these lines repeat anywhere in the corpus. "
             "the third line is also completely original. "
             "a fourth line maintains the length gates. "
             "the fifth line ends the document.", "en")]
    pages = spark.createDataFrame(rows, "url string, text string, lang string")
    out = prepare_training_corpus(
        pages, extract=False, dup_line_min_count=2, dedup_span_width=5,
        redact=False, filter_rows=False)
    got = [r for r in out.collect() if r["url"] == "https://dup.org/p"]
    # exact copies collapsed to one row, text untouched
    assert len(got) == 1
    assert got[0]["text"] == body
    assert got[0]["dedup_lines_dropped"] == 0
    assert got[0]["dedup_span_tokens_dropped"] == 0


def test_semdedup_stage_all_null_embeddings_noop(spark):
    """An all-null (or null-component) embedding column must not crash the
    quantizer — the stage no-ops with semdedup_keep=True everywhere."""
    from pdfextractor_spark.pipeline.webclean import prepare_training_corpus

    pages = spark.createDataFrame(
        [("https://a.org/1",
          "first document with enough fully punctuated sentences. "
          "second sentence of original material right here. "
          "third sentence for the length gate now. "
          "fourth sentence keeps everything valid. "
          "fifth sentence concludes the text.", "en", None),
         ("https://b.org/2",
          "second document also has five proper sentences. "
          "its content does not repeat the first document. "
          "a third original line sits here. "
          "the fourth line is unique as well. "
          "line five finishes this one.", "en", [0.1, None, 0.3])],
        "url string, text string, lang string, embedding array<double>")
    flagged = prepare_training_corpus(
        pages, extract=False, dup_line_min_count=None, redact=False,
        filter_rows=False,
        semdedup={"vec_col": "embedding", "num_centroids": 2, "seed": 13})
    rows = flagged.collect()
    assert len(rows) == 2
    assert all(r["semdedup_keep"] for r in rows)


def test_host_boilerplate_stage_in_corpus_prep(spark):
    """host_boilerplate={...}: per-host template chrome is stripped before
    the corpus-global line dedup, the accounting column flows into
    prep_report, and the same line on an under-threshold host survives."""
    from pdfextractor_spark.pipeline.webclean import (prep_report,
                                                      prepare_training_corpus)

    nav = "Home menu and footer chrome line for this site."
    rows = [
        ("https://sitea.com/1", _TS, None, f"{nav}\n{_GOOD} Variant one.", "en"),
        ("https://sitea.com/2", _TS, None, f"{nav}\n{_GOOD} Variant two.", "en"),
        ("https://sitea.com/3", _TS, None, f"{nav}\n{_GOOD} Variant three.", "en"),
        # siteb carries the same bytes once: host-scoped judgment keeps it
        ("https://siteb.org/1", _TS, None, f"{nav}\n{_GOOD} Beta body one.", "en"),
        ("https://siteb.org/2", _TS, None, f"{_GOOD} Beta body two.", "en"),
    ]
    pages = _pages(spark, rows)
    out = prepare_training_corpus(
        pages, host_boilerplate={"min_docs": 2, "min_frac": 0.5},
        dup_line_min_count=None)
    by_url = {r["url"]: r for r in out.collect()}
    for u in ("https://sitea.com/1", "https://sitea.com/2", "https://sitea.com/3"):
        assert nav not in by_url[u]["text"]
        assert by_url[u]["host_boilerplate_lines_dropped"] == 1
    assert nav in by_url["https://siteb.org/1"]["text"]

    flagged = prepare_training_corpus(
        pages, host_boilerplate={"min_docs": 2, "min_frac": 0.5},
        dup_line_min_count=None, filter_rows=False)
    rep = prep_report(flagged).collect()[0]
    assert rep["host_template_lines_dropped"] == 3
    # the skipped global line dedup reports 0, not an error
    assert rep["boilerplate_lines_dropped"] == 0


def test_compression_band_stage_in_corpus_prep(spark):
    """compression_band=(low, high) gates templated/junk docs out of keep
    and prep_report carries the dropped_compression count."""
    from pdfextractor_spark.pipeline.webclean import (prep_report,
                                                      prepare_training_corpus)

    templated = ("Buy now and click here for the best deal today. " * 60)
    rows = [
        ("https://a.example/good", _TS, None, _GOOD, "en"),
        ("https://a.example/templated", _TS, None, templated, "en"),
    ]
    flagged = prepare_training_corpus(
        _pages(spark, rows), compression_band=(0.30, 0.95),
        dup_line_min_count=None, filter_rows=False)
    got = {r["url"]: r for r in flagged.collect()}
    assert 0.30 <= got["https://a.example/good"]["compression_ratio"] <= 0.95
    assert got["https://a.example/good"]["keep"]
    assert got["https://a.example/templated"]["compression_ratio"] < 0.30
    assert not got["https://a.example/templated"]["keep"]
    rep = prep_report(flagged).first()
    assert rep["dropped_compression"] == 1 and rep["docs_kept"] == 1
    # default run has no compression column and reports 0
    plain = prepare_training_corpus(
        _pages(spark, rows), dup_line_min_count=None, filter_rows=False)
    assert "compression_ratio" not in plain.columns
    assert prep_report(plain).first()["dropped_compression"] == 0


def test_unicode_form_stage_unifies_dedup_groups(spark):
    """unicode_form='NFC' runs before any hash: the decomposed and
    precomposed spellings of one rendered string collapse into one
    exact-dedup group (without the stage they both survive)."""
    from pdfextractor_spark.pipeline.webclean import prepare_training_corpus

    deco = ("café " + _GOOD)          # e + combining acute
    prec = ("café " + _GOOD)           # U+00E9
    rows = [("https://a.example/deco", _TS, None, deco, "en"),
            ("https://a.example/prec", _TS, None, prec, "en")]
    out = prepare_training_corpus(
        _pages(spark, rows), dup_line_min_count=None, unicode_form="NFC")
    assert out.count() == 1  # one spelling -> one exact-dedup survivor
    assert "unicode_changed" in out.columns
    plain = prepare_training_corpus(
        _pages(spark, rows), dup_line_min_count=None)
    assert plain.count() == 2  # both spellings survive without the stage


def test_url_quality_stage_in_corpus_prep(spark):
    """url_quality={}: spam/trap urls hard-drop before extraction with
    filter_rows=True; flag runs keep the rows and fold url_quality_ok
    into keep."""
    from pdfextractor_spark.pipeline.webclean import prepare_training_corpus

    def body(tag):
        # distinct per row: identical bodies would collapse in the exact
        # content dedup even on flag runs (duplication is not a judgment)
        return (f"Plenty of clean prose sits here about {tag}. "
                "It has several sentences. Each one ends with a period. "
                "The page gate needs five. Here is the fifth sentence.")

    pages = spark.createDataFrame(
        [("https://ok.example/a", body("alpha")),
         ("https://xxxcasino.example/p", body("beta")),
         ("https://ok.example/" + "d/" * 12 + "deep", body("gamma"))],
        "url string, text string")
    kept = prepare_training_corpus(
        pages, extract=False, dup_line_min_count=None, redact=False,
        filter_rows=True, url_quality={})
    assert [r["url"] for r in kept.collect()] == ["https://ok.example/a"]

    flagged = prepare_training_corpus(
        pages, extract=False, dup_line_min_count=None, redact=False,
        filter_rows=False, url_quality={})
    rows = {r["url"]: r for r in flagged.collect()}
    assert len(rows) == 3  # flag run keeps every row
    assert rows["https://ok.example/a"]["keep"] is True
    assert rows["https://xxxcasino.example/p"]["keep"] is False
    assert rows["https://xxxcasino.example/p"]["url_spam_token"] is True
    # custom thresholds pass through
    relaxed = prepare_training_corpus(
        pages, extract=False, dup_line_min_count=None, redact=False,
        filter_rows=True, url_quality={"max_depth": 30})
    assert len(relaxed.collect()) == 2
