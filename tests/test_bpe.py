"""Learned BPE tokenizer (ops/bpe.py): training determinism, hand-computed
merge order, lossless round-trip, map-only encode plan."""

import pyspark.sql.functions as F

from pdfextractor_spark.ops.bpe import (
    EOW, apply_bpe, decode_tokens, encode_word, train_bpe,
)

# Classic Sennrich corpus: low x5, lower x2, newest x6, widest x3.
_CORPUS_ROWS = [
    ("low low low low low",),
    ("lower lower",),
    ("newest newest newest newest newest newest",),
    ("widest widest widest",),
]

# Hand-computed first five merges (tie-break: count desc, then
# lexicographically greatest pair):
#   (e,s)=9 ties (s,t</w>)=9 -> ('s','t</w>') wins the tie
#   then ('e','st</w>')=9, ('l','o')=7,
#   6-way tie ('n','e')/('e','w... ')/('w','est</w>') -> ('w','est</w>'),
#   then ('n','e').
_EXPECTED_MERGES = [
    ("s", "t" + EOW),
    ("e", "st" + EOW),
    ("l", "o"),
    ("w", "est" + EOW),
    ("n", "e"),
]


def _corpus(spark):
    return spark.createDataFrame(_CORPUS_ROWS, "text string")


def test_train_bpe_merge_order_hand_computed(spark):
    merges = train_bpe(_corpus(spark), num_merges=5, min_count=2)
    assert merges == _EXPECTED_MERGES


def test_train_bpe_deterministic(spark):
    a = train_bpe(_corpus(spark), num_merges=20, min_count=2)
    b = train_bpe(_corpus(spark), num_merges=20, min_count=2)
    assert a == b


def test_train_bpe_min_count_stops_on_singletons(spark):
    df = spark.createDataFrame([("alpha beta gamma",)], "text string")
    assert train_bpe(df, num_merges=10, min_count=2) == []


def test_encode_word_greedy_rank_order():
    ranks = {p: i for i, p in enumerate(_EXPECTED_MERGES)}
    assert encode_word("newest", ranks) == ["ne", "west" + EOW]
    assert encode_word("low", ranks) == ["lo", "w" + EOW]
    assert encode_word("lower", ranks) == ["lo", "w", "e", "r" + EOW]
    # unseen word still merges through shared ranks: (s,t</w>) -> (e,st</w>)
    # -> (w,est</w>) chains to a single symbol
    assert encode_word("west", ranks) == ["west" + EOW]
    # word sharing no merge stays character-segmented
    assert encode_word("hi", ranks) == ["h", "i" + EOW]


def test_round_trip_lossless_including_unicode():
    ranks = {p: i for i, p in enumerate(_EXPECTED_MERGES)}
    for w in ["low", "newest", "éclair", "naïve", "日本語", "x", "résumé-2024"]:
        assert decode_tokens(encode_word(w, ranks, cache={})) == w
    # no merges at all -> pure character segmentation, still lossless
    for w in ["abc", "ß", "👍ok"]:
        assert decode_tokens(encode_word(w, {})) == w


def test_apply_bpe_counts_tokens_and_plan(spark):
    merges = train_bpe(_corpus(spark), num_merges=5, min_count=2)
    df = spark.createDataFrame(
        [("d1", "low newest"), ("d2", ""), ("d3", None), ("d4", "lower")],
        "doc_id string, text string",
    )
    out = apply_bpe(df, merges, tokens_col="toks")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows["d1"]["toks"] == ["lo", "w" + EOW, "ne", "west" + EOW]
    assert rows["d1"]["bpe_tokens"] == 4
    assert rows["d2"]["bpe_tokens"] == 0 and rows["d2"]["toks"] == []
    assert rows["d3"]["bpe_tokens"] == 0
    assert rows["d4"]["bpe_tokens"] == 4  # lo w e r</w>
    # encode is map-only: no shuffle introduced over the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_apply_bpe_matches_pure_python_on_testdata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = train_bpe(docs, num_merges=64, min_count=2, max_words=5_000)
    assert len(merges) > 0
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    cache = {}
    for r in docs.select("doc_id", "text").collect():
        expect = sum(
            len(encode_word(w, ranks, cache))
            for w in (r["text"] or "").split()
        )
        assert got[r["doc_id"]] == expect


def test_whitespace_semantics_match_spark_split(spark):
    """Training splits with Java \\s (ASCII); encoding must agree: a word
    containing NBSP is ONE word on both sides."""
    from pdfextractor_spark.ops.bpe import _WS_SPLIT

    assert _WS_SPLIT.split("a b c") == ["a b", "c"]
    df = spark.createDataFrame([("a b a b a b c c",)], "text string")
    merges = train_bpe(df, num_merges=4, min_count=2)
    out = apply_bpe(df, merges, tokens_col="toks").collect()[0]
    # counts computed against the trained word statistics, not a re-split
    ranks = {p: i for i, p in enumerate(merges)}
    expect = sum(len(encode_word(w, ranks, {}))
                 for w in ["a b", "a b", "a b", "c", "c"])
    assert out["bpe_tokens"] == expect
