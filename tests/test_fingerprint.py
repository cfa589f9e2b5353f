"""Winnowing fingerprint tests: the shared-substring guarantee and
overlap-pair detection."""

import pytest

from pdfextractor_spark.ops.fingerprint import fingerprint_overlap_pairs, winnow_fingerprints

PASSAGE = ("the quick brown fox jumps over the lazy dog while the river "
           "meanders through the lower watershed during spring runoff")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, PASSAGE),
        (2, PASSAGE),  # identical
        (3, "completely different text about cost tables and budget estimates here"),
        (4, "INTRO SECTION. " + PASSAGE + " APPENDIX TRAILER."),  # shared passage
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_deterministic_and_nonempty(docs):
    a = winnow_fingerprints(docs).collect()
    b = winnow_fingerprints(docs).collect()
    assert sorted((r["id"], tuple(r["fingerprints"])) for r in a) == \
           sorted((r["id"], tuple(r["fingerprints"])) for r in b)
    by = {r["id"]: r for r in a}
    assert by[1]["n_fps"] > 0
    assert by[5]["fingerprints"] == []  # shorter than k


def test_identical_docs_full_overlap(docs):
    fps = winnow_fingerprints(docs)
    pairs = {(r["id_a"], r["id_b"]): r["overlap"]
             for r in fingerprint_overlap_pairs(fps, min_overlap=0.0).collect()}
    assert pairs[(1, 2)] == 1.0


def test_shared_passage_detected_different_docs_not(docs):
    fps = winnow_fingerprints(docs)
    pairs = {(r["id_a"], r["id_b"]): r["overlap"]
             for r in fingerprint_overlap_pairs(fps, min_overlap=0.0).collect()}
    # winnowing guarantee: the shared passage (>> k+w-1 chars) collides
    assert pairs.get((1, 4), 0) >= 0.8
    assert pairs.get((2, 4), 0) >= 0.8
    # unrelated doc 3 shares (almost) nothing with doc 1
    assert pairs.get((1, 3), 0) < 0.2
