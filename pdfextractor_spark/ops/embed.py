"""Deterministic document embeddings via the hashing trick.

The ANN / SemDeDup family (`ops/similarity.py`, `ops/semdedup.py`)
consumes an ``array<float>`` column; real deployments compute it with a
neural encoder, which this container does not ship. This operator is the
deterministic, dependency-free producer: the classic signed-hash feature
map (Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
Learning") over word n-grams —

    h         = blake2b_64(gram, key=seed)     (C-speed, keyed, stable)
    bucket(g) = h mod dim
    sign(g)   = +1/-1 from the top hash bit
    v[bucket] += sign * tf,   then L2-normalize

Same-topic documents share n-grams, so cosine similarity over these
vectors behaves like (a crude) semantic similarity — enough to drive
semdedup/ANN end-to-end from raw text, deterministically across engines
and partitionings (the hash is keyed, no training state, no model).

Spark shape: ONE Arrow-batched pandas UDF (numpy accumulator per doc,
C-implemented hashing), map-only, no shuffle — it fuses into whatever
scan stage calls it. ``hashed_embedding_py`` is the exact pure-Python
twin tests pin against.
"""

from __future__ import annotations

import hashlib
import re as _re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_hashed_embedding", "hashed_embedding_py"]

_TOKEN_RX = _re.compile(r"[a-z0-9]+")


def _gram_hash(gram: str, seed: int) -> int:
    """64-bit keyed hash of one n-gram (blake2b is C-implemented and
    process-stable, unlike builtin ``hash``)."""
    key = seed.to_bytes(8, "little")
    return int.from_bytes(
        hashlib.blake2b(gram.encode("utf-8"), digest_size=8, key=key).digest(),
        "little")


def hashed_embedding_py(text: str | None, dim: int = 64, n: int = 2,
                        seed: int = 7) -> list[float]:
    """Pure-Python reference: the exact vector the Spark op produces."""
    toks = _TOKEN_RX.findall((text or "").lower())
    v = [0.0] * dim
    for i in range(len(toks) - n + 1):
        h = _gram_hash(" ".join(toks[i:i + n]), seed)
        v[h % dim] += 1.0 if (h >> 63) == 0 else -1.0
    norm = sum(x * x for x in v) ** 0.5
    # float32 round-trip matches the Spark column's storage type
    import numpy as np

    out = np.asarray(v, dtype=np.float64)
    if norm > 0:
        out = out / norm
    return out.astype(np.float32).tolist()


def with_hashed_embedding(df: DataFrame, text_col: str = "text",
                          out_col: str = "embedding", dim: int = 64,
                          n: int = 2, seed: int = 7) -> DataFrame:
    """Append a deterministic L2-normalized ``array<float>`` embedding of
    the word-``n``-gram multiset of ``text_col`` (signed hashing trick).
    All-empty documents get the zero vector (callers that feed semdedup
    should filter on a non-zero embedding if they want those excluded —
    ``prepare_training_corpus`` already guards null embeddings)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        key = seed.to_bytes(8, "little")
        b2b = hashlib.blake2b
        out = []
        for t in texts:
            toks = _TOKEN_RX.findall((t or "").lower())
            v = np.zeros(dim, dtype=np.float64)
            for i in range(len(toks) - n + 1):
                h = int.from_bytes(
                    b2b(" ".join(toks[i:i + n]).encode("utf-8"),
                        digest_size=8, key=key).digest(), "little")
                v[h % dim] += 1.0 if (h >> 63) == 0 else -1.0
            norm = float(np.sqrt((v * v).sum()))
            if norm > 0:
                v /= norm
            out.append(v.astype(np.float32).tolist())
        return pd.Series(out)

    return df.withColumn(out_col, _embed(F.col(text_col)))
