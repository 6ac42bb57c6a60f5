"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting (task brief "text analysis" family).

Token/quality metrics are pure JVM column expressions (whole-stage codegen);
language-ID and fingerprints need hashing/ngram models → Arrow kernels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mhap_spark.hashing import caption_kgram_hashes_batch, fmix64
from mhap_spark.ops.dedup import normalized_text

_STOPWORDS = (
    "the of and a to in is it that was for on are as with his they at be this "
    "from or had by but not what all were when we there can an your which their"
).split()


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars_seen, distinct_ratio, avg_token_len) —
    whitespace tokenization over the lowercased text (the same normal form
    as quality_score and the dedup operators — dedup.normalized_text, reused
    so the canonical form can never silently desynchronize), all builtin
    functions."""
    norm = normalized_text(F.col(text_col))
    # null/empty text → 0 tokens (not size(null) = −1 or split('')=['']),
    # ratios NULL via try_divide instead of −1/−1 = 1.0 garbage
    toks = F.when(
        norm.isNull() | (norm == ""), F.array().cast("array<string>")
    ).otherwise(F.split(norm, " "))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.coalesce(F.length(text_col), F.lit(0)).alias("n_chars_seen"),
        F.round(
            F.try_divide(F.size(F.array_distinct(toks)), F.size(toks)), 6
        ).alias("distinct_ratio"),
        F.round(
            F.try_divide(
                F.aggregate(
                    toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
                ),
                F.size(toks),
            ),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword heuristics → quality in [0,1].

    The score is a documented deterministic formula (not a model): docs get
    credit for reasonable length, sane word lengths, stopword presence, and
    lose it for punctuation soup."""
    t = F.col(text_col)
    # null/empty text scores 0 outright (an empty doc is the lowest-quality
    # doc, not a NULL from 0/0 division that a quality filter then silently
    # drops or passes depending on its null handling)
    empty = t.isNull() | (F.length(t) == 0)
    toks = F.split(normalized_text(t), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    stop_ratio = F.when(empty, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
        / F.lit(float(len(_STOPWORDS)))
    )
    # explicit ASCII class ≡ \p{Punct} — spelled out so the DuckDB oracle
    # (RE2, no \p{Punct}) can pin the identical semantics
    punct_ratio = F.when(empty, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", "")) / F.length(t)
    )
    len_score = F.least(F.coalesce(F.length(t), F.lit(0)) / F.lit(200.0), F.lit(1.0))
    return df.select(
        F.col(id_col),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(
            F.when(empty, F.lit(0.0)).otherwise(
                F.greatest(
                    F.lit(0.0),
                    F.least(
                        F.lit(1.0),
                        0.4 * len_score
                        + 0.4 * stop_ratio
                        + 0.2 * (1.0 - 4.0 * punct_ratio),
                    ),
                )
            ),
            6,
        ).alias("quality"),
    )


def _lang_schema(id_type) -> StructType:
    # doc_id type follows the caller's id_col (string image_ids elsewhere in
    # the repo must not hit a hardcoded LongType field)
    return StructType(
        [
            StructField("doc_id", id_type),
            StructField("lang_pred", StringType()),
            StructField("lang_score", DoubleType()),
        ]
    )

# tiny deterministic character-trigram profiles (illustrative heuristic —
# production swaps in a real LID model behind the same mapInPandas signature)
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "ent", " th", "he ", "er ", " of", "es "],
    "de": ["der", "ein", "ich", "und", "sch", "die", "en ", "ch ", " ge", "cht"],
    "fr": ["les", "ent", "de ", " de", "ion", "que", "ait", " le", "eur", "ous"],
}


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """n-gram language-ID heuristic over mapInPandas (Arrow batches)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].str.lower().fillna("")
            scores = np.zeros((len(pdf), len(_LANG_PROFILES)))
            langs = list(_LANG_PROFILES)
            for j, lang in enumerate(langs):
                for tri in _LANG_PROFILES[lang]:
                    scores[:, j] += texts.str.count(tri, flags=0).to_numpy()
            lens = texts.str.len().to_numpy().clip(min=1)
            scores = scores / lens[:, None]
            best = scores.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "lang_pred": [langs[b] for b in best],
                    "lang_score": scores[np.arange(len(pdf)), best],
                }
            )

    # NOTE round-6: a conditional repartition (parallel.spread) was tried
    # here and REGRESSED the query (0.42 s → 0.7-1.4 s at sf0.1): this
    # kernel is ~0.2 s of pandas .str.count work, less than the cost of the
    # added exchange plus 32 python-worker spin-ups.  Light kernels stay on
    # the scan's own partitioning; heavy kernels (MinHash/SimHash/winnow)
    # use spread.
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gen, _lang_schema(df.schema[id_col].dataType)
    )


def _fp_schema(id_type) -> StructType:
    return StructType(
        [
            StructField("doc_id", id_type),
            StructField("fingerprint", LongType()),
            StructField("n_grams", LongType()),
        ]
    )


def fingerprint(
    df: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-insensitive 64-bit document fingerprint: xor of all char k-gram
    hashes (rolling-hash family; robust to reordering, sensitive to content)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            grams = caption_kgram_hashes_batch(pdf[text_col].tolist(), k)
            fp = np.zeros(len(pdf), dtype=np.uint64)
            ng = np.zeros(len(pdf), dtype=np.int64)
            for i, g in enumerate(grams):
                ng[i] = len(g)
                if len(g):
                    fp[i] = np.bitwise_xor.reduce(fmix64(g))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "fingerprint": fp.view(np.int64),
                    "n_grams": ng,
                }
            )

    # see lang_id: spread() measured as a regression for this light kernel
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gen, _fp_schema(df.schema[id_col].dataType)
    )
