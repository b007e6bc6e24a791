"""Text analysis for web corpora: language-ID heuristic, quality scoring,
token counting, document fingerprinting — all JVM-side SQL expressions
except the rolling-hash fingerprint (Arrow pandas UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

# tiny stopword lists per language (n-gram/stopword heuristic language ID)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "auf"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "por"],
}


def _tokens(text_col) -> Column:
    return F.split(
        F.trim(F.lower(F.regexp_replace(text_col, r"[^\p{L}\p{N} ]", " "))), r" +"
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-ratio language scores + argmax guess: (id, lang_guess,
    score_en, score_de, …). Pure SQL: array_intersect-style membership via
    exists()/filter() over the token array."""
    toks = _tokens(F.col(text_col))
    out = df.select(F.col(id_col).alias("id"), toks.alias("__t"))
    out = out.withColumn("__n", F.greatest(F.size("__t"), F.lit(1)))
    score_cols = []
    for lang, words in STOPWORDS.items():
        wl = F.array(*[F.lit(w) for w in words])
        cnt = F.size(F.filter(F.col("__t"), lambda t: F.array_contains(wl, t)))
        out = out.withColumn(f"score_{lang}", F.round(cnt / F.col("__n"), 6))
        score_cols.append(f"score_{lang}")
    # argmax over the language scores
    struct_arr = F.array(*[
        F.struct(F.col(c).alias("s"), F.lit(c.split("_")[1]).alias("l"))
        for c in score_cols
    ])
    best = F.array_max(struct_arr)
    out = out.withColumn(
        "lang_guess", F.when(best["s"] > 0.0, best["l"]).otherwise(F.lit("unknown"))
    )
    return out.select("id", "lang_guess", *score_cols)


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / word-shape quality features (pure SQL):
    (id, n_chars, n_words, mean_word_len, punct_ratio, digit_ratio,
    upper_ratio, stopword_ratio_en, quality)."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_words = F.size(toks)
    wl = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop = F.size(F.filter(toks, lambda x: F.array_contains(wl, x)))
    # explicit ASCII punctuation class (portable across regex engines)
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    uppers = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    out = df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(n_chars / F.greatest(n_words, F.lit(1)), 6).alias("mean_word_len"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(digits / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
        F.round(uppers / F.greatest(n_chars, F.lit(1)), 6).alias("upper_ratio"),
        F.round(stop / F.greatest(n_words, F.lit(1)), 6).alias("stopword_ratio_en"),
    )
    # simple composite: long enough, low punct/digit noise
    quality = (
        F.when(F.col("n_words") >= 10, 0.4).otherwise(F.col("n_words") / 25.0)
        + F.when(F.col("punct_ratio") < 0.1, 0.3).otherwise(0.0)
        + F.when(F.col("digit_ratio") < 0.2, 0.3).otherwise(0.0)
    )
    return out.withColumn("quality", F.round(quality, 6))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish subword-regex counts (pure SQL):
    (id, ws_tokens, bpe_tokens, chars). The BPE-ish regex counts word
    pieces of ≤4 chars (r'\\p{L}{1,4}|\\p{N}{1,3}|[^\\s\\p{L}\\p{N}]')."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.size(
        F.regexp_extract_all(t, F.lit(r"\p{L}{1,4}|\p{N}{1,3}|[^\s\p{L}\p{N}]"), 0)
    )
    return df.select(
        F.col(id_col).alias("id"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length(t).alias("chars"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling karp-rabin hash per
    window over the token stream (Arrow pandas UDF): (id, fingerprint)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    B, M = 1000003, (1 << 61) - 1

    @pandas_udf(LongType())
    def fp(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").lower().split()
            if not toks:
                continue
            hs = []
            for tok in toks:
                h = 0
                for ch in tok.encode():
                    h = (h * B + ch) % M
                hs.append(h)
            hs = np.array(hs, dtype=np.int64)
            if hs.size < window:
                out[i] = int(hs.min())
            else:
                roll = np.lib.stride_tricks.sliding_window_view(hs, window).sum(axis=1) % M
                out[i] = int(roll.min())
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), fp(F.col(text_col)).alias("fingerprint"))
