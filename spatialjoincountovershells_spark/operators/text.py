"""Text-analysis operators for training-data pipelines — all pure
Spark SQL expressions (codegen'd), integer/string outputs so ANSI-SQL
oracles match exactly.

* text_stats       — char/token/punct counts
* quality_score    — integer quality heuristic
* lang_guess       — stopword-hit language heuristic
* doc_fingerprint  — polynomial rolling hash (Arrow kernel)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# language marker words; space-padded containment keeps SQL portable
_LANG_MARKERS = [
    ("de", " der "), ("de", " und "), ("fr", " le "), ("fr", " et "),
    ("es", " el "), ("es", " y "), ("zh", " de "), ("en", " the "),
]


def _n_tokens(text_col: str):
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> (id, n_chars, n_tokens, n_spaces, n_commas)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        _n_tokens(text_col).cast("long").alias("n_tokens"),
        (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))))
        .cast("long")
        .alias("n_spaces"),
        (F.length(t) - F.length(F.replace(t, F.lit(","), F.lit(""))))
        .cast("long")
        .alias("n_commas"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Integer quality heuristic in [0, 1000]:
    1000 * n_tokens / (n_chars + 1), capped — a cheap length/density
    signal; exact integer division so oracles agree."""
    t = F.col(text_col)
    ntok = _n_tokens(text_col).cast("long")
    score = F.least(
        (F.lit(1000) * ntok) / (F.length(t).cast("long") + 1), F.lit(1000.0)
    )
    return df.select(F.col(id_col), F.floor(score).cast("long").alias("quality_1000"))


def lang_guess(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """First-match stopword heuristic -> (id, lang_pred)."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    c = None
    for lang, marker in _LANG_MARKERS:
        cond = F.instr(padded, marker) > 0
        c = F.when(cond, lang) if c is None else c.when(cond, lang)
    return df.select(F.col(id_col), c.otherwise("und").alias("lang_pred"))


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", window: int = 16
) -> DataFrame:
    """Winnowing-style fingerprint: min polynomial rolling hash over
    all `window`-char substrings -> (id, fingerprint).  Arrow kernel,
    vectorized per batch via cumulative powers (no per-char Python loop
    beyond the window fold)."""
    B = np.uint64(1099511628211)

    def op(batches):
        for pdf in batches:
            fps = []
            for s in pdf[text_col]:
                b = np.frombuffer(str(s).encode("utf-8"), dtype=np.uint8)
                if len(b) < window:
                    b = np.pad(b, (0, window - len(b)))
                with np.errstate(over="ignore"):
                    h = np.zeros(len(b) - window + 1, dtype=np.uint64)
                    for j in range(window):  # window-size fold, vectorized over positions
                        h = h * B + b[j : j + len(h)].astype(np.uint64)
                fps.append(np.int64(h.min() & np.uint64(0x7FFFFFFFFFFFFFFF)))
            yield pd.DataFrame({id_col: pdf[id_col], "fingerprint": fps})

    return df.select(id_col, text_col).mapInPandas(
        op, schema=f"{id_col} long, fingerprint long"
    )
