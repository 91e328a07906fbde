"""Composed training-corpus cleaning pipeline.

The individual signals live in operators/text.py (quality, language)
and operators/dedup.py (exact dedup, minhash-LSH near-dup pairs,
connected-component clustering); `corpus_clean` composes them into the
one query a 100 TB pretraining-data pipeline actually runs: "give me
the surviving documents".  Everything stays declarative DataFrame ops
(one narrow projection over the corpus, one window keyed by a text
digest, one left join against the — sparse — near-dup cluster table),
and every step has a bit-exact ANSI-SQL twin, so the whole composition
is oracle-checked end-to-end, not just its parts.

* corpus_clean       — the surviving documents
* corpus_clean_stats — the drop funnel as one summary row (how much
                       each gate bites), same gated projection
* stratified_sample  — deterministic per-language sampling (the
                       data-mixing step of corpus assembly)
* decontaminate      — per-doc benchmark-overlap verdict (the
                       train/eval n-gram decontamination step)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dedup_clusters, minhash_lsh_pairs, shingles
from .text import lang_pred_expr, quality_expr


def corpus_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_min: int = 175,
    keep_langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    pairs: DataFrame | None = None,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 8,
    max_iter: int = 64,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Surviving documents after the four standard corpus gates ->
    (id_col, lang_pred string, quality_1000 long), one row per survivor.

    A document survives iff ALL of:
      1. quality_1000 >= q_min          (length/density heuristic)
      2. lang_pred in keep_langs        (stopword language id)
      3. it is the min-id copy of its exact-duplicate group
         (grouped by md5(text) — a 128-bit digest, so the shuffle key
         is 32 bytes no matter how long the document is)
      4. it is the near-dup representative of its cluster (connected
         components over the minhash-LSH candidate pair graph), or it
         is in no pair at all.  The representative is the min-id member
         AMONG docs passing gates 1-3 — picking the unconditional min
         id would delete a cluster's entire content whenever its lowest
         id happens to be a low-quality/wrong-language copy.

    `pairs` overrides the near-dup candidate source (doc_a/doc_b
    columns; e.g. simhash_pairs or a pre-materialized pair table);
    default is minhash_lsh_pairs(docs) with the given LSH shape.
    `clusters` short-circuits clustering entirely with a precomputed
    (id_col, cluster_id) table (dedup_clusters output) — pass it when
    the caller also needs the funnel, so the iterative clustering runs
    once, not once per consumer (see jobs/corpus_job.py).

    Scale shape: gate 1+2 are codegen'd expressions in one projection
    of the corpus scan; gate 3 is one hash-partitioned window (min over
    a digest group — partial agg both sides); gate 4 joins the corpus
    against the cluster table, which has one row per PAIRED doc — a
    tiny fraction of the corpus, broadcast-sized in practice (AQE
    converts the join at runtime).  Nothing materializes O(corpus) on
    the driver and the near-dup subgraph never touches unpaired rows.
    """
    base = _gated(
        docs, text_col, id_col, q_min, keep_langs, pairs,
        n_hashes, bands, shingle_n, max_iter, clusters,
    )
    return base.where(
        F.col("_q_ok") & F.col("_lang_ok") & F.col("_exact_ok") & F.col("_near_ok")
    ).select(F.col(id_col), F.col("lang_pred"), F.col("quality_1000"))


def _gated(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    q_min: int,
    keep_langs: tuple[str, ...],
    pairs: DataFrame | None,
    n_hashes: int,
    bands: int,
    shingle_n: int,
    max_iter: int,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """One row per doc with the four gate verdicts as boolean columns
    (id, quality_1000, lang_pred, _q_ok, _lang_ok, _exact_ok, _near_ok)
    — shared by corpus_clean (conjunction) and corpus_clean_stats
    (per-gate funnel counts)."""
    if clusters is not None:
        clusters = clusters.select(
            F.col(id_col).alias("_cl_doc"), F.col("cluster_id")
        )
    else:
        if pairs is None:
            pairs = minhash_lsh_pairs(
                docs, text_col, id_col, n_hashes, bands, shingle_n
            )
        clusters = dedup_clusters(pairs, out_id="_cl_doc", max_iter=max_iter)
    # NULL text = empty text for gating: it then fails the quality gate
    # (and groups with other empties for exact dedup) instead of
    # evaluating every gate to NULL and vanishing from the funnel's
    # drop columns while still being dropped
    docs = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    base = docs.select(
        F.col(id_col),
        quality_expr(text_col).alias("quality_1000"),
        lang_pred_expr(text_col).alias("lang_pred"),
        F.min(id_col)
        .over(Window.partitionBy(F.md5(F.col(text_col).cast("binary"))))
        .alias("_exact_min"),
    )
    g0 = base.join(clusters, base[id_col] == clusters["_cl_doc"], "left").select(
        F.col(id_col),
        F.col("quality_1000"),
        F.col("lang_pred"),
        F.col("cluster_id"),
        (F.col("quality_1000") >= F.lit(int(q_min))).alias("_q_ok"),
        F.col("lang_pred").isin(*keep_langs).alias("_lang_ok"),
        (F.col("_exact_min") == F.col(id_col)).alias("_exact_ok"),
    )
    # near-dup representative = min id among the cluster's ELIGIBLE
    # (gates 1-3) members; a cluster with no eligible member has no rep
    # and drops on the other gates alone, never on this one.  Singleton
    # docs (cluster_id null) group by their own id — ids are unique, so
    # no singleton can collide with a cluster's key.
    elig = F.col("_q_ok") & F.col("_lang_ok") & F.col("_exact_ok")
    rep = F.min(F.when(elig, F.col(id_col))).over(
        Window.partitionBy(F.coalesce(F.col("cluster_id"), F.col(id_col)))
    )
    return g0.select(
        F.col(id_col),
        F.col("quality_1000"),
        F.col("lang_pred"),
        F.col("_q_ok"),
        F.col("_lang_ok"),
        F.col("_exact_ok"),
        (
            F.col("cluster_id").isNull()
            | rep.isNull()
            | (rep == F.col(id_col))
        ).alias("_near_ok"),
    )


def corpus_clean_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_min: int = 175,
    keep_langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    pairs: DataFrame | None = None,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 8,
    max_iter: int = 64,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """The cleaning funnel as ONE summary row -> (n_docs, n_low_quality,
    n_wrong_lang, n_exact_dup, n_near_dup, n_survivors), all long.

    Gate counts are INDEPENDENT (a doc failing two gates increments
    both), so the columns answer "how much does each gate bite on this
    corpus" directly; n_survivors is the conjunction and equals
    count(corpus_clean(...)) with the same knobs.  This is the
    observability row a production pipeline logs per input partition —
    one tiny full aggregation over the same gated projection
    corpus_clean runs, nothing extra materialized.
    """
    g = _gated(
        docs, text_col, id_col, q_min, keep_langs, pairs,
        n_hashes, bands, shingle_n, max_iter, clusters,
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        cnt(~F.col("_q_ok")).alias("n_low_quality"),
        cnt(~F.col("_lang_ok")).alias("n_wrong_lang"),
        cnt(~F.col("_exact_ok")).alias("n_exact_dup"),
        cnt(~F.col("_near_ok")).alias("n_near_dup"),
        cnt(
            F.col("_q_ok") & F.col("_lang_ok") & F.col("_exact_ok") & F.col("_near_ok")
        ).alias("n_survivors"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark decontamination verdict per training document ->
    (id_col, n_hit_shingles long, contaminated int), one row per doc.

    The standard pretraining hygiene step: a training document is
    `contaminated` iff it shares at least `min_overlap` DISTINCT
    character `n`-gram shingles with ANY document of the evaluation/
    benchmark corpus `bench` — the n-gram-overlap test used to scrub
    eval sets out of web-scale training corpora.  `n_hit_shingles` is
    the count of distinct training-doc shingles that occur anywhere in
    the benchmark set (each training shingle counts once no matter how
    many benchmark docs contain it), so the verdict is monotone in the
    doc's own text and independent of benchmark-side duplication.

    Scale shape: the benchmark set is tiny next to the corpus (eval
    suites are thousands of docs vs billions), so its DISTINCT shingle
    set is broadcast and the corpus side never shuffles its text — one
    narrow shingle fan-out projection per doc, a broadcast-hash
    semi-probe, then a groupBy on the MATCHED rows only (a sparse
    subset).  The final verdict join back to the doc ids is
    broadcast-sized by the same sparsity (AQE converts it at runtime).
    Shingle window semantics are shared with every other text operator
    via functions/texthash.shingle_array_sql (one possibly-short
    shingle for sub-`n` docs), so the DuckDB twin is bit-exact.
    """
    bench_sh = (
        shingles(bench, text_col, id_col, n).select("shingle").distinct()
    )
    hits = (
        shingles(docs, text_col, id_col, n)
        .join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_shingles"))
    )
    return docs.select(F.col(id_col)).join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_hit_shingles"), F.lit(0)).cast("long").alias(
            "n_hit_shingles"
        ),
        (F.coalesce(F.col("n_hit_shingles"), F.lit(0)) >= int(min_overlap))
        .cast("int")
        .alias("contaminated"),
    )


def stratified_sample(
    docs: DataFrame,
    rates_1e6: dict[str, int],
    default_rate_1e6: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream: int = 97,
) -> DataFrame:
    """Deterministic per-language corpus sampling -> kept rows
    (id_col, lang_pred string), the data-mixing step of corpus
    assembly: keep a document iff hash(doc_id) % 10^6 < rate for its
    predicted language (rates_1e6 maps lang -> parts-per-million;
    languages absent from the map use default_rate_1e6).

    The keep decision is a pure function of doc_id (universal affine
    hash, stream index `stream`, from functions/texthash.py — the id is
    reduced mod P FIRST so the multiply never overflows int64 even at
    10^12-row id ranges), so sampling is partition-independent,
    reproducible across runs/engines, and trivially SQL-twinned; there
    is no RNG state and no per-partition seed to misplace.  One narrow
    codegen projection + filter over the corpus scan — no shuffle.
    """
    from ..functions.texthash import P, affine_sql

    h = f"({affine_sql(f'({id_col} % {P})', stream)} % 1000000)"
    # lang_pred is computed ONCE in the first projection; the rate CASE
    # branches on the column, not on R copies of the marker scan
    base = docs.select(
        F.col(id_col),
        lang_pred_expr(text_col).alias("lang_pred"),
        F.expr(h).alias("_h"),
    )
    rate = None
    for lg, r in sorted(rates_1e6.items()):
        cond = F.col("lang_pred") == lg
        rate = F.when(cond, int(r)) if rate is None else rate.when(cond, int(r))
    rate = (
        rate.otherwise(int(default_rate_1e6))
        if rate is not None
        else F.lit(int(default_rate_1e6))
    )
    return base.where(F.col("_h") < rate).select(F.col(id_col), F.col("lang_pred"))


def pack_sequences(
    df: DataFrame,
    seq_tokens: int = 2048,
    range_size: int = 1 << 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence-packing placement — the final assembly step
    of a pretraining pipeline: documents are concatenated in ascending
    id order into one global token stream, which is cut every
    `seq_tokens` tokens (documents straddle cuts; concat-and-chunk
    packing) -> (id, n_tokens, tok_offset, seq_id, seq_pos,
    n_seq_spans), all long.  tok_offset is the doc's first token's
    global stream index, seq_id/seq_pos its training-sequence id and
    in-sequence position, n_seq_spans how many sequences the doc
    touches (a 0-token doc reports 1 — it sits at a point).  Token
    counts use the whitespace contract of text._n_tokens.

    Scale shape (two-level distributed prefix-sum): a bare
    `Window.orderBy(id)` cumsum would drag the whole corpus into ONE
    task, so instead (1) per-doc counts aggregate into id-range buckets
    of `range_size` docs (map-side partial agg; the bucket table has
    n_docs/range_size rows — one small window task over ~10^6 rows even
    at 10^12 docs), (2) exclusive bucket offsets broadcast-join back,
    and a window PARTITIONED BY bucket (bounded `range_size` rows per
    task) finishes the within-bucket prefix.  No stage ever holds more
    than one bucket in one task, and the corpus shuffles once, on the
    bucket key it already computes.
    """
    from .text import _n_tokens

    toks = df.select(
        F.col(id_col),
        _n_tokens(text_col).cast("long").alias("n_tokens"),
        F.expr(f"{id_col} div {int(range_size)}").alias("_rng"),
    )
    per_rng = toks.groupBy("_rng").agg(F.sum("n_tokens").alias("_rng_sum"))
    w_rng = Window.orderBy("_rng").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_rng.select(
        "_rng",
        F.coalesce(F.sum("_rng_sum").over(w_rng), F.lit(0)).alias("_rng_off"),
    )
    w_doc = (
        Window.partitionBy("_rng")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = int(seq_tokens)
    return (
        toks.join(F.broadcast(offsets), "_rng")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (
                F.col("_rng_off")
                + F.coalesce(F.sum("n_tokens").over(w_doc), F.lit(0))
            ).alias("tok_offset"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.col("tok_offset"),
            F.expr(f"tok_offset div {s}").alias("seq_id"),
            (F.col("tok_offset") % s).alias("seq_pos"),
            (
                F.expr(f"(tok_offset + greatest(n_tokens, 1) - 1) div {s}")
                - F.expr(f"tok_offset div {s}")
                + F.lit(1)
            )
            .cast("long")
            .alias("n_seq_spans"),
        )
    )


def split_assign(
    docs: DataFrame,
    fracs_1e6: dict[str, int],
    group_col: str | None = None,
    id_col: str = "doc_id",
    stream: int = 113,
) -> DataFrame:
    """Deterministic train/val/test split assignment -> every input
    row tagged (id_col, split string) — the dataset-split step of a
    training pipeline, with optional group-level leakage safety.

    `fracs_1e6` maps split name -> parts-per-million and MUST sum to
    exactly 1,000,000; a row lands in the split whose cumulative
    interval (in the dict's listed order) contains hash(key) % 10^6.
    key = `group_col` when given (so ALL rows sharing a group —
    same user, same source domain, same near-dup cluster id — land in
    ONE split and can never leak train->test), else the row id.

    The hash is the universal affine family of functions/texthash.py
    (string keys go through the polynomial base hash first), so the
    assignment is a pure function of the key: partition-independent,
    reproducible across runs/engines/backfills, no RNG state — adding
    rows later never reassigns existing ones (the property a random
    split cannot give you).  Proportions are exact in expectation per
    stratum of any independent column; group-keyed splits are
    proportional in GROUPS, not rows (a heavy group drags its rows
    with it — that is the point).

    One narrow codegen projection, no shuffle, no Python.
    """
    from ..functions.texthash import P, affine_sql, poly_hash_spark

    total = sum(fracs_1e6.values())
    if total != 1_000_000:
        raise ValueError(f"fracs_1e6 must sum to 1000000, got {total}")
    key_col = group_col if group_col is not None else id_col
    dt = dict(docs.dtypes)[key_col]
    base = (
        poly_hash_spark(key_col)
        if dt == "string"
        else f"({key_col} % {P})"
    )
    h = f"({affine_sql(base, stream)} % 1000000)"
    cum = 0
    expr = None
    for name, frac in fracs_1e6.items():
        cum += int(frac)
        cond = F.expr(h) < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.select(F.col(id_col), expr.alias("split"))
