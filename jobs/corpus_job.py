"""spark-submit entry point for the corpus-cleaning pipeline.

The training-data twin of jobs/sjcs_job.py: clean a documents table
(quality gate + language gate + exact dedup + near-dup cluster
canonicalization), optionally scrub benchmark contamination, then
stratified-sample and chunk the survivors, with every stage
checkpointed through plans/pipeline.py so a restarted run skips
completed work.

  spark-submit --py-files dist/sjcs_spark.zip jobs/corpus_job.py \
      --documents /data/docs/*.parquet \
      --output /data/out/corpus \
      [--q-min 175] [--keep-langs en,de,fr,es] \
      [--benchmark /data/eval/*.parquet --decon-min-overlap 2] \
      [--sample en=500000 --sample-default 250000] \
      [--chunk-chars 256 --chunk-overlap 32]

Outputs under --output:
  clusters/        (doc_id, cluster_id) near-dup components — always
  survivors/       (doc_id, lang_pred, quality_1000)   — always
  decontaminated/  (doc_id, lang_pred, quality_1000)   — with --benchmark
  sampled/         (doc_id, lang_pred)                 — with --sample
  chunks/          (doc_id, chunk_idx, chunk_text, n_chars) — with --chunk-chars
  funnel JSON line on stdout                           — always

Each stage keys its resume token on the inputs AND its knobs (each
later stage also carries every earlier stage's knobs, since its input
set depends on them), so changing a knob recomputes exactly the stages
it affects.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

try:  # under spark-submit --py-files the zip is already on the path
    import spatialjoincountovershells_spark  # noqa: F401
except ModuleNotFoundError:  # direct `python jobs/corpus_job.py` from a checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_rates(spec: str | None) -> dict[str, int]:
    if not spec:
        return {}
    out = {}
    for item in spec.split(","):
        lang, rate = item.split("=")
        out[lang.strip()] = int(rate)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", nargs="+", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--q-min", type=int, default=175)
    ap.add_argument("--keep-langs", default="en,de,fr,es")
    ap.add_argument("--benchmark", nargs="+", default=None,
                    help="eval-set parquet path(s); survivors sharing >= "
                         "--decon-min-overlap distinct n-grams with any "
                         "benchmark doc are dropped")
    ap.add_argument("--decon-min-overlap", type=int, default=2)
    ap.add_argument("--decon-ngram", type=int, default=8)
    ap.add_argument("--sample", default=None,
                    help="lang=rate_1e6[,lang=rate_1e6...]")
    ap.add_argument("--sample-default", type=int, default=0,
                    help="rate_1e6 for languages absent from --sample")
    ap.add_argument("--chunk-chars", type=int, default=0,
                    help=">0 also writes chunks/ of the surviving docs")
    ap.add_argument("--chunk-overlap", type=int, default=32)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from spatialjoincountovershells_spark import (
        chunk_documents,
        corpus_clean,
        corpus_clean_stats,
        decontaminate,
        dedup_clusters,
        get_spark,
        minhash_lsh_pairs,
        stratified_sample,
    )
    from spatialjoincountovershells_spark.plans.pipeline import (
        resume_or_compute,
        resume_token,
    )

    spark = get_spark(app="corpus_job")
    docs = spark.read.parquet(*args.documents)
    keep = tuple(s.strip() for s in args.keep_langs.split(","))
    base = [sorted(args.documents), args.q_min, sorted(keep)]

    # the expensive iterative stage runs ONCE (and is itself resumable);
    # both the survivor table and the funnel row derive from it
    clusters = resume_or_compute(
        spark, os.path.join(args.output, "clusters"),
        resume_token(sorted(args.documents), "clusters"),
        lambda: dedup_clusters(minhash_lsh_pairs(docs)),
    )
    surv = resume_or_compute(
        spark, os.path.join(args.output, "survivors"), resume_token(*base),
        lambda: corpus_clean(
            docs, q_min=args.q_min, keep_langs=keep, clusters=clusters
        ),
    )
    funnel_df = resume_or_compute(
        spark, os.path.join(args.output, "funnel"),
        resume_token(*base, "funnel"),
        lambda: corpus_clean_stats(
            docs, q_min=args.q_min, keep_langs=keep, clusters=clusters
        ),
    )
    funnel = funnel_df.collect()[0].asDict()
    print(json.dumps({"stage": "funnel", **funnel}))

    kept = surv
    stage_knobs: list = []
    if args.benchmark:
        # benchmark decontamination: drop survivors sharing n-grams
        # with the eval set.  Runs over SURVIVORS only (the post-gate
        # subset), so the shingle fan-out never touches dropped docs.
        decon_knobs = [sorted(args.benchmark), args.decon_min_overlap,
                       args.decon_ngram]
        bench = spark.read.parquet(*args.benchmark)
        clean_ids = decontaminate(
            docs.join(surv.select("doc_id"), "doc_id").select("doc_id", "text"),
            bench, n=args.decon_ngram, min_overlap=args.decon_min_overlap,
        ).where(F.col("contaminated") == 0).select("doc_id")
        kept = resume_or_compute(
            spark, os.path.join(args.output, "decontaminated"),
            resume_token(*base, *decon_knobs),
            lambda: surv.join(clean_ids, "doc_id"),
        )
        stage_knobs += decon_knobs
        print(json.dumps({"stage": "decontaminated", "rows": kept.count()}))

    if args.sample:
        rates = parse_rates(args.sample)
        sample_knobs = [sorted(rates.items()), args.sample_default]
        sampled_ids = stratified_sample(
            docs, rates, default_rate_1e6=args.sample_default
        ).select("doc_id")
        pre_sample = kept
        kept = resume_or_compute(
            spark, os.path.join(args.output, "sampled"),
            resume_token(*base, *stage_knobs, *sample_knobs),
            lambda: pre_sample.join(sampled_ids, "doc_id").select(
                "doc_id", "lang_pred"
            ),
        )
        stage_knobs += sample_knobs
        print(json.dumps({"stage": "sampled", "rows": kept.count()}))

    if args.chunk_chars > 0:
        # the chunks token carries every upstream stage's knobs too:
        # chunks are cut from the post-decon/post-sample doc set, so a
        # rate change must invalidate this stage, not resume a
        # checkpoint of the old selection
        chunks = resume_or_compute(
            spark, os.path.join(args.output, "chunks"),
            resume_token(*base, *stage_knobs, args.chunk_chars,
                         args.chunk_overlap),
            lambda: chunk_documents(
                docs.join(kept.select("doc_id"), "doc_id").select(
                    "doc_id", "text"
                ),
                chunk_chars=args.chunk_chars, overlap=args.chunk_overlap,
            ),
        )
        print(json.dumps({"stage": "chunks", "rows": chunks.count()}))

    print(json.dumps({
        "stage": "done", "output": args.output,
        "survivors": int(funnel["n_survivors"]),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
