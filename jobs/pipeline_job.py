#!/usr/bin/env python
"""spark-submit entry point for the training-data pipeline ops —
the batch hygiene counterpart of build_job.py. Runs one pipeline
stage over a documents-shaped parquet directory, writes the result
as parquet, and prints ONE JSON metrics line (rows in/out + stage
specifics) for the orchestrator to record as per-run lineage.

Usage (after `python jobs/package.py`):

    spark-submit --py-files dist/lucene_solr_spark.zip jobs/pipeline_job.py \\
        dedup    --sf-dir /data/sf --out /data/keep        # exact keep-one
    ... clusters --sf-dir /data/sf --out /data/clusters    # CC over near-dup graph
    ... sample   --sf-dir /data/sf --out /data/sampled     # stratified, reproducible
    ... pack     --sf-dir /data/sf --out /data/bins        # token-budget packing

Every stage is deterministic (hash-seeded sampling, pinned Jaccard
thresholds), so re-running a failed stage is a safe resume — the
output parquet is only moved into place after the write completes
(Spark's committer), matching the index build's nothing-is-real-
until-committed contract.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("dedup", "clusters", "sample", "pack", "filter",
                 "substring", "semdedup", "decontaminate", "dsir",
                 "classify-filter", "ppl-filter", "bpe-train", "chunk"):
        p = sub.add_parser(name)
        p.add_argument("--sf-dir", required=True)
        p.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators import textpipe

    spark = SparkSession.builder.appName(
        f"lucene_solr_spark-pipeline-{args.cmd}"
    ).getOrCreate()
    t0 = time.perf_counter()
    n_in = spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()

    if args.cmd == "dedup":
        # exact keep-one: lowest doc_id per content hash survives
        c = textpipe.corpus_df(spark, args.sf_dir)
        w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
        out = (
            c.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
    elif args.cmd == "chunk":
        # sliding-window chunking (64-token windows, stride 48) — the
        # RAG/pretraining chunk stage; narrow scan-side pass
        out = textpipe.q_chunk_windows(spark, args.sf_dir)
    elif args.cmd == "clusters":
        out = textpipe.q_dedup_clusters(spark, args.sf_dir)
    elif args.cmd == "sample":
        out = textpipe.q_sample_stratified(spark, args.sf_dir)
    elif args.cmd == "filter":
        # hygiene stage: drop repetitious / degenerate docs (Gopher-style
        # keep flags from q_quality_repetition; <2-token docs have no
        # flag row and drop too)
        c = textpipe.corpus_df(spark, args.sf_dir)
        rep = textpipe.q_quality_repetition(spark, args.sf_dir).select(
            "doc_id", "keep"
        )
        out = (
            c.join(rep, "doc_id", "left")
            .filter(F.coalesce("keep", F.lit(False)))
            .drop("keep")
        )
    elif args.cmd == "substring":
        # span-dedup KEEP stage: drop every doc that shares a verbatim
        # 20-token window with a LOWER-id doc (the Lee-et-al contract:
        # repeated spans are removed once, first occurrence survives)
        c = textpipe.corpus_df(spark, args.sf_dir)
        drops = (
            textpipe.q_dedup_substring(spark, args.sf_dir)
            .select(F.col("b").alias("doc_id"))
            .distinct()
        )
        out = c.join(drops, "doc_id", "left_anti")
    elif args.cmd == "semdedup":
        # SemDeDup KEEP stage over the embedding table: emits the kept
        # vec_ids (per-cluster greedy at cos >= 0.9, farthest-from-
        # centroid representative survives)
        out = (
            textpipe.q_dedup_semantic(spark, args.sf_dir)
            .filter("kept")
            .select("vec_id", "cid")
        )
    elif args.cmd == "decontaminate":
        # eval-contamination KEEP stage: drop docs whose max shingle
        # Jaccard against any benchmark doc reaches 0.3 (fuzzy) OR that
        # ARE benchmark docs (never train on the eval set itself)
        c = textpipe.corpus_df(spark, args.sf_dir)
        dirty = textpipe.q_decontaminate_fuzzy(spark, args.sf_dir).select(
            "doc_id"
        )
        out = c.filter(F.col("doc_id") % 17 != 0).join(
            dirty, "doc_id", "left_anti"
        )
    elif args.cmd == "dsir":
        # DSIR KEEP stage: keep the half of the corpus whose
        # hashed-bigram importance weight toward the target domain is
        # highest — rates derived from the weight distribution (the
        # median as an inclusive 4dp cutoff, deterministic), applied as
        # a narrow filter; <2-token docs carry no weight and drop
        d = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        wts = textpipe.dsir_weights(spark, args.sf_dir)
        cut = wts.approxQuantile("weight", [0.5], 0.0)[0]
        out = d.join(
            wts.filter(F.col("weight") >= cut).select("doc_id"), "doc_id"
        )
    elif args.cmd == "classify-filter":
        # model-based quality filter: train the pinned logistic model
        # on the transcripts labels, score every TURN with the
        # published 4dp weights, keep turns with prob >= 0.5 (the
        # fasttext-style quality-classifier gate of CCNet/RefinedWeb
        # pipelines, distributed end to end)
        from lucene_solr_spark.operators import learning

        feats = learning._labeled(spark, args.sf_dir)
        model = learning._gd_weights(feats).select(
            F.transform("ws", lambda v: F.round(v, 4)).alias("ws")
        )
        prob = 1.0 / (1.0 + F.exp(-learning._dot("xs", "ws")))
        scored = feats.join(F.broadcast(model)).withColumn(
            "prob", F.round(prob, 4)
        )
        # gate at the corpus mean score (4dp): with a 25% positive
        # base rate the absolute-0.5 gate would keep nothing — the
        # above-average rule is the calibration-free keep criterion
        cut = F.broadcast(
            scored.agg(F.round(F.avg("prob"), 4).alias("cut"))
        )
        out = (
            scored.join(cut)
            .filter(F.col("prob") >= F.col("cut"))
            .select("conv_id", "turn_idx", "prob")
        )
    elif args.cmd == "ppl-filter":
        # CCNet perplexity KEEP stage: drop the worst (tail) tercile of
        # the self-LM NLL distribution — the paper keeps head+middle;
        # boundaries broadcast, assignment narrow; <2-token docs carry
        # no nll row and drop
        d = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        keep = (
            textpipe.q_quality_ppl_buckets(spark, args.sf_dir)
            .filter(F.col("bucket") != "tail")
            .select("doc_id")
        )
        out = d.join(keep, "doc_id")
    elif args.cmd == "bpe-train":
        # tokenizer-training artifact: the learned merge table (step,
        # lhs, rhs, merged, cnt) — the subword vocabulary downstream
        # tokenize/pack stages consume
        out = textpipe.q_bpe_train(spark, args.sf_dir)
    else:  # pack
        out = textpipe.q_pack_sequences(spark, args.sf_dir)

    out.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    st = {
        "cmd": args.cmd,
        "rows_in": n_in,
        "rows_out": n_out,
        "out": args.out,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    print(json.dumps(st))
    return st


if __name__ == "__main__":
    main()
