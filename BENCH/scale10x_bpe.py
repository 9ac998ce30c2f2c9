"""10x addendum: distributed BPE at one decade up (r5).

The 100-TB-side BPE op is `apply_bpe` — a map-only mapInPandas pass over
the corpus with a tiny merge table in the closure — while `learn_bpe`
runs on a hash sample (merge ranking is a frequency estimate; the
standard web-scale posture).  This run exercises exactly that split at
the scale10x input size: learn 4 merges on a 1% deterministic hash
sample of 6M docs, then re-tokenize ALL ~1.9B tokens and fully
materialize the result (noop sink, all columns).

Appends a stage row + note to BENCH/SCALE10X.md; JSON on stdout.

Run:  SPARK_DRIVER_MEM=48g python BENCH/scale10x_bpe.py
(env: SCALE10X_DOCS, SCALE10X_DIR shared with scale10x.py — reuses the
on-disk tokenized parquet when present).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SCALE10X_DOCS", "6000000"))
DATA_DIR = os.environ.get("SCALE10X_DIR", "/tmp/ts2g2_scale10x")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from ts2g2_spark import datagen
    from ts2g2_spark.operators import bpe
    from ts2g2_spark.session import get_spark

    spark = get_spark(app_name="scale10x_bpe", parallelism=CPUS,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    tok_dir = os.path.join(DATA_DIR, f"tokens_{N_DOCS}")
    if not os.path.exists(os.path.join(tok_dir, "_SUCCESS")):
        t0 = time.time()
        datagen.tokenized_sequences(
            spark, N_DOCS, seed=42, gap_p=0.02
        ).write.mode("overwrite").parquet(tok_dir)
        print(json.dumps({"stage": "gen_tokens",
                          "sec": round(time.time() - t0, 1)}), flush=True)
    toks = spark.read.parquet(tok_dir)
    n_points = toks.selectExpr("sum(n_tok)").collect()[0][0]

    t0 = time.time()
    merges = bpe.learn_bpe(toks, n_merges=4, new_id_start=40000,
                           sample_fraction=0.01)
    mrows = [(r.rank, r.tok_a, r.tok_b, r.new_id, r.pair_count)
             for r in merges.orderBy("rank").collect()]
    learn_s = round(time.time() - t0, 1)

    t0 = time.time()
    out = bpe.apply_bpe(toks, merges)
    out.write.format("noop").mode("overwrite").save()
    apply_s = round(time.time() - t0, 1)
    n_out = out.selectExpr("sum(n_tok)").collect()[0][0]

    result = {
        "n_docs": N_DOCS,
        "n_points": int(n_points),
        "learn_sample_frac": 0.01,
        "n_merges": len(mrows),
        "merges": mrows,
        "learn_sec": learn_s,
        "apply_sec": apply_s,
        "apply_tokens_per_sec": int(n_points / apply_s),
        "tokens_after": int(n_out),
        "cpus": CPUS,
    }
    print(json.dumps(result), flush=True)

    md_path = os.path.join(REPO, "BENCH", "SCALE10X.md")
    with open(md_path) as f:
        md = f.read()
    marker = "## BPE one decade up (r5 addendum)"
    addendum = f"""

{marker}

`BENCH/scale10x_bpe.py`, same {N_DOCS:,}-doc / {int(n_points):,}-token
input: `learn_bpe` (4 merges, fused one-job-per-merge) on a 1%
deterministic hash sample took {learn_s}s; `apply_bpe` then re-tokenized
the FULL corpus — one map-only mapInPandas pass, zero exchanges, merge
table in the task closure — in {apply_s}s
(**{int(n_points / apply_s):,} tokens/s**), every output column
materialized ({int(n_out):,} tokens after merging).  This is the
100-TB split the operator documents: vocabulary induction is
sample-sized, corpus re-tokenization is embarrassingly parallel and
scales with executor count like any map-only scan.
"""
    if marker not in md:
        with open(md_path, "w") as f:
            f.write(md.rstrip() + "\n" + addendum)
    spark.stop()


if __name__ == "__main__":
    main()
