"""CorpusPipeline end-to-end: every planted defect is dropped at the
stage that owns it, resume skips committed stages, and the packed plan
covers exactly the train split."""

from __future__ import annotations

import pytest

from ts2g2_spark.functions.hashing import h64_py
from ts2g2_spark.plans.corpus import CorpusPipeline

EN = "the cat and of to is that with"  # en-marker spine for the lang gate


def _bucket(i: int) -> int:
    return h64_py(f"bench:{i}") % 1_000_000


def _good_text(tag: int) -> str:
    # 30 words, all-distinct filler + en spine, unique per tag
    filler = " ".join(f"w{tag}x{j}" for j in range(22))
    return f"{EN} {filler}"


@pytest.fixture(scope="module")
def corpus(spark):
    train = (i for i in range(2000) if _bucket(i) >= 50_000)
    bench_id = next(i for i in range(2000) if _bucket(i) < 50_000)

    ids = {}
    rows = []

    def add(name, text):
        ids[name] = next(train)
        rows.append((ids[name], text, "srcA"))

    add("good1", _good_text(1))
    add("good2", _good_text(2))
    add("good3", _good_text(3))
    # exact duplicate pair: same text, later id loses at `clean`
    add("exact_keep", _good_text(4))
    ids["exact_lose"] = next(train)
    rows.append((ids["exact_lose"], _good_text(4), "srcA"))
    # too short for the quality gate
    add("short", "the and of to is")
    # repetitive boilerplate: dup_2gram_frac ~ 0.97
    add("boiler", "the " * 40 + "and of to is that with")
    # bench doc: clean passes, excluded at decontamination as eval data
    bench_text = _good_text(9)
    ids["bench"] = bench_id
    rows.append((bench_id, bench_text, "srcA"))
    # contaminated: shares ~27/28 of its 3-grams with the bench doc
    add("contam", bench_text.rsplit(" ", 1)[0] + " changedtail")
    # near-dup pair (jaccard 27/29 ~ 0.93 on word-3-grams): higher id
    # loses at near_dedup
    near_text = _good_text(7)
    add("near_keep", near_text)
    add("near_lose", near_text.rsplit(" ", 1)[0] + " othertail")
    assert ids["near_lose"] > ids["near_keep"]

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    return df, ids


def test_stage_gates_drop_the_right_docs(spark, corpus, tmp_path):
    df, ids = corpus
    pipe = CorpusPipeline(spark, str(tmp_path / "cat"), run_id="c1",
                          pack_budget=40, pack_buckets=2)
    out = pipe.run(df, "corpus_fixture")

    clean_ids = {r["doc_id"] for r in out["clean"].collect()}
    assert ids["exact_lose"] not in clean_ids      # exact dup
    assert ids["exact_keep"] in clean_ids
    assert ids["short"] not in clean_ids           # quality gate
    assert ids["boiler"] not in clean_ids          # repetition gate
    assert ids["bench"] in clean_ids               # bench still clean

    decon_ids = {r["doc_id"] for r in out["decontaminated"].collect()}
    assert ids["bench"] not in decon_ids           # eval split excluded
    assert ids["contam"] not in decon_ids          # 3-gram overlap
    assert ids["good1"] in decon_ids

    dedup_ids = {r["doc_id"] for r in out["near_dedup"].collect()}
    assert ids["near_lose"] not in dedup_ids       # jaccard 0.93 pair
    assert ids["near_keep"] in dedup_ids
    expected = {ids[k] for k in
                ("good1", "good2", "good3", "exact_keep", "near_keep")}
    assert dedup_ids == expected

    # splits: disjoint+exhaustive over survivors; packed covers train
    splits = {r["doc_id"]: r["split"] for r in out["splits"].collect()}
    assert set(splits) == expected
    packed = {r["doc_id"]: r.asDict() for r in out["packed"].collect()}
    assert set(packed) == {d for d, s in splits.items() if s == "train"}
    assert all(0 <= r["seq_offset"] < 40 for r in packed.values())

    # lineage carries one row per executed stage (the dataset card)
    stages = {r["stage"] for r in out["lineage"].collect()}
    assert {"clean", "decontaminated", "near_dedup", "splits",
            "packed"} <= stages

    # datamix aggregates the final splits table
    mix = pipe.datamix().collect()
    assert sum(r["n_docs"] for r in mix) == len(expected)
    assert all(r["lang_pred"] == "en" for r in mix)


def test_corpus_pipeline_resume(spark, corpus, tmp_path):
    df, _ = corpus
    root = str(tmp_path / "cat2")
    p1 = CorpusPipeline(spark, root, run_id="r1")
    p1.run(df, "fixture", stop_after="decontaminated")
    assert [s["stage"] for s in p1.stage_log] == [
        "clean", "decontaminated"]
    before = p1.cat.read("decontaminated").toPandas().sort_values(
        "doc_id", ignore_index=True)[["doc_id", "text"]]

    p2 = CorpusPipeline(spark, root, run_id="r2")
    out = p2.run(df, "fixture")
    skipped = {s["stage"] for s in p2.stage_log if s.get("skipped")}
    assert skipped == {"clean", "decontaminated"}
    after = out["decontaminated"].toPandas().sort_values(
        "doc_id", ignore_index=True)[["doc_id", "text"]]
    assert before.equals(after)

    # changed policy -> different fingerprint -> full recompute
    p3 = CorpusPipeline(spark, root, run_id="r3", min_words=21)
    p3.run(df, "fixture")
    assert not any(s.get("skipped") for s in p3.stage_log)


def test_gated_bench_doc_still_poisons_bench_grams(spark, tmp_path):
    """An eval doc the quality gates discard must STILL contribute its
    grams to the bench set: a train doc copying it is an eval leak even
    though the eval doc never reaches the cleaned corpus (the
    contamination report runs over the raw input, not `clean`)."""
    train = (i for i in range(2000) if _bucket(i) >= 50_000)
    bench_id = next(i for i in range(2000) if _bucket(i) < 50_000)
    # bench doc: fails the min_words gate (8 words < 20)
    bench_text = "zeta eta theta iota kappa mu nu xi"
    leak_id = next(train)
    # train doc: passes every clean gate, embeds the bench doc verbatim
    leak_text = f"{EN} {bench_text} " + " ".join(
        f"q{j}" for j in range(14))
    clean_id = next(train)
    rows = [
        (bench_id, bench_text, "s"),
        (leak_id, leak_text, "s"),
        (clean_id, _good_text(99), "s"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    pipe = CorpusPipeline(spark, str(tmp_path / "cat4"), run_id="g1",
                          contamination_max=0.2)
    out = pipe.run(df, "gated_bench", stop_after="decontaminated")
    clean_ids = {r["doc_id"] for r in out["clean"].collect()}
    assert bench_id not in clean_ids          # gated out of the corpus
    assert leak_id in clean_ids               # passes quality gates
    decon_ids = {r["doc_id"] for r in out["decontaminated"].collect()}
    assert leak_id not in decon_ids           # ...but still a leak
    assert clean_id in decon_ids


def test_corpus_pipeline_no_near_dups_is_noop_stage(spark, tmp_path):
    rows = [(i, _good_text(i), "s") for i in range(40, 44)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    pipe = CorpusPipeline(spark, str(tmp_path / "cat3"), run_id="n1")
    out = pipe.run(df, "no_dups")
    survivors = {r["doc_id"] for r in out["near_dedup"].collect()}
    # everything train-side and distinct survives to the dedup output
    expected = {i for i in range(40, 44) if _bucket(i) >= 50_000}
    assert survivors == expected
