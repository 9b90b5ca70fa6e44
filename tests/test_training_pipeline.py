"""The capstone composition (training_pipeline) must genuinely exercise
every stage on the sf corpus — a stage that drops nothing is a stage the
oracle hash cannot see. Plus the plan gates: the kept frame is persisted
for the mix's two consumers, and no Python anywhere."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_every_stage_drops_rows_and_both_mix_branches_fire(spark):
    from logparser_llm_spark.functions.text import token_count_ws
    from logparser_llm_spark.operators.decontaminate import decontaminate
    from logparser_llm_spark.operators.dedup import dedup_exact
    from logparser_llm_spark.plans.queries import (
        MIX_FRACTIONS,
        MIX_TOTAL,
        QUERIES,
        TP_MIN_TOKENS,
        _decon_bench,
        _read,
    )

    base = _read(spark, SF, "documents").select("doc_id", "text", "lang", "source")
    d = base.unionByName(
        base.where(F.col("doc_id") % 13 == 0).select(
            (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
            "text", "lang", "source",
        )
    )
    n0 = d.count()
    reps = dedup_exact(d, "doc_id", "text").select(F.col("rep_id").alias("doc_id"))
    deduped = d.join(reps, "doc_id")
    n1 = deduped.count()
    assert n1 < n0, "exact dedup dropped nothing — no planted dups?"
    # the planted copies (ids >= 10^6) must all die at dedup: their
    # originals have the smaller id for the same md5(text)
    assert deduped.where(F.col("doc_id") >= 1_000_000).count() == 0

    verdicts = decontaminate(
        deduped, "doc_id", "text", _decon_bench(spark, SF), "bench_text"
    )
    clean = verdicts.where(~F.col("contaminated"))
    n2 = clean.count()
    assert n2 < n1, "decontamination dropped nothing"

    kept = clean.where(token_count_ws(F.col("text")) >= TP_MIN_TOKENS)
    n3 = kept.count()
    assert n3 < n2, "the quality floor dropped nothing"

    out = {
        r["lang"]: r for r in QUERIES["training_pipeline"][0](spark, SF).collect()
    }
    # unlisted languages (es on this corpus) are excluded entirely
    assert set(out) == set(MIX_FRACTIONS)
    avail = {
        r["lang"]: r["cnt"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    quota = {
        k: (int(round(f * 1_000_000)) * MIX_TOTAL) // 1_000_000
        for k, f in MIX_FRACTIONS.items()
    }
    # the truncation branch: en overflows its quota and is cut to it
    assert out["en"]["n_docs"] == quota["en"] < avail["en"]
    # the keep-all branch: at least one listed language is short
    assert any(
        avail[k] < quota[k] and out[k]["n_docs"] == avail[k] for k in MIX_FRACTIONS
    )
    spark.catalog.clearCache()


def test_plan_persists_kept_frame_and_stays_jvm(spark):
    from logparser_llm_spark.plans.inspect import physical_plan, plan_facts
    from logparser_llm_spark.plans.queries import QUERIES

    df = QUERIES["training_pipeline"][0](spark, SF)
    # the kept frame feeds both the quota counts (already collected at
    # build time) and the window rank — the returned plan must read the
    # cache, not recompute dedup+decon+floor
    assert "InMemoryTableScan" in physical_plan(df)
    assert not plan_facts(df)["python_udf"]
    spark.catalog.clearCache()


# --- dataset_card capstone ---------------------------------------------------


def test_dataset_card_component_laws(spark):
    """Per source: n_kept <= n_docs with dup_share the exact integer
    complement; the trimmed length must sit FAR below the raw mean
    (the included x100 spam class proves robustness inside the card);
    vocab types positive and types_per_doc the exact division."""
    from pyspark.sql import functions as F2

    from logparser_llm_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["dataset_card"][0](spark, sf).collect()
    assert len(rows) == 20
    raw = {r["source"]: r["m"] for r in (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("source",
                F2.when(F2.expr("(doc_id div 20) % 17 = 0"),
                        F2.col("n_chars") * 100)
                .otherwise(F2.col("n_chars")).alias("len"))
        .groupBy("source").agg(F2.avg("len").alias("m")).collect())}
    for r in rows:
        assert 0 < r["n_kept"] <= r["n_docs"]
        assert r["dup_share_e6"] == (
            (r["n_docs"] - r["n_kept"]) * 1_000_000 // r["n_docs"])
        assert raw[r["source"]] * 1_000_000 > 2 * r["trimmed_len_e6"]
        assert r["vocab_types"] > 0
        assert r["types_per_doc_e3"] == (
            r["vocab_types"] * 1000 // r["n_docs"])
