"""Training-prep operators: fixture-level semantics (PII redaction hits,
packing invariants, decontamination matching) plus the 100 TB plan shapes.
The corpus-level value parity is covered by the DuckDB oracles
(test_oracle_parity / driver_sim); these tests pin behaviors the synthetic
corpus cannot exercise — it contains no PII, so the redaction regexes are
driven over crafted rows here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_system_spark.queries import QUERIES, load_all
from log_analysis_system_spark.queries.training_prep import (
    DECON_N,
    EVAL_SOURCES,
    PACK_BUDGET,
    _word_ngrams,
    redact_pii,
)
from tests.conftest import SF_DIR

load_all()


def plan_of(spark, name: str) -> str:
    return (
        QUERIES[name](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


# ------------------------------------------------------------ PII redact


def test_redact_pii_hits(spark):
    rows = [
        (1, "contact bob.smith+x@mail.example.org for details"),
        (2, "server at 10.0.255.7 responded"),
        (3, "card 4111111111111111 and ssn 123456789 leaked"),
        (4, "clean text with no identifiers at all"),
        (5, "mix a@b.co then 192.168.1.1 then 999999999 end"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r.id: r.red
        for r in df.select(
            "id", redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    assert out[1] == "contact <EMAIL> for details"
    assert out[2] == "server at <IP> responded"
    assert out[3] == "card <NUM> and ssn <NUM> leaked"
    assert out[4] == rows[3][1]
    assert out[5] == "mix <EMAIL> then <IP> then <NUM> end"


def test_redact_pii_ip_not_eaten_by_digit_run(spark):
    # an IPv4 must become one <IP>, never a partial <NUM> mangle
    df = spark.createDataFrame([(1, "255.255.255.255")], ["id", "text"])
    assert (
        df.select(redact_pii(F.col("text")).alias("r")).first().r == "<IP>"
    )


# ------------------------------------------------------- sequence packing


def test_pack_sequences_invariants(spark):
    rows = QUERIES["pack_sequences"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.shard_offset < PACK_BUDGET
    # per-lang: shard_id non-decreasing in doc_id order, starts at 0
    by_lang: dict = {}
    for r in sorted(rows, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for lang, docs in by_lang.items():
        assert docs[0].shard_id == 0 and docs[0].shard_offset == 0
        cum = 0
        for d in docs:
            assert d.shard_id == cum // PACK_BUDGET, (lang, d)
            assert d.shard_offset == cum % PACK_BUDGET
            cum += d.n_tokens


# ------------------------------------------------------- decontamination


def test_decontaminate_matches_planted_overlap(spark):
    eval_src, train_src = EVAL_SOURCES[0], "train"
    shared = " ".join(f"tok{i}" for i in range(DECON_N))
    rows = [
        (1, eval_src, f"prefix {shared} suffix words here"),
        (2, train_src, f"unrelated opening {shared} trailing text"),
        (3, train_src, "completely different words with no overlap at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    grams = docs.select(
        "doc_id", "source", F.explode(_word_ngrams(DECON_N)).alias("gram")
    )
    eval_grams = (
        grams.where(F.col("source").isin(*EVAL_SOURCES))
        .select("gram")
        .distinct()
    )
    hits = (
        grams.where(~F.col("source").isin(*EVAL_SOURCES))
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r.doc_id for r in hits} == {2}
    assert hits[0].n == 1  # exactly the planted 5-gram


def test_short_docs_carry_no_grams(spark):
    df = spark.createDataFrame(
        [(1, "too short")], ["doc_id", "text"]
    ).select(F.size(_word_ngrams(DECON_N)).alias("n"))
    assert df.first().n == 0


# ---------------------------------------------------------- plan shapes


def test_decontaminate_broadcasts_eval_grams(spark):
    """The benchmark side is small by construction — the gram join must
    broadcast it so the corpus side never shuffles."""
    plan = plan_of(spark, "decontaminate_ngram")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def _assert_windows_are_slice_bounded(plan: str) -> None:
    """Every window spec must key on the synthetic range-slice id (__pid),
    never the bare lang — a bare-group window makes each language ONE task
    regardless of cluster size."""
    for frag in plan.split("windowspecdefinition(")[1:]:
        keys = frag.split("specifiedwindowframe")[0]
        assert "__pid" in keys, f"window not slice-bounded: {keys[:120]}"


def test_pack_sequences_slice_bounded_scan(spark):
    """No single-partition funnel and every visible window keys on the
    range-slice id. (The checkpoint truncates the executed plan, so the
    full grouped_prefix_sum shape is gated below on the un-checkpointed
    operator plan.)"""
    plan = plan_of(spark, "pack_sequences")
    assert "SinglePartition" not in plan
    _assert_windows_are_slice_bounded(plan)


def test_quality_deciles_slice_bounded(spark):
    plan = plan_of(spark, "quality_deciles")
    assert "SinglePartition" not in plan
    _assert_windows_are_slice_bounded(plan)


def test_grouped_prefix_sum_plan_shape(spark):
    """The operator's full (un-checkpointed) plan: one range exchange, the
    running-sum window keyed on (__pid, group) — never the bare group —
    and the offset lift joined back as a broadcast."""
    from pyspark.sql import functions as SF

    from log_analysis_system_spark.operators.sampling import grouped_prefix_sum

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(
        "doc_id", "lang", SF.size(SF.split("text", " ")).cast("long").alias("n")
    )
    out = grouped_prefix_sum(
        toks, ["lang"], [SF.asc("doc_id")], SF.col("n"), "cum",
        checkpoint=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower().replace(" ", "")
    _assert_windows_are_slice_bounded(plan)
    assert "windowspecdefinition" in plan  # the window IS present to check
    assert "BroadcastHashJoin" in plan


def test_boilerplate_two_hash_aggs(spark):
    """df-threshold detection is explode + hash aggregate — partials must
    combine map-side and no sort may appear."""
    plan = plan_of(spark, "boilerplate_ngrams")
    assert "HashAggregate" in plan
    assert "Sort " not in plan


def test_pii_redact_zero_shuffle(spark):
    plan = plan_of(spark, "pii_redact")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
