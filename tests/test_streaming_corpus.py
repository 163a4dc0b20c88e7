"""Streaming corpus curation: quality gate + exact and SimHash near-dup
suppression against ALL previously accepted documents (cross-batch state),
in one band-keyed applyInPandasWithState operator."""

from __future__ import annotations

import os

from tests.test_streaming import _write_chunk, stream_env  # noqa: F401

from log_analysis_system_spark.streaming.corpus import (
    curate_doc_stream,
    parse_doc_stream,
)

BASE_MS = 1704067200000

A = "the quick brown fox jumps over the lazy dog near the river bank today"
A_NEAR = "the quick brown fox jumps over the lazy dog near the river bank tonight"
B = "completely different content about database engines and vectorized execution plans"
C = "a third document discussing streaming watermarks and stateful operators in depth"
JUNK = "!!!! 1234 @@@@ ####"


def _doc(doc_id: int, offset_s: int, text: str) -> str:
    return f"{doc_id}\t{BASE_MS + offset_s * 1000}\t{text}"


def test_streaming_curation_dedup_and_quality(spark, stream_env):  # noqa: F811
    _write_chunk(
        stream_env["input"],
        "b1.txt",
        [
            _doc(1, 0, A),
            _doc(2, 1, A),      # exact duplicate (same batch) -> dropped
            _doc(3, 2, B),      # distinct -> kept
            _doc(4, 3, JUNK),   # quality 0.0 -> gated out
        ],
    )
    raw = spark.readStream.format("text").load(stream_env["input"])
    curated = curate_doc_stream(parse_doc_stream(raw))
    q = (
        curated.writeStream.format("memory")
        .queryName("corpus_sink")
        .outputMode("append")
        .option("checkpointLocation", stream_env["ckpt"])
        .start()
    )
    q.processAllAvailable()
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM corpus_sink").collect()}
    assert got == {1, 3}, got

    # batch 2: a near-duplicate of doc 1 (hamming 1) arrives in a LATER
    # batch -> suppressed by accepted-history state; a new doc passes.
    _write_chunk(
        stream_env["input"],
        "b2.txt",
        [_doc(5, 100, A_NEAR), _doc(6, 101, C)],
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r["doc_id"]: (r["simhash"], r["quality"])
        for r in spark.sql("SELECT * FROM corpus_sink").collect()
    }
    assert set(rows) == {1, 3, 6}, rows
    assert all(q >= 0.3 for _, q in rows.values())


def test_streaming_gopher_screen_matches_batch(spark, stream_env, tmp_path):  # noqa: F811
    """Stream/batch parity for the Gopher rule screen: the same
    documents fed through the stateless streaming projection must carry
    byte-identical per-rule verdicts as the batch
    `gopher_quality_rules` query over an equivalent parquet table."""
    from log_analysis_system_spark.queries.text_analysis import (
        q_gopher_quality_rules,
    )
    from log_analysis_system_spark.streaming.corpus import gopher_rules_expr

    texts = {
        11: ("the cat is on a mat and it sat there for a while watching "
             + " ".join(f"bird{i}" for i in range(40))),
        12: "too short for the word count rule",
        13: "the a " + " ".join(f"#t{i}" for i in range(58)),
    }
    _write_chunk(
        stream_env["input"],
        "g1.txt",
        [_doc(i, i, t) for i, t in texts.items()],
    )
    raw = spark.readStream.format("text").load(stream_env["input"])
    screened = parse_doc_stream(raw).withColumn(
        "rules", gopher_rules_expr()
    ).select("doc_id", "rules.*")
    q = (
        screened.writeStream.format("memory")
        .queryName("gopher_sink")
        .outputMode("append")
        .option("checkpointLocation", stream_env["ckpt"])
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream_rows = {
        r["doc_id"]: tuple(r)[1:]
        for r in spark.sql("SELECT * FROM gopher_sink").collect()
    }

    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", 0) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    batch_rows = {
        r["doc_id"]: (
            r["rule_word_count"], r["rule_mean_word_len"],
            r["rule_symbol_ratio"], r["rule_alpha_words"],
            r["rule_stopwords"], r["pass"],
        )
        for r in q_gopher_quality_rules(spark, d).collect()
    }
    assert stream_rows == batch_rows
    assert batch_rows[11][-1] is True         # clean doc passes
    assert batch_rows[12][0] is False         # word-count violator
    assert batch_rows[13][2] is False         # symbol-ratio violator
