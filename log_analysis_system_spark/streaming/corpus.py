"""Streaming corpus curation — the stream twin of ``queries/corpus_pipeline.py``.

A training-data ingest front door: documents arrive continuously, and each
must pass (1) a quality gate, (2) exact-duplicate suppression against
everything already accepted, and (3) near-duplicate suppression (SimHash
Hamming distance) against everything already accepted — not just within the
current micro-batch. Not present in the reference (its streaming job is ad
analytics); this composes the engine's batch text operators with Structured
Streaming state.

Design for scale:
- The quality gate and the SimHash fingerprint are STATELESS row projections
  (codegen'd HOF folds — no explode, no shuffle) applied before any state.
- Dedup state lives in ONE ``applyInPandasWithState`` operator keyed by the
  fingerprint's top ``BAND_BITS`` bits. Exact and near dedup share it: an
  exact duplicate has an identical fingerprint, hence an identical band, so
  both checks happen inside the accepting band's group. One stateful
  operator also sidesteps the multi-stateful-operator chaining restrictions.
- Near-dup candidates are only compared WITHIN a band (2^BAND_BITS shuffle
  groups): a doc whose true near-duplicate lands in another band is missed —
  the standard LSH trade; raise BAND overlap by lowering BAND_BITS.
- State per band is a bounded FIFO of (md5, simhash) pairs (``cap``): at
  100 TB/day you bound memory by eviction (oldest first) or state TTL, and
  accept the documented recall loss on evicted history.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SIMHASH_BITS = 16
BAND_BITS = 4
DEFAULT_MAX_HAMMING = 3
DEFAULT_MIN_QUALITY = 0.3
DEFAULT_CAP = 4096


def parse_doc_stream(raw: DataFrame) -> DataFrame:
    """Parse 'doc_id<TAB>epoch_ms<TAB>text' lines (the fixture producer's
    format, mirroring the ad stream's space-delimited contract)."""
    p = F.split(F.col("value"), "\t")
    return raw.select(
        p.getItem(0).cast("long").alias("doc_id"),
        F.timestamp_millis(p.getItem(1).cast("long")).alias("ts"),
        p.getItem(2).alias("text"),
    )


def quality_expr() -> F.Column:
    """Stateless quality score in [0,1]: length band + alpha ratio + stopword
    presence (the batch `quality_score` feature family, row-wise)."""
    n_chars = F.length("text")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    alpha_ratio = (
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z ]", "")) + F.lit(0.0)
    ) / F.greatest(n_chars, F.lit(1))
    has_stop = F.arrays_overlap(
        words, F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "in")])
    )
    return F.round(
        F.when((n_chars >= 20) & (n_chars <= 10_000), 0.4).otherwise(0.0)
        + alpha_ratio * 0.4
        + F.when(has_stop, 0.2).otherwise(0.0),
        4,
    )


def simhash_expr() -> F.Column:
    """Row-wise 16-bit SimHash: per-word 60-bit md5 hash, per-bit +-1 votes
    (term-frequency weighted, matching batch `dedup_simhash`), sign bits
    packed. Pure projection — every fold runs inside the row, no explode."""
    whs = (
        "transform(split(text, ' '), w -> "
        "cast(conv(substring(md5(cast(w as binary)), 1, 15), 16, 10) as bigint))"
    )
    bits = " + ".join(
        f"(CASE WHEN aggregate({whs}, 0L, (acc, h) -> acc + "
        f"IF((shiftright(h, {j}) & 1) = 1, 1, -1)) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0L END)"
        for j in range(SIMHASH_BITS)
    )
    return F.expr(bits)


def curate_doc_stream(
    parsed: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    max_hamming: int = DEFAULT_MAX_HAMMING,
    cap: int = DEFAULT_CAP,
) -> DataFrame:
    """Quality-gate then dedup a parsed document stream against ALL
    previously accepted documents (exact md5 + SimHash near-dup), emitting
    only accepted rows (doc_id, ts, simhash, quality)."""
    scored = (
        parsed.withColumn("quality", quality_expr())
        .where(F.col("quality") >= min_quality)
        .withColumn("simhash", simhash_expr())
        .withColumn("band", F.shiftright("simhash", SIMHASH_BITS - BAND_BITS))
        .withColumn("md5", F.md5(F.col("text").cast("binary")))
    )

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        seen_md5: list
        seen_sh: list
        if state.exists:
            seen_md5, seen_sh = list(state.get[0]), list(state.get[1])
        else:
            seen_md5, seen_sh = [], []
        out = []
        for pdf in pdfs:
            # arrival order within the batch is made deterministic by doc_id
            pdf = pdf.sort_values("doc_id")
            for row in pdf.itertuples(index=False):
                if row.md5 in seen_md5:
                    continue  # exact duplicate of accepted history
                sh = int(row.simhash)
                near = any(
                    bin(sh ^ int(prev)).count("1") <= max_hamming
                    for prev in seen_sh
                )
                if near:
                    continue
                seen_md5.append(row.md5)
                seen_sh.append(sh)
                if len(seen_md5) > cap:  # bounded state: FIFO eviction
                    seen_md5.pop(0)
                    seen_sh.pop(0)
                out.append((row.doc_id, row.ts, sh, float(row.quality)))
        state.update((seen_md5, seen_sh))
        if out:
            yield pd.DataFrame(
                out, columns=["doc_id", "ts", "simhash", "quality"]
            )

    return (
        scored.select("band", "doc_id", "ts", "simhash", "quality", "md5")
        .groupBy("band")
        .applyInPandasWithState(
            fold,
            outputStructType=(
                "doc_id long, ts timestamp, simhash long, quality double"
            ),
            stateStructType="md5s array<string>, simhashes array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def gopher_rules_expr(text_col: str = "text") -> F.Column:
    """Streaming twin of the batch `gopher_quality_rules` screen: the
    five Gopher rule verdicts + their conjunction as ONE stateless
    struct projection (rules are per-row facts, so the stream operator
    is a pure map — no state, no watermark; thresholds and integer
    cross-product comparisons are imported from the batch query so the
    two tiers can never drift apart). Attach with
    ``.withColumn("rules", gopher_rules_expr())`` before the stateful
    curation stage and gate on ``rules.pass``."""
    from ..queries.text_analysis import (
        _EN_STOPWORDS,
        GOPHER_ALPHA_MIN_PPM,
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_WORDS,
        GOPHER_SYMBOL_MAX_PPM,
    )

    toks = F.split(F.col(text_col), " ")
    n_words = F.size(toks).cast("long")
    n_chars = F.length(F.array_join(toks, "")).cast("long")
    n_symbol = F.size(
        F.filter(toks, lambda t: t.contains("#") | t.contains("..."))
    ).cast("long")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("long")
    n_stop = F.size(
        F.array_distinct(F.filter(toks, lambda t: t.isin(*_EN_STOPWORDS)))
    ).cast("long")
    r_wc = n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    r_len = (n_chars >= GOPHER_MIN_MEAN_LEN * n_words) & (
        n_chars <= GOPHER_MAX_MEAN_LEN * n_words
    )
    r_sym = n_symbol * 1_000_000 <= GOPHER_SYMBOL_MAX_PPM * n_words
    r_alpha = n_alpha * 1_000_000 >= GOPHER_ALPHA_MIN_PPM * n_words
    r_stop = n_stop >= GOPHER_MIN_STOP_HITS
    return F.struct(
        r_wc.alias("rule_word_count"),
        r_len.alias("rule_mean_word_len"),
        r_sym.alias("rule_symbol_ratio"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (r_wc & r_len & r_sym & r_alpha & r_stop).alias("pass"),
    )
