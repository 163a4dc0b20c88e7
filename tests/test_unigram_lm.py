"""Unigram-LM tokenizer training must match a pure-Python canonical
reference (Kudo-2018 fixed-schedule variant as specified in
queries/unigram_lm.py): seed cut, Viterbi dp with the
(neg-score, n_tokens, path) total-order tie-break, char-floored M-step —
on both the Spark fold implementation AND the unrolled DuckDB CTE oracle."""

from __future__ import annotations

import math

from log_analysis_system_spark.queries.unigram_lm import (
    UNI_LMAX,
    UNI_P_MAX,
    UNI_ROUNDS,
    UNI_SCALE,
    UNI_SEED_V,
    train_unigram_lm,
    unigram_ctes,
)


def ref_unigram(word_freqs: dict[str, int], rounds: int = UNI_ROUNDS):
    """Canonical reference implementation; returns
    ({tok: (count, score_micro)}, {word: (freq, negs, k, path)})."""
    words = {w: f for w, f in word_freqs.items() if w and len(w) <= UNI_P_MAX}
    seed: dict[str, int] = {}
    for w, f in words.items():
        for p in range(1, len(w) + 1):
            for t in range(1, min(UNI_LMAX, p) + 1):
                tok = w[p - t:p]
                seed[tok] = seed.get(tok, 0) + f
    multi = sorted(
        (kv for kv in seed.items() if len(kv[0]) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:UNI_SEED_V]
    chars = {t for t in seed if len(t) == 1}
    vocab = dict(multi)
    vocab.update({t: seed[t] for t in chars})

    def scores_of(v: dict[str, int]) -> dict[str, int]:
        tot = sum(v.values())
        return {
            t: math.floor(math.log(c / tot) * UNI_SCALE)
            for t, c in v.items()
        }

    sc = scores_of(vocab)
    best: dict[str, tuple] = {}
    for _ in range(rounds):
        best = {}
        for w, f in words.items():
            dp: list = [(0, 0, "")] + [None] * len(w)
            for p in range(1, len(w) + 1):
                cands = []
                for t in range(1, min(UNI_LMAX, p) + 1):
                    tok = w[p - t:p]
                    if tok in sc and dp[p - t] is not None:
                        negs, k, path = dp[p - t]
                        cands.append((
                            negs - sc[tok],
                            k + 1,
                            tok if path == "" else path + " " + tok,
                        ))
                dp[p] = min(cands) if cands else None
            assert dp[len(w)] is not None
            best[w] = (f,) + dp[len(w)]
        counts: dict[str, int] = {}
        for w, (f, _negs, _k, path) in best.items():
            for tok in path.split(" "):
                counts[tok] = counts.get(tok, 0) + f
        vocab = {t: c for t, c in counts.items() if len(t) >= 2}
        for t in chars:
            vocab[t] = max(counts.get(t, 0), 1)
        sc = scores_of(vocab)
    return {t: (vocab[t], sc[t]) for t in vocab}, best


def _docs_df(spark, word_freqs):
    text = " ".join(
        " ".join([w] * f) for w, f in sorted(word_freqs.items())
    )
    return spark.createDataFrame(
        [(0, text, "en", "s0", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _check_spark(spark, word_freqs):
    exp_vocab, exp_best = ref_unigram(word_freqs)
    scores, best = train_unigram_lm(_docs_df(spark, word_freqs))
    got_vocab = {
        r["tok"]: (r["c"], r["sc"]) for r in scores.collect()
    }
    assert got_vocab == exp_vocab
    got_best = {
        r["word"]: (r["freq"], r["negs"], r["k"], r["path"])
        for r in best.collect()
    }
    assert got_best == exp_best


def _check_duckdb(word_freqs):
    import duckdb

    exp_vocab, exp_best = ref_unigram(word_freqs)
    text = " ".join(
        " ".join([w] * f) for w, f in sorted(word_freqs.items())
    ).replace("'", "''")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT 0 AS doc_id, '{text}' AS text, "
        f"'en' AS lang, 's0' AS source"
    )
    got_vocab = {
        t: (c, s)
        for t, c, s in con.execute(
            unigram_ctes() + f" SELECT tok, c, sc FROM scores{UNI_ROUNDS}"
        ).fetchall()
    }
    assert got_vocab == exp_vocab
    got_best = {
        w: (f, n, k, p)
        for w, f, n, k, p in con.execute(
            unigram_ctes()
            + f" SELECT word, freq, negs, k, path FROM best{UNI_ROUNDS}"
        ).fetchall()
    }
    assert got_best == exp_best


def test_unigram_matches_reference_basic(spark):
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 4}
    _check_spark(spark, wf)
    _check_duckdb(wf)


def test_unigram_tie_break_and_long_word_exclusion(spark):
    # 'abab' forces segmentation ties ('ab ab' vs 'a b a b' orderings);
    # the 17-char word must be excluded from training on both engines.
    wf = {"abab": 3, "ab": 3, "ba": 3, "a" * 17: 9}
    _check_spark(spark, wf)
    _check_duckdb(wf)


def test_unigram_property_random_vocabs(spark):
    """Adversarial small-alphabet vocabs: repeated-symbol runs and
    equal-count ties are where the (negs, k, path) total order and the
    char-floor rule could diverge between the fold, the CTE oracle, and
    the reference. Deterministic seed."""
    import random

    rng = random.Random(5142026)
    for trial in range(6):
        words = {
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 9)))
            for _ in range(rng.randint(2, 8))
        }
        wf = {w: rng.randint(1, 5) for w in words}
        _check_spark(spark, wf)
        _check_duckdb(wf)
