"""BPE training must match a pure-Python canonical reference (subword-nmt
semantics): overlapping pair counts, lexicographic tie-break, greedy
leftmost non-overlapping merge application — including repeated-symbol
runs where the fold/parity equivalence is the subtle part."""

from __future__ import annotations

from log_analysis_system_spark.queries.bpe import (
    END_MARK,
    train_bpe,
    word_vocab,
)


def ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Canonical reference: the subword-nmt loop, verbatim semantics."""
    vocab = {
        w: tuple(list(w) + [END_MARK]) for w in word_freqs
    }
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # max count, ties -> lexicographically smallest pair
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        new_vocab = {}
        for w, syms in vocab.items():
            out = []
            for x in syms:  # greedy leftmost fold
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, vocab


def _spark_vocab(spark, word_freqs):
    # build a documents-like frame whose word frequencies equal word_freqs
    text = " ".join(
        " ".join([w] * f) for w, f in sorted(word_freqs.items())
    )
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return word_vocab(docs)


def _check(spark, word_freqs, n_merges):
    exp_merges, exp_vocab = ref_bpe(word_freqs, n_merges)
    got_merges, got_final = train_bpe(_spark_vocab(spark, word_freqs), n_merges)
    assert got_merges == exp_merges
    got_vocab = {
        r["word"]: tuple(r["syms"]) for r in got_final.collect()
    }
    assert got_vocab == exp_vocab


def test_bpe_matches_reference_basic(spark):
    _check(
        spark,
        {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 4},
        8,
    )


def test_bpe_repeated_symbol_runs(spark):
    """'aaaaa' runs: greedy leftmost merges positions (1,2) and (3,4) —
    the parity case where naive string replace diverges."""
    _check(spark, {"aaaaa": 3, "aaa": 2, "aa": 7, "baaab": 1}, 6)


def test_bpe_tie_break_lexicographic(spark):
    # 'ab' and 'ba' pairs tie at freq 2 -> 'ab' must win (lexicographic)
    _check(spark, {"ab": 2, "ba": 2}, 2)


def test_bpe_raises_when_collapsed(spark):
    import pytest

    with pytest.raises(ValueError, match="fully collapsed"):
        train_bpe(_spark_vocab(spark, {"a": 1}), 3)


def test_bpe_property_random_vocabs(spark):
    """Property check over adversarial small vocabs: 'a'/'b'-alphabet
    words maximize repeated-symbol runs — the case where the fold/parity
    equivalence could break. Deterministic seed, 12 random vocabs."""
    import random

    rng = random.Random(20260814)
    for trial in range(12):
        words = {
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(2, 7))
        }
        word_freqs = {w: rng.randint(1, 5) for w in words}
        n_merges = rng.randint(1, 4)
        try:
            _check(spark, word_freqs, n_merges)
        except ValueError as e:
            # legitimate only when the vocab collapses before n_merges
            assert "fully collapsed" in str(e)
            continue
        _check_duckdb(word_freqs, n_merges)


def _check_duckdb(word_freqs, n_merges):
    """The DuckDB islands-parity oracle must ALSO match the canonical
    reference on the same crafted vocab (driver_sim only exercises it on
    the real corpus)."""
    import duckdb

    from log_analysis_system_spark.queries.bpe import _train_ctes

    text = " ".join(
        " ".join([w] * f) for w, f in sorted(word_freqs.items())
    )
    con = duckdb.connect()
    esc = text.replace("'", "''")
    con.execute(
        f"CREATE VIEW documents AS SELECT 0 AS doc_id, '{esc}' AS text"
    )
    tail = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, a AS sym_a, b AS sym_b, "
        f"ab AS merged, cnt AS pair_count FROM best{r}"
        for r in range(1, n_merges + 1)
    )
    got = sorted(con.execute(_train_ctes(n_merges) + "\n" + tail).fetchall())
    exp_merges, _ = ref_bpe(word_freqs, n_merges)
    assert got == sorted(exp_merges)


# ------------------------------------------------- batched merge rounds

def test_bpe_batched_matches_sequential_64_merges(spark):
    """batch_size=8 must be BIT-IDENTICAL to the canonical sequential loop
    at a production-ish merge count (64), while taking far fewer driver
    round-trips — the public fast-BPE batching under the strict
    disjointness + count-gap rule of _safe_merge_batch."""
    import random

    rng = random.Random(8142026)
    words = {
        "".join(rng.choice("abcdefgh") for _ in range(rng.randint(3, 10)))
        for _ in range(400)
    }
    word_freqs = {w: rng.randint(1, 50) for w in words}
    n_merges = 64

    exp_merges, exp_vocab = ref_bpe(word_freqs, n_merges)
    assert len(exp_merges) == n_merges  # vocab is rich enough
    got_merges, got_final = train_bpe(
        _spark_vocab(spark, word_freqs), n_merges, batch_size=8
    )
    assert got_merges == exp_merges
    got_vocab = {r["word"]: tuple(r["syms"]) for r in got_final.collect()}
    assert got_vocab == exp_vocab


import pytest


@pytest.mark.slow  # redundancy tier: the deterministic 64-merge batched==
# sequential equivalence test stays in the fast tier; this adds randomized
# adversarial vocabs on top (15 s of the driver-budget window).
def test_bpe_batched_property_random_vocabs(spark):
    """Adversarial a/b-alphabet vocabs maximize both repeated-symbol runs
    AND merge-string collisions (e.g. 'a'+'ba' == 'ab'+'a' == 'aba') —
    the cases where naive batching silently diverges from sequential.
    Every batch size must still match the pure-Python reference."""
    import random

    rng = random.Random(20260815)
    for trial in range(8):
        words = {
            "".join(rng.choice("ab") for _ in range(rng.randint(2, 8)))
            for _ in range(rng.randint(3, 9))
        }
        word_freqs = {w: rng.randint(1, 6) for w in words}
        n_merges = rng.randint(2, 6)
        exp = None
        try:
            exp = ref_bpe(word_freqs, n_merges)
            if len(exp[0]) < n_merges:
                continue  # reference collapsed early; raise-path covered elsewhere
        except Exception:
            continue
        for bs in (2, 4):
            got_merges, got_final = train_bpe(
                _spark_vocab(spark, word_freqs), n_merges, batch_size=bs
            )
            assert got_merges == exp[0], (word_freqs, n_merges, bs)
            got_vocab = {
                r["word"]: tuple(r["syms"]) for r in got_final.collect()
            }
            assert got_vocab == exp[1], (word_freqs, n_merges, bs)


def test_bpe_batched_fewer_round_trips():
    """_safe_merge_batch accepts multiple disjoint merges when the count
    gap allows — the driver-round-trip win — and stays singleton when the
    head re-creates an existing symbol (the 2·c* hazard)."""
    from log_analysis_system_spark.queries.bpe import _safe_merge_batch

    class R(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    rows = [
        R(a="a", b="b", cnt=100),
        R(a="c", b="d", cnt=90),
        R(a="e", b="f", cnt=80),
        R(a="a", b="c", cnt=70),  # first conflict -> c* = 70
        R(a="g", b="h", cnt=60),
    ]
    got = _safe_merge_batch(rows, capacity=8, truncated=False,
                            existing_syms={"</w>"})
    assert got == [("a", "b", 100), ("c", "d", 90), ("e", "f", 80)]

    # count tie with c* -> not batched past the gap
    rows_tie = [
        R(a="a", b="b", cnt=100),
        R(a="c", b="d", cnt=70),
        R(a="a", b="c", cnt=70),
    ]
    got = _safe_merge_batch(rows_tie, capacity=8, truncated=False,
                            existing_syms={"</w>"})
    assert got == [("a", "b", 100)]

    # head merge string already exists -> singleton batch
    got = _safe_merge_batch(rows, capacity=8, truncated=False,
                            existing_syms={"</w>", "ab"})
    assert got == [("a", "b", 100)]

    # truncated listing: unseen tail bounds c* via the sentinel row
    got = _safe_merge_batch(rows[:3], capacity=8, truncated=True,
                            existing_syms={"</w>"})
    assert got == [("a", "b", 100), ("c", "d", 90)]


# ---------------------------------------------- persisted vocab build/serve

def test_bpe_index_build_and_serve(spark, tmp_path):
    """Serving from the persisted BPE index must equal retokenizing with
    the trained merges — including OOV words the training corpus never
    saw, segmented by replaying the shipped merge list in rank order."""
    from log_analysis_system_spark.queries.bpe import (
        build_bpe_index,
        tokenize_with_bpe_index,
    )

    train_wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 4}
    corpus_dir = str(tmp_path / "corpus")
    text = " ".join(" ".join([w] * f) for w, f in sorted(train_wf.items()))
    spark.createDataFrame(
        [(0, text)], "doc_id long, text string"
    ).write.parquet(f"{corpus_dir}/documents.parquet")

    idx = str(tmp_path / "idx")
    n_merges = 8
    build_bpe_index(spark, corpus_dir, idx, n_merges=n_merges, batch_size=3)

    # Serve docs mixing seen words with OOV ("slowest", "news", "zz").
    serve_docs = spark.createDataFrame(
        [(1, "low newest slowest news zz"), (2, "widest widest")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_oov_words"])
        for r in tokenize_with_bpe_index(spark, idx, serve_docs).collect()
    }

    merges, vocab = ref_bpe(train_wf, n_merges)

    def segment(word: str) -> int:
        syms = list(word) + [END_MARK]
        for _rank, a, b, _ab, _cnt in merges:
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        return len(syms)

    def expect(text: str):
        ws = text.split(" ")
        return (
            len(ws),
            sum(
                len(vocab[w]) if w in vocab else segment(w) for w in ws
            ),
            sum(1 for w in ws if w not in vocab),
        )

    assert got == {
        1: expect("low newest slowest news zz"),
        2: expect("widest widest"),
    }
    assert got[1][2] == 3  # the three OOV words really took the replay path


def test_tokenizer_fertility_audit_exact_counts(spark, tmp_path):
    """Fertility on a hand-computable corpus: with zero merges possible
    beyond the planted repetition, per-source token counts follow the
    trained segmentation exactly and the ppm ratios are exact floor
    divisions."""
    from log_analysis_system_spark.queries.bpe import (
        q_tokenizer_fertility_audit,
    )

    # Long multi-char words so 12 merge rounds never run dry. Exact
    # expectations derive from the SAME train_bpe call the query makes,
    # so this pins the AUDIT WIRING (sums, ratios, grouping), not the
    # merge order.
    rows = [
        (0, "abcdefghi abcdefghi jklmnopqr", "en", "srcA", 0),
        (1, "stuvwxyz stuvwxyz", "en", "srcB", 0),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")

    from log_analysis_system_spark.queries.bpe import (
        N_MERGES,
        train_bpe,
        word_vocab,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    _, final = train_bpe(word_vocab(docs), N_MERGES)
    syms = {r["word"]: len(r["syms"]) for r in final.collect()}

    got = {r["source"]: r for r in
           q_tokenizer_fertility_audit(spark, d).collect()}
    a, b = got["srcA"], got["srcB"]
    assert (a["n_words"], a["n_chars"]) == (3, 27)
    assert a["n_tokens"] == 2 * syms["abcdefghi"] + syms["jklmnopqr"]
    assert a["fertility_ppm"] == a["n_tokens"] * 1_000_000 // 3
    assert a["chars_per_token_ppm"] == 27 * 1_000_000 // a["n_tokens"]
    assert (b["n_words"], b["n_chars"]) == (2, 16)
    assert b["n_tokens"] == 2 * syms["stuvwxyz"]


# ------------------------------------------------------- WordPiece


def ref_wordpiece(word_freqs: dict[str, int], n_merges: int):
    """Canonical reference: the WordPiece selection loop in plain
    Python — occurrence-weighted symbol counts, ppb-floored likelihood
    score with float division + math.floor (not the SQL text), greedy
    leftmost application shared with ref_bpe."""
    import math

    vocab = {w: tuple(list(w) + [END_MARK]) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        syms_cnt: dict[str, int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for s in syms:
                syms_cnt[s] = syms_cnt.get(s, 0) + f
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        scored = {
            p: math.floor(
                float(c) * 1e9 / float(syms_cnt[p[0]]) / float(syms_cnt[p[1]])
            )
            for p, c in counts.items()
        }
        (a, b), score = min(
            scored.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, a, b, a + b, counts[(a, b)], score))
        new_vocab = {}
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, vocab


def test_wordpiece_matches_reference(spark):
    """WordPiece picks likelihood, not frequency: in this fixture 'xy'
    occurs 4 times while 'ab' occurs 12, but x and y occur ONLY
    together, so WordPiece merges ('x','y') first where BPE merges
    ('a','b') — pinned against the pure-Python reference loop."""
    from log_analysis_system_spark.queries.bpe import train_wordpiece

    wf = {"abab": 6, "xyxy": 2, "aqb": 3}
    exp_merges, exp_vocab = ref_wordpiece(wf, 4)
    got_merges, got_final = train_wordpiece(_spark_vocab(spark, wf), 4)
    assert got_merges == exp_merges
    got_vocab = {r["word"]: tuple(r["syms"]) for r in got_final.collect()}
    assert got_vocab == exp_vocab
    # the behavioral split vs BPE
    bpe_merges, _ = ref_bpe(wf, 1)
    assert bpe_merges[0][1:3] == ("a", "b")
    assert exp_merges[0][1:3] == ("x", "y")


def test_wordpiece_matches_reference_on_driver_docs(spark):
    """Full-corpus pin at sf0.001: every merge row bit-for-bit."""
    import pandas as pd

    from log_analysis_system_spark.queries.bpe import (
        WP_MERGES,
        train_wordpiece,
    )

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    wf: dict[str, int] = {}
    for t in docs["text"]:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    exp_merges, _ = ref_wordpiece(wf, WP_MERGES)
    sdocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from log_analysis_system_spark.queries.bpe import word_vocab

    got_merges, _ = train_wordpiece(word_vocab(sdocs), WP_MERGES)
    assert got_merges == exp_merges
