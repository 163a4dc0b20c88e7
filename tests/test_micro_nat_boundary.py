"""Boundary-distance audit for the floor(ln(p) * 1e6) micro-nat pattern.

bigram_lm_perplexity / sequence_entropy / source_jsd floor log-domain
doubles to integer micro-nats and then rely on exact-bigint sums agreeing
between Spark (JVM Math.log) and DuckDB (libm log). The two libms are each
correctly-rounded to within ~1 ulp but NOT guaranteed bit-identical, so a
pre-floor value landing within ~1 ulp of an integer boundary could floor
differently per engine. ulp(x) at |x| ~ 2e7 is ~4e-9; compounded
mul/div/log rounding stays under ~1e-8.

These tests measure, on the REAL test data at both oracle scale factors,
how far every pre-floor value actually sits from the nearest integer, and
assert the minimum clearance is > 1e-7 — an order of magnitude above the
worst-case cross-engine disagreement. If new data ever places a value
inside the guard band, this fails loudly instead of the sweep flaking.

Pre-floor values are computed by DuckDB itself on the same integer count
tables the oracles build (the CTEs mirror the @query oracles in
queries/text_analysis.py and queries/behavior.py); measuring clearance on
one engine's doubles is sufficient because the guard band (1e-7) dwarfs
the cross-engine spread (~1e-8).

Structurally-exact values — ln(1) = 0.0 from n == nt ratios, and the JSD
pa == pb / n == 0 branches — are IEEE-exact on every engine (1.0 and 0.0
are exact, and CASE pins the zero), so integer hits are allowed only when
the value is exactly 0.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
GUARD_BAND = 1e-7

_LM_SQL = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS w
    FROM read_parquet('{d}/documents.parquet')
),
bg AS (
    SELECT doc_id, w[i] AS w1, w[i+1] AS w2
    FROM (SELECT doc_id, w,
                 unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
          FROM toks)
),
c1 AS (SELECT w1 AS word, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
vocab AS (
    SELECT CAST(count(DISTINCT word) AS BIGINT) AS v
    FROM (SELECT unnest(string_split(text, ' ')) AS word
          FROM read_parquet('{d}/documents.parquet'))
    WHERE word <> ''
),
args AS (
    SELECT DISTINCT c12.c AS cab, c1.c AS ca, vocab.v AS v
    FROM c12 JOIN c1 ON c1.word = c12.w1 CROSS JOIN vocab
),
x AS (
    SELECT ln((cab + 1) / CAST(ca + v AS DOUBLE)) * 1000000 AS x FROM args
)
SELECT CAST(count(*) AS BIGINT) AS n,
       min(abs(x - round(x))) AS min_dist,
       CAST(count(*) FILTER (WHERE x = round(x) AND x <> 0)
            AS BIGINT) AS exact_nonzero
FROM x
"""

_ENT_SQL = """
WITH tr AS (
    SELECT user_id, event_type AS a,
           lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS b
    FROM read_parquet('{d}/events.parquet')
),
cnt AS (
    SELECT user_id, a, b, CAST(count(*) AS BIGINT) AS n
    FROM tr WHERE b IS NOT NULL GROUP BY 1, 2, 3
),
tot AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS nt FROM cnt GROUP BY 1),
args AS (
    SELECT DISTINCT c.n, t.nt FROM cnt c JOIN tot t USING (user_id)
    WHERE c.n <> t.nt  -- n == nt -> ln(1.0) = exact 0, engine-stable
),
x AS (SELECT ln(n / CAST(nt AS DOUBLE)) * 1000000 AS x FROM args)
SELECT CAST(count(*) AS BIGINT) AS n,
       min(abs(x - round(x))) AS min_dist,
       CAST(count(*) FILTER (WHERE x = round(x)) AS BIGINT) AS exact_nonzero
FROM x
"""

_JSD_SQL = """
WITH w AS (
    SELECT source, unnest(string_split(text, ' ')) AS word
    FROM read_parquet('{d}/documents.parquet')
),
wc AS (
    SELECT source, word, CAST(count(*) AS BIGINT) AS n
    FROM w WHERE word <> '' GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM wc GROUP BY 1),
vocab AS (SELECT DISTINCT word FROM wc),
grid AS (
    SELECT t.source, v.word, coalesce(c.n, 0) AS n, t.nt
    FROM tot t CROSS JOIN vocab v
    LEFT JOIN wc c ON c.source = t.source AND c.word = v.word
),
x AS (
    SELECT 1000000 * (
               CASE WHEN a.n > 0
                    THEN 0.5 * (a.n / CAST(a.nt AS DOUBLE))
                         * ln((a.n / CAST(a.nt AS DOUBLE))
                              / ((a.n / CAST(a.nt AS DOUBLE)
                                  + b.n / CAST(b.nt AS DOUBLE)) / 2))
                    ELSE 0 END
             + CASE WHEN b.n > 0
                    THEN 0.5 * (b.n / CAST(b.nt AS DOUBLE))
                         * ln((b.n / CAST(b.nt AS DOUBLE))
                              / ((a.n / CAST(a.nt AS DOUBLE)
                                  + b.n / CAST(b.nt AS DOUBLE)) / 2))
                    ELSE 0 END) AS x
    FROM grid a JOIN grid b ON a.word = b.word AND a.source < b.source
)
SELECT CAST(count(*) AS BIGINT) AS n,
       min(abs(x - round(x))) FILTER (WHERE x <> 0) AS min_dist,
       CAST(count(*) FILTER (WHERE x = round(x) AND x <> 0)
            AS BIGINT) AS exact_nonzero
FROM x
"""


_ZIPF_SQL = """
WITH tf AS (
    SELECT w AS term, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS w
          FROM read_parquet('{d}/documents.parquet')) u
    GROUP BY 1
),
cut AS (SELECT term, freq FROM tf ORDER BY freq DESC, term LIMIT 512),
ranked AS (
    SELECT row_number() OVER (ORDER BY freq DESC, term) AS r, freq FROM cut
),
x AS (
    SELECT ln(CAST(r AS DOUBLE)) * 1000000 AS x FROM ranked
    UNION ALL
    SELECT ln(CAST(freq AS DOUBLE)) * 1000000 FROM ranked
)
-- rank 1 / freq 1 produce ln(1) = 0.0, IEEE-exact on every engine
-- (a structural zero, same policy as the JSD zero branches) — the
-- clearance min is over the non-structural values only.
SELECT CAST(count(*) AS BIGINT) AS n,
       min(abs(x - round(x))) FILTER (WHERE x <> 0) AS min_dist,
       CAST(count(*) FILTER (WHERE x = round(x) AND x <> 0)
            AS BIGINT) AS exact_nonzero
FROM x
"""

_DSIR_SQL = """
WITH occ AS (
    SELECT source IN ('src2', 'src3') AS is_target,
           substr(md5(word), 1, 2) AS b
    FROM (SELECT source, unnest(string_split(text, ' ')) AS word
          FROM read_parquet('{d}/documents.parquet'))
    WHERE word <> ''
),
bstats AS (
    SELECT b,
           CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
           CAST(sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cr
    FROM occ GROUP BY b
),
tot AS (
    SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
    FROM bstats
),
x AS (
    SELECT ln(CAST((ct + 1) * (nr + 256) AS DOUBLE)
              / CAST((cr + 1) * (nt + 256) AS DOUBLE)) * 1000000 AS x
    FROM bstats CROSS JOIN tot
)
SELECT CAST(count(*) AS BIGINT) AS n,
       min(abs(x - round(x))) AS min_dist,
       CAST(count(*) FILTER (WHERE x = round(x) AND x <> 0)
            AS BIGINT) AS exact_nonzero
FROM x
"""


def _unigram_sql(d: str) -> str:
    """Pre-floor micro-nat values of every unigram-LM score round
    (ln(c/T)·1e6 over the round's vocab table)."""
    from log_analysis_system_spark.queries.unigram_lm import (
        UNI_ROUNDS,
        unigram_ctes,
    )

    rounds = " UNION ALL ".join(
        f"SELECT ln(c / CAST(t AS DOUBLE)) * 1000000 AS x "
        f"FROM uvocab{r}, (SELECT CAST(sum(c) AS BIGINT) AS t "
        f"FROM uvocab{r})"
        for r in range(UNI_ROUNDS + 1)
    )
    return (
        unigram_ctes().replace(
            "FROM documents",
            f"FROM read_parquet('{d}/documents.parquet')",
        )
        + f""", x AS ({rounds})
SELECT CAST(count(*) AS BIGINT) AS n,
       min(abs(x - round(x))) AS min_dist,
       CAST(count(*) FILTER (WHERE x = round(x) AND x <> 0)
            AS BIGINT) AS exact_nonzero
FROM x
"""
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize(
    "name,sql",
    [("bigram_lm", _LM_SQL), ("sequence_entropy", _ENT_SQL),
     ("source_jsd", _JSD_SQL), ("unigram_lm", None),
     ("dsir_llr", _DSIR_SQL), ("zipf_law_fit", _ZIPF_SQL)],
)
def test_micro_nat_values_clear_integer_boundaries(name, sql, sf_dir):
    if sql is None:
        sql = _unigram_sql("{d}")
    n, min_dist, exact_nonzero = duckdb.sql(
        sql.format(d=sf_dir)
    ).fetchone()
    assert n > 0, f"{name}@{sf_dir}: no pre-floor values produced"
    # No value may sit exactly ON an integer unless it is structural 0.
    assert exact_nonzero == 0, (
        f"{name}@{sf_dir}: {exact_nonzero} non-zero pre-floor values are "
        f"exactly integral — floor is one cross-engine ulp from flipping"
    )
    assert min_dist is not None and min_dist > GUARD_BAND, (
        f"{name}@{sf_dir}: min boundary clearance {min_dist!r} over {n} "
        f"values is inside the {GUARD_BAND} guard band — the micro-nat "
        f"floor may disagree between JVM Math.log and libm log here"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_kneser_ney_micro_nat_boundary(sf_dir):
    """Boundary clearance for the Kneser-Ney pre-floor values, on the
    exact distinct (cw2, ch, n1p, cb, T) argument combos the oracle
    scores. Structural zeros (p = 1 degenerate corpora) are allowed;
    everything else must clear the guard band."""
    from log_analysis_system_spark.queries.text_analysis import (
        _KN_CTES,
        _KN_LL_SQL,
    )

    ctes = _KN_CTES.replace(
        "FROM documents", f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = f"""
WITH {ctes},
args AS (
    SELECT DISTINCT cw2, ch, n1p, cb, t FROM kn_scored
    WHERE cw2 IS NOT NULL
),
x AS (SELECT {_KN_LL_SQL} AS x FROM args)
SELECT CAST(count(*) AS BIGINT) AS n,
       min(abs(x - round(x))) FILTER (WHERE x <> 0) AS min_dist,
       CAST(count(*) FILTER (WHERE x = round(x) AND x <> 0)
            AS BIGINT) AS exact_nonzero
FROM x
"""
    n, min_dist, exact_nonzero = duckdb.sql(sql).fetchone()
    assert n > 0
    assert exact_nonzero == 0
    assert min_dist is not None and min_dist > GUARD_BAND


def test_adamic_adar_micro_boundary():
    """link_prediction_scores floors 1e6/ln(d) to micro-units per shared
    neighbor. The reachable degree domain is the INTEGERS 2..LP_DEG_CAP
    (degrees above the cap are dropped before the pair join), so the audit
    sweeps the whole domain, not just the degrees present in one dataset:
    every pre-floor value must clear the guard band around the next-lower
    integer on both engines. d=1 cannot reach the score (a degree-1
    customer produces no pair), so ln(d)=0 never divides."""
    from log_analysis_system_spark.queries.graph import LP_DEG_CAP

    rows = duckdb.sql(
        f"""
        WITH d AS (SELECT unnest(generate_series(2, {LP_DEG_CAP})) AS d),
        x AS (SELECT 1000000 / ln(d) AS x FROM d)
        SELECT CAST(count(*) AS BIGINT),
               min(x - floor(x)),
               min(ceil(x) - x)
        FROM x
        """
    ).fetchone()
    n, dist_lo, dist_hi = rows
    assert n == LP_DEG_CAP - 1
    assert dist_lo > GUARD_BAND and dist_hi > GUARD_BAND


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_mutual_information_micro_nat_boundary(sf_dir):
    """Boundary clearance for mutual_information_features' per-cell
    floor(1e6 * ln((n_xy*N)/(nx*ny))) and the label-entropy
    floor(1e6 * ln(N/ny)), on the exact cell tables the oracle builds.
    A cell with n_xy*N == nx*ny is structurally ln(1)=0 (exact on every
    engine) and allowed; everything else must clear the guard band."""
    from log_analysis_system_spark.queries.training_prep import (
        _MI_FEATS_SQL,
    )

    ctes = _MI_FEATS_SQL.replace(
        "FROM documents", f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = f"""
WITH {ctes},
args AS (
    SELECT DISTINCT 1000000 * ln(CAST(c.n * t.big_n AS DOUBLE)
                                 / CAST(mx.nx * my.ny AS DOUBLE)) AS x
    FROM cells c
    JOIN tots t ON t.f = c.f
    JOIN margx mx ON mx.f = c.f AND mx.v = c.v
    JOIN margy my ON my.f = c.f AND my.y = c.y
    UNION
    SELECT DISTINCT 1000000 * ln(CAST(t.big_n AS DOUBLE)
                                 / CAST(y.ny AS DOUBLE)) AS x
    FROM margy y JOIN tots t ON t.f = y.f
)
SELECT CAST(count(*) AS BIGINT) AS n,
       min(abs(x - round(x))) FILTER (WHERE x <> 0) AS min_dist,
       CAST(count(*) FILTER (WHERE x = round(x) AND x <> 0)
            AS BIGINT) AS exact_nonzero
FROM args
"""
    n, min_dist, exact_nonzero = duckdb.sql(sql).fetchone()
    assert n > 0
    assert exact_nonzero == 0
    assert min_dist is not None and min_dist > GUARD_BAND


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_naive_bayes_micro_nat_boundary(sf_dir):
    """Boundary clearance for the NB classifier's pre-floor values: every
    distinct (c_cw + 1, n_c + V) token-likelihood argument combo the
    scorer can produce (including the OOV c_cw = 0 row per class) plus
    the (d_c, d_tot) class priors."""
    from log_analysis_system_spark.queries.nbayes import NB_CTES

    ctes = NB_CTES.replace(
        "FROM documents", f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = f"""
WITH {ctes},
args AS (
    SELECT DISTINCT coalesce(cw.c_cw, 0) + 1 AS num,
           nc.n_c + vocab.v AS den
    FROM nc CROSS JOIN vocab
    LEFT JOIN cw ON cw.lang = nc.lang
    UNION
    SELECT DISTINCT 1 AS num, nc.n_c + vocab.v AS den
    FROM nc CROSS JOIN vocab
),
x AS (
    SELECT ln(num / CAST(den AS DOUBLE)) * 1000000 AS x FROM args
    UNION ALL
    SELECT ln(d_c / CAST(d_tot AS DOUBLE)) * 1000000 FROM prior
)
SELECT CAST(count(*) AS BIGINT) AS n,
       min(abs(x - round(x))) AS min_dist,
       CAST(count(*) FILTER (WHERE x = round(x) AND x <> 0)
            AS BIGINT) AS exact_nonzero
FROM x
"""
    n, min_dist, exact_nonzero = duckdb.sql(sql).fetchone()
    assert n > 0
    assert exact_nonzero == 0
    assert min_dist is not None and min_dist > GUARD_BAND
