"""Similarity search over the ``embeddings`` table (array<float>, 64 dims) —
training-data pipeline extension.

Numeric policy: embeddings are quantized to integer milli-units
(``floor(x * 1000)``) before any arithmetic, so dot products and norms are
exact bigints in both Spark and the DuckDB oracle; only the final
``dot / (sqrt(na) * sqrt(nb))`` runs in float, with identical operand values
and operation order on both engines. This removes the float-summation-order
nondeterminism that plagues cross-engine ANN comparisons.

Scale design: the brute-force variant is the correctness baseline (fine for a
broadcast-able query set); the LSH variant is the 100 TB path — random
hyperplanes bucket vectors so the candidate join is an equi-join on bucket id,
never a cross join against the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.topn import grouped_topn
from . import query

N_QUERIES = 10  # vec_id < 10 serve as the query set
TOP_K = 5
NEARDUP_THRESHOLD = 0.45
N_PLANES = 8
N_DIMS = 64

# Quantize via double (float32 -> double is exact; double*1000 and floor are
# bit-identical across engines, unlike float32 arithmetic whose promotion
# rules differ).
_QUANT = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

# DuckDB quantization + flatten (one row per vector element, 1-based index).
_FLAT_CTE = """
q AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
    FROM embeddings
),
flat AS (
    SELECT vec_id, i, e[i] AS v
    FROM (SELECT vec_id, e, unnest(generate_series(1, len(e))) AS i FROM q)
),
norms AS (SELECT vec_id, sum(v * v) AS nrm FROM flat GROUP BY vec_id)
"""


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized embedding table, CACHED: the transform() quantization is a
    higher-order function (interpreted per row, outside whole-stage codegen),
    and every similarity query references the result 2-4 times — without the
    cache it re-runs per branch. At scale this is the materialized
    integer-vector projection an embedding index would store anyway;
    Spark's CacheManager dedups by logical plan across calls."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.select("vec_id", F.expr(_QUANT).alias("e"))
    # norm precomputed ONCE per vector: pair-stage cosines otherwise re-fold
    # both norms per candidate pair (2 interpreted HOF folds x |pairs|).
    return q.withColumn("nrm", _norm("e")).cache()


def _dot(a: str, b: str) -> Column:
    """Exact integer dot product of two quantized arrays — zip_with + ordered
    fold. Measured note: an unrolled 64-term GetArrayItem sum was tried and
    is SLOWER (the huge expression tree trips codegen's method-size fallback
    into the tree-walk interpreter); the HOF fold is the better physical
    form, and norms are precomputed once per vector (see _quantized) so the
    fold runs once per pair, not three times."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), "
        f"(acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    """Exact integer squared norm (used once per vector, cached)."""
    return F.expr(
        f"aggregate(transform({a}, x -> x * x), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


# Driver-side bound for one broadcast block of the exact near-dup matmul:
# 131072 vectors x 64 dims x 8 B = 64 MiB per block, independent of corpus
# size. At sf<=0.1 the corpus fits one block, so the plan (and hash) is
# identical to the unblocked form.
EMB_BLOCK_ROWS = 131072

# Banded sign-LSH layout for the scalable near-dup candidate filter:
# NEARDUP_BANDS bands of NEARDUP_ROWS hyperplanes each. Collision prob for a
# pair at angle theta: 1 - (1 - (1 - theta/pi)^ROWS)^BANDS — at the 0.45
# threshold floor (theta ~ 63 deg) that is ~0.96, rising to ~1.0 for the
# high-cosine pairs real near-dup corpora contain.
NEARDUP_BANDS = 16
NEARDUP_ROWS = 4
_N_NEARDUP_PLANES = NEARDUP_BANDS * NEARDUP_ROWS


def _plane_coef(p: int, d: int) -> int:
    """md5-derived hyperplane coefficient in [-500, 500] — the same formula
    the oracle computes in SQL (low 60 bits of md5('p,d') % 1001 - 500), so
    both engines share every plane exactly."""
    import hashlib

    h = hashlib.md5(f"{p},{d}".encode()).hexdigest()[:15]
    return int(h, 16) % 1001 - 500


def _band_signatures(vecs: DataFrame) -> DataFrame:
    """(vec_id, band, sig) — one row per vector per band, where ``sig`` packs
    the sign bits of NEARDUP_ROWS hyperplane projections. The plane matrix is
    baked into the plan as a literal array-of-arrays, so signature computation
    is one narrow map stage (no shuffle, no Python)."""
    planes_sql = ", ".join(
        "array({})".format(
            ", ".join(
                f"{_plane_coef(p, d)}L" for d in range(N_DIMS)
            )
        )
        for p in range(_N_NEARDUP_PLANES)
    )
    bits = (
        f"transform(array({planes_sql}), p -> CASE WHEN "
        "aggregate(zip_with(p, e, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
        " > 0 THEN 1L ELSE 0L END)"
    )
    sigs = (
        f"transform(sequence(0, {NEARDUP_BANDS - 1}), j -> "
        + " + ".join(
            f"__bits[j * {NEARDUP_ROWS} + {r}] * {1 << (NEARDUP_ROWS - 1 - r)}L"
            for r in range(NEARDUP_ROWS)
        )
        + ")"
    )
    return (
        vecs.withColumn("__bits", F.expr(bits))
        .select("vec_id", F.posexplode(F.expr(sigs)).alias("band", "sig"))
    )


@query(
    "ann_brute_topk",
    oracle=f"""
WITH {_FLAT_CTE},
dots AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
    FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < {N_QUERIES}
                            AND a.vec_id <> b.vec_id
    GROUP BY 1, 2
),
scored AS (
    SELECT d.query_id, d.neighbor_id,
           round(CAST(d.dot AS DOUBLE) /
                 (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
                 6) AS cosine
    FROM dots d
    JOIN norms na ON na.vec_id = d.query_id
    JOIN norms nb ON nb.vec_id = d.neighbor_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= {TOP_K}
""",
)
def q_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the query set (vec_id < N) is broadcast
    against the corpus; dot/norms are exact integer folds over the quantized
    arrays (no explode — 64x fewer rows in flight than the flattened oracle
    formulation); per-query top-k via window."""
    vecs = _quantized(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    corpus = vecs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"),
        F.col("nrm").alias("nn"),
    )
    pairs = F.broadcast(queries).crossJoin(corpus).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot("qe", "ne").cast("double")
            / (
                F.sqrt(F.col("qn").cast("double"))
                * F.sqrt(F.col("nn").cast("double"))
            ),
            6,
        ).alias("cosine"),
    )
    return grouped_topn(
        scored,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        TOP_K,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("long"))


@query(
    "embedding_near_dup",
    oracle=f"""
WITH {_FLAT_CTE},
planes AS (
    SELECT p, d,
           CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15))
                AS BIGINT) % 1001 - 500 AS coef
    FROM range({_N_NEARDUP_PLANES}) t1(p), range({N_DIMS}) t2(d)
),
proj AS (
    SELECT f.vec_id, pl.p, sum(pl.coef * f.v) AS s
    FROM flat f JOIN planes pl ON pl.d = f.i - 1
    GROUP BY 1, 2
),
bands AS (
    SELECT vec_id, p // {NEARDUP_ROWS} AS band,
           CAST(sum(CASE WHEN s > 0
                         THEN power(2, {NEARDUP_ROWS - 1} - (p % {NEARDUP_ROWS}))
                         ELSE 0 END) AS BIGINT) AS sig
    FROM proj GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
),
dots AS (
    SELECT c.vec_a, c.vec_b, sum(a.v * b.v) AS dot
    FROM cand c
    JOIN flat a ON a.vec_id = c.vec_a
    JOIN flat b ON b.vec_id = c.vec_b AND b.i = a.i
    GROUP BY 1, 2
),
scored AS (
    SELECT d.vec_a, d.vec_b,
           round(CAST(d.dot AS DOUBLE) /
                 (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
                 6) AS cosine
    FROM dots d
    JOIN norms na ON na.vec_id = d.vec_a
    JOIN norms nb ON nb.vec_id = d.vec_b
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {NEARDUP_THRESHOLD}
""",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicates, banded-LSH candidates + exact
    integer rescore — the sub-quadratic 100 TB path.

    Candidates come from {NEARDUP_BANDS} bands of {NEARDUP_ROWS} sign-of-
    hyperplane bits each (md5-derived planes shared exactly with the
    oracle): two vectors are candidates iff some band signature collides.
    Collision probability at the 0.45 threshold floor is ~0.96 and rises
    toward 1 for the high-cosine pairs real near-dup corpora contain; the
    oracle applies the IDENTICAL banding, so the gate compares exactly.
    Candidates are then rescored with the exact int64 dot product and the
    canonical round-then-filter — values are bit-identical to the exact
    all-pairs form for every emitted pair.

    Scale shape: signature computation is one narrow codegen map stage
    (plane matrix baked as a literal); the band join is an equi-join on
    (band, sig) whose shuffle carries 12-byte rows, never embedding arrays;
    the rescore joins fetch arrays for CANDIDATE pairs only. No driver
    collect, no crossJoin, no O(n^2) stage. `embedding_near_dup_exact`
    keeps the all-pairs blocked-matmul as the verification kernel."""
    vecs = _quantized(spark, sf_dir)
    sigs = _band_signatures(vecs)
    cand = (
        sigs.select("band", "sig", F.col("vec_id").alias("vec_a"))
        .join(
            sigs.select("band", "sig", F.col("vec_id").alias("vec_b")),
            ["band", "sig"],
        )
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    a = vecs.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    scored = cand.join(a, "vec_a").join(b, "vec_b").select(
        "vec_a",
        "vec_b",
        F.round(
            _dot("ea", "eb").cast("double")
            / (
                F.sqrt(F.col("na").cast("double"))
                * F.sqrt(F.col("nb").cast("double"))
            ),
            6,
        ).alias("cosine"),
    )
    return scored.where(F.col("cosine") >= NEARDUP_THRESHOLD)


def _near_dup_pairs_exact(vecs: DataFrame, block_rows: int) -> DataFrame:
    """All-pairs candidate generation for ``embedding_near_dup_exact``.

    The corpus is ranked once (distributed ``global_rank``) and walked in
    contiguous rank ranges of exactly ``block_rows`` vectors — a HARD
    per-block bound, unlike id-hash blocking, which a skewed id
    distribution can overflow. Each block is collected (bounded), broadcast,
    and matmul'd against the full distributed corpus inside ``mapInPandas``.
    A pair (a, b), a < b, is emitted exactly once: by the pass that
    broadcasts b's block. Yields slim (vec_a, vec_b, dot) rows only — the
    caller re-scores and filters JVM-side. Returns an empty frame for an
    empty corpus."""
    import numpy as np

    from ..operators.sampling import global_rank

    spark = vecs.sparkSession
    schema = "vec_a long, vec_b long, dot long"
    ranked = global_rank(
        vecs.select("vec_id", "e", "nrm"), [F.asc("vec_id")], rank_col="__rnk"
    )
    n = ranked.count()
    if n == 0:
        return spark.createDataFrame([], schema)
    th_pre = NEARDUP_THRESHOLD - 6e-7

    def block_gen(b_ids, b_e, b_nr):
        def gen(batches):
            import numpy as np
            import pandas as pd

            ids_blk, e_blk, nr_blk = b_ids.value, b_e.value, b_nr.value
            for pdf in batches:
                if pdf.empty:
                    continue
                A = np.stack(
                    [np.asarray(x, dtype="int64") for x in pdf["e"].values]
                )
                aid = pdf["vec_id"].to_numpy("int64")
                an = np.sqrt((A * A).sum(axis=1).astype("float64"))
                D = A @ e_blk.T  # exact int64
                C = D / (an[:, None] * nr_blk[None, :])
                mask = (C >= th_pre) & (aid[:, None] < ids_blk[None, :])
                ai, bj = np.nonzero(mask)
                yield pd.DataFrame(
                    {"vec_a": aid[ai], "vec_b": ids_blk[bj], "dot": D[ai, bj]}
                )

        return gen

    parts = []
    for lo in range(0, n, block_rows):
        block = ranked.where(
            F.col("__rnk").between(lo, lo + block_rows - 1)
        ).collect()  # hard bound: exactly <= block_rows vectors
        ids = np.array([r["vec_id"] for r in block], dtype="int64")
        E = np.stack([np.asarray(r["e"], dtype="int64") for r in block])
        nr = np.sqrt(np.array([r["nrm"] for r in block], dtype="float64"))
        gen = block_gen(
            spark.sparkContext.broadcast(ids),
            spark.sparkContext.broadcast(E),
            spark.sparkContext.broadcast(nr),
        )
        parts.append(
            vecs.select("vec_id", "e").mapInPandas(gen, schema)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "embedding_near_dup_exact",
    oracle=f"""
WITH {_FLAT_CTE},
dots AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v * b.v) AS dot
    FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
    GROUP BY 1, 2
),
scored AS (
    SELECT d.vec_a, d.vec_b,
           round(CAST(d.dot AS DOUBLE) /
                 (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
                 6) AS cosine
    FROM dots d
    JOIN norms na ON na.vec_id = d.vec_a
    JOIN norms nb ON nb.vec_id = d.vec_b
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {NEARDUP_THRESHOLD}
""",
)
def q_embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs near-duplicates by blocked broadcast matmul — the
    verification kernel for `embedding_near_dup` (which prefilters with
    banded LSH and inherits this query's rescore math).

    A crossJoin formulation materializes |N|^2 rows each dragging two
    64-element arrays through the join — measured 6x slower than the
    arithmetic itself. Instead the corpus is walked in driver-bounded
    contiguous rank blocks of ``EMB_BLOCK_ROWS`` vectors (~70 MB each):
    each block is broadcast and one distributed pass computes an exact
    int64 ``A @ block.T`` per Arrow batch, emitting only pairs whose
    unrounded cosine clears ``threshold - 6e-7`` (the widest value HALF_UP
    6-dp rounding could pull up). Driver memory never holds more than one
    block, but total compute is O(n^2/2) dot products BY DESIGN — run it to
    validate the LSH path's recall on a sample, not as the production path."""
    vecs = _quantized(spark, sf_dir)
    pairs = _near_dup_pairs_exact(vecs, EMB_BLOCK_ROWS)
    na = vecs.select(F.col("vec_id").alias("vec_a"), F.col("nrm").alias("na"))
    nb = vecs.select(F.col("vec_id").alias("vec_b"), F.col("nrm").alias("nb"))
    scored = pairs.join(na, "vec_a").join(nb, "vec_b").select(
        "vec_a",
        "vec_b",
        F.round(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("na").cast("double"))
                * F.sqrt(F.col("nb").cast("double"))
            ),
            6,
        ).alias("cosine"),
    )
    return scored.where(F.col("cosine") >= NEARDUP_THRESHOLD)


# Deterministic pseudo-random hyperplane coefficients shared with the oracle:
# coef(p, d) = (low-60-bits(md5(p ',' d)) % 1001) - 500   ∈ [-500, 500]
_COEF_CTE = f"""
planes AS (
    SELECT p, d,
           CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15))
                AS BIGINT) % 1001 - 500 AS coef
    FROM range({N_PLANES}) t1(p), range({N_DIMS}) t2(d)
)
"""


@query(
    "ann_lsh_topk",
    oracle=f"""
WITH {_FLAT_CTE},
{_COEF_CTE.strip().rstrip()},
proj AS (
    SELECT f.vec_id, pl.p, sum(pl.coef * f.v) AS s
    FROM flat f JOIN planes pl ON pl.d = f.i - 1
    GROUP BY 1, 2
),
buckets AS (
    SELECT vec_id,
           sum(CASE WHEN s > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS bucket
    FROM proj GROUP BY vec_id
),
cand AS (
    SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id
    FROM buckets qa JOIN buckets qb
      ON qa.bucket = qb.bucket AND qa.vec_id < {N_QUERIES}
     AND qa.vec_id <> qb.vec_id
),
dots AS (
    SELECT c.query_id, c.neighbor_id, sum(a.v * b.v) AS dot
    FROM cand c
    JOIN flat a ON a.vec_id = c.query_id
    JOIN flat b ON b.vec_id = c.neighbor_id AND b.i = a.i
    GROUP BY 1, 2
),
scored AS (
    SELECT d.query_id, d.neighbor_id,
           round(CAST(d.dot AS DOUBLE) /
                 (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
                 6) AS cosine
    FROM dots d
    JOIN norms na ON na.vec_id = d.query_id
    JOIN norms nb ON nb.vec_id = d.neighbor_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= {TOP_K}
""",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (the 100 TB scale path): sign-of-random-hyperplane
    bucketing (8 planes → 256 buckets), candidate = same-bucket equi-join,
    exact cosine + top-k only within the bucket. Hyperplane coefficients are
    md5-derived so Spark and the oracle share them exactly.

    At scale: the bucket join shuffles (vec_id, bucket) pairs only; each
    bucket holds ~N/256 vectors, so the per-bucket work stays bounded. Recall
    is tunable via planes/bands (multi-probe: OR of several plane sets)."""
    vecs = _quantized(spark, sf_dir)
    planes = (
        spark.range(N_PLANES)
        .select(F.col("id").alias("p"))
        .crossJoin(spark.range(N_DIMS).select(F.col("id").alias("d")))
        .select(
            "p",
            "d",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(",", F.col("p").cast("string"), F.col("d").cast("string")).cast(
                                "binary"
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % 1001
                - 500
            ).alias("coef"),
        )
    )
    # Collect the tiny (8x64) plane table and bake it into a literal array so
    # the projection is a pure codegen expression: proj_p = sum_d coef[p][d]*e[d].
    coef_rows = planes.orderBy("p", "d").collect()
    coefs = [[0] * N_DIMS for _ in range(N_PLANES)]
    for r in coef_rows:
        coefs[r["p"]][r["d"]] = r["coef"]
    bucket_expr = " + ".join(
        f"(CASE WHEN aggregate(zip_with(e, array({', '.join(f'CAST({c} AS BIGINT)' for c in coefs[p])}), "
        f"(x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v) > 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        for p in range(N_PLANES)
    )
    bucketed = vecs.withColumn("bucket", F.expr(bucket_expr))
    qa = bucketed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
        F.col("nrm").alias("qn"), "bucket"
    )
    qb = bucketed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"),
        F.col("nrm").alias("nn"), "bucket"
    )
    cand = F.broadcast(qa).join(qb, "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot("qe", "ne").cast("double")
            / (
                F.sqrt(F.col("qn").cast("double"))
                * F.sqrt(F.col("nn").cast("double"))
            ),
            6,
        ).alias("cosine"),
    )
    return grouped_topn(
        scored,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        TOP_K,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("long"))


# ------------------------------------------------------------------- IVF

CENT_MOD = 32   # vec_id % 32 == 0 → centroid set (scale-proportional)
N_PROBE = 4     # FLOOR on cells probed per query — see scaled_n_probe

# nprobe must SCALE with the cell count: with K cells and a constant
# nprobe, the probed corpus fraction is nprobe/K, so recall collapses as
# the corpus (and with CENT_MOD-proportional centroids, K) grows —
# measured 0.70 → 0.34 recall@5 from sf0.01 (16 cells) to sf0.1
# (63 cells) at fixed nprobe=4. Probing a constant FRACTION of cells
# pins the operating point instead: recall stays on the sf0.01 curve
# while per-query ADC cost stays ~PROBE_CELL_FRAC of the corpus. The
# fraction is exactly representable in binary (2^-2) so the SQL oracle's
# ceil(count * 0.25) and the Python (n + 3) // 4 agree for every count.
# A production deployment tunes the fraction DOWN as K grows past
# ~sqrt(N) (more, smaller cells); the N_PROBE floor keeps tiny corpora
# effectively exhaustive.
PROBE_CELL_FRAC = 0.25


def scaled_n_probe(n_cells: int) -> int:
    """Cells to probe for a corpus with ``n_cells`` IVF cells."""
    return max(N_PROBE, (n_cells + 3) // 4)


@query(
    "ann_ivf_topk",
    oracle=f"""
WITH {_FLAT_CTE},
cents AS (SELECT vec_id AS cell_id, e FROM q WHERE vec_id % {CENT_MOD} = 0),
cflat AS (
    SELECT cell_id, i, e[i] AS v
    FROM (SELECT cell_id, e, unnest(generate_series(1, len(e))) AS i FROM cents)
),
cnorms AS (SELECT cell_id, sum(v * v) AS nrm FROM cflat GROUP BY cell_id),
affinity AS (
    SELECT f.vec_id, c.cell_id,
           round(CAST(sum(f.v * c.v) AS DOUBLE) /
                 (sqrt(CAST(any_value(nv.nrm) AS DOUBLE)) *
                  sqrt(CAST(any_value(nc.nrm) AS DOUBLE))), 6) AS aff
    FROM flat f
    JOIN cflat c ON c.i = f.i
    JOIN norms nv ON nv.vec_id = f.vec_id
    JOIN cnorms nc ON nc.cell_id = c.cell_id
    GROUP BY 1, 2
),
ranked_cells AS (
    SELECT vec_id, cell_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY aff DESC, cell_id) AS crnk
    FROM affinity
),
assigned AS (SELECT vec_id, cell_id FROM ranked_cells WHERE crnk = 1),
probes AS (
    SELECT vec_id AS query_id, cell_id FROM ranked_cells
    WHERE vec_id < {N_QUERIES}
      AND crnk <= (SELECT greatest({N_PROBE},
                                   CAST(ceil(count(*) * {PROBE_CELL_FRAC})
                                        AS BIGINT))
                   FROM cents)
),
cand AS (
    SELECT p.query_id, a.vec_id AS neighbor_id
    FROM probes p JOIN assigned a ON a.cell_id = p.cell_id
    WHERE a.vec_id <> p.query_id
),
dots AS (
    SELECT c.query_id, c.neighbor_id, sum(a.v * b.v) AS dot
    FROM (SELECT DISTINCT query_id, neighbor_id FROM cand) c
    JOIN flat a ON a.vec_id = c.query_id
    JOIN flat b ON b.vec_id = c.neighbor_id AND b.i = a.i
    GROUP BY 1, 2
),
scored AS (
    SELECT d.query_id, d.neighbor_id,
           round(CAST(d.dot AS DOUBLE) /
                 (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
                 6) AS cosine
    FROM dots d
    JOIN norms na ON na.vec_id = d.query_id
    JOIN norms nb ON nb.vec_id = d.neighbor_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= {TOP_K}
""",
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path.

    Cells = a deterministic centroid subset (vec_id % CENT_MOD == 0), which
    keeps the coarse quantizer SQL-expressible for the oracle;
    `ann_ivf_trained_topk` runs the same search over k-means-trained
    centroids and gates recall. Every corpus vector is assigned to its
    max-cosine cell; a query probes its scaled_n_probe(|cells|) nearest
    cells (probes ∝ cells so the probed corpus fraction is
    scale-invariant; the oracle computes the same greatest/ceil threshold
    from its cents CTE) and brute-forces only those cells' members.

    Scale design: centroids are tiny and broadcast; assignment is a
    broadcast-join + per-vector argmax (window partitioned by vec_id — no
    skew, no global sort); the probe join is an equi-join on cell_id, so the
    shuffle carries (vec_id, cell_id) pairs and per-cell work is ~N/K. This
    is how IVF indexes (FAISS-style) decompose onto a cluster: cell = shuffle
    partition. Not in the reference (no vector ops there) — extension op."""
    vecs = _quantized(spark, sf_dir)
    cents = vecs.where(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    return _ivf_search(vecs, cents)


def _ivf_search(
    vecs: DataFrame, cents: DataFrame, n_probe: int | None = None
) -> DataFrame:
    """IVF search body, parameterized by the centroid table
    (cell_id, ce: bigint[], cn: bigint). See q_ann_ivf_topk for the plan
    commentary — this is a pure extraction so trained and subset coarse
    quantizers share one implementation.

    ``n_probe`` defaults to scaled_n_probe(|cents|) — probes ∝ cells so
    the probed corpus fraction (and hence recall) is scale-invariant.
    The |cents| count is a bounded scalar collect over the K-row centroid
    table (index-sized, never corpus-sized)."""
    from pyspark.sql import Window

    if n_probe is None:
        n_probe = scaled_n_probe(cents.count())

    # Affinity rows are SLIM (vec_id, cell_id, aff): the embedding arrays are
    # projected away before the window shuffle/sort — moving 64-element arrays
    # through an exchange just to rank 3 columns is wasted I/O at any scale.
    aff = (
        vecs.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "cell_id",
            F.round(
                _dot("e", "ce").cast("double")
                / (
                    F.sqrt(F.col("nrm").cast("double"))
                    * F.sqrt(F.col("cn").cast("double"))
                ),
                6,
            ).alias("aff"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("aff"), F.asc("cell_id"))
    # Materialize the ranked cell table once — this IS the IVF index build
    # (vec -> top cells). Without it the window subtree is recomputed for the
    # assignment branch and the probe branch (two shuffles + sorts for one
    # logical result).
    ranked_cells = (
        aff.withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") <= n_probe)
        .cache()
    )
    assigned = ranked_cells.where(F.col("crnk") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "cell_id"
    )
    probes = ranked_cells.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "cell_id"
    )
    # (query, neighbor) pairs are already unique — each neighbor lives in
    # exactly one cell (crnk == 1) and a query probes a cell at most once —
    # so no dedup shuffle is needed. Arrays come back only for the candidate
    # set: query side broadcast, neighbor side an equi-join on vec_id.
    qvecs = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    nvecs = vecs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"),
        F.col("nrm").alias("nn"),
    )
    cand = (
        probes.join(assigned, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(qvecs), "query_id")
        .join(nvecs, "neighbor_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot("qe", "ne").cast("double")
            / (
                F.sqrt(F.col("qn").cast("double"))
                * F.sqrt(F.col("nn").cast("double"))
            ),
            6,
        ).alias("cosine"),
    )
    return grouped_topn(
        scored,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        TOP_K,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("long"))


# ------------------------------------------------------- trained IVF (k-means)

KMEANS_ITERS = 3
RECALL_MIN = 0.5  # aggregate gate: recall@5 over all queries >= 50%


def train_ivf_centroids(vecs: DataFrame, iters: int = KMEANS_ITERS) -> DataFrame:
    """DataFrame-native Lloyd's k-means over the quantized corpus.

    Init = the deterministic vec_id % CENT_MOD subset (the coarse quantizer
    `ann_ivf_topk` uses directly); each round every vector joins its
    max-cosine centroid (broadcast + slim per-vector argmax window — the
    exact assignment shape the search itself uses), and centroids move to
    the element-wise floored mean of their members. All arithmetic is
    integer (sums of milli-unit bigints; the one division is exact in
    double), so training is bit-deterministic and partitioning-independent.
    Empty cells keep their previous centroid. Each round is two shuffles
    (argmax window + per-(cell,dim) mean); lineage is truncated per round
    via localCheckpoint on the K-row centroid table — the iterative-
    algorithm pattern shared with connected_components."""
    from pyspark.sql import Window

    cents = vecs.where(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("aff"), F.asc("cell_id"))
    for _ in range(iters):
        aff = vecs.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            "cell_id",
            F.round(
                _dot("e", "ce").cast("double")
                / (
                    F.sqrt(F.col("nrm").cast("double"))
                    * F.sqrt(F.col("cn").cast("double"))
                ),
                6,
            ).alias("aff"),
        )
        top1 = (
            aff.withColumn("crnk", F.row_number().over(w))
            .where(F.col("crnk") == 1)
            .select("vec_id", "cell_id")
        )
        memb = vecs.join(top1, "vec_id").selectExpr(
            "cell_id", "posexplode(e) AS (d, val)"
        )
        means = memb.groupBy("cell_id", "d").agg(
            F.floor(
                F.sum("val").cast("double") / F.count(F.lit(1))
            ).cast("long").alias("m")
        )
        moved = means.groupBy("cell_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "m"))),
                lambda s: s["m"],
            ).alias("ce")
        ).withColumn("cn", _norm("ce"))
        cents = (
            cents.select(
                "cell_id",
                F.col("ce").alias("old_ce"),
                F.col("cn").alias("old_cn"),
            )
            .join(moved, "cell_id", "left")
            .select(
                "cell_id",
                F.coalesce("ce", "old_ce").alias("ce"),
                F.coalesce("cn", "old_cn").alias("cn"),
            )
            .localCheckpoint()
        )
    return cents


@query(
    "ann_ivf_trained_topk",
    oracle=f"""
SELECT count(DISTINCT vec_id) AS n_queries,
       CAST(TRUE AS BOOLEAN) AS recall_ok
FROM embeddings WHERE vec_id < {N_QUERIES}
""",
)
def q_ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over k-means-TRAINED centroids, gated on recall@k.

    The trained coarse quantizer is not SQL-expressible, so (like the HLL
    tolerance oracle) the hash-checked contract is a measured QUALITY
    verdict: aggregate recall@{TOP_K} of the trained-IVF results vs the
    in-plan exact brute-force top-{TOP_K} must reach {RECALL_MIN} across
    the query set. Measured recall@5 with {KMEANS_ITERS} Lloyd's rounds:
    0.68 at sf0.001 and 0.70 at sf0.01, vs 0.52/0.56 for the untrained
    mod-subset quantizer — training buys ~+0.15 recall at identical search
    cost. The oracle asserts the verdict; k-means training, IVF search,
    and the exact ground truth all execute for real on the Spark side."""
    vecs = _quantized(spark, sf_dir)
    cents = train_ivf_centroids(vecs)
    ivf = _ivf_search(vecs, cents).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    truth = q_ann_brute_topk(spark, sf_dir).select("query_id", "neighbor_id")
    marked = truth.join(ivf, ["query_id", "neighbor_id"], "left")
    return marked.agg(
        F.countDistinct("query_id").alias("n_queries"),
        (
            F.sum(F.coalesce("hit", F.lit(0)))
            >= F.lit(RECALL_MIN) * F.count(F.lit(1))
        ).alias("recall_ok"),
    )


# ----------------------------------------------- persisted IVF index (build/serve)

def build_ivf_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Index-build half of the IVF lifecycle: train centroids, assign every
    vector to its cell, and PERSIST both as parquet — the offline job a
    serving layer reads. Assignments are written partitioned by cell_id so
    a probe reads only its cells' files (partition pruning = the on-disk
    form of the in-memory cell equi-join); centroids are a single small
    file. Rebuild = overwrite both (the index is derived data)."""
    vecs = _quantized(spark, sf_dir)
    cents = train_ivf_centroids(vecs)
    cents.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    assigned = _ivf_assign_top1(vecs, cents)
    (
        vecs.join(assigned, "vec_id")
        .select("cell_id", "vec_id", "e", "nrm")
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(f"{index_dir}/assignments")
    )


def _ivf_assign_top1(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Max-cosine cell per vector (the assignment half of _ivf_search)."""
    from pyspark.sql import Window

    aff = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell_id",
        F.round(
            _dot("e", "ce").cast("double")
            / (
                F.sqrt(F.col("nrm").cast("double"))
                * F.sqrt(F.col("cn").cast("double"))
            ),
            6,
        ).alias("aff"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("aff"), F.asc("cell_id"))
    return (
        aff.withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") == 1)
        .select("vec_id", "cell_id")
    )


def search_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    n_probe: int | None = None,
    top_k: int = TOP_K,
) -> DataFrame:
    """Serve half: answer ANN queries from the PERSISTED index only (no
    corpus rescan, no training). Probe cells come from the broadcast
    centroid file; candidate vectors come from the partition-pruned
    assignment read (cell_id IN probe-set reaches the parquet source as a
    partition filter). queries_df: (query_id, e, nrm) quantized vectors.
    ``n_probe`` defaults to scaled_n_probe(|centroids|)."""
    from pyspark.sql import Window

    cents = spark.read.parquet(f"{index_dir}/centroids")
    if n_probe is None:
        n_probe = scaled_n_probe(cents.count())
    probes = (
        queries_df.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "cell_id",
            F.round(
                _dot("e", "ce").cast("double")
                / (
                    F.sqrt(F.col("nrm").cast("double"))
                    * F.sqrt(F.col("cn").cast("double"))
                ),
                6,
            ).alias("aff"),
        )
        .withColumn(
            "crnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("aff"), F.asc("cell_id")
                )
            ),
        )
        .where(F.col("crnk") <= n_probe)
        .select("query_id", "cell_id")
    )
    assigns = spark.read.parquet(f"{index_dir}/assignments").select(
        "cell_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ne"),
        F.col("nrm").alias("nn"),
    )
    qv = queries_df.select(
        "query_id", F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    cand = probes.join(assigns, "cell_id").join(F.broadcast(qv), "query_id")
    scored = cand.where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot("qe", "ne").cast("double")
            / (
                F.sqrt(F.col("qn").cast("double"))
                * F.sqrt(F.col("nn").cast("double"))
            ),
            6,
        ).alias("cosine"),
    )
    return grouped_topn(
        scored,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        top_k,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("long"))


# ------------------------------------------- embedding near-dup clustering


def _embedding_components_oracle() -> str:
    """Recursive-CTE transitive closure over the embedding near-dup pairs —
    the same composition dedup_components applies to the MinHash graph."""
    from . import ORACLES

    pairs_sql = ORACLES["embedding_near_dup"].strip().rstrip(";")
    return f"""
WITH RECURSIVE
pairs AS (SELECT vec_a, vec_b FROM ({pairs_sql})),
edges AS (
    SELECT vec_a AS src, vec_b AS dst FROM pairs
    UNION ALL
    SELECT vec_b, vec_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
walk(doc_id, reach) AS (
    SELECT doc_id, doc_id FROM nodes
    UNION
    SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON e.src = w.reach
)
SELECT doc_id AS vec_id, min(reach) AS component_id FROM walk GROUP BY doc_id
"""


@query("embedding_dup_clusters", oracle=_embedding_components_oracle())
def q_embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTERS: connected components over the sign-LSH
    candidate pair graph — turns the pairwise cosine near-dups into
    keep/drop groups (canonical vector = min vec_id per component), the
    same pairs->clusters composition `dedup_components` applies to the
    MinHash graph. Iterative min-label propagation (2 shuffles/round,
    checkpointed lineage, raises on non-convergence) vs a recursive-CTE
    oracle."""
    from .dedup import connected_components

    pairs = q_embedding_near_dup(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    return connected_components(pairs).select(
        F.col("doc_id").alias("vec_id"), "component_id"
    )


# --------------------------------------------------- semantic clustering


def _kmeans_cte(iters: int) -> str:
    """Unrolled-CTE DuckDB replica of ``train_ivf_centroids`` + final
    assignment: every Lloyd round (6-dp cosine argmax assignment,
    floored-mean centroid update, empty-cell carry-over) is one CTE layer,
    so the TRAINED clustering itself is oracle-exact — unlike
    ``ann_ivf_trained_topk`` whose official check is a recall verdict.
    Returns the WITH prefix through ``assigned(vec_id, cell_id, dot)``;
    callers append their final SELECT (and any further CTEs)."""
    rounds = []
    for r in range(1, iters + 1):
        p = r - 1
        rounds.append(f"""
aff{r} AS (
    SELECT f.vec_id, c.cell_id,
           round(CAST(sum(f.v * c.v) AS DOUBLE) /
                 (sqrt(CAST(any_value(nv.nrm) AS DOUBLE)) *
                  sqrt(CAST(any_value(nc.nrm) AS DOUBLE))), 6) AS aff
    FROM flat f
    JOIN cf{p} c ON c.i = f.i
    JOIN norms nv ON nv.vec_id = f.vec_id
    JOIN cn{p} nc ON nc.cell_id = c.cell_id
    GROUP BY 1, 2
),
top{r} AS (
    SELECT vec_id, cell_id FROM (
        SELECT vec_id, cell_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY aff DESC, cell_id) AS crnk
        FROM aff{r}
    ) WHERE crnk = 1
),
mean{r} AS (
    SELECT t.cell_id, f.i,
           CAST(floor(CAST(sum(f.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
    FROM top{r} t JOIN flat f ON f.vec_id = t.vec_id
    GROUP BY 1, 2
),
cf{r} AS (
    SELECT p.cell_id, p.i, COALESCE(m.v, p.v) AS v
    FROM cf{p} p LEFT JOIN mean{r} m
      ON m.cell_id = p.cell_id AND m.i = p.i
),
cn{r} AS (SELECT cell_id, sum(v * v) AS nrm FROM cf{r} GROUP BY cell_id)""")
    return f"""
WITH {_FLAT_CTE},
cf0 AS (
    SELECT vec_id AS cell_id, i, v FROM flat WHERE vec_id % {CENT_MOD} = 0
),
cn0 AS (SELECT cell_id, sum(v * v) AS nrm FROM cf0 GROUP BY cell_id),
{",".join(rounds)},
final_aff AS (
    SELECT f.vec_id, c.cell_id, sum(f.v * c.v) AS dot,
           round(CAST(sum(f.v * c.v) AS DOUBLE) /
                 (sqrt(CAST(any_value(nv.nrm) AS DOUBLE)) *
                  sqrt(CAST(any_value(nc.nrm) AS DOUBLE))), 6) AS aff
    FROM flat f
    JOIN cf{iters} c ON c.i = f.i
    JOIN norms nv ON nv.vec_id = f.vec_id
    JOIN cn{iters} nc ON nc.cell_id = c.cell_id
    GROUP BY 1, 2
),
assigned AS (
    SELECT vec_id, cell_id, dot FROM (
        SELECT vec_id, cell_id, dot,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY aff DESC, cell_id) AS crnk
        FROM final_aff
    ) WHERE crnk = 1
)
"""


_KMEANS_ORACLE = (
    _kmeans_cte(KMEANS_ITERS)
    + """
SELECT cell_id AS cluster_id,
       count(*) AS n_vecs,
       min(vec_id) AS min_vec_id,
       max(vec_id) AS max_vec_id,
       CAST(sum(dot) AS BIGINT) AS sum_dot
FROM assigned GROUP BY 1
"""
)


@query("semantic_clusters", oracle=_KMEANS_ORACLE)
def q_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic clustering of the embedding corpus — the grouping step of
    cluster-scoped curation (SemDeDup-style: near-dup pruning and diversity
    sampling operate WITHIN semantic clusters, so the pair search never
    crosses cluster boundaries). Runs the same deterministic integer
    k-means the IVF index trains (`train_ivf_centroids`: broadcast
    centroids, 6-dp cosine argmax, floored integer means, empty-cell
    carry-over, localCheckpoint per round) and emits per-cluster size,
    id-range, and the exact integer sum of member-centroid dot products —
    all oracle-exact against an unrolled-SQL replica of every round.

    Scale design: assignment is a broadcast crossJoin (centroid table is
    K rows) + per-vector argmax window partitioned by vec_id; each Lloyd
    round shuffles only (cell, dim) partial sums. No driver-side data
    movement at any corpus size; K grows with the corpus via the CENT_MOD
    stride so cells stay O(sqrt n)-ish without a config knob."""
    assigned = _kmeans_assigned(spark, sf_dir)
    return assigned.groupBy(F.col("cell_id").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("vec_id").alias("min_vec_id"),
        F.max("vec_id").alias("max_vec_id"),
        F.sum("dot").alias("sum_dot"),
    )


def _kmeans_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell_id, dot): every vector's trained-k-means cluster plus
    the exact integer dot with its centroid — the shared assignment step of
    `semantic_clusters` and `semantic_dedup_keep` (mirrors the oracle's
    ``assigned`` CTE)."""
    from pyspark.sql import Window

    vecs = _quantized(spark, sf_dir)
    cents = train_ivf_centroids(vecs)
    aff = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell_id",
        _dot("e", "ce").alias("dot"),
        F.round(
            _dot("e", "ce").cast("double")
            / (
                F.sqrt(F.col("nrm").cast("double"))
                * F.sqrt(F.col("cn").cast("double"))
            ),
            6,
        ).alias("aff"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("aff"), F.asc("cell_id"))
    return (
        aff.withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") == 1)
        .select("vec_id", "cell_id", "dot")
    )


SEMDEDUP_THRESHOLD = NEARDUP_THRESHOLD  # cosine above which two docs are dups


_SEMDEDUP_ORACLE = (
    _kmeans_cte(KMEANS_ITERS)
    + f""",
members AS (
    SELECT a.vec_id AS doc_id, a.cell_id AS cluster_id, d.n_chars
    FROM assigned a JOIN documents d ON d.doc_id = a.vec_id
),
pairs AS (
    SELECT a.doc_id AS keep_side, b.doc_id AS drop_side,
           round(CAST(sum(fa.v * fb.v) AS DOUBLE) /
                 (sqrt(CAST(any_value(na.nrm) AS DOUBLE)) *
                  sqrt(CAST(any_value(nb.nrm) AS DOUBLE))), 6) AS cosine
    FROM members a
    JOIN members b ON b.cluster_id = a.cluster_id
       AND (a.n_chars > b.n_chars
            OR (a.n_chars = b.n_chars AND a.doc_id < b.doc_id))
    JOIN flat fa ON fa.vec_id = a.doc_id
    JOIN flat fb ON fb.vec_id = b.doc_id AND fb.i = fa.i
    JOIN norms na ON na.vec_id = a.doc_id
    JOIN norms nb ON nb.vec_id = b.doc_id
    GROUP BY 1, 2
),
dropped AS (
    SELECT DISTINCT drop_side AS doc_id FROM pairs
    WHERE cosine >= {SEMDEDUP_THRESHOLD}
)
SELECT m.doc_id, m.cluster_id, m.n_chars,
       (d.doc_id IS NULL) AS keep
FROM members m LEFT JOIN dropped d ON d.doc_id = m.doc_id
"""
)


@query("semantic_dedup_keep", oracle=_SEMDEDUP_ORACLE)
def q_semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the corpus with the
    trained k-means, then WITHIN each cluster drop any document whose
    cosine to a higher-quality clustermate (more ``n_chars``; doc_id
    tiebreak) reaches the near-dup threshold. Emits the per-document
    keep/drop verdict — quality-aware canonical selection, where the exact
    dedup families keep min-id.

    Scale design: the pair search is scoped to a cluster (one shuffle on
    cluster_id), never the corpus — the quadratic term is bounded by the
    largest cluster, which the k-means K (CENT_MOD stride) controls; the
    quality rank needs no window (the keep rule compares pair-local
    (n_chars, doc_id) tuples, so it broadcasts nothing and sorts nothing
    globally)."""
    assigned = _kmeans_assigned(spark, sf_dir)
    vecs = _quantized(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    members = (
        assigned.select(F.col("vec_id").alias("doc_id"),
                        F.col("cell_id").alias("cluster_id"))
        .join(docs, "doc_id")
        .join(vecs.select(F.col("vec_id").alias("doc_id"), "e", "nrm"),
              "doc_id")
    )
    a = members.select(
        F.col("cluster_id"),
        F.col("doc_id").alias("a_id"), F.col("n_chars").alias("a_chars"),
        F.col("e").alias("ea"), F.col("nrm").alias("na"),
    )
    b = members.select(
        F.col("cluster_id"),
        F.col("doc_id").alias("b_id"), F.col("n_chars").alias("b_chars"),
        F.col("e").alias("eb"), F.col("nrm").alias("nb"),
    )
    outranks = (F.col("a_chars") > F.col("b_chars")) | (
        (F.col("a_chars") == F.col("b_chars"))
        & (F.col("a_id") < F.col("b_id"))
    )
    pairs = a.join(b, ["cluster_id"]).where(outranks)
    cos = F.round(
        _dot("ea", "eb").cast("double")
        / (
            F.sqrt(F.col("na").cast("double"))
            * F.sqrt(F.col("nb").cast("double"))
        ),
        6,
    )
    dropped = (
        pairs.where(cos >= SEMDEDUP_THRESHOLD)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    return (
        members.select("doc_id", "cluster_id", "n_chars")
        .join(dropped, "doc_id", "left")
        .select(
            "doc_id",
            "cluster_id",
            "n_chars",
            F.coalesce(~F.col("is_dropped"), F.lit(True)).alias("keep"),
        )
    )


# ------------------------------------------------------ LSH recall audit


def _recall_audit_oracle() -> str:
    """Compose the LSH and exact near-dup oracles as derived tables (each
    carries its own WITH scope) and compare pair sets."""
    from . import ORACLES

    lsh = ORACLES["embedding_near_dup"]
    exact = ORACLES["embedding_near_dup_exact"]
    return f"""
SELECT CAST((SELECT count(*) FROM ({exact}) e) AS BIGINT) AS n_exact,
       CAST((SELECT count(*) FROM ({lsh}) l) AS BIGINT) AS n_lsh,
       CAST((SELECT count(*) FROM ({exact}) e
             WHERE NOT EXISTS (SELECT 1 FROM ({lsh}) l
                               WHERE l.vec_a = e.vec_a
                                 AND l.vec_b = e.vec_b)) AS BIGINT)
           AS n_missed,
       CAST((SELECT count(*) FROM ({lsh}) l
             WHERE NOT EXISTS (SELECT 1 FROM ({exact}) e
                               WHERE e.vec_a = l.vec_a
                                 AND e.vec_b = l.vec_b)) AS BIGINT)
           AS n_false_pos
"""


@query("lsh_recall_audit", oracle=_recall_audit_oracle())
def q_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality audit: the banded-LSH near-dup path
    (`embedding_near_dup`) measured against the exact all-pairs kernel
    (`embedding_near_dup_exact`) — pair counts, pairs the bands MISSED,
    and false positives (must be 0: candidates are exact-rescored). This
    is the audit a pipeline runs on a sample before trusting the index
    at full scale; both sides and the comparison are oracle-exact.

    Scale shape: the exact side is the expensive one by design — the
    audit runs on a bounded sample tier (here the whole sf corpus); the
    comparison itself is one full-outer join on (vec_a, vec_b) aggregated
    in-plan — a single action, no driver-side counting loop."""
    lsh = q_embedding_near_dup(spark, sf_dir).select(
        "vec_a", "vec_b", F.lit(1).alias("in_lsh")
    )
    exact = q_embedding_near_dup_exact(spark, sf_dir).select(
        "vec_a", "vec_b", F.lit(1).alias("in_exact")
    )
    both = exact.join(lsh, ["vec_a", "vec_b"], "full_outer")
    return both.agg(
        F.count("in_exact").alias("n_exact"),
        F.count("in_lsh").alias("n_lsh"),
        F.count(F.when(F.col("in_lsh").isNull(), 1)).alias("n_missed"),
        F.count(F.when(F.col("in_exact").isNull(), 1)).alias("n_false_pos"),
    )


# --------------------------------------------------- contrastive mining

HARDNEG_K = 3  # hard negatives kept per query vector


@query(
    "contrastive_mining",
    oracle=f"""
WITH {_FLAT_CTE},
dots AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
    FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < {N_QUERIES}
                            AND a.vec_id <> b.vec_id
    GROUP BY 1, 2
),
scored AS (
    SELECT d.query_id, d.neighbor_id,
           la.label = lb.label AS same_label,
           round(CAST(d.dot AS DOUBLE) /
                 (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
                 6) AS cosine
    FROM dots d
    JOIN norms na ON na.vec_id = d.query_id
    JOIN norms nb ON nb.vec_id = d.neighbor_id
    JOIN embeddings la ON la.vec_id = d.query_id
    JOIN embeddings lb ON lb.vec_id = d.neighbor_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
                  PARTITION BY query_id, same_label
                  ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
    FROM scored
)
SELECT query_id,
       CASE WHEN same_label THEN 'hard_positive' ELSE 'hard_negative' END
           AS kind,
       neighbor_id, cosine, rnk
FROM ranked
WHERE (same_label AND rnk <= 1)
   OR (NOT same_label AND rnk <= {HARDNEG_K})
""",
)
def q_contrastive_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining over the labeled embedding corpus: for each
    query vector, the {HARDNEG_K} nearest DIFFERENT-label neighbors (hard
    negatives — the pairs a contrastive loss learns most from) and the
    single nearest same-label neighbor (the hardest positive). Uses the
    `label` column as the supervision signal; exact integer cosine like
    every similarity query.

    Scale shape: identical to `ann_brute_topk` — the bounded query set is
    broadcast against the corpus and ranked per (query, label-side)
    window; for corpus-x-corpus mining the LSH/IVF candidate paths
    substitute for the broadcast, unchanged downstream."""
    from pyspark.sql import Window

    vecs = _quantized(spark, sf_dir)
    labels = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label"
    )
    q = (
        vecs.where(F.col("vec_id") < N_QUERIES)
        .join(labels, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
            F.col("nrm").alias("qn"), F.col("label").alias("qlabel"),
        )
    )
    corpus = vecs.join(labels, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"),
        F.col("nrm").alias("nn"), F.col("label").alias("nlabel"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(corpus)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.col("qlabel") == F.col("nlabel")).alias("same_label"),
            F.round(
                _dot("qe", "ne").cast("double")
                / (
                    F.sqrt(F.col("qn").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id", "same_label").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    ranked = scored.withColumn("rnk", F.row_number().over(w).cast("long"))
    return ranked.where(
        (F.col("same_label") & (F.col("rnk") <= 1))
        | (~F.col("same_label") & (F.col("rnk") <= HARDNEG_K))
    ).select(
        "query_id",
        F.when(F.col("same_label"), "hard_positive")
        .otherwise("hard_negative")
        .alias("kind"),
        "neighbor_id",
        "cosine",
        "rnk",
    )


_PURITY_ORACLE = (
    _kmeans_cte(KMEANS_ITERS)
    + """,
labeled AS (
    SELECT a.cell_id AS cluster_id, e.label
    FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id
),
by_label AS (
    SELECT cluster_id, label, count(*) AS n
    FROM labeled GROUP BY 1, 2
),
tops AS (
    SELECT cluster_id, label AS majority_label, n AS majority_n
    FROM (
        SELECT *, row_number() OVER (PARTITION BY cluster_id
                                     ORDER BY n DESC, label) AS r
        FROM by_label
    ) WHERE r = 1
),
totals AS (SELECT cluster_id, CAST(sum(n) AS BIGINT) AS n_vecs
           FROM by_label GROUP BY 1)
SELECT t.cluster_id, tt.n_vecs, t.majority_label,
       CAST(t.majority_n AS BIGINT) AS majority_n,
       CAST(t.majority_n * 1000000 // tt.n_vecs AS BIGINT) AS purity_ppm
FROM tops t JOIN totals tt ON tt.cluster_id = t.cluster_id
"""
)


@query("cluster_label_purity", oracle=_PURITY_ORACLE)
def q_cluster_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality audit: per trained-k-means cluster, the majority
    label and its integer-ppm share — the purity metric that tells a
    curation pipeline whether its semantic clusters track the labels
    before it trusts them for cluster-scoped dedup or balanced sampling.
    Rides the oracle-exact clustering (`semantic_clusters`) plus one
    labels join; all arithmetic integer.

    Scale shape: assignment as in `semantic_clusters`; the purity rollup
    is two hash aggregates on (cluster, label) then cluster — map-side
    combinable, output O(K)."""
    assigned = _kmeans_assigned(spark, sf_dir)
    labels = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label"
    )
    by_label = (
        assigned.join(labels, "vec_id")
        .groupBy(F.col("cell_id").alias("cluster_id"), "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(F.desc("n"), F.asc("label"))
    tops = (
        by_label.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select(
            "cluster_id",
            F.col("label").alias("majority_label"),
            F.col("n").alias("majority_n"),
        )
    )
    totals = by_label.groupBy("cluster_id").agg(
        F.sum("n").alias("n_vecs")
    )
    return tops.join(totals, "cluster_id").select(
        "cluster_id",
        "n_vecs",
        "majority_label",
        "majority_n",
        F.expr("CAST(majority_n * 1000000 div n_vecs AS BIGINT)").alias(
            "purity_ppm"
        ),
    )


# ----------------------------------------------- product quantization (PQ) ANN

# PQ layout: M_SUB subspaces of SUB_DIM dims, K_CODES codewords each. A
# vector's index entry is M_SUB small ints (here 8 x 4 bits = 4 B) instead of
# N_DIMS floats (256 B) — the 64x memory compression that lets a 100 TB
# embedding corpus keep its ANN index in executor memory. Search is ADC
# (asymmetric distance): the query stays full-precision and per-subspace
# distances to every codeword are precomputed once per query, so scoring a
# corpus vector is M_SUB table lookups — no vector arithmetic in the hot loop.
M_SUB = 8
SUB_DIM = N_DIMS // M_SUB
K_CODES = 16
PQ_ITERS = 3
PQ_CAND = 50        # ADC candidate pool that gets exact re-ranking
PQ_RECALL_MIN = 0.5  # aggregate recall@TOP_K gate (same contract as IVF)


def _l2(a: str, b: str) -> Column:
    """Exact integer squared L2 distance between two quantized arrays."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _subvectors(vecs: DataFrame) -> DataFrame:
    """(vec_id, sub, sv): each quantized vector split into M_SUB contiguous
    SUB_DIM-dim subvectors — a zero-shuffle narrow explode."""
    return vecs.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {M_SUB - 1}), "
                f"j -> slice(e, j * {SUB_DIM} + 1, {SUB_DIM}))"
            )
        ).alias("sub", "sv"),
    )


def train_pq_codebooks(
    vecs: DataFrame, iters: int = PQ_ITERS, seeds: DataFrame | None = None
) -> DataFrame:
    """Train all M_SUB codebooks JOINTLY with Lloyd's k-means on L2 distance:
    (sub, code, cv) with K_CODES codewords per subspace.

    One DataFrame trains every subspace at once — subvector rows carry their
    ``sub`` key, the 128-row codebook broadcast-joins on it, and the argmin /
    floored-mean updates group by (sub, code). Init = the subvectors of the
    first K_CODES vec_ids (deterministic, like IVF's mod-subset). All
    arithmetic is integer (bigint squared distances, floored means), so
    training is bit-deterministic and partitioning-independent; empty codes
    keep their previous codeword; lineage truncates per round via
    localCheckpoint on the 128-row codebook (the iterative-algorithm pattern
    shared with train_ivf_centroids).

    ``seeds``: optional (vec_id, code) DataFrame overriding the default
    init with explicit seed vectors. Lloyd's cannot SPLIT a cluster its
    init gave only one codeword — a far, tight mode (drifted append
    batch) stays one codeword forever, which is exactly the failure
    `refresh_pq_index` exists to fix — so a rebuild over a multi-modal
    store must seed codewords spanning the modes (it passes
    ntile-stratified ids)."""
    from pyspark.sql import Window

    subv = _subvectors(vecs)
    if seeds is None:
        cb = subv.where(F.col("vec_id") < K_CODES).select(
            "sub", F.col("vec_id").cast("int").alias("code"),
            F.col("sv").alias("cv"),
        )
    else:
        cb = subv.join(F.broadcast(seeds), "vec_id").select(
            "sub", F.col("code").cast("int").alias("code"),
            F.col("sv").alias("cv"),
        )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("dist"), F.asc("code")
    )
    for _ in range(iters):
        assign = subv.join(F.broadcast(cb), "sub").select(
            "vec_id", "sub", "code", _l2("sv", "cv").alias("dist")
        )
        top1 = (
            assign.withColumn("crnk", F.row_number().over(w))
            .where(F.col("crnk") == 1)
            .select("vec_id", "sub", "code")
        )
        memb = subv.join(top1, ["vec_id", "sub"]).selectExpr(
            "sub", "code", "posexplode(sv) AS (d, val)"
        )
        means = memb.groupBy("sub", "code", "d").agg(
            F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("m")
        )
        moved = means.groupBy("sub", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "m"))),
                lambda s: s["m"],
            ).alias("cv")
        )
        cb = (
            cb.select("sub", "code", F.col("cv").alias("old_cv"))
            .join(moved, ["sub", "code"], "left")
            .select(
                "sub", "code", F.coalesce("cv", "old_cv").alias("cv")
            )
            .localCheckpoint()
        )
    return cb


def _pq_literals(cb_rows, q_rows):
    """Bake the trained codebook and the per-query ADC lookup tables as SQL
    literals. cb_rows: collected (sub, code, cv); q_rows: collected quantized
    query (vec_id, e). Both are CONSTANT-sized (M_SUB*K_CODES codewords, the
    bounded query set) — the same bake-as-codegen-literal move the LSH
    hyperplanes use, NOT a corpus collect. Returns (cb_sql, lut_sql, qids_sql)
    or None if the codebook is empty."""
    if not cb_rows or not q_rows:
        return None
    book: dict[tuple[int, int], list[int]] = {
        (r["sub"], r["code"]): list(r["cv"]) for r in cb_rows
    }
    cb_py = [
        [book[(j, k)] for k in range(K_CODES)] for j in range(M_SUB)
    ]
    cb_sql = "array({})".format(
        ", ".join(
            "array({})".format(
                ", ".join(
                    "array({})".format(", ".join(f"{v}L" for v in cw))
                    for cw in cb_py[j]
                )
            )
            for j in range(M_SUB)
        )
    )
    qids = sorted(r["vec_id"] for r in q_rows)
    qvec = {r["vec_id"]: list(r["e"]) for r in q_rows}
    # lut[q][j][k] = integer squared L2 between query q's j-th subvector and
    # codeword (j, k) — exact Python ints, the same arithmetic Spark runs.
    lut_sql = "array({})".format(
        ", ".join(
            "array({})".format(
                ", ".join(
                    "array({})".format(
                        ", ".join(
                            str(
                                sum(
                                    (
                                        qvec[q][j * SUB_DIM + d]
                                        - cb_py[j][k][d]
                                    )
                                    ** 2
                                    for d in range(SUB_DIM)
                                )
                            )
                            + "L"
                            for k in range(K_CODES)
                        )
                    )
                    for j in range(M_SUB)
                )
            )
            for q in qids
        )
    )
    qids_sql = "array({})".format(", ".join(f"{q}L" for q in qids))
    return cb_sql, lut_sql, qids_sql


def _pq_codes_expr(cb_sql: str, col: str = "e") -> str:
    """SQL expression computing a vector's M_SUB PQ codes (per-subspace
    argmin against the literal codebook; array_position takes the FIRST
    minimum, so ties break toward the lowest code deterministically).
    ``col`` names the bigint-array column to encode — ``e`` for flat PQ,
    the residual column for IVF-PQ."""
    return (
        f"transform(transform(sequence(0, {M_SUB - 1}), j -> "
        f"transform(element_at({cb_sql}, j + 1), c -> "
        f"aggregate(zip_with(slice({col}, j * {SUB_DIM} + 1, {SUB_DIM}), c, "
        f"(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), "
        f"(acc, v) -> acc + v))), "
        f"dl -> CAST(array_position(dl, array_min(dl)) AS INT) - 1)"
    )


def _pq_adc_topk(codes_df, store, cb_rows, q_rows):
    """Shared PQ search body: ADC-score the coded corpus for every query,
    take the top-{PQ_CAND} candidate pool per query, exact-re-rank against
    the full-precision vectors in ``store`` (vec_id, e, nrm), and return
    the per-query top-{TOP_K} (query_id, neighbor_id, cosine, rnk). Used
    by both the inline query (codes computed in-plan) and the persisted
    index's serve path (codes read from parquet). Returns None for an
    empty codebook/query set."""
    baked = _pq_literals(cb_rows, q_rows)
    if baked is None:
        return None
    _, lut_sql, qids_sql = baked
    scores_expr = (
        f"transform({lut_sql}, ql -> "
        f"aggregate(sequence(0, {M_SUB - 1}), CAST(0 AS BIGINT), "
        f"(acc, j) -> acc + element_at(element_at(ql, j + 1), "
        f"element_at(codes, j + 1) + 1)))"
    )
    scored = (
        codes_df.select(
            "vec_id", F.posexplode(F.expr(scores_expr)).alias("pos", "adist")
        )
        .withColumn("query_id", F.expr(f"element_at({qids_sql}, pos + 1)"))
        .where(F.col("query_id") != F.col("vec_id"))
    )
    cands = grouped_topn(
        scored,
        ["query_id"],
        [F.asc("adist"), F.asc("vec_id")],
        PQ_CAND,
        keep_rank=False,
    ).select("query_id", "vec_id")
    nbr = store.select(
        F.col("vec_id"), F.col("e").alias("ne"), F.col("nrm").alias("nn")
    )
    # Re-rank against the CALLER-SUPPLIED query vectors, not a store
    # lookup — search_pq_index must answer queries whose vec_id is not in
    # the persisted index (a store filter would silently drop them).
    qv = codes_df.sparkSession.createDataFrame(
        [(int(r["vec_id"]), [int(x) for x in r["e"]]) for r in q_rows],
        "query_id bigint, qe array<bigint>",
    ).withColumn("qn", _norm("qe"))
    rer = (
        F.broadcast(cands)
        .join(nbr, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot("qe", "ne").cast("double")
                / (
                    F.sqrt(F.col("qn").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    return grouped_topn(
        rer,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        TOP_K,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("long"))


@query(
    "ann_pq_topk",
    oracle=f"""
SELECT count(DISTINCT vec_id) AS n_queries,
       CAST(TRUE AS BOOLEAN) AS recall_ok
FROM embeddings WHERE vec_id < {N_QUERIES}
""",
)
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-ranking, gated on recall@k.

    Pipeline: (1) train M_SUB x K_CODES codebooks (integer Lloyd's, one
    DataFrame for all subspaces); (2) bake the trained codebook + per-query
    ADC lookup tables into the plan as literals, so ENCODING (per-subspace
    argmin) and SCORING (M_SUB lookups per query) are ONE narrow zero-shuffle
    projection over the corpus; (3) per-query top-{PQ_CAND} ADC candidates
    (the only corpus shuffle); (4) exact integer-cosine re-rank of candidates
    against the full-precision vectors; (5) aggregate recall@{TOP_K} vs the
    in-plan brute-force truth must reach {PQ_RECALL_MIN}.

    Like ann_ivf_trained_topk, the trained index is not SQL-expressible, so
    the hash-checked contract is the measured quality verdict; training,
    encoding, ADC search, re-rank, and the exact ground truth all execute
    for real on the Spark side. At scale the corpus-side cost is one scan
    (codes are 4 B/vector if persisted) + a top-C shuffle of slim
    (query_id, vec_id, adist) rows — no pairwise joins.

    Measured recall@{TOP_K} with {PQ_ITERS} Lloyd's rounds and a
    {PQ_CAND}-candidate pool: 0.76 at sf0.001 (500 vecs), 0.74 at sf0.01
    (500), 0.60 at sf0.1 (2000 — the pool is 2.5% of that corpus; at fixed
    pool fraction recall holds, the constant-C run is the honest
    worst case). The {PQ_RECALL_MIN} gate leaves ~1.5x margin at the
    official sf0.01 check."""
    vecs = _quantized(spark, sf_dir)
    cb_rows = train_pq_codebooks(vecs).collect()
    q_rows = (
        vecs.where(F.col("vec_id") < N_QUERIES).select("vec_id", "e").collect()
    )
    baked = _pq_literals(cb_rows, q_rows)
    if baked is None:
        return spark.createDataFrame(
            [], "n_queries bigint, recall_ok boolean"
        )
    cb_sql = baked[0]
    codes_df = vecs.withColumn("codes", F.expr(_pq_codes_expr(cb_sql)))
    pq_top = _pq_adc_topk(codes_df, vecs, cb_rows, q_rows).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    truth = q_ann_brute_topk(spark, sf_dir).select("query_id", "neighbor_id")
    marked = truth.join(pq_top, ["query_id", "neighbor_id"], "left")
    return marked.agg(
        F.countDistinct("query_id").alias("n_queries"),
        (
            F.sum(F.coalesce("hit", F.lit(0)))
            >= F.lit(PQ_RECALL_MIN) * F.count(F.lit(1))
        ).alias("recall_ok"),
    )


# ----------------------------------------- persisted PQ index (build/serve)

def build_pq_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Index-build half of the PQ lifecycle: train the codebooks, encode the
    corpus with the baked-literal projection (zero shuffle), and persist
    codebooks + the coded corpus. The stored row is (vec_id, codes, e, nrm)
    — codes drive ADC scoring; e/nrm serve the exact re-rank without
    touching the original corpus files (the IVF-assignments pattern; a
    codes-only index would re-read the corpus for re-ranking instead).
    Rebuild = overwrite both (the index is derived data).

    Layout: the base corpus lands under ``codes/batch=base`` so that
    `append_pq_index` deltas (``codes/batch=<id>``) sit next to it as
    sibling partitions — one partition-discovering read serves base +
    all appended deltas."""
    vecs = _quantized(spark, sf_dir)
    cb = train_pq_codebooks(vecs)
    cb.write.mode("overwrite").parquet(f"{index_dir}/codebooks")
    cb_rows = cb.collect()
    if not cb_rows:
        vecs.select(
            "vec_id",
            F.expr("CAST(array() AS array<int>)").alias("codes"),
            "e",
            "nrm",
        ).write.mode("overwrite").parquet(f"{index_dir}/codes/batch=base")
        return
    cb_sql = _pq_literals(cb_rows, [{"vec_id": -1, "e": [0] * N_DIMS}])[0]
    (
        vecs.withColumn("codes", F.expr(_pq_codes_expr(cb_sql)))
        .select("vec_id", "codes", "e", "nrm")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/codes/batch=base")
    )


def append_pq_index(
    spark: SparkSession, index_dir: str, delta: DataFrame, batch_id: int
) -> None:
    """Incremental index maintenance: encode a DELTA corpus with the
    STORED codebooks (no retraining, base never rescanned) and append it
    as a new parquet partition under ``codes/batch=<id>`` —
    overwrite-idempotent under replay, like the rollup/view stores.
    ``delta``: (vec_id, e, nrm) quantized vectors (see _quantized).

    The quantization residual of skipping retraining is the standard
    production trade (rebuild when drift accumulates); search results for
    appended vectors are exact in the re-rank stage regardless, since ADC
    only shapes the candidate pool. The batch lands as a sibling
    partition of the base (``codes/batch=base``), so the serve path's
    partition-discovering read sees base + all deltas with no
    compaction step."""
    cb_rows = spark.read.parquet(f"{index_dir}/codebooks").collect()
    if not cb_rows:
        raise ValueError(f"no codebooks at {index_dir} — build first")
    cb_sql = _pq_literals(cb_rows, [{"vec_id": -1, "e": [0] * N_DIMS}])[0]
    (
        delta.withColumn("codes", F.expr(_pq_codes_expr(cb_sql)))
        .select("vec_id", "codes", "e", "nrm")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/codes/batch={batch_id}")
    )


def search_pq_index(
    spark: SparkSession, index_dir: str, queries_df: DataFrame
) -> DataFrame:
    """Serve half: answer ANN queries from the PERSISTED PQ index only —
    no training, no corpus rescan, no re-encoding. The per-query ADC
    lookup tables come from the stored codebooks + the (bounded) collected
    query vectors; scoring reads the 4 B/vector codes column and
    re-ranking reads the stored full-precision columns.
    queries_df: (vec_id, e) quantized query vectors."""
    cb_rows = spark.read.parquet(f"{index_dir}/codebooks").collect()
    q_rows = queries_df.select("vec_id", "e").collect()
    store = spark.read.parquet(f"{index_dir}/codes")
    out = _pq_adc_topk(store.select("vec_id", "codes"), store, cb_rows, q_rows)
    if out is None:
        return spark.createDataFrame(
            [],
            "query_id bigint, neighbor_id bigint, cosine double, rnk bigint",
        )
    return out


# ------------------------------------------- PQ index lifecycle: refresh

PQ_REFRESH_RECALL_MIN = 0.5  # audit gate that triggers (and re-passes) refresh


def audit_pq_index_recall(
    spark: SparkSession, index_dir: str, queries_df: DataFrame, k: int = TOP_K
) -> tuple[int, int]:
    """Measure the persisted PQ index's recall@k for ``queries_df``
    (vec_id, e) against EXACT cosine truth over the full store — the
    audit half of the rebuild decision. Returns (hits, total) as exact
    ints (integer dot products, round(,6) cosines, asc-id ties — the
    same metric the serve path ranks by, so the number is deterministic
    and partitioning-independent).

    This is an AUDIT TIER like `lsh_recall_audit`: the truth side scores
    the whole store for the query set. Run it on a query SAMPLE on a big
    index; the serve path itself stays ADC-pruned."""
    served = search_pq_index(spark, index_dir, queries_df).where(
        F.col("rnk") <= k
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    store = spark.read.parquet(f"{index_dir}/codes")
    qv = queries_df.select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    ).withColumn("qn", _norm("qe"))
    exact = (
        store.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("e").alias("ne"),
            F.col("nrm").alias("nn"),
        )
        .crossJoin(F.broadcast(qv))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot("qe", "ne").cast("double")
                / (
                    F.sqrt(F.col("qn").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    truth = grouped_topn(
        exact,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        k,
        keep_rank=False,
    ).select("query_id", "neighbor_id")
    row = (
        truth.join(served, ["query_id", "neighbor_id"], "left")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("hits"),
            F.count(F.lit(1)).cast("long").alias("total"),
        )
        .first()
    )
    return int(row["hits"] or 0), int(row["total"] or 0)


def refresh_pq_index(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    recall_min: float = PQ_REFRESH_RECALL_MIN,
) -> dict:
    """The "when to rebuild" half of the PQ index lifecycle:
    audit → decide → rebuild → re-audit. `append_pq_index` deliberately
    encodes deltas with STALE codebooks (the standard production trade);
    this operator closes the loop by measuring recall decay and
    re-training the codebooks over the CURRENT store (base + all
    appended deltas) once the audit drops below ``recall_min``.

    Rebuild mechanics: the store is re-encoded with freshly trained
    codebooks into a STAGED directory first, then swapped into place and
    compacted back to a single ``codes/batch=base`` partition (delta
    partitions are folded in — the index restarts its append lifecycle).
    The stage-then-swap is the local-filesystem form of the
    pointer-flip/rename a production deployment does on object storage;
    nothing ever reads and overwrites the same files in one job.

    Returns {"recall_before", "recall_after": float, "refreshed": bool,
    "hits/total_before/after": int} — all exact integers underneath.
    No-op (refreshed=False, after==before) when the audit passes."""
    import os
    import shutil

    hits_b, tot_b = audit_pq_index_recall(spark, index_dir, queries_df)
    before = (hits_b / tot_b) if tot_b else 1.0
    refreshed = tot_b > 0 and before < recall_min
    if refreshed:
        from pyspark.sql import Window

        store = spark.read.parquet(f"{index_dir}/codes").select(
            "vec_id", "e", "nrm"
        )
        # Stratified re-init: K_CODES seed ids spread across the id range
        # via ntile, so every append batch (drifted mode) contributes
        # seeds — Lloyd's cannot split a far cluster its init gave one
        # codeword, and the default vec_id < K_CODES init is all-base.
        # The ntile sorts ONLY the slim vec_id column; a one-off global
        # sort of 8 bytes/row is the acceptable price of a REBUILD job
        # (the serve path never does this).
        tiles = store.select("vec_id").withColumn(
            "t", F.ntile(K_CODES).over(Window.orderBy("vec_id"))
        )
        seed_ids = tiles.groupBy("t").agg(
            F.min("vec_id").alias("vec_id")
        ).select("vec_id", (F.col("t") - 1).cast("int").alias("code"))
        cb = train_pq_codebooks(store.select("vec_id", "e"), seeds=seed_ids)
        cb_rows = cb.collect()
        staged = f"{index_dir}/codes_staged"
        if cb_rows:
            cb_sql = _pq_literals(
                cb_rows, [{"vec_id": -1, "e": [0] * N_DIMS}]
            )[0]
            (
                store.withColumn("codes", F.expr(_pq_codes_expr(cb_sql)))
                .select("vec_id", "codes", "e", "nrm")
                .write.mode("overwrite")
                .parquet(staged)
            )
            spark.createDataFrame(
                cb_rows, "sub int, code int, cv array<bigint>"
            ).write.mode("overwrite").parquet(f"{index_dir}/codebooks")
            shutil.rmtree(f"{index_dir}/codes")
            os.makedirs(f"{index_dir}/codes")
            os.rename(staged, f"{index_dir}/codes/batch=base")
        hits_a, tot_a = audit_pq_index_recall(spark, index_dir, queries_df)
    else:
        hits_a, tot_a = hits_b, tot_b
    after = (hits_a / tot_a) if tot_a else 1.0
    return {
        "recall_before": before,
        "recall_after": after,
        "refreshed": refreshed,
        "hits_before": hits_b,
        "total_before": tot_b,
        "hits_after": hits_a,
        "total_after": tot_a,
    }


# Distribution drift used by the pq_index_refresh scenario: a constant
# milli-unit offset on every component — an appended batch from a shifted
# embedding distribution (new encoder checkpoint, new modality). Under the
# STALE codebooks the whole drifted mode collapses to one codeword per
# subspace (zero ADC discrimination); measured recall drops to 0.28.
PQ_DRIFT_EXPR = "transform(e, x -> x + 20000)"


@query(
    "pq_index_refresh",
    oracle=f"""
SELECT count(DISTINCT vec_id) AS n_queries,
       CAST(TRUE AS BOOLEAN) AS refreshed,
       CAST(TRUE AS BOOLEAN) AS recall_recovered
FROM embeddings WHERE vec_id < {N_QUERIES}
""",
)
def q_pq_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL PQ index lifecycle executed end-to-end: build → append a
    DRIFTED delta (stale-codebook encoding, the documented
    `append_pq_index` trade) → audit recall for drift-targeted queries →
    decide → rebuild with stratified re-seeded codebooks over
    base+delta → re-audit. The hash-checked contract is the verdict pair
    (refresh TRIGGERED because the stale audit fell below
    {PQ_REFRESH_RECALL_MIN}; recall RECOVERED above the gate after the
    rebuild); every stage — training, encoding, serving, both audits,
    the staged-swap compaction — runs for real against a scratch index
    directory.

    Measured: stale recall@{TOP_K} 0.28 (the drifted mode is ONE
    codeword per subspace — ADC cannot rank inside it), refreshed 0.64
    at sf0.001 / 0.66 at sf0.01 with per-delta code diversity restored
    (1 → 500 distinct code vectors). The no-op path (healthy audit →
    no rebuild, store untouched) is pytest-pinned separately."""
    import shutil
    import tempfile

    vecs = _quantized(spark, sf_dir)
    idx = tempfile.mkdtemp(prefix="pq_refresh_")
    try:
        build_pq_index(spark, sf_dir, idx)
        if not spark.read.parquet(f"{idx}/codebooks").head(1):
            return spark.createDataFrame(
                [(0, False, False)],
                "n_queries bigint, refreshed boolean, "
                "recall_recovered boolean",
            )
        delta = vecs.select(
            (F.col("vec_id") + 10**6).alias("vec_id"),
            F.expr(PQ_DRIFT_EXPR).alias("e"),
        ).withColumn("nrm", _norm("e"))
        append_pq_index(spark, idx, delta, batch_id=0)
        queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
            (F.col("vec_id") + 2 * 10**6).alias("vec_id"),
            F.expr(PQ_DRIFT_EXPR).alias("e"),
        )
        n_q = queries.count()
        r = refresh_pq_index(spark, idx, queries)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    recovered = bool(
        r["refreshed"]
        and r["recall_after"] >= PQ_REFRESH_RECALL_MIN
        and r["recall_after"] > r["recall_before"]
    )
    return spark.createDataFrame(
        [(int(n_q), bool(r["refreshed"]), recovered)],
        "n_queries bigint, refreshed boolean, recall_recovered boolean",
    )


# ------------------------------------------------------- IVF-PQ composition

IVFPQ_RECALL_MIN = 0.5  # aggregate recall@TOP_K gate; see docstring numbers


def _pq_lut_expr(cb_sql: str, col: str) -> str:
    """ADC lookup table for one vector: lut[j][k] = integer squared L2
    between ``col``'s j-th subvector and codeword (j, k). For flat PQ the
    vector is the query itself (baked as a literal in _pq_literals); for
    IVF-PQ it is the per-(query, probed-cell) RESIDUAL, computed in-plan
    because the table depends on which cells the query probes."""
    return (
        f"transform(sequence(0, {M_SUB - 1}), j -> "
        f"transform(element_at({cb_sql}, j + 1), c -> "
        f"aggregate(zip_with(slice({col}, j * {SUB_DIM} + 1, {SUB_DIM}), c, "
        f"(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), "
        f"(acc, v) -> acc + v)))"
    )


@query(
    "ann_ivfpq_topk",
    oracle=f"""
SELECT count(DISTINCT vec_id) AS n_queries,
       CAST(TRUE AS BOOLEAN) AS recall_ok
FROM embeddings WHERE vec_id < {N_QUERIES}
""",
)
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the production 100 TB ANN shape — a trained IVF coarse
    quantizer prunes the search to {N_PROBE} probed cells, PQ codes of
    the RESIDUAL (vector minus its cell centroid) rank candidates inside
    those cells by ADC, and the top-{PQ_CAND} pool is exact-re-ranked.
    Composes the two existing halves (train_ivf_centroids,
    train_pq_codebooks) the way FAISS's IVFADC does: residual encoding
    concentrates each subquantizer on the within-cell distribution, so
    the same {M_SUB}x{K_CODES} code budget quantizes much finer than
    flat PQ over the raw vectors.

    Plan shape at scale: centroids and codebooks are the only collected
    tables (K cells + {M_SUB}x{K_CODES} codewords); assignment/encoding
    is a broadcast join + codegen projection over one corpus scan; the
    per-(query, cell) residual LUTs are a {N_QUERIES}x{N_PROBE}-row
    broadcast built in-plan (they depend on which cells each query
    probes, so they cannot be baked as literals like flat PQ's); ADC
    scoring touches ONLY probed cells' members via the cell_id equi-join
    (the IVF pruning flat PQ lacks — at 1000 cells / {N_PROBE} probes,
    ~{N_PROBE}/1000 of the corpus is scored); the sole corpus-sized
    shuffle is the slim (query_id, vec_id, adist) top-{PQ_CAND} pool.

    Like the other trained-index rows, the hash-checked contract is the
    measured quality verdict (aggregate recall@{TOP_K} vs the in-plan
    brute-force truth >= {IVFPQ_RECALL_MIN}); training, residual
    encoding, probed ADC search, and re-rank all execute for real.
    Measured recall@{TOP_K}: 0.68 at sf0.001 and 0.70 at sf0.01 —
    EQUAL to trained-IVF's exact-within-cells 0.68/0.70, i.e. the
    residual-PQ ADC stage is lossless at this code budget and the
    composition inherits only the coarse quantizer's pruning miss;
    contrast flat PQ's 0.76/0.74, which scores the WHOLE corpus to get
    +0.05. nprobe scales with the cell count (scaled_n_probe — probes
    ~{PROBE_CELL_FRAC:.0%} of cells): at sf0.1 that is 16/63 cells and
    recall holds at 0.60 (it was 0.34 under a fixed nprobe=4 covering
    only 4/63 — the collapse the scaling rule exists to prevent);
    gate-clear at all three SFs, pinned in
    tests/test_operators.py::test_ivf_nprobe_scaling_holds_recall."""
    from pyspark.sql import Window

    vecs = _quantized(spark, sf_dir)
    cents = train_ivf_centroids(vecs)
    assigned = _ivf_assign_top1(vecs, cents)
    resid = (
        vecs.join(assigned, "vec_id")
        .join(F.broadcast(cents), "cell_id")
        .select(
            "vec_id",
            "cell_id",
            F.expr("zip_with(e, ce, (x, y) -> x - y)").alias("re"),
        )
    )
    cb_rows = train_pq_codebooks(
        resid.select("vec_id", F.col("re").alias("e"))
    ).collect()
    if not cb_rows:
        return spark.createDataFrame([], "n_queries bigint, recall_ok boolean")
    cb_sql = _pq_literals(cb_rows, [{"vec_id": -1, "e": [0] * N_DIMS}])[0]
    codes_df = resid.select(
        "vec_id", "cell_id", F.expr(_pq_codes_expr(cb_sql, "re")).alias("codes")
    )
    qv = vecs.where(F.col("vec_id") < N_QUERIES)
    n_probe = scaled_n_probe(cents.count())
    w = Window.partitionBy("query_id").orderBy(F.desc("aff"), F.asc("cell_id"))
    probes = (
        qv.crossJoin(F.broadcast(cents))
        .select(
            F.col("vec_id").alias("query_id"),
            "cell_id",
            "e",
            "ce",
            F.round(
                _dot("e", "ce").cast("double")
                / (
                    F.sqrt(F.col("nrm").cast("double"))
                    * F.sqrt(F.col("cn").cast("double"))
                ),
                6,
            ).alias("aff"),
        )
        .withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") <= n_probe)
        .withColumn("qres", F.expr("zip_with(e, ce, (x, y) -> x - y)"))
        .select(
            "query_id", "cell_id", F.expr(_pq_lut_expr(cb_sql, "qres")).alias("lut")
        )
    )
    adist_expr = (
        f"aggregate(sequence(0, {M_SUB - 1}), CAST(0 AS BIGINT), "
        f"(acc, j) -> acc + element_at(element_at(lut, j + 1), "
        f"element_at(codes, j + 1) + 1))"
    )
    scored = (
        codes_df.join(F.broadcast(probes), "cell_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", F.expr(adist_expr).alias("adist"))
    )
    pool = grouped_topn(
        scored,
        ["query_id"],
        [F.asc("adist"), F.asc("vec_id")],
        PQ_CAND,
        keep_rank=False,
    ).select("query_id", "vec_id")
    qfull = qv.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    nbr = vecs.select(
        "vec_id", F.col("e").alias("ne"), F.col("nrm").alias("nn")
    )
    rer = (
        F.broadcast(pool)
        .join(nbr, "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot("qe", "ne").cast("double")
                / (
                    F.sqrt(F.col("qn").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    top = grouped_topn(
        rer,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        TOP_K,
        keep_rank=False,
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    truth = q_ann_brute_topk(spark, sf_dir).select("query_id", "neighbor_id")
    marked = truth.join(top, ["query_id", "neighbor_id"], "left")
    return marked.agg(
        F.countDistinct("query_id").alias("n_queries"),
        (
            F.sum(F.coalesce("hit", F.lit(0)))
            >= F.lit(IVFPQ_RECALL_MIN) * F.count(F.lit(1))
        ).alias("recall_ok"),
    )


# ----------------------------------- persisted IVF-PQ index (build/serve)


def build_ivfpq_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Index-build half of the IVF-PQ lifecycle: train the coarse
    quantizer, train residual-PQ codebooks, and persist centroids +
    codebooks + the coded corpus PARTITIONED BY CELL — so the serve
    path's probe reads only its cells' files (partition pruning is the
    on-disk form of the cell equi-join, the `build_ivf_index` layout
    applied to 4x smaller rows: codes instead of raw vectors, plus the
    full-precision columns for re-rank). Rebuild = overwrite (derived
    data)."""
    vecs = _quantized(spark, sf_dir)
    cents = train_ivf_centroids(vecs)
    cents.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    assigned = _ivf_assign_top1(vecs, cents)
    resid = (
        vecs.join(assigned, "vec_id")
        .join(F.broadcast(cents), "cell_id")
        .select(
            "vec_id",
            "cell_id",
            F.expr("zip_with(e, ce, (x, y) -> x - y)").alias("re"),
            "e",
            "nrm",
        )
    )
    cb = train_pq_codebooks(resid.select("vec_id", F.col("re").alias("e")))
    cb.write.mode("overwrite").parquet(f"{index_dir}/codebooks")
    cb_rows = cb.collect()
    if not cb_rows:
        resid.select(
            "cell_id",
            "vec_id",
            F.expr("CAST(array() AS array<int>)").alias("codes"),
            "e",
            "nrm",
        ).write.mode("overwrite").partitionBy("cell_id").parquet(
            f"{index_dir}/codes"
        )
        return
    cb_sql = _pq_literals(cb_rows, [{"vec_id": -1, "e": [0] * N_DIMS}])[0]
    (
        resid.withColumn("codes", F.expr(_pq_codes_expr(cb_sql, "re")))
        .select("cell_id", "vec_id", "codes", "e", "nrm")
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(f"{index_dir}/codes")
    )


def search_ivfpq_index(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    n_probe: int | None = None,
    top_k: int = TOP_K,
) -> DataFrame:
    """Serve half: answer ANN queries from the PERSISTED IVF-PQ index
    only — no training, no corpus rescan. Probe cells come from the
    broadcast centroid file; the per-(query, cell) residual ADC lookup
    tables are built in-plan from the stored codebooks (the same
    bounded broadcast as the inline `ann_ivfpq_topk`); candidate codes
    come from a partition-pruned read (``cell_id IN probe-set`` reaches
    the parquet source as a partition filter); re-rank reads the stored
    full-precision columns. queries_df: (vec_id, e) quantized query
    vectors."""
    from pyspark.sql import Window

    cents = spark.read.parquet(f"{index_dir}/centroids")
    cb_rows = spark.read.parquet(f"{index_dir}/codebooks").collect()
    q_rows = queries_df.select("vec_id", "e").collect()
    empty = spark.createDataFrame(
        [], "query_id bigint, neighbor_id bigint, cosine double, rnk bigint"
    )
    if not cb_rows or not q_rows:
        return empty
    cb_sql = _pq_literals(cb_rows, [{"vec_id": -1, "e": [0] * N_DIMS}])[0]
    qv = spark.createDataFrame(
        [(int(r["vec_id"]), [int(x) for x in r["e"]]) for r in q_rows],
        "query_id bigint, e array<bigint>",
    ).withColumn("nrm", _norm("e"))
    w = Window.partitionBy("query_id").orderBy(F.desc("aff"), F.asc("cell_id"))
    probes = (
        qv.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "cell_id",
            "e",
            "ce",
            F.round(
                _dot("e", "ce").cast("double")
                / (
                    F.sqrt(F.col("nrm").cast("double"))
                    * F.sqrt(F.col("cn").cast("double"))
                ),
                6,
            ).alias("aff"),
        )
        .withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") <= n_probe)
        .withColumn("qres", F.expr("zip_with(e, ce, (x, y) -> x - y)"))
        .select(
            "query_id",
            "cell_id",
            F.expr(_pq_lut_expr(cb_sql, "qres")).alias("lut"),
        )
    )
    probe_cells = sorted({r["cell_id"] for r in probes.select("cell_id").collect()})
    store = spark.read.parquet(f"{index_dir}/codes").where(
        F.col("cell_id").isin(probe_cells) if probe_cells else F.lit(False)
    )
    adist_expr = (
        f"aggregate(sequence(0, {M_SUB - 1}), CAST(0 AS BIGINT), "
        f"(acc, j) -> acc + element_at(element_at(lut, j + 1), "
        f"element_at(codes, j + 1) + 1))"
    )
    scored = (
        store.join(F.broadcast(probes), "cell_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", F.expr(adist_expr).alias("adist"))
    )
    pool = grouped_topn(
        scored,
        ["query_id"],
        [F.asc("adist"), F.asc("vec_id")],
        PQ_CAND,
        keep_rank=False,
    ).select("query_id", "vec_id")
    nbr = store.select(
        "vec_id", F.col("e").alias("ne"), F.col("nrm").alias("nn")
    )
    qfull = qv.select(
        "query_id", F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    rer = (
        F.broadcast(pool)
        .join(nbr, "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot("qe", "ne").cast("double")
                / (
                    F.sqrt(F.col("qn").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    return grouped_topn(
        rer,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        top_k,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("long"))


# ---------------------------------------------- SQ8 scalar quantization

SQ_LEVELS = 255      # 8-bit codes: 0..255 per dimension
SQ_RECALL_MIN = 0.7  # aggregate recall@TOP_K gate (finer codes than PQ)


@query(
    "ann_sq8_topk",
    oracle=f"""
SELECT count(DISTINCT vec_id) AS n_queries,
       CAST(TRUE AS BOOLEAN) AS recall_ok
FROM embeddings WHERE vec_id < {N_QUERIES}
""",
)
def q_ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 flat scalar quantization — the third point on the ANN
    compression curve (brute float > SQ8 {N_DIMS} B/vec > PQ {M_SUB}
    B/vec): each dimension is affinely mapped to an 8-bit code against
    the corpus per-dim [min, max], the scan ranks by approximate cosine
    over DEQUANTIZED values, and the top-{PQ_CAND} pool is exact
    re-ranked. At 100 TB the point is scan I/O: a full-corpus SQ scan
    reads 4x less than float32 (and the arithmetic stays integer), while
    keeping much higher fidelity than PQ — the standard
    middle tier (FAISS SQ8) between exact flat search and IVF/PQ
    pruning.

    Determinism: codes are pure integer affine maps
    (``(x - lo) * {SQ_LEVELS} div max(hi - lo, 1)``, clamped); the
    dequantized dot is an EXACT bigint at 255x scale (x̂·255 = lo·255 +
    code·(hi - lo), products < 2^53); the one double division per pair
    happens at the ranking edge. The per-dim [lo, hi] table is a
    {N_DIMS}-row broadcast — a corpus-size-independent constant, like
    the PQ codebooks.

    Measured recall@{TOP_K}: 1.00 at sf0.001, sf0.01 AND sf0.1 (50/50
    truth pairs at each) — 8-bit-per-dim fidelity recovers the exact
    ranking once the {PQ_CAND}-candidate pool is re-ranked (gate
    {SQ_RECALL_MIN} guards against a quantization-map regression)."""
    vecs = _quantized(spark, sf_dir)
    dims = vecs.select(
        F.posexplode("e").alias("d", "x")
    ).groupBy("d").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    dim_arr = dims.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "lo", "hi"))),
            lambda s: F.struct(s["lo"].alias("lo"), s["hi"].alias("hi")),
        ).alias("dd")
    )
    # codes[d] = clamp((x - lo) * LEVELS div max(hi - lo, 1)); dequantized
    # value at 255x scale = lo*255 + code*(hi - lo), exact bigint
    code_expr = (
        f"zip_with(e, dd, (x, r) -> CAST(least(greatest("
        f"(x - r.lo) * {SQ_LEVELS} div greatest(r.hi - r.lo, 1), 0), "
        f"{SQ_LEVELS}) AS BIGINT))"
    )
    deq_expr = (
        f"zip_with(codes, dd, (c, r) -> "
        f"r.lo * {SQ_LEVELS} + c * (r.hi - r.lo))"
    )
    coded = (
        vecs.crossJoin(F.broadcast(dim_arr))
        .withColumn("codes", F.expr(code_expr))
        .withColumn("xq", F.expr(deq_expr))
        .withColumn("nq", _norm("xq"))
        .select("vec_id", "xq", "nq")
    )
    qcoded = coded.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("xq").alias("qx"),
        F.col("nq").alias("qn"),
    )
    approx = (
        coded.crossJoin(F.broadcast(qcoded))
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot("qx", "xq").cast("double")
                / (
                    F.sqrt(F.col("qn").cast("double"))
                    * F.sqrt(F.col("nq").cast("double"))
                ),
                6,
            ).alias("acos"),
        )
    )
    pool = grouped_topn(
        approx,
        ["query_id"],
        [F.desc("acos"), F.asc("vec_id")],
        PQ_CAND,
        keep_rank=False,
    ).select("query_id", "vec_id")
    qfull = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn2"),
    )
    nbr = vecs.select(
        "vec_id", F.col("e").alias("ne"), F.col("nrm").alias("nn")
    )
    rer = (
        F.broadcast(pool)
        .join(nbr, "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot("qe", "ne").cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    top = grouped_topn(
        rer,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        TOP_K,
        keep_rank=False,
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    truth = q_ann_brute_topk(spark, sf_dir).select("query_id", "neighbor_id")
    marked = truth.join(top, ["query_id", "neighbor_id"], "left")
    return marked.agg(
        F.countDistinct("query_id").alias("n_queries"),
        (
            F.sum(F.coalesce("hit", F.lit(0)))
            >= F.lit(SQ_RECALL_MIN) * F.count(F.lit(1))
        ).alias("recall_ok"),
    )


# ------------------------------------- dimension-truncation (MRL) audit

MRL_DIMS = (16, 32, 64)   # prefix lengths audited (64 = full = recall 1.0)


@query(
    "matryoshka_recall_audit",
    oracle=f"""
WITH {_FLAT_CTE},
tdots AS (
    SELECT k.k, a.vec_id AS query_id, b.vec_id AS neighbor_id,
           sum(CASE WHEN a.i <= k.k THEN a.v * b.v ELSE 0 END) AS dot,
           sum(CASE WHEN a.i <= k.k THEN a.v * a.v ELSE 0 END) AS qn,
           sum(CASE WHEN a.i <= k.k THEN b.v * b.v ELSE 0 END) AS nn
    FROM flat a
    JOIN flat b ON a.i = b.i AND a.vec_id < {N_QUERIES}
                AND a.vec_id <> b.vec_id
    CROSS JOIN (SELECT unnest(ARRAY{list(MRL_DIMS)}) AS k) k
    GROUP BY 1, 2, 3
),
tranked AS (
    SELECT k, query_id, neighbor_id,
           row_number() OVER (
               PARTITION BY k, query_id
               ORDER BY round(CAST(dot AS DOUBLE)
                              / (sqrt(CAST(qn AS DOUBLE))
                                 * sqrt(CAST(nn AS DOUBLE))), 6) DESC,
                        neighbor_id) AS rnk
    FROM tdots
),
truth AS (
    SELECT query_id, neighbor_id FROM tranked
    WHERE k = {N_DIMS} AND rnk <= {TOP_K}
),
hits AS (
    SELECT t.k,
           CAST(count(*) FILTER (WHERE r.rnk IS NOT NULL) AS BIGINT) AS hit,
           CAST(count(*) AS BIGINT) AS total
    FROM (SELECT k.k, tr.query_id, tr.neighbor_id
          FROM truth tr
          CROSS JOIN (SELECT unnest(ARRAY{list(MRL_DIMS)}) AS k) k) t
    LEFT JOIN (SELECT k, query_id, neighbor_id, rnk FROM tranked
               WHERE rnk <= {TOP_K}) r
      ON r.k = t.k AND r.query_id = t.query_id
     AND r.neighbor_id = t.neighbor_id
    GROUP BY t.k
)
SELECT k AS dims, hit AS hits, total,
       CAST(hit * 1000000 // total AS BIGINT) AS recall_ppm
FROM hits
""",
)
def q_matryoshka_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncation retrieval audit (the Matryoshka question —
    Kusupati et al. 2022, public): if the index stored only the first k
    of {N_DIMS} embedding dims, what fraction of the full-dimension
    top-{TOP_K} would prefix-k cosine search still retrieve? One row
    per k in {MRL_DIMS} with EXACT integer hits/total and recall in ppm
    — a full value-hash oracle (no trained state, unlike the
    PQ/IVF verdict rows), so the entire ranking pipeline is
    hash-checked at every k. This is the measurement that decides
    whether a 4x cheaper truncated index is safe to serve, the same
    storage-vs-recall decision SQ8/PQ make by quantization.

    Determinism: prefix dot products and norms are exact bigints
    (slice + zip_with fold); one double division + round(6) per pair at
    the ranking edge; asc-id ties. Scale: the pairwise kernel is the
    brute audit-tier shape (bounded query set broadcast against the
    corpus — the same contract as `ann_brute_topk`/`lsh_recall_audit`);
    per-k work shares the single corpus scan via the unpivoted k
    column."""
    vecs = _quantized(spark, sf_dir)
    qv = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    ks = spark.createDataFrame([(k,) for k in MRL_DIMS], "k int")
    pairs = (
        vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"))
        .crossJoin(F.broadcast(qv))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .crossJoin(F.broadcast(ks))
        .select(
            "k",
            "query_id",
            "neighbor_id",
            F.expr(
                "aggregate(zip_with(slice(qe, 1, k), slice(ne, 1, k), "
                "(x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)"
            ).alias("dot"),
            F.expr(
                "aggregate(slice(qe, 1, k), CAST(0 AS BIGINT), "
                "(a, v) -> a + v * v)"
            ).alias("qn"),
            F.expr(
                "aggregate(slice(ne, 1, k), CAST(0 AS BIGINT), "
                "(a, v) -> a + v * v)"
            ).alias("nn"),
        )
        .withColumn(
            "cosine",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("qn").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                ),
                6,
            ),
        )
    )
    ranked = grouped_topn(
        pairs.select("k", "query_id", "neighbor_id", "cosine"),
        ["k", "query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        TOP_K,
        keep_rank=False,
    )
    truth = ranked.where(F.col("k") == N_DIMS).select(
        "query_id", "neighbor_id"
    )
    marked = (
        truth.crossJoin(F.broadcast(ks))
        .join(
            ranked.select("k", "query_id", "neighbor_id", F.lit(1).alias("hit")),
            ["k", "query_id", "neighbor_id"],
            "left",
        )
    )
    return marked.groupBy(F.col("k").cast("long").alias("dims")).agg(
        F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("hits"),
        F.count(F.lit(1)).cast("long").alias("total"),
        F.expr(
            "CAST(sum(coalesce(hit, 0)) * 1000000 div count(1) AS BIGINT)"
        ).alias("recall_ppm"),
    )


# ------------------------------------------- hybrid retrieval (RRF fusion)

RRF_K = 60       # the standard reciprocal-rank-fusion damping constant
RRF_POOL = 10    # per-ranker candidate pool depth fed into the fusion
RRF_TOP = 5

from .dedup import SHINGLE_CTE  # noqa: E402 — shared lexical-index CTE

# Text-ranker CTE: per query doc (doc_id < N_QUERIES), rank the corpus by
# word-3-gram Jaccard similarity through the inverted shingle index — the
# sparse/lexical ranker next to the dense/embedding one.
_RRF_TEXT_CTE = f"""
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
tinter AS (
    SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id,
           CAST(count(*) AS BIGINT) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle
    WHERE a.doc_id < {N_QUERIES} AND a.doc_id <> b.doc_id
    GROUP BY 1, 2
),
tscore AS (
    SELECT t.query_id, t.neighbor_id,
           CAST(t.inter AS DOUBLE)
           / (sa.n_sh + sb.n_sh - t.inter) AS jac
    FROM tinter t
    JOIN sizes sa ON sa.doc_id = t.query_id
    JOIN sizes sb ON sb.doc_id = t.neighbor_id
),
trank AS (
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY jac DESC, neighbor_id) AS BIGINT) AS rb
    FROM tscore
)
"""


@query(
    "hybrid_rrf_topk",
    oracle=f"""
WITH {_FLAT_CTE},
{SHINGLE_CTE.strip()},
{_RRF_TEXT_CTE.strip()},
dots AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
    FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < {N_QUERIES}
                            AND a.vec_id <> b.vec_id
    GROUP BY 1, 2
),
ascore AS (
    SELECT d.query_id, d.neighbor_id,
           round(CAST(d.dot AS DOUBLE) /
                 (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
                 6) AS cosine
    FROM dots d
    JOIN norms na ON na.vec_id = d.query_id
    JOIN norms nb ON nb.vec_id = d.neighbor_id
),
arank AS (
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS ra
    FROM ascore
),
fused AS (
    SELECT coalesce(a.query_id, t.query_id) AS query_id,
           coalesce(a.neighbor_id, t.neighbor_id) AS neighbor_id,
           round(coalesce(1.0 / ({RRF_K} + a.ra), 0)
                 + coalesce(1.0 / ({RRF_K} + t.rb), 0), 6) AS rrf
    FROM (SELECT * FROM arank WHERE ra <= {RRF_POOL}) a
    FULL JOIN (SELECT * FROM trank WHERE rb <= {RRF_POOL}) t
      ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
)
SELECT query_id, neighbor_id, rrf,
       CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rnk
    FROM fused
) WHERE rnk <= {RRF_TOP}
""",
)
def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the DENSE ranker (exact-integer cosine over
    embeddings) with the SPARSE ranker (word-3-gram Jaccard through the
    inverted shingle index) by reciprocal-rank fusion —
    rrf = 1/({RRF_K}+rank_dense) + 1/({RRF_K}+rank_sparse), missing pool
    membership contributing 0. The modern retrieval-stack pattern:
    lexical and embedding rankers fail differently, and RRF needs no score
    calibration because it only consumes RANKS.

    Both pools are top-{RRF_POOL} per query; fusion is a full outer join of
    two slim (query, neighbor, rank) pools (at scale: pools are
    bounded-per-query, so the fusion join is trivially broadcastable).
    doc_id indexes the same corpus as vec_id (the semantic_clusters
    correspondence). Ranks, intersections, and set sizes are exact
    integers; the two divisions and one addition run in identical order on
    both engines, rounded at the output edge."""
    from .dedup import shingles

    vecs = _quantized(spark, sf_dir)
    # dense pool: brute cosine, RRF_POOL deep
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    corpus = vecs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"),
        F.col("nrm").alias("nn"),
    )
    ascore = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot("qe", "ne").cast("double")
                / (
                    F.sqrt(F.col("qn").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    arank = grouped_topn(
        ascore,
        ["query_id"],
        [F.desc("cosine"), F.asc("neighbor_id")],
        RRF_POOL,
        rank_col="ra",
    ).select("query_id", "neighbor_id", F.col("ra").cast("long").alias("ra"))
    # sparse pool: Jaccard via the inverted shingle index
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    qsh = sh.where(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "shingle"
    )
    tinter = (
        qsh.join(sh.withColumnRenamed("doc_id", "neighbor_id"), "shingle")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    tscore = (
        tinter.join(
            sizes.select(
                F.col("doc_id").alias("query_id"), F.col("n_sh").alias("na")
            ),
            "query_id",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("neighbor_id"),
                F.col("n_sh").alias("nb"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jac"),
        )
    )
    trank = grouped_topn(
        tscore,
        ["query_id"],
        [F.desc("jac"), F.asc("neighbor_id")],
        RRF_POOL,
        rank_col="rb",
    ).select("query_id", "neighbor_id", F.col("rb").cast("long").alias("rb"))
    fused = (
        arank.join(trank, ["query_id", "neighbor_id"], "full_outer")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("ra")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("rb")), F.lit(0.0)
                ),
                6,
            ).alias("rrf"),
        )
    )
    return grouped_topn(
        fused,
        ["query_id"],
        [F.desc("rrf"), F.asc("neighbor_id")],
        RRF_TOP,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("long"))


@query(
    "source_embedding_separation",
    oracle="""
WITH q AS (
    SELECT d.source,
           list_transform(e.embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))
               AS e
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
),
flat AS (
    SELECT source, i, e[i] AS v
    FROM (SELECT source, e, unnest(generate_series(1, len(e))) AS i FROM q)
),
cent AS (
    SELECT source, i, CAST(sum(v) AS BIGINT) AS s
    FROM flat GROUP BY source, i
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1),
dots AS (
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(sum(a.s * b.s) AS BIGINT) AS dot_ab
    FROM cent a JOIN cent b ON a.i = b.i AND a.source <= b.source
    GROUP BY 1, 2
)
SELECT d.source_a, d.source_b, sa.n AS n_a, sb.n AS n_b,
       round(d.dot_ab / (sqrt(CAST(na.dot_ab AS DOUBLE))
                         * sqrt(CAST(nb.dot_ab AS DOUBLE))), 6)
           AS centroid_cosine
FROM dots d
JOIN dots na ON na.source_a = d.source_a AND na.source_b = d.source_a
JOIN dots nb ON nb.source_a = d.source_b AND nb.source_b = d.source_b
JOIN sizes sa ON sa.source = d.source_a
JOIN sizes sb ON sb.source = d.source_b
WHERE d.source_a < d.source_b
""",
)
def q_source_embedding_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source separation in EMBEDDING space: pairwise cosine between each
    source's centroid (un-normalized sum vector — cosine is scale-
    invariant, so exact bigint sums substitute for float means). The
    dense-space complement of `source_overlap_matrix`'s lexical view:
    sources whose centroids are near-parallel carry redundant content for
    mixture-weighting purposes even when their surface text differs.

    Determinism: centroid elements are exact bigint sums of quantized
    components under any partitioning; every pairwise dot (including the
    self-dots used as norms) is exact bigint; the two sqrts + one
    division + round(6) happen once per source pair at the edge.

    Scale: the flatten+agg is dim x corpus rows map-side-combined down to
    dim x |sources| centroid cells; the pair join is centroid x centroid
    (bounded by source count), never corpus-sized."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    q = emb.select("vec_id", F.expr(_QUANT).alias("e")).join(
        F.broadcast(docs), emb.vec_id == docs.doc_id
    )
    flat = q.select(
        "source", F.posexplode("e").alias("i", "v")
    )
    cent = flat.groupBy("source", "i").agg(F.sum("v").alias("s"))
    sizes = q.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = cent.select(
        F.col("source").alias("source_a"), "i", F.col("s").alias("sa")
    )
    b = cent.select(
        F.col("source").alias("source_b"), "i", F.col("s").alias("sb")
    )
    dots = (
        a.join(F.broadcast(b), "i")
        .where(F.col("source_a") <= F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("dot_ab"))
    )
    na = dots.where(F.col("source_a") == F.col("source_b")).select(
        F.col("source_a").alias("src"), F.col("dot_ab").alias("self_dot")
    )
    pairs = (
        dots.where(F.col("source_a") < F.col("source_b"))
        .join(
            F.broadcast(na.withColumnRenamed("src", "source_a")
                        .withColumnRenamed("self_dot", "da")),
            "source_a",
        )
        .join(
            F.broadcast(na.withColumnRenamed("src", "source_b")
                        .withColumnRenamed("self_dot", "db")),
            "source_b",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"),
                                     F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"),
                                     F.col("n").alias("n_b"))),
            "source_b",
        )
    )
    return pairs.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        F.round(
            F.col("dot_ab")
            / (
                F.sqrt(F.col("da").cast("double"))
                * F.sqrt(F.col("db").cast("double"))
            ),
            6,
        ).alias("centroid_cosine"),
    )


# ------------------------------- PCA top component (power iteration)

PCA_ROUNDS = 6
PCA_SV = 100_000   # iterate scale: max|v_j| == SV after every rescale
PCA_QDIV = 1_000   # per-row projection shrink (keeps t_j * SV in bigint)

# Sign-split integer division: both engines divide a NON-NEGATIVE
# magnitude, so Spark `div` (trunc) and DuckDB `//` can never diverge.
def _ssdiv(num: str, den: str) -> str:
    return (
        f"CASE WHEN {num} >= 0 THEN ({num}) {{d}} ({den}) "
        f"ELSE -((-({num})) {{d}} ({den})) END"
    )


# Anisotropy share at the output edge: exact-bigint inputs, one fixed
# double expression (conversion/mul/div/round are all correctly rounded
# IEEE ops, so identical operands + identical order = identical result —
# unlike ln, no boundary audit is needed).
_PCA_SHARE = (
    f"round({PCA_QDIV * PCA_QDIV}.0 * CAST(sq AS DOUBLE) "
    "/ (CAST(vvs AS DOUBLE) * CAST(trs AS DOUBLE)), 6)"
)


def _pca_oracle() -> str:
    sd = lambda n, d: _ssdiv(n, d).format(d="//")
    ctes = [
        """
pxq AS MATERIALIZED (
    SELECT vec_id, CAST(i - 1 AS BIGINT) AS j,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS x
    FROM (SELECT vec_id, embedding,
                 unnest(generate_series(1, len(embedding))) AS i
          FROM embeddings)
)""",
        "pn AS (SELECT CAST(greatest(count(DISTINCT vec_id), 1) AS BIGINT)"
        " AS n FROM pxq)",
        "pmean AS (SELECT j, CAST(sum(x) AS BIGINT) AS s FROM pxq"
        " GROUP BY j)",
        f"""
pxc AS MATERIALIZED (
    SELECT q.vec_id, q.j, q.x - ({sd('m.s', 'pn.n')}) AS x
    FROM pxq q JOIN pmean m ON m.j = q.j CROSS JOIN pn
)""",
        f"pv0 AS (SELECT DISTINCT j, CAST({PCA_SV} AS BIGINT) AS v"
        " FROM pxq)",
    ]
    for r in range(1, PCA_ROUNDS + 1):
        ctes.append(
            f"""
pq{r} AS MATERIALIZED (
    SELECT c.vec_id,
           ({sd('sum(c.x * v.v)', str(PCA_QDIV))}) AS q
    FROM pxc c JOIN pv{r - 1} v ON v.j = c.j GROUP BY c.vec_id
)"""
        )
        ctes.append(
            f"pt{r} AS (SELECT c.j, CAST(sum(c.x * q.q) AS BIGINT) AS t "
            f"FROM pxc c JOIN pq{r} q ON q.vec_id = c.vec_id GROUP BY c.j)"
        )
        ctes.append(
            f"pmx{r} AS (SELECT CAST(greatest(max(abs(t)), 1) AS BIGINT)"
            f" AS mx FROM pt{r})"
        )
        ctes.append(
            f"pv{r} AS MATERIALIZED (SELECT t.j, "
            f"({sd(f't.t * {PCA_SV}', 'mx.mx')}) AS v "
            f"FROM pt{r} t CROSS JOIN pmx{r} mx)"
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body},
psq AS (SELECT CAST(coalesce(sum(q * q), 0) AS BIGINT) AS sq
        FROM pq{PCA_ROUNDS}),
pvv AS (SELECT CAST(coalesce(sum(v * v), 1) AS BIGINT) AS vvs
        FROM pv{PCA_ROUNDS - 1}),
ptr AS (SELECT CAST(coalesce(sum(x * x), 1) AS BIGINT) AS trs FROM pxc)
SELECT v.j AS dim, CAST(v.v AS BIGINT) AS loading,
       {_PCA_SHARE} AS var_share_top1
FROM pv{PCA_ROUNDS} v CROSS JOIN psq CROSS JOIN pvv CROSS JOIN ptr
"""


@query("pca_top_component", oracle=_pca_oracle())
def q_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by POWER ITERATION
    run inside the engine — the eigen-decomposition class none of the
    other iterative rows (Lloyd's, PageRank, EM, integer GD) exercises.
    The loading vector is what OPQ-style rotations and embedding-space
    whitening start from, and the emitted `var_share_top1` (fraction of
    total variance on the top axis) is the standard anisotropy /
    representation-collapse audit: contrastive embeddings whose share
    drifts toward 1.0 have collapsed to a line and stop being useful for
    semantic dedup or retrieval.

    The covariance matrix is never materialized: each round computes
    C·v via the Gram trick — q_i = x_i·v per row (a {D}-element fold),
    then t_j = sum_i x_ij * q_i (one hash-agg over the flattened
    (vec_id, dim, value) table) — so a round is two corpus-bounded
    aggregates, no 64x64-per-row explode, no driver-side data. Only the
    64-element iterate is collected per round (the bounded-collect
    budget shared with the Lloyd's/PQ codebook loops).

    Determinism: embeddings quantize to the module's exact integer
    milli-units; the iterate is rescaled to max|v| = {SV} each round
    with sign-split integer division (trunc/floor can never diverge);
    the single output-edge double expression uses only correctly-rounded
    IEEE ops on exact-bigint operands, so no ln-style boundary audit is
    needed. Bigint headroom: |t_j·SV| <= N·800·(64·800·SV/{Q})·{SV}
    stays under 2^63 to N ~ 20k vectors per PCA slice; larger corpora
    raise PCA_QDIV (the docs' stratified-sample stance) rather than
    overflowing silently.

    Ref: no counterpart in the reference (no linear-algebra surface);
    extension per SURVEY §2.13."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    xq = emb.select(
        "vec_id",
        F.posexplode(F.expr(_QUANT)).alias("j", "x"),
    ).select("vec_id", F.col("j").cast("long").alias("j"), "x")

    n_row = xq.agg(
        F.greatest(F.countDistinct("vec_id"), F.lit(1)).alias("n")
    )
    mean = xq.groupBy("j").agg(F.sum("x").alias("s"))
    sdiv = lambda n, d: F.expr(_ssdiv(n, d).format(d="div"))
    xc = (
        xq.join(F.broadcast(mean), "j")
        .crossJoin(F.broadcast(n_row))
        .select("vec_id", "j", (F.col("x") - sdiv("s", "n")).alias("x"))
        .localCheckpoint(eager=False)
    )

    dims = [r["j"] for r in xc.select("j").distinct().collect()]
    v = {j: PCA_SV for j in dims}
    q_df = None
    v_prev = dict(v)
    for _ in range(PCA_ROUNDS):
        v_prev = dict(v)
        v_df = spark.createDataFrame(
            [(j, v[j]) for j in dims] or [(0, 0)], "j long, v long"
        )
        q_df = (
            xc.join(F.broadcast(v_df), "j")
            .groupBy("vec_id")
            .agg(sdiv("sum(x * v)", str(PCA_QDIV)).alias("q"))
        )
        t = {
            r["j"]: r["t"]
            for r in xc.join(q_df, "vec_id")
            .groupBy("j")
            .agg(F.sum(F.expr("x * q")).alias("t"))
            .collect()
        }
        mx = max((abs(t.get(j, 0)) for j in dims), default=1) or 1
        for j in dims:
            tj = t.get(j, 0)
            mag = (abs(tj) * PCA_SV) // mx
            v[j] = mag if tj >= 0 else -mag

    out_v = spark.createDataFrame(
        [(j, v[j]) for j in dims] or [(0, 0)], "dim long, loading long"
    )
    if not dims:
        out_v = out_v.limit(0)
        scalars = spark.createDataFrame(
            [(0, 1, 1)], "sq long, vvs long, trs long"
        )
    else:
        sq = q_df.agg(
            F.coalesce(F.sum(F.expr("q * q")), F.lit(0)).alias("sq")
        )
        tr = xc.agg(
            F.coalesce(F.sum(F.expr("x * x")), F.lit(1)).alias("trs")
        )
        vvs = sum(val * val for val in v_prev.values()) or 1
        scalars = sq.crossJoin(tr).select(
            "sq", F.lit(vvs).cast("long").alias("vvs"), "trs"
        )
    return out_v.crossJoin(F.broadcast(scalars)).select(
        "dim", "loading", F.expr(_PCA_SHARE).alias("var_share_top1")
    )


# ------------------------- Johnson-Lindenstrauss projection audit

JL_K = 16          # target dimensionality (64 -> 16 = 4x smaller index)
JL_AUDIT_VECS = 20  # audit slice: first 20 vec_ids -> 190 exact pairs

# ±1 Rademacher signs from the module's md5 coefficient family, salted
# 'jl' so the JL matrix is independent of the LSH planes.
_JL_SIGN_CTE = f"""
jlsigns AS (
    SELECT k, d,
           CASE WHEN CAST(('0x' || substr(md5('jl,' || CAST(k AS VARCHAR)
                          || ',' || CAST(d AS VARCHAR)), 1, 15)) AS BIGINT)
                     % 2 = 0 THEN 1 ELSE -1 END AS sgn
    FROM range({JL_K}) t1(k), range({N_DIMS}) t2(d)
)
"""


@query(
    "jl_projection_audit",
    oracle=f"""
WITH {_FLAT_CTE},
{_JL_SIGN_CTE.strip()},
aud AS (SELECT vec_id, i, v FROM flat WHERE vec_id < {JL_AUDIT_VECS}),
proj AS (
    SELECT a.vec_id, s.k, CAST(sum(s.sgn * a.v) AS BIGINT) AS y
    FROM aud a JOIN jlsigns s ON s.d = a.i - 1
    GROUP BY 1, 2
),
d2o AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2_orig
    FROM aud a JOIN aud b ON b.i = a.i AND a.vec_id < b.vec_id
    GROUP BY 1, 2
),
d2p AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(sum((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS d2_proj
    FROM proj a JOIN proj b ON b.k = a.k AND a.vec_id < b.vec_id
    GROUP BY 1, 2
)
SELECT o.vec_a, o.vec_b, o.d2_orig, p.d2_proj,
       CASE WHEN o.d2_orig = 0 THEN NULL
            ELSE CAST(p.d2_proj * 1000000 // ({JL_K} * o.d2_orig)
                      AS BIGINT) END AS distortion_ppm
FROM d2o o JOIN d2p p ON p.vec_a = o.vec_a AND p.vec_b = o.vec_b
""",
)
def q_jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 (Rademacher) projection 64 -> {K} dims
    with an EXACT pairwise distortion audit — the go/no-go measurement
    before serving a 4x-smaller projected index (the dense-random-matrix
    complement to `matryoshka_recall_audit`'s prefix truncation: JL
    preserves distances for embeddings whose information is NOT
    front-loaded). For ±1 signs E||Rx||^2 = K ||x||^2, so
    `distortion_ppm` = 1e6 * d2_proj / (K * d2_orig) concentrates at
    1e6; its spread over the audit pairs is the empirical epsilon.

    Everything is exact integer arithmetic on the module's milli-unit
    quantization: the sign matrix is md5-derived (salted 'jl', disjoint
    from the LSH planes) so both engines share it bit-for-bit; squared
    distances and the ppm ratio are bigint with a NULL guard for
    identical vectors (0/0). At scale the same projection expression is
    the corpus-wide map producing the sketch table (zero shuffles, K
    sums per row); the audit itself runs on the bounded first-{V} slice
    (190 pairs), the `lsh_recall_audit` sampling stance."""
    vecs = _quantized(spark, sf_dir).where(F.col("vec_id") < JL_AUDIT_VECS)
    flat = vecs.select(
        "vec_id", F.posexplode("e").alias("d", "v")
    )
    signs = (
        spark.range(JL_K)
        .select(F.col("id").alias("k"))
        .crossJoin(spark.range(N_DIMS).select(F.col("id").alias("d")))
        .select(
            "k",
            "d",
            F.expr(
                "CASE WHEN CAST(conv(substring(md5(CAST('jl,' || k || ',' "
                "|| d AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 2 = 0 "
                "THEN 1 ELSE -1 END"
            ).alias("sgn"),
        )
    )
    proj = (
        flat.join(F.broadcast(signs), "d")
        .groupBy("vec_id", "k")
        .agg(F.sum(F.expr("sgn * v")).alias("y"))
    )
    fa, fb = flat.alias("a"), flat.alias("b")
    d2o = (
        fa.join(
            fb,
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .agg(F.sum(F.expr("(a.v - b.v) * (a.v - b.v)")).alias("d2_orig"))
    )
    pa, pb = proj.alias("a"), proj.alias("b")
    d2p = (
        pa.join(
            pb,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .agg(F.sum(F.expr("(a.y - b.y) * (a.y - b.y)")).alias("d2_proj"))
    )
    return d2o.join(d2p, ["vec_a", "vec_b"]).select(
        "vec_a",
        "vec_b",
        "d2_orig",
        "d2_proj",
        F.expr(
            f"CASE WHEN d2_orig = 0 THEN NULL ELSE "
            f"CAST(d2_proj * 1000000 div ({JL_K} * d2_orig) AS BIGINT) END"
        ).alias("distortion_ppm"),
    )
