"""Product-quantization ANN family (split out of ``similarity.py`` in
round 7 — same registry entries, same oracles, no behavior change): flat
PQ top-k, the persisted PQ index (build/serve), the staleness-triggered
refresh lifecycle, the IVF-PQ composition (FAISS-IVFADC-style residual
coding), its persisted build/serve form, and SQ8 scalar quantization.

Shares the integer-quantization numeric policy and the coarse-quantizer
training with ``similarity.py`` (imported below); see that module's
docstring for the exactness argument.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.topn import grouped_topn
from . import query
from .similarity import (
    N_DIMS,
    N_PROBE,
    N_QUERIES,
    PROBE_CELL_FRAC,
    TOP_K,
    TRAIN_MERGE_MAX_ROWS,
    _dot,
    _int_dots_udf,
    _ivf_assign_top1,
    _local_df,
    _norm,
    _quantized,
    build_ivf_index,
    q_ann_brute_topk,
    scaled_n_probe,
    train_ivf_centroids,
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


def _pq_poss_udf(book: dict, codes: list[int]):
    """Arrow-vectorized per-subspace argmin against the current codebook:
    returns array<int> of M_SUB 1-based slots into ``codes`` (ascending).
    Squared L2 distances are exact int64 numpy arithmetic — milli-unit
    entries bound every term far below 2^63 — and numpy argmin takes the
    FIRST minimum, so the tie-break (dist ASC, code ASC) is identical to
    the expression/window forms. No float ever enters (guide §4.2)."""
    import numpy as np

    cw = np.array(
        [[book[(j, c)] for c in codes] for j in range(M_SUB)],
        dtype=np.int64,
    )  # M_SUB x |codes| x SUB_DIM

    @F.pandas_udf("array<int>")
    def poss(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for e in batches:
            if len(e) == 0:
                yield pd.Series([], dtype=object)
                continue
            ev = np.array(e.tolist(), dtype=np.int64).reshape(
                -1, M_SUB, SUB_DIM
            )
            d = ((ev[:, :, None, :] - cw[None, :, :, :]) ** 2).sum(axis=3)
            yield pd.Series(list((d.argmin(axis=2) + 1).astype(np.int32)))

    return poss


_PQ_PARTIALS_SCHEMA = "sub int, code int, cnt bigint, sums array<bigint>"


def _pq_partials_fn(book: dict, codes: list[int]):
    """mapInPandas kernel over (e): per-(sub, code) exact integer
    (member count, per-dimension subvector sums) partials for one Lloyd
    round — at most M_SUB x |codes| output rows per partition. The
    argmin assignment is the same exact int64 computation as
    `_pq_poss_udf` (numpy argmin takes the FIRST minimum, so ties break
    toward the lowest code); the sums are pure int64 addition, so the
    merged totals are partitioning-independent."""
    import numpy as np

    cw = np.array(
        [[book[(j, c)] for c in codes] for j in range(M_SUB)],
        dtype=np.int64,
    )
    code_arr = np.array(codes, dtype=np.int64)

    def gen(batches):
        import numpy as np
        import pandas as pd

        cnts: dict = {}
        sums: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ev = np.array(pdf["e"].tolist(), dtype=np.int64).reshape(
                -1, M_SUB, SUB_DIM
            )
            d = ((ev[:, :, None, :] - cw[None, :, :, :]) ** 2).sum(axis=3)
            slots = d.argmin(axis=2)
            for j in range(M_SUB):
                sj = slots[:, j]
                for s in np.unique(sj):
                    m = sj == s
                    key = (j, int(code_arr[s]))
                    cnts[key] = cnts.get(key, 0) + int(m.sum())
                    sm = ev[m, j, :].sum(axis=0, dtype=np.int64)
                    sums[key] = sums[key] + sm if key in sums else sm
        if cnts:
            yield pd.DataFrame(
                {
                    "sub": [k[0] for k in cnts],
                    "code": [k[1] for k in cnts],
                    "cnt": [cnts[k] for k in cnts],
                    "sums": [[int(v) for v in sums[k]] for k in cnts],
                }
            )

    return gen


def train_pq_codebooks(
    vecs: DataFrame, iters: int = PQ_ITERS, seeds: DataFrame | None = None
) -> DataFrame:
    """Train all M_SUB codebooks JOINTLY with Lloyd's k-means on L2 distance:
    (sub, code, cv) with K_CODES codewords per subspace.

    One pass trains every subspace at once — per-subspace argmin codes are
    computed in a single projection against the baked codebook literals,
    and the floored-mean updates group by (sub, code). Init = the
    subvectors of the first K_CODES vec_ids (deterministic, like IVF's
    mod-subset). All
    arithmetic is integer (bigint squared distances, floored means), so
    training is bit-deterministic and partitioning-independent; empty codes
    keep their previous codeword.

    ``seeds``: optional (vec_id, code) DataFrame overriding the default
    init with explicit seed vectors. Lloyd's cannot SPLIT a cluster its
    init gave only one codeword — a far, tight mode (drifted append
    batch) stays one codeword forever, which is exactly the failure
    `refresh_pq_index` exists to fix — so a rebuild over a multi-modal
    store must seed codewords spanning the modes (it passes
    ntile-stratified ids).

    Physical shape (round-10 rewrite, guide §2.4 + §4.2): the codebook is
    a CONSTANT-sized model (M_SUB x K_CODES codewords), so each Lloyd
    round runs ONE job — per-subspace argmin slots from the
    Arrow-vectorized `_pq_poss_udf` integer kernel, an M_SUB-way
    posexplode feeding a (sub, code) floored-mean hash-aggregate, and
    a <= M_SUB*K_CODES-row collect back into the next round's model. The previous form spent 4
    shuffles + an eager localCheckpoint per round (broadcast codebook
    join -> per-(vec, sub) argmin window -> member join -> two-level
    mean agg -> join-back); measured 5.7 s -> ~1 s at sf0.1 inside
    build_ivfpq_index."""
    spark = vecs.sparkSession
    if seeds is None:
        init = (
            vecs.where(F.col("vec_id") < K_CODES)
            .select("vec_id", "e")
            .collect()
        )
        code_of = {int(r["vec_id"]): int(r["vec_id"]) for r in init}
    else:
        code_of = {
            int(r["vec_id"]): int(r["code"])
            for r in seeds.select("vec_id", "code").collect()
        }
        init = (
            vecs.where(F.col("vec_id").isin(list(code_of)))
            .select("vec_id", "e")
            .collect()
        )
    book: dict[tuple[int, int], list[int]] = {}
    for r in init:
        e = [int(x) for x in r["e"]]
        c = code_of[int(r["vec_id"])]
        for j in range(M_SUB):
            book[(j, c)] = e[j * SUB_DIM : (j + 1) * SUB_DIM]
    if not book:
        return spark.createDataFrame([], "sub int, code int, cv array<bigint>")
    codes = sorted({c for (_, c) in book})
    # Partials per round are bounded by partitions x (M_SUB x codes);
    # below the bound the round is ONE shuffle-free mapInPandas pass
    # merged on the driver (round-11: like the IVF trainer, the former
    # posexplode + floored-mean aggregate cost ~1 s of analysis/codegen
    # per round against ~0.1 s of execution).
    driver_merge = (
        vecs.rdd.getNumPartitions() * M_SUB * len(codes)
        <= TRAIN_MERGE_MAX_ROWS
    )
    for _ in range(iters):
        if driver_merge:
            import math

            cnts: dict = {}
            sums: dict = {}
            partials = vecs.select("e").mapInPandas(
                _pq_partials_fn(book, codes), _PQ_PARTIALS_SCHEMA
            )
            for r in partials.collect():
                key = (int(r["sub"]), int(r["code"]))
                cnts[key] = cnts.get(key, 0) + int(r["cnt"])
                s = [int(v) for v in r["sums"]]
                sums[key] = (
                    [a + b for a, b in zip(sums[key], s)]
                    if key in sums
                    else s
                )
            # Identical floored-mean arithmetic to the aggregate form:
            # floor(CAST(sum AS DOUBLE) / count) — float(int)/int and
            # math.floor are the same correctly-rounded IEEE ops.
            for key in cnts:
                book[key] = [
                    int(math.floor(float(v) / cnts[key]))
                    for v in sums[key]
                ]
            continue
        codes_sql = "array({})".format(", ".join(str(c) for c in codes))
        # 1-based argmin slot per subspace among `codes` (ascending):
        # numpy argmin takes the FIRST minimum, reproducing the
        # (dist ASC, code ASC) row_number tie-break of the join form —
        # all arithmetic is exact int64 (guide §4.2), floats never enter.
        exploded = (
            vecs.withColumn("__pos", _pq_poss_udf(book, codes)("e"))
            .select(
                F.posexplode(
                    F.expr(
                        f"transform(sequence(0, {M_SUB - 1}), j -> "
                        f"named_struct("
                        f"'code', element_at({codes_sql}, "
                        f"CAST(element_at(__pos, j + 1) AS INT)), "
                        f"'sv', slice(e, j * {SUB_DIM} + 1, {SUB_DIM})))"
                    )
                ).alias("sub", "x")
            )
            .select("sub", F.col("x.code").alias("code"), F.col("x.sv").alias("sv"))
        )
        # Identical floored-mean arithmetic to the join form: per
        # (sub, code, d) floor(CAST(sum AS DOUBLE) / count).
        moved = exploded.groupBy("sub", "code").agg(
            F.array(
                *[
                    F.floor(
                        F.sum(F.col("sv")[d]).cast("double")
                        / F.count(F.lit(1))
                    ).cast("long")
                    for d in range(SUB_DIM)
                ]
            ).alias("cv")
        )
        for r in moved.collect():
            book[(int(r["sub"]), int(r["code"]))] = [int(v) for v in r["cv"]]
    return _local_df(
        spark,
        [(j, c, book[(j, c)]) for (j, c) in sorted(book)],
        "sub int, code int, cv array<bigint>",
    )


def _pq_codes_udf(cb_rows):
    """Arrow-vectorized PQ encoder: a vector column -> its M_SUB code ids
    (per-subspace argmin against the trained codebook; numpy argmin takes
    the FIRST minimum, so ties break toward the lowest code — the same
    deterministic contract the former nested-HOF SQL expression had, with
    all arithmetic exact int64). One numpy pass per Arrow batch replaces
    ~M_SUB x K_CODES interpreted lambda folds per row (guide §4.2;
    encode+write of the IVF-PQ build measured 3.6 s -> ~1 s at sf0.1).
    ``cb_rows``: collected (sub, code, cv) codebook rows."""
    import numpy as np

    book = {
        (int(r["sub"]), int(r["code"])): [int(v) for v in r["cv"]]
        for r in cb_rows
    }
    codes = sorted({c for (_, c) in book})
    cw = np.array(
        [[book[(j, c)] for c in codes] for j in range(M_SUB)],
        dtype=np.int64,
    )
    code_arr = np.array(codes, dtype=np.int32)

    @F.pandas_udf("array<int>")
    def enc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for e in batches:
            if len(e) == 0:
                yield pd.Series([], dtype=object)
                continue
            ev = np.array(e.tolist(), dtype=np.int64).reshape(
                -1, M_SUB, SUB_DIM
            )
            d = ((ev[:, :, None, :] - cw[None, :, :, :]) ** 2).sum(axis=3)
            yield pd.Series(list(code_arr[d.argmin(axis=2)]))

    return enc


def _pq_lut_np(cb_rows, q_rows):
    """Per-query ADC lookup tables as exact Python ints:
    lut[q][j][k] = integer squared L2 between query q's j-th subvector
    and codeword (j, k) — exact Python ints, the same arithmetic the
    engine's expressions run, computed once driver-side (both inputs are
    bounded by the model and query-set sizes). Returns (qids ascending,
    lut aligned to qids), or None when either side is empty."""
    if not cb_rows or not q_rows:
        return None
    book = {(r["sub"], r["code"]): list(r["cv"]) for r in cb_rows}
    cb_py = [[book[(j, k)] for k in range(K_CODES)] for j in range(M_SUB)]
    qids = sorted(r["vec_id"] for r in q_rows)
    qvec = {r["vec_id"]: list(r["e"]) for r in q_rows}
    lut = [
        [
            [
                sum(
                    (qvec[q][j * SUB_DIM + d] - cb_py[j][k][d]) ** 2
                    for d in range(SUB_DIM)
                )
                for k in range(K_CODES)
            ]
            for j in range(M_SUB)
        ]
        for q in qids
    ]
    return qids, lut


def _adc_scores_udf(lut):
    """Arrow-vectorized ADC scorer: the codes column -> array<bigint> of
    per-query asymmetric distances (M_SUB exact int64 table lookups per
    query per row, identical to the aggregate-HOF form it replaces).
    ``lut``: the `_pq_lut_np` table. The former plan baked the whole
    nq x M_SUB x K_CODES table as a SQL literal and folded it per row
    with interpreted lambdas — both the analysis of that literal tree
    and the per-row HOF walk priced in (guide §4.2)."""
    import numpy as np

    L = np.array(lut, dtype=np.int64)  # nq x M_SUB x K_CODES

    @F.pandas_udf("array<bigint>")
    def adc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        jj = np.arange(M_SUB)
        for codes in batches:
            if len(codes) == 0:
                yield pd.Series([], dtype=object)
                continue
            cm = np.array(codes.tolist(), dtype=np.int64)  # n x M_SUB
            picked = L[:, jj[None, :], cm]  # nq x n x M_SUB
            yield pd.Series(list(picked.sum(axis=2).T))

    return adc


def _pq_adc_topk(codes_df, store, cb_rows, q_rows):
    """Shared PQ search body: ADC-score the coded corpus for every query,
    take the top-{PQ_CAND} candidate pool per query, exact-re-rank against
    the full-precision vectors in ``store`` (vec_id, e, nrm), and return
    the per-query top-{TOP_K} (query_id, neighbor_id, cosine, rnk). Used
    by both the inline query (codes computed in-plan) and the persisted
    index's serve path (codes read from parquet). Returns None for an
    empty codebook/query set."""
    baked = _pq_lut_np(cb_rows, q_rows)
    if baked is None:
        return None
    qids, lut = baked
    qids_sql = "array({})".format(", ".join(f"{q}L" for q in qids))
    scored = (
        codes_df.withColumn("__adists", _adc_scores_udf(lut)("codes"))
        .select(
            "vec_id", F.posexplode("__adists").alias("pos", "adist")
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
    if _pq_lut_np(cb_rows, q_rows) is None:
        return spark.createDataFrame(
            [], "n_queries bigint, recall_ok boolean"
        )
    codes_df = vecs.withColumn("codes", _pq_codes_udf(cb_rows)("e"))
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
    (
        vecs.withColumn("codes", _pq_codes_udf(cb_rows)("e"))
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
    (
        delta.withColumn("codes", _pq_codes_udf(cb_rows)("e"))
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
    # Exact truth via the int64 Arrow matmul kernel (one batch matmul per
    # partition instead of a 64-term interpreted HOF fold per
    # store x query pair); the query set is the audit's bounded sample,
    # and cosine (the one float op) stays the same JVM expression.
    qs = sorted(
        (int(r["vec_id"]), [int(x) for x in r["e"]])
        for r in queries_df.select("vec_id", "e").collect()
    )
    if not qs:
        return 0, 0
    qmeta = _local_df(
        spark,
        [
            (i, qid, sum(x * x for x in qe))
            for i, (qid, qe) in enumerate(qs)
        ],
        "qi int, query_id bigint, qn bigint",
    )
    exact = (
        store.withColumn("__dots", _int_dots_udf([qe for _, qe in qs])("e"))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("nrm").alias("nn"),
            F.posexplode("__dots").alias("qi", "dot"),
        )
        .join(F.broadcast(qmeta), "qi")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.col("dot").cast("double")
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
            (
                store.withColumn("codes", _pq_codes_udf(cb_rows)("e"))
                .select("vec_id", "codes", "e", "nrm")
                .write.mode("overwrite")
                .parquet(staged)
            )
            _local_df(
                spark,
                [
                    (int(r["sub"]), int(r["code"]), [int(v) for v in r["cv"]])
                    for r in cb_rows
                ],
                "sub int, code int, cv array<bigint>",
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


def _resid_probe_luts(spark, cent_rows, cb_rows, q_rows, probe_pairs):
    """(query_id, cell_id, lut) probe table for IVF-PQ: the
    per-(query, probed-cell) RESIDUAL ADC lookup tables —
    lut[j][k] = integer squared L2 between the residual's j-th subvector
    and codeword (j, k) — computed as exact Python ints from the
    collected centroids/codebooks/queries (all model-bounded). Replaces
    the in-plan form that re-derived each table with nested HOF lambdas
    over the codebook baked as an M_SUB x K_CODES x SUB_DIM SQL literal
    (round-11: that literal tree alone dominated serve-path planning).
    Returns a 1-slice local DataFrame ready to broadcast."""
    book = {(r["sub"], r["code"]): [int(v) for v in r["cv"]] for r in cb_rows}
    cb_py = [[book[(j, k)] for k in range(K_CODES)] for j in range(M_SUB)]
    ce_of = {int(r["cell_id"]): [int(x) for x in r["ce"]] for r in cent_rows}
    qe_of = {int(r["vec_id"]): [int(x) for x in r["e"]] for r in q_rows}
    rows = []
    for q, cell in probe_pairs:
        qres = [a - b for a, b in zip(qe_of[q], ce_of[cell])]
        lut = [
            [
                sum(
                    (qres[j * SUB_DIM + d] - cb_py[j][k][d]) ** 2
                    for d in range(SUB_DIM)
                )
                for k in range(K_CODES)
            ]
            for j in range(M_SUB)
        ]
        rows.append((q, cell, lut))
    return _local_df(
        spark, rows, "query_id bigint, cell_id bigint, lut array<array<bigint>>"
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
    codes_df = resid.select(
        "vec_id", "cell_id", _pq_codes_udf(cb_rows)("re").alias("codes")
    )
    qv = vecs.where(F.col("vec_id") < N_QUERIES)
    cent_rows = cents.collect()
    n_probe = scaled_n_probe(len(cent_rows))
    w = Window.partitionBy("query_id").orderBy(F.desc("aff"), F.asc("cell_id"))
    # Probe selection (the 6-dp cosine ranking) stays a JVM expression —
    # only the bounded (query, cell) id pairs come back; the residual
    # ADC tables for exactly those pairs are computed driver-side.
    probe_pairs = [
        (int(r["query_id"]), int(r["cell_id"]))
        for r in qv.crossJoin(F.broadcast(cents))
        .select(
            F.col("vec_id").alias("query_id"),
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
        .withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") <= n_probe)
        .select("query_id", "cell_id")
        .collect()
    ]
    probes = _resid_probe_luts(
        spark,
        cent_rows,
        cb_rows,
        qv.select("vec_id", "e").collect(),
        probe_pairs,
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
    data).

    Build-cost shape (round-10): the training lifecycle scans its input
    MANY times (3 Lloyd rounds x 2 passes for the coarse quantizer, +1
    assignment, then 3 x 2 codebook passes over the residuals)
    — so the quantized corpus is materialized ONCE up front and the
    residual table ONCE before codebook training (`localCheckpoint`,
    bit-identical results, the standard cache-the-training-set recipe;
    at 100 TB this is `persist(DISK_ONLY)` on the training sample).
    Without the two checkpoints every pass re-ran the parquet scan +
    quantization + (for residuals) the full assignment crossJoin."""
    vecs = _quantized(spark, sf_dir).localCheckpoint(eager=True)
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
        .localCheckpoint(eager=True)
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
    (
        resid.withColumn("codes", _pq_codes_udf(cb_rows)("re"))
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
    collected centroid file (model-bounded); the 6-dp cosine probe
    ranking stays a JVM expression over a broadcast crossJoin, and only
    the (query, cell) id pairs come back — the per-(query, cell)
    residual ADC lookup tables for those pairs are exact Python ints
    (`_resid_probe_luts`), broadcast as a 1-slice local table.
    Candidate codes come from a partition-pruned read (``cell_id IN
    probe-set`` reaches the parquet source as a partition filter);
    re-rank reads the stored full-precision columns. queries_df:
    (vec_id, e) quantized query vectors."""
    from pyspark.sql import Window

    cent_rows = spark.read.parquet(f"{index_dir}/centroids").collect()
    if n_probe is None:
        n_probe = scaled_n_probe(len(cent_rows))
    cb_rows = spark.read.parquet(f"{index_dir}/codebooks").collect()
    q_rows = queries_df.select("vec_id", "e").collect()
    empty = spark.createDataFrame(
        [], "query_id bigint, neighbor_id bigint, cosine double, rnk bigint"
    )
    if not cb_rows or not q_rows or not cent_rows:
        return empty
    cents = _local_df(
        spark,
        [
            (int(r["cell_id"]), [int(x) for x in r["ce"]], int(r["cn"]))
            for r in cent_rows
        ],
        "cell_id bigint, ce array<bigint>, cn bigint",
    )
    qv = _local_df(
        spark,
        [
            (
                int(r["vec_id"]),
                [int(x) for x in r["e"]],
                sum(int(x) * int(x) for x in r["e"]),
            )
            for r in q_rows
        ],
        "query_id bigint, e array<bigint>, nrm bigint",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("aff"), F.asc("cell_id"))
    probe_pairs = [
        (int(r["query_id"]), int(r["cell_id"]))
        for r in qv.crossJoin(F.broadcast(cents))
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
        .withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") <= n_probe)
        .select("query_id", "cell_id")
        .collect()
    ]
    probes = _resid_probe_luts(spark, cent_rows, cb_rows, q_rows, probe_pairs)
    probe_cells = sorted({c for _, c in probe_pairs})
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


