"""Batch sources (SURVEY §2.1 S1-S7, S13).

The reference reads Hive-default ``\\x01``-delimited text registered as temp tables
(reference: src/main/java/com/soto/test/MockData.java:89-108) and a MySQL dimension
via the Spark JDBC source (AreaTop3ProductSpark.java:205-206). Here the primary
format is parquet (columnar scan, predicate pushdown, column pruning — all free
from Catalyst once the plan is declarative); ``\\x01`` text and JDBC are kept as
secondary connectors for format parity.

Scale notes: `spark.read.parquet` on a 100 TB table prunes partitions and row
groups from the WHERE clause — S1's hand-interpolated
``WHERE date>=:start AND date<=:end`` (SparkUtils.java:73-77) becomes a plain
``.where`` that Catalyst pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

#: Driver-provided test tables (TESTDATA.md) — one parquet file each.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events`` with its nanosecond timestamp normalized to Spark's
    microsecond TimestampType.

    The driver parquet stores ``ts`` as TIMESTAMP(NANOS), which Spark rejects
    by default (PARQUET_TYPE_ILLEGAL); ``nanosAsLong`` reads it as raw nanos,
    and integer-division to micros truncates exactly like DuckDB's ns→us cast,
    so both engines see identical timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Naive (isAdjustedToUTC=false) parquet timestamps read as TIMESTAMP_NTZ;
    # epoch arithmetic on them casts through timestamp_ltz (functions/scalar
    # .epoch_us), which is only deterministic under a pinned session timezone.
    # UTC matches DuckDB's naive-timestamp epoch semantics exactly.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # NOT widen_scan'd: measured A/B at sf0.1 (round 7) shows the extra
    # round-robin shuffle is a wash for the events family (±10%; the
    # per-event derivation is cheap) and costs 20%+ where a consumer
    # repartitions again anyway (stratified_sample). widen_scan pays off
    # only above CPU-heavy per-row derivation — the shingle/minhash
    # pipelines, where it measures ~2x.
    return df


def widen_scan(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Rebalance a NARROW scan before CPU-heavy derivation (shingling,
    embedding quantization, per-doc hashing): when the leaf scan yields
    fewer partitions than the cluster has cores, every downstream map-side
    expression runs on that handful of cores no matter how wide the
    cluster is — a single-row-group parquet file (the driver testdata
    shape) pins the whole shingle/minhash/quantize pipeline to ONE thread.

    The repartition is GUARDED: at 100 TB a table scan already has
    orders-of-magnitude more splits than cores, so this is a no-op there
    (no shuffle added); it only fires when scan parallelism < cores, where
    the one small shuffle of raw rows buys cores-way parallelism for all
    derivation above it. This mirrors what AQE does for post-shuffle
    stages but which nothing does for the scan→first-shuffle segment."""
    if df.isStreaming:  # partitioning is the source's business there
        return df
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver test table from ``sf_dir`` as a DataFrame."""
    return {
        name: (
            read_events(spark, sf_dir)
            if name == "events"
            else spark.read.parquet(f"{sf_dir}/{name}.parquet")
        )
        for name in TABLES
    }


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register each table as a temp view (SQL surface, S7 analog)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_x01_text(
    spark: SparkSession,
    path: str,
    schema: StructType,
    null_value: str | None = None,
) -> DataFrame:
    """Hive-default ``\\x01``-separated text scan (S13; reference sales.txt /
    user_visit_action.txt fixtures). Explicit schema — no inference in prod
    paths. ``null_value`` maps a literal token (the reference's mock data
    writes the string ``"null"``, MockData.java:63-75) to SQL NULL."""
    reader = spark.read
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    return reader.csv(path, sep="\x01", schema=schema, header=False)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 1,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC source (S3; reference AreaTop3ProductSpark.java:180-228).

    For anything bigger than a dimension table, pass ``partition_column`` +
    bounds so the read parallelizes instead of funneling through one connection.
    ``driver`` pins the JDBC driver class when the URL scheme alone cannot
    resolve it (e.g. Derby embedded, which ships on Spark's own classpath).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


_FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write a table in any interchange format the engine serves
    (S1/S13 generalized): columnar parquet/ORC for analytics, JSON-lines /
    CSV for interchange with line-oriented tooling. CSV keeps headers and
    explicit timestamp formatting so a round-trip is lossless for the flat
    schemas the catalog carries."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt in ("json", "csv"):
        # Text formats default to millisecond timestamp rendering; micros
        # keep the round-trip lossless vs the parquet TIMESTAMP(NTZ).
        w = w.option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: StructType | None = None
) -> DataFrame:
    """Read a table written by ``write_table``. Schemaless columnar formats
    (parquet/ORC) self-describe; JSON/CSV take the explicit schema — no
    inference in production paths (inference is a full extra pass at
    100 TB and can mistype empty partitions)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        if schema is None:
            raise ValueError(f"{fmt} reads require an explicit schema")
        reader = reader.schema(schema).option(
            "timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        )
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)
