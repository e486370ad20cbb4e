"""Sources (SURVEY §2.1 S1/S2).

The reference reads a quoted, multiline CSV whose payload column embeds
JSON with newlines/quotes (``/root/reference/etl/main.py:75-80``) and
parquet warehouse tables (``notebooks/report.ipynb`` cell 3). Both are
generalized here; readers take explicit schemas where determinism
matters (the reference infers CSV columns as strings — same default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from parcel_analytics_etl_notebook_spark.session import pin_session

#: Canonical driver-generated tables (TESTDATA.md).
TESTDATA_TABLES = (
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


def read_csv_multiline(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    quote: str = '"',
    escape: str = '"',
    sep: str = ",",
) -> DataFrame:
    """Quoted multiline CSV scan — parity with the reference's only
    source (``etl/main.py:75-80``): payload cells may contain embedded
    newlines and doubled quotes.

    At 100 TB, multiLine CSV is NOT splittable (one file = one task);
    keep input files small or convert to parquet at the edge.
    """
    reader = (
        spark.read.option("header", header)
        .option("quote", quote)
        .option("escape", escape)
        .option("sep", sep)
        .option("multiLine", True)
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def stage_csv_to_parquet(
    spark: SparkSession,
    csv_path: str,
    parquet_path: str,
    schema: StructType | None = None,
    target_files: int | None = None,
    partition_by: list[str] | None = None,
    **csv_opts,
) -> DataFrame:
    """One-shot heavy-ingest staging: multiline CSV → parquet, then
    return the STAGED frame for all downstream work.

    multiLine CSV is not splittable — every input file is one task no
    matter its size (the 100 TB cliff :func:`read_csv_multiline`
    documents; the reference re-reads its CSV per run,
    ``etl/main.py:75-80``). This recipe pays that single-task scan ONCE,
    rewrites into ``target_files`` parquet files (optionally
    partitioned by e.g. an ingest-date column for pruning), and hands
    back the parquet-backed frame — splittable, columnar, predicate-
    pushdown-friendly. Every subsequent pass runs at full cluster
    parallelism instead of one-task-per-CSV-file.
    """
    from parcel_analytics_etl_notebook_spark.sources.writers import write_parquet

    raw = read_csv_multiline(spark, csv_path, schema=schema, **csv_opts)
    write_parquet(
        raw, parquet_path, partition_by=partition_by, target_files=target_files
    )
    return spark.read.parquet(parquet_path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (``report.ipynb`` cell 3). Column pruning and
    predicate pushdown reach the scan automatically — keep filters
    expressed on raw columns so they stay pushable."""
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """JSON-lines scan; explicit schema avoids a full inference pass
    (which reads the data twice — a non-starter at scale)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other columnar format Spark reads natively
    (vectorized reader, predicate pushdown, column pruning — same
    optimizer treatment as parquet). Here for lake interop: warehouses
    migrating from Hive commonly hold ORC."""
    return spark.read.orc(path)


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the driver's parquet tables and (optionally) register each
    as a temp view so catalog queries can be written in Spark SQL."""
    pin_session(spark)
    out: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan across SCHEMA GENERATIONS: ``mergeSchema`` unions
    the footer schemas of every file, so a table whose later ingest
    batches added columns reads as one frame (older files yield NULL
    for the new columns). The production reality of any long-lived
    warehouse table — the reference's fixed-schema read
    (``notebooks/report.ipynb`` cell 3) breaks the day a column lands.

    Cost note: mergeSchema reads EVERY file footer at planning time —
    O(files) driver work. At 100 TB keep it off for stable tables (the
    engine default) and on only for evolving ones, or better, register
    the superset schema explicitly and read with that."""
    return spark.read.option("mergeSchema", True).parquet(path)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Malformed-row quarantine scan: returns ``(good, bad)`` frames in
    ONE pass definition — PERMISSIVE mode parses what it can, routes
    unparseable lines into a ``_corrupt_record`` column, and the split
    is a pair of filters over the same scan (Catalyst shares it).
    ``bad`` carries the raw line for repair/audit; ``good`` drops the
    capture column. Corrupt rows are DATA at 100 TB — a single
    malformed line must quarantine, not kill the job (FAILFAST) or
    silently vanish (DROPMALFORMED).

    The schema must NOT itself contain ``_corrupt_record`` — the column
    is appended here."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    if "_corrupt_record" in schema.fieldNames():
        raise ValueError("schema must not predeclare _corrupt_record")
    with_capture = schema.add("_corrupt_record", StringType())
    df = (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(with_capture)
        .csv(path)
        # Spark requires caching/materializing before filtering on the
        # corrupt-record column alone (it is populated during parsing,
        # a raw-data reference a later filter can't see); selecting it
        # alongside the data columns keeps the query valid
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad
