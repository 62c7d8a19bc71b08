"""Raw-file readers for the sales pipeline (reference steps 2-3 parity).

The reference stages local files and COPYes them through per-format FILE
FORMAT objects (/root/reference/Snowflake Worksheets/4. Common Schema.sql:5-23,
step_2_stage_data.py, step_3_load_from_stage_to_source.py). On Spark the
"stage" disappears — files are read in place — and FILE FORMATs become
reader-option presets (SURVEY.md §2.1 S1-S7):

- CSV (IN): header, quoted fields with EMBEDDED NEWLINES in addresses →
  ``multiLine=True`` is mandatory (FIXTURES.md §1.1). Note multiLine makes
  CSV non-splittable per FILE — fine for modest date-partitioned files;
  at 100 TB use ``sources.splittable_csv.read_csv_splittable``, the
  two-pass quote-parity record splitter (byte-range tasks, JVM-side
  from_csv parse) proven record-identical to this reader on the real IN
  fixtures (tests/test_splittable_csv.py) and oracle-gated
  (csv_splittable_roundtrip).
- Parquet (US): named columns, snappy.
- JSON (FR): one top-level array per file (``multiLine=True`` ≡ Snowflake
  strip_outer_array); "Price per Unit" arrives as a string (FIXTURES §1.3).
  multiLine JSON is also non-splittable per file — at 100 TB use
  ``sources.splittable_json.read_json_splittable``, the two-pass
  state-transfer element splitter (byte-range tasks, JVM-side from_json
  parse) proven element-identical to this reader on the real FR fixtures
  (tests/test_splittable_json.py) and oracle-gated
  (json_splittable_roundtrip).

File-metadata columns (SURVEY §2.1 S10): Snowflake's metadata$filename /
file_row_number / file_last_modified map to Spark's hidden ``_metadata``
struct plus a per-file row_number window. Column names keep the reference's
typo ``_metadata_row_numer`` (/root/reference/Snowflake Worksheets/
3. Source Tables.sql:48) because downstream DDL uses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The 16 logical payload fields, in file order (FIXTURES.md §1.1).
SALES_FIELDS = [
    "Order ID",
    "Customer Name",
    "Mobile Model",
    "Quantity",
    "Price per Unit",
    "Total Price",
    "Promotion Code",
    "Order Amount",
    "Tax",  # header 'GST' in the IN csv, 'Tax' in US/FR
    "Order Date",
    "Payment Status",
    "Shipping Status",
    "Payment Method",
    "Payment Provider",
    "Contact",  # header 'Mobile' in IN, 'Phone' in US/FR
    "Delivery Address",
]


def _csv_schema() -> T.StructType:
    """IN csv: read every field as string (positional $N::text equivalent,
    /root/reference/step_3_load_from_stage_to_source.py:28-43); numeric
    casts happen in the load select."""
    return T.StructType(
        [
            T.StructField("Order ID", T.StringType()),
            T.StructField("Customer Name", T.StringType()),
            T.StructField("Mobile Model", T.StringType()),
            T.StructField("Quantity", T.StringType()),
            T.StructField("Price per Unit", T.StringType()),
            T.StructField("Total Price", T.StringType()),
            T.StructField("Promotion Code", T.StringType()),
            T.StructField("Order Amount", T.StringType()),
            T.StructField("GST", T.StringType()),
            T.StructField("Order Date", T.StringType()),
            T.StructField("Payment Status", T.StringType()),
            T.StructField("Shipping Status", T.StringType()),
            T.StructField("Payment Method", T.StringType()),
            T.StructField("Payment Provider", T.StringType()),
            T.StructField("Mobile", T.StringType()),
            T.StructField("Delivery Address", T.StringType()),
        ]
    )


def _json_schema() -> T.StructType:
    """FR json (FIXTURES.md §1.3): numbers arrive mixed — Price per Unit is
    a string, Tax a double with float artifacts."""
    return T.StructType(
        [
            T.StructField("Order ID", T.StringType()),
            T.StructField("Customer Name", T.StringType()),
            T.StructField("Mobile Model", T.StringType()),
            T.StructField("Quantity", T.LongType()),
            T.StructField("Price per Unit", T.StringType()),
            T.StructField("Total Price", T.LongType()),
            T.StructField("Promotion Code", T.StringType()),
            T.StructField("Order Amount", T.DoubleType()),
            T.StructField("Tax", T.DoubleType()),
            T.StructField("Order Date", T.StringType()),
            T.StructField("Payment Status", T.StringType()),
            T.StructField("Shipping Status", T.StringType()),
            T.StructField("Payment Method", T.StringType()),
            T.StructField("Payment Provider", T.StringType()),
            T.StructField("Phone", T.StringType()),
            T.StructField("Delivery Address", T.StringType()),
        ]
    )


def with_file_metadata(df: DataFrame) -> DataFrame:
    """Attach the reference's three metadata columns from Spark's hidden
    ``_metadata`` struct. The per-file row number is generated with a
    window over the file path; ordering within a file follows read order
    (exact for multiLine sources, which are read single-split)."""
    df = df.withColumns(
        {
            "_metadata_file_name": F.col("_metadata.file_path"),
            "_metadata_last_modified": F.col("_metadata.file_modification_time").cast(
                "timestamp_ntz"
            ),
        }
    )
    w = Window.partitionBy("_metadata_file_name").orderBy(
        F.monotonically_increasing_id()
    )
    return df.withColumn(
        "_metadata_row_numer", F.row_number().over(w).cast("decimal(38,0)")
    )


def read_sales_raw(spark: SparkSession, data_root: str, fmt: str) -> DataFrame:
    """Read one country's raw sales files (Hive-partitioned subtree) in its
    native format, with PERMISSIVE error tolerance (ON_ERROR=CONTINUE
    parity, SURVEY §2.1 S9). Returns the 16 payload fields plus metadata."""
    if fmt == "csv":
        path = f"{data_root}/sales/source=IN/format=csv"
        df = (
            spark.read.schema(_csv_schema())
            .options(
                header=True,
                multiLine=True,
                quote='"',
                escape='"',
                mode="PERMISSIVE",
            )
            .csv(f"{path}/date=*/*.csv")
        )
    elif fmt == "parquet":
        path = f"{data_root}/sales/source=US/format=parquet"
        df = spark.read.parquet(f"{path}/date=*/*.parquet")
    elif fmt == "json":
        path = f"{data_root}/sales/source=FR/format=json"
        df = (
            spark.read.schema(_json_schema())
            .options(multiLine=True, mode="PERMISSIVE")
            .json(f"{path}/date=*/*.json")
        )
    else:
        raise ValueError(f"unsupported sales format {fmt!r}")
    return with_file_metadata(df)


FOREX_COLUMNS = ["date", "usd2usd", "usd2eu", "usd2can", "usd2uk", "usd2inr", "usd2jp"]


def read_forex_raw(spark: SparkSession, csv_path: str) -> DataFrame:
    """exchange-rate-data.csv: 120 daily rows (FIXTURES.md §1.4)."""
    schema = T.StructType(
        [T.StructField("date", T.DateType())]
        + [T.StructField(c, T.StringType()) for c in FOREX_COLUMNS[1:]]
    )
    return spark.read.schema(schema).options(header=True).csv(csv_path)


def forex_table(spark: SparkSession, csv_path: str, faithful: bool = True) -> DataFrame:
    """The common.exchange_rate load (/root/reference/Snowflake Worksheets/
    5. Forex Exchange Rate.sql:15-29). Faithful mode replicates the loader
    bug: usd2uk/usd2inr/usd2jp are all read from column $4 — the CAD rate
    (5. Forex:23-25; SURVEY §2.11.1). Corrected mode maps columns properly.
    """
    raw = read_forex_raw(spark, csv_path)
    # Storage type per the table DDL (decimal(10,7), 5. Forex:7-12). The
    # loader's TO_DECIMAL(x,12,10) intermediate would overflow for JPY
    # (133.17…) — only the $4 bug makes it fit in the reference; casting
    # straight to the storage type keeps both profiles loadable.
    dec = lambda c: F.col(c).cast("decimal(10,7)")
    if faithful:
        src = {
            "usd2usd": "usd2usd",
            "usd2eu": "usd2eu",
            "usd2can": "usd2can",
            "usd2uk": "usd2can",
            "usd2inr": "usd2can",
            "usd2jp": "usd2can",
        }
    else:
        src = {c: c for c in FOREX_COLUMNS[1:]}
    return raw.select(
        F.col("date"), *[dec(v).alias(k) for k, v in src.items()]
    )
