"""CSV / TSV sources and sinks matching the reference's file contracts.

Three contracts (SURVEY.md §2.1):

* S3 — lookup CSV: ``competitor-list.csv`` comma CSV with a UTF-8 BOM
  (run_exports_query.py:223). Spark's CSV reader handles the BOM on the
  first column name via ``encoding``.
* S4 — directory-of-TSVs source: the merge job reads ``output/*.csv`` as
  all-string, tab-delimited, utf-8-sig, skipping unreadable files
  (merge_all_lenders.py:26,34-49). Spark reads the directory natively; a
  PERMISSIVE read approximates skip-on-error.
* S5/S6 — TSV sink: tab-delimited, QUOTE_ALL, ``''`` for NULL,
  ``%Y-%m-%d %H:%M:%S%z`` timestamps, ``\\n`` terminator, backslash escape,
  utf-8-sig BOM (run_exports_query.py:75-89, merge_all_lenders.py:63-77).
  Spark cannot emit a BOM itself; ``write_tsv(..., bom=True)`` post-fixes
  the part files (driver-side file rename, not a data pass).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# pandas strftime '%Y-%m-%d %H:%M:%S%z' → Java pattern (+0000-style offset)
REFERENCE_TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm:ssZ"

_SINK_OPTIONS = {
    "sep": "\t",
    "header": "true",
    "quoteAll": "true",
    "nullValue": "",
    "emptyValue": "",
    "escape": "\\",
    "timestampFormat": REFERENCE_TIMESTAMP_FORMAT,
    "lineSep": "\n",
}


def read_lookup_csv(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S3: small dimension CSV (header, comma, possible BOM)."""
    reader = spark.read.option("header", True).option("encoding", "UTF-8")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", False)  # all-string, like dtype=str
    return reader.csv(path)


def read_tsv_directory(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """S4/U1: union-by-directory of per-lender TSVs, every column string.

    ``dtype=str`` + ``''``→NaN (merge_all_lenders.py:41-43) maps to an
    all-string schema with ``nullValue=''``. PERMISSIVE mode null-fills
    malformed rows (the reference skips whole unreadable files).
    """
    reader = (
        spark.read.option("header", True)
        .option("sep", "\t")
        .option("nullValue", "")
        .option("mode", "PERMISSIVE")
        .option("escape", "\\")
    )
    if columns is not None:
        schema = T.StructType([T.StructField(c, T.StringType()) for c in columns])
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", False)
    return reader.csv(path)


def write_tsv(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    single_file: bool = False,
    bom: bool = False,
) -> None:
    """S5/S6: the reference's TSV sink contract.

    ``partition_by`` reproduces one-file-per-lender (S5) as a partitioned
    directory — at scale the partitioned write replaces the reference's
    48 sequential per-lender jobs. ``single_file=True`` reproduces the
    merged single-file contract (S6) via ``coalesce(1)`` — only sane for
    final small outputs; the 100 TB path keeps the partitioned layout.
    """
    writer = df.coalesce(1).write if single_file else df.write
    writer = writer.mode("overwrite")
    for k, v in _SINK_OPTIONS.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.csv(path)
    if bom:
        _prepend_bom(path)


def _prepend_bom(path: str) -> None:
    """Prefix each written part file with the UTF-8 BOM (utf-8-sig).

    Also removes Hadoop LocalFS ``.crc`` sidecars for rewritten parts —
    mutating the file in place invalidates the checksum and would make any
    later Spark read of the directory fail with ChecksumException.
    """
    for part in set(
        glob.glob(os.path.join(path, "**", "part-*.csv"), recursive=True)
        + glob.glob(os.path.join(path, "part-*.csv"))
    ):
        with open(part, "rb") as f:
            data = f.read()
        if not data.startswith(b"\xef\xbb\xbf"):
            with open(part, "wb") as f:
                f.write(b"\xef\xbb\xbf" + data)
            crc = os.path.join(os.path.dirname(part), f".{os.path.basename(part)}.crc")
            if os.path.exists(crc):
                os.remove(crc)
