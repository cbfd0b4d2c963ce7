"""monthly_report_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``amirquickli/monthly-report-etl``
(a DuckDB/MotherDuck + pandas monthly batch ETL; see SURVEY.md). The
reference defines WHAT to compute — the 7-CTE exports pipeline
(/root/reference/exports_results.sql:14-205), the tier/rank enrichment
(/root/reference/scripts/run_exports_query.py:106-168) and the TSV sink
contract (:75-104) — while this package defines HOW, using lazy DataFrame
plans that Catalyst optimizes, designed for multi-executor 100 TB scale:

* no collect-to-driver in any data path;
* global denominators via aggregate + broadcast join, never a
  single-partition window;
* the reference's O(lenders x data) per-lender loop collapsed into one
  single-pass plan;
* dimension joins broadcast; big-side shuffles minimized and keyed once.
"""

__version__ = "0.1.0"

from monthly_report_etl_spark.session import get_spark  # noqa: F401
