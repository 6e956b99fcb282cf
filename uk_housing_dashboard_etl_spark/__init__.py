"""PySpark-native analytics engine with the query surface of
``EngineerMachoka/uk-housing-dashboard-etl`` (reference: a pandas ETL over
HM Land Registry Price Paid Data — see SURVEY.md).

Everything here is DataFrame-first: the logical plan is declared with the
PySpark DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy.
Zero Python UDFs on the reference-parity hot path; Arrow-batched pandas UDFs
appear only in the extension operators (similarity / multimodal) where the
built-in operators genuinely cannot express the semantics.

Layout
------
- ``session``    : tuned ``SparkSession`` factory (AQE, shuffle sizing, UTC)
- ``sources``    : readers (parquet, CSV dialect sniffing, lookup) and sinks
- ``functions``  : scalar/column helpers (cleaning, text, vectors)
- ``operators``  : the operator inventory from SURVEY.md §2 + extensions
- ``plans``      : full-pipeline assembly mirroring the reference CLI run
- ``streaming``  : Structured Streaming variant of the weekly mart
"""

from uk_housing_dashboard_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
