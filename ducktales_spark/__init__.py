"""ducktales_spark — a PySpark-native analytics engine with the capability
surface of TFMV/DuckTales (DuckLake lakehouse demos).

Two layers (see SURVEY.md §7):

* **Relational surface** (``ducktales_spark.queries``): the full SQL operator
  inventory of the reference (SURVEY.md §2.1-2.8, 2.10) expressed as
  DataFrame/Spark-SQL plans, each paired with a DuckDB oracle query for
  differential testing.
* **Lake layer** (``ducktales_spark.lake``): DuckLake's differentiating
  capabilities — SQL-database catalog, ACID multi-table transactions,
  snapshot time travel, transactional schema evolution, small-write
  inlining — rebuilt Spark-first: Spark jobs stage immutable Parquet,
  a single SQL transaction on the catalog DB is the commit point
  (reference: README.md:200-209).

Plus LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.
"""

from ducktales_spark.session import get_spark
from ducktales_spark.registry import REGISTRY, register

__all__ = ["get_spark", "REGISTRY", "register"]

__version__ = "0.1.0"
