"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2.11) — its
streaming-shaped workloads are a background thread appending rows
continuously (``demos/03_schema_evolution/demo.py:32-72``) and IoT sensor
appends (``demos/04_small_file_optimization/demo.py:236-249``). We cover them
idiomatically: a ``foreachBatch`` sink that writes each micro-batch through
the lake's transactional commit path (micro-batch == snapshot), plus
watermarked window aggregations and a custom stateful operator for the
training-pipeline extension surface.
"""

from .dedup import dedup_batch, start_lake_dedup_ingest  # noqa: F401
from .ingest import start_lake_cdc_merge, start_lake_ingest  # noqa: F401
from .windows import sessionize, windowed_counts  # noqa: F401
