"""Lake-layer demo queries (DML/transactions/time travel — SURVEY.md §2.9,
§2.10). Non-SQL-expressible for the oracle -> rows-only checks; the real
assertions live in tests/test_lake_*.py which port the reference demos.

Populated once ducktales_spark.lake lands (phase 2).
"""
