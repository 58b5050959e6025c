"""Operator inventory implementations (SURVEY.md §2) as registered
(spark, oracle) query pairs. Import ``ducktales_spark.registry.load_all`` to
populate the registry."""
