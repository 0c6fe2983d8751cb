"""PySpark-native micro-batch ingestion & analytics engine.

A from-scratch reimplementation of the *capabilities* of
awslabs/aws-lambda-redshift-loader (reference at /root/reference, analyzed in
SURVEY.md) on idiomatic Spark:

- ``sources``    — prefix-routed multi-format readers (reference: index.js:1163-1199)
- ``operators``  — the relational + LLM-data-pipeline operator surface
- ``functions``  — scalar function layer (reference §2.8)
- ``streaming``  — tri-threshold micro-batcher, ledger dedup, replay, windows
- ``plans``      — the query registry that backs ``__spark_entry__.py``

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection, and AQE; Python never touches row data except in clearly
marked Pandas-UDF operators.
"""

__version__ = "0.1.0"
