"""vanna_financial_knowledge_graph_spark — PySpark-native financial KG construction.

A brand-new, Spark-first rebuild of the capabilities of
Vanna-Labs/vanna-financial-knowledge-graph (reference at /root/reference,
studied for semantics only — see SURVEY.md). All heavy lifting is expressed
as DataFrame transformations so Catalyst/Tungsten/AQE pick physical plans;
Python appears only in Arrow-batched pandas UDFs (never per-row UDFs).

Layout:
    functions/   pure deterministic text/hash functions shared by the
                 single-node oracle and the Spark UDFs (byte-identity core)
    sources/     input table synthesis + schema-checked readers
    operators/   DataFrame -> DataFrame pipeline + read-path operators
    plans/       full-DAG orchestration with checkpoint-resume manifests
    streaming/   incremental (Trigger.AvailableNow) re-run of the batch DAG
"""

__version__ = "0.1.0"

CODE_VERSION = 10  # bump to invalidate stage checkpoints when semantics change
