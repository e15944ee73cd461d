"""open_source_legislation_spark — PySpark-native KG-construction engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of spartypkp/open-source-legislation (see SURVEY.md):
stable-ordered turn reassembly, mention/definition extraction into
(subj, pred, obj) triples, entity linking against a broadcast canonical
dictionary, connected-components canonicalization, and graph
materialization into nodes/edges/triples tables — over transcript tables
``(conv_id, turn_idx, role, text, tool, ts)``.

Design point: 10^12 turns on a multi-executor cluster. Everything is a
DataFrame DAG; Python only appears as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
