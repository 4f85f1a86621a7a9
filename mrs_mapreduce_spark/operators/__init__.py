"""Relational operators (SURVEY.md §2.A primitives + §2.B composed surface).

Each module declares oracle-checked queries via
:func:`mrs_mapreduce_spark.registry.register`.
"""
