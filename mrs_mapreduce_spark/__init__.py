"""mrs_mapreduce_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``byu-aml-lab/mrs-mapreduce`` ("Mrs").

Mrs is a pure-Python MapReduce framework for iterative/asynchronous
computational-science workloads (PyHPC'12: McNabb, Lund, Seppi — "Mrs: High
Performance MapReduce for Iterative and Asynchronous Algorithms in Python").
This package re-expresses its entire capability surface Spark-first:

* the reference's actual primitives (map / combine / reduce / reducemap /
  partition functions / iterative driver) as a thin RDD-backed parity layer
  (:mod:`mrs_mapreduce_spark.mapreduce`);
* the relational algebra a Mrs user composes by hand (joins, aggregations,
  windows, set ops, scalar functions) as native DataFrame builders that
  Catalyst optimizes (:mod:`mrs_mapreduce_spark.operators`,
  :mod:`mrs_mapreduce_spark.functions`);
* LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns) designed for 100 TB scale
  (:mod:`mrs_mapreduce_spark.llm`);
* event-time streaming via Structured Streaming
  (:mod:`mrs_mapreduce_spark.streaming`).

Provenance note: ``/root/reference`` was empty when this engine was built
(SURVEY.md §0), so reference citations in docstrings use the public repo's
module paths (``mrs/<file>.py::<symbol>``) without line numbers.
"""

__version__ = "0.1.0"
