"""Sources & sinks beyond parquet (SURVEY.md §2.A A1/A3/A4, §4 layouts).

The reference's format surface is TextReader/TextWriter plus Hex/Bin
intermediate formats (``mrs/fileformats.py``); Spark's equivalents are
the built-in DataFrame sources. Parquet scan/sink live in
``operators/scans.py``; the parity layer's text sink
(``Job.reduce_data(outdir=...)``) lives in ``mapreduce.py`` with the
hex/bin codecs in ``fileformats.py``. This package holds:

- ``roundtrips``: CSV/JSON/ORC/text round-trips, permissive-CSV ingest,
  merge-upsert, schema-evolving append, compaction rewrite;
- ``pairsource``: the Mrs hex pair format as a first-class Spark
  Python DataSource (``spark.read.format("mrs_pairs")``);
- ``layouts``: z-order clustered writes + min/max data skipping;
- ``partitioned``: partitioned and bucketed table writes (co-located
  zero-exchange joins).
"""

from .roundtrips import sink_csv_roundtrip, sink_json_roundtrip  # noqa: F401
