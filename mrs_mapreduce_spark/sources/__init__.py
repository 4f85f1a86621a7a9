"""Sources & sinks beyond parquet (SURVEY.md §2.A A1/A3/A4).

The reference's format surface is TextReader/TextWriter plus Hex/Bin
intermediate formats (``mrs/fileformats.py``); Spark's equivalents are the
built-in DataFrame sources. Parquet scan/sink live in
``operators/scans.py``; this package adds CSV and JSON round-trips and the
text sink used by the parity layer (``Job.reduce_data(outdir=...)``).
"""

from .roundtrips import sink_csv_roundtrip, sink_json_roundtrip  # noqa: F401
