"""Structured Streaming surface (SURVEY.md §2.C — extension, no reference
counterpart: Mrs's "async" is task scheduling, not event-time streaming).

Window/session/watermark operators are declared through their exact
batch-mode twins (``window()`` / ``session_window()`` behave identically in
batch), so the DuckDB oracle stays strong; a true ``readStream`` →
``writeStream`` path with watermarking runs in ``stream_watermark`` and in
unit tests.
"""
