"""Pin scripts/freshness.py's evidence-round → commit resolution.

The audit resolves each query's last driver-green round to the commit the
driver tested via the ``round N: verdict`` marker commit. Mid-round, the
CORRECTNESS file exists but the marker does not yet — the fallback must
resolve to HEAD (the driver tested the round's final snapshot) instead of
``None``, which used to mislabel every current-round row as stale and
would have corrupted a mid-round ``--rotation``.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import freshness as F  # noqa: E402

from mrs_mapreduce_spark.registry import load_all  # noqa: E402


def _single_query_registry(name: str):
    return {name: load_all()[name]}


def test_marker_present_resolves_to_marker_parent(monkeypatch):
    """With the ``round N: verdict`` marker committed, a green row whose
    module closure is unchanged since that commit is fresh."""
    markers = F._round_markers()
    assert markers, "repo must contain at least one round marker commit"
    rnd = max(markers)
    monkeypatch.setattr(F, "load_all", lambda: _single_query_registry("scan_parquet"))
    monkeypatch.setattr(F, "_green_rounds", lambda: {"scan_parquet": rnd})
    report = F.audit()
    row = report["scan_parquet"]
    assert row["round"] == rnd
    # scan_parquet has been untouched for several rounds: the marker-parent
    # closure must hash identically to HEAD.
    assert row["status"] == "fresh"


def test_marker_absent_falls_back_to_head(monkeypatch):
    """A green round with NO marker commit (the mid-round state) resolves to
    HEAD: the row is fresh, not spuriously stale with rev=None."""
    monkeypatch.setattr(F, "load_all", lambda: _single_query_registry("scan_parquet"))
    # round 999's CORRECTNESS exists (simulated) but no marker commit does
    monkeypatch.setattr(F, "_green_rounds", lambda: {"scan_parquet": 999})
    monkeypatch.setattr(F, "_round_markers", lambda: {})
    report = F.audit()
    row = report["scan_parquet"]
    assert row["round"] == 999
    assert row["status"] == "fresh", (
        "mid-round fallback must compare against HEAD, not rev=None"
    )
    # and the deep closure matches too (HEAD vs HEAD)
    assert row["deep"] is True


def test_never_tested_row(monkeypatch):
    monkeypatch.setattr(F, "load_all", lambda: _single_query_registry("scan_parquet"))
    monkeypatch.setattr(F, "_green_rounds", lambda: {})
    report = F.audit()
    assert report["scan_parquet"]["status"] == "never"
