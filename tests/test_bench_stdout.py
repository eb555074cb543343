"""The driver tails the LAST 2000 chars of bench.py stdout; a line
longer than that clips its head and records ``"parsed": null``
(BENCH_r03/BENCH_r04 were both lost this way). These tests pin the
stdout-line contract without running Spark."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import compact_stdout_line


def _record(n_queries: int) -> dict:
    return {
        "metric": "suite wall sec (lower=better)",
        "value": 84.418,
        "unit": "sec",
        "queries": {
            "some_reasonably_long_gate_name_%02d" % i: round(0.01 * i + 0.2, 2)
            for i in range(n_queries)
        },
        "bench_reps": 3,
        "sf": "0.1",
        "cpus": 32,
        "crawl_pages_per_sec": 70.9,
        "crawl_bigbatch_pages_per_sec": 1006.4,
        "extract_pages_per_sec": 5020.0,
    }


def test_full_catalog_fits_when_small():
    out = _record(20)
    line = compact_stdout_line(out)
    parsed = json.loads(line)
    assert len(parsed["queries"]) == 20
    assert "queries_omitted" not in parsed
    assert len(line) <= 1900


def test_oversize_catalog_trims_fastest_and_stays_parseable():
    out = _record(200)  # way over any budget
    line = compact_stdout_line(out)
    assert len(line) <= 1900
    parsed = json.loads(line)
    # slowest queries are kept, fastest dropped
    kept = set(parsed["queries"])
    times = out["queries"]
    assert all(
        times[k] >= max(times[d] for d in times if d not in kept) or k in kept
        for k in kept
    )
    assert "queries_omitted" in parsed
    assert parsed["value"] == out["value"]
    # caller's dict is not mutated
    assert len(out["queries"]) == 200


def test_current_catalog_line_is_under_driver_window():
    """The REAL catalog, serialized with worst-case 4-digit times, must
    fit — this fails at import time of a new gate before the driver
    ever sees a clipped line."""
    from scrapelect_spark.operators.catalog import QUERIES

    out = _record(0)
    out["queries"] = {k: 99.99 for k in QUERIES}
    line = compact_stdout_line(out)
    assert len(line) <= 1900
    parsed = json.loads(line)
    # even if trimming kicked in, the line parses and keeps >=40 rows
    assert len(parsed["queries"]) >= 40
