"""Regression tests for bench.py's driver-facing stdout line.

The driver keeps only the last ~2000 chars of bench.py's stdout.  In round
7 the 93-query JSON line grew past that and was truncated at the FRONT,
so the official artifact recorded ``parsed: null``.  ``summary_line`` now
guarantees the line fits the budget no matter how many headline queries
exist; these tests pin that contract so registry growth can't break the
driver's bench record again.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _fake_timings(n: int) -> dict:
    return {f"some_fairly_long_query_name_{i:04d}": round(0.1 + i * 0.013, 3) for i in range(n)}


def test_summary_line_small_registry_no_truncation():
    timings = _fake_timings(10)
    line = bench.summary_line(timings, 0.1)
    assert len(line) <= bench.LINE_BUDGET
    obj = json.loads(line)
    assert obj["n_queries"] == 10
    assert len(obj["queries"]) == 10
    assert "queries_truncated" not in obj
    assert obj["value"] == round(sum(timings.values()), 3)


def test_summary_line_huge_registry_fits_budget():
    # 500 queries — far past where r7 broke; line must still fit and parse
    timings = _fake_timings(500)
    line = bench.summary_line(timings, 0.1)
    assert len(line) <= bench.LINE_BUDGET
    obj = json.loads(line)
    assert obj["n_queries"] == 500
    assert obj["queries_truncated"] is True
    assert 0 < len(obj["queries"]) < 500
    # greedy slowest-first: every included timing >= every excluded one
    included = set(obj["queries"])
    excluded_max = max(v for k, v in timings.items() if k not in included)
    assert min(obj["queries"].values()) >= excluded_max
    # headline total reflects ALL queries, not just the included subset
    assert obj["value"] == round(sum(timings.values()), 3)


def test_summary_line_current_headline_count_fits():
    # the actual current headline list, with plausible timings
    timings = {name: 1.234 for name in bench.HEADLINE}
    line = bench.summary_line(timings, 0.1)
    assert len(line) <= bench.LINE_BUDGET
    obj = json.loads(line)
    assert obj["n_queries"] == len(bench.HEADLINE)


def test_summary_line_pinned_set_stable_under_host_speed():
    """r14 (VERDICT r13 item 3): the driver-visible query set must not
    churn with host speed — every LINE_PIN name present in the timings
    rides the line even when it is among the FASTEST queries, and even
    with a worst-case A/B block on board."""
    ab = {
        "prev": "66484756fd6c53cffbdc9833c1ddceeda9418cb1",
        "n_common": 161, "median_ratio": 1.001, "p90_ratio": 1.101,
        "max_ratio": 11.53, "n_plan_changed": 42,
        "head_bracket_median": 1.002,
    }
    for speed in (0.011, 1.234, 987.654):
        timings = {name: speed for name in bench.HEADLINE}
        # make every pinned query the FASTEST in the map
        for name in bench.LINE_PIN:
            timings[name] = speed / 10
        line = bench.summary_line(timings, 0.1, ab)
        assert len(line) <= bench.LINE_BUDGET
        obj = json.loads(line)
        pinned_timed = [n for n in bench.LINE_PIN if n in timings]
        assert all(n in obj["queries"] for n in pinned_timed)
        assert obj["ab"] == ab
    # every pinned name is a real headline query (typo guard)
    assert set(bench.LINE_PIN) <= set(bench.HEADLINE)
