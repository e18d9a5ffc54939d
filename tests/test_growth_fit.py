"""The growth probe's exponent fit (tools/scale_probe.py
``_fit_exponent``): the number SCALING.md's round-10 linearity table is
built from, so its algebra gets a direct unit pin (no Spark needed)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _fit_exponent  # noqa: E402


def test_linear_is_one():
    assert _fit_exponent([1, 10, 50], [400, 4000, 20000]) == 1.0


def test_quadratic_is_two():
    assert _fit_exponent([1, 10, 50], [7, 700, 17500]) == 2.0


def test_constant_is_zero():
    assert _fit_exponent([1, 10, 50], [42, 42, 42]) == 0.0


def test_zero_count_refuses():
    assert _fit_exponent([1, 10, 50], [0, 5, 25]) is None


def test_single_point_refuses():
    assert _fit_exponent([10], [123]) is None


def test_two_points_match_ratio():
    # 10x scale, 100x count -> exponent exactly 2
    assert _fit_exponent([1, 10], [3, 300]) == 2.0
