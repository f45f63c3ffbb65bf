"""The driver records only the last 2000 chars of bench.py stdout.

Round 5 shipped with no driver-certified bench number because the final
JSON line outgrew that tail (VERDICT r05 #1). These tests pin the
contract: the final stdout line stays well under the tail with the full
headline set, and the consistency self-check flags divergence the way
the doc's bounds define it (VERDICT r05 tasks 2 and 7).
"""

from __future__ import annotations

import json

import bench


def _fake_timings() -> dict[str, float]:
    # every headline name at a worst-case-width timing value
    return {name: 123.456 for name in bench.HEADLINE}


def test_final_line_fits_driver_tail():
    consistency = {
        "skew_within_bound": False,
        "scale_within_linear": False,
        "retries": 99,
        # worst-case-width round-9 provenance fields (VERDICT r08 #3)
        "scale_worst": {"query": "a_longish_query_name_here", "ratio": 123.45},
        "calibration_sec": 123.456,
    }
    line = bench._final_line(_fake_timings(), 0.1, consistency)
    # hard driver limit is 2000 chars of *tail*; leave headroom for a
    # trailing newline plus a few queries being added later
    assert len(line) < 1800, f"final bench line is {len(line)} chars"
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_query_wall_clock_total"
    assert set(parsed) == {
        "metric",
        "value",
        "unit",
        "queries",
        "sf",
        "protocol",
        "consistency",
    }
    # the bulky fields of the r5 artifact must NOT be on the final line
    assert "gc_sec" not in parsed
    assert "scale_probe" not in parsed
    assert "skew_probe" not in parsed


def test_final_line_single_line():
    line = bench._final_line(_fake_timings(), 0.1, {"retries": 0})
    assert "\n" not in line


def test_consistency_flags_skew_violation():
    c = bench._consistency(
        timings={},
        probe={"a": 1.0, "b": 2.0},
        skew={"a": 2.5},  # 2.5x its uniform twin > SKEW_BOUND 2.0
        factor=10,
        ref_1x={"a": 0.1, "b": 0.2},
        retries=1,
    )
    assert c["skew_within_bound"] is False
    assert c["scale_within_linear"] is True  # 1.0 <= 1.5*10*0.1
    assert c["retries"] == 1
    # worst ratio named in the artifact: a at 1.0/(10*0.1)=1.0 equals
    # b at 2.0/(10*0.2)=1.0; max() takes the first
    assert c["scale_worst"]["ratio"] == 1.0
    assert c["calibration_sec"] > 0


def test_consistency_flags_superlinear_scale():
    c = bench._consistency(
        timings={},
        probe={"a": 20.0},  # 20x its 1x ref at factor 10 > 1.5*10
        skew={},
        factor=10,
        ref_1x={"a": 1.0},
        retries=0,
    )
    assert c["scale_within_linear"] is False
    assert c["skew_within_bound"] is True  # no skew block => no violation
    # the breaching query is NAMED in the final line (VERDICT r08 #3)
    assert c["scale_worst"] == {"query": "a", "ratio": 2.0}


def test_consistency_all_green_within_bounds():
    c = bench._consistency(
        timings={},
        probe={"a": 8.0},
        skew={"a": 12.0},  # 1.5x of uniform twin, inside the 2x bound
        factor=10,
        ref_1x={"a": 1.0},
        retries=0,
    )
    assert c.pop("calibration_sec") > 0
    assert c == {
        "skew_within_bound": True,
        "scale_within_linear": True,
        "retries": 0,
        "scale_worst": {"query": "a", "ratio": 0.8},
    }
