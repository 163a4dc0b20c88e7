"""Bench/probe wiring pins: every bench headline query must be a
registered query WITH a recorded BASELINE.md pin (the per-query 2x gate
is meaningless for an unpinned row — exactly the drift the round-6
verdict flagged), and every scale-probe extra must be registered. Fails
at commit time instead of at the next round's adjudication."""

from __future__ import annotations

import re

from bench import BENCH_QUERIES, HELPER_TIMINGS, final_line
from log_analysis_system_spark.queries import ORACLES, QUERIES, load_all
from scripts.scale_probe import EXTRA_QUERIES

load_all()


def _baseline_pins() -> dict[str, float]:
    pins: dict[str, float] = {}
    with open("BASELINE.md") as f:
        for line in f:
            m = re.match(
                r"\|\s*([a-z0-9_]+)\s*(?:\([^)]*\))?\s*\|"
                r"\s*(?:sec\s*\|\s*)?([0-9.]+)\s*\|",
                line,
            )
            if m:
                pins[m.group(1)] = float(m.group(2))
    return pins


def test_bench_queries_registered_and_pinned():
    pins = _baseline_pins()
    unregistered = [q for q in BENCH_QUERIES if q not in QUERIES]
    assert not unregistered, unregistered
    unpinned = [q for q in BENCH_QUERIES if q not in pins]
    assert not unpinned, (
        f"bench entries without a BASELINE.md pin (add the 3-run-median "
        f"row before shipping): {unpinned}"
    )


def test_bench_queries_have_oracles():
    missing = [q for q in BENCH_QUERIES if q not in ORACLES]
    assert not missing, missing


def test_helper_timings_pinned():
    pins = _baseline_pins()
    unpinned = [q for q in HELPER_TIMINGS if q not in pins]
    assert not unpinned, (
        f"lifecycle-helper timings without a BASELINE.md pin: {unpinned}"
    )


def test_final_line_stays_compact():
    """The driver keeps only a ~2 KB tail of bench stdout; round 8's
    76-entry per-query map made the final line ~3.3 KB and the head
    (with "metric"/"value") was truncated away -> BENCH_r08.json
    "parsed": null. The final line must never carry per-query detail
    and must stay well under the capture window."""
    line = final_line(
        999999.999, "0.1", 99, [99.99, 99.99, 99.99], 9.999, 99.999
    )
    assert len(line) < 1500, len(line)
    assert '"queries"' not in line
    import json

    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall_clock"
    assert parsed["value"] == 999999.999
    assert parsed["load_ok"] is False
    assert parsed["n_queries"] == 99


def test_final_line_carries_calib_adjusted_value():
    """Round-9 verdict: the 2x gate is adjudicated on the official
    artifact, and two consecutive loaded-host driver runs produced
    false breaches. The final line must carry the calib-rescaled total
    so a gate decision needs no judge re-run."""
    import json

    from bench import CALIB_PIN

    line = final_line(100.0, "0.1", 10, [0.5, 0.5, 0.5], 1.5, 10.0)
    parsed = json.loads(line)
    assert parsed["calib_pin"] == CALIB_PIN
    # 100 s measured while the calib loop ran 1.5 s vs the 1.2 s pin
    # host -> the host was 1.25x slow -> adjusted = 80 s.
    assert parsed["value_calib_adjusted"] == round(
        100.0 * CALIB_PIN / 1.5, 3
    )
    assert parsed["load_ok"] is True


def test_probe_extras_registered():
    # overlap with BENCH_QUERIES is fine (promoted entries keep their
    # EXTRA row for history; the probe dedupes via dict.fromkeys) —
    # what must never happen is probing an unregistered name
    unregistered = [q for q in EXTRA_QUERIES if q not in QUERIES]
    assert not unregistered, unregistered
