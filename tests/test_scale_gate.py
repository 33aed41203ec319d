"""Unit tests for the scale gate's pure ratio/budget logic
(scripts/scale_evidence.py) — the Spark-free half of the sf1 gate."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "scale_evidence",
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)),
        "scripts", "scale_evidence.py",
    ),
)
se = importlib.util.module_from_spec(spec)
spec.loader.exec_module(se)


def test_ratio_budget_logic():
    q01 = {"a": 1.0, "b": 0.1, "c": 2.0, "d": 0.5}
    q1 = {"a": 9.0, "b": 0.9, "c": 4.0, "d": 5.0}
    ratios, bad = se.ratio_suspects(q01, q1, budget=8.0)
    assert ratios["a"] == 9.0 and "a" in bad          # real breach
    # denominator floored at 0.3: 0.9/0.3 = 3.0, not 9.0
    assert ratios["b"] == 3.0 and "b" not in bad
    assert ratios["c"] == 2.0 and "c" not in bad
    assert ratios["d"] == 10.0 and "d" in bad
    # sub-second numerator is never a breach even at a huge ratio
    r2, bad2 = se.ratio_suspects({"x": 0.01}, {"x": 0.9}, budget=2.0)
    assert r2["x"] == 3.0 and bad2 == []
    # names= restricts evaluation
    r3, _ = se.ratio_suspects(q01, q1, budget=8.0, names=["a"])
    assert list(r3) == ["a"]


def test_capture_bench_gates():
    """Pure gate logic of the gated builder-bench capture
    (scripts/capture_bench.py) — the r9 polluted-artifact class must
    be unshippable."""
    spec2 = importlib.util.spec_from_file_location(
        "capture_bench",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)),
            "scripts", "capture_bench.py",
        ),
    )
    cb = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(cb)

    meds = {"s1": 1.0, "s2": 0.5}
    ok = {
        "value": 100.0, "value_cold": 120.0,
        "queries_sentinel": {"s1": 1.1, "s2": 0.45},
        "queries": {},
    }
    g = cb.evaluate_gates(ok, meds)
    assert g["pass"] and g["warm_over_cold"] == 0.833

    # the exact r9 failure: warm SLOWER than cold -> reject
    bad_warm = dict(ok, value=197.2, value_cold=156.5)
    g = cb.evaluate_gates(bad_warm, meds)
    assert not g["pass"] and "ambient load" in g["reasons"][0]

    # a UNIFORMLY slower box is fine (the machine factor adjusts):
    # both sentinels at ~1.4x their medians, consistent -> pass
    slow_box = dict(ok, queries_sentinel={"s1": 1.4, "s2": 0.7})
    assert cb.evaluate_gates(slow_box, meds)["pass"]
    # sentinels DISAGREEING (factor unreliable) -> reject
    bad_sent = dict(ok, queries_sentinel={"s1": 1.4, "s2": 0.45})
    g = cb.evaluate_gates(bad_sent, meds)
    assert not g["pass"] and "machine factor" in g["reasons"][0]
    # wild absolute excursion rejects even when consistent
    wild = dict(ok, queries_sentinel={"s1": 2.2, "s2": 1.1})
    g = cb.evaluate_gates(wild, meds)
    assert not g["pass"] and "excursion" in " ".join(g["reasons"])

    # suspect extension: > 1.5x adjusted, sub-0.3s never a suspect
    payload = {
        "queries": {"a": 3.0, "b": 0.2, "c": 1.0, "d": 2.0},
        "value": 1, "value_cold": 1,
    }
    baseline = {"queries": {"a": 1.0, "b": 0.05, "c": 0.9, "d": 1.5}}
    sus = cb.suspect_queries(payload, baseline, 1.0)
    assert sus == ["a"]  # b is sub-0.3s, c/d are under 1.5x
    # machine factor divides out: same ratios at factor 2 -> none
    assert cb.suspect_queries(payload, baseline, 2.0) == []

    # standalone sanity gate (VERDICT r12 #2): a standalone reading
    # > 2x its own in-seq twin is contaminated -> re-measure, ship min
    readings = iter([4.85, 4.6, 1.05])  # r12's actual scd2 series
    val, tries = cb.measure_standalone_sane(
        lambda: next(readings), 1.14
    )
    assert val == 1.05 and tries == [4.85, 4.6, 1.05]
    # retries exhausted while still insane: min still ships (best
    # available controlled number), full series recorded
    readings = iter([5.0, 4.0, 4.5])
    val, tries = cb.measure_standalone_sane(lambda: next(readings), 1.0)
    assert val == 4.0 and tries == [5.0, 4.0, 4.5]
    # sane first reading: single measurement, no retry recorded
    val, tries = cb.measure_standalone_sane(lambda: 1.2, 1.0)
    assert val == 1.2 and tries == []
    # no in-seq twin (query absent from the sequence): no gate
    val, tries = cb.measure_standalone_sane(lambda: 9.9, None)
    assert val == 9.9 and tries == []
    # the r12 watch items are pinned ALWAYS_STANDALONE now
    for n in ("scd2_point_in_time_join", "trim_by_source",
              "domain_cap", "variant_props_stats"):
        assert n in cb.ALWAYS_STANDALONE
