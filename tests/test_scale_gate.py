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
