"""Capacity-regulator golden cases ported from the reference's
controller tests (internal/memory/regulator_test.go:30-127)."""

import pytest

from atlassian_sampling_processor_spark.regulator import CapacityRegulator


def test_regulator_modes():
    r = CapacityRegulator(min_size=500, max_size=1000, target_usage=10000)

    # steady zone (0.85-1.0): no adjustment
    assert r.regulate(1000, 9000) == 1000
    # grow mode: +2%
    assert r.regulate(900, 800) == 918
    # moderate pressure: proportional shrink
    assert r.regulate(1000, 11000) == 909
    assert r.regulate(909, 11000) == 826
    # back to steady: hold
    assert r.regulate(826, 9500) == 826
    # high pressure: squared shrink
    assert r.regulate(1000, 12000) == 694
    # emergency: minimum
    assert r.regulate(1000, 14000) == 500
    # recovery: gentle growth from min
    assert r.regulate(500, 5000) == 510
    assert r.regulate(510, 5000) == 520


def test_regulator_clamps():
    r = CapacityRegulator(min_size=500, max_size=1000, target_usage=10000)
    assert r.regulate(990, 5000) == 1000  # 990*1.02=1009 → clamp max
    assert r.regulate(600, 12500) == 500  # 600*0.64=384 → clamp min


@pytest.mark.parametrize(
    "kw",
    [
        dict(min_size=-1, max_size=1, target_usage=1),
        dict(min_size=0, max_size=0, target_usage=1),
        dict(min_size=1, max_size=10, target_usage=0),
        dict(min_size=100, max_size=99, target_usage=1),
    ],
)
def test_regulator_validates(kw):
    with pytest.raises(ValueError):
        CapacityRegulator(**kw)
