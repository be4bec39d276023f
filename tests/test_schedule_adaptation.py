import numpy as np
import pytest

from pigeons_tpu.adaptation import (
    MonotoneCubic,
    communication_barriers,
    optimal_schedule,
    rejections_from_acceptance,
)
from pigeons_tpu.schedule import Schedule, equally_spaced_schedule


def test_equally_spaced():
    s = equally_spaced_schedule(5)
    assert np.allclose(s.grids, [0.0, 0.25, 0.5, 0.75, 1.0])
    assert s.n_chains == 5
    assert equally_spaced_schedule(1).grids.tolist() == [1.0]


def test_schedule_validation():
    with pytest.raises(ValueError):
        Schedule([0.0, 0.5, 0.4, 1.0])
    with pytest.raises(ValueError):
        Schedule([0.1, 0.5, 1.0])
    with pytest.raises(ValueError):
        Schedule([0.0, 0.5, 0.5, 1.0])


def test_monotone_cubic_interpolates_and_is_monotone():
    x = np.array([0.0, 0.1, 0.5, 0.9, 1.0])
    y = np.array([0.0, 0.3, 0.35, 0.9, 1.0])
    f = MonotoneCubic(x, y)
    assert np.allclose(f(x), y, atol=1e-12)
    q = np.linspace(0, 1, 1001)
    vals = f(q)
    assert np.all(np.diff(vals) >= -1e-12)
    # derivative is the actual derivative (finite-difference check)
    h = 1e-6
    mid = np.linspace(0.01, 0.99, 37)
    fd = (f(mid + h) - f(mid - h)) / (2 * h)
    assert np.allclose(f.derivative(mid), fd, atol=1e-4)


def test_communication_barriers_basic():
    rej = np.array([0.2, 0.4, 0.1])
    grids = np.array([0.0, 0.3, 0.6, 1.0])
    b = communication_barriers(rej, grids)
    assert b.global_barrier == pytest.approx(0.7)
    assert b.cumulative_barrier(0.0) == pytest.approx(0.0)
    assert b.cumulative_barrier(1.0) == pytest.approx(0.7)
    assert b.cumulative_barrier(0.6) == pytest.approx(0.6)
    # local barrier integrates to the cumulative barrier (roughly)
    q = np.linspace(0, 1, 2001)
    integral = np.trapezoid(b.local_barrier(q), q)
    assert integral == pytest.approx(0.7, abs=1e-3)


def test_optimal_schedule_equalizes_rejections():
    # if rejection intensity is concentrated near beta=1, the new grid should
    # concentrate points there
    rej = np.array([0.01, 0.01, 0.5, 2.0])
    grids = np.linspace(0, 1, 5)
    new = optimal_schedule(rej, grids)
    assert new.grids[0] == 0.0 and new.grids[-1] == 1.0
    assert np.all(np.diff(new.grids) > 0)
    # most of the intensity sits in the last old segment -> more than half the
    # new interior points should land in (0.75, 1)
    assert np.sum(new.grids[1:-1] > 0.75) >= 2


def test_optimal_schedule_zero_intensity_nudge():
    rej = np.zeros(4)
    grids = np.linspace(0, 1, 5)
    new = optimal_schedule(rej, grids)
    assert np.allclose(new.grids, grids, atol=1e-3)


def test_optimal_schedule_resize():
    rej = np.full(4, 0.25)
    grids = np.linspace(0, 1, 5)
    new = optimal_schedule(rej, grids, n_chains_new=9)
    assert new.n_chains == 9
    assert np.allclose(new.grids, np.linspace(0, 1, 9), atol=1e-6)


def test_rejections_default_half():
    r = rejections_from_acceptance(np.array([0.9, 0.0]), np.array([10.0, 0.0]))
    assert r[0] == pytest.approx(0.1)
    assert r[1] == pytest.approx(0.5)
