"""Kendall tau-b tests: formula parity with the reference implementation
(include/internal/kendall.h:22-179), cross-checked against a direct O(n^2)
transcription of its counting semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from approximated_personalized_pagerank_tpu.ops.kendall import kendall_tau_b


def reference_kendall(x, y):
    """Direct pair-count transcription of kendall.h:165-179 semantics."""
    n = len(x)
    total = n * (n - 1) // 2
    same_x = same_y = same_xy = 0
    discordant = 0
    concordant = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = x[i] - x[j]
            dy = y[i] - y[j]
            if dx == 0:
                same_x += 1
            if dy == 0:
                same_y += 1
            if dx == 0 and dy == 0:
                same_xy += 1
            if dx * dy > 0:
                concordant += 1
            elif dx * dy < 0:
                discordant += 1
    num = concordant - discordant
    den = np.sqrt(float(total - same_x) * float(total - same_y))
    if den == 0.0:
        return 1.0 if same_x == same_y else 0.0
    return num / den


def _tau(x, y):
    return float(
        kendall_tau_b(
            jnp.asarray(x, jnp.float32)[None, :],
            jnp.asarray(y, jnp.float32)[None, :],
        )[0]
    )


def test_perfect_agreement():
    assert _tau([1, 2, 3, 4], [10, 20, 30, 40]) == pytest.approx(1.0)


def test_perfect_disagreement():
    assert _tau([1, 2, 3, 4], [40, 30, 20, 10]) == pytest.approx(-1.0)


def test_all_ties_both():
    # den == 0 and sameX == sameY -> 1.0 (kendall.h:179)
    assert _tau([5, 5, 5], [2, 2, 2]) == pytest.approx(1.0)


def test_ties_one_side_only():
    # den == 0, sameX != sameY -> 0.0
    assert _tau([5, 5, 5], [1, 2, 3]) == pytest.approx(0.0)


def test_single_element_and_empty_width():
    assert _tau([3.0], [7.0]) == pytest.approx(1.0)


def test_random_matches_reference(rng):
    for trial in range(8):
        n = int(rng.integers(2, 30))
        # include ties with some probability
        x = rng.integers(0, 6, size=n).astype(float)
        y = rng.integers(0, 6, size=n).astype(float)
        assert _tau(x, y) == pytest.approx(reference_kendall(x, y), abs=1e-5)


def test_masked_entries_ignored(rng):
    x = np.array([1.0, 2.0, 3.0, 99.0, -5.0])
    y = np.array([1.0, 4.0, 9.0, -1.0, 77.0])
    valid = np.array([True, True, True, False, False])
    got = float(
        kendall_tau_b(
            jnp.asarray(x, jnp.float32)[None],
            jnp.asarray(y, jnp.float32)[None],
            jnp.asarray(valid)[None],
        )[0]
    )
    assert got == pytest.approx(reference_kendall(x[:3], y[:3]), abs=1e-6)


def test_batched(rng):
    xs = rng.normal(size=(6, 12)).astype(np.float32)
    ys = rng.normal(size=(6, 12)).astype(np.float32)
    got = np.asarray(kendall_tau_b(jnp.asarray(xs), jnp.asarray(ys)))
    for r in range(6):
        assert got[r] == pytest.approx(
            reference_kendall(xs[r], ys[r]), abs=1e-5
        )
