"""Learning-rate schedules.

The reference passes a bare callable ``global_step -> lr`` re-evaluated every
step (`training/training.py:563-597`); any Python callable still works here.
These helpers provide the common shapes as named constructors."""

from __future__ import annotations

from typing import Callable, Sequence

Schedule = Callable[[int], float]


def constant_schedule(learning_rate: float) -> Schedule:
    return lambda step: learning_rate


def piecewise_constant_schedule(
    boundaries: Sequence[int], values: Sequence[float]
) -> Schedule:
    """values[i] for step < boundaries[i]; values[-1] afterwards."""
    if len(values) != len(boundaries) + 1:
        raise ValueError("need len(values) == len(boundaries) + 1")

    def schedule(step: int) -> float:
        for boundary, value in zip(boundaries, values):
            if step < boundary:
                return value
        return values[-1]

    return schedule


def exponential_decay_schedule(
    initial: float, decay_rate: float, decay_steps: int, staircase: bool = False
) -> Schedule:
    def schedule(step: int) -> float:
        exponent = step / decay_steps
        if staircase:
            exponent = int(exponent)
        return initial * (decay_rate ** exponent)

    return schedule
