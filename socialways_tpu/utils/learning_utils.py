"""Learning-rate schedules (reference utils/learning_utils.py:13-27).

The reference's ``adjust_learning_rate`` mutates optimizer state with
lr = base · decay^(epoch // interval); here the same schedule is a pure
function, usable directly or via optax."""

from __future__ import annotations


def step_decay_lr(base_lr: float = 0.005, decay: float = 0.6,
                  interval: int = 50):
    """Returns epoch → lr with step decay every ``interval`` epochs."""

    def schedule(epoch: int) -> float:
        return base_lr * decay ** (epoch // interval)

    return schedule


def make_step_decay_optax(base_lr: float, decay: float = 0.6,
                          interval_steps: int = 50):
    """Same schedule as an optax-compatible step-indexed callable."""
    def schedule(count):
        return base_lr * decay ** (count // interval_steps)
    return schedule
