"""Failure-resilient training: checkpoint-backed auto-restart.

The reference's failure story is "treat crashes as transient and re-run the
cell" (`03_model_training.py:910-912`; SURVEY §5 'failure detection: none').
Here the same run-to-completion contract is automated: `resilient_fit` runs a
training callable, and on a transient failure restores the latest checkpoint
(model + optimizer + loader position) and continues, up to `max_restarts`.

The training callable owns what "one attempt" means (typically
`train_val_test` with a checkpoint_fn); `resilient_fit` owns the
restore-and-retry policy. Failures during restore are fatal (state may be
corrupt); failures with no checkpoint yet restart from scratch.
"""

from __future__ import annotations

import logging
import time
from typing import Callable

log = logging.getLogger(__name__)


class TrainingFailure(RuntimeError):
    """Raised by resilient_fit when max_restarts is exhausted."""


def resilient_fit(
    attempt: Callable[[int], dict],
    max_restarts: int = 3,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    backoff_s: float = 1.0,
) -> dict:
    """Run `attempt(restart_index)` until it returns; restart on failure.

    `attempt` must be resumable: it should restore from its own checkpoint
    store when one exists (see `scripts/train.py --resume` for the pattern).
    Returns the attempt's result dict, augmented with restart accounting.
    """
    failures: list[str] = []
    for restart in range(max_restarts + 1):
        try:
            result = dict(attempt(restart))
            result["restarts"] = restart
            result["failures"] = failures
            return result
        except retry_on as e:  # noqa: PERF203
            failures.append(f"{type(e).__name__}: {e}")
            log.warning("training attempt %d failed (%s); restarting", restart, e)
            if restart == max_restarts:
                raise TrainingFailure(
                    f"training failed after {max_restarts} restarts: {failures}"
                ) from e
            time.sleep(backoff_s * (restart + 1))
    raise AssertionError("unreachable")
