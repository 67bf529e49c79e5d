"""Retry + rate limiting for external-call UDF stages.

Reference: ``retryable`` util for flaky externals
(src/utils/retryable.rs) and the app's Celery retry policy — max 3
retries, exponential backoff 5s→600s with jitter
(app/tasks/document_tasks.py:141-146); concurrency control caps
in-flight work (src/utils/concur_control.rs, spec.rs:247-262).

Spark placement: these wrap the *body* of a pandas UDF (per-executor,
per-batch) — Spark retries whole tasks on failure, but an LLM/
embedding API call wants fine-grained retry without recomputing the
batch, and a per-executor semaphore caps concurrent API calls
regardless of task parallelism.
"""

from __future__ import annotations

import random
import threading
import time
from typing import Callable, TypeVar

T = TypeVar("T")

MAX_RETRIES = 3  # document_tasks.py:141
BASE_DELAY_S = 5.0  # :143
MAX_DELAY_S = 600.0  # :144


def with_retry(
    fn: Callable[[], T],
    max_retries: int = MAX_RETRIES,
    base_delay_s: float = BASE_DELAY_S,
    max_delay_s: float = MAX_DELAY_S,
    retryable: tuple[type[Exception], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
) -> T:
    """Call ``fn`` with exponential backoff + full jitter.

    delay_n = min(max_delay, base · 2ⁿ) · uniform(0, 1) — the app's
    policy shape. Non-retryable exceptions propagate immediately."""
    rng = rng or random.Random()
    attempt = 0
    while True:
        try:
            return fn()
        except retryable:
            if attempt >= max_retries:
                raise
            delay = min(max_delay_s, base_delay_s * (2**attempt)) * rng.random()
            sleep(delay)
            attempt += 1


_limiters: dict[int, "RateLimiter"] = {}
_limiters_lock = threading.Lock()


def executor_rate_limiter(max_concurrent: int) -> "RateLimiter":
    """Process-local limiter registry: call INSIDE the UDF body so
    each executor Python worker builds its own semaphore (a
    driver-created one would be captured in the closure and
    semaphores don't pickle)."""
    with _limiters_lock:
        if max_concurrent not in _limiters:
            _limiters[max_concurrent] = RateLimiter(max_concurrent)
        return _limiters[max_concurrent]


class RateLimiter:
    """Per-executor concurrency cap for external calls (the
    max_inflight backpressure, spec.rs:247-262). Use as a module-
    level singleton inside the UDF body: Spark may run many tasks
    per executor; this bounds simultaneous API calls across them."""

    def __init__(self, max_concurrent: int):
        self._sem = threading.Semaphore(max_concurrent)

    def __enter__(self):
        self._sem.acquire()
        return self

    def __exit__(self, *exc):
        self._sem.release()
        return False
