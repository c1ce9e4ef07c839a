"""Failure detection and recovery: error taxonomy + retry machinery.

Rebuilds the reference's best-developed aux subsystem (SURVEY.md §5;
rust/heimdall-gige/src/error.rs:12-245): a typed error hierarchy with
Transient/Permanent/Fatal categories, per-error recovery strategies
(Retry / ResetDevice / ResetConnection / RestartSystem / Custom), a
generic ``with_recovery`` retry wrapper with exponential backoff, and
fault-injection helpers used by the fakes and the test-suite.
"""

import enum
import logging
import random
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

logger = logging.getLogger("heimdall.recovery")


class ErrorCategory(enum.Enum):
    TRANSIENT = "transient"    # retry likely to succeed
    PERMANENT = "permanent"    # needs device/connection reset
    FATAL = "fatal"            # needs operator / system restart


class RecoveryAction(enum.Enum):
    RETRY = "retry"
    RESET_DEVICE = "reset_device"
    RESET_CONNECTION = "reset_connection"
    RESTART_SYSTEM = "restart_system"
    CUSTOM = "custom"


class HeimdallError(Exception):
    """Base error with a category and a default recovery strategy."""

    category = ErrorCategory.TRANSIENT

    def __init__(self, message: str,
                 category: Optional[ErrorCategory] = None):
        super().__init__(message)
        if category is not None:
            self.category = category


class AcquisitionError(HeimdallError):
    category = ErrorCategory.TRANSIENT


class TimeoutError_(HeimdallError):
    category = ErrorCategory.TRANSIENT


class DeviceError(HeimdallError):
    category = ErrorCategory.PERMANENT


class ConnectionError_(HeimdallError):
    category = ErrorCategory.PERMANENT


class ConfigurationError(HeimdallError):
    category = ErrorCategory.FATAL


class DeviceLostError(HeimdallError):
    """TPU device dropped (preemption / reset) — the inspection analog of a
    camera disconnect; recovery re-creates device buffers and recompiles."""
    category = ErrorCategory.PERMANENT


@dataclass
class RecoveryStrategy:
    """Per-error recovery policy (reference error.rs:87-205)."""
    retry_count: int = 3
    delay_s: float = 0.1
    backoff: float = 2.0
    max_delay_s: float = 1.0
    action: RecoveryAction = RecoveryAction.RETRY
    custom_handler: Optional[Callable[[Exception], None]] = None

    @classmethod
    def for_error(cls, exc: Exception) -> "RecoveryStrategy":
        category = getattr(exc, "category", ErrorCategory.TRANSIENT)
        if category == ErrorCategory.TRANSIENT:
            return cls(retry_count=3, delay_s=0.1,
                       action=RecoveryAction.RETRY)
        if category == ErrorCategory.PERMANENT:
            return cls(retry_count=1, delay_s=0.5,
                       action=RecoveryAction.RESET_DEVICE)
        return cls(retry_count=0, action=RecoveryAction.RESTART_SYSTEM)


def with_recovery(fn: Callable[[], Any],
                  strategy: Optional[RecoveryStrategy] = None,
                  on_reset: Optional[Callable[[], None]] = None,
                  name: str = "operation") -> Any:
    """Run ``fn`` with the reference's retry semantics (error.rs:208-245).

    Retries with exponential backoff per the (error-derived) strategy; for
    RESET_* actions calls ``on_reset`` between attempts.  Re-raises the
    last error when recovery is exhausted.
    """
    attempt = 0
    last_exc: Optional[Exception] = None
    while True:
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 - recovery boundary
            last_exc = exc
            strat = strategy or RecoveryStrategy.for_error(exc)
            if attempt >= strat.retry_count:
                logger.error("%s failed after %d attempts: %s",
                             name, attempt + 1, exc)
                raise
            if strat.action in (RecoveryAction.RESET_DEVICE,
                                RecoveryAction.RESET_CONNECTION) \
                    and on_reset is not None:
                logger.warning("%s: %s -> %s", name, exc, strat.action.value)
                on_reset()
            elif strat.action == RecoveryAction.CUSTOM \
                    and strat.custom_handler is not None:
                strat.custom_handler(exc)
            delay = min(strat.delay_s * (strat.backoff ** attempt),
                        strat.max_delay_s)
            logger.info("%s attempt %d failed (%s); retrying in %.2fs",
                        name, attempt + 1, exc, delay)
            time.sleep(delay)
            attempt += 1


@dataclass
class FaultInjector:
    """Deterministic fault injection for tests and fakes (the reference
    injects 1% acquisition failures — gige/camera.rs:619-622)."""
    failure_probability: float = 0.01
    seed: int = 0
    _rng: random.Random = field(default=None, repr=False)

    def __post_init__(self):
        self._rng = random.Random(self.seed)

    def maybe_fail(self, exc_factory=AcquisitionError,
                   message: str = "injected fault") -> None:
        if self._rng.random() < self.failure_probability:
            raise exc_factory(message)
