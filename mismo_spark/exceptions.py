"""Exception / warning hierarchy (mismo/exceptions.py:13-43).

The reference exposes a small typed error surface so callers can catch
engine-level problems without string matching.  ``SlowJoinError`` /
``SlowJoinWarning`` carry the offending physical-plan algorithm name —
on Spark the slow algorithms are ``CartesianProduct`` and
``BroadcastNestedLoopJoin`` (the Catalyst fallbacks for non-equi
conditions), detected by plan inspection in
:func:`mismo_spark.linker.join.check_join_plan`.
"""

from __future__ import annotations


class MismoError(Exception):
    """Base class for all engine errors (mismo/exceptions.py:13-14)."""


class MismoWarning(Warning):
    """Base class for all engine warnings (mismo/exceptions.py:17-18)."""


class UnsupportedBackendError(ValueError, MismoError):
    """An operation is not supported on this engine
    (mismo/exceptions.py:21-22)."""


class _SlowJoinMixin:
    """Carries the plan algorithm that made the join slow
    (mismo/exceptions.py:25-35)."""

    def __init__(self, msg: str, *, algorithm: str | None = None) -> None:
        self.algorithm = algorithm
        """Physical join algorithm Catalyst chose, e.g. 'CartesianProduct'."""
        super().__init__(msg)


class SlowJoinWarning(_SlowJoinMixin, UserWarning, MismoWarning):
    """The join would run as a nested-loop / cartesian product
    (mismo/exceptions.py:38-39)."""


class SlowJoinError(_SlowJoinMixin, ValueError, MismoError):
    """Same condition as :class:`SlowJoinWarning`, raised when
    ``on_slow='error'`` (mismo/exceptions.py:42-43)."""
