"""Exception hierarchy (API-familiarity parity with ``jwave/exceptions/``).

The reference defines JWaveException ← JWaveFailure/JWaveError ←
NotAllocated/NotFound/NotImplemented/NotKnown/NotValid
(``exceptions/*.java:32-33``; its base bizarrely extends ``Throwable``).
Here they are ordinary ``Exception`` subclasses that the library raises from
validation paths — all also subclass ``ValueError`` so generic callers can
catch idiomatically.
"""
from __future__ import annotations

__all__ = [
    "JWaveException", "JWaveFailure", "JWaveError", "NotAllocated",
    "NotFound", "NotImplemented_", "NotKnown", "NotValid",
]


class JWaveException(ValueError):
    """Base for all library errors (exceptions/JWaveException.java)."""


class JWaveFailure(JWaveException):
    """Recoverable failure (exceptions/JWaveFailure.java)."""


class JWaveError(JWaveException):
    """Serious error (exceptions/JWaveError.java)."""


class NotAllocated(JWaveError):
    pass


class NotFound(JWaveFailure):
    pass


class NotImplemented_(JWaveFailure):
    """NotImplemented is a Python builtin constant, hence the underscore."""


class NotKnown(JWaveFailure):
    pass


class NotValid(JWaveFailure):
    pass
