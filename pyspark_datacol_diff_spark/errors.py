"""Typed exceptions for the engine.

The reference library calls ``sys.exit(1)`` on any validation failure
(reference ``find_datacol_diff.py:52-53``). A library that may be driving a
1000-executor job must never kill the caller's interpreter, so every error
path here raises a typed exception instead (SURVEY.md §4.3 item 5).
"""

from __future__ import annotations


class DataColDiffError(Exception):
    """Base class for all engine errors."""


class SchemaMismatchError(DataColDiffError):
    """The two inputs do not share the same column-name set.

    Unlike the reference (which only checks ``s1 - s2``, a latent bug —
    reference ``find_datacol_diff.py:34``), this reports BOTH directions.
    """

    def __init__(
        self,
        only_in_s1: set[str],
        only_in_s2: set[str],
        type_mismatches: dict | None = None,
    ):
        self.only_in_s1 = only_in_s1
        self.only_in_s2 = only_in_s2
        self.type_mismatches = type_mismatches or {}
        parts = [
            f"columns only in s1={sorted(only_in_s1)}",
            f"only in s2={sorted(only_in_s2)}",
        ]
        if self.type_mismatches:
            parts.append(
                "dtype divergence="
                + ", ".join(
                    f"{c}(s1={a.simpleString()} s2={b.simpleString()})"
                    for c, (a, b) in sorted(self.type_mismatches.items())
                )
            )
        super().__init__("schema mismatch: " + ", ".join(parts))


class PrimaryKeyError(DataColDiffError):
    """A primary-key column is missing from one of the inputs."""


class InvalidArgumentError(DataColDiffError):
    """A bad argument (empty pk list, unknown column in include/exclude...)."""
