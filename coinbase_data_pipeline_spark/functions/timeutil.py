"""Timestamp→seconds conversion, NTZ-safe.

The testdata's timestamp physical type has flipped between rounds
(tz-aware ``timestamp[us, tz=UTC]`` → Spark TIMESTAMP, then tz-naive
``timestamp[us]`` → TIMESTAMP_NTZ), and the two types do not share
cast rules: ``TIMESTAMP_NTZ.cast("double")`` is disallowed, and
``unix_timestamp()`` only takes session-zone renderings. Every place
the engine turns a timestamp into epoch seconds MUST go through
:func:`epoch_seconds` (enforced by tests/test_source_hygiene.py) so
the next flip breaks nothing.
"""

from __future__ import annotations

from pyspark.sql import Column


def epoch_seconds(c: Column) -> Column:
    """Fractional epoch seconds (microsecond precision) for BOTH
    TIMESTAMP and TIMESTAMP_NTZ inputs.

    The hop through ``timestamp`` makes the cast legal for NTZ (which
    cannot cast to double directly); with a UTC session timezone —
    which sources.tables.ensure_runtime_conf pins — the hop is
    value-identical for NTZ and a no-op for LTZ. Fractional output
    matters: ``unix_timestamp()`` truncates to whole seconds and
    mis-splits sub-second gap comparisons (the round-3 sessionize
    lesson, operators/sessions.py).
    """
    return c.cast("timestamp").cast("double")


def epoch_micros(c: Column) -> Column:
    """EXACT integer epoch microseconds for BOTH TIMESTAMP and
    TIMESTAMP_NTZ inputs (same NTZ-legalizing hop as
    :func:`epoch_seconds`). Use this when two timestamps are
    SUBTRACTED and the difference must value-hash: fractional-second
    doubles are binary-inexact, so a double difference can disagree
    with DuckDB's exact interval ``epoch_us`` in the last ulp right
    at comparison boundaries; BIGINT µs cannot."""
    from pyspark.sql import functions as F

    return F.unix_micros(c.cast("timestamp"))
