"""Source-level hygiene gates (grep-style, no Spark session needed).

The timestamp one exists because the driver's testdata has shipped
both tz-aware (TIMESTAMP) and tz-naive (TIMESTAMP_NTZ) parquet across
rounds, and the two types do not share cast rules — a raw
``unix_timestamp()`` or ``ts.cast("double")`` works on one and
truncates or throws on the other. All epoch conversions must go
through functions/timeutil.epoch_seconds.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).parent.parent / "coinbase_data_pipeline_spark"
ALLOWED = {PKG / "functions" / "timeutil.py"}

# Spark-side patterns that turn a timestamp into seconds; oracle SQL
# strings are exempt (DuckDB's epoch()/CAST rules are NTZ-agnostic),
# recognized by the surrounding triple-quoted SQL blocks all living in
# module-level *SQL* constants — the patterns below only appear in
# Python expression position in this codebase.
BANNED = [
    re.compile(r"F\.unix_timestamp"),
    re.compile(r"\.cast\(['\"]timestamp['\"]\)\.cast\(['\"]double['\"]\)"),
]


def test_epoch_conversions_go_through_timeutil():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        if path in ALLOWED:
            continue
        text = path.read_text()
        for pat in BANNED:
            for m in pat.finditer(text):
                line = text[:m.start()].count("\n") + 1
                offenders.append(f"{path.relative_to(PKG)}:{line} "
                                 f"matches {pat.pattern!r}")
    assert not offenders, (
        "raw timestamp→seconds conversion outside functions/timeutil "
        "(use epoch_seconds — NTZ-safe, fractional):\n"
        + "\n".join(offenders))
