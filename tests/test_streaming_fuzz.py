"""Streaming micro-batch BOUNDARY fuzz (VERDICT r08 #3).

tools/fuzz_parity.py permutes the DATA under fixed 2/4-slice replay
layouts; this axis permutes the LAYOUT under fixed data: seeded random
slice counts and non-uniform cut points (catalog_stream.REPLAY_CUTS),
re-asserting the same contracts the fixed layouts pin —

- sessionize: streamed closed sessions == batch sessionization minus
  open tails, and every planted boundary straddler folds across its
  two adjacent micro-batches into ONE session;
- kmv: the streamed per-day sketch is invariant to the split (k-min
  merge associativity on arbitrary boundaries);
- model_score: ring-state scoring is invariant to the split (every
  23-candle lookback spanning a boundary reads carried state).

The r08 cross-chunk sort bug in streaming_model_score
(streaming/pipelines.py) is exactly the class a boundary permutation
catches mechanically: it needed a window's rows split in a shape the
fixed layouts happened not to produce.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

# honors the parity suite's data-dir override so the two fuzz axes
# COMPOSE: fuzzed DATA (tools/fuzz_parity.py output) × permuted
# BOUNDARIES in one run
SF = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR",
                    "/root/testdata/sf0.001")
# non-vacuity (result must be non-empty / large) is a property of the
# REAL testdata; on fuzzed dirs (e.g. the sparse seed, where
# model_score is legitimately agreed-empty) only the INVARIANCE
# contracts apply
DEFAULT_DIR = SF == "/root/testdata/sf0.001"

# (seed, n_slices) chosen so the axis covers 3/5/6-way splits the
# fixed layouts never run; cut points are seeded per case below
CASES = [(11, 3), (12, 4), (13, 5), (14, 6)]


def _seeded_cuts(seed: int, n: int) -> list[float]:
    """n-1 sorted span fractions in [0.08, 0.92] with pairwise gap
    > 0.03 of the span — wide enough that the ±5-minute straddler
    events around one boundary can never leak across a neighboring
    boundary (the sf0.001 stream spans a month, so 0.03 ≈ 21 h)."""
    rng = np.random.default_rng(seed)
    while True:
        cuts = np.sort(rng.uniform(0.08, 0.92, size=n - 1))
        if n == 2 or np.all(np.diff(cuts) > 0.03):
            return [float(c) for c in cuts]


@pytest.fixture
def replay_layout(monkeypatch):
    """Apply a (n, cuts) layout through the module globals the catalog
    queries read; the replay-dir cache keys on both, so permuted
    layouts never collide with the uniform ones."""
    from coinbase_data_pipeline_spark.plans import catalog_stream as CS

    def apply(n, cuts):
        monkeypatch.setattr(CS, "REPLAY_BUCKETS", n)
        monkeypatch.setattr(CS, "REPLAY_CUTS", cuts)
        return CS

    return apply


@pytest.mark.parametrize("seed,n", CASES)
def test_sessionize_straddlers_any_boundary(spark, replay_layout,
                                            seed, n):
    from coinbase_data_pipeline_spark.operators.sessions import sessionize
    from coinbase_data_pipeline_spark.plans import catalog_stream as CS

    cuts = _seeded_cuts(seed, n)
    replay_layout(n, cuts)
    raw = CS._run_sessionize_replay(spark, SF).collect()

    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in raw if r.user_id != CS.STRADDLER_UID}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    batch = sessionize(ev, user="user_id", ts="ts",
                       gap_minutes=30).collect()
    last = {}
    for r in batch:
        cur = last.get(r.user_id)
        if cur is None or r.session_start > cur.session_start:
            last[r.user_id] = r
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch if r is not last[r.user_id]}
    assert streamed == expected
    assert streamed or not DEFAULT_DIR

    # one closed 2-event 600-second straddler session per interior
    # boundary, wherever the seeded cut landed
    strad = sorted((r.session_start, r.session_end, r.n_events)
                   for r in raw if r.user_id == CS.STRADDLER_UID)
    assert len(strad) == n - 1
    for start, end, n_events in strad:
        assert n_events == 2
        assert abs((end - start).total_seconds() - 600.0) < 1.0


@pytest.mark.parametrize("seed,n", CASES[:2])
def test_kmv_split_invariant_any_boundary(spark, replay_layout,
                                          seed, n):
    from coinbase_data_pipeline_spark.plans import catalog_stream as CS

    baseline = {tuple(r) for r in
                CS.q_streaming_kmv(spark, SF).collect()}
    replay_layout(n, _seeded_cuts(seed, n))
    fuzzed = {tuple(r) for r in
              CS.q_streaming_kmv(spark, SF).collect()}
    assert fuzzed == baseline
    assert fuzzed or not DEFAULT_DIR


@pytest.mark.parametrize("seed,n", CASES[2:])
def test_model_score_split_invariant_any_boundary(spark, replay_layout,
                                                  seed, n):
    from coinbase_data_pipeline_spark.plans import catalog_stream as CS

    baseline = {tuple(r) for r in
                CS.q_streaming_model_score(spark, SF).collect()}
    replay_layout(n, _seeded_cuts(seed, n))
    fuzzed = {tuple(r) for r in
              CS.q_streaming_model_score(spark, SF).collect()}
    assert fuzzed == baseline
    assert len(fuzzed) > 1000 or not DEFAULT_DIR


@pytest.mark.parametrize("seed,n", [(21, 4), (22, 5)])
def test_sessionize_watermark_complete_any_boundary(spark,
                                                    replay_layout,
                                                    seed, n):
    """The watermarked path's stronger contract — event-time timeouts
    flush EVERY tail, so the streamed result equals the COMPLETE batch
    sessionization — must hold on permuted boundaries too: timeout
    firing order interacts with which micro-batch advances the
    watermark past each session's end + gap."""
    from coinbase_data_pipeline_spark.operators.sessions import sessionize
    from coinbase_data_pipeline_spark.plans import catalog_stream as CS

    replay_layout(n, _seeded_cuts(seed, n))
    raw = CS._run_sessionize_replay(spark, SF,
                                    watermark="1 minute").collect()
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in raw if r.user_id not in (-1, CS.STRADDLER_UID)}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(ev, user="user_id", ts="ts",
                            gap_minutes=30).collect()}
    assert streamed == expected
    assert streamed or not DEFAULT_DIR


def test_time_buckets_rejects_bad_cuts(spark):
    """_time_buckets must fail loudly on malformed cut lists (ADVICE
    r09): wrong arity, out-of-range, or non-increasing — each of
    which would otherwise silently break the straddler/watermark
    contracts."""
    from datetime import datetime

    import pytest as _pytest

    from coinbase_data_pipeline_spark.plans import catalog_stream as CS

    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1)), (2, datetime(2024, 1, 2))],
        "user_id long, ts timestamp")
    with _pytest.raises(ValueError, match="n-1"):
        CS._time_buckets(ev, "ts", 4, cuts=[0.5])
    with _pytest.raises(ValueError, match="inside"):
        CS._time_buckets(ev, "ts", 3, cuts=[0.0, 0.5])
    with _pytest.raises(ValueError, match="inside"):
        CS._time_buckets(ev, "ts", 3, cuts=[0.5, 1.0])
    with _pytest.raises(ValueError, match="increasing"):
        CS._time_buckets(ev, "ts", 3, cuts=[0.6, 0.4])
    with _pytest.raises(ValueError, match="increasing"):
        CS._time_buckets(ev, "ts", 3, cuts=[0.5, 0.5])
