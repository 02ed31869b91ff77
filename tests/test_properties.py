"""Property-based tests (hypothesis): operator invariants on random
inputs — ties, duplicates, gaps, and single-row series that
hand-written fixtures miss.

Strategy data is drawn once per example and pushed through Spark; the
properties are checked against straightforward Python models.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

SETTINGS = dict(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

# (key, ts, price) rows; ts ints — duplicates and disorder allowed
ROWS = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.integers(min_value=0, max_value=50),
              st.integers(min_value=1, max_value=9999)),
    min_size=1, max_size=60)


@given(rows=ROWS)
@settings(**SETTINGS)
def test_asof_join_matches_model(spark, rows):
    """asof_join == per-row model: latest right value at-or-before."""
    from coinbase_data_pipeline_spark.operators.asof import asof_join

    left_rows = [(k, t) for k, t, _ in rows]
    right_rows = sorted({(k, t): v for k, t, v in rows}.items())
    right_rows = [(k, t, float(v)) for (k, t), v in right_rows]

    left = spark.createDataFrame(left_rows, "key string, t long")
    right = spark.createDataFrame(right_rows,
                                  "key string, t long, val double")
    out = asof_join(left, right, key="key", left_ts="t", right_ts="t",
                    right_vals=["val"]).collect()

    def model(k, t):
        cands = [(rt, v) for rk, rt, v in right_rows
                 if rk == k and rt <= t]
        return max(cands)[1] if cands else None

    for r in out:
        assert r.val_asof == model(r.key, r.t), (r.key, r.t)


@given(rows=ROWS)
@settings(**SETTINGS)
def test_salted_candles_equal_unsalted(spark, rows):
    """The salt must be invisible: salted and unsalted candle builds
    agree on every bucket (incl. n_ticks and OHLC) even with duplicate
    timestamps, because equal timestamps land in the same salt group."""
    from coinbase_data_pipeline_spark.operators.candles import (
        candle_resample, candle_resample_salted)
    import datetime

    data = [(k, datetime.datetime(2024, 1, 1) +
             datetime.timedelta(minutes=t), float(p))
            for k, t, p in rows]
    df = spark.createDataFrame(data,
                               "product_id string, time timestamp, "
                               "price double")
    plain = candle_resample(df)
    salted = candle_resample_salted(df)

    def norm(rows_):
        return sorted(
            (r.product_id, r.bucket_start, r.high, r.low, r.n_ticks)
            for r in rows_)

    assert norm(plain.collect()) == norm(salted.collect())
    # open/close may differ only when duplicate timestamps tie within
    # a bucket (both picks are valid min_by/max_by results)
    p_oc = {(r.product_id, r.bucket_start): (r.open, r.close)
            for r in plain.collect()}
    s_oc = {(r.product_id, r.bucket_start): (r.open, r.close)
            for r in salted.collect()}
    ts_counts: dict = {}
    for k, t, _ in rows:
        ts_counts[(k, t)] = ts_counts.get((k, t), 0) + 1
    has_dup_ts = {g for g in p_oc
                  if any(v > 1 for (k, _), v in ts_counts.items()
                         if k == g[0])}
    for g in p_oc:
        if g not in has_dup_ts:
            assert p_oc[g] == s_oc[g]


@given(rows=ROWS)
@settings(**SETTINGS)
def test_sessionize_partitions_events(spark, rows):
    """Sessions partition the events: counts sum to the total, session
    bounds are consistent, and consecutive sessions of a user are
    separated by more than the gap."""
    from coinbase_data_pipeline_spark.operators.sessions import sessionize
    import datetime

    data = [(hash(k) % 3, datetime.datetime(2024, 1, 1)
             + datetime.timedelta(minutes=37 * t))
            for k, t, _ in rows]
    df = spark.createDataFrame(data, "user_id long, ts timestamp")
    out = sessionize(df, gap_minutes=60).collect()
    assert sum(r.n_events for r in out) == len(data)
    by_user: dict = {}
    for r in out:
        assert r.session_start <= r.session_end
        by_user.setdefault(r.user_id, []).append(r)
    for sessions in by_user.values():
        sessions.sort(key=lambda r: r.session_start)
        for a, b in zip(sessions, sessions[1:]):
            gap = (b.session_start - a.session_end).total_seconds()
            assert gap > 3600


@given(vals=st.lists(st.floats(min_value=1.0, max_value=1e6,
                               allow_nan=False), min_size=1,
                     max_size=40))
@settings(**SETTINGS)
def test_minmax_scale_bounds(spark, vals):
    """Min-max scaled output is inside the feature range and hits both
    endpoints when the input isn't constant."""
    from coinbase_data_pipeline_spark.operators.indicators import (
        minmax_scale)

    df = spark.createDataFrame([("k", float(v)) for v in vals],
                               "key string, x double")
    out = [r.x_scaled for r in
           minmax_scale(df, ["x"], key="key",
                        feature_range=(-1.0, 1.0)).collect()]
    assert all(-1.0 - 1e-9 <= v <= 1.0 + 1e-9 for v in out)
    if max(vals) > min(vals):
        assert math.isclose(min(out), -1.0) and math.isclose(max(out), 1.0)


@given(rows=ROWS, split=st.integers(min_value=0, max_value=99))
@settings(**SETTINGS)
def test_candle_upsert_equals_batch_for_any_split(spark, rows, split):
    """Incremental maintenance == full recompute for EVERY way of
    splitting the tick stream into an on-time batch and a late batch
    (including empty batches on either side). Ties on ts are excluded
    — open/close are defined by distinct timestamps, matching the
    engines' arg_min/arg_max contract."""
    from pyspark.sql import functions as F
    from coinbase_data_pipeline_spark.operators.candles import (
        candle_resample, candle_state, candle_upsert)

    # one tick per (key, ts): drop ts duplicates within a key
    dedup = {(k, t): p for k, t, p in rows}
    data = [(k, t, float(p), i) for i, ((k, t), p)
            in enumerate(sorted(dedup.items()))]
    df = spark.createDataFrame(
        data, "product_id string, t long, price double, rid long") \
        .withColumn("time", F.timestamp_seconds(F.col("t") * 60))
    on_time = df.filter(F.col("rid") % 100 >= split)
    late = df.filter(F.col("rid") % 100 < split)

    state = candle_state(on_time)
    merged = candle_upsert(state, late)
    full = candle_state(df)

    def keyset(d):
        return {tuple(r) for r in d.collect()}

    assert keyset(merged) == keyset(full)


@given(y=st.lists(st.floats(min_value=1.0, max_value=1e5,
                            allow_nan=False, allow_infinity=False),
                  min_size=3, max_size=40))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_holt_sweep_lanes_match_scalar_python(spark, y):
    """The oracle doctrine's load-bearing claim for holt_param_sweep:
    vectorizing the level/trend recursion ACROSS grid lanes changes
    nothing per lane — every (alpha, beta) lane's fixed-point error
    sum must equal a scalar pure-Python replay of the recursion, for
    arbitrary float series."""
    import math

    from coinbase_data_pipeline_spark.operators.forecast import (
        HOLT_SWEEP_GRID, holt_grid_sweep)

    df = spark.createDataFrame(
        [("K", float(t), float(v)) for t, v in enumerate(y)],
        "product_id string, bucket_start double, close double")
    got = {(r.alpha, r.beta): r for r in holt_grid_sweep(df).collect()}

    for alpha, beta in HOLT_SWEEP_GRID:
        lvl, tr, s = y[0], 0.0, 0
        for t in range(1, len(y)):
            pred = lvl + tr
            s += int(math.floor(abs(y[t] - pred) * 1e6 + 0.5))
            prev = lvl
            lvl = alpha * y[t] + (1.0 - alpha) * pred
            tr = beta * (lvl - prev) + (1.0 - beta) * tr
        r = got[(alpha, beta)]
        assert r.n_eval == len(y) - 1
        # mae is the integer-rounded s/(n*1e6); replay the same
        # integer arithmetic
        n = len(y) - 1
        assert r.mae == ((2 * s + n) // (2 * n)) / 1e6


@given(center=st.floats(min_value=-1e4, max_value=1e4,
                        allow_nan=False),
       spread=st.one_of(st.just(0.0),
                        st.floats(min_value=1e-6, max_value=1e3,
                                  allow_nan=False)),
       x=st.floats(min_value=-1e4, max_value=1e4, allow_nan=False))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_denormalize_round_trip_identity(spark, center, spread, x):
    """Forward robust scale then denormalize_predictions is the exact
    identity for ANY stats — including the degenerate iqr == 0 branch
    — up to one float multiply/divide round-trip."""
    from coinbase_data_pipeline_spark.operators import predictions as P

    q1, q3 = center - spread, center + spread
    stats = spark.createDataFrame(
        [("A", center, q1, q3)],
        "product_id string, c_med double, c_q1 double, c_q3 double")
    iqr = q3 - q1
    scaled = (x - center) / iqr if iqr != 0 else x - center
    preds = spark.createDataFrame(
        [("A", x, scaled)],
        "product_id string, last_close double, pred_scaled double")
    out = P.denormalize_predictions(preds, stats).collect()[0]
    tol = max(abs(x), 1.0) * 1e-12 + 1e-9
    assert abs(out.predicted_price - x) <= tol


@given(vals=st.lists(st.floats(min_value=1.0, max_value=1e4,
                               allow_nan=False),
                     min_size=8, max_size=60))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_holt_cv_sweep_matches_numpy_reference(spark, vals):
    """The fold-scored sweep's integer error sums must equal a plain
    NumPy re-implementation of the SAME contract (train-span fold,
    test-span-only scoring, fixed-point accumulation) for arbitrary
    series — the property the planted regime-change test can't cover."""
    import numpy as np

    from coinbase_data_pipeline_spark.operators import forecast as FC

    df = spark.createDataFrame(
        [("P", float(i), float(v)) for i, v in enumerate(vals)],
        "product_id string, bucket_start double, close double")
    got = {(r["alpha"], r["beta"]): (r["n_eval"],
                                     round(r["mae"] * 1e6))
           for r in FC.holt_cv_sweep(df).collect()}

    y = np.array(vals, dtype=np.float64)
    n = len(y)
    want = {}
    for a, b in FC.HOLT_SWEEP_GRID:
        s, ne = 0, 0
        for _, frac in FC.HOLT_CV_FOLDS:
            n_train = int(np.floor(n * frac))
            n_end = min(int(np.floor(n * (frac + 0.1))), n)
            if n < 2 or n_end <= max(n_train, 1):
                continue
            lvl, tr = y[0], 0.0
            for t in range(1, n_end):
                pred = lvl + tr
                if t >= n_train:
                    s += int(np.floor(abs(y[t] - pred) * 1e6 + 0.5))
                prev = lvl
                lvl = a * y[t] + (1.0 - a) * pred
                tr = b * (lvl - prev) + (1.0 - b) * tr
            ne += n_end - max(n_train, 1)
        if ne > 0:
            want[(a, b)] = (ne, (2 * s + ne) // (2 * ne))
    assert got == want


@given(mins=st.lists(
    st.tuples(st.sampled_from(["A", "B"]), st.sampled_from(["m1", "m2"]),
              st.integers(min_value=0, max_value=2000)),
    min_size=1, max_size=60))
@settings(**SETTINGS)
def test_prediction_cadence_matches_model(spark, mins):
    """prediction_cadence == per-group Python model: the interval
    categories partition the lag gaps exactly (on_schedule + forced +
    delayed == n_intervals == n_predictions − 1 after dedup), min/max
    gaps agree, cadence_ok == (no gap > interval), vacuously true for
    singleton groups."""
    from collections import defaultdict
    from datetime import datetime, timedelta

    from coinbase_data_pipeline_spark.operators.predictions import (
        prediction_cadence)

    t0 = datetime(2024, 1, 1)
    rows = [(k, m, t0 + timedelta(minutes=v)) for k, m, v in mins]
    preds = spark.createDataFrame(
        rows, "product_id string, model_version string, "
              "origin_time timestamp")
    out = {(r["product_id"], r["model_name"]): r
           for r in prediction_cadence(preds, interval_minutes=5)
           .collect()}

    groups = defaultdict(set)
    for k, m, v in mins:
        groups[(k, m)].add(v)
    assert set(out) == set(groups)
    for g, vals in groups.items():
        sv = sorted(vals)
        gaps = [b - a for a, b in zip(sv, sv[1:])]
        r = out[g]
        assert r["n_predictions"] == len(sv)
        assert r["n_intervals"] == len(gaps)
        assert (r["on_schedule_intervals"] + r["forced_predictions"]
                + r["delayed_intervals"]) == len(gaps)
        assert r["on_schedule_intervals"] == sum(g2 == 5 for g2 in gaps)
        assert r["forced_predictions"] == sum(g2 < 5 for g2 in gaps)
        assert r["delayed_intervals"] == sum(g2 > 5 for g2 in gaps)
        if gaps:
            assert r["min_gap_minutes"] == min(gaps)
            assert r["max_gap_minutes"] == max(gaps)
            assert r["cadence_ok"] == (max(gaps) <= 5)
        else:
            assert r["min_gap_minutes"] is None
            assert r["max_gap_minutes"] is None
            assert r["cadence_ok"]
