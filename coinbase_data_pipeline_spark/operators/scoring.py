"""Model batch scoring over sliding windows.

Reference parity: the prediction service's core loop loads a trained
model, feeds it the latest seq_len feature window per product, and
writes one row per forecast horizon (prediction_service/src/
predictor.py predict() + data_writer.py write shape;
prediction_service.py wires fetch → window → model → write). The
engine expresses that loop as a DISTRIBUTED batch scorer: any
Python model callable applied to the sliding_windows table via
mapInPandas — Arrow-batched, never a row-at-a-time UDF, never a
driver-side collect.

The default model is a DETERMINISTIC STUB (same policy as
operators/multimodal.py): a linear autoregressive head with
exponential-decay lag weights, pure NumPy, so the plumbing — window
decode, batch shapes, per-horizon explode, output schema — is real
and tested while the torch checkpoint seam stays env-gated behind
:func:`real_model`. The stub accumulates its weighted sum as a
STRICT LEFT FOLD over lag positions (scalar×column multiply-adds in
order) rather than np.dot — pairwise/SIMD matmul summation is not
reproducible in SQL, a sequential fold is, which is what lets the
catalog entry carry a full value-hash oracle (the SQL twin inlines
the same repr'd weight constants and sums in the same order).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                               StructField, StructType)

PRICE_SCALE = 1e6  # sliding_windows encodes prices as round(price*1e6)

# the deterministic stub model's version tag — shared by every query
# that labels rows of the predictions store
MODEL_VERSION = "stub-linear-1"


def stub_weights(seq_len: int, pred_len: int,
                 decay: float = 0.9) -> np.ndarray:
    """(pred_len, seq_len) stub-head weights: exponential-decay lag
    weights flattened toward the window mean as the horizon grows
    (far horizons are less momentum-driven). No RNG anywhere — every
    executor builds bit-identical weights, and the oracle-SQL
    generator inlines these exact doubles via repr."""
    lag_w = decay ** np.arange(seq_len - 1, -1, -1, dtype=np.float64)
    lag_w /= lag_w.sum()
    mean_w = np.full(seq_len, 1.0 / seq_len)
    rows = []
    for h in range(1, pred_len + 1):
        alpha = h / (pred_len + 1.0)
        rows.append((1.0 - alpha) * lag_w + alpha * mean_w)
    return np.stack(rows)


def stub_linear_model(seq_len: int, pred_len: int, *,
                      decay: float = 0.9) -> Callable[[np.ndarray],
                                                      np.ndarray]:
    """Deterministic linear AR head over :func:`stub_weights`.

    The per-horizon score is accumulated as a strict left fold over
    lag positions — w_0·x_0, then + w_1·x_1, … — with one scalar×
    column multiply and one column add per step. Elementwise NumPy
    ops round each operation individually (no FMA, no pairwise
    reassociation), so the float stream is identical to a SQL
    left-associative `w0*x[1] + w1*x[2] + …` chain — the property
    the value-hash oracle depends on. np.dot would be faster and
    wrong (pairwise summation)."""
    weights = stub_weights(seq_len, pred_len, decay)

    def model(x: np.ndarray) -> np.ndarray:
        out = np.empty((x.shape[0], pred_len), dtype=np.float64)
        for h in range(pred_len):
            acc = weights[h, 0] * x[:, 0]
            for i in range(1, seq_len):
                acc = acc + weights[h, i] * x[:, i]
            out[:, h] = acc
        return out

    return model


def single_step_model(seq_len: int = 24, pred_len: int = 6, *,
                      decay: float = 0.9) -> Callable[[np.ndarray],
                                                      np.ndarray]:
    """Horizon-1 head of the FULL stub: row 0 of
    stub_weights(seq_len, pred_len) with the identical strict left
    fold — so predict_single_step returns exactly ``pred[0]`` of the
    full predictor (reference predictor.py:280
    ``predict_single_step`` delegates to predict() and takes the
    first step), while the plan computes ONE horizon instead of
    pred_len-then-filter."""
    w0 = stub_weights(seq_len, pred_len, decay)[0]

    def model(x: np.ndarray) -> np.ndarray:
        acc = w0[0] * x[:, 0]
        for i in range(1, seq_len):
            acc = acc + w0[i] * x[:, i]
        return acc.reshape(-1, 1)

    return model


def real_model(checkpoint_path: str, *, model_factory=None,
               config: dict | None = None, device: str = "cpu",
               pred_len: int = 6):
    """Load a trained torch checkpoint and return a scoring callable
    (n, seq_len) -> (n, pred_len) — the reference's
    predictor.py:101-158 ``_load_model`` seam, step for step:

    * ``torch.load(path, map_location=device)`` (predictor.py:120);
    * accept both checkpoint shapes — ``{'model_state_dict': ...}``
      (train.py:198 ``save_checkpoint``) or a bare state_dict
      (predictor.py:122-128);
    * ``load_state_dict(strict=True)`` first, fall back to
      ``strict=False`` on mismatch (predictor.py:131-150);
    * ``eval()`` before serving (predictor.py:153).

    ``model_factory(config)`` must return the torch module — the
    reference selects it from MODEL_CLASSES by
    ``config['model']['model_type']`` (predictor.py:105-114); the
    architectures themselves are the reference's torch code, which
    this engine deliberately does not re-implement, so the factory is
    injected. ``config`` defaults to the checkpoint's embedded
    ``config`` when present. The returned callable feeds float32
    (n, seq_len, 1) tensors under ``no_grad`` and hands back float64
    numpy — exactly the contract :func:`score_windows` batches
    against, so a real checkpoint drops into the same mapInPandas
    plan as the stub head (pytest-exercised through a minimal torch
    stand-in; env-gated on a real torch install otherwise).
    """
    try:
        import torch
    except ImportError as e:  # pragma: no cover - env-gated
        raise NotImplementedError(
            "real model scoring requires torch; this environment "
            "ships none — use stub_linear_model, or any callable "
            "(n, seq_len) -> (n, pred_len)") from e
    checkpoint = torch.load(checkpoint_path, map_location=device)
    if isinstance(checkpoint, dict) and "model_state_dict" in checkpoint:
        state_dict = checkpoint["model_state_dict"]
    else:
        state_dict = checkpoint
    if config is None and isinstance(checkpoint, dict):
        config = checkpoint.get("config")
    if model_factory is None:
        raise NotImplementedError(
            "no torch architecture is bundled (the reference's model "
            "classes are its own torch code); pass "
            "model_factory(config) -> nn.Module")
    net = model_factory(config)
    try:
        net.load_state_dict(state_dict, strict=True)
    except RuntimeError:
        net.load_state_dict(state_dict, strict=False)
    net.eval()
    if config and "model" in config:
        pred_len = int(config["model"].get("pred_len", pred_len))

    # capture the torch entry points as locals: the scoring closure
    # ships to executors inside score_windows' mapInPandas, and a
    # module-global `torch.` reference would force every worker to
    # re-import at unpickle time even for attributes already bound
    _no_grad, _as_tensor, _f32 = torch.no_grad, torch.as_tensor, \
        torch.float32

    def model(x: np.ndarray) -> np.ndarray:
        with _no_grad():
            t = _as_tensor(x, dtype=_f32).unsqueeze(-1)
            out = net(t)
        return np.asarray(out.detach().cpu().numpy(),
                          dtype=np.float64).reshape(x.shape[0], pred_len)

    return model


def score_windows(windows: DataFrame, *,
                  key: str = "product_id", ts: str = "bucket_start",
                  x_col: str = "x_sig", seq_len: int = 24,
                  pred_len: int = 6,
                  model: Callable[[np.ndarray], np.ndarray] | None = None,
                  model_version: str = MODEL_VERSION) -> DataFrame:
    """Apply `model` to every sliding window, one output row per
    (window, horizon) — the predictions-table shape
    (product_id, origin_time, horizon, predicted_price,
    model_version) that the merge-upsert sink consumes.

    Scale: mapInPandas streams Arrow batches; per batch the windows
    decode into one (n, seq_len) float64 matrix and score in a single
    vectorized call — model cost amortizes over the batch exactly as
    the reference's torch batch inference does. Partitioning is
    whatever the input carries (sliding_windows: the per-key window
    family), so scoring adds NO shuffle.
    """
    mdl = model if model is not None else stub_linear_model(seq_len,
                                                            pred_len)
    key_field = windows.schema[key]
    ts_field = windows.schema[ts]
    schema = StructType([
        StructField(key, key_field.dataType),
        StructField("origin_time", ts_field.dataType),
        StructField("horizon", IntegerType()),
        StructField("predicted_price", DoubleType()),
        StructField("model_version", StringType()),
    ])
    horizons = np.arange(1, pred_len + 1)

    def _score(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            x = (pdf[x_col].str.split(",", expand=True)
                 .to_numpy(dtype=np.float64))
            x /= PRICE_SCALE
            preds = mdl(x)  # (n, pred_len)
            n = len(pdf)
            yield pd.DataFrame({
                key: pdf[key].to_numpy().repeat(pred_len),
                "origin_time": pdf[ts].to_numpy().repeat(pred_len),
                "horizon": np.tile(horizons, n).astype(np.int32),
                "predicted_price": preds.reshape(-1),
                "model_version": model_version,
            })

    return windows.select(key, ts, x_col).mapInPandas(_score,
                                                      schema=schema)
