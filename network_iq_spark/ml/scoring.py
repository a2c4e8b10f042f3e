"""Batch scoring (SURVEY.md §2.9 M3).

Two interchangeable paths:

- :func:`score_with_model` — native Spark ML ``PipelineModel.transform``;
  distributed, no Python.
- :func:`score_with_bundle` — the reference's pattern (sklearn bundle scored
  row-batch-wise, streamlit_app.py:717-725) done the idiomatic Spark way:
  the (small) model is **broadcast** once, a vectorized **pandas UDF** scores
  Arrow batches on executors, with a plain numpy-logistic bundle.
- :func:`score_with_reference_bundle` — same mechanics, but driving the
  reference's ACTUAL shipped joblib artifact: the bundle's learned
  parameters (scaler, one-hot categories, XGBoost tree arrays) are extracted
  without sklearn/xgboost and its ``predict_proba`` is re-executed in numpy.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from pyspark.ml.functions import vector_to_array


def score_with_model(model: PipelineModel, features: DataFrame) -> DataFrame:
    """Score with the Spark ML pipeline; emit ``pred_prob`` ∈ [0,1] (the
    reference's output contract, validated at streamlit_app.py:83-90)."""
    num = [c for c in model.stages[-4].getInputCols()]
    out = model.transform(
        features.na.fill(0.0, subset=[c for c in num if c in features.columns])
    )
    return out.withColumn(
        "pred_prob", vector_to_array(F.col("probability")).getItem(1)
    ).drop("rawPrediction", "probability", "prediction")


def make_numpy_bundle(
    means: Sequence[float],
    scales: Sequence[float],
    coefs: Sequence[float],
    intercept: float,
    num_cols: Sequence[str],
) -> dict:
    """A broadcastable pure-numpy logistic bundle (stand-in for joblib)."""
    return {
        "means": np.asarray(means, dtype=np.float64),
        "scales": np.asarray(scales, dtype=np.float64),
        "coefs": np.asarray(coefs, dtype=np.float64),
        "intercept": float(intercept),
        "num_cols": list(num_cols),
    }


def score_with_bundle(df: DataFrame, bundle: dict) -> DataFrame:
    """Broadcast-model + vectorized pandas UDF scoring.

    One Arrow batch in, one probability Series out — no per-row Python. The
    broadcast ships the model once per executor, not per task.
    """
    sc = df.sparkSession.sparkContext
    b = sc.broadcast(bundle)
    num_cols = bundle["num_cols"]

    @pandas_udf(DoubleType())
    def _predict_proba(*cols: pd.Series) -> pd.Series:
        bb = b.value
        x = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        x = np.nan_to_num(x, nan=0.0)
        z = (x - bb["means"]) / bb["scales"]
        logit = z @ bb["coefs"] + bb["intercept"]
        return pd.Series(1.0 / (1.0 + np.exp(-logit)))

    return df.withColumn("pred_prob", _predict_proba(*[F.col(c) for c in num_cols]))


def score_with_reference_bundle(df: DataFrame, bundle_path: str) -> DataFrame:
    """Score with the reference's ACTUAL shipped model artifact (M3/M6).

    Loads ``data/models/next_hour_congestion.joblib`` structurally (no
    sklearn/xgboost needed — see :mod:`network_iq_spark.ml.reference_bundle`),
    rebuilds its predict_proba as pure numpy (:mod:`~.ml.xgb_scorer`:
    scaler ÷ scale_, one-hot, sparse-missing semantics, 200-tree traversal,
    float32 sigmoid), **broadcasts** the scorer once per executor, and scores
    Arrow batches with a vectorized pandas UDF. Same output contract as the
    reference's ``pred_prob`` column (streamlit_app.py:727-737).
    """
    from network_iq_spark.ml.reference_bundle import load_reference_bundle
    from network_iq_spark.ml.xgb_scorer import ReferenceScorer

    scorer = ReferenceScorer(load_reference_bundle(bundle_path))
    cols = scorer.num_cols + scorer.cat_cols
    b = df.sparkSession.sparkContext.broadcast(scorer)

    @pandas_udf(DoubleType())
    def _predict_proba(*series: pd.Series) -> pd.Series:
        pdf = pd.concat(series, axis=1)
        pdf.columns = cols
        return pd.Series(b.value.predict_proba1(pdf).astype(np.float64))

    return df.withColumn("pred_prob", _predict_proba(*[F.col(c) for c in cols]))
