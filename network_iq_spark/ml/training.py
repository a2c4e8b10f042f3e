"""Training job for the next-hour congestion model (SURVEY.md §2.9 M2/M4/M6).

Re-derives the reference's absent ``scripts/train_next_hour.py`` Spark-first:

- **M2 preprocessing**: ``StandardScaler`` over the numeric features +
  ``OneHotEncoder(handleInvalid="keep")`` over (tech, band) — the Spark ML
  twins of the reference bundle's ColumnTransformer (handle_unknown=ignore).
- **Estimator**: logistic regression (this container has no XGBoost; the
  reference's selected XGB config — 200 trees, depth 8, lr 0.1, hist — is
  recorded in ``XGB_PARAMS`` and plugs into ``xgboost.spark
  .SparkXGBClassifier(**XGB_PARAMS)`` unchanged where that package exists).
- **M4 metadata**: metrics (AUC/AP via evaluators), label_rule, trained_at
  — persisted as a JSON sidecar next to the PipelineModel, mirroring the
  reference's joblib-bundle dict {model, num_cols, cat_cols, label_rule,
  trained_at, metrics}.
- **M5 introspection**: top-|coefficient| features (the reference attempts
  ``clf.coef_`` and degrades on tree models — we expose the same view).
"""

from __future__ import annotations

import datetime
import json
import os
from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame

from network_iq_spark.plans.telemetry import BASE_FEATURES

# Reference XGB hyperparams (bundle binary, BASELINE.md) — for parity
# retraining wherever xgboost.spark is installed.
XGB_PARAMS = {
    "n_estimators": 200,
    "max_depth": 8,
    "learning_rate": 0.1,
    "tree_method": "hist",
    "subsample": 1.0,
    "colsample_bytree": 1.0,
    "objective": "binary:logistic",
    "eval_metric": "logloss",
}

NUM_FEATURES: tuple[str, ...] = tuple(
    [f"{c}_{s}" for c in BASE_FEATURES for s in ("rmean", "rstd", "rdiff")]
    + list(BASE_FEATURES)
    + ["z_bad", "b_mean", "b_std", "hour", "is_weekend"]
)
CAT_FEATURES: tuple[str, ...] = ("tech", "band")


def build_pipeline(
    num_cols: Sequence[str] = NUM_FEATURES, cat_cols: Sequence[str] = CAT_FEATURES
) -> Pipeline:
    stages = []
    ohe_outputs = []
    for c in cat_cols:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep")
        )
        stages.append(
            OneHotEncoder(
                inputCol=f"{c}_idx", outputCol=f"{c}_ohe", handleInvalid="keep"
            )
        )
        ohe_outputs.append(f"{c}_ohe")
    stages.append(
        VectorAssembler(
            inputCols=list(num_cols), outputCol="num_vec", handleInvalid="keep"
        )
    )
    stages.append(
        StandardScaler(inputCol="num_vec", outputCol="num_scaled", withMean=True)
    )
    stages.append(
        VectorAssembler(
            inputCols=["num_scaled", *ohe_outputs], outputCol="features_vec"
        )
    )
    stages.append(
        LogisticRegression(
            featuresCol="features_vec", labelCol="label", probabilityCol="probability"
        )
    )
    return Pipeline(stages=stages)


def train_next_hour(
    labeled: DataFrame,
    num_cols: Sequence[str] = NUM_FEATURES,
    cat_cols: Sequence[str] = CAT_FEATURES,
    label_rule: dict | None = None,
) -> tuple[PipelineModel, dict]:
    """Fit the pipeline; return (model, bundle-metadata with metrics)."""
    present_num = [c for c in num_cols if c in labeled.columns]
    present_cat = [c for c in cat_cols if c in labeled.columns]
    train = labeled.na.fill(0.0, subset=present_num).na.fill(
        "missing", subset=present_cat
    )
    model = build_pipeline(present_num, present_cat).fit(train)
    scored = model.transform(train)
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    ).evaluate(scored)
    ap = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderPR"
    ).evaluate(scored)
    n = train.count()
    positives = int(train.agg({"label": "sum"}).collect()[0][0] or 0)
    meta = {
        "num_cols": present_num,
        "cat_cols": present_cat,
        "label_rule": label_rule
        or {"metric": "latency_ms", "q": 0.8, "hi_bad_primary": True},
        "trained_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "metrics": {"auc": auc, "ap": ap, "n": n, "positives": positives},
    }
    return model, meta


def top_coefficients(model: PipelineModel, k: int = 15) -> list[tuple[str, float]]:
    """M5: top-k features by |coefficient|, with real slot names — scaled
    numerics keep their column names, one-hot slots expand to
    ``col=category`` via each fitted StringIndexer's labels (logistic only;
    tree models degrade gracefully like the reference's except-guard,
    streamlit_app.py:874-891)."""
    from pyspark.ml.feature import OneHotEncoderModel, StringIndexerModel

    lr = model.stages[-1]
    if not hasattr(lr, "coefficients"):
        return []
    coefs = list(lr.coefficients)
    labels: list[str] = list(model.stages[-4].getInputCols())  # scaled numerics
    indexers = {
        s.getOutputCol(): s
        for s in model.stages
        if isinstance(s, StringIndexerModel)
    }
    for s in model.stages:
        if isinstance(s, OneHotEncoderModel):
            idx = indexers[s.getInputCol()]
            col = idx.getInputCol()
            cats = list(idx.labels)
            # handleInvalid=keep appends an invalid bucket AND suppresses
            # dropLast (Spark keeps all slots then); otherwise dropLast
            # removes the final category slot
            drop = 1 if s.getDropLast() and s.getHandleInvalid() != "keep" else 0
            n_slots = s.categorySizes[0] - drop
            slot_names = ([f"{col}={c}" for c in cats] + [f"{col}=<invalid>"])[
                :n_slots
            ]
            labels.extend(slot_names)
    if len(labels) != len(coefs):  # defensive: never misattribute a weight
        labels = [f"f{i}" for i in range(len(coefs))]
    ranked = sorted(zip(labels, coefs), key=lambda t: -abs(t[1]))
    return [(n, float(c)) for n, c in ranked[:k]]


def export_bundle(model: PipelineModel, meta: dict, path: str) -> None:
    """Persist PipelineModel + JSON sidecar (the Spark twin of the
    reference's joblib bundle)."""
    model.write().overwrite().save(os.path.join(path, "model"))
    with open(os.path.join(path, "bundle.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_bundle(spark, path: str) -> tuple[PipelineModel, dict]:
    model = PipelineModel.load(os.path.join(path, "model"))
    with open(os.path.join(path, "bundle.json")) as f:
        meta = json.load(f)
    return model, meta
