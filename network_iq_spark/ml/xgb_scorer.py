"""Pure-numpy scorer for the reference's shipped XGBoost bundle (M3/M6).

The reference scores with ``bundle["model"].predict_proba(X)[:, 1]``
(streamlit_app.py:727-737) where ``model`` is an sklearn Pipeline:
``ColumnTransformer(StandardScaler(with_mean=False) ⊕ OneHotEncoder)``
→ ``XGBClassifier(binary:logistic, 200 trees, depth 8)``.  Neither
sklearn nor xgboost is installable here, but every learned parameter is
plain data inside the joblib pickle (see ``reference_bundle``): scaler
``scale_``, OHE ``categories_``, and the booster's UBJSON blob.  This
module re-implements ``predict_proba`` from those parameters:

- tree traversal follows the public XGBoost JSON/UBJSON model schema
  (``split_conditions`` holds the split threshold for internal nodes and
  the leaf value for leaves; missing values route via ``default_left``);
- margin = Σ leaf values + logit(base_score); p = sigmoid(margin),
  computed in float32 exactly as the C++ engine does;
- **sparse-missing parity**: the reference pipeline emits a *sparse*
  matrix (``ColumnTransformer.sparse_output_ = True``), and XGBoost
  treats implicit zeros of sparse input as MISSING, not 0.0.  So every
  exact-zero feature (un-set one-hot slots, zero rolling diffs, scaled
  zeros) must be scored as missing.  ``_to_matrix`` therefore maps
  exact 0.0 → NaN before traversal — dropping this detail changes
  predictions whenever a zero-valued feature hits a node whose
  ``default_left`` disagrees with the `< threshold` branch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from network_iq_spark.ml import ubjson


def sigmoid32(margin: np.ndarray) -> np.ndarray:
    """float32 logistic, matching xgboost's ``common::Sigmoid``."""
    return (1.0 / (1.0 + np.exp(-margin.astype(np.float32), dtype=np.float32))).astype(
        np.float32
    )


class BoosterScorer:
    """Vectorized gbtree traversal over the decoded UBJSON model."""

    def __init__(self, blob: bytes):
        doc = ubjson.loads(bytes(blob))
        learner = doc["Model"]["learner"]
        model = learner["gradient_booster"]["model"]
        self.num_feature = int(learner["learner_model_param"]["num_feature"])
        base_score = float(learner["learner_model_param"]["base_score"])
        # binary:logistic stores base_score in probability space; the
        # engine boosts from ProbToMargin(base_score) = logit.
        self.base_margin = np.float32(np.log(base_score / (1.0 - base_score)))
        self.trees = []
        for t in model["trees"]:
            if len(np.asarray(t["categories_nodes"])):  # pragma: no cover
                raise NotImplementedError("categorical splits not used by the bundle")
            self.trees.append(
                {
                    "left": np.asarray(t["left_children"], dtype=np.int32),
                    "right": np.asarray(t["right_children"], dtype=np.int32),
                    "feat": np.asarray(t["split_indices"], dtype=np.int32),
                    "cond": np.asarray(t["split_conditions"], dtype=np.float32),
                    "default_left": np.asarray(t["default_left"], dtype=bool),
                }
            )

    def predict_margin(self, X: np.ndarray) -> np.ndarray:
        """X: (n, num_feature) float32; NaN = missing."""
        X = np.ascontiguousarray(X, dtype=np.float32)
        n = len(X)
        rows = np.arange(n)
        margin = np.full(n, self.base_margin, dtype=np.float32)
        for t in self.trees:
            node = np.zeros(n, dtype=np.int32)
            left = t["left"]
            while True:
                l_child = left[node]
                internal = l_child != -1
                if not internal.any():
                    break
                x = X[rows, t["feat"][node]]
                go_left = np.where(np.isnan(x), t["default_left"][node], x < t["cond"][node])
                nxt = np.where(go_left, l_child, t["right"][node])
                node = np.where(internal, nxt, node)
            margin += t["cond"][node]  # leaf value lives in split_conditions
        return margin

    def predict_proba1(self, X: np.ndarray) -> np.ndarray:
        return sigmoid32(self.predict_margin(X))


class ReferenceScorer:
    """End-to-end twin of the reference pipeline's ``predict_proba``:
    raw feature frame → scale/one-hot → sparse-missing matrix → trees."""

    def __init__(self, bundle: dict):
        pre, clf = (step for _, step in bundle["model"].steps)
        self.num_cols = list(bundle["num_cols"])
        self.cat_cols = list(bundle["cat_cols"])
        num_pipe, cat_enc = None, None
        for name, tr, _cols in pre.__dict__["transformers_"]:
            if name == "num":
                num_pipe = tr
            elif name == "cat":
                cat_enc = tr
        scaler = dict(num_pipe.steps)["scale"].__dict__
        if scaler.get("with_mean"):  # pragma: no cover - bundle uses False
            raise NotImplementedError("bundle scaler is with_mean=False")
        self.scale = np.asarray(scaler["scale_"], dtype=np.float64)
        self.categories = [
            np.asarray(c).astype(str) for c in cat_enc.__dict__["categories_"]
        ]
        self.booster = BoosterScorer(
            clf.__dict__["_Booster"].__dict__["handle"]
        )

    def _to_matrix(self, pdf: pd.DataFrame) -> np.ndarray:
        num = pdf[self.num_cols].to_numpy(dtype=np.float64) / self.scale
        blocks = [num]
        for col, cats in zip(self.cat_cols, self.categories):
            vals = pdf[col].astype(str).to_numpy()
            blocks.append((vals[:, None] == cats[None, :]).astype(np.float64))
        X = np.hstack(blocks).astype(np.float32)
        X[X == 0.0] = np.nan  # sparse-pipeline zeros are MISSING to xgboost
        return X

    def predict_proba1(self, pdf: pd.DataFrame) -> np.ndarray:
        """P(label=1) for each row; the reference's ``pred_prob`` column."""
        return self.booster.predict_proba1(self._to_matrix(pdf))
