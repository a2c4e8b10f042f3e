"""ML tier (SURVEY.md §2.9): feature building (see ``plans.telemetry``),
label derivation, training, and batch scoring — all Spark-native."""

from network_iq_spark.ml.labels import derive_labels
from network_iq_spark.ml.scoring import score_with_bundle, score_with_model
from network_iq_spark.ml.training import export_bundle, train_next_hour

__all__ = [
    "derive_labels",
    "export_bundle",
    "score_with_bundle",
    "score_with_model",
    "train_next_hour",
]
