"""sklearn bridge (reference import path: vaex.ml.sklearn)."""

from . import IncrementalPredictor, Predictor  # noqa: F401
