"""KMeans clustering (reference import path: vaex.ml.cluster)."""

from . import KMeans  # noqa: F401
