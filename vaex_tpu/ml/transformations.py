"""Transformers (reference import path: vaex.ml.transformations)."""

from . import (  # noqa: F401
    BayesianTargetEncoder, CycleTransformer, FrequencyEncoder, GroupByTransformer,
    KBinsDiscretizer, LabelEncoder, MaxAbsScaler, MinMaxScaler, OneHotEncoder,
    PCA, PCAIncremental, RandomProjections, RobustScaler, StandardScaler,
    Transformer, WeightOfEvidenceEncoder,
)
