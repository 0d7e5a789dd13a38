"""Model families — alias of vaex_tpu.ml.

The analytics engine's "models" are its ML transformers/predictors (the
reference's vaex-ml package): PCA, KMeans, scalers, encoders, sklearn
bridges.  They live in vaex_tpu.ml; this package mirrors them under the
models/ layout.
"""

from ..ml import *  # noqa: F401,F403
from ..ml import (  # noqa: F401
    KMeans, PCA, Predictor, IncrementalPredictor, StandardScaler, MinMaxScaler,
    MaxAbsScaler, RobustScaler, LabelEncoder, OneHotEncoder, FrequencyEncoder,
    BayesianTargetEncoder, WeightOfEvidenceEncoder, CycleTransformer,
    KBinsDiscretizer, GroupByTransformer, RandomProjections, Transformer, metrics,
)
