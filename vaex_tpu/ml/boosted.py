"""Gradient-boosting wrappers (reference: vaex-ml lightgbm.py /
xgboost.py / catboost.py — thin model wrappers with fit/transform/predict
and DataFrame-native feature evaluation).

The boosting libraries are optional: each wrapper imports its backend
lazily and raises a clear ImportError when absent.  `HistGradientBoosting`
offers the same model family through scikit-learn (always present), via the
generic Predictor.
"""

from __future__ import annotations

import numpy as np

from . import Predictor


class _BoostedModel(Predictor):
    """Common fit/transform over a native-booster backend."""

    library = None          # import name
    default_prefix = ""

    def __init__(self, features=None, target=None, params=None,
                 num_boost_round=100, prediction_name="prediction"):
        super().__init__(model=None, features=features, target=target,
                         prediction_name=prediction_name)
        self.params = dict(params or {})
        self.num_boost_round = num_boost_round

    def _backend(self):
        import importlib
        try:
            return importlib.import_module(self.library)
        except ImportError as e:
            raise ImportError(
                f"{self.library} is not installed; install it or use "
                "vaex_tpu.ml.Predictor with "
                "sklearn.ensemble.HistGradientBoosting* for an equivalent "
                "model family") from e

    def _xy(self, df):
        X = np.column_stack([np.asarray(df.evaluate(f)) for f in self.features])
        y = np.asarray(df.evaluate(self.target))
        return X, y


class LightGBMModel(_BoostedModel):
    """reference: vaex-ml/vaex/ml/lightgbm.py LightGBMModel."""

    snake_name = "lightgbm_model"
    library = "lightgbm"

    def fit(self, df, **kwargs):
        lgb = self._backend()
        X, y = self._xy(df)
        self.model = lgb.train(self.params, lgb.Dataset(X, y),
                               num_boost_round=self.num_boost_round, **kwargs)
        return self

    def predict(self, df):
        X = np.column_stack([np.asarray(df.evaluate(f)) for f in self.features])
        return self.model.predict(X)

    def transform(self, df):
        df = df.copy()
        model = self.model

        def predict(*columns):
            return model.predict(np.column_stack([np.asarray(c) for c in columns]))

        df[self.prediction_name] = df.apply(predict, arguments=[df[f] for f in self.features])
        return df


class XGBoostModel(_BoostedModel):
    """reference: vaex-ml/vaex/ml/xgboost.py XGBoostModel."""

    snake_name = "xgboost_model"
    library = "xgboost"

    def fit(self, df, **kwargs):
        xgb = self._backend()
        X, y = self._xy(df)
        self.model = xgb.train(self.params, xgb.DMatrix(X, y),
                               num_boost_round=self.num_boost_round, **kwargs)
        return self

    def predict(self, df):
        xgb = self._backend()
        X = np.column_stack([np.asarray(df.evaluate(f)) for f in self.features])
        return self.model.predict(xgb.DMatrix(X))

    def transform(self, df):
        df = df.copy()
        model = self.model
        xgb = self._backend()

        def predict(*columns):
            return model.predict(xgb.DMatrix(np.column_stack([np.asarray(c) for c in columns])))

        df[self.prediction_name] = df.apply(predict, arguments=[df[f] for f in self.features])
        return df


class CatBoostModel(_BoostedModel):
    """reference: vaex-ml/vaex/ml/catboost.py CatBoostModel."""

    snake_name = "catboost_model"
    library = "catboost"

    def __init__(self, features=None, target=None, params=None,
                 num_boost_round=100, prediction_name="prediction",
                 prediction_type="Probability"):
        super().__init__(features, target, params, num_boost_round, prediction_name)
        self.prediction_type = prediction_type

    def fit(self, df, **kwargs):
        cb = self._backend()
        X, y = self._xy(df)
        self.model = cb.train(params=dict(self.params, iterations=self.num_boost_round),
                              pool=cb.Pool(X, y), **kwargs)
        return self

    def predict(self, df):
        X = np.column_stack([np.asarray(df.evaluate(f)) for f in self.features])
        return self.model.predict(X)
