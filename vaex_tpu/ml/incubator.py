"""Incubator model wrappers: river (online learning) and annoy (approximate
nearest neighbours), both import-gated — neither library ships in this
environment; headless tests drive the wrappers with fakes.

TPU-native counterpart of /root/reference/packages/vaex-ml/vaex/ml/incubator/
{river.py:17-160, annoy.py:16-70}: models stream DataFrame chunks (the
out-of-core contract), predictions come back as serializable virtual columns
through the same state/pipeline machinery as the other ml wrappers.
"""

from __future__ import annotations

import numpy as np


class RiverModel:
    """Wrap a river estimator implementing ``learn_many`` (mini-batch API)
    so it fits by streaming chunks (reference: incubator/river.py:17-160)."""

    def __init__(self, model, features, target, batch_size=50_000,
                 num_epochs=1, shuffle=False, prediction_name="prediction"):
        if not hasattr(model, "learn_many"):
            raise ValueError("the river model must implement learn_many "
                             "(mini-batch API)")
        self.model = model
        self.features = list(features)
        self.target = target
        self.batch_size = batch_size
        self.num_epochs = num_epochs
        self.shuffle = shuffle
        self.prediction_name = prediction_name

    def fit(self, df, progress=None):
        import pandas as pd
        for epoch in range(self.num_epochs):
            d = df.shuffle() if self.shuffle else df
            for i1, i2, chunks in d.evaluate_iterator(
                    self.features + [self.target], chunk_size=self.batch_size):
                arrays = [np.asarray(c) for c in chunks]
                X = pd.DataFrame(dict(zip(self.features, arrays[:-1])))
                y = pd.Series(arrays[-1], name=self.target)
                self.model.learn_many(X=X, y=y)
        return self

    def predict(self, df):
        import pandas as pd
        out = []
        for i1, i2, chunks in df.evaluate_iterator(self.features,
                                                   chunk_size=self.batch_size):
            X = pd.DataFrame(dict(zip(self.features, [np.asarray(c) for c in chunks])))
            out.append(np.asarray(self.model.predict_many(X)))
        return np.concatenate(out) if out else np.zeros(0)

    def transform(self, df):
        df = df.copy()
        preds = self.predict(df)
        df.add_column(self.prediction_name, preds)
        return df


class ANNOYModel:
    """Approximate nearest-neighbour index over feature columns
    (reference: incubator/annoy.py:16-70)."""

    def __init__(self, features, n_trees=10, metric="euclidean",
                 n_neighbours=10, batch_size=100_000,
                 prediction_name="annoy_neighbours"):
        self.features = list(features)
        self.n_trees = n_trees
        self.metric = metric
        self.n_neighbours = n_neighbours
        self.batch_size = batch_size
        self.prediction_name = prediction_name
        self.index_builder = None

    def _annoy(self):
        try:
            import annoy
            return annoy
        except ImportError as e:  # pragma: no cover - exercised via fakes
            raise ImportError("annoy is required for ANNOYModel; "
                              "pip install annoy") from e

    def fit(self, df, annoy_module=None):
        annoy = annoy_module or self._annoy()
        self.index_builder = annoy.AnnoyIndex(len(self.features), self.metric)
        row = 0
        for i1, i2, chunks in df.evaluate_iterator(self.features,
                                                   chunk_size=self.batch_size):
            arrays = [np.asarray(c) for c in chunks]
            for vec in np.stack(arrays, axis=1):
                self.index_builder.add_item(row, vec.tolist())
                row += 1
        self.index_builder.build(self.n_trees)
        return self

    def predict(self, df, n_neighbours=None):
        if self.index_builder is None:
            raise RuntimeError("fit the model first")
        k = n_neighbours or self.n_neighbours
        out = []
        for i1, i2, chunks in df.evaluate_iterator(self.features,
                                                   chunk_size=self.batch_size):
            arrays = [np.asarray(c) for c in chunks]
            for vec in np.stack(arrays, axis=1):
                out.append(self.index_builder.get_nns_by_vector(vec.tolist(), k))
        return np.array(out)

    def transform(self, df):
        df = df.copy()
        df.add_column(self.prediction_name, self.predict(df))
        return df
