"""Machine learning: transformers, clustering, PCA, predictors — TPU-native.

Counterpart of /root/reference/packages/vaex-ml (SURVEY.md §2.4,
transformations.py:51-1262, cluster.py, sklearn wrappers): sklearn-style
`fit/transform` objects whose **fit** runs as streaming aggregation passes on
the TPU executor (mean/std/minmax/percentile/unique) or chunked jax linear
algebra (PCA covariance = Σ xxᵀ on the MXU, KMeans Lloyd iterations), and
whose **transform** adds virtual columns — so fitted pipelines serialize into
DataFrame state and ship to servers, exactly the reference's
"ML pipelines without pipelines" story (vaex-ml/vaex/ml/state.py).
"""

from __future__ import annotations

import base64
import pickle

import numpy as np

from ..dataframe import register_dataframe_accessor

_transformers = {}


def _register(cls):
    _transformers[cls.snake_name] = cls
    return cls


class Transformer:
    """Base: fit(df) computes state, transform(df) adds virtual columns
    (reference: vaex-ml transformations.py Transformer)."""

    snake_name = "transformer"

    def __init__(self, features=None, prefix=None, **kwargs):
        self.features = list(features) if features is not None else None
        self.prefix = prefix if prefix is not None else self.default_prefix
        for k, v in kwargs.items():
            setattr(self, k, v)

    default_prefix = ""

    def fit(self, df):
        raise NotImplementedError

    def transform(self, df):
        raise NotImplementedError

    def fit_transform(self, df):
        self.fit(df)
        return self.transform(df)

    # -- serialization
    def state_get(self):
        state = {k: _encode_value(v) for k, v in self.__dict__.items()}
        return {"cls": self.snake_name, "state": state}

    def state_set(self, state):
        for k, v in state["state"].items():
            setattr(self, k, _decode_value(v))
        return self

    @staticmethod
    def from_state(state):
        cls = _transformers[state["cls"]]
        obj = cls.__new__(cls)
        obj.state_set(state)
        return obj


def _encode_value(v):
    if isinstance(v, np.ndarray):
        return {"__ndarray__": v.tolist(), "dtype": str(v.dtype)}
    if isinstance(v, np.generic):
        return v.item()
    return v


def _decode_value(v):
    if isinstance(v, dict) and "__ndarray__" in v:
        return np.asarray(v["__ndarray__"], dtype=v["dtype"])
    return v


def _lit(x):
    """Python-literal repr for expression strings (numpy scalars repr as
    np.float64(...) under numpy>=2, which is not a valid expression)."""
    if isinstance(x, (np.floating, float)):
        return repr(float(x))
    if isinstance(x, (np.integer, int)):
        return repr(int(x))
    return repr(x)


# ---------------------------------------------------------------------------
# scalers (reference: transformations.py StandardScaler etc.)
# ---------------------------------------------------------------------------

@_register
class StandardScaler(Transformer):
    snake_name = "standard_scaler"
    default_prefix = "standard_scaled_"

    def __init__(self, features=None, prefix=None, with_mean=True, with_std=True):
        super().__init__(features, prefix, with_mean=with_mean, with_std=with_std)

    def fit(self, df):
        means = df.mean(self.features, delay=True)
        stds = df.std(self.features, delay=True)
        df.execute()
        self.mean_ = np.array([float(m) for m in means.get()])
        self.std_ = np.array([float(s) for s in stds.get()])

    def transform(self, df):
        df = df.copy()
        for i, feature in enumerate(self.features):
            expr = f"({feature})"
            if self.with_mean:
                expr = f"({expr} - {_lit(self.mean_[i])})"
            if self.with_std:
                expr = f"({expr} / {_lit(self.std_[i])})"
            df[self.prefix + feature] = df[expr]
        return df


@_register
class MinMaxScaler(Transformer):
    snake_name = "minmax_scaler"
    default_prefix = "minmax_scaled_"

    def __init__(self, features=None, prefix=None, feature_range=(0, 1)):
        super().__init__(features, prefix, feature_range=tuple(feature_range))

    def fit(self, df):
        minmax = df.minmax(self.features)
        self.fmin_ = np.array([float(m[0]) for m in minmax])
        self.fmax_ = np.array([float(m[1]) for m in minmax])

    def transform(self, df):
        df = df.copy()
        a, b = self.feature_range
        for i, feature in enumerate(self.features):
            lo, hi = self.fmin_[i], self.fmax_[i]
            scale = (b - a) / (hi - lo) if hi != lo else 0.0
            df[self.prefix + feature] = df[f"(({feature}) - {_lit(lo)}) * {_lit(scale)} + {_lit(a)}"]
        return df


@_register
class MaxAbsScaler(Transformer):
    snake_name = "maxabs_scaler"
    default_prefix = "absmax_scaled_"

    def fit(self, df):
        maxima = [float(df.max(f"abs({f})")) for f in self.features]
        self.maxabs_ = np.array(maxima)

    def transform(self, df):
        df = df.copy()
        for i, feature in enumerate(self.features):
            m = self.maxabs_[i] or 1.0
            df[self.prefix + feature] = df[f"({feature}) / {_lit(m)}"]
        return df


@_register
class RobustScaler(Transformer):
    snake_name = "robust_scaler"
    default_prefix = "robust_scaled_"

    def __init__(self, features=None, prefix=None, with_centering=True, with_scaling=True,
                 percentile_range=(25, 75)):
        super().__init__(features, prefix, with_centering=with_centering,
                         with_scaling=with_scaling, percentile_range=tuple(percentile_range))

    def fit(self, df):
        self.center_ = np.array([float(df.percentile_approx(f, 50)) for f in self.features])
        lo, hi = self.percentile_range
        q_lo = np.array([float(df.percentile_approx(f, lo)) for f in self.features])
        q_hi = np.array([float(df.percentile_approx(f, hi)) for f in self.features])
        self.scale_ = q_hi - q_lo

    def transform(self, df):
        df = df.copy()
        for i, feature in enumerate(self.features):
            expr = f"({feature})"
            if self.with_centering:
                expr = f"({expr} - {_lit(self.center_[i])})"
            if self.with_scaling and self.scale_[i]:
                expr = f"({expr} / {_lit(self.scale_[i])})"
            df[self.prefix + feature] = df[expr]
        return df


# ---------------------------------------------------------------------------
# encoders (reference: transformations.py Label/OneHot/Frequency/Target/WoE)
# ---------------------------------------------------------------------------

@_register
class LabelEncoder(Transformer):
    snake_name = "label_encoder"
    default_prefix = "label_encoded_"

    def __init__(self, features=None, prefix=None, allow_unseen=False):
        super().__init__(features, prefix, allow_unseen=allow_unseen)

    def fit(self, df):
        self.labels_ = {f: list(df.unique(f, dropmissing=True)) for f in self.features}

    def transform(self, df):
        df = df.copy()
        for feature in self.features:
            labels = self.labels_[feature]
            mapper = {label: i for i, label in enumerate(labels)}
            default = -1 if self.allow_unseen else None
            df[self.prefix + feature] = df[feature].map(mapper, default_value=default if default is not None else None,
                                                        allow_missing=default is None)
        return df


@_register
class OneHotEncoder(Transformer):
    snake_name = "one_hot_encoder"
    default_prefix = ""

    def __init__(self, features=None, prefix=None, one=1, zero=0):
        super().__init__(features, prefix, one=one, zero=zero)

    def fit(self, df):
        self.uniques_ = {f: sorted(df.unique(f, dropmissing=True), key=str) for f in self.features}

    def transform(self, df):
        df = df.copy()
        from ..utils import find_valid_name
        for feature in self.features:
            for value in self.uniques_[feature]:
                column_name = find_valid_name(f"{self.prefix}{feature}_{value}")
                if isinstance(value, str):
                    df[column_name] = df[f"where({feature} == {value!r}, {self.one}, {self.zero})"]
                else:
                    df[column_name] = df[f"where({feature} == {value}, {self.one}, {self.zero})"]
        return df


@_register
class FrequencyEncoder(Transformer):
    snake_name = "frequency_encoder"
    default_prefix = "frequency_encoded_"

    def __init__(self, features=None, prefix=None, unseen="nan"):
        super().__init__(features, prefix, unseen=unseen)

    def fit(self, df):
        n = len(df)
        self.mappings_ = {}
        for feature in self.features:
            keys, counts = df._value_counts(feature)
            self.mappings_[feature] = {k: c / n for k, c in zip(keys, counts)}

    def transform(self, df):
        df = df.copy()
        for feature in self.features:
            mapping = {k: v for k, v in self.mappings_[feature].items() if k is not None}
            default = np.nan if self.unseen == "nan" else 0.0
            df[self.prefix + feature] = df[feature].map(mapping, default_value=default)
        return df


@_register
class BayesianTargetEncoder(Transformer):
    """Reference: transformations.py BayesianTargetEncoder."""

    snake_name = "bayesian_target_encoder"
    default_prefix = "mean_encoded_"

    def __init__(self, features=None, target=None, prefix=None, weight=100, unseen="prior"):
        super().__init__(features, prefix, target=target, weight=weight, unseen=unseen)

    def fit(self, df):
        self.prior_ = float(df.mean(self.target))
        self.mappings_ = {}
        for feature in self.features:
            grouped = df.groupby(feature, agg={"__count": "count", "__mean": __import__("vaex_tpu").agg.mean(self.target)})
            keys = grouped.evaluate(feature)
            keys = keys.to_pylist() if hasattr(keys, "to_pylist") else list(np.asarray(keys))
            counts = np.asarray(grouped.evaluate("__count"), dtype=np.float64)
            means = np.asarray(grouped.evaluate("__mean"), dtype=np.float64)
            post = (counts * means + self.weight * self.prior_) / (counts + self.weight)
            self.mappings_[feature] = dict(zip(keys, post.tolist()))

    def transform(self, df):
        df = df.copy()
        for feature in self.features:
            mapping = {k: v for k, v in self.mappings_[feature].items() if k is not None}
            df[self.prefix + feature] = df[feature].map(mapping, default_value=self.prior_)
        return df


@_register
class WeightOfEvidenceEncoder(Transformer):
    """Reference: transformations.py WeightOfEvidenceEncoder (binary target)."""

    snake_name = "woe_encoder"
    default_prefix = "woe_encoded_"

    def __init__(self, features=None, target=None, prefix=None, epsilon=1e-6):
        super().__init__(features, prefix, target=target, epsilon=epsilon)

    def fit(self, df):
        import vaex_tpu as vaex
        self.mappings_ = {}
        for feature in self.features:
            grouped = df.groupby(feature, agg={
                "__pos": vaex.agg.sum(f"_astype(({self.target}) != 0, 'int64')"),
                "__n": "count"})
            keys = grouped.evaluate(feature)
            keys = keys.to_pylist() if hasattr(keys, "to_pylist") else list(np.asarray(keys))
            pos = np.asarray(grouped.evaluate("__pos"), dtype=np.float64)
            n = np.asarray(grouped.evaluate("__n"), dtype=np.float64)
            neg = n - pos
            total_pos = pos.sum() or 1.0
            total_neg = neg.sum() or 1.0
            woe = np.log(((pos / total_pos) + self.epsilon) / ((neg / total_neg) + self.epsilon))
            self.mappings_[feature] = dict(zip(keys, woe.tolist()))

    def transform(self, df):
        df = df.copy()
        for feature in self.features:
            mapping = {k: v for k, v in self.mappings_[feature].items() if k is not None}
            df[self.prefix + feature] = df[feature].map(mapping, default_value=np.nan)
        return df


@_register
class CycleTransformer(Transformer):
    """sin/cos embedding of cyclic features (reference: transformations.py
    CycleTransformer)."""

    snake_name = "cycle_transformer"
    default_prefix = ""

    def __init__(self, features=None, n=None, prefix_x="", prefix_y="", suffix_x="_x", suffix_y="_y"):
        super().__init__(features, "", n=n, prefix_x=prefix_x, prefix_y=prefix_y,
                         suffix_x=suffix_x, suffix_y=suffix_y)

    def fit(self, df):
        pass

    def transform(self, df):
        df = df.copy()
        for feature in self.features:
            df[f"{self.prefix_x}{feature}{self.suffix_x}"] = df[f"cos(2 * pi * ({feature}) / {self.n})"]
            df[f"{self.prefix_y}{feature}{self.suffix_y}"] = df[f"sin(2 * pi * ({feature}) / {self.n})"]
        return df


@_register
class KBinsDiscretizer(Transformer):
    snake_name = "kbins_discretizer"
    default_prefix = "binned_"

    def __init__(self, features=None, prefix=None, n_bins=5, strategy="uniform"):
        super().__init__(features, prefix, n_bins=n_bins, strategy=strategy)

    def fit(self, df):
        self.bin_edges_ = {}
        for feature in self.features:
            if self.strategy == "uniform":
                vmin, vmax = df.minmax(feature)
                edges = np.linspace(vmin, vmax, self.n_bins + 1)
            elif self.strategy == "quantile":
                qs = np.linspace(0, 100, self.n_bins + 1)
                edges = np.array([float(df.percentile_approx(feature, q)) for q in qs])
                edges[0], edges[-1] = df.minmax(feature)
            else:
                raise ValueError(self.strategy)
            self.bin_edges_[feature] = edges

    def transform(self, df):
        df = df.copy()
        for feature in self.features:
            edges = np.asarray(self.bin_edges_[feature])
            inner = edges[1:-1]
            var = df.add_variable(f"kbins_edges_", inner, unique=True)
            df[self.prefix + feature] = df[f"searchsorted({var}, {feature}, side='right')"]
        return df


@_register
class GroupByTransformer(Transformer):
    """Join group-level aggregates back as features (reference:
    transformations.py GroupByTransformer)."""

    snake_name = "groupby_transformer"
    default_prefix = ""

    def __init__(self, by=None, agg=None, rsuffix="_agg", df_group=None):
        super().__init__([], "", by=by, agg=agg, rsuffix=rsuffix)
        self.df_group = df_group

    def fit(self, df):
        self.df_group = df.groupby(self.by, agg=self.agg)

    def transform(self, df):
        return df.join(self.df_group, on=self.by, rsuffix=self.rsuffix, how="left")


# ---------------------------------------------------------------------------
# PCA — chunked covariance on the MXU (reference: vaex-ml PCA)
# ---------------------------------------------------------------------------

@_register
class PCA(Transformer):
    snake_name = "pca"
    default_prefix = "PCA_"

    def __init__(self, features=None, n_components=None, prefix=None, whiten=False):
        super().__init__(features, prefix, n_components=n_components, whiten=whiten)

    def fit(self, df, progress=None):
        """Streaming Σxxᵀ (one chunked pass, matmul per chunk on the MXU)
        then eigh — never materializes the data."""
        import jax
        import jax.numpy as jnp
        k = len(self.features)
        n_total = 0
        s1 = np.zeros(k)
        cov = np.zeros((k, k))

        @jax.jit
        def chunk_stats(X):
            return X.sum(axis=0), jnp.dot(X.T, X, preferred_element_type=jnp.float64)

        for i1, i2, chunks in df.evaluate_iterator(self.features):
            X = np.column_stack([np.asarray(c, dtype=np.float64) for c in chunks])
            cs, cc = chunk_stats(X)
            s1 += np.asarray(cs)
            cov += np.asarray(cc)
            n_total += len(X)
        mean = s1 / n_total
        cov = cov / n_total - np.outer(mean, mean)
        eigvals, eigvecs = np.linalg.eigh(cov)
        order = np.argsort(eigvals)[::-1]
        self.eigen_values_ = eigvals[order]
        self.eigen_vectors_ = eigvecs[:, order]
        self.means_ = mean
        return self

    def transform(self, df):
        df = df.copy()
        n = self.n_components or len(self.features)
        for c in range(n):
            terms = []
            for i, feature in enumerate(self.features):
                w = self.eigen_vectors_[i, c]
                terms.append(f"(({feature}) - {_lit(self.means_[i])}) * {_lit(w)}")
            expr = " + ".join(terms)
            if self.whiten:
                expr = f"({expr}) / {_lit(np.sqrt(self.eigen_values_[c]))}"
            df[f"{self.prefix}{c}"] = df[expr]
        return df


PCAIncremental = PCA  # the streaming fit IS incremental


@_register
class RandomProjections(Transformer):
    snake_name = "random_projections"
    default_prefix = "random_projection_"

    def __init__(self, features=None, n_components=None, prefix=None, random_state=42):
        super().__init__(features, prefix, n_components=n_components, random_state=random_state)

    def fit(self, df):
        rng = np.random.RandomState(self.random_state)
        k = len(self.features)
        n = self.n_components or k
        self.matrix_ = rng.normal(0, 1.0 / np.sqrt(n), (k, n))

    def transform(self, df):
        df = df.copy()
        n = self.matrix_.shape[1]
        for c in range(n):
            terms = [f"({f}) * {_lit(self.matrix_[i, c])}" for i, f in enumerate(self.features)]
            df[f"{self.prefix}{c}"] = df[" + ".join(terms)]
        return df


# ---------------------------------------------------------------------------
# KMeans — Lloyd iterations as chunked jit steps (reference: vaex-ml cluster.py)
# ---------------------------------------------------------------------------

@_register
class KMeans(Transformer):
    snake_name = "kmeans"
    default_prefix = "prediction_"

    def __init__(self, features=None, n_clusters=2, prediction_label="prediction_kmeans",
                 init="random", max_iter=300, n_init=1, random_state=42, verbose=False):
        super().__init__(features, "", n_clusters=n_clusters, prediction_label=prediction_label,
                         init=init, max_iter=max_iter, n_init=n_init,
                         random_state=random_state, verbose=verbose)

    def fit(self, df, progress=None):
        import jax
        import jax.numpy as jnp
        k = self.n_clusters
        d = len(self.features)
        rng = np.random.RandomState(self.random_state)
        n = len(df)
        sample_idx = rng.choice(n, min(max(k * 10, 256), n), replace=False)
        sample = np.column_stack([np.asarray(df.evaluate(f))[sample_idx] for f in self.features]).astype(np.float32)
        best_inertia = np.inf
        best_centers = None

        @jax.jit
        def assign_accumulate(X, centers):
            d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            labels = jnp.argmin(d2, axis=1)
            inertia = jnp.min(d2, axis=1).sum()
            sums = jnp.zeros_like(centers).at[labels].add(X)
            counts = jnp.zeros(centers.shape[0], jnp.float32).at[labels].add(1.0)
            return sums, counts, inertia

        for trial in range(self.n_init):
            centers = sample[rng.choice(len(sample), k, replace=False)].copy()
            prev_inertia = np.inf
            for iteration in range(self.max_iter):
                sums = np.zeros((k, d), np.float32)
                counts = np.zeros(k, np.float32)
                inertia = 0.0
                for i1, i2, chunks in df.evaluate_iterator(self.features):
                    X = np.column_stack([np.asarray(c, dtype=np.float32) for c in chunks])
                    cs, cc, ci = assign_accumulate(X, centers)
                    sums += np.asarray(cs)
                    counts += np.asarray(cc)
                    inertia += float(ci)
                new_centers = np.where(counts[:, None] > 0, sums / np.maximum(counts[:, None], 1), centers)
                if self.verbose:
                    print(f"iter {iteration}: inertia={inertia:.4f}")
                shift = float(np.abs(new_centers - centers).max())
                centers = new_centers
                if abs(prev_inertia - inertia) <= 1e-4 * abs(inertia) or shift < 1e-6:
                    break
                prev_inertia = inertia
            if inertia < best_inertia:
                best_inertia = inertia
                best_centers = centers
        self.cluster_centers_ = np.asarray(best_centers, dtype=np.float64)
        self.inertia_ = float(best_inertia)
        return self

    def transform(self, df):
        df = df.copy()
        k = len(self.cluster_centers_)
        dist_exprs = []
        for c in range(k):
            terms = [f"(({f}) - {_lit(self.cluster_centers_[c, i])})**2" for i, f in enumerate(self.features)]
            dist_exprs.append(" + ".join(terms))
        # argmin over k distance expressions
        expr = "0"
        best = f"({dist_exprs[0]})"
        for c in range(1, k):
            expr = f"where(({dist_exprs[c]}) < ({best}), {c}, {expr})"
            best = f"minimum(({dist_exprs[c]}), {best})"
        df[self.prediction_label] = df[expr]
        return df

    def predict(self, df):
        return self.transform(df)[self.prediction_label].values


# ---------------------------------------------------------------------------
# sklearn bridge (reference: vaex-ml sklearn.py Predictor / IncrementalPredictor)
# ---------------------------------------------------------------------------

@_register
class Predictor(Transformer):
    """Wrap any sklearn-style model; predictions come back as a lazy UDF
    column (reference: vaex-ml sklearn.py Predictor)."""

    snake_name = "sklearn_predictor"
    default_prefix = ""

    def __init__(self, model=None, features=None, target=None, prediction_name="prediction"):
        super().__init__(features, "", target=target, prediction_name=prediction_name)
        self.model = model

    def fit(self, df, **kwargs):
        X = np.column_stack([np.asarray(df.evaluate(f)) for f in self.features])
        y = np.asarray(df.evaluate(self.target))
        self.model.fit(X, y, **kwargs)
        return self

    def transform(self, df):
        df = df.copy()
        model = self.model

        def predict(*columns):
            X = np.column_stack([np.asarray(c) for c in columns])
            return model.predict(X)

        expr = df.apply(predict, arguments=[df[f] for f in self.features])
        df[self.prediction_name] = expr
        return df

    def predict(self, df):
        X = np.column_stack([np.asarray(df.evaluate(f)) for f in self.features])
        return self.model.predict(X)

    def state_get(self):
        state = {k: _encode_value(v) for k, v in self.__dict__.items() if k != "model"}
        state["model"] = base64.b64encode(pickle.dumps(self.model)).decode("ascii")
        return {"cls": self.snake_name, "state": state}

    def state_set(self, state):
        spec = dict(state["state"])
        self.model = pickle.loads(base64.b64decode(spec.pop("model")))
        for k, v in spec.items():
            setattr(self, k, _decode_value(v))
        return self


@_register
class IncrementalPredictor(Predictor):
    """Chunked partial_fit for out-of-core training (reference: vaex-ml
    sklearn.py IncrementalPredictor)."""

    snake_name = "sklearn_incremental_predictor"

    def __init__(self, model=None, features=None, target=None, prediction_name="prediction",
                 batch_size=1024 * 1024, num_epochs=1, shuffled=False, partial_fit_kwargs=None):
        super().__init__(model=model, features=features, target=target, prediction_name=prediction_name)
        self.batch_size = batch_size
        self.num_epochs = num_epochs
        self.shuffled = shuffled
        self.partial_fit_kwargs = partial_fit_kwargs or {}

    def fit(self, df, **kwargs):
        for epoch in range(self.num_epochs):
            dfe = df.shuffle(random_state=epoch) if self.shuffled else df
            for i1, i2, chunks in dfe.evaluate_iterator(self.features + [self.target], chunk_size=self.batch_size):
                X = np.column_stack([np.asarray(c) for c in chunks[:-1]])
                y = np.asarray(chunks[-1])
                self.model.partial_fit(X, y, **self.partial_fit_kwargs)
        return self


@register_dataframe_accessor("ml")
class DataFrameAccessorML:
    """df.ml accessor (reference: vaex-ml/vaex/ml/__init__.py)."""

    def __init__(self, df):
        self.df = df

    @property
    def tensorflow(self):
        """tf.data bridge (import-gated; reference: vaex-ml/vaex/ml/
        tensorflow.py DataFrameAccessorTensorflow)."""
        from .tensorflow import DataFrameAccessorTensorflow
        return DataFrameAccessorTensorflow(self)

    def train_test_split(self, test_size=0.2, verbose=True):
        """Ordered split (reference warns about non-shuffled split too)."""
        n = len(self.df)
        n_test = int(round(test_size * n)) if test_size < 1 else int(test_size)
        return self.df[: n - n_test], self.df[n - n_test:]

    def state_transfer(self):
        from ..dataframe import DataFrameLocal
        state = self.df.state_get()

        class StateTransfer:
            def __init__(self, state):
                self.state = state

            def transform(self, df):
                df = df.copy()
                df.state_set(self.state)
                return df

        return StateTransfer(state)

    # convenience constructors
    def pca(self, features=None, n_components=None, **kwargs):
        pca = PCA(features=features, n_components=n_components, **kwargs)
        pca.fit(self.df)
        return pca

    def kmeans(self, features=None, n_clusters=2, **kwargs):
        km = KMeans(features=features, n_clusters=n_clusters, **kwargs)
        km.fit(self.df)
        return km

    def standard_scaler(self, features=None, **kwargs):
        t = StandardScaler(features=features, **kwargs)
        t.fit(self.df)
        return t

    def minmax_scaler(self, features=None, **kwargs):
        t = MinMaxScaler(features=features, **kwargs)
        t.fit(self.df)
        return t

    def label_encoder(self, features=None, **kwargs):
        t = LabelEncoder(features=features, **kwargs)
        t.fit(self.df)
        return t

    def one_hot_encoder(self, features=None, **kwargs):
        t = OneHotEncoder(features=features, **kwargs)
        t.fit(self.df)
        return t


from . import metrics  # noqa: E402,F401
