import numpy as np
import pytest

import vaex_tpu as vaex
import vaex_tpu.ml as ml


@pytest.fixture
def df_ml():
    rng = np.random.RandomState(0)
    n = 1000
    x = rng.normal(5, 2, n)
    y = 3 * x + rng.normal(0, 0.5, n)
    g = rng.randint(0, 3, n)
    import pyarrow as pa
    color = pa.array([["red", "green", "blue"][i] for i in g])
    target = (x > 5).astype(np.int64)
    return vaex.from_arrays(x=x, y=y, g=g, color=color, target=target)


def test_standard_scaler(df_ml):
    scaler = ml.StandardScaler(features=["x", "y"])
    out = scaler.fit_transform(df_ml)
    assert abs(float(out.mean("standard_scaled_x"))) < 1e-8
    assert float(out.std("standard_scaled_x")) == pytest.approx(1.0, rel=1e-6)


def test_minmax_scaler(df_ml):
    out = ml.MinMaxScaler(features=["x"]).fit_transform(df_ml)
    assert float(out.min("minmax_scaled_x")) == pytest.approx(0)
    assert float(out.max("minmax_scaled_x")) == pytest.approx(1)


def test_maxabs_robust(df_ml):
    out = ml.MaxAbsScaler(features=["x"]).fit_transform(df_ml)
    assert float(out.max("absmax_scaled_x")) <= 1.0 + 1e-9
    out = ml.RobustScaler(features=["x"]).fit_transform(df_ml)
    med = float(out.percentile_approx("robust_scaled_x", 50))
    assert abs(med) < 0.05


def test_label_encoder(df_ml):
    enc = ml.LabelEncoder(features=["color"])
    out = enc.fit_transform(df_ml)
    codes = np.asarray(out.evaluate("label_encoded_color"))
    assert set(np.unique(codes)) == {0, 1, 2}


def test_one_hot(df_ml):
    enc = ml.OneHotEncoder(features=["color"])
    out = enc.fit_transform(df_ml)
    names = out.get_column_names()
    assert "color_red" in names and "color_blue" in names and "color_green" in names
    total = sum(float(out.sum(f"color_{c}")) for c in ["red", "green", "blue"])
    assert total == len(df_ml)


def test_frequency_encoder(df_ml):
    enc = ml.FrequencyEncoder(features=["color"])
    out = enc.fit_transform(df_ml)
    freq = np.asarray(out.evaluate("frequency_encoded_color"))
    assert np.all(freq > 0) and np.all(freq < 1)
    assert float(freq.sum()) == pytest.approx(
        sum((np.asarray(df_ml.evaluate('g')) == i).sum()**2 for i in range(3)) / len(df_ml))


def test_bayesian_target_encoder(df_ml):
    enc = ml.BayesianTargetEncoder(features=["color"], target="target", weight=10)
    out = enc.fit_transform(df_ml)
    vals = np.asarray(out.evaluate("mean_encoded_color"))
    assert np.isfinite(vals).all()


def test_woe_encoder(df_ml):
    enc = ml.WeightOfEvidenceEncoder(features=["color"], target="target")
    out = enc.fit_transform(df_ml)
    vals = np.asarray(out.evaluate("woe_encoded_color"))
    assert np.isfinite(vals).all()


def test_cycle_transformer():
    df = vaex.from_arrays(hour=np.arange(24))
    out = ml.CycleTransformer(features=["hour"], n=24).fit_transform(df)
    x = np.asarray(out.evaluate("hour_x"))
    y = np.asarray(out.evaluate("hour_y"))
    assert np.allclose(x**2 + y**2, 1.0)


def test_kbins(df_ml):
    t = ml.KBinsDiscretizer(features=["x"], n_bins=4, strategy="uniform")
    out = t.fit_transform(df_ml)
    bins = np.asarray(out.evaluate("binned_x"))
    assert bins.min() >= 0 and bins.max() <= 3


def test_pca(df_ml):
    pca = ml.PCA(features=["x", "y"], n_components=2)
    pca.fit(df_ml)
    out = pca.transform(df_ml)
    p0 = np.asarray(out.evaluate("PCA_0"))
    p1 = np.asarray(out.evaluate("PCA_1"))
    # compare against numpy PCA
    X = np.column_stack([df_ml.evaluate("x"), df_ml.evaluate("y")])
    Xc = X - X.mean(axis=0)
    cov = np.cov(Xc.T, bias=True)
    eigvals = np.linalg.eigvalsh(cov)[::-1]
    assert pca.eigen_values_ == pytest.approx(eigvals, rel=1e-6)
    # components are uncorrelated
    assert abs(np.corrcoef(p0, p1)[0, 1]) < 1e-5


def test_kmeans():
    rng = np.random.RandomState(1)
    c1 = rng.normal(0, 0.3, (500, 2))
    c2 = rng.normal(5, 0.3, (500, 2))
    X = np.vstack([c1, c2])
    df = vaex.from_arrays(a=X[:, 0], b=X[:, 1])
    km = ml.KMeans(features=["a", "b"], n_clusters=2, random_state=2)
    km.fit(df)
    out = km.transform(df)
    labels = np.asarray(out.evaluate("prediction_kmeans"))
    # clusters are pure
    first, second = labels[:500], labels[500:]
    assert len(np.unique(first)) == 1 and len(np.unique(second)) == 1
    assert first[0] != second[0]


def test_sklearn_predictor(df_ml):
    from sklearn.linear_model import LinearRegression
    model = ml.Predictor(model=LinearRegression(), features=["x"], target="y", prediction_name="pred")
    model.fit(df_ml)
    out = model.transform(df_ml)
    mae = ml.metrics.mean_absolute_error(out, "y", "pred")
    assert mae < 1.0


def test_incremental_predictor(df_ml):
    from sklearn.linear_model import SGDRegressor
    model = ml.IncrementalPredictor(model=SGDRegressor(), features=["x"], target="y",
                                    batch_size=128, num_epochs=3)
    model.fit(df_ml)
    out = model.transform(df_ml)
    r2 = ml.metrics.r2_score(out, "y", "pred" if "pred" in out.get_column_names() else "prediction")
    assert r2 > 0.8


def test_metrics(df_ml):
    df = df_ml.copy()
    df["pred_class"] = df["_astype(x > 5, 'int64')"]
    acc = ml.metrics.accuracy_score(df, "target", "pred_class")
    assert acc == 1.0
    df["pred_noisy"] = df["_astype(x > 5.5, 'int64')"]
    acc = ml.metrics.accuracy_score(df, "target", "pred_noisy")
    assert 0.5 < acc < 1.0
    p = ml.metrics.precision_score(df, "target", "pred_noisy")
    r = ml.metrics.recall_score(df, "target", "pred_noisy")
    f1 = ml.metrics.f1_score(df, "target", "pred_noisy")
    assert 0 < r < 1 and p > 0.9
    assert f1 == pytest.approx(2 * p * r / (p + r))
    cm = ml.metrics.confusion_matrix(df, "target", "pred_noisy")
    assert cm.sum() == len(df)
    # regression metrics vs sklearn oracle
    from sklearn.metrics import mean_squared_error as sk_mse, r2_score as sk_r2
    y = np.asarray(df.evaluate("y"))
    x3 = np.asarray(df.evaluate("x")) * 3
    df["pred_y"] = df["x * 3"]
    assert ml.metrics.mean_squared_error(df, "y", "pred_y") == pytest.approx(sk_mse(y, x3))
    assert ml.metrics.r2_score(df, "y", "pred_y") == pytest.approx(sk_r2(y, x3), rel=1e-6)


def test_transformer_state_roundtrip(df_ml):
    scaler = ml.StandardScaler(features=["x"])
    scaler.fit(df_ml)
    state = scaler.state_get()
    restored = ml.Transformer.from_state(state)
    out = restored.transform(df_ml)
    assert abs(float(out.mean("standard_scaled_x"))) < 1e-8


def test_groupby_transformer(df_ml):
    t = ml.GroupByTransformer(by="g", agg={"mean_x": vaex.agg.mean("x")})
    out = t.fit_transform(df_ml)
    assert "mean_x" in out.get_column_names()
    vals = np.asarray(out.evaluate("mean_x"))
    g = np.asarray(df_ml.evaluate("g"))
    x = np.asarray(df_ml.evaluate("x"))
    for gi in range(3):
        assert np.allclose(vals[g == gi], x[g == gi].mean())


def test_train_test_split(df_ml):
    train, test = df_ml.ml.train_test_split(test_size=0.2)
    assert len(train) == 800 and len(test) == 200


def test_state_transfer_pipeline(df_ml):
    df = df_ml.copy()
    scaler = ml.StandardScaler(features=["x"])
    df2 = scaler.fit_transform(df)
    transfer = df2.ml.state_transfer()
    fresh = df_ml.copy()
    out = transfer.transform(fresh)
    assert "standard_scaled_x" in out.get_column_names()


def test_boosted_wrappers_gated():
    """lightgbm/xgboost/catboost wrappers exist with the reference API and
    fail with a clear ImportError when the library is absent; the sklearn
    HistGradientBoosting path covers the model family in-env."""
    import pytest
    from vaex_tpu.ml.boosted import LightGBMModel, XGBoostModel, CatBoostModel
    df = vaex.from_arrays(a=np.arange(100.0), b=np.arange(100.0)[::-1],
                          y=(np.arange(100) % 2).astype(float))
    for cls in (LightGBMModel, XGBoostModel, CatBoostModel):
        m = cls(features=["a", "b"], target="y", params={}, num_boost_round=3)
        try:
            m.fit(df)
        except ImportError as e:
            assert cls.library in str(e) and "HistGradientBoosting" in str(e)
        else:  # library present in some future env: transform must work
            out = m.transform(df)
            assert "prediction" in out.get_column_names()
    # the always-available equivalent through the generic Predictor
    from sklearn.ensemble import HistGradientBoostingRegressor
    from vaex_tpu.ml import Predictor
    p = Predictor(model=HistGradientBoostingRegressor(max_iter=10),
                  features=["a", "b"], target="y", prediction_name="pred")
    p.fit(df)
    out = p.transform(df)
    pred = np.asarray(out.evaluate("pred"))
    assert pred.shape == (100,) and np.isfinite(pred).all()


def test_incubator_river_wrapper():
    """RiverModel streams chunks into learn_many (reference:
    ml/incubator/river.py); driven with a fake river estimator."""
    from vaex_tpu.ml.incubator import RiverModel

    class FakeRiver:
        def __init__(self):
            self.batches = []
            self.coef = 2.0

        def learn_many(self, X, y):
            self.batches.append((len(X), list(X.columns)))

        def predict_many(self, X):
            return X["a"].values * self.coef

    df = vaex.from_arrays(a=np.arange(10.0), t=np.arange(10.0) * 2)
    m = RiverModel(FakeRiver(), ["a"], "t", batch_size=4)
    m.fit(df)
    assert [b[0] for b in m.model.batches] == [4, 4, 2]
    out = m.transform(df)
    np.testing.assert_array_equal(out.evaluate("prediction"), np.arange(10.0) * 2)


def test_incubator_annoy_wrapper():
    """ANNOYModel builds a chunked index (reference: ml/incubator/annoy.py);
    driven with a fake annoy module."""
    import types
    from vaex_tpu.ml.incubator import ANNOYModel

    class FakeIndex:
        def __init__(self, dim, metric):
            self.items = {}
            self.built = None

        def add_item(self, i, vec):
            self.items[i] = vec

        def build(self, n_trees):
            self.built = n_trees

        def get_nns_by_vector(self, vec, k):
            dists = sorted(self.items, key=lambda i: sum((a - b) ** 2 for a, b in zip(self.items[i], vec)))
            return dists[:k]

    fake = types.SimpleNamespace(AnnoyIndex=FakeIndex)
    df = vaex.from_arrays(x=np.arange(6.0), y=np.arange(6.0))
    m = ANNOYModel(["x", "y"], n_trees=3, n_neighbours=2, batch_size=4)
    m.fit(df, annoy_module=fake)
    assert m.index_builder.built == 3 and len(m.index_builder.items) == 6
    nn = m.predict(df)
    assert nn.shape == (6, 2)
    np.testing.assert_array_equal(nn[:, 0], np.arange(6))  # self is nearest
