"""Built-in demo datasets, generated locally.

Counterpart of the reference's vaex.datasets (titanic/iris/taxi downloads):
this environment has no egress, so the classic datasets are synthesized
deterministically with matching schemas — enough for docs, tests and ML
examples."""

from __future__ import annotations

import numpy as np


def titanic(n=1309, seed=0):
    """Synthetic titanic-shaped dataset (same columns as the classic)."""
    import vaex_tpu as vaex
    rng = np.random.RandomState(seed)
    pclass = rng.choice([1, 2, 3], n, p=[0.25, 0.21, 0.54])
    sex = rng.choice(["female", "male"], n, p=[0.36, 0.64])
    age = np.clip(rng.normal(29, 14, n), 0.2, 80)
    age[rng.rand(n) < 0.2] = np.nan
    fare = np.clip(rng.lognormal(2.9, 1.0, n) * (4 - pclass), 0, 512)
    # survival correlates with sex and class, like the real data
    p_survive = 0.74 * (sex == "female") + 0.19 * (sex == "male")
    p_survive = p_survive + (pclass == 1) * 0.1 - (pclass == 3) * 0.05
    survived = rng.rand(n) < p_survive
    sibsp = rng.poisson(0.5, n)
    parch = rng.poisson(0.4, n)
    embarked = rng.choice(["S", "C", "Q"], n, p=[0.7, 0.2, 0.1])
    return vaex.from_arrays(
        pclass=pclass.astype(np.int64), survived=survived,
        sex=vaex.string_column(list(sex)), age=age, sibsp=sibsp, parch=parch,
        fare=fare, embarked=vaex.string_column(list(embarked)))


def iris(seed=0):
    """Synthetic iris-shaped dataset (three separable clusters)."""
    import vaex_tpu as vaex
    rng = np.random.RandomState(seed)
    means = {"setosa": (5.0, 3.4, 1.5, 0.25), "versicolor": (5.9, 2.8, 4.3, 1.3),
             "virginica": (6.6, 3.0, 5.6, 2.0)}
    rows = {k: [] for k in ["sepal_length", "sepal_width", "petal_length", "petal_width"]}
    classes = []
    class_codes = []
    for ci, (name, mu) in enumerate(means.items()):
        for j, col in enumerate(rows):
            rows[col].append(rng.normal(mu[j], 0.3, 50))
        classes += [name] * 50
        class_codes += [ci] * 50
    arrays = {col: np.concatenate(vals) for col, vals in rows.items()}
    return vaex.from_arrays(**arrays, class_=np.array(class_codes, dtype=np.int64),
                            species=vaex.string_column(classes))


def helmi_de_zeeuw(n=330_000, seed=42):
    """Alias of vaex_tpu.example() (the reference's demo file)."""
    import vaex_tpu as vaex
    return vaex.example(n, seed)


def taxi(n=1_000_000, seed=3):
    """Synthetic NYC-taxi-shaped dataset."""
    import vaex_tpu as vaex
    rng = np.random.RandomState(seed)
    distance = np.abs(rng.gamma(2.0, 1.5, n))
    fare = 2.5 + distance * 2.0 + rng.normal(0, 1, n)
    start = np.datetime64("2015-01-01")
    pickup = start + (rng.rand(n) * 365 * 24 * 3600).astype("timedelta64[s]")
    return vaex.from_arrays(
        pickup_datetime=pickup.astype("M8[ns]"),
        passenger_count=rng.randint(1, 7, n).astype(np.int8),
        trip_distance=distance,
        fare_amount=fare,
        tip_amount=np.clip(fare * rng.beta(2, 8, n), 0, None),
        pickup_zone=rng.randint(0, 263, n).astype(np.int16),
        dropoff_zone=rng.randint(0, 263, n).astype(np.int16),
    )
