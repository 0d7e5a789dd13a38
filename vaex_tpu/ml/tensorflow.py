"""tensorflow / keras bridge (import-gated; tf is not in this environment).

TPU-native counterpart of /root/reference/packages/vaex-ml/vaex/ml/
tensorflow.py (:1-202 DataFrameAccessorTensorflow): stream DataFrame chunks
into ``tf.data.Dataset`` pipelines without materializing the frame.  The
module imports cleanly without tensorflow; constructing the accessor's
datasets raises a helpful ImportError (headless tests drive it with a fake
tensorflow module)."""

from __future__ import annotations

import numpy as np


def _tf():
    try:
        import tensorflow as tf
        return tf
    except ImportError as e:  # pragma: no cover - exercised via fakes
        raise ImportError("tensorflow is required for df.ml.tensorflow; "
                          "pip install tensorflow") from e


class DataFrameAccessorTensorflow:
    """Reached as ``df.ml.tensorflow`` (reference: ml/tensorflow.py:24)."""

    def __init__(self, ml_accessor):
        self.ml = ml_accessor
        self.df = ml_accessor.df

    def to_dataset(self, features=None, target=None, chunk_size=1024,
                   as_dict=True, tf=None):
        """Stream (features[, target]) chunk dicts as a tf.data.Dataset
        (reference: make_input_function/to_dataset, ml/tensorflow.py:29-120)."""
        tf = tf or _tf()
        df = self.df
        features = features or [c for c in df.get_column_names() if c != target]

        def generator():
            for i1, i2, chunks in df.evaluate_iterator(features + ([target] if target else []),
                                                       chunk_size=chunk_size):
                arrays = [np.asarray(c) for c in chunks]
                feats = dict(zip(features, arrays[:len(features)])) if as_dict \
                    else tuple(arrays[:len(features)])
                if target:
                    yield feats, arrays[-1]
                else:
                    yield feats

        def sig_of(name):
            dt = df.data_type(name).numpy
            return tf.TensorSpec(shape=(None,), dtype=dt)

        feat_sig = ({f: sig_of(f) for f in features} if as_dict
                    else tuple(sig_of(f) for f in features))
        signature = (feat_sig, sig_of(target)) if target else feat_sig
        return tf.data.Dataset.from_generator(generator, output_signature=signature)

    def make_input_function(self, features=None, target=None, chunk_size=1024,
                            repeat=None, shuffle=False, tf=None):
        """Estimator-style input_fn factory (reference: ml/tensorflow.py:123)."""

        def input_fn():
            ds = self.to_dataset(features=features, target=target,
                                 chunk_size=chunk_size, tf=tf)
            if shuffle:
                ds = ds.shuffle(buffer_size=8)
            if repeat:
                ds = ds.repeat(repeat)
            return ds

        return input_fn
