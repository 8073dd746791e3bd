"""Pre-trained sklearn model interop (reference entry point 3).

The reference ships pickled sklearn models — ``models/GTZAN.model.pkl``
(``OneVsRestClassifier(SVC(kernel='linear'))``), ``GTZAN.scaler.pkl``
(``StandardScaler``) and ``GTZAN.labelenc.pkl`` (``LabelEncoder``) —
loaded by ``rp_classify.load_model`` (rp_classify.py:110-158) and
applied by ``rp_classify.classify`` (rp_classify.py:66-71). This
container has no sklearn, and blindly unpickling is arbitrary code
execution anyway, so this module does neither: a RESTRICTED unpickler
whitelists the handful of numpy reconstruction globals and materializes
every ``sklearn.*`` class as an inert attribute bag (pickles of plain
estimators carry only ``__dict__`` state — no code runs). The linear
algebra is then re-executed with numpy / Spark:

- ``StandardScaler.transform``  -> ``(x - mean_) / scale_``
- binary ``SVC`` decision       -> ``x @ (dual_coef_ @ SV).T + intercept_``
  (the PUBLIC ``dual_coef_``/``intercept_`` — sklearn stores them
  sign-flipped from the private libsvm copies so that positive
  decisions mean ``classes_[1]``; verified on the shipped model where
  ``dual_coef_ == -_dual_coef_``); rbf/poly/sigmoid kernels use the
  dual form directly.
- ``OneVsRestClassifier.predict`` -> per-estimator decision ravel,
  running ``np.maximum`` + "last index wins ties" argmax — the exact
  loop sklearn runs for y_type 'multiclass'.
- ``LabelEncoder.inverse_transform`` -> ``classes_[pred]`` (py2 str
  classes arrive as bytes; decoded latin-1).

The scale path is :func:`classify_vectors`: the model folds to one
(n_classes x dim) weight matrix + intercepts, broadcast inside an
Arrow-batched pandas stage — scoring a 100 TB feature table is an
embarrassingly parallel scan, exactly like the centroid/logreg
predictors in operators/classify.py.
"""

from __future__ import annotations

import io
import pickle
from typing import Iterable

import numpy as np

__all__ = [
    "SklearnPickleError",
    "load_sklearn_pickle",
    "LinearOvRSVM",
    "load_reference_model",
    "classify_vectors",
]


class SklearnPickleError(ValueError):
    """Raised for refused globals or unsupported model shapes."""


class _EstimatorState:
    """Inert attribute bag standing in for any sklearn class."""

    def __init__(self, *args, **kwargs):  # old protos call __init__
        self._init_args = args
        self._init_kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:  # pragma: no cover - no shipped model uses tuple state
            self.__dict__["_state"] = state


# numpy globals that array pickles legitimately need; everything else
# (os.system, subprocess, builtins.eval, ...) is refused loudly.
_NUMPY_GLOBALS = {
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
}


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        if (module, name) in _NUMPY_GLOBALS:
            import numpy.core.multiarray as multiarray

            if module == "numpy":
                return getattr(np, name)
            return getattr(multiarray, name)
        if module == "sklearn" or module.startswith("sklearn."):
            bag = type(name, (_EstimatorState,), {})
            bag.__module__ = module
            return bag
        raise SklearnPickleError(
            f"refused pickle global {module}.{name}: only numpy array "
            "reconstruction and inert sklearn state bags are allowed"
        )


def load_sklearn_pickle(path: str):
    """Load a pickle with sklearn classes replaced by attribute bags.

    ``encoding='latin1'`` decodes python-2 pickles (the reference's
    models are cPickle protocol 2 from py2 — rp_classify.py:113-124);
    py2 ``str`` leaves become ``bytes``.
    """
    with open(path, "rb") as f:
        return _RestrictedUnpickler(f, encoding="latin1").load()


def _as_str(x) -> str:
    return x.decode("latin1") if isinstance(x, bytes) else str(x)


def _svc_decision(est, X: np.ndarray) -> np.ndarray:
    """Binary SVC decision values (positive -> classes_[1]).

    Linear kernels use the primal identity ``coef_ = dual_coef_ @
    support_vectors_``; other kernels evaluate the dual form.
    """
    kernel = _as_str(getattr(est, "kernel", "linear"))
    sv = np.asarray(est.support_vectors_, dtype=np.float64)
    dual = np.asarray(est.dual_coef_, dtype=np.float64)
    intercept = float(np.asarray(est.intercept_).ravel()[0])
    if kernel == "linear":
        w = dual @ sv
        return X @ w.ravel() + intercept
    gamma = getattr(est, "_gamma", None)
    if not gamma:
        gamma = 1.0 / X.shape[1]  # sklearn's gamma='auto'
    if kernel == "rbf":
        sq = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * (X @ sv.T)
            + (sv * sv).sum(axis=1)[None, :]
        )
        K = np.exp(-gamma * sq)
    elif kernel == "poly":
        K = (gamma * (X @ sv.T) + float(est.coef0)) ** int(est.degree)
    elif kernel == "sigmoid":
        K = np.tanh(gamma * (X @ sv.T) + float(est.coef0))
    else:
        raise SklearnPickleError(f"unsupported SVC kernel {kernel!r}")
    return K @ dual.ravel() + intercept


class LinearOvRSVM:
    """A reference-pickled OvR SVC folded to plain arrays.

    Attributes: ``coef`` (n_classes, dim), ``intercept`` (n_classes,),
    ``labels`` (n_classes genre strings), optional ``scaler_mean`` /
    ``scaler_scale`` (dim,). ``predict`` replicates sklearn's
    ``OneVsRestClassifier.predict`` bit-for-bit including the
    later-estimator-wins tie rule.
    """

    def __init__(self, estimators, class_ids, labels,
                 scaler_mean=None, scaler_scale=None):
        self.estimators = list(estimators)
        self.class_ids = np.asarray(class_ids)
        self.labels = [
            _as_str(labels[int(c)]) if labels is not None else str(int(c))
            for c in self.class_ids
        ]
        self.scaler_mean = scaler_mean
        self.scaler_scale = scaler_scale
        dims = set()
        rows = []
        icpts = []
        for est in self.estimators:
            kernel = _as_str(getattr(est, "kernel", "linear"))
            dims.add(int(np.asarray(est.support_vectors_).shape[1]))
            if kernel == "linear":
                rows.append(
                    (np.asarray(est.dual_coef_, dtype=np.float64)
                     @ np.asarray(est.support_vectors_,
                                  dtype=np.float64)).ravel()
                )
                icpts.append(float(np.asarray(est.intercept_).ravel()[0]))
        if len(dims) != 1:
            raise SklearnPickleError(f"inconsistent estimator dims {dims}")
        self.dim = dims.pop()
        self.all_linear = len(rows) == len(self.estimators)
        self.coef = np.vstack(rows) if self.all_linear else None
        self.intercept = np.asarray(icpts) if self.all_linear else None

    # -- numpy surface -------------------------------------------------
    def transform(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        if self.scaler_mean is not None:
            X = X - self.scaler_mean
        if self.scaler_scale is not None:
            X = X / self.scaler_scale
        return X

    def decision_function(self, X: np.ndarray,
                          scale: bool = True) -> np.ndarray:
        X = self.transform(X) if scale else np.asarray(X, dtype=np.float64)
        if X.shape[1] != self.dim:
            raise SklearnPickleError(
                f"feature dim {X.shape[1]} != model dim {self.dim}")
        if self.all_linear:
            return X @ self.coef.T + self.intercept
        return np.column_stack(
            [_svc_decision(est, X) for est in self.estimators])

    def predict(self, X: np.ndarray, scale: bool = True) -> np.ndarray:
        dec = self.decision_function(X, scale=scale)
        # sklearn multiclass.py OvR loop: maxima updated per estimator,
        # argmax reassigned wherever maxima == this estimator's score,
        # so exact ties resolve to the LAST estimator index.
        maxima = np.full(dec.shape[0], -np.inf)
        argmaxima = np.zeros(dec.shape[0], dtype=np.int64)
        for i in range(dec.shape[1]):
            np.maximum(maxima, dec[:, i], out=maxima)
            argmaxima[maxima == dec[:, i]] = i
        return argmaxima

    def predict_labels(self, X: np.ndarray, scale: bool = True) -> list[str]:
        return [self.labels[i] for i in self.predict(X, scale=scale)]

    # -- folded constants for SQL oracles / broadcast -------------------
    def folded_weights(self) -> tuple[np.ndarray, np.ndarray]:
        """(W, b) with the scaler folded in: decision = X @ W.T + b."""
        if not self.all_linear:
            raise SklearnPickleError("folded weights need linear kernels")
        scale = (np.ones(self.dim) if self.scaler_scale is None
                 else self.scaler_scale)
        mean = (np.zeros(self.dim) if self.scaler_mean is None
                else self.scaler_mean)
        w = self.coef / scale
        b = self.intercept - w @ mean
        return w, b


def load_reference_model(basename: str) -> LinearOvRSVM:
    """Load a reference ``<basename>.{model,scaler,labelenc}.pkl`` trio
    (the layout rp_classify.load_model expects, rp_classify.py:110-158;
    scaler and labelenc are optional there and here)."""
    import os

    model = load_sklearn_pickle(basename + ".model.pkl")
    if not hasattr(model, "estimators_"):
        # a bare SVC: wrap as a single-estimator model over its classes
        raise SklearnPickleError(
            "expected an OneVsRestClassifier pickle with estimators_")
    class_ids = np.asarray(model.label_binarizer_.classes_)
    scaler_mean = scaler_scale = None
    scaler_path = basename + ".scaler.pkl"
    if os.path.isfile(scaler_path):
        scaler = load_sklearn_pickle(scaler_path)
        if getattr(scaler, "with_mean", True):
            scaler_mean = np.asarray(scaler.mean_, dtype=np.float64)
        if getattr(scaler, "with_std", True):
            scaler_scale = np.asarray(scaler.scale_, dtype=np.float64)
    labels = None
    le_path = basename + ".labelenc.pkl"
    if os.path.isfile(le_path):
        labels = list(load_sklearn_pickle(le_path).classes_)
    return LinearOvRSVM(model.estimators_, class_ids, labels,
                        scaler_mean, scaler_scale)


def classify_vectors(df, model: LinearOvRSVM, vec_col: str = "features",
                     out_col: str = "genre", score_col: str | None = None):
    """Score a feature-vector column with a loaded reference model.

    One Arrow-batched pandas stage; the folded (n_classes x dim) weight
    matrix rides the task closure (a few KB) — no shuffle, no
    per-row Python. Output keeps all input columns plus the predicted
    label and optionally the winning decision score.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    w, b = model.folded_weights()
    labels = list(model.labels)

    def score(batches: Iterable["pd.DataFrame"]):
        for batch in batches:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
            ) if len(batch) else np.zeros((0, w.shape[1]))
            dec = vecs @ w.T + b
            maxima = np.full(dec.shape[0], -np.inf)
            arg = np.zeros(dec.shape[0], dtype=np.int64)
            for i in range(dec.shape[1]):
                np.maximum(maxima, dec[:, i], out=maxima)
                arg[maxima == dec[:, i]] = i
            out = batch.copy()
            out[out_col] = [labels[i] for i in arg]
            if score_col is not None:
                out[score_col] = maxima
            yield out

    # build a FRESH StructType: df.schema.add() mutates the DataFrame's
    # cached schema object, which breaks mapInPandas analysis (the
    # planner then fails to resolve the new column — PySpark 4.1 trap)
    fields = list(df.schema.fields) + [StructField(out_col, StringType())]
    if score_col is not None:
        fields.append(StructField(score_col, DoubleType()))
    return df.mapInPandas(score, StructType(fields))
