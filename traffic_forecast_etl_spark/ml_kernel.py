"""RBF kernel machine — the SURVEY M3 fidelity path.

The reference's third model is an RBF-kernel SVR
(Traffic-Prediction-Modelling.ipynb cell 19, ≈L336: MAE 0.0841 /
Pearson R 0.7820 — the notebook's losing model; SURVEY M3). MLlib has
no kernel SVR, and the engine's recommended substitute remains
GBTRegressor (ml.py). This module closes the fidelity gap for users
who want the reference's actual hypothesis class (an RBF kernel
machine) rather than a tree substitute:

  - ``fit_kernel_model`` prefers ``sklearn.svm.SVR`` when sklearn is
    importable (bit-faithful to the reference), and otherwise trains
    :class:`RBFKernelRidge` — a pure-numpy RBF kernel ridge
    regressor. Same kernel, same feature standardization; it differs
    from epsilon-SVR only in the loss (squared vs epsilon-insensitive)
    and is closed-form + deterministic, which the quality band in
    tests/test_ml.py absorbs.
  - Inference runs distributed through the broadcast Arrow-batched
    ``predict_udf`` (functions/inference.py) — the canonical
    "non-MLlib model on Spark" pattern (SURVEY U3): the driver fits
    on collected training data (exactly the reference's regime: its
    sklearn fit is single-node too), executors score batches.

Scale note: kernel methods are O(n²) in TRAINING rows by
construction — that is a property of the reference's model choice,
not of this engine; ``max_train`` caps the gram matrix with a
deterministic stride subsample (Nyström-style) so the driver fit
stays bounded no matter what the caller passes. Distributed SCORING
is O(rows · n_train · d) across executors and scales with the
cluster.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame

from .functions.inference import predict_udf
from .ml import FEATURE_COLS, LABEL_COL


class RBFKernelRidge:
    """Kernel ridge regression with an RBF kernel, pure numpy.

    fit: standardize features, solve (K + alpha·I) a = (y - ȳ) via
    Cholesky (K is symmetric PD after the ridge). predict:
    K(X*, X_train) @ a + ȳ. ``gamma`` follows sklearn's "scale"
    convention (1 / (d · var)) computed on the standardized matrix.
    Picklable by value → broadcastable through predict_udf.
    """

    def __init__(self, alpha: float = 0.3, gamma: float | None = None):
        self.alpha = alpha
        self.gamma = gamma

    def _standardize(self, X: np.ndarray) -> np.ndarray:
        return (X - self._mu) / self._sigma

    def fit(self, X: np.ndarray, y: np.ndarray) -> "RBFKernelRidge":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self._mu = X.mean(axis=0)
        self._sigma = X.std(axis=0)
        self._sigma[self._sigma == 0] = 1.0
        Xs = self._standardize(X)
        g = self.gamma if self.gamma is not None else 1.0 / (Xs.shape[1] * Xs.var())
        self._g = g
        K = self._kernel(Xs, Xs)
        K[np.diag_indices_from(K)] += self.alpha
        c = np.linalg.cholesky(K)
        self._ybar = y.mean()
        rhs = y - self._ybar
        self._dual = np.linalg.solve(c.T, np.linalg.solve(c, rhs))
        self._Xtrain = Xs
        return self

    def _kernel(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        # ||a-b||² = ||a||² + ||b||² - 2ab — one BLAS matmul, no loops
        sq = (
            (A * A).sum(axis=1)[:, None]
            + (B * B).sum(axis=1)[None, :]
            - 2.0 * (A @ B.T)
        )
        np.maximum(sq, 0.0, out=sq)
        return np.exp(-self._g * sq)

    def predict(self, X: np.ndarray) -> np.ndarray:
        Xs = self._standardize(np.asarray(X, dtype=np.float64))
        return self._kernel(Xs, self._Xtrain) @ self._dual + self._ybar


def fit_kernel_model(
    train: DataFrame,
    feature_cols: list[str] | None = None,
    label_col: str = LABEL_COL,
    max_train: int = 8_000,
):
    """Fit the M3 kernel model on the driver (the reference's own
    regime — its sklearn fit is single-node) and return a picklable
    predictor for ``predict_kernel``. Prefers sklearn SVR when the
    library exists; falls back to the numpy kernel ridge twin."""
    feature_cols = list(feature_cols or FEATURE_COLS)
    pdf = train.select(
        *[c for c in feature_cols], label_col
    ).toPandas()
    X = pdf[feature_cols].to_numpy(dtype=np.float64)
    y = pdf[label_col].to_numpy(dtype=np.float64)
    if len(y) > max_train:
        # deterministic stride subsample bounds the O(n²) gram matrix
        idx = np.linspace(0, len(y) - 1, max_train).astype(np.int64)
        X, y = X[idx], y[idx]
    try:  # pragma: no cover - sklearn absent in this container
        from sklearn.pipeline import make_pipeline
        from sklearn.preprocessing import StandardScaler
        from sklearn.svm import SVR

        return make_pipeline(StandardScaler(), SVR(kernel="rbf")).fit(X, y)
    except ImportError:
        return RBFKernelRidge().fit(X, y)


def predict_kernel(
    df: DataFrame,
    model,
    feature_cols: list[str] | None = None,
    output_col: str = "prediction",
) -> DataFrame:
    """Distributed scoring of the fitted kernel model: broadcast once,
    Arrow-batched predict per executor (functions/inference.py)."""
    return predict_udf(df, model, list(feature_cols or FEATURE_COLS), output_col)
