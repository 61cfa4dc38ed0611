"""PCA / dimensionality reduction (SURVEY.md §2.10 U1/U5).

The reference only *schedules* PCA: job descriptors carry dim/dim_high
(LASERInputValidator.java:162,176-177) and an external LASER binary
produces reference_pc.txt / reference_pc_var.txt
(ReferencePCAOutputFormat.java:9-15). The engine runs the computation
itself, two ways:

- global_pca: pyspark.ml PCA over assembled vectors — the distributed
  path for one big matrix.
- grouped_pca: per-group numpy SVD inside applyInPandas — the
  reference's per-chunk study-PCA pattern (one black-box analysis per
  chunk, LASERInputValidator.java:169-182), deterministic via a sign
  convention and stable input ordering.

Procrustes projection (study onto reference PC space) is provided for
the TRACE analogue, per-group in numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sign_fix(components: np.ndarray) -> np.ndarray:
    """Deterministic sign convention: largest-|loading| entry positive
    per component (SURVEY.md §7.4 watch-list #4)."""
    flips = np.sign(components[np.abs(components).argmax(axis=0), np.arange(components.shape[1])])
    flips[flips == 0] = 1.0
    return components * flips


def _pca_numpy(x: np.ndarray, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Centered SVD PCA -> (scores n x dim, variance_explained dim)."""
    xc = x - x.mean(axis=0, keepdims=True)
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    comps = _sign_fix(vt.T[:, :dim])
    scores = xc @ comps
    var = (s**2) / max(len(x) - 1, 1)
    var_ratio = var[:dim] / var.sum() if var.sum() > 0 else var[:dim]
    return scores, var_ratio


def global_pca(
    df: DataFrame, *, feature_cols: list[str], id_cols: list[str], dim: int
) -> DataFrame:
    """Distributed PCA via pyspark.ml: (id_cols..., pc array<double>).

    The 100 TB path: the Gramian accumulates in one pass (tree
    aggregation), only k x k eigen-work happens on the driver.
    """
    from pyspark.ml.feature import PCA, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembled = VectorAssembler(inputCols=feature_cols, outputCol="__features").transform(df)
    model = PCA(k=dim, inputCol="__features", outputCol="__pc").fit(assembled)
    out = model.transform(assembled)
    return out.select(*id_cols, vector_to_array("__pc").alias("pc"))


def explained_variance(
    df: DataFrame, *, feature_cols: list[str], dim: int
) -> list[float]:
    """Variance-explained ratios from the ml PCA model (driver-side k values)."""
    from pyspark.ml.feature import PCA, VectorAssembler

    assembled = VectorAssembler(inputCols=feature_cols, outputCol="__features").transform(df)
    model = PCA(k=dim, inputCol="__features", outputCol="__pc").fit(assembled)
    return [float(v) for v in model.explainedVariance]


def grouped_pca(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    feature_cols: list[str],
    dim: int,
) -> DataFrame:
    """U1+U5: per-group PCA scores via applyInPandas.

    One Arrow batch per group -> numpy SVD; rows sorted by id inside the
    group so float summation order is stable across runs.
    Output: (group, id, pc array<double>).
    """
    n_feat = len(feature_cols)
    k = min(dim, n_feat)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        x = pdf[feature_cols].to_numpy(dtype=np.float64)
        scores, _ = _pca_numpy(x, k)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].to_numpy(),
                id_col: pdf[id_col].to_numpy(),
                "pc": [row.tolist() for row in scores],
            }
        )

    schema = f"{group_col} string, {id_col} string, pc array<double>"
    cols = [group_col, id_col, *feature_cols]
    return df.select(*cols).groupBy(group_col).applyInPandas(run, schema)


def orthogonal_procrustes(
    a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, float]:
    """k-dim orthogonal Procrustes: the rotation R (and scale s)
    minimizing ||s * a @ R - b||_F over orthogonal R, via SVD of the
    k x k cross-moment (Schönemann 1966 — the closed form scipy's
    linalg.orthogonal_procrustes implements; kept local because scipy
    is not a dependency). Inputs are CENTERED score matrices.

    Determinism (SURVEY §7.4 watch-list #4 generalized to the rotation):
    the SVD of M = a.T @ b has a per-singular-vector sign ambiguity
    (u_i, v_i) -> (-u_i, -v_i), but R = U @ Vt is invariant under it —
    each flip cancels in the product — so no extra convention is needed
    for distinct singular values; numpy's LAPACK backend is
    deterministic for a given input, which per-group sorted rows
    guarantee.
    """
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    u, s, vt = np.linalg.svd(a.T @ b, full_matrices=False)
    rot = u @ vt
    denom = (a**2).sum()
    scale = float(s.sum() / denom) if denom > 0 else 1.0
    return rot, scale


def grouped_procrustes(
    study: DataFrame,
    reference: DataFrame,
    *,
    group_col: str,
    id_col: str,
    pc_col: str = "pc",
    with_scaling: bool = True,
) -> DataFrame:
    """X362 at the reference's production dimensionality (VERDICT_r09
    item 4): per-group k-dim Procrustes projection of study PC scores
    onto the reference PC frame — the TRACE step the reference
    delegates to its external binary at dim≈8/dim_high≈20
    (LASERInputValidator.java:162,176-177 schedules it;
    ReferencePCAOutputFormat.java:9-15 demuxes its output). The 2D
    closed form stays hash-verified as q_procrustes2d; this operator
    is the k-dim general case, pytest-verified by rotation recovery on
    planted orthogonal transforms (tests/test_round10_fixes.py).

    Inputs: two (group, id, pc array<double>) frames. Rows matched on
    id WITHIN each group fit the transform (scaling + rotation +
    translation, classical Procrustes); the transform then maps EVERY
    study row of the group, matched or not — exactly the TRACE shape
    (study samples projected onto the reference panel's frame).

    Output: (group, id, proj array<double>) for all study rows in
    groups that have >= 2 shared anchor rows; groups with fewer shared
    rows are dropped (no transform is identifiable).

    100 TB design: cogrouped applyInPandas — each group is one Arrow
    batch pair on one task (groups are the reference's per-chunk
    analyses: thousands of rows each, never the full corpus); the SVD
    is k x k after an O(n_shared * k^2) cross-moment, so per-task cost
    is linear in group size. Rows are sorted by id inside the group so
    float summation order is stable across runs.
    """

    # empty frame with OBJECT dtype throughout: an empty float64 column
    # fails Arrow's list<double> conversion on the way back
    empty = pd.DataFrame(
        {c: pd.Series(dtype=object) for c in (group_col, id_col, "proj")}
    )

    def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return empty
        left = left.sort_values(id_col, kind="mergesort")
        right = right.sort_values(id_col, kind="mergesort")
        # Anchor alignment is positional (sorted id), so the fit keeps
        # exactly ONE row per id on each side: a duplicated id would
        # otherwise make the matrices differ in length (kernel
        # ValueError fails the job) or silently misalign rows and fit
        # a wrong transform (ADVICE r10). First row per id wins — the
        # mergesort above makes that deterministic. The projection
        # below still maps EVERY study row, duplicates included.
        anchors_l = left.drop_duplicates(id_col)
        anchors_r = right.drop_duplicates(id_col)
        shared = anchors_l[anchors_l[id_col].isin(set(anchors_r[id_col]))]
        anchor_r = anchors_r[anchors_r[id_col].isin(set(shared[id_col]))]
        if len(shared) < 2:
            return empty
        xs = np.array(list(shared[pc_col]), dtype=np.float64)
        xr = np.array(list(anchor_r[pc_col]), dtype=np.float64)
        mu_s = xs.mean(axis=0, keepdims=True)
        mu_r = xr.mean(axis=0, keepdims=True)
        rot, scale = orthogonal_procrustes(xs - mu_s, xr - mu_r)
        if not with_scaling:
            scale = 1.0
        all_s = np.array(list(left[pc_col]), dtype=np.float64)
        proj = scale * (all_s - mu_s) @ rot + mu_r
        return pd.DataFrame(
            {
                group_col: left[group_col].to_numpy(),
                id_col: left[id_col].to_numpy(),
                "proj": [row.tolist() for row in proj],
            }
        )

    schema = f"{group_col} string, {id_col} string, proj array<double>"
    cols = [group_col, id_col, pc_col]
    return (
        study.select(*cols)
        .groupBy(group_col)
        .cogroup(reference.select(*cols).groupBy(group_col))
        .applyInPandas(run, schema)
    )


def procrustes_project(
    study_scores: np.ndarray, reference_scores: np.ndarray
) -> np.ndarray:
    """Procrustes transform mapping study PCs onto the reference PC
    frame (the TRACE step the reference delegates to its binary).

    Orthogonal Procrustes with scaling+translation on the shared rows;
    returns the transformed study coordinates.
    """
    mu_s = study_scores.mean(axis=0, keepdims=True)
    mu_r = reference_scores.mean(axis=0, keepdims=True)
    xs, xr = study_scores - mu_s, reference_scores - mu_r
    rot, scale = orthogonal_procrustes(xs, xr)
    return scale * xs @ rot + mu_r
