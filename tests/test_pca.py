"""embed_gram / PCA: numpy parity for the driver-side eigen step
(the gram itself is SQL-oracle-gated in tools/check.py)."""

import numpy as np
import pyarrow.parquet as pq

from aerial_conversion_ray.pipelines import embeddings


def _raw_matrix(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    col = t["embedding"].combine_chunks()
    return (
        col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        .reshape(t.num_rows, -1)
    )


def test_embed_gram_matches_numpy(sf_dir):
    mat = _raw_matrix(sf_dir)
    fp = np.floor(mat * embeddings.GRAM_SCALE + 0.5).astype(np.int64)
    want = fp.T @ fp
    g = embeddings.embed_gram(sf_dir).to_pandas()
    assert len(g) == embeddings.DIM * (embeddings.DIM + 1) // 2
    got = np.zeros_like(want)
    got[g["i"], g["j"]] = g["gram"]
    got[g["j"], g["i"]] = g["gram"]
    assert (got == want).all()
    assert (g["n"] == len(mat)).all()


def test_pca_top_component_matches_linalg(sf_dir):
    """Power-iteration top component ~ numpy.linalg.eigh's dominant
    eigenvector of the same covariance (sign-normalized)."""
    mat = _raw_matrix(sf_dir)
    fp = np.floor(mat * embeddings.GRAM_SCALE + 0.5) / embeddings.GRAM_SCALE
    cov = np.cov(fp.T, bias=True)
    w, v = np.linalg.eigh(cov)
    top = v[:, -1]
    if top[np.argmax(np.abs(top))] < 0:
        top = -top
    out = embeddings.pca_power_iteration(sf_dir).to_pandas()
    got = out.sort_values("component")["weight"].to_numpy()
    assert abs(abs(got @ top) - 1.0) < 1e-6
    assert abs(out["eigenvalue"].iloc[0] - w[-1]) < 1e-9 * max(1.0, w[-1])
