"""Distributed k-means vs a single-process numpy reference.

The oracle strategy mirrors the crawl engine's sequential-replay test:
the distributed pipeline must EXACTLY reproduce a local implementation
with the identical deterministic init (k lowest vec_ids), update rule
(spherical Lloyd's) and rounding convention (round-4 argmax).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _sorted_df(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("vec_id").reset_index(drop=True)


def test_kmeans_assign_matches_local(ray_session):
    """One assignment step against the seed codebook == local numpy."""
    import pyarrow.parquet as pq

    from dude_ray.pipelines.clustering import run_kmeans_assign
    from dude_ray.pipelines.similarity import _normalize

    got = _sorted_df(run_kmeans_assign(SF, k=8))

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
    order = np.argsort(vids)
    cent_ids = vids[order[:8]]
    cent = emb[order[:8]]
    sims = np.round(emb @ cent.T, 4)
    best = sims.argmax(axis=1)

    want = pd.DataFrame({
        "vec_id": vids,
        "cluster_id": cent_ids[best],
        "sim": sims[np.arange(len(vids)), best],
    }).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every seed vector belongs to its own cluster at sim 1.0
    seeds = got[got["vec_id"].isin(cent_ids)]
    assert (seeds["cluster_id"].to_numpy() == seeds["vec_id"].to_numpy()).all()
    assert (seeds["sim"] == 1.0).all()


@pytest.mark.parametrize("iters", [1, 5])
def test_kmeans_cluster_matches_reference(ray_session, iters):
    """Full distributed Lloyd's == local reference, exactly — same
    assignments, same round-4 sims, centroids to 1e-9."""
    from dude_ray.pipelines.clustering import (kmeans_reference,
                                               run_kmeans_cluster)

    got = _sorted_df(run_kmeans_cluster(SF, k=8, iters=iters))
    vids, assign, sims, _cent = kmeans_reference(SF, k=8, iters=iters)
    want = pd.DataFrame({"vec_id": vids, "cluster_id": assign, "sim": sims}) \
        .sort_values("vec_id").reset_index(drop=True)
    assert (got["cluster_id"].to_numpy()
            == want["cluster_id"].to_numpy()).all()
    assert (got["sim"].to_numpy() == want["sim"].to_numpy()).all()
    # all k clusters non-empty on this data
    assert got["cluster_id"].nunique() == 8


def test_kmeans_cluster_batch_size_invariant(ray_session):
    """Partial-sum merge order must not leak into the result: tiny
    batches (many partials per cluster) == one big batch."""
    from dude_ray.pipelines.clustering import run_kmeans_cluster

    small = _sorted_df(run_kmeans_cluster(SF, k=8, iters=3, batch_size=64))
    big = _sorted_df(run_kmeans_cluster(SF, k=8, iters=3, batch_size=4096))
    assert (small["cluster_id"].to_numpy()
            == big["cluster_id"].to_numpy()).all()
    assert (small["sim"].to_numpy() == big["sim"].to_numpy()).all()


def test_kmeans_inertia_improves(ray_session):
    """More Lloyd's iterations → mean best-sim (spherical inertia
    complement) must not decrease."""
    from dude_ray.pipelines.clustering import run_kmeans_cluster

    one = _sorted_df(run_kmeans_cluster(SF, k=8, iters=1))["sim"].mean()
    five = _sorted_df(run_kmeans_cluster(SF, k=8, iters=5))["sim"].mean()
    assert five >= one - 1e-9


def test_embedding_pca_matches_reference(ray_session):
    """Distributed moment accumulation + projection == local numpy PCA
    (same sign convention); variance must be captured in
    descending-eigenvalue order."""
    import numpy as np

    from dude_ray.pipelines.clustering import (pca_reference,
                                               run_embedding_pca)

    got = run_embedding_pca(SF, n_components=6).to_pandas()
    mat = (got.pivot(index="vec_id", columns="i", values="proj")
           .sort_index().to_numpy())
    vids, proj, evals = pca_reference(SF, n_components=6)
    order = np.argsort(vids)
    want = proj[order]
    assert mat.shape == want.shape
    assert np.allclose(mat, want, atol=1e-8)
    # projected variance per component matches the eigenvalues, in
    # descending order
    var = mat.var(axis=0)
    assert np.allclose(var, evals, rtol=1e-6)
    assert (np.diff(evals) <= 1e-12).all()


def test_embedding_pca_batch_size_invariant(ray_session):
    import numpy as np

    from dude_ray.pipelines.clustering import run_embedding_pca

    a = (run_embedding_pca(SF, n_components=4, batch_size=64).to_pandas()
         .sort_values(["vec_id", "i"]).reset_index(drop=True))
    b = (run_embedding_pca(SF, n_components=4, batch_size=4096).to_pandas()
         .sort_values(["vec_id", "i"]).reset_index(drop=True))
    assert np.allclose(a["proj"].to_numpy(), b["proj"].to_numpy(),
                       atol=1e-9)


def test_quantize_embeddings_roundtrip(ray_session):
    """int8 codes reconstruct each value to within half a quantization
    step of the per-dim range, codes span [0, 255], and the manifest
    equals a local numpy recomputation exactly."""
    import pyarrow.parquet as pq

    from dude_ray.pipelines.clustering import run_quantize_embeddings

    out = run_quantize_embeddings(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    emb = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mn, mx = emb.min(axis=0), emb.max(axis=0)
    span = mx - mn
    scale = np.where(span > 0, 255.0 / np.where(span > 0, span, 1.0), 0.0)
    want = np.floor((emb - mn) * scale + 0.5).astype(np.int64)

    assert len(out) == emb.size
    assert out["code"].between(0, 255).all()
    piv = (out.pivot(index="vec_id", columns="dim", values="code")
           .loc[vids].to_numpy())
    assert (piv == want).all()
    # reconstruction error ≤ half a step of the dim's range
    recon = mn + piv / np.where(scale > 0, scale, 1.0)
    step = np.where(span > 0, span / 255.0, 0.0)
    assert (np.abs(recon - emb) <= step / 2 + 1e-12).all()


def _semdedup_reference(sf: str, k: int = 8, iters: int = 5,
                        threshold: float = 0.35):
    """Local numpy SemDeDup with the identical trajectory and
    dominance rule — prune x iff some same-cluster y has round-4
    pairwise cosine >= threshold and a smaller (sim, vec_id) key."""
    from dude_ray.pipelines.clustering import kmeans_reference

    vids, assign, sims, cent = kmeans_reference(sf, k=k, iters=iters)
    import pyarrow.parquet as pq

    from dude_ray.pipelines.similarity import _normalize

    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    tv = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
    emb = emb[np.argsort(tv)]
    order = np.argsort(vids)
    vids, assign, sims = vids[order], assign[order], sims[order]
    pruned = np.zeros(len(vids), dtype=bool)
    for c in np.unique(assign):
        ix = np.where(assign == c)[0]
        S = np.round(emb[ix] @ emb[ix].T, 4)
        np.fill_diagonal(S, -1)
        key_lt = ((sims[ix][None, :] < sims[ix][:, None])
                  | ((sims[ix][None, :] == sims[ix][:, None])
                     & (vids[ix][None, :] < vids[ix][:, None])))
        pruned[ix] = ((S >= threshold) & key_lt).any(axis=1)
    return vids, assign, sims, pruned


def test_semdedup_matches_reference(ray_session):
    """Distributed SemDeDup == local numpy reference, exactly."""
    from dude_ray.pipelines.clustering import run_semdedup

    got = _sorted_df(run_semdedup(SF, threshold=0.35))
    vids, assign, sims, pruned = _semdedup_reference(SF)
    assert (got["vec_id"].to_numpy() == vids).all()
    assert (got["cluster_id"].to_numpy() == assign).all()
    assert (got["sim"].to_numpy() == sims).all()
    assert (got["pruned"].to_numpy() == pruned).all()
    # the 0.35 threshold must exercise real pruning on this corpus,
    # and never prune everything
    n_pruned = int(pruned.sum())
    assert 0 < n_pruned < len(vids)


def test_semdedup_pair_chunk_invariant(ray_session):
    """Chunked pairwise matmul must not change the result: a chunk
    smaller than every cluster == one chunk covering the cluster."""
    from dude_ray.pipelines.clustering import run_semdedup

    tiny = _sorted_df(run_semdedup(SF, threshold=0.35, pair_chunk=7))
    big = _sorted_df(run_semdedup(SF, threshold=0.35, pair_chunk=4096))
    pd.testing.assert_frame_equal(tiny, big)


def test_semdedup_kept_set_is_threshold_monotone(ray_session):
    """A higher threshold can only prune FEWER vectors (smaller
    epsilon-balls)."""
    from dude_ray.pipelines.clustering import run_semdedup

    lo = _sorted_df(run_semdedup(SF, threshold=0.30))
    hi = _sorted_df(run_semdedup(SF, threshold=0.40))
    assert hi["pruned"].sum() <= lo["pruned"].sum()
    # anything kept at the low threshold stays kept at the high one
    assert not (hi["pruned"] & ~lo["pruned"]).any()


def test_embedding_project_jl_property(ray_session):
    """JL projection: every vector gets k complete dims, values match
    an independent numpy recompute, and pairwise distances in the
    projected space correlate strongly with the original space
    (the Johnson-Lindenstrauss property the op exists for)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from dude_ray.pipelines.clustering import run_embedding_project
    from dude_ray.pipelines.similarity import QUANT_SCALE, lsh_planes

    sf = "/root/testdata/sf0.001"
    got = run_embedding_project(sf, k=16).to_pandas()
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    emb = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    vids = t["vec_id"].to_numpy()
    planes = lsh_planes(emb.shape[1], 16, seed=42)
    ref = (np.floor(emb * QUANT_SCALE + 0.5) @ planes).astype(np.int64)

    assert len(got) == len(vids) * 16
    wide = (got.pivot(index="vec_id", columns="dim", values="value")
            .loc[vids].to_numpy())
    assert np.array_equal(wide, ref)

    # JL distance preservation on a bounded sample: for pairwise
    # difference vectors δ, E[||Pδ||²] = k·σ²·||δ||² (P entries uniform
    # integers in [-999, 999], σ² = (1999²-1)/12), and the squared
    # ratio concentrates ~ χ²_k/k (rel-std √(2/k) ≈ 0.35 at k=16) —
    # assert the mean sits at 1 and every pair within a ±4σ-ish band
    n = min(64, len(emb))
    q = np.floor(emb[:n] * QUANT_SCALE + 0.5)
    p = ref[:n].astype(np.float64)
    iu = np.triu_indices(n, 1)
    dq = ((q[:, None] - q[None, :]) ** 2).sum(axis=2)[iu]
    dp = ((p[:, None] - p[None, :]) ** 2).sum(axis=2)[iu]
    sigma2 = (1999 ** 2 - 1) / 12
    ratio = dp / (16 * sigma2 * dq)
    assert abs(ratio.mean() - 1.0) < 0.2
    assert ratio.min() > 0.1 and ratio.max() < 3.0


def test_dup_cluster_sizes_local_oracle(ray_session):
    """The cluster-size histogram equals the DuckDB recursive-CTE
    recompute at sf0.001, and n_docs reconciles with the component
    table's row count."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry
    from dude_ray.pipelines.dedup import (run_dup_cluster_sizes,
                                          run_dup_clusters)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = (con.execute(entry.oracle_sql()["dup_cluster_sizes"]).df()
            .reset_index(drop=True))
    assert (want["cluster_size"] >= 2).all()  # singletons have no pair
    assert want["n_docs"].sum() == run_dup_clusters(sf).count()

    got = run_dup_cluster_sizes(sf).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_kmeans_silhouette_local_oracle(ray_session):
    """Per-cluster silhouette equals the DuckDB unrolled-trajectory
    recompute at sf0.001; values lie in [-1, 1] and the cluster sizes
    sum to the embedding count."""
    import duckdb
    import pandas as pd

    from dude_ray.pipelines.clustering import (
        kmeans_silhouette_oracle_sql, run_kmeans_silhouette)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = (con.execute(kmeans_silhouette_oracle_sql()).df()
            .reset_index(drop=True))
    got = run_kmeans_silhouette(sf).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
    assert got["silhouette"].between(-1.0, 1.0).all()
    n_vec = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert int(got["n"].sum()) == n_vec
