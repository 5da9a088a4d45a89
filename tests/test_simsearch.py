import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from knowledgegraph__bh_ray.stages import simsearch

SF = "/root/testdata/sf0.001"


def _brute_truth(emb, queries, k=10):
    M = np.vstack(emb["embedding"].values).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    for qid, q in queries.items():
        qn = q / np.linalg.norm(q)
        sims = M @ qn
        order = np.lexsort((emb["vec_id"].values, -sims))
        out[qid] = [int(emb["vec_id"].values[i]) for i in order[:k]]
    return out


def _queries(emb, ids=(0, 1, 2)):
    return {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for _, r in emb.iterrows()
        if r["vec_id"] in ids
    }


def test_brute_topk_matches_numpy(ray_session):
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    queries = _queries(emb)
    ds = rd.from_pandas(emb[["vec_id", "embedding"]]).repartition(5)
    got = simsearch.brute_topk_ds(ds, queries, "vec_id", "embedding", k=10).to_pandas()
    truth = _brute_truth(emb, queries)
    for qid in queries:
        g = got[got["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert g == truth[qid]


def test_lsh_topk_recall(ray_session):
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    queries = _queries(emb)
    ds = rd.from_pandas(emb[["vec_id", "embedding"]]).repartition(5)
    got = simsearch.lsh_topk_ds(ds, queries, "vec_id", "embedding", k=10).to_pandas()
    truth = _brute_truth(emb, queries)
    for qid in queries:
        g = set(got[got["query_id"] == qid]["vec_id"])
        # the query vector itself lives in its own bucket → always recalled
        assert qid in g
        recall = len(g & set(truth[qid])) / 10
        assert recall >= 0.3  # approximate path: bounded quality, not exact


def test_ivf_recall_floor(ray_session):
    """IVF path: deterministic centroids; top-k recall vs brute force above
    a floor; results are a pure function of the data (two runs equal)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from knowledgegraph__bh_ray.stages import simsearch

    sf = "/root/testdata/sf0.001"
    emb = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()[["vec_id", "embedding"]]
    qv = {
        int(r.vec_id): np.array(r.embedding, dtype=np.float64)
        for r in emb.head(3).itertuples()
    }
    ds = rd.from_pandas(emb)
    brute = simsearch.brute_topk_ds(rd.from_pandas(emb), qv, "vec_id", "embedding", k=10).to_pandas()
    ivf = simsearch.ivf_topk_ds(ds, qv, "vec_id", "embedding", k=10).to_pandas()
    ivf2 = simsearch.ivf_topk_ds(rd.from_pandas(emb), qv, "vec_id", "embedding", k=10).to_pandas()
    key = ["query_id", "rank"]
    assert ivf.sort_values(key).reset_index(drop=True).equals(
        ivf2.sort_values(key).reset_index(drop=True)
    )
    recalls = []
    for q in qv:
        b = set(brute.loc[brute["query_id"] == q, "vec_id"])
        a = set(ivf.loc[ivf["query_id"] == q, "vec_id"])
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_embedding_clusters_consistent_with_semdedup(ray_session):
    """The standalone cluster-assignment op must reproduce EXACTLY the
    cluster ids semantic_dedup assigns for the same corpus and centroid
    count (both build on train_centroids + the same matmul assignment),
    and similarities must be valid cosines."""
    import pandas as pd

    from knowledgegraph__bh_ray.sources import read_table
    from knowledgegraph__bh_ray.stages.dedup import semantic_dedup_ds
    from knowledgegraph__bh_ray.stages.simsearch import embedding_clusters_ds

    sf = "/root/testdata/sf0.001"
    emb = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
    got = (embedding_clusters_ds(emb, "vec_id", "embedding", n_centroids=8)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    emb2 = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
    sem = (semantic_dedup_ds(emb2, "vec_id", "embedding", n_centroids=8)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert len(got) == len(sem) > 0
    assert list(got["cluster_id"]) == list(sem["cluster_id"])
    assert got["sim_micros"].between(-1_000_000, 1_000_000).all()
    # determinism
    emb3 = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
    again = (embedding_clusters_ds(emb3, "vec_id", "embedding", n_centroids=8)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)
