"""Round-5 part-3 operators: product quantization (encode + ADC
search), BFS hop distance (driver vs distributed tier identity), and
source vocabulary overlap invariants.  The catalog oracles in
tests/test_catalog_oracle.py check value identity vs DuckDB; these
tests pin the algorithmic properties the oracle can't express."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from search_engine_core_ray.functions.similarity import (
    _pq_dists_us,
    pq_ann,
    pq_codebook,
    pq_encode,
)
from search_engine_core_ray.stages.linkgraph import hop_distance

SF = "/root/testdata/sf0.001"


def _emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


# ----------------------------------------------------------------------
# product quantization
# ----------------------------------------------------------------------

def test_pq_centroid_vectors_encode_to_themselves(ray_session):
    # a codebook vector's subvectors ARE centroids: codes == own id in
    # every subspace, distortion exactly 0 (integer-exact)
    out = pq_encode(_emb(), list(range(8)), m=4).to_pandas()
    out = out.set_index("vec_id").sort_index()
    for vid in range(8):
        row = out.loc[vid]
        assert [row.code0, row.code1, row.code2, row.code3] == [vid] * 4
        assert row.distortion_us == 0


def test_pq_codes_in_range_and_total_rows(ray_session):
    out = pq_encode(_emb(), list(range(8)), m=4).to_pandas()
    assert len(out) == 500
    for c in ["code0", "code1", "code2", "code3"]:
        assert out[c].between(0, 7).all()
    assert (out.distortion_us >= 0).all()


def test_pq_distortion_is_sum_of_chosen_subspace_distances(ray_session):
    # recompute one vector's distance grid on the driver and check the
    # dataset op picked the argmin per subspace and summed exactly
    emb = _emb()
    cb = pq_codebook(emb, list(range(8)), m=4)
    rows = emb.take(20)
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    vids = [int(r["vec_id"]) for r in rows]
    d = _pq_dists_us(X, cb)  # (n, 4, 8)
    out = (
        pq_encode(emb, list(range(8)), m=4)
        .to_pandas()
        .set_index("vec_id")
    )
    for i, vid in enumerate(vids):
        row = out.loc[vid]
        codes = [int(row[f"code{s}"]) for s in range(4)]
        assert codes == list(d[i].argmin(axis=1))
        assert int(row.distortion_us) == int(
            sum(d[i, s, codes[s]] for s in range(4))
        )


def test_pq_ann_is_exact_over_already_quantized_vectors(ray_session):
    # ADC against a corpus OF codebook vectors is exact: neighbor
    # ranking == ranking by the query's own distance table
    emb = _emb()
    cb = pq_codebook(emb, list(range(8)), m=4)
    sub = emb.filter(lambda r: r["vec_id"] < 8)
    got = pq_ann(sub, [0], k=7, centroid_ids=list(range(8)), m=4).to_pandas()
    qmat, _ = (
        np.asarray([r["embedding"] for r in sorted(emb.take(8), key=lambda r: r["vec_id"])], dtype=np.float64),
        None,
    )
    qt = _pq_dists_us(qmat[:1], cb)[0]  # (4, 8) table for query 0
    # true ADC of codebook vector j to query 0 = sum_s qt[s, j]
    adc = qt.sum(axis=0)
    order = sorted(range(1, 8), key=lambda j: (adc[j], j))
    got = got.sort_values("rnk")
    assert got.neighbor_id.tolist() == order
    assert got.adc_us.tolist() == [int(adc[j]) for j in order]


# ----------------------------------------------------------------------
# hop distance
# ----------------------------------------------------------------------

def _edges(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in pairs], pa.int64()),
                "b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


def _nodes(ids):
    return ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))


GRAPH = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 6), (6, 3), (9, 0)]


def test_hop_distance_bfs_semantics(ray_session):
    got = (
        hop_distance(_edges(GRAPH), [0], _nodes(list(range(10))), max_hops=6)
        .to_pandas()
        .set_index("doc_id")["dist"]
        .sort_index()
    )
    # 0 ->1 ->2 ->3(via 6 in 2) ->4 ->5; 9 unreachable (edge points INTO 0)
    assert got.to_dict() == {
        0: 0, 1: 1, 2: 2, 3: 2, 4: 3, 5: 4, 6: 1, 7: -1, 8: -1, 9: -1,
    }


def test_hop_distance_cap_and_multi_seed(ray_session):
    got = (
        hop_distance(_edges(GRAPH), [0, 9], _nodes(list(range(10))), max_hops=2)
        .to_pandas()
        .set_index("doc_id")["dist"]
        .sort_index()
    )
    assert got[9] == 0 and got[0] == 0 and got[1] == 1
    assert got[3] == 2 and got[4] == -1 and got[5] == -1


def test_hop_distance_tier_conformance(ray_session):
    # broadcast_limit=0 forces the Dataset-resident Bellman-Ford tier;
    # both tiers must agree exactly
    kw = dict(seeds=[0, 9], nodes_ds=_nodes(list(range(10))), max_hops=6)
    drv = (
        hop_distance(_edges(GRAPH), **kw)
        .to_pandas().set_index("doc_id")["dist"].sort_index()
    )
    dst = (
        hop_distance(_edges(GRAPH), broadcast_limit=0, **kw)
        .to_pandas().set_index("doc_id")["dist"].sort_index()
    )
    assert drv.to_dict() == dst.to_dict()


def test_hop_distance_cycle_terminates(ray_session):
    got = (
        hop_distance(_edges([(0, 1), (1, 0)]), [0], _nodes([0, 1]), max_hops=6)
        .to_pandas().set_index("doc_id")["dist"].sort_index()
    )
    assert got.to_dict() == {0: 0, 1: 1}


# ----------------------------------------------------------------------
# source vocabulary overlap
# ----------------------------------------------------------------------

def test_source_vocab_overlap_invariants(ray_session):
    from search_engine_core_ray.stages.textstats import source_vocab_overlap

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["source", "text"]
    )
    out = source_vocab_overlap(docs).to_pandas()
    assert (out.source_a < out.source_b).all()
    assert (out.inter_cnt >= 1).all()
    assert (out.union_cnt >= out.inter_cnt).all()
    assert ((out.jaccard > 0) & (out.jaccard <= 1)).all()
    # jaccard is the exact single division of its own integer columns
    assert (out.jaccard == out.inter_cnt / out.union_cnt).all()


def test_ivf_pq_full_probe_equals_pq_ann(ray_session):
    # probing ALL buckets makes IVFADC's candidate set the whole
    # corpus, so its ranking must equal plain PQ ADC search exactly
    from search_engine_core_ray.functions.similarity import ivf_pq_ann

    full = (
        ivf_pq_ann(_emb(), [0, 1, 2], k=10,
                   centroid_ids=list(range(8)), n_probe=8, m=4)
        .to_pandas().sort_values(["query_id", "rnk"], ignore_index=True)
    )
    flat = (
        pq_ann(_emb(), [0, 1, 2], k=10, centroid_ids=list(range(8)), m=4)
        .to_pandas().sort_values(["query_id", "rnk"], ignore_index=True)
    )
    assert full.equals(flat)


def test_ivf_pq_probe_subset_of_full(ray_session):
    # n_probe=2 candidates are a subset of the full-probe candidate
    # set per query, at identical adc values for shared neighbors
    from search_engine_core_ray.functions.similarity import ivf_pq_ann

    sub = ivf_pq_ann(_emb(), [0], k=50, centroid_ids=list(range(8)),
                     n_probe=2, m=4).to_pandas()
    full = ivf_pq_ann(_emb(), [0], k=500, centroid_ids=list(range(8)),
                      n_probe=8, m=4).to_pandas()
    fmap = dict(zip(full.neighbor_id, full.adc_us))
    assert set(sub.neighbor_id) <= set(full.neighbor_id)
    assert all(fmap[n] == d for n, d in zip(sub.neighbor_id, sub.adc_us))
