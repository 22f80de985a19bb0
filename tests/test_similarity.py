"""Similarity-search operators: exactness of the baseline, recall of LSH."""

from tests.conftest import SF_DIR


def test_vector_norms_are_unit(spark):
    from mqtt2sql_spark.plans.similarity import vector_norms

    out = vector_norms(spark, SF_DIR).collect()
    assert len(out) > 0
    assert all(abs(r.l2_norm - 1.0) < 1e-3 for r in out)
    assert all(r.dim == 64 for r in out)


def test_lsh_recall_against_brute_force(spark):
    from mqtt2sql_spark.plans.similarity import ann_cosine_topk, ann_lsh_topk

    exact = {
        (r.query_id, r.vec_id) for r in ann_cosine_topk(spark, SF_DIR).collect()
    }
    approx = {
        (r.query_id, r.vec_id) for r in ann_lsh_topk(spark, SF_DIR).collect()
    }
    assert approx, "LSH produced no candidates"
    # every LSH hit must be a real (query, candidate) pair with rank
    # consistency inside its bucket; recall is data-dependent — require a
    # sane floor on this fixture
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"recall collapsed: {recall}"


def test_lsh_buckets_are_deterministic(spark):
    from mqtt2sql_spark.plans.similarity import lsh_buckets

    a = {(r.vec_id, r.tbl, r.bucket) for r in lsh_buckets(spark, SF_DIR).collect()}
    b = {(r.vec_id, r.tbl, r.bucket) for r in lsh_buckets(spark, SF_DIR).collect()}
    assert a == b
    n_buckets = len({(t, bk) for _, t, bk in a})
    assert n_buckets > 16  # projections actually spread the space
