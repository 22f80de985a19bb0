"""Dedup operators on synthetic near/exact duplicates.

The driver `documents` fixture has no exact dups, so detection power is
proven here on constructed corpora; the oracle gate proves cross-engine
parity on the fixture."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


BASE = (
    "the quick brown fox jumps over the lazy dog while the storm "
    "gathers slowly across the wide open plain and rivers run deep"
)
NEAR = BASE.replace("storm", "squall")  # one-word edit
FAR = (
    "completely different subject matter entirely unrelated words "
    "about cooking pasta with garlic butter and fresh basil leaves"
)


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    df = spark.createDataFrame(
        [
            (1, BASE, "en", "s", len(BASE)),
            (2, BASE, "en", "s", len(BASE)),            # exact dup of 1
            (3, "  " + BASE.upper() + "  ", "en", "s", 0),  # norm-dup of 1
            (4, NEAR, "en", "s", len(NEAR)),            # near dup of 1
            (5, FAR, "en", "s", len(FAR)),              # unrelated
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(d / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return str(d)


def test_exact_dedup_groups_normalized_duplicates(spark, docs_path):
    from mqtt2sql_spark.plans.dedup import dedup_exact

    out = {r.doc_id: (r.keep, r.dup_group_size) for r in
           dedup_exact(spark, docs_path).collect()}
    # 1,2,3 share a normalized hash → keep only doc 1
    assert out[1] == (1, 3)
    assert out[2] == (0, 3)
    assert out[3] == (0, 3)
    assert out[4] == (1, 1)
    assert out[5] == (1, 1)


def test_minhash_pairs_find_near_dups_not_unrelated(spark, docs_path):
    from mqtt2sql_spark.plans.dedup import dedup_minhash_pairs

    pairs = {(r.doc_a, r.doc_b) for r in
             dedup_minhash_pairs(spark, docs_path).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs  # identical shingle sets
    assert (1, 4) in pairs                      # one-word edit → bands collide
    assert not any(5 in p for p in pairs)       # unrelated never pairs


def test_simhash_hamming_close_for_near_dups(spark, docs_path):
    from mqtt2sql_spark.plans.dedup import dedup_simhash

    sh = {r.doc_id: r.simhash for r in dedup_simhash(spark, docs_path).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert sh[1] == sh[2]
    assert hamming(sh[1], sh[4]) <= 6       # near dup: few bits differ
    assert hamming(sh[1], sh[5]) >= 8       # unrelated: many bits differ


def test_jaccard_ranks_near_dup_above_unrelated(spark, docs_path):
    from mqtt2sql_spark.plans.dedup import dedup_ngram_jaccard

    jac = {(r.doc_a, r.doc_b): r.jaccard for r in
           dedup_ngram_jaccard(spark, docs_path).collect()}
    assert jac[(1, 2)] == 1.0
    assert jac[(1, 4)] > 0.7            # one word edit in ~22 shingles
    assert (1, 5) not in jac            # no shared shingles


def test_embedding_pairs_threshold(spark, tmp_path):
    from mqtt2sql_spark.plans.dedup import dedup_embedding_pairs

    vecs = [
        (1, [1.0] + [0.0] * 63, 0),
        (2, [0.99] + [0.01] * 63, 0),   # nearly parallel to 1
        (3, [0.0] * 63 + [1.0], 1),     # orthogonal
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    pairs = {(r.doc_a, r.doc_b): r.cos for r in
             dedup_embedding_pairs(spark, str(tmp_path)).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert (1, 3) not in pairs


def test_embedding_pairs_block_count_invariance(spark, tmp_path):
    """The distributed block-nested-loop must emit the identical pair set
    whatever the block partitioning: every unordered pair appears exactly
    once (cross pairs in their (bi<bj) group, within pairs on the
    diagonal), with bit-equal cosines."""
    import random

    from mqtt2sql_spark.plans.dedup import dedup_embedding_pairs

    rng = random.Random(7)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], 0) for i in range(60)
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    results = []
    for tile_rows in (10**9, 31, 7):  # 1 block, 2 blocks, 9 blocks
        rows = dedup_embedding_pairs(
            spark, str(tmp_path), tile_rows=tile_rows
        ).collect()
        pairs = {(r.doc_a, r.doc_b): r.cos for r in rows}
        assert len(pairs) == len(rows)  # no duplicate pair under any split
        assert all(a < b for a, b in pairs)
        results.append(pairs)
    assert results[0] == results[1] == results[2]
    assert results[0]  # threshold keeps some pairs on this data


def test_embedding_pairs_empty_corpus_stable_schema(spark, tmp_path):
    from mqtt2sql_spark.plans.dedup import dedup_embedding_pairs

    df = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = dedup_embedding_pairs(spark, str(tmp_path))
    assert [f.name for f in out.schema.fields] == ["doc_a", "doc_b", "cos"]
    assert out.count() == 0


def test_connected_components_transitive_chain(spark):
    from mqtt2sql_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    verts = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 7, 8, 99)], "doc_id long"
    )
    comp = {
        r.doc_id: r.component
        for r in connected_components(edges, verts).collect()
    }
    # chain 1-2-3 collapses transitively even though (1,3) was never a pair
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 99: 99}


def test_ppjoin_equals_bruteforce_jaccard(spark):
    """Prefix filtering must lose NO pairs: the verified output equals
    a brute-force all-pairs Jaccard >= 3/5 over the same shingle sets."""
    from mqtt2sql_spark.plans.dedup import (
        _PP_T_DEN,
        _PP_T_NUM,
        ppjoin_prefix_pairs,
        shingles,
    )

    got = {
        (r.doc_a, r.doc_b): (r.inter_n, r.union_n)
        for r in ppjoin_prefix_pairs(spark, SF_DIR).collect()
    }
    sets = {}
    for r in shingles(spark, SF_DIR).collect():
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if u and _PP_T_DEN * c >= _PP_T_NUM * u:
                want[(a, b)] = (c, u)
    assert got == want


def test_blocking_eval_metrics_are_consistent(spark):
    from mqtt2sql_spark.plans.dedup import blocking_quality_eval

    r = blocking_quality_eval(spark, SF_DIR).collect()[0]
    assert r.n_all_pairs == r.n_docs * (r.n_docs - 1) // 2
    assert r.n_found <= min(r.n_truth, r.n_candidates)
    assert r.pairs_completeness_ppm == r.n_found * 1_000_000 // max(r.n_truth, 1)
    assert 0 <= r.reduction_ratio_ppm <= 1_000_000
    # the LSH blocker must prune the vast majority of the pair space
    assert r.reduction_ratio_ppm > 900_000


def test_bbit_estimates_track_exact_jaccard(spark):
    """Full-signature estimate must be closer to (or as close to) exact
    jaccard than the 1-bit estimate on average, and both live in ppm."""
    from mqtt2sql_spark.plans.dedup import bbit_minhash_accuracy

    rows = bbit_minhash_accuracy(spark, SF_DIR).collect()
    assert rows
    err_full = err_1bit = 0
    for r in rows:
        assert 0 <= r.est_full_ppm <= 1_000_000
        assert 0 <= r.est_1bit_ppm <= 1_000_000
        assert 0 <= r.exact_ppm <= 1_000_000
        err_full += abs(r.est_full_ppm - r.exact_ppm)
        err_1bit += abs(r.est_1bit_ppm - r.exact_ppm)
    # 1-bit has ~2x the variance of the full signature at the same k
    assert err_full <= 2 * err_1bit + 1_000_000
