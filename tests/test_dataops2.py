"""Unit tests for the round-2 training-data operators (dataops2.py).

The DuckDB oracle parity at sf0.01 lives in test_oracle_parity.py; these
cover semantics the parity harness can't steer: known dedup components
on a crafted corpus, determinism of the stratified sample, and the
bigram/quantile outputs on controlled inputs.
"""

import os

import pytest

from atlassian_sampling_processor_spark.functions import dataops2 as d2


@pytest.fixture(scope="module")
def tiny_docs_dir(tmp_path_factory, spark):
    """A documents.parquet of three exact-dup cliques + a singleton.
    Identical texts share every MinHash band, so LSH links them with
    est_sim = 1.0; distinct texts share no band."""
    base = tmp_path_factory.mktemp("tinydocs")
    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta",
        2: "alpha beta gamma delta epsilon zeta eta theta",
        3: "alpha beta gamma delta epsilon zeta eta theta",
        4: "one two three four five six seven eight nine",
        5: "one two three four five six seven eight nine",
        6: "lorem ipsum dolor sit amet consectetur adipiscing elit",
    }
    rows = [
        (i, t, "en", f"src{i % 2}", len(t)) for i, t in texts.items()
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(str(base), "documents.parquet"))
    return str(base)


def test_dedup_groups_cliques(spark, tiny_docs_dir):
    got = {
        r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
        for r in d2.q_dedup_groups(spark, tiny_docs_dir).collect()
    }
    assert got == {
        1: (1, False),
        2: (1, True),
        3: (1, True),
        4: (4, False),
        5: (4, True),
        6: (6, False),
    }


def test_sample_stratified_deterministic_and_bounded(spark, tiny_docs_dir):
    a = sorted(tuple(r) for r in d2.q_sample_stratified(spark, tiny_docs_dir).collect())
    b = sorted(tuple(r) for r in d2.q_sample_stratified(spark, tiny_docs_dir).collect())
    assert a == b  # rerun-identical (salted-hash order, not random())
    per_source: dict[str, list[int]] = {}
    for doc_id, source, rank in a:
        per_source.setdefault(source, []).append(rank)
    for ranks in per_source.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert max(ranks) <= d2.SAMPLE_K


def test_heavy_hitter_bigrams_counts(spark, tiny_docs_dir):
    rows = d2.q_heavy_hitter_bigrams(spark, tiny_docs_dir).collect()
    counts = {r["bigram"]: r["n"] for r in rows}
    assert counts["alpha beta"] == 3
    assert counts["one two"] == 2
    assert len(rows) <= d2.BIGRAM_TOP_K
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    # the K-set is the deterministic (n DESC, bigram ASC) prefix: every
    # count-3 bigram (from the size-3 clique) must be present
    assert sum(1 for n in ns if n == 3) == 7


def test_doc_length_quantiles_exact(spark, tiny_docs_dir):
    import pyarrow.parquet as pq

    tab = pq.read_table(os.path.join(tiny_docs_dir, "documents.parquet")).to_pylist()
    src1 = sorted(r["n_chars"] for r in tab if r["source"] == "src1")
    rows = {r["source"]: r for r in d2.q_doc_length_quantiles(spark, tiny_docs_dir).collect()}
    assert rows["src1"]["n_docs"] == len(src1)
    assert rows["src1"]["p50"] == float(src1[len(src1) // 2])  # odd count → middle order stat


def test_star_cc_matches_propagation(spark, tiny_docs_dir):
    """Large-star/small-star CC (round 4) produces the same canonical
    labels as min-label propagation on the clique corpus."""
    a = {
        (r.doc_id, r.canonical_id, r.is_duplicate)
        for r in d2.q_dedup_groups(spark, tiny_docs_dir).collect()
    }
    b = {
        (r.doc_id, r.canonical_id, r.is_duplicate)
        for r in d2.q_dedup_groups_star(spark, tiny_docs_dir).collect()
    }
    assert a == b


def test_star_cc_chain_graph_round_bound(spark):
    """The reason the algorithm exists: a 1000-node chain has diameter
    999 — min-label propagation would need ~999 joins; alternating
    large-star/small-star must collapse it to one component in O(log² n)
    rounds (well under 15 here)."""
    n = 1000
    ids = [f"{i:05d}" for i in range(n)]
    verts = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    chain = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)], "doc_a string, doc_b string"
    )
    labels, rounds = d2.cc_labels_star(spark, verts, chain)
    got = {r.doc_id: r.comp for r in labels.collect()}
    assert set(got.values()) == {ids[0]}  # one component, min id canonical
    assert len(got) == n
    assert rounds <= 15, f"star CC took {rounds} rounds on a 1000-chain"


def test_star_cc_disjoint_components(spark):
    """Mixed shapes: two chains + a clique + singletons — exact labels."""
    edges = [
        ("b", "a"), ("c", "b"),            # chain a-b-c
        ("x", "y"), ("y", "z"),            # chain x-y-z
        ("p", "q"), ("q", "r"), ("p", "r"),  # triangle p-q-r
    ]
    verts = spark.createDataFrame(
        [(v,) for v in "abcxyzpqr"] + [("solo",)], "doc_id string"
    )
    labels, _ = d2.cc_labels_star(
        spark, verts, spark.createDataFrame(edges, "doc_a string, doc_b string")
    )
    got = {r.doc_id: r.comp for r in labels.collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x", "z": "x",
        "p": "p", "q": "p", "r": "p",
        "solo": "solo",
    }
