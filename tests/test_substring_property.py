"""Property tests: operators/substring.py and the IND lattice walk
against brute-force pure-Python references on randomized small
inputs. One Spark job per example is slow, so examples are capped —
the point is shape coverage (overlaps, within-doc repeats, short
docs, permuted INDs), not volume."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_spans(docs: "dict[int, str]", n: int):
    """Reference implementation: tokenize, hash n-grams, rank per
    gram by (doc, start), merge rank>1 windows per doc."""
    occ = []  # (gram, doc, start)
    for d in sorted(docs):
        text = docs[d]
        toks = [t for t in (text or "").lower().strip().split() if t]
        if len(toks) < n:
            continue
        for s in range(len(toks) - n + 1):
            g = " ".join(toks[s : s + n])
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            occ.append((h, d, s))
    by_gram: "dict[int, list]" = {}
    for h, d, s in occ:
        by_gram.setdefault(h, []).append((d, s))
    marked: "dict[int, list]" = {}
    for h, places in by_gram.items():
        for d, s in sorted(places)[1:]:
            marked.setdefault(d, []).append((s, s + n))
    out = []
    for d, spans in marked.items():
        spans.sort()
        cur_s, cur_e = spans[0]
        for s, e in spans[1:]:
            if s > cur_e:
                out.append((d, cur_s, cur_e, cur_e - cur_s))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        out.append((d, cur_s, cur_e, cur_e - cur_s))
    return sorted(out)


_WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_DOC, min_size=1, max_size=5))
def test_repeated_ngram_spans_matches_reference(spark, texts):
    """Tiny 5-word vocabulary forces dense gram collisions — the
    hardest case for the keeper/merge logic."""
    from k_means_using_mapreduce_spark.operators.substring import (
        repeated_ngram_spans,
    )

    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = sorted(
        tuple(r) for r in repeated_ngram_spans(df, n=3).collect()
    )
    assert got == _py_spans(docs, 3)


def _py_ind_walk(rels: "dict[str, list[tuple]]", cols: "list[str]"):
    """Reference: enumerate ALL canonical candidates at every level,
    keep the contained ones (Apriori soundness makes this equal to
    the walk's output)."""
    from itertools import combinations, permutations

    def distinct(rel, sub):
        idx = [cols.index(c) for c in sub]
        return {
            tuple(str(row[i]) for i in idx)
            for row in rels[rel]
            if all(row[i] is not None for i in idx)
        }

    out = []
    for n in range(1, len(cols) + 1):
        for lrel in rels:
            for lsub in combinations(cols, n):
                lvals = distinct(lrel, lsub)
                if not lvals:
                    continue
                for rrel in rels:
                    for rperm in permutations(cols, n):
                        if (lrel, lsub) == (rrel, rperm):
                            continue
                        if lvals <= distinct(rrel, rperm):
                            out.append(
                                (
                                    n,
                                    lrel,
                                    ",".join(lsub),
                                    rrel,
                                    ",".join(rperm),
                                    len(lvals),
                                )
                            )
    return sorted(out)


_CELL = st.integers(min_value=0, max_value=2)
_ROW = st.tuples(_CELL, _CELL)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_ROW, min_size=1, max_size=5),
    st.lists(_ROW, min_size=1, max_size=5),
)
def test_ind_lattice_walk_matches_enumeration(spark, rows_a, rows_b):
    """Random NULL-free 2-column relations over a 3-value domain:
    dense value overlap makes spurious INDs and permuted-rhs
    candidates common; on null-free columns the walk must equal full
    canonical enumeration filtered on containment (Apriori
    soundness — the walk docstring's completeness guarantee)."""
    from k_means_using_mapreduce_spark.operators.quality import (
        ind_lattice_walk,
    )

    cols = ["x", "y"]
    a = spark.createDataFrame(rows_a, "x int, y int")
    b = spark.createDataFrame(rows_b, "x int, y int")
    got = sorted(
        tuple(r)
        for r in ind_lattice_walk(
            {"A": (a, cols), "B": (b, cols)}
        ).collect()
    )
    assert got == _py_ind_walk({"A": rows_a, "B": rows_b}, cols)


def test_ind_lattice_walk_null_caveat_pinned(spark):
    """The documented MIND completeness caveat (found by the property
    test's earlier NULL-admitting strategy): B.(x,y) ⊆ B.(y,x) holds
    on null-complete tuples {(1,1)}, but its projection x ⊆ y fails
    only because the (0, NULL) row is excluded from the composite and
    not from the projection — so Apriori pruning drops the composite.
    The walk must emit the unary y ⊆ x IND and NOT the
    null-dependent level-2 composite (pruned, never falsely
    emitted)."""
    from k_means_using_mapreduce_spark.operators.quality import (
        ind_lattice_walk,
    )

    b = spark.createDataFrame([(0, None), (1, 1)], "x int, y int")
    out = sorted(
        tuple(r)
        for r in ind_lattice_walk({"B": (b, ["x", "y"])}).collect()
    )
    assert out == [(1, "B", "y", "B", "x", 1)]
    # full enumeration WOULD find the composite — the gap is the
    # documented pruning behavior, not a verification error
    assert (2, "B", "x,y", "B", "y,x", 1) in _py_ind_walk(
        {"B": [(0, None), (1, 1)]}, ["x", "y"]
    )
