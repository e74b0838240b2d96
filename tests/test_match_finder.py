"""Match finding vs a brute-force oracle (the reference's own test style:
exhaustive substring enumeration, src/test/test_match_finding.cpp)."""

import numpy as np
import pytest

from centrolign_tpu.graph import BaseGraph
from centrolign_tpu.modify_graph import make_base_graph, add_sentinels
from centrolign_tpu.match_finder import (
    PathIndex, find_minimal_rare_matches, find_matches, suffix_array_doubling,
    lcp_kasai_doubling,
)


def brute_sa(text):
    n = len(text)
    return np.array(sorted(range(n), key=lambda i: list(text[i:])), dtype=np.int64)


@pytest.mark.parametrize("trial", range(5))
def test_suffix_array_and_lcp(trial):
    rng = np.random.default_rng(trial)
    n = int(rng.integers(2, 200))
    text = np.concatenate([rng.integers(1, 5, size=n), [0]])
    sa = suffix_array_doubling(text)
    assert np.array_equal(sa, brute_sa(text))
    lcp = lcp_kasai_doubling(text, sa)
    for i in range(1, len(sa)):
        a, b = text[sa[i - 1]:], text[sa[i]:]
        l = 0
        while l < min(len(a), len(b)) and a[l] == b[l]:
            l += 1
        assert lcp[i] == l, i


def _wrapped_texts(graphs, tabs):
    """Per-component wrapped path texts with start node ids, as the index
    builds them."""
    out = []
    for gi, (g, t) in enumerate(zip(graphs, tabs)):
        for pid in range(g.path_size):
            p = g.path(pid)
            text = np.concatenate((
                [t.src_sentinel + 1], g.labels[p].astype(np.int64) + 1,
                [t.snk_sentinel + 1]))
            ids = np.concatenate(([t.src_id], p, [t.snk_id]))
            out.append((gi, text, ids))
    return out


def brute_minimal_rare_matches(graphs, tabs, max_count, max_len=12):
    """From-first-principles definition: S is an MRM iff every per-graph
    distinct-start count is >= 1, their product is <= max_count, and (for
    |S| >= 2) dropping the last char and dropping the first char each
    strictly increase the count on some graph."""
    texts = _wrapped_texts(graphs, tabs)
    num_comps = len(graphs)

    def counts(s):
        starts = [set() for _ in range(num_comps)]
        for (gi, text, ids) in texts:
            n = len(text)
            for i in range(n - len(s) + 1):
                if np.array_equal(text[i:i + len(s)], s):
                    starts[gi].add(int(ids[i]))
        return [len(x) for x in starts]

    # enumerate all distinct substrings up to max_len
    seen = set()
    cands = []
    for (gi, text, ids) in texts:
        n = len(text)
        for i in range(n):
            for L in range(1, min(max_len, n - i) + 1):
                key = tuple(text[i:i + L].tolist())
                if key not in seen:
                    seen.add(key)
                    cands.append(np.array(key, dtype=np.int64))

    result = set()
    for s in cands:
        cnt = counts(s)
        if any(c == 0 for c in cnt):
            continue
        total = 1
        for c in cnt:
            total *= c
        if total > max_count:
            continue
        if len(s) >= 2:
            pc = counts(s[:-1])
            lc = counts(s[1:])
            if not (any(p > c for p, c in zip(pc, cnt))
                    and any(l > c for l, c in zip(lc, cnt))):
                continue
        result.add((tuple(s.tolist()), tuple(cnt)))
    return result


def _index_matches_as_strings(graphs, tabs, max_count):
    index = PathIndex.build(graphs, tabs)
    raw = find_minimal_rare_matches(index, len(graphs), max_count)
    out = set()
    for (b, e, L, cnt) in raw:
        s = index.text[index.sa[b]: index.sa[b] + L]
        out.add((tuple(int(x) for x in s), tuple(int(c) for c in cnt)))
    return out


@pytest.mark.parametrize("trial", range(6))
@pytest.mark.parametrize("max_count", [3, 3000])
def test_mrm_vs_brute_force_sequences(trial, max_count):
    rng = np.random.default_rng(100 + trial)
    n1, n2 = int(rng.integers(5, 40)), int(rng.integers(5, 40))
    seq1 = "".join("ACGT"[i] for i in rng.integers(0, 4, n1))
    seq2 = "".join("ACGT"[i] for i in rng.integers(0, 4, n2))
    g1 = make_base_graph("a", seq1)
    g2 = make_base_graph("b", seq2)
    t1 = add_sentinels(g1, 5, 6)
    t2 = add_sentinels(g2, 7, 8)
    got = _index_matches_as_strings([g1, g2], [t1, t2], max_count)
    want = brute_minimal_rare_matches([g1, g2], [t1, t2], max_count)
    assert got == want


def test_mrm_multi_path_dedup():
    """Two identical paths through the same graph nodes must not double-count
    starts (distinct-start semantics)."""
    rng = np.random.default_rng(9)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 25))
    g1 = make_base_graph("a", seq)
    # second path over the same nodes
    p2 = g1.add_path("a2")
    g1.extend_path_array(p2, g1.path(0))
    g2 = make_base_graph("b", seq[3:18])
    t1 = add_sentinels(g1, 5, 6)
    t2 = add_sentinels(g2, 7, 8)
    got = _index_matches_as_strings([g1, g2], [t1, t2], 3000)
    want = brute_minimal_rare_matches([g1, g2], [t1, t2], 3000)
    assert got == want


def test_find_matches_walks():
    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))
    g1 = make_base_graph("a", seq)
    g2 = make_base_graph("b", seq[5:30])
    t1 = add_sentinels(g1, 5, 6)
    t2 = add_sentinels(g2, 7, 8)
    sets = find_matches(g1, g2, t1, t2, 3000)
    assert sets, "expected at least one match set"
    for ms in sets:
        assert ms.count1 == len(ms.walks1) >= 1
        assert ms.count2 == len(ms.walks2) >= 1
        assert ms.walks1.shape[1] == ms.full_length
        # walks spell the same string in both graphs
        s1 = g1.labels[ms.walks1[0]]
        for w in ms.walks2:
            assert np.array_equal(g2.labels[w], s1)


# ---------------------------------------------------------------- native ---

@pytest.mark.parametrize("trial", range(8))
def test_native_esa_build_matches_python(trial):
    from centrolign_tpu.native import esa_build
    rng = np.random.default_rng(100 + trial)
    n = int(rng.integers(2, 2000))
    text = np.concatenate([rng.integers(1, int(rng.integers(3, 10)), size=n),
                           [0]])
    sa, isa, lcp = esa_build(text)
    sa_py = suffix_array_doubling(text)
    assert np.array_equal(sa, sa_py)
    assert np.array_equal(isa[sa], np.arange(len(sa)))
    assert np.array_equal(lcp, lcp_kasai_doubling(text, sa_py))


@pytest.mark.parametrize("trial", range(6))
def test_native_mrm_matches_python(trial):
    from centrolign_tpu.match_finder import find_minimal_rare_matches_native
    from conftest import random_low_entropy_sequence, mutate_sequence

    rng = np.random.default_rng(200 + trial)
    s1 = random_low_entropy_sequence(rng, int(rng.integers(100, 500)))
    s2 = mutate_sequence(rng, s1, sub_rate=0.08, indel_rate=0.03)
    g1 = make_base_graph("a", s1)
    g2 = make_base_graph("b", s2)
    t1 = add_sentinels(g1, 5, 6)
    t2 = add_sentinels(g2, 7, 8)
    max_count = int(rng.integers(3, 50))
    idx = PathIndex.build([g1, g2], [t1, t2], use_native=False)
    py = find_minimal_rare_matches(idx, 2, max_count)
    nat = find_minimal_rare_matches_native(idx, max_count)
    assert len(py) == len(nat)
    for (pb, pe, pl, pc), (nb, ne, nl, nc) in zip(py, nat):
        assert (pb, pe, pl) == (nb, ne, nl)
        assert np.array_equal(pc, nc)
