"""RMQ / RUQ / TreeDistanceOracle vs brute-force oracles (the reference's
test_rmq.cpp / test_ruq.cpp pattern)."""

import numpy as np

from centrolign_tpu.utils.queries import RMQ, RUQ, TreeDistanceOracle
from centrolign_tpu.tree import Tree


def test_rmq_ruq_random():
    rng = np.random.default_rng(19)
    for trial in range(25):
        n = int(rng.integers(1, 500))
        arr = rng.integers(0, 15, n)
        rmq = RMQ(arr)
        ruq = RUQ(arr)
        for _ in range(30):
            b = int(rng.integers(0, n))
            e = int(rng.integers(b + 1, n + 1))
            assert rmq.range_arg_min(b, e) == b + int(np.argmin(arr[b:e]))
            assert ruq.range_unique(b, e) == len(set(arr[b:e].tolist()))


def test_tree_distance_oracle():
    newick = "((a:1.5,b:2.0):0.5,(c:3.0,(d:1.0,e:1.0):2.0):1.0):0;"
    tree = Tree(newick)
    oracle = TreeDistanceOracle(tree)

    def brute_distance(x, y):
        # path to root for both
        def path(v):
            out = {}
            d = 0.0
            while True:
                out[v] = d
                p = tree.get_parent(v)
                if p is None or p == v or p < 0:
                    break
                d += tree.distance(v)
                v = p
            return out
        pa, pb = path(x), path(y)
        best = None
        for v, da in pa.items():
            if v in pb:
                tot = da + pb[v]
                if best is None or tot < best:
                    best = tot
        return best

    names = ["a", "b", "c", "d", "e"]
    ids = [tree.get_id(n) for n in names]
    for i in range(len(ids)):
        for j in range(len(ids)):
            got = oracle.distance(ids[i], ids[j])
            exp = brute_distance(ids[i], ids[j])
            assert abs(got - exp) < 1e-9, (names[i], names[j], got, exp)
