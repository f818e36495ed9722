"""Connected-components operator vs a pure-Python union-find reference.

Topologies mirror the op's intended workload (identifier-closure graphs:
star-shaped components of small diameter), plus cliques and singletons.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from esmarc_ray.ops.graph import connected_components


def _uf_components(edges):
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
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(ray_session):
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = []
    # star clusters (hub + leaves): diameter 2
    for start in range(0, 24, 8):
        hub, leaves = nodes[start], nodes[start + 1 : start + 8]
        edges += [(hub, leaf) for leaf in leaves]
    # two stars bridged by one edge: diameter 4 — the hard realistic case
    hub_a, hub_b = nodes[24], nodes[32]
    edges += [(hub_a, leaf) for leaf in nodes[25:32]]
    edges += [(hub_b, leaf) for leaf in nodes[33:40]]
    edges.append((nodes[31], nodes[39]))  # leaf-to-leaf bridge
    # clique: diameter 1
    clique = nodes[40:46]
    edges += [(a, b) for i, a in enumerate(clique) for b in clique[i + 1 :]]
    # self-loop singletons
    edges += [(n, n) for n in nodes[46:50]]

    expected = _uf_components(edges)
    got_df = connected_components(
        ray.data.from_pandas(pd.DataFrame(edges, columns=["u", "v"])),
        num_partitions=4,
    ).to_pandas()
    got = dict(zip(got_df["node"], got_df["component"]))
    assert got == expected


def test_connected_components_long_chain(ray_session):
    """A 100-node chain (diameter 99) must converge within the default
    max_rounds=8 — only possible with the pointer-jumping shortcut
    (one-hop propagation alone needs 99 rounds).  This is the shape of
    near-dup similarity graphs over templated corpora."""
    nodes = [f"c{i:03d}" for i in range(100)]
    edges = list(zip(nodes, nodes[1:]))
    got_df = connected_components(
        ray.data.from_pandas(pd.DataFrame(edges, columns=["u", "v"])),
        num_partitions=4,
    ).to_pandas()
    assert set(got_df["component"]) == {"c000"}
    assert len(got_df) == 100


def test_connected_components_empty_edges(ray_session):
    """An all-candidates-rejected verify pass hands CC an empty edge list —
    must return an empty (node, component) table, not crash in the loop."""
    empty = ray.data.from_pandas(pd.DataFrame({"u": [], "v": []}))
    comp = connected_components(empty, num_partitions=2)
    assert comp.count() == 0
    # schema survives at the Dataset level (to_pandas drops columns on any
    # zero-block dataset), so downstream expr filters still bind
    assert sorted(comp.schema().names) == ["component", "node"]
    assert comp.filter(expr="node != component").count() == 0


def test_pagerank_matches_power_iteration(ray_session):
    """Distributed PageRank == dense numpy power iteration (same damping,
    same dangling-mass redistribution), to 1e-9 after 20 rounds."""
    import numpy as np

    from esmarc_ray.ops.graph import pagerank

    # e is dangling: inbound edge only, no out-edges
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"), ("c", "e")]
    nodes = sorted({x for e in edges for x in e})
    got_df = pagerank(
        ray.data.from_pandas(pd.DataFrame(edges, columns=["u", "v"])),
        damping=0.85, n_iter=20, num_partitions=4,
    ).to_pandas()
    got = dict(zip(got_df["node"], got_df["rank"]))

    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in edges:
        A[idx[d], idx[s]] += 1.0
    out_deg = A.sum(axis=0)
    # out= is required: np.divide(..., where=...) leaves unselected entries
    # UNINITIALIZED, which silently corrupts the dangling column
    P = np.divide(A, out_deg, out=np.zeros_like(A), where=out_deg > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(20):
        dangling = r[out_deg == 0].sum()
        r = (1 - 0.85) / n + 0.85 * (P @ r + dangling / n)
    for name, i in idx.items():
        assert abs(got[name] - r[i]) < 1e-9, name
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_triangle_count_matches_bruteforce(ray_session):
    """Degree-ordered distributed count == itertools brute force on a graph
    with a hub, shared-edge triangles, and triangle-free appendages."""
    from itertools import combinations

    from esmarc_ray.ops.graph import triangle_count

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),          # triangle a-b-c
        ("c", "d"), ("d", "a"),                        # triangle a-c-d (shares edge a-c)
        ("h", "x1"), ("h", "x2"), ("h", "x3"), ("h", "x4"),  # hub, no closures
        ("x1", "x2"),                                  # closes one hub triangle
        ("p", "q"),                                    # isolated edge
        ("b", "a"), ("a", "b"),                        # duplicates/reverse
        ("z", "z"),                                    # self-loop
    ]
    adj = set()
    for s, t in edges:
        if s != t:
            adj.add((min(s, t), max(s, t)))
    nodes = sorted({x for e in adj for x in e})
    want = sum(
        1
        for x, y, z in combinations(nodes, 3)
        if (x, y) in adj and (y, z) in adj and (x, z) in adj
    )
    got = triangle_count(
        ray.data.from_pandas(pd.DataFrame(edges, columns=["u", "v"])),
        num_partitions=4,
    )
    assert got == want == 3


def test_bfs_hops_chain_and_early_stop(ray_session):
    from esmarc_ray.ops.graph import bfs_hops

    # chain 0-1-2-3-4 plus a disconnected pair 10-11
    edges = ray.data.from_pandas(
        pd.DataFrame({"u": [0, 1, 2, 3, 10], "v": [1, 2, 3, 4, 11]})
    )
    got = (
        bfs_hops(edges, [0], max_hops=3, num_partitions=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert dict(zip(got["node"], got["hop"])) == {0: 0, 1: 1, 2: 2, 3: 3}

    # multi-source + early termination (frontier dries up before max_hops)
    got2 = bfs_hops(edges, [4, 10], max_hops=8, num_partitions=4).to_pandas()
    assert dict(zip(got2["node"], got2["hop"])) == {
        4: 0, 10: 0, 3: 1, 11: 1, 2: 2, 1: 3, 0: 4,
    }


def test_label_propagation_recovers_planted_cliques(ray_session):
    from esmarc_ray.ops.graph import label_propagation

    # two 5-cliques bridged by one edge: LPA must keep them separate
    cliq_a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    cliq_b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    edges = cliq_a + cliq_b + [(4, 10)]
    ds = ray.data.from_pandas(
        pd.DataFrame({"u": [a for a, _ in edges], "v": [b for _, b in edges]})
    )
    got = label_propagation(ds, num_partitions=4).to_pandas()
    comm = dict(zip(got["node"], got["community"]))
    assert len(got) == 10
    a_labels = {comm[str(i)] for i in range(5)}
    b_labels = {comm[str(i)] for i in range(10, 15)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels


def test_sssp_prefers_cheap_multi_hop_path(ray_session):
    from esmarc_ray.ops.graph import sssp

    # direct edge 0-3 costs 10; the 0-1-2-3 detour costs 3
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "u": [0, 0, 1, 2],
                "v": [3, 1, 2, 3],
                "w": [10.0, 1.0, 1.0, 1.0],
            }
        )
    )
    got = sssp(edges, [0], max_rounds=4, num_partitions=4).to_pandas()
    dist = dict(zip(got["node"], got["dist"]))
    assert dist == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_k_core_peels_to_planted_cliques(ray_session):
    from esmarc_ray.ops.graph import k_core

    # two 4-cliques (internal degree 3) joined by a degree-2 chain
    cliq_a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    cliq_b = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    chain = [(3, 20), (20, 21), (21, 10)]
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "u": [a for a, _ in cliq_a + cliq_b + chain],
                "v": [b for _, b in cliq_a + cliq_b + chain],
            }
        )
    )
    core = k_core(edges, 3, num_partitions=4).to_pandas()
    assert set(core["node"]) == set(range(4)) | set(range(10, 14))
    assert (core["degree"] == 3).all()

    assert k_core(edges, 4, num_partitions=4).to_pandas().empty


def test_degree_assortativity_star_vs_clique(ray_session):
    """A star is maximally disassortative (r = -1); adding the outer cycle
    (wheel) raises r; the exact value is checked against a numpy Pearson
    over the orientation list."""
    import numpy as np

    from esmarc_ray.ops.graph import degree_assortativity

    star = [(0, i) for i in range(1, 6)]
    edges = ray.data.from_pandas(
        pd.DataFrame({"u": [a for a, _ in star], "v": [b for _, b in star]})
    )
    out = degree_assortativity(edges, num_partitions=4)
    assert out["n_edges"].iloc[0] == 5
    assert out["assortativity"].iloc[0] == -1.0

    wheel = star + [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)]
    edges_w = ray.data.from_pandas(
        pd.DataFrame({"u": [a for a, _ in wheel], "v": [b for _, b in wheel]})
    )
    out_w = degree_assortativity(edges_w, num_partitions=4)

    # numpy reference over both orientations
    deg: dict[int, int] = {}
    for a, b in wheel:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [deg[a] for a, b in wheel] + [deg[b] for a, b in wheel]
    ys = [deg[b] for a, b in wheel] + [deg[a] for a, b in wheel]
    r = np.corrcoef(xs, ys)[0, 1]
    assert abs(out_w["assortativity"].iloc[0] - r) < 1e-6


def test_landmark_bfs_chain_distances(ray_session):
    """0-1-2-3-4-5 chain, landmarks {0, 5}: per-landmark exact distances."""
    from esmarc_ray.ops.graph import landmark_bfs

    chain = [(i, i + 1) for i in range(5)]
    edges = ray.data.from_pandas(
        pd.DataFrame({"u": [a for a, _ in chain], "v": [b for _, b in chain]})
    )
    got = landmark_bfs(edges, [0, 5], max_hops=5, num_partitions=4).to_pandas()
    dist = {(r.lm, r.node): r.hop for r in got.itertuples()}
    assert dist[(0, 3)] == 3 and dist[(5, 3)] == 2
    assert dist[(0, 5)] == 5 and dist[(5, 0)] == 5
    assert len(got) == 12  # 6 nodes × 2 landmarks, all reached


def test_landmark_bfs_plan_equality(ray_session):
    """The size-gated local plan and the distributed rounds return the
    same (lm, node, hop) rows — incl. an isolated landmark (hop-0 only)."""
    from esmarc_ray.ops.graph import landmark_bfs

    ring = [(i, (i + 1) % 7) for i in range(7)] + [(2, 5)]
    edges = ray.data.from_pandas(
        pd.DataFrame({"u": [a for a, _ in ring], "v": [b for _, b in ring]})
    )
    key = lambda df: sorted(map(tuple, df[["lm", "node", "hop"]].to_numpy()))
    local = landmark_bfs(edges, [0, 99], max_hops=3).to_pandas()
    dist = landmark_bfs(
        edges, [0, 99], max_hops=3, num_partitions=4, small_graph_limit=0
    ).to_pandas()
    assert key(local) == key(dist)
    assert (0, 99, 99) not in {(r.lm, r.node, r.hop) for r in local.itertuples()}
    assert {(99, 99, 0)} == {
        (r.lm, r.node, r.hop) for r in local.itertuples() if r.lm == 99
    }


def test_wl_refine_distinguishes_roles(ray_session):
    """Star: after 1 round the center and the leaves get exactly two
    distinct labels; leaves (structurally identical) share one."""
    from esmarc_ray.ops.graph import wl_refine

    star = [(0, i) for i in range(1, 6)]
    edges = ray.data.from_pandas(
        pd.DataFrame({"u": [a for a, _ in star], "v": [b for _, b in star]})
    )
    got = wl_refine(edges, rounds=1, num_partitions=4).to_pandas()
    labs = got.set_index("node")["wl_label"]
    assert len(set(labs[i] for i in range(1, 6))) == 1
    assert labs[0] != labs[1]


def test_per_node_triangles_wheel(ray_session):
    """5-wheel: center sits in 5 triangles, each rim node in 2; local
    coefficients follow from exact degrees."""
    from esmarc_ray.ops.graph import per_node_triangles

    wheel = [(0, i) for i in range(1, 6)] + [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 1)
    ]
    edges = ray.data.from_pandas(
        pd.DataFrame({"u": [a for a, _ in wheel], "v": [b for _, b in wheel]})
    )
    got = per_node_triangles(edges, num_partitions=4).to_pandas()
    got["node"] = got["node"].astype(int)
    by = got.set_index("node")
    assert by.loc[0, "n_tri"] == 5 and by.loc[0, "deg"] == 5
    for rim in range(1, 6):
        assert by.loc[rim, "n_tri"] == 2 and by.loc[rim, "deg"] == 3


def test_bgp_match_path_star(ray_session):
    """3-pattern BGP (path + star): bindings match the hand-joined truth;
    a cartesian (unshared) pattern raises."""
    import pytest

    from esmarc_ray.ops.graph import bgp_match

    df = pd.DataFrame(
        {
            "subj": ["x1", "x1", "y1", "x2", "x2", "y2", "x3"],
            "pred": ["partOf", "date", "name", "partOf", "date", "name",
                      "partOf"],
            "obj": ["y1", "2001", "N1", "y2", "2002", "N2", "y3"],
        }
    )
    got = bgp_match(
        ray.data.from_pandas(df),
        [("?a", "partOf", "?b"), ("?b", "name", "?n"), ("?a", "date", "?d")],
        num_partitions=4,
    ).to_pandas()
    rows = sorted(map(tuple, got[["a", "b", "n", "d"]].to_numpy()))
    assert rows == [("x1", "y1", "N1", "2001"), ("x2", "y2", "N2", "2002")]

    with pytest.raises(ValueError, match="shares 0 variables"):
        bgp_match(
            ray.data.from_pandas(df),
            [("?a", "partOf", "?b"), ("?c", "name", "?n")],
        ).to_pandas()


def test_personalized_pagerank_matches_power_iteration(ray_session):
    """seeds= teleports (and dangling mass) only to the seed set; equals the
    dense random-walk-with-restart iteration to 1e-9."""
    import numpy as np

    from esmarc_ray.ops.graph import pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"), ("c", "e")]
    nodes = sorted({x for e in edges for x in e})
    seeds = ["a", "d"]
    got_df = pagerank(
        ray.data.from_pandas(pd.DataFrame(edges, columns=["u", "v"])),
        damping=0.85, n_iter=20, num_partitions=4, seeds=seeds,
    ).to_pandas()
    got = dict(zip(got_df["node"], got_df["rank"]))

    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in edges:
        A[idx[d], idx[s]] += 1.0
    out_deg = A.sum(axis=0)
    P = np.divide(A, out_deg, out=np.zeros_like(A), where=out_deg > 0)
    e = np.zeros(n)
    for s in seeds:
        e[idx[s]] = 1.0 / len(seeds)
    r = e.copy()
    for _ in range(20):
        dangling = r[out_deg == 0].sum()
        r = 0.85 * (P @ r) + ((1 - 0.85) + 0.85 * dangling) * e
    for name, i in idx.items():
        assert abs(got[name] - r[i]) < 1e-9, name
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_transe_separates_clusters(ray_session):
    """TransE on a planted two-cluster KG: after training, true edges score
    (squared distance) lower than corrupted cross-cluster edges — AUC >= 0.9
    — and training reduced the mean true-edge score vs the untrained init."""
    import numpy as np
    import pandas as pd
    import ray.data

    from esmarc_ray.ops.kg_embed import transe_score, transe_train

    rng = np.random.RandomState(7)
    # two 8-entity clusters, dense "rel" edges inside each cluster
    a = [f"a{i}" for i in range(8)]
    b = [f"b{i}" for i in range(8)]
    pos = [(h, "rel", t) for grp in (a, b) for h in grp for t in grp if h != t]
    triples = pd.DataFrame(pos, columns=["subj", "pred", "obj"])
    ds = ray.data.from_pandas(triples)

    emb, rel = transe_train(
        ds, dim=16, epochs=5, lr=0.5, margin=1.0, seed=13, num_partitions=4
    )

    # corrupted: cross-cluster edges (never observed)
    neg = pd.DataFrame(
        [(h, "rel", t) for h in a[:4] for t in b[:4]],
        columns=["subj", "pred", "obj"],
    )
    s_pos = transe_score(
        ray.data.from_pandas(triples), emb, rel, num_partitions=4
    ).to_pandas()["score"].to_numpy()
    s_neg = transe_score(
        ray.data.from_pandas(neg), emb, rel, num_partitions=4
    ).to_pandas()["score"].to_numpy()

    # AUC: fraction of (pos, neg) pairs ranked correctly (pos lower)
    wins = (s_pos[:, None] < s_neg[None, :]).mean()
    assert wins >= 0.9, f"AUC {wins:.3f}"
    assert s_pos.mean() < s_neg.mean()


def test_hyperball_matches_exact_anf(ray_session):
    """HyperBall ANF vs exact BFS pair counts on a planted graph (two
    cliques bridged by a path): per-t neighbourhood function within 20%,
    effective-diameter readout within ±1 of exact."""
    import numpy as np
    import pandas as pd
    import ray.data

    from esmarc_ray.ops.graph import hyperball

    # clique A (10) — path of 4 — clique B (10)
    A = [f"a{i}" for i in range(10)]
    B = [f"b{i}" for i in range(10)]
    P = ["p0", "p1", "p2", "p3"]
    edges = (
        [(x, y) for i, x in enumerate(A) for y in A[i + 1:]]
        + [(x, y) for i, x in enumerate(B) for y in B[i + 1:]]
        + [(A[0], P[0]), (P[0], P[1]), (P[1], P[2]), (P[2], P[3]), (P[3], B[0])]
    )
    df = pd.DataFrame(edges, columns=["u", "v"])
    out = hyperball(
        ray.data.from_pandas(df), p=7, max_t=12, num_partitions=4
    )

    # exact ANF by BFS
    nodes = sorted(set(df["u"]) | set(df["v"]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
    dist = np.full((n, n), -1, dtype=int)
    for s in range(n):
        dist[s, s] = 0
        q = [s]
        while q:
            nxt = []
            for x in q:
                for y in adj[x]:
                    if dist[s, y] < 0:
                        dist[s, y] = dist[s, x] + 1
                        nxt.append(y)
            q = nxt
    exact = [
        float((dist <= t).sum()) for t in range(int(out["t"].max()) + 1)
    ]
    got = out["nf"].to_numpy()
    rel = np.abs(got - np.array(exact)) / np.array(exact)
    assert rel.max() < 0.20, f"max rel err {rel.max():.3f}"

    eff_exact = next(
        t for t, e in enumerate(exact) if e >= 0.9 * exact[-1]
    )
    eff_hb = int(out.loc[out["coverage"] >= 0.9, "t"].iloc[0])
    assert abs(eff_hb - eff_exact) <= 1


def test_path_eval_operators(ray_session):
    """SPARQL property-path algebra vs hand-computed pair sets: atom, inv,
    alt, seq, plus (closure with cycle), star (adds identity)."""
    import pandas as pd
    import ray.data

    from esmarc_ray.ops.graph import path_eval

    rels = {
        # a chain with a cycle: 1→2→3→1, plus 3→4
        "p": pd.DataFrame({"s": ["1", "2", "3", "3"], "o": ["2", "3", "1", "4"]}),
        "q": pd.DataFrame({"s": ["4"], "o": ["5"]}),
    }

    def pairs_of(name):
        return ray.data.from_pandas(rels[name])

    def run(path, **kw):
        got = path_eval(pairs_of, path, num_partitions=2, **kw).to_pandas()
        return set(zip(got["s"], got["o"]))

    assert run("p") == {("1", "2"), ("2", "3"), ("3", "1"), ("3", "4")}
    assert run(("inv", "q")) == {("5", "4")}
    assert run(("alt", "p", "q")) == {
        ("1", "2"), ("2", "3"), ("3", "1"), ("3", "4"), ("4", "5")
    }
    assert run(("seq", "p", "q")) == {("3", "5")}
    # closure: within the 3-cycle every node reaches every node (incl.
    # itself), and all of 1/2/3 reach 4
    want_plus = {
        (a, b) for a in "123" for b in "1234"
    } | {("3", "4")}
    assert run(("plus", "p")) == want_plus
    # star adds identity over p's node set (4 included, 5 not in p)
    assert run(("star", "p")) == want_plus | {(x, x) for x in "1234"}
    # depth bound: max_depth=2 keeps only ≤2-hop pairs
    two_hop = {("1", "2"), ("2", "3"), ("3", "1"), ("3", "4"),
               ("1", "3"), ("2", "1"), ("3", "2"), ("2", "4")}
    assert run(("plus", "p"), max_depth=2) == two_hop


def _truss_reference(edge_list, k):
    """Brute-force peel: recompute per-edge triangle support, drop < k-2."""
    edges = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        support = {
            e: len(adj[e[0]] & adj[e[1]]) for e in edges
        }
        kept = {e for e in edges if support[e] >= k - 2}
        if kept == edges:
            return edges
        edges = kept


def test_k_truss_matches_bruteforce(ray_session):
    """k-truss vs brute-force peeling on a graph with a 5-clique, a pendant
    triangle and a chain: k=3 keeps triangles, k=4/5 isolate the clique
    (cascade: the bridge edge dies only after the pendant triangle peels)."""
    import pandas as pd
    import ray.data

    from esmarc_ray.ops.graph import k_truss

    clique = [f"c{i}" for i in range(5)]
    edge_list = [
        (a, b) for i, a in enumerate(clique) for b in clique[i + 1:]
    ]
    # pendant triangle hanging off the clique + a chain
    edge_list += [("c0", "t1"), ("t1", "t2"), ("t2", "c0")]
    edge_list += [("t2", "x1"), ("x1", "x2"), ("x2", "x3")]

    ds = ray.data.from_pandas(pd.DataFrame(edge_list, columns=["u", "v"]))
    for k in (3, 4, 5):
        got_df = k_truss(ds, k=k, num_partitions=4).to_pandas()
        got = (
            set(zip(got_df["a"], got_df["b"])) if len(got_df) else set()
        )
        assert got == _truss_reference(edge_list, k), f"k={k}"
    # k=6 on a 5-clique: empty
    assert k_truss(ds, k=6, num_partitions=4).count() == 0


def _brandes_reference(edge_list, sources=None):
    """Textbook single-machine Brandes: per-source BFS + dependency
    accumulation; returns raw delta sums (no /2) restricted to sources."""
    from collections import deque

    adj = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    srcs = nodes if sources is None else sources
    bc = {n: 0.0 for n in nodes}
    for s in srcs:
        order, pred = [], {n: [] for n in nodes}
        sigma = {n: 0.0 for n in nodes}
        dist = {n: -1 for n in nodes}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            x = q.popleft()
            order.append(x)
            for w in adj[x]:
                if dist[w] < 0:
                    dist[w] = dist[x] + 1
                    q.append(w)
                if dist[w] == dist[x] + 1:
                    sigma[w] += sigma[x]
                    pred[w].append(x)
        delta = {n: 0.0 for n in nodes}
        for w in reversed(order):
            for p in pred[w]:
                delta[p] += sigma[p] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_exact_all_sources(ray_session):
    """sources = all nodes ⇒ the distributed Brandes equals the textbook
    one exactly (float sums of small rationals — bit-comparable after
    rounding).  Graph mixes a cycle, a bridge and a star so every code
    path (multi-predecessor sigma, deep levels, leaves) is exercised."""
    import pandas as pd
    import ray.data

    from esmarc_ray.ops.graph import betweenness

    edge_list = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),  # 4-cycle
        ("d", "e"),                                        # bridge
        ("e", "f"), ("e", "g"), ("e", "h"),                # star
        ("h", "i"), ("i", "j"),                            # tail
    ]
    nodes = sorted({x for e in edge_list for x in e})
    ds = ray.data.from_pandas(pd.DataFrame(edge_list, columns=["u", "v"]))
    got = betweenness(ds, nodes, num_partitions=4).to_pandas()
    want = _brandes_reference(edge_list)
    got_map = dict(zip(got["node"], got["betweenness"]))
    for n in nodes:
        assert abs(got_map.get(n, 0.0) - want[n]) < 1e-9, n


def test_betweenness_sampled_sources(ray_session):
    """A strict source subset equals the brute force restricted to the same
    subset (the estimator's per-source terms are exact)."""
    import pandas as pd
    import ray.data

    from esmarc_ray.ops.graph import betweenness

    edge_list = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("d", "e"),
        ("e", "f"), ("c", "f"),
    ]
    srcs = ["a", "d"]
    ds = ray.data.from_pandas(pd.DataFrame(edge_list, columns=["u", "v"]))
    got = betweenness(ds, srcs, num_partitions=2).to_pandas()
    want = _brandes_reference(edge_list, sources=srcs)
    got_map = dict(zip(got["node"], got["betweenness"]))
    for n in sorted({x for e in edge_list for x in e}):
        assert abs(got_map.get(n, 0.0) - want[n]) < 1e-9, n


def test_betweenness_undirected_halving(ray_session):
    """undirected_pairs=True halves the all-sources sum (the NetworkX
    convention for undirected graphs)."""
    import pandas as pd
    import ray.data

    from esmarc_ray.ops.graph import betweenness

    edge_list = [("a", "b"), ("b", "c")]
    nodes = ["a", "b", "c"]
    ds = ray.data.from_pandas(pd.DataFrame(edge_list, columns=["u", "v"]))
    got = betweenness(
        ds, nodes, num_partitions=2, undirected_pairs=True
    ).to_pandas()
    got_map = dict(zip(got["node"], got["betweenness"]))
    assert abs(got_map["b"] - 1.0) < 1e-9  # one pair (a,c) through b


def _edge_brandes_reference(edge_list, sources=None):
    """Textbook edge-betweenness accumulation (raw sums, no /2)."""
    from collections import deque

    adj = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    srcs = nodes if sources is None else sources
    ebc = {}
    for s in srcs:
        order, pred = [], {n: [] for n in nodes}
        sigma = {n: 0.0 for n in nodes}
        dist = {n: -1 for n in nodes}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            x = q.popleft()
            order.append(x)
            for w in adj[x]:
                if dist[w] < 0:
                    dist[w] = dist[x] + 1
                    q.append(w)
                if dist[w] == dist[x] + 1:
                    sigma[w] += sigma[x]
                    pred[w].append(x)
        delta = {n: 0.0 for n in nodes}
        for w in reversed(order):
            for p in pred[w]:
                c = sigma[p] / sigma[w] * (1.0 + delta[w])
                key = (min(p, w), max(p, w))
                ebc[key] = ebc.get(key, 0.0) + c
                delta[p] += c
    return ebc


def test_edge_betweenness_exact_all_sources(ray_session):
    """All-sources distributed edge betweenness equals the textbook
    accumulation on the cycle+bridge+star fixture; the bridge edge carries
    the most flow (the Girvan-Newman cut signal)."""
    import pandas as pd
    import ray.data

    from esmarc_ray.ops.graph import edge_betweenness

    edge_list = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
        ("d", "e"),
        ("e", "f"), ("e", "g"), ("e", "h"),
        ("h", "i"), ("i", "j"),
    ]
    nodes = sorted({x for e in edge_list for x in e})
    ds = ray.data.from_pandas(pd.DataFrame(edge_list, columns=["u", "v"]))
    got = edge_betweenness(ds, nodes, num_partitions=4).to_pandas()
    want = _edge_brandes_reference(edge_list)
    got_map = {(r.a, r.b): r.betweenness for r in got.itertuples()}
    assert set(got_map) == set(want)
    for k in want:
        assert abs(got_map[k] - want[k]) < 1e-9, k
    # the bridge (d, e) splits the two communities — maximal flow
    assert max(want, key=want.get) == ("d", "e")


def test_edge_betweenness_sampled_sources(ray_session):
    import pandas as pd
    import ray.data

    from esmarc_ray.ops.graph import edge_betweenness

    edge_list = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("d", "e"),
        ("e", "f"), ("c", "f"),
    ]
    srcs = ["a", "f"]
    ds = ray.data.from_pandas(pd.DataFrame(edge_list, columns=["u", "v"]))
    got = edge_betweenness(ds, srcs, num_partitions=2).to_pandas()
    want = _edge_brandes_reference(edge_list, sources=srcs)
    got_map = {(r.a, r.b): r.betweenness for r in got.itertuples()}
    for k, val in want.items():
        assert abs(got_map.get(k, 0.0) - val) < 1e-9, k
    for k in got_map:
        assert k in want


def test_deterministic_walks_follow_edges(ray_session):
    """Every consecutive step must traverse a real (undirected) edge, walks
    start at their designated nodes, lengths are exact, and a rerun is
    bit-identical (the hash step rule has no RNG state)."""
    import pandas as pd

    from esmarc_ray.ops.graph import deterministic_walks

    edges_df = pd.DataFrame(
        {"u": [1, 1, 2, 3, 4, 5], "v": [2, 3, 3, 4, 5, 1]}
    )
    edges = ray.data.from_pandas(edges_df)
    out = deterministic_walks(
        edges, [1, 2], walk_len=5, walks_per_node=3, num_partitions=4
    ).to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    assert len(out) == 6 * 6  # 6 walks × (walk_len+1) rows
    und = set(map(tuple, edges_df.to_numpy())) | set(
        map(tuple, edges_df[["v", "u"]].to_numpy())
    )
    for wid, grp in out.groupby("walk_id"):
        nodes = grp.sort_values("step")["node"].tolist()
        assert nodes[0] == (1 if wid < 3 else 2)
        assert len(nodes) == 6
        for a, b in zip(nodes, nodes[1:]):
            assert (a, b) in und, (wid, a, b)
    rerun = deterministic_walks(
        edges, [1, 2], walk_len=5, walks_per_node=3, num_partitions=4
    ).to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    assert rerun.equals(out)
