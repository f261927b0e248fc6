"""PageRank over deterministic link graphs: hand-sized exactness, DuckDB
twin parity, multi-edge semantics, and the mass-conservation bound."""

import duckdb
import pytest

from vtcomposite_spark.operators import graph as G

SF = "/root/testdata/sf0.001"


def _pr(spark, edge_rows, iters, **kw):
    e = spark.createDataFrame(edge_rows, "src long, dst long")
    return {r.id: r.rank for r in G.pagerank(e, iters=iters, **kw).collect()}


def test_pagerank_uniform_at_zero_iters(spark):
    out = _pr(spark, [(0, 1), (1, 2), (2, 0)], iters=0)
    assert out == {0: 10 ** 12 // 3, 1: 10 ** 12 // 3, 2: 10 ** 12 // 3}


def test_pagerank_cycle_hand_case(spark):
    # 3-cycle: every node keeps the uniform mass at every iteration
    # (each sends its whole rank to exactly one successor).
    u = 10 ** 12 // 3
    expect = ((100 - 85) * 10 ** 12) // (100 * 3) + (85 * u) // 100
    out = _pr(spark, [(0, 1), (1, 2), (2, 0)], iters=1)
    assert out == {0: expect, 1: expect, 2: expect}


def test_pagerank_hub_outranks_leaf(spark):
    # 0,1,2 all link to 3; 3 links back to 0 only.
    out = _pr(spark, [(0, 3), (1, 3), (2, 3), (3, 0)], iters=5)
    assert out[3] > out[0] > out[1] == out[2]
    # leaky mass bound: total never exceeds the initial scale
    assert sum(out.values()) <= 10 ** 12


def test_pagerank_multi_edge_counts(spark):
    # a duplicated link splits src's mass across BOTH copies — dst sees
    # the same total as a single link, but src's deg is 2 so a second
    # distinct target would get half. Verify deg semantics end-to-end.
    single = _pr(spark, [(0, 1), (1, 0)], iters=1)
    double = _pr(spark, [(0, 1), (0, 1), (1, 0)], iters=1)
    assert double[1] == single[1]  # 2 * (rank div 2) == rank (even rank)
    split = _pr(spark, [(0, 1), (0, 2), (1, 0), (2, 0)], iters=1)
    assert split[1] < single[1]


def test_pagerank_validation(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        G.pagerank(e, iters=-1)
    with pytest.raises(ValueError):
        G.pagerank(e, scale=1 << 62)


def test_pagerank_duckdb_twin_parity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    edges = G.doc_link_edges(docs, out_degree=3, mod=64)
    got = {(r.id, r.rank) for r in G.pagerank(edges, iters=4).collect()}
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    sql = G.pagerank_sql(G.doc_link_edges_sql(3, 64), iters=4)
    want = {(int(a), int(b)) for a, b in con.sql(sql).fetchall()}
    assert got == want


def test_doc_link_edges_shape(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    e = G.doc_link_edges(docs, out_degree=3, mod=64)
    rows = e.collect()
    assert len(rows) <= 3 * n  # only self-loops drop
    assert all(0 <= r.dst < 64 for r in rows)
    assert all(r.src != r.dst for r in rows)


# --- TrustRank ---

def test_trustrank_seeds_hold_trust(spark):
    # star: seed 0 links to 1,2; spam node 9 links to 1 but is unreachable
    # FROM the seed, so it ends at rank 0 (no teleport mass for non-seeds).
    e = spark.createDataFrame([(0, 1), (0, 2), (9, 1)], "src long, dst long")
    s = spark.createDataFrame([(0,)], "id long")
    from vtcomposite_spark.operators import graph as G2
    out = {r.id: r.rank for r in G2.trustrank(e, s, iters=3).collect()}
    assert out[0] > 0 and out[1] > 0 and out[2] > 0
    assert out[9] == 0
    assert out[1] == out[2]  # symmetric receivers of the seed's mass


def test_trustrank_requires_in_graph_seed(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    s = spark.createDataFrame([(42,)], "id long")
    import pytest as _pt
    from vtcomposite_spark.operators import graph as G2
    with _pt.raises(ValueError):
        G2.trustrank(e, s, iters=1)


def test_trustrank_duckdb_twin_parity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    edges = G.doc_link_edges(docs, out_degree=3, mod=64)
    from pyspark.sql import functions as F
    seeds = docs.filter(F.col("doc_id") % 25 == 0) \
        .select(F.col("doc_id").alias("id"))
    got = {(r.id, r.rank)
           for r in G.trustrank(edges, seeds, iters=4).collect()}
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    sql = G.trustrank_sql(
        G.doc_link_edges_sql(3, 64),
        "SELECT doc_id AS id FROM documents WHERE doc_id % 25 = 0",
        iters=4)
    want = {(int(a), int(b)) for a, b in con.sql(sql).fetchall()}
    assert got == want


# --- degree stats ---

def test_degree_stats_hand_case(spark):
    e = spark.createDataFrame([(0, 1), (0, 1), (1, 2)], "src long, dst long")
    out = {r.id: (r.out_deg, r.in_deg, r.dangling)
           for r in G.degree_stats(e).collect()}
    # multi-edge 0->1 counts twice on both sides; 2 is dangling
    assert out == {0: (2, 0, False), 1: (1, 2, False), 2: (0, 1, True)}


def test_degree_stats_duckdb_twin_parity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    e = G.doc_link_edges(docs, out_degree=3, mod=64)
    got = {(r.id, r.out_deg, r.in_deg, r.dangling)
           for r in G.degree_stats(e).collect()}
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    want = {(int(a), int(o), int(i), bool(d)) for a, o, i, d in
            con.sql(G.degree_stats_sql(G.doc_link_edges_sql(3, 64))).fetchall()}
    assert got == want


# --- co-citation similarity ---

def test_cocitation_hand_case(spark):
    # srcs 0,1 both cite (10, 11); src 2 cites (10, 12); dup edge collapses
    e = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 11), (1, 10), (1, 11), (2, 10), (2, 12)],
        "src long, dst long")
    out = {(r.a, r.b): r.n_srcs
           for r in G.cocitation_pairs(e).collect()}
    assert out == {(10, 11): 2, (10, 12): 1}
    assert {(r.a, r.b) for r in
            G.cocitation_pairs(e, min_count=2).collect()} == {(10, 11)}
    # max_out drops hub sources from pair generation entirely
    assert {(r.a, r.b): r.n_srcs
            for r in G.cocitation_pairs(e, max_out=1).collect()} == {}


def test_cocitation_duckdb_twin_parity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    e = G.doc_link_edges(docs, out_degree=3, mod=64)
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    for mc, cap in ((1, None), (2, None), (1, 2)):
        got = {(r.a, r.b, r.n_srcs)
               for r in G.cocitation_pairs(e, mc, max_out=cap).collect()}
        want = {(int(a), int(b), int(n)) for a, b, n in con.sql(
            G.cocitation_pairs_sql(G.doc_link_edges_sql(3, 64), mc,
                                   max_out=cap)).fetchall()}
        assert got == want, (mc, cap)


def test_pagerank_round_plan_shape(spark):
    """Scale-shape gate: one propagation round aggregates contributions
    with a partial (map-side) HashAggregate before the shuffle — the
    shape that keeps per-round traffic ∝ |E| reduced, not raw."""
    from pyspark.sql import functions as F
    e = spark.createDataFrame([(i, (i * 7) % 50) for i in range(500)],
                              "src long, dst long")
    ranks = e.select(F.col("src").alias("id")).distinct() \
        .select("id", F.lit(1000000).cast("long").alias("rank"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    contribs = (ranks.join(outdeg, ranks["id"] == outdeg["src"])
                .select("src", F.expr("rank div deg").alias("c")))
    incoming = e.join(contribs, "src").groupBy("dst") \
        .agg(F.sum("c").alias("inc"))
    plan = incoming._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    # partial aggregation before the exchange: two HashAggregate levels
    assert plan.count("HashAggregate") >= 2


# --- HITS hubs/authorities ---

def _py_hits(edges, iters, scale=10 ** 9):
    """Pure-python integer HITS spec twin (L1 rescale, floor div)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    hub = {v: scale // n for v in nodes}
    auth = {v: scale // n for v in nodes}
    for _ in range(iters):
        a = {v: 0 for v in nodes}
        for s, d in edges:
            a[d] += hub[s]
        tot = sum(a.values())
        auth = {v: (a[v] * scale) // tot for v in nodes}
        h = {v: 0 for v in nodes}
        for s, d in edges:
            h[s] += auth[d]
        tot = sum(h.values())
        hub = {v: (h[v] * scale) // tot for v in nodes}
    return {v: (hub[v], auth[v]) for v in nodes}


def test_hits_hand_case_matches_python_spec(spark):
    # star: 0,1,2 -> 3 plus 3 -> 0. Node 3 is THE authority; 0,1,2 are
    # equal hubs except 0 also receives 3's hub mass as an authority.
    edges = [(0, 3), (1, 3), (2, 3), (3, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.hub, r.auth) for r in G.hits(e, iters=3).collect()}
    assert got == _py_hits(edges, 3)
    assert got[3][1] > got[0][1]           # 3 dominates authority
    assert got[0][0] == got[1][0] == got[2][0]  # symmetric hubs
    assert got[0][1] > got[1][1] == got[2][1]   # 0 earns authority from 3


def test_hits_multi_edge_counts_and_zero_iters(spark):
    # duplicated edge doubles the hub contribution on the auth half-step
    single = {r.id: r.auth for r in G.hits(
        spark.createDataFrame([(0, 1), (2, 1), (1, 0)],
                              "src long, dst long"), iters=1).collect()}
    double = {r.id: r.auth for r in G.hits(
        spark.createDataFrame([(0, 1), (0, 1), (2, 1), (1, 0)],
                              "src long, dst long"), iters=1).collect()}
    assert double[1] > single[1]
    z = {r.id: (r.hub, r.auth) for r in G.hits(
        spark.createDataFrame([(0, 1)], "src long, dst long"),
        iters=0).collect()}
    u = 10 ** 9 // 2
    assert z == {0: (u, u), 1: (u, u)}


def test_hits_validation(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        G.hits(e, iters=-1)
    with pytest.raises(ValueError):
        G.hits(e, scale=10 ** 10)  # scale^2 over int64


def test_hits_duckdb_twin_parity(spark):
    """Corpus-scale parity on the hubby synthetic graph — outdeg 3,
    heavy in-degree skew on low ids (the HUGEINT/decimal rescale path
    is exercised: raw sums exceed scale)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    edges = G.doc_link_edges(docs, out_degree=3, mod=64)
    got = {(r.id, r.hub, r.auth) for r in G.hits(edges, iters=3).collect()}
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    sql = G.hits_sql(G.doc_link_edges_sql(3, 64), iters=3)
    want = {(int(a), int(b), int(c)) for a, b, c in con.sql(sql).fetchall()}
    assert got == want


# --- Label propagation (community detection) ---

def _py_lpa(edges, iters):
    """Pure-python spec twin: synchronous, (count DESC, label ASC)."""
    und = edges + [(b, a) for a, b in edges]
    nodes = sorted({a for a, _ in und})
    lab = {v: v for v in nodes}
    for _ in range(iters):
        new = {}
        for v in nodes:
            cnt = {}
            for a, b in und:
                if a == v:
                    cnt[lab[b]] = cnt.get(lab[b], 0) + 1
            new[v] = (min(cnt, key=lambda l: (-cnt[l], l))
                      if cnt else lab[v])
        lab = new
    return lab


def test_lpa_two_cliques_with_bridge(spark):
    """Two K4 cliques joined by one bridge edge: each clique collapses
    to its min label by round 2 — the in-clique majority beats the
    bridge vote (in round 1 every vote ties, so min-label leaks over
    the bridge briefly; the majority reclaims it). Engine == the
    pure-python spec at every round depth."""
    k4a = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    k4b = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    edges = k4a + k4b + [(3, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    for it in (1, 2, 4):
        got = {r.id: r.label
               for r in G.label_propagation(e, iters=it).collect()}
        assert got == _py_lpa(edges, it), it
    assert got == {v: 0 for v in range(4)} | {v: 10 for v in range(10, 14)}


def test_lpa_zero_iters_and_validation(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r.id: r.label for r in G.label_propagation(e, iters=0).collect()}
    assert got == {0: 0, 1: 1}
    with pytest.raises(ValueError):
        G.label_propagation(e, iters=-1)


def test_lpa_multi_edge_weight_breaks_tie(spark):
    """Node 2 sees label-0 twice (doubled edge) vs label-1 once — the
    weighted vote wins; unweighted, the tie would fall to label 0 by
    the ASC tie-break anyway, so ALSO test the mirror (doubled edge to
    the HIGHER label overcomes the ASC tie-break)."""
    e = spark.createDataFrame([(2, 0), (2, 0), (2, 1)],
                              "src long, dst long")
    got = {r.id: r.label for r in G.label_propagation(e, iters=1).collect()}
    assert got[2] == 0
    e2 = spark.createDataFrame([(2, 1), (2, 1), (2, 0)],
                               "src long, dst long")
    got2 = {r.id: r.label for r in G.label_propagation(e2, iters=1).collect()}
    assert got2[2] == 1  # weight overcomes the label-ASC tie rule


def test_lpa_duckdb_twin_parity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    edges = G.doc_link_edges(docs, out_degree=3, mod=64)
    got = {(r.id, r.label) for r in
           G.label_propagation(edges, iters=3).collect()}
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    sql = G.label_propagation_sql(G.doc_link_edges_sql(3, 64), iters=3)
    want = {(int(a), int(b)) for a, b in con.sql(sql).fetchall()}
    assert got == want
