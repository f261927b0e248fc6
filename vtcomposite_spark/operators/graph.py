"""Link-graph analytics over web-document tables.

PageRank is THE canonical iterative web-scale operator (the reference
engine has no analog — this is graft surface, like the dedupe family):
a corpus crawl graph's stationary link authority drives crawl
prioritization and quality weighting for training-data curation.

Engine-exactness discipline (the repo rule every oracled operator
follows): ranks live in INTEGER units of ``scale`` — per-edge
contributions are integer divisions (``rank div out_degree``) and the
damping blend is rational (``num/den``) applied as integer multiply
then divide. Integer sums are order-independent, so the result is
bit-identical across engines and partitionings; ``pagerank_sql``
replays the whole loop as an unrolled CTE chain in DuckDB.

100-TB shape: edges are a keys-only (src, dst) table persisted once;
each iteration is one equi-join of ranks onto edges plus one
map-side-combinable sum — shuffle ∝ |E| per round, never |E|² — with a
``localCheckpoint`` per round to cut the growing join lineage (the
same plan as dedupe.near_dup_components). The mass-conservation bound
(total rank ≈ ``scale``) keeps every per-node sum inside int64:
``num * incoming <= num * scale`` must stay below 2^63, enforced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import _hex4_to_int_col, hex4_to_int_sql


def pagerank(edges: DataFrame, iters: int = 5,
             damping_num: int = 85, damping_den: int = 100,
             scale: int = 10 ** 12,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Integer-arithmetic PageRank: (id, rank) after ``iters`` rounds,
    ``rank`` in units of ``scale`` (initial mass = ``scale // N`` per
    node; total ≈ ``scale``).

    The "leaky" formulation: dangling nodes (no out-edges) do not
    redistribute their mass — the standard simple variant, chosen
    because it keeps every step a pure join+sum (the redistribution
    term would add a global aggregate per round). Multi-edges count:
    a page linking twice sends two contributions, as both the out
    degree and the incoming sum see the duplicate row — the SQL twin
    agrees by construction.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if damping_num * scale >= (1 << 63):
        raise ValueError("damping_num * scale must fit in int64")
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst")).persist()
    nodes = (e.select(F.col("src").alias("id"))
             .unionByName(e.select(F.col("dst").alias("id")))
             .distinct().persist())
    n = nodes.count()  # one scalar — driver metadata, like the centroid collect
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    ranks = nodes.select("id", F.lit(scale // n).cast("long").alias("rank"))
    for it in range(iters):
        contribs = (ranks.join(outdeg, ranks["id"] == outdeg["src"])
                    .select("src", F.expr("rank div deg").alias("c")))
        incoming = (e.join(contribs, "src")
                    .groupBy("dst").agg(F.sum("c").alias("inc")))
        # lineage cut every round; only the LAST round is an eager job —
        # intermediate lazy checkpoints still truncate the logical plan at
        # build time and materialize inside the final job, so a k-round
        # run schedules ONE checkpoint job instead of k (the per-round
        # barrier was pure scheduling overhead; results are unchanged).
        # The final eager one also keeps the unpersists below safe: the
        # returned ranks never recompute from e/outdeg/nodes.
        ranks = (nodes.join(incoming, nodes["id"] == incoming["dst"], "left")
                 .select("id",
                         (F.lit(base) + F.expr(
                             f"({damping_num} * coalesce(inc, 0L)) "
                             f"div {damping_den}")).cast("long").alias("rank"))
                 .localCheckpoint(eager=it == iters - 1))
    e.unpersist()
    outdeg.unpersist()
    nodes.unpersist()
    return ranks


def pagerank_sql(edges_sql: str, iters: int = 5,
                 damping_num: int = 85, damping_den: int = 100,
                 scale: int = 10 ** 12) -> str:
    """DuckDB twin of ``pagerank`` — the loop unrolled as CTEs r0..rN
    (no recursion: a fixed iteration count IS a static plan). Every
    arithmetic step is the identical integer expression; casts pin
    DuckDB's HUGEINT sum back to BIGINT at each round."""
    nn = "(SELECT count(*) FROM nodes)"
    base = (f"(({damping_den - damping_num}::BIGINT * {scale}) "
            f"// ({damping_den} * {nn}))")
    parts = [
        f"WITH e AS ({edges_sql}), "
        "nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e), "
        "od AS (SELECT src, count(*) AS deg FROM e GROUP BY 1), "
        f"r0 AS (SELECT id, CAST({scale}::BIGINT // {nn} AS BIGINT) "
        "AS rank FROM nodes)"
    ]
    for k in range(iters):
        parts.append(
            f", r{k + 1} AS (SELECT n.id, CAST({base} + "
            f"({damping_num} * coalesce(i.inc, 0)) // {damping_den} "
            "AS BIGINT) AS rank FROM nodes n LEFT JOIN ("
            "SELECT e.dst AS id, sum(r.rank // od.deg) AS inc "
            f"FROM e JOIN r{k} r ON e.src = r.id "
            "JOIN od ON od.src = e.src GROUP BY 1) i ON n.id = i.id)")
    parts.append(f" SELECT id, rank FROM r{iters}")
    return "".join(parts)


def doc_link_edges(docs: DataFrame, out_degree: int = 3, mod: int = 256,
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic link graph over a document table: doc d
    emits ``out_degree`` links whose targets are md5-derived ids in
    [0, mod) — with ``mod`` below the corpus size every target is a
    real doc and low ids become hubs (a Zipf-ish in-degree skew, the
    shape real web graphs have). Self-loops drop. Pure expressions,
    replayed exactly by ``doc_link_edges_sql``."""
    j = F.explode(F.array(*[F.lit(i) for i in range(out_degree)])).alias("j")
    src = F.col(id_col).cast("long")
    e = docs.select(src.alias("src"), j)
    h = F.md5(F.concat(F.lit("lnk"), F.col("src").cast("string"),
                       F.lit("_"), F.col("j").cast("string")))
    return (e.select("src", (_hex4_to_int_col(h) % mod)
                     .cast("long").alias("dst"))
            .filter(F.col("src") != F.col("dst")))


def doc_link_edges_sql(out_degree: int = 3, mod: int = 256,
                       table: str = "documents",
                       id_col: str = "doc_id") -> str:
    lits = ", ".join(str(i) for i in range(out_degree))
    h = f"md5('lnk' || src || '_' || j)"
    return (
        f"SELECT src, dst FROM (SELECT {id_col}::BIGINT AS src, j, "
        f"CAST({hex4_to_int_sql(h)} % {mod} AS BIGINT) AS dst "
        f"FROM {table} CROSS JOIN (SELECT unnest([{lits}]) AS j)) "
        "WHERE src != dst"
    )


def trustrank(edges: DataFrame, seeds: DataFrame, iters: int = 5,
              damping_num: int = 85, damping_den: int = 100,
              scale: int = 10 ** 12, src_col: str = "src",
              dst_col: str = "dst", seed_col: str = "id") -> DataFrame:
    """TrustRank (Gyöngyi et al., VLDB 2004): PageRank with the teleport
    mass restricted to a hand-verified TRUSTED seed set — trust flows
    out along links, so low-rank pages are spam candidates. Same
    integer discipline and per-round plan as ``pagerank``; the only
    change is the base vector (seeds split the restart mass, non-seeds
    get 0) and the init (seeds start with ``scale // |seeds|``)."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if damping_num * scale >= (1 << 63):
        raise ValueError("damping_num * scale must fit in int64")
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst")).persist()
    nodes = (e.select(F.col("src").alias("id"))
             .unionByName(e.select(F.col("dst").alias("id")))
             .distinct().persist())
    s = seeds.select(F.col(seed_col).cast("long").alias("id")).distinct()
    # seeds outside the graph carry no links — drop them so mass math
    # matches the SQL twin's node-joined seed set
    s = s.join(nodes, "id", "left_semi").persist()
    ns = s.count()
    if ns == 0:
        raise ValueError("trustrank: no seed appears in the edge set")
    seed_base = ((damping_den - damping_num) * scale) // (damping_den * ns)
    marked = nodes.join(s.withColumn("_seed", F.lit(True)), "id", "left") \
        .select("id", F.coalesce(F.col("_seed"), F.lit(False)).alias("_seed")) \
        .persist()
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    ranks = marked.select(
        "id", F.when(F.col("_seed"), F.lit(scale // ns))
        .otherwise(F.lit(0)).cast("long").alias("rank"))
    for it in range(iters):
        contribs = (ranks.join(outdeg, ranks["id"] == outdeg["src"])
                    .select("src", F.expr("rank div deg").alias("c")))
        incoming = (e.join(contribs, "src")
                    .groupBy("dst").agg(F.sum("c").alias("inc")))
        ranks = (marked.join(incoming, marked["id"] == incoming["dst"], "left")
                 .select("id",
                         (F.when(F.col("_seed"), F.lit(seed_base))
                          .otherwise(F.lit(0))
                          + F.expr(f"({damping_num} * coalesce(inc, 0L)) "
                                   f"div {damping_den}"))
                         .cast("long").alias("rank"))
                 # pagerank's rule: lineage cut every round, ONE eager job
                 # (the last round — also keeps the unpersists safe)
                 .localCheckpoint(eager=it == iters - 1))
    for df in (e, outdeg, nodes, s, marked):
        df.unpersist()
    return ranks


def trustrank_sql(edges_sql: str, seeds_sql: str, iters: int = 5,
                  damping_num: int = 85, damping_den: int = 100,
                  scale: int = 10 ** 12) -> str:
    """DuckDB twin of ``trustrank``; ``seeds_sql`` yields one column
    ``id`` (seeds not present in the graph are dropped, as in the
    engine)."""
    ns = "(SELECT count(*) FROM s)"
    seed_base = (f"(({damping_den - damping_num}::BIGINT * {scale}) "
                 f"// ({damping_den} * {ns}))")
    parts = [
        f"WITH e AS ({edges_sql}), "
        "nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e), "
        f"s AS (SELECT DISTINCT id FROM ({seeds_sql}) "
        "WHERE id IN (SELECT id FROM nodes)), "
        "m AS (SELECT n.id, s.id IS NOT NULL AS seed FROM nodes n "
        "LEFT JOIN s ON n.id = s.id), "
        "od AS (SELECT src, count(*) AS deg FROM e GROUP BY 1), "
        f"r0 AS (SELECT id, CAST(CASE WHEN seed THEN "
        f"{scale}::BIGINT // {ns} ELSE 0 END AS BIGINT) AS rank FROM m)"
    ]
    for k in range(iters):
        parts.append(
            f", r{k + 1} AS (SELECT m.id, CAST("
            f"(CASE WHEN m.seed THEN {seed_base} ELSE 0 END) + "
            f"({damping_num} * coalesce(i.inc, 0)) // {damping_den} "
            "AS BIGINT) AS rank FROM m LEFT JOIN ("
            "SELECT e.dst AS id, sum(r.rank // od.deg) AS inc "
            f"FROM e JOIN r{k} r ON e.src = r.id "
            "JOIN od ON od.src = e.src GROUP BY 1) i ON m.id = i.id)")
    parts.append(f" SELECT id, rank FROM r{iters}")
    return "".join(parts)


def hits(edges: DataFrame, iters: int = 3, scale: int = 10 ** 9,
         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM 1999) — the classic
    complement to PageRank for web curation: authorities are pages many
    good hubs cite (content worth keeping), hubs are pages citing many
    good authorities (link directories / seed lists for a crawl
    frontier). Returns (id, hub, auth) after ``iters`` rounds.

    Integer discipline (the repo rule): scores live in integer units,
    and each half-step L1-normalizes to total ``scale`` via integer
    multiply-then-divide (``v * scale div total``) — classical HITS
    normalizes by L2, but any positive rescale preserves the ranking
    fixpoint direction, and the L1 form keeps every value an exact
    integer so ``hits_sql`` replays bit-identically. The rescale
    multiply runs as decimal(38,0)/HUGEINT (raw half-step sums reach
    outdeg_max × scale, so ``raw * scale`` overflows int64 — the same
    reason near_dup_components sums as decimal); results are ≤ scale,
    back in int64. Multi-edges count on both half-steps, as in
    ``pagerank``.

    Per round: authority(d) = Σ hub(s) over edges s→d, normalize; then
    hub(s) = Σ auth(d), normalize. 100-TB shape: two keys-only
    join+sum shuffles ∝ |E| per round; the L1 total is a 1-row
    broadcast aggregate (never a driver collect inside the loop);
    localCheckpoint per round cuts the lineage.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if scale * scale >= (1 << 63):
        raise ValueError("hits: scale^2 must fit in int64")
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst")).persist()
    nodes = (e.select(F.col("src").alias("id"))
             .unionByName(e.select(F.col("dst").alias("id")))
             .distinct().persist())
    n = nodes.count()  # driver metadata, as in pagerank
    scores = nodes.select(
        "id", F.lit(scale // n).cast("long").alias("hub"),
        F.lit(scale // n).cast("long").alias("auth"))

    def _norm(df: DataFrame, col: str) -> DataFrame:
        tot = df.agg(F.sum(col).alias("_tot"))
        return (df.crossJoin(F.broadcast(tot))
                .select("id", *[c for c in df.columns
                                if c not in ("id", col)],
                        F.expr(f"(cast({col} as decimal(38,0)) * {scale}) "
                               "div _tot").cast("long").alias(col)))

    for _ in range(iters):
        a_raw = (e.join(scores.select(F.col("id").alias("src"), "hub"),
                        "src")
                 .groupBy("dst").agg(F.sum("hub").alias("a")))
        scores = _norm(
            nodes.join(a_raw, nodes["id"] == a_raw["dst"], "left")
            .join(scores.select("id", "hub"), "id")
            .select("id", "hub",
                    F.coalesce("a", F.lit(0)).cast("long").alias("auth")),
            "auth")
        h_raw = (e.join(scores.select(F.col("id").alias("dst"), "auth"),
                        "dst")
                 .groupBy("src").agg(F.sum("auth").alias("h")))
        scores = _norm(
            nodes.join(h_raw, nodes["id"] == h_raw["src"], "left")
            .join(scores.select("id", "auth"), "id")
            .select("id", "auth",
                    F.coalesce("h", F.lit(0)).cast("long").alias("hub")),
            "hub").localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    return scores.select("id", "hub", "auth")


def hits_sql(edges_sql: str, iters: int = 3, scale: int = 10 ** 9) -> str:
    """DuckDB twin of ``hits`` — the loop unrolled; each half-step's L1
    total is a scalar subquery, every arithmetic step the identical
    integer expression."""
    nn = "(SELECT count(*) FROM nodes)"
    # every round CTE is referenced twice downstream (node frame + the
    # join side) — MATERIALIZED stops DuckDB inlining the chain, which
    # would re-evaluate the base scan 4^iters times
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql}), "
        "nodes AS MATERIALIZED "
        "(SELECT src AS id FROM e UNION SELECT dst FROM e), "
        f"s0 AS MATERIALIZED (SELECT id, "
        f"CAST({scale}::BIGINT // {nn} AS BIGINT) AS hub, "
        f"CAST({scale}::BIGINT // {nn} AS BIGINT) AS auth FROM nodes)"
    ]
    for k in range(iters):
        parts.append(
            f", a{k}r AS MATERIALIZED (SELECT n.id, n.hub, "
            "CAST(coalesce(i.a, 0) AS BIGINT) AS auth "
            f"FROM (SELECT s.id, s.hub FROM s{k} s) n LEFT JOIN ("
            "SELECT e.dst AS id, sum(s.hub) AS a FROM e "
            f"JOIN s{k} s ON e.src = s.id GROUP BY 1) i ON n.id = i.id), "
            f"a{k} AS MATERIALIZED (SELECT id, hub, CAST((auth::HUGEINT * {scale}) // "
            f"(SELECT sum(auth) FROM a{k}r) AS BIGINT) AS auth FROM a{k}r), "
            f"h{k}r AS MATERIALIZED (SELECT n.id, n.auth, "
            "CAST(coalesce(i.h, 0) AS BIGINT) AS hub "
            f"FROM (SELECT a.id, a.auth FROM a{k} a) n LEFT JOIN ("
            "SELECT e.src AS id, sum(a.auth) AS h FROM e "
            f"JOIN a{k} a ON e.dst = a.id GROUP BY 1) i ON n.id = i.id), "
            f"s{k + 1} AS MATERIALIZED (SELECT id, CAST((hub::HUGEINT * {scale}) // "
            f"(SELECT sum(hub) FROM h{k}r) AS BIGINT) AS hub, auth "
            f"FROM h{k}r)")
    parts.append(f" SELECT id, hub, auth FROM s{iters}")
    return "".join(parts)


def label_propagation(edges: DataFrame, iters: int = 5,
                      src_col: str = "src",
                      dst_col: str = "dst") -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    UNDIRECTED view of the link graph — community detection, the
    coarse-grained complement to ``near_dup_components`` (CC finds
    connected pieces; LPA finds densely linked neighborhoods inside
    them: site families, topical clusters, link farms). Returns
    (id, label) after ``iters`` synchronous rounds; labels start as
    node ids.

    Deterministic variant (the repo rule — classic LPA random-ties
    would differ per run and per engine): each node adopts the label
    most frequent among its neighbors under the TOTAL (count DESC,
    label ASC) order; an isolated node keeps its own label. Multi-edges
    count as weight, both directions (the undirected view duplicates
    each edge reversed).

    Synchronous LPA can two-color oscillate on bipartite structures —
    iters is a hard cap by design and the fixpoint is NOT asserted
    (unlike near_dup_components, whose min-label lattice makes
    convergence checkable); communities are a heuristic signal, and
    the unrolled SQL twin replays whatever state round N reaches.

    100-TB shape: one (dst, label) count shuffle + one argmin-struct
    agg per round — keys only, map-side combinable; localCheckpoint
    per round cuts the lineage, as in ``pagerank``.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    d = edges.select(F.col(src_col).cast("long").alias("a"),
                     F.col(dst_col).cast("long").alias("b"))
    e = d.unionByName(d.select(F.col("b").alias("a"),
                               F.col("a").alias("b"))).persist()
    nodes = e.select(F.col("a").alias("id")).distinct().persist()
    labels = nodes.select("id", F.col("id").alias("label"))
    for it in range(iters):
        votes = (e.join(labels.select(F.col("id").alias("b"), "label"),
                        "b")
                 .groupBy("a", "label").agg(F.count("*").alias("n")))
        best = (votes.groupBy("a")
                .agg(F.min(F.struct((-F.col("n")).alias("_neg"),
                                    F.col("label").alias("_l")))
                     .alias("_w"))
                .select(F.col("a").alias("id"),
                        F.col("_w._l").alias("_new")))
        labels = (nodes.join(best, "id", "left")
                  .join(labels, "id")
                  .select("id", F.coalesce("_new", "label").alias("label"))
                  # pagerank's rule: lazy cuts, one eager job at the end
                  .localCheckpoint(eager=it == iters - 1))
    e.unpersist()
    nodes.unpersist()
    return labels


def label_propagation_sql(edges_sql: str, iters: int = 5) -> str:
    """DuckDB twin of ``label_propagation`` — the loop unrolled;
    MATERIALIZED round CTEs (each is referenced twice, and DuckDB
    would otherwise inline the chain exponentially, as in
    ``hits_sql``)."""
    parts = [
        f"WITH e0 AS ({edges_sql}), "
        "e AS MATERIALIZED (SELECT src AS a, dst AS b FROM e0 "
        "UNION ALL SELECT dst, src FROM e0), "
        "nodes AS MATERIALIZED (SELECT DISTINCT a AS id FROM e), "
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)"
    ]
    for k in range(iters):
        parts.append(
            f", l{k + 1} AS MATERIALIZED (SELECT n.id, "
            "coalesce(w.lab, l.label) AS label "
            "FROM nodes n "
            f"JOIN l{k} l ON n.id = l.id "
            "LEFT JOIN (SELECT a AS id, "
            "(min(struct_pack(_neg := -n, _l := label)))._l AS lab "
            "FROM (SELECT e.a, l.label, count(*) AS n FROM e "
            f"JOIN l{k} l ON e.b = l.id GROUP BY 1, 2) GROUP BY 1) w "
            "ON n.id = w.id)")
    parts.append(f" SELECT id, label FROM l{iters}")
    return "".join(parts)


def degree_stats(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst") -> DataFrame:
    """Per-node link-graph degrees: (id, out_deg, in_deg, dangling) —
    the crawl-health diagnostic next to pagerank (dangling nodes are
    the mass leaks of the leaky formulation; multi-edges count, as
    there). Two keys-only counts joined onto the node set."""
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
    nodes = (e.select(F.col("src").alias("id"))
             .unionByName(e.select(F.col("dst").alias("id"))).distinct())
    od = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    idg = e.groupBy("dst").agg(F.count("*").alias("in_deg"))
    return (nodes.join(od, nodes["id"] == od["src"], "left")
            .join(idg, nodes["id"] == idg["dst"], "left")
            .select("id",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg"))
            .withColumn("dangling", F.col("out_deg") == 0))


def degree_stats_sql(edges_sql: str) -> str:
    return (
        f"WITH e AS ({edges_sql}), "
        "nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e), "
        "od AS (SELECT src, count(*) AS c FROM e GROUP BY 1), "
        "idg AS (SELECT dst, count(*) AS c FROM e GROUP BY 1) "
        "SELECT n.id, coalesce(od.c, 0)::BIGINT AS out_deg, "
        "coalesce(idg.c, 0)::BIGINT AS in_deg, "
        "coalesce(od.c, 0) = 0 AS dangling "
        "FROM nodes n LEFT JOIN od ON n.id = od.src "
        "LEFT JOIN idg ON n.id = idg.dst"
    )


def cocitation_pairs(edges: DataFrame, min_count: int = 1,
                     max_out: int | None = None, src_col: str = "src",
                     dst_col: str = "dst") -> DataFrame:
    """Co-citation similarity (Small 1973, the classic related-pages
    signal): two pages are related when the same source links BOTH —
    (a, b, n_srcs) for a < b with n_srcs co-citing sources >=
    ``min_count``.

    100-TB shape: the quadratic term is per-source outdeg² — a spammy
    mega-hub source would explode pair generation, so ``max_out`` drops
    sources above the bound from pair generation (the same sacrifice
    rule as the LSH hot-bucket caps; real co-citation analyses cap
    citing-list length for the same reason). Duplicate (src, dst)
    edges collapse first; the pair count is over distinct sources by
    construction."""
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .distinct())
    if max_out is not None:
        ok = (e.groupBy("src").count()
              .filter(F.col("count") <= max_out).select("src"))
        e = e.join(F.broadcast(ok), "src", "left_semi")
    l = e.select("src", F.col("dst").alias("a"))
    r = e.select("src", F.col("dst").alias("b"))
    return (l.join(r, "src")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b").agg(F.count("*").alias("n_srcs"))
            .filter(F.col("n_srcs") >= min_count))


def cocitation_pairs_sql(edges_sql: str, min_count: int = 1,
                         max_out: int | None = None) -> str:
    cap = ""
    if max_out is not None:
        cap = (" AND src IN (SELECT src FROM e GROUP BY 1 "
               f"HAVING count(*) <= {max_out})")
    return (
        f"WITH e0 AS ({edges_sql}), "
        "e AS (SELECT DISTINCT src, dst FROM e0) "
        "SELECT l.dst AS a, r.dst AS b, count(*)::BIGINT AS n_srcs "
        "FROM e l JOIN e r ON l.src = r.src AND l.dst < r.dst "
        f"WHERE TRUE{cap.replace('src IN', 'l.src IN')} "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_count}"
    )
