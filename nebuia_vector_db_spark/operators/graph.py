"""Integer-exact iterative graph algorithms: PageRank power iteration
and out-degree link stats over a DataFrame edge list.

Why this operator exists in a training-data engine: web-scale corpora
carry a link graph (URL -> URL, domain -> domain), and link-centrality
is a standard quality prior for selection — Common Crawl ranks hosts
by harmonic centrality / PageRank, and pipelines like CCNet and
RefinedWeb use those ranks as keep/weight signals. At 100 TB the graph
has billions of edges; PageRank is THE canonical iterative DataFrame
algorithm, so it also pins the repo's iterative-loop discipline
(persist + unpersist per iteration, lineage truncation) the way
``doremi.py`` pins the iterative-fit discipline.

Determinism contract (what makes a full DuckDB oracle possible for an
iterative float algorithm): ranks are BIGINT micro-units, never
floats. With ``damping_pct=85`` and ``init_micro=1_000_000``:

- ``rank_0(u) = init_micro`` for every node (union of src and dst);
- each edge (u, v) contributes ``(rank_t(u) * damping_pct) div
  (100 * outdeg(u))`` — integer floor division of non-negative longs,
  so PER-EDGE values are exact and their SUM is order-independent
  (integer addition commutes; float addition does not — this is the
  same engine-exactness trick as lm.py's nll_micro);
- ``rank_{t+1}(v) = teleport + sum(in-edge contributions)`` with
  ``teleport = (init_micro * (100 - damping_pct)) div 100``;
- dangling nodes (outdeg 0) leak their damped mass — the common
  "dangling mass dropped" variant (networkx redistributes it; either
  is a valid PageRank; ours is chosen because it keeps every quantity
  a per-edge integer, hence oracle-replayable). Floor-division
  remainders leak the same way. Total mass is therefore monotonically
  non-increasing, bounded by n * init_micro — no int64 overflow until
  ~9e12 nodes.

Scale posture: each iteration is ONE shuffle (the groupBy(dst) partial
sum; map-side combine applies because the aggregate is a LongType
sum) plus a ranks-by-src join. The edge relation is analyzed once
(out-degree) and persisted WITH the precomputed denominator, so
iterations never re-derive degrees. Iterations are built LAZILY — no
action runs inside the loop, so per-iteration persist/unpersist would
be inert (the code-review r12 finding: nothing materializes between a
persist and the next iteration's unpersist) and is deliberately
absent; the two things that do real work are (a) the eager
``localCheckpoint`` every ``checkpoint_every`` iterations, which
materializes the current ranks and cuts lineage so the final plan does
not grow O(iters) deep — the classic iterative-DataFrame failure mode
at cluster scale (driver-side planning blowup) — and (b) persisting
the FINAL ranks once, so callers that fan the result into several
consumers (e.g. a curation join plus a stats pass) compute the
recurrence exactly once.

Reference scope note: the reference engine (main.go, 458 lines) has
no graph surface at all — this is extension tier (SURVEY §2.4),
composed from joins + integer aggregates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators._cache import (
    cached_relation_registry,
)

_CACHED_RELATIONS, release_cached_relations = cached_relation_registry()


def graph_nodes(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Distinct node set of an edge list: union of both endpoints.

    One column ``node``, typed as the (shared) endpoint type. A node
    that only ever appears as a destination is still a node — it
    receives teleport mass every iteration.
    """
    return (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )


def out_degrees(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, out_deg) for every node; 0 for pure sinks (dangling).

    Parallel edges count multiply — a page linking twice sends twice
    the mass, matching the multigraph PageRank convention.
    """
    deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    return (
        graph_nodes(edges, src_col, dst_col)
        .join(deg, "node", "left")
        .select(
            "node", F.coalesce("out_deg", F.lit(0).cast("long")).alias("out_deg")
        )
    )


def pagerank_exact(
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    init_micro: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
    personalize: DataFrame | None = None,
) -> DataFrame:
    """Integer-exact PageRank over an edge list; returns
    (node, rank_micro BIGINT) — see the module docstring for the
    exact recurrence the micro-units pin down.

    ``damping_pct`` is an integer percentage (85 ≙ the classic 0.85)
    so the damped contribution stays inside integer arithmetic.
    ``checkpoint_every`` bounds plan depth on long runs; the default
    never triggers for typical iters<=8 but protects a 50-iteration
    convergence run from O(iters) plan growth.

    ``personalize`` (round 13, VERDICT r12 stretch #8): a one-column
    DataFrame of SEED nodes makes this PERSONALIZED PageRank (Page et
    al. 1999 §6; the topic-/trust-biased variant crawl pipelines use
    to rank hosts by proximity to a trusted set): teleport mass lands
    ONLY on seeds — ``rank_0(v) = init_micro·[v ∈ S]`` and
    ``rank_{t+1}(v) = teleport·[v ∈ S] + Σ in-edge contributions`` —
    so rank measures reachability-weighted proximity to S. Same
    integer recurrence otherwise, hence the same unrolled-CTE oracle
    trick works (the ``graph_ppr`` registry row). Seeds not in the
    graph still seed (they hold teleport mass; their out-edges don't
    exist, so the mass leaks — the dangling convention).
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    teleport = (init_micro * (100 - damping_pct)) // 100

    nodes = graph_nodes(edges, src_col, dst_col)
    if personalize is not None:
        # ADVICE r13: a multi-column frame here means the caller
        # forgot to select the seed column — failing loudly beats
        # silently seeding from whatever column happens to be first.
        if len(personalize.columns) != 1:
            raise ValueError(
                "personalize must be a one-column DataFrame of seed "
                f"nodes; got columns {personalize.columns}"
            )
        seed_col = personalize.columns[0]
        seeds = personalize.select(
            F.col(seed_col).alias("node")
        ).distinct()
        nodes = (
            nodes.unionByName(seeds)
            .distinct()
            .join(seeds.withColumn("_s", F.lit(1)), "node", "left")
            .select(
                "node",
                F.coalesce("_s", F.lit(0)).cast("long").alias("_seed"),
            )
        )
    else:
        nodes = nodes.select("node", F.lit(1).cast("long").alias("_seed"))
    nodes = nodes.persist()
    _CACHED_RELATIONS.append(nodes)

    # Edge relation with the contribution denominator precomputed
    # once: (src, dst, den = 100 * outdeg(src)). outdeg >= 1 for every
    # src by construction (it appears in an edge), so den >= 100.
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("_deg"))
    edge_rel = (
        edges.select(
            F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
        )
        .join(deg.select(F.col(src_col).alias("_src"), "_deg"), "_src")
        .select(
            "_src",
            "_dst",
            (F.lit(100).cast("long") * F.col("_deg").cast("long")).alias(
                "_den"
            ),
        )
        .persist()
    )
    _CACHED_RELATIONS.append(edge_rel)

    ranks = nodes.select(
        "node",
        (F.lit(int(init_micro)).cast("long") * F.col("_seed")).alias(
            "rank_micro"
        ),
    )

    for it in range(iters):
        contrib = (
            edge_rel.join(
                ranks.select(
                    F.col("node").alias("_src"), "rank_micro"
                ),
                "_src",
            )
            # div = integral division on longs; per-edge floor, THEN
            # the order-independent integer sum (map-side combine).
            .select(
                "_dst",
                F.expr("(rank_micro * {d}) div _den".format(d=int(damping_pct)))
                .cast("long")
                .alias("_c"),
            )
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_in"))
        )
        new_ranks = nodes.join(
            contrib.select(F.col("_dst").alias("node"), "_in"),
            "node",
            "left",
        ).select(
            "node",
            (
                F.lit(int(teleport)).cast("long") * F.col("_seed")
                + F.coalesce(F.col("_in"), F.lit(0).cast("long"))
            ).alias("rank_micro"),
        )
        if (it + 1) % checkpoint_every == 0:
            # cut lineage so plan depth stays O(checkpoint_every);
            # eager = materialize now, so the checkpoint is a real
            # recomputation barrier, not another lazy layer.
            new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks = new_ranks
    # persist the FINAL ranks only (see the module docstring: the loop
    # is lazy, so intermediate persists would never materialize) and
    # register it ONCE for release_cached_relations.
    ranks = ranks.persist()
    _CACHED_RELATIONS.append(ranks)
    return ranks.select("node", "rank_micro")


def hits_exact(
    edges: DataFrame,
    iters: int = 3,
    init_micro: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999) with FIXED iterations and
    NO per-iteration normalization; returns (node, hub_micro,
    auth_micro) — the second centrality on the BIGINT chassis (round
    14, VERDICT r13 stretch #8), usable as an alternative
    link-quality prior where PageRank's teleport model doesn't fit
    (hub/authority asymmetry — link DIRECTORIES vs linked CONTENT).

    Recurrence (all BIGINT):

    - ``auth_0(v) = init_micro`` for every node;
    - ``hub_t(u) = Σ_{(u,v)∈E} auth_t(v)``;
    - ``auth_{t+1}(v) = Σ_{(u,v)∈E} hub_t(u)``;
    - returns ``(hub_{iters-1}, auth_{iters})`` after ``iters`` full
      rounds.

    Why no normalization: the HITS update is LINEAR, so skipping the
    per-iteration norm rescales every score by one global constant
    per round — the RANKING equals normalized HITS' at the same
    iteration count (pytest pins this against a float reference) —
    while keeping every quantity an exact integer sum of integers,
    hence order-independent and fully SQL-unrollable (the
    ``graph_hits`` row's oracle chains the rounds as CTEs, the
    pagerank_exact discipline). The price is growth: scores scale
    like (d_in·d_out)^iters · init_micro; with the int64 ceiling at
    ~9.2e18 that allows e.g. mean-degree-100 graphs for 3 rounds —
    for deeper runs lower ``init_micro`` (ranking is scale-free).

    Scale posture: each round is two edge⋈score joins + two
    groupBy shuffles with map-side combine (LongType sums); degrees
    are not needed (no division anywhere). Lazy loop + periodic
    eager localCheckpoint, same as pagerank_exact.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    nodes = graph_nodes(edges, src_col, dst_col).persist()
    _CACHED_RELATIONS.append(nodes)
    edge_rel = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).persist()
    _CACHED_RELATIONS.append(edge_rel)

    auth = nodes.select(
        "node", F.lit(int(init_micro)).cast("long").alias("auth_micro")
    )
    hub = None
    for it in range(iters):
        hub_agg = (
            edge_rel.join(
                auth.select(F.col("node").alias("_dst"), "auth_micro"),
                "_dst",
            )
            .groupBy("_src")
            .agg(F.sum("auth_micro").alias("_h"))
        )
        hub = nodes.join(
            hub_agg.select(F.col("_src").alias("node"), "_h"),
            "node",
            "left",
        ).select(
            "node",
            F.coalesce("_h", F.lit(0).cast("long")).alias("hub_micro"),
        )
        auth_agg = (
            edge_rel.join(
                hub.select(F.col("node").alias("_src"), "hub_micro"),
                "_src",
            )
            .groupBy("_dst")
            .agg(F.sum("hub_micro").alias("_a"))
        )
        auth = nodes.join(
            auth_agg.select(F.col("_dst").alias("node"), "_a"),
            "node",
            "left",
        ).select(
            "node",
            F.coalesce("_a", F.lit(0).cast("long")).alias("auth_micro"),
        )
        if (it + 1) % checkpoint_every == 0:
            hub = hub.localCheckpoint(eager=True)
            auth = auth.localCheckpoint(eager=True)
    out = hub.join(auth, "node").persist()
    _CACHED_RELATIONS.append(out)
    return out.select("node", "hub_micro", "auth_micro")


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    UNDIRECTED closure of an edge list; returns (node, community).

    Deterministic contract (fully SQL-replayable — no randomized
    tie-breaks or asynchronous visit order, the two places vanilla
    LPA is nondeterministic):

    - ``label_0(v) = v`` (the node id is its own first label, so the
      label domain is the orderable node type);
    - each round, EVERY node simultaneously adopts the most frequent
      label among its neighbors' current labels, ties broken by the
      SMALLEST label; nodes with no neighbors keep their own label;
    - ``iters`` fixed rounds (synchronous LPA on bipartite-ish
      structures can oscillate rather than converge, so a fixed
      round count is the well-defined spec — and what the unrolled
      oracle replays).

    Community detection is the graph-side sibling of the dedup
    family's connected components (``components.py``): components
    answer "transitively linked at all?", LPA answers "densely
    linked together?" — the grouping used for domain clustering and
    crawl-site discovery.

    Scale posture: per round, one groupBy((node, label)) count + one
    per-node window cut (both shuffle on node) over the symmetrized
    edge relation, which is built and persisted ONCE. Same lazy-loop
    discipline as :func:`pagerank_exact`: lineage cut every
    ``checkpoint_every`` rounds, final labels persisted once.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    from pyspark.sql import Window

    sym = (
        edges.select(
            F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
        )
        .unionByName(
            edges.select(
                F.col(dst_col).alias("_u"), F.col(src_col).alias("_v")
            )
        )
        .distinct()
        .persist()
    )
    _CACHED_RELATIONS.append(sym)
    nodes = sym.select(F.col("_u").alias("node")).distinct().persist()
    _CACHED_RELATIONS.append(nodes)

    labels = nodes.select("node", F.col("node").alias("community"))

    w = Window.partitionBy("_v").orderBy(F.desc("_n"), F.asc("_l"))
    for it in range(iters):
        votes = (
            sym.join(
                labels.select(
                    F.col("node").alias("_u"),
                    F.col("community").alias("_l"),
                ),
                "_u",
            )
            .groupBy("_v", "_l")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        winner = (
            votes.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(F.col("_v").alias("node"), F.col("_l").alias("_win"))
        )
        new_labels = nodes.join(winner, "node", "left").select(
            "node",
            F.coalesce("_win", F.col("node")).alias("community"),
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels
    # lazy loop ⇒ final-persist-only, same rationale as pagerank_exact
    labels = labels.persist()
    _CACHED_RELATIONS.append(labels)
    return labels.select("node", "community")
