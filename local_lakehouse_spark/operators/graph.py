"""Connected components over an edge list — the clustering step that
turns pairwise near-duplicate MATCHES (x02/x03/x04/x14) into
duplicate GROUPS, so a dedup pipeline can keep exactly one document
per cluster instead of reasoning about overlapping pairs.

Algorithm: HashMin label propagation with POINTER DOUBLING, expressed
as DataFrame joins — every vertex adopts the minimum label in its
closed neighborhood, then additionally the label OF its label, so
label chains halve each round and convergence is O(log diameter)
(the round-complexity class of Kiveris et al.'s large-star/small-star
"Connected Components in MapReduce and Beyond", at the cost of one
extra label-keyed join per round). Near-dup graphs are overwhelmingly
tiny star/clique clusters (diameter ≤ ~3) and close in a handful of
rounds either way; the doubling is what keeps adversarial long-chain
graphs from exhausting max_iter.

Iterative-plan hygiene: every round materializes via
``localCheckpoint`` — without it the lineage doubles per round and
Catalyst planning time explodes; with it each round's shuffle state
is the only thing carried forward. The convergence check rides the
same job that materializes the round (count of changed labels), so
each round is exactly one Spark job.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
    on_unconverged: str = "warn",
    accelerate: bool = True,
) -> DataFrame:
    """(id, component) for every vertex in ``edges``; ``component`` is
    the minimum vertex id reachable from ``id``. Undirected.

    HashMin label propagation; with ``accelerate`` (default) each
    round also applies one POINTER-DOUBLING step — label(u) ←
    label(label(u)) — so label chains halve every round and
    convergence is O(log diameter) instead of O(diameter): a
    1000-hop path closes in ~10 rounds, not 1000 (the same
    round-complexity class as the alternating large-star/small-star
    scheme of Kiveris et al., with one extra label-keyed join per
    round as the price). Near-dup graphs are star-like (diameter
    ≤ ~3) and converge in a handful of rounds either way.

    ``on_unconverged`` controls the ``max_iter``-exhausted case:
    ``"warn"`` (default) emits a warning and returns the partial
    labels, ``"raise"`` raises RuntimeError, ``"ignore"`` returns
    silently.
    """
    if on_unconverged not in ("warn", "raise", "ignore"):
        raise ValueError(f"on_unconverged={on_unconverged!r}")
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    changed = -1
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = labels.join(
            nbr_min, labels.id == nbr_min.u, "left"
        ).select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        if accelerate:
            # Pointer doubling: adopt the label OF my label. Labels
            # always point at smaller ids (least() above), so chains
            # only shorten; one label-keyed self-join per round.
            parent = new_labels.select(
                F.col("id").alias("p_id"), F.col("label").alias("p_label")
            )
            new_labels = new_labels.join(
                parent, new_labels.label == parent.p_id, "left"
            ).select(
                "id",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("p_label"), F.col("label")),
                ).alias("label"),
            )
        new_labels = (
            new_labels.join(
                labels.select(
                    F.col("id").alias("o_id"), F.col("label").alias("o_label")
                ),
                F.col("id") == F.col("o_id"),
            )
            .select(
                "id",
                "label",
                (F.col("label") != F.col("o_label")).alias("__changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    if changed != 0 and on_unconverged != "ignore":
        msg = (
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing); returned "
            "components may be split — raise max_iter for graphs with "
            "diameter > max_iter"
        )
        if on_unconverged == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select("id", F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(id, keep_id) for every document that appears in a near-dup
    pair: ``keep_id`` is the cluster representative (minimum id), so
    ``id != keep_id`` rows are the ones a dedup pass drops. Composes
    with any pairwise matcher (ngram_jaccard_pairs, minhash_lsh_pairs,
    embedding_near_dup_pairs...).
    """
    comp = connected_components(pairs, id_a, id_b)
    return comp.select("id", F.col("component").alias("keep_id"))


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst", top_k: int = 20
) -> DataFrame:
    """(id, n_triangles) for the ``top_k`` vertices by triangle
    participation — the clustering-coefficient numerator, computed
    with the DEGREE-ORDERED ORIENTATION trick (Suri & Vassilvitskii,
    WWW'11 "Counting Triangles and the Curse of the Last Reducer"):
    each undirected edge is directed from its (degree, id)-smaller
    endpoint to the larger, so every triangle is counted exactly once
    as a wedge u→v, u→w (v<w in orientation order) closed by edge
    v→w, and per-vertex out-degree — hence the wedge blow-up — is
    bounded by O(√m) instead of the max raw degree. This is the
    standard defense against the hub-wedge explosion that kills naive
    triangle joins at scale.

    Input may be directed/duplicated; it is symmetrized + deduped
    first. Two self-joins on 8-byte keys, wedge side generated
    map-side from the oriented lists.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # orientation key (degree, id) totally orders vertices
    keyed = (
        sym.join(deg.withColumnRenamed("u", "x").withColumnRenamed("d", "du"),
                 F.col("u") == F.col("x"))
        .drop("x")
        .join(deg.withColumnRenamed("u", "y").withColumnRenamed("d", "dv"),
              F.col("v") == F.col("y"))
        .drop("y")
    )
    oriented = keyed.filter(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ).select("u", "v")
    a, b = oriented.alias("a"), oriented.alias("b")
    wedges = a.join(b, F.col("a.u") == F.col("b.u")).filter(
        F.col("a.v") < F.col("b.v")
    ).select(
        F.col("a.u").alias("w_u"),
        F.col("a.v").alias("w_v"),
        F.col("b.v").alias("w_w"),
    )
    # wedge endpoints satisfy w_v < w_w (id order), and ``und`` holds
    # every undirected edge as (min, max) — so the closing-edge probe
    # is a plain two-key equi-join (hash join), independent of which
    # way the degree orientation pointed the closing edge
    closer = und.select(F.col("u").alias("c_a"), F.col("v").alias("c_b"))
    tri = wedges.join(
        closer,
        (F.col("w_v") == F.col("c_a")) & (F.col("w_w") == F.col("c_b")),
    ).select("w_u", "w_v", "w_w")
    per_vertex = (
        tri.select(F.explode(F.array("w_u", "w_v", "w_w")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        per_vertex.orderBy(F.desc("n_triangles"), "id").limit(top_k)
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
    dedupe_edges: bool = False,
) -> DataFrame:
    """PageRank (Page et al. 1999) in FIXED-POINT integer arithmetic:
    ranks are integers in units of 1/``scale``, every step is bigint
    DIV / multiply / sum — so the result is bit-identical across
    engines, partitionings, and summation orders (double-based
    PageRank sums floats in nondeterministic order and can never be
    hash-compared). The recurrence per iteration:

        contrib(u) = r(u) DIV outdeg(u)
        r'(v)      = BASE + (damping_pct · Σ_{u→v} contrib(u)) DIV 100
        BASE       = ((100 - damping_pct) · (scale DIV N)) DIV 100

    Truncation loses < 1/scale per op — at the default 1e-12 units it
    is far below any ranking-relevant difference.

    Distribution: each iteration is ONE shuffle join (ranks ⋈ edges
    on src — ranks is the small side and AQE broadcasts it for
    dimension-sized graphs) + one groupBy(dst) sum with map-side
    combine, then a left join back to the node frame so nodes with
    no inbound edges keep their base-rank row instead of vanishing.

    Nodes are src ∪ dst of the edge list, so directed input is a
    first-class citizen: a node with zero out-edges (dangling) has
    its rank mass redistributed uniformly each round — the standard
    dangling-node correction (D DIV N added to every node's incoming
    sum, D = Σ dangling ranks via a 1-row aggregate broadcast back).
    For symmetrized input every node has outdeg ≥ 1 and an in-edge,
    D = 0, and the recurrence is identical to the plain formulation
    (x66's oracle answer is unchanged). The dangling aggregate is
    skipped entirely when the graph has no dangling nodes (one
    upfront anti-join count).
    """
    # Materialize the edge list ONCE — it is referenced by outdeg,
    # the node count, and every iteration's join; without this the
    # (possibly expensive) upstream edge derivation re-executes per
    # round. HASH-PARTITION it by dst at the same time: the per-round
    # contrib join is a broadcast (ranks is node-sized), which
    # preserves e's partitioning, so every round's groupBy(dst)
    # aggregate reuses it with NO exchange — one upfront shuffle
    # replaces n_iter shuffles of the full edge list.
    sess = edges.sparkSession
    n_part = max(int(sess.conf.get("spark.sql.shuffle.partitions")), 1)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).repartition(n_part, "dst")
    if dedupe_edges:
        # rides the SAME dst shuffle: hashpartitioning(dst) satisfies
        # the (src, dst) clustered distribution dropDuplicates needs,
        # so callers with possibly-duplicated pairs skip their own
        # full-edge distinct exchange entirely
        e = e.dropDuplicates(["src", "dst"])
    e = e.localCheckpoint(eager=False)
    # r12 (guide §2.4 "remove shuffles outright"): the node frame,
    # out-degrees, and the three structural counts previously took
    # three full-edge passes (union+distinct for nodes, groupBy(src)
    # for outdeg, distinct(dst) for inbound flags) plus two
    # node-sized joins under the stats aggregate — measured 2.4-2.8 s
    # of x66's 4.9 s before the first iteration ran. ONE exploded
    # groupBy computes all of it: each edge contributes
    # (src, out=1, in=0) and (dst, out=0, in=1); per-node sums are
    # the degrees (map-side partial aggregation collapses the 2×
    # fanout within each edge partition), and the driver stats fold
    # out of the same node-sized table. The table persists once
    # (localCheckpoint) so the per-round outdeg broadcast reads
    # persisted node rows instead of re-aggregating the edge list.
    nodeinfo = (
        e.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("node"),
                        F.lit(1).alias("o"),
                        F.lit(0).alias("i"),
                    ),
                    F.struct(
                        F.col("dst").alias("node"),
                        F.lit(0).alias("o"),
                        F.lit(1).alias("i"),
                    ),
                )
            ).alias("x")
        )
        .groupBy(F.col("x.node").alias("node"))
        .agg(
            F.sum("x.o").alias("__outdeg"),
            F.sum("x.i").alias("__indeg"),
        )
        .localCheckpoint(eager=False)
    )
    nodes = nodeinfo.select("node")
    outdeg = nodeinfo.filter(F.col("__outdeg") > 0).select(
        F.col("node").alias("src"), F.col("__outdeg").alias("outdeg")
    )
    stats = nodeinfo.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("__outdeg") == 0, 1).otherwise(0)).alias(
            "n_dangling"
        ),
        F.sum(F.when(F.col("__indeg") == 0, 1).otherwise(0)).alias(
            "n_no_inbound"
        ),
    ).collect()[0]
    n, n_dangling, n_no_inbound = stats.n, stats.n_dangling, stats.n_no_inbound
    base = ((100 - damping_pct) * (scale // n)) // 100

    # n is KNOWN driver-side (the stats aggregate above), so the
    # rank-side broadcast is an explicit, deterministic decision
    # instead of hoping AQE converts each iteration's SortMergeJoin
    # at runtime: below the cap (~32 MB of (node, rank) rows) every
    # per-iteration edges ⋈ contrib is a BroadcastHashJoin that
    # PRESERVES e's dst-partitioning, so the groupBy(dst) aggregate
    # runs with no exchange — zero full-edge shuffles per iteration.
    # Web-scale graphs (n > cap) keep the shuffle join, which is the
    # right plan when ranks no longer fit in one executor's memory.
    broadcast_ranks = n <= 2_000_000
    _b = F.broadcast if broadcast_ranks else (lambda df: df)

    ranks = nodes.withColumn("r", F.lit(scale // n).cast("bigint"))
    for _ in range(n_iter):
        with_deg = ranks.join(
            _b(outdeg), ranks["node"] == outdeg["src"], "left"
        ).select("node", "r", "outdeg")
        contrib = with_deg.filter(F.col("outdeg").isNotNull()).select(
            "node", F.expr("r DIV outdeg").alias("c")
        )
        incoming = (
            e.join(_b(contrib), e["src"] == contrib["node"])
            .groupBy(e["dst"].alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        if n_no_inbound:
            # keep no-inbound nodes alive with a zero incoming sum
            new_ranks = nodes.join(incoming, "node", "left").select(
                "node", F.coalesce("s", F.lit(0).cast("bigint")).alias("s")
            )
        else:
            # every node has an in-edge → incoming IS the node set;
            # skip the join-back (the common symmetrized-graph case)
            new_ranks = incoming
        if n_dangling:
            # Uniform share of the dangling mass, same fixed-point
            # units; 1-row aggregate broadcast onto every node row.
            dang = (
                with_deg.filter(F.col("outdeg").isNull())
                .agg(F.sum("r").alias("__d"))
                .select(F.coalesce("__d", F.lit(0).cast("bigint")).alias("__d"))
            )
            new_ranks = new_ranks.crossJoin(F.broadcast(dang)).select(
                "node", F.expr(f"s + (__d DIV {n})").alias("s")
            )
        ranks = new_ranks.select(
            "node",
            (
                F.lit(base) + F.expr(f"({damping_pct} * s) DIV 100")
            ).alias("r"),
        )
        # No per-round checkpoint: each round's output feeds exactly
        # the next round, so lineage stays LINEAR in n_iter (unlike
        # connected_components' doubling) and one job pipelines the
        # whole recurrence. Checkpoint per round only when n_iter is
        # large enough for planning time to bite.
        if n_iter > 8:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
