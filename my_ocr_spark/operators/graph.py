"""Distributed connected components over an edge DataFrame.

Reference analog: ``graph_propagation`` + ``connected_components``
(``mmocr/models/textdet/postprocess/wrapper.py:544-628``) cluster text
components via BFS over thresholded edge scores — per document, in numpy.
Cross-document/cluster-scale equivalent: iterative label propagation
(every node takes the min component id in its neighborhood until fixpoint)
— the standard GraphFrames/large-star pattern on plain DataFrame joins.

Scale notes: each iteration is one self-join shuffle keyed on node id;
iteration count ≈ graph diameter after doubling (min-id propagation with
symmetrized edges converges in O(log n) rounds for typical web-ish
graphs). Labels checkpoint via localCheckpoint each round to cut the
lineage chain (otherwise the plan doubles per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _components_driver_side(e: DataFrame) -> DataFrame:
    """Union-find on a collected edge list — identical min-label
    semantics to the distributed loop (the root of each tree is always
    the component minimum because larger roots link under smaller)."""
    rows = e.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r["a"], r["b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = [(n, find(n)) for n in parent]
    # broadcast-hint BY CONSTRUCTION: this path only runs when the
    # symmetrized edge set is <= driver_threshold, so the label table
    # is bounded (<= 2x threshold nodes) and consumers joining it back
    # to a corpus-sized table get a broadcast join instead of
    # shuffling the big side (SemDeDup's final keep join was a
    # SortMergeJoin over two exchanges without it)
    return F.broadcast(e.sparkSession.createDataFrame(
        out, schema=e.select(F.col("a").alias("node"),
                             F.col("b").alias("component")).schema))


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 20,
                         driver_threshold: int = 100_000) -> DataFrame:
    """(node, component) — component = min node id reachable.

    ``edges``: DataFrame of (src, dst) pairs (any orientation; they are
    symmetrized internally). Isolated nodes absent from edges are absent
    from the output (join back upstream if needed).

    Cost model (same reasoning as broadcast-join thresholds): the
    distributed loop costs ~4 Spark jobs per iteration, which dominates
    wall time on small edge sets — below ``driver_threshold``
    symmetrized edges (default 100k, ~a few MB collected) a driver-side
    union-find produces the identical min-label result in one job
    (measured: SemDeDup's 488-edge graph, 3.2 s loop → ~0.3 s). Above
    the threshold the distributed O(log n) pointer-jumping loop runs
    unchanged; pass ``driver_threshold=0`` to force it (the tests do).
    """
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
              .union(edges.select(F.col(dst).alias("a"),
                                  F.col(src).alias("b")))
              .distinct())
    # materialize the edge set ONCE: the loop below references e every
    # iteration, and without lineage truncation Spark would re-execute
    # the caller's whole edge derivation (e.g. SemDeDup's assign +
    # bucket self-join + cosine folds) per iteration — measured 17 s vs
    # 3 s at sf0.1. Same rationale as the labels checkpoint; at cluster
    # scale swap localCheckpoint for a reliable checkpoint dir if
    # executor loss during the loop must be survivable.
    e = e.localCheckpoint(eager=True)
    if driver_threshold and e.count() <= driver_threshold:
        return _components_driver_side(e)
    labels = (e.select(F.col("a").alias("node"))
               .distinct()
               .withColumn("component", F.col("node")))
    for _ in range(max_iter):
        # neighbor minimum: every node adopts min(component) over itself
        # and its neighbors
        nbr = (e.join(labels, e.b == labels.node)
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("component").alias("nbr_min")))
        new_labels = (labels.join(nbr, "node", "left")
                      .select("node",
                              F.least("component",
                                      F.coalesce("nbr_min",
                                                 F.col("component")))
                               .alias("component")))
        # pointer jumping (path halving): component := label(component).
        # Without it convergence is O(diameter); with it O(log n) —
        # a 40-node chain needs ~6 rounds instead of 40.
        parent = new_labels.select(F.col("node").alias("p_node"),
                                   F.col("component").alias("p_comp"))
        new_labels = (new_labels
                      .join(parent,
                            new_labels.component == parent.p_node, "left")
                      .select("node",
                              F.least("component",
                                      F.coalesce("p_comp",
                                                 F.col("component")))
                               .alias("component")))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def remove_singletons(labels: DataFrame) -> DataFrame:
    """remove_single (wrapper.py:656-683): drop size-1 components."""
    sizes = (labels.groupBy("component").agg(F.count("*").alias("sz"))
                   .filter(F.col("sz") > 1).select("component"))
    return labels.join(F.broadcast(sizes), "component", "left_semi")
