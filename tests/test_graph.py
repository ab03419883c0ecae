"""Connected components: exact expected clusterings on tiny graphs."""

from my_ocr_spark.operators.graph import connected_components, \
    remove_singletons


def test_connected_components_two_clusters(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11), (20, 20)], ["src", "dst"])
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_connected_components_chain_converges(spark):
    # long chain exercises multi-round propagation
    n = 40
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)],
                                  ["src", "dst"])
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_remove_singletons(spark):
    edges = spark.createDataFrame([(1, 2), (5, 5)], ["src", "dst"])
    labels = connected_components(edges)
    kept = {r["node"] for r in remove_singletons(labels).collect()}
    assert kept == {1, 2}


def test_distributed_and_driver_paths_agree(spark):
    """The driver-side union-find (small-graph cost-model path) and the
    distributed pointer-jumping loop must produce identical labels —
    random graphs with chains, cliques, stars and self-loops."""
    import random

    rng = random.Random(9)
    for trial in range(6):
        n = rng.randrange(5, 60)
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randrange(n, 3 * n))]
        df = spark.createDataFrame(edges, ["src", "dst"])
        drv = {r["node"]: r["component"]
               for r in connected_components(df).collect()}
        dist = {r["node"]: r["component"]
                for r in connected_components(
                    df, driver_threshold=0).collect()}
        assert drv == dist, trial
