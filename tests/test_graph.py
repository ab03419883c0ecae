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
