"""Connected components (iterative label propagation) + k-means Lloyd loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_spark.operators.clustering import inertia, kmeans_assign, kmeans_fit
from stream_cdc_spark.operators.dedup import connected_components
from tests.conftest import SF_SMALL


def test_connected_components_known_graph(spark):
    # two chains and one isolated edge: {1-2-3-4}, {10-11}, {20-21-22}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "id_a long, id_b long",
    )
    got = {
        r.vertex: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_converges_on_long_chain(spark):
    # a 30-vertex path needs ~log-diameter rounds with doubling via min
    # propagation; with plain propagation it needs diameter rounds — the
    # max_iter guard must still reach the fixpoint
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    comp = connected_components(edges, max_iter=40)
    assert comp.select(F.count_distinct("component")).first()[0] == 1
    assert comp.filter(F.col("component") != 0).count() == 0


def test_kmeans_assign_is_narrow_and_deterministic(spark):
    from stream_cdc_spark.tables import load

    e = load(spark, SF_SMALL, "embeddings")
    cents = [list(r[0]) for r in e.orderBy("vec_id").limit(4).select("embedding").collect()]
    a1 = kmeans_assign(e, cents)
    # no Exchange in the plan: assignment must be a narrow map
    plan = a1._sc._jvm.PythonSQLUtils.explainString(
        a1._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    # each of the 4 seed vectors is its own centroid at distance ~0
    seeds = {r.vec_id: r for r in a1.orderBy("vec_id").limit(4).collect()}
    for i, (vid, r) in enumerate(sorted(seeds.items())):
        assert r.centroid_id == i and r.dist_q == 0, (vid, r)


def test_kmeans_fit_inertia_non_increasing(spark):
    from stream_cdc_spark.tables import load

    e = load(spark, SF_SMALL, "embeddings")
    cents0 = [list(r[0]) for r in e.orderBy("vec_id").limit(4).select("embedding").collect()]
    i0 = inertia(kmeans_assign(e, cents0))
    _, assigned = kmeans_fit(e, k=4, iters=2)
    i2 = inertia(assigned)
    assert i2 <= i0, (i0, i2)
    # every vector assigned exactly once, to a valid centroid
    assert assigned.count() == e.count()
    assert assigned.filter(~F.col("centroid_id").between(0, 3)).count() == 0
