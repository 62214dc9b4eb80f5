"""Host-graph coarsening and weighted PageRank
(operators/pagerank.coarsen_edges / pagerank_weighted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from axora_spark.operators.pagerank import (coarsen_edges, pagerank,
                                            pagerank_weighted)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_coarsen_edges_weights_and_intra(spark):
    # docs 0,1 → host A; docs 2,3 → host B
    mapping = _df(spark, [(0, "A"), (1, "A"), (2, "B"), (3, "B")],
                  "doc_id long, grp string")
    edges = _df(spark, [(0, 2), (1, 2), (1, 3), (0, 1), (2, 0)],
                "src long, dst long")
    got = {(r["src"], r["dst"]): r["weight"]
           for r in coarsen_edges(edges, mapping).collect()}
    # 3 A→B doc edges collapse to one weighted host edge; the intra-host
    # 0→1 edge is dropped; B→A keeps weight 1
    assert got == {("A", "B"): 3, ("B", "A"): 1}
    kept = {(r["src"], r["dst"]): r["weight"]
            for r in coarsen_edges(edges, mapping,
                                   drop_intra=False).collect()}
    assert kept[("A", "A")] == 1


def test_weighted_reduces_to_unweighted_on_unit_weights(spark):
    nodes = _df(spark, [(i,) for i in range(6)], "doc_id long")
    raw = [(i, (i * 2 + 1) % 6) for i in range(6)] + [(0, 3), (4, 1)]
    edges = _df(spark, raw, "src long, dst long")
    w_edges = edges.withColumn("weight", F.lit(1).cast("long"))
    plain = {r["doc_id"]: r["r"]
             for r in pagerank(edges, nodes, iters=4).collect()}
    weighted = {r["doc_id"]: r["r"]
                for r in pagerank_weighted(w_edges, nodes,
                                           iters=4).collect()}
    # r*1/wout and r/outdeg are the same IEEE doubles — exact equality
    assert plain == weighted


def test_weighted_mass_conserved_and_weight_sensitive(spark):
    nodes = _df(spark, [("A",), ("B",), ("C",)], "doc_id string")
    # A splits 3:1 between B and C; B and C return everything to A
    edges = _df(spark, [("A", "B", 3), ("A", "C", 1),
                        ("B", "A", 1), ("C", "A", 1)],
                "src string, dst string, weight long")
    ranks = {r["doc_id"]: r["r"]
             for r in pagerank_weighted(edges, nodes, iters=8).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks["B"] > ranks["C"]  # the 3:1 split must show up
    assert ranks["A"] > ranks["B"]  # A receives everything back
