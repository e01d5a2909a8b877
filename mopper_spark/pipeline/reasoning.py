"""RDFS entailment materialization — the forward-chaining closure every
triple store ships (e.g. Jena RDFS reasoner, Oxigraph ruleset), expressed
as a staged datalog fixpoint over DataFrames.

Implements the core RDFS entailment rules of the W3C RDF 1.1 Semantics
recommendation (section 9.2.1, rule names kept):

    rdfs5   (p subPropertyOf q), (q subPropertyOf r)  ->  (p subPropertyOf r)
    rdfs7   (s p o), (p subPropertyOf q)              ->  (s q o)
    rdfs2   (s p o), (p domain C)                     ->  (s rdf:type C)
    rdfs3   (s p o), (p range  C)                     ->  (o rdf:type C)
    rdfs11  (C subClassOf D), (D subClassOf E)        ->  (C subClassOf E)
    rdfs9   (s rdf:type C), (C subClassOf D)          ->  (s rdf:type D)

The reference engine (ghsnd/mopper) CONSTRUCTS graphs from rows
(src/operator/serializer.rs); materializing what those graphs entail is
the canonical next step a KG-construction pipeline owes its consumers.

Scale shape: the rules are stratified so ONE staged pass (property
closure -> rdfs7 -> domain/range -> class closure -> rdfs9) reaches the
fixpoint for every schema in which the RDFS vocabulary itself is not
redefined; the pass is wrapped in a verification loop that re-runs until
the statement count is stable, so pathological schemas (e.g. some p
declared subPropertyOf rdf:type, which makes rule outputs feed earlier
strata) still converge exactly.  Schema-shaped relations (the two
closures, domain, range) are tiny next to the instance graph and are
explicitly broadcast — every rule is a broadcast hash join against the
instance triples, no instance-sized shuffle anywhere; the two transitive
closures run semi-naive over schema-sized edge lists
(pipeline/graph.py::transitive_closure).  Per-round lineage is cut with
eager local checkpoints under the same scoped
constraintPropagation=false workaround as transitive_closure (Spark 4.1
mis-rewrites Union constraints over checkpointed LogicalRDD children).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mopper_spark.pipeline.graph import transitive_closure

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_SUBCLASS = RDFS_NS + "subClassOf"
RDFS_SUBPROP = RDFS_NS + "subPropertyOf"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"

_SPO = ("subj", "pred", "obj")


def _closure_pairs(g: DataFrame, pred_iri: str) -> DataFrame:
    """Transitive closure (>=1 hop) of one schema predicate as (src, dst)."""
    edges = g.filter(F.col("pred") == pred_iri).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return transitive_closure(edges)


def _rdfs_pass(g: DataFrame) -> DataFrame:
    """One stratified application of rdfs{5,7,2,3,11,9}; monotone."""
    spc = _closure_pairs(g, RDFS_SUBPROP)
    r5 = spc.select(
        F.col("src").alias("subj"),
        F.lit(RDFS_SUBPROP).alias("pred"),
        F.col("dst").alias("obj"),
    )
    r7 = (
        g.join(F.broadcast(spc), g["pred"] == spc["src"])
        .select("subj", F.col("dst").alias("pred"), "obj")
    )
    g1 = g.unionByName(r5).unionByName(r7).distinct()

    dom = g1.filter(F.col("pred") == RDFS_DOMAIN).select(
        F.col("subj").alias("p"), F.col("obj").alias("cls")
    )
    rng = g1.filter(F.col("pred") == RDFS_RANGE).select(
        F.col("subj").alias("p"), F.col("obj").alias("cls")
    )
    r2 = (
        g1.join(F.broadcast(dom), g1["pred"] == dom["p"])
        .select("subj", F.lit(RDF_TYPE).alias("pred"), F.col("cls").alias("obj"))
    )
    r3 = (
        g1.join(F.broadcast(rng), g1["pred"] == rng["p"])
        .select(
            F.col("obj").alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            F.col("cls").alias("obj"),
        )
    )
    g2 = g1.unionByName(r2).unionByName(r3).distinct()

    scc = _closure_pairs(g2, RDFS_SUBCLASS)
    r11 = scc.select(
        F.col("src").alias("subj"),
        F.lit(RDFS_SUBCLASS).alias("pred"),
        F.col("dst").alias("obj"),
    )
    types = g2.filter(F.col("pred") == RDF_TYPE).select(
        F.col("subj").alias("s"), F.col("obj").alias("c")
    )
    r9 = (
        types.join(F.broadcast(scc), types["c"] == scc["src"])
        .select(
            F.col("s").alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            F.col("dst").alias("obj"),
        )
    )
    return g2.unionByName(r11).unionByName(r9).distinct()


def rdfs_entailment(triples: DataFrame, *, max_rounds: int = 4) -> DataFrame:
    """Materialize the RDFS closure of ``triples`` (columns subj, pred,
    obj; schema and instance statements mixed, RDF style).

    Returns the full entailed graph — asserted plus inferred statements,
    distinct.  ``range`` statements must only be declared for predicates
    whose objects are resources (RDF forbids literal subjects; the rule
    is applied verbatim, so a range on a literal-valued predicate would
    mint literal subjects).

    Raises after ``max_rounds`` verification passes without reaching the
    fixpoint (one pass suffices unless the schema redefines the RDFS
    vocabulary itself).
    """
    spark = triples.sparkSession
    conf_key = "spark.sql.constraintPropagation.enabled"
    old = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "false")
    try:
        g = triples.select(*_SPO).distinct().localCheckpoint(eager=True)
        n = g.count()
        for _ in range(max_rounds):
            g = _rdfs_pass(g).localCheckpoint(eager=True)
            n_new = g.count()
            if n_new == n:
                return g
            n = n_new
        raise RuntimeError(
            f"rdfs_entailment did not converge in {max_rounds} passes; "
            "the schema feeds earlier strata (RDFS vocabulary redefined) — "
            "raise max_rounds"
        )
    finally:
        spark.conf.set(conf_key, old)
