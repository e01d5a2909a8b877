"""Plan rewrites, mirroring the reference optimizer's four rules
(``/root/reference/src/plan_rewriter.rs:23-28``):

1. merge identical sources / identical targets (CSE; with ``force_one_target``
   every target hashes equal — ``plan_rewriter.rs:44-52, 212-230``);
2. fold ProjectOp attribute sets into the upstream source and delete the
   ProjectOp (``plan_rewriter.rs:143-167``) — at runtime this becomes a
   ``select`` that Catalyst pushes into the parquet/CSV scan;
3. delete FragmentOp multicast nodes, wiring producers straight to all
   consumers (``plan_rewriter.rs:121-140``) — DataFrame DAG reuse;
4. eliminate self-joins (a join whose two inputs are the same node after
   source merging), propagating the ``join_alias`` to downstream consumers
   so alias-prefixed references resolve (``plan_rewriter.rs:169-204``).
   Catalyst does NOT do this rewrite; it is load-bearing for RML
   RefObjectMaps over a shared logical source (RMLTC0008b).
"""

from __future__ import annotations

import json
import logging

from mopper_spark.plan import Node, PlanGraph

log = logging.getLogger(__name__)


def _replace_in_order(lst: list[str], old: str, new: str) -> None:
    for i, v in enumerate(lst):
        if v == old:
            lst[i] = new


def _config_key(node: Node, force_one_target: bool = False) -> str:
    if force_one_target and node.operator_type == "TargetOp":
        return "TargetOp::forced"
    return node.operator_type + "::" + json.dumps(node.config, sort_keys=True)


def merge_identical_nodes(graph: PlanGraph, force_one_target: bool = False) -> None:
    """Merge sources (and targets) with identical configs into one node."""
    seen: dict[str, str] = {}
    for node in list(graph.nodes.values()):
        if node.operator_type not in ("SourceOp", "TargetOp"):
            continue
        key = _config_key(node, force_one_target)
        if key not in seen:
            seen[key] = node.id
            continue
        keeper = graph.nodes[seen[key]]
        # re-wire every consumer/producer of the duplicate to the keeper
        for other in graph.nodes.values():
            _replace_in_order(other.from_, node.id, keeper.id)
            _replace_in_order(other.to, node.id, keeper.id)
        keeper.to.extend(node.to)
        keeper.from_.extend(node.from_)
        del graph.nodes[node.id]


def push_projections(graph: PlanGraph) -> None:
    """Remove ProjectOps; union their attribute sets into upstream sources."""
    for node in [n for n in graph.nodes.values() if n.operator_type == "ProjectOp"]:
        attrs = set(node.config.get("projection_attributes", []))
        for src_id in node.from_:
            src = graph.nodes[src_id]
            if src.attributes is None:
                src.attributes = set()
            src.attributes |= attrs
        _bypass(graph, node)


def remove_fragmenters(graph: PlanGraph) -> None:
    for node in [n for n in graph.nodes.values() if n.operator_type == "FragmentOp"]:
        _bypass(graph, node)


def _bypass(graph: PlanGraph, node: Node) -> None:
    """Delete a 1-in/N-out pass-through node, connecting producer→consumers."""
    producers = list(dict.fromkeys(node.from_))
    for prod_id in producers:
        prod = graph.nodes[prod_id]
        prod.to = [t for t in prod.to if t != node.id]
    for cons_id in node.to:
        cons = graph.nodes[cons_id]
        # keep edge order: replace this node by its producer(s) in-place
        new_from: list[str] = []
        for f in cons.from_:
            if f == node.id:
                new_from.extend(producers)
            else:
                new_from.append(f)
        cons.from_ = new_from
        for prod_id in producers:
            graph.nodes[prod_id].to.append(cons_id)
    del graph.nodes[node.id]


def eliminate_self_joins(graph: PlanGraph) -> None:
    """Replace a join whose two inputs are the same node with a pass-through.

    Only joins whose condition is an identity — no key pairs, or every pair
    ``child == parent`` — are eliminated (RMLTC0008b shape: a RefObjectMap
    whose parent triples map iterates the same logical source row).

    DOCUMENTED DIVERGENCE from the reference: ``plan_rewriter.rs:169-204``
    eliminates same-source joins unconditionally, so a mapping that joins a
    source to itself on *different* columns (e.g. rr:child "mgr_id" /
    rr:parent "id") silently builds objects from the current row with no
    join filtering.  We keep such joins — the engine's ``_join`` executes
    them as a true alias-prefixed self-join — because the eliminated form
    produces wrong values, not a different-but-defensible plan.
    """
    for node in [n for n in graph.nodes.values() if n.operator_type == "JoinOp"]:
        if len(node.from_) >= 2 and node.from_[0] == node.from_[1]:
            pairs = [tuple(p) for p in node.config.get("left_right_attr_pairs", [])]
            if pairs and not all(l == r for l, r in pairs):
                log.warning(
                    "Join %s reads one source twice with a non-identity "
                    "condition %s; keeping the self-join (the reference "
                    "would eliminate it and mis-evaluate)", node.id, pairs
                )
                continue
            alias = node.config.get("join_alias")
            for cons_id in node.to:
                graph.nodes[cons_id].join_alias = alias
            node.from_ = node.from_[:1]
            _bypass(graph, node)


def rewrite(graph: PlanGraph, force_one_target: bool = False) -> PlanGraph:
    before = len(graph.nodes)
    merge_identical_nodes(graph, force_one_target)
    push_projections(graph)
    remove_fragmenters(graph)
    eliminate_self_joins(graph)
    # dedupe duplicated to-edges created by merging (keep from-order intact
    # for joins, but drop exact duplicates beyond what fragments justified)
    for node in graph.nodes.values():
        node.to = list(dict.fromkeys(node.to))
        if node.operator_type != "JoinOp":
            node.from_ = list(dict.fromkeys(node.from_))
    log.info("Reduced number of nodes in the plan from %d to %d", before, len(graph.nodes))
    return graph
