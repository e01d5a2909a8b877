"""AlgeMapLoom plan-graph IR.

Deserializes the plan JSON shape produced by the AlgeMapLoom toolchain and
consumed by the reference engine (``/root/reference/src/plan.rs:22-95``):
``nodes`` is a list of ``{id, operator:{type, config}}`` and ``edges`` is a
petgraph-style list of ``[from_index, to_index, {"fragment": label}]``
triples indexing into ``nodes``.  ``from``/``to`` adjacency preserves edge
order — the reference relies on it for join sides (left/child =
``from[0]``, right/parent = ``from[1]``; ``/root/reference/src/lib.rs:197-202``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class Node:
    id: str
    operator_type: str
    config: dict
    from_: list[str] = field(default_factory=list)
    to: list[str] = field(default_factory=list)
    # attribute set folded in from eliminated ProjectOps (scan pruning)
    attributes: set[str] | None = None
    # set when a self-join feeding this node was eliminated
    join_alias: str | None = None


@dataclass
class PlanGraph:
    nodes: dict[str, Node]  # insertion-ordered

    def consumers(self, node_id: str) -> list[Node]:
        return [n for n in self.nodes.values() if node_id in n.from_]


def parse_plan(plan: str | dict) -> PlanGraph:
    if isinstance(plan, str):
        plan = json.loads(plan)

    raw_nodes = plan["nodes"]
    nodes: dict[str, Node] = {}
    index_to_id: dict[int, str] = {}
    for idx, raw in enumerate(raw_nodes):
        op = raw["operator"]
        node = Node(id=raw["id"], operator_type=op["type"], config=op.get("config", {}))
        nodes[node.id] = node
        index_to_id[idx] = node.id

    for edge in plan.get("edges", []):
        src_idx, dst_idx = int(edge[0]), int(edge[1])
        src, dst = index_to_id[src_idx], index_to_id[dst_idx]
        # preserve edge order; allow duplicates only if distinct fragments
        nodes[src].to.append(dst)
        nodes[dst].from_.append(src)

    return PlanGraph(nodes=nodes)
