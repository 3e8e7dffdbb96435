"""Query plan nodes — the engine's equivalent of the reference's ``Qry``
tree (``/root/reference/QryEval/Qry.java``), as plain dataclasses.

Two planes, as in the reference:
- **Iop** nodes produce inverted lists (term fetch + positional algebra);
- **Sop** nodes produce per-document scores.

The implicit ``#SCORE`` bridge a Sop parent inserts above an Iop child
(``Qry.java:110-181``) is the ``ScoreNode``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class PlanNode:
    pass


@dataclass
class TermNode(PlanNode):
    term: str
    field: str = "body"


@dataclass
class IopNode(PlanNode):
    """#SYN / #NEAR/n / #WINDOW/n / #FIRST/n over Iop args (same field)."""
    op: str                       # "syn" | "near" | "window" | "first"
    args: list = field(default_factory=list)
    dist: int = 1

    @property
    def field_name(self) -> str:
        a = self.args[0]
        return a.field if isinstance(a, TermNode) else a.field_name


@dataclass
class ScoreNode(PlanNode):
    """Implicit #SCORE leaf: scores one inverted list under the model."""
    child: PlanNode               # TermNode | IopNode


@dataclass
class SopNode(PlanNode):
    """#AND / #OR / #SUM / #WSUM / #WAND / #MSM/n / #DISMAX/t over Sop
    args."""
    op: str
    args: list = field(default_factory=list)
    weights: list | None = None   # for #wsum / #wand
    dist: int = 1                 # #msm/n: min matching args;
    #                               #dismax/t: tie-breaker in PERCENT

    @property
    def sum_weight(self) -> float:
        return float(sum(self.weights)) if self.weights else 0.0


WEIGHTED_OPS = {"wsum", "wand"}
SOP_OPS = {"and", "or", "sum", "wsum", "wand", "msm", "dismax"}
IOP_OPS = {"syn", "near", "window", "first"}


def is_iop(node: PlanNode) -> bool:
    return isinstance(node, (TermNode, IopNode))


def plan_repr(node: PlanNode) -> str:
    """Stable textual form (diagnostics + tests)."""
    if isinstance(node, TermNode):
        return node.term if node.field == "body" else f"{node.term}.{node.field}"
    if isinstance(node, IopNode):
        op = f"#{node.op}" + (f"/{node.dist}"
                              if node.op in ("near", "window", "first")
                              else "")
        return f"{op}({' '.join(plan_repr(a) for a in node.args)})"
    if isinstance(node, ScoreNode):
        return f"#score({plan_repr(node.child)})"
    if isinstance(node, SopNode):
        if node.weights is not None:
            parts = [f"{w:g} {plan_repr(a)}" for w, a in zip(node.weights, node.args)]
        else:
            parts = [plan_repr(a) for a in node.args]
        op = f"#{node.op}" + (f"/{node.dist}" if node.op == "msm" else "")
        return f"{op}({' '.join(parts)})"
    raise TypeError(type(node))
