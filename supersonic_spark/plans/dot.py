"""Physical-plan DOT renderer — the analogue of the reference's
benchmark DOT drawer (reference: supersonic/benchmark/dot/dot_drawer.cc,
which renders a cursor tree with per-node benchmark data). Spark's UI
already visualizes plans; this exists for headless/offline artifacts:
`plan_dot(df)` returns a Graphviz digraph of the executed plan tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def plan_dot(df: DataFrame, title: str = "plan",
             max_label: int = 80) -> str:
    """Graphviz DOT for df's executed physical plan. Child edges point
    upward (data flows child -> parent), one box per plan node labelled
    with the node name and a truncated simpleString."""
    root = df._jdf.queryExecution().executedPlan()
    lines = [
        f'digraph "{_esc(title)}" {{',
        "  rankdir=BT;",
        '  node [shape=box, fontname="monospace", fontsize=10];',
    ]
    counter = 0

    def walk(node) -> int:
        nonlocal counter
        nid = counter
        counter += 1
        detail = node.simpleString(max_label)
        lines.append(f'  n{nid} [label="{_esc(detail)}"];')
        kids = node.children()
        for i in range(kids.size()):
            cid = walk(kids.apply(i))
            lines.append(f"  n{cid} -> n{nid};")
        if kids.size() == 0 and node.nodeName() == "AdaptiveSparkPlan":
            # AQE wrapper hides the plan tree behind a leaf node; render
            # its current plan (finalized if executed, else the initial)
            cid = walk(node.executedPlan())
            lines.append(f"  n{cid} -> n{nid};")
        # codegen'd subtrees hide their children behind the codegen node
        inner = getattr(node, "innerChildren", None)
        if inner is not None:
            ikids = node.innerChildren()
            for i in range(ikids.size()):
                cid = walk(ikids.apply(i))
                lines.append(f'  n{cid} -> n{nid} [style=dashed];')
        return nid

    walk(root)
    lines.append("}")
    return "\n".join(lines)


def write_plan_dot(df: DataFrame, path: str, title: str = "plan") -> str:
    """Render plan_dot to a file; returns the path."""
    dot = plan_dot(df, title=title)
    with open(path, "w") as f:
        f.write(dot)
    return path
