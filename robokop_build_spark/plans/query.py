"""Typed path-query DSL → pipeline plan.

Reference analog: the ply lexer in builder/pathlex.py:10-39 (NODE codes
`S|G|P|C|A|D|X|T|W|?`, EDGE `(min-max)`) and the QueryDefinition /
Transition objects in builder/userquery.py:7-50. Here the "compiler" output
is the list of node types the DataFrame pipeline chains joins over
(plans/pipeline.py), one stage per transition.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# builder/builder.py:535-543 help text; builder/pathlex.py:10 token regex
NODE_CODES: dict[str, str] = {
    "S": "chemical_substance",
    "G": "gene",
    "P": "biological_process",
    "C": "cell",
    "A": "anatomical_entity",
    "T": "phenotypic_feature",
    "D": "disease",
    "X": "genetic_condition",
    "W": "pathway",
    "?": "UNSPECIFIED",
}

_EDGE_RE = re.compile(r"\((\d+)-(\d+)\)")


@dataclass(frozen=True)
class Step:
    """One path step (builder/pathlex.py:25 Step namedtuple analog)."""

    node_type: str
    min_path_length: int = 1
    max_path_length: int = 1


class PathSyntaxError(ValueError):
    pass


def tokenize_path(path: str) -> list[Step]:
    """`DGX` or `D(1-2)GX` → [Step]; errors mirror the reference lexer
    (unknown node code raises; path may not end on an edge token,
    builder/pathlex.py:37-38)."""
    steps: list[Step] = []
    pending: tuple[int, int] | None = None
    i = 0
    while i < len(path):
        ch = path[i]
        if ch == "(":
            m = _EDGE_RE.match(path, i)
            if not m:
                raise PathSyntaxError(f"bad edge token at {i}: {path!r}")
            if not steps:
                raise PathSyntaxError("path may not start with an edge token")
            pending = (int(m.group(1)), int(m.group(2)))
            i = m.end()
            continue
        if ch not in NODE_CODES:
            raise PathSyntaxError(f"unknown node code {ch!r} in {path!r}")
        lo, hi = pending if pending else (1, 1)
        steps.append(Step(NODE_CODES[ch], lo, hi))
        pending = None
        i += 1
    if pending is not None:
        raise PathSyntaxError("path may not end on an edge token")
    if not steps:
        raise PathSyntaxError("empty path")
    return steps


@dataclass
class QueryDefinition:
    """builder/userquery.py:38-50 analog: terminal values + typed path."""

    start_values: list[str]
    steps: list[Step]
    end_values: list[str] | None = None

    @property
    def node_types(self) -> list[str]:
        return [s.node_type for s in self.steps]


def compile_path(path: str) -> list[str]:
    """Path DSL → the node-type chain consumed by PipelineConfig.path_types
    (each adjacent pair = one predicate-map join stage)."""
    return [s.node_type for s in tokenize_path(path)]
