"""Pure-Python golden oracle: replays the pipeline semantics over the fixture
tables and emits golden_triples / golden_nodes (FIXTURES.md §8).

Semantics replayed (reference citations):
- mention→CURIE lookup + rerank: builder/lookup_utils.py:4-77 + argmax
  similarity builder/chemotext2.py:51-64
- synonym merge to canonical representative (min-CURIE rule):
  builder/builder.py:249-264 (add_or_find_node) + builder/builder.py:136-167
  (merge) — here a union-find over the normalization edge list
- edge-crawl expansion: per-edge op keyed by (src_type,dst_type) metagraph
  rows (builder/userquery.py:128; ops observed in builder/output)
- edge dedup on (subj, obj, edge_source, pred): builder/builder.py:218-226
- shared-PMID support edges: builder/omnicorp.py:21-33
- sorted equivalent_identifiers: builder/builder.py:81-82

The Spark pipeline (plans/pipeline.py) must reproduce these rows with
P/R ≥ 0.95 (BASELINE.json); sharing matching.py makes drift structural, not
tokenizer-level.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

from ..operators.matching import build_trie, detect, link_mentions

SUPPORT_PRED = "biolink:correlated_with"
SUPPORT_SOURCE = "omnicorp.term_to_term"


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


def build_canonical_map(norm_rows) -> dict[str, str]:
    """curie → deterministic representative (min CURIE in component)."""
    uf = UnionFind()
    for alias, canonical, _, _ in norm_rows:
        uf.union(alias, canonical)
    members: dict[str, list[str]] = defaultdict(list)
    for curie in list(uf.parent):
        members[uf.find(curie)].append(curie)
    rep_map: dict[str, str] = {}
    for group in members.values():
        rep = min(group)
        for c in group:
            rep_map[c] = rep
    return rep_map


def compute_golden(
    fixture_dir: str,
    programs: list[list[str]] | None = None,
    end_values: list[str] | None = None,
    require_complete: bool = False,
    with_support: bool = True,
):
    """Returns (nodes, triples): lists of dicts matching schemas.NODES /
    schemas.TRIPLES for the given programs (default: the flagship DGX
    chain) + support edges.

    programs: list of concrete node-type chains (the output of
    plans.query.enumerate_programs — U1 union semantics across programs).
    end_values / require_complete replay the end-bound / full-pattern
    semantics of builder/userquery.py:104-126: an edge is emitted only when
    it lies on a path that completes to a valid terminal."""
    read = lambda n: pq.read_table(f"{fixture_dir}/{n}.parquet")  # noqa: E731
    docs = read("documents").to_pylist()
    lex = [tuple(r) for r in zip(*(read("lexicon").column(c).to_pylist() for c in ("surface", "curie", "node_type")))]
    norm = list(
        zip(
            *(
                read("normalization").column(c).to_pylist()
                for c in ("alias", "canonical", "node_type", "name")
            )
        )
    )
    pm = read("predicate_map").to_pylist()
    emb_tbl = read("entity_embeddings")
    emb_map = {
        c: np.asarray(v, dtype=np.float64)
        for c, v in zip(emb_tbl.column("curie").to_pylist(), emb_tbl.column("embedding").to_pylist())
    }
    tpm = read("term_pmids").to_pylist()

    trie = build_trie(lex)
    rep_map = build_canonical_map(norm)
    meta: dict[str, tuple[str, str]] = {}  # rep → (node_type, name)
    for alias, canonical, ntype, name in norm:
        meta[rep_map[alias]] = (ntype, name)

    # --- extract + link: doc → set of (rep, original linked curie, type) ---
    # type of the canonical component wins; a CURIE absent from the
    # normalization map keeps the lookup candidate's type (the reference's
    # node carries its lookup type when the synonymizer doesn't know it) —
    # aligned with plans/pipeline.py _doc_entities coalesce(rep_type,
    # node_type)
    doc_ents: dict[str, set[tuple[str, str, str]]] = defaultdict(set)
    for row in docs:
        for span in row["spans"] or []:
            if span["kind"] not in ("text", "caption"):
                continue
            ments = detect(span["text"], trie)
            if not ments:
                continue
            for _m, cand, _score in link_mentions(span["text"], ments, emb_map):
                rep = rep_map.get(cand.curie, cand.curie)
                ntype = meta[rep][0] if rep in meta else cand.node_type
                doc_ents[row["doc_id"]].add((rep, cand.curie, ntype))

    # --- canonicalized predicate map, indexed by (src,dst) type pair ---
    pm_rep: dict[tuple[str, str], dict[str, list[tuple[str, str, str]]]] = defaultdict(
        lambda: defaultdict(list)
    )
    for r in pm:
        srep = rep_map.get(r["subj_curie"], r["subj_curie"])
        orep = rep_map.get(r["obj_curie"], r["obj_curie"])
        pm_rep[(r["src_type"], r["dst_type"])][srep].append((orep, r["pred"], r["op_name"]))

    if programs is None:
        programs = [["disease", "gene", "genetic_condition"]]
    end_reps = (
        sorted({rep_map.get(v, v) for v in end_values}) if end_values else None
    )

    # --- program expansion with dedup on (subj, pred, obj, edge_source) ---
    agg: dict[tuple[str, str, str, str], tuple[set[str], set[str]]] = defaultdict(
        lambda: (set(), set())
    )

    def emit(subj, pred, obj, src, doc_id, inputs):
        pubs, ins = agg[(subj, pred, obj, src)]
        pubs.add(f"DOC:{doc_id}")
        ins.update(inputs)

    def alive_sets(hop_maps) -> list[set[str] | None] | None:
        """Backward terminal-boundedness (mirrors expand._alive_sets)."""
        if not (require_complete or end_reps is not None):
            return None
        n = len(hop_maps)
        alive: list[set[str] | None] = [None] * (n + 1)
        if end_reps is not None:
            alive[n] = set(end_reps)
        for i in range(n - 1, -1, -1):
            ok: set[str] = set()
            for s, lst in hop_maps[i].items():
                for o, _, _ in lst:
                    if alive[i + 1] is None or o in alive[i + 1]:
                        ok.add(s)
                        break
            alive[i] = ok
        return alive

    for prog in programs:
        hop_maps = [pm_rep[(a, b)] for a, b in zip(prog, prog[1:])]
        alive = alive_sets(hop_maps)
        for doc_id, ents in doc_ents.items():
            # originating mention curies per start-typed rep in this doc
            origins: dict[str, set[str]] = defaultdict(set)
            for rep, orig, ntype in ents:
                if ntype == prog[0]:
                    origins[rep].add(orig)
            for start, inputs in origins.items():
                if alive is not None and alive[0] is not None and start not in alive[0]:
                    continue
                frontier = {start}
                for h, hop_map in enumerate(hop_maps):
                    nxt: set[str] = set()
                    for s in frontier:
                        for o, pred, op in hop_map.get(s, ()):
                            if (
                                alive is not None
                                and alive[h + 1] is not None
                                and o not in alive[h + 1]
                            ):
                                continue
                            emit(s, pred, o, op, doc_id, inputs)
                            nxt.add(o)
                    frontier = nxt

    triples = [
        dict(
            subj=s,
            pred=p,
            obj=o,
            edge_source=src,
            publications=sorted(pubs),
            input_identifiers=",".join(sorted(ins)),
        )
        for (s, p, o, src), (pubs, ins) in agg.items()
    ]

    # --- support edges: shared PMIDs over graph-node pairs ---
    if with_support:
        graph_nodes = sorted({t["subj"] for t in triples} | {t["obj"] for t in triples})
        pmids: dict[str, set[str]] = defaultdict(set)
        for r in tpm:
            pmids[rep_map.get(r["curie"], r["curie"])].add(r["pmid"])
        for i, a in enumerate(graph_nodes):
            for b in graph_nodes[i + 1 :]:
                shared = pmids[a] & pmids[b]
                if shared:
                    triples.append(
                        dict(
                            subj=a,
                            pred=SUPPORT_PRED,
                            obj=b,
                            edge_source=SUPPORT_SOURCE,
                            publications=sorted(shared),
                            input_identifiers="",
                        )
                    )

    # --- nodes with sorted equivalent_identifiers ---
    members: dict[str, list[str]] = defaultdict(list)
    for curie, rep in rep_map.items():
        members[rep].append(curie)
    all_node_ids = sorted({t["subj"] for t in triples} | {t["obj"] for t in triples})
    nodes = [
        dict(
            id=r,
            # "unknown", not "": empty partition values don't survive
            # hive-style partitionBy round-trips (see materialize.build_nodes)
            node_type=meta.get(r, ("unknown", ""))[0],
            name=meta.get(r, ("unknown", ""))[1],
            equivalent_identifiers=sorted(members.get(r, [r])),
        )
        for r in all_node_ids
    ]
    return nodes, triples
