"""Stage 3: edge-crawl expansion as per-hop equi-joins.

Reference analog: Program.run_program's frontier crawl — CURIE → typed
neighbors via remote ops, Redis-memoized (builder/builder.py:120-127, log
builder/output:364-389). Spark-first re-expression (SURVEY.md §2.1 S5/S6):
the closed-world KG is a predicate_map table; "calling an op on a frontier"
is a broadcast equi-join of the frontier against that table's
(src_type,dst_type) partition; memoization is replaced by dropDuplicates on
the join key *before* the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import maybe_broadcast, resolve_aliases


def input_filter(frontier: DataFrame, node_type: str) -> DataFrame:
    """S7 caster.input_filter analog (builder/output:368): type-guard the
    frontier before an op join."""
    return frontier.filter(F.col("node_type") == F.lit(node_type))


def output_filter(expanded: DataFrame, node_type: str) -> DataFrame:
    """S7 caster.output_filter analog: type-guard op results."""
    return expanded.filter(F.col("node_type") == F.lit(node_type))


def upcast(df: DataFrame, parent_type: str) -> DataFrame:
    """S7 caster.upcast analog: widen node_type to a supertype (e.g.
    genetic_condition → disease)."""
    return df.withColumn("node_type", F.lit(parent_type))


def canonicalize_predicate_map(pm: DataFrame, rep_map: DataFrame) -> DataFrame:
    """Re-key concrete edges into representative space (both endpoints)."""
    pm2 = resolve_aliases(pm, rep_map, "subj_curie", out="subj_rep")
    pm2 = resolve_aliases(pm2, rep_map, "obj_curie", out="obj_rep")
    return pm2.select(
        "src_type",
        "dst_type",
        "op_name",
        "pred",
        "subj_rep",
        "obj_rep",
        "orig_pred_id",
        "orig_pred_label",
    )


def _alive_sets(
    pm_rep: DataFrame,
    path_types: list[str],
    end_reps: list[str] | None,
) -> list[DataFrame | None]:
    """Backward terminal-boundedness pruning (F5; reference analog: the
    two-terminal `robokop.traversable(nodes(p), ..., [c0,cN])` guard in the
    concept cypher, builder/userquery.py:123-126).

    alive[i] = reps at position i from which the remaining hops can complete
    to a valid terminal (∈ end_reps when bound, any type-correct terminal
    otherwise). Sets are predicate-map-bounded (dimension-sized) — each is a
    small DataFrame destined for a broadcast semi-join in the forward pass.

    Returns one entry per position; None means unconstrained (saves the
    join). With end_reps=None only the *existence* of downstream edges
    prunes (full-pattern match semantics); the terminal position itself is
    unconstrained.
    """
    n = len(path_types)
    alive: list[DataFrame | None] = [None] * n
    if end_reps is not None:
        if not end_reps:
            raise ValueError("end_reps must be non-empty when given")
        term = pm_rep.sparkSession.createDataFrame(
            [(r,) for r in sorted(set(end_reps))], ["rep"]
        )
        alive[n - 1] = term
    for i in range(n - 2, -1, -1):
        edges = pm_rep.filter(
            (F.col("src_type") == path_types[i])
            & (F.col("dst_type") == path_types[i + 1])
        ).select(F.col("subj_rep").alias("rep"), F.col("obj_rep"))
        if alive[i + 1] is not None:
            edges = edges.join(
                F.broadcast(alive[i + 1].select(F.col("rep").alias("obj_rep"))),
                "obj_rep",
            )
        alive[i] = edges.select("rep").distinct()
    return alive


def expand_path(
    doc_entities: DataFrame,
    pm_rep: DataFrame,
    path_types: list[str],
    end_reps: list[str] | None = None,
    require_complete: bool = False,
) -> DataFrame:
    """Multi-hop expansion along a typed path (e.g. disease→gene→
    genetic_condition, the reference's `DGX` query, builder/builder.py:589).

    doc_entities: (doc_id, rep, node_type, orig). The frontier carries only
    (doc_id, rep, start_rep) — original-mention lineage is re-attached after
    aggregation via the tiny origin map (see aggregate_triples), which keeps
    the doc-scale rows narrow through every hop.

    end_reps / require_complete: emit only edges lying on paths that reach a
    valid terminal (end-bound queries, builder/userquery.py:104-113). The
    pruning is backward alive-sets over the dimension-sized predicate map +
    per-hop broadcast semi-joins — never path materialization, so the
    doc-scale rows stay narrow and no path-count blowup reaches the shuffle.
    Default (both unset) keeps emit-per-hop semantics: every reachable edge
    enters the graph even when deeper hops dead-end.

    Returns raw triple events: (doc_id, subj, pred, obj, edge_source, start).
    """
    prune = require_complete or end_reps is not None
    alive = _alive_sets(pm_rep, path_types, end_reps) if prune else None

    frontier = (
        doc_entities.filter(F.col("node_type") == path_types[0])
        .select("doc_id", "rep", F.col("rep").alias("start"))
        .distinct()
    )
    if alive is not None and alive[0] is not None:
        frontier = frontier.join(F.broadcast(alive[0]), "rep")
    hops = []
    for h, (src_t, dst_t) in enumerate(zip(path_types, path_types[1:])):
        edges = pm_rep.filter(
            (F.col("src_type") == src_t) & (F.col("dst_type") == dst_t)
        ).select("subj_rep", "obj_rep", "pred", "op_name", "orig_pred_id", "orig_pred_label")
        if alive is not None and alive[h + 1] is not None:
            # restrict the (broadcast-sized) edge table itself — cheaper
            # than filtering doc-scale hop rows after the join
            edges = edges.join(
                F.broadcast(alive[h + 1].select(F.col("rep").alias("obj_rep"))),
                "obj_rep",
            )
        # dimension-sized edge partition → broadcast; frontier (doc-scale)
        # keeps its partitioning, no shuffle per hop
        hop = frontier.join(F.broadcast(edges), frontier["rep"] == edges["subj_rep"])
        hops.append(
            hop.select(
                "doc_id",
                F.col("subj_rep").alias("subj"),
                "pred",
                F.col("obj_rep").alias("obj"),
                F.col("op_name").alias("edge_source"),
                "orig_pred_id",
                "orig_pred_label",
                "start",
            )
        )
        frontier = hop.select(
            "doc_id", F.col("obj_rep").alias("rep"), "start"
        ).distinct()
    out = hops[0]
    for h in hops[1:]:
        out = out.unionByName(h)
    return out


def expand_programs(
    doc_entities: DataFrame,
    pm_rep: DataFrame,
    programs: list[list[str]],
    end_reps: list[str] | None = None,
    require_complete: bool = False,
) -> DataFrame:
    """U1 union of per-program expansions (reference: one Program per
    concrete concept path, graph = union of program results,
    builder/userquery.py:133-137 + builder/builder.py KnowledgeGraph.merge).
    Duplicate edges across programs collapse in aggregate_triples' groupBy —
    the union here stays lazy, one job for all programs."""
    if not programs:
        raise ValueError("no programs to execute (path unreachable in metagraph?)")
    out = None
    for prog in programs:
        raw = expand_path(doc_entities, pm_rep, prog, end_reps, require_complete)
        out = raw if out is None else out.unionByName(raw)
    return out


def expand_edge_starts(
    start_reps: DataFrame,
    pm_rep: DataFrame,
    path_types: list[str],
    end_reps: list[str] | None = None,
    require_complete: bool = False,
) -> DataFrame:
    """Dimension-level program expansion: one row per (hop edge, start rep)
    for every edge lying on a program path from an OBSERVED start entity.

    Key insight (the SF=1 profiling finding): per-doc frontier walks
    materialize doc×edge events (26.8M rows at SF=1) only to collapse them
    back to 791 edges — but reachability through the predicate map does not
    depend on the document at all. publications(edge) factorizes as
    ∪_{start reaching edge} docs(start), so expansion needs only this
    entity×edge table (predicate-map-bounded, corpus-independent) and the
    per-start doc sets. start_reps: (rep) — start entities observed in ≥1
    document.
    """
    prune = require_complete or end_reps is not None
    alive = _alive_sets(pm_rep, path_types, end_reps) if prune else None

    frontier = start_reps.select(F.col("rep"), F.col("rep").alias("start")).distinct()
    if alive is not None and alive[0] is not None:
        frontier = frontier.join(F.broadcast(alive[0]), "rep")
    hops = []
    for h, (src_t, dst_t) in enumerate(zip(path_types, path_types[1:])):
        edges = pm_rep.filter(
            (F.col("src_type") == src_t) & (F.col("dst_type") == dst_t)
        ).select("subj_rep", "obj_rep", "pred", "op_name", "orig_pred_id", "orig_pred_label")
        if alive is not None and alive[h + 1] is not None:
            edges = edges.join(
                F.broadcast(alive[h + 1].select(F.col("rep").alias("obj_rep"))),
                "obj_rep",
            )
        hop = frontier.join(F.broadcast(edges), frontier["rep"] == edges["subj_rep"])
        hops.append(
            hop.select(
                F.col("subj_rep").alias("subj"),
                "pred",
                F.col("obj_rep").alias("obj"),
                F.col("op_name").alias("edge_source"),
                "orig_pred_id",
                "orig_pred_label",
                "start",
            )
        )
        frontier = hop.select(F.col("obj_rep").alias("rep"), "start").distinct()
    out = hops[0]
    for hp in hops[1:]:
        out = out.unionByName(hp)
    return out


def aggregate_program_triples(
    doc_entities: DataFrame,
    pm_rep: DataFrame,
    programs: list[list[str]],
    end_reps: list[str] | None = None,
    require_complete: bool = False,
    publication_cap: int = 10_000,
    ctime: int = 0,
    start_reps: list[str] | None = None,
) -> DataFrame:
    """Factored expansion+aggregation — produces EXACTLY the rows of
    aggregate_triples(expand_programs(...), origin_map(...)) (the e2e golden
    gates prove equality) with the doc×edge event stream eliminated:

    1. per-start doc sets: ONE bounded top-k window over the start-typed
       (rep, doc) rows — the only corpus-scale aggregation in the build;
    2. per-start origin sets: entity-bounded groupBy;
    3. (edge, start) table: dimension-level frontier joins (predicate-map-
       bounded, corpus-independent);
    4. per-edge merge: explode the per-start capped arrays and re-cap —
       valid because the k smallest of a union are contained in the union
       of each member's k smallest; volume ≤ edges × in-degree × cap, a
       constant w.r.t. corpus size.

    At 10^12 docs only step 1 scales with the corpus (a narrow distinct +
    window); the round-1/round-2 event-stream design shuffled O(docs ×
    mentions × edges) rows instead (26.8M at SF=1, memory-bound at ~100µs
    of JVM time per row — measured via event-log task metrics).
    """
    from .topk import capped_sorted_set

    if not programs:
        raise ValueError("no programs to execute (path unreachable in metagraph?)")
    start_types = sorted({prog[0] for prog in programs})

    sd = (
        doc_entities.filter(F.col("node_type").isin(start_types))
        .select("node_type", "rep", "doc_id", "orig")
    )
    if start_reps is not None:
        # seed-bound query (reference --start, builder/builder.py:512-517):
        # only observed start entities matching the canonicalized seeds
        # anchor paths; a literal IN filter — seed lists are user-typed small
        if not start_reps:
            raise ValueError("start_reps must be non-empty when given")
        sd = sd.filter(F.col("rep").isin(sorted(set(start_reps))))
    start_pubs = capped_sorted_set(
        sd.select("rep", F.concat(F.lit("DOC:"), F.col("doc_id")).alias("pub")),
        ["rep"],
        "pub",
        publication_cap,
        out="pubs",
    )
    start_origins = sd.groupBy("rep").agg(
        F.array_sort(F.collect_set("orig")).alias("origs")
    )
    start_type_reps = sd.select("node_type", "rep").distinct()

    edge_starts = None
    for prog in programs:
        sr = start_type_reps.filter(F.col("node_type") == prog[0]).select("rep")
        es = expand_edge_starts(sr, pm_rep, prog, end_reps, require_complete)
        edge_starts = es if edge_starts is None else edge_starts.unionByName(es)
    key = ["subj", "pred", "obj", "edge_source"]
    # dimension-sized (predicate-map-bounded): materialize once — it feeds
    # THREE consumers (pubs join, inputs join, the in-degree probe below);
    # without this each broadcast re-runs the frontier-join DAG
    edge_starts = edge_starts.distinct().localCheckpoint(eager=True)

    # per-edge publications: merge the member start arrays and re-cap —
    # array-at-a-time (flatten/dedup/sort/slice on whole arrays), never an
    # explode: re-windowing the exploded elements measured 55s/1240 CPU-s/
    # 25% GC at SF=1 for work these vector expressions do in ~2s. The merge
    # buffer is in_degree×cap arrays; when the measured max in-degree (a
    # one-row agg over the dimension-sized edge_starts, plan-time) is small
    # — the common case — a single merge pass suffices, and the salted
    # pre-merge pass (which bounds the buffer at (in_degree/nsalt)×cap and
    # nsalt×cap for hub edges) would only re-shuffle and re-sort the full
    # array payload for nothing: each (edge, salt) group then holds a
    # single member array. Both forms compute sorted(set(union))[:cap] —
    # the k smallest of a union are contained in the union of each
    # member's k smallest — so the choice never changes results.
    nsalt = 16
    max_indeg = (
        edge_starts.groupBy(*key).count().agg(F.max("count")).first()[0] or 0
    )
    merge = lambda c: F.slice(  # noqa: E731
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(c)))),
        1,
        publication_cap,
    )
    ep = start_pubs.join(
        F.broadcast(edge_starts.select(*key, F.col("start").alias("rep"))), "rep"
    )
    if max_indeg <= 4 * nsalt:
        pubs = ep.groupBy(*key).agg(merge("pubs").alias("publications"))
    else:
        ep = ep.withColumn(
            "_salt", F.pmod(F.xxhash64("rep"), F.lit(nsalt)).cast("int")
        )
        pubs = (
            ep.groupBy(*key, "_salt")
            .agg(merge("pubs").alias("_part"))
            .groupBy(*key)
            .agg(merge("_part").alias("publications"))
        )
    inputs = (
        start_origins.join(
            F.broadcast(
                edge_starts.select(
                    *key, "orig_pred_id", "orig_pred_label", F.col("start").alias("rep")
                )
            ),
            "rep",
        )
        .groupBy(*key)
        .agg(
            F.concat_ws(
                ",",
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("origs")))),
            ).alias("input_identifiers"),
            F.min("orig_pred_id").alias("original_predicate_id"),
            F.min("orig_pred_label").alias("original_predicate_label"),
        )
    )
    return pubs.join(inputs, key).select(
        *key,
        "publications",
        "input_identifiers",
        F.lit(ctime).cast("long").alias("ctime"),
        F.concat(F.lit("op://"), F.col("edge_source"), F.lit("/"), F.col("subj")).alias(
            "url"
        ),
        F.substring_index("pred", ":", -1).alias("standard_label"),
        "original_predicate_id",
        "original_predicate_label",
        # every edge added through add_nonsynonymous_edge carries
        # properties['reversed']=False (builder/builder.py:217; the True
        # branch is dead code — it hard-exits at :202-204)
        F.create_map(F.lit("reversed"), F.lit("False")).alias("properties"),
    )


def path_constrained_pairs(
    start_reps: DataFrame,
    pm_rep: DataFrame,
    path_types: list[str],
    end_reps: list[str] | None = None,
    require_complete: bool = False,
) -> DataFrame:
    """Path-constrained support-pair generation — the reference's contexts
    mode (generate_links_from_paths, builder/builder.py:372-407): a pair
    (node, ancestor) for every node reachable on a program path and every
    node preceding it on such a path (transitive, within the program).

    The reference walks the built graph forward, accumulating per-node
    ancestor sets (`ancestors[other].update(ancestors[node])`,
    builder.py:396-397). Re-expressed relationally: one (node, anc) table,
    per hop extended with the direct edges plus the inherited closure —
    all frames predicate-map-bounded (dimension-sized, corpus-independent).

    Pair orientation is canonicalized to (least, greatest) — the reference's
    order depends on dict iteration and is not reproducible; supporters
    normalize to subj<obj anyway. Returns (rep_a, rep_b), rep_a < rep_b.
    """
    prune = require_complete or end_reps is not None
    alive = _alive_sets(pm_rep, path_types, end_reps) if prune else None

    frontier = start_reps.select("rep").distinct()
    if alive is not None and alive[0] is not None:
        frontier = frontier.join(F.broadcast(alive[0]), "rep")
    anc: DataFrame | None = None
    for h, (src_t, dst_t) in enumerate(zip(path_types, path_types[1:])):
        edges = pm_rep.filter(
            (F.col("src_type") == src_t) & (F.col("dst_type") == dst_t)
        ).select("subj_rep", "obj_rep")
        if alive is not None and alive[h + 1] is not None:
            edges = edges.join(
                F.broadcast(alive[h + 1].select(F.col("rep").alias("obj_rep"))),
                "obj_rep",
            )
        step = (
            frontier.join(F.broadcast(edges), frontier["rep"] == edges["subj_rep"])
            .select("subj_rep", "obj_rep")
            .distinct()
        )
        direct = step.select(
            F.col("obj_rep").alias("node"), F.col("subj_rep").alias("anc")
        )
        if anc is None:
            anc = direct
        else:
            inherited = step.join(
                anc.select(F.col("node").alias("subj_rep"), "anc"), "subj_rep"
            ).select(F.col("obj_rep").alias("node"), "anc")
            anc = anc.unionByName(direct).unionByName(inherited).distinct()
        frontier = step.select(F.col("obj_rep").alias("rep")).distinct()
    if anc is None:  # single-node path: no hops, no pairs
        return start_reps.sparkSession.createDataFrame([], "rep_a string, rep_b string")
    return (
        anc.filter(F.col("node") != F.col("anc"))
        .select(
            F.least("node", "anc").alias("rep_a"),
            F.greatest("node", "anc").alias("rep_b"),
        )
        .distinct()
    )


def origin_map(doc_entities: DataFrame) -> DataFrame:
    """rep → sorted distinct pre-canonicalization mention CURIEs, corpus-
    wide. Entity-bounded (dimension-sized) regardless of corpus size."""
    return doc_entities.groupBy("rep").agg(
        F.array_sort(F.collect_set("orig")).alias("origs")
    )


def aggregate_triples(
    raw: DataFrame,
    origins: DataFrame,
    publication_cap: int = 10_000,
    ctime: int = 0,
) -> DataFrame:
    """Dedup on (subj, pred, obj, edge_source) (builder/builder.py:218-226),
    folding per-doc provenance into sorted publications (capped — the
    reference's per-pair LIMIT 10000, builder/chemotext.py:53, applied as a
    bounded two-phase top-k so a hub edge never owns an unbounded
    aggregation buffer); input_identifiers (the reference's input_id
    lineage, builder/builder.py:36) = distinct original mention CURIEs of
    every path-start entity that triggered the edge — identical to
    accumulating per-row, but computed as one hash agg over narrow rows + a
    broadcast join against the entity-bounded origin map.

    Output carries the full reference edge schema (export_edge,
    builder/builder.py:31-41): ctime (unix epoch, injected for determinism),
    url (op-derived), standard_label, original_predicate_id/label, and an
    (empty — expansion ops carry none) properties map.
    """
    from .topk import capped_sorted_set

    key = ["subj", "pred", "obj", "edge_source"]
    # Two branches over the raw event stream, each reducing to its OWN
    # minimal column set with a map-side-combined hash-distinct before any
    # wide exchange (the event stream is doc-scale — 26.8M rows at SF=1 —
    # and both distincts collapse it inside the scan stage's codegen; the
    # join pass runs twice map-side, which is embarrassingly parallel and
    # beats materializing the events or shuffling them with unpruned
    # columns). The publications window then sorts only deduped (key, doc)
    # rows — never the raw stream (tests/test_plan_quality.py asserts the
    # distinct sits below the window).
    pubs = capped_sorted_set(
        raw.select(*key, F.concat(F.lit("DOC:"), F.col("doc_id")).alias("pub")),
        key,
        "pub",
        publication_cap,
        out="publications",
    )
    # inputs + original-predicate metadata on narrow (edge-key, start) rows
    # so the big publications arrays are never reshuffled; both sides of the
    # final join are edge-bounded
    se = raw.select(*key, "orig_pred_id", "orig_pred_label", "start").distinct()
    inputs = (
        se.withColumnRenamed("start", "rep")
        # origins carries one row per start rep with its doc-id array —
        # entity-scale and fat at web size: budget-gated broadcast
        .join(maybe_broadcast(origins), "rep")
        .groupBy(*key)
        .agg(
            F.concat_ws(
                ",",
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("origs")))),
            ).alias("input_identifiers"),
            # functionally determined by the edge key in the fixtures; min
            # for run-to-run determinism if a source ever maps two originals
            # onto one standard predicate
            F.min("orig_pred_id").alias("original_predicate_id"),
            F.min("orig_pred_label").alias("original_predicate_label"),
        )
    )
    return pubs.join(inputs, key).select(
        *key,
        "publications",
        "input_identifiers",
        F.lit(ctime).cast("long").alias("ctime"),
        F.concat(F.lit("op://"), F.col("edge_source"), F.lit("/"), F.col("subj")).alias(
            "url"
        ),
        F.substring_index("pred", ":", -1).alias("standard_label"),
        "original_predicate_id",
        "original_predicate_label",
        # every edge added through add_nonsynonymous_edge carries
        # properties['reversed']=False (builder/builder.py:217; the True
        # branch is dead code — it hard-exits at :202-204)
        F.create_map(F.lit("reversed"), F.lit("False")).alias("properties"),
    )
