"""Seed lookups: name → CURIE against the mention lexicon.

Reference analog (builder/lookup_utils.py):
- S3 lookup_phenotype_by_name (:4-13): case-insensitive exact match, HP ids
- S2 lookup_disease_by_name (:17-31): MONDO ids, HP-prefixed hits dropped (:26)
- S1 lookup_drug_by_name (:50-66): union of sources
- S4 lookup_identifier (:69-77): dispatch by node type, reject others

The reference also matches comma-inverted names ("Disease, Fancy" ↔
"Fancy Disease"); we normalize both sides the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOOKUP_TYPES = {"disease", "phenotypic_feature", "chemical_substance", "gene"}


def _norm_name(col):
    """lowercase + comma-inversion normalization: 'Anemia, Fanconi' →
    'fanconi anemia' (lookup_utils.py:7-8)."""
    inverted = F.concat_ws(
        " ",
        F.trim(F.substring_index(col, ",", -1)),
        F.trim(F.substring_index(col, ",", 1)),
    )
    return F.when(col.contains(","), F.lower(inverted)).otherwise(F.lower(col))


def lookup_by_name(
    names: DataFrame, lexicon: DataFrame, node_type: str, name_col: str = "name"
) -> DataFrame:
    """names(name) × lexicon(surface, curie, node_type) → (name, curie).

    Case-insensitive exact match on the (comma-normalized) name; restricted
    to the requested node type; disease lookups drop HP-prefixed hits
    (lookup_utils.py:26 F1 filter). Lexicon side is broadcast."""
    if node_type not in LOOKUP_TYPES:
        raise ValueError(f"unsupported lookup type: {node_type!r}")  # S4 reject
    lex = lexicon.filter(F.col("node_type") == node_type)
    if node_type == "disease":
        lex = lex.filter(~F.col("curie").startswith("HP"))
    lex = lex.select(
        F.lower(F.col("surface")).alias("__surface"), "curie"
    ).distinct()
    return (
        names.withColumn("__norm", _norm_name(F.col(name_col)))
        .join(F.broadcast(lex), F.col("__norm") == F.col("__surface"))
        .select(name_col, "curie")
        .distinct()
    )


def lookup_identifier(
    names: DataFrame, lexicon: DataFrame, node_type: str, name_col: str = "name"
) -> DataFrame:
    """S4 dispatch (kept for reference-API parity)."""
    return lookup_by_name(names, lexicon, node_type, name_col)
