"""CURIE column helpers (SURVEY.md §2.7 scalar functions, X1-X9).

All thin wrappers over JVM builtins — they exist so pipeline code reads in
domain terms while staying inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def curie_prefix(col) -> Column:
    """X1: `MONDO:0005136` → `MONDO` (Text.get_curie analog,
    builder/chemotext.py:27)."""
    return F.split(col, ":")[0]


def un_curie(col) -> Column:
    """X2: `MONDO:0005136` → `0005136` (builder/cdw.py:82,87)."""
    return F.substring_index(col, ":", -1)


def curie_to_label(col) -> Column:
    """X3: relationship-type munge `:` → `_` (builder/builder.py:36)."""
    return F.regexp_replace(col, ":", "_")


def pmid_from_url(col) -> Column:
    """X4: pubmed URL → `PMID:nnn` (builder/omnicorp.py:26)."""
    return F.concat(F.lit("PMID:"), F.substring_index(col, "/", -1))


def make_curie(prefix, local) -> Column:
    """X9: f-string construction analog (builder/omnicorp.py:28)."""
    return F.concat_ws(":", prefix, local)


def tokenize_label(col) -> Column:
    """X5: punctuation `()-,;./` → space, then whitespace split
    (builder/chemotext2.py:35-38)."""
    return F.split(F.translate(col, "()-,;./", "       "), " +")


def has_prefix(col, prefix: str) -> Column:
    """F2: CURIE-prefix selector (builder/chemotext.py:27)."""
    return curie_prefix(col) == F.lit(prefix)
