from robokop_build_spark.functions.curie import (
    curie_prefix,
    curie_to_label,
    has_prefix,
    make_curie,
    pmid_from_url,
    tokenize_label,
    un_curie,
)


def test_curie_helpers(spark):
    df = spark.createDataFrame(
        [("MONDO:0005136", "https://pubmed.gov/12345", "Fanconi Anemia (FA), type-B")],
        ["curie", "url", "label"],
    )
    row = df.select(
        curie_prefix("curie").alias("p"),
        un_curie("curie").alias("l"),
        curie_to_label("curie").alias("m"),
        pmid_from_url("url").alias("pmid"),
        make_curie(curie_prefix("curie"), un_curie("curie")).alias("rt"),
        tokenize_label("label").alias("toks"),
        has_prefix("curie", "MONDO").alias("is_mondo"),
    ).collect()[0]
    assert row["p"] == "MONDO"
    assert row["l"] == "0005136"
    assert row["m"] == "MONDO_0005136"
    assert row["pmid"] == "PMID:12345"
    assert row["rt"] == "MONDO:0005136"
    assert "Fanconi" in row["toks"] and "type" in " ".join(row["toks"])
    assert row["is_mondo"] is True
