"""scrp extraction as a gate-checkable query: pages are synthesized
JVM-side from the ``documents`` table, the full compiled-scrp engine
extracts fields back out through the Arrow UDF, and the DuckDB oracle
reconstructs the same answer from the raw columns — an end-to-end
correctness statement for the extraction engine itself, hash-checked
by the driver like any relational query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load

# page template: every value the scrp program extracts is derived from
# documents columns, so SQL can predict the exact output
_HTML_EXPR = (
    "concat('<html><body><h1 id=\"t\">doc ', CAST(doc_id AS STRING), "
    "'</h1><p class=\"meta\" data-lang=\"', lang, '\" data-source=\"', source, "
    "'\">meta</p><div class=\"body\">', text, '</div>"
    "<ul>', concat_ws('', transform(sequence(1, CAST(doc_id % 4 + 1 AS INT)), "
    "j -> concat('<li class=\"kw\">kw', j, '</li>'))), '</ul></body></html>')"
)

_PROGRAM = """
title: h1 { t: $element | text(); } | take(key: "t");
lang: .meta {
    l: $element | attrs() | take(key: "data-lang");
    s: $element | attrs() | take(key: "data-source");
};
body: .body { t: $element | text(); } | take(key: "t");
kws: li.kw { t: $element | text(); }* | take(key: "t")*;
n_kws: $kws | [x: 1 | eq(to: 1)];
"""


def scrp_extract_over_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .extract import extract

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pages = d.select(
        F.concat(F.lit("http://docs.test/"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        F.expr(_HTML_EXPR).alias("html"),
    )
    out = extract(pages, _PROGRAM)
    schema = (
        "struct<title: string, lang: struct<l: string, s: string>, "
        "body: string, kws: array<string>>"
    )
    rec = out.select(
        F.regexp_replace("url", "^http://docs.test/", "").cast("long").alias("doc_id"),
        F.from_json("result", schema).alias("r"),
    )
    return rec.select(
        "doc_id",
        F.col("r.title").alias("title"),
        F.col("r.lang.l").alias("lang"),
        F.col("r.lang.s").alias("source"),
        F.col("r.body").alias("body"),
        F.size("r.kws").cast("long").alias("n_kws"),
        F.concat_ws("|", "r.kws").alias("kws_joined"),
    ).orderBy("doc_id")


_SCRP_SQL = """
SELECT doc_id,
  'doc ' || CAST(doc_id AS VARCHAR) AS title,
  lang,
  source,
  text AS body,
  CAST(doc_id % 4 + 1 AS BIGINT) AS n_kws,
  list_aggregate(list_transform(range(1, CAST(doc_id % 4 + 2 AS BIGINT)),
                 j -> 'kw' || CAST(j AS VARCHAR)), 'string_agg', '|') AS kws_joined
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""

QUERIES = {"scrp_extract_over_table": scrp_extract_over_table}
ORACLE_SQL = {"scrp_extract_over_table": _SCRP_SQL}
