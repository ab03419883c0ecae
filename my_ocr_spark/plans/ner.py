"""NER entity-level metrics (SURVEY.md §2.4: eval_ner_f1,
``mmocr/core/evaluation/ner_metric.py:44-120`` — per-class origin/found/
right counts → precision/recall), over deterministic entity sets derived
from the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from my_ocr_spark.plans.registry import query, t

# entity = distinct normalized word of length >= 6; class by first letter
_CLASS_CASE = ("CASE WHEN substr(word, 1, 1) IN ('a','e','i','o','u') "
               "THEN 'PER' WHEN substr(word, 1, 1) < 'm' THEN 'ORG' "
               "ELSE 'LOC' END")

_ENT_SQL = """
    SELECT DISTINCT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents WHERE length(text) > 0)
    WHERE length(word) >= 6
"""


@query(
    "ner_entity_f1",
    oracle=f"""
    WITH gt AS (SELECT doc_id, word, {_CLASS_CASE} AS cls
                FROM ({_ENT_SQL})),
    pred AS (SELECT doc_id, word, {_CLASS_CASE} AS cls
             FROM ({_ENT_SQL})
             WHERE NOT (doc_id % 5 = 0 AND word LIKE '%s')),
    origin AS (SELECT cls, count(*) AS origin FROM gt GROUP BY cls),
    found AS (SELECT cls, count(*) AS found FROM pred GROUP BY cls),
    rightc AS (
        SELECT g.cls, count(*) AS n_right
        FROM gt g JOIN pred p
          ON g.doc_id = p.doc_id AND g.word = p.word AND g.cls = p.cls
        GROUP BY g.cls
    )
    SELECT o.cls, o.origin, coalesce(f.found, 0) AS found,
           coalesce(r.n_right, 0) AS n_right,
           CAST(coalesce(r.n_right, 0) AS DOUBLE)
               / coalesce(f.found, 1) AS precision_v,
           CAST(coalesce(r.n_right, 0) AS DOUBLE) / o.origin AS recall_v
    FROM origin o
    LEFT JOIN found f ON f.cls = o.cls
    LEFT JOIN rightc r ON r.cls = o.cls
    """,
)
def ner_entity_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-level per-class origin/found/right counts. Entities are
    deterministic derivations (distinct long words, class by first
    letter); pred drops a deterministic subset, exercising the exact
    join-and-count shape of eval_ner_f1."""
    d = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("word"))
    ents = (words.filter(F.length("word") >= 6)
                 .select("doc_id", "word").distinct())
    cls = (F.when(F.substring("word", 1, 1)
                  .isin("a", "e", "i", "o", "u"), "PER")
            .when(F.substring("word", 1, 1) < "m", "ORG")
            .otherwise("LOC"))
    gt = ents.withColumn("cls", cls)
    pred = gt.filter(~((F.col("doc_id") % 5 == 0)
                       & F.col("word").endswith("s")))
    origin = gt.groupBy("cls").agg(F.count("*").alias("origin"))
    found = pred.groupBy("cls").agg(F.count("*").alias("found"))
    right = (gt.join(pred, ["doc_id", "word", "cls"])
               .groupBy("cls").agg(F.count("*").alias("n_right")))
    out = (origin.join(found, "cls", "left").join(right, "cls", "left")
                 .fillna(0, subset=["found", "n_right"]))
    return out.select(
        "cls", "origin", "found", "n_right",
        (F.col("n_right").cast("double")
         / F.when(F.col("found") > 0, F.col("found")).otherwise(1))
        .alias("precision_v"),
        (F.col("n_right").cast("double") / F.col("origin"))
        .alias("recall_v"),
    )
