"""Array / collection operators (SURVEY §2.9 X13–X15, §2.5 A4).

Reference semantics re-expressed over the synthetic tables:
- X13 tag-set union (assets/data_gov_uk/assets.py:125-129: package tags ∪
  {category}) — array_union + array_distinct, sorted for deterministic
  comparison (the reference's dict-ordering is single-node luck).
- X14 ordered-distinct speaker list (hansard parser.py:236-246: append
  speaker if absent, preserving first-encounter order) — the distributed
  form is groupBy (group, member) → min(first_seen) → sort by first_seen,
  which scales as two keyed shuffles instead of a stateful scan.
- X15 separator concat (parser.py:192,242-246: segments joined ' \\p ') —
  array_join over a deterministically ordered collect.
- A4 min-reduce over a repeated group (gov_uk assets.py:167-187: oldest
  change_history timestamp) — array_min over a collected array, checked
  against plain MIN.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load


def tag_union(spark, sf_dir):
    """X13: tags ∪ {category}, deduped and sorted. Tags are derived from the
    row (source, lang) so both engines build identical inputs."""
    docs = load(spark, sf_dir, "documents")
    tags = F.array(F.col("source"), F.col("lang"), F.lit("open-data"))
    merged = F.array_sort(
        F.array_distinct(F.array_union(tags, F.array(F.lit("category"), F.col("source"))))
    )
    # rendered as a joined string so the oracle hash is list-layout-agnostic
    return docs.select("doc_id", F.array_join(merged, ",").alias("tags"))


def ordered_distinct_members(spark, sf_dir):
    """X14: first-encounter-ordered distinct event types per user. Two keyed
    aggregations — (user, type) → first_seen, then user → sorted list —
    no stateful scan, no driver loop."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min(F.struct("ts", "event_id")).alias("first_seen")
    )
    return (
        firsts.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("first_seen", "event_type"))),
                    lambda x: x["event_type"],
                ),
                ",",
            ).alias("types_in_order")
        )
    )


def concat_with_separator(spark, sf_dir):
    """X15: per-user conversation text — event types joined with ' \\p ' in
    (ts, event_id) order (ref separator parser.py:242-246)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                " \\p ",
            ).alias("conversation")
        )
    )


def min_over_array(spark, sf_dir):
    """A4: oldest timestamp from a collected repeated group — array_min of
    collect_list(o_orderdate) per customer, with the default for empty
    groups handled by coalesce (ref: gov_uk assets.py:167-187)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.collect_list("o_orderdate").alias("dates"))
        .select(
            "o_custkey",
            F.coalesce(
                F.array_min("dates"), F.lit("1970-01-01").cast("timestamp")
            ).alias("oldest"),
            F.size("dates").cast("bigint").alias("n_changes"),
        )
    )


def register(reg):
    reg.add(
        "array_tag_union",
        tag_union,
        "SELECT doc_id, array_to_string(list_sort(list_distinct(list_concat("
        "[source, lang, 'open-data'], ['category', source]))), ',') AS tags "
        "FROM documents",
    )
    reg.add(
        "array_ordered_distinct",
        ordered_distinct_members,
        "WITH ranked AS ("
        "  SELECT user_id, event_type, ts, event_id, ROW_NUMBER() OVER "
        "    (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn "
        "  FROM events) "
        "SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS types_in_order "
        "FROM ranked WHERE rn = 1 GROUP BY user_id",
    )
    reg.add(
        "array_concat_sep",
        concat_with_separator,
        "SELECT user_id, string_agg(event_type, ' \\p ' ORDER BY ts, event_id) AS conversation "
        "FROM events GROUP BY user_id",
    )
    reg.add(
        "array_min_reduce",
        min_over_array,
        "SELECT o_custkey, COALESCE(MIN(o_orderdate), TIMESTAMP '1970-01-01') AS oldest, "
        "COUNT(*) AS n_changes FROM orders GROUP BY o_custkey",
    )
