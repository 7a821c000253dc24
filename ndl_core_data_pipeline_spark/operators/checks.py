"""Declarative data-quality constraints (Deequ / dbt-test analog, engine
surface): a rule set evaluated as ordinary aggregations producing one
(rule, n_violations, passed) row each — the verification layer any 100 TB
ingest runs before publishing a partition.

Scale shape: per-table rules collapse into ONE conditional-aggregation
pass over that table (no rule-per-scan); referential rules are left-anti
joins on the key. The report is a union of tiny aggregate rows — nothing
wide ever moves. Rules are data, not code: `CHECKS` below is the suite
the registered query runs, and `constraint_report` accepts any list of
the same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..io import load


def not_null(col: str):
    return (f"not_null({col})", F.count(F.when(F.col(col).isNull(), 1)))


def unique(col: str):
    # violations = extra copies beyond the first of each value
    return (f"unique({col})", F.count(col) - F.countDistinct(col))


def accepted_values(col: str, values: tuple):
    return (
        f"accepted_values({col})",
        F.count(F.when(~F.col(col).isin(*values), 1)),
    )


def non_negative(col: str):
    return (f"non_negative({col})", F.count(F.when(F.col(col) < 0, 1)))


def vector_elements_valid(col: str):
    """Corrupt-vector detection: a non-NULL array containing a NULL or
    non-finite element. The r11 element-null probe
    (scripts/probe_element_nulls.py) showed such vectors crash nothing
    but win/lose ANN rankings engine-dependently — the data contract is
    therefore validate-and-reject HERE, upstream of the vector family,
    not silent per-query filtering. Whole-NULL vectors are the
    not_null rule's business and pass this one."""
    from ._util import finite

    bad_elem = F.exists(
        F.col(col),
        lambda x: x.isNull() | ~finite(x.cast("double")),
    )
    return (
        f"vector_elements_valid({col})",
        F.count(F.when(F.col(col).isNotNull() & bad_elem, 1)),
    )


def enforce_unique_key(
    df: DataFrame, *cols: str, sample: int = 5, mode: str = "raise"
):
    """The DECLARED id contract, as a loud gate (round-16 extreme-BIGINT
    handoff): identity columns (documents.doc_id, events.event_id,
    embeddings.vec_id, the TPC-H keys) must be unique — ANY duplicated
    key is rejected, byte-identical payloads included. The r16
    duplicate-row axis proved this empirically: planting byte-exact
    copies (same id, same payload) diverged 11 registry queries, because
    per-id operators (simhash, winnowing, PMI, tree depth, block
    rewrite, postings df, trained vector models) have no defined
    MULTIPLICITY semantics in any engine — which copy wins a
    first/collect/group, and whether a count sees 1 or 2, is
    plan-dependent. The contract is validate-and-reject at ingest,
    exactly like vector_elements_valid for corrupt embeddings — not
    silent per-operator merge heuristics.

    Scale shape: ONE keyed count over the id columns (map-side partial
    agg). Two modes:
      mode="raise" (default, the gate): returns `df` unchanged when the
        contract holds; raises ValueError naming at most `sample`
        offending keys when it doesn't.
      mode="quarantine" (the 100 TB ingest path, round-17 — the same
        pattern as scan_workbooks_quarantined for corrupt workbooks):
        returns (clean_df, quarantined_df) — every row whose key is
        duplicated goes to the quarantine side-output, rows with unique
        keys proceed. Null-safe on the key columns (two NULL-keyed rows
        ARE a collision), no collect anywhere.
    """
    dupes = (
        df.groupBy(*[F.col(c) for c in cols])
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )
    if mode == "quarantine":
        dup_keys = dupes.select(*[F.col(c).alias(f"__dup_{c}") for c in cols])
        cond = None
        for c in cols:
            e = df[c].eqNullSafe(F.col(f"__dup_{c}"))
            cond = e if cond is None else (cond & e)
        clean = df.join(dup_keys, cond, "left_anti")
        quarantined = df.join(dup_keys, cond, "left_semi")
        return clean, quarantined
    if mode != "raise":
        raise ValueError(f"unknown mode {mode!r}: expected 'raise' or 'quarantine'")
    offenders = dupes.orderBy(F.desc("n_copies"), *cols).take(sample)
    if offenders:
        shown = ", ".join(
            "(" + ", ".join(f"{c}={r[c]!r}" for c in cols) + f") ×{r['n_copies']}"
            for r in offenders
        )
        raise ValueError(
            f"id contract violated: key ({', '.join(cols)}) is not unique — "
            f"e.g. {shown}. Duplicated ids (byte-identical payloads included: "
            "the r16 duprow axis diverged 11 ways on exactly those) have "
            "undefined multiplicity semantics in per-id operators; "
            "deduplicate or re-key at ingest, or use mode='quarantine'."
        )
    return df


def _table_report(df: DataFrame, rules) -> DataFrame:
    """All single-table rules in ONE aggregation pass. The one-row
    aggregate explodes into per-rule rows in the SAME plan — a
    union-of-selects over the agg would re-execute the scan per rule
    (Catalyst re-runs uncached subtrees per consumer)."""
    aggs = [expr.cast("bigint").alias(f"r{i}") for i, (_n, expr) in enumerate(rules)]
    row = df.agg(*aggs)
    rule_structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(f"r{i}").alias("n_violations"),
            (F.col(f"r{i}") == 0).alias("passed"),
        )
        for i, (name, _e) in enumerate(rules)
    ]
    return row.select(F.explode(F.array(*rule_structs)).alias("x")).select("x.*")


def referential(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str) -> DataFrame:
    """FK containment: child keys with no parent row (left-anti count)."""
    # SQL FK / Deequ semantics: a NULL child key is not an orphan (the
    # not_null rule owns null detection) — filter before the anti-join
    orphans = (
        child.select(F.col(child_key).alias("k"))
        .filter(F.col("k").isNotNull())
        .join(parent.select(F.col(parent_key).alias("k")), "k", "left_anti")
    )
    return orphans.agg(F.count("*").alias("n")).select(
        F.lit(name).alias("rule"),
        F.col("n").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )


def constraint_report(spark, sf_dir):
    """The registered suite: orders single-table rules in one pass plus
    two referential rules, unioned into one report."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    l = load(spark, sf_dir, "lineitem")
    order_rules = [
        not_null("o_orderkey"),
        unique("o_orderkey"),
        accepted_values("o_orderstatus", ("O", "F", "P")),
        non_negative("o_totalprice"),
    ]
    report = _table_report(o, order_rules)
    report = report.unionAll(
        referential(o, "o_custkey", c, "c_custkey", "fk(orders.o_custkey -> customer)")
    )
    report = report.unionAll(
        referential(l, "l_orderkey", o, "o_orderkey", "fk(lineitem.l_orderkey -> orders)")
    )
    emb = load(spark, sf_dir, "embeddings")
    report = report.unionAll(
        _table_report(emb, [vector_elements_valid("embedding")])
    )
    # the declared id contract (see enforce_unique_key): per-id operators
    # over documents/events are undefined on duplicate ids, so the audit
    # that every ingest should run before them is part of the suite
    docs = load(spark, sf_dir, "documents")
    report = report.unionAll(
        _table_report(docs, [not_null("doc_id"), unique("doc_id")])
    )
    ev = load(spark, sf_dir, "events")
    report = report.unionAll(_table_report(ev, [unique("event_id")]))
    return report


def register(reg):
    reg.add(
        "quality_constraint_report",
        constraint_report,
        "SELECT 'not_null(o_orderkey)' AS rule, "
        "COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_violations, "
        "COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) = 0 AS passed FROM orders "
        "UNION ALL SELECT 'unique(o_orderkey)', "
        "COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey), "
        "COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) = 0 FROM orders "
        "UNION ALL SELECT 'accepted_values(o_orderstatus)', "
        "COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END), "
        "COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) = 0 FROM orders "
        "UNION ALL SELECT 'non_negative(o_totalprice)', "
        "COUNT(CASE WHEN o_totalprice < 0 THEN 1 END), "
        "COUNT(CASE WHEN o_totalprice < 0 THEN 1 END) = 0 FROM orders "
        "UNION ALL SELECT 'fk(orders.o_custkey -> customer)', "
        "(SELECT COUNT(*) FROM orders ow WHERE ow.o_custkey IS NOT NULL "
        "AND NOT EXISTS "
        "(SELECT 1 FROM customer WHERE c_custkey = ow.o_custkey)), "
        "(SELECT COUNT(*) FROM orders ow WHERE ow.o_custkey IS NOT NULL "
        "AND NOT EXISTS "
        "(SELECT 1 FROM customer WHERE c_custkey = ow.o_custkey)) = 0 "
        "UNION ALL SELECT 'fk(lineitem.l_orderkey -> orders)', "
        "(SELECT COUNT(*) FROM lineitem lw WHERE lw.l_orderkey IS NOT NULL "
        "AND NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_orderkey = lw.l_orderkey)), "
        "(SELECT COUNT(*) FROM lineitem lw WHERE lw.l_orderkey IS NOT NULL "
        "AND NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_orderkey = lw.l_orderkey)) = 0 "
        "UNION ALL SELECT 'vector_elements_valid(embedding)', "
        "COUNT(CASE WHEN embedding IS NOT NULL AND len(list_filter(embedding, "
        "x -> x IS NULL OR NOT isfinite(CAST(x AS DOUBLE)))) > 0 THEN 1 END), "
        "COUNT(CASE WHEN embedding IS NOT NULL AND len(list_filter(embedding, "
        "x -> x IS NULL OR NOT isfinite(CAST(x AS DOUBLE)))) > 0 THEN 1 END) = 0 "
        "FROM embeddings "
        "UNION ALL SELECT 'not_null(doc_id)', "
        "COUNT(CASE WHEN doc_id IS NULL THEN 1 END), "
        "COUNT(CASE WHEN doc_id IS NULL THEN 1 END) = 0 FROM documents "
        "UNION ALL SELECT 'unique(doc_id)', "
        "COUNT(doc_id) - COUNT(DISTINCT doc_id), "
        "COUNT(doc_id) - COUNT(DISTINCT doc_id) = 0 FROM documents "
        "UNION ALL SELECT 'unique(event_id)', "
        "COUNT(event_id) - COUNT(DISTINCT event_id), "
        "COUNT(event_id) - COUNT(DISTINCT event_id) = 0 FROM events",
    )
