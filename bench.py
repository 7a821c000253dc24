#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing methodology: each query materializes via the `noop` sink (full
execution, no driver-side collection or Arrow transfer cost), after a
warm-up pass of q6 to absorb JVM/codegen startup. Times are per-query
wall-clock seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ndl_core_data_pipeline_spark.session import get_spark

# CORE = the 18 queries BASELINE.md §"Bench numbers" recorded (2026-08-13).
# FROZEN: never add to or remove from this list — its total is the only
# number comparable across rounds and against the baseline's 31.8 s.
CORE_BENCH = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "dedup_exact_hash",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "text_quality_score",
    "text_langid",
    "vector_cosine_topk",
    "vector_lsh_buckets",
    "window_ranking_family",
    "window_sessionize",
    "join_asof_last_view",
    "events_tumbling_window",
    "topk_per_group",
    "setop_union_all",
    "agg_cube",
]

# EXTENDED grows as operator families land — one headliner per family.
EXTENDED_BENCH = [
    "q4_priority_exists",
    "q18_large_volume_customers",
    "dedup_minhash_clusters",
    "dedup_simhash_pairs",
    "text_repetition_signals",
    "text_winnowing_fingerprints",
    "vector_ivf_topk",
    # distributed BPE train (24 merge rounds over documents) — the one
    # iterative-driver-loop headliner; regressions in the per-round keyed
    # shuffle or the ONE-row collects show up here
    "bpe_train_merges",
    # round-6 families: binned fact×fact range join, PQ ADC scan, BM25
    "join_range_binned",
    "vector_pq_adc_topk",
    "text_bm25_topk",
    "dedup_substring_spans",
    # round-6 warehouse/graph families: bitmap-pruned semi-join,
    # Misra-Gries heavy hitters (map-side summaries + candidate recount)
    "join_bloom_pruned",
    "agg_heavy_hitters",
    "graph_tree_depth_root",
    # round-6 closers: Lloyd k-means (iterative broadcast-assign loop),
    # two-level global prefix sum, session-path mining
    "vector_kmeans_centroids",
    "window_distributed_prefix_sum",
    "events_session_paths",
    # round 7: degree-oriented triangle count (wedge-join skew fix), the
    # trained IVF-PQ composition (k-means -> residual PQ -> ADC probe),
    # the exact prefix-filter Jaccard join, and the HLL sketch family
    "graph_triangle_count",
    "vector_ivfpq_adc_search",
    "dedup_jaccard_prefix_join",
    "agg_hll_distinct",
    # round 10: the two plans rewritten after the sf1 sweep (gram-tiled
    # LSH near-dup) and the keyed-rank RFM rewrite — bench-visible so
    # future regressions in either shape show round-over-round
    "dedup_embedding_lsh",
    "events_rfm_scores",
]

BENCH_QUERIES = CORE_BENCH + EXTENDED_BENCH

# the expensive tail ALSO records a median over core_reps runs (r9
# VERDICT item 3: ivfpq/kmeans "+17%" swings with byte-identical code
# paths need the same min+median noise separation the core 18 have —
# r10 confirmed by call-graph that the r9 vector.py diff touches
# neither query, so single-run deltas there are pure host weather)
TAIL_MEDIAN = [
    "vector_ivfpq_adc_search",
    "vector_kmeans_centroids",
    "dedup_simhash_pairs",
    "graph_triangle_count",
    "dedup_minhash_clusters",
]

# Weather-immune measurement for the expensive tail (VERDICT r10 item 3:
# ivfpq recorded 8.16 s vs 4.06 s on byte-identical code — ±70% host
# noise dominates every number above ~2 s). Each TAIL_MEDIAN query and
# each SETUP_BENCH scan interleaves its reps A/B/A/B with this fixed
# reference query IN THE SAME SESSION and additionally reports
# t(target)/t(ref) medians: the ratio cancels host weather, so
# round-over-round regressions become decidable. The reported min stays
# best-of-`reps` target runs (measurement context changed in r11: a ref
# run now precedes every target run, shifting cache/JIT warmth vs the
# pre-r11 consecutive-run mins — cross-round comparisons of these
# entries should use the ratio, which is the stated intent).
RATIO_REF = "q1_pricing_summary"

# VERDICT r11 item 2: three >1.5x round-over-round movers sat OUTSIDE the
# ratio set and were therefore undecidable (weather vs regression). Every
# headliner that measured >= 0.5 s in r11 now also runs interleaved
# A/B/A/B against q3 (~1 s scan+join+agg+sort — a real weather probe).
# q6 (~0.25 s) was tried first and REJECTED with recorded evidence: its
# runtime is scheduling-floor-dominated and does not co-vary with the
# CPU weather multi-second targets see, so q6-denominated ratios drifted
# up to 90% between same-code sessions (agg_heavy_hitters 4.13 vs 7.82)
# while raw mins moved 13%. The full q1 ref would add ~2 min of wall
# clock across 26 queries; q3 costs half that. The r11-established
# TAIL_MEDIAN/SETUP entries keep the q1 ref so their ratios stay
# comparable to BENCH_r11.json. q1 itself is included (vs q3), chaining
# the two reference scales; q3 is the denominator, so it has no entry.
RATIO_WIDE_REF = "q3_shipping_priority"
WIDE_RATIO = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "vector_cosine_topk",
    "vector_lsh_buckets",
    "window_sessionize",
    "agg_cube",
    "q4_priority_exists",
    "q18_large_volume_customers",
    "text_repetition_signals",
    "text_winnowing_fingerprints",
    "vector_ivf_topk",
    "bpe_train_merges",
    "join_range_binned",
    "vector_pq_adc_topk",
    "text_bm25_topk",
    "dedup_substring_spans",
    "join_bloom_pruned",
    "agg_heavy_hitters",
    "window_distributed_prefix_sum",
    "events_session_paths",
    "dedup_jaccard_prefix_join",
    "agg_hll_distinct",
    "dedup_embedding_lsh",
    "events_rfm_scores",
]

# Membership invariants (ADVICE r12): the dispatch below is an elif
# chain, so a query in BOTH lists would silently lose its wide (q3)
# ratio, and a WIDE_RATIO name outside BENCH_QUERIES would silently
# never run. The lists are disjoint today; make that a startup failure
# instead of a silent measurement gap. Explicit raises, not asserts:
# `python -O` strips asserts, which would silently restore the gap.
if not set(WIDE_RATIO).isdisjoint(TAIL_MEDIAN):
    raise AssertionError(
        "WIDE_RATIO and TAIL_MEDIAN overlap: "
        f"{sorted(set(WIDE_RATIO) & set(TAIL_MEDIAN))}"
    )
if not set(WIDE_RATIO) <= set(BENCH_QUERIES):
    raise AssertionError(
        f"WIDE_RATIO not in BENCH_QUERIES: {sorted(set(WIDE_RATIO) - set(BENCH_QUERIES))}"
    )
if not set(TAIL_MEDIAN) <= set(BENCH_QUERIES):
    raise AssertionError(
        f"TAIL_MEDIAN not in BENCH_QUERIES: {sorted(set(TAIL_MEDIAN) - set(BENCH_QUERIES))}"
    )


def _ratio_movers(detail: dict, threshold: float = 1.3) -> dict:
    """Compare this run's tail/wide ratios to the committed
    bench_detail.json (git HEAD). A query whose ratio moved more than
    `threshold`x in either direction is a MOVER needing adjudication
    (code regression vs measurement change); everything else is inside
    the established ratio drift. Returns {} silently when git or the
    committed file is unavailable (e.g. first run in a fresh clone)."""
    import subprocess

    try:
        p = subprocess.run(
            ["git", "show", "HEAD:bench_detail.json"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=30,
        )
        if p.returncode != 0:
            return {}
        prev = json.loads(p.stdout)
    except (OSError, ValueError, subprocess.SubprocessError):
        return {}
    movers: dict[str, dict] = {}
    compared = 0
    for kind in ("tail_ratio", "wide_ratio"):
        cur_k, prev_k = detail.get(kind) or {}, prev.get(kind) or {}
        for q, r in cur_k.items():
            pr = prev_k.get(q)
            if not pr or min(pr, r) <= 0:
                continue
            compared += 1
            if max(r / pr, pr / r) > threshold:
                movers[q] = {"kind": kind, "committed": pr, "now": round(r, 3)}
    return {"threshold": threshold, "n_compared": compared, "movers": movers}


def _bench_pdf(lines: int, seed: int) -> bytes:
    """Minimal single-page flate-compressed PDF with `lines` text lines —
    the bench corpus generator for the distributed PDF scan (matches the
    shape of tests/test_pdf._mini_pdf)."""
    import zlib

    body = b" ".join(
        b"(doc %d line %d with some words) Tj 0 -12 Td" % (seed, i)
        for i in range(lines)
    )
    comp = zlib.compress(b"BT /F1 10 Tf 72 760 Td " + body + b" ET")
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 4 0 R/MediaBox[0 0 612 792]>>",
        b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objects, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<</Size %d/Root 1 0 R>>\n%%%%EOF" % (len(objects) + 1)
    return bytes(out)


def setup_pdf_scan(spark, sf_dir: str, tmp: str):
    """PDF text-extraction micro-bench: 256 synthetic flate-compressed
    documents written once, then the timed path is the real distributed
    scan (binaryFile listing -> mapInPandas pure-Python extraction)."""
    from ndl_core_data_pipeline_spark.sources.pdfs import scan_pdfs

    corpus = os.path.join(tmp, "pdf_corpus")
    os.makedirs(corpus, exist_ok=True)
    for i in range(256):
        with open(os.path.join(corpus, f"doc_{i:04d}.pdf"), "wb") as fh:
            fh.write(_bench_pdf(lines=40 + (i % 7) * 10, seed=i))

    def timed(spark, sf_dir):
        return scan_pdfs(spark, corpus)

    return timed


def run_one(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def setup_ivf_probe(spark, sf_dir: str, tmp: str):
    """The 100 TB IVF shape: build the index ONCE, persist partitioned by
    cell, and time ONLY probe + exact rerank over the pruned partitions.
    (vector_ivf_topk stays in the list as the self-contained oracle form
    that rebuilds per query — this entry is the production read path.)"""
    from ndl_core_data_pipeline_spark import search
    from ndl_core_data_pipeline_spark.io import load

    emb = load(spark, sf_dir, "embeddings")
    indexed, centers = search.ivf_index(emb, n_cells=16)
    path = os.path.join(tmp, "ivf_index")
    indexed.write.mode("overwrite").partitionBy("cell").parquet(path)
    persisted = spark.read.parquet(path)
    qvec = [
        float(v)
        for v in emb.filter("vec_id = 0").select("embedding").first()["embedding"]
    ]

    def timed(spark, sf_dir):
        return search.ivf_search(persisted, centers, qvec, nprobe=2, k=10)

    return timed


def setup_zip_scan(spark, sf_dir: str, tmp: str):
    """Zip-archive table extraction micro-bench: 128 archives × 3 CSV/TSV
    members × 200 rows, written once; the timed path is the distributed
    member fan-out + row parse (binaryFile listing → mapInPandas)."""
    import zipfile

    from ndl_core_data_pipeline_spark.sources.archives import scan_zip_tables

    corpus = os.path.join(tmp, "zip_corpus")
    os.makedirs(corpus, exist_ok=True)
    body_csv = "id,name,qty\n" + "\n".join(
        f"{i},row{i},{i % 97}" for i in range(200)
    )
    body_tsv = "k\tv\n" + "\n".join(f"{i}\tval{i}" for i in range(200))
    for a in range(128):
        with zipfile.ZipFile(os.path.join(corpus, f"rel_{a:03d}.zip"), "w") as zf:
            zf.writestr("a.csv", body_csv)
            zf.writestr("sub/b.tsv", body_tsv)
            zf.writestr(f"c_{a}.csv", body_csv)

    def timed(spark, sf_dir):
        return scan_zip_tables(spark, corpus)

    return timed


_DOCX_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>'
)


def setup_docx_scan(spark, sf_dir: str, tmp: str):
    """DOCX text-extraction micro-bench: 256 synthetic OOXML documents of
    ~80 paragraphs each, written once; the timed path is the distributed
    scan (binaryFile listing → mapInPandas stdlib-XML extraction)."""
    import zipfile

    from ndl_core_data_pipeline_spark.sources.docx import scan_docx

    corpus = os.path.join(tmp, "docx_corpus")
    os.makedirs(corpus, exist_ok=True)
    ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    for i in range(256):
        paras = "".join(
            f"<w:p><w:r><w:t>doc {i} paragraph {j} with several words"
            "</w:t></w:r></w:p>"
            for j in range(80)
        )
        doc = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<w:document xmlns:w="{ns}"><w:body>{paras}</w:body></w:document>'
        )
        with zipfile.ZipFile(os.path.join(corpus, f"doc_{i:04d}.docx"), "w") as zf:
            zf.writestr("[Content_Types].xml", _DOCX_CT)
            zf.writestr("word/document.xml", doc)

    def timed(spark, sf_dir):
        return scan_docx(spark, corpus)

    return timed


# build-once / probe-many entries: setup runs untimed, the returned
# callable is what the reps measure
SETUP_BENCH = {
    "vector_ivf_probe": setup_ivf_probe,
    "pdf_text_scan": setup_pdf_scan,
    "zip_table_scan": setup_zip_scan,
    "docx_text_scan": setup_docx_scan,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    import __spark_entry__ as contract

    queries = contract.queries()
    spark = get_spark(app_name="ndlspark-bench", cpus=cpus, shuffle_partitions=cpus)
    try:
        run_one(queries["q6_forecast_revenue"], spark, sf_dir)  # warm-up
        reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
        # the frozen core 18 additionally record a MEDIAN over 3 runs
        # (VERDICT r8 item 7: single-run swings like q1's 1.56->2.79 s
        # with zero code change need min+median to separate code from
        # host weather). The reported min stays best-of-`reps` — min over
        # MORE runs would be stochastically lower, silently breaking the
        # round-over-round comparability of core_total; the extra run
        # feeds only the median.
        core_reps = max(reps, int(os.environ.get("SPARK_GRAFT_BENCH_CORE_REPS", "3")))
        unknown = [n for n in BENCH_QUERIES if n not in queries]
        if unknown:  # a renamed query must fail the bench, not shrink it
            raise KeyError(f"bench headliners missing from registry: {unknown}")
        import statistics

        timings: dict[str, float] = {}
        core_median: dict[str, float] = {}
        tail_median: dict[str, float] = {}
        tail_ratio: dict[str, float] = {}
        wide_ratio: dict[str, float] = {}
        ref_fn = queries[RATIO_REF]
        wide_ref_fn = queries[RATIO_WIDE_REF]

        def ratio_runs(fn, n, ref):
            """A/B/A/B: a ref run immediately before every target run —
            the pairs share whatever the host is doing, so the median
            ratio is weather-immune."""
            refs, tgts = [], []
            for _ in range(n):
                refs.append(run_one(ref, spark, sf_dir))
                tgts.append(run_one(fn, spark, sf_dir))
            return tgts, round(
                statistics.median(tgts) / statistics.median(refs), 3
            )

        for name in BENCH_QUERIES:
            # best-of-N wall clock: robust against host-level noisy
            # neighbors; per-run times still visible on stderr
            if name in TAIL_MEDIAN:
                runs, tail_ratio[name] = ratio_runs(queries[name], core_reps, ref_fn)
                tail_median[name] = round(statistics.median(runs), 4)
            elif name in WIDE_RATIO and name not in CORE_BENCH:
                runs, wide_ratio[name] = ratio_runs(
                    queries[name], core_reps, wide_ref_fn
                )
            else:
                # CORE mins keep the r1-frozen methodology — plain
                # consecutive runs, NO interleaved ref — so core_total
                # stays comparable to the baseline and every prior
                # round. A core query that is also in WIDE_RATIO gets
                # its ratio from EXTRA pairs afterwards whose timings
                # are discarded (review finding: substituting
                # interleaved-context mins for 9 of the 18 frozen core
                # queries silently broke the one judged number).
                n_reps = core_reps if name in CORE_BENCH else reps
                runs = [
                    run_one(queries[name], spark, sf_dir) for _ in range(n_reps)
                ]
                if name in CORE_BENCH:
                    core_median[name] = round(statistics.median(runs), 4)
                if name in WIDE_RATIO:
                    _, wide_ratio[name] = ratio_runs(
                        queries[name], core_reps, wide_ref_fn
                    )
            timings[name] = round(min(runs[:reps]), 4)
            print(f"bench {name}: {timings[name]:.2f}s", file=sys.stderr, flush=True)
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="ndlspark-bench-")
        try:
            for name, setup in SETUP_BENCH.items():
                timed = setup(spark, sf_dir, tmp)
                # core_reps pairs, not reps: these entries are sub-second,
                # so a median-of-2 ratio is one bad run away from useless
                # (r11 A/B: zip's n=2 ratio swung 144% between sessions
                # while every n=3 ratio moved <= 24%); min still reports
                # best-of-`reps` for cross-round comparability
                runs, tail_ratio[name] = ratio_runs(timed, core_reps, ref_fn)
                timings[name] = round(min(runs[:reps]), 4)
                print(f"bench {name}: {timings[name]:.2f}s", file=sys.stderr, flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        total = round(sum(timings.values()), 4)
        core_total = round(sum(timings[n] for n in CORE_BENCH), 4)
        # The driver records only the LAST ~2000 chars of stdout
        # (BENCH_r9–r11 all landed parsed=null once this line outgrew
        # the capture — and a reordered-but-still-long line stays
        # unparseable because front-truncation removes the opening
        # brace). The stdout line therefore carries ONLY the
        # spec-required fields plus the comparable totals; the bulky
        # medians/ratios/notes go to bench_detail.json next to this
        # script (committed each round as the canonical detail record).
        line = json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "unit": "sec",
                "value": total,
                # frozen 18-query set from BASELINE.md — the only total
                # comparable round-over-round and to the baseline 31.8 s;
                # its mins use plain consecutive runs (never interleaved)
                "core_total": core_total,
                "extended_total": round(total - core_total, 4),
                "reps": reps,
                "sf": sf_val,
                # per-query best-of-`reps` wall seconds (spec field)
                "queries": timings,
            }
        )
        if len(line) > 1900:  # keep the whole line inside the capture
            print(
                f"WARNING: bench stdout line {len(line)} chars — may "
                "exceed the driver's ~2000-char tail capture; trim the "
                "headliner list or move fields to bench_detail.json",
                file=sys.stderr,
            )
        print(line)
        detail = {
            # per-query medians over core_reps runs: a min that beats
            # its median by far flags a lucky run, not a faster query
            "core_median": core_median,
            "core_total_median": round(sum(core_median.values()), 4),
            # expensive-tail medians (same noise separation as core;
            # NOT part of any comparable total)
            "tail_median": tail_median,
            # weather-immune ratios: median(target)/median(ref) over
            # in-session A/B/A/B pairs — THE numbers to compare
            # round-over-round for everything >= 0.5 s. Ratio-set runs
            # interleave a reference before every target rep
            # (SETUP/TAIL since r11 with the q1 ref; WIDE since r12
            # with the q3 ref). Which mins carry interleaved context:
            # SETUP, TAIL_MEDIAN, and the EXTENDED wide-ratio entries
            # take their published mins FROM the interleaved runs — compare those
            # round-over-round via the ratios only (extended_total
            # shifts for measurement reasons r11->r12). CORE mins are
            # always plain consecutive runs (core queries in the wide
            # set earn their ratio from separate, discarded pairs), so
            # core_total stays baseline-comparable.
            "tail_ratio": tail_ratio,
            "ratio_ref": RATIO_REF,
            "wide_ratio": wide_ratio,
            "wide_ratio_ref": RATIO_WIDE_REF,
            "core_reps": core_reps,
            "queries": timings,
            "core_total": core_total,
            "value": total,
            "sf": sf_val,
        }
        # round-over-round mover report (VERDICT r12 item 7): compare this
        # run's weather-immune ratios against the COMMITTED
        # bench_detail.json (git HEAD — the stated cross-round comparison
        # basis) so adjudicating movers is mechanical. Goes in the detail
        # file + stderr, never the stdout line (which must stay <1900
        # chars for the driver's tail capture).
        detail["ratio_movers_vs_committed"] = _ratio_movers(detail)
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
        )
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
        print(f"detail written to {detail_path}", file=sys.stderr)
        if detail["ratio_movers_vs_committed"].get("movers"):
            print(
                "ratio movers >1.3x vs committed detail: "
                + json.dumps(detail["ratio_movers_vs_committed"]["movers"]),
                file=sys.stderr,
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
