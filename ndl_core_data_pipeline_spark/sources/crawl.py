"""Crawl-source operators (SURVEY §2.1 S9–S12): paged-API fan-out with a
rate-limited, retrying fetch — the reference's collection layer re-shaped
for a cluster.

Reference mechanics mapped:
- S9 offset batching (assets/gov_uk/assets.py:33-56,155-165: total/100
  pages, one Dagster partition each) → spark.range(n_batches) repartitioned
  one-offset-per-partition, fetched inside mapInPandas. Discovery (the one
  'how many pages?' probe) is a single driver-side call, as in the
  reference's sensor.
- S12 rate limiting (resources/api_client.py:38-48: sleep 1/rate before
  each request) → a token-bucket PER EXECUTOR SLOT with the global rate
  divided by the fan-out, so N parallel partitions still respect the
  site-wide budget. Retries: 3 attempts, exponential backoff with full
  jitter (gov_uk assets.py:26-31) around the injected fetch callable.
- F8 skip-if-exists (gov_uk assets.py:92-95) → left_anti join against the
  already-materialized key set.

The fetch callable is injected (url -> bytes/str); tests use local fakes —
the operator owns batching/limiting/retry/structure, not HTTP.
"""

from __future__ import annotations

import math
import random
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

BATCH_SIZE = 100  # assets/gov_uk/assets.py:22
DEFAULT_RATE = 10.0  # definitions.py:81,84
MAX_RETRIES = 3  # api_client.py:28-33 / gov_uk assets.py:26-31
BACKOFF_BASE_S = 2.0


class RateLimiter:
    """Token bucket: at most `rate` acquisitions/sec, burst of 1 —
    equivalent to the reference's sleep(1/rate)-before-request pacing."""

    def __init__(self, rate_per_second: float):
        self.min_interval = 1.0 / rate_per_second if rate_per_second else 0.0
        self._last = 0.0

    def acquire(self) -> None:
        if not self.min_interval:
            return
        now = time.monotonic()
        wait = self._last + self.min_interval - now
        if wait > 0:
            time.sleep(wait)
        self._last = time.monotonic()


def with_retry(fn: Callable[[], object], max_retries: int = MAX_RETRIES):
    """3 attempts, exponential backoff, full jitter (gov_uk assets.py:26-31)."""
    for attempt in range(max_retries):
        try:
            return fn()
        except Exception:
            if attempt == max_retries - 1:
                raise
            time.sleep(random.uniform(0, BACKOFF_BASE_S * (2**attempt)))


def offset_batches(spark: SparkSession, total: int, batch_size: int = BATCH_SIZE) -> DataFrame:
    """A5: ceil(total/batch) offsets as a DataFrame, one row per page —
    the fan-out skeleton (gov_uk assets.py:41-48)."""
    n = math.ceil(total / batch_size)
    return spark.range(n).selectExpr(
        "id AS batch_id", f"id * {batch_size} AS offset", f"{batch_size} AS batch_size"
    )


def fetch_offsets(
    batches: DataFrame,
    fetch_page: Callable[[int, int], list[dict]],
    schema: str,
    rate_per_second: float = DEFAULT_RATE,
) -> DataFrame:
    """S9+S12: run `fetch_page(offset, count)` for every batch row inside
    mapInPandas. One partition per batch mirrors the reference's
    partition-per-page; the per-task limiter gets the global rate divided
    by the number of concurrent tasks so the site-wide budget holds."""
    n_parts = max(batches.count(), 1)
    sc = batches.sparkSession.sparkContext
    slots = max(sc.defaultParallelism, 1)
    per_task_rate = rate_per_second / min(slots, n_parts) if rate_per_second else 0.0

    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        limiter = RateLimiter(per_task_rate)
        for pdf in iterator:
            for _, row in pdf.iterrows():
                limiter.acquire()
                records = with_retry(
                    lambda o=int(row["offset"]), c=int(row["batch_size"]): fetch_page(o, c)
                )
                if records:
                    out = pd.DataFrame.from_records(records)
                    out.insert(0, "batch_id", int(row["batch_id"]))
                    yield out

    return batches.repartition(n_parts, "batch_id").mapInPandas(
        run, f"batch_id BIGINT, {schema}"
    )


def skip_existing(work: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """F8: drop work items already materialized (left_anti on the key) —
    the idempotent re-crawl guard."""
    return work.join(existing.select(key).distinct(), key, "left_anti")


def parse_atom_page(xml_text: str) -> tuple[list[dict], str | None]:
    """Namespace-agnostic Atom page parse (legislation_gov_uk
    assets.py:75-95): every entry's (entry_id, title, updated, links[])
    plus the document-level rel='next' href (first match, as in the
    reference)."""
    import xml.etree.ElementTree as ET

    def local(tag: str) -> str:
        return tag.split("}", 1)[1] if "}" in tag else tag

    root = ET.fromstring(xml_text)
    entries: list[dict] = []
    for el in root.iter():
        if local(el.tag) != "entry":
            continue
        rec: dict = {"entry_id": None, "title": None, "updated": None, "links": []}
        for ch in el:
            name = local(ch.tag)
            if name in ("id", "title", "updated"):
                key = "entry_id" if name == "id" else name
                rec[key] = (ch.text or "").strip()
            elif name == "link" and ch.get("href"):
                rec["links"].append(ch.get("href"))
        entries.append(rec)
    next_url = None
    # direct children of the feed root only: root.iter() would also visit
    # <entry>-level links, and a paged entry collection's own rel='next'
    # must not derail the feed walk
    for el in root:
        if local(el.tag) == "link" and (el.get("rel") or "").lower() == "next":
            next_url = el.get("href")
            break
    return entries, next_url


def follow_next_links(
    spark: SparkSession,
    start_url: str,
    fetch_page: Callable[[str], str],
    schema: str,
    parse_page: Callable[[str], tuple[list[dict], str | None]] = parse_atom_page,
    max_pages: int = 10_000,
    rate_per_second: float = DEFAULT_RATE,
) -> DataFrame:
    """S-family: sequential rel='next' link walk (legislation_gov_uk
    assets.py:46-100). The walk is inherently serial — each page names
    its successor — so page DISCOVERY runs driver-side with the same
    rate limiting and retry as the distributed fetches; each page is one
    small feed request. The heavy per-entry document fetches then fan
    out across the cluster (fetch_offsets / mapInPandas over the
    returned frame) — at 100 TB the feed walk is metadata-only while
    the cluster does the byte-moving. Cycle-safe (seen-URL set) and
    page-capped; stops on an empty page like the reference."""
    limiter = RateLimiter(rate_per_second)
    url: str | None = start_url
    seen: set[str] = set()
    rows: list[dict] = []
    page_no = 0
    while url and page_no < max_pages and url not in seen:
        seen.add(url)
        limiter.acquire()
        page = with_retry(lambda u=url: fetch_page(u))
        if not page:
            break
        entries, url = parse_page(page)
        for e in entries:
            rows.append({"page_no": page_no, **e})
        page_no += 1
    return spark.createDataFrame(rows, f"page_no INT, {schema}")
