"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) — the
paged-feed scan (SURVEY §2.1 S7/S9) as a REAL Spark datasource instead of
a driver-side fetch helper: `spark.read.format("paged_feed")` plans one
InputPartition per page range, so page fetches run ON EXECUTORS with
native Spark parallelism, predicate-independent retries, and the usual
DataFrame API on top.

The fetch layer here is the deterministic offline tier (synthesizes the
page payloads the reference's CKAN/ONS feeds return — same stub posture
as sources/crawl.py); a production deployment swaps `_fetch_page` for the
rate-limited HTTP fetcher in sources/crawl.py. The DataSource plumbing —
schema declaration, partition planning, per-partition iterators — is the
part under test and is exactly what a real feed needs at scale: 10k pages
become 10k partitions scheduled across the cluster, not a driver loop.

Reference: resources/crawlers (paged fetch loops); re-expressed
Spark-native per the engine brief.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


FEED_SCHEMA = "page INT, item_id BIGINT, title STRING, category STRING"
PAGE_SIZE = 25


def _fetch_page(page: int, page_size: int):
    """Deterministic offline page payload (the stubbed fetch tier)."""
    cats = ("health", "transport", "education", "environment")
    base = page * page_size
    for i in range(page_size):
        item = base + i
        yield (page, item, f"dataset-{item:06d}", cats[item % len(cats)])


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _positive_option(options, key: str, default: int) -> int:
    """Validate an integer option at PLANNING time with a usable message —
    range() inside partitions()/read() would otherwise surface a cryptic
    python-worker error (step=0) or silently plan zero partitions (<0)."""
    raw = options.get(key, str(default))
    try:
        value = int(raw)
    except (TypeError, ValueError):
        raise ValueError(f"option {key!r} must be an integer, got {raw!r}")
    if value < 1:
        raise ValueError(f"option {key!r} must be >= 1, got {value}")
    return value


class PagedFeedReader(DataSourceReader):
    def __init__(self, options):
        self.n_pages = _positive_option(options, "npages", 8)
        self.pages_per_part = _positive_option(options, "pagesperpartition", 2)
        self.page_size = _positive_option(options, "pagesize", PAGE_SIZE)

    def partitions(self):
        return [
            _PageRange(s, min(s + self.pages_per_part, self.n_pages))
            for s in range(0, self.n_pages, self.pages_per_part)
        ]

    def read(self, partition: _PageRange):
        for page in range(partition.start, partition.end):
            yield from _fetch_page(page, self.page_size)


class PagedFeedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "paged_feed"

    def schema(self):
        return FEED_SCHEMA

    def reader(self, schema):
        return PagedFeedReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PagedFeedDataSource)


# ------------------------------------------------- streaming feed source

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class PagedFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the paged feed: offsets are page numbers, each
    micro-batch reads `pagesPerBatch` new pages (bounded by `npages` for
    the offline tier — a live feed would advance as pages appear).
    Replay-safe: `readBetweenOffsets` re-fetches deterministically for
    recovery, and `commit` is where a live source would ack/cleanup."""

    def __init__(self, options):
        self.n_pages = _positive_option(options, "npages", 8)
        self.pages_per_batch = _positive_option(options, "pagesperbatch", 2)
        self.page_size = _positive_option(options, "pagesize", PAGE_SIZE)

    def initialOffset(self):
        return {"page": 0}

    def read(self, start):
        first = int(start["page"])
        last = min(first + self.pages_per_batch, self.n_pages)
        # a materialized list, not a generator: Spark pickles the returned
        # iterator to ship prefetched rows between planner threads
        rows = [
            row
            for page in range(first, last)
            for row in _fetch_page(page, self.page_size)
        ]
        return iter(rows), {"page": last}

    def readBetweenOffsets(self, start, end):
        for page in range(int(start["page"]), int(end["page"])):
            yield from _fetch_page(page, self.page_size)


class PagedFeedStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "paged_feed_stream"

    def schema(self):
        return FEED_SCHEMA

    def simpleStreamReader(self, schema):
        return PagedFeedStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(PagedFeedStreamDataSource)
