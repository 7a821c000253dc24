from .crawl import RateLimiter, fetch_offsets, offset_batches, skip_existing

__all__ = ["RateLimiter", "fetch_offsets", "offset_batches", "skip_existing"]
