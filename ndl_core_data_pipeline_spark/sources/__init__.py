from .crawl import RateLimiter, fetch_offsets, offset_batches, skip_existing
from .pdfs import scan_pdfs

__all__ = [
    "RateLimiter",
    "fetch_offsets",
    "offset_batches",
    "scan_pdfs",
    "skip_existing",
]
