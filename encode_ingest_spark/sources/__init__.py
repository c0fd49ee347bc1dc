"""External source adapters (reference §2.1)."""

from .jdbc import file_backfill_requests, jdbc_scan
from .lookup import async_lookup

__all__ = ["jdbc_scan", "file_backfill_requests", "async_lookup"]
