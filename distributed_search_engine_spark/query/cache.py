"""Q13: driver-side search-result cache (frontend/SearchEngine.java:21-23,
69-97, 618-626).

The reference keeps a size-bounded map from the normalized query string
(lowercase, trimmed) to the FULL materialized result list and serves every
page of a repeated query from it; when the map is full the "first" key is
evicted (HashMap iteration order — unspecified; we use insertion order,
i.e. FIFO, as the deterministic refinement, SURVEY §4 item 5).

This is deliberately a DRIVER-side cache of collected rows, exactly like
the reference's frontend: the cluster computes a query once, pagination is
free afterwards. It caches bounded top-k lists only — never DataFrames —
so its memory ceiling is max_size * k rows.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import SparkSession

from .engine import SearchIndex, search

MAX_CACHE_SIZE = 1000  # SearchEngine.java:23
PAGE_SIZE = 10


class CachedSearchEngine:
    def __init__(
        self,
        spark: SparkSession,
        index: SearchIndex,
        k: int = 200,
        mode: str = "reference",
        max_size: int = MAX_CACHE_SIZE,
        **search_kwargs,
    ):
        self.spark = spark
        self.index = index
        self.k = k
        self.mode = mode
        self.max_size = max_size
        self.search_kwargs = search_kwargs
        self._cache: OrderedDict[str, list] = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def cache_key(query: str) -> str:
        return query.lower().strip()  # SearchEngine.java:70

    def cached_result_count(self, query: str) -> int:
        """getCachedResultCount (SearchEngine.java:36-41): 0 if absent."""
        rows = self._cache.get(self.cache_key(query))
        return len(rows) if rows is not None else 0

    def _put(self, key: str, rows: list) -> None:
        if key not in self._cache and len(self._cache) >= self.max_size:
            self._cache.popitem(last=False)  # evict oldest (:620-623)
        self._cache[key] = rows

    def search_page(self, query: str, page: int = 1, page_size: int = PAGE_SIZE) -> list:
        """Rows for one result page; computes + caches the full top-k list
        on a miss, slices the cached list on a hit (:75-96)."""
        key = self.cache_key(query)
        if key in self._cache:
            self.hits += 1
        else:
            self.misses += 1
            rows = search(
                self.spark, self.index, query, k=self.k, mode=self.mode,
                **self.search_kwargs,
            ).collect()
            self._put(key, rows)
        cached = self._cache[key]
        if page < 1:
            return []  # pages are 1-based; negatives would slice from the end
        start = (page - 1) * page_size
        if start >= len(cached):
            return []  # page beyond available results (:87-89)
        return list(cached[start : start + page_size])
