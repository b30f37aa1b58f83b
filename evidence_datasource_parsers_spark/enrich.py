"""External-enrichment pattern (SURVEY §2.15 D9/D10) — the key design point.

Reference shape (``common/ontology.py:16-94``, ``Pharmacogenetics.py:19-74``):
evidence rows carry (diseaseFromSource, diseaseFromSourceId) pairs that an
external service (OnToma / an LLM) maps to ontology ids.  The reference pulls
``distinct`` pairs to the driver, enriches with pandarallel + retries, caches
in a LUT file, and left-joins back null-safely.

This module keeps that shape but makes each leg explicit and testable:

    enriched = CachedEnricher(lookup_fn, cache_path)(df, key_cols)

  * distinct keys only — the external call is bounded by |keyset|, not |rows|;
  * file-backed cache (JSON) consulted before the lookup fn — re-runs are free;
  * join-back is ``eqNullSafe`` on every key with broadcast, fanning out 1:N
    mappings exactly like the reference (``common/ontology.py:87-94``).

At 100 TB the distinct keyset of a categorical enrichment column is typically
thousands of rows — driver-side enrichment is the *right* topology; what must
never happen is per-row RPC from executors, which this pattern structurally
prevents.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

from evidence_datasource_parsers_spark.operators.joins import enrich_join_back

LookupFn = Callable[[tuple], list[dict]]


class CachedEnricher:
    """Wraps a key→[enrichment dict] function with a JSON file cache.

    ``lookup_fn`` receives one key tuple and returns a list of enrichment
    dicts (empty list → no mapping; >1 → fan-out, reference J7 semantics).
    """

    def __init__(
        self,
        lookup_fn: LookupFn,
        value_fields: list[str],
        cache_path: str | None = None,
    ):
        self.lookup_fn = lookup_fn
        self.value_fields = value_fields
        self.cache_path = cache_path
        self._cache: dict[str, list[dict]] = {}
        if cache_path and os.path.exists(cache_path):
            with open(cache_path) as fh:
                self._cache = json.load(fh)
        self.calls = 0  # external-call counter (observability/testing)

    @staticmethod
    def _key(parts: tuple) -> str:
        return json.dumps(["\0null" if p is None else p for p in parts])

    def _lookup(self, parts: tuple) -> list[dict]:
        k = self._key(parts)
        if k not in self._cache:
            self.calls += 1
            self._cache[k] = self.lookup_fn(parts)
        return self._cache[k]

    def _flush(self) -> None:
        if self.cache_path:
            with open(self.cache_path, "w") as fh:
                json.dump(self._cache, fh)

    def __call__(self, df: DataFrame, key_cols: list[str]) -> DataFrame:
        fields_schema = ", ".join(
            f"`{c}` string" for c in (*key_cols, *self.value_fields)
        )

        def enrich(keys_df: DataFrame) -> DataFrame:
            spark = keys_df.sparkSession
            rows = []
            for r in keys_df.collect():
                parts = tuple(r[c] for c in key_cols)
                for hit in self._lookup(parts) or [{}]:
                    rows.append(
                        tuple(parts)
                        + tuple(hit.get(f) for f in self.value_fields)
                    )
            self._flush()
            return spark.createDataFrame(rows, fields_schema)

        return enrich_join_back(df, key_cols, enrich)
