"""Stage 2: docs batches -> flat posting rows (term, doc_id, tf, dl, part).

Per-batch PARTIAL aggregation (polars explode + group_by) collapses repeated
terms to (doc, term, tf) before the all-to-all shuffle — the combiner pattern
from SURVEY.md §4 'Skew'. Routing key `part` = shard(term) * num_salts +
doc_id % num_salts: the salt splits a Zipf-head term's postings across
`num_salts` groups so no single groupby key exceeds worker memory
(north_rule: 'salted to defuse Zipfian term skew'). Segments of one term are
doc-disjoint (doc_id mod), so query-time union is concatenation, and total df
is the sum of segment dfs.

Stateful: the term -> shard hash cache persists across batches (actor pool).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv1a64

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
        ("part", pa.int32()),
    ]
)

# with store_positions: per-(term, doc) ascending occurrence positions
POSTINGS_POS_SCHEMA = POSTINGS_SCHEMA.append(
    pa.field("positions", pa.list_(pa.int32()))
)


_PROCESS_CACHE: dict = {}


def postings_flat_fn(batch: pa.Table, num_shards: int, num_salts: int,
                     positions: bool = False) -> pa.Table:
    """Stateless-task form with a per-worker-process instance cache (the term ->
    shard hash cache persists across batches in the same worker; same rationale
    as stages/extract_tokenize.extract_tokenize_fn)."""
    key = (num_shards, num_salts, positions)
    inst = _PROCESS_CACHE.get(key)
    if inst is None:
        inst = _PROCESS_CACHE[key] = PostingsFlat(num_shards, num_salts,
                                                  positions=positions)
    return inst(batch)


class PostingsFlat:
    def __init__(self, num_shards: int, num_salts: int = 1, *,
                 positions: bool = False):
        self.num_shards = num_shards
        self.num_salts = num_salts
        self.positions = positions
        self._shard_cache: dict[str, int] = {}

    def _shards_for(self, terms: list[str]) -> np.ndarray:
        cache = self._shard_cache
        ns = self.num_shards
        out = np.empty(len(terms), dtype=np.int64)
        for i, t in enumerate(terms):
            s = cache.get(t)
            if s is None:
                s = fnv1a64(t) % ns
                cache[t] = s
            out[i] = s
        if len(cache) > 2_000_000:  # bound actor memory on huge vocabularies
            cache.clear()
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        if self.positions:
            df = pl.from_arrow(
                batch.select(["doc_id", "terms", "token_count", "term_positions"])
            )
            agg = (
                df.explode(["terms", "term_positions"])  # parallel lists
                .drop_nulls("terms")
                .rename({"terms": "term", "term_positions": "pos"})
                .group_by(["term", "doc_id"])
                .agg(
                    pl.len().alias("tf"),
                    pl.first("token_count").alias("dl"),
                    pl.col("pos").sort().alias("positions"),
                )
            )
        else:
            df = pl.from_arrow(batch.select(["doc_id", "terms", "token_count"]))
            agg = (
                df.explode("terms")
                .drop_nulls("terms")
                .rename({"terms": "term"})
                .group_by(["term", "doc_id"])
                .agg(pl.len().alias("tf"), pl.first("token_count").alias("dl"))
            )
        schema = POSTINGS_POS_SCHEMA if self.positions else POSTINGS_SCHEMA
        if agg.height == 0:
            return schema.empty_table()
        terms = agg["term"].to_list()
        doc_ids = agg["doc_id"].to_numpy()
        shards = self._shards_for(terms)
        salts = doc_ids % self.num_salts if self.num_salts > 1 else np.zeros(
            len(doc_ids), dtype=np.int64
        )
        part = shards * self.num_salts + salts
        cols = {
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "tf": pa.array(agg["tf"].to_numpy().astype(np.int32), pa.int32()),
            "dl": pa.array(agg["dl"].to_numpy().astype(np.int32), pa.int32()),
            "part": pa.array(part.astype(np.int32), pa.int32()),
        }
        if self.positions:
            cols["positions"] = pa.array(agg["positions"].to_list(),
                                         pa.list_(pa.int32()))
        return pa.table(cols, schema=schema)
