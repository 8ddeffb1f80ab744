"""Near-duplicate detection pipelines (rows-only oracle: not SQL-expressible).

minhash_pairs: documents -> MinHash band rows (actor pool) -> groupby(band,
band_hash) -> candidate pairs -> exact n-gram Jaccard verification.
The verification side table (doc texts for candidate ids) is fetched with a
targeted filtered read — candidates are a tiny fraction of the corpus, and at
cluster scale this read is a semi-join via broadcast candidate-id set.

simhash_sigs: per-doc 64-bit SimHash + 16-bit bands for bucketing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.dedup import MinHasher, SimHasher, jaccard, lsh_candidate_pairs


def _documents(sf_dir: str):
    import os

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def minhash_pairs(sf_dir: str, threshold: float = 0.6,
                  max_verify: int = 100_000):
    """-> (a, b, jaccard) verified near-dup pairs.

    max_verify bounds the exact-verification stage; when the candidate set
    exceeds it the drop is REPORTED (never silent) — a corpus that floods LSH
    at 8 rows/band is mostly duplicates and wants a higher band threshold."""
    import os

    band_rows = _documents(sf_dir).map_batches(
        MinHasher, batch_format="pyarrow", batch_size=1024, concurrency=2
    )
    cand = (
        band_rows.groupby(["band", "band_hash"])
        .map_groups(lsh_candidate_pairs, batch_format="pyarrow")
        .take_all()
    )
    pairs = sorted({(r["a"], r["b"]) for r in cand})
    if len(pairs) > max_verify:
        print(
            f"[minhash_pairs] candidate set {len(pairs)} exceeds max_verify="
            f"{max_verify}; verifying the first {max_verify} (raise bands/rows "
            "per band for a self-similar corpus)"
        )
        pairs = pairs[:max_verify]
    if not pairs:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    ids = sorted({x for p in pairs for x in p})
    # targeted filtered read of candidate texts (semi-join via broadcast id set)
    t = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(ids),
    ).to_pandas()
    texts = dict(zip(t["doc_id"], t["text"]))
    # each doc appears in many pairs: compute its shingle set ONCE
    from ..stages.dedup import _shingle_hashes

    shingles = {d: set(_shingle_hashes(txt).tolist()) for d, txt in texts.items()}
    out_a, out_b, out_j = [], [], []
    for a, b in pairs:
        sa, sb = shingles[a], shingles[b]
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 1.0
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round(j, 6))
    return pa.table(
        {
            "a": pa.array(out_a, pa.int64()),
            "b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(np.asarray(out_j, dtype=np.float64)),
        }
    )


def simhash_sigs(sf_dir: str):
    """-> (doc_id, simhash, band0..band3) per document."""
    return _documents(sf_dir).map_batches(
        SimHasher, batch_format="pyarrow", batch_size=1024, concurrency=2
    )


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.9,
                            nbits: int = 10):
    """Embedding-cosine near-dup: random-hyperplane LSH buckets (one pass)
    -> within-bucket exact cosine verification -> (a, b, cos) pairs.

    The bucket groupby is the only shuffle; bucket population is bounded by
    the hyperplane count (2^nbits buckets). Verification reads only candidate
    vectors (tiny)."""
    import os

    import pyarrow.parquet as pq

    from ..stages.ann import LshBucketAssign

    path = os.path.join(sf_dir, "embeddings.parquet")
    dim = len(pq.read_table(path, columns=["embedding"])["embedding"][0])
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    bucketed = ds.map_batches(
        LshBucketAssign,
        fn_constructor_kwargs={"dim": dim, "nbits": nbits},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=2,
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_pylist()
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        mat = np.asarray(group["embedding"].combine_chunks().values,
                         dtype=np.float64).reshape(len(ids), -1)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        out_a, out_b, out_c = [], [], []
        order = np.argsort(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ii, jj = order[i], order[j]
                c = sims[ii, jj]
                if c >= threshold:
                    out_a.append(int(ids[ii]))
                    out_b.append(int(ids[jj]))
                    out_c.append(round(float(c), 6))
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "cos": pa.array(out_c, pa.float64())})

    out = bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    t = out.to_arrow_refs()
    import pyarrow as _pa

    tables = [x for x in ray.get(t)]
    tables = [x for x in tables if x.num_rows] or [
        _pa.table({"a": _pa.array([], _pa.int64()), "b": _pa.array([], _pa.int64()),
                   "cos": _pa.array([], _pa.float64())})
    ]
    return _pa.concat_tables(tables)  # concrete table => schema survives empty results


def lang_id(sf_dir: str):
    from ..stages.text_stats import LangId

    return _documents(sf_dir).map_batches(
        LangId, batch_format="pyarrow", batch_size=1024, concurrency=2
    )
