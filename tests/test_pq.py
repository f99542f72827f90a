"""Product-quantization ANN (queries/similarity.py::ann_pq_topk): a full
independent numpy replay of the index — codebook build, per-subspace
encode (tie-break by codeword id), ADC table, top-k — must reproduce the
Spark result EXACTLY, because every step is fixed-point integer math."""

from __future__ import annotations

import numpy as np

from gridiron_spark.io.tables import load_table
from tests.conftest import SF_SMALL

_M, _SUBDIM, _K, _SCALE = 4, 16, 16, 1 << 20
_QUERY = 0
_TOP_K = 10


def _replay(vectors: dict[int, np.ndarray]) -> list[tuple[int, int]]:
    ids = sorted(vectors)
    cb = {m: [vectors[c][m * _SUBDIM:(m + 1) * _SUBDIM] for c in range(_K)]
          for m in range(_M)}
    q = vectors[_QUERY]
    dtable = np.array(
        [
            [int(((q[m * _SUBDIM:(m + 1) * _SUBDIM] - cb[m][c]) ** 2).sum())
             for c in range(_K)]
            for m in range(_M)
        ]
    )
    scored = []
    for vid in ids:
        if vid == _QUERY:
            continue
        adc = 0
        for m in range(_M):
            sub = vectors[vid][m * _SUBDIM:(m + 1) * _SUBDIM]
            dists = [int(((sub - cb[m][c]) ** 2).sum()) for c in range(_K)]
            code = int(np.argmin(dists))  # first min == smallest cid
            adc += dtable[m][code]
        scored.append((int(adc), vid))
    scored.sort()
    return [(vid, adc) for adc, vid in scored[:_TOP_K]]


def test_pq_topk_matches_numpy_replay(spark):
    vectors = {
        r["vec_id"]: np.floor(
            np.asarray(r["embedding"], dtype=np.float64) * _SCALE
        ).astype(np.int64)
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }

    from gridiron_spark.queries import catalog

    got = [
        (r["vec_id"], r["adc_dist"])
        for r in catalog()["ann_pq_topk"].spark_fn(spark, SF_SMALL).collect()
    ]
    assert got == _replay(vectors)


def test_adc_distances_sorted_and_nonnegative(spark):
    from gridiron_spark.queries import catalog

    rows = catalog()["ann_pq_topk"].spark_fn(spark, SF_SMALL).collect()
    assert len(rows) == _TOP_K
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)
    assert all(d >= 0 for d in dists)
    assert all(r["vec_id"] != _QUERY for r in rows)
