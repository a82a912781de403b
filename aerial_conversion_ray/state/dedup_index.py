"""Shared mutable dedup index — the one operator family the Dataset
API genuinely cannot express (build-brief §custom-operators: "a shared
mutable index"), implemented as SHARDED RAY ACTORS.

A streaming ingester needs membership state that outlives any one
batch: "have I seen this content hash before, and what is the winning
representative?".  A ``groupby`` answers that only after the whole
corpus is in flight; an index answers it AS ROWS ARRIVE, which is what
incremental / resumable ingestion needs.  The semantics here are
chosen to be ORDER-INDEPENDENT so parallel arrival races cannot change
the answer: per key the index keeps (min doc_id, copy count) — both
associative-commutative merges — so the final state equals the batch
``dedup_exact`` result (and its SQL oracle) no matter how Ray
schedules the ingest tasks.

Scale shape: the key space is hash-sharded across ``n_shards`` actors
(shard = h1 mod n); each actor holds its shard as SORTED int64 column
arrays and merges a batch with vectorized ``searchsorted`` +
``minimum``/``add`` — no per-key Python in the ingest path.  Memory
per actor is (distinct keys / n_shards) * 24 B; at 10^12 distinct
keys the same actor class shards across a cluster's aggregate RAM (or
swaps its tail to disk) — the INTERFACE is the point: callers stream
batches in and read the table out, never holding global state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
class DedupShard:
    """One hash shard of the index: sorted (h1, h2) key columns with
    per-key (min_id, count) values, merged vectorized per batch."""

    def __init__(self):
        self.h1 = np.empty(0, np.int64)
        self.h2 = np.empty(0, np.int64)
        self.min_id = np.empty(0, np.int64)
        self.count = np.empty(0, np.int64)

    @staticmethod
    def _sort_key(h1: np.ndarray, h2: np.ndarray):
        return np.lexsort((h2, h1))

    def ingest(self, h1: np.ndarray, h2: np.ndarray, ids: np.ndarray) -> int:
        """Merge one batch; returns the shard's current distinct count.
        Batch-internal duplicates reduce first (lexsort + reduceat),
        then one sorted merge against the shard state."""
        if len(h1) == 0:
            return len(self.h1)
        o = np.lexsort((ids, h2, h1))
        b1, b2, bi = h1[o], h2[o], ids[o]
        new = np.ones(len(b1), dtype=bool)
        new[1:] = (b1[1:] != b1[:-1]) | (b2[1:] != b2[:-1])
        starts = np.nonzero(new)[0]
        k1, k2 = b1[starts], b2[starts]
        kmin = bi[starts]  # ids sorted within key -> first is the min
        kcnt = np.diff(np.concatenate([starts, [len(b1)]])).astype(np.int64)

        # locate batch keys in the sorted state: h1 run by double
        # searchsorted, then scan the run for the h2 match — run length
        # is the state's h1-collision count (~1), so the loop is over a
        # tiny constant, never over rows
        lo = np.searchsorted(self.h1, k1, side="left")
        hi = np.searchsorted(self.h1, k1, side="right")
        match_pos = np.full(len(k1), -1, np.int64)
        width = hi - lo
        for off in range(int(width.max()) if len(width) else 0):
            m = (off < width) & (match_pos < 0)
            if not m.any():
                break
            p = lo[m] + off
            eq = self.h2[p] == k2[m]
            mp = match_pos[m]
            mp[eq] = p[eq]
            match_pos[m] = mp
        match = match_pos >= 0

        # update matched keys in place (associative: min / sum)
        mpos = match_pos[match]
        np.minimum.at(self.min_id, mpos, kmin[match])
        np.add.at(self.count, mpos, kcnt[match])

        # insert the new keys with one sorted merge
        if (~match).any():
            n1, n2 = k1[~match], k2[~match]
            nm, nc = kmin[~match], kcnt[~match]
            h1 = np.concatenate([self.h1, n1])
            h2 = np.concatenate([self.h2, n2])
            mi = np.concatenate([self.min_id, nm])
            ct = np.concatenate([self.count, nc])
            o2 = np.lexsort((h2, h1))
            self.h1, self.h2 = h1[o2], h2[o2]
            self.min_id, self.count = mi[o2], ct[o2]
        return len(self.h1)

    def dump(self) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(self.min_id),
                "n_copies": pa.array(self.count),
            }
        )


def make_index(n_shards: int) -> list:
    return [DedupShard.remote() for _ in range(n_shards)]
