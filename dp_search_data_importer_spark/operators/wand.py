"""Block-max WAND top-k over the compressed sharded index (SURVEY.md B5).

The fast query path: document-at-a-time WAND (Broder et al., CIKM 2003) with
block-max upper bounds (Ding & Suel, SIGIR 2011) — public algorithms; the
reference gets them for free from Elasticsearch/Lucene (``README.md:18``),
we implement them natively.

Distribution model (Elasticsearch-style): the index is doc-sharded, so WAND
runs *independently per shard* inside ``mapInPandas`` — each shard task sees
only the query terms' block lists for its doc slice, keeps a local top-k heap
with early termination, and emits ≤ k candidates per query. The global top-k
is the top-k of the shard winners (correct because the global top-k is a
subset of the union of shard top-ks). Shards are the parallelism axis: at
10^12 docs, more executors ⇒ more shards scanned concurrently; per-query
latency is the max shard time, not the sum.

Rank identity with the exact Catalyst scorer (operators/bm25.py):
- identical float64 BM25 formula;
- the heap orders candidates by (round(score, 4), -doc_id) — exactly the
  engine's published ranking — so boundary decisions can't diverge from the
  exact path's rounded ranking;
- pruning compares upper bounds against the rounded threshold minus a margin
  (half-ulp of the rounding + float slack), so summation-order noise can
  never drop a doc the exact path keeps.
Property-tested rank-identical in tests/test_wand.py.
"""

from __future__ import annotations

import heapq
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from dp_search_data_importer_spark.config import EngineConfig
from dp_search_data_importer_spark.operators.codec import decode_block

ROUND_DIGITS = 4
# a candidate with raw score s can still enter the heap if round(s) >= r0,
# i.e. s >= r0 - 5e-5; add float slack on top.
_MARGIN = 0.5 * 10 ** (-ROUND_DIGITS) + 1e-9

_MAX_DOC = np.iinfo(np.int64).max


class _TermCursor:
    """Cursor over one term's doc_id-sorted block list within a shard.

    Blocks decode lazily: ``next_geq`` hops whole blocks via their
    ``first_doc_id`` bounds without decoding — the core WAND saving.
    """

    __slots__ = ("blocks", "firsts", "idf", "k1", "b", "avgdl", "bi", "pos",
                 "doc_ids", "scores", "cur_doc", "global_ub")

    def __init__(self, blocks: list[tuple], idf: float, k1: float, b: float,
                 avgdl: float):
        # blocks: [(first_doc_id, n_docs, gaps, tfs, dls, ub_norm)] sorted;
        # ub_norm was assembled from the block's impact pairs with the
        # query-time avgdl (wand_partition)
        self.blocks = blocks
        self.firsts = np.array([blk[0] for blk in blocks], dtype=np.int64)
        self.idf = idf
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.bi = 0
        self.doc_ids: np.ndarray | None = None
        self.scores: np.ndarray | None = None
        self.pos = 0
        self.cur_doc = blocks[0][0] if blocks else _MAX_DOC
        self.global_ub = idf * max(blk[5] for blk in blocks) if blocks else 0.0

    def _decode(self) -> None:
        _, _, gaps, tfs_b, dls_b, _ = self.blocks[self.bi]
        doc_ids, tfs, dls = decode_block(gaps, tfs_b, dls_b)
        tfd = tfs.astype(np.float64)
        self.doc_ids = doc_ids
        self.scores = self.idf * tfd * (self.k1 + 1.0) / (
            tfd + self.k1 * ((1.0 - self.b)
                             + self.b * dls.astype(np.float64) / self.avgdl)
        )

    def exhausted(self) -> bool:
        return self.cur_doc == _MAX_DOC

    def block_max_for(self, target: int) -> float:
        """Upper bound of this term's contribution to doc ``target``: the max
        of the block that could contain it (no decode, no cursor mutation)."""
        j = int(np.searchsorted(self.firsts, target, side="right")) - 1
        if j < self.bi:
            j = self.bi
        if j >= len(self.blocks):
            return 0.0
        return self.idf * self.blocks[j][5]

    def score_current(self) -> float:
        if self.doc_ids is None:
            self._decode()
        return float(self.scores[self.pos])

    def advance(self) -> None:
        if self.doc_ids is None:
            self._decode()
        self.pos += 1
        if self.pos >= len(self.doc_ids):
            self._next_block()
        else:
            self.cur_doc = int(self.doc_ids[self.pos])

    def _next_block(self) -> None:
        self.bi += 1
        self.doc_ids = self.scores = None
        self.pos = 0
        self.cur_doc = self.blocks[self.bi][0] if self.bi < len(self.blocks) else _MAX_DOC

    def next_geq(self, target: int) -> None:
        """Skip to the first posting with doc_id >= target."""
        while self.bi < len(self.blocks):
            nxt_first = (
                int(self.firsts[self.bi + 1])
                if self.bi + 1 < len(self.firsts) else _MAX_DOC
            )
            if self.doc_ids is None and nxt_first <= target:
                # whole current block below target: hop without decoding
                self._next_block()
                continue
            if self.doc_ids is None:
                self._decode()
            self.pos += int(np.searchsorted(self.doc_ids[self.pos:], target))
            if self.pos < len(self.doc_ids):
                self.cur_doc = int(self.doc_ids[self.pos])
                return
            self._next_block()


def wand_shard_topk(
    term_blocks: dict[str, list[tuple]],
    idfs: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
) -> list[tuple[int, float]]:
    """Block-max WAND over one shard for one query → local top-k
    [(doc_id, raw_score)]."""
    cursors = [
        _TermCursor(blks, idfs[t], k1, b, avgdl)
        for t, blks in term_blocks.items() if blks and t in idfs
    ]
    cursors = [c for c in cursors if not c.exhausted()]
    if not cursors:
        return []
    # heap entries: (rounded_score, -doc_id, raw_score); min-heap on first two
    heap: list[tuple[float, int, float]] = []
    threshold = -math.inf  # rounded kth-best

    while True:
        cursors.sort(key=lambda c: c.cur_doc)
        while cursors and cursors[-1].exhausted():
            cursors.pop()
        if not cursors:
            break
        # pivot: first cursor where cumulative global UBs could reach threshold
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(cursors):
            acc += c.global_ub
            if acc > threshold - _MARGIN:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # even all terms together can't reach the heap
        pivot_doc = cursors[pivot_i].cur_doc
        # block-max refinement over the blocks that could contain pivot_doc
        block_ub = 0.0
        for c in cursors:
            if c.cur_doc > pivot_doc:
                break
            block_ub += c.block_max_for(pivot_doc)
        if len(heap) >= k and block_ub <= threshold - _MARGIN:
            # nothing at or below pivot_doc can enter the heap: skip past it
            for c in cursors:
                if c.cur_doc <= pivot_doc:
                    c.next_geq(pivot_doc + 1)
                    break  # advancing one cursor guarantees progress
            continue
        if cursors[0].cur_doc == pivot_doc:
            # all cursors at pivot (sorted ⇒ equal prefix): evaluate fully
            raw = 0.0
            for c in cursors:
                if c.cur_doc == pivot_doc:
                    raw += c.score_current()
                    c.advance()
            entry = (round(raw, ROUND_DIGITS), -pivot_doc, raw)
            if len(heap) < k:
                heapq.heappush(heap, entry)
                if len(heap) == k:
                    threshold = heap[0][0]
            elif entry[:2] > heap[0][:2]:
                heapq.heapreplace(heap, entry)
                threshold = heap[0][0]
        else:
            # align leading cursors up to the pivot
            for c in cursors:
                if c.cur_doc < pivot_doc:
                    c.next_geq(pivot_doc)
    return [(-nd, raw) for _, nd, raw in heap]


def wand_partition(
    pdfs: Iterator[pd.DataFrame],
    queries: dict[int, list[str]],
    idfs: dict[str, float],
    k: int,
    cfg: EngineConfig,
    avgdl: float,
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: input partition = block rows of one or more whole
    shards (candidate terms only); output = per-(query, shard) local top-k
    rows (query_id, doc_id, score=raw)."""
    frames = list(pdfs)
    if not frames:
        return
    pdf = pd.concat(frames, ignore_index=True)

    def ub_norm(imp_tfs, imp_dls) -> float:
        # block upper bound from impact pairs, with the CURRENT avgdl —
        # the avgdl-free block metadata is what makes incremental shard
        # upserts sound (see build_index.block_impacts)
        t = np.asarray(imp_tfs, dtype=np.float64)
        d = np.asarray(imp_dls, dtype=np.float64)
        return float(np.max(
            t * (cfg.k1 + 1.0)
            / (t + cfg.k1 * ((1.0 - cfg.b) + cfg.b * d / avgdl))
        ))

    for shard in pdf["shard"].unique():
        sp = pdf[pdf["shard"] == shard]
        by_term: dict[str, list[tuple]] = {}
        for t, grp in sp.groupby("term"):
            grp = grp.sort_values("first_doc_id")
            by_term[t] = list(
                zip(grp["first_doc_id"].astype(int), grp["n_docs"].astype(int),
                    grp["doc_gaps"], grp["tfs"], grp["dls"],
                    (ub_norm(it, id_) for it, id_ in
                     zip(grp["imp_tfs"], grp["imp_dls"])))
            )
        out_q, out_d, out_s = [], [], []
        for qid, terms in queries.items():
            tb = {t: by_term[t] for t in terms if t in by_term}
            if not tb:
                continue
            for doc_id, score in wand_shard_topk(tb, idfs, k, cfg.k1, cfg.b, avgdl):
                out_q.append(qid)
                out_d.append(doc_id)
                out_s.append(score)
        if out_q:
            yield pd.DataFrame(
                {"query_id": pd.Series(out_q, dtype="int64"),
                 "doc_id": pd.Series(out_d, dtype="int64"),
                 "score": pd.Series(out_s, dtype="float64")}
            )
