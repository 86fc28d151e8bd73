"""Codec golden bytes + round-trip/property tests (FIXTURES.md §5)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dp_search_data_importer_spark.operators.codec import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    varint_decode,
    varint_encode,
)


def test_varint_golden_bytes():
    # FIXTURES.md §5: gaps [3, 4, 253] → 03 04 FD 01
    assert varint_encode(np.array([3, 4, 253], dtype=np.uint64)) == bytes.fromhex(
        "0304fd01"
    )
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([], dtype=np.uint64)) == b""


def test_varint_max_u64():
    v = np.array([2**64 - 1, 2**63, 1], dtype=np.uint64)
    assert (varint_decode(varint_encode(v)) == v).all()


def test_delta_golden():
    ids = np.array([3, 7, 260], dtype=np.int64)
    gaps = delta_encode(ids)
    # first gap is biased absolute; subsequent are plain gaps
    assert gaps[1] == 4 and gaps[2] == 253
    assert (delta_decode(gaps) == ids).all()


def test_delta_negative_ids():
    """xxhash64 doc_ids span the full signed range."""
    ids = np.array([-(2**63), -5, 0, 7, 2**63 - 1], dtype=np.int64)
    assert (delta_decode(delta_encode(ids)) == ids).all()


def test_block_roundtrip_golden_sizes():
    ids = np.arange(0, 128 * 3, 3, dtype=np.int64)  # 128 docs, gap 3
    tfs = np.ones(128, dtype=np.int64)
    dls = np.full(128, 100, dtype=np.int64)
    g, t, d = encode_block(ids, tfs, dls)
    # 127 single-byte gaps + 10-byte biased first gap
    assert len(t) == 128  # tf-1 = 0 → 1 byte each
    rid, rtf, rdl = decode_block(g, t, d)
    assert (rid == ids).all() and (rtf == tfs).all() and (rdl == dls).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=0, max_size=300, unique=True)
)
def test_block_roundtrip_property(ids):
    ids = np.sort(np.array(ids, dtype=np.int64))
    n = len(ids)
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 10_000, n).astype(np.int64)
    dls = rng.integers(1, 100_000, n).astype(np.int64)
    rid, rtf, rdl = decode_block(*encode_block(ids, tfs, dls))
    assert (rid == ids).all() and (rtf == tfs).all() and (rdl == dls).all()


def test_compression_ratio_dense():
    """Dense postings must compress well below 8 bytes/doc."""
    ids = np.sort(np.random.default_rng(1).choice(10**6, 10**5, replace=False)).astype(np.int64)
    g, t, d = encode_block(ids, np.ones(len(ids), dtype=np.int64),
                           np.full(len(ids), 50, dtype=np.int64))
    assert len(g) / len(ids) < 2.0  # avg gap ~10 → 1 byte + bias overhead


# ---------------------------------------------------------------------------
# round 3: in-block position streams (Lucene .prx-style)
# ---------------------------------------------------------------------------

def test_positions_roundtrip_and_golden():
    import numpy as np

    from dp_search_data_importer_spark.operators.codec import (
        decode_positions,
        encode_positions,
        varint_decode,
    )

    # posting 0: [3, 7, 260]; posting 1: [0]; posting 2: [5, 6]
    flat = np.array([3, 7, 260, 0, 5, 6], dtype=np.int64)
    tfs = np.array([3, 1, 2], dtype=np.int64)
    buf = encode_positions(flat, tfs)
    # within-posting deltas, absolute at posting starts:
    # [3, 4, 253, 0, 5, 1] → varint
    assert list(varint_decode(buf)) == [3, 4, 253, 0, 5, 1]
    out = decode_positions(buf, tfs)
    assert list(out) == list(flat)

    # empty stream
    assert encode_positions(np.empty(0, dtype=np.int64), np.empty(0)) == b""
    assert len(decode_positions(b"", np.empty(0, dtype=np.int64))) == 0


def test_positions_roundtrip_random():
    import numpy as np

    from dp_search_data_importer_spark.operators.codec import (
        decode_positions,
        encode_positions,
    )

    rng = np.random.default_rng(42)
    for _ in range(20):
        n_postings = int(rng.integers(1, 40))
        tfs = rng.integers(1, 12, size=n_postings)
        parts = [np.sort(rng.choice(10_000, size=t, replace=False))
                 for t in tfs]
        flat = np.concatenate(parts).astype(np.int64)
        out = decode_positions(encode_positions(flat, tfs), tfs)
        assert np.array_equal(out, flat)


def test_encode_blocks_batch_equals_per_block():
    """The run-level batched encoder emits byte-identical (gaps, tfs, dls)
    streams to per-block encode_block for every block of a run — including
    negative (xxhash64) doc_ids, single-element blocks, and a ragged tail."""
    import numpy as np

    from dp_search_data_importer_spark.operators.codec import (
        encode_block,
        encode_blocks_batch,
    )

    rng = np.random.default_rng(11)
    for trial in range(60):
        n = int(rng.integers(1, 500))
        bs = int(rng.integers(1, 33))
        ids = np.sort(rng.choice(2 ** 62, size=n, replace=False)).astype(
            np.int64)
        if trial % 3 == 0:
            ids = ids - (1 << 62)
        tfs = rng.integers(1, 1000, size=n).astype(np.int64)
        dls = rng.integers(1, 100000, size=n).astype(np.int64)
        starts = np.arange(0, n, bs)
        g, t, d = encode_blocks_batch(ids, tfs, dls, starts, n)
        for bi, s in enumerate(starts):
            e = min(s + bs, n)
            g0, t0, d0 = encode_block(ids[s:e], tfs[s:e], dls[s:e])
            assert (g[bi], t[bi], d[bi]) == (g0, t0, d0), (trial, bi)
