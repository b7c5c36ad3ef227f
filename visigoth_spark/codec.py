"""Posting-list codec: delta + varbyte compression, skip pointers, block-max
metadata. Pure numpy — runs vectorized inside applyInPandas encode kernels and
query-time decode kernels (north_star: no per-row Python).

The reference keeps postings as plain ``[]int`` in memory
(``index_memory_index.go:17``); compression/skip/block-max are design targets
from BASELINE.json.north_rule, not reference behavior. Patterns follow the
public literature (block-max indexes / list-intersection, PAPERS.md).

Layout (little-endian throughout):
- ``blob``: three back-to-back varbyte streams — docid deltas (first value is
  the absolute first docid, or the delta from ``base`` when encoding a
  follow-on segment), term frequencies, per-doc analyzed lengths. A 16-byte
  header carries n_postings and the byte offsets of streams 2 and 3.
- ``skips``: one fixed-width record per block of BLOCK_SIZE postings:
  (last_docid:i8, off_ids:u4, off_tfs:u4, off_dls:u4, n:u4, max_tf:u4,
  min_dl:u4) where ``off_*`` are byte offsets of the block's first value
  within each stream. Block-max metadata is the raw pair (max_tf, min_dl):
  the BM25 tf-norm tf/(tf + k1*(1-b+b*dl/avgdl)) is increasing in tf and
  decreasing in dl, so norm(max_tf, min_dl, avgdl) computed at QUERY time
  (when avgdl is known) upper-bounds every posting in the block — this keeps
  the index build a single corpus scan (no pre-pass just to learn avgdl).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
BM25_K1 = 1.2
BM25_B = 0.75

_HEADER = np.dtype([("n", "<u4"), ("off_tfs", "<u4"), ("off_dls", "<u4"),
                    ("reserved", "<u4")])
SKIP_DTYPE = np.dtype(
    [("last_docid", "<i8"), ("off_ids", "<u4"), ("off_tfs", "<u4"),
     ("off_dls", "<u4"), ("n", "<u4"), ("max_tf", "<u4"), ("min_dl", "<u4")]
)


def tf_norm(tf, dl, avgdl: float):
    """BM25 tf-normalization tf/(tf + k1*(1-b+b*dl/avgdl)); numpy-friendly."""
    return tf / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / max(avgdl, 1e-9)))

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def vb_encode(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Varbyte-encode a uint64 array. Returns (bytes_u8, start_offsets_u4)
    where start_offsets[i] is the byte offset of value i."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    nb = np.ones(len(vals), dtype=np.int64)
    for t in _THRESHOLDS:
        nb += vals >= t
    offsets = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(nb, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    pos = offsets[:-1].copy()
    rem = vals.copy()
    for b in range(10):
        active = nb > b
        if not active.any():
            break
        idx = pos[active]
        cont = (nb[active] - 1) > b
        out[idx] = (rem[active] & np.uint64(0x7F)).astype(np.uint8) | (
            cont.astype(np.uint8) << 7
        )
        pos[active] += 1
        rem >>= np.uint64(7)
    return out, offsets[:-1].astype(np.uint32)


def vb_decode(buf: np.ndarray, n: int | None = None) -> np.ndarray:
    """Decode a varbyte stream (uint8 array) back to uint64 values."""
    buf = np.asarray(buf, dtype=np.uint8)
    if len(buf) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (buf & 0x80) == 0
    vid = np.zeros(len(buf), dtype=np.int64)
    vid[1:] = np.cumsum(is_last[:-1])
    starts_idx = np.nonzero(
        np.concatenate(([True], is_last[:-1]))
    )[0]
    pos_in_val = np.arange(len(buf), dtype=np.int64) - starts_idx[vid]
    n_vals = int(is_last.sum())
    vals = np.zeros(n_vals, dtype=np.uint64)
    contrib = (buf & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_val.astype(np.uint64)
    )
    np.add.at(vals, vid, contrib)
    if n is not None:
        assert n_vals == n, f"decoded {n_vals} values, expected {n}"
    return vals


def encode_segment(
    docids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    base: int = -1,
) -> tuple[bytes, bytes]:
    """Encode one posting segment (ascending unique docids). Returns
    (blob, skips). ``base`` anchors the first delta (-1 => store absolute
    first docid + 1 ... we store first delta as docid[0] - base with
    base=-1 so 0 is representable)."""
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    n = len(docids)
    assert n > 0
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(docids[0] - base)
    if n > 1:
        d = np.diff(docids)
        assert (d > 0).all(), "docids must be strictly ascending"
        deltas[1:] = d.astype(np.uint64)
    ids_b, ids_off = vb_encode(deltas)
    tfs_b, tfs_off = vb_encode(tfs.astype(np.uint64))
    dls_b, dls_off = vb_encode(doclens.astype(np.uint64))

    header = np.zeros(1, dtype=_HEADER)
    header["n"] = n
    header["off_tfs"] = len(ids_b)
    header["off_dls"] = len(ids_b) + len(tfs_b)
    blob = header.tobytes() + ids_b.tobytes() + tfs_b.tobytes() + dls_b.tobytes()

    # skip pointers + block-max
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    skips = np.zeros(n_blocks, dtype=SKIP_DTYPE)
    for i in range(n_blocks):
        lo = i * BLOCK_SIZE
        hi = min(n, lo + BLOCK_SIZE)
        skips[i]["last_docid"] = docids[hi - 1]
        skips[i]["off_ids"] = ids_off[lo]
        skips[i]["off_tfs"] = tfs_off[lo]
        skips[i]["off_dls"] = dls_off[lo]
        skips[i]["n"] = hi - lo
        skips[i]["max_tf"] = tfs[lo:hi].max()
        skips[i]["min_dl"] = doclens[lo:hi].min()
    return blob, skips.tobytes()


def decode_segment(
    blob: bytes, base: int = -1
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode -> (docids int64, tfs int64, doclens int64)."""
    header = np.frombuffer(blob[:16], dtype=_HEADER)[0]
    n = int(header["n"])
    body = np.frombuffer(blob, dtype=np.uint8, offset=16)
    off_tfs = int(header["off_tfs"])
    off_dls = int(header["off_dls"])
    deltas = vb_decode(body[:off_tfs], n)
    tfs = vb_decode(body[off_tfs:off_dls], n)
    dls = vb_decode(body[off_dls:], n)
    docids = np.cumsum(deltas.astype(np.int64)) + base
    return docids, tfs.astype(np.int64), dls.astype(np.int64)


def decode_skips(skips: bytes) -> np.ndarray:
    return np.frombuffer(skips, dtype=SKIP_DTYPE)


def decode_block(
    blob: bytes, skips_arr: np.ndarray, block_idx: int, base: int = -1
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random-access decode of one block using skip pointers."""
    header = np.frombuffer(blob[:16], dtype=_HEADER)[0]
    body = np.frombuffer(blob, dtype=np.uint8, offset=16)
    off_tfs_sec = int(header["off_tfs"])
    off_dls_sec = int(header["off_dls"])
    sk = skips_arr[block_idx]
    n_blk = int(sk["n"])
    # block byte ranges: from this block's offset to the next block's (or end)
    if block_idx + 1 < len(skips_arr):
        nxt = skips_arr[block_idx + 1]
        ids_end, tfs_end, dls_end = (
            int(nxt["off_ids"]), int(nxt["off_tfs"]), int(nxt["off_dls"])
        )
    else:
        ids_end = off_tfs_sec
        tfs_end = off_dls_sec - off_tfs_sec
        dls_end = len(body) - off_dls_sec
    deltas = vb_decode(body[int(sk["off_ids"]):ids_end], n_blk)
    tfs = vb_decode(
        body[off_tfs_sec + int(sk["off_tfs"]):off_tfs_sec + tfs_end], n_blk
    )
    dls = vb_decode(
        body[off_dls_sec + int(sk["off_dls"]):off_dls_sec + dls_end], n_blk
    )
    prev_last = (
        int(skips_arr[block_idx - 1]["last_docid"]) if block_idx > 0 else base
    )
    docids = np.cumsum(deltas.astype(np.int64)) + prev_last
    return docids, tfs.astype(np.int64), dls.astype(np.int64)
