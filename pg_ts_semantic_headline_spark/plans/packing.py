"""Posting-list compression kernels: delta + varint encoding.

The global index stores postings both as columnar rows (the query-friendly
form Spark scans and prunes natively) and as packed per-(term, block) byte
payloads — delta-encoded docIDs, term frequencies and position arrays — the
"compressed per-partition posting lists" of the design. Blocks are
doc-contiguous (block_id = doc_id // block_span), which gives every block a
disjoint docID range plus a precomputed max BM25 impact: the metadata the
block-max pruning path uses to skip blocks at query time.

Layout of a packed payload (all varint, little 7-bit groups, MSB continue):
    n_docs,
    doc_delta[0..n),          # first is delta from block base doc
    tf[0..n),
    for each doc: n_positions, pos_delta[0..m)   # first is absolute-1
"""

from __future__ import annotations


def encode_varints(values, out: bytearray) -> None:
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError("varint requires non-negative integers")
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break


def decode_varints(buf: bytes, pos: int, count: int) -> tuple[list[int], int]:
    out = []
    for _ in range(count):
        shift = 0
        val = 0
        while True:
            b = buf[pos]
            pos += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        out.append(val)
    return out, pos


def pack_block(doc_ids, tfs, positions_lists, base_doc: int) -> bytes:
    """doc_ids must be sorted ascending and >= base_doc."""
    out = bytearray()
    encode_varints([len(doc_ids)], out)
    prev = base_doc
    deltas = []
    for d in doc_ids:
        deltas.append(d - prev)
        prev = d
    encode_varints(deltas, out)
    encode_varints(tfs, out)
    for poss in positions_lists:
        encode_varints([len(poss)], out)
        prev_p = 0
        pdeltas = []
        for p in poss:
            pdeltas.append(p - prev_p)
            prev_p = p
        encode_varints(pdeltas, out)
    return bytes(out)


def unpack_block(payload: bytes, base_doc: int):
    """Returns (doc_ids, tfs, positions_lists)."""
    (n,), pos = decode_varints(payload, 0, 1)
    deltas, pos = decode_varints(payload, pos, n)
    doc_ids = []
    cur = base_doc
    for d in deltas:
        cur += d
        doc_ids.append(cur)
    tfs, pos = decode_varints(payload, pos, n)
    positions_lists = []
    for _ in range(n):
        (m,), pos = decode_varints(payload, pos, 1)
        pdeltas, pos = decode_varints(payload, pos, m)
        cur_p = 0
        poss = []
        for p in pdeltas:
            cur_p += p
            poss.append(cur_p)
        positions_lists.append(poss)
    return doc_ids, tfs, positions_lists
