"""Native-accelerated chain file parse/serialize (ctypes wrapper).

Falls back to the pure-python codec when the library is unavailable.
Results are identical; tests enforce parity.
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import get_lib
from ..formats.chain import Chain


def parse_chain_text(data: bytes) -> "list[Chain] | None":
    """Parse a whole chain-file buffer natively; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    arr_p = lib.gat_chain_parse(data, len(data))
    try:
        arr = arr_p.contents
        err = bytes(arr.error).split(b"\0")[0]
        if err:
            raise ValueError(err.decode())
        n = arr.n_chains
        if n == 0:
            return []
        from ..utils.bigmem import big_copy
        scores = np.ctypeslib.as_array(arr.scores, shape=(n,)).copy()
        header = np.ctypeslib.as_array(arr.header_nums, shape=(n, 7)).copy()
        strands = np.ctypeslib.as_array(arr.q_strands, shape=(n,)).copy()
        name_offsets = np.ctypeslib.as_array(arr.name_offsets,
                                             shape=(2 * n + 1,)).copy()
        blob = ctypes.string_at(arr.name_blob, int(name_offsets[-1]))
        block_offsets = np.ctypeslib.as_array(arr.block_offsets,
                                              shape=(n + 1,)).copy()
        blocks = big_copy(np.ctypeslib.as_array(arr.blocks,
                                                shape=(arr.n_blocks, 4)))
    finally:
        lib.gat_chain_free(arr_p)

    chains = []
    for i in range(n):
        t_name = blob[name_offsets[2 * i]:name_offsets[2 * i + 1]].decode()
        q_name = blob[name_offsets[2 * i + 1]:name_offsets[2 * i + 2]].decode()
        h = header[i]
        chains.append(Chain(
            score=float(scores[i]), t_name=t_name, t_size=int(h[0]),
            t_start=int(h[1]), t_end=int(h[2]), q_name=q_name,
            q_size=int(h[3]), q_strand=chr(strands[i]),
            q_start=int(h[4]), q_end=int(h[5]), id=int(h[6]),
            blocks=blocks[block_offsets[i]:block_offsets[i + 1]]))
    return chains


def serialize_chains(chains: list[Chain]) -> "bytes | None":
    """Serialize chains natively (chainWrite-exact); None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(chains)
    # single flat generator pass beats per-row ndarray assignment ~4x
    scores = np.fromiter((c.score for c in chains), np.float64, n)
    header = np.fromiter(
        (v for c in chains
         for v in (c.t_size, c.t_start, c.t_end, c.q_size, c.q_start,
                   c.q_end, c.id)),
        np.int64, 7 * n).reshape(n, 7)
    strands = np.fromiter((ord(c.q_strand) for c in chains), np.uint8, n)
    # chain files repeat a handful of chrom names; encode each once
    enc: dict[str, bytes] = {}

    def _enc(s: str) -> bytes:
        b = enc.get(s)
        if b is None:
            b = enc[s] = s.encode()
        return b

    name_parts = [b""] * (2 * n)
    name_lens = np.zeros(2 * n, np.int64)
    for i, c in enumerate(chains):
        tn = _enc(c.t_name)
        qn = _enc(c.q_name)
        name_parts[2 * i] = tn
        name_parts[2 * i + 1] = qn
        name_lens[2 * i] = len(tn)
        name_lens[2 * i + 1] = len(qn)
    name_offsets = np.zeros(2 * n + 1, np.int64)
    np.cumsum(name_lens, out=name_offsets[1:])
    blob = b"".join(name_parts)
    block_offsets = np.zeros(n + 1, np.int64)
    np.cumsum(np.fromiter((c.n_blocks for c in chains), np.int64, n),
              out=block_offsets[1:])
    from ..utils.bigmem import big_empty
    if n:
        blocks = big_empty((int(block_offsets[-1]), 4), np.int64)
        for i, c in enumerate(chains):
            np.copyto(blocks[block_offsets[i]:block_offsets[i + 1]],
                      c.blocks)
    else:
        blocks = np.zeros((0, 4), np.int64)

    out_len = ctypes.c_int64()
    p = lib.gat_chain_serialize(
        n,
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        header.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        strands.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        name_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        blob,
        block_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(out_len))
    try:
        # copy into shared-mmap pages and hand back a memoryview: a bytes
        # object would pay the slow private-anon first touch twice
        out = big_empty(out_len.value, np.uint8)
        ctypes.memmove(out.ctypes.data, p, out_len.value)
        return memoryview(out).cast("B")
    finally:
        lib.gat_free_buffer(p)
