"""Modern-writer HDF5 READ goldens (libver="latest" features).

VERDICT r7 #1: NETCDF4_CLASSIC files from current libhdf5/h5py default
to "modern" metadata — version-2 object headers, data layout v4 with
the five new chunk indexes, dense (fractal-heap) attribute and link
storage, filter pipeline v2.  The repo's writer NEVER emits these (it
keeps the v0/v1 shape), so write∘read round-trips cannot validate the
read path; instead every structure here is hand-assembled byte-by-byte
from the public HDF5 File Format Specification v3.0 (v2 B-trees
§III.A.2, fractal heaps §III.G, fixed arrays §III.H, extensible arrays
§III.I, data layout v4 §IV.A.2.i) — the same method as the CDF-5 byte
golden in test_netcdf.py.  Checksum fields are zero-filled: the reader
does not validate metadata checksums (documented posture; real files
carry Jenkins-lookup3 values the reader skips).

Reference parity target: the reference accepts any compliant
NETCDF4_CLASSIC file via netCDF4-python/libhdf5
(/root/reference/src/veranda/raster/native/netcdf.py:29,100-103).
"""

import struct
import zlib

import numpy as np
import pytest

from veranda_spark.functions.hdf5 import (
    UNDEF,
    _ds_encode,
    _dt_encode,
    h5_read,
)

# ---- builders (spec structures, independent of the module's writer) --------


class Blob:
    """Bump allocator over a bytearray with patch-by-address."""

    def __init__(self) -> None:
        self.buf = bytearray()

    def put(self, b: bytes) -> int:
        addr = len(self.buf)
        self.buf += b
        self.buf += b"\x00" * (-len(b) % 8)
        return addr

    def reserve(self, n: int) -> int:
        addr = len(self.buf)
        self.buf += b"\x00" * (n + (-n % 8))
        return addr

    def patch(self, addr: int, b: bytes) -> None:
        self.buf[addr:addr + len(b)] = b


def sb2(root: int, eof: int) -> bytes:
    """Superblock version 2 (spec §II): sig, version, sizes, flags,
    base, extension, EOF, root OH address, checksum."""
    return (
        b"\x89HDF\r\n\x1a\n"
        + bytes([2, 8, 8, 0])
        + struct.pack("<QQQQ", 0, UNDEF, eof, root)
        + b"\x00" * 4
    )


def oh2(msgs: list[tuple[int, bytes]]) -> bytes:
    """Version-2 object header: OHDR prefix (flags=0x02 → 4-byte chunk0
    size, no times, no creation-order tracking), 4-byte message headers
    (type, size, flags), trailing checksum.  Chunk-0 size covers the
    messages ONLY (libhdf5 semantics — excludes prefix and checksum)."""
    block = b"".join(
        bytes([t]) + struct.pack("<H", len(b)) + b"\x00" + b
        for t, b in msgs
    )
    return (
        b"OHDR" + bytes([2, 0x02]) + struct.pack("<I", len(block))
        + block + b"\x00" * 4
    )


def link_msg(name: str, oh_addr: int) -> bytes:
    """Link message (0x0006): version 1, flags 0 → 1-byte name length,
    hard link, no creation order/charset."""
    nb = name.encode()
    return bytes([1, 0, len(nb)]) + nb + struct.pack("<Q", oh_addr)


def attr_msg_v3(name: str, arr: np.ndarray) -> bytes:
    """Attribute message version 3 (what modern writers emit): no
    padding between name/datatype/dataspace, charset byte present."""
    nb = name.encode() + b"\x00"
    dt = _dt_encode(arr.dtype)
    ds = _ds_encode(arr.shape, None) if arr.ndim else _ds_encode((), None)
    head = struct.pack("<BBHHHB", 3, 0, len(nb), len(dt), len(ds), 0)
    return head + nb + dt + ds + arr.tobytes()


def layout_v4(cdims_with_elt: tuple, itype: int, addr: int,
              flags: int = 0, extra: bytes = b"") -> bytes:
    """Data Layout message v4, chunked: flags, dimensionality (rank+1,
    trailing element size — same in-memory struct as v3), 8-byte encoded
    dims, chunk indexing type, index-specific fields, address."""
    b = bytes([4, 2, flags, len(cdims_with_elt), 8])
    for d in cdims_with_elt:
        b += struct.pack("<Q", d)
    return b + bytes([itype]) + extra + struct.pack("<Q", addr)


def pipeline_v2(filter_ids: list[int]) -> bytes:
    """Filter pipeline message v2: NO name-length field for ids < 256."""
    b = bytes([2, len(filter_ids)])
    for fid in filter_ids:
        b += struct.pack("<HHH", fid, 0, 0)  # id, flags, 0 client values
    return b


def dataset_oh(blob: Blob, arr: np.ndarray, layout_body: bytes,
               extra_msgs: list[tuple[int, bytes]] | None = None) -> int:
    msgs = [
        (0x0001, _ds_encode(arr.shape, None)),
        (0x0003, _dt_encode(arr.dtype)),
        (0x0008, layout_body),
    ] + (extra_msgs or [])
    return blob.put(oh2(msgs))


class FileBlob(Blob):
    """Blob whose addresses are file-absolute (superblock reserved)."""

    def __init__(self) -> None:
        super().__init__()
        self.buf += b"\x00" * 48  # superblock v2 slot, patched at the end

    def finish(self, root_links: list[tuple[str, int]],
               root_msgs: list[tuple[int, bytes]] | None = None) -> bytes:
        root = self.put(oh2(
            [(0x0006, link_msg(n, a)) for n, a in root_links]
            + (root_msgs or [])
        ))
        self.patch(0, sb2(root, len(self.buf)))
        return bytes(self.buf)


# ---- v2 B-tree builders -----------------------------------------------------


def bthd(blob: Blob, btype: int, rec_size: int, depth: int,
         root_addr: int, root_nrec: int, total: int,
         node_size: int = 512) -> int:
    return blob.put(
        b"BTHD" + bytes([0, btype])
        + struct.pack("<IHHBB", node_size, rec_size, depth, 100, 40)
        + struct.pack("<QHQ", root_addr, root_nrec, total)
        + b"\x00" * 4
    )


def btlf(blob: Blob, btype: int, records: list[bytes]) -> int:
    return blob.put(
        b"BTLF" + bytes([0, btype]) + b"".join(records) + b"\x00" * 4
    )


# ---- fractal heap builder ---------------------------------------------------


def frhp(blob: Blob, objects: list[bytes], id_len: int,
         max_heap_bits: int = 40, width: int = 4, start_size: int = 512,
         max_direct: int = 65536, indirect_rows: int = 0,
         ) -> tuple[int, list[bytes]]:
    """Build a fractal heap holding ``objects`` → (header addr, heap
    IDs).  indirect_rows=0 → lone root direct block; >0 → root indirect
    block with that many rows of direct children, objects round-robined
    across the row-0/1 blocks."""
    off_size = (max_heap_bits + 7) // 8
    len_size = id_len - 1 - off_size
    dblock_hdr = 4 + 1 + 8 + off_size  # FHDB prefix (flags bit1 unset)
    ids: list[bytes] = []

    def managed_id(off: int, ln: int) -> bytes:
        return (bytes([0x00]) + off.to_bytes(off_size, "little")
                + ln.to_bytes(len_size, "little"))

    hdr_addr = blob.reserve(146)
    if indirect_rows == 0:
        img = bytearray(b"FHDB" + bytes([0]) + struct.pack("<Q", hdr_addr)
                        + (0).to_bytes(off_size, "little"))
        for ob in objects:
            ids.append(managed_id(len(img), len(ob)))
            img += ob
        assert len(img) <= start_size
        img += b"\x00" * (start_size - len(img))
        root_addr = blob.put(bytes(img))
        cur_rows = 0
    else:
        nblocks = indirect_rows * width
        # row r block size: start for r<2, start<<(r-1) beyond
        sizes = [start_size if r < 2 else start_size << (r - 1)
                 for r in range(indirect_rows)]
        block_offs = []
        off = 0
        for r in range(indirect_rows):
            for _c in range(width):
                block_offs.append(off)
                off += sizes[r]
        imgs = []
        for b0 in range(nblocks):
            imgs.append(bytearray(
                b"FHDB" + bytes([0]) + struct.pack("<Q", hdr_addr)
                + block_offs[b0].to_bytes(off_size, "little")
            ))
        for i, ob in enumerate(objects):
            tgt = i % nblocks
            ids.append(managed_id(block_offs[tgt] + len(imgs[tgt]), len(ob)))
            imgs[tgt] += ob
        child_addrs = []
        for b0 in range(nblocks):
            sz = sizes[b0 // width]
            assert len(imgs[b0]) <= sz
            imgs[b0] += b"\x00" * (sz - len(imgs[b0]))
            child_addrs.append(blob.put(bytes(imgs[b0])))
        root_addr = blob.put(
            b"FHIB" + bytes([0]) + struct.pack("<Q", hdr_addr)
            + (0).to_bytes(off_size, "little")
            + b"".join(struct.pack("<Q", a) for a in child_addrs)
            + b"\x00" * 4
        )
        cur_rows = indirect_rows

    total_obj = sum(len(o) for o in objects)
    hdr = (
        b"FRHP" + bytes([0])
        + struct.pack("<HHB", id_len, 0, 0)      # id len, no filters, flags
        + struct.pack("<I", 4096)                 # max managed object size
        + struct.pack("<QQ", 0, UNDEF)            # next huge id, huge btree
        + struct.pack("<QQ", 0, UNDEF)            # free space, fs manager
        + struct.pack("<QQQQ", total_obj, start_size, 0, len(objects))
        + struct.pack("<QQQQ", 0, 0, 0, 0)        # huge/tiny stats
        + struct.pack("<HQQ", width, start_size, max_direct)
        + struct.pack("<HH", max_heap_bits, 0)
        + struct.pack("<QH", root_addr, cur_rows)
        + b"\x00" * 4
    )
    assert len(hdr) == 146
    blob.patch(hdr_addr, hdr)
    return hdr_addr, ids


# ---- chunk index goldens ----------------------------------------------------


ARR = np.arange(6 * 4, dtype="<i4").reshape(6, 4)


def test_v4_single_chunk():
    blob = FileBlob()
    data = blob.put(ARR.tobytes())
    ds = dataset_oh(blob, ARR, layout_v4((6, 4, 4), 1, data))
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)


def test_v4_single_chunk_filtered():
    blob = FileBlob()
    comp = zlib.compress(ARR.tobytes(), 6)
    data = blob.put(comp)
    lay = layout_v4((6, 4, 4), 1, data, flags=0x02,
                    extra=struct.pack("<QI", len(comp), 0))
    ds = dataset_oh(blob, ARR, lay, [(0x000B, pipeline_v2([1]))])
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)


def test_v4_implicit():
    # 6x4 dataset, 2x4 chunks → 3 chunks laid out contiguously
    blob = FileBlob()
    base = blob.put(b"".join(ARR[r:r + 2].tobytes() for r in (0, 2, 4)))
    ds = dataset_oh(blob, ARR, layout_v4((2, 4, 4), 2, base))
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)


def test_v4_fixed_array_raw():
    # 6x4 dataset, 2x2 chunks → 3x2 grid, FAHD/FADB client 0
    blob = FileBlob()
    addrs = []
    for r in (0, 2, 4):
        for c in (0, 2):
            addrs.append(blob.put(np.ascontiguousarray(
                ARR[r:r + 2, c:c + 2]).tobytes()))
    hdr = blob.reserve(28)
    db = blob.put(
        b"FADB" + bytes([0, 0]) + struct.pack("<Q", hdr)
        + b"".join(struct.pack("<Q", a) for a in addrs) + b"\x00" * 4
    )
    blob.patch(hdr, b"FAHD" + bytes([0, 0, 8, 10])
               + struct.pack("<QQ", 6, db) + b"\x00" * 4)
    ds = dataset_oh(blob, ARR, layout_v4((2, 2, 4), 3, hdr, extra=b"\x0a"))
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)


def test_v4_fixed_array_filtered_with_missing_chunk():
    # client-1 entries carry (addr, size, mask); one UNDEF entry → fill
    blob = FileBlob()
    entries = []
    kept = {0: (0, 0), 1: (0, 2), 2: (2, 0), 4: (4, 0), 5: (4, 2)}
    for i in range(6):
        if i == 3:
            entries.append(struct.pack("<QII", UNDEF, 0, 0))
            continue
        r, c = kept[i]
        comp = zlib.compress(
            np.ascontiguousarray(ARR[r:r + 2, c:c + 2]).tobytes(), 6)
        a = blob.put(comp)
        entries.append(struct.pack("<QII", a, len(comp), 0))
    hdr = blob.reserve(28)
    db = blob.put(
        b"FADB" + bytes([0, 1]) + struct.pack("<Q", hdr)
        + b"".join(entries) + b"\x00" * 4
    )
    blob.patch(hdr, b"FAHD" + bytes([0, 1, 16, 10])
               + struct.pack("<QQ", 6, db) + b"\x00" * 4)
    fill = struct.pack("<B", 3) + struct.pack("<B", 0x20) \
        + struct.pack("<I", 4) + struct.pack("<i", -7)
    ds = dataset_oh(blob, ARR, layout_v4((2, 2, 4), 3, hdr, extra=b"\x0a"),
                    [(0x000B, pipeline_v2([1])), (0x0005, fill)])
    out = h5_read(blob.finish([("v", ds)]))
    want = ARR.copy()
    want[2:4, 2:4] = -7
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], want)


def _ea_file(n_chunks: int) -> tuple[bytes, np.ndarray]:
    """1-d int32 dataset of n_chunks·5 elements, chunk 5, extensible
    array with small creation params (ib_elmts=2, db_min_elmts=2,
    sb_min_ptrs=4, max_bits=32, page_bits=10).  Geometry per the H5EA
    super-block rule: sblk s holds 2^(s//2) data blocks of
    2^((s+1)//2)·2 elements; sblks 0-3 have their data-block pointers
    in the index block (2·(4-1)=6 slots), sblk 4+ go through EASB."""
    arr = np.arange(n_chunks * 5, dtype="<i4")
    blob = FileBlob()
    chunk_addr = [blob.put(arr[i * 5:(i + 1) * 5].tobytes())
                  for i in range(n_chunks)]
    max_bits, ib_elmts, db_min, sb_min_ptrs, page_bits = 32, 2, 2, 4, 10
    arr_off = (max_bits + 7) // 8
    hdr = blob.reserve(72)

    # super-block geometry (mirrors the spec rule, not the module code):
    # sblk s holds 2^s*db_min elements, so the table spans
    # 1 + (max_bits - log2(db_min)) entries (= libhdf5's hdr->nsblks)
    nsblks = 1 + (max_bits - (db_min.bit_length() - 1))
    geo = []  # (ndblks, nelmts, start_idx, start_dblk)
    si = sd = 0
    for s in range(nsblks):
        nd, ne = 1 << (s // 2), (1 << ((s + 1) // 2)) * db_min
        geo.append((nd, ne, si, sd))
        si += nd * ne
        sd += nd

    def elem(i: int) -> bytes:
        return struct.pack("<Q", chunk_addr[i] if i < n_chunks else UNDEF)

    # data blocks for sblks 0..3 (pointers live in the index block)
    ib_dblk_addrs = []
    for s in range(4):
        nd, ne, start, _sd = geo[s]
        for d in range(nd):
            lo = ib_elmts + start + d * ne
            img = (b"EADB" + bytes([0, 0]) + struct.pack("<Q", hdr)
                   + lo.to_bytes(arr_off, "little")
                   + b"".join(elem(lo + j) for j in range(ne))
                   + b"\x00" * 4)
            # unused slots (past the last chunk) stay UNDEF, no block
            ib_dblk_addrs.append(blob.put(img) if lo < n_chunks else UNDEF)
    # super block 4 via EASB when needed
    sblk_addrs = [UNDEF] * (nsblks - 4)
    nd4, ne4, start4, _ = geo[4]
    if n_chunks > ib_elmts + start4:
        dblks = []
        for d in range(nd4):
            lo = ib_elmts + start4 + d * ne4
            if lo >= n_chunks:
                dblks.append(UNDEF)
                continue
            img = (b"EADB" + bytes([0, 0]) + struct.pack("<Q", hdr)
                   + lo.to_bytes(arr_off, "little")
                   + b"".join(elem(lo + j) for j in range(ne4))
                   + b"\x00" * 4)
            dblks.append(blob.put(img))
        sblk_addrs[0] = blob.put(
            b"EASB" + bytes([0, 0]) + struct.pack("<Q", hdr)
            + (ib_elmts + start4).to_bytes(arr_off, "little")
            + b"".join(struct.pack("<Q", a) for a in dblks)
            + b"\x00" * 4
        )
    ib = blob.put(
        b"EAIB" + bytes([0, 0]) + struct.pack("<Q", hdr)
        + b"".join(elem(i) for i in range(ib_elmts))
        + b"".join(struct.pack("<Q", a) for a in ib_dblk_addrs)
        + b"".join(struct.pack("<Q", a) for a in sblk_addrs)
        + b"\x00" * 4
    )
    blob.patch(hdr, (
        b"EAHD" + bytes([0, 0, 8, max_bits, ib_elmts, db_min,
                         sb_min_ptrs, page_bits])
        + struct.pack("<QQQQQQ", 0, 0, 0, 0, n_chunks, n_chunks)
        + struct.pack("<Q", ib) + b"\x00" * 4
    ))
    lay = layout_v4((5, 4), 4, hdr,
                    extra=bytes([max_bits, ib_elmts, sb_min_ptrs,
                                 db_min, page_bits]))
    ds = dataset_oh(blob, arr, lay)
    return blob.finish([("v", ds)]), arr


def test_v4_extensible_array_index_block_and_dblocks():
    buf, arr = _ea_file(10)  # elements 0-1 in iblock, rest in sblk 0-2
    out = h5_read(buf)
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], arr)


def test_v4_extensible_array_through_super_block():
    buf, arr = _ea_file(40)  # indices 34+ resolved via an EASB
    out = h5_read(buf)
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], arr)


def test_v4_extensible_array_high_index_geometry():
    """Review r8 pass-1 #1 regression: with db_min=2/max_bits=32, chunk
    index ~131k maps to super block s=16 — beyond the first cut's
    halved geometry table (bare IndexError) yet still far below the
    1024-element paged gate.  A sparse EA (every pointer UNDEF) with
    max_index_set past that point must decode to all-fill, exercising
    the geometry walk at every super-block index up to s=16 (the old
    table topped out at s=15)."""
    n_chunks = (1 << 17) + 9  # u_max=131078 -> s=16, past the old table
    arr_len = n_chunks * 5
    blob = FileBlob()
    max_bits, ib_elmts, db_min, sb_min_ptrs, page_bits = 32, 2, 2, 4, 10
    nsblks = 1 + (max_bits - (db_min.bit_length() - 1))
    ib_nsblks = 2 * (sb_min_ptrs.bit_length() - 1)
    hdr = blob.reserve(72)
    ib = blob.put(
        b"EAIB" + bytes([0, 0]) + struct.pack("<Q", hdr)
        + struct.pack("<Q", UNDEF) * ib_elmts
        + struct.pack("<Q", UNDEF) * (2 * (sb_min_ptrs - 1))
        + struct.pack("<Q", UNDEF) * (nsblks - ib_nsblks)
        + b"\x00" * 4
    )
    blob.patch(hdr, (
        b"EAHD" + bytes([0, 0, 8, max_bits, ib_elmts, db_min,
                         sb_min_ptrs, page_bits])
        + struct.pack("<QQQQQQ", 0, 0, 0, 0, n_chunks, 0)
        + struct.pack("<Q", ib) + b"\x00" * 4
    ))
    lay = layout_v4((5, 4), 4, hdr,
                    extra=bytes([max_bits, ib_elmts, sb_min_ptrs,
                                 db_min, page_bits]))
    fill = bytes([3, 0x20]) + struct.pack("<I", 4) + struct.pack("<i", -7)
    arr = np.zeros(arr_len, dtype="<i4")
    ds = dataset_oh(blob, arr, lay, [(0x0005, fill)])
    out = h5_read(blob.finish([("v", ds)]))
    got = out["datasets"]["v"]["data"]
    assert got.shape == (arr_len,)
    assert (got == -7).all()


def test_v4_btree2_raw_depth0():
    blob = FileBlob()
    recs = []
    for gi, r in enumerate((0, 2, 4)):
        for gj, c in enumerate((0, 2)):
            a = blob.put(np.ascontiguousarray(ARR[r:r + 2, c:c + 2]).tobytes())
            recs.append(struct.pack("<QQQ", a, gi, gj))
    leaf = btlf(blob, 10, recs)
    hdr = bthd(blob, 10, 24, 0, leaf, len(recs), len(recs))
    lay = layout_v4((2, 2, 4), 5, hdr,
                    extra=struct.pack("<IBB", 512, 100, 40))
    ds = dataset_oh(blob, ARR, lay)
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)


def test_v4_btree2_raw_depth1_internal_node():
    """Depth-1 tree: 2 leaves under one internal node.  Child-pointer
    arithmetic: node 512, record 24 → leaf capacity (512-10)//24 = 20 →
    1-byte 'number of records' fields (independent recomputation of the
    libhdf5 sizing rule)."""
    blob = FileBlob()
    recs = []
    for gi, r in enumerate((0, 2, 4)):
        for gj, c in enumerate((0, 2)):
            a = blob.put(np.ascontiguousarray(ARR[r:r + 2, c:c + 2]).tobytes())
            recs.append(struct.pack("<QQQ", a, gi, gj))
    # in-order split: leaf0 = recs 0-1, pivot = rec 2, leaf1 = recs 3-5
    leaf0 = btlf(blob, 10, recs[0:2])
    leaf1 = btlf(blob, 10, recs[3:6])
    internal = blob.put(
        b"BTIN" + bytes([0, 10]) + recs[2]
        + struct.pack("<QB", leaf0, 2) + struct.pack("<QB", leaf1, 3)
        + b"\x00" * 4
    )
    hdr = bthd(blob, 10, 24, 1, internal, 1, len(recs))
    lay = layout_v4((2, 2, 4), 5, hdr,
                    extra=struct.pack("<IBB", 512, 100, 40))
    ds = dataset_oh(blob, ARR, lay)
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)


def test_v4_btree2_raw_depth2_cum_size_branch():
    """Depth-2 tree: exercises the 'total records in subtree' field
    that exists only in child pointers BELOW depth 1.  Independent
    sizing arithmetic (libhdf5's capacity rule, node 512 / record 24):
    leaf cap (512-10)//24 = 20 → nrec field 1 byte; depth-1 pointer =
    8+1 = 9 → depth-1 cap (512-19)//33 = 14 → cum max = 15·20+14 = 314
    → 2-byte totals in the root's child pointers."""
    blob = FileBlob()
    recs = []
    for gi, r in enumerate((0, 2, 4)):
        for gj, c in enumerate((0, 2)):
            a = blob.put(np.ascontiguousarray(ARR[r:r + 2, c:c + 2]).tobytes())
            recs.append(struct.pack("<QQQ", a, gi, gj))
    # in-order layout: [L00: r0] p=r1 [L01: r2]  ROOT r3  [L10: r4] p=r5 [L11: -]
    l00 = btlf(blob, 10, [recs[0]])
    l01 = btlf(blob, 10, [recs[2]])
    l10 = btlf(blob, 10, [recs[4]])
    l11 = btlf(blob, 10, [])
    i0 = blob.put(
        b"BTIN" + bytes([0, 10]) + recs[1]
        + struct.pack("<QB", l00, 1) + struct.pack("<QB", l01, 1)
        + b"\x00" * 4
    )
    i1 = blob.put(
        b"BTIN" + bytes([0, 10]) + recs[5]
        + struct.pack("<QB", l10, 1) + struct.pack("<QB", l11, 0)
        + b"\x00" * 4
    )
    root = blob.put(
        b"BTIN" + bytes([0, 10]) + recs[3]
        + struct.pack("<QBH", i0, 1, 3)   # addr + nrec(1B) + total(2B)
        + struct.pack("<QBH", i1, 1, 2)
        + b"\x00" * 4
    )
    hdr = bthd(blob, 10, 24, 2, root, 1, len(recs))
    lay = layout_v4((2, 2, 4), 5, hdr,
                    extra=struct.pack("<IBB", 512, 100, 40))
    ds = dataset_oh(blob, ARR, lay)
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)


def test_v4_btree2_filtered():
    blob = FileBlob()
    recs = []
    for gi, r in enumerate((0, 2, 4)):
        for gj, c in enumerate((0, 2)):
            comp = zlib.compress(
                np.ascontiguousarray(ARR[r:r + 2, c:c + 2]).tobytes(), 6)
            a = blob.put(comp)
            # type 11: addr(8) + size(4 here) + mask(4) + scaled offsets
            recs.append(struct.pack("<QIIQQ", a, len(comp), 0, gi, gj))
    leaf = btlf(blob, 11, recs)
    hdr = bthd(blob, 11, 32, 0, leaf, len(recs), len(recs))
    lay = layout_v4((2, 2, 4), 5, hdr,
                    extra=struct.pack("<IBB", 512, 100, 40))
    ds = dataset_oh(blob, ARR, lay, [(0x000B, pipeline_v2([1]))])
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)


# ---- dense attribute / link storage goldens ---------------------------------


def _attr_record(heap_id: bytes) -> bytes:
    # type-8: heap ID(8) + message flags(1) + corder(4) + name hash(4)
    return heap_id + b"\x00" + b"\x00" * 8


def test_dense_attributes_root_direct_block():
    blob = FileBlob()
    a1 = attr_msg_v3("scale", np.array(2.5, dtype="<f8"))
    a2 = attr_msg_v3("count", np.array(41, dtype="<i4"))
    a3 = attr_msg_v3("tbl", np.arange(3, dtype="<i8"))
    heap, ids = frhp(blob, [a1, a2, a3], id_len=8)
    leaf = btlf(blob, 8, [_attr_record(i) for i in ids])
    bt = bthd(blob, 8, 17, 0, leaf, 3, 3)
    ainfo = bytes([0, 0]) + struct.pack("<QQ", heap, bt)
    data = blob.put(ARR.tobytes())
    ds = dataset_oh(blob, ARR, layout_v4((6, 4, 4), 1, data),
                    [(0x0015, ainfo)])
    out = h5_read(blob.finish([("v", ds)]))
    at = out["datasets"]["v"]["attrs"]
    assert at["scale"] == 2.5
    assert at["count"] == 41
    np.testing.assert_array_equal(at["tbl"], np.arange(3))


def test_dense_attributes_root_indirect_heap():
    """Heap big enough that the root is an indirect block (2 rows × 4
    direct blocks) — objects round-robined across blocks so the
    doubling-table offset arithmetic is exercised across rows."""
    blob = FileBlob()
    msgs = [attr_msg_v3(f"a{i:02d}", np.array(i * 11, dtype="<i4"))
            for i in range(10)]
    heap, ids = frhp(blob, msgs, id_len=8, indirect_rows=2)
    leaf = btlf(blob, 8, [_attr_record(i) for i in ids])
    bt = bthd(blob, 8, 17, 0, leaf, len(ids), len(ids))
    ainfo = bytes([0, 0]) + struct.pack("<QQ", heap, bt)
    data = blob.put(ARR.tobytes())
    ds = dataset_oh(blob, ARR, layout_v4((6, 4, 4), 1, data),
                    [(0x0015, ainfo)])
    out = h5_read(blob.finish([("v", ds)]))
    at = out["datasets"]["v"]["attrs"]
    assert {k: v for k, v in at.items()} == {
        f"a{i:02d}": i * 11 for i in range(10)
    }


def test_dense_attributes_on_root_group():
    blob = FileBlob()
    msgs = [attr_msg_v3("title", np.frombuffer(b"demo\x00", dtype="S5")
                        .reshape(())[()])]
    heap, ids = frhp(blob, msgs, id_len=8)
    leaf = btlf(blob, 8, [_attr_record(i) for i in ids])
    bt = bthd(blob, 8, 17, 0, leaf, 1, 1)
    ainfo = bytes([0, 0]) + struct.pack("<QQ", heap, bt)
    data = blob.put(ARR.tobytes())
    ds = dataset_oh(blob, ARR, layout_v4((6, 4, 4), 1, data))
    out = h5_read(blob.finish([("v", ds)], root_msgs=[(0x0015, ainfo)]))
    assert out["attrs"]["title"] == "demo"


def test_dense_links():
    blob = FileBlob()
    arrs = {"x": np.arange(5, dtype="<i4"), "y": np.arange(7, dtype="<f8")}
    ds_addr = {}
    for n, a in arrs.items():
        data = blob.put(a.tobytes())
        ds_addr[n] = dataset_oh(
            blob, a, layout_v4(a.shape + (a.dtype.itemsize,), 1, data))
    lmsgs = [link_msg(n, ds_addr[n]) for n in arrs]
    heap, ids = frhp(blob, lmsgs, id_len=7)
    # type-5 record: name hash(4) + heap ID(7)
    leaf = btlf(blob, 5, [b"\x00" * 4 + i for i in ids])
    bt = bthd(blob, 5, 11, 0, leaf, len(ids), len(ids))
    linfo = bytes([0, 0]) + struct.pack("<QQ", heap, bt)
    root = blob.put(oh2([(0x0002, linfo)]))
    blob.patch(0, sb2(root, len(blob.buf)))
    out = h5_read(bytes(blob.buf))
    np.testing.assert_array_equal(out["datasets"]["x"]["data"], arrs["x"])
    np.testing.assert_array_equal(out["datasets"]["y"]["data"], arrs["y"])


def test_tiny_heap_id():
    """Tiny fractal-heap IDs pack the payload in the ID itself (type
    bits 0x20, low nibble = length-1).  No standard dense path fits a
    whole message into one ID, so exercise the heap reader directly."""
    from veranda_spark.functions.hdf5 import _fractal_heap_reader

    blob = FileBlob()
    heap, _ = frhp(blob, [b"managed"], id_len=8)
    get = _fractal_heap_reader(bytes(blob.buf), heap)
    assert get(bytes([0x20 | 4]) + b"hello\x00\x00") == b"hello"
    assert get(bytes([0x20 | 0]) + b"x" + b"\x00" * 6) == b"x"


# ---- gates + pipeline v2 ----------------------------------------------------


def test_v2_pipeline_shuffle_deflate():
    blob = FileBlob()
    raw = ARR.tobytes()
    n = len(raw) // 4
    shuffled = (np.frombuffer(raw, dtype="u1").reshape(n, 4).T.tobytes())
    comp = zlib.compress(shuffled, 6)
    data = blob.put(comp)
    lay = layout_v4((6, 4, 4), 1, data, flags=0x02,
                    extra=struct.pack("<QI", len(comp), 0))
    ds = dataset_oh(blob, ARR, lay, [(0x000B, pipeline_v2([2, 1]))])
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)


def test_v4_fixed_array_paged():
    """Paged FADB: page_bits=2 → 4 entries/page, 6 chunks → 2 pages.
    The block stores a page-init bitmap + its checksum, then the pages
    (entries + 4-byte page checksum each) contiguously after it."""
    blob = FileBlob()
    addrs = []
    for r in (0, 2, 4):
        for c in (0, 2):
            addrs.append(blob.put(np.ascontiguousarray(
                ARR[r:r + 2, c:c + 2]).tobytes()))
    hdr = blob.reserve(28)
    page0 = b"".join(struct.pack("<Q", a) for a in addrs[0:4]) + b"\x00" * 4
    page1 = b"".join(struct.pack("<Q", a) for a in addrs[4:6]) + b"\x00" * 4
    db = blob.put(
        b"FADB" + bytes([0, 0]) + struct.pack("<Q", hdr)
        + b"\xc0"          # page bitmap, H5VM MSB-first: pages 0+1 init
        + b"\x00" * 4      # block checksum
        + page0 + page1
    )
    blob.patch(hdr, b"FAHD" + bytes([0, 0, 8, 2])
               + struct.pack("<QQ", 6, db) + b"\x00" * 4)
    ds = dataset_oh(blob, ARR, layout_v4((2, 2, 4), 3, hdr, extra=b"\x02"))
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)


def test_v4_fixed_array_paged_uninit_page():
    """An uninitialized page (bitmap bit 0) holds no chunks → fill."""
    blob = FileBlob()
    addrs = []
    for r in (0, 2, 4):
        for c in (0, 2):
            addrs.append(blob.put(np.ascontiguousarray(
                ARR[r:r + 2, c:c + 2]).tobytes()))
    hdr = blob.reserve(28)
    page0 = b"".join(struct.pack("<Q", a) for a in addrs[0:4]) + b"\x00" * 4
    db = blob.put(
        b"FADB" + bytes([0, 0]) + struct.pack("<Q", hdr)
        + b"\x80"          # H5VM MSB-first: only page 0 initialized
        + b"\x00" * 4
        + page0            # page 1 never allocated
    )
    blob.patch(hdr, b"FAHD" + bytes([0, 0, 8, 2])
               + struct.pack("<QQ", 6, db) + b"\x00" * 4)
    fill = bytes([3, 0x20]) + struct.pack("<I", 4) + struct.pack("<i", -5)
    ds = dataset_oh(blob, ARR, layout_v4((2, 2, 4), 3, hdr, extra=b"\x02"),
                    [(0x0005, fill)])
    out = h5_read(blob.finish([("v", ds)]))
    want = ARR.copy()
    want[4:6, :] = -5  # chunks 4,5 (grid row 2) were in the dead page
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], want)


def test_v4_extensible_array_paged_super_block():
    """Paged EADB under an EASB: db_min=2/page_bits=3 puts super block
    5 (4 data blocks x 16 elements) past the 8-element page size, so
    its EASB carries a page-init bitmap (4 dblks x 2 pages) and its
    data blocks store pages + per-page checksums.  Chunks 64-69 live in
    dblk 0 / page 0; everything below stays UNDEF → fill."""
    n_chunks = 70
    arr = np.arange(n_chunks * 5, dtype="<i4")
    blob = FileBlob()
    max_bits, ib_elmts, db_min, sb_min_ptrs, page_bits = 32, 2, 2, 4, 3
    nsblks = 1 + (max_bits - (db_min.bit_length() - 1))
    ib_nsblks = 2 * (sb_min_ptrs.bit_length() - 1)
    arr_off = (max_bits + 7) // 8
    hdr = blob.reserve(72)

    chunk_addr = {i: blob.put(arr[i * 5:(i + 1) * 5].tobytes())
                  for i in range(64, n_chunks)}
    # s=5 starts at relative element 62 → absolute index 64; dblk 0 page
    # 0 covers indices 64..71 (we fill 64..69, leave 70..71 UNDEF)
    page0 = b"".join(
        struct.pack("<Q", chunk_addr.get(64 + j, UNDEF)) for j in range(8)
    ) + b"\x00" * 4
    dblk0 = blob.put(
        b"EADB" + bytes([0, 0]) + struct.pack("<Q", hdr)
        + (64).to_bytes(arr_off, "little")
        + b"\x00" * 4      # paged block: header checksum, then pages
        + page0            # page 1 uninitialized, not emitted
    )
    easb5 = blob.put(
        b"EASB" + bytes([0, 0]) + struct.pack("<Q", hdr)
        + (64).to_bytes(arr_off, "little")
        + b"\x80"  # bitmap (H5VM MSB-first): 4 dblks x 2 pages; only
        #            dblk0/page0 initialized
        + struct.pack("<Q", dblk0)
        + struct.pack("<Q", UNDEF) * 3
        + b"\x00" * 4
    )
    sblk_addrs = [UNDEF] * (nsblks - ib_nsblks)
    sblk_addrs[1] = easb5  # s=5 → key 1
    ib = blob.put(
        b"EAIB" + bytes([0, 0]) + struct.pack("<Q", hdr)
        + struct.pack("<Q", UNDEF) * ib_elmts
        + struct.pack("<Q", UNDEF) * (2 * (sb_min_ptrs - 1))
        + b"".join(struct.pack("<Q", a) for a in sblk_addrs)
        + b"\x00" * 4
    )
    blob.patch(hdr, (
        b"EAHD" + bytes([0, 0, 8, max_bits, ib_elmts, db_min,
                         sb_min_ptrs, page_bits])
        + struct.pack("<QQQQQQ", 0, 0, 0, 0, n_chunks, 6)
        + struct.pack("<Q", ib) + b"\x00" * 4
    ))
    lay = layout_v4((5, 4), 4, hdr,
                    extra=bytes([max_bits, ib_elmts, sb_min_ptrs,
                                 db_min, page_bits]))
    fill = bytes([3, 0x20]) + struct.pack("<I", 4) + struct.pack("<i", -3)
    ds = dataset_oh(blob, arr, lay, [(0x0005, fill)])
    out = h5_read(blob.finish([("v", ds)]))
    got = out["datasets"]["v"]["data"]
    want = np.full(n_chunks * 5, -3, dtype="<i4")
    want[64 * 5:70 * 5] = arr[64 * 5:70 * 5]
    np.testing.assert_array_equal(got, want)


def test_malformed_ea_max_index_gated():
    """Review r8 pass-2 #2: a crafted EAHD whose max_index_set exceeds
    the 2^max_bits addressable range must raise a named ValueError, not
    drive a near-unbounded loop into a bare IndexError."""
    blob = FileBlob()
    hdr = blob.reserve(72)
    blob.patch(hdr, (
        b"EAHD" + bytes([0, 0, 8, 16, 2, 2, 4, 10])  # max_bits=16
        + struct.pack("<QQQQQQ", 0, 0, 0, 0, 1 << 40, 0)
        + struct.pack("<Q", 0) + b"\x00" * 4
    ))
    lay = layout_v4((5, 4), 4, hdr, extra=bytes([16, 2, 4, 2, 10]))
    arr = np.zeros(10, dtype="<i4")
    ds = dataset_oh(blob, arr, lay)
    with pytest.raises(ValueError, match="addressable range"):
        h5_read(blob.finish([("v", ds)]))


def test_paged_dblock_in_index_block_gated():
    """The one remaining EA paging gate: a paged data block whose
    pointer lives in the INDEX block (no page bitmap exists there) —
    a geometry libhdf5 never produces (db_min=16 > 2^page_bits=8)."""
    blob = FileBlob()
    max_bits, ib_elmts, db_min, sb_min_ptrs, page_bits = 32, 2, 16, 4, 3
    nsblks = 1 + (max_bits - (db_min.bit_length() - 1))
    ib_nsblks = 2 * (sb_min_ptrs.bit_length() - 1)
    hdr = blob.reserve(72)
    ib = blob.put(
        b"EAIB" + bytes([0, 0]) + struct.pack("<Q", hdr)
        + struct.pack("<Q", UNDEF) * ib_elmts
        + struct.pack("<Q", UNDEF) * (2 * (sb_min_ptrs - 1))
        + struct.pack("<Q", UNDEF) * (nsblks - ib_nsblks)
        + b"\x00" * 4
    )
    blob.patch(hdr, (
        b"EAHD" + bytes([0, 0, 8, max_bits, ib_elmts, db_min,
                         sb_min_ptrs, page_bits])
        + struct.pack("<QQQQQQ", 0, 0, 0, 0, 3, 0)
        + struct.pack("<Q", ib) + b"\x00" * 4
    ))
    lay = layout_v4((5, 4), 4, hdr,
                    extra=bytes([max_bits, ib_elmts, sb_min_ptrs,
                                 db_min, page_bits]))
    ds = dataset_oh(blob, np.zeros(15, dtype="<i4"), lay)
    with pytest.raises(NotImplementedError, match="index block"):
        h5_read(blob.finish([("v", ds)]))


def test_huge_heap_id_gated():
    blob = FileBlob()
    heap, _ = frhp(blob, [attr_msg_v3("a", np.array(1, dtype="<i4"))],
                   id_len=8)
    leaf = btlf(blob, 8, [_attr_record(b"\x10" + b"\x00" * 7)])
    bt = bthd(blob, 8, 17, 0, leaf, 1, 1)
    ainfo = bytes([0, 0]) + struct.pack("<QQ", heap, bt)
    data = blob.put(ARR.tobytes())
    ds = dataset_oh(blob, ARR, layout_v4((6, 4, 4), 1, data),
                    [(0x0015, ainfo)])
    with pytest.raises(NotImplementedError, match="huge fractal-heap"):
        h5_read(blob.finish([("v", ds)]))


def test_nc4_decode_modern_container():
    """End-to-end: a NETCDF4_CLASSIC file in MODERN metadata dress —
    v2 object headers, v4 layouts (extensible array for the record
    variable, single-chunk for the fixed one), DENSE attribute storage
    on the data variable, vlen-of-object-ref DIMENSION_LIST through a
    global heap — decodes to the same ncds dict the v1-shape files do.
    This is the exact file class VERDICT r7 #1 said a real user hits
    (h5py/netcdf-c with libver="latest")."""
    from veranda_spark.functions.hdf5 import _DT_VLEN_REF
    from veranda_spark.functions.netcdf import nc4_decode

    blob = FileBlob()

    # --- dimension scale "x": fixed size 4, compact attrs -------------
    xdata = np.array([10.0, 20.0, 30.0, 40.0])
    xaddr = blob.put(xdata.tobytes())
    x_msgs = [
        (0x000C, attr_msg_v3(
            "CLASS", np.frombuffer(b"DIMENSION_SCALE\x00", dtype="S16")
            .reshape(())[()])),
        (0x000C, attr_msg_v3("_Netcdf4Dimid", np.array(0, dtype="<i4"))),
    ]
    x_oh = blob.put(oh2([
        (0x0001, _ds_encode((4,), None)),
        (0x0003, _dt_encode(np.dtype("<f8"))),
        (0x0008, layout_v4((4, 8), 1, xaddr)),
    ] + x_msgs))

    # --- data variable "temp" (x,) with DENSE attrs + DIMENSION_LIST --
    # DIMENSION_LIST: vlen-of-ref, one element holding one ref to x_oh
    gobj = struct.pack("<HHxxxxQ", 1, 1, 8) + struct.pack("<Q", x_oh)
    gcol = b"GCOL" + bytes([1, 0, 0, 0]) + struct.pack("<Q", 16 + len(gobj))
    gaddr = blob.put(gcol + gobj)
    nb = b"DIMENSION_LIST\x00"
    dl_body = (
        struct.pack("<BBHHHB", 3, 0, len(nb), len(_DT_VLEN_REF),
                    len(_ds_encode((1,), None)), 0)
        + nb + _DT_VLEN_REF + _ds_encode((1,), None)
        + struct.pack("<IQI", 1, gaddr, 1)
    )
    units = attr_msg_v3(
        "units", np.frombuffer(b"K\x00", dtype="S2").reshape(())[()])
    heap, ids = frhp(blob, [dl_body, units], id_len=8)
    leaf = btlf(blob, 8, [_attr_record(i) for i in ids])
    bt = bthd(blob, 8, 17, 0, leaf, 2, 2)
    tdata = np.array([1, 2, 3, 4], dtype="<i4")
    taddr = blob.put(tdata.tobytes())
    t_oh = blob.put(oh2([
        (0x0001, _ds_encode((4,), None)),
        (0x0003, _dt_encode(np.dtype("<i4"))),
        (0x0008, layout_v4((4, 4), 1, taddr)),
        (0x0015, bytes([0, 0]) + struct.pack("<QQ", heap, bt)),
    ]))

    buf = blob.finish([("x", x_oh), ("temp", t_oh)])
    nc = nc4_decode(buf)
    assert nc["dims"] == {"x": 4}
    assert nc["vars"]["temp"]["dims"] == ("x",)
    np.testing.assert_array_equal(nc["vars"]["temp"]["data"], tdata)
    np.testing.assert_array_equal(nc["vars"]["x"]["data"], xdata)
    assert nc["vars"]["temp"]["attrs"]["units"] == "K"


def oh2_flags(msgs: list[tuple[int, bytes]], flags: int) -> bytes:
    """v2 OH with arbitrary prefix flags: optional times (0x20),
    max-compact/min-dense (0x10), creation-order-tracked message
    headers (0x04), chunk0-size width from flags&3."""
    track = bool(flags & 0x04)
    block = b""
    for i, (t, b) in enumerate(msgs):
        block += bytes([t]) + struct.pack("<H", len(b)) + b"\x00"
        if track:
            block += struct.pack("<H", i)
        block += b
    so = 1 << (flags & 0x03)
    out = b"OHDR" + bytes([2, flags])
    if flags & 0x20:
        out += b"\x00" * 16  # access/mod/change/birth times
    if flags & 0x10:
        out += struct.pack("<HH", 8, 6)  # max compact / min dense
    out += len(block).to_bytes(so, "little") + block + b"\x00" * 4
    return out


@pytest.mark.parametrize("flags", [0x00, 0x01, 0x03, 0x06, 0x32, 0x37])
def test_v2_oh_prefix_flag_variants(flags):
    """Every v2 object-header prefix shape modern writers emit: 1/2/4/
    8-byte chunk-0 sizes, creation-order-tracked message headers,
    timestamps, max-compact/min-dense counts — all decode the same
    dataset."""
    blob = FileBlob()
    data = blob.put(ARR.tobytes())
    ds = blob.put(oh2_flags([
        (0x0001, _ds_encode(ARR.shape, None)),
        (0x0003, _dt_encode(ARR.dtype)),
        (0x0008, layout_v4((6, 4, 4), 1, data)),
        (0x000C, attr_msg_v3("k", np.array(7, dtype="<i4"))),
    ], flags))
    out = h5_read(blob.finish([("v", ds)]))
    np.testing.assert_array_equal(out["datasets"]["v"]["data"], ARR)
    assert out["datasets"]["v"]["attrs"]["k"] == 7


def test_v2_oh_chunk0_size_excludes_checksum():
    """Regression for the chunk-0 size semantics fix: a v2 OH whose last
    message ends exactly at prefix+size must parse that message (the old
    reader chopped 4 bytes and lost it)."""
    blob = FileBlob()
    data = blob.put(ARR.tobytes())
    ds = dataset_oh(blob, ARR, layout_v4((6, 4, 4), 1, data),
                    [(0x000C, _last_attr_body())])
    out = h5_read(blob.finish([("v", ds)]))
    assert out["datasets"]["v"]["attrs"]["zz_last"] == 123


def _last_attr_body() -> bytes:
    return attr_msg_v3("zz_last", np.array(123, dtype="<i4"))
